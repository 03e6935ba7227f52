"""Header-only EXIF probe for JPEG assets (orientation / camera /
capture time / declared pixel dims) — the image sibling of the video
and audio container probes: a 100 TB asset inventory needs to know
that a photo is rotated (orientation != 1 breaks naive thumbnailing
and perceptual hashes) and when/what shot it WITHOUT decoding pixels.

Public knowledge only: the JPEG APP1 marker layout is ITU-T T.81 /
JEITA CP-3451 (EXIF 2.x), which embeds a little TIFF file — byte-order
mark ``II``/``MM``, magic 42, IFD walk with 12-byte entries.  Only the
handful of inventory-relevant tags are extracted; everything else is
skipped by offset arithmetic, so the probe reads a few hundred header
bytes no matter how large the asset is.

Contract matches the other probes: ``exif_metadata`` NEVER raises on
arbitrary bytes — corrupt/absent EXIF yields ``None`` (or a partial
dict of whatever parsed before the corruption), because executor-side
surprises must not kill a corpus-scale inventory job.
"""

from __future__ import annotations

import struct

__all__ = ["exif_metadata", "exif_app1"]

#: IFD0 + Exif-IFD tags worth an inventory row
_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0x9003: "datetime_original",
    0xA002: "pixel_x",
    0xA003: "pixel_y",
}
_EXIF_IFD_PTR = 0x8769

#: TIFF type -> byte width (only the ones our tags use)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def _parse_ifd(data: bytes, off: int, end: str, out: dict,
               depth: int = 0) -> None:
    if depth > 2 or off + 2 > len(data):
        return
    (n,) = struct.unpack(end + "H", data[off:off + 2])
    if n > 256:  # implausible entry count — corrupt, stop here
        return
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            return
        tag, typ, cnt = struct.unpack(end + "HHI", data[e:e + 8])
        if tag == _EXIF_IFD_PTR and typ == 4:
            (ptr,) = struct.unpack(end + "I", data[e + 8:e + 12])
            _parse_ifd(data, ptr, end, out, depth + 1)
            continue
        name = _TAGS.get(tag)
        if name is None or typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            raw = data[e + 8:e + 8 + size]
        else:
            (ptr,) = struct.unpack(end + "I", data[e + 8:e + 12])
            if ptr + size > len(data):
                continue
            raw = data[ptr:ptr + size]
        if typ == 2:  # ASCII, NUL-terminated
            out[name] = raw.split(b"\x00", 1)[0].decode(
                "ascii", "replace").strip()
        elif typ == 3 and len(raw) >= 2:
            out[name] = struct.unpack(end + "H", raw[:2])[0]
        elif typ == 4 and len(raw) >= 4:
            out[name] = struct.unpack(end + "I", raw[:4])[0]


def exif_metadata(payload: bytes):
    """Extract inventory EXIF fields from a JPEG payload's APP1
    segment, or ``None`` when there is no parseable EXIF.  Keys (all
    optional): ``orientation`` (1-8, TIFF convention), ``make``,
    ``model``, ``datetime``, ``datetime_original``, ``pixel_x``,
    ``pixel_y``.  Never raises."""
    try:
        if not payload or payload[:2] != b"\xff\xd8":
            return None
        pos = 2
        app1 = None
        # walk markers up to SOS; APP1/Exif usually sits first
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xDA:  # SOS — headers over
                break
            (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            if seglen < 2:
                return None
            if marker == 0xE1 and \
                    payload[pos + 4:pos + 10] == b"Exif\x00\x00":
                app1 = payload[pos + 10:pos + 2 + seglen]
                break
            pos += 2 + seglen
        if app1 is None or len(app1) < 8:
            return None
        order = app1[:2]
        end = {b"II": "<", b"MM": ">"}.get(order)
        if end is None:
            return None
        (magic,) = struct.unpack(end + "H", app1[2:4])
        if magic != 42:
            return None
        (ifd0,) = struct.unpack(end + "I", app1[4:8])
        out: dict = {}
        _parse_ifd(app1, ifd0, end, out)
        return out or None
    except Exception:
        return None


def exif_app1(orientation: int = 1, make: str = "", model: str = "",
              datetime_original: str = "",
              byte_order: str = "II") -> bytes:
    """Assemble a minimal valid APP1/Exif segment (marker + length +
    TIFF with IFD0 and, when ``datetime_original`` is set, an Exif
    sub-IFD) — the deterministic fixture builder for probe plumbing
    tests and the fleet entry.  ``byte_order``: ``"II"`` little- or
    ``"MM"`` big-endian, both of which real cameras emit.  Layout is
    computed in two passes: IFD0 at offset 8, long ASCII values in a
    tail right after it, the Exif sub-IFD (and its own long value)
    last."""
    end = {"II": "<", "MM": ">"}[byte_order]

    ifd0 = [(0x0112, "short", orientation)]
    if make:
        ifd0.append((0x010F, "ascii", make))
    if model:
        ifd0.append((0x0110, "ascii", model))
    has_sub = bool(datetime_original)
    if has_sub:
        ifd0.append((_EXIF_IFD_PTR, "subptr", None))
    ifd0.sort()

    n = len(ifd0)
    after_ifd0 = 8 + 2 + 12 * n + 4
    tail = b""
    value_off = {}
    for tag, kind, v in ifd0:
        if kind == "ascii":
            raw = v.encode("ascii") + b"\x00"
            if len(raw) > 4:
                value_off[tag] = after_ifd0 + len(tail)
                tail += raw
    sub_off = after_ifd0 + len(tail)
    sub = b""
    if has_sub:
        raw = datetime_original.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            sub = (struct.pack(end + "H", 1)
                   + struct.pack(end + "HHI", 0x9003, 2, len(raw))
                   + raw.ljust(4, b"\x00")
                   + struct.pack(end + "I", 0))
        else:
            sub_hdr = 2 + 12 + 4
            sub = (struct.pack(end + "H", 1)
                   + struct.pack(end + "HHI", 0x9003, 2, len(raw))
                   + struct.pack(end + "I", sub_off + sub_hdr)
                   + struct.pack(end + "I", 0) + raw)

    body = struct.pack(end + "H", n)
    for tag, kind, v in ifd0:
        if kind == "short":
            body += struct.pack(end + "HHI", tag, 3, 1)
            body += struct.pack(end + "H", v) + b"\x00\x00"
        elif kind == "subptr":
            body += struct.pack(end + "HHI", tag, 4, 1)
            body += struct.pack(end + "I", sub_off)
        else:
            raw = v.encode("ascii") + b"\x00"
            body += struct.pack(end + "HHI", tag, 2, len(raw))
            if len(raw) <= 4:
                body += raw.ljust(4, b"\x00")
            else:
                body += struct.pack(end + "I", value_off[tag])
    body += struct.pack(end + "I", 0)  # next-IFD: none

    tiff = byte_order.encode("ascii") + struct.pack(end + "H", 42) \
        + struct.pack(end + "I", 8)
    exif = b"Exif\x00\x00" + tiff + body + tail + sub
    return b"\xff\xe1" + struct.pack(">H", 2 + len(exif)) + exif
