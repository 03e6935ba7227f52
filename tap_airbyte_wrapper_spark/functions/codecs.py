"""Pluggable media codec registry for the multimodal operators.

The reference treats connector media payloads as opaque bytes; our
multimodal layer decodes them executor-side.  Codecs register per
media-type so environments pick the best available implementation:

* pure-Python codecs for PCM WAV (stdlib ``wave``) and non-interlaced
  8-bit PNG (``zlib`` + numpy unfiltering) are ALWAYS registered — real
  decode with zero third-party dependencies;
* a PIL-backed generic image codec registers itself under ``image/*``
  when Pillow is importable (not in this container — covered by a
  skippable test);
* anything without a codec falls back to the deterministic fake stubs in
  :mod:`.multimodal` when ``fake=True``, else raises executor-side.

Decoders run inside Arrow ``mapInPandas`` batches, so registration must
happen at import time (executors re-import this module); runtime
``register_*`` calls affect the driver only unless the workers share the
process (local mode) — document custom codecs as module-level.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import Callable

import numpy as np

__all__ = [
    "register_image_codec",
    "register_audio_codec",
    "image_codec_for",
    "audio_codec_for",
    "decode_png",
    "encode_png",
    "decode_wav",
    "nearest_resize",
    "image_dimensions",
]

#: media_type -> fn(payload: bytes) -> (width, height, ndarray[h, w, c] uint8)
_IMAGE_CODECS: dict[str, Callable[[bytes], tuple[int, int, np.ndarray]]] = {}
#: media_type -> fn(payload: bytes) -> (sample_rate, n_samples, mono float64)
_AUDIO_CODECS: dict[str, Callable[[bytes], tuple[int, int, np.ndarray]]] = {}


def register_image_codec(media_type: str, decode) -> None:
    """Register an image decoder for an exact type or ``image/*``."""
    _IMAGE_CODECS[media_type] = decode


def register_audio_codec(media_type: str, decode) -> None:
    _AUDIO_CODECS[media_type] = decode


def _lookup(registry: dict, media_type: str):
    if media_type in registry:
        return registry[media_type]
    family = media_type.split("/", 1)[0] + "/*"
    return registry.get(family)


def image_codec_for(media_type: str):
    return _lookup(_IMAGE_CODECS, media_type or "")


def audio_codec_for(media_type: str):
    return _lookup(_AUDIO_CODECS, media_type or "")


# --------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


#: Adam7 pass origins/strides: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_unfilter(raw: np.ndarray, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Reverse PNG row filtering over ``h`` rows of ``stride`` payload
    bytes (+1 filter byte each); ``bpp`` = bytes per complete pixel
    (min 1 — sub-byte depths filter at byte granularity per spec).
    Filter 0/2 rows (what :func:`encode_png` and most encoders' fast
    paths emit) unfilter as whole-row numpy ops; Sub/Average/Paeth
    rows fall back to a per-byte loop — correct, and cheap at
    thumbnail sizes."""
    if raw.size < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows = raw[:h * (stride + 1)].reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, line = rows[y, 0], rows[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + prev  # uint8 wraparound == mod-256 per spec
        else:  # Sub / Average / Paeth need the in-progress row
            rec = out[y]
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter {f}")
                rec[x] = (int(line[x]) + pred) & 0xFF
    return out


def _png_samples(rows: np.ndarray, w: int, ch: int, depth: int,
                 scale_sub8: bool) -> np.ndarray:
    """Unfiltered row bytes -> (h, w, ch) uint8 samples.  16-bit takes
    the high byte (libpng ``strip_16`` convention); 1/2/4-bit unpack
    MSB-first and — for grayscale — scale by 255/(2^d - 1) (libpng
    ``expand_gray_1_2_4_to_8``); palette indexes stay unscaled."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :w * ch].reshape(h, w, ch)
    if depth == 16:
        return rows.reshape(h, -1)[:, :w * ch * 2] \
            .reshape(h, w * ch, 2)[:, :, 0].reshape(h, w, ch)
    bits = np.unpackbits(rows, axis=1)
    per = 8 // depth
    samples = np.zeros((h, rows.shape[1] * per), dtype=np.uint8)
    for b in range(depth):
        samples = (samples << 1) | bits[:, b::depth][:, :samples.shape[1]]
    samples = samples[:, :w * ch]
    if scale_sub8:
        samples = (samples.astype(np.uint16) * 255
                   // ((1 << depth) - 1)).astype(np.uint8)
    return samples.reshape(h, w, ch)


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PNG with stdlib zlib + numpy: gray / gray+alpha / RGB /
    RGBA / palette color types, bit depths 1/2/4/8/16 (16-bit down to
    the high byte, sub-8 grayscale scaled — both the libpng
    conventions), Adam7 interlacing, palette ``tRNS`` transparency
    (palette decodes to RGB, or RGBA when ``tRNS`` is present; a
    ``tRNS`` on gray/RGB images is ancillary single-color transparency
    and is ignored).  External libpng-encoded+decoded fixtures pin
    every class in tests."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, hdr, plte, trns = 8, [], None, None, None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data[:3 * (len(data) // 3)],
                                 dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = hdr
    palette = color == 3
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
    valid = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    if color not in channels or depth not in valid[color] or \
            interlace not in (0, 1):
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace})")
    if not (0 < w <= 1 << 24 and 0 < h <= 1 << 24 and w * h <= 1 << 26):
        # corrupt headers must fail loudly, not allocate dims * 2^32
        raise ValueError(f"implausible PNG dimensions {w}x{h}")
    if palette and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = channels[color]
    bpp = max(1, ch * depth // 8)
    try:
        raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                            dtype=np.uint8)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG pixel stream: {exc}") from None

    def rowbytes(width):
        return (width * ch * depth + 7) // 8

    scale = (color == 0)
    if interlace == 0:
        rows = _png_unfilter(raw, h, rowbytes(w), bpp)
        img = _png_samples(rows, w, ch, depth, scale)
    else:  # Adam7: seven independently-filtered sub-images
        img = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = rowbytes(pw)
            rows = _png_unfilter(raw[off:], ph, stride, bpp)
            off += ph * (stride + 1)
            img[y0::dy, x0::dx] = _png_samples(rows, pw, ch, depth, scale)
    if palette:
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[:min(len(trns), len(plte))] = trns[:len(plte)]
            return w, h, np.concatenate(
                [rgb, alpha[idx][:, :, None]], axis=2)
        return w, h, rgb
    return w, h, img


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, c) uint8 array as a filter-0 PNG."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def nearest_resize(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via numpy fancy indexing."""
    h, w, _ = pixels.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]


# --------------------------------------------------------------------- WAV

def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PCM WAV with stdlib ``wave``; returns mono float64 in
    [-1, 1] (multi-channel averaged)."""
    with wave.open(io.BytesIO(payload)) as f:
        sr, nch, sw = f.getframerate(), f.getnchannels(), f.getsampwidth()
        n = f.getnframes()
        frames = f.readframes(n)
    if sw == 1:
        arr = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        arr = (arr - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    return sr, n, arr


register_image_codec("image/png", decode_png)
register_audio_codec("audio/wav", decode_wav)
register_audio_codec("audio/x-wav", decode_wav)

try:  # PIL upgrade path: generic decoder for every image family
    from PIL import Image as _PILImage

    def _decode_pil(payload: bytes) -> tuple[int, int, np.ndarray]:
        img = _PILImage.open(io.BytesIO(payload))
        arr = np.asarray(img.convert("RGB") if img.mode == "P" else img,
                         dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return img.width, img.height, arr

    register_image_codec("image/*", _decode_pil)
except ImportError:
    # PIL absent: the pure-Python JPEG decoder (functions/jpeg.py —
    # baseline AND progressive since round 10) registers under the
    # exact type, so JPEG pixel decode works out of the box;
    # lossless/hierarchical/arithmetic streams raise a ValueError
    # naming the unsupported process (gates fall back to header-only
    # dims).  Registered only in the no-PIL branch because the exact
    # type outranks "image/*" in _lookup and PIL's decoder handles
    # every JPEG process.
    from .jpeg import decode_jpeg as _decode_baseline_jpeg

    register_image_codec("image/jpeg", _decode_baseline_jpeg)
    register_image_codec("image/jpg", _decode_baseline_jpeg)


# ------------------------------------------------------ header-only dims

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def image_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the HEADER BYTES alone — PNG (IHDR), JPEG
    (SOF segment walk), GIF (logical screen descriptor), BMP
    (BITMAPINFOHEADER), WebP (VP8 / VP8L / VP8X, all three layouts) —
    no pixel decode, no third-party deps.  Returns None when the
    container is unrecognized or truncated.

    This is the scale move for multimodal curation: a resolution filter
    ("drop anything under 64x64") reads ~30 bytes per asset instead of
    decoding 100 TB of pixels; only survivors reach the real decoder.
    """
    if payload is None or len(payload) < 10:
        return None
    if payload[:8] == _PNG_SIG and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h)
    if payload[:2] == b"BM" and len(payload) >= 26:     # BMP
        (hdr_size,) = struct.unpack("<I", payload[14:18])
        if hdr_size >= 40:                              # BITMAPINFOHEADER+
            w, h = struct.unpack("<ii", payload[18:26])
            return int(w), abs(int(h))                  # h<0 = top-down
        if hdr_size == 12 and len(payload) >= 22:       # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return int(w), int(h)
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP" \
            and len(payload) >= 25:
        fourcc = payload[12:16]
        if fourcc == b"VP8X" and len(payload) >= 30:    # extended header
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return w, h
        if fourcc == b"VP8L" and payload[20] == 0x2F:   # lossless
            bits = int.from_bytes(payload[21:25], "little")
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if fourcc == b"VP8 " and len(payload) >= 30:    # lossy key frame
            # frame tag (3) + start code 9D 01 2A + 16-bit w/h (14 bits)
            if payload[23:26] == b"\x9d\x01\x2a":
                w, h = struct.unpack("<HH", payload[26:30])
                return w & 0x3FFF, h & 0x3FFF
        return None
    if payload[:2] == b"\xff\xd8":                      # JPEG SOI
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                pos += 1
                continue
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2                                # standalone marker
                continue
            if pos + 4 > n:
                break
            (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            if marker in _SOF_MARKERS and pos + 9 <= n:
                h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
                return int(w), int(h)
            pos += 2 + seg_len
    return None
