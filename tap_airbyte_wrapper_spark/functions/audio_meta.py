"""Header-only audio container probes: WAV, FLAC, OGG, MP3.

The audio analogue of :func:`.codecs.image_dimensions` and
:func:`.video.video_metadata` — duration, sample rate, channels, and
codec from CONTAINER METADATA alone, no sample decode.  A "drop
anything under 16 kHz / over 30 s / not speech-mono" gate reads a few
dozen header bytes per asset instead of decoding 100 TB of PCM; only
survivors reach :func:`.codecs.decode_wav` or a real codec.

Format references are the public specs: RIFF/WAVE (the ``fmt `` chunk),
the FLAC STREAMINFO metadata block, the OGG page header + Vorbis/Opus
identification headers, and the MPEG-1/2 audio frame header (ISO/IEC
11172-3 bitrate/sample-rate tables).  MP3 duration is estimated from
the FIRST frame's bitrate (exact for CBR, approximate for VBR unless a
Xing/Info tag is present — which we read when available); the dict's
``duration_exact`` flag says which you got.
"""
from __future__ import annotations

import struct

__all__ = ["audio_metadata", "audio_timing_profile",
           "wav_stub", "mp3_stub", "ogg_stub"]


def _parse_wav(b: bytes):
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    out = {"container": "wav", "codec": None, "sample_rate": None,
           "channels": None, "duration_s": None, "duration_exact": True}
    pos = 12
    byte_rate = None
    data_size = None
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        if tag == b"fmt " and pos + 24 <= len(b):
            fmt, nch, sr, br = struct.unpack("<HHII", b[pos + 8:pos + 20])
            out["codec"] = {1: "pcm", 3: "float", 6: "alaw",
                            7: "mulaw"}.get(fmt, f"fmt_{fmt}")
            out["channels"] = nch
            out["sample_rate"] = sr
            byte_rate = br
        elif tag == b"data":
            data_size = size
            # data payload need not be present (header-only read)
        pos += 8 + size + (size & 1)
    if byte_rate and data_size is not None:
        out["duration_s"] = round(data_size / byte_rate, 6)
    return out


def _parse_flac(b: bytes):
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    # first metadata block must be STREAMINFO (34 bytes)
    hdr = b[4]
    if (hdr & 0x7F) != 0:
        return None
    si = b[8:42]
    sr = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    nch = ((si[12] >> 1) & 0x07) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack(">I", si[14:18])[0]
    out = {"container": "flac", "codec": "flac", "sample_rate": sr,
           "channels": nch, "duration_s": None, "duration_exact": True}
    if sr and total:
        out["duration_s"] = round(total / sr, 6)
    return out


def _parse_ogg(b: bytes):
    if len(b) < 28 or b[:4] != b"OggS":
        return None
    out = {"container": "ogg", "codec": None, "sample_rate": None,
           "channels": None, "duration_s": None, "duration_exact": False}
    nseg = b[26]
    seg_end = 27 + nseg
    payload = b[seg_end:seg_end + 64]
    if payload.startswith(b"\x01vorbis") and len(payload) >= 16:
        out["codec"] = "vorbis"
        out["channels"] = payload[11]
        out["sample_rate"] = struct.unpack("<I", payload[12:16])[0]
    elif payload.startswith(b"OpusHead") and len(payload) >= 13:
        out["codec"] = "opus"
        out["channels"] = payload[9]
        out["sample_rate"] = 48000       # Opus always decodes at 48 kHz
    # duration needs the LAST page's granule position: scan the tail
    # (pages are <= 64 KB; 128 KB of tail covers the final page)
    tail = b[-131072:]
    last = tail.rfind(b"OggS")
    if last >= 0 and len(tail) >= last + 14 and out["sample_rate"]:
        (granule,) = struct.unpack("<q", tail[last + 6:last + 14])
        if granule > 0:
            out["duration_s"] = round(granule / out["sample_rate"], 6)
            out["duration_exact"] = True
    return out


# MPEG-1 Layer III bitrate (kbps) and sample-rate tables (ISO 11172-3)
_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, 0]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                     128, 144, 160, 0]
_MP3_SR = {3: [44100, 48000, 32000],      # MPEG-1
           2: [22050, 24000, 16000],      # MPEG-2
           0: [11025, 12000, 8000]}       # MPEG-2.5


def _parse_mp3(b: bytes):
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        pos = 10 + size
    # find the first frame sync within a bounded window — skip between
    # 0xFF bytes with C-speed find() instead of a per-byte Python loop
    # (this scan runs on EVERY unrecognized payload the media probe
    # sees, so its cost must be near-zero on non-audio bytes)
    limit = min(len(b) - 4, pos + 4096)
    while True:
        pos = b.find(b"\xff", pos, limit + 1)
        if pos < 0:
            return None
        if (b[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    h1 = b[pos + 1]
    version = (h1 >> 3) & 0x03          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h1 >> 1) & 0x03            # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = b[pos + 2] >> 4
    sr_idx = (b[pos + 2] >> 2) & 0x03
    if sr_idx == 3 or br_idx in (0, 15):
        return None
    table = _MP3_BITRATE_V1L3 if version == 3 else _MP3_BITRATE_V2L3
    bitrate = table[br_idx] * 1000
    sr = _MP3_SR[version][sr_idx]
    # Sync words occur in arbitrary binary; demand a second valid sync
    # exactly one frame length ahead before claiming mp3 (padding bit
    # included), unless the stream ends inside frame 1.
    pad = (b[pos + 2] >> 1) & 0x01
    frame_len = (144 if version == 3 else 72) * bitrate // sr + pad
    nxt = pos + frame_len
    if nxt + 2 <= len(b) and not (
            b[nxt] == 0xFF and (b[nxt + 1] & 0xE0) == 0xE0):
        return None
    mode = (b[pos + 3] >> 6) & 0x03
    nch = 1 if mode == 3 else 2
    out = {"container": "mp3", "codec": "mp3", "sample_rate": sr,
           "channels": nch, "duration_s": None, "duration_exact": False}
    spf = 1152 if version == 3 else 576  # samples per L3 frame
    # Xing/Info VBR tag: exact frame count rides the first frame
    side = 4 + ((17 if nch == 1 else 32) if version == 3
                else (9 if nch == 1 else 17))
    tag_at = pos + side
    if b[tag_at:tag_at + 4] in (b"Xing", b"Info") \
            and len(b) >= tag_at + 12:
        (flags,) = struct.unpack(">I", b[tag_at + 4:tag_at + 8])
        if flags & 0x1:
            (frames,) = struct.unpack(">I", b[tag_at + 8:tag_at + 12])
            out["duration_s"] = round(frames * spf / sr, 6)
            out["duration_exact"] = True
            return out
    # CBR estimate from first-frame bitrate over the remaining bytes
    out["duration_s"] = round((len(b) - pos) * 8 / bitrate, 6)
    return out


def wav_stub(sample_rate: int, channels: int, n_frames: int) -> bytes:
    """A RIFF/WAVE HEADER declaring ``n_frames`` of 16-bit PCM with an
    8-byte stub payload — the deterministic fake for exercising the
    probe/gate plumbing: :func:`audio_metadata` reads declared sizes,
    never the samples, exactly as a first-KB read of a real asset
    would."""
    data_size = n_frames * channels * 2
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", data_size) + b"\x00" * 8)
    return b"RIFF" + struct.pack("<I", 4 + len(body) - 4) + body




def audio_timing_profile(payload: bytes, max_units: int = 4096):
    """Header-only FRAME/GRANULE timing profile: ``(kind,
    [microsecond_units, ...])`` or ``None`` — the audio twin of the
    MP4 ``stts`` / Matroska block-timestamp walks, feeding the same
    windowed timing signature (see multimodal.audio_timing_sig).

    MP3: walk successive frame headers from the first validated sync
    (same sync/version/layer/bitrate/sample-rate validation as
    :func:`_parse_mp3`), one unit per frame = ``round(spf * 1e6 /
    sr)``.  MPEG audio frames are FIXED duration, so the sequence is
    constant and the signature honestly collapses to a (frame count,
    frame duration) fingerprint — the CFR-video contract: two
    re-encodes of the same clip collide (desired), and so do any two
    same-length same-rate MP3s (the metadata block keys must
    disambiguate).  The walk stops at the first non-frame byte (tag
    padding, truncation) rather than guessing.

    OGG (Vorbis/Opus): per-PAGE granule-position deltas,
    ``round(delta * 1e6 / sr)`` — granule positions are cumulative
    PCM sample counts, so this sequence IS content-shaped (page
    packing follows the encoder's bit allocation) and survives a
    metadata RETAG (comment-header rewrite leaves audio pages
    byte-identical in position content) while the byte-window
    signature shifts.  What escapes, honestly: a re-encode that
    repaginates (most transcodes), sample-rate changes, and chained/
    multiplexed streams (first bitstream only).

    WAV/FLAC carry no frame sequence in the header — None (their
    dedup path is the exact ``media_hash`` / decode-side energy
    hash)."""
    if payload is None or len(payload) < 8:
        return None
    b = bytes(payload)
    if b[:4] == b"OggS":
        meta = _parse_ogg(b)
        if not meta or not meta.get("sample_rate"):
            return None
        sr = meta["sample_rate"]
        granules = []
        pos = 0
        while pos + 27 <= len(b) and len(granules) <= max_units:
            if b[pos:pos + 4] != b"OggS":
                break
            (granule,) = struct.unpack("<q", b[pos + 6:pos + 14])
            nseg = b[pos + 26]
            seg_end = pos + 27 + nseg
            if seg_end > len(b):
                break
            body = sum(b[pos + 27:seg_end])
            if granule > 0:
                granules.append(granule)
            pos = seg_end + body
        if len(granules) < 1:
            return None
        units = []
        prev = 0
        for g in granules:
            units.append(round((g - prev) * 1_000_000 / sr))
            prev = g
        return ("ogg", units)
    # MP3: locate the first validated frame via the probe, then walk
    meta = _parse_mp3(b)
    if not meta:
        return None
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        pos = 10 + size
    limit = min(len(b) - 4, pos + 4096)
    while True:
        pos = b.find(b"\xff", pos, limit + 1)
        if pos < 0:
            return None
        if (b[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    units = []
    while pos + 4 <= len(b) and len(units) < max_units:
        if b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
            break
        version = (b[pos + 1] >> 3) & 0x03
        layer = (b[pos + 1] >> 1) & 0x03
        if version == 1 or layer != 1:
            break
        br_idx = b[pos + 2] >> 4
        sr_idx = (b[pos + 2] >> 2) & 0x03
        if sr_idx == 3 or br_idx in (0, 15):
            break
        table = _MP3_BITRATE_V1L3 if version == 3 else _MP3_BITRATE_V2L3
        bitrate = table[br_idx] * 1000
        sr = _MP3_SR[version][sr_idx]
        pad = (b[pos + 2] >> 1) & 0x01
        spf = 1152 if version == 3 else 576
        units.append(round(spf * 1_000_000 / sr))
        pos += (144 if version == 3 else 72) * bitrate // sr + pad
    return ("mp3", units) if units else None


def mp3_stub(n_frames: int, bitrate_idx: int = 9, sr_idx: int = 0,
             essence_seed: int = 0) -> bytes:
    """Assemble ``n_frames`` of spec-conformant CBR MPEG-1 Layer III
    frames (ISO/IEC 11172-3 header layout, default 128 kbps / 44100
    Hz) with md5-chain frame bodies selected by ``essence_seed`` —
    the deterministic fake for the audio timing gate: same frame
    grid + different seed = a planted 're-encode' (every essence
    byte rewritten, frame timing identical)."""
    import hashlib

    bitrate = _MP3_BITRATE_V1L3[bitrate_idx] * 1000
    sr = _MP3_SR[3][sr_idx]
    frame_len = 144 * bitrate // sr
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), 0x00])
    out = bytearray()
    for i in range(n_frames):
        body = bytearray()
        while len(body) < frame_len - 4:
            body += hashlib.md5(
                f"{essence_seed}:{i}:{len(body)}".encode()).digest()
        out += hdr + bytes(body[:frame_len - 4])
    return bytes(out)


def ogg_stub(granules, codec: str = "opus",
             essence_seed: int = 0) -> bytes:
    """Assemble a minimal OGG stream: one id-header page (OpusHead /
    Vorbis id, granule 0) followed by one audio page per entry of
    ``granules`` (cumulative PCM sample positions), page bodies from
    an md5 chain selected by ``essence_seed`` — the planted-re-encode
    fixture for the granule-delta timing profile.  Page CRCs are
    zero; the header-only probe (like a first-KB read) never checks
    them."""
    import hashlib

    def page(granule, body, htype=0, seqno=0):
        nseg = (len(body) + 254) // 255 or 1
        segs = bytearray()
        rem = len(body)
        for _ in range(nseg - 1):
            segs.append(255)
            rem -= 255
        segs.append(rem)
        return (b"OggS" + bytes([0, htype])
                + struct.pack("<q", granule)
                + struct.pack("<I", 1) + struct.pack("<I", seqno)
                + struct.pack("<I", 0) + bytes([nseg]) + bytes(segs)
                + body)

    if codec == "opus":
        idhdr = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
                 + struct.pack("<I", 48000) + struct.pack("<h", 0)
                 + bytes([0]))
    else:
        idhdr = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
                 + struct.pack("<I", 44100)
                 + struct.pack("<iii", 0, 128000, 0) + bytes([0xB8, 1]))
    out = page(0, idhdr, htype=2, seqno=0)
    for i, g in enumerate(granules):
        body = hashlib.md5(
            f"{essence_seed}:{i}".encode()).digest() * 4
        out += page(int(g), body, seqno=i + 1)
    return out


def audio_metadata(payload: bytes):
    """Probe an audio container's header: ``{container, codec,
    sample_rate, channels, duration_s, duration_exact}`` or ``None``
    when unrecognized (WAV/FLAC/OGG-Vorbis/OGG-Opus/MP3).  See module
    docstring for the MP3 duration-exactness contract."""
    if payload is None or len(payload) < 8:
        return None
    for parse in (_parse_wav, _parse_flac, _parse_ogg, _parse_mp3):
        got = parse(payload)
        if got is not None:
            return got
    return None
