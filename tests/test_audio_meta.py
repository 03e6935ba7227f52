"""Header-only audio container probes (functions/audio_meta.py).

WAV ground truth comes from the stdlib ``wave`` writer (an encoder the
probe's author didn't write); FLAC/OGG/MP3 streams are hand-assembled
per the public specs with planted values.
"""
from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from tap_airbyte_wrapper_spark.functions import audio_metadata


def make_wav(sr=16000, nch=1, seconds=2.0, sampwidth=2):
    buf = io.BytesIO()
    n = int(sr * seconds)
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(sampwidth)
        f.setframerate(sr)
        f.writeframes(b"\x00" * (n * nch * sampwidth))
    return buf.getvalue()


def test_wav_probe_matches_stdlib_writer():
    got = audio_metadata(make_wav(sr=22050, nch=2, seconds=1.5))
    assert got == {"container": "wav", "codec": "pcm",
                   "sample_rate": 22050, "channels": 2,
                   "duration_s": 1.5, "duration_exact": True}


def test_wav_probe_header_only():
    """Truncating the data payload must not break the probe — duration
    comes from the declared data-chunk size, not the bytes present."""
    full = make_wav(sr=8000, nch=1, seconds=3.0)
    got = audio_metadata(full[:64])
    assert got["duration_s"] == 3.0 and got["sample_rate"] == 8000


def make_flac(sr=44100, nch=2, total_samples=441000):
    si = bytearray(34)
    si[0:2] = struct.pack(">H", 4096)      # min block
    si[2:4] = struct.pack(">H", 4096)      # max block
    # sr(20 bits) | nch-1(3) | bps-1(5) | total(36)
    si[10] = (sr >> 12) & 0xFF
    si[11] = (sr >> 4) & 0xFF
    si[12] = ((sr & 0x0F) << 4) | ((nch - 1) << 1) | ((16 - 1) >> 4)
    si[13] = (((16 - 1) & 0x0F) << 4) | ((total_samples >> 32) & 0x0F)
    si[14:18] = struct.pack(">I", total_samples & 0xFFFFFFFF)
    return b"fLaC" + bytes([0x80]) + b"\x00\x00\x22" + bytes(si)


def test_flac_probe():
    got = audio_metadata(make_flac(sr=44100, nch=2, total_samples=441000))
    assert got == {"container": "flac", "codec": "flac",
                   "sample_rate": 44100, "channels": 2,
                   "duration_s": 10.0, "duration_exact": True}


def ogg_page(payload, granule=0, htype=0, seq=0):
    segs = []
    n = len(payload)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    head = (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
            + struct.pack("<I", 1) + struct.pack("<I", seq)
            + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs))
    return head + payload


def test_ogg_vorbis_probe_with_tail_granule():
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", 44100) + b"\x00" * 16)
    first = ogg_page(ident, htype=2, seq=0)
    last = ogg_page(b"\x00" * 10, granule=220500, htype=4, seq=9)
    got = audio_metadata(first + last)
    assert got == {"container": "ogg", "codec": "vorbis",
                   "sample_rate": 44100, "channels": 2,
                   "duration_s": 5.0, "duration_exact": True}


def test_ogg_opus_probe():
    ident = b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312) \
        + struct.pack("<I", 48000) + b"\x00\x00\x00"
    first = ogg_page(ident, htype=2, seq=0)
    last = ogg_page(b"\x00" * 4, granule=96000, htype=4, seq=3)
    got = audio_metadata(first + last)
    assert got["codec"] == "opus" and got["sample_rate"] == 48000
    assert got["channels"] == 1 and got["duration_s"] == 2.0


def mp3_frames(n_frames=10, bitrate_idx=9, sr_idx=0):
    """n CBR MPEG-1 Layer III frames (128 kbps / 44.1 kHz defaults)."""
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2), 0x00])
    frame_len = 144 * 128000 // 44100   # 417, no padding
    frame = hdr + b"\x00" * (frame_len - 4)
    return frame * n_frames


def test_mp3_cbr_estimate():
    payload = mp3_frames(n_frames=38)   # ~0.99 s at 26.12 ms/frame
    got = audio_metadata(payload)
    assert got["container"] == "mp3" and got["sample_rate"] == 44100
    assert got["channels"] == 2 and got["duration_exact"] is False
    # CBR estimate: bytes*8/bitrate
    assert got["duration_s"] == pytest.approx(
        len(payload) * 8 / 128000, abs=1e-4)


def test_mp3_xing_exact_duration():
    base = mp3_frames(n_frames=2)
    frame_len = 144 * 128000 // 44100
    first = bytearray(base[:frame_len])
    side = 4 + 32                        # MPEG-1 stereo side info
    first[side:side + 12] = (b"Xing" + struct.pack(">I", 0x1)
                             + struct.pack(">I", 1000))
    got = audio_metadata(bytes(first) + base[frame_len:])
    assert got["duration_exact"] is True
    assert got["duration_s"] == pytest.approx(1000 * 1152 / 44100,
                                              abs=1e-4)


def test_mp3_id3_skip_and_second_sync_guard():
    frames = mp3_frames(n_frames=3)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    got = audio_metadata(id3 + frames)
    assert got is not None and got["container"] == "mp3"
    # a lone false sync in arbitrary binary is rejected (no second
    # frame at the computed offset)
    junk = b"\x12\x34" * 100 + b"\xff\xfb\x92\x00" + b"\x55" * 2000
    assert audio_metadata(junk) is None


def test_probe_media_meta_routes_audio(spark):
    from tap_airbyte_wrapper_spark.functions import probe_media_meta
    from pyspark.sql import functions as F

    wav = make_wav(sr=16000, nch=1, seconds=2.0)
    jpg_path = __file__.replace(
        "test_audio_meta.py", "fixtures/jpeg_gt/jpeg_gt_444_q90.jpg")
    jpg = open(jpg_path, "rb").read()
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(jpg))],
        "id long, payload binary")
    out = {r.id: r.m for r in df.select(
        "id", probe_media_meta(F.col("payload")).alias("m")).collect()}
    assert out[1]["container"] == "wav"
    assert out[1]["duration_s"] == "2.0"
    assert out[1]["sample_rate"] == "16000"
    # the image goes to the dims probe, never the mp3 sync scan
    assert out[2] == {"width": "64", "height": "48"}
