"""Generate the tiny committed video-container fixtures in
tests/fixtures/video/ — hand-assembled per the public specs (ISO/IEC
14496-12 box layout; Matroska/EBML per RFC 8794), no media libraries
involved.  The streams carry no playable frames (8-byte mdat / empty
clusters): they exist to pin the HEADER-ONLY probe in functions/video.py
against independently-written byte layouts.

Run: python scripts/gen_video_fixture.py
"""
from __future__ import annotations

import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "video")


# ------------------------------------------------------------------- MP4

def box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return box(fourcc, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + payload)


def mp4_fixture() -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2avc1")
    # mvhd v0: ctime mtime timescale duration rate volume reserved(10)
    # matrix(36) predefined(24) next_track_id
    mvhd = full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, 1000, 12345)            # timescale 1000 -> 12.345 s
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
        + _matrix() + b"\x00" * 24 + struct.pack(">I", 3))

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return full(b"tkhd", 0, 7, struct.pack(
            ">IIII", 0, 0, track_id, 0) + struct.pack(">I", 12345)
            + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + _matrix() + struct.pack(">II", w << 16, h << 16))

    def hdlr(handler: bytes, name: bytes) -> bytes:
        return full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12
                    + name + b"\x00")

    def mdhd() -> bytes:
        return full(b"mdhd", 0, 0, struct.pack(
            ">IIIIHH", 0, 0, 90000, 1111050, 0x55C4, 0))

    def stsd(fmt: bytes, entry_body: bytes) -> bytes:
        entry = struct.pack(">I", 8 + len(entry_body)) + fmt + entry_body
        return full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)

    # avc1 visual sample entry: reserved(6) data_ref(2) predefined etc.
    avc1_body = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                 + struct.pack(">HH", 640, 360)
                 + struct.pack(">II", 0x00480000, 0x00480000)
                 + b"\x00" * 4 + struct.pack(">H", 1) + b"\x00" * 32
                 + struct.pack(">Hh", 0x0018, -1))
    mp4a_body = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
                 + struct.pack(">HHI", 2, 16, 0)
                 + struct.pack(">I", 48000 << 16))
    empty_stbl_tail = (full(b"stts", 0, 0, struct.pack(">I", 0))
                       + full(b"stsc", 0, 0, struct.pack(">I", 0))
                       + full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
                       + full(b"stco", 0, 0, struct.pack(">I", 0)))

    def trak(track_id, handler, name, sample_fmt, sample_body, whd):
        minf = box(b"minf", box(
            b"stbl", stsd(sample_fmt, sample_body) + empty_stbl_tail))
        mdia = box(b"mdia", mdhd() + hdlr(handler, name) + minf)
        return box(b"trak", tkhd(track_id, *whd) + mdia)

    moov = box(b"moov", mvhd
               + trak(1, b"vide", b"VideoHandler", b"avc1", avc1_body,
                      (640, 360))
               + trak(2, b"soun", b"SoundHandler", b"mp4a", mp4a_body,
                      (0, 0)))
    mdat = box(b"mdat", b"\x00" * 8)
    return ftyp + moov + mdat


def _matrix() -> bytes:
    return struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                       0x40000000)


# -------------------------------------------------------------- Matroska

def vint_size(value: int, length: int) -> bytes:
    """EBML size field: `length` bytes with the marker bit."""
    marker = 1 << (7 * length)
    return (marker | value).to_bytes(length, "big")


def el(eid: int, payload: bytes) -> bytes:
    eid_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return eid_bytes + vint_size(len(payload), 2) + payload


def e_uint(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return el(eid, value.to_bytes(n, "big"))


def e_str(eid: int, s: str) -> bytes:
    return el(eid, s.encode("ascii"))


def e_float(eid: int, v: float) -> bytes:
    return el(eid, struct.pack(">d", v))


def mkv_fixture(doctype: str, codec: str) -> bytes:
    header = el(0x1A45DFA3,
                e_uint(0x4286, 1)          # EBMLVersion
                + e_uint(0x42F7, 1)        # EBMLReadVersion
                + e_uint(0x42F2, 4)        # EBMLMaxIDLength
                + e_uint(0x42F3, 8)        # EBMLMaxSizeLength
                + e_str(0x4282, doctype)   # DocType
                + e_uint(0x4287, 2)        # DocTypeVersion
                + e_uint(0x4285, 2))       # DocTypeReadVersion
    info = el(0x1549A966,
              e_uint(0x2AD7B1, 1_000_000)          # TimestampScale (ns)
              + e_float(0x4489, 7500.0)            # Duration -> 7.5 s
              + e_str(0x4D80, "spark-graft")       # MuxingApp
              + e_str(0x5741, "gen_video_fixture"))
    video_entry = el(0xAE,
                     e_uint(0xD7, 1)               # TrackNumber
                     + e_uint(0x73C5, 1)           # TrackUID
                     + e_uint(0x83, 1)             # TrackType video
                     + e_str(0x86, codec)          # CodecID
                     + el(0xE0, e_uint(0xB0, 320) + e_uint(0xBA, 240)))
    audio_entry = el(0xAE,
                     e_uint(0xD7, 2) + e_uint(0x73C5, 2)
                     + e_uint(0x83, 2)             # TrackType audio
                     + e_str(0x86, "A_OPUS")
                     + el(0xE1, e_float(0xB5, 48000.0)))
    tracks = el(0x1654AE6B, video_entry + audio_entry)
    segment = el(0x18538067, info + tracks)
    return header + segment


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "tiny.mp4"), "wb") as f:
        f.write(mp4_fixture())
    with open(os.path.join(OUT, "tiny.mkv"), "wb") as f:
        f.write(mkv_fixture("matroska", "V_MPEG4/ISO/AVC"))
    with open(os.path.join(OUT, "tiny.webm"), "wb") as f:
        f.write(mkv_fixture("webm", "V_VP9"))
    for n in ("tiny.mp4", "tiny.mkv", "tiny.webm"):
        p = os.path.join(OUT, n)
        print(n, os.path.getsize(p), "bytes")


if __name__ == "__main__":
    main()
