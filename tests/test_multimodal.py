"""Multimodal column plumbing: schemas, Arrow batch flow, fan-out
cardinality (decode math is a documented deterministic stub)."""

import pytest
from pyspark.sql import functions as F

from tap_airbyte_wrapper_spark.functions import (
    decode_image,
    extract_features,
    sample_frames,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes(range(i % 7, i % 7 + 60))) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    return with_media_metadata(df, "payload", "image/png")


def test_media_bundle_schema(media):
    row = media.first()
    b = row.media_bundle
    assert b.media_type == "image/png"
    assert b.size_bytes == 60
    assert len(b.media_hash) == 32
    # payload rides along, hash is of the payload
    assert bytes(b.media) == bytes(row.payload)


def test_decode_image_fake(media):
    out = decode_image(media.select("id", "media_bundle"), "media_bundle", fake=True)
    rows = out.collect()
    assert len(rows) == 20
    assert set(out.columns) == {"id", "width", "height", "channels", "pixel_checksum"}
    assert all(16 <= r.width < 80 for r in rows)
    # deterministic: same payload -> same decode
    again = decode_image(media.select("id", "media_bundle"), "media_bundle", fake=True)
    assert sorted((r.id, r.pixel_checksum) for r in rows) == \
        sorted((r.id, r.pixel_checksum) for r in again.collect())


def test_decode_image_bad_payload_raises(media):
    """image/png routes to the real stdlib codec, which rejects
    non-PNG bytes."""
    out = decode_image(media.select("id", "media_bundle"), "media_bundle", fake=False)
    with pytest.raises(Exception, match="not a PNG payload"):
        out.collect()


def test_decode_image_unregistered_type_raises(spark):
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL registers a generic image codec")
    except ImportError:
        pass
    df = spark.createDataFrame([(1, b"\x00" * 32)], "id long, payload binary")
    media = with_media_metadata(df, "payload", "image/tiff")
    out = decode_image(media.select("id", "media_bundle"), "media_bundle", fake=False)
    with pytest.raises(Exception, match="no image codec registered"):
        out.collect()


def test_extract_features(media):
    out = extract_features(media.select("id", "media_bundle"), "media_bundle",
                           dim=16, fake=True)
    rows = out.collect()
    assert all(len(r.feature) == 16 for r in rows)


def test_sample_frames_fanout(media):
    out = sample_frames(media.select("id", "media_bundle"), "media_bundle",
                        every_n=10, max_frames=4, fake=True)
    rows = out.collect()
    # 60-byte payload, every_n=10 -> min(4, 6) = 4 frames per video
    assert len(rows) == 80
    assert {r.frame_idx for r in rows} == {0, 1, 2, 3}
    assert all(len(bytes(r.frame)) == 10 for r in rows)


def test_decode_audio_fake(spark, sf_dir):
    from pyspark.sql import functions as F
    from tap_airbyte_wrapper_spark.functions import decode_audio, with_media_metadata

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    media = with_media_metadata(docs, "payload", "audio/wav").select(
        "doc_id", "media_bundle")
    out = decode_audio(media, "media_bundle", fake=True)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r.sample_rate in (8000, 16000, 22050, 44100, 48000)
        assert r.n_samples > 0
        assert abs(r.duration_s - r.n_samples / r.sample_rate) < 1e-9
        assert 0.0 <= r.rms <= 1.0
    # deterministic across runs
    again = decode_audio(media, "media_bundle", fake=True).collect()
    assert sorted((r.doc_id, r.n_samples) for r in rows) == \
           sorted((r.doc_id, r.n_samples) for r in again)


def test_decode_audio_real_path_raises(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F
    from tap_airbyte_wrapper_spark.functions import decode_audio, with_media_metadata

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    media = with_media_metadata(docs, "payload", "audio/wav").select(
        "doc_id", "media_bundle")
    # audio/wav routes to the real stdlib codec; text bytes are not RIFF
    with pytest.raises(Exception, match="RIFF|not a WAVE"):
        decode_audio(media, "media_bundle", fake=False).collect()


def test_resize_image_fake(spark, sf_dir):
    from pyspark.sql import functions as F
    from tap_airbyte_wrapper_spark.functions import resize_image, with_media_metadata

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"))
    media = with_media_metadata(docs, "payload", "image/png").select(
        "doc_id", "media_bundle")
    out = resize_image(media, "media_bundle", width=32, height=32, fake=True)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        b = r.media_bundle
        assert b.meta["width"] == "32" and b.meta["height"] == "32"
        assert b.size_bytes == len(b.media) > 0
    # deterministic: same payload -> same resized hash
    again = {r.doc_id: r.media_bundle.media_hash
             for r in resize_image(media, "media_bundle", 32, 32, fake=True).collect()}
    assert again == {r.doc_id: r.media_bundle.media_hash for r in rows}


# ---------------------------------------------------------- real codecs

def _png_with_filters(pixels):
    """Encode (h, w, c) uint8 pixels as a PNG whose rows cycle through
    filter types 0-4 (forward-filtered by hand), to exercise every
    unfilter branch of the stdlib decoder."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = pixels.reshape(h, w * ch).astype(np.int16)
    out = []
    for y in range(h):
        f = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros_like(cur)
        line = np.empty_like(cur)
        for x in range(len(cur)):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) & 0xFF
        out.append(bytes([f]) + line.astype(np.uint8).tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(out)))
            + chunk(b"IEND", b""))


def test_png_codec_roundtrip_all_filters():
    import numpy as np

    from tap_airbyte_wrapper_spark.functions.codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        pixels = rng.randint(0, 256, size=(11, 9, ch), dtype=np.uint8)
        w, h, got = decode_png(encode_png(pixels))
        assert (w, h) == (9, 11)
        assert np.array_equal(got, pixels)
        # hand-filtered PNG exercising Sub/Up/Average/Paeth rows
        w2, h2, got2 = decode_png(_png_with_filters(pixels))
        assert (w2, h2) == (9, 11)
        assert np.array_equal(got2, pixels)


def test_decode_image_real_png(spark):
    import hashlib

    import numpy as np

    from tap_airbyte_wrapper_spark.functions.codecs import encode_png

    rng = np.random.RandomState(11)
    imgs = [rng.randint(0, 256, size=(8 + i, 6 + i, 3), dtype=np.uint8)
            for i in range(5)]
    rows = [(i, encode_png(img)) for i, img in enumerate(imgs)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    media = with_media_metadata(df, "payload", "image/png")
    out = {r.id: r for r in decode_image(
        media.select("id", "media_bundle"), "media_bundle").collect()}
    for i, img in enumerate(imgs):
        r = out[i]
        assert (r.width, r.height, r.channels) == (6 + i, 8 + i, 3)
        want = int.from_bytes(
            hashlib.md5(img.tobytes()).digest()[:8], "big", signed=True)
        assert r.pixel_checksum == want


def test_resize_image_real_png(spark):
    import numpy as np

    from tap_airbyte_wrapper_spark.functions import resize_image
    from tap_airbyte_wrapper_spark.functions.codecs import decode_png, encode_png

    pixels = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    df = spark.createDataFrame([(1, encode_png(pixels))], "id long, payload binary")
    media = with_media_metadata(df, "payload", "image/png")
    b = resize_image(media.select("id", "media_bundle"), "media_bundle",
                     width=4, height=4).first().media_bundle
    assert b.media_type == "image/png"
    w, h, got = decode_png(bytes(b.media))
    assert (w, h) == (4, 4)
    # nearest-neighbor: every output pixel exists in the source
    assert np.array_equal(got, pixels[::4][:, ::4])


def test_decode_audio_real_wav(spark):
    import io as _io
    import wave

    import numpy as np

    sr, secs = 16000, 0.25
    t = np.arange(int(sr * secs)) / sr
    signal = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(signal.tobytes())

    from tap_airbyte_wrapper_spark.functions import decode_audio

    df = spark.createDataFrame([(1, buf.getvalue())], "id long, payload binary")
    media = with_media_metadata(df, "payload", "audio/wav")
    r = decode_audio(media.select("id", "media_bundle"), "media_bundle").first()
    assert r.sample_rate == sr
    assert r.n_samples == len(signal)
    assert abs(r.duration_s - secs) < 1e-9
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert abs(r.rms - 0.5 / np.sqrt(2)) < 1e-3


def test_decode_image_pil_codec(spark):
    PIL = pytest.importorskip("PIL")  # noqa: F841  (absent in container)
    import io as _io

    import numpy as np
    from PIL import Image

    arr = np.zeros((10, 12, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, format="BMP")
    df = spark.createDataFrame([(1, buf.getvalue())], "id long, payload binary")
    media = with_media_metadata(df, "payload", "image/bmp")
    r = decode_image(media.select("id", "media_bundle"), "media_bundle").first()
    assert (r.width, r.height, r.channels) == (12, 10, 3)


def test_header_dimensions_no_decode(spark):
    """Resolution gate from header bytes alone: PNG/JPEG/GIF parsed,
    junk null — the pre-decode filter for 100 TB media curation."""
    import struct

    import numpy as np
    from pyspark.sql import Row, functions as F

    from tap_airbyte_wrapper_spark.functions import header_dimensions
    from tap_airbyte_wrapper_spark.functions.codecs import encode_png

    png = encode_png(np.zeros((7, 5, 3), dtype=np.uint8))
    jpeg = (b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 33, 44) + b"\x03" + b"\x00" * 10)
    gif = b"GIF89a" + struct.pack("<HH", 12, 9)
    df = spark.createDataFrame([
        Row(id=1, media=bytearray(png)),
        Row(id=2, media=bytearray(jpeg)),
        Row(id=3, media=bytearray(gif)),
        Row(id=4, media=bytearray(b"not an image at all")),
    ])
    out = {r.id: (r.d.width, r.d.height) for r in df.select(
        "id", header_dimensions(F.col("media")).alias("d")).collect()}
    assert out[1] == (5, 7)
    assert out[2] == (44, 33)
    assert out[3] == (12, 9)
    assert out[4] == (None, None)
    kept = df.filter(
        header_dimensions(F.col("media")).width >= 16).count()
    assert kept == 1   # only the 44-wide jpeg passes a >=16 gate


def test_image_ahash_and_visual_near_dup(spark):
    """Same image + mild noise lands within a few hamming bits; a
    different image does not; corrupt payloads hash null and never
    pair."""
    import numpy as np
    from pyspark.sql import Row, functions as F

    from tap_airbyte_wrapper_spark.functions import (
        image_ahash,
        image_near_dup_pairs,
    )
    from tap_airbyte_wrapper_spark.functions.codecs import encode_png

    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (32, 32, 3)).astype("uint8")
    noisy = np.clip(
        base.astype(int) + rng.randint(-6, 7, base.shape), 0, 255
    ).astype("uint8")
    other = rng.randint(0, 255, (32, 32, 3)).astype("uint8")
    df = spark.createDataFrame([
        Row(id=1, media=bytearray(encode_png(base))),
        Row(id=2, media=bytearray(encode_png(noisy))),
        Row(id=3, media=bytearray(encode_png(other))),
        Row(id=4, media=bytearray(b"corrupt")),
    ])
    hashes = {r.id: r.h for r in df.select(
        "id", image_ahash(F.col("media")).alias("h")).collect()}
    assert hashes[4] is None
    assert hashes[1] is not None and hashes[1] != hashes[3]
    ham12 = bin((hashes[1] ^ hashes[2]) & ((1 << 64) - 1)).count("1")
    assert ham12 <= 6

    pairs = {(r.id_a, r.id_b): r.hamming for r in image_near_dup_pairs(
        df, "id", "media", max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    assert not any(4 in p for p in pairs)


def test_audio_ahash_near_dup(spark):
    """Same tone sequence with mild noise/gain pairs; different
    sequence does not — the shared hamming machinery covers audio."""
    import io
    import struct
    import wave

    import numpy as np
    from pyspark.sql import Row, functions as F

    from tap_airbyte_wrapper_spark.functions import (
        audio_ahash,
        hamming_near_dup_pairs,
    )

    def wav_bytes(sig):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(8000)
            pcm = (np.clip(sig, -1, 1) * 32767).astype("<i2")
            f.writeframes(pcm.tobytes())
        return buf.getvalue()

    rng = np.random.RandomState(5)
    t = np.arange(8000) / 8000.0
    # bursts of tone separated by silence -> distinctive energy profile
    base = np.sin(2 * np.pi * 440 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
    noisy = base * 0.8 + rng.standard_normal(len(t)) * 0.01
    other = np.sin(2 * np.pi * 440 * t) * (np.cos(2 * np.pi * 5 * t) > 0.3)
    df = spark.createDataFrame([
        Row(id=1, media=bytearray(wav_bytes(base))),
        Row(id=2, media=bytearray(wav_bytes(noisy))),
        Row(id=3, media=bytearray(wav_bytes(other))),
        Row(id=4, media=bytearray(b"not audio")),
    ])
    hashed = df.select("id", audio_ahash(F.col("media")).alias("sh"))
    got = {r.id: r.sh for r in hashed.collect()}
    assert got[4] is None and got[1] is not None
    pairs = {(r.id_a, r.id_b) for r in hamming_near_dup_pairs(
        hashed, "id", max_hamming=6).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs
