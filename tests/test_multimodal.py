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


def test_decode_image_real_raises(media):
    out = decode_image(media.select("id", "media_bundle"), "media_bundle", fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
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
    with pytest.raises(Exception, match="NotImplementedError|codec"):
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
