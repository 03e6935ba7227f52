"""Whole-engine user story, composed end to end:

    CDC changelog  ->  Engine sync (merge sink, versioned snapshot)
                   ->  curation (normalize -> exact dedup -> quality gate)
                   ->  chunking  ->  deterministic training shards

Each stage is its own tested operator elsewhere; this test pins the
COMPOSITION — the handoffs (snapshot schema into curation, curated rows
into shards) are where integration bugs live, and it is the exact
pipeline a reference user switching to this engine would run.
"""

import glob
import json
import os

import pytest
from pyspark.sql import Row, functions as F

from tap_airbyte_wrapper_spark.functions import (
    chunk_documents,
    exact_dedup,
    normalize_text,
    token_count,
    write_training_shards,
)
from tap_airbyte_wrapper_spark.sinks import read_merge_snapshot
from tap_airbyte_wrapper_spark.sync import Engine


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


LONG = " ".join(f"tok{i}" for i in range(40))


@pytest.fixture()
def corpus_cdc(spark, tmp_path):
    """Base: 6 docs (4+5 byte-duplicates, 6 junk-short); changes:
    rewrite doc 2, tombstone doc 3, land two new docs."""
    root = str(tmp_path / "cdc")
    spark.createDataFrame([
        Row(doc_id=1, text=f"alpha one {LONG}"),
        Row(doc_id=2, text=f"beta stale {LONG}"),
        Row(doc_id=3, text=f"gamma doomed {LONG}"),
        Row(doc_id=4, text=f"delta twin {LONG}"),
        Row(doc_id=5, text=f"delta twin {LONG}"),
        Row(doc_id=6, text="too short"),
    ]).coalesce(1).write.parquet(f"{root}/base/documents.parquet")
    _write_jsonl(f"{root}/changes/documents/log.jsonl", [
        {"doc_id": 2, "text": f"beta fresh {LONG}",
         "_op": "update", "_cursor": 11},
        {"doc_id": 3, "text": None, "_op": "delete", "_cursor": 12},
        {"doc_id": 7, "text": f"eta new {LONG}",
         "_op": "insert", "_cursor": 13},
        {"doc_id": 8, "text": f"CAFÉ   accents {LONG}",
         "_op": "insert", "_cursor": 14},
    ])
    return root


def _engine(spark, root, tmp_path):
    return Engine(spark, {
        "source": "changelog",
        "source_config": {"path": root,
                          "primary_keys": {"documents": ["doc_id"]}},
        "replication_method": {"documents": "LOG_BASED"},
        "state_path": str(tmp_path / "state.json"),
        "sink": {"type": "merge", "path": str(tmp_path / "lake")},
    })


def test_cdc_to_shards_pipeline(spark, tmp_path, corpus_cdc):
    # ---- EL: sync the changelog into a maintained snapshot ----------
    eng = _engine(spark, corpus_cdc, tmp_path)
    eng.sync()
    snap = read_merge_snapshot(spark, str(tmp_path / "lake"), "documents")
    by_id = {r["doc_id"]: r["text"] for r in snap.collect()}
    assert set(by_id) == {1, 2, 4, 5, 6, 7, 8}       # 3 tombstoned
    assert by_id[2].startswith("beta fresh")          # update applied

    # a second sync with no new changes must be a no-op on content
    eng2 = _engine(spark, corpus_cdc, tmp_path)
    eng2.sync()
    snap2 = read_merge_snapshot(spark, str(tmp_path / "lake"), "documents")
    assert {r["doc_id"]: r["text"] for r in snap2.collect()} == by_id

    # ---- curate: normalize -> exact dedup -> quality gate -----------
    curated = (
        snap2.select(
            "doc_id",
            normalize_text(F.col("text"), strip_accents=True,
                           collapse_whitespace=True).alias("text"))
        .transform(lambda df: exact_dedup(df, "text", "doc_id"))
        .filter(token_count(F.col("text")) >= 10)
    )
    kept = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert set(kept) == {1, 2, 4, 7, 8}   # 5 deduped into 4, 6 gated out
    assert kept[8].startswith("CAFE accents")  # accents stripped, ws collapsed

    # ---- chunk + shard ----------------------------------------------
    chunks = chunk_documents(curated, chunk_tokens=16, overlap=4)
    assert chunks.count() > curated.count()   # 42-token docs -> 4 windows
    assert chunks.agg(F.max("n_tokens")).collect()[0][0] <= 16

    shards_dir = str(tmp_path / "shards")
    write_training_shards(
        chunks.withColumn(
            "chunk_key",
            F.concat_ws("-", F.col("doc_id"), F.col("chunk_id"))),
        shards_dir, id_col="chunk_key", num_shards=4)
    back = spark.read.parquet(shards_dir)
    assert back.count() == chunks.count()
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) \
        <= {0, 1, 2, 3}
    # deterministic: a second write produces identical shard membership
    again_dir = str(tmp_path / "shards2")
    write_training_shards(
        chunks.withColumn(
            "chunk_key",
            F.concat_ws("-", F.col("doc_id"), F.col("chunk_id"))),
        again_dir, id_col="chunk_key", num_shards=4)
    a = sorted((r["chunk_key"], r["shard"]) for r in
               spark.read.parquet(shards_dir)
               .select("chunk_key", "shard").collect())
    b = sorted((r["chunk_key"], r["shard"]) for r in
               spark.read.parquet(again_dir)
               .select("chunk_key", "shard").collect())
    assert a == b
    assert glob.glob(shards_dir + "/shard=*/part-*.parquet")
