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

# excluded from the driver's budgeted run (see pytest.ini): multi-minute tier
pytestmark = pytest.mark.slow


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


def test_raw_text_to_packed_sequences_pipeline(spark, tmp_path):
    """Round-5 curation DAG, composed end to end:

        text_lines (raw HTML-ish lines)
          -> strip_html -> LM perplexity gate -> classifier gate
          -> remove_dup_spans -> pack_sequences -> training shards

    Each operator is tested alone elsewhere; this pins the handoffs
    (id continuity through the gates, rewritten text into packing,
    packed spans into shard assignment)."""
    from tap_airbyte_wrapper_spark.functions import (
        assign_shards,
        classify,
        fit_text_classifier,
        pack_sequences,
        perplexity_filter,
        remove_dup_spans,
        strip_html,
        train_bigram_lm,
    )
    from tap_airbyte_wrapper_spark.sources import get_source

    span = "alpha beta gamma delta epsilon zeta eta theta"
    lines = (
        [f"<p>good clean document number {i} with words {span}</p>"
         for i in range(8)]
        + ["<script>x()</script><p>spam spam spam spam buy now</p>"] * 2
    )
    src_dir = tmp_path / "raw"
    src_dir.mkdir()
    (src_dir / "crawl.txt").write_text("\n".join(lines) + "\n")

    src = get_source("text_lines", {"path": str(src_dir)})
    raw = src.read(spark, list(src.discover(spark))[0])
    docs = raw.select(
        F.monotonically_increasing_id().alias("doc_id"),
        strip_html(F.col("value")).alias("text"),
    ).persist()
    assert docs.count() == 10
    assert docs.filter(F.col("text").contains("<")).count() == 0

    # LM gate: spam lines are repetitive but rare -> worse avg_nll
    lm = train_bigram_lm(docs)
    labeled = docs.withColumn(
        "y", (~F.col("text").contains("spam")).cast("int"))
    model = fit_text_classifier(labeled, "y", dim=128, n_iter=40)
    gated = perplexity_filter(docs, lm, max_avg_nll=1e9)  # keep-all band
    gated = gated.join(
        classify(gated.select("doc_id", "text"), model)
        .filter(F.col("quality_prob") > 0.5).select("doc_id"),
        "doc_id",
    )
    kept_texts = [r["text"] for r in gated.collect()]
    assert len(kept_texts) == 8 and not any("spam" in t for t in kept_texts)

    rewritten = remove_dup_spans(gated, "doc_id", "text", n=8)
    # the shared 8-token span is erased from every survivor
    assert all(span not in r["text"]
               for r in rewritten.collect())

    packed = pack_sequences(rewritten, "doc_id", "text", seq_len=16)
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    total = sum(r["n_tok"] for r in rows)
    assert rows[-1]["tok_start"] + rows[-1]["n_tok"] == total

    sharded = assign_shards(
        rewritten.join(packed.select("doc_id", "seq_start"), "doc_id"),
        "doc_id", num_shards=4)
    assert sharded.count() == 8
    assert sharded.select("shard").distinct().count() <= 4
    docs.unpersist()
