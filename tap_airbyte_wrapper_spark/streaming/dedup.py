"""Streaming near-duplicate gate: every arriving micro-batch dedups
against EVERYTHING seen so far at O(batch) cost.

The batch-side machinery already exists — a persisted bucketed
MinHash-LSH index (``functions.dedup.minhash_index_write``) and the
delta prober (``minhash_dedup_delta``).  This module closes the loop
for continuous arrival: ``foreachBatch`` probes the batch against the
index, keeps the survivors, lands them, and folds them INTO the index
(``minhash_index_append``), so the next batch dedups against them too.

Replay safety (a crashed micro-batch re-runs under Structured
Streaming's at-least-once foreachBatch contract):

* a replayed doc is already in the index and matches ITSELF — corpus
  hits with ``id_a == id_b`` are therefore excluded from the drop
  set, so the replay keeps exactly the docs the first run kept;
* output lands per-batch in ``{out}/batch={id}`` with overwrite, so a
  re-run overwrites its own directory instead of duplicating rows;
* the index append is guarded by a ``_batch_<id>`` marker written
  AFTER the append.  The marker is an optimization, not a correctness
  gate: a crash between append and marker re-appends on replay, which
  only inflates the index (candidate pairs are ``distinct``-ed and
  the drop set is ``distinct``-ed, so duplicated postings/signatures
  never change the gate's output — run ``minhash_index_compact``
  on the index periodically anyway; the flat ``compact_parquet``
  would drop the bucket metadata).  The marker IO uses local-FS ``os.path``
  and is best-effort: on an object-store ``index_path`` the existence
  check never fires and the write failure is swallowed, so every
  replay re-appends (more index growth, same gate output) instead of
  skipping.

Cost per batch: O(batch) signatures + a bucket-co-located join against
the index (zero corpus shuffle, same plan the batch delta-dedup tests
assert) + an O(batch) append.  The stream never pays O(corpus).

Each drained batch appends a ``(batch_id, n_in, n_kept, n_dropped,
wall_seconds)`` row under ``{out}/_gate_stats`` (best-effort, see
:mod:`.stats`) — the drop-rate audit trail.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..functions.dedup import minhash_dedup_delta, minhash_index_append
from .stats import append_gate_stats

__all__ = ["stream_near_dup_gate"]


def stream_near_dup_gate(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    index_table: str,
    index_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Start the gate on a streaming DataFrame; returns the query.

    Requires the index to exist (bootstrap with
    ``minhash_index_write`` — on an empty corpus DataFrame is fine).
    Survivor rows land under ``{out_path}/batch=<id>/``; read the
    clean corpus back with ``spark.read.parquet(out_path)``.
    """

    def gate(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        started = _time.time()
        batch = batch.persist()
        try:
            dupes = minhash_dedup_delta(
                batch, index_table, index_path, id_col, text_col,
                threshold=threshold)
            drop = (
                dupes.filter(
                    (F.col("kind") == "corpus")
                    & (F.col("id_a") != F.col("id_b"))
                ).select(F.col("id_a").alias(id_col))
                .unionByName(
                    # within-batch: id_a < id_b, keep the min id
                    dupes.filter(F.col("kind") == "delta")
                    .select(F.col("id_b").alias(id_col)))
                .distinct()
            )
            clean = batch.join(drop, id_col, "left_anti").persist()
            clean.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch={batch_id}"))
            from ..fsutil import exists as _fs_exists, \
                write_text as _fs_write
            spark = batch.sparkSession
            marker = os.path.join(index_path, f"_batch_{batch_id}")
            if not _fs_exists(spark, marker):
                minhash_index_append(
                    clean, index_table, index_path, id_col, text_col)
                try:
                    # Hadoop-FS write: works on object-store index paths
                    _fs_write(spark, marker, "done")
                except Exception:
                    # best-effort replay marker — never kill the stream
                    pass
            append_gate_stats(batch.sparkSession, out_path, batch_id,
                              batch.count(), clean.count(), started)
            clean.unpersist()
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(gate).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
