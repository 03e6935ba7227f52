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
  would drop the bucket metadata).  Marker IO goes through the Hadoop
  FS API (``fsutil``), so object-store index paths get the same replay
  skip; a failed marker write is swallowed and the replay re-appends
  (more index growth, same gate output).

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

__all__ = ["stream_near_dup_gate", "stream_exact_dedup_gate",
           "stream_simhash_gate"]


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


def stream_exact_dedup_gate(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    index_table: str,
    index_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming EXACT-dedup gate: every micro-batch drops docs whose
    normalized text was already seen (in the corpus index or earlier in
    the same batch), lands the survivors, and folds their ``(fp, id)``
    rows into the persisted index — the exact-match counterpart of
    :func:`stream_near_dup_gate`, and the cheaper gate to run FIRST
    (a re-crawl corpus is mostly byte-identical repeats; the near-dup
    gate then only pays signatures for texts that are genuinely new).

    Replay safety mirrors the near-dup gate exactly: the index stores
    the survivor's id with each fingerprint, so a replayed survivor
    matches ITSELF and is kept (the drop test is "same fp, DIFFERENT
    id"), a replayed loser loses to the same min-id winner again, and
    a doc the first run dropped via the corpus index still hits that
    other-id row — the survivor set is a pure function of (batch,
    index-before-batch).  Output lands per-batch with overwrite; the
    ``_batch_<id>`` Hadoop-FS marker only skips the (idempotent)
    re-append.  Requires a bootstrapped index
    (``fingerprint_index_write`` — an empty corpus frame is fine).
    """
    from ..functions.dedup import (
        fingerprint_dedup_delta,
        fingerprint_index_append,
    )

    def gate(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        from ..fsutil import exists as _fs_exists, write_text as _fs_write

        started = _time.time()
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            clean = fingerprint_dedup_delta(
                batch, index_table, id_col, text_col).persist()
            clean.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch={batch_id}"))
            marker = os.path.join(index_path, f"_batch_{batch_id}")
            if not _fs_exists(spark, marker):
                fingerprint_index_append(
                    clean, index_table, id_col, text_col)
                try:
                    _fs_write(spark, marker, "done")
                except Exception:
                    pass  # best-effort marker — never kill the stream
            append_gate_stats(spark, out_path, batch_id,
                              batch.count(), clean.count(), started)
            clean.unpersist()
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(gate).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_simhash_gate(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    index_table: str,
    index_path: str,
    out_path: str,
    checkpoint: str,
    max_hamming: int | None = None,
    available_now: bool = True,
):
    """Streaming HAMMING near-dup gate over the persisted SimHash index
    (:func:`~..functions.dedup.simhash_index_write`) — the small-edit
    counterpart of :func:`stream_near_dup_gate`: MinHash catches
    shingle-set overlap, SimHash catches token-distribution twins whose
    shingles differ (reorderings, boilerplate-wrapped bodies).  Every
    micro-batch probes at O(batch) (corpus scan bucket-co-located),
    drops docs within ``max_hamming`` of a DIFFERENT live corpus doc or
    losing a within-batch min-id contest, lands survivors, folds their
    segments into the index.

    Replay safety mirrors the other index gates: the segment rows carry
    ids, so a replayed survivor matches ITSELF (id_a == id_b corpus
    pair, not a drop), a replayed loser loses to the same winner again;
    the ``_batch_<id>`` marker only skips the re-append.  Bootstrap with
    ``simhash_index_write`` (an empty corpus frame is fine)."""
    from ..functions.dedup import simhash_dedup_delta, simhash_index_append

    def gate(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        from ..fsutil import exists as _fs_exists, write_text as _fs_write

        started = _time.time()
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            dupes = simhash_dedup_delta(
                batch, index_table, index_path, id_col, text_col,
                max_hamming=max_hamming)
            drop = (
                dupes.filter(
                    (F.col("kind") == "corpus")
                    & (F.col("id_a") != F.col("id_b"))
                ).select(F.col("id_a").alias(id_col))
                .unionByName(
                    dupes.filter(F.col("kind") == "delta")
                    .select(F.col("id_b").alias(id_col)))
                .distinct()
            )
            clean = batch.join(drop, id_col, "left_anti").persist()
            clean.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch={batch_id}"))
            marker = os.path.join(index_path, f"_batch_{batch_id}")
            if not _fs_exists(spark, marker):
                simhash_index_append(
                    clean, index_table, index_path, id_col, text_col)
                try:
                    _fs_write(spark, marker, "done")
                except Exception:
                    pass  # best-effort marker — never kill the stream
            append_gate_stats(spark, out_path, batch_id,
                              batch.count(), clean.count(), started)
            clean.unpersist()
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(gate).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_media_dedup_gate(
    stream: DataFrame,
    id_col: str,
    media_col: str,
    index_table: str,
    index_path: str,
    out_path: str,
    checkpoint: str,
    max_hamming: int | None = None,
    available_now: bool = True,
):
    """Streaming CONTAINER-LEVEL media near-dup gate over the persisted
    media-signature index
    (:func:`~..functions.multimodal.media_sig_index_write`) — the
    decode-free asset twin of :func:`stream_simhash_gate`: every
    micro-batch of binary assets probes at O(batch) (one probe +
    byte-window-signature Arrow pass; corpus scan bucket-co-located),
    drops assets within ``max_hamming`` of a DIFFERENT live corpus
    asset (remuxed re-uploads, tail-trimmed copies) or losing a
    within-batch min-id contest, lands survivors, folds their segments
    into the index.  Assets no probe recognizes pass through — this
    gate only speaks container formats; unknown bytes are someone
    else's policy decision.

    Replay safety mirrors the other index gates: a replayed survivor
    matches ITSELF (id_a == id_b corpus pair, not a drop); the
    ``_batch_<id>`` marker only skips the re-append.  Bootstrap with
    ``media_sig_index_write`` (an empty corpus frame is fine)."""
    from ..functions.multimodal import (media_dedup_delta,
                                        media_sig_index_append)

    def gate(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        from ..fsutil import exists as _fs_exists, write_text as _fs_write

        started = _time.time()
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            dupes = media_dedup_delta(
                batch, index_table, index_path, id_col, media_col,
                max_hamming=max_hamming)
            drop = (
                dupes.filter(
                    (F.col("kind") == "corpus")
                    & (F.col("id_a") != F.col("id_b"))
                ).select(F.col("id_a").alias(id_col))
                .unionByName(
                    dupes.filter(F.col("kind") == "delta")
                    .select(F.col("id_b").alias(id_col)))
                .distinct()
            )
            clean = batch.join(drop, id_col, "left_anti").persist()
            clean.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch={batch_id}"))
            marker = os.path.join(index_path, f"_batch_{batch_id}")
            if not _fs_exists(spark, marker):
                media_sig_index_append(
                    clean, index_table, index_path, id_col, media_col)
                try:
                    _fs_write(spark, marker, "done")
                except Exception:
                    pass  # best-effort marker — never kill the stream
            append_gate_stats(spark, out_path, batch_id,
                              batch.count(), clean.count(), started)
            clean.unpersist()
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(gate).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
