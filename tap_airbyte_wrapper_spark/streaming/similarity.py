"""Streaming embedding near-duplicate gate: every arriving micro-batch
of vectors dedups against EVERYTHING seen so far at O(batch) cost — the
ANN mirror of :mod:`.dedup`'s MinHash gate, closing the round-5 gap
(the embedding side could build/probe a persisted IVF index but not
fold survivors back in).

Loop per batch: probe the batch against the persisted IVF index
(:func:`~..functions.similarity.embedding_dedup_delta` — the probe join
touches ~n_probe/n_clusters of the corpus FILES, __cell is the
partition column), drop corpus-duplicates and within-batch losers, land
the survivors, then :func:`~..functions.similarity.ivf_append` them so
the next batch dedups against them too.

Replay safety (at-least-once ``foreachBatch``): identical reasoning to
the MinHash gate — a replayed vector is already in the index and
matches ITSELF, and ``ivf_search`` excludes ``id == query_id`` pairs,
so corpus hits only ever name OTHER vectors; batch-mates that lost the
within-batch tie on the first run were never appended, so on replay
they lose again via a corpus hit against the appended winner.  Output
lands per-batch in ``{out}/batch=<id>`` with overwrite; the index
append is guarded by a best-effort ``_batch_<id>`` marker (a re-append
after a crash between append and marker only duplicates rows in the
index — the drop set is ``distinct``-ed, so the gate's output never
changes; compact the index periodically with ``ivf_compact`` —
layout-preserving, unlike the flat ``compact_parquet``).

Centroid staleness: the quantizer is NEVER retrained inside the stream
(moving cell boundaries would strand the already-assigned corpus — see
``ivf_append``).  Each batch checks :func:`ivf_staleness` and logs a
warning once appended rows exceed ``retrain_factor`` x the training
corpus; the operator then rebuilds offline with ``ivf_build`` over
``spark.read.parquet(out_path)`` and swaps the index path.

Cost per batch: O(batch) cell assignments + a probe join pruned to the
probed cells + an O(batch) append.  The stream never pays O(corpus).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, functions as F

from ..functions.similarity import IvfIndex, embedding_dedup_delta, \
    ivf_append, ivf_load, ivf_staleness
from .stats import append_gate_stats

__all__ = ["stream_embedding_gate"]

logger = logging.getLogger(__name__)


def stream_embedding_gate(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.9,
    n_probe: int = 4,
    k: int = 20,
    retrain_factor: float = 1.0,
    available_now: bool = True,
):
    """Start the gate on a streaming DataFrame; returns the query.

    Requires the index to exist (bootstrap with ``ivf_build(path=...)``
    over an initial corpus — the quantizer needs training vectors, so
    unlike the MinHash gate an EMPTY bootstrap is not possible; train
    on the first batch if there is no backfill corpus).  Survivor rows
    land under ``{out_path}/batch=<id>/``; read the clean corpus back
    with ``spark.read.parquet(out_path)``.
    """

    # The quantizer is never retrained inside the stream (see module
    # docstring), so centroids and the meta's built_rows are IMMUTABLE
    # for the life of the query: load them on the first batch and reuse
    # — only the vectors read (appended every batch) must be fresh.
    cached: dict = {}

    def gate(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        started = _time.time()
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            if "cent" not in cached:
                # only the centroid array and built_rows are immutable
                # — caching a full ivf_load would pin a vectors frame
                # that goes stale on the first append
                cached["cent"] = ivf_load(
                    spark, index_path, id_col, vec_col).centroids
                cached["built"] = spark.read.parquet(
                    f"{index_path}/meta").collect()[0]["built_rows"]
            index = IvfIndex(
                cached["cent"],
                spark.read.parquet(f"{index_path}/vectors"),
                id_col, vec_col)
            dupes = embedding_dedup_delta(
                index, batch, threshold=threshold, n_probe=n_probe, k=k)
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
                ivf_append(spark, index_path, clean, id_col, vec_col,
                           centroids=cached["cent"])
                try:
                    # Hadoop-FS write: works on object-store index paths
                    _fs_write(spark, marker, "done")
                except Exception:
                    # best-effort replay marker — never kill the stream
                    pass
            stale = ivf_staleness(spark, index_path, retrain_factor,
                                  built_rows=cached["built"])
            if stale["needs_retrain"]:
                logger.warning(
                    "IVF index at %s has grown %.1fx past its training "
                    "corpus (%d appended vs %d built) — rebuild the "
                    "quantizer offline with ivf_build over the landed "
                    "corpus", index_path, stale["append_ratio"],
                    stale["appended_rows"], stale["built_rows"])
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
