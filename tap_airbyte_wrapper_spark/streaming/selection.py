"""Streaming DSIR selection gate: score every arriving micro-batch
against a PERSISTED importance model (:func:`~..functions.dsir.dsir_fit`
+ :func:`~..functions.dsir.save_dsir`, fit offline on a trusted target
corpus vs a pool snapshot) and land only documents whose importance
log-weight clears ``min_logw`` — the "does this look like the data we
want more of?" admission control an ingest pipeline runs next to the
dedup gates.

Unlike the dedup gates this one is STATELESS: the model is fixed, so a
batch's survivor set is a pure function of the batch (scores are
engine- and partitioning-deterministic — see ``functions/dsir.py``),
and at-least-once ``foreachBatch`` replays land byte-identical output
into the same ``batch=<id>`` directory.  No index grows; refresh the
model offline (refit + ``save_dsir`` to a new path) when the pool
drifts — the same never-retrain-in-stream policy as the IVF gate's
centroids.

Cost per batch: O(batch) — one gram scan of the batch with the
≤ ``buckets``-row log-ratio table broadcast.  The model loads once per
query (driver-side, two metadata-sized parquet reads) and is reused
across batches via the closure cache.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..functions.dsir import dsir_score, load_dsir
from .stats import append_gate_stats

__all__ = ["stream_dsir_gate"]


def stream_dsir_gate(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    model_path: str,
    min_logw: float,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start the gate; returns the ``StreamingQuery``.  Survivor rows
    keep all input columns plus their ``logw`` score (downstream
    mixture weighting reuses it — no rescore)."""
    cached: dict = {}

    def gate(batch: DataFrame, batch_id: int) -> None:
        import time as _time

        started = _time.time()
        spark = batch.sparkSession
        if "model" not in cached:
            cached["model"] = load_dsir(spark, model_path)
        batch = batch.persist()
        try:
            scored = dsir_score(batch, cached["model"], id_col, text_col)
            clean = (
                batch.join(
                    scored.filter(F.col("logw") >= min_logw)
                    .select(id_col, "logw"), id_col)
                .persist()
            )
            clean.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch={batch_id}"))
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
