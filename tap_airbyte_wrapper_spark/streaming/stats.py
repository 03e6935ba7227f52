"""Per-batch gate observability: one appended parquet row per
micro-batch under ``{out_path}/_gate_stats`` — the throughput/drop-rate
audit an operator reads BEFORE trusting a continuously-deduped corpus
(a drop-rate spike is the first symptom of index corruption, a bad
threshold, or upstream replay).

Best-effort by contract: a stats write failure logs and never kills the
stream (same discipline as the gates' append markers).  The row is a
JVM-literal frame — a Python-RDD-backed 1-row write would pay a python
worker round-trip per default-parallelism slice (~4 s on local[32]).
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import functions as F

__all__ = ["append_gate_stats", "read_gate_stats"]

logger = logging.getLogger(__name__)


def append_gate_stats(spark, out_path: str, batch_id: int,
                      n_in: int, n_kept: int, started: float) -> None:
    """Append one ``(batch_id, n_in, n_kept, n_dropped, wall_seconds)``
    row for a drained micro-batch.  Batch ids repeat on replay (the
    gates re-run a batch under at-least-once foreachBatch) — readers
    should take the LAST row per batch_id."""
    try:
        spark.range(1).select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            F.lit(int(n_in)).cast("long").alias("n_in"),
            F.lit(int(n_kept)).cast("long").alias("n_kept"),
            F.lit(int(n_in - n_kept)).cast("long").alias("n_dropped"),
            F.lit(round(time.time() - started, 3)).alias("wall_seconds"),
        ).coalesce(1).write.mode("append").parquet(
            f"{out_path}/_gate_stats")
    except Exception:
        logger.warning("gate stats append failed for batch %d (stream "
                       "continues)", batch_id, exc_info=True)


def read_gate_stats(spark, out_path: str):
    """The gate's stats table, deduped to the last row per batch_id
    (replays overwrite their batch's row, matching the gates' own
    last-write-wins output contract)."""
    from pyspark.sql import Window

    df = spark.read.parquet(f"{out_path}/_gate_stats")
    w = Window.partitionBy("batch_id").orderBy(F.desc("wall_seconds"))
    # wall_seconds is not a reliable replay ordering; any deterministic
    # pick works because a replayed batch lands identical counts
    return (df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1).drop("__rk"))
