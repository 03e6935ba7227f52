"""Time-series operators: bucket resampling and gap filling.

The hypertable-style surface an event/metric pipeline needs on top of
raw timestamped rows (the reference carries cursor timestamps but has
no temporal algebra at all):

* :func:`resample` — fixed-width time-bucket aggregation.  One shuffle
  on (keys, bucket) with map-side partial aggregation; buckets come
  from integer epoch division, so the expression is codegen'd and
  joins/unions across resampled frames line up exactly.
* :func:`gap_fill` — materialize missing buckets on a per-key grid and
  fill values: ``"null"`` (just the grid), ``"locf"`` (last
  observation carried forward) or ``"linear"`` (interpolate between
  the neighbouring observations).

Scale shape: the grid explodes ``sequence(min_bucket, max_bucket)``
per key — one row per (key, bucket), which is the OUTPUT size, so no
blow-up beyond what the caller asked for.  Fills are window functions
over (key ORDER BY bucket): one shuffle, no joins, no driver state.
A key whose span is huge relative to ``step`` yields a long grid —
that is inherent to the ask (cap spans upstream if not).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["time_bucket", "resample", "gap_fill", "rolling_stats",
           "detect_anomalies"]


def time_bucket(ts: Column, step_seconds: int) -> Column:
    """Epoch-aligned bucket start (timestamp) for ``ts``.  NTZ-tolerant
    (hops through TIMESTAMP like the rest of the engine)."""
    epoch = ts.cast("timestamp").cast("long")
    start = (epoch - (epoch % F.lit(step_seconds))).cast("long")
    return F.timestamp_seconds(start)


def resample(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    keys: str | Sequence[str] | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Aggregate rows into fixed ``step_seconds`` buckets per key.

    ``aggs`` maps output column -> aggregate Column; default counts
    rows.  Output: (keys..., bucket, aggs...).
    """
    keys = [] if keys is None else ([keys] if isinstance(keys, str) else list(keys))
    aggs = aggs or {"n": F.count(F.lit(1))}
    bucket = time_bucket(F.col(ts_col), step_seconds).alias("bucket")
    return (
        df.groupBy(*[F.col(k) for k in keys], bucket)
        .agg(*[a.alias(name) for name, a in aggs.items()])
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    step_seconds: int,
    how: str = "locf",
) -> DataFrame:
    """Fill missing buckets of an already-resampled frame.

    Input: one row per (key, bucket) with possibly-missing buckets.
    Output: one row per (key, every bucket between that key's min and
    max), ``value_col`` filled per ``how``:

    * ``"null"``  — grid only, absent buckets carry null;
    * ``"locf"``  — last observation carried forward (leading gap stays
      null);
    * ``"linear"`` — linear interpolation between the neighbouring
      observations (leading/trailing gaps stay null).

    All fills are expressed as window functions over
    ``(key ORDER BY bucket)`` — one shuffle total, including the grid
    explode, which reuses the same partitioning.
    """
    if how not in ("null", "locf", "linear"):
        raise ValueError(f"unknown fill {how!r}")
    step = F.lit(step_seconds)
    b = F.col(bucket_col).cast("timestamp").cast("long")
    span = df.groupBy(key_col).agg(
        F.min(b).alias("__lo"), F.max(b).alias("__hi"))
    grid = span.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step))
        .alias("__bucket_s"),
    )
    actual = df.select(
        F.col(key_col), b.alias("__bucket_s"),
        F.col(value_col).alias("__v"))
    joined = grid.join(actual, on=[key_col, "__bucket_s"], how="left")

    w = Window.partitionBy(key_col).orderBy("__bucket_s")
    if how == "null":
        filled = F.col("__v")
    elif how == "locf":
        filled = F.last("__v", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0))
    else:  # linear
        prev_v = F.last("__v", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0))
        next_v = F.first("__v", ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing))
        prev_t = F.last(
            F.when(F.col("__v").isNotNull(), F.col("__bucket_s")),
            ignorenulls=True,
        ).over(w.rowsBetween(Window.unboundedPreceding, 0))
        next_t = F.first(
            F.when(F.col("__v").isNotNull(), F.col("__bucket_s")),
            ignorenulls=True,
        ).over(w.rowsBetween(0, Window.unboundedFollowing))
        frac = (F.col("__bucket_s") - prev_t) / (next_t - prev_t)
        filled = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v + (next_v - prev_v) * frac,
            )
        )
    return joined.select(
        F.col(key_col),
        F.timestamp_seconds(F.col("__bucket_s")).alias(bucket_col),
        filled.alias(value_col),
    )


def rolling_stats(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 20,
    include_current: bool = False,
) -> DataFrame:
    """Trailing ``window_rows``-row rolling mean / sample-stddev / count
    of ``value_col`` per key, ordered by ``order_cols`` (pass a
    tiebreaker column — e.g. the event id — after the timestamp so the
    frame is deterministic under ties).

    ``include_current=False`` (default) excludes the current row from
    its own statistics — the form anomaly detection needs, so an
    outlier can't launder itself into its own baseline.

    One shuffle on the key; both aggregates share the single sliding
    ROWS frame (Spark evaluates them in one pass over each frame).
    Parallelism = key cardinality — right for high-cardinality keys
    (users, devices, series ids).  A FEW giant keys serialize; route
    those through :func:`resample` first (bucketing collapses row
    count) or sub-key by time range.
    """
    # frame holds exactly window_rows rows: [cur-N+1, cur] including the
    # current row, [cur-N, cur-1] excluding it
    hi = 0 if include_current else -1
    lo = -window_rows + 1 if include_current else -window_rows
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(lo, hi)
    )
    v = F.col(value_col)
    return df.select(
        "*",
        F.avg(v).over(w).alias("roll_mean"),
        F.stddev_samp(v).over(w).alias("roll_std"),
        F.count(v).over(w).alias("roll_n"),
    )


def detect_anomalies(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 20,
    threshold: float = 3.0,
    min_baseline: int = 5,
) -> DataFrame:
    """Rolling z-score anomaly detection: flag rows whose value sits
    more than ``threshold`` sample standard deviations from the mean of
    the TRAILING ``window_rows`` observations of the same key (current
    row excluded from its own baseline).  Rows with fewer than
    ``min_baseline`` trailing observations, or a degenerate (null /
    zero) baseline stddev, are never flagged — a cold-start series
    must not alarm on its second point.

    Returns only the anomalous rows, with ``roll_mean``, ``roll_std``
    and the ``zscore`` (rounded to 6) attached.  Same single-shuffle
    scale shape as :func:`rolling_stats`.
    """
    stats = rolling_stats(
        df, key_col, order_cols, value_col,
        window_rows=window_rows, include_current=False)
    z = (F.col(value_col) - F.col("roll_mean")) / F.col("roll_std")
    return (
        stats.withColumn("zscore", F.round(z, 6))
        .filter(
            (F.col("roll_n") >= min_baseline)
            & F.col("roll_std").isNotNull()
            & (F.col("roll_std") > 0)
            & (F.abs(F.col("zscore")) > threshold)
        )
    )
