"""Structured Streaming incremental sync.

The reference's incremental model is batch bookmarks: cursor state handed
to the connector, new STATE merged after records flow (tap.py:819-884).
Structured Streaming supplies the same contract with stronger guarantees —
the checkpoint directory IS the bookmark store (exactly-once sink commits
replace the at-least-once STATE ordering of SURVEY.md §4.3):

* ``stream_source`` — file-stream reader over a growing directory,
  schema-pinned (discovery runs once, batch-side);
* ``incremental_sync`` — readStream -> optional transform -> sink with
  checkpointing; ``availableNow`` trigger gives the batch-like "drain
  what's new, then stop" semantics of a tap run, so each invocation is one
  incremental sync;
* ``windowed_counts`` / ``sessionized`` — watermarked event-time
  aggregation for late data, the streaming analogues of the batch cube/
  sessionization queries.

Scale notes: maxFilesPerTrigger bounds per-micro-batch work; watermark
bounds state-store size (without it, windowed aggregation state grows
unboundedly at 100 TB/day event volume).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql import types as T


def stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream over a directory new files land in.  Schema must be
    pinned (from batch discovery) — streaming readers do not infer."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def incremental_sync(
    source: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
    available_now: bool = True,
    output_mode: str = "append",
) -> StreamingQuery:
    """One incremental sync run: drain new data through the transform into
    the sink; the checkpoint carries the 'bookmark' across runs.

    ``available_now=True`` = tap semantics (process backlog, stop);
    ``False`` = continuous micro-batches.
    """
    df = transform(source) if transform else source
    writer = (
        df.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _with_event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; tolerate TIMESTAMP_NTZ event-time
    columns (naive parquet under Spark 4's NTZ inference) by casting —
    identity under the engine's pinned-UTC session."""
    if isinstance(events.schema[ts_col].dataType, T.TimestampNTZType):
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding event-time counts.

    The watermark bounds state: rows later than ``watermark`` behind the
    max seen event time are dropped and their windows finalized."""
    keys = keys or []
    events = _with_event_time(events, ts_col)
    w = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(
        F.col(ts_col), window_duration)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w, *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys, "n", "sum_value",
        )
    )


def sessionized(
    events: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) with watermark — the streaming analogue
    of the batch lag+cumsum sessionization query."""
    events = _with_event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            key, "n_events",
        )
    )


def deduped_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-per-key delivery from an at-least-once source: drop
    duplicate keys across micro-batches.

    With ``ts_col`` the state is bounded by the watermark
    (``dropDuplicatesWithinWatermark`` — a key older than the watermark
    can be forgotten, so state does not grow with the stream); without it
    the dedup state is unbounded (only for finite backfills).  This is
    the streaming analogue of the reference's PK metadata finally doing
    something (reference tap.py:934-943 carries PKs but never dedups)."""
    if ts_col:
        return _with_event_time(events, ts_col) \
            .withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def run_available_now(query: StreamingQuery, timeout_sec: float = 120.0) -> None:
    """Block until an availableNow query drains and stops."""
    query.awaitTermination(timeout_sec)
    if query.isActive:  # pragma: no cover - defensive
        query.stop()


def resume_info(checkpoint_path: str) -> dict[str, Any]:
    """Human-readable view of what the checkpoint has committed — the
    streaming analogue of reading the bookmark store."""
    import json
    import os

    out: dict[str, Any] = {"checkpoint": checkpoint_path, "batches": []}
    commits = os.path.join(checkpoint_path, "commits")
    if os.path.isdir(commits):
        out["batches"] = sorted(
            int(f) for f in os.listdir(commits) if f.isdigit()
        )
    offsets = os.path.join(checkpoint_path, "offsets")
    if os.path.isdir(offsets) and out["batches"]:
        last = os.path.join(offsets, str(out["batches"][-1]))
        if os.path.exists(last):
            with open(last) as f:
                lines = f.read().strip().split("\n")
            try:
                out["last_offset"] = json.loads(lines[-1])
            except Exception:
                out["last_offset"] = lines[-1]
    return out


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream equi+interval join: pair left rows with right rows
    of the same key whose event time falls in
    ``[left_ts + lower, left_ts + upper]`` — the streaming analogue of
    the batch binned range join (``operators/joins.py`` range_join).

    Both sides carry watermarks and the join condition bounds the time
    range in BOTH directions, which is what lets Spark expire join
    state: a buffered left row can be dropped once the right watermark
    passes ``left_ts + upper``.  Without the range bound, stream-stream
    join state grows forever — the 100 TB/day failure mode.

    Right-side columns (except the keys) are prefixed with
    ``right_prefix`` so both sides' payloads survive the join.
    """
    l_ = _with_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r_ = _with_event_time(right, right_ts).withWatermark(right_ts, watermark)
    # exact prefixed output names — selecting by startswith(right_prefix)
    # over joined.columns would double-select a LEFT column that happens
    # to start with the prefix (and raise on ambiguity if right shares
    # the unprefixed name)
    prefixed = [f"{right_prefix}{c}" for c in right.columns if c not in keys]
    r_ = r_.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{right_prefix}{c}")
          for c in right.columns if c not in keys],
    )
    rts = f"{right_prefix}{right_ts}"
    cond = None
    for k in keys:
        c = l_[k] == r_[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col(rts) >= F.expr(f"{left_ts} + INTERVAL {lower}"))
        & (F.col(rts) <= F.expr(f"{left_ts} + INTERVAL {upper}"))
    )
    joined = l_.join(r_, cond)
    # drop the duplicated key columns from the right side
    return joined.select(
        *[l_[c] for c in left.columns],
        *[r_[c] for c in prefixed],
    )
