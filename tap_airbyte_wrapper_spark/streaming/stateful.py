"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two operators the built-in windowed aggregations cannot express:

* :func:`stateful_running_stats` — per-key lifetime aggregates (count /
  sum / max event-time) maintained in the state store and re-emitted on
  every micro-batch that touches the key.  Unlike a windowed agg, the
  state never ages out: it is the streaming analogue of a continuously
  maintained per-user profile.

* :func:`stateful_max_cursor` — the reference's STATE accumulator
  (``/root/reference/tap_airbyte/tap.py:819-884``) re-expressed as a
  stateful operator: one state row per stream key holding the max cursor
  seen; each micro-batch emits the updated bookmark, and the checkpoint
  makes the bookmark durable across runs (the three-dialect JSON merge of
  the reference collapses to per-key state + checkpoint).

Scale notes: state lives in the executor state store (RocksDB-backed on a
real cluster — ``spark.sql.streaming.stateStore.providerClass``), keyed
and partitioned by the grouping key, so state size scales horizontally
with executors, not with the driver.  Arrow batches flow through the
Python worker per key-group; keep per-key state tiny (fixed-width
scalars here) so 1e9 keys is bounded by the store, not Python.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_running_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key lifetime (n_events, sum_value, max_ts) maintained across
    micro-batches.  Output mode must be ``update``."""

    out_schema = (
        f"{key_col} long, n_events long, sum_value double, max_ts_us long"
    )
    state_schema = "n long, s double, mx long"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            n, s, mx = state.get
        else:
            n, s, mx = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
            batch_mx = pdf[ts_col].max()
            if pd.notna(batch_mx):
                batch_us = int(batch_mx.value // 1_000)
                mx = batch_us if mx is None else max(mx, batch_us)
        state.update((n, s, mx))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [s],
             "max_ts_us": [mx]})

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def stateful_max_cursor(
    records: DataFrame,
    stream_col: str = "stream",
    cursor_col: str = "cursor",
) -> DataFrame:
    """Per-stream max-cursor bookmark: the reference's STATE upsert
    semantics (STREAM dialect) as a stateful operator.  Emits
    (stream, bookmark, n_records_total) after every micro-batch that
    advances a stream; the checkpoint is the durable bookmark store."""

    out_schema = f"{stream_col} string, bookmark string, n_records long"
    state_schema = "bm string, n long"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        bm, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf[cursor_col].astype(str).max()
            if bm is None or (batch_max is not None and batch_max > bm):
                bm = batch_max
        state.update((bm, n))
        yield pd.DataFrame(
            {stream_col: [key[0]], "bookmark": [bm], "n_records": [n]})

    return records.groupBy(stream_col).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def stateful_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 20,
    threshold: float = 3.0,
    min_baseline: int = 5,
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.detect_anomalies``: a
    per-key ring buffer of the last ``window_rows`` values lives in the
    state store; every arriving row is z-scored against the TRAILING
    buffer (itself excluded), flagged when ``|z| > threshold``, then
    appended to the buffer.  Rows with fewer than ``min_baseline``
    trailing observations, or a degenerate (zero) baseline stddev,
    never flag — identical guards to the batch operator, so a
    time-ordered replay through the stream reproduces the batch answer
    exactly (equivalence-tested).

    Inside a micro-batch rows are processed in (ts, id) order; across
    micro-batches order is arrival order — the streaming contract.
    State per key is ``window_rows`` doubles (fixed-width, ~160 B at
    the default), so a billion keys is a state-store sizing question,
    never a driver one.  The per-batch math is vectorized: one pandas
    ``shift(1).rolling`` pass over (carried buffer + batch), not a
    Python loop per row.  Output mode must be ``append``.
    """

    out_schema = (
        f"{key_col} long, {id_col} long, ts_us long, value double, "
        "zscore double")
    state_schema = "vals array<double>"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        buf = list(state.get[0]) if state.exists else []
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            vals = pd.concat(
                [pd.Series(buf, dtype="float64"),
                 pdf[value_col].astype("float64")],
                ignore_index=True)
            roll = vals.shift(1).rolling(window=window_rows, min_periods=1)
            m = roll.mean()
            sd = roll.std(ddof=1)
            n = roll.count()
            k = len(buf)
            bm, bsd, bn = m.iloc[k:].values, sd.iloc[k:].values, n.iloc[k:].values
            v = pdf[value_col].astype("float64").values
            with np.errstate(divide="ignore", invalid="ignore"):
                z = np.round((v - bm) / bsd, 6)
            hit = ((bn >= min_baseline) & (bsd > 0)
                   & np.isfinite(z) & (np.abs(z) > threshold))
            if hit.any():
                sel = pdf.iloc[hit.nonzero()[0]]
                ts_us = (
                    sel[ts_col].astype("datetime64[ns]").astype("int64")
                    // 1_000)
                outs.append(pd.DataFrame({
                    key_col: sel[key_col].values,
                    id_col: sel[id_col].values,
                    "ts_us": ts_us.values,
                    "value": sel[value_col].astype("float64").values,
                    "zscore": z[hit],
                }))
            buf = vals.iloc[-window_rows:].tolist()
        state.update((buf,))
        for o in outs:
            yield o

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def stateful_heavy_hitters(
    events: DataFrame,
    value_col: str,
    n_buckets: int = 64,
    capacity_per_bucket: int = 1024,
) -> DataFrame:
    """Streaming frequent-elements sketch with BOUNDED state: the
    streaming twin of ``functions.corpus.heavy_hitter_values``.

    A naive streaming ``groupBy(value).count()`` keeps one state row
    per distinct value — unbounded on web-scale key domains.  Here
    values hash into ``n_buckets`` groups and each group maintains a
    Misra-Gries summary capped at ``capacity_per_bucket`` entries in
    the state store, so total state is ``n_buckets x capacity`` rows
    NO MATTER the cardinality.  Each micro-batch re-emits the bucket's
    surviving candidates with their lower-bound counts plus the
    bucket's total, carrying the MG guarantee across the whole stream:
    a value whose true count exceeds ``bucket_total / capacity`` is
    always present, and ``lb <= true count <= lb + bucket_total /
    capacity``.  Output mode ``update``.
    """
    from pyspark.sql import functions as F

    out_schema = "bucket int, value string, count_lb long, bucket_total long"
    state_schema = "vals array<string>, counts array<long>, total long"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            vals, counts, total = state.get
            d = dict(zip(vals, counts))
        else:
            d, total = {}, 0
        # batch-merge MG (same bound as the per-token loop — see
        # functions/corpus._mg_summary): vectorized value_counts per
        # Arrow batch, subtract-the-(cap+1)th eviction on overflow
        for pdf in pdfs:
            vc = pdf["__val"].dropna().value_counts()
            total += int(vc.sum())
            for v, c in vc.items():
                d[v] = d.get(v, 0) + int(c)
            if len(d) > capacity_per_bucket:
                sub = sorted(d.values(), reverse=True)[capacity_per_bucket]
                d = {k2: v2 - sub for k2, v2 in d.items() if v2 > sub}
        state.update((list(d.keys()), [int(c) for c in d.values()],
                      int(total)))
        yield pd.DataFrame({
            "bucket": key[0], "value": list(d.keys()),
            "count_lb": [int(c) for c in d.values()],
            "bucket_total": int(total)})

    bucketed = events.select(
        F.col(value_col).cast("string").alias("__val"),
        F.pmod(F.xxhash64(F.col(value_col).cast("string")),
               F.lit(n_buckets)).cast("int").alias("bucket"))
    return bucketed.groupBy("bucket").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)
