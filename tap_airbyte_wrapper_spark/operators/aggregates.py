"""Aggregation operators: grouped/cube/rollup/grouping-sets + dedup.

Absent from the reference (SURVEY.md §2.3 — no groupby/dedup code exists in
tap_airbyte/); supplied here as thin, scale-annotated compositions of
Catalyst primitives.  Design notes that matter at 100 TB:

* ``groupBy().agg()`` already does map-side partial aggregation — never
  pre-``repartition`` before a groupBy, that just adds a shuffle;
* ``count_distinct`` is exact but needs a per-group shuffle of distinct
  values; ``approx_count_distinct`` (HyperLogLog++) is one pass and
  mergeable — expose both and let the caller pick the contract;
* versioned dedup (latest row per key) is a window + filter, which AQE
  handles skew for; ``dropDuplicates`` is reserved for exact-duplicate
  removal where any survivor is acceptable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "grouped_agg",
    "cube_agg",
    "rollup_agg",
    "grouping_sets_agg",
    "distinct_count",
    "dedup_exact",
    "dedup_latest",
    "hll_sketch_table",
    "histogram_sketch_table",
    "histogram_rollup",
    "histogram_quantiles",
    "hll_rollup",
]


def grouped_agg(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """groupBy().agg() with named outputs: ``aggs`` maps alias -> agg
    Column.  Partial (map-side) aggregation is automatic."""
    return df.groupBy(*keys).agg(*[c.alias(a) for a, c in aggs.items()])


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    return df.cube(*keys).agg(*[c.alias(a) for a, c in aggs.items()])


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]) -> DataFrame:
    return df.rollup(*keys).agg(*[c.alias(a) for a, c in aggs.items()])


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    aggs: dict[str, str],
    view_name: str = "__gs_input",
) -> DataFrame:
    """GROUPING SETS via SQL (no DataFrame-API equivalent).

    ``aggs`` maps alias -> SQL aggregate expression string.
    """
    spark = df.sparkSession
    df.createOrReplaceTempView(view_name)
    all_keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in all_keys:
                all_keys.append(k)
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    agg_sql = ", ".join(f"{e} AS {a}" for a, e in aggs.items())
    return spark.sql(
        f"SELECT {', '.join(all_keys)}, {agg_sql} FROM {view_name} "
        f"GROUP BY GROUPING SETS ({sets_sql})"
    )


def distinct_count(
    df: DataFrame, keys: Sequence[str], col: str, exact: bool = True, rsd: float = 0.05
) -> DataFrame:
    """Distinct cardinality per group: exact shuffle-heavy vs HLL++ single
    pass (mergeable at 1000-executor scale)."""
    agg = F.count_distinct(F.col(col)) if exact else F.approx_count_distinct(col, rsd)
    return df.groupBy(*keys).agg(agg.alias(f"{col}_distinct"))


def dedup_exact(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal (hash groupBy under the hood); any survivor
    acceptable.  ``cols=None`` = full-row dedup."""
    return df.dropDuplicates(list(cols) if cols else None)


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Versioned dedup: keep the first row per key under ``order_by``
    (e.g. cursor desc for latest) — the reference carries PKs as metadata
    only (tap.py:934-943); this realizes them.  Deterministic when
    ``order_by`` is a total order; include a PK tie-break to guarantee it.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def hll_sketch_table(
    df: "DataFrame",
    value_col: str,
    keys: "str | Sequence[str]",
    lg_k: int = 12,
) -> "DataFrame":
    """Per-key mergeable HLL sketches of ``value_col`` distincts:
    ``(keys..., sk)`` with ``sk`` a Datasketches HLL binary.

    This is incremental-analytics STATE: persist one sketch row per
    (day, dimension) as each batch lands, and any later rollup —
    rolling 7-day uniques, per-region uniques, all-time uniques — is a
    union of the relevant sketches (:func:`hll_rollup`), never a
    re-scan of raw events.  At 100 TB the daily raw scan happens once;
    every distinct-count question after that reads kilobytes.
    Standard error ~ 1.04/sqrt(2^lg_k) (~1.6% at the default).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sk"))


def hll_rollup(
    sketches: "DataFrame",
    group_keys: "Sequence[str] | None" = None,
    sketch_col: str = "sk",
    out_col: str = "n_distinct_est",
) -> "DataFrame":
    """Merge persisted sketches and estimate: group by ``group_keys``
    (None = one global row), union the sketches, estimate distincts.
    Input size = number of sketch rows (metadata-scale), so arbitrary
    re-slicing of a year of daily sketches costs milliseconds."""
    est = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    if group_keys:
        return sketches.groupBy(*list(group_keys)).agg(est)
    return sketches.agg(est)


def histogram_sketch_table(
    df: "DataFrame",
    value_col: str,
    keys: "str | Sequence[str]",
    lo: float,
    hi: float,
    bins: int = 64,
) -> "DataFrame":
    """Per-key mergeable fixed-bin histograms of ``value_col``:
    ``(keys..., bin, n)`` — the quantile-flavored sibling of
    :func:`hll_sketch_table`.

    With FIXED bounds the bin assignment is deterministic, so two
    histogram tables (two days, two sources) merge by summing counts —
    exactly mergeable, unlike percentile digests whose merge is
    approximate and order-dependent.  Values below ``lo`` clamp to bin
    0, at/above ``hi`` to ``bins - 1`` (the overflow bins double as
    out-of-range monitors); nulls are skipped.  Persist one histogram
    per (day, dimension) as batches land and any later quantile/
    distribution question is a metadata-scale rollup
    (:func:`histogram_rollup`), never a raw re-scan.

    One groupBy = map-side partial combine; the shuffle carries at most
    ``|keys| * bins`` rows per map partition.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value_col).cast("double")
    width = (hi - lo) / bins
    raw = F.floor((v - lo) / F.lit(width)).cast("int")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(v.isNotNull())
        .groupBy(*keys, b.alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def histogram_rollup(
    hists: "DataFrame",
    group_keys: "Sequence[str] | None" = None,
) -> "DataFrame":
    """Merge persisted histogram sketches: group by ``group_keys``
    (None = one global histogram) summing per-bin counts.  Input is
    sketch rows, so re-slicing a year of daily histograms costs
    milliseconds."""
    gk = list(group_keys) if group_keys else []
    return hists.groupBy(*gk, "bin").agg(F.sum("n").alias("n"))


def histogram_quantiles(
    hists: "DataFrame",
    probs: "Sequence[float]",
    lo: float,
    hi: float,
    bins: int = 64,
    group_keys: "Sequence[str] | None" = None,
) -> "DataFrame":
    """Quantile estimates from (rolled-up) histogram rows: for each
    probability, the UPPER EDGE of the first bin where the cumulative
    count reaches ``p * total`` — deterministic, merge-order-free, and
    exact to bin resolution ((hi-lo)/bins).

    Output: ``(group_keys..., p, q)``.  Runs entirely on sketch rows:
    one window for the cumulative counts, then ALL probabilities
    resolve in one aggregate — each bin row fans out over the probs
    it satisfies (literal-array filter + explode), min-bin per
    (group, p) — a single job however many quantiles are asked for,
    no raw data anywhere.
    """
    from pyspark.sql import Window

    gk = list(group_keys) if group_keys else []
    width = (hi - lo) / bins
    w = (Window.partitionBy(*gk) if gk else Window.partitionBy()
         ).orderBy("bin")
    cum = hists.withColumn("__cum", F.sum("n").over(w)).withColumn(
        "__tot", F.sum("n").over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
    parr = F.array(*[F.lit(float(p)) for p in probs])
    hit = cum.select(
        *gk, "bin",
        F.explode(
            F.filter(parr, lambda p: F.col("__cum") >= p * F.col("__tot"))
        ).alias("p"),
    )
    return hit.groupBy(*gk, "p").agg(F.min("bin").alias("__b")).select(
        *gk, "p",
        F.round(F.lit(lo) + (F.col("__b") + 1) * F.lit(width), 6)
        .alias("q"),
    )
