"""Window-function operators: rank / lag / lead / frames / per-group top-k.

Absent from the reference (SURVEY.md §2.3).  Scale notes:

* every window = one shuffle on its partition keys + per-partition sort;
  reuse one Window spec across multiple measures so Catalyst computes them
  in a single Window physical node;
* per-group top-k via row_number + filter pushes the limit inside each
  group — never ``orderBy().limit()`` per group driver-side;
* an UNPARTITIONED window (global rank) funnels everything through one
  task — ``global_topk`` instead does a per-partition ``limit`` then a
  final merge, which is how you take top-k off 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["ranked", "with_lag_lead", "running_agg", "topk_per_group",
           "global_topk", "global_distribution_ranks", "global_cumsum"]


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    methods: Sequence[str] = ("row_number",),
) -> DataFrame:
    """Attach rank columns (``row_number`` / ``rank`` / ``dense_rank`` /
    ``percent_rank`` / ``ntile:<n>``) over one shared window."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df
    for m in methods:
        if m.startswith("ntile:"):
            out = out.withColumn(f"ntile_{m.split(':')[1]}",
                                 F.ntile(int(m.split(":")[1])).over(w))
        else:
            out = out.withColumn(m, getattr(F, m)().over(w))
    return out


def with_lag_lead(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    col: str,
    offsets: Sequence[int] = (1,),
) -> DataFrame:
    """lag/lead of ``col`` at each offset (positive = lag, negative = lead)
    over one shared window spec -> single Window node."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df
    for off in offsets:
        if off >= 0:
            out = out.withColumn(f"{col}_lag{off}", F.lag(col, off).over(w))
        else:
            out = out.withColumn(f"{col}_lead{-off}", F.lead(col, -off).over(w))
    return out


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    aggs: dict[str, Column],
    frame: tuple[int | None, int | None] = (None, 0),
) -> DataFrame:
    """Frame-bounded running aggregates.  ``frame=(None, 0)`` = unbounded
    preceding to current row; integers = row offsets."""
    lo = Window.unboundedPreceding if frame[0] is None else frame[0]
    hi = Window.unboundedFollowing if frame[1] is None else frame[1]
    w = Window.partitionBy(*partition_by).orderBy(*order_by).rowsBetween(lo, hi)
    out = df
    for alias, c in aggs.items():
        out = out.withColumn(alias, c.over(w))
    return out


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Top-k rows per group: row_number + filter (deterministic when
    order_by totally orders; include a tie-break key).

    When the group-key cardinality is far below the cluster's
    parallelism (e.g. top-3 parts for ~25 brands over 100 TB of
    lineitem), a single window funnels each group through one task.
    ``salt_buckets=N`` runs two phases: a pre-window over
    ``(group, salt)`` — N-way parallel per group — keeps only N*k
    candidate rows per group, then the exact window runs on that
    k*N-sized remnant.  Same result, bounded skew."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    if salt_buckets and salt_buckets > 1:
        salt = F.spark_partition_id() % salt_buckets
        pre = Window.partitionBy(*partition_by, "__salt").orderBy(*order_by)
        df = (
            df.withColumn("__salt", salt)
            .withColumn("__prk", F.row_number().over(pre))
            .filter(F.col("__prk") <= k)
            .drop("__salt", "__prk")
        )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def _is_sort_order(c: Column) -> bool:
    """True when the Column wraps a SortOrder (``.asc()``/``.desc()``)
    rather than a plain expression — such a column cannot be projected
    with ``withColumn`` and carries a direction the ascending
    value-bucket formula does not honor.

    Primary detection inspects the underlying Catalyst expression
    class (exact, immune to repr-format drift and to a plain column
    literally named ``'x NULLS FIRST'``).  The repr-suffix match is
    kept only as a last-resort fallback for clients without a JVM
    column handle (e.g. Spark Connect), where a SortOrder still
    prints with a NULLS FIRST/LAST suffix."""
    for accessor in ("node", "expr"):  # Spark 4 ColumnNode / Spark 3 expr
        try:
            node = getattr(c._jc, accessor)()
            return node.getClass().getSimpleName() == "SortOrder"
        except Exception:
            continue
    r = str(c)
    return r.endswith("NULLS FIRST'>") or r.endswith("NULLS LAST'>")


def _value_buckets(keyed: DataFrame, num_ranges: int) -> DataFrame:
    """Attach ``__pid`` — an ASCENDING range-bucket of the numeric
    ``__k0`` column derived purely from row VALUES: boundaries from one
    ``approxQuantile`` pass, bucket = count of boundaries <= key.
    Identical in every job that evaluates it (unlike physical partition
    ids, which the RangePartitioner re-samples per job), so two-phase
    offset algorithms need no checkpoint.  Shared by
    :func:`global_distribution_ranks` and :func:`global_cumsum`."""
    probs = [i / num_ranges for i in range(1, num_ranges)]
    bounds = sorted(set(
        keyed.approxQuantile("__k0", probs, 0.001))) if probs else []
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = (
        F.aggregate(
            barr, F.lit(0),
            lambda acc, b: acc + F.when(
                F.col("__k0").cast("double") >= b, 1).otherwise(0))
        if bounds else F.lit(0))
    return keyed.withColumn("__pid", bucket)


def global_distribution_ranks(
    df: DataFrame,
    order_by: Sequence[Column],
    n_tiles: int = 10,
    rank_col: str = "rank",
    num_ranges: int | None = None,
) -> DataFrame:
    """Global rank + percent_rank + cume_dist + ntile WITHOUT the
    single-task unpartitioned window (``Window.orderBy`` with no
    partitionBy funnels the whole dataset through one task — the global
    total-order anti-pattern at scale).

    Plan: VALUE-based range buckets — boundaries come from one
    ``approxQuantile`` pass over the FIRST order key, every row's
    bucket is then a pure expression of its own values (count of
    boundaries <= key), local ranks run inside each bucket, and each
    bucket's cumulative row offset arrives as a broadcast literal
    (one collect of <= num_ranges tiny (bucket, count) rows — the
    same guarded-driver-metadata shape as IVF centroid training).
    Because the rank is then GLOBAL,
    percent_rank/cume_dist/ntile follow arithmetically, matching
    Spark's window semantics exactly when ``order_by`` is a total
    order (include a tie-break key).

    Why values and not ``repartitionByRange`` + partition ids: the
    RangePartitioner re-SAMPLES boundaries per job, so physical
    partition ids are only stable under an eager ``localCheckpoint``
    — which materializes the whole input to executor-local storage
    and acts as a column-pruning barrier (the round-4 bench
    regression).  A value-derived bucket is identical in the counting
    job and the ranking job by construction: three column-pruned
    scans, zero materialization, nothing pinned.  Boundary skew
    (a heavy tie on one first-key value) lands that value's rows in
    one bucket, same as the range partitioner would.

    Falls back to the checkpoint-pinned physical path when the first
    order key is non-numeric (approxQuantile needs a numeric) or is a
    SortOrder (``.desc()``/``.asc()`` — the ascending bucket formula
    does not honor a direction; ``repartitionByRange`` does)."""
    from pyspark.sql.types import NumericType

    spark = df.sparkSession
    num_ranges = num_ranges or spark.sparkContext.defaultParallelism
    value_path = not _is_sort_order(order_by[0])
    if value_path:
        keyed = df.withColumn("__k0", order_by[0])
        value_path = isinstance(keyed.schema["__k0"].dataType, NumericType)
    if value_path:
        parts = _value_buckets(keyed, num_ranges)
    else:
        # physical-partition fallback: ids are pid-stable only under an
        # eager checkpoint (RangePartitioner re-samples per job)
        parts = df.withColumn("__k0", F.lit(0)) \
            .repartitionByRange(num_ranges, *order_by).withColumn(
            "__pid", F.spark_partition_id()).localCheckpoint(eager=True)
    counts = {r["__pid"]: r["count"]
              for r in parts.groupBy("__pid").count().collect()}
    n = sum(counts.values())
    offsets, acc = [], 0
    for pid in range(max(counts) + 1 if counts else 0):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    local_w = Window.partitionBy("__pid").orderBy(*order_by)
    # [0] fallback: on an EMPTY input the offsets list is empty and
    # constant folding evaluates element_at(array(), 1) at plan time
    # (zero rows notwithstanding) -> ArrayIndexOutOfBounds
    offset = F.element_at(
        F.array(*[F.lit(o) for o in (offsets or [0])]),
        F.col("__pid") + 1)
    rank = (F.row_number().over(local_w) + offset).cast("long")
    size, rem = divmod(n, n_tiles)
    thresh = rem * (size + 1)
    ntile = F.when(
        rank <= thresh, ((rank - 1) / (size + 1)).cast("int") + 1
    ).otherwise(
        (F.lit(rem) + ((rank - 1 - thresh) / max(size, 1)).cast("int") + 1)
        .cast("int"))
    pct = (F.lit(0.0) if n <= 1
           else (rank - 1) / F.lit(float(n - 1)))
    return (
        parts.withColumn(rank_col, rank)
        .withColumn("ntile", ntile)
        .withColumn("percent_rank", pct)
        .withColumn("cume_dist", rank / F.lit(float(max(n, 1))))
        .drop("__pid", "__k0")
    )


def global_topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k without a single-task global sort: Spark's
    ``orderBy().limit()`` already plans TakeOrderedAndProject (per-partition
    top-k + driver merge of k*partitions rows) — expose it as the blessed
    path so callers don't reach for a global row_number window."""
    return df.orderBy(*order_by).limit(k)


def global_cumsum(
    df: DataFrame,
    order_col: Column | str,
    value_col: Column | str,
    out_col: str = "cum",
    num_ranges: int | None = None,
) -> DataFrame:
    """Globally-ordered inclusive running sum of ``value_col`` along
    ``order_col`` WITHOUT an unpartitioned window (the single-task
    funnel) and without materializing the input.

    Same value-derived two-phase shape as
    :func:`global_distribution_ranks`: one ``approxQuantile`` boundary
    pass over the (numeric, total-order) key, bucket = pure row
    expression, within-bucket window cumsum, plus each bucket's
    cumulative value offset collected as <= ``num_ranges`` tiny rows.
    Parallelism = ``num_ranges`` regardless of any grouping in the
    data — this is the engine behind sequence packing and the
    few-domain token-budget path.

    ``order_col`` must be a total order (unique) for the result to be
    well-defined; ties make the within-tie order — and therefore the
    running sum at the tied rows — partition-dependent.

    A STRING order key (doc-ids — the common case in web corpora) is
    handled by re-keying on ``xxhash64(key)`` with the raw key as
    tie-break: still a deterministic, partitioning-independent total
    order (what sequence packing needs), just hash order rather than
    lexicographic.  The approxQuantile boundary pass runs on the
    uniform 64-bit hash, so bucket balance is ideal regardless of id
    shape; hash collisions stay inside one bucket (the bucket is a
    pure function of the hash value) and the raw-key tie-break keeps
    the order total.  Callers that need LEXICOGRAPHIC string order
    must pre-map the key to a numeric rank themselves.  Any OTHER
    non-numeric type (timestamp, date, boolean, struct) still raises:
    hash order would silently scramble a cursor the caller almost
    certainly meant as a real ordering — cast to unix epoch/long to
    opt in.
    """
    from pyspark.sql.types import NumericType, StringType

    spark = df.sparkSession
    num_ranges = num_ranges or spark.sparkContext.defaultParallelism
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    if _is_sort_order(oc):
        raise TypeError("global_cumsum takes a plain ascending "
                        "order column, not a SortOrder")
    keyed = df.withColumn("__k0", oc).withColumn("__v0", vc)
    order_cols = ["__k0"]
    key_type = keyed.schema["__k0"].dataType
    if isinstance(key_type, StringType):
        keyed = keyed.withColumn("__kraw", F.col("__k0")) \
            .withColumn("__k0", F.xxhash64(F.col("__k0")))
        order_cols = ["__k0", "__kraw"]
    elif not isinstance(key_type, NumericType):
        raise TypeError(
            f"global_cumsum needs a numeric or string order column; got "
            f"{key_type.simpleString()} — cast temporal keys to a unix "
            f"epoch (the hash re-key is only meaningful for opaque ids)")
    parts = _value_buckets(keyed, num_ranges)
    sums = {r["__pid"]: r["s"] or 0
            for r in parts.groupBy("__pid")
            .agg(F.sum("__v0").alias("s")).collect()}
    offsets, acc = [], 0
    for pid in range(max(sums) + 1 if sums else 0):
        offsets.append(acc)
        acc += sums.get(pid, 0)
    local_w = (
        Window.partitionBy("__pid").orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # [0] fallback: see global_distribution_ranks — empty input must
    # not constant-fold element_at over an empty array
    offset = F.element_at(
        F.array(*[F.lit(o) for o in (offsets or [0])]),
        F.col("__pid") + 1)
    return (
        parts.withColumn(out_col, F.sum("__v0").over(local_w) + offset)
        .drop("__pid", "__v0", *order_cols)
    )
