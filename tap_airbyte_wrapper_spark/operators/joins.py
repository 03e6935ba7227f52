"""Join operators: equi / semi / anti / as-of / range.

The reference has NO join code anywhere (verified in SURVEY.md §2.3 — the
whole engine is tap_airbyte/tap.py:1-1003); joins are part of the transform
surface the new engine supplies.  All implementations are Catalyst-native
DataFrame compositions — no Python UDFs, no driver loops — chosen for their
shuffle behavior at 100 TB:

* ``equi_join`` auto-broadcasts a provably-small build side so the big side
  never shuffles;
* ``asof_join`` is the union + last(ignorenulls) window trick: ONE shuffle
  on the key (vs. the naive range-join + dedup which shuffles twice and
  explodes intermediate rows);
* ``range_join`` bins intervals so the match is an equi-join on
  (key, bin) — avoiding the O(n*m) broadcast-nested-loop plan Spark would
  otherwise pick for a pure inequality condition.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

__all__ = ["equi_join", "semi_join", "anti_join", "asof_join", "range_join",
           "salted_join", "fuzzy_self_join", "point_in_time_join"]

# Rough per-row cost used by the caller-supplied hint; Spark's own AQE
# broadcast threshold still applies underneath.
_BROADCAST_DEFAULT = True


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool | None = None,
) -> DataFrame:
    """Equi-join with an explicit broadcast hint for dimension tables.

    ``broadcast_right=None`` defers to AQE; ``True`` forces the hint (use
    for catalog-known small dims — at 100 TB the planner's size estimate
    for a freshly-derived DataFrame is often missing).
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on) if not isinstance(on, str) else on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              broadcast_right: bool = False) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (no right columns) —
    left_semi avoids materializing the join product entirely."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on) if not isinstance(on, str) else on,
                     how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              broadcast_right: bool = False) -> DataFrame:
    """Rows of ``left`` without a match in ``right``."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(on) if not isinstance(on, str) else on,
                     how="left_anti")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-tolerant equi-join: rows of the ``skewed`` side get a uniform
    salt in ``[0, salt_buckets)``; the ``other`` side is replicated once
    per salt value; the join runs on ``(keys..., salt)``.  A hot key's
    rows then spread across ``salt_buckets`` reducers instead of one.

    Result is row-identical to the unsalted join for ``inner`` and
    ``left`` (each skewed row matches exactly the one replica carrying
    its salt); ``right``/``outer`` would duplicate unmatched ``other``
    rows, so they are rejected.

    When to reach for this over AQE's skew-join handling: AQE splits
    oversized SHUFFLE PARTITIONS of sort-merge joins, but a genuinely hot
    key inside a shuffled-hash/build side, or skew surfacing only through
    a chain of operators, still funnels one task.  Salting restructures
    the key space itself, so it works in every join strategy — at the
    cost of replicating the small side x``salt_buckets`` (keep that side
    dimension-sized)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r} "
            "(right/outer would duplicate unmatched rows of the "
            "replicated side)")
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int"))
    replicated = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    return salted.join(replicated, on=keys + ["__salt"], how=how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    Scale-first implementation: tag and union both sides, then carry the
    most recent right payload across each key partition with
    ``last(ignorenulls)`` — a single shuffle on the key, with sort, and no
    intermediate row explosion.  This is the plan a hand-written
    merge_asof-on-``applyInPandas`` would need a whole extra shuffle +
    Python round-trip to produce.

    ``tolerance``: max allowed |left_ts - right_ts| as an interval Column
    (e.g. ``F.expr("INTERVAL 1 HOUR")``); matches outside it are nulled,
    pandas ``merge_asof`` style.  Equal timestamps match (inclusive).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts

    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {c: f"{right_prefix}{c}" for c in payload_cols}
    matched_ts = f"{right_prefix}__asof_ts"

    rtagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c) for c in payload_cols],
        ).alias("__payload"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    ltagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(
            rtagged.schema["__payload"].dataType
        ).alias("__payload"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    unioned = rtagged.unionByName(ltagged)
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    elif direction == "forward":
        order = [F.col("__ts").desc(), F.col("__is_left").asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)

    if tolerance is not None:
        # Bound check via timestamp shift (interval-safe for both
        # directions); out-of-tolerance matches null out, merge_asof style.
        if direction == "backward":
            ok = F.col("__match.__matched_ts") >= F.col("__ts") - tolerance
        else:
            ok = F.col("__match.__matched_ts") <= F.col("__ts") + tolerance
        carried = carried.withColumn(
            "__match", F.when(ok, F.col("__match"))
        )

    return carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__match.__matched_ts").alias(matched_ts),
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: str | Sequence[str] | None = None,
    bin_width: Any = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join that stays an equi-join at scale.

    A bare ``p BETWEEN lo AND hi`` condition (with no equi keys) forces
    Spark into a broadcast-nested-loop join — O(n*m).  Binning both sides
    to a grid of ``bin_width`` turns it into an equi-join on
    (keys..., bin) + a residual filter: intervals explode into the bins
    they cover via ``sequence()``, points map to one bin.  Choose
    ``bin_width`` near the typical interval length so explosion stays
    O(1) per interval.

    ``bin_width``: numeric width for numeric domains, or seconds for
    timestamps.  ``None`` with equi keys falls back to the plain
    conditional join (fine when keys already make it an equi-join).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    cond_cols = [points[k] == intervals[k] for k in keys]
    between = (points[point_col] >= intervals[lo_col]) & (
        points[point_col] <= intervals[hi_col]
    )

    if bin_width is None:
        if not keys:
            raise ValueError(
                "range_join without equi keys needs bin_width — otherwise "
                "the plan degenerates to a nested-loop join"
            )
        cond = cond_cols[0]
        for c in cond_cols[1:]:
            cond = cond & c
        return points.join(intervals, cond & between, how)

    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join's binned path supports inner/left, got {how!r} "
            "(the residual BETWEEN filter cannot preserve unmatched rows "
            "of the intervals side)"
        )

    def to_bin(df: DataFrame, name: str) -> Column:
        # TIMESTAMP_NTZ cannot cast straight to double; hop through
        # TIMESTAMP first (a no-op for plain TIMESTAMP, identity shift
        # for NTZ — bins shift uniformly on both sides, and the residual
        # BETWEEN filter uses the original values, so results are
        # unaffected).
        c = F.col(name)
        if isinstance(df.schema[name].dataType,
                      (T.TimestampType, T.TimestampNTZType, T.DateType)):
            c = c.cast("timestamp")
        return F.floor(c.cast("double") / F.lit(bin_width)).cast("long")

    p = points.withColumn("__bin", to_bin(points, point_col))
    i = intervals.withColumn(
        "__bins",
        F.sequence(to_bin(intervals, lo_col), to_bin(intervals, hi_col)),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")

    join_keys = keys + ["__bin"]
    matched = p.join(i, on=join_keys, how="inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    ).drop("__bin")
    if how == "inner":
        return matched
    # left: an outer binned join + residual filter would silently drop
    # unmatched points (null lo/hi fails BETWEEN) — i.e. degenerate to
    # inner.  Instead, add back points whose key set has no residual
    # match, with null interval columns, via an anti-join on the full
    # (keys + point) identity.  Points duplicated in the input stay
    # duplicated (each copy is unmatched), matching a true left join.
    ident = keys + [point_col]
    unmatched = points.join(
        matched.select(*ident).distinct(), on=ident, how="left_anti"
    )
    icols = [c for c in intervals.columns if c not in keys]
    unmatched = unmatched.select(
        *points.columns,
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in icols],
    )
    return matched.select(*points.columns, *icols).unionByName(unmatched)


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    q: int = 2,
    expand_ids: bool = True,
) -> DataFrame:
    """EXACT edit-distance self-join: all ``(id_a, id_b, dist)`` with
    ``id_a < id_b`` and ``levenshtein(str_a, str_b) <= max_dist`` —
    entity-resolution / misspelling detection without an all-pairs scan.

    Plan (dedup-then-expand + q-gram blocking, both exact):

    1. Collapse to DISTINCT strings — duplicate values are the norm in
       real name/address columns, and every downstream stage then costs
       |vocabulary|, not |rows|.
    2. Candidate string pairs = pairs sharing at least one ``q``-gram.
       Guarantee: one edit operation destroys at most ``q`` of a
       string's ``len - q + 1`` grams, so two strings with
       ``max(len) >= q * (max_dist + 1)`` within ``max_dist`` edits
       MUST still share a gram.  Shorter strings (a bounded, tiny set —
       and an edit-distance match forces its partner within
       ``max_dist`` of the same length) fall back to a broadcast
       all-pairs block among themselves.
    3. Prune candidates with the length filter
       (``|len_a - len_b| <= max_dist`` — a necessary condition), then
       verify with the JVM ``levenshtein`` expression.
    4. Expand verified STRING pairs back to id pairs by two equi-joins
       on the string value (output-bounded, the same expansion the
       answer itself requires).

    Shuffles: gram postings join (on the gram), pair distinct (on the
    string pair), two expansion joins.  Nothing is ever quadratic in
    row count; the only quadratic term is the short-string fallback
    block, bounded by the alphabet (strings under ``q*(max_dist+1)``
    characters).  Equal strings are NOT emitted (``__sa < __sb``):
    this reports NEAR matches; exact duplicates are exact_dedup's job.

    ``expand_ids=False`` returns STRING-level pairs
    ``(str_a, str_b, dist, n_ids_a, n_ids_b)`` instead: on columns
    where values repeat heavily (names/addresses at web scale) the id
    expansion is |ids_a| x |ids_b| PER string pair — the measured x10
    replication study produced ~29M id pairs from ~300 string pairs,
    output-driven cost that the string form avoids entirely (the
    member-id sets remain recoverable by two equi-joins when needed).
    """
    # vocabulary-sized and consumed by three branches (gram postings
    # twice via a/b, the short-string block twice): persist so the
    # scan+distinct doesn't replan per consumer.  Lazy return, so the
    # bounded pool (not a bare persist) owns the cache lifetime.
    from ..functions._cache import cache_bounded

    strs = cache_bounded(
        df.select(F.col(str_col).alias("__s"))
        .filter(F.col("__s").isNotNull())
        .distinct()
        .withColumn("__len", F.length("__s"))
    )
    min_guaranteed = q * (max_dist + 1)

    grams = strs.filter(F.col("__len") >= q).select(
        "__s", "__len",
        F.explode(
            F.array_distinct(
                F.expr(f"transform(sequence(1, __len - {q} + 1), "
                       f"i -> substring(__s, i, {q}))"))).alias("__g"),
    )
    a = grams.select(F.col("__s").alias("__sa"), F.col("__len").alias("__la"),
                     "__g")
    b = grams.select(F.col("__s").alias("__sb"), F.col("__len").alias("__lb"),
                     "__g")
    cand = (
        a.join(b, on="__g")
        .filter(F.col("__sa") < F.col("__sb"))
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        .select("__sa", "__sb")
        .distinct()
    )

    shortish = strs.filter(F.col("__len") <= min_guaranteed - 1 + max_dist)
    sa = shortish.select(F.col("__s").alias("__sa"),
                         F.col("__len").alias("__la"))
    sb = shortish.select(F.col("__s").alias("__sb"),
                         F.col("__len").alias("__lb"))
    short_cand = (
        sa.crossJoin(F.broadcast(sb))
        .filter(F.col("__sa") < F.col("__sb"))
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        # only pairs where a side sits below the gram guarantee need
        # this path; the rest came from postings
        .filter((F.least("__la", "__lb") <= min_guaranteed - 1)
                | (F.col("__la") < q) | (F.col("__lb") < q))
        .select("__sa", "__sb")
    )

    verified = (
        cand.unionByName(short_cand).distinct()
        .withColumn("__dist", F.levenshtein("__sa", "__sb"))
        .filter(F.col("__dist") <= max_dist)
    )

    if not expand_ids:
        counts = df.groupBy(F.col(str_col).alias("__s")).agg(
            F.count(F.lit(1)).alias("__n"))
        ca = counts.select(F.col("__s").alias("__sa"),
                           F.col("__n").alias("n_ids_a"))
        cb = counts.select(F.col("__s").alias("__sb"),
                           F.col("__n").alias("n_ids_b"))
        return (
            verified.join(ca, on="__sa")
            .join(cb, on="__sb")
            .select(
                F.col("__sa").alias("str_a"), F.col("__sb").alias("str_b"),
                F.col("__dist").alias("dist"), "n_ids_a", "n_ids_b")
        )

    ids_a = df.select(F.col(id_col).alias("id_a"),
                      F.col(str_col).alias("__sa"))
    ids_b = df.select(F.col(id_col).alias("id_b"),
                      F.col(str_col).alias("__sb"))
    return (
        verified.join(ids_a, on="__sa").join(ids_b, on="__sb")
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.col("__dist").alias("dist"),
        )
        .distinct()
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    on: str | Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    right_prefix: str = "h_",
) -> DataFrame:
    """Join each fact to the dimension version IN EFFECT at the fact's
    timestamp — the feature-store "point-in-time correct" join over
    :func:`~..operators.merge.scd2_history` output.  Using the CURRENT
    version instead (a plain equi-join) leaks future state into
    training examples; this is the leakage-safe form.

    Plan: :func:`asof_join` on ``valid_from`` (one key shuffle,
    ``last(ignorenulls)`` carry — no interval explosion), then one
    vectorized invalidation pass: a matched version whose ``valid_to``
    is at or before the fact timestamp was already superseded or
    deleted, so its columns are nulled (left row kept).  Cost identical
    to the as-of join; at 100 TB the shuffle on the key is the floor
    for any keyed temporal join.
    """
    j = asof_join(facts, history, on, left_ts=fact_ts,
                  right_ts=valid_from, right_prefix=right_prefix)
    vt = F.col(f"{right_prefix}{valid_to}")
    # ONE select with the predicate evaluated against the ORIGINAL
    # columns: a sequential withColumn loop would null valid_to first
    # and then re-evaluate vt.isNull() as true for every later column,
    # leaking exactly the stale version this function must suppress.
    valid = vt.isNull() | (vt > F.col(fact_ts))
    hist_cols = {c for c in j.columns
                 if c.startswith(right_prefix)
                 and (c[len(right_prefix):] in history.columns
                      or c == f"{right_prefix}__asof_ts")}
    return j.select(*[
        F.when(valid, F.col(c)).alias(c) if c in hist_cols else F.col(c)
        for c in j.columns
    ])
