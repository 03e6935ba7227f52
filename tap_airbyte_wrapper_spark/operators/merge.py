"""Batch merge / upsert (CDC apply) — the maintenance half of an EL
engine.

The reference emits Singer RECORDs and leaves key-based upsert to the
downstream target (its streams carry primary_keys for exactly this,
reference tap.py:934-943, but never apply them).  A Spark-native engine
can close the loop: apply a changeset onto a base table with
latest-wins-per-key semantics, entirely as one declarative plan.

Scale shape: ``unionByName`` is a zero-cost plan node; the winner pick
is ONE hash shuffle on the primary key + a per-key ``row_number`` —
identical cost to the exact-dedup window, no join, both inputs scanned
once.  At 100 TB the shuffle is the unavoidable minimum for key-based
merge; AQE handles skewed keys.  Deletes ride the same window: a
tombstone that wins its key removes the key in the same pass (no
separate anti-join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["merge_upsert", "scd2_history", "maintain_agg_snapshot"]


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    pk_cols: str | Sequence[str],
    order_col: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge of ``changes`` onto ``base`` by primary key.

    * ``order_col``: recency column (cursor/version); higher wins.  Ties
      — and the ``order_col=None`` case — resolve in favor of the
      changes side, then by an ``xxhash64`` over all non-key columns, so
      two change rows with the same key and equal (or null) cursor still
      pick the same winner on every run / restart.  (Rows that tie on
      the hash are content-identical up to hash collision, so the pick
      is immaterial; the delete flag participates in the hash.)
    * ``delete_col``: optional boolean column on ``changes`` marking
      tombstones; a winning tombstone drops its key from the output
      (column is removed from the result).  ``base`` rows are treated
      as non-deletes.

    Output columns = ``base``'s columns; extra change-side columns are
    dropped, missing ones error (a changeset must cover the schema).
    """
    keys = [pk_cols] if isinstance(pk_cols, str) else list(pk_cols)
    missing = [c for c in base.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing base columns: {missing}")

    del_flag = (
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        if delete_col else F.lit(False)
    )
    b = base.select(*base.columns,
                    F.lit(0).alias("__src"),
                    F.lit(False).alias("__del"))
    c = changes.select(*base.columns,
                       F.lit(1).alias("__src"),
                       del_flag.alias("__del"))
    non_keys = [c for c in base.columns if c not in keys]
    ordering = []
    if order_col is not None:
        ordering.append(F.col(order_col).desc_nulls_last())
    ordering += [
        F.col("__src").desc(),
        # deterministic tiebreaker: same-key rows with equal (or null)
        # cursor would otherwise get a partition-order-dependent winner
        F.xxhash64(*[F.col(c) for c in non_keys], F.col("__del")).asc(),
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        b.unionByName(c)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & ~F.col("__del"))
        .select(*base.columns)
    )


def scd2_history(
    changes: DataFrame,
    pk_cols: str | Sequence[str],
    cursor_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Slowly-Changing-Dimension type 2: turn an op-typed change stream
    into validity-interval history rows — every version of every key
    with ``valid_from`` / ``valid_to`` (null = still current) and
    ``is_current``.  The warehouse-side complement of
    :func:`merge_upsert` (which keeps only the latest): auditors and
    as-of joins need WHEN each value held, not just what holds now.

    One hash shuffle on the key + two ``lead`` windows over the same
    sort — identical plan cost to the merge window.  A delete tombstone
    closes the previous interval and emits no row of its own; a key
    whose LAST change is a delete therefore has no current row.
    Deterministic for unique ``(key, cursor)`` (the changelog contract:
    the cursor is a log position).
    """
    pks = [pk_cols] if isinstance(pk_cols, str) else list(pk_cols)
    w = Window.partitionBy(*pks).orderBy(F.col(cursor_col).asc())
    deleted = (
        F.col(delete_col).cast("boolean") if delete_col is not None
        else F.lit(False)
    )
    nxt_cursor = F.lead(F.col(cursor_col)).over(w)
    out = (
        changes.withColumn("__del", F.coalesce(deleted, F.lit(False)))
        .withColumn("valid_from", F.col(cursor_col))
        .withColumn("valid_to", nxt_cursor)
        .filter(~F.col("__del"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__del")
    )
    return out


def maintain_agg_snapshot(
    snapshot: DataFrame | None,
    delta: DataFrame,
    keys: str | Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh):
    fold an INSERT-ONLY ``delta`` into a grouped-aggregate ``snapshot``
    without rescanning the history.

    The snapshot schema is self-describing partials —
    ``keys + [count_col] + sum_<c> + min_<c> + max_<c>`` — all of which
    are MERGEABLE: refreshing unions the old snapshot with the delta's
    partials and re-aggregates by key.  Averages and rates derive from
    sum/count at read time; pass ``snapshot=None`` to bootstrap.
    (Deletes/updates are intentionally out of scope: min/max are not
    maintainable under retraction — route CDC streams through
    :func:`merge_upsert` and recompute, or keep retraction-safe
    sums/counts only.)

    Scale shape: the delta aggregates map-side first (partial combine),
    so the single key-shuffle carries one row per distinct key per map
    partition of the DELTA — daily refresh cost is bounded by the
    delta's key cardinality, not the snapshot's; the snapshot itself
    re-shuffles only its (already one-row-per-key) rows.  Persist the
    snapshot bucketed by the keys and the union re-agg needs no
    snapshot-side exchange at all (see ``sinks.py`` bucketed writers).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)

    def partials(df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("bigint").alias(count_col)]
        aggs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
        aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
        aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
        return df.groupBy(*ks).agg(*aggs)

    fresh = partials(delta)
    if snapshot is None:
        return fresh
    missing = [c for c in fresh.columns if c not in snapshot.columns]
    if missing:
        raise ValueError(f"snapshot missing partial columns: {missing}")
    merged_aggs = [F.sum(count_col).cast("bigint").alias(count_col)]
    merged_aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    merged_aggs += [F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols]
    merged_aggs += [F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols]
    return (
        snapshot.select(fresh.columns).unionByName(fresh)
        .groupBy(*ks).agg(*merged_aggs)
    )
