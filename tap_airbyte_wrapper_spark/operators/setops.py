"""Set operators + sort/limit surface (SURVEY.md §2.3 — absent in the
reference, supplied by Catalyst built-ins).

``union_by_name`` defaults to ``allowMissingColumns=True`` because extracted
streams evolve schemas over time — the common EL case is unioning two
snapshots whose schemas drifted.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

__all__ = ["union_by_name", "intersect_rows", "except_rows"]


def union_by_name(
    dfs: Sequence[DataFrame], allow_missing: bool = True
) -> DataFrame:
    """Union N frames by column name (schema-drift tolerant)."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing)
    return out


def intersect_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    """Multiset difference by default (exceptAll) — bag semantics match the
    record-stream model where duplicates are real rows."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
