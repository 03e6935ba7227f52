"""Set operators + sort/limit surface (SURVEY.md §2.3 — absent in the
reference, supplied by Catalyst built-ins).

``union_by_name`` defaults to ``allowMissingColumns=True`` because extracted
streams evolve schemas over time — the common EL case is unioning two
snapshots whose schemas drifted.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["union_by_name", "intersect_rows", "except_rows", "melt"]


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


def melt(
    df: DataFrame,
    id_cols: "Sequence[str]",
    value_cols: "Sequence[str]",
    var_col: str = "metric",
    val_col: str = "value",
) -> DataFrame:
    """UNPIVOT (wide -> long), the reshape twin of the pivot query:
    one output row per (id, value column).  Thin blessing of Spark's
    native ``DataFrame.unpivot`` — a zero-shuffle projection (the
    stack expands rows map-side; no Exchange), which is why the
    one-pass profiler/validator in ``operators/quality.py`` are built
    on the same shape.  Value columns must share a least common type
    (Spark resolves it; cast beforehand to control it)."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_col, val_col,
    )
