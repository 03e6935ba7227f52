"""Merge (upsert) sink: maintain a queryable snapshot from change batches.

The reference emits Singer RECORDs and leaves key-based upsert to the
downstream loader (its streams carry primary_keys for exactly that,
reference tap.py:934-943).  The Spark engine closes the loop for CDC:
each synced batch — e.g. a ``ChangelogSource`` increment — is applied
onto the previous snapshot with ``merge_upsert`` (one pk shuffle,
tombstones in the same window pass) and written as a NEW parquet
version; a ``_CURRENT`` pointer file flips atomically afterwards
(``os.replace``), so readers always see a complete snapshot:

    {path}/{stream}/v0/ ... vN/     immutable parquet snapshots
    {path}/{stream}/_CURRENT        text file: current version number

Crash between write and pointer flip leaves the old version current and
the half-written vN+1 orphaned — the next sync reuses the next free
version number and the bookmark was never committed (the engine commits
state only after the sink returns), so the batch replays: at-least-once
in, exactly-once effect via keyed idempotent merge.

Scale shape: one shuffle per batch on the primary key (the unavoidable
minimum for keyed merge) + a full rewrite of the snapshot.  Rewrite is
the right v1 at any scale where snapshot size ~ working set; partition-
pruned rewrites (only partitions containing changed keys) are the v2
path and slot in behind this same API.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .operators.merge import merge_upsert

__all__ = ["merge_snapshot_write", "read_merge_snapshot"]

_SINK_META = ("_op", "_deleted")   # never stored in the snapshot


def _current_version(root: str) -> int | None:
    ptr = os.path.join(root, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def read_merge_snapshot(spark: SparkSession, path: str, stream: str) -> DataFrame:
    """Open the current snapshot of a merge-sink stream."""
    root = os.path.join(path, stream)
    v = _current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root!r}")
    return spark.read.parquet(os.path.join(root, f"v{v}"))


def merge_snapshot_write(
    df: DataFrame,
    stream: str,
    path: str,
    pks: Sequence[str],
    order_col: str | None = None,
    delete_col: str | None = None,
    keep_versions: int = 2,
) -> int:
    """Apply one change batch onto the stream's snapshot; returns the new
    version number.  ``df`` carries the payload (+ optional ``_op`` /
    ``_deleted`` metadata, dropped from storage); ``order_col`` (e.g.
    ``_cursor``) must be a payload column so recency survives restarts.
    """
    if not pks:
        raise ValueError(f"merge sink for {stream!r} needs primary keys")
    spark = df.sparkSession
    root = os.path.join(path, stream)
    os.makedirs(root, exist_ok=True)
    if delete_col is None and "_deleted" in df.columns:
        delete_col = "_deleted"

    cur = _current_version(root)
    payload_cols = [c for c in df.columns if c not in _SINK_META]
    if cur is None:
        base = spark.createDataFrame(
            [], df.select(*payload_cols).schema)
    else:
        base = spark.read.parquet(os.path.join(root, f"v{cur}"))

    merged = merge_upsert(base, df, pks,
                          order_col=order_col, delete_col=delete_col)

    nxt = 0 if cur is None else cur + 1
    while os.path.exists(os.path.join(root, f"v{nxt}")):  # orphaned crash dir
        nxt += 1
    merged.write.mode("overwrite").parquet(os.path.join(root, f"v{nxt}"))

    tmp = os.path.join(root, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, os.path.join(root, "_CURRENT"))

    for name in os.listdir(root):        # best-effort retention sweep
        if name.startswith("v") and name[1:].isdigit():
            if int(name[1:]) <= nxt - max(keep_versions, 1):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return nxt
