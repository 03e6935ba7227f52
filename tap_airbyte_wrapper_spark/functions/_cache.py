"""Bounded cache pool for query-scoped persisted intermediates.

The pair generators (minhash/simhash signatures, shingle-hash postings)
persist an intermediate that feeds two plan branches.  A bare
``persist()`` has exactly the right read semantics — Spark's cache
manager matches by logical plan, so a repeated identical call (bench
reps, a retried job, an interactive re-run) reuses the materialized
columnar relation with full pushdown into the cached scan — but no
``unpersist()`` point exists inside a function that returns a LAZY
result, so repeated calls in a long session accumulate executor cache
without bound (round-6 advice).  An eager ``localCheckpoint`` frees
blocks with the reference, but recomputes on every call (no plan-based
reuse) and hides statistics from the planner — measured 2.4x on
simhash_verified_pairs at sf0.1.

This pool keeps ``persist()`` and makes the leak FINITE instead: each
cached intermediate registers here, and when more than ``capacity``
are alive the oldest is unpersisted (its consumers, if any are still
pending, recompute from lineage — correctness is never at stake, only
a recompute).  Capacity 8 bounds executor cache at 8 query-scoped
intermediates regardless of how many thousands of calls a session
makes; ``spark.catalog.clearCache()`` remains the big hammer.
"""

from __future__ import annotations

import threading
from collections import deque

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_POOL: deque = deque()  # (semantic_hash, DataFrame), oldest first
CAPACITY = 8


def _semantic_hash(df: DataFrame):
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return id(df)  # no JVM plan (tests/mocks): fall back to identity


def cache_bounded(df: DataFrame) -> DataFrame:
    """``df.persist()`` with bounded-pool eviction (see module doc).

    Entries are keyed by the plan's ``semanticHash``: Spark's cache
    manager matches by plan, so a repeated identical call returns the
    SAME underlying cache entry — registering it twice would let a
    later eviction of the "old" object silently unpersist the entry the
    newer call still reads (observed as erratic 2-4x rep times).  An
    identical plan therefore REFRESHES its slot (moves to newest);
    only genuinely different plans age out."""
    df = df.persist()
    key = _semantic_hash(df)
    with _LOCK:
        for i, (k, _) in enumerate(_POOL):
            if k == key:
                del _POOL[i]
                break
        _POOL.append((key, df))
        evict = []
        while len(_POOL) > CAPACITY:
            evict.append(_POOL.popleft()[1])
    for old in evict:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session torn down / already unpersisted — both fine
    return df
