"""Round-15 optimization invariants.

Round-14 verdict item 3: lazy-return functions must not hold bare
``persist()`` handles (unbounded executor cache in a long session) —
every cache either has an explicit ``unpersist`` point in the same
file (pagerank-style try/finally, streaming batch scope) or routes
through the bounded pool in ``functions/_cache.py``.
"""

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "tap_airbyte_wrapper_spark"

_PERSIST = re.compile(r"(?<!un)\.persist\(")


def test_no_bare_persist_without_unpersist_point():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        if py.name == "_cache.py":
            continue  # the pool itself owns the persist
        src = py.read_text()
        if _PERSIST.search(src) and ".unpersist(" not in src:
            offenders.append(str(py.relative_to(PKG)))
    assert not offenders, (
        "bare .persist() with no unpersist point in the same file — "
        "route lazy-return caches through functions._cache.cache_bounded: "
        f"{offenders}"
    )
