"""Local-filesystem helpers shared by the compaction utilities.

These walk the driver-visible filesystem, so they only describe
local/NFS paths — the compactors that use them (`compact_parquet`,
`minhash_index_compact`, `ivf_compact`) report file counts as a
small-files diagnostic, not as a correctness input; on object stores
the counts are simply absent from the report.
"""

from __future__ import annotations

import os

__all__ = ["list_parquet_files", "count_parquet_files"]


def list_parquet_files(path: str) -> list[str]:
    """All ``*.parquet`` data files under ``path``, recursively."""
    return [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs if f.endswith(".parquet")
    ]


def count_parquet_files(path: str) -> int:
    return len(list_parquet_files(path))
