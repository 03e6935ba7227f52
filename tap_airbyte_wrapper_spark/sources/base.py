"""Source abstraction + registry.

The reference's "source" is any Airbyte connector launched as a subprocess
speaking the Airbyte protocol (``spec``/``check``/``discover``/``read``,
reference tap_airbyte/tap.py:441-455, 471-746).  The Spark-native engine
replaces the subprocess boundary with an in-process registry of Source
implementations exposing the same four verbs:

* ``spec()``      — config JSON Schema (tap.py:471-522 analogue)
* ``check()``     — cheap connectivity probe, returns bool (tap.py:524-582)
* ``discover()``  — Catalog of StreamEntry (tap.py:707-746)
* ``read()``      — one stream -> DataFrame (tap.py:584-642)

The native-mode resolver / OCI preflight / tempfile handoff of the
reference (tap.py:313-455) have no Spark analogue — the registry lookup IS
the resolver.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog, StreamEntry

__all__ = ["Source", "register", "get_source", "list_sources", "SourceError"]

_REGISTRY: dict[str, type["Source"]] = {}


class SourceError(RuntimeError):
    """Raised when a source fails check/discover/read — the analogue of the
    reference's AirbyteException fail-fast (tap.py:648-657)."""


class Source(ABC):
    """One logical data source producing schema'd streams."""

    name: str = "abstract"

    def __init__(self, config: dict[str, Any] | None = None):
        self.config = config or {}

    # -- the four Airbyte verbs -------------------------------------------

    @classmethod
    def spec(cls) -> dict[str, Any]:
        """Config JSON Schema for this source."""
        return {"type": "object", "properties": {}}

    def check(self, spark: SparkSession) -> bool:
        """Cheap probe: try a limit(0) discovery read."""
        try:
            cat = self.discover(spark)
            for entry in cat:
                self.read(spark, entry).limit(0).collect()
                break
            return True
        except Exception:
            return False

    @abstractmethod
    def discover(self, spark: SparkSession) -> Catalog:
        """Enumerate streams + schemas."""

    @abstractmethod
    def read(self, spark: SparkSession, stream: StreamEntry) -> DataFrame:
        """Full scan of one stream (incremental predicates are applied by
        the sync planner on top — Catalyst pushes them into the scan)."""

    def read_incremental(
        self, spark: SparkSession, stream: StreamEntry, bookmark: Any
    ) -> DataFrame:
        """Scan past the bookmark.  Default: filter on the cursor column —
        Catalyst pushes the predicate into the scan.  Sources whose cursor
        column is derived (e.g. nanosecond-timestamp conversion) override
        this to filter the RAW column so pushdown still happens.
        """
        df = self.read(spark, stream)
        if bookmark is None or not stream.replication_key:
            return df
        from pyspark.sql import functions as F

        ctype = df.schema[stream.replication_key].dataType
        return df.filter(F.col(stream.replication_key) > F.lit(bookmark).cast(ctype))


def register(cls: type[Source]) -> type[Source]:
    """Class decorator: add a Source to the registry under ``cls.name``."""
    _REGISTRY[cls.name] = cls
    return cls


def get_source(name: str, config: dict[str, Any] | None = None) -> Source:
    try:
        return _REGISTRY[name](config)
    except KeyError:
        raise SourceError(
            f"unknown source {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def list_sources() -> dict[str, type[Source]]:
    return dict(_REGISTRY)
