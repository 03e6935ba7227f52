"""JDBC source: database-backed streams with partitioned parallel reads.

The reference reaches databases through Airbyte connectors (e.g.
source-postgres) as subprocesses; Spark's JDBC reader replaces that with a
distributed scan.  Scale notes baked in:

* reads are split across executors via ``partitionColumn`` /
  ``numPartitions`` / ``lowerBound`` / ``upperBound`` when a numeric or
  timestamp split column is available — a single-connection JDBC read is a
  driver bottleneck at scale;
* Catalyst pushes filters (incl. the incremental cursor predicate) and
  projections into the generated SQL.

No JDBC driver jar ships in this environment, so tests exercise
config/plumbing only; the read path is standard ``spark.read.jdbc``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog, StreamEntry, SyncMode
from .base import Source, SourceError, register


@register
class JdbcSource(Source):
    name = "jdbc"

    @classmethod
    def spec(cls) -> dict[str, Any]:
        return {
            "type": "object",
            "properties": {
                "url": {"type": "string", "description": "jdbc:... URL"},
                "tables": {
                    "type": "array",
                    "items": {"type": "string"},
                    "description": "tables to expose as streams",
                },
                "user": {"type": ["string", "null"]},
                "password": {"type": ["string", "null"], "airbyte_secret": True},
                "driver": {"type": ["string", "null"]},
                "partition_column": {"type": ["object", "null"],
                                     "description": "table -> numeric split column"},
                "num_partitions": {"type": ["integer", "null"], "default": 8},
                "cursors": {"type": ["object", "null"]},
            },
            "required": ["url", "tables"],
        }

    def _options(self, table: str) -> dict[str, str]:
        opts = {"url": self.config["url"], "dbtable": table}
        for k in ("user", "password", "driver"):
            if self.config.get(k):
                opts[k] = self.config[k]
        return opts

    def _bounds(self, spark: SparkSession, table: str, part_col: str):
        """Push MIN/MAX of the split column into the database as a one-row
        subquery scan, so partition bounds never require a full-table read
        driver-side.  Identifier quoting comes from Spark's own JDBC
        dialect registry, matching whatever quoting the main read uses."""
        dialect = spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(
            self.config["url"])
        q = dialect.quoteIdentifier(part_col)
        sub = f"(SELECT MIN({q}) AS lo, MAX({q}) AS hi FROM {table}) AS bounds"
        r = spark.read.format("jdbc")
        for k, v in self._options(sub).items():
            r = r.option(k, v)
        row = r.load().first()
        return (row[0], row[1]) if row else (None, None)

    def _reader(self, spark: SparkSession, table: str):
        r = spark.read.format("jdbc")
        for k, v in self._options(table).items():
            r = r.option(k, v)
        part_col = (self.config.get("partition_column") or {}).get(table)
        if part_col:
            # Spark requires all-or-none of partitionColumn/bounds/
            # numPartitions; derive missing bounds from the database
            # (0 is a valid bound — test ``is None``, not truthiness).
            lo = self.config.get("lowerBound")
            hi = self.config.get("upperBound")
            if lo is None or hi is None:
                dlo, dhi = self._bounds(spark, table, part_col)
                lo = dlo if lo is None else lo
                hi = dhi if hi is None else hi
            if lo is not None and hi is not None:
                r = (r.option("partitionColumn", part_col)
                      .option("numPartitions",
                              str(self.config.get("num_partitions", 8)))
                      .option("lowerBound", str(lo))
                      .option("upperBound", str(hi)))
        return r

    def discover(self, spark: SparkSession) -> Catalog:
        cat = Catalog()
        cursors = self.config.get("cursors") or {}
        for table in self.config["tables"]:
            try:
                schema = self._reader(spark, table).load().schema
            except Exception as e:  # pragma: no cover - needs live DB
                raise SourceError(f"jdbc discover failed for {table}: {e}") from e
            cursor = cursors.get(table)
            cat.add(
                StreamEntry(
                    name=table,
                    schema=schema,
                    replication_key=cursor if cursor in schema.names else None,
                    supported_sync_modes=[SyncMode.FULL_REFRESH]
                    + ([SyncMode.INCREMENTAL] if cursor in schema.names else []),
                    source=self.name,
                )
            )
        return cat

    def read(self, spark: SparkSession, stream: StreamEntry) -> DataFrame:
        return self._reader(spark, stream.name).load()
