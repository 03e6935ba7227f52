"""Sync orchestrator: discover -> select -> incremental -> transform -> sink.

The Spark-native replacement for the reference's ``sync_all``
(tap_airbyte/tap.py:781-902).  The reference's demux loop, per-stream
queues, and consumer threads (tap.py:789-813, 967-999) exist to parallelize
a single subprocess pipe — Spark's scheduler already parallelizes per
partition, so the orchestrator is a straight plan-per-stream loop:

for each selected stream:
    DataFrame  = source.read(stream)                # distributed scan
    += cursor predicate when incremental            # pushed into the scan
    += stream maps / flattening                     # Catalyst expressions
    sink write                                      # distributed or stdout
    bookmark = max(cursor) observed in the SAME pass
    commit state only after the write succeeded     # at-least-once, §4.3

Also preserved: per-stream metrics ("Synced N streams in X seconds",
tap.py:899-902) and fail-fast error propagation (tap.py:648-657).
"""

from __future__ import annotations

import logging
import sys
import time
from typing import Any, IO

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from .catalog import Catalog, StreamEntry, SyncMode
from .maps import StreamMapper
from .singer_io import coerce_value, singer_message, write_singer_files
from .sources import get_source
from .state import BookmarkStore

logger = logging.getLogger("tap_airbyte_wrapper_spark")

__all__ = ["Engine", "SyncResult"]


class SyncResult:
    def __init__(self) -> None:
        self.stream_counts: dict[str, int] = {}
        self.wall_seconds: float = 0.0

    @property
    def total_records(self) -> int:
        return sum(self.stream_counts.values())


class Engine:
    """Top-level engine API: spec / check / discover / sync.

    ``config`` shape::

        {
          "source": "dataset_dir",          # registry key
          "source_config": {"path": ...},   # source-specific
          "streams": ["events", ...],       # selection; omit = all
          "replication_method": {"events": "INCREMENTAL"},
          "stream_maps": {...}, "stream_map_config": {...},
          "flattening_enabled": false, "flattening_max_depth": 10,
          "state_path": "state.json",
          "parallelism": 4,                 # concurrent stream jobs (file sinks)
          "sink": {"type": "stdout" | "files" | "parquet" | "json",
                   "path": ..., "mode": "append"},
          # declarative data-quality gate, evaluated BEFORE the write:
          "expectations": {"events": [
              {"column": "event_id", "kind": "not_null"},
              {"column": "event_id", "kind": "unique"},
              {"column": "user_id", "kind": "foreign_key",
               "ref_stream": "users", "ref_col": "user_id"}]},
          "expectations_mode": "warn"       # or "fail": violating batch
        }                                   # never reaches the sink

    Beyond-reference: the reference ships records downstream unexamined
    (quality = JSON-schema typing only); here the quality layer
    (``operators/quality.py``) plugs into the sync path as config.
    """

    def __init__(self, spark: SparkSession, config: dict[str, Any]):
        self.spark = spark
        self.config = config
        self.source = get_source(config["source"], config.get("source_config"))
        self.mapper = StreamMapper(
            config.get("stream_maps"),
            config.get("stream_map_config"),
            config.get("flattening_enabled", False),
            config.get("flattening_max_depth", 10),
        )
        self.state = BookmarkStore.load(config.get("state_path", ""))
        import threading

        self._state_lock = threading.Lock()

    # ------------------------------------------------------------ lifecycle

    def spec(self) -> dict[str, Any]:
        return type(self.source).spec()

    def check(self) -> bool:
        return self.source.check(self.spark)

    def discover(self) -> Catalog:
        cat = self.source.discover(self.spark)
        selection = self.config.get("streams")
        # [] is a real instruction ("select nothing" — e.g. a catalog
        # file that deselects every stream); only a missing/None key
        # means "all streams".
        if selection is not None:
            cat.select(selection)
        methods = self.config.get("replication_method") or {}
        for entry in cat:
            entry.negotiate(methods.get(entry.name))
        return cat

    # ---------------------------------------------------------- plan pieces

    def stream_df(self, entry: StreamEntry) -> DataFrame:
        """Scan one stream, incremental when negotiated — the reference's
        state handoff (tap.py:592-611) becomes a cursor predicate the
        source guarantees is pushed into the scan."""
        if entry.sync_mode == SyncMode.INCREMENTAL and entry.replication_key:
            bookmark = self.state.get_bookmark(entry.name, entry.replication_key)
            if bookmark is not None:
                return self.source.read_incremental(self.spark, entry, bookmark)
        return self.source.read(self.spark, entry)

    # ------------------------------------------------------------ backfill

    def backfill(
        self,
        stream: str,
        lo: Any,
        hi: Any,
        sink: dict[str, Any] | None = None,
    ) -> int:
        """Re-sync ONE historical cursor window ``[lo, hi)`` of a
        stream WITHOUT touching the forward bookmark — the ops move
        after a bad upstream day: patch the window, leave the
        continuously-running incremental sync's state alone.

        The range lands as a filter on the raw cursor column, so both
        bounds push into the scan (footer/row-group pruning on a
        cursor-sorted layout skips everything outside the window).
        Stream maps apply exactly as in a normal sync; with a key-less
        append sink the caller should expect the window's rows
        duplicated (route backfills at a merge sink — keyed upsert
        makes the patch idempotent).  Returns the record count.

        Beyond-reference: the reference can only replay from a doctored
        state file, which MOVES the real bookmark (tap.py:819-884).
        """
        from dataclasses import replace as _dc_replace

        catalog = self.discover().configured()
        if stream not in catalog:
            raise ValueError(
                f"stream {stream!r} not in the configured catalog "
                f"(selected: {[e.name for e in catalog]})")
        entry = catalog.get(stream)
        if not entry.replication_key:
            raise ValueError(
                f"stream {stream!r} has no cursor column to backfill by")
        cur = F.col(entry.replication_key)
        window = self.source.read(self.spark, entry).filter(
            (cur >= F.lit(lo)) & (cur < F.lit(hi)))
        sink = sink or self.config.get("sink") or {"type": "stdout"}
        total = 0
        self._expectations = self._build_expectations()
        # the write must NEVER track state for a backfill — the stdout
        # sink in particular would REPLACE (and so regress) the forward
        # bookmark and emit it as a Singer STATE message; demoting the
        # entry to FULL_REFRESH for the write turns every cursor/state
        # path off without touching the real catalog entry
        w_entry = _dc_replace(entry, sync_mode=SyncMode.FULL_REFRESH)
        base = window
        self._check_expectations(entry.name, base)
        for out_name, df in self.mapper.apply(entry.name, base):
            pks = (self.mapper.key_properties_override(entry.name)
                   or entry.primary_keys)
            n, _ = self._write(df, out_name, w_entry, pks, sink, None)
            total += n
        logger.info("backfilled %d records of %s in [%s, %s)",
                    total, stream, lo, hi)
        return total

    # ---------------------------------------------------------------- sync

    def sync(self, out: IO[str] | None = None) -> SyncResult:
        started = time.perf_counter()
        result = SyncResult()
        catalog = self.discover().configured()
        sink = self.config.get("sink") or {"type": "stdout"}
        entries = list(catalog)
        self._expectations = self._build_expectations()

        # The reference runs one consumer thread per stream (tap.py:789-791)
        # to overlap I/O on a single pipe; here driver threads submit
        # CONCURRENT SPARK JOBS, which the scheduler interleaves across
        # executor slots.  stdout sinks stay serial — Singer output must be
        # one ordered message stream.
        workers = int(self.config.get("parallelism", 1))
        if workers > 1 and sink.get("type", "stdout") != "stdout":
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=workers) as pool:
                for counts in pool.map(
                    lambda e: self._sync_entry(e, sink, None), entries
                ):
                    for name, n in counts.items():
                        result.stream_counts[name] = (
                            result.stream_counts.get(name, 0) + n)
        else:
            for entry in entries:
                for name, n in self._sync_entry(entry, sink, out).items():
                    result.stream_counts[name] = (
                        result.stream_counts.get(name, 0) + n)

        result.wall_seconds = time.perf_counter() - started
        logger.info(
            "Synced %d streams in %.2f seconds", len(result.stream_counts), result.wall_seconds
        )
        return result

    def _sync_entry(
        self, entry: StreamEntry, sink: dict[str, Any], out: IO[str] | None
    ) -> dict[str, int]:
        """Sync one stream end-to-end; returns per-output record counts.
        State mutation + commit are serialized under a lock (bookmark
        upserts from concurrent streams must not interleave mid-commit)."""
        t0 = time.perf_counter()
        counts: dict[str, int] = {}
        base = self.stream_df(entry)
        # expectations speak SOURCE column names, so they gate the
        # pre-map frame (a stream map may rename/drop the column); one
        # evaluation per stream, not per mapped output
        self._check_expectations(entry.name, base)
        for out_name, df in self.mapper.apply(entry.name, base):
            pks = self.mapper.key_properties_override(entry.name) or entry.primary_keys
            n, cursor_max = self._write(df, out_name, entry, pks, sink, out)
            counts[out_name] = counts.get(out_name, 0) + n
            # Commit ordering: bookmark only after the sink accepted the
            # batch (at-least-once; reference §4.3).
            with self._state_lock:
                if entry.sync_mode == SyncMode.INCREMENTAL and entry.replication_key \
                        and cursor_max is not None:
                    self.state.set_bookmark(
                        entry.name, entry.replication_key, coerce_value(cursor_max)
                    )
        with self._state_lock:
            if self.config.get("state_path"):
                self.state.commit(self.config["state_path"])
        logger.info(
            "synced stream %s in %.2fs", entry.name, time.perf_counter() - t0
        )
        return counts

    def _build_expectations(self) -> "dict[str, list]":
        """Compile config-declared quality rules per stream; a
        ``foreign_key`` rule's ``ref_stream`` resolves to a read of
        that stream from the same source (key columns only reach the
        join, so the gate's extra cost is key-projected scans)."""
        from .operators.quality import Expectation

        spec = self.config.get("expectations") or {}
        compiled: dict[str, list] = {}
        catalog = None
        for stream, rules in spec.items():
            exps = []
            for rule in rules:
                kw = dict(rule)
                column = kw.pop("column")
                kind = kw.pop("kind")
                ref_stream = kw.pop("ref_stream", None)
                if ref_stream is not None:
                    if catalog is None:   # one discovery for ALL rules
                        catalog = self.discover()
                    if ref_stream not in catalog:
                        raise ValueError(
                            f"expectations[{stream!r}]: foreign_key "
                            f"ref_stream {ref_stream!r} is not a stream "
                            f"of this source (available: "
                            f"{sorted(e.name for e in catalog)})")
                    ref_entry = catalog.get(ref_stream)
                    kw["ref"] = self.source.read(self.spark, ref_entry)
                exps.append(Expectation(column, kind, **kw))
            compiled[stream] = exps
        return compiled

    def _check_expectations(self, stream: str, df: DataFrame) -> None:
        """Evaluate the stream's declared rules on the PRE-MAP frame
        (rules reference SOURCE column names) BEFORE any write — in
        ``fail`` mode a violating batch never reaches the sink (and the
        bookmark never advances, so the fixed source re-syncs cleanly);
        ``warn`` (default) logs and proceeds.  Cost: one extra
        aggregate job per synced stream that declares rules."""
        from .operators.quality import validate_expectations
        from .sources import SourceError

        exps = getattr(self, "_expectations", {}).get(stream)
        if not exps:
            return
        rows = validate_expectations(df, exps).collect()
        bad = [r for r in rows if not r["passed"]]
        for r in bad:
            logger.warning(
                "expectation %s failed on stream %s: %d violations",
                r["expectation"], stream, r["n_violations"])
        if bad and self.config.get("expectations_mode", "warn") == "fail":
            raise SourceError(
                f"stream {stream!r} failed expectations: "
                + ", ".join(f"{r['expectation']}({r['n_violations']})"
                            for r in bad))

    def _write(
        self,
        df: DataFrame,
        stream_name: str,
        entry: StreamEntry,
        pks: list[str],
        sink: dict[str, Any],
        out: IO[str] | None,
    ) -> tuple[int, Any]:
        """Write one stream; returns (record_count, max cursor value).

        File sinks use the Observation API so count + max(cursor) come from
        the SAME pass as the write — no second scan of the source.
        """
        kind = sink.get("type", "stdout")
        cursor = entry.replication_key if entry.sync_mode == SyncMode.INCREMENTAL else None

        if kind == "stdout":
            # Driver-funnel Singer output (tap parity).  Track max cursor
            # while iterating — single pass.
            out = out or sys.stdout
            stream = out
            n = 0
            cursor_max = None
            from .schema import struct_to_json_schema
            from .singer_io import _normalize_columns

            stream.write(singer_message({
                "type": "SCHEMA", "stream": stream_name,
                "schema": struct_to_json_schema(df.schema),
                "key_properties": pks or [],
            }) + "\n")
            for row in _normalize_columns(df).toLocalIterator():
                d = row.asDict(recursive=True)
                stream.write(singer_message(
                    {"type": "RECORD", "stream": stream_name, "record": d}) + "\n")
                n += 1
                if cursor is not None and d.get(cursor) is not None:
                    v = d[cursor]
                    cursor_max = v if cursor_max is None or v > cursor_max else cursor_max
            if cursor is not None and cursor_max is not None:
                self.state.set_bookmark(entry.name, cursor, cursor_max)
            stream.write(singer_message(
                {"type": "STATE", "value": self.state.to_dict()}) + "\n")
            stream.flush()
            return n, cursor_max

        observed = [F.count(F.lit(1)).alias("n")]
        if cursor:
            observed.append(F.max(F.col(cursor)).alias("cursor_max"))
        obs = Observation()
        plain = df
        df = df.observe(obs, *observed)

        path = sink.get("path")
        mode = sink.get("mode", "append")
        if kind == "merge":
            # CDC apply: upsert the batch onto a versioned parquet
            # snapshot (sinks.py).  Default recency = the stream cursor,
            # so replayed at-least-once batches stay idempotent.
            from .sinks import merge_snapshot_write

            merge_snapshot_write(
                df, stream_name, path, pks,
                order_col=sink.get("order_col", cursor),
                delete_col=sink.get("delete_col"),
                keep_versions=int(sink.get("keep_versions", 2)),
                n_buckets=sink.get("n_buckets"),
            )
            got = obs.get
            return int(got["n"]), got.get("cursor_max")
        if kind == "files":
            write_singer_files(df, stream_name, f"{path}/{stream_name}", mode)
        elif kind == "parquet":
            out_df, ts_conf, sort_obs = df, None, None
            sort_by = sink.get("sort_by")
            if sort_by == "cursor":
                sort_by = [cursor] if cursor else None
            if sort_by:
                # cursor/range-sorted layout: disjoint row-group ranges
                # so the NEXT incremental read's bookmark predicate
                # prunes files instead of scanning them (sinks.py
                # write_pruned_layout rationale; INT96 timestamps carry
                # no footer stats, hence MICROS for the write).  The
                # observation attaches ABOVE the range exchange: the
                # partitioner's boundary-sampling pass re-executes the
                # subtree BELOW it, and an observe placed there counts
                # every row twice.
                spark = df.sparkSession
                n = spark.sparkContext.defaultParallelism
                sort_obs = Observation()
                out_df = plain.repartitionByRange(
                    n, *[F.col(c) for c in sort_by]
                ).sortWithinPartitions(*sort_by).observe(sort_obs, *observed)
                ts_conf = spark.conf.get(
                    "spark.sql.parquet.outputTimestampType", None)
                spark.conf.set(
                    "spark.sql.parquet.outputTimestampType",
                    "TIMESTAMP_MICROS")
            try:
                w = out_df.write.mode(mode)
                if sink.get("partition_by"):
                    w = w.partitionBy(*sink["partition_by"])
                w.parquet(f"{path}/{stream_name}")
            finally:
                if sort_by:
                    if ts_conf is not None:
                        df.sparkSession.conf.set(
                            "spark.sql.parquet.outputTimestampType", ts_conf)
                    else:
                        df.sparkSession.conf.unset(
                            "spark.sql.parquet.outputTimestampType")
            if sort_obs is not None:
                got = sort_obs.get
                return int(got["n"]), got.get("cursor_max")
        elif kind == "json":
            df.write.mode(mode).json(f"{path}/{stream_name}")
        elif kind == "jdbc":
            # EL "load" parity: land the stream in a database through
            # Spark's JDBC writer (per-partition batched inserts —
            # distributed, no driver funnel).  Incremental syncs compose
            # naturally: the cursor predicate trims the batch BEFORE the
            # write, so mode="append" receives only new rows.
            w = (df.write.format("jdbc")
                 .option("url", sink["url"])
                 .option("dbtable",
                         f"{sink.get('table_prefix', '')}{stream_name}")
                 .mode(mode))
            if sink.get("driver"):
                w = w.option("driver", sink["driver"])
            for k in ("user", "password", "batchsize", "isolationLevel"):
                if sink.get(k) is not None:
                    w = w.option(k, str(sink[k]))
            w.save()
        else:
            raise ValueError(f"unknown sink type {kind!r}")
        got = obs.get
        return int(got["n"]), got.get("cursor_max")
