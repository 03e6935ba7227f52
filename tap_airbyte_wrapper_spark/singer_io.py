"""Singer message output: SCHEMA / RECORD / STATE JSONL.

The reference serializes every Singer message with orjson + sorted-keys
determinism and applies runtime type coercions in ``default()``
(tap_airbyte/tap.py:48-80).  Here the same envelope is produced from
DataFrames:

* **SCHEMA** — from the stream's StructType via
  :func:`schema.struct_to_json_schema`.
* **RECORD** — rows serialized to JSON.  Two paths:
  - :func:`write_singer_stdout` — driver-side, ordered, golden-test
    compatible (sorted keys, one message per line), for tap-parity CLI use;
    streams via ``toLocalIterator`` so the driver never holds the full
    dataset.
  - :func:`write_singer_files` — fully distributed: each Spark task writes
    its partition's RECORD lines (text sink), for 100 TB scale where a
    single stdout pipe is not the bottleneck we keep.
* **STATE** — from the BookmarkStore, emitted after records (at-least-once
  ordering, tap.py:895-898).

Type coercions mirror tap.py:48-59: timestamps/dates -> ISO-8601 strings,
decimals -> float, bytes -> base64 (deliberate divergence from the
reference's lossy UTF-8 decode — media payloads must round-trip),
everything unknown -> str.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import enum
import json
import sys
import uuid
from typing import Any, IO

from pyspark.sql import DataFrame, functions as F, types as T

from .schema import struct_to_json_schema

__all__ = [
    "coerce_value",
    "singer_message",
    "record_json_expr",
    "write_singer_stdout",
    "write_singer_files",
]


def coerce_value(obj: Any) -> Any:
    """Python-side coercions matching the reference serializer
    (tap.py:48-59)."""
    if isinstance(obj, (_dt.datetime, _dt.date)):
        return obj.isoformat()
    if isinstance(obj, decimal.Decimal):
        return float(obj)
    if isinstance(obj, uuid.UUID):
        return str(obj)
    if isinstance(obj, (bytes, bytearray)):
        # schema.py declares binary fields as base64 strings
        # (contentEncoding) — divergence from the reference's lossy
        # UTF-8 decode (tap.py:55-56), deliberate: media payloads from
        # the binary_files source must round-trip.
        import base64

        return base64.b64encode(bytes(obj)).decode("ascii")
    if isinstance(obj, enum.Enum):
        return obj.value
    if isinstance(obj, dict):
        return {k: coerce_value(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [coerce_value(v) for v in obj]
    if obj is None or isinstance(obj, (str, int, float, bool)):
        return obj
    return str(obj)


def singer_message(message: dict[str, Any]) -> str:
    """One Singer message as a deterministic JSON line (sorted keys, the
    reference's OPT_SORT_KEYS discipline, tests/test_syncs.py:42)."""
    return json.dumps(coerce_value(message), sort_keys=True, separators=(",", ":"))


def _normalize_columns(df: DataFrame) -> DataFrame:
    """Rewrite columns so JSON output matches the reference coercions —
    JVM-side expressions, no Python UDFs."""
    exprs = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        if isinstance(f_.dataType, T.TimestampType):
            c = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(f_.name)
        elif isinstance(f_.dataType, T.DateType):
            c = F.date_format(c, "yyyy-MM-dd").alias(f_.name)
        elif isinstance(f_.dataType, T.DecimalType):
            c = c.cast("double").alias(f_.name)
        elif isinstance(f_.dataType, T.BinaryType):
            # base64, matching the declared contentEncoding (a bare
            # string cast would UTF-8-mangle media bytes)
            c = F.base64(c).alias(f_.name)
        else:
            c = c.alias(f_.name)
        exprs.append(c)
    return df.select(*exprs)


def record_json_expr(df: DataFrame, stream: str):
    """Column producing the full Singer RECORD envelope as one JSON string,
    computed executor-side (``to_json(struct(...))``)."""
    ndf = _normalize_columns(df)
    # ignoreNullFields=false: the stdout path (json.dumps of row.asDict) and the
    # reference's orjson output both serialize null-valued fields; to_json's
    # default would drop them, making the two sinks disagree on the same row.
    rec = F.to_json(
        F.struct(*[F.col(f.name) for f in ndf.schema.fields]),
        {"ignoreNullFields": "false"},
    )
    line = F.concat(
        F.lit('{"record":'),
        rec,
        F.lit(',"stream":"' + stream + '","type":"RECORD"}'),
    )
    return ndf, line.alias("value")


def write_singer_stdout(
    df: DataFrame,
    stream: str,
    key_properties: list[str] | None = None,
    bookmark_state: dict[str, Any] | None = None,
    out: IO[str] | None = None,
) -> int:
    """Emit SCHEMA + RECORDs + STATE for one stream to a text sink.

    Driver-side but streaming: rows come through ``toLocalIterator`` so only
    one partition is resident at a time.  Returns the record count.
    """
    out = out or sys.stdout
    out.write(
        singer_message(
            {
                "type": "SCHEMA",
                "stream": stream,
                "schema": struct_to_json_schema(df.schema),
                "key_properties": key_properties or [],
            }
        )
        + "\n"
    )
    n = 0
    for row in _normalize_columns(df).toLocalIterator():
        out.write(
            singer_message(
                {"type": "RECORD", "stream": stream, "record": row.asDict(recursive=True)}
            )
            + "\n"
        )
        n += 1
    if bookmark_state is not None:
        out.write(singer_message({"type": "STATE", "value": bookmark_state}) + "\n")
    out.flush()
    return n


def write_singer_files(df: DataFrame, stream: str, path: str, mode: str = "append") -> None:
    """Distributed Singer RECORD sink: every task writes its own partition
    as JSONL text.  The scale path — no driver funnel, no collect."""
    ndf, line = record_json_expr(df, stream)
    ndf.select(line).write.mode(mode).text(path)
