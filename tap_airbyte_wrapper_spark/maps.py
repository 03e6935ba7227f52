"""Stream maps + schema flattening as DataFrame rewrites.

The reference inherits these row-level operators from the Meltano Singer SDK
by declaring the ``stream-maps`` capability (reference meltano.yml:17,
README.md:20-23; applied inside ``Stream.sync`` which the reference invokes
at tap.py:957).  Semantics re-expressed on DataFrames (SURVEY.md §2.2):

* drop column     — map value ``__NULL__``            -> ``df.drop``
* keep-only       — ``__else__: __NULL__``            -> ``df.select``
* rename/computed — ``new: <expression>``             -> ``withColumn(F.expr)``
* row filter      — ``__filter__: <bool expr>``       -> ``df.filter``
* PK override     — ``__key_properties__``            -> catalog metadata
* stream remove   — stream mapped to ``__NULL__``     -> skip DataFrame
* stream alias/duplicate — map key != stream name     -> output-name change
* flattening      — nested structs -> ``parent__child`` columns, depth-capped
                    (``flattening_max_depth``); overflow depth re-serialized
                    as JSON strings, like the SDK.

Expressions are compiled from the SDK's simpleeval dialect to Spark SQL
``F.expr`` strings — the hot path stays JVM-side, no Python UDFs.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F, types as T

__all__ = [
    "NULL_SENTINEL",
    "compile_map_expression",
    "flatten",
    "apply_stream_map",
    "StreamMapper",
]

NULL_SENTINEL = "__NULL__"

_RECORD_REF = re.compile(r"record\[(?P<q>['\"])(?P<name>[^'\"]+)(?P=q)\]")
_CONFIG_REF = re.compile(r"config\[(?P<q>['\"])(?P<name>[^'\"]+)(?P=q)\]")
_STR_CALL = re.compile(r"\bstr\(")


def compile_map_expression(expr: str, config: dict[str, Any] | None = None) -> str:
    """Translate a Singer-SDK map expression into a Spark SQL expression.

    Supported dialect (covers the documented stream-map surface):
    ``record['col']`` -> `` `col` ``; ``config['key']`` -> literal;
    ``str(x)`` -> ``cast(x as string)``; ``md5``/``concat``/arithmetic and
    any valid Spark SQL pass through unchanged.
    """
    config = config or {}

    def config_sub(m: re.Match) -> str:
        val = config.get(m.group("name"))
        if val is None:
            return "null"
        if isinstance(val, bool):
            return "true" if val else "false"
        if isinstance(val, (int, float)):
            return repr(val)
        return "'" + str(val).replace("'", "\\'") + "'"

    out = _RECORD_REF.sub(lambda m: f"`{m.group('name')}`", expr)
    out = _CONFIG_REF.sub(config_sub, out)
    out = _STR_CALL.sub("string(", out)
    return out


def _flatten_fields(
    prefix: str, dtype: T.DataType, col: Column, depth: int, max_depth: int
) -> list[Column]:
    """Recursive struct expansion with the SDK's depth-overflow rule."""
    if isinstance(dtype, T.StructType) and depth < max_depth:
        cols: list[Column] = []
        for f in dtype.fields:
            cols.extend(
                _flatten_fields(
                    f"{prefix}__{f.name}" if prefix else f.name,
                    f.dataType,
                    col.getField(f.name),
                    depth + 1,
                    max_depth,
                )
            )
        return cols
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        # Overflow depth (or non-struct complex leaf): JSON-stringify,
        # matching the SDK's re-serialization of deeper levels.
        return [F.to_json(col).alias(prefix)]
    return [col.alias(prefix)]


def flatten(df: DataFrame, max_depth: int = 10) -> DataFrame:
    """Expand nested structs into ``parent__child`` columns.

    ``max_depth`` counts struct levels expanded; anything deeper (and any
    array/map leaf) is re-serialized as a JSON string.  Collisions (two
    paths flattening to one name) raise, since silent override loses data.
    """
    cols: list[Column] = []
    for f in df.schema.fields:
        cols.extend(_flatten_fields(f.name, f.dataType, F.col(f.name), 0, max_depth))
    flat_names = _flatten_names(df.schema, max_depth)
    dupes = {n for n in flat_names if flat_names.count(n) > 1}
    if dupes:
        raise ValueError(f"flattening name collision: {sorted(dupes)}")
    return df.select(*cols)


def _flatten_names(schema: T.StructType, max_depth: int) -> list[str]:
    names: list[str] = []

    def walk(prefix: str, dtype: T.DataType, depth: int) -> None:
        if isinstance(dtype, T.StructType) and depth < max_depth:
            for f in dtype.fields:
                walk(f"{prefix}__{f.name}" if prefix else f.name, f.dataType, depth + 1)
        else:
            names.append(prefix)

    for f in schema.fields:
        walk(f.name, f.dataType, 0)
    return names


def apply_stream_map(
    df: DataFrame,
    stream_map: dict[str, Any] | None,
    config: dict[str, Any] | None = None,
) -> DataFrame | None:
    """Apply one stream's map to its DataFrame.

    Returns None when the stream itself is removed (mapped to __NULL__).
    Order of operations matches the SDK: filter first, then column
    add/rename/drop, then keep-only projection.
    """
    if stream_map is None:
        return df
    if stream_map == NULL_SENTINEL:
        return None
    config = config or {}

    out = df
    filt = stream_map.get("__filter__")
    if filt:
        out = out.filter(F.expr(compile_map_expression(filt, config)))

    keep_only = stream_map.get("__else__") == NULL_SENTINEL
    explicit: list[str] = []
    dropped: list[str] = []
    computed: dict[str, Column] = {}
    # SDK semantics: every expression evaluates against the ORIGINAL
    # record — a computed column may reference a column the same map drops
    # or overwrites.  So all expressions are compiled against the pre-map
    # DataFrame and applied in ONE select (sequential withColumn would let
    # {"b": "b + 1", "a": "b * 2"} see the mapped b, dict-order dependent).
    for name, value in stream_map.items():
        if name.startswith("__") and name.endswith("__"):
            continue
        if value == NULL_SENTINEL:
            dropped.append(name)
            continue
        if value is None:
            explicit.append(name)  # passthrough mention
            continue
        computed[name] = F.expr(compile_map_expression(str(value), config))
        explicit.append(name)
    if computed or dropped:
        cols: list[Column] = []
        for c in out.columns:
            if c in dropped:
                continue
            cols.append(computed.pop(c).alias(c) if c in computed else F.col(c))
        # New columns (not overwriting an existing one) append in map order,
        # matching withColumn's placement.
        cols.extend(expr.alias(name) for name, expr in computed.items())
        out = out.select(*cols)

    if keep_only:
        out = out.select(*[c for c in out.columns if c in explicit])
    return out


class StreamMapper:
    """The full ``stream_maps`` config: alias / duplicate / remove streams
    and per-stream column maps.

    ``apply`` returns ``[(output_name, DataFrame)]`` — 0 entries when the
    stream is removed, >1 when duplicated under aliases.
    """

    def __init__(
        self,
        stream_maps: dict[str, Any] | None = None,
        stream_map_config: dict[str, Any] | None = None,
        flattening_enabled: bool = False,
        flattening_max_depth: int = 10,
    ):
        self.stream_maps = stream_maps or {}
        self.config = stream_map_config or {}
        self.flattening_enabled = flattening_enabled
        self.flattening_max_depth = flattening_max_depth

    def key_properties_override(self, stream: str) -> list[str] | None:
        m = self.stream_maps.get(stream)
        if isinstance(m, dict) and "__key_properties__" in m:
            return list(m["__key_properties__"])
        return None

    def apply(self, stream: str, df: DataFrame) -> list[tuple[str, DataFrame]]:
        if self.flattening_enabled:
            df = flatten(df, self.flattening_max_depth)

        # Maps whose value declares a __source__ of this stream are aliases/
        # duplicates; the map keyed by the stream's own name transforms it.
        outputs: list[tuple[str, DataFrame]] = []
        handled = False
        for out_name, m in self.stream_maps.items():
            source = m.get("__source__", out_name) if isinstance(m, dict) else out_name
            if source != stream:
                continue
            handled = handled or out_name == stream or (
                isinstance(m, dict) and m.get("__source__") == stream
            )
            mapped = apply_stream_map(df, m, self.config)
            if mapped is not None:
                outputs.append((out_name, mapped))
        if not handled and stream not in self.stream_maps:
            if self.stream_maps.get("__else__") == NULL_SENTINEL:
                return []
            outputs.append((stream, df))
        return outputs

    @staticmethod
    def to_json_config(mapper: "StreamMapper") -> str:
        return json.dumps(
            {
                "stream_maps": mapper.stream_maps,
                "stream_map_config": mapper.config,
                "flattening_enabled": mapper.flattening_enabled,
                "flattening_max_depth": mapper.flattening_max_depth,
            },
            sort_keys=True,
        )
