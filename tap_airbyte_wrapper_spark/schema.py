"""JSON Schema <-> Spark StructType conversion.

The reference engine discovers stream schemas as JSON Schema documents from
Airbyte connectors (reference: tap_airbyte/tap.py:707-746) and carries them
verbatim into Singer SCHEMA messages.  In the Spark-native engine every
stream is a DataFrame, so the JSON Schema becomes a ``StructType`` at plan
time and the reverse conversion produces the Singer SCHEMA payload for the
output layer.

Semantics preserved from the reference corpus (tests/fixtures/KPHX.singer,
tests/fixtures/SMEARGLE.singer):

* ``type`` may be a string or a list; ``"null"`` in a type union marks the
  field nullable (all reference fixtures are null-unioned).
* ``integer`` -> LongType, ``number`` -> DoubleType, ``string`` ->
  StringType, ``boolean`` -> BooleanType (matching the reference's orjson
  output coercions, tap.py:48-59: no decimals, no binary passthrough).
* ``object`` with ``properties`` -> StructType (recursive).
* ``object`` without ``properties`` (open / additionalProperties) ->
  MapType(String, String) escape hatch.
* ``array`` with ``items`` -> ArrayType(converted items); without ``items``
  -> ArrayType(StringType).
* string ``format: date-time``/``date`` -> TimestampType/DateType (Airbyte
  convention), everything else stays StringType.
* Union of multiple non-null types (e.g. ["string","integer"]) degrades to
  StringType — the reference serializes mixed types as JSON text anyway.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

__all__ = [
    "json_schema_to_struct",
    "struct_to_json_schema",
    "spark_type_for",
    "json_type_for",
]

_PRIMITIVES = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


def _type_union(schema: dict[str, Any]) -> tuple[list[str], bool]:
    """Normalize a JSON-Schema ``type`` into (non-null types, nullable)."""
    t = schema.get("type", [])
    if isinstance(t, str):
        t = [t]
    types = [x for x in t if x != "null"]
    nullable = "null" in t or not types
    # anyOf/oneOf unions: collect member types (config schemas in the
    # reference use oneOf, tap.py:509-517).
    for key in ("anyOf", "oneOf"):
        for member in schema.get(key, []) or []:
            sub, sub_null = _type_union(member)
            types.extend(x for x in sub if x not in types)
            nullable = nullable or sub_null
    return types, nullable


def spark_type_for(schema: dict[str, Any]) -> T.DataType:
    """Convert one JSON-Schema node to a Spark DataType."""
    types, _ = _type_union(schema)
    if not types:
        return T.StringType()
    if len(types) > 1:
        # Mixed-type union: JSON-text escape hatch.
        return T.StringType()
    jt = types[0]
    if jt == "object":
        props = schema.get("properties")
        if props:
            return json_schema_to_struct(schema)
        return T.MapType(T.StringType(), T.StringType())
    if jt == "array":
        items = schema.get("items")
        if isinstance(items, dict) and items:
            return T.ArrayType(spark_type_for(items), containsNull=True)
        return T.ArrayType(T.StringType(), containsNull=True)
    if jt == "string":
        fmt = schema.get("format")
        if fmt == "date-time":
            return T.TimestampType()
        if fmt == "date":
            return T.DateType()
        return T.StringType()
    return _PRIMITIVES.get(jt, T.StringType())


def json_schema_to_struct(schema: dict[str, Any]) -> T.StructType:
    """Convert a JSON-Schema ``object`` node to a StructType.

    Field order follows the ``properties`` insertion order, matching the
    column order of the discovered stream.
    """
    fields = []
    required = set(schema.get("required", []) or [])
    for name, prop in (schema.get("properties") or {}).items():
        if not isinstance(prop, dict):
            prop = {}
        _, nullable = _type_union(prop)
        nullable = nullable or name not in required
        fields.append(T.StructField(name, spark_type_for(prop), nullable=nullable))
    return T.StructType(fields)


def json_type_for(dt: T.DataType, nullable: bool = True) -> dict[str, Any]:
    """Convert a Spark DataType back to a JSON-Schema node.

    Produces the null-union shape the reference emits in SCHEMA messages
    (e.g. ``{"type": ["number", "null"]}``).
    """

    def union(base: str | list[str], extra: dict[str, Any] | None = None) -> dict[str, Any]:
        types = [base] if isinstance(base, str) else list(base)
        if nullable:
            types = types + ["null"]
        node: dict[str, Any] = {"type": types if len(types) > 1 else types[0]}
        if extra:
            node.update(extra)
        return node

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return union("integer")
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return union("number")
    if isinstance(dt, T.BooleanType):
        return union("boolean")
    if isinstance(dt, T.TimestampType):
        return union("string", {"format": "date-time"})
    if isinstance(dt, T.DateType):
        return union("string", {"format": "date"})
    if isinstance(dt, T.BinaryType):
        # The reference decodes bytes to UTF-8 on output (tap.py:55-56);
        # we keep binary columns but describe them as base64 strings.
        return union("string", {"contentEncoding": "base64"})
    if isinstance(dt, T.ArrayType):
        return union("array", {"items": json_type_for(dt.elementType, dt.containsNull)})
    if isinstance(dt, T.MapType):
        return union("object", {"additionalProperties": True})
    if isinstance(dt, T.StructType):
        return union("object", {"properties": {
            f.name: json_type_for(f.dataType, f.nullable) for f in dt.fields
        }})
    return union("string")


def struct_to_json_schema(struct: T.StructType) -> dict[str, Any]:
    """Convert a StructType to a Singer-compatible JSON Schema document."""
    return {
        "type": "object",
        "properties": {
            f.name: json_type_for(f.dataType, f.nullable) for f in struct.fields
        },
    }
