"""JSON Schema <-> StructType conversion, exercised against the shapes of
the reference's golden fixtures (KPHX flat schema, SMEARGLE nested schema —
see FIXTURES.md)."""

from pyspark.sql import types as T

from tap_airbyte_wrapper_spark.schema import (
    json_schema_to_struct,
    spark_type_for,
    struct_to_json_schema,
)

KPHX_LIKE = {
    "type": "object",
    "properties": {
        "date": {"type": ["string", "null"]},
        "actual_mean_temp": {"type": ["number", "null"]},
        "record_min_temp_year": {"type": ["number", "null"]},
    },
}

SMEARGLE_LIKE = {
    "type": "object",
    "properties": {
        "id": {"type": ["null", "integer"]},
        "name": {"type": ["null", "string"]},
        "is_default": {"type": ["null", "boolean"]},
        "species": {
            "type": ["null", "object"],
            "properties": {"name": {"type": ["null", "string"]},
                           "url": {"type": ["null", "string"]}},
        },
        "abilities": {
            "type": ["null", "array"],
            "items": {
                "type": ["null", "object"],
                "properties": {
                    "ability": {
                        "type": ["null", "object"],
                        "properties": {"name": {"type": ["null", "string"]}},
                    },
                    "is_hidden": {"type": ["null", "boolean"]},
                    "slot": {"type": ["null", "integer"]},
                },
            },
        },
    },
}


def test_flat_schema():
    st = json_schema_to_struct(KPHX_LIKE)
    assert st["date"].dataType == T.StringType()
    assert st["actual_mean_temp"].dataType == T.DoubleType()
    assert all(f.nullable for f in st.fields)


def test_nested_schema():
    st = json_schema_to_struct(SMEARGLE_LIKE)
    assert st["id"].dataType == T.LongType()
    assert st["is_default"].dataType == T.BooleanType()
    assert isinstance(st["species"].dataType, T.StructType)
    ab = st["abilities"].dataType
    assert isinstance(ab, T.ArrayType)
    assert isinstance(ab.elementType, T.StructType)
    assert isinstance(ab.elementType["ability"].dataType, T.StructType)


def test_open_object_and_untyped():
    assert isinstance(spark_type_for({"type": "object"}), T.MapType)
    assert spark_type_for({}) == T.StringType()
    assert spark_type_for({"type": ["string", "integer"]}) == T.StringType()


def test_datetime_formats():
    assert spark_type_for({"type": "string", "format": "date-time"}) == T.TimestampType()
    assert spark_type_for({"type": "string", "format": "date"}) == T.DateType()


def test_anyof_union():
    assert spark_type_for({"anyOf": [{"type": "string"}, {"type": "null"}]}) == T.StringType()


def test_roundtrip():
    st = json_schema_to_struct(SMEARGLE_LIKE)
    js = struct_to_json_schema(st)
    st2 = json_schema_to_struct(js)
    assert st2 == st


def test_roundtrip_special_types():
    st = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("d", T.DateType()),
        T.StructField("b", T.BinaryType()),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    ])
    js = struct_to_json_schema(st)
    assert js["properties"]["ts"]["format"] == "date-time"
    assert js["properties"]["d"]["format"] == "date"
    st2 = json_schema_to_struct(js)
    assert st2["ts"].dataType == T.TimestampType()
    assert isinstance(st2["m"].dataType, T.MapType)
