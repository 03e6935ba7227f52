"""Stream maps + flattening semantics (SURVEY.md §2.2)."""

import pytest
from pyspark.sql import Row, functions as F

from tap_airbyte_wrapper_spark.maps import (
    StreamMapper,
    apply_stream_map,
    compile_map_expression,
    flatten,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "ada", 10.0), (2, "bob", 20.0), (3, "cyd", 30.0)],
        "id long, name string, amount double",
    )


def test_expression_compiler():
    assert compile_map_expression("record['a'] + record['b']") == "`a` + `b`"
    assert compile_map_expression("config['key']", {"key": "s3cret"}) == "'s3cret'"
    assert compile_map_expression("config['n']", {"n": 7}) == "7"
    assert compile_map_expression("str(id)") == "string(id)"
    assert compile_map_expression("md5(name)") == "md5(name)"


def test_drop_and_rename(df):
    out = apply_stream_map(df, {"amount": "__NULL__", "full_name": "upper(name)"})
    assert "amount" not in out.columns
    rows = {r.id: r.full_name for r in out.collect()}
    assert rows[1] == "ADA"


def test_filter_and_keep_only(df):
    out = apply_stream_map(
        df, {"__filter__": "amount > 15", "id": None, "__else__": "__NULL__"}
    )
    assert out.columns == ["id"]
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_stream_removal(df):
    assert apply_stream_map(df, "__NULL__") is None


def test_computed_from_config(df):
    out = apply_stream_map(
        df, {"tagged": "concat(name, '-', config['env'])"},
        config={"env": "prod"},
    )
    assert out.filter("id = 1").first().tagged == "ada-prod"


def test_flatten_depth_and_overflow(spark):
    df = spark.createDataFrame(
        [Row(id=1, a=Row(b=Row(c="deep"), x=5), tags=["t1", "t2"])]
    )
    flat = flatten(df, max_depth=10)
    assert set(flat.columns) == {"id", "a__b__c", "a__x", "tags"}
    assert flat.first().a__b__c == "deep"
    # arrays at leaves JSON-stringified
    assert flat.first().tags == '["t1","t2"]'

    capped = flatten(df, max_depth=1)
    assert "a__b" in capped.columns
    assert capped.first().a__b == '{"c":"deep"}'


def test_flatten_collision(spark):
    df = spark.createDataFrame([Row(a=Row(b=1), a__b=2)])
    with pytest.raises(ValueError, match="collision"):
        flatten(df)


def test_mapper_alias_duplicate_remove(df):
    m = StreamMapper({
        "people": {"__source__": "users", "upper_name": "upper(name)"},
        "users_copy": {"__source__": "users"},
        "secrets": "__NULL__",
    })
    outs = dict((name, d) for name, d in m.apply("users", df))
    assert set(outs) == {"people", "users_copy"}
    assert "upper_name" in outs["people"].columns
    assert m.apply("secrets", df) == []
    # unmapped stream passes through
    assert [n for n, _ in m.apply("other", df)] == ["other"]


def test_mapper_else_null(df):
    m = StreamMapper({"keep": {"__source__": "keep"}, "__else__": "__NULL__"})
    assert m.apply("dropme", df) == []
    assert [n for n, _ in m.apply("keep", df)] == ["keep"]


def test_key_properties_override(df):
    m = StreamMapper({"users": {"__key_properties__": ["id"]}})
    assert m.key_properties_override("users") == ["id"]
    assert m.key_properties_override("other") is None


def test_computed_sees_original_record(df):
    # Singer SDK semantics: every map expression evaluates against the
    # ORIGINAL record.  An overwrite of one column must not leak into a
    # later expression referencing it (and the result must not depend on
    # dict order).
    out = apply_stream_map(
        df, {"amount": "amount + 1", "doubled": "amount * 2"}
    )
    r = out.filter("id = 1").first()
    assert r.amount == 11.0
    assert r.doubled == 20.0  # 10 * 2, not 11 * 2
    # Reverse declaration order: same result.
    out2 = apply_stream_map(
        df, {"doubled": "amount * 2", "amount": "amount + 1"}
    )
    r2 = out2.filter("id = 1").first()
    assert (r2.amount, r2.doubled) == (11.0, 20.0)


def test_computed_overwrite_keeps_column_position(df):
    out = apply_stream_map(df, {"name": "upper(name)", "extra": "id * 10"})
    assert out.columns == ["id", "name", "amount", "extra"]
    assert out.filter("id = 2").first().name == "BOB"


def test_computed_referencing_dropped_column(df):
    # Compute-first-drop-after: a computed column may reference a column
    # the same map drops.
    out = apply_stream_map(df, {"amount": "__NULL__", "cents": "amount * 100"})
    assert "amount" not in out.columns
    assert out.filter("id = 3").first().cents == 3000.0
