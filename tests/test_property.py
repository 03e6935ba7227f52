"""Property-based tests (hypothesis) for the two trickiest pure-Python
layers — the gap SURVEY.md §5 calls out in the reference's own testing:

* JSON Schema <-> StructType conversion round-trips over arbitrary nested
  schemas (canonical Spark types);
* BookmarkStore three-dialect merge semantics: STREAM upserts are
  last-write-wins per (name, namespace), GLOBAL/LEGACY replace, and
  commit -> load is lossless for any merge sequence.
"""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

import pytest


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


from tap_airbyte_wrapper_spark.schema import (
    json_schema_to_struct,
    struct_to_json_schema,
)
from tap_airbyte_wrapper_spark.state import BookmarkStore, StateDialect

# ---------------------------------------------------------------- schemas

_names = st.text(string.ascii_lowercase + "_", min_size=1, max_size=8)

_scalars = st.sampled_from([
    T.LongType(), T.DoubleType(), T.BooleanType(), T.StringType(),
    T.TimestampType(), T.DateType(),
])


def _types(depth: int = 2):
    if depth == 0:
        return _scalars
    inner = _types(depth - 1)
    return st.one_of(
        _scalars,
        inner.map(lambda t: T.ArrayType(t, containsNull=True)),
        st.lists(
            st.tuples(_names, inner), min_size=1, max_size=3,
            unique_by=lambda kv: kv[0],
        ).map(lambda kvs: T.StructType(
            [T.StructField(n, t, nullable=True) for n, t in kvs])),
    )


_structs = st.lists(
    st.tuples(_names, _types()), min_size=1, max_size=5,
    unique_by=lambda kv: kv[0],
).map(lambda kvs: T.StructType(
    [T.StructField(n, t, nullable=True) for n, t in kvs]))


@settings(max_examples=200, deadline=None)
@given(_structs)
def test_struct_json_schema_roundtrip(struct):
    assert json_schema_to_struct(struct_to_json_schema(struct)) == struct


@settings(max_examples=100, deadline=None)
@given(_structs)
def test_json_schema_output_is_singer_shaped(struct):
    js = struct_to_json_schema(struct)
    assert js["type"] == "object"
    for node in js["properties"].values():
        t = node["type"]
        # nullable fields carry the reference's null-union shape
        assert (isinstance(t, list) and "null" in t) or isinstance(t, str)


# ------------------------------------------------------------------ state

_stream_names = st.sampled_from(["users", "orders", "events", "items"])
_cursor_vals = st.integers(min_value=0, max_value=10**9)

_stream_msgs = st.builds(
    lambda name, val: {
        "type": StateDialect.STREAM,
        "stream": {"stream_descriptor": {"name": name},
                   "stream_state": {"cursor": val}},
    },
    _stream_names, _cursor_vals,
)

_legacy_msgs = st.builds(
    lambda val: {"type": StateDialect.LEGACY,
                 "data": {"users": {"cursor": val}}},
    _cursor_vals,
)

_global_msgs = st.builds(
    lambda name, val: {
        "type": StateDialect.GLOBAL,
        "global": {"shared_state": {"cdc": val},
                   "stream_states": [{"stream_descriptor": {"name": name},
                                      "stream_state": {"cursor": val}}]},
    },
    _stream_names, _cursor_vals,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_stream_msgs, min_size=1, max_size=20))
def test_stream_merge_is_last_write_wins(msgs):
    store = BookmarkStore()
    for m in msgs:
        store.merge(m)
    last = {}
    for m in msgs:
        last[m["stream"]["stream_descriptor"]["name"]] = \
            m["stream"]["stream_state"]
    assert store.bookmarks == last
    # v2 list: exactly one entry per stream, matching the last write
    v2 = {e["stream"]["stream_descriptor"]["name"]:
          e["stream"]["stream_state"] for e in store.airbyte_state}
    assert v2 == last


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(_stream_msgs, _legacy_msgs, _global_msgs),
                min_size=1, max_size=20))
def test_any_merge_sequence_roundtrips_through_commit(tmp_path_factory, msgs):
    store = BookmarkStore()
    for m in msgs:
        store.merge(m)
    p = str(tmp_path_factory.mktemp("state") / "state.json")
    store.commit(p)
    reloaded = BookmarkStore.load(p)
    assert reloaded.bookmarks == store.bookmarks
    assert reloaded.airbyte_state == store.airbyte_state


@settings(max_examples=100, deadline=None)
@given(st.lists(_stream_msgs, min_size=1, max_size=10), _global_msgs)
def test_global_replaces_stream_state(stream_msgs, global_msg):
    store = BookmarkStore()
    for m in stream_msgs:
        store.merge(m)
    store.merge(global_msg)
    assert len(store.airbyte_state) == 1
    assert store.airbyte_state[0]["type"] == StateDialect.GLOBAL
    # bookmarks reflect ONLY the global message's stream states
    gname = global_msg["global"]["stream_states"][0][
        "stream_descriptor"]["name"]
    assert set(store.bookmarks) == {gname}


# ------------------------------------------------------------- stream maps

_cols = ["a", "b", "c", "d"]


@settings(max_examples=60, deadline=None)
@given(
    st.sets(st.sampled_from(_cols), max_size=3),            # dropped
    st.sets(st.sampled_from(["x", "y"]), max_size=2),       # computed
    st.integers(min_value=-5, max_value=5),                 # filter cutoff
)
def test_stream_map_random_specs(spark_global, dropped, computed, cutoff):
    """Any combination of drop/computed/filter directives produces exactly
    the declared columns and exactly the rows passing the filter."""
    from tap_airbyte_wrapper_spark.maps import StreamMapper

    spark = spark_global
    df = spark.createDataFrame(
        [(i, i * 2, i - 3, f"s{i}") for i in range(10)],
        "a long, b long, c long, d string")
    spec = {c: "__NULL__" for c in dropped}
    for name in computed:
        spec[name] = "a + b"
    spec["__filter__"] = f"a > {cutoff}"
    mapper = StreamMapper(stream_maps={"t": spec})
    [(_, out)] = mapper.apply("t", df)

    expected_cols = [c for c in _cols if c not in dropped] + sorted(computed)
    assert sorted(out.columns) == sorted(expected_cols)
    rows = out.collect()
    assert len(rows) == sum(1 for i in range(10) if i > cutoff)
    if computed:
        for r in rows:
            for name in computed:
                # a + b == 3a for this frame
                assert getattr(r, name) % 3 == 0
