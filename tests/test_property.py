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

# excluded from the driver's budgeted run (see pytest.ini): multi-minute tier
pytestmark = pytest.mark.slow

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


# ------------------------------------------------- round-5 corpus ops

_ascii_word = st.text(string.ascii_lowercase, min_size=1, max_size=5)
_ascii_text = st.lists(_ascii_word, max_size=30).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_ascii_text, min_size=1, max_size=6),
       st.integers(min_value=2, max_value=10),
       st.integers(min_value=0, max_value=8))
def test_chunk_documents_reconstruction_property(
        spark_global, texts, chunk_tokens, overlap):
    """For ANY corpus and window config: stitching chunk 0 plus each
    later chunk minus its overlap reproduces the token stream exactly,
    chunk sizes never exceed the window, and empty docs emit nothing."""
    import re
    from tap_airbyte_wrapper_spark.functions import chunk_documents

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split()
        assert r["n_tokens"] <= chunk_tokens
    for i, t in enumerate(texts):
        toks = re.findall(r"\S+", t.strip())
        if not toks:
            assert i not in got
            continue
        chunks = got[i]
        assert sorted(chunks) == list(range(len(chunks)))
        stitched = list(chunks[0])
        for c in range(1, len(chunks)):
            assert chunks[c - 1][-overlap:] == chunks[c][:overlap] \
                or overlap == 0
            stitched += chunks[c][overlap:]
        assert stitched == toks


@settings(max_examples=10, deadline=None)
@given(st.lists(_ascii_text, min_size=1, max_size=8),
       st.integers(min_value=2, max_value=6))
def test_heavy_hitters_always_exact_above_guarantee(
        spark_global, texts, capacity):
    """Whenever threshold > N/capacity, the two-pass result equals the
    exact filtered counts — for ANY corpus and ANY (tiny) capacity."""
    from collections import Counter
    from tap_airbyte_wrapper_spark.functions import heavy_hitters

    all_toks = [w for t in texts for w in t.strip().split()]
    n = len(all_toks)
    min_count = n // capacity + 1
    df = spark_global.createDataFrame(
        [(t,) for t in texts], "text string").repartition(3)
    got = {r["word"]: r["cnt"]
           for r in heavy_hitters(df, min_count=min_count,
                                  capacity=capacity).collect()}
    want = {w: c for w, c in Counter(all_toks).items() if c >= min_count}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(
    st.characters(blacklist_categories=("Cs",)), max_size=30),
    min_size=1, max_size=5))
def test_normalize_text_idempotent_and_clean(spark_global, texts):
    """normalize(normalize(x)) == normalize(x) for arbitrary unicode,
    and collapse_whitespace output never has doubled/leading spaces."""
    from pyspark.sql import functions as F
    from tap_airbyte_wrapper_spark.functions import normalize_text

    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, s string")
    once = df.select(
        "i", normalize_text(
            F.col("s"), strip_accents=True,
            collapse_whitespace=True).alias("n1"))
    twice = once.select(
        "i", "n1", normalize_text(
            F.col("n1"), strip_accents=True,
            collapse_whitespace=True).alias("n2"))
    for r in twice.collect():
        assert r["n1"] == r["n2"]
        assert "  " not in r["n1"]
        # collapse/trim is ASCII-whitespace by contract (oracle parity)
        assert r["n1"] == r["n1"].strip(" \t\n\r\f\v")


_url_host = st.text(string.ascii_letters + string.digits + "-.",
                    min_size=1, max_size=12).filter(
    lambda s: not s.startswith(".") and ".." not in s)
_url_path = st.text(string.ascii_letters + string.digits + "/_-.",
                    max_size=16)
_url_params = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "utm_source", "utm_x", "gclid", "q"]),
        st.text(string.ascii_lowercase + string.digits, max_size=5)),
    max_size=4)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(
    st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    _url_host, _url_path, _url_params,
    st.sampled_from(["", "#frag", "#a/b?c=1"])), min_size=1, max_size=12))
def test_canonical_url_idempotent(spark_global, parts):
    """canonical(canonical(u)) == canonical(u): the collapse must be a
    fixed point, or URL-dedup keys drift when a canonicalized corpus is
    re-ingested and re-canonicalized."""
    from pyspark.sql import functions as F
    from tap_airbyte_wrapper_spark.functions import canonical_url

    urls = []
    for scheme, host, path, params, frag in parts:
        q = "&".join(f"{k}={v}" for k, v in params)
        urls.append(f"{scheme}://{host}/{path}"
                    + (f"?{q}" if q else "") + frag)
    df = spark_global.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, u string")
    once = df.select("i", canonical_url(F.col("u")).alias("c1"))
    twice = once.select(
        "i", "c1", canonical_url(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r["c1"] == r["c2"], r
        assert "#" not in r["c1"]
        assert "utm_" not in r["c1"] and "gclid" not in r["c1"]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=10),
       st.lists(st.text(max_size=40), min_size=1, max_size=10))
def test_snapshot_diff_vs_python_reference(spark_global, olds, news):
    """Diff classification agrees with a direct Python computation for
    arbitrary (possibly colliding/empty/unicode) payload strings."""
    from tap_airbyte_wrapper_spark.operators import snapshot_diff

    old_rows = [(i, v) for i, v in enumerate(olds)]
    new_rows = [(i, v) for i, v in enumerate(news)]
    old = spark_global.createDataFrame(old_rows, "k long, v string")
    new = spark_global.createDataFrame(new_rows, "k long, v string")
    got = {r["k"]: r["change_type"]
           for r in snapshot_diff(old, new, "k").collect()}
    want = {}
    od, nd = dict(old_rows), dict(new_rows)
    for k in set(od) | set(nd):
        if k not in od:
            want[k] = "added"
        elif k not in nd:
            want[k] = "removed"
        elif od[k] != nd[k]:
            want[k] = "changed"
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text("ab ", min_size=0, max_size=30),
                min_size=1, max_size=12),
       st.integers(min_value=1, max_value=7))
def test_pack_sequences_partition_property(spark_global, texts, seq_len):
    """Offsets tile the concatenated token stream exactly: contiguous,
    gap-free, in id order; every doc's sequence span covers its own
    token interval."""
    from tap_airbyte_wrapper_spark.functions import pack_sequences

    df = spark_global.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = sorted(pack_sequences(df, "doc_id", "text", seq_len=seq_len)
                  .collect(), key=lambda r: r["doc_id"])
    expect_start = 0
    for r in rows:
        assert r["tok_start"] == expect_start
        expect_start += r["n_tok"]
        if r["n_tok"] > 0:
            assert r["seq_start"] == r["tok_start"] // seq_len
            assert r["seq_end"] == (r["tok_start"] + r["n_tok"] - 1) // seq_len


@settings(max_examples=15, deadline=None)
@given(st.floats(min_value=0.1, max_value=3.9).map(lambda x: round(x, 1)))
def test_upsample_repeat_threshold_exact_for_decimal_epochs(
        spark_global, e):
    """For any one-decimal epoch e, per-row multiplicity is exactly
    floor(e) or ceil(e), and the md5-bucket threshold is the exact
    decimal fraction (int() truncation of binary fractions like
    2.3 % 1.0 once lost a bucket)."""
    from tap_airbyte_wrapper_spark.functions import upsample_repeat

    df = spark_global.createDataFrame(
        [(i, "g") for i in range(500)], "doc_id long, source string")
    out = upsample_repeat(df, {"g": e}, "source", "doc_id")
    per = {}
    for r in out.collect():
        per[r["doc_id"]] = per.get(r["doc_id"], 0) + 1
    import math
    lo, hi = math.floor(e), math.ceil(e)
    assert set(per.values()) <= {x for x in (lo, hi) if x > 0}
    # empirical mean multiplicity tracks e (md5 buckets are near-
    # uniform over 500 ids; generous tolerance)
    total = sum(per.values())
    assert abs(total / 500 - e) < 0.15


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from([f"t{k}" for k in range(8)]),
             min_size=1, max_size=10).map(" ".join),
    min_size=2, max_size=10),
    st.sampled_from([0.4, 0.5, 0.75, 0.8, 1.0]))
def test_containment_pairs_prefix_filter_total_recall(
        spark_global, texts, threshold):
    """For ANY corpus and threshold, the df-ordered asymmetric prefix
    filter loses NO qualifying pair: containment_pairs equals the
    Python brute force over all pairs — the total-recall theorem the
    round-8 rewrite rests on, including the float-ceil boundary where
    t*|S| is exactly integral."""
    from tap_airbyte_wrapper_spark.functions import containment_pairs

    def sh_set(text):
        w = text.lower().split()
        if len(w) >= 3:
            return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
        return {" ".join(w)}

    docs = list(enumerate(texts))
    expected = set()
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1:]:
            sa, sb = sh_set(ta), sh_set(tb)
            c = len(sa & sb)
            if c / len(sa) >= threshold or c / len(sb) >= threshold:
                expected.add((ia, ib))

    df = spark_global.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in containment_pairs(
        df, "doc_id", "text", n=3, threshold=threshold).collect()}
    assert got == expected
