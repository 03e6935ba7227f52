"""Unit tests for the round-5 operators: boilerplate line removal,
duplicated-span coverage, rolling-window anomaly detection, and
deterministic training-shard assignment/writing.

Fleet/oracle coverage lives in tests/test_oracle_parity.py
(boilerplate_removal_docs, dup_span_docs, anomaly_events, shard_stats);
these tests pin the semantics on small hand-built inputs where the
expected values are obvious.
"""

import datetime

import pytest
from pyspark.sql import Row, functions as F

from tap_airbyte_wrapper_spark.functions import (
    assign_shards,
    boilerplate_removal,
    dup_span_stats,
    write_training_shards,
)
from tap_airbyte_wrapper_spark.operators import (
    detect_anomalies,
    rolling_stats,
)


# ------------------------------------------------------------ boilerplate


def test_boilerplate_removes_every_occurrence(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="menu\nunique one\nfooter"),
        Row(doc_id=2, text="menu\nunique two\nfooter"),
        Row(doc_id=3, text="menu\nunique three"),
    ])
    out = {r.doc_id: r.text for r in boilerplate_removal(
        df, "doc_id", "text", sep="\n", min_docs=2).collect()}
    # "menu" (3 docs) and "footer" (2 docs) are template noise -> gone
    # everywhere, including their first occurrences.
    assert out == {1: "unique one", 2: "unique two", 3: "unique three"}


def test_boilerplate_doc_fully_template_vanishes(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="menu\nfooter"),
        Row(doc_id=2, text="menu\nkept\nfooter"),
        Row(doc_id=3, text="menu\nfooter"),
    ])
    out = boilerplate_removal(
        df, "doc_id", "text", sep="\n", min_docs=2).collect()
    assert {r.doc_id for r in out} == {2}
    assert out[0].text == "kept"


def test_boilerplate_frac_threshold_and_order(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="z common a"),
        Row(doc_id=2, text="common b"),
        Row(doc_id=3, text="c common"),
        Row(doc_id=4, text="d only"),
    ])
    out = {r.doc_id: r.text for r in boilerplate_removal(
        df, "doc_id", "text", sep=" ", min_doc_frac=0.75).collect()}
    # "common" sits in 3/4 docs = 0.75 >= threshold; unit order survives.
    assert out == {1: "z a", 2: "b", 3: "c", 4: "d only"}


def test_boilerplate_requires_exactly_one_threshold(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        boilerplate_removal(df, "doc_id", "text")
    with pytest.raises(ValueError):
        boilerplate_removal(
            df, "doc_id", "text", min_docs=2, min_doc_frac=0.5)


def test_boilerplate_shuffled_anti_join_same_answer(spark):
    df = spark.createDataFrame([
        Row(doc_id=i, text="menu\nbody %d" % i) for i in range(6)
    ])
    a = boilerplate_removal(
        df, "doc_id", "text", sep="\n", min_docs=3).collect()
    b = boilerplate_removal(
        df, "doc_id", "text", sep="\n", min_docs=3,
        broadcast_bad=False).collect()
    assert sorted((r.doc_id, r.text) for r in a) == \
        sorted((r.doc_id, r.text) for r in b)


# ------------------------------------------------------------ dup spans


def test_dup_span_coverage_planted_overlap(spark):
    shared = "one two three four five six seven eight"   # one 8-gram
    df = spark.createDataFrame([
        Row(doc_id=1, text=shared + " alpha"),            # 2 grams, 1 shared
        Row(doc_id=2, text=shared + " beta"),             # 2 grams, 1 shared
        Row(doc_id=3, text="totally different words here x y z q"),  # 1 gram
        Row(doc_id=4, text="short doc"),                  # 0 grams
    ])
    out = {r.doc_id: r for r in dup_span_stats(
        df, "doc_id", "text", n=8).collect()}
    assert out[1].n_grams == 2 and out[1].n_dup_grams == 1
    assert out[1].dup_frac == 0.5
    assert out[2].n_grams == 2 and out[2].n_dup_grams == 1
    assert out[3].n_grams == 1 and out[3].n_dup_grams == 0
    assert out[3].dup_frac == 0.0
    assert out[4].n_grams == 0 and out[4].dup_frac is None


def test_dup_span_distinct_grams_within_doc(spark):
    # a doc repeating its own gram does NOT count as duplicated unless
    # another doc has it: coverage is a cross-document signal.
    rep = "a b c d e f g h " * 2   # grams repeat internally
    df = spark.createDataFrame([
        Row(doc_id=1, text=rep.strip()),
        Row(doc_id=2, text="totally unrelated text with no overlap at all ok"),
    ])
    out = {r.doc_id: r for r in dup_span_stats(
        df, "doc_id", "text", n=8).collect()}
    assert out[1].n_dup_grams == 0


# ------------------------------------------------------------ anomalies


def _events(spark, vals, key=1):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame([
        Row(user_id=key, event_id=i,
            ts=base + datetime.timedelta(minutes=i), value=float(v))
        for i, v in enumerate(vals)
    ])


def test_rolling_stats_trailing_frame_excludes_current(spark):
    df = _events(spark, [1.0, 2.0, 3.0, 4.0])
    out = sorted(
        rolling_stats(df, "user_id", ["ts", "event_id"], "value",
                      window_rows=2).collect(),
        key=lambda r: r.event_id)
    assert out[0].roll_n == 0 and out[0].roll_mean is None
    assert out[1].roll_mean == 1.0
    assert out[2].roll_mean == 1.5          # mean(1, 2)
    assert out[3].roll_mean == 2.5          # mean(2, 3) — current excluded


def test_detect_anomalies_flags_spike_not_baseline(spark):
    vals = [10.0, 10.1, 9.9, 10.0, 10.05, 50.0, 10.0]
    out = detect_anomalies(
        _events(spark, vals), "user_id", ["ts", "event_id"], "value",
        window_rows=5, threshold=3.0, min_baseline=3).collect()
    assert [r.event_id for r in out] == [5]
    assert out[0].zscore > 3


def test_detect_anomalies_cold_start_never_flags(spark):
    # second point wildly off but only 1 trailing observation
    out = detect_anomalies(
        _events(spark, [10.0, 1000.0]), "user_id", ["ts", "event_id"],
        "value", window_rows=5, threshold=2.0, min_baseline=3).collect()
    assert out == []


def test_detect_anomalies_constant_baseline_no_div_zero(spark):
    out = detect_anomalies(
        _events(spark, [5.0, 5.0, 5.0, 5.0, 99.0]), "user_id",
        ["ts", "event_id"], "value",
        window_rows=5, threshold=2.0, min_baseline=3).collect()
    # stddev of constant baseline is 0 -> guarded, not flagged/crashed
    assert out == []


def test_detect_anomalies_per_key_isolation(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for key, scale in [(1, 1.0), (2, 100.0)]:
        for i, v in enumerate([1.0, 1.1, 0.9, 1.0, 8.0]):
            rows.append(Row(
                user_id=key, event_id=key * 100 + i,
                ts=base + datetime.timedelta(minutes=i),
                value=v * scale))
    out = detect_anomalies(
        spark.createDataFrame(rows), "user_id", ["ts", "event_id"],
        "value", window_rows=5, threshold=3.0, min_baseline=3).collect()
    # the same relative spike flags in BOTH keys: baselines don't leak
    assert sorted(r.event_id for r in out) == [104, 204]


# ------------------------------------------------------------ shards


def test_assign_shards_deterministic_and_total(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(500)])
    a = assign_shards(df, "doc_id", 16).collect()
    b = assign_shards(df.repartition(7), "doc_id", 16).collect()
    assert sorted((r.doc_id, r.shard) for r in a) == \
        sorted((r.doc_id, r.shard) for r in b)
    shards = {r.shard for r in a}
    assert shards <= set(range(16))
    # md5 balance: every shard populated at n=500, none dominant
    counts = [sum(1 for r in a if r.shard == s) for s in sorted(shards)]
    assert len(shards) == 16 and max(counts) < 3 * min(counts)


def test_assign_shards_salt_redeals(spark):
    df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    a = {r.doc_id: r.shard for r in assign_shards(df, "doc_id", 16).collect()}
    b = {r.doc_id: r.shard for r in assign_shards(
        df, "doc_id", 16, salt="v2").collect()}
    assert any(a[i] != b[i] for i in a)


def test_write_training_shards_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(100)])
    path = str(tmp_path / "shards")
    write_training_shards(df, path, id_col="doc_id", num_shards=8)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert {r.shard for r in back.select("shard").distinct().collect()} \
        <= set(range(8))
    # membership matches assign_shards exactly (restart-stable write)
    expect = {r.doc_id: r.shard for r in assign_shards(
        df, "doc_id", 8).collect()}
    got = {r.doc_id: int(r.shard) for r in back.collect()}
    assert got == expect


# ------------------------------------------------------- incremental dedup


@pytest.fixture(scope="module")
def mh_index(spark, tmp_path_factory):
    """A small corpus indexed to bucketed tables + a delta batch with
    planted corpus-dups, delta-dups, and clean docs."""
    from tap_airbyte_wrapper_spark.functions import minhash_index_write

    corpus = spark.createDataFrame([
        Row(doc_id=i,
            text=("the quick brown fox jumps over the lazy dog %d " % i) * 5)
        for i in range(40)
    ])
    path = str(tmp_path_factory.mktemp("mh_index"))
    minhash_index_write(
        corpus, "doc_id", "text", "mh_t", path,
        num_hashes=64, bands=16, n_buckets=4)
    yield spark, corpus, path
    spark.sql("DROP TABLE IF EXISTS mh_t_postings")
    spark.sql("DROP TABLE IF EXISTS mh_t_sigs")


def test_minhash_delta_finds_corpus_and_delta_dups(mh_index):
    from tap_airbyte_wrapper_spark.functions import minhash_dedup_delta

    spark, corpus, path = mh_index
    delta = spark.createDataFrame([
        # near-dup of corpus doc 7 (one word changed)
        Row(doc_id=1007,
            text=("the quick brown fox jumps over the lazy dog 7 " * 5)
            .replace("jumps", "leaps", 1)),
        # two delta docs duplicating each other, unseen in corpus
        Row(doc_id=1008, text="completely novel payload alpha beta gamma "
                              "delta epsilon zeta eta theta " * 3),
        Row(doc_id=1009, text="completely novel payload alpha beta gamma "
                              "delta epsilon zeta eta theta " * 3),
        # clean
        Row(doc_id=1010, text="unrelated text about spark partitions and "
                              "shuffle boundaries nothing else"),
    ])
    out = minhash_dedup_delta(
        delta, "mh_t", path, "doc_id", "text", threshold=0.5).collect()
    kinds = {(r.id_a, r.id_b): r.kind for r in out}
    assert (1007, 7) in kinds and kinds[(1007, 7)] == "corpus"
    assert (1008, 1009) in kinds and kinds[(1008, 1009)] == "delta"
    ids = {r.id_a for r in out} | {r.id_b for r in out}
    assert 1010 not in ids


def test_minhash_delta_corpus_side_never_shuffles(mh_index):
    from tap_airbyte_wrapper_spark.functions import minhash_dedup_delta

    spark, corpus, path = mh_index
    delta = spark.createDataFrame(
        [Row(doc_id=2000, text="some delta content here ok fine")])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = minhash_dedup_delta(
            delta, "mh_t", path, "doc_id", "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # bucketed corpus scans are read bucket-pruned/co-located: no
    # Exchange may repartition the postings or sigs table output
    assert "SelectedBucketsCount" in plan
    assert "Exchange hashpartitioning(bkey" in plan       # delta side only
    # exactly the delta-side exchanges: dpost->bkey (x2: corpus join +
    # self join), candidates->id joins; corpus tables contribute none.
    # conservative upper bound that still fails if a corpus shuffle
    # appears (each corpus shuffle adds an Exchange on id/bkey of the
    # corpus relation)
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 6, plan


def test_minhash_delta_agrees_with_batch_operator(spark, mh_index):
    """Index+delta path finds the same >=t estimated pairs as running
    the batch pair generator over corpus+delta combined (restricted to
    pairs touching the delta)."""
    from tap_airbyte_wrapper_spark.functions import (
        minhash_dedup_delta,
        minhash_near_dup_pairs,
    )

    _, corpus, path = mh_index
    delta = corpus.sparkSession.createDataFrame([
        Row(doc_id=1007,
            text=("the quick brown fox jumps over the lazy dog 7 " * 5)
            .replace("jumps", "leaps", 1)),
        Row(doc_id=1008, text="completely novel payload alpha beta gamma "
                              "delta epsilon zeta eta theta " * 3),
        Row(doc_id=1009, text="completely novel payload alpha beta gamma "
                              "delta epsilon zeta eta theta " * 3),
    ])
    inc = {(r.id_a, r.id_b) for r in minhash_dedup_delta(
        delta, "mh_t", path, "doc_id", "text", threshold=0.5).collect()}
    both = corpus.unionByName(delta)
    batch = minhash_near_dup_pairs(
        both, "doc_id", "text", num_hashes=64, bands=16,
        threshold=0.5).collect()
    delta_ids = {1007, 1008, 1009}
    batch_pairs = set()
    for r in batch:
        if r.id_a in delta_ids or r.id_b in delta_ids:
            # normalize to (delta_id, other) like the incremental output
            d = r.id_a if r.id_a in delta_ids else r.id_b
            o = r.id_b if d == r.id_a else r.id_a
            if o in delta_ids:
                batch_pairs.add((min(d, o), max(d, o)))
            else:
                batch_pairs.add((d, o))
    assert inc == batch_pairs


# ------------------------------------------------------- pruned layout


def test_write_pruned_layout_disjoint_row_groups(spark, sf_dir, tmp_path):
    """Files written by write_pruned_layout carry DISJOINT sort-key
    ranges in their parquet footers — the min/max statistics a reader
    uses to skip row groups — while a naive write overlaps."""
    import glob

    import pyarrow.parquet as pq

    from tap_airbyte_wrapper_spark.sinks import write_pruned_layout
    from tap_airbyte_wrapper_spark.sources.files import load_parquet

    ev = load_parquet(spark, f"{sf_dir}/events.parquet")
    laid = str(tmp_path / "laid")
    write_pruned_layout(ev, laid, ["ts"], target_files=4)

    def ranges(root):
        out = []
        for f in glob.glob(f"{root}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "ts")
                st = col.statistics
                out.append((st.min, st.max))
        return sorted(out)

    rs = ranges(laid)
    assert len(rs) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(rs, rs[1:]):
        assert hi1 <= lo2, (hi1, lo2)   # disjoint, ordered

    # naive layout (hash-partitioned arrival order) overlaps — written
    # with MICROS too, else INT96 carries no stats to compare at all
    naive = str(tmp_path / "naive")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        ev.repartition(4).write.parquet(naive)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    ns = ranges(naive)
    overlaps = sum(1 for (l1, h1), (l2, h2) in zip(ns, ns[1:]) if h1 > l2)
    assert overlaps > 0

    # and the engine's cursor predicate reaches the scan as a pushed
    # filter over the sorted layout
    back = spark.read.parquet(laid).filter("ts > timestamp'2024-01-15'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThan(ts" in plan
    assert back.count() == ev.filter("ts > timestamp'2024-01-15'").count()


def test_write_pruned_layout_with_partitions(spark, sf_dir, tmp_path):
    from tap_airbyte_wrapper_spark.sinks import write_pruned_layout
    from tap_airbyte_wrapper_spark.sources.files import load_parquet

    ev = load_parquet(spark, f"{sf_dir}/events.parquet")
    path = str(tmp_path / "by_type")
    write_pruned_layout(
        ev, path, ["ts"], partition_cols=["event_type"], target_files=4)
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    one = back.filter("event_type = 'click'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # directory-level pruning: only the click partition is read
    assert "PartitionFilters: [isnotnull(event_type" in plan
