"""Relational operator layer: semantics + plan-shape assertions."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from tap_airbyte_wrapper_spark import operators as ops


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_equi_join_broadcast_hint(orders, customer):
    j = ops.equi_join(orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
                      on="o_custkey", broadcast_right=True)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    assert j.count() == orders.count()


def test_semi_anti_partition(orders, customer):
    with_orders = ops.semi_join(
        customer, orders.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey")
    without = ops.anti_join(
        customer, orders.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey")
    assert with_orders.count() + without.count() == customer.count()
    assert with_orders.columns == customer.columns  # no right cols leak


def test_asof_backward(spark):
    quotes = spark.createDataFrame([
        ("A", ts("2024-01-01T10:00:00"), 100.0),
        ("A", ts("2024-01-01T10:05:00"), 101.0),
        ("B", ts("2024-01-01T10:01:00"), 50.0),
    ], "sym string, qts timestamp, price double")
    trades = spark.createDataFrame([
        ("A", ts("2024-01-01T10:03:00"), 10),
        ("A", ts("2024-01-01T10:05:00"), 20),   # equal ts -> inclusive match
        ("A", ts("2024-01-01T09:00:00"), 30),   # before any quote -> null
        ("B", ts("2024-01-01T11:00:00"), 40),
    ], "sym string, tts timestamp, qty int")
    out = ops.asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                        right_prefix="q_").collect()
    by_qty = {r.qty: r for r in out}
    assert by_qty[10].q_price == 100.0
    assert by_qty[20].q_price == 101.0
    assert by_qty[30].q_price is None
    assert by_qty[40].q_price == 50.0
    assert len(out) == 4  # exactly one row per left row


def test_asof_forward_and_tolerance(spark):
    right = spark.createDataFrame(
        [("A", ts("2024-01-01T10:10:00"), 1.0)], "k string, rts timestamp, v double")
    left = spark.createDataFrame(
        [("A", ts("2024-01-01T10:00:00"), 1),
         ("A", ts("2024-01-01T09:00:00"), 2)], "k string, lts timestamp, id int")
    fwd = ops.asof_join(left, right, "k", "lts", "rts", direction="forward")
    assert {r.id: r.v for r in fwd.collect()} == {1: 1.0, 2: 1.0}
    tol = ops.asof_join(left, right, "k", "lts", "rts", direction="forward",
                        tolerance=F.expr("INTERVAL 30 MINUTES"))
    assert {r.id: r.v for r in tol.collect()} == {1: 1.0, 2: None}


def test_range_join_binned(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 30.0)], "pid int, x double")
    ivals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0), (30, 25.0, 40.0)],
        "iid int, lo double, hi double")
    out = ops.range_join(points, ivals, "x", "lo", "hi", bin_width=10.0)
    assert {(r.pid, r.iid) for r in out.collect()} == {(1, 10), (2, 20), (3, 30)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # stayed an equi-join


def test_range_join_requires_strategy(spark):
    df = spark.range(1).withColumn("x", F.lit(1.0))
    iv = spark.range(1).select(F.lit(0.0).alias("lo"), F.lit(2.0).alias("hi"))
    with pytest.raises(ValueError, match="bin_width"):
        ops.range_join(df, iv, "x", "lo", "hi")


def test_grouping_flavors(orders):
    aggs = {"n": F.count(F.lit(1)), "total": F.round(F.sum("o_totalprice"), 2)}
    plain = ops.grouped_agg(orders, ["o_orderstatus"], aggs)
    roll = ops.rollup_agg(orders, ["o_orderstatus", "o_orderpriority"], aggs)
    cube = ops.cube_agg(orders, ["o_orderstatus", "o_orderpriority"], aggs)
    np, nr, nc = plain.count(), roll.count(), cube.count()
    assert nr > np  # rollup adds subtotals + grand total
    assert nc >= nr  # cube adds the priority-only slices too
    grand = roll.filter("o_orderstatus IS NULL AND o_orderpriority IS NULL")
    assert grand.first().n == orders.count()


def test_grouping_sets(orders):
    gs = ops.grouping_sets_agg(
        orders,
        [["o_orderstatus"], ["o_orderpriority"]],
        {"n": "count(*)"},
    )
    st = gs.filter("o_orderpriority IS NULL").count()
    pr = gs.filter("o_orderstatus IS NULL").count()
    assert st + pr == gs.count()


def test_distinct_count(orders):
    exact = ops.distinct_count(orders, ["o_orderstatus"], "o_custkey")
    approx = ops.distinct_count(orders, ["o_orderstatus"], "o_custkey", exact=False)
    e = {r.o_orderstatus: r.o_custkey_distinct for r in exact.collect()}
    a = {r.o_orderstatus: r.o_custkey_distinct for r in approx.collect()}
    for k in e:
        assert abs(a[k] - e[k]) / e[k] < 0.15


def test_dedup_exact_and_latest(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 1), (1, "b", 2), (2, "c", 1)],
        "k int, v string, ver int")
    assert ops.dedup_exact(df).count() == 3
    latest = ops.dedup_latest(df, ["k"], [F.col("ver").desc(), F.col("v")])
    assert {(r.k, r.v) for r in latest.collect()} == {(1, "b"), (2, "c")}


def test_ranked_and_lag(spark):
    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 30.0), ("g", 3, 20.0)], "g string, i int, v double")
    r = ops.ranked(df, ["g"], [F.col("v").desc()], ["row_number", "rank"])
    assert {x.i: x.row_number for x in r.collect()} == {2: 1, 3: 2, 1: 3}
    lag = ops.with_lag_lead(df, ["g"], [F.col("i")], "v", offsets=[1, -1])
    row2 = lag.filter("i = 2").first()
    assert row2.v_lag1 == 10.0 and row2.v_lead1 == 20.0


def test_running_agg(spark):
    df = spark.createDataFrame([("g", i, float(i)) for i in range(1, 5)],
                               "g string, i int, v double")
    out = ops.running_agg(df, ["g"], [F.col("i")], {"run_sum": F.sum("v")})
    assert [r.run_sum for r in out.orderBy("i").collect()] == [1.0, 3.0, 6.0, 10.0]


def test_topk(orders):
    top = ops.topk_per_group(
        orders, ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3)
    sizes = top.groupBy("o_orderpriority").count().collect()
    assert all(r["count"] == 3 for r in sizes)
    # two-phase salted variant prunes per (group, salt) first; with a
    # total order the result must be IDENTICAL to the plain window
    want = sorted(map(tuple, top.collect()))
    for n in (2, 8, 64):  # incl. more buckets than partitions
        salted = ops.topk_per_group(
            orders.repartition(7), ["o_orderpriority"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3,
            salt_buckets=n)
        assert sorted(map(tuple, salted.collect())) == want
    g = ops.global_topk(orders, [F.col("o_totalprice").desc()], 5)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert g.count() == 5


def test_setops(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(1,), (3,)], "x int")
    assert ops.intersect_rows(a, b).count() == 2
    assert sorted(r.x for r in ops.except_rows(a, b).collect()) == [1, 2]
    c = spark.createDataFrame([(4, "y")], "x int, extra string")
    u = ops.union_by_name([a, c])
    assert u.count() == 5 and set(u.columns) == {"x", "extra"}


def test_salted_join_matches_unsalted(spark):
    from tap_airbyte_wrapper_spark.operators import salted_join

    # heavy skew: 90% of rows share key 1
    import pyspark.sql.functions as F
    skewed = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id"))
        .alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame(
        [(1, "hot"), (17, "cold"), (99999, "unmatched")], ["k", "name"])

    plain = skewed.join(dim, "k", "inner")
    salted = salted_join(skewed, dim, "k", salt_buckets=8)
    assert salted.count() == plain.count()
    assert sorted(salted.collect(), key=lambda r: (r.k, r.v)) == \
           sorted(plain.collect(), key=lambda r: (r.k, r.v))

    plain_l = skewed.join(dim, "k", "left")
    salted_l = salted_join(skewed, dim, "k", how="left", salt_buckets=8)
    assert salted_l.count() == plain_l.count() == skewed.count()

    import pytest
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="outer")


def test_range_join_binned_left(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 99.0), (4, 99.0)], "pid int, x double")
    ivals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0)], "iid int, lo double, hi double")
    out = ops.range_join(points, ivals, "x", "lo", "hi",
                         bin_width=10.0, how="left")
    rows = {(r.pid, r.iid) for r in out.collect()}
    # Unmatched points survive with null interval columns — including
    # duplicated unmatched points (one output row per input row).
    assert rows == {(1, 10), (2, 20), (3, None), (4, None)}
    assert out.count() == 4


def test_range_join_binned_rejects_outer(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    ivals = spark.createDataFrame([(10, 0.0, 10.0)],
                                  "iid int, lo double, hi double")
    with pytest.raises(ValueError, match="inner/left"):
        ops.range_join(points, ivals, "x", "lo", "hi",
                       bin_width=10.0, how="full")


def test_global_distribution_ranks_matches_window(orders):
    from pyspark.sql import Window

    order_by = [F.col("o_totalprice"), F.col("o_orderkey")]
    got = ops.global_distribution_ranks(orders, order_by, n_tiles=10)
    w = Window.orderBy(*order_by)
    want = orders.select(
        "o_orderkey",
        F.row_number().over(w).alias("rank"),
        F.ntile(10).over(w).alias("ntile"),
        F.percent_rank().over(w).alias("percent_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )
    g = {r.o_orderkey: (r.rank, r.ntile, round(r.percent_rank, 9),
                        round(r.cume_dist, 9)) for r in got.collect()}
    x = {r.o_orderkey: (r.rank, r.ntile, round(r.percent_rank, 9),
                        round(r.cume_dist, 9)) for r in want.collect()}
    assert g == x
    # plan: the distributed version must have NO unpartitioned window
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window [" not in plan or "__pid" in plan


def test_global_distribution_ranks_small_n(spark):
    from pyspark.sql import Window

    # n < n_tiles exercises the zero-size-bucket branch of the ntile
    # arithmetic; a single row exercises the percent_rank n<=1 guard
    for rows in ([(1, 5.0)], [(1, 5.0), (2, 1.0), (3, 9.0)]):
        df = spark.createDataFrame(rows, "id int, v double")
        order_by = [F.col("v"), F.col("id")]
        got = {r.id: (r.rank, r.ntile, round(r.percent_rank, 9),
                      round(r.cume_dist, 9))
               for r in ops.global_distribution_ranks(
                   df, order_by, n_tiles=10).collect()}
        w = Window.orderBy(*order_by)
        want = {r.id: (r.rank, r.ntile, round(r.percent_rank, 9),
                       round(r.cume_dist, 9))
                for r in df.select(
                    "id",
                    F.row_number().over(w).alias("rank"),
                    F.ntile(10).over(w).alias("ntile"),
                    F.percent_rank().over(w).alias("percent_rank"),
                    F.cume_dist().over(w).alias("cume_dist")).collect()}
        assert got == want


def test_merge_upsert_update_insert_delete(spark):
    from tap_airbyte_wrapper_spark.operators import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "pk long, name string, v long")
    changes = spark.createDataFrame(
        [(2, "b2", 21, False),    # update
         (4, "d", 40, False),     # insert
         (3, "c", 30, True)],     # delete
        "pk long, name string, v long, del boolean")
    got = {r.pk: (r.name, r.v) for r in merge_upsert(
        base, changes, "pk", delete_col="del").collect()}
    assert got == {1: ("a", 10), 2: ("b2", 21), 4: ("d", 40)}


def test_merge_upsert_order_col_latest_wins(spark):
    from tap_airbyte_wrapper_spark.operators import merge_upsert

    base = spark.createDataFrame([(1, 5, "old")], "pk long, ver long, s string")
    stale = spark.createDataFrame([(1, 3, "stale")], "pk long, ver long, s string")
    # a STALE change (lower version) must NOT overwrite a newer base row
    got = merge_upsert(base, stale, "pk", order_col="ver").collect()
    assert [(r.pk, r.ver, r.s) for r in got] == [(1, 5, "old")]
    newer = spark.createDataFrame([(1, 9, "new")], "pk long, ver long, s string")
    got = merge_upsert(base, newer, "pk", order_col="ver").collect()
    assert [(r.pk, r.ver, r.s) for r in got] == [(1, 9, "new")]


def test_merge_upsert_intra_batch_tie_is_deterministic(spark):
    """Two change rows with the same pk and equal (null) order_col must
    pick the same winner on every run — the winner is fixed by an
    xxhash64 over the non-key payload, not partition order (round-4
    advice)."""
    from pyspark.sql import functions as F

    from tap_airbyte_wrapper_spark.operators import merge_upsert

    base = spark.createDataFrame([(1, "base")], "pk long, s string")
    dupes = [(1, "aaa"), (1, "zzz")]
    expected = None
    for ordering in (dupes, dupes[::-1]):
        changes = spark.createDataFrame(
            ordering, "pk long, s string").repartition(4)
        got = merge_upsert(base, changes, "pk").collect()
        assert len(got) == 1
        expected = expected or got[0].s
        assert got[0].s == expected
    # the pick matches the documented rule: min xxhash64 over non-keys
    h = {r.s: r.h for r in spark.createDataFrame(dupes, "pk long, s string")
         .select("s", F.xxhash64("s", F.lit(False)).alias("h")).collect()}
    assert expected == min(h, key=h.get)


def test_merge_upsert_missing_columns_rejected(spark):
    import pytest as _pytest

    from tap_airbyte_wrapper_spark.operators import merge_upsert

    base = spark.createDataFrame([(1, "a")], "pk long, name string")
    narrow = spark.createDataFrame([(1,)], "pk long")
    with _pytest.raises(ValueError, match="missing base columns"):
        merge_upsert(base, narrow, "pk")


def test_merge_upsert_single_shuffle_plan(spark):
    """The merge must be union + one window — no join in the plan."""
    from tap_airbyte_wrapper_spark.operators import merge_upsert

    base = spark.range(100).withColumnRenamed("id", "pk")
    changes = spark.range(50).withColumnRenamed("id", "pk")
    plan = merge_upsert(
        base, changes, "pk")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_gap_fill_modes(spark):
    from tap_airbyte_wrapper_spark.operators import gap_fill

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0, 10.0),
            ("a", t0 + dt.timedelta(seconds=40), 50.0),
            ("b", t0, 7.0)]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")

    def vals(how):
        out = gap_fill(df, "k", "bucket", "v", 10, how=how)
        return {(r.k, r.bucket.second): r.v for r in out.collect()}

    null_fill = vals("null")
    assert null_fill[("a", 10)] is None and null_fill[("a", 0)] == 10.0
    assert len([k for k in null_fill if k[0] == "a"]) == 5  # dense grid
    assert len([k for k in null_fill if k[0] == "b"]) == 1

    locf = vals("locf")
    assert locf[("a", 10)] == 10.0 and locf[("a", 30)] == 10.0
    assert locf[("a", 40)] == 50.0

    lin = vals("linear")
    assert lin[("a", 10)] == 20.0 and lin[("a", 20)] == 30.0
    assert lin[("a", 30)] == 40.0 and lin[("a", 40)] == 50.0


def test_gap_fill_single_shuffle(spark):
    """Grid explode + fill reuse one (key, bucket) partitioning: the
    plan must contain no join-driven exchanges beyond the span agg and
    the window sort."""
    from tap_airbyte_wrapper_spark.operators import gap_fill

    df = (spark.range(100)
          .selectExpr("id % 5 AS k",
                      "timestamp_seconds(id * 20) AS bucket",
                      "CAST(id AS DOUBLE) AS v"))
    plan = gap_fill(df, "k", "bucket", "v", 10, how="locf") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------ fuzzy join


def test_fuzzy_self_join_basic(spark):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.operators import fuzzy_self_join

    df = spark.createDataFrame([
        Row(id=1, name="red widget"),
        Row(id=2, name="red widgets"),      # dist 1 (insert)
        Row(id=3, name="red wadget"),       # dist 1 from #1 (sub)
        Row(id=4, name="blue bolt"),        # far from all
        Row(id=5, name="red widget"),       # exact dup of #1 -> NOT emitted
    ])
    out = {(r.id_a, r.id_b): r.dist for r in fuzzy_self_join(
        df, "id", "name", max_dist=1).collect()}
    assert out[(1, 2)] == 1 and out[(1, 3)] == 1
    assert (2, 5) in out and out[(2, 5)] == 1   # dup expands to all ids
    assert (3, 5) in out
    assert (1, 5) not in out                     # equal strings excluded
    assert not any(4 in p for p in out)


def test_fuzzy_self_join_short_string_fallback(spark):
    """Strings too short for the q-gram guarantee (no shared bigram at
    all) still pair via the broadcast fallback block."""
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.operators import fuzzy_self_join

    df = spark.createDataFrame([
        Row(id=1, name="ab"),
        Row(id=2, name="cb"),     # dist 1, shares NO bigram with "ab"
        Row(id=3, name="a"),      # dist 1 from "ab" (delete)
        Row(id=4, name="zz"),
    ])
    out = {(r.id_a, r.id_b): r.dist for r in fuzzy_self_join(
        df, "id", "name", max_dist=1).collect()}
    assert (1, 2) in out and (1, 3) in out
    assert not any(4 in p for p in out)


def test_fuzzy_self_join_matches_brute_force(spark, sf_dir):
    from pyspark.sql import functions as F

    from tap_airbyte_wrapper_spark.operators import fuzzy_self_join
    from tap_airbyte_wrapper_spark.sources.files import load_parquet

    part = load_parquet(spark, f"{sf_dir}/part.parquet") \
        .select("p_partkey", "p_name")
    fast = {(r.id_a, r.id_b, r.dist) for r in fuzzy_self_join(
        part, "p_partkey", "p_name", max_dist=2).collect()}
    a = part.select(F.col("p_partkey").alias("id_a"),
                    F.col("p_name").alias("na"))
    b = part.select(F.col("p_partkey").alias("id_b"),
                    F.col("p_name").alias("nb"))
    brute = {
        (r.id_a, r.id_b, r.dist)
        for r in a.crossJoin(b)
        .filter("id_a < id_b AND na != nb")
        .withColumn("dist", F.levenshtein("na", "nb"))
        .filter("dist <= 2").collect()
    }
    assert fast == brute and len(fast) > 0


# ------------------------------------------------------------ HLL state


def test_hll_sketch_table_incremental_rollup(spark, sf_dir, tmp_path):
    """Daily per-type sketches persisted incrementally, then every
    rollup (global, per-type, a 3-day window) comes from the sketch
    table alone — no raw re-scan — within HLL error of exact."""
    from pyspark.sql import functions as F

    from tap_airbyte_wrapper_spark.operators import (
        hll_rollup,
        hll_sketch_table,
    )
    from tap_airbyte_wrapper_spark.sources.files import load_parquet

    ev = load_parquet(spark, f"{sf_dir}/events.parquet") \
        .withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "sketches")
    # land sketches in two batches, as an incremental pipeline would
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    cut = days[len(days) // 2]
    for batch in (ev.filter(F.col("day") <= F.lit(cut)),
                  ev.filter(F.col("day") > F.lit(cut))):
        hll_sketch_table(batch, "user_id", ["day", "event_type"]) \
            .write.mode("append").parquet(path)

    sk = spark.read.parquet(path)

    def close(est, exact):
        return abs(est - exact) <= max(2, 0.05 * exact)

    exact_global = ev.select("user_id").distinct().count()
    est_global = hll_rollup(sk).first()["n_distinct_est"]
    assert close(est_global, exact_global)

    exact_type = {r.event_type: r.n for r in ev.groupBy("event_type")
                  .agg(F.countDistinct("user_id").alias("n")).collect()}
    for r in hll_rollup(sk, ["event_type"]).collect():
        assert close(r.n_distinct_est, exact_type[r.event_type])

    last3 = days[-3:]
    exact_win = ev.filter(F.col("day").isin(last3)) \
        .select("user_id").distinct().count()
    est_win = hll_rollup(
        sk.filter(F.col("day").isin(last3))).first()["n_distinct_est"]
    assert close(est_win, exact_win)


def test_fuzzy_self_join_string_level_form(spark):
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.operators import fuzzy_self_join

    df = spark.createDataFrame(
        [Row(id=i, name="red widget") for i in range(5)]
        + [Row(id=10 + i, name="red widgets") for i in range(3)]
        + [Row(id=99, name="blue bolt")])
    out = fuzzy_self_join(
        df, "id", "name", max_dist=1, expand_ids=False).collect()
    assert len(out) == 1
    r = out[0]
    assert {r.str_a, r.str_b} == {"red widget", "red widgets"}
    assert r.dist == 1
    assert {r.n_ids_a, r.n_ids_b} == {5, 3}
    # the id form of the same input expands to 5*3 pairs
    ids = fuzzy_self_join(df, "id", "name", max_dist=1).count()
    assert ids == 15


def test_scd2_history_intervals_and_tombstones(spark):
    from tap_airbyte_wrapper_spark.operators import scd2_history

    changes = spark.createDataFrame(
        [("A", 1, "v1", False), ("A", 5, "v2", False),
         ("A", 9, None, True), ("A", 12, "v3", False),
         ("B", 2, "w1", False), ("B", 7, None, True),
         ("C", 3, "x1", False)],
        "k string, cur long, val string, del boolean").repartition(3)
    out = scd2_history(changes, "k", "cur", delete_col="del")
    rows = sorted((r["k"], r["valid_from"], r["valid_to"],
                   r["is_current"], r["val"]) for r in out.collect())
    assert rows == [
        ("A", 1, 5, False, "v1"),
        ("A", 5, 9, False, "v2"),      # closed by the tombstone
        ("A", 12, None, True, "v3"),   # re-insert after delete
        ("B", 2, 7, False, "w1"),      # last change was delete: no current
        ("C", 3, None, True, "x1"),
    ]
    # exactly one current row per live key
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert {r["k"]: r["count"] for r in cur} == {"A": 1, "C": 1}


def test_point_in_time_join_leakage_safe(spark):
    """Facts get the dimension version in effect at their timestamp;
    versions superseded or tombstoned before the fact are nulled, and
    pre-history facts match nothing."""
    from tap_airbyte_wrapper_spark.operators import (
        point_in_time_join,
        scd2_history,
    )

    changes = spark.createDataFrame(
        [("A", 10, "v1", False), ("A", 20, "v2", False),
         ("B", 10, "w1", False), ("B", 30, None, True)],
        "k string, cur long, val string, del boolean")
    hist = scd2_history(changes, "k", "cur", delete_col="del")
    facts = spark.createDataFrame(
        [(1, "A", 5), (2, "A", 15), (3, "A", 25),
         (4, "B", 15), (5, "B", 35)],
        "fid long, k string, at long")
    # history projected with valid_to FIRST: a sequential null-out would
    # null it before evaluating the other columns' predicates and leak
    # the stale version (the exact regression the reviewer repro found)
    hist = hist.select("k", "valid_to", "valid_from", "val", "is_current")
    out = point_in_time_join(facts, hist, "k", "at")
    rows = {r["fid"]: r for r in out.collect()}
    got = {fid: r["h_val"] for fid, r in rows.items()}
    # every history column of an invalidated match is null, not stale
    for fid in (1, 5):
        assert rows[fid]["h_val"] is None
        assert rows[fid]["h_valid_to"] is None
        assert rows[fid]["h_is_current"] is None
    assert got == {
        1: None,   # before any version existed
        2: "v1",   # v2 (cur=20) is the future — must NOT leak
        3: "v2",
        4: "w1",
        5: None,   # B tombstoned at 30: no version in effect at 35
    }
    assert out.count() == 5  # left rows always kept
