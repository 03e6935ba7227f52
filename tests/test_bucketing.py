"""Bucketed-table writes and shuffle-free co-located joins.

Spark's built-in session catalog persists bucket metadata without a Hive
metastore (warehouse dir + in-memory catalog), so ``bucketBy().sortBy()
.saveAsTable()`` works in local mode.  These tests prove the 100 TB
contract the README claims: two tables bucketed on the same key join
with ZERO Exchange on either side — the shuffle is paid once at write
time and amortized over every subsequent join/aggregation.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    # external bucketed tables (explicit path) — the session's static
    # warehouse dir can't be changed after startup
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (orders.withColumnRenamed("o_orderkey", "okey")
        .write.bucketBy(8, "okey").sortBy("okey")
        .option("path", str(warehouse / "orders_b"))
        .mode("overwrite").saveAsTable("orders_b"))
    (lineitem.withColumnRenamed("l_orderkey", "okey")
        .write.bucketBy(8, "okey").sortBy("okey")
        .option("path", str(warehouse / "lineitem_b"))
        .mode("overwrite").saveAsTable("lineitem_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the bucketed co-location is observable
    (sf0.001 tables would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(bucketed, no_broadcast):
    spark = bucketed
    j = (spark.table("orders_b").join(spark.table("lineitem_b"), on="okey")
         .groupBy("o_orderpriority")
         .agg(F.sum("l_quantity").alias("sum_qty")))
    plan = j._jdf.queryExecution().executedPlan().toString()
    # co-located: the join itself needs no shuffle on either side; the
    # only Exchange allowed is the one for the final small groupBy
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(okey" not in plan, plan
    assert plan.count("Exchange") == 1


def test_bucketed_agg_has_no_exchange(bucketed):
    spark = bucketed
    a = spark.table("lineitem_b").groupBy("okey").agg(
        F.sum("l_quantity").alias("q"))
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_unbucketed(bucketed, sf_dir):
    spark = bucketed
    got = (spark.table("orders_b").join(spark.table("lineitem_b"), on="okey")
           .groupBy("o_orderpriority")
           .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty")))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = (orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
