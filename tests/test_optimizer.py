"""Runtime-optimizer behaviors the 100 TB story depends on, pinned as
tests: AQE skew-join splitting (the no-code-change answer to hot keys)
and runtime bloom-filter injection (semi-join reduction of a big probe
side).  These are *engine* features — the tests prove this engine's
plans actually trigger them, not just that the configs exist."""

import contextlib

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                with contextlib.suppress(Exception):
                    spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """A 90%-one-key join under AQE ends as SortMergeJoin(skew=true)
    with a skewed AQEShuffleRead — the hot partition is split at
    runtime without salting code."""
    with _confs(
        spark,
        **{"spark.sql.adaptive.enabled": "true",
           "spark.sql.adaptive.skewJoin.enabled": "true",
           "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
               "100KB",
           "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50KB",
           "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
           "spark.sql.autoBroadcastJoinThreshold": "-1",
           "spark.sql.adaptive.coalescePartitions.enabled": "false"},
    ):
        skewed = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"))
        other = spark.range(0, 50_000).select(
            F.col("id").alias("k"), F.lit("x").alias("o"))
        j = skewed.join(other, "k")
        rows = j.collect()  # execute THIS QueryExecution (AQE finalizes)
        assert len(rows) == 365_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan


def test_runtime_bloom_filter_injected(spark, tmp_path):
    """A selective filter on one join side injects a bloom-filter
    semi-join reduction into the probe side's scan path."""
    big_p, small_p = str(tmp_path / "big"), str(tmp_path / "small")
    spark.range(0, 500_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    ).write.parquet(big_p)
    spark.range(0, 100_000).select(F.col("id").alias("k")) \
        .filter("k % 1000 = 0").write.parquet(small_p)
    with _confs(
        spark,
        **{"spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
           "spark.sql.optimizer.runtime.bloomFilter."
           "applicationSideScanSizeThreshold": "1KB",
           "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
               "100MB",
           "spark.sql.autoBroadcastJoinThreshold": "-1"},
    ):
        big = spark.read.parquet(big_p)
        small = spark.read.parquet(small_p).filter("k >= 0")
        j = big.join(small, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan
        assert j.count() == 100  # and the join is still correct
