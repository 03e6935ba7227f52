"""ORC source contract: discover / full read / incremental pushdown /
schema-drift policy — the parquet source's story on Spark's native ORC
reader."""

import pytest
from pyspark.sql import functions as F

from tap_airbyte_wrapper_spark.sources.base import SourceError, get_source
from tap_airbyte_wrapper_spark.sources.files import load_parquet


@pytest.fixture(scope="module")
def orc_orders(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orc") / "orders")
    load_parquet(spark, f"{sf_dir}/orders.parquet").write.orc(path)
    return path


def test_orc_discover_and_read(spark, sf_dir, orc_orders):
    src = get_source("orc", {
        "path": orc_orders, "stream_name": "orders",
        "cursor_field": "o_orderkey", "primary_keys": ["o_orderkey"]})
    cat = src.discover(spark)
    (stream,) = cat.streams
    assert stream.name == "orders"
    assert stream.replication_key == "o_orderkey"
    assert "o_totalprice" in [f.name for f in stream.schema.fields]

    n_ref = load_parquet(spark, f"{sf_dir}/orders.parquet").count()
    assert src.read(spark, stream).count() == n_ref


def test_orc_incremental_pushes_predicate(spark, orc_orders):
    src = get_source("orc", {
        "path": orc_orders, "stream_name": "orders",
        "cursor_field": "o_orderkey"})
    (stream,) = src.discover(spark).streams
    mid = src.read(spark, stream).agg(
        F.expr("percentile(o_orderkey, 0.5)")).collect()[0][0]
    inc = src.read_incremental(spark, stream, int(mid))
    full = src.read(spark, stream)
    assert inc.count() == full.filter(F.col("o_orderkey") > int(mid)).count()
    assert 0 < inc.count() < full.count()
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_orderkey" in plan


def test_orc_schema_drift_fails_then_conforms(spark, orc_orders):
    src = get_source("orc", {"path": orc_orders, "stream_name": "orders"})
    (stream,) = src.discover(spark).streams
    # simulate a catalog from before a column existed
    import copy

    old = copy.deepcopy(stream)
    old.schema = type(stream.schema)(stream.schema.fields[:-1])
    with pytest.raises(SourceError, match="schema drift"):
        src.read(spark, old)

    merging = get_source("orc", {
        "path": orc_orders, "stream_name": "orders",
        "on_schema_drift": "merge"})
    out = merging.read(spark, old)
    assert out.columns == [f.name for f in old.schema.fields]
