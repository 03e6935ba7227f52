"""JDBC source contract tests against an embedded Derby database.

The reference exercises live database connectors end-to-end
(reference tests/test_syncs.py:22-74 run source-postgres/-mysql through
the tap); no server ships in this container, but Spark bundles Derby
(for the Hive metastore), whose embedded driver gives a real
``spark.read.format("jdbc")`` round-trip inside the local JVM: seed a
table through Spark's JDBC writer, then drive spec / discover / read /
incremental / partitioned-read / full Engine sync through JdbcSource.
"""

import json

import pytest

from tap_airbyte_wrapper_spark.catalog import SyncMode
from tap_airbyte_wrapper_spark.sources import get_source
from tap_airbyte_wrapper_spark.sources.base import SourceError
from tap_airbyte_wrapper_spark.sync import Engine

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby")
    # keep derby.log out of the repo cwd
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    url = f"jdbc:derby:{home}/db;create=true"
    rows = [(i, f"name-{i:03d}", float(i) * 1.5, i % 5) for i in range(100)]
    df = spark.createDataFrame(
        rows, "id BIGINT, name STRING, amount DOUBLE, bucket BIGINT")
    (df.write.format("jdbc")
       .option("url", url).option("driver", DERBY_DRIVER)
       .option("dbtable", "items").mode("overwrite").save())
    return url


def make_source(derby_url, **over):
    cfg = {"url": derby_url, "tables": ["items"], "driver": DERBY_DRIVER,
           **over}
    return get_source("jdbc", cfg)


def test_spec_shape():
    spec = get_source("jdbc", {"url": "x", "tables": []}).spec()
    assert spec["required"] == ["url", "tables"]
    assert spec["properties"]["password"].get("airbyte_secret") is True


def test_check_and_discover(spark, derby_url):
    src = make_source(derby_url, cursors={"items": "id"})
    assert src.check(spark)
    cat = src.discover(spark)
    entry = cat.get("items")
    # Spark's JDBC writer quotes identifiers, so Derby preserves case.
    assert set(entry.schema.names) == {"id", "name", "amount", "bucket"}
    assert entry.replication_key == "id"
    assert SyncMode.INCREMENTAL in entry.supported_sync_modes
    # A cursor that doesn't match a stored column degrades to
    # FULL_REFRESH-only instead of failing discover.
    e2 = make_source(derby_url, cursors={"items": "nope"}).discover(
        spark).get("items")
    assert e2.replication_key is None
    assert e2.supported_sync_modes == [SyncMode.FULL_REFRESH]


def test_discover_bad_table_raises(spark, derby_url):
    src = make_source(derby_url, tables=["no_such_table"])
    with pytest.raises(SourceError, match="no_such_table"):
        src.discover(spark)


def test_full_read(spark, derby_url):
    src = make_source(derby_url)
    entry = src.discover(spark).get("items")
    df = src.read(spark, entry)
    assert df.count() == 100
    got = {(r["id"], r["name"]) for r in df.filter("id < 3").collect()}
    assert got == {(0, "name-000"), (1, "name-001"), (2, "name-002")}


def test_incremental_read_filters_past_bookmark(spark, derby_url):
    src = make_source(derby_url, cursors={"items": "id"})
    entry = src.discover(spark).get("items")
    assert entry.replication_key == "id"
    assert SyncMode.INCREMENTAL in entry.supported_sync_modes
    df = src.read_incremental(spark, entry, 89)
    assert df.count() == 10
    assert df.agg({"id": "min"}).first()[0] == 90


def test_partitioned_parallel_read(spark, derby_url):
    src = make_source(
        derby_url,
        partition_column={"items": "id"},
        num_partitions=4, lowerBound=0, upperBound=100,
    )
    entry = src.discover(spark).get("items")
    df = src.read(spark, entry)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_partitioned_read_auto_bounds(spark, derby_url):
    """Without configured bounds, MIN/MAX are pushed down as a one-row
    subquery and the read still splits across partitions."""
    src = make_source(
        derby_url, partition_column={"items": "id"}, num_partitions=4)
    entry = src.discover(spark).get("items")
    df = src.read(spark, entry)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert df.agg({"id": "max"}).first()[0] == 99


def test_engine_sync_and_resume(spark, derby_url, tmp_path):
    """Full lifecycle: jdbc -> Singer stdout, then incremental resume
    emits zero records (mirrors the reference's live-connector E2E)."""
    import io

    cfg = {
        "source": "jdbc",
        "source_config": {"url": derby_url, "tables": ["items"],
                          "driver": DERBY_DRIVER, "cursors": {"items": "id"}},
        "replication_method": {"items": "INCREMENTAL"},
        "state_path": str(tmp_path / "state.json"),
    }
    out = io.StringIO()
    Engine(spark, cfg).sync(out=out)
    msgs = [json.loads(l) for l in out.getvalue().splitlines()]
    recs = [m for m in msgs if m["type"] == "RECORD"]
    assert len(recs) == 100
    assert any(m["type"] == "STATE" for m in msgs)

    out2 = io.StringIO()
    Engine(spark, cfg).sync(out=out2)
    msgs2 = [json.loads(l) for l in out2.getvalue().splitlines()]
    assert [m for m in msgs2 if m["type"] == "RECORD"] == []


def test_jdbc_sink_engine_load_and_incremental(spark, derby_url, sf_dir, tmp_path):
    """EL load side: Engine syncs a stream INTO Derby via the jdbc sink;
    an incremental re-run appends only post-bookmark rows."""
    from tap_airbyte_wrapper_spark.sources.files import load_parquet

    state = tmp_path / "state.json"
    cfg = {
        "source": "dataset_dir",
        "source_config": {"path": sf_dir},
        "streams": ["events"],
        "replication_method": {"events": "INCREMENTAL"},
        "state_path": str(state),
        "sink": {"type": "jdbc", "url": derby_url,
                 "driver": DERBY_DRIVER, "table_prefix": "sunk_",
                 "mode": "append"},
    }
    eng = Engine(spark, cfg)
    res = eng.sync()
    total = load_parquet(spark, f"{sf_dir}/events.parquet").count()
    assert res.stream_counts["events"] == total

    back = (spark.read.format("jdbc")
            .option("url", derby_url).option("driver", DERBY_DRIVER)
            .option("dbtable", "sunk_events").load())
    assert back.count() == total
    assert set(back.columns) >= {"event_id", "user_id", "value"}

    # resume: bookmark committed -> nothing new -> no duplicate rows
    res2 = Engine(spark, cfg).sync()
    assert res2.stream_counts.get("events", 0) == 0
    assert (spark.read.format("jdbc")
            .option("url", derby_url).option("driver", DERBY_DRIVER)
            .option("dbtable", "sunk_events").load().count()) == total
