"""ChangelogSource (CDC / LOG_BASED) + merge sink, end to end.

The reference maps LOG_BASED -> INCREMENTAL and delegates CDC to the
connector (tap.py:98-105); these tests pin the engine's file-based
changelog contract: snapshot-as-inserts at cursor 0, op-typed changes
past it, cursor bookmark resume, and the merge sink maintaining a
versioned snapshot (insert/update/delete applied keyed + idempotent).
"""

import json
import os

import pytest
from pyspark.sql import Row

from tap_airbyte_wrapper_spark.sinks import read_merge_snapshot
from tap_airbyte_wrapper_spark.sources import SourceError, get_source
from tap_airbyte_wrapper_spark.sync import Engine


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def cdc_dir(spark, tmp_path):
    """base: items {1: apple/1.0, 2: banana/2.0}; change batch 1:
    update item 1, delete item 2, insert item 3."""
    root = str(tmp_path / "cdc")
    spark.createDataFrame(
        [Row(item_id=1, name="apple", price=1.0),
         Row(item_id=2, name="banana", price=2.0)],
    ).coalesce(1).write.parquet(f"{root}/base/items.parquet")
    _write_jsonl(f"{root}/changes/items/batch1.jsonl", [
        {"item_id": 1, "name": "apple", "price": 1.5,
         "_op": "update", "_cursor": 101},
        {"item_id": 2, "name": None, "price": None,
         "_op": "delete", "_cursor": 102},
        {"item_id": 3, "name": "cherry", "price": 3.0,
         "_op": "insert", "_cursor": 103},
    ])
    return root


def _engine(spark, root, tmp_path, **extra):
    cfg = {
        "source": "changelog",
        "source_config": {"path": root,
                          "primary_keys": {"items": ["item_id"]}},
        "replication_method": {"items": "LOG_BASED"},
        "state_path": str(tmp_path / "state.json"),
        "sink": {"type": "merge", "path": str(tmp_path / "sink")},
        **extra,
    }
    return Engine(spark, cfg)


def test_discover_shapes_stream(spark, cdc_dir):
    src = get_source("changelog",
                     {"path": cdc_dir, "primary_keys": {"items": ["item_id"]}})
    cat = src.discover(spark)
    entry = {e.name: e for e in cat}["items"]
    assert entry.primary_keys == ["item_id"]
    assert entry.replication_key == "_cursor"
    assert {"_op", "_cursor", "_deleted"} <= set(entry.schema.names)
    entry.negotiate("LOG_BASED")
    assert entry.sync_mode == "incremental"


def test_read_emits_snapshot_then_changes(spark, cdc_dir):
    src = get_source("changelog",
                     {"path": cdc_dir, "primary_keys": {"items": ["item_id"]}})
    entry = {e.name: e for e in src.discover(spark)}["items"]
    rows = {(r.item_id, r._op, r._cursor)
            for r in src.read(spark, entry).collect()}
    assert rows == {
        (1, "insert", 0), (2, "insert", 0),          # snapshot
        (1, "update", 101), (2, "delete", 102), (3, "insert", 103)}
    # cursor predicate replays only the tail, with the snapshot skipped
    inc = {(r.item_id, r._cursor)
           for r in src.read_incremental(spark, entry, 101).collect()}
    assert inc == {(2, 102), (3, 103)}


def test_e2e_merge_sink_and_bookmark_resume(spark, cdc_dir, tmp_path):
    eng = _engine(spark, cdc_dir, tmp_path)
    res = eng.sync()
    assert res.stream_counts == {"items": 5}        # 2 snapshot + 3 changes
    snap = {(r.item_id, r.name, r.price)
            for r in read_merge_snapshot(
                spark, str(tmp_path / "sink"), "items").collect()}
    assert snap == {(1, "apple", 1.5), (3, "cherry", 3.0)}  # 2 deleted
    state = json.load(open(tmp_path / "state.json"))
    assert json.dumps(state).count("103")            # bookmark = max cursor

    # second batch lands: re-insert item 2, bump item 3's price
    _write_jsonl(f"{cdc_dir}/changes/items/batch2.jsonl", [
        {"item_id": 2, "name": "banana", "price": 2.5,
         "_op": "insert", "_cursor": 104},
        {"item_id": 3, "name": "cherry", "price": 3.5,
         "_op": "update", "_cursor": 105},
    ])
    res2 = _engine(spark, cdc_dir, tmp_path).sync()
    assert res2.stream_counts == {"items": 2}        # ONLY the new tail
    snap2 = {(r.item_id, r.name, r.price)
             for r in read_merge_snapshot(
                 spark, str(tmp_path / "sink"), "items").collect()}
    assert snap2 == {(1, "apple", 1.5), (2, "banana", 2.5),
                     (3, "cherry", 3.5)}


def test_e2e_replay_is_idempotent(spark, cdc_dir, tmp_path):
    """At-least-once delivery: syncing the same batch twice (state wiped
    between runs) must leave the snapshot unchanged — keyed merge with
    cursor recency absorbs the replay."""
    _engine(spark, cdc_dir, tmp_path).sync()
    first = {(r.item_id, r.name, r.price)
             for r in read_merge_snapshot(
                 spark, str(tmp_path / "sink"), "items").collect()}
    os.remove(tmp_path / "state.json")               # forget the bookmark
    _engine(spark, cdc_dir, tmp_path).sync()         # full replay
    again = {(r.item_id, r.name, r.price)
             for r in read_merge_snapshot(
                 spark, str(tmp_path / "sink"), "items").collect()}
    assert again == first


def test_bucketed_merge_sink_prunes_rewrites(spark, cdc_dir, tmp_path):
    """n_buckets mode: same answers as the full-rewrite path, but a
    batch touching one bucket must rewrite ONLY that bucket — untouched
    bucket dirs are hard-linked forward (same inode), not copied."""
    eng = _engine(spark, cdc_dir, tmp_path,
                  sink={"type": "merge", "path": str(tmp_path / "sink"),
                        "n_buckets": 8})
    eng.sync()
    snap = {(r.item_id, r.name, r.price)
            for r in read_merge_snapshot(
                spark, str(tmp_path / "sink"), "items").collect()}
    assert snap == {(1, "apple", 1.5), (3, "cherry", 3.0)}

    # second batch touches only item 3's bucket
    _write_jsonl(f"{cdc_dir}/changes/items/batch2.jsonl", [
        {"item_id": 3, "name": "cherry", "price": 9.0,
         "_op": "update", "_cursor": 104}])
    _engine(spark, cdc_dir, tmp_path,
            sink={"type": "merge", "path": str(tmp_path / "sink"),
                  "n_buckets": 8}).sync()
    snap2 = {(r.item_id, r.name, r.price)
             for r in read_merge_snapshot(
                 spark, str(tmp_path / "sink"), "items").collect()}
    assert snap2 == {(1, "apple", 1.5), (3, "cherry", 9.0)}

    root = tmp_path / "sink" / "items"
    v0, v1 = root / "v0", root / "v1"
    carried = rewritten = 0
    for d in os.listdir(v0):
        if not d.startswith("__bkt="):
            continue
        old = {f: os.stat(v0 / d / f).st_ino
               for f in os.listdir(v0 / d)
               if os.path.isfile(v0 / d / f)}
        new_dir = v1 / d
        if os.path.isdir(new_dir):
            new = {f: os.stat(new_dir / f).st_ino
                   for f in os.listdir(new_dir)
                   if os.path.isfile(new_dir / f)}
            if old == new:
                carried += 1       # hard-linked forward, zero data copy
            else:
                rewritten += 1
    assert rewritten >= 1          # the touched bucket was rewritten
    assert carried >= 1            # at least one untouched bucket linked

    # n_buckets is fixed at stream creation
    with pytest.raises(ValueError, match="cannot rebucket"):
        _engine(spark, cdc_dir, tmp_path,
                sink={"type": "merge", "path": str(tmp_path / "sink"),
                      "n_buckets": 4}).sync()


def test_debezium_op_aliases(spark, tmp_path):
    root = str(tmp_path / "dbz")
    _write_jsonl(f"{root}/changes/t/log.jsonl", [
        {"k": 1, "v": "x", "_op": "c", "_cursor": 1},
        {"k": 1, "v": "y", "_op": "u", "_cursor": 2},
        {"k": 1, "v": None, "_op": "d", "_cursor": 3},
    ])
    src = get_source("changelog", {"path": root, "primary_keys": {"t": ["k"]}})
    entry = {e.name: e for e in src.discover(spark)}["t"]
    got = {(r._op, r._deleted) for r in src.read(spark, entry).collect()}
    assert got == {("insert", False), ("update", False), ("delete", True)}


def test_streaming_cdc_apply(spark, cdc_dir, tmp_path):
    """Continuous CDC: a streaming query over the changes dir applies
    each micro-batch through the same merge sink.  The checkpoint is
    the bookmark — a second run after new files land processes ONLY
    the new files, and the snapshot converges to the batch answer."""
    from tap_airbyte_wrapper_spark.sources import get_source
    from tap_airbyte_wrapper_spark.streaming import stream_changelog_apply

    src = get_source("changelog",
                     {"path": cdc_dir, "primary_keys": {"items": ["item_id"]}})
    entry = {e.name: e for e in src.discover(spark)}["items"]
    # change-record schema = unified schema minus the derived _deleted
    schema = (src._load_changes(spark, "items").drop("_deleted")).schema

    kw = dict(
        changes_dir=f"{cdc_dir}/changes/items",
        schema=schema, stream="items",
        sink_path=str(tmp_path / "snap"),
        checkpoint_path=str(tmp_path / "ckpt"),
        pks=["item_id"], n_buckets=4)
    q = stream_changelog_apply(spark, **kw)
    q.awaitTermination(120)
    # no base snapshot feeds the stream: only the 3 change ops applied
    snap = {(r.item_id, r.price)
            for r in read_merge_snapshot(
                spark, str(tmp_path / "snap"), "items").collect()}
    assert snap == {(1, 1.5), (3, 3.0)}

    _write_jsonl(f"{cdc_dir}/changes/items/batch2.jsonl", [
        {"item_id": 3, "name": "cherry", "price": 7.0,
         "_op": "u", "_cursor": 104}])
    q2 = stream_changelog_apply(spark, **kw)
    q2.awaitTermination(120)
    snap2 = {(r.item_id, r.price)
             for r in read_merge_snapshot(
                 spark, str(tmp_path / "snap"), "items").collect()}
    assert snap2 == {(1, 1.5), (3, 7.0)}
    # checkpoint bookkeeping: exactly 2 committed micro-batches, and the
    # second run did NOT reprocess batch1 (version count = 2 writes)
    import os as _os
    commits = _os.listdir(tmp_path / "ckpt" / "commits")
    assert sorted(c for c in commits if c.isdigit()) == ["0", "1"]


def test_config_errors(spark, tmp_path):
    root = str(tmp_path / "bad")
    _write_jsonl(f"{root}/changes/t/log.jsonl", [{"k": 1, "_cursor": 1}])
    src = get_source("changelog", {"path": root, "primary_keys": {"t": ["k"]}})
    with pytest.raises(SourceError, match="missing '_op'"):
        src.discover(spark)
    _write_jsonl(f"{root}/changes/u/log.jsonl",
                 [{"k": 1, "_op": "c", "_cursor": 1}])
    src2 = get_source("changelog", {"path": root,
                                    "primary_keys": {"t": ["k"]},
                                    "streams": ["u"]})
    with pytest.raises(SourceError, match="primary_keys"):
        src2.discover(spark)
    with pytest.raises(SourceError, match="no changelog streams"):
        get_source("changelog",
                   {"path": str(tmp_path / "nope"),
                    "primary_keys": {}}).discover(spark)


def test_merge_snapshot_time_travel(spark, tmp_path):
    """Retained versions read back exactly as committed; pruned
    versions raise with a clear message."""
    import pytest
    from pyspark.sql import Row

    from tap_airbyte_wrapper_spark.sinks import (
        list_merge_versions,
        merge_snapshot_write,
        read_merge_snapshot,
    )

    path = str(tmp_path / "snap")
    b1 = spark.createDataFrame([Row(pk=1, v="a", cur=1), Row(pk=2, v="b", cur=1)])
    b2 = spark.createDataFrame([Row(pk=1, v="a2", cur=2)])
    b3 = spark.createDataFrame([Row(pk=3, v="c", cur=3)])
    for b in (b1, b2, b3):
        merge_snapshot_write(b, "s", path, ["pk"], order_col="cur",
                             keep_versions=3)
    assert list_merge_versions(path, "s") == [0, 1, 2]

    cur = {r.pk: r.v for r in read_merge_snapshot(spark, path, "s").collect()}
    assert cur == {1: "a2", 2: "b", 3: "c"}
    v0 = {r.pk: r.v for r in read_merge_snapshot(
        spark, path, "s", version=0).collect()}
    assert v0 == {1: "a", 2: "b"}
    v1 = {r.pk: r.v for r in read_merge_snapshot(
        spark, path, "s", version=1).collect()}
    assert v1 == {1: "a2", 2: "b"}

    # a fourth batch prunes v0 (keep_versions=2 now)
    merge_snapshot_write(
        spark.createDataFrame([Row(pk=4, v="d", cur=4)]),
        "s", path, ["pk"], order_col="cur", keep_versions=2)
    with pytest.raises(FileNotFoundError):
        read_merge_snapshot(spark, path, "s", version=0)
