"""Three-dialect state merge semantics (reference tap.py:819-884) +
dual legacy/v2 output shape + atomic commit."""

import json

from tap_airbyte_wrapper_spark.state import BookmarkStore


def stream_msg(name, state, namespace=None):
    return {
        "type": "STREAM",
        "stream": {
            "stream_descriptor": {"name": name, "namespace": namespace},
            "stream_state": state,
        },
    }


def test_stream_upsert():
    s = BookmarkStore()
    s.merge(stream_msg("events", {"ts": "2024-01-01"}))
    s.merge(stream_msg("orders", {"id": 5}))
    s.merge(stream_msg("events", {"ts": "2024-01-15"}))
    assert s.bookmarks == {"events": {"ts": "2024-01-15"}, "orders": {"id": 5}}
    assert len(s.airbyte_state) == 2  # upsert, not append


def test_stream_namespace_distinct():
    s = BookmarkStore()
    s.merge(stream_msg("t", {"v": 1}, namespace="a"))
    s.merge(stream_msg("t", {"v": 2}, namespace="b"))
    assert len(s.airbyte_state) == 2
    assert s.bookmarks["t"] == {"v": 2}  # flat map keyed by name only


def test_global_replace():
    s = BookmarkStore()
    s.merge(stream_msg("events", {"ts": "2024-01-01"}))
    s.merge({
        "type": "GLOBAL",
        "global": {
            "shared_state": {"cdc": 1},
            "stream_states": [
                {"stream_descriptor": {"name": "orders"}, "stream_state": {"id": 9}}
            ],
        },
    })
    assert len(s.airbyte_state) == 1
    assert s.airbyte_state[0]["type"] == "GLOBAL"
    assert s.bookmarks == {"orders": {"id": 9}}


def test_legacy_replace_all():
    s = BookmarkStore()
    s.merge(stream_msg("events", {"ts": "x"}))
    s.merge({"type": "LEGACY", "data": {"orders": {"id": 1}}})
    assert s.bookmarks == {"orders": {"id": 1}}
    assert s.airbyte_state[0]["type"] == "LEGACY"


def test_dialect_inference():
    s = BookmarkStore()
    s.merge({"stream": {"stream_descriptor": {"name": "a"}, "stream_state": {"v": 1}}})
    assert s.bookmarks == {"a": {"v": 1}}
    s2 = BookmarkStore()
    s2.merge({"global": {"stream_states": []}})
    assert s2.airbyte_state[0]["type"] == "GLOBAL"


def test_roundtrip_v2(tmp_path):
    s = BookmarkStore()
    s.merge(stream_msg("events", {"ts": "2024-01-15"}))
    p = str(tmp_path / "state.json")
    s.commit(p)
    loaded = BookmarkStore.load(p)
    assert loaded.bookmarks == s.bookmarks
    assert loaded.airbyte_state == s.airbyte_state
    doc = json.load(open(p))
    assert set(doc) == {"bookmarks", "airbyte_state"}  # dual shape


def test_load_bare_legacy(tmp_path):
    p = tmp_path / "legacy.json"
    p.write_text(json.dumps({"events": {"ts": "2023-01-01"}}))
    s = BookmarkStore.load(str(p))
    assert s.get_bookmark("events", "ts") == "2023-01-01"


def test_get_bookmark_single_value():
    s = BookmarkStore()
    s.set_bookmark("events", "ts", "2024-01-02")
    assert s.get_bookmark("events") == "2024-01-02"
    assert s.get_bookmark("events", "ts") == "2024-01-02"
    assert s.get_bookmark("missing") is None
