"""Bookmark store: incremental-sync state with three-dialect merge.

Reproduces the reference's state semantics (tap_airbyte/tap.py:819-884)
without the Singer/Airbyte subprocess plumbing:

* **STREAM dialect** — per-stream state document with a
  ``stream_descriptor``; merge = upsert keyed by (name, namespace).
* **GLOBAL dialect** — one shared state + embedded per-stream states;
  merge = replace the whole state.
* **LEGACY dialect** — a bare ``data`` document for the whole connector;
  merge = replace-all.

Like the reference, the store maintains BOTH shapes side by side
(tap.py:869-881): a legacy flat ``bookmarks`` map (stream name ->
stream_state) and the v2 ``airbyte_state`` message list, so either format
can be handed back to a source on resume.

Commit ordering preserved from the reference (§4.3 of SURVEY.md):
bookmarks are committed only AFTER the sink write for the batch succeeded —
``SyncRunner`` calls :meth:`BookmarkStore.commit` post-write, giving
at-least-once delivery.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

__all__ = ["BookmarkStore", "StateDialect"]


class StateDialect:
    STREAM = "STREAM"
    GLOBAL = "GLOBAL"
    LEGACY = "LEGACY"


def _descriptor_key(descriptor: dict[str, Any]) -> tuple[str, str | None]:
    return (descriptor.get("name", ""), descriptor.get("namespace"))


class BookmarkStore:
    """In-memory state accumulator + durable JSON commit."""

    def __init__(self, state: dict[str, Any] | None = None):
        # legacy flat: {stream_name: stream_state}
        self.bookmarks: dict[str, Any] = {}
        # v2: list of airbyte state messages (STREAM dialect) or a single
        # GLOBAL/LEGACY message.
        self.airbyte_state: list[dict[str, Any]] = []
        if state:
            self.load_dict(state)

    # ------------------------------------------------------------------ load

    def load_dict(self, state: dict[str, Any]) -> None:
        """Accept a previously-committed state document (either shape).

        Mirrors the reference's ``load_state`` which unwraps the v2
        container when present (tap.py:776-779).
        """
        if "airbyte_state" in state:
            for msg in state["airbyte_state"] or []:
                self.merge(msg)
        elif "bookmarks" in state:
            self.bookmarks = dict(state["bookmarks"])
            self.airbyte_state = [
                {
                    "type": StateDialect.STREAM,
                    "stream": {
                        "stream_descriptor": {"name": name},
                        "stream_state": sstate,
                    },
                }
                for name, sstate in self.bookmarks.items()
            ]
        else:
            # bare legacy document
            self.merge({"type": StateDialect.LEGACY, "data": state})

    @classmethod
    def load(cls, path: str) -> "BookmarkStore":
        store = cls()
        if path and os.path.exists(path):
            with open(path) as f:
                store.load_dict(json.load(f))
        return store

    # ----------------------------------------------------------------- merge

    def merge(self, message: dict[str, Any]) -> None:
        """Merge one state message; dispatch on its dialect.

        Dialect detection matches the Airbyte protocol: an explicit
        ``type`` field, else infer from which payload key is present.
        """
        dialect = message.get("type")
        if dialect is None:
            if "stream" in message:
                dialect = StateDialect.STREAM
            elif "global" in message:
                dialect = StateDialect.GLOBAL
            else:
                dialect = StateDialect.LEGACY

        if dialect == StateDialect.STREAM:
            stream = message["stream"]
            desc = stream.get("stream_descriptor", {})
            key = _descriptor_key(desc)
            replaced = False
            for i, existing in enumerate(self.airbyte_state):
                if existing.get("type") != StateDialect.STREAM:
                    continue
                if _descriptor_key(
                    existing["stream"].get("stream_descriptor", {})
                ) == key:
                    self.airbyte_state[i] = {
                        "type": StateDialect.STREAM,
                        "stream": stream,
                    }
                    replaced = True
                    break
            if not replaced:
                self.airbyte_state.append(
                    {"type": StateDialect.STREAM, "stream": stream}
                )
            if desc.get("name"):
                self.bookmarks[desc["name"]] = stream.get("stream_state", {})

        elif dialect == StateDialect.GLOBAL:
            glob = message["global"]
            self.airbyte_state = [{"type": StateDialect.GLOBAL, "global": glob}]
            self.bookmarks = {}
            for s in glob.get("stream_states", []) or []:
                name = s.get("stream_descriptor", {}).get("name")
                if name:
                    self.bookmarks[name] = s.get("stream_state", {})

        else:  # LEGACY: replace-all
            data = message.get("data", {})
            self.airbyte_state = [{"type": StateDialect.LEGACY, "data": data}]
            self.bookmarks = dict(data) if isinstance(data, dict) else {"data": data}

    # ------------------------------------------------------------- bookmarks

    def get_bookmark(self, stream: str, key: str | None = None) -> Any:
        """Cursor value for a stream; ``key`` picks a field of the stream
        state (defaults to the whole state doc, or its single value)."""
        sstate = self.bookmarks.get(stream)
        if sstate is None:
            return None
        if key is not None:
            return sstate.get(key) if isinstance(sstate, dict) else None
        if isinstance(sstate, dict) and len(sstate) == 1:
            return next(iter(sstate.values()))
        return sstate

    def set_bookmark(self, stream: str, cursor_field: str, value: Any) -> None:
        """Record the new high-water mark for a stream (STREAM dialect)."""
        self.merge(
            {
                "type": StateDialect.STREAM,
                "stream": {
                    "stream_descriptor": {"name": stream},
                    "stream_state": {cursor_field: value},
                },
            }
        )

    # ---------------------------------------------------------------- commit

    def to_dict(self) -> dict[str, Any]:
        """Dual legacy+v2 output shape (reference tap.py:869-881)."""
        return {"bookmarks": dict(self.bookmarks),
                "airbyte_state": list(self.airbyte_state)}

    def commit(self, path: str) -> None:
        """Atomically write state to ``path`` (write-then-rename).

        Called only after the sink write succeeded — the Spark analogue of
        the reference's emit-STATE-after-records ordering.
        """
        d = os.path.dirname(os.path.abspath(path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".state-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self.to_dict(), f, sort_keys=True)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
