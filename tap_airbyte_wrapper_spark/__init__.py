"""tap-airbyte-wrapper-spark: a PySpark-native extraction + transform engine
with the capabilities of MeltanoLabs/tap-airbyte-wrapper.

Layers:
  schema/catalog/state/maps/singer_io/sources/sync/cli — reference parity
  (EL engine: discover, check, spec, incremental sync, stream maps,
  Singer-format output);
  operators/ + functions/ — the relational + LLM-data-pipeline transform
  surface (joins, aggregations, windows, dedup, similarity search, text
  analysis) the reference delegates to downstream tools, expressed
  Spark-first for 100 TB scale.
"""

from .catalog import Catalog, StreamEntry, SyncMode
from .state import BookmarkStore
from .sync import Engine

__version__ = "0.1.0"
__all__ = ["Catalog", "StreamEntry", "SyncMode", "BookmarkStore", "Engine"]
