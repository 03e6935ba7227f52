"""Structured Streaming layer: checkpoint-bookmarked incremental sync,
watermarked windows, session windows, custom stateful operators."""

from .incremental import (
    deduped_stream,
    incremental_sync,
    resume_info,
    run_available_now,
    sessionized,
    stream_interval_join,
    stream_source,
    windowed_counts,
)
from .cdc import stream_changelog_apply
from .dedup import (stream_exact_dedup_gate, stream_media_dedup_gate,
                    stream_simhash_gate, stream_near_dup_gate)
from .index_maint import (stream_bm25_index_maintenance,
                          stream_fingerprint_index_maintenance)
from .similarity import stream_embedding_gate
from .selection import (read_reservoir, stream_dsir_gate,
                        stream_novelty_gate,
                        stream_quality_gate, stream_media_gate,
                        stream_blocklist_gate,
                        media_admission_condition,
                        stream_reservoir_sample)
from .trending import read_heavy_hitters, stream_heavy_hitters
from .stats import append_gate_stats, read_gate_stats
from .drift import (reference_profile, stream_drift_monitor,
                    embedding_reference_mean, stream_embedding_drift,
                    drift_reference_write, stream_drift_gate,
                    read_drift_gate_report)
from .stateful import (
    stateful_anomalies,
    stateful_heavy_hitters,
    stateful_max_cursor,
    stateful_running_stats,
)

__all__ = [
    "stream_bm25_index_maintenance",
    "stream_novelty_gate",
    "stream_fingerprint_index_maintenance",
    "stream_near_dup_gate",
    "stream_exact_dedup_gate",
    "stream_simhash_gate",
    "stream_media_dedup_gate",
    "stream_embedding_gate",
    "stream_dsir_gate",
    "stream_reservoir_sample",
    "read_reservoir",
    "stream_quality_gate",
    "stream_media_gate",
    "stream_blocklist_gate",
    "media_admission_condition",
    "stream_heavy_hitters",
    "read_heavy_hitters",
    "append_gate_stats",
    "read_gate_stats",
    "reference_profile",
    "stream_drift_monitor",
    "embedding_reference_mean",
    "stream_embedding_drift",
    "stream_changelog_apply",
    "stream_source",
    "incremental_sync",
    "windowed_counts",
    "sessionized",
    "run_available_now",
    "resume_info",
    "stateful_running_stats",
    "stateful_max_cursor",
    "stateful_heavy_hitters",
    "stateful_anomalies",
    "deduped_stream",
    "stream_interval_join",
]
