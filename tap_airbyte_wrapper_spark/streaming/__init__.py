"""Structured Streaming layer: checkpoint-bookmarked incremental sync,
watermarked windows, session windows."""

from .incremental import (
    incremental_sync,
    resume_info,
    run_available_now,
    sessionized,
    stream_source,
    windowed_counts,
)

__all__ = [
    "stream_source",
    "incremental_sync",
    "windowed_counts",
    "sessionized",
    "run_available_now",
    "resume_info",
]
