"""Structured Streaming surface."""

from .incremental import stream_incremental_merge, windowed_event_counts, sessionized_stream

__all__ = ["stream_incremental_merge", "windowed_event_counts", "sessionized_stream"]
