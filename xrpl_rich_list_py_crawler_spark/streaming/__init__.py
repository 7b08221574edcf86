"""Structured Streaming variants of the micro-batch jobs."""

from .jobs import (  # noqa: F401
    corpus_dedup_stream,
    frontier_dedup_stream,
    hourly_summary_stream,
    politeness_stream,
)
