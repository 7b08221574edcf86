"""Structured Streaming variants of the micro-batch jobs."""

from .jobs import (  # noqa: F401
    frontier_dedup_stream,
    hourly_summary_stream,
    politeness_stream,
)
