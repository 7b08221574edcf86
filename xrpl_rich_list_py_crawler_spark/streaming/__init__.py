"""Structured Streaming variants of the micro-batch jobs."""

from .jobs import hourly_summary_stream, politeness_stream  # noqa: F401
