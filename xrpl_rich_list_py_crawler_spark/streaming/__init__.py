"""Structured Streaming variants of the micro-batch jobs."""

from .jobs import (  # noqa: F401
    corpus_dedup_stream,
    frontier_dedup_stream,
    hll_register_stream,
    hourly_summary_stream,
    neardup_vs_reference_stream,
    politeness_stream,
    warc_ingest_stream,
)
