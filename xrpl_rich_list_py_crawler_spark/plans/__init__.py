"""End-to-end plans: crawl rounds, analytics job chain, reference simulator."""

from .rounds import (  # noqa: F401
    CrawlRun,
    bucketize_pages,
    index_pages,
    seeds_to_frontier,
)
