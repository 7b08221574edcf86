"""End-to-end plans: crawl rounds, analytics job chain, reference simulator."""

from .rounds import CrawlRun, index_pages, seeds_to_frontier  # noqa: F401
