"""PySpark-native URL-frontier crawl + analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of ``t-ube/xrpl-rich-list-py-crawler`` (reference at
``/root/reference/``) as an idiomatic PySpark DataFrame engine, per
``SURVEY.md`` / ``BASELINE.json``:

* ``schemas``     — StructTypes for pages/frontier/seen/robots/results/metrics
                    and the richlist analytics tables.
* ``functions``   — scalar function layer (canonicalize_url, HTML parse,
                    amount/percentage parsers) as vectorized Arrow UDFs plus
                    pure-Python reference twins for byte-identical goldens.
* ``operators``   — reusable dataflow operators: as-of / banded joins,
                    bloom-sharded seen set with exact repair, politeness
                    token-bucket windows, frontier priority ordering, dedup
                    (exact / minhash-LSH / simhash), similarity search,
                    text analysis.
* ``sources``     — deterministic fixture generators (synthetic Common-Crawl
                    pages corpus, richlist snapshots) and the snapshot catalog
                    (Parquet + JSON-manifest emulation of Iceberg commits).
* ``plans``       — end-to-end jobs: crawl_round(), the analytics job chain
                    (the 12 ``function.sql`` analogs), and the single-process
                    reference simulator used for crawl-order equivalence.
* ``streaming``   — Structured Streaming variants (hourly tumbling aggregate
                    with watermark, rate-limited micro-batch crawl).

Everything here is built on public PySpark APIs only; design notes cite
reference files as ``file:line`` for parity checking.
"""

__version__ = "0.1.0"
