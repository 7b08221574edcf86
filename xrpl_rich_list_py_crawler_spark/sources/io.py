"""CSV interchange layer (S5/S6): the reference's stage-to-stage format.

The reference hands rows between OS processes as CSV with explicit ordered
fieldnames (``loader.py:182-183``, ``scraper.py:93``, ``validator.py:142-144``)
and re-coerces types on read (``uploader.py:56-68``: ``int(row['rank'])``,
``float(row['balance_xrp'])``, string→bool). The engine keeps that
capability for interop — schema-on-write CSV with the same columns, and a
read path that re-coerces stringly-typed values identically — while its own
stages hand off through the snapshot catalog (Parquet) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the reference's CSV column order (loader.py:182-183 variant with domain/
#: twitter/verified; validator.py:142-144)
RICHLIST_CSV_FIELDS = [
    "rank", "address", "label", "balance_xrp", "escrow_xrp", "percentage",
    "snapshot_date", "exists", "domain", "twitter", "verified",
]


def write_richlist_csv(df: DataFrame, path: str) -> None:
    """S6: CSV sink with fixed fieldnames + header (``loader.py:180-203``).
    Executor-parallel (one part per partition) instead of the reference's
    row-at-a-time DictWriter."""
    cols = [c for c in RICHLIST_CSV_FIELDS if c in df.columns]
    df.select(*cols).write.mode("overwrite").option("header", True).csv(path)


def read_richlist_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 + type re-coercion (``uploader.py:56-68``): every value arrives
    stringly typed; ints/floats via cast, bool via the reference's
    ``str(x).lower() == 'true'`` idiom (F6), missing ``exists`` → True."""
    raw = spark.read.option("header", True).csv(path)  # all strings
    out = raw
    if "rank" in raw.columns:
        out = out.withColumn("rank", F.col("rank").cast("int"))
    for c in ("balance_xrp", "escrow_xrp", "percentage"):
        if c in raw.columns:
            out = out.withColumn(c, F.col(c).cast("double"))
    if "snapshot_date" in raw.columns:
        out = out.withColumn("snapshot_date", F.col("snapshot_date").cast("timestamp"))
    if "exists" in raw.columns:
        out = out.withColumn(
            "exists",
            F.when(F.col("exists").isNull(), F.lit(True)).otherwise(
                F.lower(F.col("exists")) == "true"
            ),
        )
    if "verified" in raw.columns:
        out = out.withColumn(
            "verified",
            F.when(F.col("verified").isNull(), F.lit(False)).otherwise(
                F.lower(F.col("verified")) == "true"
            ),
        )
    return out


def preflight_source_health(pages: DataFrame, sample: int = 100) -> dict:
    """S10 health probe (``check_xrpscan_api.py:18-71``): before a round,
    sniff that the source "responds" with the expected shape — non-null
    urls, parseable html head, expected columns — and report an error rate
    instead of failing late mid-crawl."""
    expected = {"url", "warc_ts", "html"}
    missing = expected - set(pages.columns)
    if missing:
        return {"ok": False, "reason": f"missing columns {sorted(missing)}"}
    bad_head = F.when(
        F.col("html").isNotNull()
        & ~F.substring(F.col("html").cast("string"), 1, 6).startswith("<html"),
        1,
    ).otherwise(0)
    probe = pages.select(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.col("url").isNull().cast("int")), F.lit(0)).alias("null_url"),
        F.coalesce(F.sum(F.col("html").isNull().cast("int")), F.lit(0)).alias("null_html"),
        F.coalesce(F.sum(bad_head), F.lit(0)).alias("bad_head"),
    ).collect()[0]
    n = probe["n"] or 1
    err_rate = (probe["null_url"] + probe["null_html"] + probe["bad_head"]) / n
    return {
        "ok": err_rate < 0.05,
        "rows": probe["n"],
        "error_rate": float(err_rate),
    }


#: the engine's critical runtime deps and minimum-supported versions —
#: the analog of the reference's websockets/supabase pin report
#: (check_versions.py:29-36). Spark 4 is required (strict decode(),
#: make_valid_utf8, dropDuplicatesWithinWatermark all appear in 4.x).
CRITICAL_DEPS = {
    "pyspark": (4, 0),
    # PySpark 4.x itself requires pyarrow >= 11 (its setup.py floor) — a
    # lower pin would report "ok" on an env where the engine cannot run
    "pyarrow": (11, 0),
    "pandas": (1, 5),
    "numpy": (1, 22),
}


def preflight_versions(deps: dict | None = None) -> dict:
    """Ops preflight ≅ ``check_versions.py``: report each critical
    dependency's installed version and whether it meets the engine's
    minimum, without importing any of them (metadata only, so a broken
    install still reports instead of crashing the probe). Returns
    ``{"ok": bool, "deps": {name: {"installed": str|None, "ok": bool}}}``.
    """
    from importlib import metadata

    deps = CRITICAL_DEPS if deps is None else deps
    report: dict = {}
    all_ok = True
    for name, minimum in deps.items():
        try:
            ver = metadata.version(name)
            parts = []
            for tok in ver.split(".")[: len(minimum)]:
                digits = "".join(ch for ch in tok if ch.isdigit())
                parts.append(int(digits) if digits else 0)
            ok = tuple(parts) >= tuple(minimum)
        except metadata.PackageNotFoundError:
            ver, ok = None, False
        report[name] = {"installed": ver, "ok": ok}
        all_ok = all_ok and ok
    return {"ok": all_ok, "deps": report}


# ---------------------------------------------------------------------------
# columnar interchange beyond Parquet (ORC / JSONL)
# ---------------------------------------------------------------------------


def write_interchange(df: DataFrame, path: str, fmt: str = "orc") -> None:
    """Columnar/JSONL export for downstream systems that don't read the
    catalog's Parquet (ORC is built into Spark; JSONL for line-oriented
    consumers). Schema-on-write, executor-parallel."""
    if fmt not in ("orc", "json", "parquet"):
        raise ValueError(f"unsupported interchange format: {fmt}")
    df.write.mode("overwrite").format(fmt).save(path)


def read_interchange(
    spark: SparkSession, path: str, fmt: str = "orc", schema=None
) -> DataFrame:
    """Read an interchange export back with an enforced schema (JSONL is
    schema-on-read and MUST be pinned — inference reorders and widens)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
