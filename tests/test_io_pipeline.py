"""CSV interchange (S5/S6/F6), presentation (F3/F15/F16/S9), orchestration
(T9), deploy zip."""

import os
import zipfile
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.deploy import build_pyfiles_zip
from xrpl_rich_list_py_crawler_spark.functions.presentation import (
    alert_text,
    drops_to_xrp,
    signed_amount,
)
from xrpl_rich_list_py_crawler_spark.plans.pipeline import (
    refresh_analytics,
    significant_changes_alert,
)
from xrpl_rich_list_py_crawler_spark.sources.io import (
    preflight_source_health,
    read_richlist_csv,
    write_richlist_csv,
)


def test_csv_roundtrip_with_type_coercion(spark, crawl_sf0001, tmp_path):
    rich = spark.read.parquet(os.path.join(crawl_sf0001, "richlist.parquet")).limit(200)
    path = str(tmp_path / "richlist_csv")
    write_richlist_csv(rich, path)
    back = read_richlist_csv(spark, path)
    assert dict(back.dtypes)["rank"] == "int"
    assert dict(back.dtypes)["balance_xrp"] == "double"
    assert dict(back.dtypes)["exists"] == "boolean"
    assert dict(back.dtypes)["snapshot_date"] == "timestamp"
    a = {(r["address"], r["snapshot_date"]): (r["rank"], r["balance_xrp"], r["exists"])
         for r in rich.collect()}
    b = {(r["address"], r["snapshot_date"]): (r["rank"], r["balance_xrp"], r["exists"])
         for r in back.collect()}
    assert a == b


def test_csv_bool_coercion_idiom(spark, tmp_path):
    """uploader.py:56: str(x).lower() == 'true'; missing → True."""
    p = str(tmp_path / "c")
    os.makedirs(p)
    with open(os.path.join(p, "x.csv"), "w") as f:
        f.write("rank,address,exists\n1,r1,True\n2,r2,FALSE\n3,r3,\n")
    got = {r["address"]: r["exists"]
           for r in read_richlist_csv(spark, p).collect()}
    assert got == {"r1": True, "r2": False, "r3": True}


def test_preflight_source_health(spark, crawl_sf0001):
    pages = spark.read.parquet(os.path.join(crawl_sf0001, "pages.parquet"))
    rep = preflight_source_health(pages)
    assert rep["ok"] and rep["error_rate"] == 0.0
    bad = pages.withColumn("html", F.lit(None).cast("binary"))
    assert not preflight_source_health(bad)["ok"]
    assert not preflight_source_health(pages.drop("html"))["ok"]


def test_drops_and_sign_formatting(spark):
    df = spark.createDataFrame([(1_500_000, 1234567.0), (-2_000_000, -1.4)],
                               "drops long, change double")
    rows = df.select(
        drops_to_xrp(F.col("drops")).alias("xrp"),
        signed_amount(F.col("change")).alias("s"),
    ).collect()
    assert rows[0]["xrp"] == Decimal("1.500000")
    assert rows[0]["s"] == "+1,234,567"
    assert rows[1]["xrp"] == Decimal("-2.000000")
    assert rows[1]["s"] == "-1"  # :,.0f rounding, post-alert.py:78-82


def test_refresh_analytics_chain(spark, crawl_sf0001):
    rich = spark.read.parquet(os.path.join(crawl_sf0001, "richlist.parquet"))
    cats = spark.read.parquet(os.path.join(crawl_sf0001, "categories.parquet"))
    res = refresh_analytics(spark, rich, cats)
    assert res.steps_run == [
        "validate_categories", "summary", "balance_changes",
        "available_changes", "category_changes", "country_changes",
        "category_statistics", "country_statistics", "available_statistics",
        "analyze_tables",
    ]
    assert res.balance_changes.count() > 0
    assert res.category_statistics.count() > 0
    # chain aborts on CHECK violation (T9 raise-on-failure)
    bad = cats.withColumn("category", F.lit("NotACategory"))
    with pytest.raises(ValueError, match="CHECK enum"):
        refresh_analytics(spark, rich, bad)


def test_alert_text(spark, crawl_sf0001):
    rich = spark.read.parquet(os.path.join(crawl_sf0001, "richlist.parquet"))
    txt = significant_changes_alert(spark, rich, 0.05, 100, as_of_unix=1767225600)
    lines = txt.splitlines()
    assert lines[0].startswith("XRPL rich-list movers")
    assert lines[-1] == "t=1767225600"
    assert 1 <= len(lines) - 2 <= 5
    assert all(" XRP (" in l for l in lines[1:-1])


def test_pyfiles_zip_contains_package(tmp_path):
    z = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(z).namelist()
    assert "xrpl_rich_list_py_crawler_spark/__init__.py" in names
    assert "xrpl_rich_list_py_crawler_spark/plans/rounds.py" in names
    assert not any("__pycache__" in n for n in names)


def test_orc_and_jsonl_interchange_roundtrip(spark, tmp_path):
    """S5/S6 beyond CSV: ORC (built-in columnar) and JSONL exports round-trip
    with identical rows under an enforced schema."""
    from xrpl_rich_list_py_crawler_spark.sources.io import (
        read_interchange,
        write_interchange,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -2.25, False), (3, None, 0.0, None)],
        "id long, name string, v double, flag boolean",
    )
    want = sorted(map(tuple, df.collect()))
    for fmt in ("orc", "json"):
        p = str(tmp_path / f"x_{fmt}")
        write_interchange(df, p, fmt)
        back = read_interchange(spark, p, fmt, schema=df.schema)
        assert sorted(map(tuple, back.collect())) == want
    import pytest

    with pytest.raises(ValueError):
        write_interchange(df, str(tmp_path / "nope"), "avro-nope")


def test_preflight_versions():
    """≅ check_versions.py: the version report covers every critical dep,
    passes in this environment, and flags missing/too-old deps without
    raising."""
    from xrpl_rich_list_py_crawler_spark.sources.io import (
        CRITICAL_DEPS,
        preflight_versions,
    )

    rep = preflight_versions()
    assert rep["ok"] and set(rep["deps"]) == set(CRITICAL_DEPS)
    assert all(d["installed"] for d in rep["deps"].values())
    bad = preflight_versions({"pyspark": (99, 0), "no-such-pkg": (1, 0)})
    assert not bad["ok"]
    assert not bad["deps"]["pyspark"]["ok"]
    assert bad["deps"]["no-such-pkg"]["installed"] is None


def test_run_curation_cli_end_to_end(spark, tmp_path, monkeypatch):
    """The curation spark-submit entry composes verdicts + gopher +
    soft-dedup + splits and writes a readable parquet; split atomicity
    and the soft-dedup singleton law hold on the output."""
    import sys as _sys

    docs = spark.createDataFrame(
        [
            (
                i,
                (
                    "the quick brown fox jumps over the lazy dog and that "
                    "is fine to be sure of it all with more plain words "
                    f"here today variant {i % 7} "
                )
                * 3,
                f"src{i % 3}",
                100 + i,
            )
            for i in range(60)
        ],
        ["doc_id", "text", "source", "n_chars"],
    )
    src_path = str(tmp_path / "docs.parquet")
    out_path = str(tmp_path / "verdicts.parquet")
    docs.write.parquet(src_path)
    import os as _os
    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
    from scripts import run_curation as rc

    monkeypatch.setattr(_sys, "argv", [
        "run_curation.py", "--documents", src_path, "--out", out_path,
        "--gopher", "--gopher-min-words", "20", "--soft-dedup", "--splits",
        "--per-source-cap", "5",
    ])
    rc.main()
    back = spark.read.parquet(out_path)
    assert back.count() == 60
    cols = set(back.columns)
    assert {"selected", "quality_ok", "gopher_ok", "n_dups", "weight",
            "soft_keep", "split"} <= cols
    # per-source quota respected
    from pyspark.sql import functions as F
    caps = back.filter("selected").groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in caps)
    # split atomicity: near-identical docs (same i%7 variant) share splits
    rows = back.select("doc_id", "split").collect()
    splits = {r.doc_id: r.split for r in rows}
    for i in range(60):
        assert splits[i] == splits[i % 7]
