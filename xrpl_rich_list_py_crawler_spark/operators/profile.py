"""Whole-table data profiling: one bounded-output pass over a corpus.

The pre-training sanity sweep every 100 TB ingest needs — per column:
row/null counts, a deterministic HLL distinct estimate, and (numeric
columns) HDR p50/p95/p99 — composed entirely from this engine's own
engine-portable sketches (operators/sketches.py), so the whole profile
is reproducible bit-for-bit in the DuckDB oracle and across cluster
sizes.

Scale shape: counts are ONE agg over the scan (map-side combined,
every column in the same pass). The sketch side melts columns into
(col, value) rows — k columns multiply the scan, not the shuffle: HLL
keeps ≤ 2^p register rows per column and HDR a few thousand bin rows
per numeric column, so the exchange is bounded by sketch size
regardless of row count. No per-column job loops, no driver-side
iteration over data: a CONSTANT number of shuffles (the counts agg +
the sketch-internal groupBys + two tiny profile-row joins), independent
of both row count and column count.

Cross-engine margin (documented, fixture-safe): the HLL melt
stringifies values, and double→string forms diverge between Java and
DuckDB outside [1e-3, 1e7) (E-notation thresholds); profile numeric
columns within that range — or cast/round upstream — when oracle parity
matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sketches import hdr_bins, hdr_quantiles, hll_distinct

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    p: int = 12,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null,
    est_distinct, is_numeric, q50/q95/q99 — null for non-numerics).

    Complex-typed columns (arrays/structs/maps/binary) are skipped —
    select/flatten them explicitly first.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else [
        n for n, t in fields.items()
        if isinstance(t, _NUMERIC + (T.StringType, T.BooleanType,
                                     T.TimestampType, T.DateType))
    ]
    for c in cols:
        if c not in fields:
            raise ValueError(f"unknown column {c!r}")
    numeric = [c for c in cols if isinstance(fields[c], _NUMERIC)]

    # pass 1: every count in ONE aggregate over the scan
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}")
        )
    counts_row = df.agg(*aggs)
    counts = counts_row.selectExpr(
        "stack({}, {}) as (column, n_null)".format(
            len(cols),
            ", ".join(f"'{c}', _null_{c}" for c in cols),
        ),
        "_n as n_rows",
    )

    # pass 2: melt to (col, value) rows → per-column HLL registers.
    # value is stringified the same way in the SQL twin; nulls drop
    # (they are counted above, and countDistinct semantics ignore null)
    melted = None
    for c in cols:
        part = df.select(
            F.lit(c).alias("column"),
            F.col(c).cast("string").alias("value"),
        ).filter(F.col("value").isNotNull())
        melted = part if melted is None else melted.unionByName(part)
    distinct = (
        hll_distinct(melted, "column", "value", p=p)
        .select(F.col("key").alias("column"), "est_distinct")
    )

    out = counts.join(distinct, "column", "left").withColumn(
        "is_numeric",
        F.col("column").isin(list(numeric))
        if numeric
        else F.lit(False),
    )

    # pass 3: numeric melt → per-column HDR bins → quantiles
    if numeric:
        nmelt = None
        for c in numeric:
            part = df.select(
                F.lit(c).alias("column"),
                F.col(c).cast("double").alias("value"),
            ).filter(F.col("value").isNotNull())
            nmelt = part if nmelt is None else nmelt.unionByName(part)
        q = hdr_quantiles(
            hdr_bins(nmelt, "column", "value"), quantiles
        ).select(
            F.col("key").alias("column"),
            *[f"q{int(x * 100)}" for x in quantiles],
        )
        out = out.join(q, "column", "left")
    else:
        for x in quantiles:
            out = out.withColumn(
                f"q{int(x * 100)}", F.lit(None).cast("double")
            )
    return out.select(
        "column", "n_rows", "n_null", "est_distinct", "is_numeric",
        *[f"q{int(x * 100)}" for x in quantiles],
    )
