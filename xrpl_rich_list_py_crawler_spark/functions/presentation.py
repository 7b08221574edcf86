"""Presentation-layer scalar functions (F3, F15, F16, S9 formatting).

The reference's alert path formats top-K changes into a tweet
(``post-alert.py:70-86``): sign prefix for the delta, thousands-grouped
amounts, a unix-timestamp cache buster (``post-alert.py:84``). The engine
keeps these as Column expressions (codegen'd), and the side-effecting sink
stays a driver-side ``collect()`` over ≤5 rows — out-of-engine by design
(SURVEY.md S9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drops_to_xrp(drops: Column) -> Column:
    """F3: drops → XRP (``loader.py:83-84``; inline ``validator.py:95``).
    Decimal division keeps exactness (1 XRP = 10^6 drops)."""
    return (drops.cast("decimal(38,6)") / F.lit(1_000_000)).cast("decimal(38,6)")


def signed_amount(change: Column) -> Column:
    """F16: ``'+' if change >= 0`` + thousands grouping ``:,.0f``
    (``post-alert.py:78-82``)."""
    return F.concat(
        F.when(change >= 0, F.lit("+")).otherwise(F.lit("")),
        F.format_number(change.cast("double"), 0),
    )


def format_alert_lines(changes: DataFrame) -> DataFrame:
    """S9: render significant changes as alert lines.

    Input: (grouped_label, change_1h, percentage_1h) — the
    get_significant_changes output. Output adds a formatted line per row:
    ``Binance: +1,234,567 XRP (+0.42%)``.
    """
    return changes.select(
        "grouped_label",
        "change_1h",
        "percentage_1h",
        F.concat(
            F.col("grouped_label"),
            F.lit(": "),
            signed_amount(F.col("change_1h")),
            F.lit(" XRP ("),
            F.when(F.col("percentage_1h") >= 0, "+").otherwise(""),
            F.format_number(F.col("percentage_1h").cast("double"), 2),
            F.lit("%)"),
        ).alias("line"),
    )


def alert_text(changes: DataFrame, as_of_unix: int, top_k: int = 5) -> str:
    """Driver-side tweet assembly (``post-alert.py:88-105``): ≤top_k lines +
    the F15 unix-timestamp cache buster. The only collect in the alert path
    — bounded at top_k rows (O3 TakeOrderedAndProject upstream)."""
    rows = format_alert_lines(changes).limit(top_k).collect()
    lines = [r["line"] for r in rows]
    return "\n".join(["XRPL rich-list movers (1h):", *lines, f"t={as_of_unix}"])
