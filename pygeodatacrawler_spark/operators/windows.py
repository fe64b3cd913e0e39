"""Window-based operators: the schedulers and first-match semantics the
reference implements as sequential loop state, re-expressed as Spark
window functions (SURVEY.md §2.5).

- first_match_wins — J1/J3 "first match in priority order" (reference
  iterates INDEX_FILE_TYPES in list order, metadata.py:258-268).
- topk_per_group — per-host frontier batch (politeness O4).
- token_budget — running-cost cap per host (token-bucket analog).
- sessionize — gap-based session ids over an event stream (the
  tumbling/session-window analog of crawl rounds).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def first_match_wins(
    df: DataFrame, partition_cols: Sequence[str], order_cols: Sequence[Column]
) -> DataFrame:
    """Keep exactly the first row per partition under the given order."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def topk_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group with the rank kept (frontier batch pick)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def token_budget(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    cost_col: str,
    budget: float,
    cum_col: str = "cum_cost",
) -> DataFrame:
    """Rows whose running cost within the partition stays <= budget.

    sum(cost) OVER (... ROWS UNBOUNDED PRECEDING) — the token-bucket
    politeness budget of the north rule: a host's batch stops once the
    cumulative fetch cost exceeds its budget.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(cum_col, F.sum(cost_col).over(w)).filter(
        F.col(cum_col) <= budget
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: new session when the inter-event gap
    exceeds ``gap_seconds``. lag + conditional cumsum — two windows on
    the same (user, ts) sort, one shuffle."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ timestamps can't cast straight to long; go via timestamp
    # (session tz pinned UTC in session.py, matching DuckDB's epoch())
    secs = F.col(ts_col).cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("_new", is_new).withColumn(
        session_col,
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("_new")
