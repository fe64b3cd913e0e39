"""Join-shaped operators from the reference (SURVEY.md §2.3).

- ``sidecar_join`` (J1): records↔data-files by shared basename with
  first-match-wins over an extension priority list
  (/root/reference/geodatacrawler/metadata.py:258-268).
- ``cascade_match`` (J3): the 3-stage fallback matcher of checkOWSLayer
  (utils.py:307-349) — a record matches via the FIRST stage that yields
  any match; later stages only apply to still-unmatched records.
  Expressed as per-stage join+aggregate candidate tables coalesced in
  priority order — all stages run set-at-a-time (no per-row loop), and
  each per-stage join can broadcast independently.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def sidecar_join(
    records: DataFrame,
    files: DataFrame,
    on: str,
    ext_col: str,
    ext_priority: Sequence[str],
) -> DataFrame:
    """Left-join records to files on ``on`` (shared basename); among
    multiple candidates keep the file whose extension comes first in
    ext_priority (INDEX_FILE_TYPES order), tie-break on the extension."""
    prio = F.array_position(
        F.array(*[F.lit(e) for e in ext_priority]), F.col(ext_col)
    )
    j = records.join(files, on, "left").withColumn(
        "_prio",
        F.when(prio == 0, F.lit(len(ext_priority) + 1)).otherwise(prio),
    )
    # partition by the full record identity, not just the join key:
    # two distinct records sharing a basename must EACH keep their best
    # file (keying on `on` alone would silently drop one record)
    w = Window.partitionBy(*records.columns).orderBy("_prio", ext_col)
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def cascade_match(
    left: DataFrame,
    key: str,
    stages: Sequence[tuple[str, DataFrame, Column]],
    pick: str,
) -> DataFrame:
    """First-stage-wins fallback matching.

    ``stages``: (name, right_df, condition) with the condition written
    against aliases ``l`` and ``r``. Fan-out within a stage resolves to
    min(pick) for determinism (the reference takes the first in loop
    order, utils.py:319-325). Output: left columns + ``matched`` +
    ``match_stage`` (both null when no stage matches).
    """
    out = left
    for name, right, cond in stages:
        m = (
            left.alias("l")
            .join(right.alias("r"), cond, "inner")
            .groupBy(F.col(f"l.{key}").alias(key))
            .agg(F.min(F.col(f"r.{pick}")).alias(f"_m_{name}"))
        )
        out = out.join(m, key, "left")
    picked = F.coalesce(*[F.col(f"_m_{name}") for name, _, _ in stages])
    expr = None
    for name, _, _ in stages:
        cond_col = F.col(f"_m_{name}").isNotNull()
        expr = (
            F.when(cond_col, F.lit(name))
            if expr is None
            else expr.when(cond_col, F.lit(name))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        picked.alias("matched"),
        expr.alias("match_stage"),
    )
