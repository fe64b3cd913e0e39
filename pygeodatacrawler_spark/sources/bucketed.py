"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the frontier⋈records / orders⋈lineitem class of repeated
large-large equi-joins should be bucketed on the join key at write time
(Iceberg: ``bucket(N, key)`` partition transform; plain Spark:
``bucketBy`` + saveAsTable). Both sides bucketed with the same bucket
count on the join keys -> SortMergeJoin with NO Exchange on either
side — the shuffle is paid once at write, amortized over every
subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int,
    path: str,
) -> None:
    """Persist df as an external bucketed+sorted parquet table."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.

    hint("merge") pins SortMergeJoin so the plan demonstrably carries
    no Exchange (a broadcast would hide the property being shown).
    """
    l = spark.table(left_name)
    r = spark.table(right_name)
    return l.hint("merge").join(r, l[left_key] == r[right_key])


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains an Exchange (shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
