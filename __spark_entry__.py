"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship corpus-indexing query on sf0.001;
``queries()``/``oracle_sql()`` expose one DuckDB-oracled query per
implemented operator family (SURVEY.md §2) from
pygeodatacrawler_spark.entry_queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pygeodatacrawler_spark.entry_queries import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index the sf0.001 documents corpus — language-ID,
    quality score, token count, fingerprint, and exact-dup rank in one
    pass (the per-resource 'indexFile' of the reference, vectorized)."""
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.functions.quality import (
        fingerprint_from_tokens,
        lang_id,
        quality_score,
        token_count,
        tokens,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        "source",
        "text",
        tokens(F.col("text")).alias("_toks"),
    ).select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("token_cnt"),
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("q_score"),
        fingerprint_from_tokens(F.col("_toks"), 3).alias("fp"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
