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

    from pygeodatacrawler_spark.session import _ship_package

    try:
        _ship_package(spark)
    except Exception:
        pass

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
    """Each callable first ships the package zip to the session's
    executors (no-op if already shipped): pandas UDFs pickle module
    functions by reference, and the driver's SparkSession may not have
    been built by our get_spark."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from pygeodatacrawler_spark.session import _ship_package

            try:
                _ship_package(spark)
            except Exception:
                pass  # already added or local path importable anyway
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
