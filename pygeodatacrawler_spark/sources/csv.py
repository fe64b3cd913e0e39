"""CSV source with the reference's dialect semantics (S3).

importCsv (/root/reference/geodatacrawler/metadata.py:487-500) reads
with configurable separator/encoding, first row = header, and pads
short rows with '' instead of failing. Spark equivalents: header/sep/
encoding options + PERMISSIVE mode; the short-row padding is a
coalesce-to-'' projection over every column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def read_csv_dialect(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    encoding: str = "UTF-8",
    pad_short_rows: bool = True,
) -> DataFrame:
    df = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    if pad_short_rows:
        df = df.select(
            *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in df.columns]
        )
    return df
