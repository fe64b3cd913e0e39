"""Bucketed co-located join: same results, no Exchange in the plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.sources.bucketed import (
    colocated_join,
    plan_has_shuffle,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_no_shuffle(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, str(tmp_path / "o"))
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, str(tmp_path / "l"))
    try:
        joined = colocated_join(
            spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
        )
        # no shuffle on either side — the point of bucketing
        assert not plan_has_shuffle(joined)
        # same answer as the plain shuffled join
        want = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).count()
        assert joined.count() == want
        # and an aggregation on the bucket key also avoids the exchange
        agg = (
            spark.table("b_lineitem")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert not plan_has_shuffle(agg)
    finally:
        spark.sql("drop table if exists b_orders")
        spark.sql("drop table if exists b_lineitem")
