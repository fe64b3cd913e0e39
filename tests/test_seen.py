"""Bloom seen-set: zero false negatives, bounded false positives,
merge correctness."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.seen import (
    build_bloom,
    merge_blooms,
    probe_bloom,
)


def _hashes(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.concat(F.lit("url-"), F.col("id"))).alias("url_hash")
    )


def test_bloom_no_false_negatives(spark):
    inserted = _hashes(spark, 0, 5000)
    bloom = build_bloom(inserted, n_buckets=16, fpr=0.01)
    probed = probe_bloom(inserted, bloom, n_buckets=16)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_fpr_bounded(spark):
    inserted = _hashes(spark, 0, 5000)
    fresh = _hashes(spark, 10_000, 20_000)
    bloom = build_bloom(inserted, n_buckets=16, fpr=0.01)
    fp = probe_bloom(fresh, bloom, n_buckets=16).filter(F.col("maybe_seen")).count()
    assert fp / 10_000 < 0.05  # 1% target, generous margin


def test_cogroup_probe_matches_broadcast_and_never_collects(spark):
    """The scale path: bucket-co-partitioned probe gives bit-identical
    answers to the broadcast probe WITHOUT ever collecting a bitmap to
    the driver (DataFrame.collect is poisoned for the duration)."""
    from pyspark.sql import DataFrame

    inserted = _hashes(spark, 0, 5000)
    mixed = _hashes(spark, 2500, 12_500)
    bloom = build_bloom(inserted, n_buckets=16, fpr=0.01)
    want = {
        (r["url_hash"], r["maybe_seen"])
        for r in probe_bloom(mixed, bloom, n_buckets=16, via="broadcast").collect()
    }

    orig = DataFrame.collect
    DataFrame.collect = lambda self: (_ for _ in ()).throw(
        AssertionError("cogroup probe must not collect")
    )
    try:
        got_pdf = probe_bloom(mixed, bloom, n_buckets=16, via="cogroup").toPandas()
    finally:
        DataFrame.collect = orig
    got = set(zip(got_pdf["url_hash"], got_pdf["maybe_seen"]))
    assert got == want
    # every inserted key present (no false negatives through cogroup)
    assert all(seen for h, seen in got if (h, True) in want)


def test_bloom_merge(spark):
    a = _hashes(spark, 0, 1000)
    b = _hashes(spark, 1000, 2000)
    total = a.count() + b.count()
    ba = build_bloom(a, n_buckets=8, fpr=0.01, expected_total=total)
    bb = build_bloom(b, n_buckets=8, fpr=0.01, expected_total=total)
    merged = merge_blooms(ba, bb)
    both = _hashes(spark, 0, 2000)
    assert (
        probe_bloom(both, merged, n_buckets=8).filter(~F.col("maybe_seen")).count()
        == 0
    )
