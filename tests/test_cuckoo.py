"""Cuckoo-filter seen-set fallback (north rule: "bloom-filter (with
cuckoo-filter fallback) URL-seen set"). Deletion is the capability the
bloom lacks — sidecar cleanup semantics (reference metadata.py:430
os.path.exists after file removal)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.cuckoo import (
    build_cuckoo,
    choose_seen_backend,
    delete_cuckoo,
    probe_cuckoo,
)


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )


def test_membership_no_false_negatives(spark):
    seen = _keys(spark, 0, 4000)
    filt = build_cuckoo(seen, n_buckets=8).cache()
    probed = probe_cuckoo(seen, filt, n_buckets=8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_fpr_bounded(spark):
    seen = _keys(spark, 0, 4000)
    filt = build_cuckoo(seen, n_buckets=8).cache()
    fresh = _keys(spark, 100_000, 120_000)
    fp = probe_cuckoo(fresh, filt, n_buckets=8).filter("maybe_seen").count()
    assert fp / 20_000 < 0.01  # 16-bit fingerprints, (2,4)-cuckoo


def test_cogroup_probe_matches_broadcast(spark):
    seen = _keys(spark, 0, 3000)
    filt = build_cuckoo(seen, n_buckets=8).cache()
    cand = _keys(spark, 1500, 4500)
    a = probe_cuckoo(cand, filt, n_buckets=8, via="broadcast")
    b = probe_cuckoo(cand, filt, n_buckets=8, via="cogroup")
    rows_a = {(r.url_hash, r.maybe_seen) for r in a.collect()}
    rows_b = {(r.url_hash, r.maybe_seen) for r in b.collect()}
    assert rows_a == rows_b


def test_delete_then_unseen(spark):
    seen = _keys(spark, 0, 2000)
    filt = build_cuckoo(seen, n_buckets=8).cache()
    gone = _keys(spark, 0, 500)
    filt2 = delete_cuckoo(filt, gone, n_buckets=8).cache()
    # deleted keys read unseen again (the bloom-impossible operation)...
    still = probe_cuckoo(gone, filt2, n_buckets=8).filter("maybe_seen").count()
    assert still / 500 < 0.02  # only residual fingerprint collisions
    # ...while every kept key remains present (no collateral damage
    # beyond shared fingerprints, which deletion of inserted keys avoids)
    kept = _keys(spark, 500, 2000)
    missing = probe_cuckoo(kept, filt2, n_buckets=8).filter(
        ~F.col("maybe_seen")
    ).count()
    assert missing == 0


def test_deterministic_bytes(spark):
    seen = _keys(spark, 0, 2500)
    a = {r.bucket: (r.table, r.overflow) for r in build_cuckoo(seen, n_buckets=8).collect()}
    b = {
        r.bucket: (r.table, r.overflow)
        for r in build_cuckoo(seen.repartition(13), n_buckets=8).collect()
    }
    assert a == b  # pure function of the key set, not partitioning


def test_backend_policy():
    assert choose_seen_backend(need_delete=False) == "bloom"
    assert choose_seen_backend(need_delete=True) == "cuckoo"


def test_delete_guard_ignores_unknown_and_repeat_deletions(spark):
    # inserted_keys guard: deleting never-inserted keys, or the same
    # keys twice across calls, must be a no-op — unguarded it would
    # strip colliding fingerprints and create false negatives.
    seen = _keys(spark, 0, 2000)
    filt = build_cuckoo(seen, n_buckets=8).cache()

    unknown = _keys(spark, 50_000, 51_000)  # never inserted
    filt2 = delete_cuckoo(
        filt, unknown, n_buckets=8, inserted_keys=seen
    ).cache()
    missing = probe_cuckoo(seen, filt2, n_buckets=8).filter(
        ~F.col("maybe_seen")
    ).count()
    assert missing == 0  # nothing was touched

    # first deletion succeeds; the repeat (against the UPDATED key set)
    # is a no-op instead of corrupting colliding survivors
    gone = _keys(spark, 0, 500)
    remaining = _keys(spark, 500, 2000)
    filt3 = delete_cuckoo(filt2, gone, n_buckets=8, inserted_keys=seen).cache()
    filt4 = delete_cuckoo(
        filt3, gone, n_buckets=8, inserted_keys=remaining
    ).cache()
    missing_after = probe_cuckoo(remaining, filt4, n_buckets=8).filter(
        ~F.col("maybe_seen")
    ).count()
    assert missing_after == 0
