"""Partitioned bloom-filter URL-seen set (SURVEY.md §4.2).

Replaces the reference's "sidecar file exists" membership test
(/root/reference/geodatacrawler/metadata.py:430) with a structure that
holds 10^10 keys: the key space is bucketed by ``pmod(xxhash64(url), B)``;
each bucket owns an independent bloom bitmap sized for its expected
share. Buckets are rows ``(bucket, bitmap binary, n_items, m_bits,
k_hashes)`` in a snapshot table — at 1% FPR and 10^10 keys that is
~12 GB of bitmap split across B buckets, each small enough to build and
probe inside one task.

Build and probe are Arrow-batched (numpy bit ops inside
applyInPandas/cogroup) — the only Python in the seen path. Double
hashing h1+i*h2 (Kirsch-Mitzenmacher) derives the k probe positions
from two splits of the 64-bit key, so membership is a pure function of
the xxhash64 key and the bucket geometry: deterministic across runs,
partitions and cluster sizes.

The bloom filter can say "maybe seen" for a never-seen URL (FPR); for
exact URL-seen *parity* with the reference, CrawlEngine keeps the
frontier MERGE keyed on the url_hash itself — the bloom is the cheap
pre-filter that prunes the expensive anti-join, exactly like the
reference checks os.path.exists before extraction.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("bitmap", BinaryType(), False),
        StructField("n_items", LongType(), False),
        StructField("m_bits", LongType(), False),
        StructField("k_hashes", IntegerType(), False),
    ]
)


def bloom_geometry(expected_per_bucket: int, fpr: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target FPR; m rounded up to a byte."""
    n = max(1, expected_per_bucket)
    m = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _positions(h: np.ndarray, m_bits: int, k: int) -> Iterator[np.ndarray]:
    """k probe positions per key via double hashing over uint64."""
    hu = h.astype(np.uint64)
    h1 = hu % np.uint64(m_bits)
    h2 = (hu >> np.uint64(32) | np.uint64(1)) % np.uint64(m_bits)
    for i in range(k):
        yield (h1 + np.uint64(i) * h2) % np.uint64(m_bits)


def build_bloom(
    hashes: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
    fpr: float = 0.01,
    expected_total: int | None = None,
    geometry: tuple[int, int] | None = None,
) -> DataFrame:
    """hashes (one col of int64 keys) -> bloom bucket rows.

    One shuffle (groupBy bucket); each task builds one bitmap with numpy.
    ``expected_total`` sizes the bitmaps; defaults to a driver count()
    (cheap: count of a single-column frame). Pass an explicit
    ``geometry`` (m_bits, k) to build a delta bloom mergeable into an
    existing table (merge_blooms requires identical geometry).
    """
    if geometry is not None:
        m_bits, k = geometry
    else:
        if expected_total is None:
            expected_total = hashes.count()
        m_bits, k = bloom_geometry(int(expected_total / n_buckets) + 1, fpr)

    def _build(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for pdf in pdf_iter:
            for bucket, grp in pdf.groupby("_bucket"):
                bm = acc.setdefault(int(bucket), np.zeros(m_bits // 8, dtype=np.uint8))
                h = grp[hash_col].to_numpy(dtype=np.int64)
                for pos in _positions(h, m_bits, k):
                    np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                                     np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
                counts[int(bucket)] = counts.get(int(bucket), 0) + len(grp)
        rows = [
            {
                "bucket": b,
                "bitmap": acc[b].tobytes(),
                "n_items": counts[b],
                "m_bits": m_bits,
                "k_hashes": k,
            }
            for b in sorted(acc)
        ]
        yield pd.DataFrame(rows, columns=[f.name for f in BLOOM_SCHEMA.fields])

    bucketed = hashes.withColumn(
        "_bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    ).repartition(n_buckets, "_bucket")
    return bucketed.mapInPandas(_build, schema=BLOOM_SCHEMA)


def _hits(h: np.ndarray, bitmap: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Boolean membership vector for keys ``h`` against one bitmap."""
    hit = np.ones(len(h), dtype=bool)
    for pos in _positions(h, m_bits, k):
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        hit &= (bitmap[byte_idx] & bit) != 0
    return hit


# above this, shipping every bitmap to every executor (and collecting
# them all on the driver first) stops being reasonable; the cogroup
# probe holds exactly one bucket's bitmap per task instead
BROADCAST_MAX_BITMAP_BYTES = 64 << 20


def probe_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
    result_col: str = "maybe_seen",
    via: str = "broadcast",
) -> DataFrame:
    """Adds ``maybe_seen`` to candidates. Two physical strategies:

    ``via="broadcast"`` — collect the bucket rows once, sc.broadcast the
    {bucket: bitmap} dict, probe inside mapInPandas: a map-only stage
    over the candidates, zero shuffle. Right when the total bitmap is
    small (sandbox scale). A DataFrame broadcast *join* would instead
    copy the bitmap bytes onto every candidate row at the Arrow boundary.

    ``via="cogroup"`` — co-partition candidates and bloom rows on the
    bucket id and probe inside a grouped cogroup UDF: one shuffle of the
    candidates, NO driver collection and no full-bitmap replication —
    each task holds only its own bucket's bitmap. This is the 10^10-key
    path (~12 GB of bitmaps per the module docstring would kill the
    driver under broadcast). CrawlEngine picks the strategy from the
    bloom geometry driver-side (pure math, no extra job).
    """
    if via == "cogroup":
        return _probe_bloom_cogroup(
            candidates, bloom, hash_col, n_buckets, result_col
        )
    spark = candidates.sparkSession
    buckets = {
        int(r["bucket"]): (
            np.frombuffer(r["bitmap"], dtype=np.uint8),
            int(r["m_bits"]),
            int(r["k_hashes"]),
        )
        for r in bloom.collect()
    }
    bc = spark.sparkContext.broadcast(buckets)

    def _probe(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bkts = bc.value
        for pdf in pdf_iter:
            pdf = pdf.reset_index(drop=True)
            res = np.zeros(len(pdf), dtype=bool)
            h_all = pdf[hash_col].to_numpy(dtype=np.int64)
            # matches Spark's pmod on signed int64 for any bucket count
            bucket_ids = ((h_all % n_buckets) + n_buckets) % n_buckets
            for b in np.unique(bucket_ids):
                if int(b) not in bkts:
                    continue
                bm, m_bits, k = bkts[int(b)]
                sel = np.flatnonzero(bucket_ids == b)
                hit = _hits(h_all[sel], bm, m_bits, k)
                res[sel[hit]] = True
            pdf[result_col] = res
            yield pdf

    out_schema = StructType(
        list(candidates.schema.fields) + [StructField(result_col, BooleanType(), False)]
    )
    return candidates.mapInPandas(_probe, schema=out_schema)


def _probe_bloom_cogroup(
    candidates: DataFrame,
    bloom: DataFrame,
    hash_col: str,
    n_buckets: int,
    result_col: str,
) -> DataFrame:
    """Bucket-co-partitioned probe: candidates shuffle once on their
    bucket id; each cogroup task sees (bucket's candidates, bucket's one
    bloom row). Bitmap bytes move executor-to-executor only, once per
    bucket — never through the driver."""
    cand = candidates.withColumn(
        "_bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    out_fields = list(candidates.schema.fields) + [
        StructField(result_col, BooleanType(), False)
    ]
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def _probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        cand_pdf = cand_pdf.reset_index(drop=True)
        if bloom_pdf.empty:
            cand_pdf[result_col] = False
        else:
            row = bloom_pdf.iloc[0]
            bm = np.frombuffer(row["bitmap"], dtype=np.uint8)
            h = cand_pdf[hash_col].to_numpy(dtype=np.int64)
            cand_pdf[result_col] = _hits(
                h, bm, int(row["m_bits"]), int(row["k_hashes"])
            )
        return cand_pdf[out_cols]

    return (
        cand.groupBy("_bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(_probe, schema=out_schema)
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR together two bloom tables with identical geometry (per bucket)."""

    def _or(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bm = None
        n = 0
        for _, row in pdf.iterrows():
            cur = np.frombuffer(row["bitmap"], dtype=np.uint8)
            bm = cur.copy() if bm is None else (bm | cur)
            n += int(row["n_items"])
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                {
                    "bucket": int(key[0]),
                    "bitmap": bm.tobytes(),
                    "n_items": n,
                    "m_bits": int(first["m_bits"]),
                    "k_hashes": int(first["k_hashes"]),
                }
            ]
        )

    return a.unionByName(b).groupBy("bucket").applyInPandas(_or, schema=BLOOM_SCHEMA)
