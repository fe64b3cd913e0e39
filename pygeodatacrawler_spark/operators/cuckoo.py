"""Partitioned cuckoo-filter URL-seen set — the deletion-capable
fallback behind the bloom filter (SURVEY.md §4.2; operators/seen.py).

Why a second filter: a bloom bitmap cannot forget. The reference's
seen-set is "the sidecar file exists" (/root/reference/geodatacrawler/
metadata.py:430) — and files get DELETED (--cleanup passes remove
stale sidecars), after which the URL must read as unseen again. A
crawl that re-queues expired pages therefore needs delete support in
the approximate layer too, or the bloom's stale positives force the
exact anti-join to carry the whole history forever. The cuckoo filter
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT
2014 — public) stores displaceable 16-bit fingerprints in two
candidate slot rows, so membership, insert AND delete are all O(1).

Layout mirrors the bloom exactly: keys bucket by
``pmod(url_hash, n_buckets)``; each bucket row carries one serialized
table ``(bucket, table binary, overflow binary, n_items, n_slots)``.
n_slots is a power of two so the partner slot ``i2 = i1 XOR
h(fingerprint)`` stays in range both directions (the XOR trick makes
the pair relation an involution — you can find the partner from
EITHER slot without knowing the key). 4 fingerprints per slot row,
sized for ~84% max load; spill past MAX_KICKS goes to a per-bucket
overflow list (probed linearly, normally empty).

Same two probe strategies as the bloom: broadcast (sandbox scale) and
bucket-co-partitioned cogroup (the 10^10-key path — no driver
collection, each task holds one bucket's table). Build sorts each
bucket's keys first so the serialized table bytes are a pure function
of the key SET — deterministic across runs, partitions, cluster sizes.
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

CUCKOO_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("table", BinaryType(), False),
        StructField("overflow", BinaryType(), False),
        StructField("n_items", LongType(), False),
        StructField("n_slots", LongType(), False),
    ]
)

SLOT_WIDTH = 4  # fingerprints per slot row (standard (2,4)-cuckoo)
MAX_KICKS = 500
_FP_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant (public)


def cuckoo_slots(expected_per_bucket: int, load: float = 0.84) -> int:
    """Power-of-two slot-row count for the expected bucket share."""
    need = max(SLOT_WIDTH, int(math.ceil(expected_per_bucket / load)))
    return 1 << max(2, (need // SLOT_WIDTH - 1).bit_length())


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the 64-bit key."""
    hu = h.astype(np.uint64)
    fp = ((hu >> np.uint64(48)) ^ (hu >> np.uint64(24))) & np.uint64(0xFFFF)
    return np.where(fp == 0, np.uint64(1), fp).astype(np.uint16)


def _slot_pair(h: np.ndarray, fp: np.ndarray, n_slots: int) -> tuple[np.ndarray, np.ndarray]:
    mask = np.uint64(n_slots - 1)
    i1 = h.astype(np.uint64) & mask
    fph = (fp.astype(np.uint64) * _FP_MIX) >> np.uint64(32)
    i2 = (i1 ^ fph) & mask
    return i1.astype(np.int64), i2.astype(np.int64)


def _insert_all(
    keys: np.ndarray, n_slots: int
) -> tuple[np.ndarray, np.ndarray]:
    """Insert sorted keys into a fresh (n_slots, SLOT_WIDTH) table.

    Returns (table, overflow_fps). Eviction victim rotates
    deterministically with the kick count, so the final bytes are a
    function of the sorted key sequence only.
    """
    table = np.zeros((n_slots, SLOT_WIDTH), dtype=np.uint16)
    overflow: list[int] = []
    fps = _fingerprint(keys)
    i1s, i2s = _slot_pair(keys, fps, n_slots)
    for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
        placed = False
        for idx in (i1, i2):
            row = table[idx]
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = fp
                placed = True
                break
        if placed:
            continue
        cur_fp, cur_idx = fp, i1
        for kick in range(MAX_KICKS):
            victim = kick % SLOT_WIDTH
            cur_fp, table[cur_idx, victim] = int(table[cur_idx, victim]), cur_fp
            # partner slot of the evicted fingerprint (XOR involution);
            # python-int math — numpy scalar uint64 multiply warns on wrap
            fph = ((cur_fp * int(_FP_MIX)) & 0xFFFFFFFFFFFFFFFF) >> 32
            cur_idx = (cur_idx ^ fph) & (n_slots - 1)
            row = table[cur_idx]
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = cur_fp
                placed = True
                break
        if not placed:
            overflow.append(int(cur_fp))
    return table, np.asarray(sorted(overflow), dtype=np.uint16)


def build_cuckoo(
    hashes: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
    expected_total: int | None = None,
) -> DataFrame:
    """hashes (one int64 key column) -> cuckoo bucket rows.

    One shuffle (repartition on bucket); each task builds its buckets'
    tables with numpy. Deterministic: keys are de-duplicated and sorted
    before insertion.
    """
    if expected_total is None:
        expected_total = hashes.count()
    n_slots = cuckoo_slots(int(expected_total / n_buckets) + 1)

    def _build(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, np.ndarray] = {}
        for pdf in pdf_iter:
            for bucket, grp in pdf.groupby("_bucket"):
                ks = grp[hash_col].to_numpy(dtype=np.int64)
                prev = acc.get(int(bucket))
                acc[int(bucket)] = ks if prev is None else np.concatenate([prev, ks])
        rows = []
        for b in sorted(acc):
            keys = np.unique(acc[b])  # sorted + deduped -> stable bytes
            table, overflow = _insert_all(keys, n_slots)
            rows.append(
                {
                    "bucket": b,
                    "table": table.tobytes(),
                    "overflow": overflow.tobytes(),
                    "n_items": len(keys),
                    "n_slots": n_slots,
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in CUCKOO_SCHEMA.fields])

    bucketed = hashes.withColumn(
        "_bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    ).repartition(n_buckets, "_bucket")
    return bucketed.mapInPandas(_build, schema=CUCKOO_SCHEMA)


def _contains(
    h: np.ndarray, table: np.ndarray, overflow: np.ndarray, n_slots: int
) -> np.ndarray:
    """Vectorized membership for keys ``h`` against one bucket table."""
    fp = _fingerprint(h)
    i1, i2 = _slot_pair(h, fp, n_slots)
    hit = (table[i1] == fp[:, None]).any(axis=1)
    hit |= (table[i2] == fp[:, None]).any(axis=1)
    if overflow.size:
        hit |= np.isin(fp, overflow)
    return hit


def probe_cuckoo(
    candidates: DataFrame,
    cuckoo: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
    result_col: str = "maybe_seen",
    via: str = "broadcast",
) -> DataFrame:
    """Adds ``maybe_seen``; same strategy split as seen.probe_bloom —
    ``broadcast`` collects+broadcasts the tables (sandbox scale),
    ``cogroup`` co-partitions candidates with their bucket row (scale
    path: no driver collection, one bucket table per task)."""
    if via == "cogroup":
        return _probe_cogroup(candidates, cuckoo, hash_col, n_buckets, result_col)
    spark = candidates.sparkSession
    buckets = {
        int(r["bucket"]): (
            np.frombuffer(r["table"], dtype=np.uint16).reshape(-1, SLOT_WIDTH),
            np.frombuffer(r["overflow"], dtype=np.uint16),
            int(r["n_slots"]),
        )
        for r in cuckoo.collect()
    }
    bc = spark.sparkContext.broadcast(buckets)

    def _probe(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bkts = bc.value
        for pdf in pdf_iter:
            pdf = pdf.reset_index(drop=True)
            res = np.zeros(len(pdf), dtype=bool)
            h_all = pdf[hash_col].to_numpy(dtype=np.int64)
            bucket_ids = ((h_all % n_buckets) + n_buckets) % n_buckets
            for b in np.unique(bucket_ids):
                ent = bkts.get(int(b))
                if ent is None:
                    continue
                table, overflow, n_slots = ent
                sel = np.flatnonzero(bucket_ids == b)
                res[sel] = _contains(h_all[sel], table, overflow, n_slots)
            pdf[result_col] = res
            yield pdf

    out_schema = StructType(
        list(candidates.schema.fields)
        + [StructField(result_col, BooleanType(), False)]
    )
    return candidates.mapInPandas(_probe, schema=out_schema)


def _probe_cogroup(
    candidates: DataFrame,
    cuckoo: DataFrame,
    hash_col: str,
    n_buckets: int,
    result_col: str,
) -> DataFrame:
    cand = candidates.withColumn(
        "_bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )
    out_fields = list(candidates.schema.fields) + [
        StructField(result_col, BooleanType(), False)
    ]
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def _probe(cand_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
        cand_pdf = cand_pdf.reset_index(drop=True)
        if filt_pdf.empty:
            cand_pdf[result_col] = False
        else:
            row = filt_pdf.iloc[0]
            table = np.frombuffer(row["table"], dtype=np.uint16).reshape(
                -1, SLOT_WIDTH
            )
            overflow = np.frombuffer(row["overflow"], dtype=np.uint16)
            h = cand_pdf[hash_col].to_numpy(dtype=np.int64)
            cand_pdf[result_col] = _contains(h, table, overflow, int(row["n_slots"]))
        return cand_pdf[out_cols]

    return (
        cand.groupBy("_bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(_probe, schema=out_schema)
    )


def delete_cuckoo(
    cuckoo: DataFrame,
    deletions: DataFrame,
    hash_col: str = "url_hash",
    n_buckets: int = 64,
    inserted_keys: DataFrame | None = None,
) -> DataFrame:
    """Remove one fingerprint occurrence per deleted key (the operation
    a bloom cannot do). Bucket-co-partitioned like the cogroup probe;
    buckets with no deletions pass through untouched.

    Caveat (inherent to cuckoo filters — they store fingerprints, not
    keys): deleting a key that was never inserted, or the same key in
    two successive calls, strips a COLLIDING key's fingerprint and
    breaks the no-false-negative contract. Pass ``inserted_keys`` (the
    authoritative key table the filter was built from, e.g. the
    frontier — updated by the caller as keys are removed) and the
    deletion batch is semi-joined against it first, making unknown and
    repeated deletions no-ops instead of silent corruption. The
    semi-join's big side is the deletion batch, key side prunes by the
    same bucket column downstream."""
    if inserted_keys is not None:
        deletions = deletions.join(
            inserted_keys.select(hash_col).distinct(), hash_col, "left_semi"
        )
    dels = deletions.withColumn(
        "_bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int")
    )

    def _delete(filt_pdf: pd.DataFrame, del_pdf: pd.DataFrame) -> pd.DataFrame:
        if filt_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in CUCKOO_SCHEMA.fields])
        row = filt_pdf.iloc[0]
        if del_pdf.empty:
            return filt_pdf[[f.name for f in CUCKOO_SCHEMA.fields]]
        n_slots = int(row["n_slots"])
        table = (
            np.frombuffer(row["table"], dtype=np.uint16)
            .reshape(-1, SLOT_WIDTH)
            .copy()
        )
        overflow = list(np.frombuffer(row["overflow"], dtype=np.uint16))
        removed = 0
        keys = np.unique(del_pdf[hash_col].to_numpy(dtype=np.int64))
        fps = _fingerprint(keys)
        i1s, i2s = _slot_pair(keys, fps, n_slots)
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            done = False
            for idx in (i1, i2):
                match = np.flatnonzero(table[idx] == fp)
                if match.size:
                    table[idx, match[0]] = 0
                    removed += 1
                    done = True
                    break
            if not done and fp in overflow:
                overflow.remove(fp)
                removed += 1
        return pd.DataFrame(
            [
                {
                    "bucket": int(row["bucket"]),
                    "table": table.tobytes(),
                    "overflow": np.asarray(sorted(overflow), dtype=np.uint16).tobytes(),
                    "n_items": int(row["n_items"]) - removed,
                    "n_slots": n_slots,
                }
            ]
        )

    return (
        cuckoo.groupBy("bucket")
        .cogroup(dels.groupBy("_bucket"))
        .applyInPandas(_delete, schema=CUCKOO_SCHEMA)
    )


def choose_seen_backend(need_delete: bool) -> str:
    """Policy: the bloom is smaller and faster to OR-merge, so it is
    the default; any deletion requirement (sidecar cleanup semantics)
    forces the cuckoo filter."""
    return "cuckoo" if need_delete else "bloom"
