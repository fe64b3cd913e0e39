"""Measurement-only scale-factor generator (round 6).

The driver's round-end bench may run at a larger, driver-generated
scale factor (BENCH_r05.json: sf=1.0) but only sf0.001/0.01/0.1 ship
in /root/testdata (read-only). This script builds a statistically
similar corpus at an arbitrary sf for LOCAL optimization measurement:
same schemas, same key cardinalities and join fan-outs (rows scale
linearly with sf off the sf0.1 profile), same value/date ranges, same
document vocabulary (31 words, 10-100 tokens/doc, ~0.16% exact-dup
pairs), unit-norm random 64-d embeddings, and — critically — the same
file layout the driver uses: ONE parquet file with ONE row group per
table (pyarrow, row_group_size=n), which is what makes scans
single-task and is exactly the input-skew condition the engine must
handle (guide §2.5/§6).

It is NOT the driver's generator (seed/value streams differ), so
numbers measured on it are for before/after deltas, not absolute
driver parity. It writes inputs only — no query results, nothing the
engine reads at bench time unless $SPARK_GRAFT_SF_DIR points at it.

Usage: python tools/gen_sf.py 1.0 /root/sfgen/sf1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [f"NATION{i:02d}" for i in range(25)]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "green", "small", "cold", "dark"]
PNOUN = ["ring", "bolt", "screw", "nut", "washer", "pin", "clip", "rod"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
LANGS = ["en", "fr", "de", "es", "zh"]
LANG_P = [0.412, 0.147, 0.147, 0.147, 0.147]

DAY_NS = 86_400_000_000_000


def write1(path: str, table: pa.Table) -> None:
    # pyarrow DEFAULT row-group size (1Mi rows), matching the driver's
    # generator: every sf0.1 table lands in ONE row group (observed in
    # /root/testdata — single-task scans), while at sf1.0 lineitem
    # gets ~6 groups and orders 2, so scan parallelism is poor but not
    # strictly serial. (An earlier revision forced one row group per
    # table, which was overly pessimistic for the big tables.)
    pq.write_table(table, path)


def ts_days(rng, n, start_ns, n_days):
    return (start_ns + rng.integers(0, n_days, n) * DAY_NS).astype(
        "datetime64[ns]"
    ).astype("datetime64[us]")


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    s = lambda n: int(round(n * sf / 0.1))  # rows off the sf0.1 profile

    n_cust, n_supp, n_part = s(15000), s(1000), s(20000)
    n_ord, n_li = s(150000), s(600000)
    n_ev, n_doc, n_emb = s(100000), s(5000), s(2000)
    n_users = s(1500)

    write1(f"{out}/region.parquet", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write1(f"{out}/nation.parquet", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    write1(f"{out}/customer.parquet", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))
    write1(f"{out}/supplier.parquet", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    write1(f"{out}/part.parquet", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    start95 = np.datetime64("1995-01-01").astype("datetime64[ns]").astype(np.int64)
    odate = ts_days(rng, n_ord, start95, 2405)
    write1(f"{out}/orders.parquet", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [("F", "O", "P")[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }))

    lo = rng.integers(0, n_ord, n_li)
    ship = odate.astype(np.int64)[lo] + rng.integers(1, 95, n_li) * DAY_NS
    write1(f"{out}/lineitem.parquet", pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("F", "O")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": ship.astype("datetime64[ns]").astype("datetime64[us]"),
    }))

    start24 = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    ev_ts = start24 + rng.integers(0, 30 * DAY_NS, n_ev)
    write1(f"{out}/events.parquet", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": ev_ts.astype("datetime64[ns]").astype("datetime64[us]"),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(np.minimum(rng.exponential(50, n_ev), 600), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    ntok = rng.integers(10, 101, n_doc)
    words = np.array(VOCAB)
    texts = [
        " ".join(words[rng.integers(0, len(words), k)]) for k in ntok
    ]
    # exact-dup pairs at the sf0.1 rate (8 pairs / 5000 docs)
    for _ in range(max(1, int(round(n_doc * 8 / 5000)))):
        a, b = rng.integers(0, n_doc, 2)
        texts[b] = texts[a]
    write1(f"{out}/documents.parquet", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write1(f"{out}/embeddings.parquet", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))
    print(f"wrote sf={sf} to {out}: lineitem={n_li} docs={n_doc}")


if __name__ == "__main__":
    main()
