"""Dedup + similarity operators on planted cases (complementing the
value-level oracle checks in tools/check_correctness.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pygeodatacrawler_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from pygeodatacrawler_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dupes,
    lsh_topk,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "spark shuffles partitions across the cluster during wide joins"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "completely different content about metadata catalogs and harvest"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dedup_exact_keeps_min_id(spark):
    out = dedup_exact(_docs(spark), "text", "doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2, 3, 5}  # 4 dropped (exact dup of 1, higher id)


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            _docs(spark), "doc_id", "text", k=8, bands=8
        ).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs  # near-dup shares most shingles
    assert (3, 5) not in pairs


def test_ngram_jaccard_scores(spark):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            _docs(spark), "doc_id", "text", shingle_n=3, threshold=0.5
        ).collect()
    }
    assert out[(1, 4)] == 1.0
    assert 0.5 <= out[(1, 2)] < 1.0
    assert (3, 5) not in out


def test_lsh_verify_composition_matches_exact_on_candidates(spark):
    """The default near-dup path (LSH candidates -> ngram_jaccard_verify)
    returns exactly the exact-standalone scores restricted to candidate
    pairs — verify introduces no score drift."""
    from pygeodatacrawler_spark.operators.dedup import ngram_jaccard_verify

    d = _docs(spark)
    cand = minhash_lsh_pairs(d, "doc_id", "text", k=8, bands=8)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_verify(
            d, cand, "doc_id", "text", shingle_n=3, threshold=0.5
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            d, "doc_id", "text", shingle_n=3, threshold=0.5
        ).collect()
    }
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert got == {p: j for p, j in exact.items() if p in cand_set}
    assert got[(1, 4)] == 1.0 and (1, 2) in got


def test_simhash_identical_docs_equal(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_buckets(
        _docs(spark), "doc_id", "text").collect()}
    assert sigs[1] == sigs[4]
    assert bin(sigs[1] ^ sigs[2]).count("1") <= 6  # near-dup: small hamming
    assert sigs[1] != sigs[3]


def test_simhash64_block_banding(spark):
    """64-bit signatures with hamming<=3 block banding: exact dups at
    hamming 0; the banding path finds every pair the exact filter
    admits (pigeonhole guarantees no candidate is missed)."""
    from pygeodatacrawler_spark.operators.dedup import simhash64, simhash_near_pairs

    d = _docs(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash64(d, "doc_id", "text").collect()}
    assert sigs[1] == sigs[4]  # identical docs, identical 64-bit sig
    assert sigs[1] != sigs[3]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(d, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs[(1, 4)] == 0
    assert (3, 5) not in pairs
    # completeness vs brute force: every pair within the hamming budget
    # must be found by the banding (no all-pairs join ran to find them)
    import itertools

    brute = {
        (a, b): bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
    }
    want = {p: h for p, h in brute.items() if h <= 3}
    assert pairs == want
    # recall sanity vs the MinHash LSH pairs on the same fixture: the
    # exact dup collides under both schemes
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(d, "doc_id", "text", k=8, bands=8).collect()
    }
    assert (1, 4) in mh and (1, 4) in pairs


def _vectors(spark):
    rows = []
    for i in range(20):
        base = [(1.0 if (i + d) % 7 == 0 else 0.1 * ((i * d) % 5)) for d in range(8)]
        rows.append((i, base))
    rows.append((100, rows[0][1]))  # exact embedding dup of vec 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_self_excluded(spark):
    vecs = _vectors(spark)
    out = brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=3)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["query_id"] for r in rows] == [0, 0, 0]
    assert rows[0]["neighbor_id"] == 100 and rows[0]["cos_sim"] == 1.0
    assert all(r["neighbor_id"] != 0 for r in rows)


def test_embedding_near_dupes_finds_planted(spark):
    vecs = _vectors(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_near_dupes(
            vecs, threshold=0.999, n_planes=3, n_dims=8
        ).collect()
    }
    assert (0, 100) in pairs and pairs[(0, 100)] == 1.0


def test_lsh_topk_approximates(spark):
    vecs = _vectors(spark)
    out = lsh_topk(
        vecs, vecs.filter(F.col("vec_id") == 0), k=3, n_planes=2, n_dims=8
    ).collect()
    # the planted exact dup shares every LSH bucket with its twin
    assert any(r["neighbor_id"] == 100 and r["cos_sim"] == 1.0 for r in out)


def test_lsh_topk_multiprobe_recovers_boundary_neighbors(spark):
    # multi-probe (Hamming-1) must find at least everything the exact-
    # bucket probe finds, and converge toward brute force on this corpus
    vecs = _vectors(spark)
    q = vecs.filter(F.col("vec_id") == 0)
    exact_bucket = {
        r["neighbor_id"]
        for r in lsh_topk(vecs, q, k=5, n_planes=3, n_dims=8, n_probes=0).collect()
    }
    probed = {
        r["neighbor_id"]
        for r in lsh_topk(vecs, q, k=5, n_planes=3, n_dims=8, n_probes=1).collect()
    }
    brute = {
        r["neighbor_id"] for r in brute_force_topk(vecs, q, k=5).collect()
    }
    # any true-top-5 neighbor the exact probe found survives multi-probe
    # (extra candidates can only displace it with other true-top-5s)
    assert (exact_bucket & brute) <= (probed & brute)
    assert len(probed & brute) >= len(exact_bucket & brute)
    assert 100 in probed  # planted twin always recovered


def test_lsh_recall_derived_planes(spark):
    # Scale-tuned ANN defaults: 512 vectors in 64 tight clusters of 8.
    # Recall of the exact top-5 must stay >=0.9 both with the derived
    # plane count and at 16 planes with Hamming-2 multi-probe (the
    # production setting for large corpora).
    import numpy as np

    from pygeodatacrawler_spark.operators.similarity import derive_n_planes

    assert derive_n_planes(100) == 4          # floor
    assert derive_n_planes(512) == 4
    assert derive_n_planes(1_000_000) == 12
    assert derive_n_planes(10**9) == 22
    assert derive_n_planes(10**12) == 24      # cap

    rng = np.random.RandomState(7)
    centers = rng.randn(64, 64)
    rows, vid = [], 0
    for c in centers:
        for _ in range(8):
            v = c + 0.06 * rng.randn(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = vecs.filter(F.col("vec_id") % 8 == 0)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    assert len(truth) == 64 * 5

    got_derived = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            vecs, queries, k=5, n_vectors=512, n_probes=1
        ).collect()
    }
    assert len(truth & got_derived) / len(truth) >= 0.9

    got16 = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            vecs, queries, k=5, n_planes=16, n_probes=2
        ).collect()
    }
    assert len(truth & got16) / len(truth) >= 0.9

    # near-dup pairs at the derived setting recover the clusters
    pairs = embedding_near_dupes(
        vecs, threshold=0.9, n_vectors=512, n_probes=1
    ).collect()
    same = sum(1 for r in pairs if r["id_a"] // 8 == r["id_b"] // 8)
    assert same / (64 * 28) >= 0.9  # 28 in-cluster pairs per cluster
    assert all(r["id_a"] // 8 == r["id_b"] // 8 for r in pairs)


def test_portable_hll_accuracy(spark):
    # the value-oracled HLL (entry_queries.q_hll_distinct) must also be
    # a decent estimator: m=512 registers -> ~4.6% standard error
    import __spark_entry__ as e

    est = {
        r["event_type"]: r["hll_users"]
        for r in e.queries()["hll_distinct"](spark, "/root/testdata/sf0.01").collect()
    }
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.15, (k, est[k], n)


def test_ivf_topk_recall(spark):
    # IVF coarse-quantizer ANN (the task's named alternative to LSH):
    # train k-means centroids once, probe nprobe buckets per query;
    # recall >=0.9 vs brute force on the clustered fixture
    import numpy as np

    from pygeodatacrawler_spark.operators.similarity import (
        ivf_topk,
        ivf_train_centroids,
    )

    rng = np.random.RandomState(11)
    centers = rng.randn(24, 32)
    rows, vid = [], 0
    for c in centers:
        for _ in range(8):
            v = c + 0.08 * rng.randn(32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = vecs.filter(F.col("vec_id") % 8 == 0)

    cents = ivf_train_centroids(vecs, k=12, seed=7)
    assert len(cents) == 12 and len(cents[0]) == 32

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(vecs, queries, cents, k=5, nprobe=2).collect()
    }
    assert len(truth & got) / len(truth) >= 0.9


def test_gram_udf_matches_column_chain(spark):
    # the Arrow gram builder inside ngram_jaccard_verify must equal the
    # tokens -> ngrams_from_tokens -> array_distinct Column chain on
    # every edge: empty, 1-token, unicode whitespace, repeats, null
    from pygeodatacrawler_spark.functions.quality import (
        ngrams_from_tokens,
        tokens,
    )
    from pygeodatacrawler_spark.operators.dedup import ngram_jaccard_verify

    rows = [
        (0, "a b c a b c a b"),
        (1, "single"),
        (2, ""),
        (3, "   "),
        (4, "tab\tsep\nnewline nbsp emsp end"),
        (5, None),
        (6, "x " * 500),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 3):
        want = {
            r["doc_id"]: r["g"]
            for r in df.select(
                "doc_id",
                F.array_distinct(
                    ngrams_from_tokens(tokens(F.col("text")), n)
                ).alias("g"),
            ).collect()
        }
        cand = spark.createDataFrame(
            [(i, j) for i in range(7) for j in range(i + 1, 7)],
            "id_a long, id_b long",
        )
        out = ngram_jaccard_verify(
            df, cand, "doc_id", "text", shingle_n=n, threshold=0.0
        )
        # equality checked through the operator's own join: jaccard of
        # (i, j) from the UDF grams must equal jaccard from the chain
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
        import itertools

        for i, j in itertools.combinations(range(7), 2):
            gi, gj = want[i], want[j]
            if gi is None or gj is None:
                assert (i, j) not in got
                continue
            inter = len(set(gi) & set(gj))
            union = len(gi) + len(gj) - inter
            expect = round(inter / union, 4) if union else None
            if expect is None:
                assert (i, j) not in got or got[(i, j)] is None
            else:
                assert got.get((i, j)) == expect, (i, j, got.get((i, j)), expect)


def _uf_components(edges):
    """Reference union-find: node -> min member of its component."""
    nodes = sorted({x for e in edges for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comps = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in comps.values() for n in ms}


def test_connected_components_vs_union_find(spark):
    """Large-star/small-star fixpoint == union-find on chains (multi-
    round convergence), shuffled paths, and a random multigraph."""
    import random

    from pygeodatacrawler_spark.operators.dedup import connected_components

    rng = random.Random(7)
    perm = list(range(100, 160))
    rng.shuffle(perm)
    cases = [
        [(1, 2), (2, 3), (4, 5)],
        [(i, i + 1) for i in range(1, 40)],          # path: O(log n) rounds
        [(perm[i], perm[i + 1]) for i in range(58)],  # shuffled labels
        [(rng.randrange(300), rng.randrange(300)) for _ in range(150)],
    ]
    for edges in cases:
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "u long, v long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == _uf_components(edges)


def test_dedup_clusters_transitive_canonical(spark):
    """A~B and B~C must land in ONE cluster with the min id canonical
    even when A and C never collide directly; unrelated docs are their
    own singleton clusters."""
    from pygeodatacrawler_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [
        (1, base * 4),
        (2, base * 4 + "tail one extra words here"),
        (3, base * 4 + "tail one extra words here plus more drift tokens"),
        (4, "completely different content about spark shuffles " * 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup_clusters(df, "doc_id", "text", k=8, bands=8).collect()
    }
    assert len(out) == 4
    # 1,2,3 chain into one cluster rooted at 1; 4 is its own
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[4] == (4, True)


def test_repetition_signals(spark):
    """Gopher repetition rules: duplicate-line fraction and top-bigram
    run count, on handcrafted docs with known values."""
    import pyspark.sql.functions as F

    from pygeodatacrawler_spark.functions.quality import (
        dup_line_fraction,
        tokens,
        top_ngram_count_from_tokens,
    )

    rows = [
        # 4 non-empty lines, 2 distinct -> dup frac 0.5
        (1, "spam line\nspam line\nother\n\n  spam line  \nother"),
        # "a b" bigram occurs 3x ("a b a b a b": bigrams ab,ba,ab,ba,ab)
        (2, "a b a b a b"),
        (3, ""),          # empty -> 0 / 0
        (4, "single"),    # one token -> no bigram -> 0
    ]
    # row 1 lines: [spam line, spam line, other, spam line, other] ->
    # 5 non-empty, 2 distinct -> 1 - 2/5 = 0.6
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["dlf"], r["top2"])
        for r in df.select(
            "doc_id",
            F.round(dup_line_fraction(F.col("text")), 4).alias("dlf"),
            top_ngram_count_from_tokens(
                tokens(F.col("text")), 2
            ).alias("top2"),
        ).collect()
    }
    assert out[1][0] == 0.6
    assert out[2] == (0.0, 3)
    assert out[3] == (0.0, 0)
    assert out[4] == (0.0, 0)
