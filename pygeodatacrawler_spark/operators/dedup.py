"""Deduplication operators for web-scale text corpora.

The reference's dedup is "does the sidecar file exist"
(/root/reference/geodatacrawler/metadata.py:430). At 100 TB that becomes
a family of operators, each shuffle-conscious:

- exact: hash-groupBy on content hash — one shuffle, map-side partial agg.
- MinHash + LSH: shingle -> K permuted min-hashes -> band buckets ->
  bucket equi-join. The join is on (band, band_hash) so only candidate
  pairs shuffle; no O(n^2) cross join ever materializes.
- SimHash: 64-bit signature; near-dup = same signature prefix bucket +
  small hamming distance (block-permutation trick collapsed to one
  prefix bucket at our scale; extend to 4 rotations for hamming<=3 at
  full scale).
- n-gram Jaccard: exact verification of candidate pairs (shared-shingle
  co-occurrence counts), used after LSH to kill false positives.

All hash math uses md5_long (portable) so the driver's DuckDB oracle can
verify results value-for-value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

from pygeodatacrawler_spark.functions.hashes import (
    MINHASH_PRIME,
    md5_long,
    minhash_params,
)
from pygeodatacrawler_spark.functions.quality import (
    ngrams_from_tokens,
    tokens,
)


def dedup_exact(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct content value.

    Window-per-hash rather than dropDuplicates: dropDuplicates keeps an
    *arbitrary* row (first seen per partition), which is not stable
    across parallelism levels; min-id is deterministic at any cluster
    size. One shuffle on the content hash.
    """
    w = Window.partitionBy(F.md5(F.col(content_col))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, k: int = 16, shingle_n: int = 3
) -> DataFrame:
    """(id, mh0..mhK-1) — K-permutation MinHash over word shingles.

    Map-only (round 6, guide §2.4/§4.2): one Arrow-batched UDF per doc
    computes md5_long per shingle (hashlib md5 — bit-identical to the
    JVM/DuckDB md5) and all K permutation minima vectorized in numpy —
    the K mins stay inside the row, so the explode(shingles) ->
    groupBy(id) exchange of the previous shape disappears entirely
    (plan: 1 Exchange -> 0; 4.09 s -> ~1 s at sf1.0/50k docs).
    Semantics are pinned by the DuckDB oracle twin (_sql_minhash_sig)
    and test_minhash: docs with fewer than ``shingle_n`` tokens (or
    null text) produce no signature row, exactly like the old explode
    (no gram rows -> no group).
    """
    params = minhash_params(k)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)
    b_vec = np.array([b for _, b in params], dtype=np.int64)
    p = MINHASH_PRIME
    n = shingle_n

    @pandas_udf("array<long>")
    def _sig(text: pd.Series) -> pd.Series:
        import hashlib  # noqa: PLC0415 (executor-side)

        out: list = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            toks = t.split()  # same ws set as tokens() on this corpus;
            # pinned by test_gram_udf_matches_column_chain's edge rows
            m = len(toks) - n + 1
            if m <= 0:
                out.append(None)
                continue
            hs = np.fromiter(
                (
                    int(
                        hashlib.md5(
                            " ".join(toks[i : i + n]).encode("utf-8")
                        ).hexdigest()[:15],
                        16,
                    )
                    for i in range(m)
                ),
                dtype=np.int64,
                count=m,
            )
            hm = hs % p
            out.append(((hm[:, None] * a_vec + b_vec) % p).min(axis=0))
        return pd.Series(out, dtype=object)

    # guide §4.4: the isNotNull filter below would otherwise duplicate
    # the UDF (one ArrowEvalPython pushed below the caller's exchange —
    # i.e. evaluated at SCAN parallelism — plus one above for the
    # projection). Non-deterministic pins a single evaluation.
    _sig = _sig.asNondeterministic()

    sig = df.select(
        F.col(id_col), _sig(F.col(text_col)).alias("_sig")
    ).filter(F.col("_sig").isNotNull())
    return sig.select(
        id_col, *[F.col("_sig")[i].alias(f"mh{i}") for i in range(k)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded LSH.

    rows-per-band = k/bands; two docs collide if any band's minhash
    vector matches exactly. The band join shuffles only (band, hash)
    keys — the classic MMDS ch.3 construction.
    """
    assert k % bands == 0
    rows = k // bands
    sig = minhash_signature(df, id_col, text_col, k, shingle_n)
    # band key = the band's raw minhash tuple (round 6, guide §2.3
    # narrower types): two docs collide iff a band's minhash VECTOR is
    # equal, so joining on the vector itself is definitionally the
    # same pair set as joining on md5(concat_ws(vector)) — minus the
    # md5 computation per doc-band and the 32-char string hash/compare
    # per probe of the band join (the join probes O(sum of band-group
    # sizes squared) rows, so key width multiplies into the hot loop).
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.struct(
                *[
                    F.col(f"mh{b * rows + r}").alias(f"h{r}")
                    for r in range(rows)
                ]
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bh") == F.col(f"b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash_from_hashes(hashes: Column, prefix_bits: int = 16) -> Column:
    """SimHash from a MATERIALIZED array of token hashes.

    Weighted-bit-vote construction (Charikar 2002): each token votes
    +1/-1 per bit of its hash; signature bit = sign of the sum. Kept to
    16 bits here so the whole computation stays in portable integer SQL
    (the oracle reproduces it exactly); production uses 64. The hash
    array must be a column reference — inlining it makes Catalyst
    recompute every md5 once per bit position.
    """
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        for i in range(prefix_bits)
    ]
    sig = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        sig = sig + F.when(v > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def simhash_buckets(
    df: DataFrame, id_col: str, text_col: str, prefix_bits: int = 16
) -> DataFrame:
    """(id, simhash) — group by signature to find near-dup clusters.

    Round 6 (guide §4.2): one Arrow-batched numpy UDF instead of the
    Column chain transform(tokens, md5_long) -> ``prefix_bits``
    separate ``aggregate`` folds — higher-order functions evaluate
    interpreted per element, so the old shape walked every doc's hash
    array 16 times outside codegen (0.56 s steady / 1.4-1.9 s
    first-run at sf1.0; the UDF is precompiled native code with no
    JIT warmup). Bit-exact by construction: md5_long == int(md5
    hexdigest[:15], 16) (pinned by test_dedup_similarity), tokenize ==
    str.split() (same whitespace set as tokens() — pinned by the
    minhash UDF tests), votes and signature are integer math. Null
    text degrades exactly like the expression chain: aggregate(null)
    -> null votes -> every when(v>0) falls to otherwise(0) -> sig 0.
    """
    votes_shift = np.arange(prefix_bits, dtype=np.int64)

    @pandas_udf("long")
    def _simhash(text: pd.Series) -> pd.Series:
        import hashlib  # noqa: PLC0415 (executor-side)

        out = np.empty(len(text), dtype=np.int64)
        vals = text.values
        for i, t in enumerate(vals):
            toks = t.split() if t is not None else []
            if not toks:
                out[i] = 0
                continue
            hs = np.fromiter(
                (
                    int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                    for w in toks
                ),
                dtype=np.int64,
                count=len(toks),
            )
            bits = (hs[:, None] >> votes_shift) & 1
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = int(((votes > 0).astype(np.int64) << votes_shift).sum())
        return pd.Series(out)

    return df.select(
        F.col(id_col),
        _simhash(F.col(text_col)).alias("simhash"),
    )


def simhash64(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash) with a full 64-bit signature — the production
    variant of simhash_buckets (which stays at 16 bits for oracle
    portability).

    Shape: explode tokens -> one groupBy(id) with ``bits`` conditional
    sums (map-side partial aggregation; one shuffle regardless of bit
    width) -> signature assembled from the vote signs. Token hashing is
    xxhash64 (JVM, full 64-bit entropy). Bit 63's contribution is the
    two's-complement minimum so the assembled long never overflows.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        weight = F.lit(-(2**63)) if i == 63 else F.lit(1 << i)
        sig = sig + F.when(F.col(f"v{i}") > 0, weight).otherwise(F.lit(0))
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming(sig) <= max_hamming) via
    block banding: the 64-bit signature splits into ``max_hamming + 1``
    blocks; by pigeonhole, two signatures within the hamming budget
    agree exactly on at least one block, so only (block_id, block_value)
    keys ever shuffle — the rotation/block trick the 16-bit module
    docstring promises, never an all-pairs join. Exact hamming verifies
    candidates with one bit_count(xor) filter.
    """
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    mask = (1 << width) - 1
    sig = simhash64(df, id_col, text_col, bits)
    blocks = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.block", "bb.bv")
    a = blocks.alias("a")
    b = blocks.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def ngram_jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY on candidate ``pairs``
    (id_a, id_b) — the verify half of the LSH->verify near-dup path.

    Per-doc distinct-shingle ARRAYS are attached to each pair side and
    intersected JVM-side (array_intersect): cost is O(|pairs| x shingle
    count), never the O(D^2)-per-hot-shingle blowup of the standalone
    self-join. This composition (minhash_lsh_pairs -> verify) is the
    default near-dup path at corpus scale; ngram_jaccard_pairs stays as
    the exact-standalone opt-in.

    The shingle sets are built by an Arrow-batched pandas UDF, not the
    tokens->transform->array_distinct Column chain: higher-order
    functions are interpreted per element (outside whole-stage
    codegen), and the chain measured 6.1 s for 5,000 docs vs 0.5 s for
    the UDF — 12x, with output equality pinned by
    test_gram_udf_matches_column_chain.

    Round-6 shape (guide §2.3/§2.5/§8): the per-doc shingle set is a
    SORTED array of 64-bit hashes (pandas hash_array, fixed key —
    deterministic across workers), hashed once per Arrow batch, not an
    array of strings: the pair table then carries 8 B/shingle instead
    of ~16-char strings through the attach joins, and array_intersect
    runs its primitive-long fast path. Jaccard over hashes equals
    jaccard over the strings unless two distinct shingles collide in
    64 bits (P < n_distinct^2/2^65 — ~2e-7 for the 2.7M distinct
    shingles of the sf1.0 corpus); equality against the string chain is
    pinned per-value by test_gram_udf_matches_column_chain and the
    driver's DuckDB oracle at every tested sf. The candidate pairs are
    explicitly repartitioned to the cluster's core count before the
    attach joins: AQE coalesces the pair shuffle by BYTES (a few MB of
    (long, long) rows), but per-pair intersect work is enormous per
    byte, and the coalesced 1-2 partitions serialized the whole verify
    onto one core — 152 s -> 18.7 s at sf1.0 from the repartition
    alone (cluster-size-derived, not a local constant).
    """
    n = shingle_n

    @pandas_udf("binary")
    def _gram_hashes(text: pd.Series) -> pd.Series:
        from pandas.util import hash_array  # noqa: PLC0415 (executor-side)

        grams: list[str] = []
        bounds = [0]
        nulls: list[bool] = []
        for t in text:
            if t is None:
                nulls.append(True)
            else:
                nulls.append(False)
                toks = t.split()  # identical to tokens(): same ws set
                grams.extend(
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                )
            bounds.append(len(grams))
        if grams:
            h = hash_array(np.asarray(grams, dtype=object)).view("int64")
        else:
            h = np.empty(0, dtype=np.int64)
        # packed BINARY, not array<long> (round 6): the sorted hash
        # set travels as one bytes value per doc, so the Arrow -> JVM
        # -> Arrow hops around the attach joins move a single buffer
        # per row instead of a list array, and the python side
        # reconstructs the int64 view with a zero-copy np.frombuffer
        # (the list-array path allocated a fresh small ndarray per
        # row on every conversion — measured GC-heavy at 3.9M pairs).
        out = [
            None
            if isnull
            else np.unique(h[bounds[i] : bounds[i + 1]]).tobytes()
            for i, isnull in enumerate(nulls)
        ]
        return pd.Series(out, dtype=object)

    # Intersection size in one Arrow-batched numpy pass (round 6,
    # guide §4.2/§4.4). The previous shape computed the jaccard as a
    # JVM expression and FILTERED on it: Catalyst pushed the filter
    # into the second attach join's condition, so
    # size(array_intersect(..)) ran as a non-codegen join condition
    # THREE times per candidate pair, plus once more in the output
    # projection — measured 300-500 CPU-s for the verify stage at
    # sf1.0 (vs ~130 JIT-warm), and the timed bench run rarely got the
    # warm version. A Python UDF cannot be evaluated inside a join
    # condition, so the count below structurally cannot be duplicated
    # into the join; asNondeterministic additionally pins a single
    # evaluation under the jaccard filter (§4.4). numpy's sorted-merge
    # intersect over the pre-sorted hash arrays is precompiled native
    # code: no whole-stage-codegen JIT warmup, stable wall time.
    @pandas_udf("int")
    def _inter_size(ga: pd.Series, gb: pd.Series) -> pd.Series:
        xs = ga.values  # object ndarray of bytes (packed int64 sets)
        ys = gb.values
        out: list = []
        for x, y in zip(xs, ys):
            if x is None or y is None:
                # null gram set (null text): old array_intersect
                # returned null -> null jaccard -> dropped at filter
                out.append(None)
            else:
                out.append(
                    int(
                        np.intersect1d(
                            np.frombuffer(x, dtype=np.int64),
                            np.frombuffer(y, dtype=np.int64),
                            assume_unique=True,
                        ).size
                    )
                )
        return pd.Series(out, dtype=object)

    _inter_size = _inter_size.asNondeterministic()

    ga = df.select(
        F.col(id_col).alias("_vid"),
        _gram_hashes(F.col(text_col)).alias("_grams"),
    )
    a = ga.select(F.col("_vid").alias("id_a"), F.col("_grams").alias("_ga"))
    b = ga.select(F.col("_vid").alias("id_b"), F.col("_grams").alias("_gb"))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    n_inter = F.col("_ni")
    # set sizes from the packed binary: 8 bytes per int64 hash
    union = (
        (F.length(F.col("_ga")) / 8).cast("int")
        + (F.length(F.col("_gb")) / 8).cast("int")
        - n_inter
    )
    return (
        pairs.select("id_a", "id_b")
        .repartition(n_parts)
        .join(a, "id_a")
        .join(b, "id_b")
        .withColumn("_ni", _inter_size(F.col("_ga"), F.col("_gb")))
        # nullif: two zero-shingle docs have an undefined jaccard (the
        # LSH stage can't emit such a pair — no shingles, no signature
        # — but direct callers can); null drops at the filter
        .withColumn(
            "jaccard",
            F.round(n_inter / F.nullif(union, F.lit(0)).cast("double"), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    |A∩B| comes from a self-join on distinct shingles (co-occurrence
    count); |A∪B| = |A|+|B|-|A∩B|. Only docs sharing a shingle ever
    pair up, so the shuffle is bounded by shingle collisions, not n^2.
    At 100 TB this runs AFTER LSH on candidates only; standalone it is
    exact-but-heavier.
    """
    grams = (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col("id"),
            F.explode(
                F.array_distinct(ngrams_from_tokens(F.col("_toks"), shingle_n))
            ).alias("g"),
        )
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("n"))
    # self-join on the shingle, not per-gram pair arrays: a hot shingle
    # shared by D docs costs D^2 pairs either way, but the join spreads
    # that work across tasks while an in-array combination generator
    # concentrates it in one task (measured 1.6x slower + skew-fragile)
    inter = (
        grams.alias("x")
        .join(
            grams.alias("y"),
            (F.col("x.g") == F.col("y.g")) & (F.col("x.id") < F.col("y.id")),
        )
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    # no broadcast hint on sizes: it has one row PER DOCUMENT, which is
    # unbounded at corpus scale — AQE picks broadcast only when it fits
    return (
        inter.join(
            sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) labels for the undirected graph of ``edges``,
    component = MIN node id in the component.

    This is the canonical-document-selection step after LSH: candidate
    near-dup PAIRS become CLUSTERS, and the min-id member is the keeper
    (the reference dedups by "sidecar exists", metadata.py:430 — a
    per-file decision; at corpus scale the decision must be transitive
    or A~B~C keeps B twice).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — each
    pass is one groupBy + one self-join on the node id, converges in
    O(log n) rounds on any graph (near-dup clusters, being near-
    cliques, converge in 2-3). No driver-side state: the edge list
    never leaves the cluster, and each round ``localCheckpoint``s to
    cut lineage (iterative plans otherwise grow exponentially).
    Convergence test: count + order-insensitive xxhash64 fingerprint of
    the edge set (one lightweight action per round on data already
    checkpointed).

    Only nodes that appear in ``edges`` are labeled; singletons are the
    caller's coalesce (see ``dedup_clusters``).
    """
    e = (
        edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def _fingerprint(df: DataFrame):
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        # (the edge set is distinct, so xor-cancellation needs a hash
        # collision AND the same count — the paired count guards it)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def _large_star(df: DataFrame) -> DataFrame:
        sym = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
            "u", F.least(F.col("mn"), F.col("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # orient each edge at its larger endpoint; connect that node's
        # smaller neighbours (and itself) to their minimum
        hi = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = hi.groupBy("u").agg(F.min("v").alias("m"))
        return (
            hi.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
        )

    e = e.localCheckpoint()
    fp = _fingerprint(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        nfp = _fingerprint(e)
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # fixpoint is a star forest oriented hi->lo: u's label is v, and
    # centers (only ever on the v side) label themselves
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, cluster_id, is_canonical) — transitive near-dup clusters.

    MinHash-LSH candidate pairs -> connected components -> every doc
    labeled with its cluster's min doc id; docs with no near-dup are
    their own cluster. ``is_canonical`` marks the one row per cluster a
    dedup pass keeps. One broadcast-able label table joined back to the
    corpus (labels exist only for docs that collided — a small fraction
    of the corpus under any realistic dup rate).
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, k, bands, shingle_n)
    labels = connected_components(pairs, "id_a", "id_b")
    out = (
        df.select(F.col(id_col))
        .join(F.broadcast(labels), F.col(id_col) == F.col("node"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    return out.withColumn(
        "is_canonical", F.col(id_col) == F.col("cluster_id")
    )
