"""Portable hash helpers: the engine↔oracle-stable 60-bit md5 hash,
MinHash permutations, and SimHash — all pure Column expressions.

``md5_long`` is deliberately md5-based (not xxhash64): Spark and DuckDB
produce identical md5 hex, so every hash-derived operator (MinHash-LSH,
SimHash, fingerprints) can be oracle-checked bit-for-bit by the driver's
DuckDB comparison. xxhash64 stays the fast path for engine-internal keys
(frontier/seen), where no cross-engine oracle is needed.

All MinHash arithmetic is done mod the Mersenne prime 2^31-1 with
coefficients < 2^31, so every intermediate fits in a signed 64-bit int —
no overflow under Spark 4's ANSI mode and identical results in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# Mersenne prime 2^31-1: modulus for the MinHash universal-hash family.
# a*h+b with a,b,h < 2^31 stays < 2^62 — safe in BIGINT on both engines.
MINHASH_PRIME = (1 << 31) - 1


def md5_long(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative 60-bit BIGINT.

    DuckDB twin: ``('0x' || substring(md5(x),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The DuckDB-SQL twin of :func:`md5_long` for oracle queries."""
    return f"(('0x' || substring(md5({expr}),1,15))::BIGINT)"


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One permutation of the universal family ((a*(h mod p) + b) mod p)."""
    p = F.lit(MINHASH_PRIME)
    return ((h % p) * F.lit(a) + F.lit(b)) % p


def minhash_perm_sql(h_expr: str, a: int, b: int) -> str:
    p = MINHASH_PRIME
    return f"((({h_expr}) % {p}) * {a} + {b}) % {p}"


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a fixed LCG — same sequence on any
    platform, reproducible for the SQL oracle."""
    params = []
    state = seed
    m = 1 << 63
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % m
        a = (state % (MINHASH_PRIME - 2)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % m
        b = state % MINHASH_PRIME
        params.append((a, b))
    return params


def simhash_bit(h: Column, bit: Column) -> Column:
    """+1/-1 contribution of token-hash ``h`` at bit position ``bit``."""
    return F.when(F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
        F.lit(-1)
    )
