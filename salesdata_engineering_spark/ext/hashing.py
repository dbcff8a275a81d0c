"""Deterministic cross-engine hashing primitives.

Every probabilistic operator in the extension set (MinHash, SimHash, LSH
bucketing, winnowing fingerprints) needs hash functions that produce the
SAME value in Spark and in the DuckDB oracle — otherwise the driver's
differential check can never pass. Spark's native ``xxhash64``/``hash``
have no DuckDB twin, so we standardize on md5 (bit-identical everywhere):

    64-bit hash  = first 15 hex chars of md5, parsed base-16 (60 bits,
                   fits a signed BIGINT in both engines)
    salted family = md5(salt || ':' || value) — one independent hash
                    function per salt, the classic MinHash construction.

Spark:   conv(substr(md5(concat(salt,':',x)), 1, 15), 16, 10)::bigint
DuckDB:  ('0x' || substr(md5(salt || ':' || x), 1, 15))::BIGINT

Scale note: md5 is ~3x slower than xxhash64 but still JVM-side inside
whole-stage codegen; for 100 TB runs where cross-engine verification is
not needed, swap `F.xxhash64` in via the ``fast=True`` flags and keep
the rest of the plan identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits < 63 → always a valid positive signed BIGINT


def md5_long(c: Column, salt: int | str | None = None) -> Column:
    """64-bit (60-bit) deterministic hash of a string column."""
    if salt is not None:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("bigint")


def sql_md5_long(expr: str, salt: int | str | None = None) -> str:
    """DuckDB SQL mirroring :func:`md5_long` exactly."""
    inner = f"'{salt}:' || {expr}" if salt is not None else expr
    return f"('0x' || substr(md5({inner}), 1, {HEX_CHARS}))::BIGINT"


def py_md5_long(s: str) -> int:
    """Driver/Python-side twin of :func:`md5_long` / :func:`sql_md5_long`
    — the ONE place the 60-bit md5[:HEX_CHARS] convention lives for
    Python callers (stub scorers, hyperplane generation); keep all
    three spellings in lockstep or oracle parity silently breaks."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:HEX_CHARS], 16)


#: Mersenne prime 2^31−1 — the universal-hash modulus for MinHash
#: permutations. Small enough that a_i·x never overflows int64 in either
#: engine (DuckDB raises on overflow; Spark would silently wrap).
MINHASH_P = 2_147_483_647


def perm_hash(base: Column, i: int) -> Column:
    """i-th MinHash permutation h_i(x) = (a_i·x + b_i) mod P over ONE
    md5 base hash — 16 permutations cost 1 md5 + 16 multiply-adds
    instead of 16 md5s (the CPU line-item at 100 TB)."""
    return F.pmod(base * F.lit(2 * i + 3) + F.lit(i * i + 1), F.lit(MINHASH_P))


def sql_perm_hash(base_expr: str, i_expr: str) -> str:
    """DuckDB mirror of :func:`perm_hash`; ``i_expr`` may be a column."""
    return f"((({base_expr}) * (2*({i_expr})+3) + ({i_expr})*({i_expr}) + 1) % {MINHASH_P})"
