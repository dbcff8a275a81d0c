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
