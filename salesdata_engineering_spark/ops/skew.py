"""Skew-mitigation operators (SURVEY §4 'skew handling' row).

AQE's skew-join splitting handles join-side skew automatically; for
AGGREGATION skew (a handful of hot group keys — the reference's data
has 20 customers, so every key is hot at scale) the standard recipe is
two-phase salted aggregation:

    phase 1: groupBy(key, salt) — hot keys split across ``n_salts``
             reducers, partial results tiny
    phase 2: groupBy(key) over the partials — at most n_salts rows/key

The final result is independent of the salt assignment, so a plain
groupBy oracle verifies it. Salt must be deterministic only for plan
re-execution stability — derived from other columns via crc32, never
rand() (a failed-stage retry with rand() double-counts rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: Column | str,
    alias: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase SUM with deterministic salting on hot group keys.

    ``salt_from`` is any column with per-row variation (an id, a line
    number); crc32(salt_from) % n_salts spreads each hot key across
    n_salts partial groups. SUM/COUNT/MIN/MAX decompose this way; AVG
    needs sum+count carried separately."""
    salt = F.pmod(F.crc32(F.col(salt_from).cast("string")), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*keys, salt, (F.col(value) if isinstance(value, str) else value).alias("_v"))
        .groupBy(*keys, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(alias))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the FACT side's key, REPLICATE the dim
    side once per salt value, join on (key, salt).

    A hot fact key sends all its rows to one reducer in a plain
    shuffled join; salting spreads each key across ``n_salts`` reducers
    while the dim replication (dim is small — that is why it is a dim)
    keeps every fact row joinable. The result set is identical to the
    plain join, so a plain-join oracle verifies it. This is the MANUAL
    form of what AQE's skew-join split does at runtime — needed when
    the skewed side is the OUTPUT of another operator in the same stage
    (AQE only splits shuffle-materialized skew), or on engines/configs
    without AQE. Deterministic crc32 salt (never rand(): a failed-stage
    retry with rand() mis-joins rows).

    The list-of-names join merges only the key and salt columns; any
    OTHER column sharing a name on both sides survives twice and is
    ambiguous downstream — rename or drop non-key collisions before
    calling (same contract as a plain ``join(on=[key])``). The salt
    never escapes. A NULL
    ``salt_from`` folds to salt 0 (crc32(NULL) is NULL, and a NULL salt
    would silently DROP those fact rows from the inner equi-join —
    salted_sum tolerates it because groupBy keeps NULL keys, a join
    does not)."""
    salt = F.pmod(
        F.coalesce(F.crc32(F.col(salt_from).cast("string")), F.lit(0)),
        F.lit(n_salts),
    )
    f = fact.withColumn("_salt", salt)
    # two steps on purpose: explode must be the TOP-LEVEL expression of
    # its projection (cast-wrapping it trips Spark's nested-generator
    # check), and the bigint cast must match crc32's type for the join
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return f.join(d, [key, "_salt"]).drop("_salt")
