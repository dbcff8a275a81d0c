"""As-of (most-recent-match) join — a time-series operator Spark has no
built-in for (engine extension; the reference has no temporal joins at
all — SURVEY §2.3 'absent' row).

Implemented as a COMPOSITION of built-ins, not a theta-join: tag both
sides, union, and take ``last(right payload, ignorenulls)`` over a
(keys)-partitioned window ordered by (ts, side). One shuffle on the
join keys, a per-key sort, zero pairwise comparison — the classic
union-scan formulation. A naive range join (l.ts >= r.ts) explodes to
O(|L|·|R|) pairs per key before picking the max; this stays O(|L|+|R|)
rows end-to-end, and at 100 TB the shuffle is the same hash-partition
as any equi-join on the key (AQE handles key skew).

Right-side duplicate timestamps are collapsed first (max tiebreak
column wins) so the match is deterministic — which also makes the
DuckDB ``ASOF JOIN`` oracle reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    payload: Sequence[str],
    tiebreak: str,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``ts`` ≤ the left row's ``ts`` within the same ``keys``.

    Returns all left columns plus ``<ts><suffix>`` and
    ``<payload_col><suffix>`` for each payload column (NULL when the key
    has no earlier right row — left-join semantics).
    """
    # deterministic right side: one row per (keys, ts), max-tiebreak wins
    w_dedup = Window.partitionBy(*keys, ts).orderBy(F.col(tiebreak).desc())
    r = (
        right.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .select(*keys, ts, *payload)
    )

    left_cols = left.columns
    tagged_r = r.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(p).alias(f"{p}{suffix}") for p in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
    )
    tagged_l = left.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts].dataType).alias(f"{ts}{suffix}"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"{p}{suffix}") for p in payload],
        *[F.col(c) for c in left_cols if c not in keys],
    )
    # rights sort before lefts at equal ts (backward join includes ties)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = [f"{ts}{suffix}"] + [f"{p}{suffix}" for p in payload]
    filled = tagged_r.unionByName(tagged_l).select(
        *keys,
        "_side",
        *[c for c in left_cols if c not in keys],
        *[F.last(m, ignorenulls=True).over(w).alias(m) for m in matched],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
