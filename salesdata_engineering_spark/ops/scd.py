"""Slowly-changing-dimension (type 2) merge and incremental aggregate
maintenance — the two table-maintenance primitives a warehouse pipeline
runs every load cycle.

The reference overwrites its dimension copies wholesale each run
(parity: the full-table JDBC reads in main.py:183-212 feeding
dimension_tables_join.py); at 100 TB the maintained form is the only
viable one: touch just the changed keys / affected groups, never rescan
history.

Both operators are pure DataFrame compositions (joins + unions + one
hash aggregate) — no MERGE INTO dependency, so they run on plain
parquet; on Delta/Iceberg the same frames feed ``MERGE`` directly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Open rows carry this sentinel instead of NULL valid_to so the column
#: stays orderable and filter-pushable (NULL needs IS NULL special-casing
#: in every consumer).
OPEN_END = "9999-12-31"


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective_col: str = "effective_date",
) -> DataFrame:
    """Type-2 merge: close changed rows, append new versions, keep history.

    ``current``: (key, *attrs, valid_from, valid_to, is_current) with one
    open row (valid_to = OPEN_END, is_current = 1) per key.
    ``updates``: (key, *attrs, effective_col) — the staged new snapshot.

    Semantics per update row:
    - attrs identical to the key's open row → no-op (idempotent re-loads);
    - attrs differ → the open row closes at effective_date and a new open
      row starts there;
    - unseen key → new open row.
    History rows (is_current = 0) pass through untouched.

    Plan shape: ONE shuffle join of open-rows ⋈ updates on the key (dim
    updates are small → Catalyst broadcasts them), then unions of narrow
    projections — no window, no full-history rewrite. History stays
    partition-pruned on is_current/valid_to at read time.
    """
    attrs = list(attrs)
    hist = current.filter(F.col("is_current") == 0)
    open_rows = current.filter(F.col("is_current") == 1)

    diff = [
        "(NOT (o.`{a}` <=> u.`{a}`))".format(a=a) for a in attrs
    ]  # null-safe: NULL→value and value→NULL are real changes
    changed_pred = F.expr(" OR ".join(diff))

    # match-status flags, NOT key-NULLness: the classic LEFT-JOIN-NULL
    # idiom misreads a row whose key is GENUINELY NULL (nullkeys axis,
    # r13) — a NULL-key update row has u.key NULL by value, so it was
    # classified "no update arrived", emitted the unmatched o-side as an
    # all-NULL open row, and vanished from new_open. The flags classify
    # by which SIDE joined, independent of key values; NULL keys then
    # follow SQL equality semantics naturally (they never match, so a
    # NULL-key open row passes through untouched and a NULL-key update
    # becomes a new open row — exactly what the SQL oracle's
    # LEFT JOIN ... WHERE branches produce).
    o = open_rows.withColumn("_o_present", F.lit(1)).alias("o")
    u = updates.withColumn("_u_present", F.lit(1)).alias("u")
    joined = o.join(u, F.col(f"o.{key}") == F.col(f"u.{key}"), "full_outer")
    o_present = F.col("o._o_present").isNotNull()
    u_present = F.col("u._u_present").isNotNull()

    untouched_open = joined.filter(~u_present).select("o.*").drop("_o_present")
    unchanged_open = (
        joined.filter(o_present & u_present & ~changed_pred)
        .select("o.*")
        .drop("_o_present")
    )
    closed = (
        joined.filter(o_present & u_present & changed_pred)
        .select(
            F.col(f"o.{key}").alias(key),
            *[F.col(f"o.{a}").alias(a) for a in attrs],
            F.col("o.valid_from").alias("valid_from"),
            F.col(f"u.{effective_col}").alias("valid_to"),
            F.lit(0).alias("is_current"),
        )
    )
    new_open = (
        joined.filter(u_present & (~o_present | changed_pred))
        .select(
            F.col(f"u.{key}").alias(key),
            *[F.col(f"u.{a}").alias(a) for a in attrs],
            F.col(f"u.{effective_col}").alias("valid_from"),
            F.lit(OPEN_END).alias("valid_to"),
            F.lit(1).alias("is_current"),
        )
    )
    out_cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    return (
        hist.select(*out_cols)
        .unionByName(untouched_open.select(*out_cols))
        .unionByName(unchanged_open.select(*out_cols))
        .unionByName(closed)
        .unionByName(new_open)
    )


def merge_partial_sums(
    parts: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str | None = None,
) -> DataFrame:
    """Incremental aggregate maintenance: fold partial sums into totals.

    ``parts`` is the union of an existing aggregate and a delta aggregate
    over the same keys (sums and counts are decomposable: total = Σ of
    partials). One hash aggregate over |groups| rows — the incremental
    path recomputes the delta only, never rescans the history fact.
    Exactness: keep the partial sums in DECIMAL so the fold is
    order-independent (registry.py exactness rule 1).
    """
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    if count_col:
        aggs.append(F.sum(count_col).alias(count_col))
    return parts.groupBy(*keys).agg(*aggs)
