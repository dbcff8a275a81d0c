"""Sorts / limits / top-k (SURVEY §2.6).

Scale note: ``orderBy`` is a global range-partitioned sort — fine for
final small outputs, wrong for intermediate 100 TB frames. ``limit``
after ``orderBy`` is optimized by Spark into TakeOrderedAndProject (a
per-partition top-k + driver merge, no full sort) — that's the idiom for
global top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def order_by(df: DataFrame, *order: Column | str) -> DataFrame:
    """O1 generalized — global sort."""
    return df.orderBy(*order)


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def top_k_global(df: DataFrame, order: Column | str, k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject physical op."""
    return df.orderBy(order).limit(k)
