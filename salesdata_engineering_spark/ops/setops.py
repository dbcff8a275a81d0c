"""Set operations (SURVEY §2.7, U1 + intersect/except extensions).

The reference unions per-file frames positionally onto an empty
JDBC-seeded frame (`main.py:184,189-204`). The engine unions *by name*
with missing-column tolerance — `unionByName(allowMissingColumns=True)`
replaces the empty-seed-frame trick outright.
"""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import DataFrame


def union_all(frames: Iterable[DataFrame], by_name: bool = True) -> DataFrame:
    """U1 — union N frames. ``by_name=False`` reproduces the reference's
    positional union (safe only after a fixed canonical projection)."""
    frames = list(frames)
    if not frames:
        raise ValueError("union_all needs at least one frame")
    if by_name:
        return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
    return reduce(DataFrame.union, frames)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame, keep_dups: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_dups else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, keep_dups: bool = False) -> DataFrame:
    return a.exceptAll(b) if keep_dups else a.subtract(b)
