"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sales-team-mart pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 via salesdata_engineering_spark.registry — each Spark query
paired with the DuckDB oracle SQL the driver diffs it against.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from salesdata_engineering_spark.registry import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["sales_team_mart"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
