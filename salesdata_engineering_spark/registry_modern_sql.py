"""Modern SQL surface (Spark 4.x): recursive CTEs, SQL pipe syntax,
UNPIVOT/melt, LATERAL correlated derived tables, GROUP/ORDER BY ALL,
and the DataSketches HLL aggregate family.

The reference's query surface is classic SELECT/GROUP BY (SURVEY §2.8);
these are the Spark-4 extensions a user migrating onto the engine gets
on day one, each value-oracle-checked against DuckDB (which happens to
support the same constructs — recursive CTEs, LATERAL, GROUP BY ALL —
so most oracles are near-identical SQL rather than rewrites).

Dialect notes encoded below:
- DuckDB ``date_trunc('month', ts)`` returns DATE (Spark: TIMESTAMP) →
  oracle casts back to TIMESTAMP.
- HLL sketches are engine-specific bit-for-bit, so the sketch query
  follows the repo's approx-aggregate convention (registry_scalar.py):
  emit the EXACT value plus an ``approx_ok`` predicate column computed
  from the estimate, and let the oracle pin exact + literal 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datasets import load_tables, register_views
from .registry import register

_REC_MONTH_SPINE = """
WITH RECURSIVE b AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi FROM orders),
m(month) AS (
  SELECT lo FROM b
  UNION ALL
  SELECT month + INTERVAL 1 MONTH FROM m, b WHERE month < b.hi)
SELECT m.month, count(o.o_orderkey) AS n_orders
FROM m LEFT JOIN orders o
  ON date_trunc('month', o.o_orderdate) = m.month
GROUP BY 1
"""


@register(
    "sql_recursive_month_spine",
    """
    WITH RECURSIVE b AS (
      SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP) AS hi
      FROM orders),
    m(month) AS (
      SELECT lo FROM b
      UNION ALL
      SELECT month + INTERVAL 1 MONTH FROM m, b WHERE month < b.hi)
    SELECT m.month, count(o.o_orderkey) AS n_orders
    FROM m LEFT JOIN orders o
      ON CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) = m.month
    GROUP BY 1
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): gap-free month spine "
    "from the data's own [min, max] order months — zero-order months "
    "appear with n_orders = 0, the classic reporting gap-fill the "
    "engine elsewhere builds with explode(sequence(...)) "
    "(events_hourly_gapfill). Recursion depth = month span (bounded, "
    "driver-side iteration of a tiny 1-row-per-month frame); the fact "
    "table is touched once by the final join. Identical SQL runs on "
    "DuckDB modulo its DATE-returning date_trunc.",
)
def q_sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_REC_MONTH_SPINE)


_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
|> AGGREGATE sum(l_quantity) AS sum_qty, count(*) AS n_rows
   GROUP BY l_returnflag, l_linestatus
"""


@register(
    "sql_pipe_syntax_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="SQL pipe syntax (Spark 4 |> operators): the Q1 pricing-summary "
    "shape as a linear FROM |> WHERE |> AGGREGATE pipeline — same "
    "Catalyst plan as the classic form (the parser desugars pipes "
    "before analysis), so pushdown/partial-agg behavior is identical; "
    "the oracle is the desugared SQL. Quantities are integer-valued "
    "doubles, so the sum is order-independent and exact.",
)
def q_sql_pipe_syntax_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


@register(
    "unpivot_priority_metrics",
    """
    WITH a AS (
      SELECT o_orderpriority,
             CAST(count(*) AS DOUBLE) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1)
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM a
    UNION ALL
    SELECT o_orderpriority, 'total' AS metric, total AS value FROM a
    """,
    doc="UNPIVOT / melt (Spark 3.4+ DataFrame.unpivot): wide per-"
    "priority metrics fold into (id, metric, value) long form — the "
    "inverse of the pivot surface (pivot_status_totals). Long form is "
    "what metric stores and chart layers ingest; the oracle spells the "
    "same reshape as UNION ALL, which is also the logical plan Spark "
    "expands Unpivot into (one scan of the tiny aggregated frame, "
    "fact touched once upstream). Money sums in exact decimal, cast "
    "once at the boundary.",
)
def q_unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    agg = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
    return agg.unpivot(
        ["o_orderpriority"], ["n_orders", "total"], "metric", "value"
    )


_LATERAL_SQL = """
SELECT c.c_custkey, l.n_orders, l.max_price
FROM customer c,
LATERAL (SELECT count(*) AS n_orders,
                max(o_totalprice) AS max_price
         FROM orders o WHERE o.o_custkey = c.c_custkey) l
WHERE c.c_mktsegment = 'BUILDING'
"""


@register(
    "sql_lateral_per_customer",
    _LATERAL_SQL,
    doc="LATERAL correlated derived table: per BUILDING-segment "
    "customer, an aggregate subquery over that customer's orders "
    "(count + max price; aggregate LATERAL always yields exactly one "
    "row, so customers without orders surface with n_orders = 0 and "
    "NULL max — outer-join semantics without writing one). Catalyst "
    "decorrelates it to the same plan as a groupBy + left join "
    "(DecorrelateInnerQuery), so no per-row re-execution survives — "
    "the correlated form is pure API surface over the §2.7 subquery "
    "machinery. Identical SQL is the DuckDB oracle.",
)
def q_sql_lateral_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_GBA_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n, max(o_totalprice) AS max_price
FROM orders
GROUP BY ALL
"""


@register(
    "sql_group_by_all",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n, max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
    doc="GROUP BY ALL (Spark 3.4+): every non-aggregate select item "
    "becomes a grouping key at analysis time — sugar only, the plan is "
    "the explicit GROUP BY (which is the oracle's text). Guards the "
    "analyzer behavior: an aggregate expression must NOT be inferred "
    "as a key.",
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GBA_SQL)


@register(
    "approx_hll_sketch_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_customers,
           1 AS approx_ok
    FROM orders GROUP BY 1
    """,
    doc="DataSketches HLL surface (Spark 3.5+ hll_sketch_agg / "
    "hll_union_agg / hll_sketch_estimate): per-status distinct "
    "customers as a MERGEABLE sketch — unlike approx_count_distinct's "
    "opaque internal HLL, the sketch is a first-class binary value "
    "that can be stored per partition/day and unioned later without "
    "rescanning, the 100 TB incremental-rollup shape. Sketch bytes are "
    "engine-specific, so per the repo's approx-aggregate convention "
    "the query emits the EXACT count plus approx_ok = [estimate "
    "within 5%], and the oracle pins exact + literal 1; a pytest "
    "asserts the tighter default-precision error bound and that "
    "unioning partial per-priority sketches equals the direct "
    "estimate.",
)
def q_approx_hll_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    est = F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))")
    exact = F.countDistinct("o_custkey")
    return o.groupBy("o_orderstatus").agg(
        exact.alias("exact_customers"),
        F.when(
            F.abs(est - exact) <= 0.05 * exact, 1
        ).otherwise(0).alias("approx_ok"),
    )
