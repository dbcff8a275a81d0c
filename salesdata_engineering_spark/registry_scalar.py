"""Registry entries widening the scalar/date/grouping surface (SURVEY
§2.8's 'absent' rows — functions the reference never uses but a user of
the engine gets from day one, each oracle-checked).

Dialect gotchas encoded here:
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is 0=Sunday →
  oracle adds 1.
- Spark ``date_trunc`` returns timestamp; DuckDB ``date_trunc('month',
  ts)`` returns DATE for month granularity → cast to TIMESTAMP.
- RE2 (DuckDB) vs Java (Spark) regex: stick to character-class +
  quantifier patterns that parse identically in both.
- approx_count_distinct is HLL-based and engine-specific → no value
  oracle; registered with oracle=None (driver's rows-only check) and
  bound-tested against the exact count in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datasets import load_tables
from .registry import register


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["orders"]


@register(
    "date_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           dayofweek(o_orderdate) + 1 AS dow,
           dayofyear(o_orderdate) AS doy,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
           last_day(o_orderdate)::TIMESTAMP AS month_end_day,
           date_diff('day', o_orderdate::DATE, DATE '1998-12-31') AS days_to_eoy,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date
    FROM orders
    """,
    doc="Date/time function surface: year/month/day/quarter/dow/doy, "
    "date_trunc, last_day, datediff, date_format (engine extension — the "
    "reference slices date strings with SUBSTRING, SURVEY §2.8 F1).",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end_day"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )


@register(
    "string_functions_extended",
    """
    SELECT c_custkey,
           lower(c_name) AS lname,
           replace(c_name, '#', '-') AS replaced,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           trim('  ' || c_mktsegment || ' ') AS trimmed,
           regexp_extract(c_name, '[0-9]+', 0) AS digits,
           CASE WHEN contains(c_name, '1') THEN 1 ELSE 0 END AS has_one,
           split_part(c_name, '#', 1) AS name_prefix,
           reverse(c_mktsegment) AS seg_rev,
           repeat(substring(c_mktsegment, 1, 1), 3) AS head3
    FROM customer
    """,
    doc="Extended string surface: lower/replace/lpad/trim/regexp_extract/"
    "contains/split_part/reverse/repeat (engine extension, SURVEY §2.8).",
)
def q_string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.when(F.col("c_name").contains("1"), 1).otherwise(0).alias("has_one"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_prefix"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("head3"),
    )


@register(
    "null_handling",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END AS price_null,
           ifnull(NULL, o_orderpriority) AS prio,
           CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS status_no_f
    FROM orders
    """,
    doc="NULL semantics: nullif/coalesce/ifnull/null-producing CASE "
    "(engine extension, SURVEY §2.2 P5 'null-check predicates').",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_totalprice").isNull(), 1).otherwise(0).alias("price_null"),
        F.ifnull(F.lit(None), F.col("o_orderpriority")).alias("prio"),
        F.when(F.col("o_orderstatus") == "F", F.lit(None)).otherwise(F.col("o_orderstatus")).alias(
            "status_no_f"
        ),
    )


@register(
    "grouping_sets_qty",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUPING SETS (engine extension; completes the rollup/cube family "
    "— SURVEY §2.4 'absent' row).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    li.createOrReplaceTempView("_gs_lineitem")
    return spark_sql_grouping_sets(li.sparkSession)


def spark_sql_grouping_sets(spark: SparkSession) -> DataFrame:
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "approx_count_distinct",
    None,  # HLL sketch values are engine-specific — rows-only check;
    # accuracy bound vs exact count asserted in tests/test_scalar_ext.py
    doc="approx_count_distinct (HLL) per returnflag — the engine's "
    "cardinality sketch (SURVEY §2.4 'absent' row). No value oracle by "
    "construction; bound-tested against exact distinct in pytest.",
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        # rsd=0.02: tighter HLL registers; default 0.05 wobbles past a
        # 5% test bound at this cardinality
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.count("*").alias("n"),
    )
