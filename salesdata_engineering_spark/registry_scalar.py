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
- sketch aggregates (approx_count_distinct HLL, approx_percentile GK)
  produce engine-specific values → their oracles check the EXACT value
  plus an error-bound predicate column (approx_ok = 1), with tighter
  bounds asserted in pytest.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datasets import load_tables
from .ops.windows import asc_nulls_last
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
           CASE WHEN c_name IS NULL THEN NULL
                ELSE split_part(c_name, '#', 1) END AS name_prefix,
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
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           COUNT(*) AS n,
           1 AS approx_ok
    FROM lineitem GROUP BY 1
    """,
    doc="approx_count_distinct (HLL) per returnflag — the engine's "
    "cardinality sketch (SURVEY §2.4 'absent' row). HLL sketch values "
    "are engine-specific, so the oracle checks the exact NDV plus an "
    "error-bound PREDICATE: Spark emits approx_ok = [|approx−exact| ≤ "
    "5%·exact] (deterministic — HLL++ has no RNG), the oracle emits "
    "the literal 1 it must equal. Tighter 2% bound asserted in "
    "tests/test_scalar_ext.py.",
)
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    # rsd=0.02: tighter HLL registers; default 0.05 wobbles past a
    # 5% bound at this cardinality
    approx = F.approx_count_distinct("l_orderkey", rsd=0.02)
    exact = F.count_distinct("l_orderkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_orders"),
        F.count("*").alias("n"),
        F.when(
            F.abs(approx - exact) <= 0.05 * exact, 1
        ).otherwise(0).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Join / window / set-op surface completion (SURVEY §2.3/2.5/2.7 'absent')
# ---------------------------------------------------------------------------


@register(
    "join_heavy_top_orders",
    """
    SELECT l.l_orderkey,
           CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped: selective dim filter -> fact join -> agg -> "
    "top-10. The filter prunes customer BEFORE the join (predicate "
    "pushdown through the join), broadcast on the filtered dim.",
    bench=True,
)
def q_join_heavy_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
    )
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue")
    )
    return agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority").orderBy(
        F.col("revenue").desc(), "l_orderkey"
    ).limit(10)


@register(
    "join_full_outer_balance",
    """
    SELECT coalesce(b.c_custkey, o.o_custkey) AS custkey,
           b.c_acctbal, o.n_orders
    FROM (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
          FROM customer WHERE c_acctbal > 9000) b
    FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
                     FROM orders WHERE o_orderstatus = 'F'
                     GROUP BY 1) o
      ON b.c_custkey = o.o_custkey
    """,
    doc="Full-outer join with coalesced key (engine extension; reference "
    "has inner joins only — SURVEY §2.3).",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    b = (
        t["customer"]
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal"))
    )
    o = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    j = b.join(o, b.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_acctbal", "n_orders"
    )


@register(
    "window_analytics_suite",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           dense_rank() OVER w AS drank,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Window analytics: ntile/percent_rank/dense_rank/first/last with "
    "explicit frames (engine extension — SURVEY §2.5 'absent' row).",
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        *asc_nulls_last("o_totalprice", "o_orderkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.dense_rank().over(w).alias("drank"),
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
        F.last("o_totalprice").over(wfull).cast("double").alias("last_price"),
    )


@register(
    "window_sum_distinct_reference_shape",
    """
    SELECT DISTINCT customer_id, sales_month, total_sales FROM (
        SELECT o_custkey AS customer_id,
               strftime(o_orderdate, '%Y-%m') AS sales_month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    OVER (PARTITION BY o_custkey, strftime(o_orderdate, '%Y-%m')) AS DOUBLE)
                 AS total_sales
        FROM orders
    )
    """,
    doc="The REFERENCE'S aggregation idiom preserved verbatim: "
    "window-sum over the group keys + DISTINCT collapse "
    "(customer_mart_sql_tranform_write.py:10-19). The engine's groupBy "
    "rewrite is proven equivalent in tests/test_marts.py; this entry "
    "keeps the compat shape oracle-checked.",
)
def q_window_sum_distinct_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesdata_engineering_spark.ops.aggregations import window_sum_distinct

    o = load_tables(spark, sf_dir)["orders"].select(
        F.col("o_custkey").alias("customer_id"),
        F.date_format("o_orderdate", "yyyy-MM").alias("sales_month"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    out = window_sum_distinct(
        o, keys=["customer_id", "sales_month"], value="price", alias="total_sales"
    )
    return out.select(
        "customer_id", "sales_month", F.col("total_sales").cast("double").alias("total_sales")
    )


@register(
    "setop_intersect_all",
    """
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="INTERSECT ALL — multiset semantics (duplicates kept per min "
    "multiplicity); completes §2.7 beyond distinct set ops.",
)
def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@register(
    "setop_except_all",
    """
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="EXCEPT ALL — multiset difference (§2.7 completion).",
)
def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b)


@register(
    "json_props_struct",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
           length(props) AS props_len,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
    doc="X4 extended: typed from_json struct extraction + validity probe "
    "over events.props (SURVEY §2.11).",
)
def q_json_props_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = load_tables(spark, sf_dir)["events"]
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = e.withColumn("_p", F.from_json("props", schema))
    return parsed.select(
        "event_id",
        F.col("_p.k").alias("k_typed"),
        F.length("props").alias("props_len"),
        F.when(F.col("_p").isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


# ---------------------------------------------------------------------------
# §2 completion: predicates (P5), positional union (U1), global sort (O),
# pandas_udf surface (§2.10), AES column crypto, salted skew agg (§4)
# ---------------------------------------------------------------------------


@register(
    "filter_in_like",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'P')
      AND o_orderpriority LIKE '%URGENT'
      AND o_totalprice IS NOT NULL
    """,
    doc="P5 predicate family: IN-list + LIKE + null-check (SURVEY §2.2 — "
    "the reference's only predicates live in raw MySQL SQL; the engine "
    "exposes them as DataFrame filters).",
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    return o.filter(
        F.col("o_orderstatus").isin("O", "P")
        & F.col("o_orderpriority").like("%URGENT")
        & F.col("o_totalprice").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "union_positional",
    """
    SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="U1 — positional UNION ALL exactly as the reference unions "
    "per-file frames (main.py:184-204); engine default is unionByName, "
    "compat positional union kept.",
)
def q_union_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").cast("double").alias("v")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey"), F.col("o_totalprice").cast("double")
    )
    return a.union(b)  # positional


@register(
    "global_sort_prices",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS pos
    FROM orders
    WHERE o_totalprice > 450000
    """,
    doc="Global total order (range-partitioned sort; the driver's compare "
    "is order-insensitive so the ORDER is materialized as a row_number "
    "position column to make it checkable).",
)
def q_global_sort_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sorts import global_row_number

    o = _orders(spark, sf_dir).filter(F.col("o_totalprice") > 450000)
    # r14: the docstring's "range-partitioned sort" is now what the code
    # does — global_row_number's two-pass offset scheme (range exchange
    # + tiny per-partition counts) replaces the bare Window.orderBy
    # row_number that funneled every filtered row through ONE task
    # (VERDICT r13 "What's wrong" 1). Ordering is identical: desc =
    # NULLS LAST is both Spark's .desc() default and the oracle's, and
    # the asc_nulls_last tie-break convention is the helper's own.
    return global_row_number(
        o.select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
        ),
        order=["price", "o_orderkey"],
        directions=["desc", "asc"],
        alias="pos",
        persist_key="global_sort_prices",
    ).select("o_orderkey", "price", "pos")


@register(
    "pandas_udf_price_bands",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(o_totalprice AS DOUBLE) / 1000.0 AS price_k
    FROM orders
    """,
    doc="§2.10 UDF surface: an Arrow-vectorized @pandas_udf computing "
    "banding + scaling (deterministic numpy ops, so oracle-checkable). "
    "Demonstrates the sanctioned Python path — batch-vectorized, never "
    "row-at-a-time; core operators stay JVM expressions.",
)
def q_pandas_udf_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def band(price: pd.Series) -> pd.Series:
        out = pd.Series("high", index=price.index)
        out[price < 300000] = "mid"
        out[price < 100000] = "low"
        return out

    @pandas_udf("double")
    def in_thousands(price: pd.Series) -> pd.Series:
        # no .round(): pandas rounds half-to-even, DuckDB half-away —
        # plain IEEE division is bit-identical in both engines
        return price / 1000.0

    o = _orders(spark, sf_dir)
    return o.select(
        "o_orderkey",
        band("o_totalprice").alias("band"),
        in_thousands("o_totalprice").alias("price_k"),
    )


@register(
    "aes_roundtrip",
    """
    SELECT c_custkey, c_name AS decrypted, 1 AS roundtrip_ok
    FROM customer
    """,
    doc="Column-level AES-GCM crypto via Spark built-ins (parity: the "
    "reference's Python AES utility src/main/utility/encrypt_decrypt.py, "
    "re-expressed as JVM-side aes_encrypt/aes_decrypt). Ciphertext is "
    "IV-randomized so the oracle checks the decrypt(encrypt(x)) == x "
    "roundtrip, not bytes.",
)
def q_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    key = F.lit("0123456789abcdef")  # 16-byte demo key
    enc = F.expr("aes_encrypt(c_name, '0123456789abcdef')")
    dec = F.expr(
        "cast(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef'), '0123456789abcdef') as string)"
    )
    return c.select(
        "c_custkey",
        dec.alias("decrypted"),
        # null-safe: decrypt(encrypt(NULL)) IS NULL — a successful
        # roundtrip, which plain == would score 0 via NULL==NULL
        F.when(dec.eqNullSafe(F.col("c_name")), 1).otherwise(0).alias("roundtrip_ok"),
    )


@register(
    "skew_salted_sum",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY 1
    """,
    doc="§4 skew recipe: two-phase salted aggregation (groupBy(key, "
    "crc32-salt) partials, then groupBy(key)) — result provably equals "
    "the plain groupBy, which IS the oracle. 3 hot keys split across 16 "
    "salted partials; the recipe for 100 TB hot-key aggs.",
)
def q_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.skew import salted_sum

    li = load_tables(spark, sf_dir)["lineitem"]
    out = salted_sum(
        li,
        keys=["l_returnflag"],
        value=F.col("l_quantity").cast("decimal(12,2)"),
        alias="sum_qty",
        salt_from="l_orderkey",
        n_salts=16,
    )
    return out.select("l_returnflag", F.col("sum_qty").cast("double").alias("sum_qty"))


_NATION_REVENUE_SQL = """
    WITH enriched AS (
        SELECT n.n_name,
               CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (100 - CAST(l.l_discount * 100 AS INT)) AS rev_cents_pct
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT n_name, CAST(SUM(rev_cents_pct) AS DOUBLE) / 100 AS revenue, COUNT(*) AS n
    FROM enriched GROUP BY n_name
"""


@register(
    "sql_api_nation_revenue",
    _NATION_REVENUE_SQL,
    doc="The spark.sql() surface end-to-end: a 5-table CTE join "
    "(TPC-H Q5 shape) run as ONE SQL string over registered views — "
    "identical text runs on DuckDB as the oracle. Discount arithmetic "
    "in integer cents-pct so both engines sum exactly. Catalyst plans "
    "it like the DataFrame twin: dims broadcast, filter pushed into "
    "the region scan, partial aggs before the exchange.",
)
def q_sql_api_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datasets import register_views

    register_views(spark, sf_dir)
    return spark.sql(_NATION_REVENUE_SQL)


@register(
    "percentile_stats",
    """
    SELECT o_orderpriority,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY 1
    """,
    doc="Exact percentiles (median/p90 via linear interpolation — Spark "
    "percentile() ≡ DuckDB quantile_cont). approx_percentile is the "
    "100 TB single-pass path; exact percentile sorts per group and is "
    "the oracle-checkable baseline (SURVEY §2.4 'absent' aggregates).",
)
def q_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


@register(
    "pivot_status_totals",
    """
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS total_f,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS total_o,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS total_p
    FROM orders GROUP BY 1
    """,
    doc="groupBy().pivot() with an EXPLICIT value list (engine "
    "extension): without one Spark runs a distinct-scan job just to "
    "discover columns — never acceptable on a 100 TB fact. Plans as one "
    "hash aggregate with FILTER-style conditional sums, same as the "
    "oracle's SUM..FILTER spelling.",
)
def q_pivot_status_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    dec = F.col("o_totalprice").cast("decimal(14,2)")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).cast("double").alias("total_f"),
            F.coalesce(F.col("O"), F.lit(0)).cast("double").alias("total_o"),
            F.coalesce(F.col("P"), F.lit(0)).cast("double").alias("total_p"),
        )
    )


# ---------------------------------------------------------------------------
# Classic multi-join analytics shapes (TPC-H Q3 / Q10 analogues) + arrays
# ---------------------------------------------------------------------------

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
    FROM (
        SELECT l_orderkey,
               CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15'
          AND l_shipdate > TIMESTAMP '1997-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        QUALIFY row_number() OVER (ORDER BY revenue DESC, o_orderdate, l_orderkey) <= 10
    )
    """,
    doc="TPC-H Q3 shape: segment filter -> 3-table join -> grouped "
    "revenue -> deterministic top-10 (row_number tiebreak on date+key "
    "so the LIMIT edge is stable across engines). Customer dim "
    "broadcast; both date filters push to the scans.",
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = t["orders"].filter(F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp"))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )
    # r14: global top-k as orderBy+limit → TakeOrderedAndProject (the
    # ops/sorts.py top_k_global idiom — per-partition top-k + driver
    # merge, no Window node at all). The row_number()-over-global-window
    # form it replaces was already bounded by Spark 4's
    # InferWindowGroupLimit (a TakeOrderedAndProject fed the Window),
    # but still carried a single-partition Window + Filter over the
    # top-k rows; same total order (desc = NULLS LAST in both forms and
    # both engines), so the kept rows are identical.
    return (
        agg.orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, revenue, n_name
    FROM (
        SELECT c_custkey, c_name,
               CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue,
               n_name
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY c_custkey, c_name, n_name
        QUALIFY row_number() OVER (ORDER BY revenue DESC, c_custkey) <= 20
    )
    """,
    doc="TPC-H Q10 shape: returned-items revenue per customer with "
    "nation enrichment, deterministic top-20. The returnflag + date "
    "predicates push down; nation broadcast.",
)
def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(t["customer"], o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )
    # r14: orderBy+limit → TakeOrderedAndProject, replacing the global
    # row_number window (same rationale + equivalence as
    # q3_shipping_priority above).
    return (
        agg.orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@register(
    "array_functions",
    """
    -- + 0.0 normalizes the SIGN OF ZERO: DuckDB's round keeps -0.0
    -- for tiny negatives where Spark's returns +0.0 (extreme probe
    -- axis, r12 — denormal-scale vector components); IEEE -0.0 + 0.0
    -- = +0.0 in both engines
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS first_c,
           round(CAST(list_max(embedding) AS DOUBLE), 6) + 0.0 AS max_c,
           round(CAST(list_min(embedding) AS DOUBLE), 6) + 0.0 AS min_c,
           CASE WHEN list_contains(list_transform(embedding, x -> x > 0), true)
                THEN 1 ELSE 0 END AS any_pos,
           round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) + 0.0 AS sorted_first,
           len(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings
    """,
    doc="Array/list function surface over the embedding column: size, "
    "index, min/max, exists, sort, filter-count — Spark arrays vs DuckDB "
    "lists (1-based in both). Rounded at 6dp: float32->double casts are "
    "bit-identical, arithmetic is element-local.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["embeddings"]
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        # + 0.0: sign-of-zero normalization, mirrored in the oracle
        (F.round(emb.getItem(0), 6) + F.lit(0.0)).alias("first_c"),
        (F.round(F.array_max(emb), 6) + F.lit(0.0)).alias("max_c"),
        (F.round(F.array_min(emb), 6) + F.lit(0.0)).alias("min_c"),
        F.when(F.exists(emb, lambda x: x > 0), 1).otherwise(0).alias("any_pos"),
        (F.round(F.sort_array(emb).getItem(0), 6) + F.lit(0.0)).alias("sorted_first"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "subquery_exists_urgent",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'P')
    """,
    doc="Correlated EXISTS / NOT EXISTS subqueries through spark.sql() — "
    "Catalyst decorrelates them into a left-semi + left-anti join pair "
    "(no per-row re-execution; asserted in tests). Same text runs on "
    "the oracle.",
)
def q_subquery_exists_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datasets import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
        """
    )


@register(
    "subquery_above_avg_orders",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    WHERE o_totalprice > (SELECT round(avg(o_totalprice) * 1.5, 2) FROM orders)
    """,
    doc="Uncorrelated scalar subquery: the inner aggregate computes once "
    "and broadcasts into the filter (Catalyst ScalarSubquery). The "
    "threshold is rounded to 2dp in both engines so distributed-vs-"
    "sequential avg drift (~1e-10) cannot flip a 2-decimal price across "
    "the comparison boundary.",
)
def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datasets import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        FROM orders
        WHERE o_totalprice > (SELECT round(avg(o_totalprice) * 1.5, 2) FROM orders)
        """
    )


@register(
    "window_moving_sum_3rows",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
           COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame
    FROM orders
    """,
    doc="Bounded ROWS frame (3-row moving sum per customer) — the "
    "sliding-window analytic the reference's unbounded frames never "
    "exercise. (o_orderdate, o_orderkey) ordering is unique, so the "
    "frame contents are deterministic; decimal sum is exact.",
)
def q_window_moving_sum_3rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _orders(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(*asc_nulls_last("o_orderdate", "o_orderkey", "o_totalprice", "o_orderstatus"))
        .rowsBetween(-2, Window.currentRow)
    )
    dec = F.col("o_totalprice").cast("decimal(14,2)")
    return o.select(
        "o_orderkey",
        F.sum(dec).over(w).cast("double").alias("moving_sum"),
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
    )


@register(
    "window_range_frame_price_band",
    """
    SELECT o_orderkey,
           COUNT(*) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_close_cheaper
    FROM orders
    """,
    doc="Value-based RANGE frame: per priority class, how many orders "
    "price within 10k below this one. Range frames are tie-inclusive by "
    "value, so the count is deterministic even with duplicate prices "
    "(unlike a ROWS frame over a non-unique ordering).",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _orders(spark, sf_dir)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select("o_orderkey", F.count(F.lit(1)).over(w).alias("n_close_cheaper"))


@register(
    "stats_moments",
    """
    SELECT o_orderpriority, n,
           sx / n AS mean_price,
           (sxx - sx * sx / n) / (n - 1) AS var_price,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_price
    FROM (
        SELECT o_orderpriority, n, sx,
               (CAST(CAST(sxx_dec AS HUGEINT) // 1073741824 AS DOUBLE) * 1073741824.0
                + CAST(CAST(sxx_dec AS HUGEINT) % 1073741824 AS DOUBLE)) / 10000 AS sxx
        FROM (
            SELECT o_orderpriority,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sx,
                   SUM(CAST(xc * xc AS DECIMAL(38,0))) AS sxx_dec
            FROM (SELECT o_orderpriority,
                         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS xc
                  FROM orders)
            GROUP BY 1
        )
    )
    """,
    doc="Variance/stddev from EXACT decimal power sums (n, Σx, Σx²) with "
    "the final arithmetic spelled identically in both engines — native "
    "stddev/var aggregates use engine-specific update orders (Welford "
    "vs naive) whose FP drift breaks bit-parity; decimal sums are "
    "order-independent, so this is reproducible at any parallelism — "
    "which is also why it's the right formulation at 100 TB.",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    # integer cents: xc < 2^26 so xc**2 fits a long exactly; sums carried
    # in DECIMAL(38,0) (order-independent, exact). Σxc² exceeds 2^63 past
    # ~sf0.1, where Spark's BigDecimal->double rounds once but DuckDB's
    # int128->double combines two 64-bit halves and rounds TWICE (1-ulp
    # drift). So the big sum is split hi·2^30 + lo — hi < 2^53 and
    # lo < 2^30 convert exactly, and the double reconstruction is the
    # same two IEEE ops in both engines. Holds to hi = 2^53, i.e.
    # Σxc² ≈ 1e25 ~ sf 1e7.
    xc = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    agg = o.select("o_orderpriority", xc.alias("xc")).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (F.sum(F.col("xc").cast("decimal(38,0)")).cast("double") / 100).alias("sx"),
        F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)")).alias("sxx_dec"),
    )
    agg = agg.withColumn(
        "sxx",
        (
            F.expr("CAST(sxx_dec div 1073741824 AS DOUBLE)") * 1073741824.0
            + F.expr("CAST(sxx_dec % 1073741824 AS DOUBLE)")
        )
        / 10000,
    )
    # try_divide: n = 1 zeroes the sample-variance denominator — ANSI
    # '/' crashes where the oracle's DuckDB '/' yields NULL (r10 sweep)
    var = F.try_divide(
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"), F.col("n") - 1
    )
    # NO round(): the inputs are exact decimal sums and /,*,sqrt are
    # correctly-rounded IEEE ops, so the raw doubles are bit-identical
    # across engines — round() itself is NOT (HALF_UP-on-BigDecimal vs
    # scaled-multiply) and flipped a half-boundary at sf0.01.
    return agg.select(
        "o_orderpriority",
        "n",
        (F.col("sx") / F.col("n")).alias("mean_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("stddev_price"),
    )


@register(
    "approx_percentile_bounds",
    """
    SELECT o_orderpriority,
           round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS p50_exact,
           COUNT(*) AS n,
           1 AS approx_ok
    FROM orders GROUP BY 1
    """,
    doc="approx_percentile — the single-pass mergeable quantile sketch "
    "(Greenwald-Khanna summaries), the 100 TB path where exact "
    "percentile's per-group sort is too expensive. Sketch merge order "
    "is partition-dependent, so like approx_count_distinct the oracle "
    "checks the exact value plus an error-bound PREDICATE: approx_ok = "
    "[|approx_p50 − exact_p50| ≤ 2%·exact] (far looser than the "
    "accuracy=10000 rank-error guarantee).",
)
def q_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    exact = F.expr("percentile(o_totalprice, 0.5)")
    approx = F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
    return o.groupBy("o_orderpriority").agg(
        F.round(exact, 4).cast("double").alias("p50_exact"),
        F.count("*").alias("n"),
        # a group with no non-NULL values yields NULL from BOTH the
        # sketch and the exact percentile — agreement, not failure
        F.when(approx.isNull() & exact.isNull(), 1)
        .when(F.abs(approx - exact) <= 0.02 * exact, 1)
        .otherwise(0)
        .alias("approx_ok"),
    )


@register(
    "window_count_distinct",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) AS n_prios,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    """,
    doc="Distinct aggregate over a window: Spark forbids DISTINCT in "
    "window functions, so the engine bridges with "
    "size(collect_set(x) OVER w) — semantically COUNT(DISTINCT x) OVER "
    "w, which is exactly what the DuckDB oracle runs. Bounded state: "
    "the set holds distinct values only (5 priorities), not rows.",
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _orders(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w)).alias("n_prios"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    )


@register(
    "map_functions",
    """
    SELECT o_orderkey,
           2 AS n_keys,
           o_orderstatus AS status_val,
           upper(o_orderpriority) AS prio_val,
           1 AS has_status
    FROM orders
    """,
    doc="Map/struct surface (SURVEY §2.8 'map functions absent' row): "
    "build map<string,string> from arrays, then element_at / "
    "map_contains_key / size — Spark-side the values round-trip THROUGH "
    "the map type; the oracle computes the same scalars directly "
    "(DuckDB's MAP dialect differs, values are what's checked).",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("prio")),
        F.array(F.col("o_orderstatus"), F.upper("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        F.size(m).alias("n_keys"),
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "prio").alias("prio_val"),
        F.when(F.map_contains_key(m, "status"), 1).otherwise(0).alias("has_status"),
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey,
           CAST(total_qty AS DOUBLE) AS total_qty,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 210
    ) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    doc="TPC-H Q18 shape: aggregate-with-HAVING (the post-aggregation "
    "predicate surface no other query exercises) feeding joins back to "
    "orders/customer. Catalyst plans HAVING as a filter ABOVE the final "
    "hash aggregate — partial aggregation still runs map-side; the "
    "surviving group keys (rare) drive the join.",
)
def q_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    dec = F.col("l_quantity").cast("decimal(12,2)")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(dec).alias("total_qty"))
        .filter(F.col("total_qty") > 210)
    )
    j = big.join(t["orders"], big.l_orderkey == F.col("o_orderkey")).join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.col("total_qty").cast("double").alias("total_qty"),
        F.col("o_totalprice").cast("double").alias("price"),
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue
    FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: the six-table join with the c_nationkey = "
    "s_nationkey 'local supplier' theta condition folded into the "
    "supplier equi-join. Date filter pushes to the orders scan; region "
    "filter prunes nations before touching the big tables; nation and "
    "region broadcast, the lineitem joins stay key-partitioned for AQE "
    "to size. Revenue in DECIMAL then cast, matching the other TPC-H "
    "queries' money convention.",
)
def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    asia_nations = t["nation"].join(
        F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue")
    )


def _drev() -> F.Column:
    # built lazily: module import happens before any SparkContext exists,
    # and Column construction needs the JVM
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY 1
    """,
    doc="TPC-H Q4 shape (late-shipment priority census): a correlated "
    "EXISTS whose predicate mixes the equi-key with a non-equi date "
    "comparison, decorrelated by Catalyst into a LEFT SEMI join with the "
    "range condition as join residual — the date window still pushes to "
    "the orders scan, and the semi-join keeps only the first match per "
    "order instead of exploding lineitems.",
)
def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t["lineitem"]
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_REV} AS volume
        FROM lineitem
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): the "
    "two-sided nation-pair disjunction over a five-table join. The tiny "
    "nation dim broadcasts TWICE under different aliases; the pair "
    "filter prunes most rows right at the broadcast joins (before the "
    "aggregate), and year(l_shipdate) is cast to INT on both engines "
    "(DuckDB year() is BIGINT).",
)
def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    j = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_ck"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _drev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).cast("double").alias("revenue"))
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT CAST(round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                            THEN {_REV} ELSE 0 END) AS DOUBLE)
                      / CAST(SUM({_REV}) AS DOUBLE), 6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
    doc="TPC-H Q14 shape (promo revenue share): conditional aggregation "
    "— one pass computes both the CASE-gated and the total revenue sum, "
    "no self-join. Sums stay exact DECIMAL; the single lossy step is the "
    "final double division + round, identical IEEE ops in both engines. "
    "The ship-date window pushes to the lineitem scan; part broadcasts.",
)
def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    j = li.join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _drev()).otherwise(F.lit(0).cast("decimal(12,2)"))
    )
    return j.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / F.sum(_drev()).cast("double"), 6
        )
        .cast("double")
        .alias("promo_revenue_pct")
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25)
      AND l_suppkey IS NOT NULL
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0 AND s_suppkey IS NOT NULL)
    GROUP BY 1, 2
    """,
    doc="TPC-H Q16 shape (supplier census with exclusion list): "
    "count(DISTINCT) per group above a NOT IN subquery. The exclusion "
    "becomes a broadcast LEFT ANTI join; NULL keys are excluded "
    "EXPLICITLY on both sides of both dialects, because NOT IN and "
    "anti-join genuinely diverge under NULLs (one NULL in the rhs set "
    "makes SQL NOT IN return ZERO rows — three-valued logic — while an "
    "anti-join ignores it; a NULL lhs is dropped by NOT IN but kept by "
    "an anti-join). The intent semantics — a NULL supplier is neither "
    "a supplier to count nor an exclusion — is the engine convention "
    "for every NOT-IN-shaped exclusion (nullkeys axis, r13). "
    "Brand/size predicates push into the part scan before its "
    "broadcast; the distinct-aggregate expands to the standard "
    "two-level partial agg.",
)
def q_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25)
    )
    bad = (
        t["supplier"]
        .filter((F.col("s_acctbal") < 0) & F.col("s_suppkey").isNotNull())
        .select("s_suppkey")
    )
    li = t["lineitem"].filter(F.col("l_suppkey").isNotNull()).join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_predicates",
    f"""
    SELECT CAST(round(SUM({_REV}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
    """,
    doc="TPC-H Q19 shape (OR-of-ANDs over a join): Catalyst splits the "
    "disjunction into per-side conjunctions it can push — the common "
    "l_quantity range (1..40) and brand/size union reach the scans as "
    "pushed filters while the exact cross-side pairing evaluates as the "
    "join residual; the whole predicate never forces a nested loop "
    "(part stays a broadcast equi-join on p_partkey).",
)
def q_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey")
    )
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return j.filter(cond).agg(
        F.round(F.sum(_drev()), 2).cast("double").alias("revenue")
    )


@register(
    "join_skew_salted",
    """
    SELECT c_mktsegment, count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
    doc="§4 skew recipe for JOINS (ops/skew.py salted_join): the fact "
    "side's key gets a deterministic crc32 salt, the dim side "
    "REPLICATES once per salt value, and the join runs on (key, salt) "
    "— each hot key's rows spread across n_salts reducers instead of "
    "one. The result set is provably the plain join's, which is the "
    "oracle (joined through the salted path, then aggregated per "
    "segment in exact decimal). Manual twin of AQE's skew-join split — "
    "needed when the skewed side is mid-stage (AQE only splits "
    "shuffle-materialized skew); plan-asserted in test_plans.py that "
    "with broadcast disabled the shuffle keys on BOTH sides include "
    "the salt.",
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.skew import salted_join

    t = load_tables(spark, sf_dir)
    fact = t["orders"].select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    dim = t["customer"].select("c_custkey", "c_mktsegment")
    joined = salted_join(fact, dim, key="c_custkey", salt_from="o_orderkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
