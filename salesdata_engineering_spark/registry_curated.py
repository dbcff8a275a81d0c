"""Umbrella registry entries: multi-variant operator families in one query.

The verification driver oracle-checks only the first N registered queries,
so each §2 operator family must land inside that window. These umbrellas
fold a family's variants (e.g. ROLLUP + CUBE + GROUPING SETS, or the four
INTERSECT/EXCEPT forms) into ONE oracle-paired query each — either as a
single wide projection (same row grain) or a tagged union (same schema,
``variant`` column). The individual variant queries stay registered after
the window: pytest still checks all of them, and a driver with no cap
checks everything.

Exactness rules are registry.py's; every fragment here is copied from an
already-oracle-proven constituent query.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .datasets import load_tables, register_views
from .ops.aggregations import cube_agg, rollup_agg
from .ops.windows import asc_nulls_last
from .ops.setops import except_, intersect, union_distinct
from .registry import register
from .registry_ext import _EN, _GATE_SQL, _LANG_CASE, _LANG_RATIOS, SQL_TOKENS


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["orders"]


# ---------------------------------------------------------------------------
# §2.4 — grouping-set family: ROLLUP + CUBE + GROUPING SETS, tagged union
# ---------------------------------------------------------------------------

_GV_PART = """
    SELECT '{tag}' AS variant, l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY {spec}
"""


@register(
    "agg_grouping_variants",
    _GV_PART.format(tag="rollup", spec="ROLLUP (l_returnflag, l_linestatus)")
    + "UNION ALL"
    + _GV_PART.format(tag="cube", spec="CUBE (l_returnflag, l_linestatus)")
    + "UNION ALL"
    + _GV_PART.format(tag="gsets", spec="GROUPING SETS ((l_returnflag), (l_linestatus), ())"),
    doc="§2.4 grouping family umbrella: ROLLUP + CUBE + GROUPING SETS over "
    "the same measure, tagged union. Rollup/cube via the DataFrame API "
    "(ops/aggregations.py), grouping sets via Spark SQL — each variant "
    "plans as ONE expand + hash aggregate. Individual variant queries "
    "remain registered (rollup_qty / cube_qty / grouping_sets_qty).",
)
def q_agg_grouping_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    dec = F.col("l_quantity").cast("decimal(12,2)")
    aggs = dict(sum_qty=F.sum(dec).cast("double"), n=F.count("*"))
    keys = ["l_returnflag", "l_linestatus"]
    r = rollup_agg(li, keys, **aggs).withColumn("variant", F.lit("rollup"))
    c = cube_agg(li, keys, **aggs).withColumn("variant", F.lit("cube"))
    li.createOrReplaceTempView("_curated_gv_li")
    g = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM _curated_gv_li
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    ).withColumn("variant", F.lit("gsets"))
    return r.unionByName(c).unionByName(g).select("variant", *keys, "sum_qty", "n")


# ---------------------------------------------------------------------------
# §2.4 — percentiles + exact-power-sum moments in one grouped pass
# ---------------------------------------------------------------------------


@register(
    "stats_advanced",
    """
    SELECT o_orderpriority, n, p50, p90, min_price, max_price,
           sx / n AS mean_price,
           (sxx - sx * sx / n) / (n - 1) AS var_price,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_price
    FROM (
        SELECT o_orderpriority, n, p50, p90, min_price, max_price, sx,
               (CAST(CAST(sxx_dec AS HUGEINT) // 1073741824 AS DOUBLE) * 1073741824.0
                + CAST(CAST(sxx_dec AS HUGEINT) % 1073741824 AS DOUBLE)) / 10000 AS sxx
        FROM (
            SELECT o_orderpriority,
                   COUNT(*) AS n,
                   round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS p50,
                   round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90,
                   CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
                   CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
                   CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) / 100 AS sx,
                   SUM(CAST(xc * xc AS DECIMAL(38,0))) AS sxx_dec
            FROM (SELECT o_orderpriority, o_totalprice,
                         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS xc
                  FROM orders)
            GROUP BY 1
        )
    )
    """,
    doc="§2.4 statistics umbrella: exact interpolated percentiles "
    "(p50/p90) + min/max + mean/variance/stddev from exact integer-cent "
    "power sums, ONE hash aggregate. Same exactness construction as "
    "percentile_stats + stats_moments (both remain registered); see "
    "stats_moments for why power sums beat native stddev for "
    "cross-engine and cross-parallelism determinism.",
)
def q_stats_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    xc = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    agg = (
        o.select("o_orderpriority", "o_totalprice", xc.alias("xc"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
            (F.sum(F.col("xc").cast("decimal(38,0)")).cast("double") / 100).alias("sx"),
            F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)")).alias("sxx_dec"),
        )
    )
    # hi·2^30 + lo split: Σxc² exceeds 2^63 past ~sf0.1 and DuckDB's
    # int128->double conversion double-rounds where Spark rounds once —
    # see stats_moments (registry_scalar.py) for the full rationale.
    agg = agg.withColumn(
        "sxx",
        (
            F.expr("CAST(sxx_dec div 1073741824 AS DOUBLE)") * 1073741824.0
            + F.expr("CAST(sxx_dec % 1073741824 AS DOUBLE)")
        )
        / 10000,
    )
    # try_divide: n = 1 makes the sample-variance denominator 0 — ANSI
    # '/' crashes where the oracle's DuckDB '/' yields NULL (r10 sweep)
    var = F.try_divide(
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"), F.col("n") - 1
    )
    return agg.select(
        "o_orderpriority",
        "n",
        "p50",
        "p90",
        "min_price",
        "max_price",
        (F.col("sx") / F.col("n")).alias("mean_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("stddev_price"),
    )


# ---------------------------------------------------------------------------
# §2.5 — window-frame family: bounded ROWS, unbounded ROWS, value RANGE,
#        lag/lead — one per-row pass over orders
# ---------------------------------------------------------------------------


@register(
    "window_frames_bounded",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus,
               o_orderpriority
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
           COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus,
               o_orderpriority
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus,
               o_orderpriority
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
           lag(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus,
               o_orderpriority) AS price_lag,
           lead(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus,
               o_orderpriority) AS price_lead,
           COUNT(*) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_close_cheaper
    FROM orders
    """,
    doc="§2.5 frame-family umbrella — the per-customer order carries "
    "EVERY non-key column as a tie-break (dupnullmix probe, r12): two "
    "copies of a key differing only in the RANGE window's partition "
    "column (priority) get genuinely different n_close_cheaper values, "
    "and without a total order the customer-window values pair with "
    "them engine-arbitrarily. 3-row moving sum, running sum "
    "(unbounded→current), lag/lead, and a value-based RANGE frame — one "
    "row per order, two window exchanges (per-customer sort shared by "
    "four functions; per-priority sort for the range frame). Constituent "
    "queries remain registered (window_moving_sum_3rows / "
    "window_range_frame_price_band / window_lag_lead / "
    "window_running_total).",
)
def q_window_frames_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    wc = Window.partitionBy("o_custkey").orderBy(
        *asc_nulls_last("o_orderdate", "o_orderkey", "o_totalprice",
                        "o_orderstatus", "o_orderpriority")
    )
    w3 = wc.rowsBetween(-2, Window.currentRow)
    wrun = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wrange = (
        Window.partitionBy("o_orderpriority")
        .orderBy(*asc_nulls_last("o_totalprice"))
        .rangeBetween(-10000, Window.currentRow)
    )
    dec = F.col("o_totalprice").cast("decimal(14,2)")
    return o.select(
        "o_orderkey",
        F.sum(dec).over(w3).cast("double").alias("moving_sum"),
        F.count(F.lit(1)).over(w3).alias("n_in_frame"),
        F.sum(dec).over(wrun).cast("double").alias("running_sum"),
        F.lag("o_totalprice").over(wc).alias("price_lag"),
        F.lead("o_totalprice").over(wc).alias("price_lead"),
        F.count(F.lit(1)).over(wrange).alias("n_close_cheaper"),
    )


# ---------------------------------------------------------------------------
# §2.7 — set-operation umbrellas
# ---------------------------------------------------------------------------

_BUILDING = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_OPEN_CUSTS = "SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'"


def _building_open(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    t = load_tables(spark, sf_dir)
    building = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_custs = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return building, open_custs


@register(
    "setop_union_compat",
    f"""
    SELECT 'distinct' AS variant, c_custkey AS k, CAST(NULL AS DOUBLE) AS v
    FROM (SELECT c_custkey FROM ({_BUILDING})
          UNION SELECT c_custkey FROM ({_OPEN_CUSTS}))
    UNION ALL
    SELECT 'positional', o_orderkey, CAST(o_totalprice AS DOUBLE)
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT 'positional', o_orderkey, CAST(o_totalprice AS DOUBLE)
    FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="U1 umbrella: distinct unionByName + positional UNION ALL (the "
    "reference's per-file frame union, main.py:184-204), tagged. "
    "Constituents remain registered (setop_union / union_positional).",
)
def q_setop_union_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, open_custs = _building_open(spark, sf_dir)
    u1 = union_distinct(building, open_custs).select(
        F.lit("distinct").alias("variant"),
        F.col("c_custkey").alias("k"),
        F.lit(None).cast("double").alias("v"),
    )
    o = _orders(spark, sf_dir)
    pa = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").cast("double").alias("v")
    )
    pb = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey"), F.col("o_totalprice").cast("double")
    )
    u2 = pa.union(pb).select(F.lit("positional").alias("variant"), "k", "v")
    return u1.unionByName(u2)


@register(
    "setop_multiset_family",
    f"""
    SELECT 'intersect' AS variant, k FROM (
        SELECT c_custkey AS k FROM ({_BUILDING})
        INTERSECT SELECT c_custkey FROM ({_OPEN_CUSTS}))
    UNION ALL
    SELECT 'except', k FROM (
        SELECT c_custkey AS k FROM ({_BUILDING})
        EXCEPT SELECT c_custkey FROM ({_OPEN_CUSTS}))
    UNION ALL
    SELECT 'intersect_all', k FROM (
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'except_all', k FROM (
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    doc="§2.7 umbrella: INTERSECT / EXCEPT (distinct) + INTERSECT ALL / "
    "EXCEPT ALL (multiset), tagged union over the DataFrame API ops. "
    "Constituents remain registered.",
)
def q_setop_multiset_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, open_custs = _building_open(spark, sf_dir)
    o = _orders(spark, sf_dir)
    oo = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    parts = [
        intersect(building, open_custs)
        .select(F.col("c_custkey").alias("k"))
        .select(F.lit("intersect").alias("variant"), "k"),
        except_(building, open_custs)
        .select(F.col("c_custkey").alias("k"))
        .select(F.lit("except").alias("variant"), "k"),
        oo.intersectAll(urgent).select(F.lit("intersect_all").alias("variant"), "k"),
        oo.exceptAll(urgent).select(F.lit("except_all").alias("variant"), "k"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# §2.8 — scalar/string (customer grain) and date/null+predicates (orders)
# ---------------------------------------------------------------------------


#: shared collation-contract docstring suffix for the surfaces the
#: unicode probe axis forked (UNICODESWEEP r11): the engine keeps
#: the JVM's standard semantics and pins them in class-13 tests.
_COLLATE_UPPER = (
    " COLLATION CONTRACT (class-13 pin, tests/test_scale_regressions.py): "
    "upper() applies Unicode FULL case mapping in the JVM root locale — "
    "upper('ß') = 'SS', where DuckDB maps to the single codepoint 'ẞ'; on "
    "non-ASCII corpora the oracle forks by dialect and the engine side is "
    "the contract."
)


@register(
    "scalar_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           substring(c_mktsegment, 1, 3) AS seg3,
           c_name || ' ' || c_mktsegment AS name_seg,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
           coalesce(NULL, c_mktsegment) AS seg_coalesce,
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
    doc="§2.8 umbrella: the F1-F8 scalar surface + extended string "
    "functions in one per-customer projection (pure codegen, no "
    "shuffle). Constituents remain registered (scalar_functions / "
    "string_functions_extended)." + _COLLATE_UPPER,
)
def q_scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.concat(F.col("c_name"), F.lit(" "), F.col("c_mktsegment")).alias("name_seg"),
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos").alias("bal_sign"),
        F.coalesce(F.lit(None), F.col("c_mktsegment")).alias("seg_coalesce"),
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


_P5_WHERE = """o_orderstatus IN ('O', 'P')
      AND o_orderpriority LIKE '%URGENT'
      AND o_totalprice IS NOT NULL
      AND o_totalprice BETWEEN 1000 AND 600000"""


@register(
    "date_null_predicates",
    f"""
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
           strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END AS price_null,
           ifnull(NULL, o_orderpriority) AS prio,
           CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS status_no_f
    FROM orders
    WHERE {_P5_WHERE}
    """,
    doc="§2.8/§2.2 umbrella: the date-function surface + NULL semantics "
    "(nullif/coalesce/ifnull/null-CASE) over the FULL P5 predicate family "
    "(IN-list + LIKE + null-check + BETWEEN range) — predicates reach the parquet scan "
    "as PushedFilters. Constituents remain registered (date_functions / "
    "null_handling / filter_in_like).",
)
def q_date_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir).filter(
        F.col("o_orderstatus").isin("O", "P")
        & F.col("o_orderpriority").like("%URGENT")
        & F.col("o_totalprice").isNotNull()
        & F.col("o_totalprice").between(1000, 600000)
    )
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
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.col("o_totalprice").isNull(), 1).otherwise(0).alias("price_null"),
        F.ifnull(F.lit(None), F.col("o_orderpriority")).alias("prio"),
        F.when(F.col("o_orderstatus") == "F", F.lit(None))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_no_f"),
    )


# ---------------------------------------------------------------------------
# §2.11 — JSON surface: get_json_object + typed from_json in one pass
# ---------------------------------------------------------------------------


@register(
    "json_functions",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
           length(props) AS props_len,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
    doc="§2.11 JSON umbrella: path extraction (get_json_object) + typed "
    "from_json struct access + validity probe, one per-event projection. "
    "Constituents remain registered (json_extract_events / "
    "json_props_struct).",
)
def q_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = load_tables(spark, sf_dir)["events"]
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = e.withColumn("_p", F.from_json("props", schema))
    return parsed.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.col("_p.k").alias("k_typed"),
        F.length("props").alias("props_len"),
        F.when(F.col("_p").isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


# ---------------------------------------------------------------------------
# §2 subqueries — correlated EXISTS/NOT EXISTS + uncorrelated scalar,
# one SQL text run verbatim on BOTH engines
# ---------------------------------------------------------------------------

_SUBQUERIES_SQL = """
    SELECT 'exists' AS variant, c_custkey AS k, CAST(NULL AS DOUBLE) AS val
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'P')
    UNION ALL
    SELECT 'scalar_above_avg', o_orderkey, CAST(o_totalprice AS DOUBLE)
    FROM orders
    WHERE o_totalprice > (SELECT round(avg(o_totalprice) * 1.5, 2) FROM orders)
"""


@register(
    "subqueries_combined",
    _SUBQUERIES_SQL,
    doc="Subquery umbrella, one SQL text on both engines: correlated "
    "EXISTS/NOT EXISTS (Catalyst decorrelates to semi+anti joins — "
    "plan-asserted in tests) + uncorrelated scalar subquery (computed "
    "once, broadcast into the filter). Constituents remain registered "
    "(subquery_exists_urgent / subquery_above_avg_orders).",
)
def q_subqueries_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SUBQUERIES_SQL)


# ---------------------------------------------------------------------------
# §2.10 — sanctioned Python/UDF surface: Arrow pandas_udf + AES roundtrip
# ---------------------------------------------------------------------------


@register(
    "udf_surface",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(o_totalprice AS DOUBLE) / 1000.0 AS price_k,
           o_orderpriority AS decrypted,
           1 AS roundtrip_ok
    FROM orders
    """,
    doc="§2.10 umbrella: Arrow-vectorized @pandas_udf banding/scaling + "
    "JVM aes_encrypt/aes_decrypt roundtrip (parity: reference AES "
    "utility src/main/utility/encrypt_decrypt.py), one per-order pass. "
    "Ciphertext is IV-randomized, so the oracle checks the "
    "decrypt(encrypt(x)) == x identity. Constituents remain registered "
    "(pandas_udf_price_bands / aes_roundtrip).",
)
def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
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

    dec = F.expr(
        "cast(aes_decrypt(aes_encrypt(o_orderpriority, '0123456789abcdef'), "
        "'0123456789abcdef') as string)"
    )
    o = _orders(spark, sf_dir)
    return o.select(
        "o_orderkey",
        band("o_totalprice").alias("band"),
        in_thousands("o_totalprice").alias("price_k"),
        dec.alias("decrypted"),
        # null-safe: decrypt(encrypt(NULL)) IS NULL — a successful roundtrip
        F.when(dec.eqNullSafe(F.col("o_orderpriority")), 1)
        .otherwise(0)
        .alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# X3 — full text profile (token stats + lang-ID + quality) in one scan
# ---------------------------------------------------------------------------


@register(
    "text_profile",
    f"""
    WITH sp AS (SELECT doc_id, {SQL_TOKENS} AS t, text FROM documents),
    m AS (SELECT doc_id,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_unique_tokens,
           list_reduce(list_transform(t, x -> length(x)), (a, b) -> a + b)
             / greatest(len(t), 1) AS mean_len,
           len(list_filter(string_split_regex(
                   regexp_replace(text, '([^\\sA-Za-z0-9]|[0-9]+)', ' \\1 ', 'g'),
                   '\\s+'), p -> p <> '')) AS n_subword_pieces,
           {_LANG_RATIOS},
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
             / greatest(length(text), 1) AS punct_ratio_raw,
           len(list_filter(t, x -> list_contains([{_EN}], x)))
             / greatest(len(t), 1) AS stop_ratio_raw
    FROM sp)
    SELECT doc_id, n_tokens, n_unique_tokens,
           round(mean_len, 6) AS avg_token_len,
           n_subword_pieces,
           ratio_en, ratio_de, ratio_es, ratio_fr,
           {_LANG_CASE} AS lang_pred,
           round(punct_ratio_raw, 6) AS punct_ratio,
           round(stop_ratio_raw, 6) AS stopword_ratio,
           round(mean_len, 6) AS mean_token_len,
           round(0.4 * least(n_tokens / 50.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio_raw)
                 + 0.2 * least(stop_ratio_raw / 0.1, 1.0)
                 + 0.1 * (CASE WHEN mean_len >= 3 AND mean_len <= 8 THEN 1.0 ELSE 0.0 END),
                 6) AS quality
    FROM m
    """,
    doc="X3 umbrella: token counting + BPE-ish piece count + stopword "
    "language-ID + quality score as ONE per-row projection (one scan, "
    "zero shuffles — three separate passes would triple the 100 TB scan "
    "bill). Constituents remain registered (text_token_stats / "
    "text_lang_id / text_quality_score); ext/text.py text_profile.",
)
def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.text import text_profile

    return text_profile(load_tables(spark, sf_dir)["documents"])


# ---------------------------------------------------------------------------
# X5 — deterministic sampling family: hash-gate Bernoulli + stratified
# ---------------------------------------------------------------------------


@register(
    "sample_deterministic",
    f"""
    SELECT 'hash' AS variant, doc_id, lang, n_chars FROM documents
    WHERE {_GATE_SQL.format(salt='sample')} < 1000
    UNION ALL
    SELECT 'stratified', doc_id, lang, CAST(NULL AS INTEGER)
    FROM (SELECT doc_id, lang FROM documents
          WHERE doc_id IS NOT NULL  -- id-less rows are not members
          QUALIFY row_number() OVER (
              PARTITION BY lang
              ORDER BY {_GATE_SQL.format(salt='strata')}, doc_id) <= 10)
    """,
    doc="X5 umbrella: deterministic hash-gate Bernoulli 10% sample + "
    "10-per-language stratified sample, tagged union — membership is a "
    "pure function of the id, so both samples are identical across "
    "engines, reruns, and parallelism. Constituents remain registered "
    "(sample_hash_documents / sample_stratified_by_lang).",
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.sampling import hash_sample, stratified_sample

    d = load_tables(spark, sf_dir)["documents"]
    h = hash_sample(d, "doc_id", 0.1).select(
        F.lit("hash").alias("variant"), "doc_id", "lang", "n_chars"
    )
    s = stratified_sample(d, ["lang"], 10, "doc_id").select(
        F.lit("stratified").alias("variant"),
        "doc_id",
        "lang",
        F.lit(None).cast("int").alias("n_chars"),
    )
    return h.unionByName(s)


@register(
    "udtf_sentence_split",
    """
    SELECT doc_id,
           CAST(len(list_filter(parts[1:u.i-1], p -> trim(p) <> ''))
                AS INTEGER) AS chunk_id,
           u.s AS sentence
    FROM (
        SELECT doc_id, parts,
               unnest(list_transform(generate_series(1, len(parts)),
                                     i -> struct_pack(i := i, s := trim(parts[i])))) AS u
        FROM (SELECT doc_id, string_split(text, '.') AS parts FROM documents)
    )
    WHERE u.s <> ''
    """,
    doc="§2.10 Python UDTF surface (Spark 4 table function): sentence "
    "split as a LATERAL-joined generator class — one input row yields N "
    "output rows with a typed schema. Row-at-a-time Python is the slow "
    "path by design; the registered query exists to pin the API surface "
    "and its exact semantics (chunk ids number the NON-empty trimmed "
    "segments), not as the scale recipe — ext/text.py chunk_documents "
    "is the codegen equivalent for production splitting.",
)
def q_udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id INT, sentence STRING")
    class SplitSentences:
        def eval(self, text: str):
            # strip SPACES only: the DuckDB oracle's trim() removes ' '
            # alone, while Python's bare strip() would also eat \t/\n and
            # shift chunk numbering on non-space whitespace (review nit)
            for i, s in enumerate(
                t.strip(" ") for t in (text or "").split(".") if t.strip(" ")
            ):
                yield i, s

    spark.udtf.register("engine_split_sentences", SplitSentences)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT doc_id, s.chunk_id, s.sentence "
        "FROM documents, LATERAL engine_split_sentences(text) s"
    )


@register(
    "json_variant_surface",
    """
    SELECT event_id,
           CAST(props::JSON ->> 'k' AS BIGINT) AS k_int,
           props::JSON ->> 'k' AS k_str,
           CAST(CAST(props::JSON ->> 'k' AS BIGINT) % 7 AS BIGINT) AS k_mod7
    FROM events
    """,
    doc="Spark 4 VARIANT surface: parse_json builds the binary-encoded "
    "semi-structured type once and variant_get extracts typed paths "
    "from it — the replacement for repeated get_json_object reparses "
    "(each of which re-tokenizes the string; VARIANT parses once per "
    "row and every extraction is an O(path) binary probe). Oracle "
    "extracts the same paths via DuckDB's JSON operators.",
)
def q_json_variant_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        (F.variant_get(v, "$.k", "bigint") % 7).alias("k_mod7"),
    )


@register(
    "arrow_map_batches",
    """
    SELECT vec_id,
           CASE WHEN embedding IS NULL THEN NULL
                ELSE round(sqrt(list_dot_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[])), 6)
           END AS norm
    FROM embeddings
    """,
    doc="Spark 4 mapInArrow surface: a zero-copy Arrow RecordBatch "
    "transform (numpy over the Arrow buffers — no pandas "
    "materialization, no pickling) computing per-vector L2 norms. The "
    "per-element squares accumulate SEQUENTIALLY (cumsum, matching "
    "DuckDB's left-to-right list_dot_product fold) — numpy's default "
    "pairwise-summed np.sum would drift in the last ulp and break the "
    "value oracle. Completes the Python-integration ladder: pandas_udf "
    "(§2.10), mapInPandas (multimodal), UDTF, and now raw Arrow.",
)
def q_arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    emb = load_tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")

    def norms(batches):
        import math

        import numpy as np

        for batch in batches:
            ids = batch.column("vec_id")
            vecs = batch.column("embedding")
            # genuinely zero-copy: one flat values buffer + offsets, no
            # per-row as_py() materialization; np.add.reduceat folds each
            # [offset[i], offset[i+1]) segment STRICTLY left-to-right,
            # matching DuckDB's sequential list_dot_product
            offs = vecs.offsets.to_numpy().astype("int64")
            # normalize to the slice window: values/offsets of a sliced
            # ListArray still reference the full child buffer
            base, stop = int(offs[0]), int(offs[-1])
            flat = (
                vecs.values.to_numpy(zero_copy_only=False)[base:stop]
                .astype("float64")
            )
            starts, ends = offs[:-1] - base, offs[1:] - base
            sq = flat * flat
            if len(sq):
                seg = np.add.reduceat(sq, np.minimum(starts, len(sq) - 1))
                # reduceat quirk: an empty segment returns sq[start] —
                # mask those to the true empty-list dot product, 0.0
                sums = np.where(starts < ends, seg, 0.0)
            else:
                sums = np.zeros(len(starts), dtype="float64")
            nulls = vecs.is_null().to_numpy(zero_copy_only=False)
            out = []
            for i in range(batch.num_rows):
                if nulls[i]:
                    out.append(None)  # NULL embedding -> NULL norm (oracle parity)
                else:
                    # half-away-from-zero round (norms are >= 0, so
                    # floor(x*1e6 + 0.5) == HALF_UP == DuckDB round;
                    # Python's built-in round is banker's and diverges
                    # on exact 6-decimal ties)
                    v = math.sqrt(float(sums[i]))
                    out.append(math.floor(v * 1e6 + 0.5) / 1e6)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.float64())], ["vec_id", "norm"]
            )

    return emb.mapInArrow(norms, "vec_id bigint, norm double")


@register(
    "python_datasource_scan",
    """
    WITH src AS (
        SELECT i AS sale_id, i % 25 AS store_id,
               round((i * 37 % 10000) / 100.0, 2) AS amount
        FROM generate_series(0, 9999) t(i)
    )
    SELECT store_id, count(*) AS n,
           CAST(round(SUM(CAST(amount AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_amount
    FROM src GROUP BY 1
    """,
    doc="Spark 4 Python DataSource API (sources.py "
    "SyntheticSalesDataSource): a pure-Python source serving scans "
    "with real partition planning (one task per range split, state "
    "never crosses splits, retries regenerate deterministically) — the "
    "source-side escape hatch for feeds with no built-in reader. Rows "
    "are a pure function of row id, so the oracle re-derives every "
    "value from generate_series and the parallel read is "
    "value-checked.",
)
def q_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources import SyntheticSalesDataSource

    # re-registration silently replaces, so no guard is needed — and a
    # swallowed real failure (unpicklable class, API absent) would only
    # resurface later as a misleading DATA_SOURCE_NOT_FOUND
    spark.dataSource.register(SyntheticSalesDataSource)
    src = (
        spark.read.format("synthetic_sales")
        .option("n", "10000")
        .option("splits", "8")
        .load()
    )
    return src.groupBy("store_id").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("amount").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_amount"),
    )


@register(
    "fuzzy_linkage_blocked",
    """
    SELECT a.c_nationkey AS block_key,
           count(*) AS n_pairs,
           CAST(SUM(CASE WHEN levenshtein(a.c_name, b.c_name) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(levenshtein(a.c_name, b.c_name)) AS BIGINT) AS sum_dist
    FROM customer a JOIN customer b
         ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    GROUP BY 1
    """,
    doc="Fuzzy record linkage with blocking: candidate pairs form ONLY "
    "within a block (nation), then Levenshtein <= 2 verifies each pair "
    "- the classic dedupe/entity-resolution shape (blocking turns the "
    "O(n^2) all-pairs comparison into per-block quadratics sized by "
    "the blocking key's selectivity; at 100 TB the block key is the "
    "tuning knob - add char-prefix or length bands to split hot "
    "blocks, exactly like the LSH banding the near-dup family uses). "
    "The self-join is a key-partitioned equi-join, never a cross "
    "product; edit distance is integer-exact in both engines.",
)
def q_fuzzy_linkage_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    a = c.select(
        F.col("c_nationkey").alias("block_key"),
        F.col("c_custkey").alias("_ka"),
        F.col("c_name").alias("_na"),
    )
    b = c.select(
        F.col("c_nationkey").alias("block_key"),
        F.col("c_custkey").alias("_kb"),
        F.col("c_name").alias("_nb"),
    )
    # project the distance ONCE: levenshtein is the expensive kernel
    # here, and repeating the expression in the filter and both
    # aggregates would evaluate it up to three times per pair
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("_ka") < F.col("_kb"))
        .withColumn("_dist", F.levenshtein("_na", "_nb"))
        .filter(F.col("_dist") <= 2)
    )
    return pairs.groupBy("block_key").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("_dist") == 0, 1).otherwise(0)).alias("n_exact"),
        F.sum("_dist").alias("sum_dist"),
    )


@register(
    "filter_above_group_p90",
    """
    WITH th AS (
        SELECT o_orderpriority AS pr,
               round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, count(*) AS n_above,
           CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS sum_above
    FROM orders JOIN th ON o_orderpriority = th.pr
    WHERE o_totalprice > th.p90
    GROUP BY 1
    """,
    doc="Group-relative quantile filter: orders above their OWN "
    "priority's p90 — the 'outliers per segment' analytics staple. "
    "Expressed as a per-group exact-percentile aggregate joined back "
    "(broadcast: |groups| rows), NOT as a percentile window over the "
    "fact (which would sort every partition to attach a constant). "
    "Thresholds round to 4dp, same interpolation-parity rule as "
    "percentile_stats; money sums stay DECIMAL.",
)
def q_filter_above_group_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    th = o.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90")
    )
    return (
        o.join(F.broadcast(th), F.col("o_orderpriority") == F.col("pr"))
        .filter(F.col("o_totalprice") > F.col("p90"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("sum_above"),
        )
    )


@register(
    "orders_purchase_streaks",
    """
    WITH mo AS (
        SELECT DISTINCT o_custkey,
               CAST(year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS BIGINT)
                   AS mnum
        FROM orders
    ),
    isl AS (
        SELECT o_custkey, mnum,
               mnum - row_number() OVER (PARTITION BY o_custkey ORDER BY mnum)
                   AS grp
        FROM mo
    ),
    streaks AS (
        SELECT o_custkey, count(*) AS len
        FROM isl GROUP BY o_custkey, grp
    )
    SELECT o_custkey, CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY 1
    """,
    doc="Gaps-and-islands: longest run of CONSECUTIVE active months per "
    "customer via the classic difference trick — a month number minus "
    "its per-customer row_number is constant exactly within an island, "
    "so consecutive runs fall out of one window + one groupBy (no "
    "self-join over the calendar, no iterative chaining). A different "
    "mechanism from session_window (gap threshold over event time): "
    "islands are defined on a DERIVED integer grid. All three steps "
    "share the customer shuffle key.",
)
def q_orders_purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    mo = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("mnum"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("mnum")
    isl = mo.withColumn("grp", F.col("mnum") - F.row_number().over(w))
    streaks = isl.groupBy("o_custkey", "grp").agg(F.count("*").alias("len"))
    return streaks.groupBy("o_custkey").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


@register(
    "revenue_share_hierarchy",
    """
    WITH nrev AS (
        SELECT r_name AS region, n_name AS nation,
               SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(round(rev, 2) AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE), 6)
               AS share_of_region,
           round(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6)
               AS share_of_total
    FROM nrev
    """,
    doc="Ratio-to-report at two hierarchy levels: each nation's revenue "
    "share within its region and globally — unbounded window sums over "
    "the AGGREGATED frame (|nations| rows), never over the fact: the "
    "fact shuffles once into the (region, nation) aggregate and the "
    "percent-of-total windows are driver-trivial. Revenue stays exact "
    "DECIMAL through both window sums; only the final divisions are "
    "double.",
)
def q_revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    nrev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("rev"))
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return nrev.select(
        "region",
        "nation",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(wr).cast("double"), 6
        ).alias("share_of_region"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(wt).cast("double"), 6
        ).alias("share_of_total"),
    )


@register(
    "stats_bivariate_regression",
    """
    WITH s AS (
        SELECT o_orderpriority,
               count(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS sy,
               SUM(CAST(l_cnt AS DECIMAL(14,2))) AS sx,
               SUM(CAST(l_cnt AS DECIMAL(14,2))
                   * CAST(o_totalprice AS DECIMAL(14,2))) AS sxy,
               SUM(CAST(l_cnt AS DECIMAL(14,2))
                   * CAST(l_cnt AS DECIMAL(14,2))) AS sxx,
               SUM(CAST(o_totalprice AS DECIMAL(14,2))
                   * CAST(o_totalprice AS DECIMAL(14,2))) AS syy
        FROM (SELECT o_orderkey, o_orderpriority, o_totalprice,
                     (SELECT count(*) FROM lineitem
                      WHERE l_orderkey = o_orderkey) AS l_cnt
              FROM orders)
        GROUP BY 1
    )
    SELECT o_orderpriority, n,
           CASE WHEN varx > 0 THEN round(cov / varx, 6) END AS slope,
           CASE WHEN varx > 0
                THEN round((CAST(sy AS DOUBLE) - (cov / varx) * CAST(sx AS DOUBLE)) / n, 6)
           END AS intercept,
           CASE WHEN varx > 0 AND vary > 0
                THEN round(cov / (sqrt(varx) * sqrt(vary)), 6)
           END AS corr
    FROM (
        SELECT o_orderpriority, n, sx, sy,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cov,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS varx,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS vary
        FROM s
    )
    """,
    doc="Bivariate OLS + Pearson correlation per group (order value vs "
    "line count): built from EXACT DECIMAL power sums (n, Σx, Σy, Σxy, "
    "Σx², Σy² — order-independent, where the built-in regr_slope/corr "
    "aggregates fold doubles in partition order and drift cross-engine) "
    "with slope/intercept/r assembled in a fixed double sequence — the "
    "same integer-exact-moments discipline as the stats family, "
    "extended to two variables. One correlated-count subquery "
    "(decorrelated to an aggregate join) + one group aggregate.",
)
def q_stats_bivariate_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cnt = t["lineitem"].groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count("*").alias("l_cnt")
    )
    j = t["orders"].join(cnt, F.col("o_orderkey") == F.col("_ok"), "left_outer").select(
        "o_orderpriority",
        F.coalesce(F.col("l_cnt"), F.lit(0)).cast("decimal(14,2)").alias("_x"),
        F.col("o_totalprice").cast("decimal(14,2)").alias("_y"),
    )
    s = j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("_y").alias("sy"),
        F.sum("_x").alias("sx"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    n = F.col("n")
    # degenerate groups (zero or cancellation-negative variance) yield
    # NULL instead of an ANSI divide-by-zero on the Spark side / sqrt
    # domain error on the DuckDB side — guarded identically in both
    m = s.select(
        "o_orderpriority",
        "n",
        sx.alias("_sx"),
        sy.alias("_sy"),
        (sxy - sx * sy / n).alias("_cov"),
        (sxx - sx * sx / n).alias("_varx"),
        (syy - sy * sy / n).alias("_vary"),
    )
    cov, varx, vary = F.col("_cov"), F.col("_varx"), F.col("_vary")
    slope = cov / varx
    return m.select(
        "o_orderpriority",
        "n",
        F.when(varx > 0, F.round(slope, 6)).alias("slope"),
        F.when(
            varx > 0, F.round((F.col("_sy") - slope * F.col("_sx")) / n, 6)
        ).alias("intercept"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(cov / (F.sqrt(varx) * F.sqrt(vary)), 6),
        ).alias("corr"),
    )


@register(
    "parts_abc_analysis",
    """
    WITH rev AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS r
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT l_partkey, r,
               SUM(r) OVER (ORDER BY r DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_r,
               SUM(r) OVER () AS tot_r
        FROM rev
    )
    SELECT l_partkey,
           CAST(round(r, 2) AS DOUBLE) AS revenue,
           round(CAST(cum_r AS DOUBLE) / CAST(tot_r AS DOUBLE), 6) AS cum_share,
           CASE WHEN CAST(cum_r AS DOUBLE) / CAST(tot_r AS DOUBLE) <= 0.8 THEN 'A'
                WHEN CAST(cum_r AS DOUBLE) / CAST(tot_r AS DOUBLE) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
    doc="ABC / Pareto analysis: parts classified by cumulative revenue "
    "share (A = first 80%, B = to 95%, C = tail) — the inventory-"
    "prioritization staple. The cumulative window runs over the "
    "AGGREGATED per-part frame (|parts| rows), never the fact, with a "
    "deterministic (revenue DESC, partkey) order; revenue stays exact "
    "DECIMAL through both window sums so the class boundaries are "
    "reproducible cross-engine. A global cumulative ordering is "
    "inherently a single sorted pass — at 100 TB it runs on the "
    "|parts|-sized rollup, which is the point.",
)
def q_parts_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(14,2)")
            * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("r")
    )
    # r14: the cumulative-share window runs through ops/sorts.py
    # global_cumsum (two-pass range-partitioned running sum) instead of
    # an unpartitioned window that funneled the |parts| rollup through
    # ONE task (VERDICT r13 "What's wrong" 1); r stays exact DECIMAL so
    # the regrouped partial sums are bit-identical to the windowed
    # form. The whole-frame total becomes a 1-row aggregate broadcast
    # via crossJoin — the engine's standard scalar-aggregate shape.
    from .ops.sorts import global_cumsum

    share = F.col("cum_r").cast("double") / F.col("tot_r").cast("double")
    cum = global_cumsum(
        rev,
        order=["r", "l_partkey"],
        directions=["desc", "asc"],
        value="r",
        alias="cum_r",
        persist_key="parts_abc_cum",
    )
    # total from cum, not rev: cum reads the range-partitioned frame
    # global_cumsum swap-persists internally, so the fact rollup is
    # scanned once — an agg over rev would re-run the lineitem pass
    tot = cum.agg(F.sum("r").alias("tot_r"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            F.round("r", 2).cast("double").alias("revenue"),
            F.round(share, 6).alias("cum_share"),
            F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias(
                "abc_class"
            ),
        )
    )


@register(
    "customer_rfm_segments",
    """
    WITH rfm AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS monetary
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT o_custkey,
               ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
        FROM rfm
    )
    SELECT o_custkey, r_score, f_score, m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
                WHEN r_score <= 2 THEN 'recent'
                WHEN f_score <= 2 THEN 'loyal'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
    doc="RFM segmentation: recency/frequency/monetary quintiles (ntile "
    "over the per-customer aggregate with deterministic custkey "
    "tie-break — both engines assign identical quintiles for identical "
    "orderings) folded into the standard champion/recent/loyal/at_risk "
    "segments. The three global ntile windows sort the |customers| "
    "aggregate, never the fact — the same rollup-then-rank discipline "
    "as the ABC analysis; monetary stays exact DECIMAL so orderings "
    "never drift.",
)
def q_customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("monetary"),
    )
    # r14: the three global quintiles run through ops/sorts.py
    # global_ntile (two-pass range-partitioned rank + exact ntile
    # arithmetic) instead of three unpartitioned ntile windows that
    # each funneled the |customers| aggregate through ONE task
    # (VERDICT r13 "What's wrong" 1) — same tiling (global_ntile
    # reproduces the SQL-standard first-r-tiles-get-one-extra rule on
    # the identical total order; desc = NULLS LAST in both forms).
    #
    # r15 adjudication (VERDICT r14 item 4 asked for a global_ntile_multi
    # sharing ONE range pass across the three quintiles): mathematically
    # unavailable — the two-pass substrate needs the frame RANGE-
    # PARTITIONED BY THE SORT KEY, and the three quintiles rank three
    # DIFFERENT total orders (recency/frequency/monetary), so no single
    # range partitioning serves them (global_cumsum_multi shares a pass
    # only because its sums ride one common order). The feasible
    # restructure — three independent narrow pipelines off a swap-
    # persisted base, scores re-attached by eqNullSafe custkey join —
    # was built, oracle-verified (sf0.001/sf0.01 + nullkeys variant),
    # measured a WASH by the pinned-ref interleaved A/B (pairs ratio
    # 0.99 at sf0.1; narrower range exchanges bought, join exchanges
    # paid), and reverted per guide §1.1.
    from .ops.sorts import global_ntile

    scored = rfm
    for alias, key in (
        ("r_score", "last_order"),
        ("f_score", "frequency"),
        ("m_score", "monetary"),
    ):
        scored = global_ntile(
            scored,
            order=[key, "o_custkey"],
            directions=["desc", "asc"],
            n_tiles=5,
            alias=alias,
            persist_key=f"rfm_{alias}",
        )
    scored = scored.select("o_custkey", "r_score", "f_score", "m_score")
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular")
    )
    return scored.select(
        "o_custkey", "r_score", "f_score", "m_score", seg.alias("segment")
    )


@register(
    "basket_brand_affinity",
    """
    WITH ob AS (
        -- an order-less line belongs to no basket (nullkeys axis: the
        -- engine's groupBy would otherwise weld every NULL-key line
        -- into ONE giant false basket while the SQL self-join pairs
        -- none of them — and marginals/order counts fork too)
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_orderkey IS NOT NULL
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM ob),
    brand_n AS (SELECT p_brand, count(*) AS c FROM ob GROUP BY 1),
    pair_n AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS c_ab
        FROM ob a JOIN ob b
             ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, c_ab,
           round(c_ab / CAST(n AS DOUBLE), 6) AS support,
           round((c_ab / CAST(n AS DOUBLE))
                 / ((ca.c / CAST(n AS DOUBLE)) * (cb.c / CAST(n AS DOUBLE))),
                 6) AS lift
    FROM pair_n JOIN brand_n ca ON brand_a = ca.p_brand
                JOIN brand_n cb ON brand_b = cb.p_brand
                CROSS JOIN n_orders
    WHERE c_ab >= 50
    """,
    doc="Market-basket brand affinity: support and lift for brand pairs "
    "co-occurring in an order — the association-rules primitive. The "
    "fact collapses ONCE to per-order sorted brand SETS (one groupBy "
    "with map-side combine — the only order-keyed shuffle in the "
    "query), then pairs expand PARTITION-LOCALLY from each array "
    "(indexed-transform over the sorted set, so x < y by "
    "construction) and hash-aggregate on the tiny (brand, brand) key. "
    "The r5 form self-joined the (order, brand) frame — two shuffled "
    "copies of the basket plus a joined pair stream; the array "
    "expansion replaces that with explode of ~|brands|²/2 combinations "
    "per order, never materializing a keyed pair join (A/B at sf0.1: "
    "2.07 → 1.78 s, same oracle). Brand marginals and the order count "
    "derive from the SAME persisted basket frame; lift is a fixed "
    "double sequence over exact integer counts. The c_ab floor is the "
    "standard min-support prune — at 100 TB it is what keeps the pair "
    "table bounded.",
    bench=True,  # the basket pair expansion is the most load-bearing
    # shape of the r5 analytics families (VERDICT r5 ask #6)
)
def q_basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    from .ext.caching import swap_persist

    # the basket feeds THREE consumers (pair expansion, brand
    # marginals, order count) whose differently-pruned subtrees
    # Catalyst cannot share — without a persist the lineitem⨝part
    # groupBy recomputes per consumer
    baskets = swap_persist(
        "basket_arr",
        t["lineitem"]
        # order-less lines form no basket — mirrored in the oracle's ob
        # CTE (a NULL groupBy key would weld them into one false basket)
        .filter(F.col("l_orderkey").isNotNull())
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_orderkey", "p_brand")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs")),
    )
    n_orders = baskets.agg(F.count("*").alias("n"))
    brand_n = (
        baskets.select(F.explode("bs").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("c"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> transform("
                "slice(bs, i + 2, size(bs)), y -> "
                "struct(x AS brand_a, y AS brand_b))))"
            )
        ).alias("p")
    ).select("p.brand_a", "p.brand_b")
    pair_n = (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 50)
    )
    ca = brand_n.select(F.col("p_brand").alias("_ba"), F.col("c").alias("_ca"))
    cb = brand_n.select(F.col("p_brand").alias("_bb"), F.col("c").alias("_cb"))
    n = F.col("n").cast("double")
    support = F.col("c_ab") / n
    lift = support / ((F.col("_ca") / n) * (F.col("_cb") / n))
    return (
        pair_n.join(F.broadcast(ca), F.col("brand_a") == F.col("_ba"))
        .join(F.broadcast(cb), F.col("brand_b") == F.col("_bb"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.round(support, 6).alias("support"),
            F.round(lift, 6).alias("lift"),
        )
    )


@register(
    "customer_cohort_ltv",
    """
    WITH dated AS (SELECT * FROM orders WHERE o_orderdate IS NOT NULL),
    first AS (
        SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort
        FROM dated GROUP BY 1
    ),
    rev AS (
        SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
               SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS r
        FROM dated GROUP BY 1, 2
    ),
    cell AS (
        SELECT cohort,
               CAST((year(m) * 12 + month(m))
                    - (year(cohort) * 12 + month(cohort)) AS BIGINT) AS month_no,
               SUM(r) AS rev
        FROM rev JOIN first USING (o_custkey)
        GROUP BY 1, 2
    )
    SELECT cohort, month_no,
           CAST(round(rev, 2) AS DOUBLE) AS revenue,
           CAST(round(SUM(rev) OVER (PARTITION BY cohort ORDER BY month_no
                                     ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE)
               AS cum_revenue
    FROM cell
    """,
    doc="Cohort LTV curves: customers bucketed by first-order month, "
    "revenue accumulated by months-since-acquisition — the lifetime-"
    "value triangle growth teams read. Two hash aggregates share the "
    "customer shuffle key, the cohort join is |customers|-sized, and "
    "the cumulative window runs over the tiny (cohort, month) cell "
    "frame in exact DECIMAL, so the curve is reproducible "
    "cross-engine. Month arithmetic is integer (y*12+m), immune to "
    "date_diff dialect drift.",
)
def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # an undated order has no cohort month and no age cell — excluded,
    # like every other event-time operator (nullmix probe axis)
    o = load_tables(spark, sf_dir)["orders"].filter(
        F.col("o_orderdate").isNotNull()
    )
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    rev = o.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("r"))
    mno = (
        (F.year("m") * 12 + F.month("m"))
        - (F.year("cohort") * 12 + F.month("cohort"))
    ).cast("bigint")
    cell = (
        rev.join(first, "o_custkey")
        .groupBy("cohort", mno.alias("month_no"))
        .agg(F.sum("r").alias("rev"))
    )
    w = Window.partitionBy("cohort").orderBy("month_no").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cell.select(
        "cohort",
        "month_no",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(F.sum("rev").over(w), 2).cast("double").alias("cum_revenue"),
    )


@register(
    "grouped_pandas_mad",
    """
    WITH med AS (
        SELECT o_orderpriority, median(o_totalprice) AS med
        FROM orders GROUP BY 1),
    dev AS (
        SELECT o.o_orderpriority, m.med,
               abs(o.o_totalprice - m.med) AS d
        FROM orders o JOIN med m
          ON o.o_orderpriority IS NOT DISTINCT FROM m.o_orderpriority)
    SELECT o_orderpriority, count(*) AS n,
           round(CAST(any_value(med) AS DOUBLE), 4) AS med_price,
           round(CAST(median(d) AS DOUBLE), 4) AS mad
    FROM dev GROUP BY 1
    """,
    doc="Grouped-map applyInPandas (§2.10's remaining surface next to "
    "pandas_udf / UDTF / mapInArrow / applyInPandasWithState): "
    "per-priority median absolute deviation — a genuinely "
    "whole-group-at-once computation (the deviation median needs the "
    "group's own median first, so no single-pass SQL aggregate "
    "expresses it) handed to pandas one Arrow-batched group at a "
    "time. pandas' interpolating median == DuckDB median == "
    "quantile_cont(0.5), and both engines average the two middle "
    "doubles with the same IEEE op, so the oracle (two-CTE nested "
    "median) is value-exact; rounding happens JVM-side after the UDF "
    "so both engines round half-up. Scale: one shuffle on the group "
    "key; each group must fit one worker's memory — the standard "
    "grouped-map contract (keys here are 5 priorities; re-key or "
    "pre-aggregate when groups are unbounded).",
)
def q_grouped_pandas_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderpriority", "o_totalprice"
    )

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["o_totalprice"].median()
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "n": [len(pdf)],
                "med_price": [med],
                "mad": [(pdf["o_totalprice"] - med).abs().median()],
            }
        )

    out = o.groupBy("o_orderpriority").applyInPandas(
        mad,
        "o_orderpriority string, n long, med_price double, mad double",
    )
    return out.select(
        "o_orderpriority",
        "n",
        F.round("med_price", 4).alias("med_price"),
        F.round("mad", 4).alias("mad"),
    )


@register(
    "stats_welch_ttest",
    """
    WITH g AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'BUILDING'
                    ELSE 'OTHER' END AS seg,
               CAST(o_totalprice AS DECIMAL(18,2)) AS y
        FROM orders JOIN customer ON o_custkey = c_custkey),
    s AS (
        SELECT seg, count(*) AS n,
               SUM(y) AS sy, SUM(y * y) AS syy
        FROM g GROUP BY 1),
    m AS (
        SELECT
            (SELECT CAST(sy AS DOUBLE) / n FROM s WHERE seg = 'BUILDING') AS m1,
            (SELECT CAST(sy AS DOUBLE) / n FROM s WHERE seg = 'OTHER') AS m2,
            (SELECT (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                    / (n - 1) / n FROM s WHERE seg = 'BUILDING') AS se1,
            (SELECT (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                    / (n - 1) / n FROM s WHERE seg = 'OTHER') AS se2,
            (SELECT n FROM s WHERE seg = 'BUILDING') AS n1,
            (SELECT n FROM s WHERE seg = 'OTHER') AS n2)
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat
    FROM m
    """,
    doc="Welch's two-sample t statistic (BUILDING-segment order values "
    "vs the rest): the A/B-test primitive, built from EXACT DECIMAL "
    "power sums (n, Σy, Σy² per arm — order-independent) with mean/"
    "variance/t assembled in a fixed double sequence, the same "
    "integer-exact-moments discipline as stats_bivariate_regression "
    "(a naive avg/var_samp fold drifts cross-engine in the last ulp "
    "and the t boundary with it). One fact scan + broadcast dim join "
    "+ a 2-row moment frame; at 100 TB each additional experiment arm "
    "is one more row of the same aggregate, not another scan.",
)
def q_stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    y = F.col("o_totalprice").cast("decimal(18,2)")
    g = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", "BUILDING")
            .otherwise("OTHER")
            .alias("seg"),
            y.alias("y"),
        )
    )
    s = g.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    mean = F.col("sy").cast("double") / F.col("n")
    sev = (
        (
            F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double") / F.col("n")
        )
        / (F.col("n") - 1)
        / F.col("n")
    )
    arms = s.select("seg", "n", mean.alias("m"), sev.alias("se"))

    # one conditional GLOBAL aggregate instead of filter + crossJoin:
    # semantically the oracle's scalar subqueries — ALWAYS one row,
    # with NULL arms when a side (or the whole input) is empty, where
    # the join shape returned zero rows on empty input and silently
    # diverged from the oracle (r10 all-empty sweep)
    def arm(seg: str, col: str):
        return F.max(F.when(F.col("seg") == seg, F.col(col)))

    return arms.agg(
        arm("BUILDING", "n").alias("n1"),
        arm("BUILDING", "m").alias("m1"),
        arm("BUILDING", "se").alias("se1"),
        arm("OTHER", "n").alias("n2"),
        arm("OTHER", "m").alias("m2"),
        arm("OTHER", "se").alias("se2"),
    ).select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(F.col("se1") + F.col("se2")), 6
        ).alias("t_stat"),
    )


@register(
    "stats_wilson_interval",
    """
    WITH v AS (
        SELECT user_id % 2 AS variant,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') > 0
                    AS INT) AS converted
        FROM events GROUP BY user_id),
    s AS (SELECT variant, count(*) AS n,
                 CAST(SUM(converted) AS BIGINT) AS k
          FROM v GROUP BY 1)
    SELECT variant, n, k,
           round(CAST(k AS DOUBLE) / n, 6) AS rate,
           round((CAST(k AS DOUBLE) / n + 1.9208 / n
                  - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                * (1.0 - CAST(k AS DOUBLE) / n) / n
                                + 0.9604 / (n * n)))
                 / (1.0 + 3.8416 / n), 6) AS ci_low,
           round((CAST(k AS DOUBLE) / n + 1.9208 / n
                  + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                * (1.0 - CAST(k AS DOUBLE) / n) / n
                                + 0.9604 / (n * n)))
                 / (1.0 + 3.8416 / n), 6) AS ci_high
    FROM s
    """,
    doc="Wilson-score 95% confidence interval on per-variant conversion "
    "rate (variant = user_id % 2 — the deterministic A/B split; "
    "conversion = any purchase event): the interval every experiment "
    "readout needs, and the one that stays valid at small n where the "
    "normal approximation fails. Built from EXACT integer (n, k) "
    "counts per arm; the interval itself is a fixed sequence of IEEE "
    "double ops over z = 1.96 constants spelled identically in the "
    "oracle, so bounds match bit-for-bit. One user-keyed aggregate + a "
    "2-row arm frame — each additional arm is a row, not a scan.",
)
def q_stats_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    v = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) > 0
        )
        .cast("int")
        .alias("converted")
    ).select((F.col("user_id") % 2).alias("variant"), "converted")
    s = v.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").alias("k")
    )
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    half = 1.96 * F.sqrt(p * (1.0 - p) / n + 0.9604 / (n * n))
    denom = 1.0 + 3.8416 / n
    center = p + 1.9208 / n
    return s.select(
        "variant",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("ci_low"),
        F.round((center + half) / denom, 6).alias("ci_high"),
    )


@register(
    "dq_benford_first_digit",
    """
    WITH d AS (
        -- first SIGNIFICANT digit: sub-1 totals render as '0.xx', so
        -- taking char 1 yields digit 0 and a 1/0 in the expectation
        -- column (extreme probe axis, r12) — Benford is defined on the
        -- leading nonzero digit
        SELECT CAST(regexp_extract(
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                   '[1-9]') AS INT) AS digit
        FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS observed,
           round(log10(1.0 + 1.0 / digit), 6) AS expected
    FROM c CROSS JOIN t
    """,
    doc="Benford's-law first-digit audit over order totals — the "
    "forensic DQ screen for fabricated or systematically generated "
    "monetary data (synthetic uniform generators flunk it loudly, "
    "which this testdata demonstrates): observed first-digit share vs "
    "the log10(1 + 1/d) expectation. The digit is taken from the "
    "DECIMAL(18,2) string rendering (both engines print decimals "
    "without scientific notation — a raw DOUBLE cast could format "
    "differently per engine); counts are exact integers and both "
    "columns are fixed IEEE sequences. One scan + a 9-row digit "
    "frame.",
)
def q_dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    # first SIGNIFICANT digit (see oracle comment): '0.01' must read
    # as digit 1, not 0
    digit = F.regexp_extract(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), "[1-9]", 0
    ).cast("int")
    c = (
        o.filter(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("observed"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("expected"),
    )


@register(
    "orders_seasonal_index",
    """
    WITH m AS (
        SELECT month(o_orderdate) AS month_of_year,
               count(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
    t AS (SELECT CAST(SUM(rev) AS DOUBLE) / SUM(n) AS overall_avg FROM m)
    SELECT month_of_year, n,
           round(CAST(rev AS DOUBLE) / n, 4) AS avg_order_value,
           round((CAST(rev AS DOUBLE) / n) / overall_avg, 6)
               AS seasonal_index
    FROM m CROSS JOIN t
    """,
    doc="Seasonal index per calendar month (classical multiplicative "
    "decomposition's seasonal component): month-of-year average order "
    "value relative to the overall average — index > 1 marks "
    "high-season months, the BI primitive behind deseasonalized "
    "trend lines and inventory planning. Exact DECIMAL revenue sums "
    "per month (order-independent), one broadcast 1-row overall frame, "
    "fixed IEEE divides — the same integer-exact-moments discipline as "
    "the stats family. One fact scan + a 12-row month frame.",
)
def q_orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    m = o.groupBy(F.month("o_orderdate").alias("month_of_year")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    t = m.agg(
        (F.sum("rev").cast("double") / F.sum("n")).alias("overall_avg")
    )
    aov = F.col("rev").cast("double") / F.col("n")
    return m.crossJoin(F.broadcast(t)).select(
        "month_of_year",
        "n",
        F.round(aov, 4).alias("avg_order_value"),
        F.round(aov / F.col("overall_avg"), 6).alias("seasonal_index"),
    )


@register(
    "stats_spearman_qty_price",
    """
    WITH src AS (SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
    hx AS (SELECT x, count(*) AS c FROM src GROUP BY 1),
    rx AS (SELECT x, 2 * (SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                          - c) + c + 1 AS r2
           FROM hx),
    hy AS (SELECT y, count(*) AS c FROM src GROUP BY 1),
    ry AS (SELECT y, 2 * (SUM(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
                          - c) + c + 1 AS r2
           FROM hy),
    rr AS (SELECT rx.r2 AS a, ry.r2 AS b
           FROM src JOIN rx USING (x) JOIN ry USING (y)),
    s AS (SELECT count(*) AS n,
                 SUM(CAST(a AS HUGEINT)) AS sa, SUM(CAST(b AS HUGEINT)) AS sb,
                 SUM(CAST(a AS HUGEINT) * b) AS sab,
                 SUM(CAST(a AS HUGEINT) * a) AS saa,
                 SUM(CAST(b AS HUGEINT) * b) AS sbb
          FROM rr)
    SELECT CAST(n AS BIGINT) AS n_rows,
           floor((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                  - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                         - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                           - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000 AS spearman_r
    FROM s
    """,
    doc="Spearman rank correlation with exact tie handling (quantity "
    "vs price over lineitem) — the robust monotonic-association "
    "audit next to the Pearson OLS family: ranks are TIE-AVERAGED via "
    "the value histogram (rank = cum_before + (c+1)/2, held as exact "
    "integer HALF-units 2*cum_before + c + 1 — the scale factor "
    "cancels out of the correlation), so no data-sized sort and no "
    "float rank anywhere: each variable needs only its distinct-value "
    "histogram + a tiny cumulative window, rows join their ranks by "
    "value, and all five power sums are exact integer sums (HUGEINT/"
    "DECIMAL(38,0) — row-level products reach ~1e12 and their sums "
    "overflow bigint at scale). Only the final correlation arithmetic "
    "touches doubles, as one fixed IEEE sequence floor-quantized at "
    "1e-6.",
)
def q_stats_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    src = li.select(F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y"))

    def rank2(col: str) -> DataFrame:
        # the price histogram is near-unique (≈ data-sized), so the
        # cumulative count rides the two-pass global_cumsum — a bare
        # Window.orderBy here would single-task-sort the histogram
        from .ops.sorts import global_cumsum

        h = src.groupBy(col).agg(F.count("*").alias("_c"))
        cum = global_cumsum(
            h, [col], "_c", alias="_cum", persist_key=f"spearman_rank_{col}"
        )
        return cum.select(
            col,
            (2 * (F.col("_cum") - F.col("_c")) + F.col("_c") + 1).alias("_r2"),
        )

    rr = (
        src.join(F.broadcast(rank2("x").withColumnRenamed("_r2", "_a")), "x")
        .join(rank2("y").withColumnRenamed("_r2", "_b"), "y")
        .select("_a", "_b")
    )
    # cast ONE operand to decimal BEFORE multiplying (and the plain
    # rank sums too): half-ranks reach ~2N, so a long product 4N^2
    # wraps silently past ~1.5e9 rows — inside the 100 TB envelope —
    # while decimal keeps every sum exact (the oracle uses HUGEINT)
    a38 = F.col("_a").cast("decimal(38,0)")
    b38 = F.col("_b").cast("decimal(38,0)")
    s = rr.agg(
        F.count("*").alias("n"),
        F.sum(a38).alias("sa"),
        F.sum(b38).alias("sb"),
        F.sum(a38 * F.col("_b")).alias("sab"),
        F.sum(a38 * F.col("_a")).alias("saa"),
        F.sum(b38 * F.col("_b")).alias("sbb"),
    )
    nd = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    sab, saa, sbb = (
        F.col("sab").cast("double"),
        F.col("saa").cast("double"),
        F.col("sbb").cast("double"),
    )
    # try_divide: a single-row input zeroes both variance terms (r10)
    r = F.try_divide(
        nd * sab - sa * sb,
        F.sqrt((nd * saa - sa * sa) * (nd * sbb - sb * sb)),
    )
    return s.select(
        F.col("n").cast("long").alias("n_rows"),
        (F.floor(r * 1000000 + 0.5) / 1000000).alias("spearman_r"),
    )


@register(
    "stats_ks_two_sample",
    """
    WITH g AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS gu,
               CAST(o_totalprice AS DECIMAL(18,2)) AS y
        FROM orders),
    h AS (SELECT y, SUM(gu) AS c1, COUNT(*) - SUM(gu) AS c2 FROM g GROUP BY 1),
    c AS (SELECT y,
                 SUM(c1) OVER (ORDER BY y) AS cum1,
                 SUM(c2) OVER (ORDER BY y) AS cum2
          FROM h),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
          FROM h),
    d AS (SELECT y,
                 abs(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1)
                     AS dnum
          FROM c, t),
    m AS (SELECT max(dnum) AS md FROM d)
    SELECT n1, n2,
           round(CAST(md AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS ks_d,
           CAST(min(y) AS DOUBLE) AS ks_at
    FROM d, m, t
    WHERE dnum = md
    GROUP BY n1, n2, md
    """,
    doc="Kolmogorov-Smirnov two-sample distance between URGENT and "
    "non-URGENT order-value distributions — the nonparametric "
    "did-the-distribution-shift test (drift detection over any metric "
    "column). Exactness: D = max|F1-F2| is evaluated as the INTEGER "
    "max of |cum1*n2 - cum2*n1| over the pooled value histogram — no "
    "float until the final division — so the argmax row (ks_at, tie "
    "-> smallest value) and the distance are engine-independent. "
    "Scale: the ECDF cumulation rides the two-pass global_cumsum_multi "
    "(one range exchange computes BOTH group cumulations; a bare "
    "ORDER-BY window would single-task the near-unique price "
    "histogram), and everything after the histogram is "
    "histogram-sized, not data-sized.",
)
def q_stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sorts import global_cumsum_multi

    o = load_tables(spark, sf_dir)["orders"]
    g = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("gu"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    h = g.groupBy("y").agg(
        F.sum("gu").alias("c1"),
        (F.count("*") - F.sum("gu")).alias("c2"),
    )
    cum = global_cumsum_multi(
        h, ["y"], {"cum1": "c1", "cum2": "c2"}, persist_key="ks_ecdf"
    )
    # totals read the persisted ranged histogram inside the cum frame —
    # no second scan of orders
    tot = cum.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "y",
        "n1",
        "n2",
        F.abs(
            F.col("cum1").cast("decimal(38,0)") * F.col("n2")
            - F.col("cum2").cast("decimal(38,0)") * F.col("n1")
        ).alias("dnum"),
    )
    m = d.agg(F.max("dnum").alias("md"))
    return (
        d.join(F.broadcast(m), d["dnum"] == m["md"])
        .groupBy("n1", "n2", "md")
        .agg(F.min("y").alias("ymin"))
        .select(
            "n1",
            "n2",
            # try_divide: an absent sample makes n1*n2 = 0 (r10 sweep)
            F.round(
                F.try_divide(
                    F.col("md").cast("double"),
                    F.col("n1").cast("double") * F.col("n2"),
                ),
                6,
            ).alias("ks_d"),
            F.col("ymin").cast("double").alias("ks_at"),
        )
    )


@register(
    "stats_mannwhitney_u",
    """
    WITH g AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS gu,
               CAST(o_totalprice AS DECIMAL(18,2)) AS y
        FROM orders),
    h AS (SELECT y, SUM(gu) AS c1, COUNT(*) AS c FROM g GROUP BY 1),
    c AS (SELECT y, c1, c, SUM(c) OVER (ORDER BY y) AS cum FROM h),
    s AS (SELECT CAST(SUM(c1) AS HUGEINT) AS n1,
                 CAST(SUM(c - c1) AS HUGEINT) AS n2,
                 SUM(CAST(c1 AS HUGEINT) * (2 * (cum - c) + c + 1)) AS r12,
                 SUM(CAST(c AS HUGEINT) * c * c - c) AS ties
          FROM c)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(CAST(r12 - n1 * (n1 + 1) AS DOUBLE) / 2, 1)
               AS u1,
           round((CAST(r12 - n1 * (n1 + 1) AS DOUBLE) / 2
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12
                        * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1)
                           - CAST(ties AS DOUBLE)
                             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))),
                 6) AS z_stat
    FROM s
    """,
    doc="Mann-Whitney U rank-sum test (URGENT vs non-URGENT order "
    "values) with the tie-corrected normal approximation — the "
    "nonparametric alternative to stats_welch_ttest when values are "
    "skewed. Exactness: the half-rank trick from stats_spearman (2x "
    "average tied rank is an integer) keeps the rank sum R1, U, and "
    "the tie term sum(t^3 - t) EXACT integers off one pooled value "
    "histogram; only the final mu/sigma/z assembly is a fixed double "
    "sequence spelled identically in the oracle. Scale: one histogram "
    "aggregate + the two-pass global cumsum; every later frame is "
    "histogram-sized.",
)
def q_stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sorts import global_cumsum

    o = load_tables(spark, sf_dir)["orders"]
    g = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("gu"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    h = g.groupBy("y").agg(F.sum("gu").alias("c1"), F.count("*").alias("c"))
    cum = global_cumsum(h, ["y"], "c", alias="cum", persist_key="mwu_ecdf")
    c1d = F.col("c1").cast("decimal(38,0)")
    cd = F.col("c").cast("decimal(38,0)")
    r2 = 2 * (F.col("cum") - F.col("c")) + F.col("c") + 1
    s = cum.agg(
        F.sum(c1d).alias("n1"),
        F.sum(cd - F.col("c1")).alias("n2"),
        F.sum(c1d * r2).alias("r12"),
        F.sum(cd * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
    )
    # U1 = R1 - n1(n1+1)/2, carried doubled so it stays an exact
    # integer; the review pass caught the original 2*n1*n2 + ... form,
    # which is U2 = n1*n2 - U1 and inverts the z sign
    u2 = F.col("r12") - F.col("n1") * (F.col("n1") + 1)
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = n1d + n2d
    # try_divide: nd = 1 zeroes the tie-correction denominator (r10)
    var = n1d * n2d / 12 * (
        (nd + 1) - F.try_divide(F.col("ties").cast("double"), nd * (nd - 1))
    )
    u1 = u2.cast("double") / 2
    return s.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(u1, 1).alias("u1"),
        F.round(F.try_divide(u1 - n1d * n2d / 2, F.sqrt(var)), 6).alias(
            "z_stat"
        ),
    )


@register(
    "revenue_gini_by_nation",
    """
    WITH rev AS (
        SELECT c_nationkey AS nation, c_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice IS NOT NULL
        GROUP BY 1, 2),
    r AS (SELECT nation, x,
                 row_number() OVER (PARTITION BY nation ORDER BY x, c_custkey)
                     AS i
          FROM rev),
    s AS (SELECT nation, COUNT(*) AS n_customers,
                 SUM(x) AS sx, SUM(i * x) AS six
          FROM r GROUP BY 1)
    SELECT nation, n_customers,
           CAST(sx AS DOUBLE) AS total_revenue,
           round(CAST(2 * six - (n_customers + 1) * sx AS DOUBLE)
                 / CAST(n_customers * sx AS DOUBLE), 6) AS gini
    FROM s
    """,
    doc="Gini coefficient of customer revenue concentration per nation "
    "(Lorenz-curve inequality: 0 = revenue spread evenly, ->1 = one "
    "customer is the book) — the concentration readout behind "
    "parts_abc_analysis's 80/20 cut, as one number per market. "
    "Exactness: G = (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)) over "
    "ranks i ordered by (x, custkey) — rank-weighted DECIMAL sums are "
    "exact and order-independent, one double division at the end. "
    "Scale: the rank window partitions BY NATION (bounded per-market "
    "cardinality), so no global sort; the customer rollup is one "
    "hash aggregate off the fact scan.",
)
def q_revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    # a NULL price is not a revenue sample (nullmix convention): a
    # customer whose every order is NULL-priced would carry a NULL x
    # into the rank window, where Spark (NULLS FIRST) and the SQL
    # default (NULLS LAST) assign different ranks to every REAL sample
    rev = (
        t["orders"]
        .filter(F.col("o_totalprice").isNotNull())
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
    )
    w = Window.partitionBy("nation").orderBy("x", "c_custkey")
    r = rev.withColumn("i", F.row_number().over(w))
    s = r.groupBy("nation").agg(
        F.count("*").alias("n_customers"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    num = 2 * F.col("six") - (F.col("n_customers") + 1) * F.col("sx")
    den = F.col("n_customers") * F.col("sx")
    return s.select(
        "nation",
        "n_customers",
        F.col("sx").cast("double").alias("total_revenue"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("gini"),
    )


@register(
    "concentration_entropy_hhi",
    """
    WITH k AS (SELECT c_nationkey AS nation, o_orderpriority AS cat,
                      count(*) AS k
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY 1, 2),
    t AS (SELECT nation, CAST(SUM(k) AS BIGINT) AS n,
                 count(*) AS n_categories
          FROM k GROUP BY 1),
    s AS (SELECT k.nation,
                 CAST(round(k.k * ln(CAST(t.n AS DOUBLE) / k.k) * 1000000)
                      AS BIGINT) AS term,
                 CAST(k.k AS HUGEINT) * k.k AS k2
          FROM k JOIN t ON k.nation = t.nation)
    SELECT t.nation, t.n AS n_orders, t.n_categories,
           round(CAST(SUM(s.term) AS DOUBLE) / t.n / 1000000, 6)
               AS entropy_nats,
           round(CAST(SUM(s.k2) AS DOUBLE) / (CAST(t.n AS DOUBLE) * t.n), 6)
               AS hhi
    FROM s JOIN t ON s.nation = t.nation
    GROUP BY 1, 2, 3
    """,
    doc="Shannon entropy + Herfindahl-Hirschman index of the "
    "order-priority mix per nation — the two standard concentration "
    "readouts (entropy: how even is the mix; HHI: how dominated). "
    "Exactness: each entropy term k*ln(n/k) is quantized to integer "
    "micro-nats BEFORE summing (the text_bigram_logprob discipline — "
    "integer sums are order-independent where a double sum is not), "
    "and HHI's sum(k^2) is an exact integer; one double division each "
    "at the end. Scale: one fact-shuffle hash aggregate to (nation, "
    "category) counts; everything after is category-mix-sized.",
)
def q_concentration_entropy_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nation"), F.col("o_orderpriority").alias("cat"))
        .agg(F.count("*").alias("k"))
    )
    tot = k.groupBy("nation").agg(
        F.sum("k").cast("long").alias("n"), F.count("*").alias("n_categories")
    )
    s = k.join(tot, "nation").select(
        "nation",
        "n",
        "n_categories",
        F.round(F.col("k") * F.log(F.col("n").cast("double") / F.col("k")) * 1000000)
        .cast("bigint")
        .alias("term"),
        (F.col("k").cast("decimal(38,0)") * F.col("k")).alias("k2"),
    )
    return s.groupBy("nation", F.col("n").alias("n_orders"), "n_categories").agg(
        F.round(F.sum("term").cast("double") / F.first("n") / 1000000, 6).alias(
            "entropy_nats"
        ),
        F.round(
            F.sum("k2").cast("double")
            / (F.first("n").cast("double") * F.first("n")),
            6,
        ).alias("hhi"),
    )


@register(
    "survival_kaplan_meier",
    """
    WITH cust AS (SELECT o_custkey,
                         min(CAST(o_orderdate AS DATE)) AS f,
                         max(CAST(o_orderdate AS DATE)) AS l
                  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
    mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders),
    obs AS (SELECT date_diff('day', f, l) AS d,
                   CASE WHEN date_diff('day', l, m) > 365 THEN 1 ELSE 0 END
                       AS event
            FROM cust, mx),
    h AS (SELECT d, CAST(SUM(event) AS BIGINT) AS deaths,
                 count(*) AS m_count
          FROM obs GROUP BY 1),
    t AS (SELECT CAST(SUM(m_count) AS BIGINT) AS n_total FROM h),
    c AS (SELECT d, deaths, m_count,
                 t.n_total - SUM(m_count) OVER (ORDER BY d) + m_count AS r
          FROM h, t),
    terms AS (SELECT d, deaths, r,
                     CASE WHEN deaths > 0 AND r > deaths
                          THEN CAST(round(ln(CAST(r AS DOUBLE) / (r - deaths))
                                          * 1000000) AS BIGINT)
                          ELSE 0 END AS term,
                     CASE WHEN deaths > 0 AND r = deaths THEN 1 ELSE 0 END
                         AS dead_end
              FROM c),
    km AS (SELECT d, deaths, r,
                  SUM(term) OVER (ORDER BY d) AS cumterm,
                  SUM(dead_end) OVER (ORDER BY d) AS cumdead
           FROM terms)
    SELECT d AS duration_days, CAST(r AS BIGINT) AS at_risk, deaths,
           CASE WHEN cumdead = 0
                THEN round(-CAST(cumterm AS DOUBLE) / 1000000, 6) END
               AS log_survival
    FROM km WHERE deaths > 0
    """,
    doc="Kaplan-Meier survival estimator over customer lifetimes "
    "(duration = days between first and last order; churn event = "
    "last order more than 365 days before the dataset's end, else "
    "censored): the product-limit curve behind every retention/LTV "
    "readout, emitted at each event time with the at-risk count. "
    "Exactness: the survival product is carried in LOG space as a "
    "cumulative sum of integer micro-nat terms ln(r/(r-d)) — "
    "order-independent, no cross-engine exp drift; S(t) = "
    "exp(log_survival), and log_survival is NULL past a time where "
    "the whole risk set dies (S = 0). Scale: one customer rollup "
    "(hash agg on the order fact), then everything is "
    "duration-histogram-sized — durations in days are "
    "calendar-bounded, so the cumulation windows ride a bounded "
    "series, not the data.",
)
def q_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # a customer with no dated orders has no observable duration —
    # not a study subject (nullmix probe axis)
    o = load_tables(spark, sf_dir)["orders"].filter(
        F.col("o_orderdate").isNotNull()
    )
    od = F.col("o_orderdate").cast("date")
    cust = o.groupBy("o_custkey").agg(F.min(od).alias("f"), F.max(od).alias("l"))
    mx = o.agg(F.max(od).alias("m"))
    obs = cust.crossJoin(F.broadcast(mx)).select(
        F.datediff("l", "f").alias("d"),
        F.when(F.datediff("m", "l") > 365, 1).otherwise(0).alias("event"),
    )
    h = obs.groupBy("d").agg(
        F.sum("event").cast("long").alias("deaths"), F.count("*").alias("m_count")
    )
    t = h.agg(F.sum("m_count").cast("long").alias("n_total"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = h.crossJoin(F.broadcast(t)).withColumn(
        "r", F.col("n_total") - F.sum("m_count").over(w) + F.col("m_count")
    )
    terms = c.select(
        "d",
        "deaths",
        "r",
        F.when(
            (F.col("deaths") > 0) & (F.col("r") > F.col("deaths")),
            F.round(
                F.log(F.col("r").cast("double") / (F.col("r") - F.col("deaths")))
                * 1000000
            ).cast("bigint"),
        )
        .otherwise(0)
        .alias("term"),
        F.when((F.col("deaths") > 0) & (F.col("r") == F.col("deaths")), 1)
        .otherwise(0)
        .alias("dead_end"),
    )
    km = terms.select(
        "d",
        "deaths",
        "r",
        F.sum("term").over(w).alias("cumterm"),
        F.sum("dead_end").over(w).alias("cumdead"),
    )
    return km.filter(F.col("deaths") > 0).select(
        F.col("d").alias("duration_days"),
        F.col("r").cast("long").alias("at_risk"),
        "deaths",
        F.when(
            F.col("cumdead") == 0,
            F.round(-F.col("cumterm").cast("double") / 1000000, 6),
        ).alias("log_survival"),
    )


@register(
    "orders_open_backlog_daily",
    """
    WITH spans AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS d0,
               max(CAST(l.l_shipdate AS DATE)) AS d1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
    delta AS (
        SELECT day, CAST(SUM(x) AS BIGINT) AS dx FROM (
            SELECT d0 AS day, 1 AS x FROM spans
            UNION ALL
            SELECT d1 + 1 AS day, -1 AS x FROM spans)
        GROUP BY 1)
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(SUM(dx) OVER (ORDER BY day) AS BIGINT) AS open_orders
    FROM delta
    """,
    doc="Open-order backlog as a daily step function: each order is "
    "open from its order date through its last line's ship date; "
    "the classic interval-stabbing sweep turns every span into a +1 "
    "at the start and a -1 the day after the end, and the running sum "
    "over change days IS the backlog — O(|orders|) events instead of "
    "the O(|orders| x days) explode a per-day join would cost. All "
    "integer counts, so the curve is exact. Scale: one hash aggregate "
    "per order for the span, one tiny change-day histogram "
    "(calendar-bounded), and the cumulation rides the two-pass "
    "global_cumsum — no data-sized single-partition window.",
)
def q_orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sorts import global_cumsum

    t = load_tables(spark, sf_dir)
    spans = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("d0"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("d1"))
    )
    delta = (
        spans.select(F.col("d0").alias("day"), F.lit(1).alias("x"))
        .unionAll(
            spans.select(F.date_add("d1", 1).alias("day"), F.lit(-1).alias("x"))
        )
        .groupBy("day")
        .agg(F.sum("x").cast("long").alias("dx"))
    )
    out = global_cumsum(delta, ["day"], "dx", alias="open_orders", persist_key="backlog_cum")
    return out.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("open_orders").cast("long").alias("open_orders"),
    )


@register(
    "stats_trimmed_mean",
    """
    WITH v AS (SELECT o_orderpriority AS grp,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS y
               FROM orders WHERE o_totalprice IS NOT NULL),
    h AS (SELECT grp, y, count(*) AS c FROM v GROUP BY 1, 2),
    t AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    cum AS (SELECT h.grp, h.y, h.c, t.n,
                   CAST(floor(t.n / 20) AS BIGINT) AS d,
                   SUM(h.c) OVER (PARTITION BY h.grp ORDER BY h.y) AS cm
            FROM h JOIN t ON h.grp = t.grp),
    kept AS (SELECT grp, n, d,
                    greatest(least(cm, n - d) - greatest(cm - c, d),
                             0) AS k,
                    y
             FROM cum)
    SELECT grp, n AS n_rows, CAST(n - 2 * d AS BIGINT) AS n_kept,
           round(CAST(SUM(k * y) AS DOUBLE) / (n - 2 * d), 6)
               AS trimmed_mean
    FROM kept GROUP BY grp, n, d
    """,
    doc="5%-trimmed mean of order value per priority: drop the lowest "
    "and highest floor(n/20) rows by value, average the rest — the "
    "outlier-robust center. Exactness AND scale come from the same "
    "move: ranks live on the VALUE HISTOGRAM, not the rows — each "
    "value bucket contributes kept = clamp(cum, d..n-d) - clamp(cum-c)"
    " rows (pure integer arithmetic, the graph-threshold pattern), "
    "its decimal y times an integer, summed exactly. No per-row "
    "window at all: a naive row_number over 5 giant priority "
    "partitions would funnel the fact through 5 tasks at 100 TB, the "
    "histogram cumulation is bucket-sized.",
)
def q_stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    # a NULL measurement is not a sample: it must not occupy ranks or
    # inflate n (matches how avg/median/quantile skip NULLs)
    v = o.filter(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    h = v.groupBy("grp", "y").agg(F.count("*").alias("c"))
    t = h.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    w = (
        Window.partitionBy("grp")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        h.join(F.broadcast(t), "grp")
        .withColumn("d", F.floor(F.col("n") / 20).cast("long"))
        .withColumn("cm", F.sum("c").over(w))
    )
    kept = cum.select(
        "grp",
        "n",
        "d",
        "y",
        F.greatest(
            F.least(F.col("cm"), F.col("n") - F.col("d"))
            - F.greatest(F.col("cm") - F.col("c"), F.col("d")),
            F.lit(0),
        ).alias("k"),
    )
    return kept.groupBy("grp", F.col("n").alias("n_rows"), "d").agg(
        F.round(
            F.sum(F.col("k") * F.col("y")).cast("double")
            / (F.first("n") - 2 * F.first("d")),
            6,
        ).alias("trimmed_mean")
    ).select(
        "grp",
        "n_rows",
        (F.col("n_rows") - 2 * F.col("d")).cast("long").alias("n_kept"),
        "trimmed_mean",
    )


@register(
    "feature_target_encoding_loo",
    """
    WITH o AS (SELECT o_orderkey, c_mktsegment AS seg,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS y
               FROM orders JOIN customer ON o_custkey = c_custkey),
    g AS (SELECT seg, SUM(y) AS sy, count(*) AS n FROM o GROUP BY 1)
    SELECT o.o_orderkey, o.seg,
           CASE WHEN g.n > 1
                THEN floor(CAST(g.sy - o.y AS DOUBLE) / (g.n - 1)
                           * 1000000 + 0.5) / 1000000
           END AS seg_loo_mean
    FROM o JOIN g ON o.seg = g.seg
    """,
    doc="Leave-one-out target encoding: each order's market segment "
    "encoded as the mean order value of the OTHER orders in that "
    "segment, (sum - y)/(n - 1) — the leakage-safe categorical "
    "feature every tabular training pipeline builds (plain "
    "mean-encoding leaks the row's own label). Exactness: group sums "
    "are exact decimals, the subtraction is decimal, one double "
    "division per row; singleton groups gate to NULL with the same "
    "expression both engines. Scale: one hash aggregate to the tiny "
    "per-segment frame, broadcast back over the fact — the encode "
    "pass never shuffles the fact.",
)
def q_feature_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        )
    )
    g = o.groupBy("seg").agg(F.sum("y").alias("sy"), F.count("*").alias("n"))
    return o.join(F.broadcast(g), "seg").select(
        "o_orderkey",
        "seg",
        F.when(
            F.col("n") > 1,
            # floor-quantize, not round(_, 6): at sf1's 1.5M output rows
            # the engines' double-round implementations disagree in the
            # last digit near rounding boundaries (the events-interpolate
            # finding); floor(x*1e6 + 0.5) is the same IEEE ops in both
            F.floor(
                (F.col("sy") - F.col("y")).cast("double")
                / (F.col("n") - 1)
                * 1000000
                + 0.5
            )
            / 1000000,
        ).alias("seg_loo_mean"),
    )


@register(
    "stats_chisq_independence",
    """
    WITH cells AS (SELECT o_orderpriority AS pri, c_mktsegment AS seg,
                          count(*) AS k
                   FROM orders JOIN customer ON o_custkey = c_custkey
                   GROUP BY 1, 2),
    rt AS (SELECT pri, CAST(SUM(k) AS BIGINT) AS r FROM cells GROUP BY 1),
    ct AS (SELECT seg, CAST(SUM(k) AS BIGINT) AS c FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(k) AS BIGINT) AS n,
                 (count(DISTINCT pri) - 1) * (count(DISTINCT seg) - 1) AS df
          FROM cells),
    terms AS (SELECT CAST(round((k - CAST(rt.r AS DOUBLE) * ct.c / t.n)
                                * (k - CAST(rt.r AS DOUBLE) * ct.c / t.n)
                                / (CAST(rt.r AS DOUBLE) * ct.c / t.n)
                                * 1000000) AS BIGINT) AS term,
                    t.n, t.df
             FROM cells JOIN rt ON cells.pri = rt.pri
                        JOIN ct ON cells.seg = ct.seg
                        CROSS JOIN t)
    SELECT n, df, round(CAST(SUM(term) AS DOUBLE) / 1000000, 6) AS chi2
    FROM terms GROUP BY n, df
    """,
    doc="Chi-square test of independence on the order-priority x "
    "market-segment contingency table — is the priority mix the same "
    "across segments (dq_chisq_uniform_priority's two-way sibling; "
    "the categorical-drift test between any two columns). Exactness: "
    "observed counts and margins are exact integers; each cell's "
    "(o-e)^2/e is a fixed IEEE sequence quantized to integer "
    "micro-units before the order-free sum. NOTE the contingency "
    "assumes every (pri, seg) cell observed (true for this data); "
    "zero cells would need a margins cross join. Scale: one fact "
    "aggregate to a |pri|x|seg| cell frame; everything after is "
    "cell-sized.",
)
def q_stats_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cells = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count("*").alias("k"))
    )
    rt = cells.groupBy("pri").agg(F.sum("k").cast("long").alias("r"))
    ct = cells.groupBy("seg").agg(F.sum("k").cast("long").alias("c"))
    tot = cells.agg(
        F.sum("k").cast("long").alias("n"),
        (
            (F.count_distinct("pri") - 1) * (F.count_distinct("seg") - 1)
        ).alias("df"),
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    terms = (
        cells.join(F.broadcast(rt), "pri")
        .join(F.broadcast(ct), "seg")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "df",
            F.round((F.col("k") - e) * (F.col("k") - e) / e * 1000000)
            .cast("bigint")
            .alias("term"),
        )
    )
    return terms.groupBy("n", "df").agg(
        F.round(F.sum("term").cast("double") / 1000000, 6).alias("chi2")
    )


@register(
    "dq_iqr_outliers",
    """
    WITH v AS (SELECT o_orderpriority AS grp,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS y
               FROM orders WHERE o_totalprice IS NOT NULL),
    h AS (SELECT grp, y, count(*) AS c FROM v GROUP BY 1, 2),
    t AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    cum AS (SELECT h.grp, h.y, h.c, t.n,
                   SUM(h.c) OVER (PARTITION BY h.grp ORDER BY h.y) AS cm
            FROM h JOIN t ON h.grp = t.grp),
    q AS (SELECT grp, max(n) AS n,
                 min(CASE WHEN cm * 4 >= n THEN y END) AS q1,
                 min(CASE WHEN cm * 4 >= 3 * n THEN y END) AS q3
          FROM cum GROUP BY grp),
    b AS (SELECT grp, n, q1, q3,
                 5 * q1 - 3 * q3 AS lo2,
                 5 * q3 - 3 * q1 AS hi2
          FROM q)
    SELECT b.grp, b.n AS n_rows,
           CAST(b.q1 AS DOUBLE) AS q1, CAST(b.q3 AS DOUBLE) AS q3,
           CAST(SUM(CASE WHEN 2 * h.y < b.lo2 THEN h.c ELSE 0 END) AS BIGINT)
               AS n_low,
           CAST(SUM(CASE WHEN 2 * h.y > b.hi2 THEN h.c ELSE 0 END) AS BIGINT)
               AS n_high
    FROM h JOIN b ON h.grp = b.grp
    GROUP BY 1, 2, 3, 4
    """,
    doc="IQR outlier audit per order priority: nearest-rank q1/q3 "
    "picked by integer rank arithmetic on the value histogram "
    "(cum*4 >= n / 3n — exact order statistics, never interpolated "
    "floats), Tukey fences compared as 2y vs 5*q1-3*q3 so 1.5*IQR "
    "stays in exact DECIMAL arithmetic, and the out-of-fence counts — the distributional "
    "DQ rule next to dq_expectations_orders' schema rules. Scale: "
    "the same histogram-not-rows discipline as stats_trimmed_mean — "
    "one fact aggregate, then every frame is bucket-sized, the "
    "cumulation partitioned per group.",
)
def q_dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    # a NULL measurement is not a sample: it must not occupy ranks or
    # inflate n (matches how avg/median/quantile skip NULLs)
    v = o.filter(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    h = v.groupBy("grp", "y").agg(F.count("*").alias("c"))
    from .ext.caching import swap_persist

    h = swap_persist("iqr_hist", h)
    t = h.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    w = (
        Window.partitionBy("grp")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.join(F.broadcast(t), "grp").withColumn("cm", F.sum("c").over(w))
    q = cum.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cm") * 4 >= F.col("n"), F.col("y"))).alias("q1"),
        F.min(F.when(F.col("cm") * 4 >= 3 * F.col("n"), F.col("y"))).alias("q3"),
    )
    # fences scaled by 2 so Tukey's 1.5*IQR stays in EXACT decimal
    # arithmetic: y < q1 - 1.5*(q3-q1)  <=>  2y < 5*q1 - 3*q3 — a
    # float 1.5 literal would coerce the whole fence to double and the
    # strict comparisons could flip on boundary rows vs the oracle
    b = q.select(
        "grp",
        "n",
        "q1",
        "q3",
        (5 * F.col("q1") - 3 * F.col("q3")).alias("lo2"),
        (5 * F.col("q3") - 3 * F.col("q1")).alias("hi2"),
    )
    return (
        h.join(F.broadcast(b), "grp")
        .groupBy(
            "grp",
            F.col("n").alias("n_rows"),
            F.col("q1").cast("double").alias("q1"),
            F.col("q3").cast("double").alias("q3"),
        )
        .agg(
            F.sum(F.when(2 * F.col("y") < F.col("lo2"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(2 * F.col("y") > F.col("hi2"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
    )


@register(
    "orders_repeat_purchase_rate",
    """
    WITH c AS (SELECT o_custkey,
                      strftime(min(o_orderdate), '%Y-%m') AS cohort,
                      count(*) AS n_orders
               FROM orders GROUP BY 1)
    SELECT cohort,
           count(*) AS n_customers,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat,
           round(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS repeat_rate
    FROM c GROUP BY 1
    """,
    doc="Repeat-purchase rate by acquisition cohort (first-order "
    "month): the share of each cohort's customers who ever ordered "
    "again — the retention headline beside events_retention_cohorts' "
    "event-side matrix and customer_cohort_ltv's revenue view. "
    "Exact integer counts, one division per cohort. Scale: one "
    "customer-keyed aggregate then a cohort-sized frame.",
)
def q_orders_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    c = o.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort"),
        F.count("*").alias("n_orders"),
    )
    rep = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return c.groupBy("cohort").agg(
        F.count("*").alias("n_customers"),
        rep.cast("long").alias("n_repeat"),
        F.round(rep.cast("double") / F.count("*"), 6).alias("repeat_rate"),
    )


@register(
    "supplier_lead_time_trend",
    """
    WITH ln AS (
        SELECT l_suppkey AS supp,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(l_shipdate AS DATE)) AS BIGINT) AS x,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT) AS y
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    s AS (SELECT supp, count(*) AS n,
                 CAST(SUM(x) AS HUGEINT) AS sx,
                 CAST(SUM(y) AS HUGEINT) AS sy,
                 CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                 CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
          FROM ln GROUP BY 1)
    SELECT supp AS supplier, n AS n_shipments,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 9) AS slope_days_per_day,
           round(CAST(sy AS DOUBLE) / n, 6) AS mean_lead_days
    FROM s
    WHERE n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
    """,
    doc="Per-supplier lead-time trend: OLS slope of (ship - order) "
    "days against calendar time, one regression PER SUPPLIER — the "
    "grouped version of stats_bivariate_regression and the vendor "
    "scorecard question (is this supplier getting slower?). "
    "Exactness: x/y are exact integer day counts, the per-group "
    "power sums (n, Sx, Sy, Sxy, Sxx) are exact integer sums carried "
    "in decimal, and the slope is one fixed double sequence; "
    "zero-variance groups (all shipments same day) gate out with the "
    "same expression both engines. Scale: ONE map-side-combinable "
    "hash aggregate over the fact — thousands of regressions for the "
    "price of one scan, the moment-sums discipline at its best.",
)
def q_supplier_lead_time_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ln = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_suppkey").alias("supp"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")
            )
            .cast("long")
            .alias("x"),
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            )
            .cast("long")
            .alias("y"),
        )
    )
    x38 = F.col("x").cast("decimal(38,0)")
    s = ln.groupBy("supp").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(x38 * F.col("y")).alias("sxy"),
        F.sum(x38 * F.col("x")).alias("sxx"),
    )
    nd = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    den = nd * sxx - sx * sx
    return (
        s.filter(den > 0)
        .select(
            F.col("supp").alias("supplier"),
            F.col("n").alias("n_shipments"),
            F.round((nd * sxy - sx * sy) / den, 9).alias("slope_days_per_day"),
            F.round(sy / nd, 6).alias("mean_lead_days"),
        )
    )


@register(
    "stats_brown_forsythe",
    """
    WITH v AS (SELECT o_orderpriority AS grp,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS y
               FROM orders WHERE o_totalprice IS NOT NULL),
    h AS (SELECT grp, y, count(*) AS c FROM v GROUP BY 1, 2),
    t AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    cum AS (SELECT h.grp, h.y, h.c, t.n,
                   SUM(h.c) OVER (PARTITION BY h.grp ORDER BY h.y) AS cm
            FROM h JOIN t ON h.grp = t.grp),
    med AS (SELECT grp, max(n) AS n,
                   min(CASE WHEN cm * 2 >= n THEN y END) AS m
            FROM cum GROUP BY grp),
    z AS (SELECT h.grp, med.n, abs(h.y - med.m) AS z, h.c
          FROM h JOIN med ON h.grp = med.grp),
    g AS (SELECT grp, max(n) AS n,
                 SUM(z * c) AS s1,
                 SUM(z * z * c) AS s2
          FROM z GROUP BY grp),
    terms AS (SELECT n, s1, s2,
                     CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                          AS HUGEINT) AS bq,
                     CAST(round(CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                          AS HUGEINT) AS wq
              FROM g),
    agg AS (SELECT count(*) AS k,
                   CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(s1) AS DECIMAL(38,2)) AS s1t,
                   SUM(bq) AS bsum,
                   SUM(wq) AS wsum
            FROM terms)
    SELECT k AS n_groups, nn AS n_rows,
           round(((CAST(bsum AS DOUBLE)
                   - CAST(s1t AS DOUBLE) * CAST(s1t AS DOUBLE) / nn)
                  / (k - 1))
                 / (CAST(wsum AS DOUBLE) / (nn - k)), 6)
               AS bf_stat
    FROM agg
    """,
    doc="Brown-Forsythe test of variance homogeneity across order "
    "priorities: one-way ANOVA F on |y - group median| — the "
    "robust are-the-spreads-equal gate that validates the equal-"
    "variance assumption other tests lean on (medians, not means, so "
    "heavy tails don't break it). Exactness: group medians are "
    "integer-rank picks on the value histogram; |y - med| stays "
    "DECIMAL; per-group squared terms are quantized to whole integer "
    "units before the cross-group sums (order-free; micro-scaling "
    "would overflow 64-bit at these magnitudes); one fixed double assembly at the "
    "end. Scale: the same histogram-not-rows discipline — one fact "
    "aggregate, then bucket-sized frames throughout.",
)
def q_stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    # a NULL measurement is not a sample: it must not occupy ranks or
    # inflate n (matches how avg/median/quantile skip NULLs)
    v = o.filter(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    h = v.groupBy("grp", "y").agg(F.count("*").alias("c"))
    from .ext.caching import swap_persist

    h = swap_persist("bf_hist", h)
    t = h.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    w = (
        Window.partitionBy("grp")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.join(F.broadcast(t), "grp").withColumn("cm", F.sum("c").over(w))
    med = cum.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cm") * 2 >= F.col("n"), F.col("y"))).alias("m"),
    )
    z = h.join(F.broadcast(med), "grp").select(
        "grp", "n", F.abs(F.col("y") - F.col("m")).alias("z"), "c"
    )
    g = z.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.sum(F.col("z") * F.col("c")).alias("s1"),
        F.sum(F.col("z") * F.col("z") * F.col("c")).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    # whole-unit quantization (no 1e6 scale): the squared-sum terms
    # reach ~1e13-1e18 across the scale ladder, so micro-scaling
    # overflows 64-bit while integer-unit rounding already gives
    # <1e-11 relative error; decimal(38,0)/HUGEINT carry the sums
    terms = g.select(
        "n",
        "s1",
        F.round(s1d * s1d / F.col("n")).cast("decimal(38,0)").alias("bq"),
        F.round(F.col("s2").cast("double") - s1d * s1d / F.col("n"))
        .cast("decimal(38,0)")
        .alias("wq"),
    )
    agg = terms.agg(
        F.count("*").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s1").cast("decimal(38,2)").alias("s1t"),
        F.sum("bq").alias("bsum"),
        F.sum("wq").alias("wsum"),
    )
    s1t = F.col("s1t").cast("double")
    between = F.col("bsum").cast("double") - s1t * s1t / F.col("nn")
    within = F.col("wsum").cast("double")
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        # try_divide at every level: k = 1 or nn = k zeroes a
        # denominator; NULL then propagates exactly as in DuckDB (r10)
        F.round(
            F.try_divide(
                F.try_divide(between, F.col("k") - 1),
                F.try_divide(within, F.col("nn") - F.col("k")),
            ),
            6,
        ).alias("bf_stat"),
    )


@register(
    "orders_monthly_price_quantiles",
    """
    WITH v AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS y
               FROM orders
               WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
    h AS (SELECT month, y, count(*) AS c FROM v GROUP BY 1, 2),
    t AS (SELECT month, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    cum AS (SELECT h.month, h.y, h.c, t.n,
                   SUM(h.c) OVER (PARTITION BY h.month ORDER BY h.y) AS cm
            FROM h JOIN t ON h.month = t.month)
    SELECT month, max(n) AS n_orders,
           CAST(min(CASE WHEN cm * 2 >= n THEN y END) AS DOUBLE) AS p50,
           CAST(min(CASE WHEN cm * 10 >= 9 * n THEN y END) AS DOUBLE) AS p90
    FROM cum GROUP BY month
    """,
    doc="Monthly order-value p50/p90 time series: nearest-rank "
    "quantiles per calendar month picked by integer rank arithmetic "
    "on the per-month value histogram — the pricing-drift dashboard "
    "series, exact where approx_percentile would drift between "
    "engines and runs. Scale: the histogram-not-rows discipline with "
    "the cumulation partitioned per month; one fact aggregate, then "
    "bucket-sized frames.",
)
def q_orders_monthly_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # undated orders have no month; NULL prices are not samples
    o = load_tables(spark, sf_dir)["orders"].filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    v = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    h = v.groupBy("month", "y").agg(F.count("*").alias("c"))
    t = h.groupBy("month").agg(F.sum("c").cast("long").alias("n"))
    w = (
        Window.partitionBy("month")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.join(F.broadcast(t), "month").withColumn("cm", F.sum("c").over(w))
    return cum.groupBy("month").agg(
        F.max("n").alias("n_orders"),
        F.min(F.when(F.col("cm") * 2 >= F.col("n"), F.col("y")))
        .cast("double")
        .alias("p50"),
        F.min(F.when(F.col("cm") * 10 >= 9 * F.col("n"), F.col("y")))
        .cast("double")
        .alias("p90"),
    )


@register(
    "orders_interarrival_histogram",
    """
    WITH seq AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(CAST(o_orderdate AS DATE))
                             OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders)
    SELECT gap_days, count(*) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / SUM(count(*)) OVER (), 6) AS frac
    FROM seq WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
    doc="Distribution of days between a customer's consecutive orders "
    "— the purchase-cadence histogram behind replenishment and churn "
    "models (RFM's recency is one point; this is the whole "
    "distribution). Exact integer day gaps over a per-customer "
    "ordered window (ties broken by order key identically in both "
    "engines), exact counts, one normalizing division over the "
    "gap-bounded histogram. Scale: one customer-keyed window pass, "
    "then calendar-bounded frames.",
)
def q_orders_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    h = seq.groupBy("gap_days").agg(F.count("*").alias("n"))
    wn = Window.partitionBy()
    return h.select(
        "gap_days",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("frac"),
    )


@register(
    "stats_two_proportion_z",
    """
    WITH v AS (
        SELECT user_id % 2 AS variant,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') > 0
                    AS INT) AS converted
        FROM events GROUP BY user_id),
    s AS (SELECT variant, count(*) AS n,
                 CAST(SUM(converted) AS BIGINT) AS k
          FROM v GROUP BY 1),
    m AS (SELECT
            (SELECT n FROM s WHERE variant = 0) AS n0,
            (SELECT k FROM s WHERE variant = 0) AS k0,
            (SELECT n FROM s WHERE variant = 1) AS n1,
            (SELECT k FROM s WHERE variant = 1) AS k1)
    SELECT n0, k0, n1, k1,
           round(CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0, 6)
               AS rate_diff,
           CASE WHEN CAST(k0 + k1 AS DOUBLE) / (n0 + n1) > 0
                 AND CAST(k0 + k1 AS DOUBLE) / (n0 + n1) < 1
           THEN round((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
                 / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) END AS z_stat
    FROM m
    """,
    doc="Two-proportion z-test between the deterministic A/B arms "
    "(variant = user_id % 2, conversion = any purchase): the "
    "did-the-rate-move significance test that complements "
    "stats_wilson_interval's per-arm bounds — pooled-proportion "
    "standard error, z gated to NULL when the pooled rate is "
    "degenerate (0 or 1). Exactness: "
    "(n, k) per arm are exact integers; the z assembly is one fixed "
    "IEEE sequence spelled identically in the oracle. Scale: one "
    "user-keyed aggregate + a 2-row arm frame.",
)
def q_stats_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    v = (
        e.groupBy("user_id")
        .agg(
            (F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) > 0)
            .cast("int")
            .alias("converted")
        )
        .select((F.col("user_id") % 2).alias("variant"), "converted")
    )
    s = v.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("converted").cast("long").alias("k")
    )
    # conditional global aggregate (scalar-subquery semantics): always
    # one row, NULL arms on empty input — the filter + crossJoin shape
    # returned zero rows and diverged from the oracle (r10 empty sweep)
    def arm(variant: int, col: str):
        return F.max(F.when(F.col("variant") == variant, F.col(col)))

    m = s.agg(
        arm(0, "n").alias("n0"),
        arm(0, "k").alias("k0"),
        arm(1, "n").alias("n1"),
        arm(1, "k").alias("k1"),
    )
    p0 = F.col("k0").cast("double") / F.col("n0")
    p1 = F.col("k1").cast("double") / F.col("n1")
    pp = (F.col("k0") + F.col("k1")).cast("double") / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    return m.select(
        "n0",
        "k0",
        "n1",
        "k1",
        F.round(p1 - p0, 6).alias("rate_diff"),
        # zero-variance gate (degenerate pooled rate 0 or 1 — e.g. every
        # user converted): Spark's ANSI divide raises where DuckDB
        # yields inf/NaN; gate on the SAME pooled-rate expression both
        # engines compute (the events_hourly_anomalies convention)
        F.when((pp > 0) & (pp < 1), F.round((p1 - p0) / se, 6)).alias("z_stat"),
    )


@register(
    "supplier_pareto_skyline",
    """
    WITH s AS (
        SELECT l_suppkey AS supplier,
               count(*) AS n_shipments,
               round(CAST(SUM(date_diff('day', CAST(o_orderdate AS DATE),
                                        CAST(l_shipdate AS DATE)))
                          AS DOUBLE) / count(*), 6) AS mean_lead_days,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                    AS DECIMAL(18,2)) AS volume
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1)
    SELECT supplier, n_shipments, mean_lead_days,
           CAST(volume AS DOUBLE) AS volume
    FROM s a
    WHERE NOT EXISTS (
        SELECT 1 FROM s b
        WHERE b.mean_lead_days <= a.mean_lead_days
          AND b.volume >= a.volume
          AND (b.mean_lead_days < a.mean_lead_days OR b.volume > a.volume)
    )
    """,
    doc="Skyline / Pareto frontier over suppliers: keep exactly those "
    "not DOMINATED on (minimize mean lead time, maximize shipped "
    "volume) — the multi-objective shortlist operator (no weighting "
    "needed, unlike a scored rank) that relational engines lack as a "
    "primitive. Exactness: lead means are fixed divisions of exact "
    "integer day sums, volume is exact decimal, and dominance is "
    "pure comparisons — no floats born in the join. Scale: dominance "
    "runs on the AGGREGATED per-supplier frame (one fact hash-agg "
    "first), so the quadratic candidate join touches |suppliers|^2, "
    "not rows; at larger entity counts the standard refinement is a "
    "sort-filter pass (presort by one objective, prune by the "
    "running best of the other) before the pairwise check.",
)
def q_supplier_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    s = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_suppkey").alias("supplier"))
        .agg(
            F.count("*").alias("n_shipments"),
            F.round(
                F.sum(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_lead_days"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("volume"),
        )
    )
    from .ext.caching import swap_persist

    s = swap_persist("skyline_suppliers", s)
    a, b = s.alias("a"), s.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("b.mean_lead_days") <= F.col("a.mean_lead_days"))
            & (F.col("b.volume") >= F.col("a.volume"))
            & (
                (F.col("b.mean_lead_days") < F.col("a.mean_lead_days"))
                | (F.col("b.volume") > F.col("a.volume"))
            ),
            "left_semi",
        )
    ).select(F.col("supplier"))
    return (
        s.join(dominated, "supplier", "left_anti")
        .select(
            "supplier",
            "n_shipments",
            "mean_lead_days",
            F.col("volume").cast("double").alias("volume"),
        )
    )


@register(
    "inventory_clamped_balance",
    """
    WITH moves AS (
        -- explicit floor before the int cast: DuckDB CASTs doubles to
        -- ints by ROUNDING, Spark by TRUNCATION — identical on the
        -- contract's integer-valued quantities, forked on fractional
        -- extremes (extreme probe axis, r12)
        SELECT l_partkey AS part,
               CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_quantity) AS BIGINT)
                    ELSE -CAST(floor(l_quantity) AS BIGINT) END AS delta,
               l_shipdate, l_orderkey, l_linenumber
        FROM lineitem WHERE l_shipdate IS NOT NULL),
    s AS (
        -- delta as final tie-break (dupnullmix r12): duplicate
        -- (shipdate, orderkey, linenumber) copies differing only in
        -- quantity/returnflag otherwise walk in engine order
        SELECT part, delta, l_shipdate, l_orderkey, l_linenumber,
               CAST(SUM(delta) OVER w AS BIGINT) AS cum
        FROM moves
        WINDOW w AS (PARTITION BY part
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, delta
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    b AS (
        SELECT part, cum,
               cum - least(0, MIN(cum) OVER w) AS balance,
               row_number() OVER (PARTITION BY part
                                  ORDER BY l_shipdate DESC, l_orderkey DESC,
                                           l_linenumber DESC, delta DESC)
                   AS rn_last
        FROM s
        WINDOW w AS (PARTITION BY part
                     ORDER BY l_shipdate, l_orderkey, l_linenumber, delta
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT part,
           count(*) AS n_moves,
           max(balance) AS peak_balance,
           max(CASE WHEN rn_last = 1 THEN balance END) AS final_balance
    FROM b GROUP BY 1
    """,
    doc="Clamped running balance (reflected cumulative sum): per-part "
    "stock level where restocks ('R' lines) add quantity, shipments "
    "drain it, and the level can never go below zero — the inventory "
    "/ credit-ledger operator a plain cumulative sum gets wrong the "
    "moment demand exceeds stock. Naively this is an order-dependent "
    "recurrence b_t = max(0, b_{t-1} + delta_t) that seems to force "
    "row-at-a-time state; the reflected-walk identity "
    "b_t = S_t - min(0, min_{k<=t} S_k) makes it TWO window passes "
    "(cumulative sum, then running min of it) over one "
    "(part, shipdate) sort — closed form, no iteration, no UDF. "
    "Integer deltas keep every value exact. Scale: one part-keyed "
    "shuffle; both windows and the final aggregate share the same "
    "sort order, so Catalyst plans a single exchange+sort.",
)
def q_inventory_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a NULL ship date has no position in the ledger walk (nullmix
    # convention: NULL event times are excluded from sequences) — the
    # cumulative balance would otherwise visit the move at engine-
    # specific positions (Spark sorts NULL dates first, DuckDB last)
    li = load_tables(spark, sf_dir)["lineitem"].filter(
        F.col("l_shipdate").isNotNull()
    )
    order_cols = ["l_shipdate", "l_orderkey", "l_linenumber"]
    moves = li.select(
        F.col("l_partkey").alias("part"),
        F.when(
            F.col("l_returnflag") == "R",
            F.floor(F.col("l_quantity")).cast("bigint"),
        )
        .otherwise(-F.floor(F.col("l_quantity")).cast("bigint"))
        .alias("delta"),
        *order_cols,
    )
    # asc_nulls_last on EVERY sequence key, not just the tie-break: a
    # NULL l_orderkey/l_linenumber (nullkeys axis) walks at Spark's
    # NULLS-FIRST position but DuckDB's NULLS-LAST one otherwise
    w = Window.partitionBy("part").orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols],
        F.col("delta").asc_nulls_last(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = moves.withColumn("cum", F.sum("delta").over(w))
    balance = F.col("cum") - F.least(F.lit(0), F.min("cum").over(w))
    w_last = Window.partitionBy("part").orderBy(
        *[F.col(c).desc() for c in order_cols], F.col("delta").desc()
    )
    b = s.select(
        "part",
        balance.alias("balance"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    return b.groupBy("part").agg(
        F.count("*").alias("n_moves"),
        F.max("balance").alias("peak_balance"),
        F.max(F.when(F.col("rn_last") == 1, F.col("balance"))).alias(
            "final_balance"
        ),
    )


@register(
    "orders_business_day_latency",
    """
    WITH j AS (
        SELECT o_orderpriority,
               date_diff('day', DATE '1969-12-29', CAST(o_orderdate AS DATE))
                   AS io,
               date_diff('day', DATE '1969-12-29', CAST(l_shipdate AS DATE))
                   AS ish
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    lat AS (
        -- explicit FLOOR division + positive modulo: DuckDB's // and %
        -- truncate toward zero, Spark's floor(x/7) floors — identical on
        -- post-epoch dates, forked on pre-epoch (negative) day indexes;
        -- the business-day step function is only monotone under
        -- floor + pmod (extreme probe axis, r12)
        SELECT o_orderpriority,
               (5 * CAST(floor(ish / 7.0) AS BIGINT)
                  + least(((ish % 7) + 7) % 7, 5))
               - (5 * CAST(floor(io / 7.0) AS BIGINT)
                  + least(((io % 7) + 7) % 7, 5)) AS bd
        FROM j)
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(min(bd) AS BIGINT) AS min_bd,
           CAST(max(bd) AS BIGINT) AS max_bd,
           CAST(SUM(bd) AS BIGINT) AS sum_bd,
           round(CAST(SUM(bd) AS DOUBLE) / count(*), 6) AS avg_bd
    FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Order-to-ship latency in BUSINESS days per order priority — "
    "calendar math the engine previously only did in raw days. Closed "
    "form, no calendar table and no per-day explode: with idx = days "
    "since the Monday epoch 1969-12-29, f(d) = 5*(idx div 7) + "
    "min(idx mod 7, 5) counts weekdays in [epoch, d), so the latency "
    "is f(ship) - f(order) — all integer date arithmetic, exact in "
    "both engines (idx is positive for every date in the data, so div/"
    "mod semantics agree). Scale: one fact-fact equi-join on the "
    "natural key plus a 5-row aggregate; the weekday formula is a "
    "per-row integer expression inside whole-stage codegen, vs the "
    "naive sequence()-explode which multiplies the fact table by the "
    "~2000-day latency span.",
)
def q_orders_business_day_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    epoch = F.lit("1969-12-29").cast("date")

    def bdays(col: str) -> F.Column:
        # floor division + POSITIVE modulo so the step function stays
        # monotone on pre-epoch (negative) day indexes — Spark's % takes
        # the dividend's sign, which fed least() a negative weekday
        idx = F.datediff(F.col(col).cast("date"), epoch)
        return 5 * F.floor(idx / 7) + F.least(F.pmod(idx, F.lit(7)), F.lit(5))

    j = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    lat = j.select(
        "o_orderpriority", (bdays("l_shipdate") - bdays("o_orderdate")).alias("bd")
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.min("bd").cast("bigint").alias("min_bd"),
            F.max("bd").cast("bigint").alias("max_bd"),
            F.sum("bd").cast("bigint").alias("sum_bd"),
            F.round(F.sum("bd").cast("double") / F.count("*"), 6).alias("avg_bd"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "stats_kendall_tau_binned",
    """
    WITH cells AS (
        SELECT CAST(floor((l_quantity - 1) / 5) AS INT) AS bx,
               least(CAST(floor(l_extendedprice / 10000) AS INT), 9) AS by,
               count(*) AS c
        FROM lineitem GROUP BY 1, 2),
    pair AS (
        SELECT CAST(SUM(CASE WHEN a.by < b.by THEN a.c * b.c ELSE 0 END)
                    AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN a.by > b.by THEN a.c * b.c ELSE 0 END)
                    AS BIGINT) AS disc
        FROM cells a JOIN cells b ON a.bx < b.bx),
    tx AS (SELECT CAST(SUM(nx * (nx - 1) / 2) AS BIGINT) AS t
           FROM (SELECT SUM(c) AS nx FROM cells GROUP BY bx)),
    ty AS (SELECT CAST(SUM(ny * (ny - 1) / 2) AS BIGINT) AS t
           FROM (SELECT SUM(c) AS ny FROM cells GROUP BY by)),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)
    SELECT tot.n AS n_rows,
           pair.conc AS concordant,
           pair.disc AS discordant,
           round(CAST(pair.conc - pair.disc AS DOUBLE)
                 / sqrt(CAST(tot.n * (tot.n - 1) / 2 - tx.t AS DOUBLE)
                        * CAST(tot.n * (tot.n - 1) / 2 - ty.t AS DOUBLE)),
                 6) AS tau_b
    FROM pair, tx, ty, tot
    """,
    doc="Kendall tau-b rank correlation between quantity and extended "
    "price, computed EXACTLY on a 10x10 binned contingency table "
    "(fixed-width bins: quantity 1-50 in fives, price in 10k bands "
    "capped at 9). The naive tau is an O(n^2) all-pairs scan — "
    "undistributable at any scale; binning first makes concordant/"
    "discordant pair counts a ~100-cell self-join over the contingency "
    "frame: C and D are exact BIGINT sums of c_a*c_b over ordered cell "
    "pairs, tie terms come off the row/column marginals, and tau_b's "
    "denominator multiplies as doubles only at the end (the BIGINT "
    "product would overflow at sf1's n~6M). Within-bin pairs count as "
    "ties — that is the tau-b-on-grouped-data definition, not an "
    "approximation, and it complements stats_spearman (which ranks "
    "every distinct value) with the robust-to-scale variant. Scale: "
    "one fact scan -> 100-cell frame; everything after is constant-"
    "sized regardless of row count.",
)
def q_stats_kendall_tau_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    cells = (
        li.select(
            F.floor((F.col("l_quantity") - 1) / 5).cast("int").alias("bx"),
            F.least(
                F.floor(F.col("l_extendedprice") / 10000).cast("int"), F.lit(9)
            ).alias("by"),
        )
        .groupBy("bx", "by")
        .agg(F.count("*").alias("c"))
    )
    from .ext.caching import swap_persist

    cells = swap_persist("kendall_cells", cells)
    a = cells.select(
        F.col("bx").alias("bxa"), F.col("by").alias("bya"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("bx").alias("bxb"), F.col("by").alias("byb"), F.col("c").alias("cb")
    )
    pair = (
        a.join(F.broadcast(b), F.col("bxa") < F.col("bxb"))
        .agg(
            F.sum(
                F.when(F.col("bya") < F.col("byb"), F.col("ca") * F.col("cb"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("conc"),
            F.sum(
                F.when(F.col("bya") > F.col("byb"), F.col("ca") * F.col("cb"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("disc"),
        )
    )
    tx = (
        cells.groupBy("bx")
        .agg(F.sum("c").alias("nx"))
        .agg(
            F.sum(F.col("nx") * (F.col("nx") - 1) / 2).cast("bigint").alias("tx")
        )
    )
    ty = (
        cells.groupBy("by")
        .agg(F.sum("c").alias("ny"))
        .agg(
            F.sum(F.col("ny") * (F.col("ny") - 1) / 2).cast("bigint").alias("ty")
        )
    )
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("bigint")
    return (
        pair.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_rows"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.round(
                (F.col("conc") - F.col("disc")).cast("double")
                / F.sqrt(
                    (n0 - F.col("tx")).cast("double")
                    * (n0 - F.col("ty")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


@register(
    "revenue_lorenz_deciles",
    """
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS x
        FROM orders GROUP BY 1),
    d AS (
        SELECT x, ntile(10) OVER (ORDER BY x, o_custkey) AS decile
        FROM rev),
    g AS (
        SELECT decile, count(*) AS n_customers,
               CAST(SUM(x) AS DECIMAL(18,2)) AS decile_revenue
        FROM d GROUP BY decile)
    SELECT decile, n_customers,
           CAST(decile_revenue AS DOUBLE) AS decile_revenue,
           round(CAST(SUM(decile_revenue) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(SUM(decile_revenue) OVER () AS DOUBLE), 6)
               AS cum_revenue_share
    FROM g ORDER BY decile
    """,
    doc="Lorenz curve of customer revenue in deciles: customers ranked "
    "by lifetime order value (ties broken on o_custkey so ntile is "
    "deterministic in both engines), cumulative revenue share per "
    "decile — the curve the Gini coefficient (revenue_gini_by_nation) "
    "integrates, as an inspectable 10-row readout. Per-customer and "
    "per-decile sums stay DECIMAL(18,2)-exact; the only doubles are "
    "the final share ratios over the 10-row frame. Scale: one "
    "custkey-keyed aggregate, one global ntile sort (the same "
    "RangePartition-sort shape as global_sort_prices), then window "
    "math on 10 rows.",
)
def q_revenue_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("x")
    )
    # ntile over an unpartitioned Window funnels every customer row
    # through ONE task; global_ntile reproduces ntile(10)'s exact
    # tiling arithmetic on the two-pass global rank instead
    from .ops.sorts import global_ntile

    d = global_ntile(
        rev, ["x", "o_custkey"], 10, alias="decile", persist_key="lorenz_rank"
    ).select("x", "decile")
    g = d.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("x").cast("decimal(18,2)").alias("decile_revenue"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return g.select(
        "decile",
        "n_customers",
        F.col("decile_revenue").cast("double").alias("decile_revenue"),
        F.round(
            F.sum("decile_revenue").over(wcum).cast("double")
            / F.sum("decile_revenue").over(wall).cast("double"),
            6,
        ).alias("cum_revenue_share"),
    ).orderBy("decile")


@register(
    "stats_poisson_rate_test",
    """
    WITH t0 AS (SELECT min(ts) AS t0 FROM events),
    win AS (
        SELECT event_type,
               CASE WHEN ts < t0 + INTERVAL 7 DAY THEN 1
                    WHEN ts < t0 + INTERVAL 14 DAY THEN 2 END AS w
        FROM events CROSS JOIN t0),
    k AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
               CAST(SUM(CASE WHEN w = 2 THEN 1 ELSE 0 END) AS BIGINT) AS k2
        FROM win WHERE w IS NOT NULL GROUP BY event_type)
    SELECT event_type, k1, k2,
           round(CAST(k1 AS DOUBLE) / k2, 6) AS rate_ratio,
           round((k1 - (k1 + k2) * 0.5) / sqrt((k1 + k2) * 0.25), 6) AS z,
           CASE WHEN abs((k1 - (k1 + k2) * 0.5) / sqrt((k1 + k2) * 0.25))
                     > 1.959964 THEN 1 ELSE 0 END AS significant_5pct
    FROM k ORDER BY event_type
    """,
    doc="Two-sample Poisson rate test per event type: week 1 vs week 2 "
    "of the stream (windows anchored at the global min event time, "
    "equal 7-day exposures). Under H0 (equal rates) the week-1 count "
    "conditioned on the total is Binomial(k1+k2, 1/2); the normal-"
    "approximation z = (k1 - n/2)/sqrt(n/4) is the standard E-commerce "
    "'did the event rate change week-over-week' screen, complementing "
    "stats_two_proportion_z (proportions) and events_psi_drift "
    "(distribution shape). Counts are exact integers; z is one fixed "
    "double expression; the 1.959964 gate matches the two-sided 5% "
    "normal quantile to 6dp in both engines. Scale: one scan with a "
    "broadcast 1-row min, 5-row readout.",
)
def q_stats_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    t0 = e.agg(F.min("ts").alias("t0"))
    win = e.crossJoin(F.broadcast(t0)).select(
        "event_type",
        F.when(
            F.col("ts") < F.col("t0") + F.expr("INTERVAL 7 DAY"), 1
        )
        .when(F.col("ts") < F.col("t0") + F.expr("INTERVAL 14 DAY"), 2)
        .alias("w"),
    )
    k = (
        win.filter(F.col("w").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("w") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("k1"),
            F.sum(F.when(F.col("w") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("k2"),
        )
    )
    z = (F.col("k1") - (F.col("k1") + F.col("k2")) * 0.5) / F.sqrt(
        (F.col("k1") + F.col("k2")) * 0.25
    )
    return k.select(
        "event_type",
        "k1",
        "k2",
        # try_divide: all events in one window makes k2 = 0 (r10 sweep)
        F.round(F.try_divide(F.col("k1").cast("double"), F.col("k2")), 6).alias(
            "rate_ratio"
        ),
        F.round(z, 6).alias("z"),
        F.when(F.abs(z) > 1.959964, 1).otherwise(0).alias("significant_5pct"),
    ).orderBy("event_type")


@register(
    "er_fuzzy_match_blocking",
    """
    WITH blocked AS (
        SELECT p_partkey, p_name, p_brand,
               p_size, CAST(floor(length(p_name) / 8) AS INT) AS lb
        FROM part),
    pairs AS (
        SELECT a.p_brand AS brand,
               levenshtein(a.p_name, b.p_name) AS dist
        FROM blocked a JOIN blocked b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
         AND a.lb = b.lb AND a.p_partkey < b.p_partkey)
    SELECT brand,
           count(*) AS candidate_pairs,
           CAST(SUM(CASE WHEN dist <= 12 THEN 1 ELSE 0 END) AS BIGINT)
               AS matched_pairs,
           CAST(min(dist) AS INT) AS min_dist,
           round(CAST(SUM(dist) AS DOUBLE) / count(*), 6) AS avg_dist
    FROM pairs GROUP BY brand ORDER BY brand
    """,
    doc="Entity-resolution candidate generation with blocking: part "
    "names are fuzzy-compared by Levenshtein edit distance, but ONLY "
    "within blocks keyed (brand, size, length-band floor(len/8)) — "
    "the standard blocking-key trick that turns the O(N^2) all-pairs "
    "comparison into sum-of-block-squares (each block is a bounded "
    "slice of the catalog, and the length band is sound for a "
    "distance threshold of 12 because |len(a)-len(b)| <= dist, so "
    "near-identical names share adjacent bands — an 8-wide band "
    "catches every pair with distance < 8 exactly, the usual "
    "recall/cost dial). COLLATION CONTRACT (class-13 pin): Spark's "
    "levenshtein counts CODEPOINT edits (the linguistic distance), "
    "DuckDB's counts BYTE edits — identical on ASCII (this table), "
    "forked on multi-byte text; the engine's codepoint semantics is "
    "the pinned contract, so matched-pair counts and "
    "distance stats hash-match on contract data. Scale: the block join shuffles on "
    "the composite blocking key; no broadcast of the catalog, no "
    "cross product — plan-assertable as a single equi-join.",
)
def q_er_fuzzy_match_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    blocked = p.select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_size",
        F.floor(F.length("p_name") / 8).cast("int").alias("lb"),
    )
    a = blocked.select(
        *[F.col(c).alias(f"a_{c}") for c in blocked.columns]
    )
    b = blocked.select(
        *[F.col(c).alias(f"b_{c}") for c in blocked.columns]
    )
    pairs = a.join(
        b,
        (F.col("a_p_brand") == F.col("b_p_brand"))
        & (F.col("a_p_size") == F.col("b_p_size"))
        & (F.col("a_lb") == F.col("b_lb"))
        & (F.col("a_p_partkey") < F.col("b_p_partkey")),
    ).select(
        F.col("a_p_brand").alias("brand"),
        F.levenshtein(F.col("a_p_name"), F.col("b_p_name")).alias("dist"),
    )
    return (
        pairs.groupBy("brand")
        .agg(
            F.count("*").alias("candidate_pairs"),
            F.sum(F.when(F.col("dist") <= 12, 1).otherwise(0))
            .cast("bigint")
            .alias("matched_pairs"),
            F.min("dist").cast("int").alias("min_dist"),
            F.round(F.sum("dist").cast("double") / F.count("*"), 6).alias(
                "avg_dist"
            ),
        )
        .orderBy("brand")
    )


@register(
    "stats_winsorized_mean",
    """
    WITH v AS (SELECT o_orderpriority AS grp,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS y
               FROM orders WHERE o_totalprice IS NOT NULL),
    h AS (SELECT grp, y, count(*) AS c FROM v GROUP BY 1, 2),
    t AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    cum AS (SELECT h.grp, h.y, h.c, t.n,
                   CAST(floor(t.n / 20) AS BIGINT) AS d,
                   SUM(h.c) OVER (PARTITION BY h.grp ORDER BY h.y) AS cm
            FROM h JOIN t ON h.grp = t.grp),
    mid AS (SELECT grp, n, d,
                   greatest(least(cm, n - d) - greatest(cm - c, d), 0) AS k,
                   y
            FROM cum),
    bounds AS (SELECT grp,
                      min(CASE WHEN cm >= d + 1 THEN y END) AS p_lo,
                      min(CASE WHEN cm >= n - d THEN y END) AS p_hi
               FROM cum GROUP BY grp),
    core AS (SELECT grp, n, d,
                    CAST(SUM(k * y) AS DECIMAL(38,2)) AS mid_sum
             FROM mid GROUP BY grp, n, d)
    SELECT core.grp, n AS n_rows, CAST(d AS BIGINT) AS n_clamped_each_side,
           CAST(p_lo AS DOUBLE) AS lower_bound,
           CAST(p_hi AS DOUBLE) AS upper_bound,
           round(CAST(mid_sum + d * (p_lo + p_hi) AS DOUBLE) / n, 6)
               AS winsorized_mean
    FROM core JOIN bounds ON core.grp = bounds.grp
    ORDER BY core.grp
    """,
    doc="5%-winsorized mean of order value per priority: the lowest "
    "and highest floor(n/20) observations are CLAMPED to the 5th/95th "
    "order statistics instead of dropped (stats_trimmed_mean's "
    "sibling — winsorizing keeps n constant, the convention in "
    "robust A/B readouts). Same histogram-rank machinery: the kept "
    "middle mass comes from clamp arithmetic on the value histogram, "
    "and the two boundary order statistics are conditional mins over "
    "the SAME cumulated frame (smallest value whose cumulative count "
    "reaches d+1 resp. n-d) — no per-row window, decimal-exact sums, "
    "one double at the end. Scale: identical to the trimmed mean — "
    "bucket-sized cumulation, never a row funnel.",
)
def q_stats_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    # a NULL measurement is not a sample: it must not occupy ranks or
    # inflate n (matches how avg/median/quantile skip NULLs)
    v = o.filter(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    h = v.groupBy("grp", "y").agg(F.count("*").alias("c"))
    t = h.groupBy("grp").agg(F.sum("c").cast("long").alias("n"))
    w = (
        Window.partitionBy("grp")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        h.join(F.broadcast(t), "grp")
        .withColumn("d", F.floor(F.col("n") / 20).cast("long"))
        .withColumn("cm", F.sum("c").over(w))
    )
    from .ext.caching import swap_persist

    cum = swap_persist("winsor_cum", cum)
    mid = cum.select(
        "grp",
        "n",
        "d",
        "y",
        F.greatest(
            F.least(F.col("cm"), F.col("n") - F.col("d"))
            - F.greatest(F.col("cm") - F.col("c"), F.col("d")),
            F.lit(0),
        ).alias("k"),
    )
    core = mid.groupBy("grp", "n", "d").agg(
        F.sum(F.col("k") * F.col("y")).cast("decimal(38,2)").alias("mid_sum")
    )
    bounds = cum.groupBy("grp").agg(
        F.min(F.when(F.col("cm") >= F.col("d") + 1, F.col("y"))).alias("p_lo"),
        F.min(F.when(F.col("cm") >= F.col("n") - F.col("d"), F.col("y"))).alias(
            "p_hi"
        ),
    )
    return (
        core.join(bounds, "grp")
        .select(
            "grp",
            F.col("n").alias("n_rows"),
            F.col("d").cast("long").alias("n_clamped_each_side"),
            F.col("p_lo").cast("double").alias("lower_bound"),
            F.col("p_hi").cast("double").alias("upper_bound"),
            F.round(
                (
                    F.col("mid_sum")
                    + F.col("d") * (F.col("p_lo") + F.col("p_hi"))
                ).cast("double")
                / F.col("n"),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy("grp")
    )


@register(
    "fraud_duplicate_payments",
    """
    WITH o AS (
        SELECT o_orderkey AS k, o_custkey AS cust,
               CAST(o_totalprice AS DECIMAL(18,2)) AS amt,
               CAST(o_orderdate AS DATE) AS dt,
               CAST(floor(o_totalprice / 500) AS BIGINT) AS b
        FROM orders),
    ex AS (
        SELECT k, cust, amt, dt, b + off AS b
        FROM o CROSS JOIN (SELECT unnest([-1, 0, 1]) AS off)),
    pairs AS (
        SELECT a.cust,
               date_diff('day', least(a.dt, bb.dt), greatest(a.dt, bb.dt))
                   AS gap_days,
               abs(a.amt - bb.amt) AS amt_diff
        FROM ex a JOIN o bb ON a.b = bb.b AND a.cust = bb.cust
                           AND a.k < bb.k
        WHERE abs(a.amt - bb.amt) <= 500
          AND abs(date_diff('day', a.dt, bb.dt)) <= 90)
    SELECT CAST(floor(gap_days / 30) AS INT) AS gap_band_30d,
           count(*) AS n_suspect_pairs,
           CAST(count(DISTINCT cust) AS BIGINT) AS n_customers,
           CAST(min(amt_diff) AS DOUBLE) AS min_amt_diff,
           round(CAST(SUM(amt_diff) AS DOUBLE) / count(*), 6) AS avg_amt_diff
    FROM pairs GROUP BY 1 ORDER BY 1
    """,
    doc="Duplicate-payment screen: pairs of orders by the SAME "
    "customer with amounts within $500 of each other placed within "
    "90 days — the classic AP/fraud double-billing audit. The amount "
    "band is a BANDED self-join done scalably: bucket amounts by the "
    "band width, explode ONE side to its bucket and both neighbors "
    "(any pair within $500 differs by at most one bucket, and each "
    "qualifying pair meets in exactly one of the three — no dedup "
    "pass needed), equi-join on (customer, bucket), then apply the "
    "exact |diff| predicates. Amounts stay DECIMAL(18,2) so the band "
    "edges are exact. Scale: the join is keyed (cust, bucket) — "
    "never an unbounded theta-join; the 3x explode is the entire "
    "overhead, the standard band-join rewrite.",
)
def q_fraud_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"].select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("amt"),
        F.col("o_orderdate").cast("date").alias("dt"),
        F.floor(F.col("o_totalprice") / 500).cast("bigint").alias("b"),
    )
    ex = o.select(
        "k",
        "cust",
        "amt",
        "dt",
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("b"),
    )
    bb = o.select(
        F.col("k").alias("k2"),
        F.col("cust").alias("cust2"),
        F.col("amt").alias("amt2"),
        F.col("dt").alias("dt2"),
        F.col("b").alias("b2"),
    )
    pairs = (
        ex.join(
            bb,
            (F.col("b") == F.col("b2"))
            & (F.col("cust") == F.col("cust2"))
            & (F.col("k") < F.col("k2")),
        )
        .filter(
            (F.abs(F.col("amt") - F.col("amt2")) <= 500)
            & (F.abs(F.datediff(F.col("dt"), F.col("dt2"))) <= 90)
        )
        .select(
            "cust",
            F.datediff(
                F.greatest("dt", "dt2"), F.least("dt", "dt2")
            ).alias("gap_days"),
            F.abs(F.col("amt") - F.col("amt2")).alias("amt_diff"),
        )
    )
    return (
        pairs.groupBy(
            F.floor(F.col("gap_days") / 30).cast("int").alias("gap_band_30d")
        )
        .agg(
            F.count("*").alias("n_suspect_pairs"),
            F.countDistinct("cust").cast("bigint").alias("n_customers"),
            F.min("amt_diff").cast("double").alias("min_amt_diff"),
            F.round(
                F.sum("amt_diff").cast("double") / F.count("*"), 6
            ).alias("avg_amt_diff"),
        )
        .orderBy("gap_band_30d")
    )


@register(
    "rollup_share_of_parent",
    """
    WITH rev AS (
        SELECT r_name AS region, n_name AS nation,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2)
    SELECT region, nation,
           CAST(revenue AS DOUBLE) AS revenue,
           round(CAST(revenue AS DOUBLE)
                 / CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE),
                 6) AS share_of_region,
           CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE)
               AS region_revenue,
           round(CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE)
                 / CAST(SUM(revenue) OVER () AS DOUBLE), 6)
               AS region_share_of_total
    FROM rev ORDER BY region, nation
    """,
    doc="Share-of-parent hierarchical rollup: nation revenue as a "
    "share of its region, and region revenue as a share of the "
    "grand total, in one frame — the percent-of-parent idiom every "
    "OLAP drill-down report needs (complements the ROLLUP/CUBE "
    "family, which emits parent rows but not parent SHARES). "
    "Revenue stays DECIMAL-exact through the star join and both "
    "window sums; the only doubles are the two final ratios. Scale: "
    "the fact aggregates to the (region, nation) frame FIRST (25 "
    "rows regardless of order volume — partial+final hash agg), and "
    "all three window passes run on that bounded frame with "
    "broadcast dims underneath.",
)
def q_rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    wr = Window.partitionBy("region")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return rev.select(
        "region",
        "nation",
        F.col("revenue").cast("double").alias("revenue"),
        F.round(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(wr).cast("double"),
            6,
        ).alias("share_of_region"),
        F.sum("revenue").over(wr).cast("double").alias("region_revenue"),
        F.round(
            F.sum("revenue").over(wr).cast("double")
            / F.sum("revenue").over(wall).cast("double"),
            6,
        ).alias("region_share_of_total"),
    ).orderBy("region", "nation")


@register(
    "price_elasticity_loglog",
    """
    WITH cells AS (
        SELECT p_brand AS brand,
               substring(CAST(l_shipdate AS VARCHAR), 1, 7) AS m,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
                   AS qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
    lg AS (
        SELECT brand,
               CAST(floor(ln(CAST(qty AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
                   AS ly,
               CAST(floor(ln(CAST(rev AS DOUBLE) / CAST(qty AS DOUBLE))
                          * 1000000 + 0.5) AS BIGINT) AS lx
        FROM cells WHERE qty > 0),
    m AS (
        SELECT brand, count(*) AS n,
               CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * lx) AS DECIMAL(38,0))
                   AS sxx,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * ly) AS DECIMAL(38,0))
                   AS sxy
        FROM lg GROUP BY brand)
    SELECT brand, n AS n_months,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
               AS elasticity,
           round((CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
                    * sx) / n / 1000000, 6) AS ln_intercept
    FROM m ORDER BY brand
    """,
    doc="Own-price elasticity per brand: OLS slope of ln(monthly "
    "quantity) on ln(average unit price) over brand-month demand "
    "cells — the log-log regression whose slope IS the elasticity "
    "estimate, the pricing team's first screen. The fact collapses "
    "to brand-month cells first (decimal-exact quantity and revenue "
    "sums), logs are micro-nat quantized at the cell level (the "
    "ln-pinning convention, cf. text_zipf_fit), and the per-brand "
    "slope comes from exact integer power sums (DECIMAL(38,0) for "
    "the squared terms — micro-nats square to ~1e26 at warehouse "
    "month counts). Intercept reported in natural-log units. Scale: "
    "one fact scan -> bounded cell frame; the regression is "
    "closed-form on per-brand sums, no iteration.",
)
def q_price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cells = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.substring(F.col("l_shipdate").cast("string"), 1, 7).alias("m"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev"),
        )
    )
    lg = cells.filter(F.col("qty") > 0).select(
        "brand",
        F.floor(F.log(F.col("qty").cast("double")) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("ly"),
        F.floor(
            F.log(F.col("rev").cast("double") / F.col("qty").cast("double"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lx"),
    )
    m = lg.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("lx").cast("bigint").alias("sx"),
        F.sum("ly").cast("bigint").alias("sy"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("lx"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("ly"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (F.col("n") * d("sxy") - d("sx") * F.col("sy")) / (
        F.col("n") * d("sxx") - d("sx") * F.col("sx")
    )
    return m.select(
        "brand",
        F.col("n").alias("n_months"),
        F.round(slope, 6).alias("elasticity"),
        F.round(
            (d("sy") - slope * F.col("sx")) / F.col("n") / 1000000, 6
        ).alias("ln_intercept"),
    ).orderBy("brand")


@register(
    "returns_rate_mart",
    """
    WITH j AS (
        SELECT n_name AS nation,
               substring(CAST(l_shipdate AS VARCHAR), 1, 7) AS m,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r,
               CAST(l_quantity AS DECIMAL(12,2)) AS qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_shipdate IS NOT NULL),
    g AS (
        SELECT nation, m,
               count(*) AS n_lines,
               CAST(SUM(r) AS BIGINT) AS n_returned,
               CAST(SUM(CASE WHEN r = 1 THEN qty ELSE 0 END)
                    AS DECIMAL(18,2)) AS qty_returned,
               CAST(SUM(qty) AS DECIMAL(18,2)) AS qty_total
        FROM j GROUP BY 1, 2)
    SELECT nation, m,
           n_lines, n_returned,
           round(CAST(n_returned AS DOUBLE) / n_lines, 6) AS line_return_rate,
           -- + 0.0 normalizes the SIGN OF ZERO: a zero returned-qty over
           -- a NEGATIVE month total (extremenullmix composite — extreme
           -- negative quantities x a NULL-masked returnflag) is IEEE
           -- -0.0, which DuckDB's round keeps and Spark's drops
           round(CAST(qty_returned AS DOUBLE) / CAST(qty_total AS DOUBLE), 6)
               + 0.0 AS qty_return_rate,
           round(CAST(n_returned AS DOUBLE) / n_lines
                 - lag(CAST(n_returned AS DOUBLE) / n_lines)
                   OVER (PARTITION BY nation ORDER BY m), 6) AS mom_delta
    FROM g ORDER BY nation, m
    """,
    doc="Returns-rate mart: monthly line- and quantity-weighted return "
    "rates per customer nation with the month-over-month delta — the "
    "reverse-logistics KPI sheet (l_returnflag = 'R' marks returned "
    "lines). Counts and quantities are exact (integer / decimal) "
    "before the ratio; the MoM delta lags the same fixed double "
    "expression so both engines subtract identical values. Scale: "
    "one star join (broadcast nation) collapsing to the bounded "
    "nation-month frame; the lag window runs on that frame.",
)
def q_returns_rate_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # an undated line has no month cell (nullmix probe axis)
    j = (
        t["lineitem"].filter(F.col("l_shipdate").isNotNull())
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.substring(F.col("l_shipdate").cast("string"), 1, 7).alias("m"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"),
            F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        )
    )
    g = j.groupBy("nation", "m").agg(
        F.count("*").alias("n_lines"),
        F.sum("r").cast("bigint").alias("n_returned"),
        F.sum(F.when(F.col("r") == 1, F.col("qty")).otherwise(0))
        .cast("decimal(18,2)")
        .alias("qty_returned"),
        F.sum("qty").cast("decimal(18,2)").alias("qty_total"),
    )
    rate = F.col("n_returned").cast("double") / F.col("n_lines")
    wl = Window.partitionBy("nation").orderBy("m")
    return g.select(
        "nation",
        "m",
        "n_lines",
        "n_returned",
        F.round(rate, 6).alias("line_return_rate"),
        # + 0.0: sign-of-zero normalization, mirrored in the oracle
        (
            F.round(
                F.col("qty_returned").cast("double")
                / F.col("qty_total").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("qty_return_rate"),
        F.round(rate - F.lag(rate).over(wl), 6).alias("mom_delta"),
    ).orderBy("nation", "m")


@register(
    "part_substitution_candidates",
    """
    WITH p AS (
        SELECT p_partkey, p_name, p_brand, p_type, p_size,
               CAST(p_retailprice AS DECIMAL(12,2)) AS price
        FROM part),
    pairs AS (
        SELECT a.p_type AS ptype, a.p_size AS psize,
               a.p_brand AS brand_a, b.p_brand AS brand_b,
               a.price - b.price AS saving,
               CAST((a.price - b.price) * 100 AS BIGINT) AS saving_cents
        FROM p a JOIN p b
          ON a.p_type = b.p_type AND a.p_size = b.p_size
         AND a.p_brand <> b.p_brand AND b.price < a.price)
    SELECT ptype, psize,
           count(*) AS n_candidates,
           CAST(max(saving) AS DOUBLE) AS max_saving,
           round(CAST(CAST(floor(CAST(SUM(saving_cents) AS DOUBLE)
                                 / count(*) * 10000 + 0.5) AS BIGINT)
                      AS DOUBLE) / 1000000, 6) AS avg_saving
    FROM pairs GROUP BY 1, 2
    HAVING count(*) >= 3
    ORDER BY ptype, psize
    """,
    doc="Part substitution finder: for every (type, size) equivalence "
    "class, cheaper same-spec parts from a DIFFERENT brand — the "
    "procurement 'can we swap this SKU' screen, reported per class "
    "with candidate count and price savings (classes with <3 "
    "candidates suppressed as noise). Prices stay DECIMAL(12,2) so "
    "savings are exact cents; the mean saving quantizes to integer "
    "micro-units (floor(cents/n*10^4+0.5), the "
    "stats_poisson_bootstrap_ci recipe) because a bare round(x, 6) "
    "on a ~1e9-magnitude double forks between engines at the 16th "
    "digit (EXTREMESWEEP r12). Scale: the pair join is blocked by the "
    "(type, size) class key — the same sum-of-block-squares bound as "
    "the ER blocking join, never an all-pairs catalog scan; "
    "plan-assertable as a pure equi-join.",
)
def q_part_substitution_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"].select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        F.col("p_retailprice").cast("decimal(12,2)").alias("price"),
    )
    a = p.select(
        F.col("p_type").alias("ptype"),
        F.col("p_size").alias("psize"),
        F.col("p_brand").alias("brand_a"),
        F.col("price").alias("price_a"),
    )
    b = p.select(
        F.col("p_type").alias("btype"),
        F.col("p_size").alias("bsize"),
        F.col("p_brand").alias("brand_b"),
        F.col("price").alias("price_b"),
    )
    pairs = a.join(
        b,
        (F.col("ptype") == F.col("btype"))
        & (F.col("psize") == F.col("bsize"))
        & (F.col("brand_a") != F.col("brand_b"))
        & (F.col("price_b") < F.col("price_a")),
    ).select(
        "ptype",
        "psize",
        (F.col("price_a") - F.col("price_b")).alias("saving"),
        ((F.col("price_a") - F.col("price_b")) * 100)
        .cast("bigint")
        .alias("saving_cents"),
    )
    return (
        pairs.groupBy("ptype", "psize")
        .agg(
            F.count("*").alias("n_candidates"),
            F.max("saving").cast("double").alias("max_saving"),
            F.round(
                F.floor(
                    F.sum("saving_cents").cast("double")
                    / F.count("*")
                    * 10000
                    + 0.5
                ).cast("double")
                / 1000000,
                6,
            ).alias("avg_saving"),
        )
        .filter(F.col("n_candidates") >= 3)
        .orderBy("ptype", "psize")
    )


@register(
    "customer_tercile_migration",
    """
    WITH h1 AS (
        SELECT o_custkey AS c,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS x
        FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-07-01'
        GROUP BY 1),
    h2 AS (
        SELECT o_custkey AS c,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,2)) AS x
        FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-07-01'
        GROUP BY 1),
    t1 AS (SELECT c, ntile(3) OVER (ORDER BY x, c) AS t FROM h1),
    t2 AS (SELECT c, ntile(3) OVER (ORDER BY x, c) AS t FROM h2),
    mig AS (
        SELECT t1.t AS tercile_h1, t2.t AS tercile_h2, count(*) AS n
        FROM t1 JOIN t2 ON t1.c = t2.c GROUP BY 1, 2)
    SELECT tercile_h1, tercile_h2, n AS n_customers,
           round(n / CAST(SUM(n) OVER (PARTITION BY tercile_h1) AS DOUBLE), 6)
               AS row_share
    FROM mig ORDER BY tercile_h1, tercile_h2
    """,
    doc="Customer value-segment migration matrix: customers are "
    "terciled by revenue independently in each half of the order "
    "history (split at 1998-07-01) and the 3x3 transition matrix "
    "shows who climbed, held, or slid — the segment-migration "
    "readout behind retention playbooks (complements "
    "customer_rfm_segments, which is a point-in-time cut). Only "
    "customers active in BOTH halves enter the matrix (an inner "
    "join — churn/acquisition are the missing row/column by "
    "design). Terciles use global_ntile (ops/sorts.py): ntile's "
    "exact tiling arithmetic on the two-pass global rank, so "
    "neither half funnels its customer frame through one window "
    "task; ties break on the customer key identically to the "
    "oracle's ntile. Scale: two custkey aggregates, two range-"
    "partitioned ranks, a key join, and a 9-row readout.",
)
def q_customer_tercile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sorts import global_ntile

    o = load_tables(spark, sf_dir)["orders"]
    od = F.col("o_orderdate").cast("date")
    cut = F.lit("1998-07-01").cast("date")

    def half(pred, key):
        rev = (
            o.filter(pred)
            .groupBy(F.col("o_custkey").alias("c"))
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)")
                .alias("x")
            )
        )
        return global_ntile(
            rev, ["x", "c"], 3, alias="t", persist_key=key
        ).select("c", "t")

    t1 = half(od < cut, "tercile_h1")
    t2 = half(od >= cut, "tercile_h2")
    mig = (
        t1.select("c", F.col("t").alias("tercile_h1"))
        .join(t2.select("c", F.col("t").alias("tercile_h2")), "c")
        .groupBy("tercile_h1", "tercile_h2")
        .agg(F.count("*").alias("n"))
    )
    wr = Window.partitionBy("tercile_h1")
    return mig.select(
        "tercile_h1",
        "tercile_h2",
        F.col("n").alias("n_customers"),
        F.round(F.col("n") / F.sum("n").over(wr).cast("double"), 6).alias(
            "row_share"
        ),
    ).orderBy("tercile_h1", "tercile_h2")


def _bisect_oracle_sql(steps: int = 20) -> str:
    """Unrolled-CTE mirror of the SQL-scripting bisection loop (the
    BPE-trainer convention: loops the oracle engine lacks are unrolled
    mechanically at module load)."""
    cte = [
        """tgt AS (SELECT CAST(ceil(count(*) * 0.95) AS BIGINT) AS t
                   FROM orders)""",
        "s0 AS (SELECT 0.0 AS lo, 1048576.0 AS hi, t FROM tgt)",
    ]
    for i in range(1, steps + 1):
        cte.append(f"""
    s{i} AS (
        SELECT CASE WHEN c >= t THEN lo ELSE m END AS lo,
               CASE WHEN c >= t THEN m ELSE hi END AS hi, t
        FROM (SELECT lo, hi, (lo + hi) / 2 AS m, t,
                     (SELECT count(*) FROM orders
                      WHERE CAST(o_totalprice AS DECIMAL(18,2))
                            <= (s.lo + s.hi) / 2) AS c
              FROM s{i - 1} s))""")
    return (
        "WITH "
        + ",\n".join(cte)
        + f""",
    hx AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS y, count(*) AS c
           FROM orders GROUP BY 1),
    cum AS (SELECT y, SUM(c) OVER (ORDER BY y) AS cm FROM hx),
    exact AS (SELECT CAST(min(CASE WHEN cm >= t THEN y END) AS DOUBLE)
                     AS p95_exact
              FROM cum CROSS JOIN tgt)
    SELECT {steps} AS n_iterations, t AS target_rank,
           round(hi, 6) AS p95_bisected, p95_exact
    FROM s{steps} CROSS JOIN exact"""
    )


@register(
    "sql_scripting_bisect_p95",
    _bisect_oracle_sql(20),
    doc="SQL-scripting surface (Spark 4 BEGIN/DECLARE/WHILE/IF): the "
    "95th-percentile order value found by 20 rounds of BISECTION, "
    "each round a data-driven COUNT probe whose result steers the "
    "next bound through procedural SET logic — the control-flow "
    "shape (scalar state + loop + conditional over live query "
    "results) that needed a driver program before SQL scripting "
    "existed. Bounds live on dyadic rationals (start [0, 2^20], "
    "halved each round), so every mid is exactly representable and "
    "the 20-step trajectory is bit-identical in the unrolled-CTE "
    "oracle (the BPE-trainer unrolling convention); the exact "
    "histogram-rank p95 rides along for comparison (bisected bound "
    "lands within 2^20/2^20 = 1.0 of it). Scale: honest trade-off "
    "stated — 20 sequential counted scans vs ONE histogram "
    "cumulation (stats_trimmed_mean's machinery); bisection wins "
    "only when the predicate is expensive to histogram (remote "
    "stores, opaque filters), and this operator exists to exercise "
    "the scripting engine, with the exact pick as the recommended "
    "batch path.",
)
def q_sql_scripting_bisect_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sorts import global_cumsum

    t = load_tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("orders_scripting_v")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    script = spark.sql(
        """
        BEGIN
          DECLARE lo DOUBLE = 0.0;
          DECLARE hi DOUBLE = 1048576.0;
          DECLARE mid DOUBLE = 0.0;
          DECLARE cnt BIGINT = 0;
          DECLARE target BIGINT = 0;
          DECLARE i INT = 0;
          SET target = (SELECT CAST(ceil(count(*) * 0.95) AS BIGINT)
                        FROM orders_scripting_v);
          WHILE i < 20 DO
            SET mid = (lo + hi) / 2;
            SET cnt = (SELECT count(*) FROM orders_scripting_v
                       WHERE CAST(o_totalprice AS DECIMAL(18,2)) <= mid);
            IF cnt >= target THEN SET hi = mid; ELSE SET lo = mid; END IF;
            SET i = i + 1;
          END WHILE;
          SELECT i AS n_iterations, target AS target_rank,
                 round(hi, 6) AS p95_bisected;
        END
        """
    )
    h = t["orders"].groupBy(
        F.col("o_totalprice").cast("decimal(18,2)").alias("y")
    ).agg(F.count("*").alias("c"))
    cum = global_cumsum(h, ["y"], "c", alias="cm", persist_key="bisect_cum")
    exact = (
        cum.crossJoin(
            F.broadcast(
                t["orders"].agg(
                    F.ceil(F.count("*") * 0.95).cast("bigint").alias("t")
                )
            )
        )
        .agg(
            F.min(F.when(F.col("cm") >= F.col("t"), F.col("y")))
            .cast("double")
            .alias("p95_exact")
        )
    )
    return script.crossJoin(F.broadcast(exact))


@register(
    "numeric_corr_matrix",
    """
    WITH v AS (
        SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS p,
               CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT) AS d,
               CAST(CAST(l_tax AS DECIMAL(8,4)) * 10000 AS BIGINT) AS t
        FROM lineitem),
    m AS (
        SELECT count(*) AS n,
               CAST(SUM(q) AS DECIMAL(38,0)) AS sq,
               CAST(SUM(p) AS DECIMAL(38,0)) AS sp,
               CAST(SUM(d) AS DECIMAL(38,0)) AS sd,
               CAST(SUM(t) AS DECIMAL(38,0)) AS st,
               CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS sqq,
               CAST(SUM(CAST(p AS DECIMAL(38,0)) * p) AS DECIMAL(38,0)) AS spp,
               CAST(SUM(CAST(d AS DECIMAL(38,0)) * d) AS DECIMAL(38,0)) AS sdd,
               CAST(SUM(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS stt,
               CAST(SUM(CAST(q AS DECIMAL(38,0)) * p) AS DECIMAL(38,0)) AS sqp,
               CAST(SUM(CAST(q AS DECIMAL(38,0)) * d) AS DECIMAL(38,0)) AS sqd,
               CAST(SUM(CAST(q AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS sqt,
               CAST(SUM(CAST(p AS DECIMAL(38,0)) * d) AS DECIMAL(38,0)) AS spd,
               CAST(SUM(CAST(p AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS spt,
               CAST(SUM(CAST(d AS DECIMAL(38,0)) * t) AS DECIMAL(38,0)) AS sdt
        FROM v),
    pairs AS (
        SELECT 'quantity~extendedprice' AS pair,
               CAST(sqp AS DOUBLE) AS sxy, CAST(sq AS DOUBLE) AS sx,
               CAST(sp AS DOUBLE) AS sy, CAST(sqq AS DOUBLE) AS sxx,
               CAST(spp AS DOUBLE) AS syy, n FROM m
        UNION ALL
        SELECT 'quantity~discount', CAST(sqd AS DOUBLE), CAST(sq AS DOUBLE),
               CAST(sd AS DOUBLE), CAST(sqq AS DOUBLE), CAST(sdd AS DOUBLE), n
        FROM m
        UNION ALL
        SELECT 'quantity~tax', CAST(sqt AS DOUBLE), CAST(sq AS DOUBLE),
               CAST(st AS DOUBLE), CAST(sqq AS DOUBLE), CAST(stt AS DOUBLE), n
        FROM m
        UNION ALL
        SELECT 'extendedprice~discount', CAST(spd AS DOUBLE),
               CAST(sp AS DOUBLE), CAST(sd AS DOUBLE), CAST(spp AS DOUBLE),
               CAST(sdd AS DOUBLE), n FROM m
        UNION ALL
        SELECT 'extendedprice~tax', CAST(spt AS DOUBLE), CAST(sp AS DOUBLE),
               CAST(st AS DOUBLE), CAST(spp AS DOUBLE), CAST(stt AS DOUBLE), n
        FROM m
        UNION ALL
        SELECT 'discount~tax', CAST(sdt AS DOUBLE), CAST(sd AS DOUBLE),
               CAST(st AS DOUBLE), CAST(sdd AS DOUBLE), CAST(stt AS DOUBLE), n
        FROM m)
    SELECT pair,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS pearson_r
    FROM pairs ORDER BY pair
    """,
    doc="Pairwise Pearson correlation matrix over the four lineitem "
    "measures (quantity, extended price, discount, tax) — the "
    "numeric-profile screen a modeling pipeline runs before feature "
    "selection (collinear measures, degenerate columns). ONE fact "
    "scan computes all 14 power sums (each measure quantized to its "
    "exact integer grid first: cents resp. basis points), then the "
    "six correlations are closed-form doubles off that 1-row frame — "
    "adding measures grows the sum list, never the scan count. "
    "DECIMAL(38,0) accumulators because cent-scale squares times "
    "warehouse row counts overflow BIGINT. Scale: single "
    "partial+final aggregate; readout is 6 rows.",
)
def q_numeric_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    v = li.select(
        (F.col("l_quantity").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("q"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("p"),
        (F.col("l_discount").cast("decimal(8,4)") * 10000)
        .cast("bigint")
        .alias("d"),
        (F.col("l_tax").cast("decimal(8,4)") * 10000).cast("bigint").alias("t"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = v.agg(
        F.count("*").alias("n"),
        *[
            F.sum(dec(c)).cast("decimal(38,0)").alias(f"s{c}")
            for c in ("q", "p", "d", "t")
        ],
        *[
            F.sum(dec(a) * F.col(b)).cast("decimal(38,0)").alias(f"s{a}{b}")
            for a, b in (
                ("q", "q"), ("p", "p"), ("d", "d"), ("t", "t"),
                ("q", "p"), ("q", "d"), ("q", "t"),
                ("p", "d"), ("p", "t"), ("d", "t"),
            )
        ],
    )
    from .ext.caching import swap_persist

    m = swap_persist("corr_matrix_sums", m)
    names = {
        ("q", "p"): "quantity~extendedprice",
        ("q", "d"): "quantity~discount",
        ("q", "t"): "quantity~tax",
        ("p", "d"): "extendedprice~discount",
        ("p", "t"): "extendedprice~tax",
        ("d", "t"): "discount~tax",
    }
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    outs = []
    for (a, b), label in names.items():
        # try_divide: n = 1 zeroes both variance terms (r10 sweep)
        r = F.try_divide(
            F.col("n") * dd(f"s{a}{b}") - dd(f"s{a}") * dd(f"s{b}"),
            F.sqrt(
                (F.col("n") * dd(f"s{a}{a}") - dd(f"s{a}") * dd(f"s{a}"))
                * (F.col("n") * dd(f"s{b}{b}") - dd(f"s{b}") * dd(f"s{b}"))
            ),
        )
        outs.append(
            m.select(F.lit(label).alias("pair"), F.round(r, 6).alias("pearson_r"))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("pair")


@register(
    "sql_parameterized_revenue_bands",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) >= 200000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           round(CAST(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2))
                                    >= 200000 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS large_share
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Parameterized SQL surface (Spark 3.4+ named parameter "
    "markers): the query text carries :status and :threshold "
    "placeholders and the VALUES arrive through spark.sql(..., "
    "args={...}) — the injection-safe templating path an "
    "application layer should use instead of string formatting "
    "(parameters are bound as literals by the parser, never "
    "concatenated). Semantically a plain filtered band aggregate, "
    "so the oracle inlines the same constants. Scale: pushed "
    "filter + partial/final agg; the parameter binding is purely a "
    "front-end surface.",
)
def q_sql_parameterized_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2))
                                  >= :threshold THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_large,
               round(CAST(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(18,2))
                                        >= :threshold THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS large_share
        FROM orders
        WHERE o_orderstatus = :status
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"status": "F", "threshold": 200000},
    )
