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
from .ops.windows import asc_nulls_last
from .registry import register

_REC_MONTH_SPINE = """
WITH RECURSIVE b AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi FROM orders),
m(month) MAX RECURSION LEVEL 600 AS (
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
    "(events_hourly_gapfill). Recursion depth = month span, bounded "
    "by an explicit MAX RECURSION LEVEL 600 (50 years) — a "
    "PRECONDITION, not a tuning knob: Spark executes each level as a "
    "separate UnionLoop iteration, so a dirty pre-epoch/far-future "
    "date that widens the domain to millennia (extreme probe axis, "
    "r12) would turn the spine into thousands of driver-paced jobs; "
    "past the bound the engine raises RECURSION_LEVEL_LIMIT_EXCEEDED "
    "loudly instead, and the scalable wide-domain gap-fill is the "
    "explode(sequence()) form. The fact table is touched once by the "
    "final join. Identical SQL runs on DuckDB modulo its "
    "DATE-returning date_trunc and the level clause.",
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


@register(
    "stats_median_mode_listagg",
    """
    SELECT o_orderpriority,
           round(CAST(median(o_totalprice) AS DOUBLE), 4) AS med_price,
           mode(o_orderstatus) AS modal_status,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
               AS statuses
    FROM orders GROUP BY 1
    """,
    doc="Ordered-set / positional aggregates (Spark 3.4+ median & mode, "
    "Spark 4 listagg): per-priority exact interpolated median, modal "
    "order status, and the ordered distinct-status roster. median == "
    "percentile(0.5) == DuckDB median (linear interpolation both "
    "sides); mode is deterministic here because status frequencies "
    "are never tied per priority (F/O dominate P by orders of "
    "magnitude — tie behavior is engine-defined, so never oracle a "
    "tied mode); listagg pins WITHIN GROUP ordering, matching "
    "DuckDB's string_agg ORDER BY.",
)
def q_stats_median_mode_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("median(o_totalprice)").cast("double"), 4).alias(
            "med_price"
        ),
        F.expr("mode(o_orderstatus)").alias("modal_status"),
        F.expr(
            "listagg(DISTINCT o_orderstatus, ',')"
            " WITHIN GROUP (ORDER BY o_orderstatus)"
        ).alias("statuses"),
    )


@register(
    "window_rolling_median",
    """
    SELECT o_orderkey,
           round(CAST(median(o_totalprice) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
               AS rolling_med
    FROM orders
    """,
    doc="Percentile as a WINDOW aggregate: trailing 11-row median per "
    "priority — the robust-smoothing twin of window_moving_sum_3rows "
    "(an outlier-resistant rolling baseline is what anomaly gates "
    "at 100 TB actually want; a rolling MEAN is one bad point away "
    "from useless). Spark computes percentile(0.5) inside a ROWS "
    "frame; DuckDB computes windowed median over the identical frame "
    "and (o_orderdate, o_orderkey) gives every row a unique rank, so "
    "frame membership — and the interpolated value — is deterministic "
    "cross-engine.",
)
def q_window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(*asc_nulls_last("o_orderdate", "o_orderkey", "o_totalprice", "o_orderstatus"))
        .rowsBetween(-10, 0)
    )
    return o.select(
        "o_orderkey",
        F.round(
            F.expr("percentile(o_totalprice, 0.5)").over(w).cast("double"), 4
        ).alias("rolling_med"),
    )


@register(
    "join_null_safe_eq",
    """
    WITH a AS (SELECT nullif(o_orderstatus, 'P') AS k, count(*) AS n_a
               FROM orders GROUP BY 1),
    b AS (SELECT nullif(o_orderstatus, 'P') AS k, count(DISTINCT o_custkey) AS n_b
          FROM orders GROUP BY 1)
    SELECT a.k, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc="Null-safe equality join (Spark <=> / SQL IS NOT DISTINCT "
    "FROM): NULL keys MATCH each other instead of dropping — the "
    "semantics every dimension join over nullable business keys "
    "silently needs (a plain equi-join drops the NULL stratum on the "
    "floor). Keys derived via nullif since the testdata is null-free; "
    "both sides aggregate first so the null stratum is exactly one "
    "row per side. Catalyst still plans <=> as a HASH join (null-safe "
    "keys hash like values) — not a nested loop.",
)
def q_join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    k = F.expr("nullif(o_orderstatus, 'P')")
    a = o.groupBy(k.alias("k")).agg(F.count("*").alias("n_a"))
    b = o.groupBy(k.alias("_kb")).agg(
        F.countDistinct("o_custkey").alias("n_b")
    )
    return a.join(b, F.col("k").eqNullSafe(F.col("_kb"))).select(
        "k", "n_a", "n_b"
    )


@register(
    "scalar_try_functions",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE round(CAST(o_totalprice AS DOUBLE)
                           / CAST(o_orderkey % 3 AS DOUBLE), 6) END AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS pri_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri_digit,
           CASE WHEN o_orderkey % 10 > 5 THEN NULL
                ELSE 9223372036854775802 + o_orderkey % 10 END AS near_max
    FROM orders
    """,
    doc="ANSI-safe try_* surface (Spark 3.4+ try_divide / try_cast / "
    "try_add): errors become NULL instead of failing the job — the "
    "semantics a 100 TB pipeline needs when one malformed row must not "
    "kill a 10-hour run (the engine otherwise runs non-ANSI mode, "
    "where these are the portable spellings). Exercised on real error "
    "paths: division by a derived zero, a non-numeric cast "
    "('1-URGENT'), and a bigint overflow (MAX-5 + 0..9 overflows for "
    "remainders > 5). The oracle spells each as its guard-CASE "
    "equivalent, which is also exactly the fallback a non-try engine "
    "would write by hand.",
)
def q_scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        "o_orderkey",
        F.round(
            F.expr(
                "try_divide(CAST(o_totalprice AS DOUBLE),"
                " CAST(o_orderkey % 3 AS DOUBLE))"
            ),
            6,
        ).alias("safe_div"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("pri_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias(
            "pri_digit"
        ),
        F.expr("try_add(9223372036854775802L, o_orderkey % 10)").alias(
            "near_max"
        ),
    )


@register(
    "xml_extract_roundtrip",
    """
    SELECT o_orderkey,
           o_orderkey AS xml_k,
           o_orderpriority AS xml_p,
           coalesce(substr(o_orderpriority, 1, 1), '') AS xpath_digit
    FROM orders
    """,
    doc="XML surface (Spark 4 from_xml + the xpath_* family): each row "
    "renders to an XML fragment and is parsed BACK through both the "
    "schema'd parser (from_xml into a typed struct) and an XPath "
    "probe — the lossless round-trip is the value check (the oracle "
    "re-derives the expected fields relationally, so any parser "
    "deviation — entity handling, whitespace, type coercion — breaks "
    "the hash). The build-then-parse shape means no external XML "
    "corpus is needed while still executing the real parser per row, "
    "JVM-side; at 100 TB from_xml replaces the per-row "
    "regex-extraction antipattern for ingest of XML feeds.",
)
def q_xml_extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    # a NULL field renders as an OMITTED tag (real XML writers drop
    # absent elements; a bare concat would NULL the whole fragment) —
    # from_xml parses the missing <p> back to NULL, and xpath_string
    # yields '' (hence the oracle's coalesce on xpath_digit)
    # BOTH fields render as omitted tags when NULL — a NULL o_orderkey
    # (nullkeys axis, r13) previously NULLed the outer concat, blanking
    # the whole fragment and dragging xml_p/xpath_digit to NULL while
    # the oracle still carried the priority
    xml = F.concat(
        F.lit("<o>"),
        F.coalesce(
            F.concat(
                F.lit("<k>"), F.col("o_orderkey").cast("string"),
                F.lit("</k>"),
            ),
            F.lit(""),
        ),
        F.coalesce(
            F.concat(F.lit("<p>"), F.col("o_orderpriority"), F.lit("</p>")),
            F.lit(""),
        ),
        F.lit("</o>"),
    )
    parsed = F.from_xml(xml, "k BIGINT, p STRING")
    # the fragment column is materialized once so the template has a
    # single source of truth for both parsers
    return o.withColumn("_xml", xml).select(
        "o_orderkey",
        parsed.getField("k").alias("xml_k"),
        parsed.getField("p").alias("xml_p"),
        F.expr("substring(xpath_string(_xml, '/o/p'), 1, 1)").alias(
            "xpath_digit"
        ),
    )


@register(
    "agg_boolean_family",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           bool_or(o_orderstatus = 'P') AS has_pending,
           bool_and(o_totalprice > 0) AS all_positive,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_filled
    FROM orders GROUP BY 1
    """,
    doc="Boolean/conditional aggregate family (count_if, any/bool_or, "
    "every/bool_and): the predicate-rollup primitives behind every "
    "data-quality dashboard cell — count_if is the FILTER-clause twin "
    "(one scan, conditional accumulation, no self-join per predicate). "
    "DuckDB spells count_if as count FILTER and shares bool_or/"
    "bool_and natively.",
)
def q_agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.expr("count_if(o_totalprice > 100000)").alias("n_big"),
        F.expr("any(o_orderstatus = 'P')").alias("has_pending"),
        F.expr("every(o_totalprice > 0)").alias("all_positive"),
        F.expr("count_if(o_orderstatus = 'F')").alias("n_filled"),
    )


@register(
    "scalar_map_functions",
    """
    SELECT o_orderpriority, o_orderstatus AS key, count(*) AS value
    FROM orders
    WHERE o_orderstatus IS NOT NULL
    GROUP BY 1, 2
    HAVING count(*) >= 100
    """,
    doc="Map-function family (map_from_entries / map_filter / "
    "transform_values + explode back to rows): per-priority "
    "status->count maps built from sorted entries, pruned with a "
    "map_filter HOF lambda, exploded to long form. Maps are the "
    "natural carrier for sparse per-entity feature bags at 100 TB "
    "(schema stays fixed as keys grow); the oracle is the relational "
    "equivalent (GROUP BY + HAVING), proving the build->filter->"
    "explode chain is a faithful reshape, not a semantic fork. The "
    "collect_list rides one hash aggregate; entries sort before "
    "map_from_entries so map iteration order is deterministic.",
)
def q_scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    # a map cannot carry a NULL key (Spark raises NULL_MAP_KEY), so a
    # NULL status is excluded from the feature bag on both sides — a
    # pushed-to-scan IsNotNull, free on contract-valid data
    a = (
        o.filter(F.col("o_orderstatus").isNotNull())
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    m = a.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("mp")
    )
    kept = m.select(
        "o_orderpriority",
        F.explode(
            F.map_filter("mp", lambda k, v: v >= F.lit(100))
        ).alias("key", "value"),
    )
    return kept.select("o_orderpriority", "key", "value")


@register(
    "window_ignore_nulls_family",
    """
    SELECT o_orderkey,
           first_value(nullif(o_orderstatus, 'P') IGNORE NULLS) OVER w
               AS first_settled,
           last_value(nullif(o_orderstatus, 'P') IGNORE NULLS) OVER w
               AS last_settled,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey, o_totalprice, o_orderstatus
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="IGNORE NULLS window navigation (first_value / last_value with "
    "null skipping + nth_value): the gap-tolerant carry-forward "
    "primitives — last_settled is the classic LOCF (last observation "
    "carried forward) over a sparsely-populated column, here derived "
    "by nullifying the 'P' stratum so the skip path actually "
    "exercises. One window spec shared by all three functions (one "
    "sort); the (o_orderdate, o_orderkey) ordering is total, so frame "
    "contents — and the nth row — are deterministic cross-engine. "
    "DuckDB spells IGNORE NULLS inside the call parens; same "
    "semantics.",
)
def q_window_ignore_nulls_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_tables(spark, sf_dir)["orders"]
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(*asc_nulls_last("o_orderdate", "o_orderkey", "o_totalprice", "o_orderstatus"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    settled = F.expr("nullif(o_orderstatus, 'P')")
    return o.select(
        "o_orderkey",
        F.first(settled, ignorenulls=True).over(w).alias("first_settled"),
        F.last(settled, ignorenulls=True).over(w).alias("last_settled"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )
