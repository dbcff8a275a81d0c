"""TPC-H optimizer-shape completion: Q2, Q8, Q9, Q11, Q12, Q13, Q15,
Q17, Q20, Q21, Q22 — the eleven shapes the earlier family
(registry_scalar.py: Q3/Q4/Q5/Q7/Q10/Q14/Q16/Q18/Q19, plus the Q1/Q6
twins pricing_summary / filter_range_revenue) didn't cover.

The testdata schema is reduced TPC-H (no partsupp, no comment /
shipmode / commitdate / receiptdate / phone columns), so each query is
ADAPTED to the available columns while preserving the optimizer shape
that makes it interesting:

- Q2   correlated MIN subquery over a derived supply table
         (partsupp stands in as the per-(supplier, part) minimum
         observed unit sell price from lineitem)
- Q8   two-nation-role 7-table join + conditional share aggregate
- Q9   profit = revenue − cost proxy (p_retailprice · quantity),
         multi-join + year extract
- Q11  group HAVING against a scalar aggregate over the SAME derived
         frame (exchange-reuse shape)
- Q12  non-equi date lateness buckets + priority CASE counts
         (shipmode stands in as a shipdate-lateness class)
- Q13  outer-join count distribution (two-level aggregate)
- Q15  derived revenue view consumed twice: once aggregated to its
         MAX, once joined back on equality
- Q17  correlated scalar AVG subquery (Catalyst decorrelates the
         spark.sql form into an aggregate + join)
- Q20  nested semi-join chain with a correlated 50%-of-total guard
- Q21  EXISTS + NOT EXISTS double correlation (semi then anti, both
         with non-equi residuals)
- Q22  anti join + scalar threshold subquery (country code stands in
         as c_nationkey mod 5; "no orders" is windowed to recent
         orders so the anti join is non-degenerate on this data)

Cross-engine determinism rules (same conventions as the rest of the
family): money sums run in DECIMAL and only the final value is cast to
DOUBLE; l_quantity is integer-valued so double sums over it are exact
in any order; unit-price divisions are computed identically per row in
both engines and only MIN/MAX'd (order-independent); year() is cast to
INT (DuckDB returns BIGINT).

Reference parity: the reference engine has no TPC-H suite; this module
is part of the beyond-reference relational surface (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datasets import load_tables
from .registry import register

# the load-bearing cross-engine revenue expression is defined ONCE, in
# registry_scalar (same module the Q3-Q19 family uses) — a second copy
# here could drift in precision
from .registry_scalar import _REV
from .registry_scalar import _drev as _rev


# per-(supplier, part) minimum observed unit sell price — the partsupp
# stand-in shared by Q2 and (in spirit) Q11/Q20's value tables
#: zero-quantity lines have no unit price — excluded, or the derived
#: cost is an ANSI divide-by-zero (extreme probe axis, r12); mirrored
#: in _supply below.
_SUPPLY_SQL = """
    SELECT l_suppkey AS ps_suppkey, l_partkey AS ps_partkey,
           MIN(round(l_extendedprice / l_quantity, 4)) AS ps_supplycost
    FROM lineitem WHERE l_quantity <> 0 GROUP BY 1, 2
"""


def _supply(li: DataFrame) -> DataFrame:
    return li.filter(F.col("l_quantity") != 0).groupBy(
        F.col("l_suppkey").alias("ps_suppkey"), F.col("l_partkey").alias("ps_partkey")
    ).agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 4)).alias(
            "ps_supplycost"
        )
    )


@register(
    "q2_min_cost_supplier",
    f"""
    WITH supply AS ({_SUPPLY_SQL}),
    eu AS (
        SELECT n_nationkey, n_name FROM nation JOIN region
        ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'
    ),
    offers AS (
        SELECT ps_partkey, ps_supplycost, s_suppkey, s_name, s_acctbal, n_name
        FROM supply JOIN supplier ON ps_suppkey = s_suppkey
                    JOIN eu ON s_nationkey = n_nationkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           ps_supplycost AS supplycost
    FROM part JOIN offers ON p_partkey = ps_partkey
    WHERE p_size = 15 AND p_type = 'PROMO'
      AND ps_supplycost = (SELECT MIN(o2.ps_supplycost) FROM offers o2
                           WHERE o2.ps_partkey = p_partkey)
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part in a region): a "
    "correlated MIN subquery over the region-restricted supply table, "
    "decorrelated into a per-part MIN aggregate joined back on "
    "equality — the offers subtree feeds both the min-agg and the "
    "equality probe. partsupp is derived (min observed unit price per "
    "supplier-part from lineitem); unit price divides identically per "
    "row in both engines and MIN is order-independent, so the equality "
    "boundary is exact.",
)
def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    eu = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    offers = (
        _supply(t["lineitem"])
        .join(t["supplier"], F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(eu), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", "ps_supplycost", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = offers.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("_min_cost"))
    p = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
    return (
        offers.join(F.broadcast(best), "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("ps_supplycost").alias("supplycost"),
        )
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(round(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                      / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, {_REV} AS volume,
               n2.n_name AS nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region ON n1.n_regionkey = r_regionkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): the nation dim joins "
    "TWICE in different roles (customer region gate, supplier share "
    "key) across a 7-join star; the share is one conditional aggregate "
    "pass (no self-join), exact in DECIMAL until the final division. "
    "Dims broadcast; the date window pushes to the orders scan and the "
    "type filter into the part scan below its broadcast.",
)
def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(F.col("n_nationkey").alias("_ck"), "n_regionkey")
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("nation")
    )
    j = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_ck"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sk"))
    )
    vol = j.select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        _rev().alias("volume"),
        "nation",
    )
    share = F.sum(
        F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    ).cast("double") / F.sum("volume").cast("double")
    return vol.groupBy("o_year").agg(
        F.round(share, 6).cast("double").alias("mkt_share")
    )


@register(
    "q9_product_type_profit",
    f"""
    SELECT nation, o_year, CAST(round(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REV} - CAST(p_retailprice AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2)) AS amount
        FROM lineitem JOIN part ON p_partkey = l_partkey
                      JOIN supplier ON l_suppkey = s_suppkey
                      JOIN orders ON l_orderkey = o_orderkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (product-type profit by nation and year): "
    "4-way join above a LIKE-filtered part broadcast, profit arithmetic "
    "kept in DECIMAL (cost proxy = retail price · quantity — the "
    "schema has no ps_supplycost). The '%red%' contains-LIKE cannot "
    "push as a range but still prunes the broadcast side before the "
    "join; year extraction casts to INT for cross-engine schema parity.",
    bench=True,
)
def q_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = _rev() - F.col("p_retailprice").cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(12,2)")
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_part_values",
    f"""
    WITH sv AS (
        SELECT l_partkey, SUM({_REV}) AS value_d
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                      JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY 1
    )
    SELECT l_partkey, CAST(round(value_d, 2) AS DOUBLE) AS value
    FROM sv
    WHERE CAST(value_d AS DOUBLE) >
          (SELECT CAST(SUM(value_d) AS DOUBLE) * 0.001 FROM sv)
    """,
    doc="TPC-H Q11 shape (important stock value): HAVING against a "
    "scalar aggregate of the SAME derived frame — the nation-filtered "
    "value table is built once and consumed twice (threshold aggregate "
    "and probe side), the exchange-reuse shape; the threshold joins "
    "back as a broadcast 1-row cross. Sums stay exact DECIMAL; the "
    "0.001 share boundary is evaluated in identical double ops on both "
    "engines.",
)
def q_q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sv = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("value_d"))
    )
    thresh = sv.agg(
        (F.sum("value_d").cast("double") * F.lit(0.001)).alias("_thresh")
    )
    return (
        sv.crossJoin(F.broadcast(thresh))
        .filter(F.col("value_d").cast("double") > F.col("_thresh"))
        .select(
            "l_partkey", F.round("value_d", 2).cast("double").alias("value")
        )
    )


@register(
    "q12_shipment_lateness_priority",
    """
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (shipmode priority census): the grouping key "
    "is a non-equi DERIVED class (shipdate lateness vs order date — "
    "the schema has no shipmode), with the two priority counts as "
    "complementary CASE sums in one pass. The shipdate window pushes "
    "to the lineitem scan; the join stays a key-partitioned equi-join "
    "with the date arithmetic evaluated as a projection, not a join "
    "residual.",
)
def q_q12_lateness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit("late"),
    ).otherwise(F.lit("ontime"))
    return (
        j.select(bucket.alias("ship_bucket"), high.alias("_high"))
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("_high"), 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey
             AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT "
    "OUTER join with a filter INSIDE the join condition (orders that "
    "don't match still yield the customer row with count 0 — pushing "
    "the priority filter below the join would be wrong for an inner "
    "join but is exactly right here, and Catalyst keeps it on the "
    "streamed side), then a two-level aggregate: per-customer count, "
    "then the histogram over counts.",
)
def q_q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = t["customer"].join(
        t["orders"].filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_outer",
    )
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue_d
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
          AND l_suppkey IS NOT NULL
        GROUP BY 1
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_revenue_d, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue_d = (SELECT MAX(total_revenue_d) FROM revenue)
    """,
    doc="TPC-H Q15 shape (top supplier via revenue view): the derived "
    "revenue aggregate is consumed TWICE — once reduced to its scalar "
    "MAX, once probed on equality — the exchange-reuse shape (the "
    "second consumption reuses the first's shuffle instead of "
    "rescanning lineitem). Revenue stays DECIMAL so the max-equality "
    "boundary is exact, ties kept (per spec there is at most one at "
    "real scale; the query returns all).",
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
            # explicit key guard so BOTH consumers see the identical
            # subtree: the supplier equi-join pushes isnotnull(l_suppkey)
            # into the probe branch only, and that one-filter difference
            # defeats exchange reuse (the same different-pruning trap as
            # TF-IDF's df aggregate) — hoisting it into the shared frame
            # makes the two shuffle children canonically equal. The
            # oracle carries the same IS NOT NULL so both engines take
            # the scalar MAX over the same row set (a NULL-suppkey
            # revenue group would otherwise enter only the oracle's).
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_revenue_d"))
    )
    mx = revenue.agg(F.max("total_revenue_d").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_d") == F.col("_max_rev"))
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue_d", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                           AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): a correlated "
    "scalar AVG subquery per part, written as spark.sql so CATALYST "
    "performs the decorrelation — RewriteCorrelatedScalarSubquery "
    "turns it into a per-part avg aggregate left-joined back on "
    "l_partkey (plan-asserted: no nested-loop, one extra aggregate). "
    "l_quantity is integer-valued, so the avg (exact integer sum / "
    "count) and the 0.2x boundary are bit-identical cross-engine.",
)
def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .datasets import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                               AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@register(
    "q20_part_promotion_suppliers",
    """
    WITH avail AS (
        SELECT l_suppkey AS ps_suppkey, l_partkey AS ps_partkey,
               SUM(l_quantity) AS availqty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    totals AS (
        SELECT l_partkey AS tp, 0.5 * SUM(l_quantity) AS half_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (
        SELECT ps_suppkey FROM avail JOIN totals ON ps_partkey = tp
        WHERE ps_partkey IN (SELECT p_partkey FROM part
                             WHERE p_name LIKE 'red%')
          AND availqty > half_qty)
    """,
    doc="TPC-H Q20 shape (part-promotion supplier shortlist): a nested "
    "semi-join chain — suppliers IN (shippers whose in-window quantity "
    "for a promoted part exceeds half that part's total), parts IN (a "
    "prefix-LIKE list) — with the correlated half-of-total guard "
    "decorrelated into a per-part total aggregate equi-joined to the "
    "per-(supplier, part) aggregate. Quantity sums are integer-exact; "
    "both IN lists become LEFT SEMI joins, never materialized.",
)
def q_q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    avail = li.groupBy(
        F.col("l_suppkey").alias("ps_suppkey"), F.col("l_partkey").alias("ps_partkey")
    ).agg(F.sum("l_quantity").alias("availqty"))
    totals = li.groupBy(F.col("l_partkey").alias("tp")).agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("half_qty")
    )
    red_parts = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    strong = (
        avail.join(
            F.broadcast(red_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(totals, F.col("ps_partkey") == F.col("tp"))
        .filter(F.col("availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(
                    F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(strong, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "EXISTS / NOT EXISTS double correlation — a LEFT SEMI join (some "
    "OTHER supplier contributed to the order) stacked with a LEFT ANTI "
    "join (no OTHER supplier was ALSO late), both on the order key "
    "with non-equi residuals (supplier inequality; the anti side also "
    "carries the outer o_orderdate lateness bound — receiptdate/"
    "commitdate stand-in). The order-status and nation gates prune "
    "before the correlation joins.",
    bench=True,
)
def q_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ext.caching import swap_persist

    t = load_tables(spark, sf_dir)
    # r14 rewrite (guide §2.4 — operations keyed the same way share one
    # exchange): the EXISTS / NOT EXISTS double correlation used to run
    # as a LEFT SEMI + LEFT ANTI join, each shuffling a FULL extra copy
    # of lineitem on l_orderkey. Both correlations only ask per-order
    # questions — "does some OTHER supplier contribute a line?" /
    # "is no OTHER supplier ALSO late?" — so they collapse into ONE
    # aggregate over the already-order-keyed l⨝o frame:
    #   EXISTS l2 (l2.supp <> s)        ⟺ n_distinct_suppliers >= 2
    #   NOT EXISTS l3 (late, <> s)      ⟺ n_distinct_LATE_suppliers = 1
    # (for an l1 row, s itself is late and non-NULL — a NULL-suppkey l1
    # fails both the original <> comparisons and the downstream
    # supplier equi-join, and count_distinct ignores NULL suppkeys
    # exactly as the <> comparisons reject them). Grouping carries
    # o_orderdate so lateness is judged against each outer row's OWN
    # order date — bit-equal to the correlated form even on degenerate
    # duplicate-orderkey data. The aggregate and both downstream joins
    # reuse the l⨝o join's l_orderkey clustering (subset rule), so at
    # scale the query does 2 lineitem-sized exchanges instead of 4.
    lo = swap_persist(
        "q21_lo",
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t["orders"]
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            "o_orderdate",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("_late"),
        ),
    )
    # two-level aggregation instead of two count_distincts (which would
    # plan an Expand doubling the pre-aggregate rows): per-supplier
    # any-late first, then per-order counts — both levels and the
    # downstream join reuse the same l_orderkey clustering
    per_supp = lo.groupBy("l_orderkey", "o_orderdate", "l_suppkey").agg(
        F.max("_late").alias("_any_late")
    )
    stats = (
        per_supp.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.count("l_suppkey").alias("_nsupp"),
            F.count(
                F.when(F.col("_any_late"), F.col("l_suppkey"))
            ).alias("_nlate"),
        )
        .filter((F.col("_nsupp") >= 2) & (F.col("_nlate") == 1))
        .select("l_orderkey", "o_orderdate")
    )
    waiting = lo.filter(F.col("_late")).join(
        stats, ["l_orderkey", "o_orderdate"]
    )
    return (
        waiting.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q22_global_sales_opportunity",
    """
    SELECT cntrycode, count(*) AS numcust,
           CAST(round(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS totacctbal
    FROM (SELECT c_custkey, c_nationkey % 5 AS cntrycode, c_acctbal
          FROM customer) c
    WHERE cntrycode IN (0, 1, 2)
      AND CAST(c_acctbal AS DOUBLE) >
          (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                  / count(*)
           FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape (dormant high-balance customers): scalar "
    "threshold subquery (average positive balance — summed in exact "
    "DECIMAL, divided once in double, so the comparison boundary is "
    "bit-identical cross-engine) + NOT EXISTS against recent orders "
    "as a LEFT ANTI join (the schema-faithful 'no orders at all' is "
    "degenerate on this data — every customer has one — so the anti "
    "join is windowed to recent orders; country code stands in as "
    "c_nationkey mod 5). The anti join's date filter pushes into the "
    "orders scan below the join.",
)
def q_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pos = t["customer"].filter(F.col("c_acctbal") > 0.0)
    thresh = pos.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("_avg_bal")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    c = (
        t["customer"]
        .withColumn("cntrycode", F.col("c_nationkey") % 5)
        .filter(F.col("cntrycode").isin(0, 1, 2))
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal").cast("double") > F.col("_avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return c.groupBy("cntrycode").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("totacctbal"),
    )
