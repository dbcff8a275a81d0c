"""Mart pipeline semantics: groupBy ≡ the reference's window-sum+distinct,
rank tie behavior, and the driver entry smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesdata_engineering_spark.datasets import canonical_sales
from salesdata_engineering_spark.functions import month_key
from salesdata_engineering_spark.ops.aggregations import grouped_sum, window_sum_distinct


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in row) for row in df.select(cols).collect())


def test_window_sum_distinct_equals_grouped_sum(tables):
    """SURVEY §4 'window→aggregate rewrite': the engine's groupBy form must
    reproduce the reference's window+distinct form row-for-row
    (customer_mart_sql_tranform_write.py:10-19)."""
    sales = canonical_sales(tables).withColumn("sales_month", month_key("sales_date"))
    keys = ["customer_id", "sales_month"]
    a = grouped_sum(sales, keys, "total_cost", alias="total")
    b = window_sum_distinct(sales, keys, "total_cost", alias="total")
    assert _canon(a) == _canon(b)


def test_sales_team_mart_rank_ties_pay_twice(spark):
    """W3 tie semantics: rank() (not row_number) — tied top salespeople all
    get the incentive (sales_data_mart_sql_transform.py:17-24)."""
    from salesdata_engineering_spark.marts import sales_team_mart

    rows = [
        # store 1, month 2024-01: two reps tied at 100.00, one at 50.00
        (1, 1, "2024-01-05", 100.0),
        (1, 2, "2024-01-06", 100.0),
        (1, 3, "2024-01-07", 50.0),
    ]
    sales = spark.createDataFrame(
        rows, "store_id int, sales_person_id int, sales_date string, total_cost double"
    ).withColumn("total_cost", F.col("total_cost").cast("decimal(18,2)"))
    out = {r["sales_person_id"]: str(r["incentive"]) for r in sales_team_mart(sales).collect()}
    assert out[1] == "1.00" and out[2] == "1.00", "both rank-1 ties must be paid"
    assert out[3] == "0.00"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"store_id", "sales_person_id", "sales_month", "total_sales", "incentive"}


def test_queries_and_oracles_aligned():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


def test_observe_metrics_match_recompute(spark, sf_dir):
    """Observation API (CollectMetrics): in-flight metrics collected
    during one mart pass must equal a separate aggregate recompute —
    the zero-extra-scan pipeline-telemetry surface."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from salesdata_engineering_spark.datasets import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
    )
    n_rows = observed.count()  # one action materializes the metrics
    direct = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
    ).collect()[0]
    assert obs.get["n"] == direct.n == n_rows
    assert obs.get["total"] == direct.total


def test_to_arrow_roundtrip_matches_to_pandas(spark, sf_dir):
    """Spark 4 DataFrame.toArrow(): the Arrow table must carry the
    same rows/values as toPandas for a mixed-type frame."""
    from salesdata_engineering_spark.datasets import load_tables

    nation = load_tables(spark, sf_dir)["nation"]
    at = nation.toArrow()
    pd_direct = nation.toPandas()
    assert at.num_rows == len(pd_direct)
    assert set(at.column_names) == set(pd_direct.columns)
    assert sorted(at.column("n_name").to_pylist()) == sorted(
        pd_direct["n_name"].tolist()
    )
