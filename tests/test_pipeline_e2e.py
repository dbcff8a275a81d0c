"""End-to-end pipeline: ingest fixture CSVs → enrich → both marts →
partitioned parquet → read back with partition pruning. Golden values
computed independently with DuckDB over the same CSVs (SURVEY §7 step 8).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from salesdata_engineering_spark.ingest import FileLedger, ingest_batch
from salesdata_engineering_spark.io import write_parquet_partitioned
from salesdata_engineering_spark.marts import customer_monthly_spend, sales_team_mart

CSV_A = """customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost
1,121,oats,2024-01-05,1,100,2,200
1,121,sugar,2024-01-20,1,50,4,200
2,121,oats,2024-01-07,2,100,3,300
2,122,milk,2024-02-02,4,60,1,60
"""

CSV_B = """customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost,payment_mode
1,121,ghee,2024-02-11,2,500,1,500,cash
3,122,milk,2024-02-12,4,60,5,300,UPI
3,122,oats,2024-02-25,5,100,1,100,cash
"""


@pytest.fixture()
def ingested(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "sales_data_2024-01-31.csv").write_text(CSV_A)
    (landing / "sales_data_2024-02-28.csv").write_text(CSV_B)
    ledger = FileLedger(spark, str(tmp_path / "ledger"))
    df, report = ingest_batch(spark, str(landing), str(tmp_path / "err"), ledger)
    assert report.rows == 7
    return df


def _duck(sql: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW sales AS "
        + " UNION ALL ".join(
            f"SELECT customer_id, store_id, sales_date, sales_person_id, total_cost "
            f"FROM (VALUES {vals}) t(customer_id, store_id, sales_date, sales_person_id, total_cost)"
            for vals in [
                "(1,121,'2024-01-05',1,200),(1,121,'2024-01-20',1,200),"
                "(2,121,'2024-01-07',2,300),(2,122,'2024-02-02',4,60)",
                "(1,121,'2024-02-11',2,500),(3,122,'2024-02-12',4,300),(3,122,'2024-02-25',5,100)",
            ]
        )
    )
    return con.execute(sql).fetchall()


def test_customer_mart_matches_duckdb_golden(spark, ingested):
    cust = spark.createDataFrame(
        [(1, "Ada L"), (2, "Grace H"), (3, "Edsger D")], "customer_id int, full_name string"
    )
    mart = customer_monthly_spend(ingested, cust)
    got = {
        (r.customer_id, r.sales_month): (float(r.total_sales), r.full_name)
        for r in mart.collect()
    }
    golden = _duck(
        """SELECT customer_id, substring(sales_date,1,7) m, SUM(total_cost)
           FROM sales GROUP BY 1,2"""
    )
    names = {1: "Ada L", 2: "Grace H", 3: "Edsger D"}
    assert got == {
        (c, m): (float(s), names[c]) for c, m, s in golden
    }


def test_sales_mart_rank_ties_and_incentive(spark, ingested):
    mart = sales_team_mart(ingested)
    rows = {
        (r.store_id, r.sales_person_id, r.sales_month): (float(r.total_sales), float(r.incentive))
        for r in mart.collect()
    }
    # store 121 / 2024-01: sp1 sold 400, sp2 sold 300 → sp1 gets 1% of 400
    assert rows[(121, 1, "2024-01")] == (400.0, 4.0)
    assert rows[(121, 2, "2024-01")] == (300.0, 0.0)
    # store 122 / 2024-02: sp4 sold 360, sp5 sold 100
    assert rows[(122, 4, "2024-02")] == (360.0, 3.6)
    assert rows[(122, 5, "2024-02")] == (100.0, 0.0)


def test_rank_tie_pays_both(spark):
    """W3 hard-part: rank() ties — two salespeople tied for top BOTH get
    rank 1 and BOTH get the incentive (sales_data_mart_sql_transform.py:
    17-24; do not 'fix' to row_number)."""
    sales = spark.createDataFrame(
        [(1, 9, "p", "2024-03-01", 1, 100.0, 1, 250.0),
         (2, 9, "p", "2024-03-02", 2, 100.0, 1, 250.0),
         (3, 9, "p", "2024-03-03", 3, 100.0, 1, 100.0)],
        "customer_id int, store_id int, product_name string, sales_date string, "
        "sales_person_id int, price double, quantity int, total_cost double",
    )
    mart = sales_team_mart(sales)
    inc = {r.sales_person_id: float(r.incentive) for r in mart.collect()}
    assert inc[1] == 2.5 and inc[2] == 2.5 and inc[3] == 0.0


def test_partitioned_write_prunes_on_read(spark, ingested, tmp_path):
    """S5 layout → reading one (sales_month, store_id) partition must
    show PartitionFilters in the scan and touch only that directory."""
    out = str(tmp_path / "mart")
    enriched = ingested.withColumn("sales_month", F.substring("sales_date", 1, 7))
    write_parquet_partitioned(enriched, out, ["sales_month", "store_id"])
    back = spark.read.parquet(out).filter(
        (F.col("sales_month") == "2024-01") & (F.col("store_id") == 121)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "sales_month" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == 3
    # only matching partition dirs exist under the month dir
    month_dirs = {p.name for p in (tmp_path / "mart").glob("sales_month=*")}
    assert "sales_month=2024-01" in month_dirs, month_dirs  # layout exists
    store_dirs = {
        p.name
        for p in (tmp_path / "mart" / "sales_month=2024-01").glob("store_id=*")
    }
    assert "store_id=121" in store_dirs, store_dirs

def test_observe_metrics_ride_the_action(spark, tables):
    """df.observe(): pipeline metrics (row count, exact revenue sum)
    accumulate DURING the action on the SAME scan — the zero-cost
    alternative to a second metrics pass over a 100 TB fact. The
    observed values must equal a direct aggregate."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("orders_metrics")
    o = tables["orders"].observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
    )
    o.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = tables["orders"].agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
    ).collect()[0]
    assert got["n_rows"] == direct.n
    assert got["revenue"] == direct.s
