"""Ingestion-lifecycle tests on the three FIXTURES.md input shapes:
valid / extra-column (folded) / missing-column (rejected), plus ledger
A/I semantics and rerun (recovery) behavior — the reference's
main.py:33-204 pipeline as observable behavior."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from salesdata_engineering_spark.ingest import (
    ADDITIONAL_COLUMN,
    STATUS_DONE,
    FileLedger,
    ingest_batch,
    read_with_fold,
    union_files,
    validate_files,
)

VALID_CSV = """customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost
6,121,quaker oats,2024-01-01,1,212,4,848
18,123,sugar,2024-01-01,8,50,5,250
"""

EXTRA_CSV = """customer_id,store_id,product_name,sales_date,sales_person_id,price,quantity,total_cost,payment_mode,channel
3,122,refined oil,2024-01-02,5,110,2,220,cash,web
9,121,clean wipes,2024-01-02,2,200,1,200,UPI,store
"""

MISSING_CSV = """customer_id,product_name,sales_date,sales_person_id,price,quantity,total_cost
11,milk,2019-08-19,"[1, 2, 3]",40,3,120
"""


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    (d / "sales_data_2024-01-01.csv").write_text(VALID_CSV)
    (d / "sales_data_2024-01-02.csv").write_text(EXTRA_CSV)
    (d / "sales_data_2019-08-19.csv").write_text(MISSING_CSV)
    return d


def test_validate_rejects_missing_columns(spark, landing):
    res = validate_files(spark, sorted(str(p) for p in landing.glob("*.csv")))
    assert len(res.ok) == 2
    [(bad, missing)] = res.rejected.items()
    assert bad.endswith("2019-08-19.csv") and missing == ["store_id"]


def test_extra_columns_folded_with_exact_name(spark, landing):
    df = read_with_fold(spark, str(landing / "sales_data_2024-01-02.csv"))
    assert df.columns[-1] == ADDITIONAL_COLUMN  # space preserved
    vals = {r[ADDITIONAL_COLUMN] for r in df.collect()}
    # values comma-joined in column order (main.py:195 concat_ws ", ")
    assert vals == {"cash, web", "UPI, store"}


def test_valid_file_gets_null_additional_column(spark, landing):
    df = read_with_fold(spark, str(landing / "sales_data_2024-01-01.csv"))
    assert [r[ADDITIONAL_COLUMN] for r in df.collect()] == [None, None]


def test_union_by_name_mixes_shapes(spark, landing):
    df = union_files(
        spark,
        [str(landing / "sales_data_2024-01-01.csv"), str(landing / "sales_data_2024-01-02.csv")],
    )
    assert df.count() == 4
    assert df.filter(F.col(ADDITIONAL_COLUMN).isNull()).count() == 2


def test_ingest_batch_end_to_end_with_ledger_and_rerun(spark, tmp_path, landing):
    error_dir = tmp_path / "errors"
    ledger = FileLedger(spark, str(tmp_path / "ledger"))

    df, report = ingest_batch(spark, str(landing), str(error_dir), ledger)
    assert report.rows == 4 and len(report.accepted) == 2
    # rejected file physically moved (parity: move-to-error lifecycle)
    assert [p.name for p in error_dir.iterdir()] == ["sales_data_2019-08-19.csv"]
    assert not (landing / "sales_data_2019-08-19.csv").exists()
    # accepted files are in-flight (A) until the caller finishes
    assert ledger.in_flight().count() == 2
    ledger.record(report.accepted, STATUS_DONE)
    assert ledger.in_flight().count() == 0

    # rerun: nothing new → no frame, no reprocessing (recovery semantics
    # of main.py:39-49 — completed files are skipped)
    df2, report2 = ingest_batch(spark, str(landing), str(error_dir), ledger)
    assert df2 is None and report2.accepted == []

    # a new file lands → only it is processed
    (landing / "sales_data_2024-01-03.csv").write_text(VALID_CSV)
    df3, report3 = ingest_batch(spark, str(landing), str(error_dir), ledger)
    assert len(report3.accepted) == 1 and report3.rows == 2


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from salesdata_engineering_spark.io import compact_parquet

    out = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(64).write.parquet(out)
    before = len(list((tmp_path / "frag").glob("*.parquet")))
    assert before >= 32  # fragmented
    n = compact_parquet(spark, out, target_file_mb=128)
    after = len(list((tmp_path / "frag").glob("*.parquet")))
    assert n == 1 and after == 1
    assert spark.read.parquet(out).count() == 10_000  # lossless
