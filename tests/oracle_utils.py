"""DuckDB differential-oracle harness — local mirror of the driver's check.

Runs the Spark query and the oracle SQL on the same parquet tables and
compares row count, column names, and an order-insensitive canonical form
of every value. Values must match EXACTLY (decimals/ints/strings/dates
string-identical; floats bit-identical) — that way whatever hashing the
driver applies, we pass.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from salesdata_engineering_spark.schemas import TESTDATA_TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata is one file per table; derived scale data
        # (tools/gen_sf1.py) is a DIRECTORY of part files per table —
        # DuckDB needs the glob form for the latter
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, np.integer):
        v = int(v)
    if isinstance(v, Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s or "0"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp | datetime | date):
        return str(v)
    if isinstance(v, bool | np.bool_):
        return str(bool(v))
    return str(v)


def canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    rows = [tuple(canon_value(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def assert_oracle_match(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"):
    spark_pd = spark_df.toPandas()
    oracle_pd = con.execute(sql).df()
    s_cols, s_rows = canon_frame(spark_pd)
    o_cols, o_rows = canon_frame(oracle_pd)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}"
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]} (cols={s_cols})"
