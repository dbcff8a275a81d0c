"""Differential property tests on seeded random data — independent
oracles (plain Spark rewrite, pandas.merge_asof) rather than DuckDB,
covering the custom operators' algebraic contracts:

- salted_sum(keys, v) ≡ groupBy(keys).sum(v) for ANY salt count
  (the salt must never change the result, only the shuffle shape)
- asof_join ≡ pandas.merge_asof(direction='backward') on
  dup-free right sides (pandas is the reference semantics for as-of)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from salesdata_engineering_spark.ops.asof import asof_join
from salesdata_engineering_spark.ops.skew import salted_sum


def test_salted_sum_equals_plain_groupby_any_salts(spark):
    rng = np.random.default_rng(7)
    n = 20_000
    pdf = pd.DataFrame(
        {
            # zipf-ish: one key takes ~half the rows — the skew case the op exists for
            "k": np.where(rng.random(n) < 0.5, 0, rng.integers(0, 50, n)),
            "rid": np.arange(n),
            # 2-decimal money values; sums are exact in decimal
            "v": (rng.integers(0, 100_000, n) / 100.0),
        }
    )
    df = spark.createDataFrame(pdf)
    plain = {
        r.k: r.s
        for r in df.groupBy("k").agg(F.sum(F.col("v").cast("decimal(14,2)")).alias("s")).collect()
    }
    for n_salts in (1, 7, 64):
        salted = {
            r.k: r.s
            for r in salted_sum(
                df, keys=["k"], value=F.col("v").cast("decimal(14,2)"),
                alias="s", salt_from="rid", n_salts=n_salts,
            ).collect()
        }
        assert salted == plain, f"n_salts={n_salts} changed the result"


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "eid": np.arange(300),
            "key": rng.integers(0, 8, 300),
            "ts": base + pd.to_timedelta(rng.integers(0, 100_000, 300), unit="s"),
        }
    )
    right = (
        pd.DataFrame(
            {
                "rid": np.arange(200),
                "key": rng.integers(0, 10, 200),  # keys 8,9 never match
                "ts": base + pd.to_timedelta(rng.integers(0, 100_000, 200), unit="s"),
                "val": np.round(rng.random(200), 2),
            }
        )
        .drop_duplicates(subset=["key", "ts"])  # merge_asof needs unique (key, ts)
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts")[["key", "ts", "val"]].rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="key",
        direction="backward",
    ).set_index("eid")

    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        keys=["key"],
        ts="ts",
        payload=["val"],
        tiebreak="rid",
    ).collect()
    assert len(got) == len(left)
    for r in got:
        exp_val = expected.loc[r.eid, "val"]
        exp_ts = expected.loc[r.eid, "rts"]
        if pd.isna(exp_val):
            assert r.val_matched is None and r.ts_matched is None, r
        else:
            assert r.val_matched == exp_val, (r, exp_val)
            assert pd.Timestamp(r.ts_matched) == exp_ts, (r, exp_ts)
