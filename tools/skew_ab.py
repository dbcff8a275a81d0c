#!/usr/bin/env python
"""Salted vs unsalted join wall-time on an actually-skewed key
(VERDICT r12 item 5's bench datapoint).

The skew variant gives one customer ~50% of all orders. This probe
times the orders x customer join + per-segment aggregate three ways,
interleaved ABBA (the bench.py --ab discipline):

  plain_broadcast   plain join, defaults — AQE broadcasts the dim, so
                    key skew never reaches a shuffle (the BASELINE
                    shape; also why the salted path is opt-in)
  plain_shuffled    plain join, broadcast + AQE skew-split DISABLED —
                    the mid-stage 100 TB shape salted_join exists for:
                    every row of the hot key lands on ONE reducer
  salted_shuffled   ops/skew.py salted_join, same disabled confs — the
                    hot key spreads across n_salts reducers

Usage:
    python tools/skew_ab.py [--sf-dir /tmp/sf1_skew] [--rounds 5]

Prints ONE JSON line with per-variant samples/median/min.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1_skew")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from salesdata_engineering_spark.datasets import load_tables
    from salesdata_engineering_spark.ops.skew import salted_join
    from salesdata_engineering_spark.session import get_spark

    spark = get_spark(app_name="skew-ab")

    def base():
        t = load_tables(spark, args.sf_dir)
        fact = t["orders"].select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        )
        dim = t["customer"].select("c_custkey", "c_mktsegment")
        return fact, dim

    def agg(joined):
        return joined.groupBy("c_mktsegment").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )

    NO_BCAST = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }

    def with_confs(confs, fn):
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            return fn()
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    def plain_broadcast():
        fact, dim = base()
        agg(fact.join(dim, "c_custkey")).collect()

    def plain_shuffled():
        fact, dim = base()
        with_confs(NO_BCAST, lambda: agg(fact.join(dim, "c_custkey")).collect())

    def salted_shuffled():
        fact, dim = base()
        with_confs(
            NO_BCAST,
            lambda: agg(
                salted_join(fact, dim, key="c_custkey", salt_from="o_orderkey")
            ).collect(),
        )

    variants = {
        "plain_broadcast": plain_broadcast,
        "plain_shuffled": plain_shuffled,
        "salted_shuffled": salted_shuffled,
    }
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for fn in variants.values():  # one untimed warmup each
        fn()
        spark.catalog.clearCache()
    names = list(variants)
    for i in range(args.rounds):
        for n in names if i % 2 == 0 else names[::-1]:
            t0 = time.perf_counter()
            variants[n]()
            samples[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "metric": "skew_join_ab",
                "unit": "sec",
                "sf_dir": args.sf_dir,
                "variants": {
                    n: {
                        "median": round(statistics.median(s), 3),
                        "min": min(s),
                        "samples": s,
                    }
                    for n, s in samples.items()
                },
                "rounds": args.rounds,
                "order": "ABBA",
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
