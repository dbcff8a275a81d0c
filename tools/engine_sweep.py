#!/usr/bin/env python
"""Engine-only variant sweep — no oracle (VERDICT r12 item 7).

The differential (Spark-vs-DuckDB) sweep is the correctness gate, but
on the bigdoc axis it is ORACLE-bound: DuckDB's lambda substr is
quadratic in string length, so multi-MB documents price the full
324-query differential sweep out of a round (BIGDOCSWEEP_r12 covered
35 before the cutoff). This tool covers the rest with the checks the
axis is actually for — memory/cost behavior, not values: every
registered query runs on the variant under a watchdog, recording

  PASS     ran to completion: row count retrieved, under the cap
  TIMEOUT  exceeded --cap seconds (job group cancelled — the sweep
           survives; the query is flagged, not hung)
  ERR      raised (loud precondition raises are then adjudicated by
           name in PERF_NOTES, like every probe-axis record)

Usage:
    python tools/engine_sweep.py --sf-dir /tmp/sf01_bigdoc \
        --out BIGDOCSWEEP_r13.json \
        --oracle-record BIGDOCSWEEP_r12.json

``--oracle-record`` merges a prior differential record: each query row
gets an ``oracle`` column (PASS/FAIL/ERR from the differential sweep,
or "engine-only" when the differential never reached it), so the
record shows exactly which rows carry value-level evidence and which
carry run-level evidence only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated names")
    ap.add_argument(
        "--cap", type=float, default=180.0,
        help="per-query wall cap in seconds (job group cancelled beyond)",
    )
    ap.add_argument(
        "--oracle-record", default=None,
        help="prior differential-sweep JSON to merge as the 'oracle' column",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    # bare driver-replica session (same contract as tools/check_all.py)
    spark = SparkSession.builder.master("local[32]").appName(
        "engine-sweep"
    ).getOrCreate()
    sc = spark.sparkContext

    oracle: dict[str, str] = {}
    if args.oracle_record:
        with open(args.oracle_record) as f:
            prior = json.load(f)
        for name, rec in prior.get("queries", {}).items():
            oracle[name] = rec.get("status", "?")

    queries = entry.queries()
    names = list(queries)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    results: dict[str, dict] = {}
    n_pass = n_err = n_timeout = 0
    t_all = time.time()
    for name in names:
        tag = f"sweep:{name}"
        sc.setJobGroup(tag, tag, interruptOnCancel=True)
        timer = threading.Timer(args.cap, lambda: sc.cancelJobGroup(tag))
        t0 = time.time()
        rows = None
        try:
            timer.start()
            rows = queries[name](spark, args.sf_dir).count()
            secs = time.time() - t0
            status = "PASS"
            n_pass += 1
        except Exception as e:  # noqa: BLE001 — recorded, sweep continues
            secs = time.time() - t0
            cancelled = "cancelled" in str(e).lower() or secs >= args.cap
            status = "TIMEOUT" if cancelled else "ERR"
            if status == "TIMEOUT":
                n_timeout += 1
            else:
                n_err += 1
            results[name] = {
                "status": status,
                "secs": round(secs, 2),
                "err": traceback.format_exc(limit=3).splitlines()[-1][:300],
                "oracle": oracle.get(name, "engine-only"),
            }
            print(f"{status:7s} {name}  [{results[name]['err'][:100]}]",
                  flush=True)
            timer.cancel()
            continue
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
        results[name] = {
            "status": status,
            "secs": round(secs, 2),
            "rows": rows,
            "oracle": oracle.get(name, "engine-only"),
        }
        print(f"PASS    {name}  rows={rows} {secs:.1f}s", flush=True)

    record = {
        "summary": {
            "sf_dir": args.sf_dir,
            "session": "bare-driver-replica",
            "mode": "engine-only run-level sweep (no value oracle); "
            "'oracle' column carries the differential record where one "
            "exists",
            "n_queries": len(names),
            "pass": n_pass,
            "err": n_err,
            "timeout": n_timeout,
            "oracle_checked": sum(
                1 for r in results.values() if r["oracle"] != "engine-only"
            ),
            "cap_sec": args.cap,
            "wall_sec": round(time.time() - t_all, 1),
        },
        "queries": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    print(
        f"\n{n_pass} PASS / {n_err} ERR / {n_timeout} TIMEOUT of "
        f"{len(names)} in {record['summary']['wall_sec']}s"
        + (f" -> {args.out}" if args.out else "")
    )
    spark.stop()
    return 0 if (n_err == 0 and n_timeout == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
