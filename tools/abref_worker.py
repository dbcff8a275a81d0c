#!/usr/bin/env python
"""Subprocess worker for ``bench.py --ab-ref`` (VERDICT r14 item 1).

Loads the engine from the tree given as argv[1] (the live repo OR a git
worktree pinned at a previous round's ref), opens one SparkSession, and
serves timing commands over a line protocol on stdin/stdout:

    {"op": "run",   "query": NAME, "sf_dir": DIR, "timed": true|false}
        -> {"sec": float} | {"missing": true} | {"error": str}
    {"op": "calib"} -> {"calib_sec": float}   (the fixed-work probe)
    {"op": "quit"}  -> {"bye": true} and exit

Replies are single lines prefixed ``ABREF `` on stdout (Spark chatter
goes to stderr and is ignored by the parent). The parent strictly
serializes commands across its two workers, so only one Spark job runs
at a time — the idle worker's JVM costs memory, not cores. Every run
clears the session cache afterwards so persists inside one execution
can never make the other side's (or the next) run artificially fast —
the exact isolation discipline of bench._measure_samples.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _emit(obj: dict) -> None:
    sys.stdout.write("ABREF " + json.dumps(obj, separators=(",", ":")) + "\n")
    sys.stdout.flush()


def main() -> None:
    engine_root = os.path.abspath(sys.argv[1])
    sys.path.insert(0, engine_root)
    from salesdata_engineering_spark.registry import QUERIES  # noqa: E402
    from salesdata_engineering_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name=f"abref-{os.path.basename(engine_root)}")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def calib() -> float:
        # the same fixed-work probe as bench.probe_env: identical work
        # every call, so drift between samples is co-load by construction
        run = lambda: (  # noqa: E731
            spark.range(0, 200_000_000, 1, 32)
            .selectExpr("sum(id % 7) AS s")
            .collect()
        )
        if not getattr(calib, "_warmed", False):
            run(), run(), run()
            calib._warmed = True
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 3)

    _emit({"ready": True, "root": engine_root, "n_queries": len(QUERIES)})
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            cmd = json.loads(line)
        except ValueError:
            _emit({"error": f"bad command: {line[:100]}"})
            continue
        op = cmd.get("op")
        if op == "quit":
            _emit({"bye": True})
            break
        if op == "calib":
            try:
                _emit({"calib_sec": calib()})
            except Exception as exc:  # noqa: BLE001
                _emit({"error": str(exc)[:300]})
            continue
        if op != "run":
            _emit({"error": f"unknown op: {op!r}"})
            continue
        name = cmd.get("query")
        if name not in QUERIES:
            _emit({"missing": True, "query": name})
            continue
        try:
            t0 = time.perf_counter()
            force(QUERIES[name].fn(spark, cmd["sf_dir"]))
            sec = time.perf_counter() - t0
            spark.catalog.clearCache()
            _emit({"sec": round(sec, 3)})
        except Exception as exc:  # noqa: BLE001
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            _emit({"error": str(exc)[:300], "query": name})
    spark.stop()


if __name__ == "__main__":
    main()
