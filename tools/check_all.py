"""Driver-replica correctness check on a BARE SparkSession.

Round 1 failed because the engine's queries only worked on a session built
by ``session.get_spark`` (which pinned parquet-nanos + UTC confs), while
the verification driver supplies its own bare session. This script
replicates the driver: a no-conf SparkSession, every ``queries()`` entry
run at sf0.01 and diffed against ``oracle_sql()`` via DuckDB with
column-name-sorted, order-insensitive exact value comparison.

Usage:
    python tools/check_all.py [--sf-dir /root/testdata/sf0.01] [--only q1,q2]
    python tools/check_all.py --first 50     # only the driver's checked window

Round-closing SCALECHECK gate (VERDICT r8 item 2) — the full-registry
sf1 exactness sweep that found five real bugs in round 8, as one
command producing one machine-readable record:

    python tools/scalecheck.py --out SCALECHECK_r{N}.json

(tools/scalecheck.py orchestrates BOTH phases — this sweep minus the
two chunked-oracle queries, then tools/sf1_gap_check.py for those two
— in isolated processes and merges one record. ~60 min at sf1; every
oracle-paired query value-checked rows+schema+hash, per-query wall
time recorded. Run it before closing every round.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--first", type=int, default=None, help="check only the first N registered queries")
    ap.add_argument("--out", default=None, help="write JSON results here")
    ap.add_argument(
        "--skip",
        default=None,
        help="comma-separated query names to exclude (the sf1 sweep "
        "skips sim_embedding_clusters + multimodal_audio_segments: "
        "their DuckDB oracles need the chunked tools/sf1_gap_check.py "
        "at scale — the r9 full-session attempt OOM-killed the whole "
        "process at 112 GB inside the clusters oracle)",
    )
    ap.add_argument(
        "--duckdb-mem",
        default="32GB",
        help="DuckDB memory_limit (with a disk temp_directory for "
        "spill) so one heavy oracle fails as a recorded ERR instead "
        "of OOM-killing the sweep",
    )
    ap.add_argument(
        "--engine-session",
        action="store_true",
        help="use the engine's tuned session (16g driver) instead of the "
        "driver-replica bare one — required for sf1+ sweeps, where the "
        "bare session's default 1g heap OOMs on the first scan; the "
        "driver itself only ever runs at sf0.01, so bare stays the "
        "default",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    if args.engine_session:
        from salesdata_engineering_spark.session import get_spark

        spark = get_spark(app_name="check-all-engine")
    else:
        # Deliberately bare: no engine confs. Mirrors the verification driver.
        spark = (
            SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
            .appName("check-all-bare")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from oracle_utils import canon_frame, duckdb_con

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)
    if args.first:
        names = names[: args.first]
    if args.only:
        names = [n for n in args.only.split(",") if n in queries]
    if args.skip:
        skip = set(args.skip.split(","))
        names = [n for n in names if n not in skip]

    con = duckdb_con(args.sf_dir)
    spill_dir = None
    if args.duckdb_mem:
        import tempfile

        # removed in the finally below — a leaked spill dir per sweep
        # run can hold residual spill files (ADVICE r9)
        spill_dir = tempfile.mkdtemp(prefix="duckdb_spill_")
        con.execute(f"SET memory_limit='{args.duckdb_mem}'")
        con.execute(f"SET temp_directory='{spill_dir}'")
    try:
        return _run_sweep(args, spark, queries, oracles, names, con)
    finally:
        if spill_dir:
            import shutil

            shutil.rmtree(spill_dir, ignore_errors=True)


def _run_sweep(args, spark, queries, oracles, names, con) -> int:
    from oracle_utils import canon_frame

    results: dict[str, dict] = {}
    n_pass = n_fail = n_err = n_rows_only = 0
    t0 = time.time()
    for name in names:
        rec: dict = {}
        t_q = time.time()
        try:
            sdf = queries[name](spark, args.sf_dir)
            spark_pd = sdf.toPandas()
            rec["spark_rows"] = len(spark_pd)
            if name in oracles:
                oracle_pd = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(oracle_pd)
                s_cols, s_rows = canon_frame(spark_pd)
                o_cols, o_rows = canon_frame(oracle_pd)
                rec["rows_match"] = len(s_rows) == len(o_rows)
                rec["schema_match"] = s_cols == o_cols
                rec["hash_match"] = s_rows == o_rows
                if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]:
                    n_pass += 1
                    status = "PASS"
                else:
                    n_fail += 1
                    status = "FAIL"
                    if not rec["schema_match"]:
                        rec["detail"] = f"cols spark={s_cols} oracle={o_cols}"
                    elif not rec["rows_match"]:
                        rec["detail"] = f"rows spark={len(s_rows)} oracle={len(o_rows)}"
                    else:
                        diff = [
                            (a, b) for a, b in zip(s_rows, o_rows) if a != b
                        ][:2]
                        rec["detail"] = f"first diffs {diff} cols={s_cols}"
            else:
                rec["rows_only"] = True
                n_rows_only += 1
                status = "ROWS" if rec["spark_rows"] >= 0 else "FAIL"
        except Exception:
            rec["err"] = traceback.format_exc(limit=5)
            n_err += 1
            status = "ERR"
        rec["sec"] = round(time.time() - t_q, 2)
        rec["status"] = status
        results[name] = rec
        line = f"{status:4} {name}"
        if "detail" in rec:
            line += f"  [{rec['detail'][:200]}]"
        if "err" in rec:
            line += "  [" + rec["err"].strip().splitlines()[-1][:160] + "]"
        print(line, flush=True)

    total = len(names)
    print(
        f"\n{n_pass} PASS / {n_fail} FAIL / {n_err} ERR / {n_rows_only} rows-only"
        f"  of {total} in {time.time() - t0:.1f}s"
    )
    if args.out:
        record = {
            "summary": {
                "sf_dir": args.sf_dir,
                "session": "engine" if args.engine_session else "bare-driver-replica",
                "n_queries": total,
                "pass": n_pass,
                "fail": n_fail,
                "err": n_err,
                "rows_only": n_rows_only,
                "wall_sec": round(time.time() - t0, 1),
            },
            "queries": results,
        }
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1, default=str)
    return 0 if (n_fail == 0 and n_err == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
