"""Layout-invariance sweep: engine-vs-ITSELF across physical layouts.

The DuckDB differential (tools/check_all.py) proves VALUES against an
independent engine, but it cannot see order/partition dependence: both
engines read the same files, and the canonical compare is
order-insensitive, so a query whose output silently depends on input
row order or scan-partition boundaries can pass every differential
sweep and still return different answers on a real cluster — where the
scan order of a 100 TB table is an accident of file listing and task
scheduling. This sweep closes that hole: run every registered query on
the BASE dir and on a value-identical layout variant
(make_variant.py shuffleorder: permuted rows, 7-shard directories) and
require bit-equal canonical output.

On divergence the base query is re-run in-place to classify the find:
- nondeterministic=True  -> the query forks run-to-run on the SAME
  layout (flakiness, e.g. an unseeded sample or arbitrary survivor);
- nondeterministic=False -> stable per layout but layout-DEPENDENT —
  the cluster-scan bug this axis exists to catch.

A second engine-vs-itself axis rides the same harness: CONFIGURATION
invariance (`--conf-b k=v,...`). Same data dir both sides, but side B
runs under different runtime-settable session confs — e.g.
`spark.sql.shuffle.partitions=7` (different partial-aggregation /
merge order: any float-sum readout that is not decimal/integer-exact
or quantized forks in the last ulp) or
`spark.sql.adaptive.enabled=false` (results must not depend on AQE's
runtime re-planning). On a cluster BOTH of these vary run-to-run —
AQE coalesces shuffle partitions by observed sizes — so a query that
is not conf-invariant gives different answers on identical data on
consecutive runs.

Usage:
    python tools/make_variant.py shuffleorder --src /root/testdata/sf0.01 --dst /tmp/sf01_shuf
    python tools/invariance_sweep.py --base /root/testdata/sf0.01 \
        --variant /tmp/sf01_shuf --out LAYOUTSWEEP_r13.json
    python tools/invariance_sweep.py --variant /root/testdata/sf0.01 \
        --conf-b spark.sql.shuffle.partitions=7 --out CONFSWEEP_r13.json
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
    ap.add_argument("--base", default="/root/testdata/sf0.01")
    ap.add_argument("--variant", required=True)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--skip", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--conf-b", default=None,
        help="comma-separated k=v runtime confs applied while running "
        "the --variant side (and reverted for the base side) — the "
        "configuration-invariance axis; use with --variant == --base")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Bare driver-replica session (same rationale as check_all.py).
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("invariance-sweep")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from oracle_utils import canon_frame

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)
    if args.only:
        names = [n for n in args.only.split(",") if n in queries]
    if args.skip:
        skip = set(args.skip.split(","))
        names = [n for n in names if n not in skip]

    conf_b: dict[str, str] = {}
    if args.conf_b:
        for kv in args.conf_b.split(","):
            k, _, v = kv.partition("=")
            conf_b[k] = v
    conf_saved = {k: spark.conf.get(k, None) for k in conf_b}

    def run(name: str, sf_dir: str, side: str = "base"):
        for k, v in (conf_b if side == "variant" else conf_saved).items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        try:
            pd_df = queries[name](spark, sf_dir).toPandas()
        finally:
            for k, v in conf_saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        return canon_frame(pd_df)

    results: dict[str, dict] = {}
    n_pass = n_fail = n_err = n_rows_only = 0
    t0 = time.time()
    for name in names:
        rec: dict = {}
        t_q = time.time()
        try:
            b_cols, b_rows = run(name, args.base)
            v_cols, v_rows = run(name, args.variant, side="variant")
            rec["base_rows"] = len(b_rows)
            rec["variant_rows"] = len(v_rows)
            if name not in oracles:
                # write/maintenance queries have no stable value
                # contract; rows-equal is the check
                rec["rows_only"] = True
                n_rows_only += 1
                status = "ROWS" if len(b_rows) == len(v_rows) else "FAIL"
                if status == "FAIL":
                    n_rows_only -= 1
                    n_fail += 1
            elif b_cols == v_cols and b_rows == v_rows:
                n_pass += 1
                status = "PASS"
            else:
                n_fail += 1
                status = "FAIL"
                if b_cols != v_cols:
                    rec["detail"] = f"cols base={b_cols} variant={v_cols}"
                elif len(b_rows) != len(v_rows):
                    rec["detail"] = (
                        f"rows base={len(b_rows)} variant={len(v_rows)}")
                else:
                    diff = [(a, b) for a, b in zip(b_rows, v_rows)
                            if a != b][:2]
                    rec["detail"] = f"first diffs {diff} cols={b_cols}"
                # classify: flaky on the same layout, or truly
                # layout-dependent?
                try:
                    b2_cols, b2_rows = run(name, args.base)
                    rec["nondeterministic"] = (
                        b2_cols != b_cols or b2_rows != b_rows)
                except Exception:
                    rec["nondeterministic"] = "rerun-errored"
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
            line += f"  nondet={rec.get('nondeterministic')}"
        if "err" in rec:
            line += "  [" + rec["err"].strip().splitlines()[-1][:160] + "]"
        print(line, flush=True)

    total = len(names)
    print(
        f"\n{n_pass} PASS / {n_fail} FAIL / {n_err} ERR / "
        f"{n_rows_only} rows-only  of {total} in {time.time() - t0:.1f}s"
    )
    if args.out:
        record = {
            "summary": {
                "base": args.base,
                "variant": args.variant,
                "conf_b": conf_b or None,
                "check": ("engine-vs-itself conf invariance" if conf_b
                          else "engine-vs-itself layout invariance"),
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
