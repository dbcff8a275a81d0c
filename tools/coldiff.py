"""Column-level engine-vs-oracle diff for one query on one sf dir.

Debugging aid for the degenerate-input probe axes: check_all.py says
WHICH query diverges; this says WHICH COLUMNS (after the same
column-name-sorted, order-insensitive normalization), so a NULL-
semantics mismatch points straight at the one expression to fix.

    python tools/coldiff.py <query> [--sf-dir /tmp/sf01_allnull]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default="/tmp/sf01_allnull")
    ap.add_argument("--rows", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oracle_utils import canon_frame, duckdb_con
    from salesdata_engineering_spark.registry import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    q = QUERIES[args.query]
    sdf = q.fn(spark, args.sf_dir).toPandas()
    odf = duckdb_con(args.sf_dir).execute(q.oracle).df()
    s_cols, s_rows = canon_frame(sdf)
    o_cols, o_rows = canon_frame(odf)
    print(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
    if s_cols != o_cols:
        print("SCHEMA", s_cols, "vs", o_cols)
        return 1
    # exit nonzero on ANY divergence — row-count mismatch (zip would
    # silently truncate the comparison to the shorter side, so call it
    # out explicitly) or value diffs — so scripted sweeps can trust the
    # exit code, not just the printed report (ADVICE r11)
    diverged = len(s_rows) != len(o_rows)
    if diverged:
        print(f"ROWCOUNT mismatch: comparing first {min(len(s_rows), len(o_rows))} rows only")
    for j, c in enumerate(s_cols):
        sv = [r[j] for r in s_rows]
        ov = [r[j] for r in o_rows]
        if sv[: len(ov)] != ov[: len(sv)]:
            diverged = True
            print(f"COL {c}:")
            shown = 0
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b:
                    print(f"  row {i}: spark={a!r} oracle={b!r}")
                    shown += 1
                    if shown >= args.rows:
                        break
    return 1 if diverged else 0


if __name__ == "__main__":
    raise SystemExit(main())
