#!/usr/bin/env python
"""sf1-exactness check for the two queries whose registered oracles
blow the side-check budget at scale (VERDICT r7 item 4).

The registered oracles are CORRECT but their DuckDB execution shape is
superlinear-in-practice at sf1:

* ``sim_embedding_clusters`` — the recursive reachability CTE
  accumulates (node, label) pairs with UNION dedup, which is
  O(|component|^2) pairs for the loose 0.4-threshold components; at
  sf1 (20k vectors) the fixpoint ran past the 10-minute budget.
* ``multimodal_audio_segments`` — a ~5M-row result; one monolithic
  toPandas + canon of both sides was the budget problem, not the SQL.

This tool verifies BOTH at sf1 with equivalent-but-cheaper oracle
executions, keeping the driver-identical comparison (sorted columns,
order-insensitive exact canonical values — tests/oracle_utils):

* clusters: materialize the oracle's OWN edge set (the SQL text up to
  the recursive CTE, verbatim — no re-derivation that could drift),
  then compute the identical min-label fixpoint by ITERATIVE
  materialization: lbl <- min(lbl of self and in-neighbors) until no
  row changes. O(N * diameter) rows total instead of the recursive
  CTE's pair accumulation. Same fixpoint by definition: min-label
  propagation converges to min(component) per node.
* audio segments: the SAME registered oracle, compared in media_id
  RANGE CHUNKS — the predicate pushes into both engines' scans, so
  every chunk is an exact full-value diff and peak memory/canon cost
  is bounded by the chunk, while the union of chunks covers every row
  (plus a total-count cross-check).

Usage: python tools/sf1_gap_check.py [--sf-dir .data/sf1] [--chunks 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CLUSTER_CUT = "reach(id, lbl) AS"  # start of the recursive CTE in the oracle


def check_clusters(spark, con, sf_dir: str) -> bool:
    from oracle_utils import canon_frame

    from salesdata_engineering_spark.registry import QUERIES

    t0 = time.time()
    spark_pd = QUERIES["sim_embedding_clusters"].fn(spark, sf_dir).toPandas()
    t_spark = time.time() - t0

    oracle = QUERIES["sim_embedding_clusters"].oracle
    assert CLUSTER_CUT in oracle, "oracle text changed; update CLUSTER_CUT"
    # everything BEFORE the recursive CTE, verbatim -> the edge set
    prefix = oracle[: oracle.rindex(CLUSTER_CUT)].rstrip().rstrip(",")
    t0 = time.time()
    con.execute(f"CREATE OR REPLACE TEMP TABLE sym AS {prefix} SELECT u, v FROM sym")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE lbl AS SELECT DISTINCT u AS id, u AS lbl FROM sym"
    )
    for it in range(200):  # diameter cap; loud failure if not converged
        con.execute(
            """
            CREATE OR REPLACE TEMP TABLE lbl2 AS
            SELECT id, min(lbl) AS lbl FROM (
                SELECT id, lbl FROM lbl
                UNION ALL
                SELECT e.v AS id, l.lbl FROM lbl l JOIN sym e ON l.id = e.u
            ) GROUP BY id
            """
        )
        changed = con.execute(
            "SELECT count(*) FROM lbl2 JOIN lbl USING (id) WHERE lbl2.lbl <> lbl.lbl"
        ).fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE lbl AS SELECT * FROM lbl2")
        if changed == 0:
            break
    else:
        raise RuntimeError("min-label fixpoint did not converge in 200 rounds")
    oracle_pd = con.execute(
        """
        SELECT id AS vec_id, CAST(lbl AS BIGINT) AS cluster_id,
               CASE WHEN lbl = id THEN 1 ELSE 0 END AS keep
        FROM lbl
        """
    ).df()
    t_oracle = time.time() - t0

    s_cols, s_rows = canon_frame(spark_pd)
    o_cols, o_rows = canon_frame(oracle_pd)
    ok = s_cols == o_cols and s_rows == o_rows
    print(
        f"sim_embedding_clusters: {'PASS' if ok else 'FAIL'} "
        f"rows={len(s_rows)}/{len(o_rows)} iters<= {it + 1} "
        f"spark={t_spark:.1f}s oracle={t_oracle:.1f}s",
        flush=True,
    )
    if not ok and s_cols == o_cols:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        print(f"  first diffs: {diffs}")
    return ok


def check_audio_segments(spark, con, sf_dir: str, chunks: int) -> bool:
    from oracle_utils import canon_frame
    from pyspark.sql import functions as F

    from salesdata_engineering_spark.registry import QUERIES

    q = QUERIES["multimodal_audio_segments"]
    # chunk bounds from the RESULT's own key domain, not documents.doc_id
    # (ADVICE r8: a media_id outside the doc_id range would fall in no
    # chunk and never be compared)
    hi = con.execute(
        f"SELECT max(media_id) + 1 FROM ({q.oracle})"
    ).fetchone()[0]
    if hi is None:  # oracle empty — PASS iff Spark is empty too
        n_spark = q.fn(spark, sf_dir).count()
        print(
            f"multimodal_audio_segments: {'PASS' if n_spark == 0 else 'FAIL'} "
            f"rows={n_spark}/0 (oracle empty)",
            flush=True,
        )
        return n_spark == 0
    step = (hi + chunks - 1) // chunks
    total_s = total_o = 0
    ok = True
    for lo in range(0, hi, step):
        t0 = time.time()
        spark_pd = (
            q.fn(spark, sf_dir)
            .filter((F.col("media_id") >= lo) & (F.col("media_id") < lo + step))
            .toPandas()
        )
        oracle_pd = con.execute(
            f"SELECT * FROM ({q.oracle}) WHERE media_id >= {lo} "
            f"AND media_id < {lo + step}"
        ).df()
        s_cols, s_rows = canon_frame(spark_pd)
        o_cols, o_rows = canon_frame(oracle_pd)
        chunk_ok = s_cols == o_cols and s_rows == o_rows
        ok = ok and chunk_ok
        total_s += len(s_rows)
        total_o += len(o_rows)
        print(
            f"  chunk media_id [{lo}, {lo + step}): "
            f"{'PASS' if chunk_ok else 'FAIL'} rows={len(s_rows)}/{len(o_rows)} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
    # cross-check BOTH sides: the chunk union saw every oracle row AND
    # every Spark row exactly once (ADVICE r8: oracle-only coverage
    # would PASS even if Spark emitted rows outside every chunk's
    # media_id range — negative ids, ids past hi)
    n_all = con.execute(f"SELECT count(*) FROM ({q.oracle})").fetchone()[0]
    n_spark = q.fn(spark, sf_dir).count()
    cover = total_o == n_all and total_s == n_spark
    print(
        f"multimodal_audio_segments: {'PASS' if ok and cover else 'FAIL'} "
        f"rows={total_s}/{total_o} (oracle total {n_all}, "
        f"spark total {n_spark})",
        flush=True,
    )
    return ok and cover


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".data", "sf1"))
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()

    from oracle_utils import duckdb_con

    from salesdata_engineering_spark.session import get_spark

    spark = get_spark(app_name="sf1-gap-check")
    con = duckdb_con(args.sf_dir)
    t0 = time.time()
    ok = check_clusters(spark, con, args.sf_dir)
    ok = check_audio_segments(spark, con, args.sf_dir, args.chunks) and ok
    print(f"total {time.time() - t0:.1f}s", flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
