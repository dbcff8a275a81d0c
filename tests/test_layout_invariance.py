"""Fast pin for the layout axis (PERF_NOTES 13h, LAYOUTSWEEP_r13).

The full sweep (tools/invariance_sweep.py over the make_variant
shuffleorder variant) proved all 324 queries order- and partition-
invariant at sf0.01. This pins the property in seconds for one
representative per seam where an arbitrary-survivor or
partition-boundary bug would reappear first:

- ``topk_suppliers_per_nation`` — rank ties inside windows;
- ``dedup_cluster_components``  — survivor picks + iterative graph
  propagation over scan partitions;
- ``sample_deterministic``      — hash-gate sampling (must depend on
  values, never on row position);
- ``events_tumbling_counts``    — streaming: a 7-shard directory source
  composes DIFFERENT micro-batches than a single-file read
  (availableNow lists files per batch), so watermark/window results
  must not depend on batch composition.

The invariant is bit-equal canonical output between the driver's
single-file layout and a permuted, multi-shard layout of the SAME rows
— what a 1000-executor scan produces, where row order is an accident
of file listing and task scheduling.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from salesdata_engineering_spark.registry import QUERIES

from .conftest import SF_DIR
from .oracle_utils import canon_frame

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PINNED = [
    "topk_suppliers_per_nation",
    "dedup_cluster_components",
    "sample_deterministic",
    "events_tumbling_counts",
]


@pytest.fixture(scope="module")
def shuffled_dir(tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("sf_shuffled"))
    # capture_output but surface the tool's stderr on failure: a bare
    # check=True would bury the fixture-build error inside an opaque
    # CalledProcessError (ADVICE r13)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_variant.py"),
         "shuffleorder", "--src", SF_DIR, "--dst", dst],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"make_variant shuffleorder failed (rc={proc.returncode}):\n"
            f"{proc.stderr}"
        )
    return dst


@pytest.mark.parametrize("name", PINNED)
def test_layout_invariant(spark, shuffled_dir, name):
    q = QUERIES[name]
    b_cols, b_rows = canon_frame(q.fn(spark, SF_DIR).toPandas())
    v_cols, v_rows = canon_frame(q.fn(spark, shuffled_dir).toPandas())
    assert b_cols == v_cols, f"{name}: column fork across layouts"
    assert b_rows == v_rows, (
        f"{name}: output depends on physical layout — "
        f"{len(b_rows)} base rows vs {len(v_rows)} variant rows; "
        f"first diffs {[d for d in zip(b_rows, v_rows) if d[0] != d[1]][:2]}"
    )


@pytest.mark.parametrize("name", ["pricing_summary", "stats_ks_two_sample"])
def test_conf_invariant(spark, name):
    """Conf pin (CONFSWEEP_r13 / TZSWEEP_r13): same data, different
    shuffle partition count + AQE off + a hostile session timezone —
    canonical output must be bit-equal. Partition count changes the
    partial-aggregation merge order (any raw double sum forks in the
    last ulp), and the UTC repair in load_tables must hold regardless
    of the caller's session timezone."""
    q = QUERIES[name]
    b_cols, b_rows = canon_frame(q.fn(spark, SF_DIR).toPandas())
    confs = {
        "spark.sql.shuffle.partitions": "5",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.session.timeZone": "Asia/Tokyo",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        v_cols, v_rows = canon_frame(q.fn(spark, SF_DIR).toPandas())
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert b_cols == v_cols and b_rows == v_rows, (
        f"{name}: output depends on session configuration"
    )


def test_shuffleorder_variant_is_value_identical(shuffled_dir):
    """The variant tool itself must not change values — same multiset of
    rows per table, just permuted and sharded."""
    import pyarrow.parquet as pq

    for t in ("nation", "orders", "documents"):
        base = pq.read_table(os.path.join(SF_DIR, f"{t}.parquet"))
        var = pq.read_table(os.path.join(shuffled_dir, f"{t}.parquet"))
        assert var.num_rows == base.num_rows
        assert sorted(map(str, base.to_pylist()), key=str) == sorted(
            map(str, var.to_pylist()), key=str
        )
