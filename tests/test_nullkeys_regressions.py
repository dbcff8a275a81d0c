"""Fast pins for the NULL-join-key bug classes (PERF_NOTES 13l).

The nullkeys variant (make_variant.py: independent ~1/7 NULL mask over
every id/join-key column) found 19 value forks + 7 errors on its first
sweep — NULL keys had never been probed because every earlier axis
deliberately preserved KEY_COLS. These tests re-cover one
representative per convention in seconds, on a tiny variant built from
the sf0.001 data:

- ``scd2_customer_segments``  — convention 2: scd2_merge classified
  match-status by key-NULLness (LEFT-JOIN-NULL idiom); a NULL-key
  update emitted an all-NULL row and vanished from new_open;
- ``asof_nearest_click_purchase`` — conventions 1+2: NULL-to-NULL
  matches inside the union-scan's NULL window partition, and id-less
  clicks kept by the engine but dropped by the oracle's JOIN USING;
- ``sample_deterministic``    — convention 1: NULL ids sorted
  NULLS-FIRST into every stratum head;
- ``q16_supplier_part_counts`` — convention 4: one NULL in the NOT IN
  subquery made the oracle return ZERO rows while the anti-join
  ignored it;
- ``basket_brand_affinity``   — convention 1: groupBy welded all
  NULL-orderkey lines into ONE giant false basket;
- ``cdc_apply_changes`` + the winnowing fingerprint — conventions 1+2
  over the events/documents tables (the streaming CDC twin's
  astype('int64') crash is covered by the shared oracle at sweep
  scale; the batch twin pins the pick order here).

Each representative was verified to FAIL (or crash) against the
pre-fix parent commit and passes at HEAD.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from salesdata_engineering_spark.registry import QUERIES

from .conftest import SF_DIR
from .oracle_utils import assert_oracle_match, duckdb_con

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PINNED = [
    "scd2_customer_segments",
    "asof_nearest_click_purchase",
    "sample_deterministic",
    "q16_supplier_part_counts",
    "basket_brand_affinity",
    "cdc_apply_changes",
    "text_winnow_fingerprint",
]


@pytest.fixture(scope="module")
def nullkeys_dir(tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("sf_nullkeys"))
    # capture_output but surface the tool's stderr on failure: a bare
    # check=True would bury the fixture-build error inside an opaque
    # CalledProcessError (ADVICE r13)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_variant.py"),
         "nullkeys", "--src", SF_DIR, "--dst", dst],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"make_variant nullkeys failed (rc={proc.returncode}):\n"
            f"{proc.stderr}"
        )
    return dst


@pytest.fixture(scope="module")
def nullkeys_con(nullkeys_dir):
    return duckdb_con(nullkeys_dir)


@pytest.mark.parametrize("name", PINNED)
def test_nullkeys_oracle_parity(spark, nullkeys_dir, nullkeys_con, name):
    q = QUERIES[name]
    assert q.oracle is not None
    assert_oracle_match(
        q.fn(spark, nullkeys_dir), nullkeys_con, q.oracle, name=name
    )
