"""Pins for bench.py's derived-dataset cache keying (ADVICE r8).

The official scale artifacts compare sf3-vs-sf1 timings; those numbers
are only meaningful if the cached derived datasets provably correspond
to the current source + generator. These tests drive _ensure_derived's
three cache states (fresh marker -> reuse; stale/INCOMPLETE marker ->
regenerate; no marker -> refuse) against real sf0.001 generation.
"""

from __future__ import annotations

import importlib.util
import os
import sys


def _bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_ensure_derived_generates_reuses_and_invalidates(spark, sf_dir, tmp_path):
    bench = _bench()
    dst = str(tmp_path / "derived")
    out = bench._ensure_derived(spark, sf_dir, dst, reps=2)
    assert out == dst
    marker = os.path.join(dst, "_FINGERPRINT")
    want = open(marker).read()
    assert want != "INCOMPLETE" and want.endswith(":reps=2")
    assert os.path.exists(os.path.join(dst, "events.parquet"))
    stamp = os.path.getmtime(marker)

    # fresh marker -> reuse, no regeneration
    bench._ensure_derived(spark, sf_dir, dst, reps=2)
    assert os.path.getmtime(marker) == stamp

    # different reps -> stale key -> regenerate (marker rewritten)
    bench._ensure_derived(spark, sf_dir, dst, reps=3)
    assert open(marker).read().endswith(":reps=3")

    # INCOMPLETE marker (crash mid-generation) -> regenerate
    with open(marker, "w") as fh:
        fh.write("INCOMPLETE")
    bench._ensure_derived(spark, sf_dir, dst, reps=3)
    assert open(marker).read().endswith(":reps=3")


def test_ensure_derived_never_deletes_foreign_dirs(spark, sf_dir, tmp_path):
    import pytest

    bench = _bench()
    foreign = tmp_path / "hand_maintained"
    foreign.mkdir()
    (foreign / "precious.parquet").write_bytes(b"user data")
    with pytest.raises(RuntimeError, match="_FINGERPRINT"):
        bench._ensure_derived(spark, sf_dir, str(foreign), reps=2)
    assert (foreign / "precious.parquet").read_bytes() == b"user data"
