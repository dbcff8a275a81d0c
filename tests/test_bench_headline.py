"""Pins for bench.py's in-headline co-load classifier (VERDICT r9 #1).

The r9 driver record read +25% vs r8 on a transient co-tenant and could
not prove it: calib probes fired only at section boundaries, so a spike
INSIDE the 30-query headline section was invisible to the markers.
run_headline now records per-query start offsets and runs the fixed-work
calib probe every 5 queries; classify_coload marks every query whose
timed window overlaps a spike as suspect. These tests drive an injected
synthetic spike through the REAL loop + classifier (stubbed probe/
measure/timer — no Spark) and pin that exactly the overlapping window is
flagged, in both directions (spike -> flagged; clean run -> nothing
flagged — a classifier that cries wolf would let real regressions hide
behind 'co-load').
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


def _run(bench, names, spike_positions):
    """Drive run_headline with a stubbed clock; the calib probe reads
    elevated iff the number of queries completed when it fires is in
    ``spike_positions`` (ticks fire at 0, 5, 10, ..., len(names))."""
    clock = {"t": 0.0}
    done = {"n": 0}

    def timer():
        return clock["t"]

    def probe():
        c = 0.5 if done["n"] in spike_positions else 0.1
        clock["t"] += c
        return {"calib_sec": c, "load1": 4.0}

    def measure(name):
        done["n"] += 1
        clock["t"] += 1.0
        return 1.0

    return bench.run_headline(
        None, None, names, 1, probe=probe, measure=measure, timer=timer
    )


def test_classifier_flags_exactly_the_spike_window():
    bench = _bench()
    names = [f"q{i:02d}" for i in range(20)]
    timings, detail = _run(bench, names, spike_positions={10})
    co = detail["coload"]
    assert co["spike_ticks"] == [10]
    assert co["baseline_calib"] == 0.1
    # a spike sampled at position 10 could have started after the clean
    # tick at 5 and ended before the clean tick at 15: queries 5..14
    # are suspect, everything bracketed by clean probes is cleared
    assert co["suspect"] == [f"q{i:02d}" for i in range(5, 15)]
    # per-query start offsets are recorded, strictly increasing
    starts = [detail["t_start"][n] for n in names]
    assert starts == sorted(starts) and len(set(starts)) == len(starts)
    # ticks fired before q0, every 5 queries, and after the last query
    assert [t["at"] for t in detail["calib_ticks"]] == [0, 5, 10, 15, 20]
    assert timings == {n: 1.0 for n in names}


def test_classifier_clean_run_flags_nothing():
    bench = _bench()
    names = [f"q{i:02d}" for i in range(20)]
    _timings, detail = _run(bench, names, spike_positions=set())
    assert detail["coload"]["spike_ticks"] == []
    assert detail["coload"]["suspect"] == []


def test_classifier_edge_spikes_cover_first_and_last_windows():
    bench = _bench()
    names = [f"q{i:02d}" for i in range(20)]
    # spike at the very first tick: only the first window is suspect
    _t, d0 = _run(bench, names, spike_positions={0})
    assert d0["coload"]["suspect"] == [f"q{i:02d}" for i in range(0, 5)]
    # spike at the final tick: only the last window is suspect
    _t, d1 = _run(bench, names, spike_positions={20})
    assert d1["coload"]["suspect"] == [f"q{i:02d}" for i in range(15, 20)]


def test_classifier_merges_adjacent_spike_windows():
    bench = _bench()
    names = [f"q{i:02d}" for i in range(20)]
    _t, d = _run(bench, names, spike_positions={5, 10})
    assert d["coload"]["spike_ticks"] == [5, 10]
    assert d["coload"]["suspect"] == [f"q{i:02d}" for i in range(0, 15)]
