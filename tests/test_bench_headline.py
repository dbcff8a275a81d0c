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


def _fake_headline(n_queries=30):
    qs = {f"query_name_number_{i:02d}": 1.234 for i in range(n_queries)}
    return {
        "metric": "headline_queries_total",
        "value": 27.818,
        "unit": "sec",
        "queries": qs,
        "extras": {f"extra_pipeline_{i}": 9.999 for i in range(5)},
        "sf1": {"value": 51.667, "timed_runs": 2, "max_ratio": 3.33,
                "max_ratio_query": "q21_waiting_suppliers",
                "detail": "BENCH_LOCAL.json"},
        "sf3": {"value": 58.9, "n_queries": 10, "max_ratio_vs_sf1": 2.52,
                "max_ratio_query": "sales_team_mart",
                "detail": "BENCH_LOCAL.json"},
        "streaming_sf1": {"stream_tumbling_counts": 726216,
                          "stream_cdc_latest": 212857,
                          "paced_tumbling_mfpt2": 157604,
                          "stream_stream_left_outer": 78703},
        "env": {k: {"calib_sec": 0.123, "load1": 12.34}
                for k in ("start", "after_headline", "after_extras",
                          "after_sf1", "after_sf3", "after_streaming_sf1")},
        "coload": {"ticks": [0.123] * 7, "suspect": 10},
        "sf": 0.1,
        "warmup_runs": 1,
        "timed_runs": 3,
        "stat": "median",
    }


def test_stdout_line_self_trims_to_tail_budget():
    """The driver retains ~2 KB of stdout; r6 lost its whole record when
    the line outgrew the tail (head cut off -> parsed null). The emitter
    must (a) leave a fitting record untouched, (b) trim optional blocks
    in documented order until an oversized record fits, recording what
    was dropped, (c) never mutate the caller's dict (BENCH_LOCAL shares
    its nested blocks), (d) always preserve the load-bearing fields."""
    import json

    bench = _bench()
    h = _fake_headline()
    line = bench.render_stdout_line(h)
    assert len(line) <= bench.STDOUT_BUDGET
    assert json.loads(line) == h  # fits -> byte-identical content

    # inflate past the budget: ten more headline queries plus a
    # degraded sf1 error marker — the marginal-growth shape the
    # trimmer exists for (unbounded growth of the REQUIRED fields is
    # out of scope: the queries dict is bounded by the curated
    # HEADLINE list)
    big = _fake_headline(n_queries=40)
    big["sf1"] = {"error": "x" * 120}
    raw = len(json.dumps(big, separators=(",", ":")))
    assert raw > bench.STDOUT_BUDGET  # genuinely oversized before trims
    before = json.loads(json.dumps(big))
    line2 = bench.render_stdout_line(big)
    assert len(line2) <= bench.STDOUT_BUDGET
    out = json.loads(line2)
    assert big == before  # caller's dict untouched, nested blocks too
    assert out["trimmed"]  # what was dropped is recorded
    # load-bearing fields always survive a trim
    for k in ("value", "queries", "sf1", "sf3", "streaming_sf1"):
        assert k in out
    assert out["env"]["start"] and out["env"]["after_headline"]
    assert out["coload"]["suspect"] == 10  # count survives; ticks go first
    assert "ticks" not in out["coload"]


def test_classifier_property_flags_union_of_spike_neighborhoods():
    """Property: for ANY tick layout (first tick at 0, last at N,
    arbitrary strictly-increasing positions between) and ANY spike
    subset small enough not to move the median (< half the ticks),
    the suspect set is EXACTLY the union over spiked ticks of
    [previous_position, next_position) — nothing leaks outside a spike
    neighborhood, nothing inside one escapes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    bench = _bench()

    @st.composite
    def cases(draw):
        n = draw(st.integers(min_value=1, max_value=40))
        mids = draw(
            st.lists(st.integers(min_value=1, max_value=max(1, n - 1)),
                     unique=True, max_size=8)
        )
        positions = sorted({0, *(m for m in mids if m < n), n})
        max_spikes = (len(positions) - 1) // 2
        spike_at = draw(
            st.lists(st.sampled_from(positions), unique=True,
                     max_size=max_spikes)
        )
        return n, positions, set(spike_at)

    @given(cases())
    @settings(max_examples=200, deadline=None)
    def run(case):
        n, positions, spike_at = case
        names = [f"q{i:02d}" for i in range(n)]
        ticks = [
            {"at": p, "t": float(p),
             "calib_sec": 0.5 if p in spike_at else 0.1, "load1": 1.0}
            for p in positions
        ]
        got = bench.classify_coload(names, ticks)
        expected: set[int] = set()
        for j, p in enumerate(positions):
            if p in spike_at:
                lo = positions[j - 1] if j > 0 else p
                hi = positions[j + 1] if j + 1 < len(positions) else p
                expected.update(range(lo, hi))
        assert set(got["suspect"]) == {
            names[i] for i in expected if i < n
        }
        assert sorted(got["spike_ticks"]) == sorted(spike_at)

    run()


def test_headline_names_all_registered():
    """bench.py filters HEADLINE through `n in QUERIES` before timing —
    a rename or deregistration would silently DROP the query from the
    headline set, shrinking the round's total and faking an
    improvement. Pin both directions: every curated headline name
    resolves, and every bench=True registry entry lands in the timed
    set (bench.py appends them to HEADLINE at runtime — the second
    half was claimed but untested until ADVICE r10)."""
    from salesdata_engineering_spark.registry import QUERIES

    bench = _bench()
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE names not registered: {missing}"
    # reverse: replicate main()'s timed-set construction and check every
    # bench-flagged registry entry is in it
    names = [n for n in bench.HEADLINE if n in QUERIES]
    names += [n for n in QUERIES if n not in names and QUERIES[n].bench]
    untimed = [n for n in QUERIES if QUERIES[n].bench and n not in names]
    assert not untimed, f"bench=True entries missing from timed set: {untimed}"


def test_classifier_merges_adjacent_spike_windows():
    bench = _bench()
    names = [f"q{i:02d}" for i in range(20)]
    _t, d = _run(bench, names, spike_positions={5, 10})
    assert d["coload"]["spike_ticks"] == [5, 10]
    assert d["coload"]["suspect"] == [f"q{i:02d}" for i in range(0, 15)]
