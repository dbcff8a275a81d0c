#!/usr/bin/env python
"""Round-closing SCALECHECK gate, as ONE command (VERDICT r8 item 2).

Runs the full-registry sf1 exactness sweep in two isolated phases and
merges them into a single machine-readable record:

1. ``tools/check_all.py --engine-session`` over every registered query
   EXCEPT the two whose DuckDB oracles need chunking at sf1
   (``sim_embedding_clusters``'s recursive reachability CTE OOM-killed
   a full single-session attempt at 112 GB; ``multimodal_audio_segments``
   is verified in pushed-predicate chunks).
2. ``tools/sf1_gap_check.py`` for exactly those two, parsed and merged
   with ``via`` provenance.

Each phase is a SEPARATE process: sweep memory (Spark driver JVM +
DuckDB) never accumulates across phases, and a crash in one phase
cannot take the other's results down with it.

Usage:
    python tools/scalecheck.py [--sf-dir .data/sf1] [--out SCALECHECK_rN.json]
    python tools/scalecheck.py --changed-since <rev> ...   # targeted gate

``--changed-since <rev>`` makes the r12 targeted-gate precedent
MECHANICAL (VERDICT r12 item 6: the r12 changed-set was judged by
hand, which can silently under-select): the re-run set is derived from
``git diff --name-only <rev>..HEAD`` mapped through the package's
import graph — a query is selected iff its registry module can REACH a
changed module (transitively, counting imports inside function bodies,
where this package does most helper imports). The selection list and
the changed files are embedded in the record. Full sweep remains the
default.

Exit 0 iff every query passed (rows-only queries count as pass-shaped,
matching check_all).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "salesdata_engineering_spark"
GAP_QUERIES = ("sim_embedding_clusters", "multimodal_audio_segments")


def _package_modules() -> dict[str, str]:
    """module dotted name -> repo-relative file path, for every .py in
    the package."""
    mods: dict[str, str] = {}
    root = os.path.join(REPO, PKG)
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, f), REPO)
            dotted = rel[: -len(".py")].replace(os.sep, ".")
            if dotted.endswith(".__init__"):
                dotted = dotted[: -len(".__init__")]
            mods[dotted] = rel
    return mods


def _module_imports(path: str, known: set[str]) -> tuple[set[str], set[str]]:
    """(imports, bare_imports) — in-package modules imported anywhere in
    ``path`` (module level OR inside function bodies — the registry
    imports helpers lazily). ``bare_imports`` is the subset brought in
    by a bare relative ``from . import X`` — the form this package uses
    for the registry's registration-side-effect plugin imports."""
    with open(os.path.join(REPO, path)) as f:
        tree = ast.parse(f.read())
    pkg_parts = path[: -len(".py")].replace(os.sep, ".").split(".")
    out: set[str] = set()
    bare: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name in known:
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against this file's package
                base = pkg_parts[: -node.level] if node.level <= len(pkg_parts) else []
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if mod in known:
                out.add(mod)
            # `from .ext import dedup` imports the SUBMODULE ext.dedup
            for a in node.names:
                sub = f"{mod}.{a.name}" if mod else a.name
                if sub in known:
                    out.add(sub)
                    if node.module is None:
                        bare.add(sub)
    return out, bare


def select_changed_queries(
    rev: str, diff: list[str] | None = None
) -> tuple[list[str], list[str]]:
    """(query names to re-run, changed in-package files) for
    ``--changed-since rev`` — mechanical: git diff paths -> import-graph
    reachability -> registry-module query lists. ``diff`` overrides the
    git call (tests)."""
    if diff is None:
        # diff REV against the WORKING TREE (not rev..HEAD) so the gate
        # can run before the closing commit without silently missing it
        diff = subprocess.run(
            ["git", "diff", "--name-only", rev, "--", PKG + "/"],
            capture_output=True, text=True, cwd=REPO, check=True,
        ).stdout.split()
    mods = _package_modules()
    path_to_mod = {p: m for m, p in mods.items()}
    changed = {path_to_mod[p] for p in diff if p in path_to_mod}
    if not changed:
        return [], sorted(diff)
    # modules that can REACH a changed module == reverse-BFS from the
    # changed set over inverted import edges (cycle-safe, no memo traps)
    parsed = {m: _module_imports(p, set(mods)) for m, p in mods.items()}
    edges = {m: set(imp) for m, (imp, _bare) in parsed.items()}

    def _reaches(src: str, dst: str) -> bool:
        seen, stack = {src}, [src]
        while stack:
            for d in edges.get(stack.pop(), ()):
                if d == dst:
                    return True
                if d not in seen:
                    seen.add(d)
                    stack.append(d)
        return False

    # drop bare `from . import X` edges that CLOSE an import cycle —
    # the registry's registration-side-effect plugin imports (registry
    # imports every registry_* at the bottom purely to populate QUERIES,
    # while each registry_* imports `register` back from registry).
    # Without this cut the aggregator cycle makes every query reach
    # every module and the targeted gate degenerates to the full sweep.
    # Real symbol deps (`from .registry_ext import SQL_TOKENS`) are
    # never bare and always survive.
    for m, (_imp, bare) in parsed.items():
        for x in bare:
            if x in edges[m] and _reaches(x, m):
                edges[m].discard(x)
    rev_edges: dict[str, set[str]] = {m: set() for m in mods}
    for m, deps in edges.items():
        for d in deps:
            rev_edges[d].add(m)
    affected = set(changed)
    frontier = list(changed)
    while frontier:
        nxt = frontier.pop()
        for importer in rev_edges.get(nxt, ()):
            if importer not in affected:
                affected.add(importer)
                frontier.append(importer)

    sys.path.insert(0, REPO)
    from salesdata_engineering_spark.registry import QUERIES  # noqa: E402

    selected = sorted(
        name for name, q in QUERIES.items() if q.fn.__module__ in affected
    )
    return selected, sorted(diff)


def run_gap_tool(sf_dir: str) -> tuple[dict[str, dict], str]:
    """Run sf1_gap_check.py and parse its per-query verdict lines."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "sf1_gap_check.py"),
         "--sf-dir", sf_dir],
        capture_output=True,
        text=True,
    )
    out = proc.stdout + proc.stderr
    merged: dict[str, dict] = {}
    for name in GAP_QUERIES:
        m = re.search(
            rf"^{name}: (PASS|FAIL) rows=(\d+)/(\d+)(.*)$", out, re.MULTILINE
        )
        if not m:
            merged[name] = {
                "status": "ERR",
                "err": f"no verdict line in gap-tool output (rc={proc.returncode})",
                "via": "tools/sf1_gap_check.py",
            }
            continue
        status, s_rows, o_rows, detail = m.groups()
        # the gap tool prints ONE verdict token covering its whole check
        # (values + coverage cross-check); only the row counts are
        # per-dimension facts here. Synthesizing schema/hash booleans
        # from the token misrecorded a coverage-only FAIL as a schema+
        # hash mismatch (ADVICE r9) — record the single verdict instead.
        merged[name] = {
            "spark_rows": int(s_rows),
            "oracle_rows": int(o_rows),
            "rows_match": int(s_rows) == int(o_rows),
            "verdict": status,
            "status": status,
            "via": "tools/sf1_gap_check.py (chunked oracle — too heavy for a "
            "single DuckDB session at sf1)" + (detail.strip() and f"; {detail.strip()}" or ""),
        }
    return merged, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".data", "sf1"))
    ap.add_argument("--out", default=os.path.join(REPO, "SCALECHECK.json"))
    ap.add_argument(
        "--changed-since",
        default=None,
        metavar="REV",
        help="re-run only queries whose registry module transitively "
        "imports a module changed since REV (mechanical targeted gate; "
        "selection embedded in the record)",
    )
    args = ap.parse_args()

    selection = changed_files = None
    if args.changed_since:
        selection, changed_files = select_changed_queries(args.changed_since)
        print(
            f"--changed-since {args.changed_since}: {len(changed_files)} "
            f"changed package files -> {len(selection)} queries selected",
            flush=True,
        )
        if not selection:
            record = {
                "queries": {},
                "summary": {
                    "n_queries": 0, "pass": 0, "fail": 0, "err": 0,
                    "rows_only": 0, "wall_sec": 0.0,
                    "note": "no registry query affected by the diff",
                },
                "changed_since": args.changed_since,
                "changed_files": changed_files,
                "selection": [],
            }
            with open(args.out, "w") as f:
                json.dump(record, f, indent=1, default=str)
            print(f"SCALECHECK: nothing selected -> {args.out}")
            return 0

    t0 = time.time()
    # mkstemp, not the race-prone deprecated mktemp (ADVICE r9): the fd
    # is closed immediately — only the reserved path is needed, and
    # check_all truncates/overwrites it.
    fd, sweep_out = tempfile.mkstemp(suffix=".json", prefix="scalecheck_sweep_")
    os.close(fd)
    sweep_cmd = [
        sys.executable, os.path.join(REPO, "tools", "check_all.py"),
        "--engine-session", "--sf-dir", args.sf_dir,
        "--skip", ",".join(GAP_QUERIES), "--out", sweep_out,
    ]
    if selection is not None:
        sweep_names = [n for n in selection if n not in GAP_QUERIES]
        if sweep_names:
            sweep_cmd += ["--only", ",".join(sweep_names)]
        else:
            sweep_cmd = None
    rc = 0
    if sweep_cmd is None:
        with open(sweep_out, "w") as f:
            json.dump(
                {"queries": {}, "summary": {
                    "n_queries": 0, "pass": 0, "fail": 0, "err": 0,
                    "rows_only": 0}},
                f,
            )
    else:
        rc = subprocess.call(sweep_cmd)
    # mkstemp pre-creates the file, so "no record" now reads as empty
    if not os.path.exists(sweep_out) or os.path.getsize(sweep_out) == 0:
        print(f"sweep produced no record (rc={rc})", file=sys.stderr)
        if os.path.exists(sweep_out):
            os.unlink(sweep_out)
        return 1
    with open(sweep_out) as f:
        record = json.load(f)
    os.unlink(sweep_out)

    gap_selected = tuple(
        n for n in GAP_QUERIES if selection is None or n in selection
    )
    gap = {}
    if gap_selected:
        gap, gap_log = run_gap_tool(args.sf_dir)
        gap = {n: r for n, r in gap.items() if n in gap_selected}
        print(gap_log[-2000:], flush=True)
    s = record["summary"]
    for name, rec in gap.items():
        record["queries"][name] = rec
        s["n_queries"] += 1
        if rec["status"] == "PASS":
            s["pass"] += 1
        elif rec["status"] == "FAIL":
            s["fail"] += 1
        else:
            s["err"] += 1
    s["wall_sec"] = round(time.time() - t0, 1)
    s["note"] = (
        f"{len(gap)} queries verified via tools/sf1_gap_check.py and merged "
        "(see their 'via' fields); rows-only entries are write queries with "
        "no SQL-expressible oracle"
    )
    if selection is not None:
        record["changed_since"] = args.changed_since
        record["changed_files"] = changed_files
        record["selection"] = selection
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1, default=str)
    print(
        f"SCALECHECK: {s['pass']} PASS / {s['fail']} FAIL / {s['err']} ERR "
        f"/ {s['rows_only']} rows-only of {s['n_queries']} "
        f"in {s['wall_sec']}s -> {args.out}"
    )
    return 0 if (s["fail"] == 0 and s["err"] == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
