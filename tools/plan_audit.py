#!/usr/bin/env python
"""Registry-wide physical-plan audit (r14).

For every registered query, captures .explain("formatted") WITHOUT
executing it and reports the plan-shape facts the optimization rounds
care about:

* number of Exchange / BroadcastExchange nodes,
* join operators used (BroadcastHashJoin / SortMergeJoin / ...),
* Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInArrow
  / FlatMapGroupsInPandas),
* single-partition Windows over frames not bounded by a limit-type
  operator above them — the 1-task shape VERDICT r13 flagged
  (``unbounded_single_partition_window``).

The single-partition-window detector parses the plan tree: a ``Window``
whose subtree contains an ``Exchange`` with ``SinglePartition``
arguments, with no TakeOrderedAndProject / *Limit / WindowGroupLimit
operator between the Window and that Exchange, funnels a
data-proportional frame through one task. Constant-bounded frames
(a window over an already-limited top-k, or over a tiny
driver-broadcast aggregate) do not trip it.

Usage: python tools/plan_audit.py [--sf-dir DIR] [--out plan_audit.json]
       [--only q1,q2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TREE_OP = re.compile(r"^(?P<prefix>[\s:+\-]*)(?P<name>[A-Za-z][\w .]*?) \((?P<num>\d+)\)\s*$")
_LIMIT_OPS = ("TakeOrderedAndProject", "CollectLimit", "GlobalLimit", "LocalLimit", "WindowGroupLimit")


def parse_tree(plan: str) -> list[dict]:
    """The operator tree of a formatted plan: [{name, num, depth}] in
    pre-order. Depth = column at which the operator name starts, so a
    node's subtree is the maximal following run of strictly deeper
    lines."""
    ops = []
    for line in plan.splitlines():
        if line.startswith("== "):
            continue
        if not line.strip():
            break  # tree section ends at the first blank line
        m = _TREE_OP.match(line)
        if m:
            ops.append(
                {
                    "name": m.group("name").strip(),
                    "num": int(m.group("num")),
                    "depth": len(m.group("prefix")),
                }
            )
    return ops


def single_partition_exchanges(plan: str) -> set[int]:
    """Operator numbers of Exchange nodes with SinglePartition args."""
    out = set()
    cur = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) (\w+)", line)
        if m:
            cur = (int(m.group(1)), m.group(2))
        elif cur and cur[1] == "Exchange" and "SinglePartition" in line:
            out.add(cur[0])
    return out


_AGG_OPS = ("HashAggregate", "ObjectHashAggregate", "SortAggregate")
# cardinality-neutral (or -reducing) ops the bounding walk may pass
# through: they never inflate the rows entering a SinglePartition
# exchange
_NEUTRAL_OPS = ("Project", "Filter", "Sort", "AQEShuffleRead", "Coalesce")


def aggregate_keys(plan: str) -> dict[int, list[str]]:
    """Op number -> grouping-key names for every aggregate operator,
    parsed from the detail sections (``(14) HashAggregate`` followed by
    ``Keys [1]: [_pid#148]``)."""
    out: dict[int, list[str]] = {}
    cur = None
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) (\w+)", line)
        if m:
            cur = int(m.group(1)) if m.group(2) in _AGG_OPS else None
        elif cur is not None:
            k = re.match(r"^Keys \[\d+\]: \[(.*)\]\s*$", line)
            if k:
                keys = [s.strip() for s in k.group(1).split(",") if s.strip()]
                out[cur] = [s.split("#")[0] for s in keys]
                cur = None
    return out


def unbounded_single_partition_windows(plan: str) -> list[int]:
    """Window op numbers whose OWN input exchange is SinglePartition
    with nothing bounding the rows that flow into it — the 1-task
    data-proportional shape VERDICT r13 flagged.

    The walk follows the Window's input chain (pre-order first-child:
    Window -> Sort -> Exchange) to find the exchange that satisfies the
    window's distribution. A SinglePartition exchange is SAFE when the
    chain, above or below the exchange, passes a cardinality bound
    before any non-neutral operator: a limit-type op
    (TakeOrderedAndProject / *Limit / WindowGroupLimit — Spark 4's
    InferWindowGroupLimit shape), or an aggregate whose grouping keys
    are empty (1 row) or all ``_pid``-prefixed (the ops/sorts.py
    two-pass substrate's per-partition counts: n_parts rows, constant
    in the data size). Anything else funnels a data-proportional frame
    through one task and is flagged."""
    ops = parse_tree(plan)
    sp = single_partition_exchanges(plan)
    agg_keys = aggregate_keys(plan)
    flagged = []

    def bounded_agg(num: int) -> bool:
        keys = agg_keys.get(num)
        return keys is not None and all(k.startswith("_pid") for k in keys)

    for i, op in enumerate(ops):
        if op["name"] != "Window":
            continue
        verdict = None  # None = keep walking
        seen_sp = False  # passed a SinglePartition exchange on the chain
        for child in ops[i + 1 :]:
            if child["depth"] <= op["depth"]:
                break  # subtree ended without an exchange: safe
            name = child["name"]
            if name.startswith(_LIMIT_OPS):
                verdict = "safe"
            elif name in _AGG_OPS:
                if bounded_agg(child["num"]):
                    verdict = "safe"
                else:
                    # keyed on data columns: output cardinality grows
                    # with the data (per-entity aggregates are exactly
                    # the frames VERDICT r13 flagged)
                    verdict = "flag" if seen_sp else "safe"
            elif name == "Exchange":
                if child["num"] not in sp:
                    verdict = "safe"  # partitioned input: not 1-task
                else:
                    seen_sp = True  # keep walking below it for a bound
            elif name == "Window" or name in _NEUTRAL_OPS:
                continue  # neutral / nested window: keep walking
            else:
                # opaque or branching op (scan, join, generate, ...):
                # the chain's cardinality is data-proportional here
                verdict = "flag" if seen_sp else "safe"
            if verdict:
                break
        if verdict == "flag":
            flagged.append(op["num"])
    return flagged


def audit_plan(plan: str) -> dict:
    ops = [o["name"] for o in parse_tree(plan)]
    return {
        "n_exchange": sum(1 for o in ops if o == "Exchange"),
        "n_broadcast_exchange": sum(1 for o in ops if o == "BroadcastExchange"),
        "joins": sorted({o for o in ops if "Join" in o}),
        "python_nodes": sorted(
            {
                o
                for o in ops
                if o
                in (
                    "BatchEvalPython",
                    "ArrowEvalPython",
                    "MapInArrow",
                    "MapInPandas",
                    "FlatMapGroupsInPandas",
                    "AggregateInPandas",
                )
            }
        ),
        "unbounded_single_partition_window": unbounded_single_partition_windows(plan),
        "n_ops": len(ops),
    }


def main() -> None:
    from salesdata_engineering_spark.registry import QUERIES
    from salesdata_engineering_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    names = args.only.split(",") if args.only else list(QUERIES)
    spark = get_spark(app_name="plan-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    results: dict[str, dict] = {}
    for name in names:
        try:
            df = QUERIES[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            results[name] = audit_plan(plan)
        except Exception as exc:
            results[name] = {"error": repr(exc)[:200]}
        flag = results[name].get("unbounded_single_partition_window")
        if flag:
            print(f"FLAG {name}: 1-task window ops {flag}", flush=True)
    summary = {
        "n": len(results),
        "flagged": sorted(
            n
            for n, r in results.items()
            if r.get("unbounded_single_partition_window")
        ),
        "errors": sorted(n for n, r in results.items() if "error" in r),
    }
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"queries": results, "summary": summary}, fh, indent=1)
        print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
