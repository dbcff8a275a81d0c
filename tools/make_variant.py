"""Build degenerate-input variants of a testdata directory.

The round 8-11 probe grid (PERF_NOTES.md) found real bugs on every
axis it swept: scale, file layout, empty tables, single-row tables,
duplicated rows. This tool makes each variant reproducible as one
command instead of an ad-hoc /tmp script, so sweeps can be re-run
(and extended: all-NULL columns, offset id spaces) by anyone:

    python tools/make_variant.py dup2    --src /root/testdata/sf0.01 --dst /tmp/sf01_dup
    python tools/make_variant.py empty   --src ... --dst ...
    python tools/make_variant.py onerow  --src ... --dst ...
    python tools/make_variant.py allnull --src ... --dst ...   # nullable cols -> all NULL
    python tools/make_variant.py offsetids --src ... --dst ... # id cols shifted by +10^9
    python tools/make_variant.py nullmix --src ... --dst ...   # 1/3 of each non-key col NULL
    python tools/make_variant.py unicode --src ... --dst ...   # multibyte tails on free text

Then sweep with tools/check_all.py --sf-dir <dst>.

Variant semantics:
- dup2: every table stacked on itself (pa.concat_tables(t, t)) —
  valid multiset input that violates the tables' primary-key
  contracts (the round-10 probe axis, now bug class 9).
- empty / onerow: zero rows / first row only (bug classes 7 / 8).
- allnull: every column that is NOT an id/join-key column is
  replaced by typed NULLs (key columns kept so joins still route);
  what a schema-evolved or corrupt-columnar source yields at 100 TB.
- offsetids: every *key* integer column is shifted by +1_000_000_000
  — same joins, same cardinalities, but ids are no longer dense or
  0-based, flushing out hidden dense-id assumptions (modular bucket
  arithmetic stays valid, id-as-index does not).
- nullmix: every non-key column gets NULLs on a deterministic third of
  rows, with the mask phase-shifted per column so multi-column
  expressions see every NULL/non-NULL combination. Unlike allnull
  (all-or-nothing), mixed NULLs flush ASYMMETRIC divergences: window
  ORDER BY over a nullable key (Spark defaults NULLS FIRST for asc,
  DuckDB NULLS LAST), rank/argmax tie-breaks that only fork when NULL
  and non-NULL values compete, partial-group aggregates.
- unicode: FREE-TEXT columns (documents.text, c_name, p_name) get a
  deterministic multi-byte tail cycling through 2/3/4-byte UTF-8,
  case-mapping traps (ß, Greek), and combining diacritics — flushing
  chars-vs-bytes length forks, non-ASCII case mapping, codepoint-vs-
  grapheme reversal/substring, and regex class behavior between the
  JVM and DuckDB. Semantic/enum columns (event_type, statuses, lang,
  brands) stay ASCII so literal filters keep matching.
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from salesdata_engineering_spark.schemas import TESTDATA_TABLES  # noqa: E402

#: columns that identify rows / route joins — kept non-NULL by the
#: allnull variant, shifted by the offsetids variant.
KEY_COLS = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "event_id", "user_id", "doc_id", "vec_id",
}


def _variant(name: str, tbl: pa.Table) -> pa.Table:
    if name == "dup2":
        return pa.concat_tables([tbl, tbl])
    if name == "empty":
        return tbl.slice(0, 0)
    if name == "onerow":
        return tbl.slice(0, 1)
    if name == "allnull":
        cols = []
        for field, col in zip(tbl.schema, tbl.columns):
            if field.name in KEY_COLS:
                cols.append(col)
            else:
                cols.append(pa.nulls(len(tbl), type=field.type))
        return pa.table(cols, schema=tbl.schema)
    if name == "offsetids":
        cols = []
        for field, col in zip(tbl.schema, tbl.columns):
            if field.name in KEY_COLS and pa.types.is_integer(field.type):
                shifted = pc.add(col.cast(pa.int64()), 1_000_000_000)
                cols.append(shifted.cast(pa.int64()))
            else:
                cols.append(col)
        names = [f.name for f in tbl.schema]
        return pa.table(cols, names=names)
    if name == "unicode":
        free_text = {"text", "c_name", "p_name"}
        tails = [
            " héllo wörld",            # 2-byte latin accents
            " 東京データ",    # 3-byte CJK
            " Ωμέγα ß",  # Greek + sharp-s case trap
            " 🚀🌍 emoji",        # 4-byte astral plane
            " Ẑ combining",                 # combining circumflex
        ]
        cols = []
        for field, col in zip(tbl.schema, tbl.columns):
            if field.name not in free_text:
                cols.append(col)
                continue
            vals = col.to_pylist()
            out = [
                None if v is None else v + tails[i % len(tails)]
                for i, v in enumerate(vals)
            ]
            cols.append(pa.array(out, type=field.type))
        return pa.table(cols, schema=tbl.schema)
    if name == "nullmix":
        import numpy as np

        n = len(tbl)
        idx = np.arange(n)
        cols = []
        for ci, (field, col) in enumerate(zip(tbl.schema, tbl.columns)):
            if field.name in KEY_COLS or n == 0:
                cols.append(col)
                continue
            # deterministic, column-phase-shifted mask: row i of column
            # ci is NULLed when (i + ci) % 3 == 0 — every pair of
            # columns realizes all four NULL/non-NULL combinations
            mask = pa.array((idx + ci) % 3 == 0)
            cols.append(pc.if_else(mask, pa.nulls(n, type=field.type), col))
        return pa.table(cols, schema=tbl.schema)
    raise SystemExit(f"unknown variant {name!r}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant",
                    choices=["dup2", "empty", "onerow", "allnull",
                             "offsetids", "nullmix", "unicode"])
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    for t in TESTDATA_TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        out = _variant(args.variant, pq.read_table(src))
        pq.write_table(out, os.path.join(args.dst, f"{t}.parquet"),
                       version="2.6")
        print(f"{t}: {out.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
