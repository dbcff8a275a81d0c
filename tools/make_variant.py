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
    python tools/make_variant.py extreme --src ... --dst ...   # type-edge values on ~1/13 rows
    python tools/make_variant.py bigdoc  --src ... --dst ...   # multi-MB texts, 64KiB keys
    python tools/make_variant.py skew    --src ... --dst ...   # one key owns ~50% of rows
    python tools/make_variant.py shuffleorder --src ... --dst ... # permuted rows, 7-shard dirs
    python tools/make_variant.py nullkeys --src ... --dst ...   # ~1/7 of each KEY col NULL
    python tools/make_variant.py dupnullmix / unicode1row / allnulloffset / extremenullmix  # composites

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
  rows, with an INDEPENDENT per-column mask (splitmix64 over
  (row, column)) so every pair of columns realizes all four
  NULL/non-NULL combinations — including both-NULL. Unlike allnull
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
- extreme: type-tailored edge values injected on an independent ~1/13
  of rows per non-key column (negative prices/quantities, zero, 10^6
  magnitudes, the int32 cast edge, rates outside [0,1], pre-epoch /
  far-future / epoch-zero / 2038 timestamps, power-of-two-scaled
  embeddings) — hunting ANSI overflow, cast edges, sqrt/log-of-
  negative, divide-by-zero, and epoch-µs arithmetic forks. Magnitudes
  are deliberately capped so sums and sums-of-squares stay exactly
  representable in doubles: bigger values would only add last-ulp
  float-order noise that diverges between ANY two engines.
- bigdoc: ~1% of documents get multi-MB pseudo-word texts (and
  c_name/p_name get 64 KiB tails) — the executor-OOM probe for the
  per-position explode paths (shingles, winnowing, BPE, PII regex).
- shuffleorder: SAME rows and values, but the PHYSICAL LAYOUT changes —
  each table's rows are deterministically permuted (splitmix64 argsort)
  and written as a DIRECTORY of 7 part files instead of one file. On a
  1000-executor cluster the scan order of a 100 TB table is an
  accident of file listing and task scheduling; any query whose output
  depends on input row order or on which rows share a scan partition
  (first/any_value picks, dropDuplicates survivors, limit-without-
  order, partition-local assumptions in mapInPandas ops,
  monotonically_increasing_id leakage) is a real cluster bug that a
  single-file local read can never expose. Swept by
  tools/invariance_sweep.py (engine-vs-itself, base dir vs variant
  dir), not by the DuckDB differential — values are unchanged by
  construction, so the invariant is bit-equal output.
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


def _nullmix_mask(n: int, ci: int):
    """Deterministic INDEPENDENT per-column NULL mask: ~1/3 of rows,
    via the splitmix64 finalizer over (row, column) — so every pair of
    columns realizes all four NULL/non-NULL combinations, including
    both-NULL. The previous (i + ci) % 3 phase-shift could not: columns
    whose indices differed by a multiple of 3 were NULL on exactly the
    same rows, and different-phase pairs were NEVER both NULL, leaving
    cross-column both-NULL interactions unprobed (ADVICE r11)."""
    import numpy as np

    return (_splitmix(n, ci) % np.uint64(3)) == 0


#: columns that are RATES by contract (0..1) — their extreme probe
#: breaks the contract's RANGE, not its magnitude: huge rate extremes
#: would multiply into price columns and produce products whose SUMS
#: are float-order-dependent across engines (irreducible last-ulp
#: noise, not a bug class). -0.5 / 2.0 are exactly representable and
#: keep every product exact.
RATE_COLS = {"l_discount", "l_tax"}

#: extreme kinds per type family. Doubles stay integer-valued (or
#: 2-decimal) and ≤ 2^31 so that sums — and sums of squares in the
#: moments family — remain exactly representable in doubles at sweep
#: scale: the probe hunts SEMANTIC forks (negative prices into
#: sqrt/log, zero divisors, int-cast edges, ANSI overflow), and a
#: value large enough to break float-sum associativity would bury
#: those in engine-order noise.
EXTREME_DOUBLE = [-99999.99, 0.0, 1_000_000.0, -1_000_000.0, 0.01,
                  2147483647.0]
EXTREME_RATE = [-0.5, 2.0, 1.0, 0.0]
EXTREME_INT32 = [2147483647, -2147483648, 0]
EXTREME_INT64 = [1 << 40, -(1 << 40), 0]
EXTREME_TS = [  # µs since epoch
    7258118399_000_000,     # 2199-12-31 23:59:59 — far future
    -2240521503_000_000,    # 1899-01-07 12:34:57 — pre-epoch (negative µs)
    0,                      # 1970-01-01 00:00:00 — epoch zero
    2147483648_000_000,     # 2038-01-19 03:14:08 — 32-bit rollover
]


def _splitmix(n: int, salt: int):
    """Deterministic uint64 stream over row index — shared by the
    nullmix mask and the extreme-value selector."""
    import numpy as np

    with np.errstate(over="ignore"):
        h = np.arange(n, dtype=np.uint64) + np.uint64(salt) * np.uint64(
            0x9E3779B97F4A7C15
        )
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _extreme_col(field: pa.Field, col, n: int, ci: int):
    """Inject type-tailored extreme values on a deterministic ~1/13 of
    rows (independent per column, so single- and multi-column extreme
    interactions both occur); other rows — and NULLs — pass through."""
    import numpy as np

    h = _splitmix(n, 1000 + ci)
    sel = (h % np.uint64(13)) == 0
    kind = (h >> np.uint64(8)).astype(np.int64)
    if field.name == "embedding":
        vals = col.to_pylist()
        out = []
        for i, v in enumerate(vals):
            if v is None or not sel[i]:
                out.append(v)
            else:
                k = kind[i] % 3
                # power-of-two scalings are EXACT in float32: the
                # direction (hence cosine) is preserved while every
                # unnormalized distance/dot the index families compute
                # moves far outside the trained N(0,1) regime
                scale = (128.0, 2.0 ** -40, -1.0)[k]
                out.append([x * scale for x in v])
        return pa.array(out, type=field.type)
    if pa.types.is_timestamp(field.type):
        base = col.cast(pa.int64()).to_pylist()
        out = [
            (EXTREME_TS[kind[i] % len(EXTREME_TS)]
             if sel[i] and v is not None else v)
            for i, v in enumerate(base)
        ]
        return pa.array(out, type=pa.int64()).cast(field.type)
    if pa.types.is_floating(field.type):
        kinds = EXTREME_RATE if field.name in RATE_COLS else EXTREME_DOUBLE
        vals = col.to_pylist()
        out = [
            (kinds[kind[i] % len(kinds)] if sel[i] and v is not None else v)
            for i, v in enumerate(vals)
        ]
        return pa.array(out, type=field.type)
    if pa.types.is_integer(field.type):
        kinds = (EXTREME_INT64 if pa.types.is_int64(field.type)
                 else EXTREME_INT32)
        vals = col.to_pylist()
        out = [
            (kinds[kind[i] % len(kinds)] if sel[i] and v is not None else v)
            for i, v in enumerate(vals)
        ]
        return pa.array(out, type=field.type)
    return col


def _variant(name: str, tbl: pa.Table) -> pa.Table:
    # composite axes (VERDICT r11 item 4): every single axis found bugs
    # the others could not; interactions are the named blind spot.
    if name == "dupnullmix":
        # dup2 FIRST, then the independent NULL mask over the doubled
        # row space: the two copies of each key get DIFFERENT NULL
        # patterns — duplicated keys whose copies differ only in NULL
        # pattern, the case that stresses the class-9 "collapse exact
        # duplicates" rule against the class-10/12 NULL conventions.
        return _variant("nullmix", _variant("dup2", tbl))
    if name == "unicode1row":
        return _variant("unicode", _variant("onerow", tbl))
    if name == "extremenullmix":
        # extreme FIRST (it only rewrites non-NULL cells), then the
        # independent NULL mask over the result: every expression that
        # has to survive an edge VALUE (0 divisor, negative price,
        # pre-epoch timestamp, int32 edge) now also has to survive
        # NULL in the SAME position and NULL-next-to-edge across
        # columns — the try_divide/coalesce/sanity-domain seams where
        # a NULL branch and an edge-value branch can fork differently
        # between engines.
        return _variant("nullmix", _variant("extreme", tbl))
    if name == "allnulloffset":
        return _variant("offsetids", _variant("allnull", tbl))
    if name == "nullkeysdup":
        # dup2 FIRST, then the independent per-key NULL mask over the
        # doubled row space: the two copies of each row get DIFFERENT
        # key-NULL patterns — one copy keeps its id while the twin
        # loses it (or loses a different key). Stresses the r13
        # id-membership conventions against the class-9 duplicate-
        # collapse rules: a DISTINCT that keys on (id, payload) sees
        # the keyed copy and the id-less copy as different rows, the
        # id-less one must then be excluded by membership, and joins
        # must route the surviving copy exactly once.
        return _variant("nullkeys", _variant("dup2", tbl))
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
    if name == "bigdoc":
        # multi-MB documents.text rows (plus 64 KiB tails on the
        # c_name/p_name join/group keys): the 100 TB failure mode here
        # is executor/oracle OOM in the per-position explode paths
        # (shingles, winnowing, BPE pair space, PII regexes), not wrong
        # answers — the sweep measures which operators need a size-cap
        # or chunked-intake policy. ~1% of rows, deterministic; doc
        # text is pseudo-word filler (vocab 997) so tokenizers, LMs,
        # and dedup see realistic repetition rather than one run-on
        # token; n_chars is kept consistent with the new text.
        import numpy as np

        n = len(tbl)
        names = [f.name for f in tbl.schema]
        if n == 0 or not ({"text", "c_name", "p_name"} & set(names)):
            return tbl
        sel = (_splitmix(n, 77) % np.uint64(101)) == 0
        cols = list(tbl.columns)
        if "text" in names:
            ti = names.index("text")
            texts = tbl.column(ti).to_pylist()
            sizes = [120_000, 240_000, 480_000]  # ~0.8 / 1.6 / 3.2 MB
            big_i = 0
            for i in range(n):
                if not sel[i] or texts[i] is None:
                    continue
                nw = sizes[big_i % len(sizes)]
                big_i += 1
                texts[i] = " ".join(
                    f"w{(i * 2654435761 + j * 40503) % 997}"
                    for j in range(nw)
                )
            cols[ti] = pa.array(texts, type=pa.string())
            if "n_chars" in names:
                nc = names.index("n_chars")
                cols[nc] = pa.array(
                    [None if t is None else len(t) for t in texts],
                    type=tbl.schema.field(nc).type,
                )
        for key in ("c_name", "p_name"):
            if key not in names:
                continue
            ki = names.index(key)
            vals = tbl.column(ki).to_pylist()
            vals = [
                (v + " " + "x" * 65536) if sel[i] and v is not None else v
                for i, v in enumerate(vals)
            ]
            cols[ki] = pa.array(vals, type=pa.string())
        return pa.table(cols, schema=tbl.schema)
    if name == "extreme":
        n = len(tbl)
        cols = []
        for ci, (field, col) in enumerate(zip(tbl.schema, tbl.columns)):
            if field.name in KEY_COLS or n == 0:
                cols.append(col)
                continue
            cols.append(_extreme_col(field, col, n, ci))
        return pa.table(cols, schema=tbl.schema)
    if name == "skew":
        # DISTRIBUTION probe (VERDICT r12 item 5): one heavy-hitter key
        # owns ~50% of rows — the first axis that tests the salted
        # join/agg recipes, per-user windows, LSH/IVF bucket sizing,
        # and AQE skew handling on actually-skewed data instead of the
        # uniform generator output. The heavy value is row-sourced (the
        # first non-NULL value of the column), so FKs keep routing:
        #   o_custkey  -> one customer owns half the orders
        #   l_suppkey  -> one supplier ships half the lineitems
        #   user_id    -> one user emits half the events (per-user
        #                 windows get one giant partition)
        #   embedding  -> half the corpus is ONE vector (one IVF/LSH
        #                 cell holds half the index; near-dup heavy —
        #                 the web-crawl shape)
        #   text       -> half the documents are ONE text (dedup
        #                 cluster with n/2 members; LSH bucket blowup)
        # NULLs pass through; all other columns keep their values, so
        # duplicated-key copies still differ in payload (total-order
        # tie-break conventions stay load-bearing).
        import numpy as np

        SKEW_COLS = {"o_custkey", "l_suppkey", "user_id", "embedding",
                     "text"}
        n = len(tbl)
        names = [f.name for f in tbl.schema]
        if n == 0 or not (SKEW_COLS & set(names)):
            return tbl
        cols = list(tbl.columns)
        for ci, field in enumerate(tbl.schema):
            if field.name not in SKEW_COLS:
                continue
            vals = tbl.column(ci).to_pylist()
            heavy = next((v for v in vals if v is not None), None)
            if heavy is None:
                continue
            sel = (_splitmix(n, 555 + ci) % np.uint64(2)) == 0
            vals = [
                heavy if sel[i] and v is not None else v
                for i, v in enumerate(vals)
            ]
            cols[ci] = pa.array(vals, type=field.type)
            if field.name == "text" and "n_chars" in names:
                nci = names.index("n_chars")
                nctype = tbl.schema.field(nci).type
                old_nc = tbl.column(nci).to_pylist()
                cols[nci] = pa.array(
                    [
                        len(vals[i])
                        if sel[i] and vals[i] is not None
                        else old_nc[i]
                        for i in range(n)
                    ],
                    type=nctype,
                )
        return pa.table(cols, schema=tbl.schema)
    if name == "nullkeys":
        # The LAST identity degeneracy: every prior axis deliberately
        # kept id/join-key columns non-NULL (allnull/nullmix preserve
        # KEY_COLS; offsetids shifts them; dup2 copies them). Real
        # intake at 100 TB has NULL keys — failed enrichments, dirty
        # FKs, late dimensions — and NULL keys are where engines fork:
        # inner joins drop them, outer joins keep them (and at scale
        # hash them all into ONE partition — the canonical skew
        # outage), GROUP BY gives them their own group, window ORDER
        # BY placement differs by dialect default, and = vs
        # IS NOT DISTINCT FROM disagree. An independent ~1/7 per-key
        # mask (splitmix over (row, column), same scheme as nullmix)
        # keeps join cardinality largely intact while realizing every
        # NULL/non-NULL key combination across multi-key joins.
        import numpy as np

        n = len(tbl)
        cols = []
        for ci, (field, col) in enumerate(zip(tbl.schema, tbl.columns)):
            if field.name not in KEY_COLS or n == 0:
                cols.append(col)
                continue
            mask = pa.array(
                (_splitmix(n, 9000 + ci) % np.uint64(7)) == 0)
            cols.append(
                pc.if_else(mask, pa.nulls(n, type=field.type), col))
        return pa.table(cols, schema=tbl.schema)
    if name == "shuffleorder":
        # LAYOUT probe: permute rows deterministically. Values are
        # untouched — the variant is swept by engine-vs-itself
        # comparison (tools/invariance_sweep.py), where any output
        # delta is order/partition dependence, a real cluster bug.
        import numpy as np

        n = len(tbl)
        if n <= 1:
            return tbl
        order = np.argsort(_splitmix(n, 31337), kind="stable")
        return tbl.take(pa.array(order))
    if name == "nullmix":
        n = len(tbl)
        cols = []
        for ci, (field, col) in enumerate(zip(tbl.schema, tbl.columns)):
            if field.name in KEY_COLS or n == 0:
                cols.append(col)
                continue
            mask = pa.array(_nullmix_mask(n, ci))
            cols.append(pc.if_else(mask, pa.nulls(n, type=field.type), col))
        return pa.table(cols, schema=tbl.schema)
    raise SystemExit(f"unknown variant {name!r}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("variant",
                    choices=["dup2", "empty", "onerow", "allnull",
                             "offsetids", "nullmix", "unicode", "extreme",
                             "bigdoc", "dupnullmix", "unicode1row",
                             "allnulloffset", "skew", "shuffleorder",
                             "extremenullmix", "nullkeys", "nullkeysdup"])
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    for t in TESTDATA_TABLES:
        src = os.path.join(args.src, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        out = _variant(args.variant, pq.read_table(src))
        dst = os.path.join(args.dst, f"{t}.parquet")
        if args.variant == "shuffleorder":
            # directory-of-parts layout: each part file becomes its own
            # scan partition, so partition-boundary behavior is probed
            # too (both engines' readers already handle directories —
            # tools/gen_sf1.py established the layout). Contiguous
            # slices of the PERMUTED order, so every shard mixes rows
            # from everywhere in the original file.
            import shutil

            if os.path.isdir(dst):
                shutil.rmtree(dst)
            elif os.path.exists(dst):
                os.remove(dst)
            os.makedirs(dst)
            n_shards = min(7, max(1, out.num_rows))
            per = -(-max(out.num_rows, 1) // n_shards)  # ceil
            for s in range(n_shards):
                shard = out.slice(s * per, per)
                if s > 0 and shard.num_rows == 0:
                    break
                pq.write_table(
                    shard, os.path.join(dst, f"part-{s:05d}.parquet"),
                    version="2.6")
        else:
            pq.write_table(out, dst, version="2.6")
        print(f"{t}: {out.num_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
