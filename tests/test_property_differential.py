"""Differential property tests on seeded random data — independent
oracles (plain Spark rewrite, pandas.merge_asof) rather than DuckDB,
covering the custom operators' algebraic contracts:

- salted_sum(keys, v) ≡ groupBy(keys).sum(v) for ANY salt count
  (the salt must never change the result, only the shuffle shape)
- asof_join ≡ pandas.merge_asof(direction='backward') on
  dup-free right sides (pandas is the reference semantics for as-of)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from salesdata_engineering_spark.ops.asof import asof_join
from salesdata_engineering_spark.ops.skew import salted_sum


def test_salted_sum_equals_plain_groupby_any_salts(spark):
    rng = np.random.default_rng(7)
    n = 20_000
    pdf = pd.DataFrame(
        {
            # zipf-ish: one key takes ~half the rows — the skew case the op exists for
            "k": np.where(rng.random(n) < 0.5, 0, rng.integers(0, 50, n)),
            "rid": np.arange(n),
            # 2-decimal money values; sums are exact in decimal
            "v": (rng.integers(0, 100_000, n) / 100.0),
        }
    )
    df = spark.createDataFrame(pdf)
    plain = {
        r.k: r.s
        for r in df.groupBy("k").agg(F.sum(F.col("v").cast("decimal(14,2)")).alias("s")).collect()
    }
    for n_salts in (1, 7, 64):
        salted = {
            r.k: r.s
            for r in salted_sum(
                df, keys=["k"], value=F.col("v").cast("decimal(14,2)"),
                alias="s", salt_from="rid", n_salts=n_salts,
            ).collect()
        }
        assert salted == plain, f"n_salts={n_salts} changed the result"


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "eid": np.arange(300),
            "key": rng.integers(0, 8, 300),
            "ts": base + pd.to_timedelta(rng.integers(0, 100_000, 300), unit="s"),
        }
    )
    right = (
        pd.DataFrame(
            {
                "rid": np.arange(200),
                "key": rng.integers(0, 10, 200),  # keys 8,9 never match
                "ts": base + pd.to_timedelta(rng.integers(0, 100_000, 200), unit="s"),
                "val": np.round(rng.random(200), 2),
            }
        )
        .drop_duplicates(subset=["key", "ts"])  # merge_asof needs unique (key, ts)
        .reset_index(drop=True)
    )
    expected = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts")[["key", "ts", "val"]].rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="key",
        direction="backward",
    ).set_index("eid")

    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        keys=["key"],
        ts="ts",
        payload=["val"],
        tiebreak="rid",
    ).collect()
    assert len(got) == len(left)
    for r in got:
        exp_val = expected.loc[r.eid, "val"]
        exp_ts = expected.loc[r.eid, "rts"]
        if pd.isna(exp_val):
            assert r.val_matched is None and r.ts_matched is None, r
        else:
            assert r.val_matched == exp_val, (r, exp_val)
            assert pd.Timestamp(r.ts_matched) == exp_ts, (r, exp_ts)


def test_repetition_score_matches_python_reference(spark):
    """repetition_score (array-expression form) vs a direct Python
    computation of the Gopher duplicate-n-gram fractions on seeded
    random word soup — independent of both DuckDB and the old
    window-based Spark formulation."""
    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(words, size=int(rng.integers(0, 30)))))
        for i in range(300)
    ]
    from salesdata_engineering_spark.ext.text import repetition_score

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in repetition_score(df).collect()}

    import re

    expect = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"\s+", text)]
        if len(toks) < 2:
            continue
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        g3 = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        expect[doc_id] = (len(g2), len(set(g2)), len(g3), len(set(g3)))
    assert set(got) == set(expect)
    for doc_id, (n2, u2, n3, u3) in expect.items():
        r = got[doc_id]
        assert (r.n_2grams, r.n_unique_2grams, r.n_3grams, r.n_unique_3grams) == (
            n2, u2, n3, u3,
        ), doc_id
        # Spark F.round is HALF_UP; Python's round is banker's — use the
        # same Decimal HALF_UP reference as the bigram test so a fraction
        # landing on an exact 6-decimal tie cannot fail spuriously
        from decimal import ROUND_HALF_UP, Decimal

        assert r.rep2_frac == float(
            Decimal(repr(1.0 - u2 / n2)).quantize(Decimal("1e-6"), ROUND_HALF_UP)
        )


def test_bigram_logprob_matches_python_reference(spark):
    """bigram_logprob vs a direct Python bigram LM with the same add-one
    smoothing and micro-nat quantization — validates the count tables,
    the context/continuation definitions, and the exact-integer sum."""
    import math
    import re

    rng = np.random.default_rng(31)
    words = [f"t{i}" for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(words, size=int(rng.integers(2, 20)))))
        for i in range(200)
    ]
    from salesdata_engineering_spark.ext.text import bigram_logprob

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.mean_logprob) for r in bigram_logprob(df).collect()}

    pairs = []
    for doc_id, text in docs:
        toks = re.split(r"\s+", text)
        pairs.extend((doc_id, a, b) for a, b in zip(toks, toks[1:]))
    from collections import Counter

    bc = Counter((a, b) for _, a, b in pairs)
    cc = Counter(a for _, a, _ in pairs)
    v = len({b for _, _, b in pairs})
    from decimal import ROUND_HALF_UP, Decimal

    def half_up(x: float, exp: str) -> float:
        # Spark F.round is HALF_UP on the shortest-repr decimal of the
        # double; Python's built-in round is banker's and differs on ties
        return float(Decimal(repr(x)).quantize(Decimal(exp), ROUND_HALF_UP))

    per_doc: dict[int, list[int]] = {}
    for doc_id, a, b in pairs:
        s = int(half_up(math.log((bc[(a, b)] + 1) / (cc[a] + v)) * 1_000_000, "1"))
        per_doc.setdefault(doc_id, []).append(s)
    expect = {
        # floor-quantize readout (r8): floor(S/n + 0.5)/1e6, the same
        # IEEE ops the Spark/DuckDB spellings share — round(double, 6)
        # disagreed between the engines ~1-per-1e5 rows at sf1
        d: (len(ss), math.floor(sum(ss) / len(ss) + 0.5) / 1_000_000.0)
        for d, ss in per_doc.items()
    }
    assert got == expect


def test_global_cumsum_multi_equals_naive_window(spark):
    """The two-pass multi-column cumsum must equal the naive
    single-partition ORDER BY window for ANY partition count — the
    range/offset scheme changes only the shuffle shape."""
    from pyspark.sql import Window

    from salesdata_engineering_spark.ops.sorts import global_cumsum_multi

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame(
        {
            "k": rng.permutation(5_000),
            "a": rng.integers(0, 100, 5_000),
            "b": rng.integers(0, 100, 5_000),
        }
    )
    df = spark.createDataFrame(pdf)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {
        r.k: (r.ca, r.cb)
        for r in df.select(
            "k", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
        ).collect()
    }
    for parts in (1, 3, 32):
        got = {
            r.k: (r.ca, r.cb)
            for r in global_cumsum_multi(
                df, ["k"], {"ca": "a", "cb": "b"}, n_parts=parts,
                persist_key=f"prop_cumsum_{parts}",
            ).collect()
        }
        assert got == naive, f"n_parts={parts} changed the cumsums"


def test_containment_pairs_matches_python_reference(spark):
    """Containment |A∩B|/|A| against a brute-force Python shingle
    computation on a small corpus with planted subset documents."""
    from salesdata_engineering_spark.ext.dedup import containment_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog"),  # subset of 1
        (3, "a completely different document about spark engines at scale"),
        (4, "document about spark engines at scale"),  # subset-ish of 3
        (5, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
    ]
    n = 3

    def shingles(text):
        t = text.split()
        if len(t) <= n - 1:
            return {" ".join(t)}
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    expect = {}
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1 :]:
            sa, sb = shingles(ta), shingles(tb)
            inter = len(sa & sb)
            ca, cb = round(inter / len(sa), 6), round(inter / len(sb), 6)
            if inter and (ca >= 0.7 or cb >= 0.7):
                expect[(ia, ib)] = (inter, ca, cb)

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): (r.n_inter, r.cont_a, r.cont_b)
        for r in containment_pairs(df, n=n, threshold=0.7).collect()
    }
    assert got == expect


def test_global_ntile_equals_naive_ntile(spark):
    """global_ntile must reproduce ntile(n) EXACTLY for any n and any
    total order, including the first-tiles-get-one-extra-row split and
    the n > rows degenerate case."""
    from pyspark.sql import Window

    from salesdata_engineering_spark.ops.sorts import global_ntile

    rng = np.random.default_rng(23)
    pdf = pd.DataFrame(
        {
            "k": np.arange(997),  # prime row count: every tile split is uneven
            "v": rng.integers(0, 500, 997),
        }
    )
    df = spark.createDataFrame(pdf)
    for n_tiles in (3, 10, 64, 2000):
        naive = {
            r.k: r.t
            for r in df.select(
                "k", F.ntile(n_tiles).over(Window.orderBy("v", "k")).alias("t")
            ).collect()
        }
        two_pass = {
            r.k: r.tile
            for r in global_ntile(
                df, ["v", "k"], n_tiles, persist_key=f"gnt_{n_tiles}"
            ).collect()
        }
        assert two_pass == naive, f"n_tiles={n_tiles} diverged"


def test_dynamic_gap_sessions_match_python_reference(spark):
    """The running-max gaps-and-islands rewrite (the oracle's logic)
    must match a brute-force Python sessionizer under Spark's merge
    rule (new session when ts >= max end so far), on adversarial data
    where a long-gap event outlasts several short-gap successors."""
    rng = np.random.default_rng(31)
    rows = []
    t = 0
    for uid in range(20):
        t = 0
        for _ in range(200):
            t += int(rng.integers(1, 900))
            gap = 1800 if rng.random() < 0.2 else 600
            rows.append((uid, t, gap))
    # python reference
    expected = {}
    for uid in range(20):
        evs = sorted((t, g) for u, t, g in rows if u == uid)
        n_sessions = 0
        end = None
        for t, g in evs:
            if end is None or t >= end:
                n_sessions += 1
                end = t + g
            else:
                end = max(end, t + g)
        expected[uid] = n_sessions
    pdf = pd.DataFrame(rows, columns=["user_id", "tus", "gap"])
    df = spark.createDataFrame(pdf)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "eus")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = df.withColumn("eus", F.col("tus") + F.col("gap")).withColumn(
        "runmax", F.max("eus").over(w)
    )
    got = {
        r.user_id: r.n
        for r in f.select(
            "user_id",
            F.when(
                F.col("runmax").isNull() | (F.col("tus") >= F.col("runmax")), 1
            )
            .otherwise(0)
            .alias("new_s"),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n"))
        .collect()
    }
    assert got == expected


def test_band_join_bucket_explode_is_lossless(spark):
    """The +-1-bucket explode band join must find EXACTLY the pairs a
    naive theta-join finds for |a-b| <= width, for random values and
    bucket-edge-straddling pairs alike."""
    rng = np.random.default_rng(41)
    n = 2_000
    width = 500
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "g": rng.integers(0, 20, n),
            # cluster near bucket edges on purpose
            "x": (rng.integers(0, 40) * width + rng.integers(-3, 4, n)).astype(
                "int64"
            ),
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "b", F.floor(F.col("x") / width).cast("long")
    )
    a = df.select(
        F.col("id").alias("ida"), F.col("g").alias("ga"),
        F.col("x").alias("xa"),
        F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)).alias("bb"),
    )
    bside = df.select(
        F.col("id").alias("idb"), F.col("g").alias("gb"),
        F.col("x").alias("xb"), F.col("b").alias("bb"),
    )
    banded = (
        a.join(bside, ["bb"])
        .filter(
            (F.col("ga") == F.col("gb"))
            & (F.col("ida") < F.col("idb"))
            & (F.abs(F.col("xa") - F.col("xb")) <= width)
        )
        .select("ida", "idb")
    )
    naive = (
        df.alias("l")
        .join(
            df.alias("r"),
            (F.col("l.g") == F.col("r.g"))
            & (F.col("l.id") < F.col("r.id"))
            & (F.abs(F.col("l.x") - F.col("r.x")) <= width),
        )
        .select(F.col("l.id").alias("ida"), F.col("r.id").alias("idb"))
    )
    got = {(r.ida, r.idb) for r in banded.collect()}
    want = {(r.ida, r.idb) for r in naive.collect()}
    assert got == want


def test_global_helpers_desc_directions_equal_naive_windows(spark):
    """r14: the substrate's positional ``directions`` support (added for
    the five 1-task-window swaps) must reproduce the naive DESC-keyed
    windows exactly — desc maps to desc_nulls_last, which is BOTH
    Spark's .desc() default and the oracle's, so the assignments must
    be bit-equal on any total order, uneven tiles included."""
    from pyspark.sql import Window

    from salesdata_engineering_spark.ops.sorts import (
        global_cumsum,
        global_ntile,
        global_row_number,
    )

    rng = np.random.default_rng(41)
    pdf = pd.DataFrame(
        {
            "k": np.arange(499),  # prime: uneven tile splits
            "v": rng.integers(0, 200, 499),
        }
    )
    df = spark.createDataFrame(pdf)
    w = Window.orderBy(F.col("v").desc(), "k")
    naive_rn = {
        r.k: r.rn for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    got_rn = {
        r.k: r.rn
        for r in global_row_number(
            df, ["v", "k"], directions=["desc", "asc"], persist_key="gdir_rn"
        ).collect()
    }
    assert got_rn == naive_rn
    naive_t = {
        r.k: r.t for r in df.select("k", F.ntile(5).over(w).alias("t")).collect()
    }
    got_t = {
        r.k: r.tile
        for r in global_ntile(
            df, ["v", "k"], 5, directions=["desc", "asc"], persist_key="gdir_nt"
        ).collect()
    }
    assert got_t == naive_t
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    naive_c = {
        r.k: r.c for r in df.select("k", F.sum("v").over(wc).alias("c")).collect()
    }
    got_c = {
        r.k: r.cum
        for r in global_cumsum(
            df, ["v", "k"], "v", directions=["desc", "asc"], persist_key="gdir_cs"
        ).collect()
    }
    assert got_c == naive_c
