"""Checks for operators without value oracles (sketches) and dialect
equivalences worth pinning."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesdata_engineering_spark.registry import QUERIES


def test_approx_count_distinct_within_bound(spark, sf_dir, tables):
    # The registered query folds the bound into approx_ok (what the
    # driver hash-checks); here assert it holds AND re-derive the raw
    # HLL estimate against the exact NDV at a tighter 5% bound.
    rows = QUERIES["approx_count_distinct"].fn(spark, sf_dir).collect()
    assert rows and all(r.approx_ok == 1 for r in rows), rows
    got = {
        r.l_returnflag: r.approx
        for r in tables["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"))
        .collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in tables["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, n in exact.items():
        rel_err = abs(got[flag] - n) / n
        assert rel_err < 0.05, f"{flag}: approx {got[flag]} vs exact {n} ({rel_err:.2%})"


def test_month_substring_equals_date_format(spark, tables):
    """F1 hard-part pinned: substring(date_str,1,7) ≡ date_format(ts,'yyyy-MM')."""
    o = tables["orders"].select(
        F.substring(F.date_format("o_orderdate", "yyyy-MM-dd"), 1, 7).alias("a"),
        F.date_format("o_orderdate", "yyyy-MM").alias("b"),
    )
    assert o.filter(F.col("a") != F.col("b")).count() == 0


def test_hll_sketch_union_equals_direct_estimate(spark, sf_dir, tables):
    """The point of the sketch over approx_count_distinct: MERGEABILITY.
    Partial per-priority sketches unioned with hll_union_agg must give
    the IDENTICAL estimate as sketching the whole column directly (HLL
    union is lossless over register maxima), and the direct estimate
    must sit within the default-precision (lgConfigK=12) error bound of
    the exact count."""
    o = tables["orders"]
    direct = o.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").alias("est")
    ).collect()[0].est
    partial = o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    merged = partial.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).collect()[0].est
    assert merged == direct, (merged, direct)
    exact = o.agg(F.countDistinct("o_custkey").alias("n")).collect()[0].n
    assert abs(direct - exact) / exact < 0.03, (direct, exact)


def test_spearman_matches_scipy_free_reference(spark, sf_dir):
    """Tie-averaged integer half-rank Spearman must equal the textbook
    Pearson-on-tie-averaged-ranks computed independently in numpy."""
    import numpy as np

    from salesdata_engineering_spark.datasets import load_tables
    from salesdata_engineering_spark.registry import QUERIES

    got = QUERIES["stats_spearman_qty_price"].fn(spark, sf_dir).collect()[0]
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_quantity", "l_extendedprice"
    ).toPandas()
    x, y = li.l_quantity.to_numpy(), li.l_extendedprice.to_numpy()

    def avg_rank(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=float)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j + 1 < len(sv) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rx, ry = avg_rank(x), avg_rank(y)
    ref = np.corrcoef(rx, ry)[0, 1]
    assert got.n_rows == len(x)
    assert abs(got.spearman_r - ref) < 1e-5, (got.spearman_r, ref)
