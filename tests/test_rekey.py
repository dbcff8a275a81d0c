"""rekey_dense + auto_rekey — the served path for the dense-id
precondition (VERDICT r11 item 1).

The PQ/ANN family and negative_pair_sample assert a dense 0-based id
space and tell the user to "re-key the corpus first"; these tests pin
the operator that does it (ops/sorts.py rekey_dense) and the opt-in
``auto_rekey=True`` intakes that compose it with serving, proving the
re-keyed path equals the direct dense path and that the default
behavior (the loud raise) is unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesdata_engineering_spark.datasets import load_tables
from salesdata_engineering_spark.ext.sampling import negative_pair_sample
from salesdata_engineering_spark.ext.similarity import ivf_pq_topk, pq_adc_topk
from salesdata_engineering_spark.ops.sorts import rekey_dense


def _gapped_corpus(spark, sf_dir):
    emb = (
        load_tables(spark, sf_dir)["embeddings"]
        .filter(F.col("embedding").isNotNull())
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    return emb.filter(F.col("vec_id") % 7 != 3)


def test_rekey_dense_assigns_contiguous_ids(spark, sf_dir):
    gapped = _gapped_corpus(spark, sf_dir)
    n = gapped.count()
    out = rekey_dense(gapped, "vec_id", persist_key="rekey_dense:test1")
    got = out.select("vec_id", "_orig_vec_id").orderBy("vec_id").collect()
    assert [r.vec_id for r in got] == list(range(n))
    # order defaults to ascending original id, so the mapping is the
    # rank of the original id among surviving ids
    origs = sorted(r._orig_vec_id for r in got)
    assert [r._orig_vec_id for r in got] == origs
    assert all(o % 7 != 3 for o in origs)
    # dtype of the new ids matches the original integral id column
    assert (
        out.schema["vec_id"].dataType
        == gapped.schema["vec_id"].dataType
    )


def test_rekey_dense_custom_alias_and_order(spark):
    df = spark.createDataFrame(
        [(100, "b"), (7, "a"), (52, "c")], "id INT, v STRING"
    )
    out = rekey_dense(
        df, "id", order=["v"], orig_alias="old_id",
        persist_key="rekey_dense:test2",
    )
    got = {r.old_id: r.id for r in out.collect()}
    assert got == {7: 0, 100: 1, 52: 2}


def test_guard_still_raises_by_default(spark, sf_dir):
    gapped = _gapped_corpus(spark, sf_dir)
    queries = gapped.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = gapped.count()
    with pytest.raises(ValueError, match="dense 0-based"):
        pq_adc_topk(
            gapped, queries, k=3, m_cand=10, n_codes=64, corpus_count=n
        ).collect()


def test_auto_rekey_identity_on_dense_corpus(spark, sf_dir):
    """On an ALREADY-dense corpus the rekey is the identity map, so the
    opt-in path must return exactly the direct path's answers — the
    no-green-result-changed proof."""
    emb = (
        load_tables(spark, sf_dir)["embeddings"]
        .filter(F.col("embedding").isNotNull())
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = emb.count()
    kw = dict(k=3, m_cand=10, n_codes=64, stride=50, corpus_count=n)
    direct = ivf_pq_topk(emb, queries, **kw).orderBy("query_id", "rk").collect()
    rekeyed = (
        ivf_pq_topk(emb, queries, auto_rekey=True, **kw)
        .orderBy("query_id", "rk")
        .collect()
    )
    assert direct == rekeyed
    assert len(direct) > 0


def test_auto_rekey_equals_manual_rekey_on_gapped(spark, sf_dir):
    """auto_rekey on a gapped corpus == manually densifying the corpus,
    serving, and translating ids back by the same order-preserving
    map — the brute-force equivalence the precondition error promises."""
    gapped = _gapped_corpus(spark, sf_dir)
    n = gapped.count()
    queries = gapped.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(k=3, m_cand=10, n_codes=64, stride=50, corpus_count=n)
    got = (
        ivf_pq_topk(gapped, queries, auto_rekey=True, **kw)
        .orderBy("query_id", "rk")
        .collect()
    )
    # manual path: dense ids by rank of original id
    dense = rekey_dense(gapped, "vec_id", persist_key="rekey_dense:test3")
    id_map = {
        r.vec_id: r._orig_vec_id
        for r in dense.select("vec_id", "_orig_vec_id").collect()
    }
    inv = {v: k for k, v in id_map.items()}
    dense_corpus = dense.drop("_orig_vec_id")
    dense_queries = dense_corpus.filter(
        F.col("vec_id").isin([inv[r.query_id] for r in got])
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    manual = ivf_pq_topk(dense_corpus, dense_queries, **kw).collect()
    manual_translated = sorted(
        (id_map[r.query_id], id_map[r.neighbor_id], r.rk, r.cosine_sim)
        for r in manual
    )
    assert sorted(
        (r.query_id, r.neighbor_id, r.rk, r.cosine_sim) for r in got
    ) == manual_translated
    assert len(got) > 0
    assert all(r.neighbor_id % 7 != 3 for r in got)


def test_negative_pair_sample_auto_rekey(spark, sf_dir):
    gapped = _gapped_corpus(spark, sf_dir).select("vec_id")
    n = gapped.count()
    with pytest.raises(ValueError, match="dense 0-based"):
        negative_pair_sample(gapped, "vec_id", k=2).collect()
    out = negative_pair_sample(gapped, "vec_id", k=2, auto_rekey=True).collect()
    assert len(out) == 2 * n
    assert all(r.anchor_id % 7 != 3 and r.neg_id % 7 != 3 for r in out)
    assert all(r.anchor_id != r.neg_id for r in out)
    # deterministic: same pairs on a rerun
    out2 = negative_pair_sample(gapped, "vec_id", k=2, auto_rekey=True).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_rekey_dense_overflow_raises_not_wraps(spark):
    """ADVICE r12: with DUPLICATED ids the row count can exceed the
    original narrow dtype's range; the dense-id cast must raise loudly
    instead of wrapping into duplicate 'dense' ids under non-ANSI."""
    big = spark.range(300).select(
        F.lit(1).cast("byte").alias("id"), F.col("id").alias("v")
    )
    out = rekey_dense(big, "id", order=["v"], persist_key="rekey_dense:ovf")
    with pytest.raises(Exception, match="rekey_dense: row count exceeds"):
        out.collect()
    # within range the narrow dtype is kept and numbering is unchanged
    small = spark.range(100).select(
        F.lit(1).cast("byte").alias("id"), F.col("id").alias("v")
    )
    got = rekey_dense(small, "id", order=["v"], persist_key="rekey_dense:ovf2")
    assert got.schema["id"].dataType.simpleString() == "tinyint"
    assert sorted(r.id for r in got.collect()) == list(range(100))


def test_auto_rekey_duplicate_nonmember_queries_collapse(spark, sf_dir):
    """ADVICE r12 (medium): duplicate NON-member query rows used to each
    receive a distinct negative id, so every copy served its own k-set —
    duplicate (query_id, rk) output rows. They must collapse to ONE
    deterministic k-set per original query id, equal to the single-copy
    run."""
    gapped = _gapped_corpus(spark, sf_dir)
    n = gapped.count()
    # vec_id % 7 == 3 rows are exactly the ones _gapped_corpus drops,
    # so these queries are NON-members of the corpus id space
    qbase = (
        load_tables(spark, sf_dir)["embeddings"]
        .filter(F.col("embedding").isNotNull())
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .filter((F.col("vec_id") % 7 == 3) & (F.col("vec_id") < 40))
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    kw = dict(k=3, m_cand=10, n_codes=64, corpus_count=n)
    tripled = pq_adc_topk(
        gapped, qbase.union(qbase).union(qbase), auto_rekey=True, **kw
    ).collect()
    single = pq_adc_topk(gapped, qbase, auto_rekey=True, **kw).collect()
    key = lambda r: (r.query_id, r.neighbor_id, r.rk, r.cosine_sim)  # noqa: E731
    assert sorted(map(key, tripled)) == sorted(map(key, single))
    # exactly one row per (query_id, rk)
    seen = {(r.query_id, r.rk) for r in tripled}
    assert len(seen) == len(tripled)
