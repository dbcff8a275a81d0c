"""Semantic tests for the extension operators (beyond oracle parity):
do the dedup strategies actually FIND the corpus's planted near-dups,
and does ANN recall hold up against brute force?"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesdata_engineering_spark.ext.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from salesdata_engineering_spark.ext.similarity import cosine_topk, lsh_ann_topk
from salesdata_engineering_spark.ext.text import winnow_fingerprint


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"]


@pytest.fixture(scope="module")
def embs(tables):
    return tables["embeddings"].withColumn("embedding", F.col("embedding").cast("array<double>"))


def test_ngram_jaccard_finds_planted_dups(docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect()
    assert len(pairs) > 0, "corpus has planted near-dups; none found"
    assert all(0.6 <= r.jaccard <= 1.0 for r in pairs)


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH candidates verified by exact Jaccard must recover nearly all
    true high-similarity pairs (k=16, b=4, r=4 → P[cand] ≈ 1 at j≥0.8)."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, k=16, bands=4, n=3, threshold=0.8).collect()}
    assert lsh <= exact, "LSH+verify must never emit a below-threshold pair"
    assert len(exact) > 0
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} below 0.9 ({len(lsh)}/{len(exact)})"


def test_exact_dedup_idempotent(docs):
    d = exact_dedup(docs)
    assert d.count() == d.select("content_hash").distinct().count()
    # corpus has no byte-identical copies → every hash keeps exactly 1
    assert d.filter(F.col("n_copies") > 1).count() == 0


def test_winnow_fingerprint_identical_for_identical_text(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "an entirely different sentence about spark engines")],
        "doc_id int, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in winnow_fingerprint(df).collect()}
    assert fp[1] == fp[2] and fp[1] != fp[3]


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [(1, "spark engine shuffle partition join aggregate window"),
         (2, "spark engine shuffle partition join aggregate window extra"),
         (3, "completely unrelated words about cooking pasta tonight")],
        "doc_id int, text string",
    )
    fps = {r.doc_id: r.simhash for r in simhash(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fps[1], fps[2]) < ham(fps[1], fps[3])


def test_lsh_ann_recall_vs_brute_force(embs):
    queries = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, queries, k=5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in lsh_ann_topk(embs, queries, k=5, n_tables=8, bits=4, dim=64).collect()
    }
    recall = len(ann & exact) / len(exact)
    # 8 tables × 4 bits OR-amplification; p=1−θ/π per bit → expected
    # per-neighbor recall ≈ 1−(1−p⁴)⁸ ≈ 0.8+ for the top-5 band here.
    assert recall >= 0.5, f"ANN recall collapsed: {recall:.2f}"
    assert len(ann) > 0


def test_asof_join_backward_semantics(spark):
    """Ties match (ts equal counts as at-or-before); no earlier right row
    -> NULL match; latest-of-several wins; equal-ts right dups collapse
    to max tiebreak."""
    import datetime

    from salesdata_engineering_spark.ops.asof import asof_join

    def ts(m):
        return datetime.datetime(2024, 1, 1, 10, m)

    left = spark.createDataFrame(
        [(1, 100, ts(10)), (2, 100, ts(5)), (3, 200, ts(30)), (4, 300, ts(0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (11, 100, ts(5), 1.0),   # equal-ts for left#2 -> tie matches
            (12, 100, ts(5), 2.0),   # dup ts: max event_id (12) wins
            (13, 100, ts(9), 3.0),   # latest before left#1
            (14, 200, ts(31), 4.0),  # AFTER left#3 -> no match
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.value_matched, r.ts_matched)
        for r in asof_join(
            left, right, keys=["user_id"], ts="ts", payload=["value"], tiebreak="event_id"
        ).collect()
    }
    assert out[1] == (3.0, ts(9))     # most recent of several
    assert out[2] == (2.0, ts(5))     # tie included, dedup kept id 12
    assert out[3] == (None, None)     # only later rows exist
    assert out[4] == (None, None)     # user has no right rows at all


def test_ivf_ann_recall_vs_brute_force(embs):
    from salesdata_engineering_spark.ext.similarity import ivf_ann_topk

    queries = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, queries, k=5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in ivf_ann_topk(embs, queries, k=5, stride=50, nprobe=4).collect()
    }
    recall = len(ann & exact) / len(exact)
    # probing 4 of ~|corpus|/50 cells; sampled (non-kmeans) centroids —
    # recall floor is modest but must beat random-cell collapse
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"


def test_near_dup_lsh_recall_and_plan(embs):
    """The registered LSH-bucketed near-dup must (a) never plan a cross
    product and (b) recover a healthy fraction of the all-pairs oracle's
    pairs at the demo threshold (per-pair P[candidate] = 1-(1-p^4)^8)."""
    from salesdata_engineering_spark.ext.similarity import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    lsh = embedding_near_dup_lsh(embs, threshold=0.4, n_tables=8, bits=4, dim=64)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    exact = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(embs, threshold=0.4).collect()}
    got = {(r.id_a, r.id_b) for r in lsh.collect()}
    assert got <= exact, "LSH near-dup produced a pair the exact verify should have rejected"
    recall = len(got & exact) / max(len(exact), 1)
    assert recall >= 0.4, f"near-dup LSH recall collapsed: {recall:.2f} of {len(exact)} pairs"


def test_connected_components_planted_clusters(spark):
    from salesdata_engineering_spark.ext.dedup import connected_components

    # two chains (1-2-3, 10-11) and a triangle (20,21,22): min-id labels
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {(r.id, r.component) for r in connected_components(edges).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_chunking_covers_all_tokens_with_overlap(spark):
    from salesdata_engineering_spark.ext.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(95))), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=50, overlap=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 95 tokens, stride 40 -> ceil(85/40)=3 chunks; last clamps
    chunks = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [c.n_chunk_tokens for c in chunks] == [50, 50, 15]
    assert chunks[1].chunk_text.split()[0] == "t40"  # overlap of 10
    assert chunks[2].chunk_text.split()[-1] == "t94"  # full coverage
    # short docs yield exactly one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
    assert len(by_doc[3]) == 1


def test_repetition_score_known_fractions(spark):
    from salesdata_engineering_spark.ext.text import repetition_score

    df = spark.createDataFrame(
        [
            (1, "a a a a"),        # 2-grams: 'a a' x3 -> rep2 = 1 - 1/3
            (2, "a b c d"),        # all grams unique -> rep 0
            (3, "x y"),            # one 2-gram, no 3-grams -> rep3 = 0
            (4, "solo"),           # no 2-grams -> excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_score(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_2grams == 3 and out[1].n_unique_2grams == 1
    assert out[1].rep2_frac == round(1 - 1 / 3, 6)
    assert out[1].rep3_frac == round(1 - 1 / 2, 6)
    assert out[2].rep2_frac == 0.0 and out[2].rep3_frac == 0.0
    assert out[3].n_3grams == 0 and out[3].rep3_frac == 0.0


def test_contamination_overlap_planted_leak(spark):
    from salesdata_engineering_spark.ext.dedup import contamination_overlap

    held = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps over and more"),
            (2, "completely unrelated training document with no overlap here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in contamination_overlap(train, held, n=5).collect()}
    # doc 1 shares exactly 2 distinct 5-grams with the held-out doc
    assert set(out) == {1}
    assert out[1].n_shared_grams == 2 and out[1].n_held_docs == 1


def test_contamination_df_cap_drops_stop_grams(spark):
    from salesdata_engineering_spark.ext.dedup import contamination_overlap

    stop = "what is the name of"
    held = spark.createDataFrame(
        [(i, f"{stop} item{i}") for i in range(100, 105)],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(1, f"prefix {stop} suffix words here")], "doc_id long, text string"
    )
    hit = contamination_overlap(train, held, n=5).collect()
    assert len(hit) == 1  # the stop 5-gram matches all 5 held docs
    capped = contamination_overlap(train, held, n=5, df_cap=3).collect()
    assert capped == []  # gram present in >3 held docs dropped


def test_pack_sequences_invariants(spark):
    from salesdata_engineering_spark.ext.packing import pack_sequences

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), 37)).alias("text"),
    )
    out = pack_sequences(docs, budget=100, n_buckets=4).collect()
    assert sum(r.n_tokens for r in out) == 200 * 37  # every token packed once
    assert all(r.seq_id >= 0 for r in out)
    # start-offset binning bound: a straddling doc overfills its own
    # sequence and the next underfills — by less than one doc length
    # either way. So every non-last sequence holds > budget - doc_len
    # tokens (docs here are uniform 37 tokens).
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.seq_id)
        assert all(r.n_tokens > 100 - 37 for r in rows[:-1])
    # deterministic: re-run is identical
    again = pack_sequences(docs, budget=100, n_buckets=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_quantized_topk_recall_vs_brute_force(embs):
    """int8 quantization keeps enough signal that the exact re-rank of
    the top-20 quantized candidates recovers nearly every true top-5
    neighbor (quantization error ~0.4% per component at 8 bits)."""
    from salesdata_engineering_spark.ext.similarity import quantized_topk

    queries = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, queries, k=5).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in quantized_topk(embs, queries, k=5, m=20).collect()
    }
    recall = len(quant & exact) / len(exact)
    assert recall >= 0.9, f"quantized recall {recall:.2f} below 0.9"


def test_trained_ivf_recall_not_worse_than_sampled(embs):
    """Two Lloyd iterations must not hurt: recall of the trained index
    (same nprobe) is at least the sampled-centroid index's recall."""
    from salesdata_engineering_spark.ext.similarity import (
        ivf_ann_topk,
        ivf_train_centroids,
    )

    queries = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, queries, k=5).collect()
    }
    sampled = {
        (r.query_id, r.neighbor_id)
        for r in ivf_ann_topk(embs, queries, k=5, stride=50, nprobe=4).collect()
    }
    cents = ivf_train_centroids(embs, stride=50, iters=2)
    trained = {
        (r.query_id, r.neighbor_id)
        for r in ivf_ann_topk(
            embs, queries, k=5, stride=50, nprobe=4, centroids=cents
        ).collect()
    }
    r_sampled = len(sampled & exact) / len(exact)
    r_trained = len(trained & exact) / len(exact)
    assert r_trained >= r_sampled - 0.05, (
        f"training degraded recall: {r_trained:.2f} vs {r_sampled:.2f}"
    )


def test_split_assignment_stable_under_corpus_growth(docs, spark):
    """A document's split must not change when the corpus grows — the
    property that keeps eval sets uncontaminated across versions."""
    from salesdata_engineering_spark.ext.sampling import split_assignment

    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_assign = {
        r.doc_id: r.split for r in split_assignment(docs, "doc_id").collect()
    }
    half_assign = {
        r.doc_id: r.split for r in split_assignment(half, "doc_id").collect()
    }
    assert all(full_assign[d] == s for d, s in half_assign.items())
    counts = {}
    for s in full_assign.values():
        counts[s] = counts.get(s, 0) + 1
    n = len(full_assign)
    assert 0.85 <= counts.get("train", 0) / n <= 0.95, counts
    assert set(counts) <= {"train", "val", "test"}


def test_split_assignment_rounds_buckets_and_validates_fractions(docs, spark):
    """Bucket edges are ROUNDED cumulative fractions (int truncation of
    0.29*10000 -> 2899 undersized a split by a bucket — ADVICE r4), and
    fractions that do not sum to ~1.0 are rejected loudly instead of
    silently folding the gap into the last split."""
    import pytest as _pytest

    from salesdata_engineering_spark.ext.sampling import _BUCKETS, split_assignment

    # 0.29 is the canonical truncation trap: 0.29 * 10000 = 2899.9999...
    out = split_assignment(
        docs, "doc_id", splits=(("a", 0.29), ("b", 0.31), ("c", 0.40))
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count()
              .withColumnRenamed("count", "n").collect()}
    n = sum(counts.values())
    # with rounded edges the 'a' share can only deviate by sampling noise,
    # not by a systematically-missing bucket
    assert abs(counts.get("a", 0) / n - 0.29) < 0.05, counts
    assert round(0.29 * _BUCKETS) == 2900  # the edge the fix guarantees

    with _pytest.raises(ValueError, match="sum to 1.0"):
        split_assignment(docs, "doc_id", splits=(("train", 0.5), ("val", 0.3)))


def test_contamination_df_cap_drops_only_stop_grams(spark):
    """The df_cap stop-gram guard (the 100 TB skew story: grams like
    'what is the name of' match everything and only add noise) must drop
    exactly the grams above the held-doc-frequency cap and nothing else
    — previously a dead-until-needed code path with no coverage
    (VERDICT r4 item 5)."""
    from salesdata_engineering_spark.ext.dedup import (
        contamination_overlap,
        contamination_overlap_split,
    )

    held = [
        (100, "what is the name of alpha"),   # stop gram in 3 held docs
        (102, "what is the name of beta"),
        (104, "what is the name of gamma"),
        (106, "zephyr quill ember unique phrase"),  # rare gram, 1 held doc
    ]
    train = [
        (1, "what is the name of nothing else here"),  # stop grams only
        (3, "ask zephyr quill ember unique phrase today"),  # rare gram
    ]
    docs = spark.createDataFrame(held + train, ["doc_id", "text"])
    heldout = docs.filter(F.col("doc_id") >= 100)
    train_df = docs.filter(F.col("doc_id") < 100)

    def rows(df):
        return {r.doc_id: (r.n_shared_grams, r.n_held_docs) for r in df.collect()}

    uncapped = rows(contamination_overlap(train_df, heldout, n=5))
    # doc 1 shares 'what is the name of' (3 held docs); doc 3 shares the
    # 5-gram 'zephyr quill ember unique phrase' (1 held doc)
    assert uncapped == {1: (1, 3), 3: (1, 1)}

    capped = rows(contamination_overlap(train_df, heldout, n=5, df_cap=2))
    # the stop gram (held-doc frequency 3 > cap 2) is dropped, taking doc 1
    # with it; the rare gram (frequency 1) must be untouched
    assert capped == {3: (1, 1)}

    # the single-corpus fast path must honor the cap identically
    capped_split = rows(
        contamination_overlap_split(docs, F.col("doc_id") >= 100, n=5, df_cap=2)
    )
    assert capped_split == capped


def test_ivf_quantized_recall_close_to_ivf(spark, sf_dir):
    """Composing the quantized scan with IVF pruning may only lose
    recall through the quantized stage-1 boundary (m=20 candidates), so
    its recall vs brute force must stay close to plain IVF's."""
    from salesdata_engineering_spark.ext.similarity import (
        cosine_topk,
        ivf_ann_topk,
        ivf_quantized_topk,
    )

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    )
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    exact = pairs(cosine_topk(emb, qs, k=5))
    ivf = pairs(ivf_ann_topk(emb, qs, k=5))
    composed = pairs(ivf_quantized_topk(emb, qs, k=5, m=20))
    r_ivf = len(ivf & exact) / len(exact)
    r_comp = len(composed & exact) / len(exact)
    assert r_comp >= r_ivf - 0.05, f"composed {r_comp:.2f} vs ivf {r_ivf:.2f}"


def test_rebalance_sources_stable_under_other_source_growth(docs, spark):
    """A source's kept rows depend only on ITS OWN count/target — adding
    or removing documents in other sources must not move them (the
    property that makes the mixture reproducible while the crawl
    grows)."""
    from salesdata_engineering_spark.ext.sampling import rebalance_sources

    targets = {"src0": 10, "src1": 25}
    full = {
        r.doc_id
        for r in rebalance_sources(docs, targets, "doc_id").collect()
        if r.source == "src0"
    }
    shrunk_corpus = docs.filter(
        (F.col("source") != "src1") | (F.col("doc_id") % 2 == 0)
    )
    shrunk = {
        r.doc_id
        for r in rebalance_sources(shrunk_corpus, targets, "doc_id").collect()
        if r.source == "src0"
    }
    assert full == shrunk and full, "src0 membership moved with src1's size"


def test_shuffle_shards_positions_are_contiguous_and_stable(docs, spark):
    """pos must be a 0..n-1 permutation within each shard, and a doc's
    (shard, relative order) must be layout-independent: recomputing
    after a repartition yields the identical assignment."""
    from salesdata_engineering_spark.ext.sampling import shuffle_shards

    out = shuffle_shards(docs, 8, "doc_id").collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), f"shard {shard} has gaps"

    again = {
        (r.doc_id): (r.shard, r.pos)
        for r in shuffle_shards(docs.repartition(7), 8, "doc_id").collect()
    }
    assert again == {r.doc_id: (r.shard, r.pos) for r in out}


def test_shingles_and_gram_hashes_handle_unigrams(spark):
    """n=1 must degrade to per-token shingles/hashes instead of the
    IndexError the window-lead construction raised (review round 5)."""
    from salesdata_engineering_spark.ext.dedup import gram_hashes, word_shingles

    df = spark.createDataFrame([(1, "a b a"), (2, "c")], ["doc_id", "text"])
    sh = {(r.id, r.shingle) for r in word_shingles(df, "text", "doc_id", 1).collect()}
    assert sh == {(1, "a"), (1, "b"), (2, "c")}
    g = gram_hashes(df, "text", "doc_id", 1).groupBy("id").count().collect()
    assert {r.id: r["count"] for r in g} == {1: 2, 2: 1}


def test_pagerank_mass_conservation_and_determinism(spark):
    """Rank mass must stay ~1 (symmetric graph, no sinks) and the
    integer-picorank arithmetic must be layout-invariant: recomputing
    over a repartitioned edge list gives IDENTICAL ranks (the property
    the quantization exists for — double sums would drift)."""
    from salesdata_engineering_spark.ext.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"), ("a", "c")],
        ["src", "dst"],
    )
    out = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    again = {
        r.node: r.rank for r in pagerank(edges.repartition(5), iters=3).collect()
    }
    assert out == again


def test_pagerank_dangling_mass_redistributed(spark):
    """Graphs WITH sinks must still conserve rank mass: node 'c' has no
    out-edges, so without the dangling-redistribution term ~1/3 of the
    mass would leak per iteration (sum would drop toward ~0.5 by three
    rounds). The sink must also end up strictly ranked above its peers'
    teleport floor since it receives all of b's mass."""
    from salesdata_engineering_spark.ext.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"]
    )  # c is dangling
    out = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert out["c"] > out["a"]


def test_curriculum_sample_rates_scale_with_tile(spark):
    """Higher quality tiles must survive at higher rates, every kept row
    keeps its tile label, and the gate is deterministic across reruns."""
    from salesdata_engineering_spark.ext.sampling import curriculum_sample

    import pyspark.sql.functions as F

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100 / 100.0).alias("q")
    )
    kept = curriculum_sample(df, "q", "doc_id").collect()
    by_tile = {}
    for r in kept:
        by_tile.setdefault(r.tile, []).append(r.doc_id)
    # ~400 candidates per tile; keep rate k/10 => monotone counts
    counts = [len(by_tile.get(t, [])) for t in range(1, 11)]
    assert counts[0] < counts[4] < counts[9], counts
    assert len(by_tile.get(10, [])) > 350  # top tile keeps ~all
    again = curriculum_sample(df, "q", "doc_id").collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in kept}


def test_pq_adc_recall_vs_brute_force(spark, sf_dir):
    """PQ-ADC top-5 must recover a solid fraction of the true cosine
    top-5 (8 subspaces x 16 strided codes is a coarse index; the
    m_cand=20 exact re-rank is what buys the precision). Also pins the
    compression contract: 8 codes per vector, every code in [0, 16)."""
    from pyspark.sql import functions as F

    from salesdata_engineering_spark.ext.similarity import (
        cosine_topk,
        pq_adc_topk,
    )
    from salesdata_engineering_spark.datasets import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(emb, queries, k=5, m_cand=40, n_codes=64).collect()
    }
    recall = len(pq & exact) / len(exact)
    # measured 0.70 at sf0.01 with K=64/m_cand=40 (random vectors are
    # PQ's worst case — no cluster structure for the codebooks to fit)
    assert recall >= 0.5, f"PQ recall {recall:.2f} below 0.5"


def test_ivf_pq_matches_flat_pq_recall_floor(spark, sf_dir):
    """IVF-PQ gates the same ADC scan by probed cells, so it can only
    LOSE candidates that live in unprobed cells — recall vs exact must
    stay close to the flat scan's (measured: both 0.70 at sf0.01 with
    K=64/m_cand=40/nprobe=4; random vectors are PQ's worst case)."""
    from pyspark.sql import functions as F

    from salesdata_engineering_spark.datasets import load_tables
    import math

    from salesdata_engineering_spark.ext.similarity import (
        cosine_topk,
        ivf_pq_topk,
    )

    emb = load_tables(spark, sf_dir)["embeddings"].withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(
            emb, queries, k=5, m_cand=40, n_codes=64,
            stride=max(1, round(math.sqrt(emb.count()))), nprobe=4,
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.4, f"IVF-PQ recall {recall:.2f} below 0.4"


def test_pq_codebook_requires_dense_ids(spark):
    """Sparse/offset id spaces must fail LOUDLY: the strided codebook
    sample would silently shrink (or empty) and degrade the candidate
    set otherwise (ADVICE r6)."""
    import pytest
    from pyspark.sql import functions as F

    from salesdata_engineering_spark.ext.similarity import pq_adc_topk

    emb = spark.range(64).select(
        (F.col("id") * 1000 + 5).alias("vec_id"),  # offset + sparse
        F.expr(
            "transform(sequence(1, 64), i -> CAST(id * i AS DOUBLE))"
        ).alias("embedding"),
    )
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="dense 0-based"):
        pq_adc_topk(emb, q, k=2, n_codes=16)


def test_crossencoder_rerank_accepts_string_ids(spark):
    """The mapInPandas schema derives id types from the candidate
    frame — string-keyed candidate sets must score, not crash on a
    hardcoded `long` schema (ADVICE r6)."""
    from salesdata_engineering_spark.ext.similarity import (
        crossencoder_rerank_stub,
    )

    cand = spark.createDataFrame(
        [("qa", f"doc{i}") for i in range(6)] + [("qb", f"doc{i}") for i in range(6)],
        "query_id string, neighbor_id string",
    )
    out = crossencoder_rerank_stub(cand, k=3)
    rows = out.collect()
    assert len(rows) == 6
    assert {r.query_id for r in rows} == {"qa", "qb"}
    assert all(isinstance(r.neighbor_id, str) for r in rows)
    assert all(1 <= r.rk <= 3 for r in rows)


def test_bfs_levels_custom_column_names(spark):
    """bfs_levels must filter NULL endpoints on the CALLER's column
    names before renaming (ADVICE r6) — a NULL edge under non-default
    names must not re-enter the frontier each round."""
    from salesdata_engineering_spark.ext.graph import bfs_levels

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, None), (None, 3)],
        "from_node int, to_node int",
    )
    srcs = spark.createDataFrame([(1,)], "node int")
    got = {
        (r.node, r.level)
        for r in bfs_levels(
            edges, srcs, max_depth=3, src_col="from_node", dst_col="to_node"
        ).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2), (4, 3)}


def test_mixture_epochs_repeat_counts_and_whitelist(spark, sf_dir):
    """Every src0 doc appears 3 or 4 times (3.3 epochs), src1 exactly
    once, src2 at most once (0.4 -> down-sample), src3 exactly twice;
    non-whitelisted sources are dropped; epoch ids are contiguous from
    0; and the whole mixture is rerun-deterministic."""
    from collections import Counter

    from salesdata_engineering_spark.datasets import load_tables
    from salesdata_engineering_spark.ext.sampling import mixture_epochs

    docs = load_tables(spark, sf_dir)["documents"]
    e = {"src0": 3.3, "src1": 1.0, "src2": 0.4, "src3": 2.0}
    out = mixture_epochs(docs, e, "doc_id").select("doc_id", "source", "epoch")
    rows = out.collect()
    assert {r.source for r in rows} == set(e)
    per_doc = Counter((r.source, r.doc_id) for r in rows)
    bounds = {"src0": (3, 4), "src1": (1, 1), "src2": (1, 1), "src3": (2, 2)}
    for (src, _doc), n in per_doc.items():
        lo, hi = bounds[src]
        assert lo <= n <= hi, (src, n)
    # fractional epochs actually split: some src0 docs got the 4th copy
    src0 = [n for (s, _d), n in per_doc.items() if s == "src0"]
    assert min(src0) == 3 and max(src0) == 4
    # epochs contiguous from 0 per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r.source, r.doc_id), []).append(r.epoch)
    for eps in by_doc.values():
        assert sorted(eps) == list(range(len(eps)))
    again = mixture_epochs(docs, e, "doc_id").select("doc_id", "source", "epoch")
    assert set(rows) == set(again.collect())


def test_global_row_number_equals_naive_window(spark, sf_dir):
    """The two-pass offset scheme must produce EXACTLY the naive global
    row_number for a total order — including across partition
    boundaries (the offset arithmetic is the part under test)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from salesdata_engineering_spark.datasets import load_tables
    from salesdata_engineering_spark.ops.sorts import global_row_number

    o = load_tables(spark, sf_dir)["orders"].select("o_orderkey", "o_orderdate")
    got = {
        r.o_orderkey: r.rn
        for r in global_row_number(
            o, [F.col("o_orderdate"), F.col("o_orderkey")], n_parts=7
        ).collect()
    }
    naive = {
        r.o_orderkey: r.rn
        for r in o.withColumn(
            "rn", F.row_number().over(Window.orderBy("o_orderdate", "o_orderkey"))
        ).collect()
    }
    assert got == naive


def test_pca_power_iteration_improves_rayleigh_quotient(spark, sf_dir, embs):
    """The returned direction must be unit-norm and explain MORE
    variance (Rayleigh quotient vᵀCv) than the uniform start — power
    iteration increases the quotient monotonically, so a wiring bug
    (wrong centering, transposed accumulate, bad normalize) shows up
    as a flat or decreased quotient."""
    import numpy as np

    from salesdata_engineering_spark.ext.similarity import pca_top_component

    out = pca_top_component(embs, iters=2, dim=64).collect()
    v = np.array([r.loading for r in sorted(out, key=lambda r: r.pos)])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    x = np.array(
        [r.embedding for r in embs.select("embedding").collect()], dtype=float
    )
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc
    v0 = np.full(64, 1 / 8.0)
    rq = lambda u: float(u @ cov @ u) / float(u @ u)
    assert rq(v) > rq(v0) * 1.02, (rq(v), rq(v0))


def test_triangle_counts_planted_cliques(spark):
    """A triangle, a triangle-free square, and a 4-clique: per-node
    counts must be 1 for triangle corners, absent for the square, and
    3 for each 4-clique member (C(3,2) triangles through each)."""
    from salesdata_engineering_spark.ext.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)]
        + [(10, 11), (11, 12), (12, 13), (10, 13)]
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)],
        "x int, y int",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges, "x", "y").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 20: 3, 21: 3, 22: 3, 23: 3}


def test_attribution_shares_conserve_and_position(spark):
    """Hand-built journey: 4 touches before one 100.00 purchase must
    split 40/[10,10]/40 (micro-cent integer divisions); a single-touch
    journey gets 100%; a touch AFTER the purchase gets nothing."""
    import datetime

    from salesdata_engineering_spark.registry import QUERIES  # noqa: F401
    from salesdata_engineering_spark.ops.interval import interval_join
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def ts(d, h=0):
        return datetime.datetime(2024, 1, d, 10 + h)

    events = spark.createDataFrame(
        [
            # user 1: view,click,view,click -> purchase 100.00
            (1, 1, "view", ts(1), 0.0),
            (2, 1, "click", ts(2), 0.0),
            (3, 1, "view", ts(3), 0.0),
            (4, 1, "click", ts(4), 0.0),
            (5, 1, "purchase", ts(5), 100.0),
            # user 2: one view -> purchase 50.00; later view ignored
            (6, 2, "view", ts(1), 0.0),
            (7, 2, "purchase", ts(2), 50.0),
            (8, 2, "view", ts(3), 0.0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    touches = events.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        (F.col("value").cast("decimal(12,2)") * 1000000).cast("bigint").alias("_mc"),
    )
    pairs = interval_join(
        touches, purch, ["user_id"], "touch_ts", "purchase_ts", "7 days"
    )
    w = Window.partitionBy("purchase_id").orderBy("touch_ts", "touch_id")
    wn = Window.partitionBy("purchase_id")
    rk = pairs.select(
        "channel", "touch_id", "_mc",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wn).alias("_n"),
    )
    share = (
        F.when(F.col("_n") == 1, F.col("_mc"))
        .when((F.col("_n") == 2) & (F.col("_rn") == 1), F.expr("_mc div 2"))
        .when(F.col("_n") == 2, F.col("_mc") - F.expr("_mc div 2"))
        .when((F.col("_rn") == 1) | (F.col("_rn") == F.col("_n")), F.expr("(_mc * 2) div 5"))
        .otherwise(F.expr("(_mc div 5) div (_n - 2)"))
    )
    got = {r.touch_id: r.s for r in rk.select("touch_id", share.alias("s")).collect()}
    # 100.00 -> 40.00 / 10.00 / 10.00 / 40.00 in micro-cents
    assert got[1] == 40_000_000 and got[4] == 40_000_000
    assert got[2] == 10_000_000 and got[3] == 10_000_000
    assert got[6] == 50_000_000  # single touch gets all of 50.00
    assert 8 not in got  # touch after the purchase never pairs


def test_negative_pairs_never_self_and_deterministic(spark, sf_dir):
    """No sampled negative may equal its anchor; ids must exist in the
    corpus; per-anchor count is exactly k; different salts give
    different (independent) pair sets; same salt reproduces exactly."""
    from salesdata_engineering_spark.datasets import load_tables
    from salesdata_engineering_spark.ext.sampling import negative_pair_sample

    docs = load_tables(spark, sf_dir)["documents"]
    out = negative_pair_sample(docs, "doc_id", k=3).collect()
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert all(r.neg_id != r.anchor_id for r in out)
    assert all(r.neg_id in ids for r in out)
    from collections import Counter

    per_anchor = Counter(r.anchor_id for r in out)
    assert set(per_anchor.values()) == {3}
    again = {(r.anchor_id, r.j, r.neg_id) for r in negative_pair_sample(docs, "doc_id", k=3).collect()}
    assert {(r.anchor_id, r.j, r.neg_id) for r in out} == again
    other = {(r.anchor_id, r.j, r.neg_id) for r in negative_pair_sample(docs, "doc_id", k=3, salt="neg2").collect()}
    assert other != again


def test_global_cumsum_equals_naive_window(spark, sf_dir):
    """Two-pass cumulative sum must equal the naive global running sum
    for a total order — offsets across range-partition boundaries are
    the part under test."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from salesdata_engineering_spark.datasets import load_tables
    from salesdata_engineering_spark.ops.sorts import global_cumsum

    h = (
        load_tables(spark, sf_dir)["lineitem"]
        .groupBy("l_extendedprice")
        .agg(F.count("*").alias("c"))
    )
    got = {
        r.l_extendedprice: r.cum
        for r in global_cumsum(
            h, ["l_extendedprice"], "c", n_parts=7, persist_key="t_cum"
        ).collect()
    }
    w = Window.orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = {
        r.l_extendedprice: r.cum
        for r in h.withColumn("cum", F.sum("c").over(w)).collect()
    }
    assert got == naive


def test_prefix_filter_jaccard_equals_full_index(spark, sf_dir):
    """The PPJoin prefix filter must be LOSSLESS: the prefix-indexed
    candidate join plus exact verification returns exactly the pairs
    the full inverted-index operator returns at the same threshold —
    and its candidate set is no larger (strictly smaller on any corpus
    with hot shingles)."""
    from salesdata_engineering_spark.ext.dedup import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )
    from salesdata_engineering_spark.datasets import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    full = {
        (r.id_a, r.id_b, r.n_inter, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect()
    }
    pfx = {
        (r.id_a, r.id_b, r.n_inter, r.jaccard)
        for r in jaccard_prefix_filter_pairs(docs, n=3).collect()
    }
    assert pfx == full
    assert len(full) > 0  # the corpus plants near-dups; empty = broken


def test_asof_nearest_tie_semantics(spark):
    """Exact-timestamp and equidistant ties must resolve BACKWARD —
    the corpus has no microsecond collisions, so the rule is pinned
    here on synthetic rows: a right row AT the left's timestamp beats
    strictly-earlier/later ones, an equidistant pair picks the earlier
    side, and a key with rights on only one side still matches."""
    import datetime as dt

    from salesdata_engineering_spark.ops.asof import asof_nearest_join

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ts(seconds):
        return t0 + dt.timedelta(seconds=seconds)

    left = spark.createDataFrame(
        [(1, 100, ts(0)), (2, 200, ts(0)), (3, 300, ts(0))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            # user 1: exact-ts match plus both-side decoys
            (1, 11, ts(-10), 1.0),
            (1, 12, ts(0), 2.0),
            (1, 13, ts(5), 3.0),
            # user 2: equidistant pair -> backward wins
            (2, 21, ts(-7), 4.0),
            (2, 22, ts(7), 5.0),
            # user 3: forward-only
            (3, 31, ts(9), 6.0),
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = {
        r.user_id: (r.ts_matched, r.value_matched, r.direction)
        for r in asof_nearest_join(
            left.select("user_id", "event_id", "ts"),
            right.select("user_id", "event_id", "ts", "value"),
            keys=["user_id"],
            ts="ts",
            payload=["value"],
            tiebreak="event_id",
        ).collect()
    }
    assert out[1] == (ts(0), 2.0, "backward")
    assert out[2] == (ts(-7), 4.0, "backward")
    assert out[3] == (ts(9), 6.0, "forward")


def test_jl_projection_audit_discriminates(spark, sf_dir):
    """The JL audit must return a positive but clearly imperfect
    correlation at k=16 — if it ever reads ~1.0 the audit stopped
    measuring distortion, if <=0 the projection machinery broke."""
    from salesdata_engineering_spark.registry import QUERIES

    row = QUERIES["sim_jl_projection_eval"].fn(spark, sf_dir).collect()[0]
    assert 0.1 < row.distance_corr < 0.95, row
    assert row.mean_scale > 0, row
