"""Persisted IVF-PQ index (ext/ann_index.py): build/serve split.

The registered ``sim_ivf_pq_index_serve`` entry is oracle-checked by
test_oracle_parity like everything else; these tests pin the properties
the oracle can't see — cache reuse, fingerprint keying, and the
crash-safe publication swap.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import salesdata_engineering_spark.registry  # noqa: F401  (import-order anchor)
from salesdata_engineering_spark.ext.ann_index import (
    build_ivf_pq_index,
    corpus_fingerprint,
    ensure_ivf_pq_index,
    search_ivf_pq_index,
)
from salesdata_engineering_spark.ext.similarity import ivf_pq_topk
from salesdata_engineering_spark.registry_ext import (
    _embs,
    _ivf_stride,
    _queries_subset,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    emb = _embs(spark, sf_dir)
    return emb.withColumn("embedding", F.col("embedding").cast("array<double>"))


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("query_id", "rk").collect()]


def test_persisted_index_serves_identical_results(spark, sf_dir, corpus, tmp_path):
    n = corpus.count()
    stride = _ivf_stride(corpus, n)
    q = _queries_subset(corpus)
    ref = ivf_pq_topk(
        corpus, q, k=5, m_cand=40, n_codes=64,
        stride=stride, nprobe=4, corpus_count=n,
    )
    idx = build_ivf_pq_index(
        spark, corpus, str(tmp_path / "idx"),
        stride=stride, n_codes=64, corpus_count=n,
    )
    got = search_ivf_pq_index(spark, idx, corpus, q, k=5, m_cand=40, nprobe=4)
    assert _sorted_rows(got) == _sorted_rows(ref)


def test_ensure_reuses_published_index(spark, sf_dir, corpus, tmp_path):
    n = corpus.count()
    kw = dict(stride=_ivf_stride(corpus, n), n_codes=64, corpus_count=n)
    root = str(tmp_path / "cache")
    idx1 = ensure_ivf_pq_index(spark, corpus, sf_dir, root, **kw)
    stamp = os.path.getmtime(os.path.join(idx1, "codes"))
    idx2 = ensure_ivf_pq_index(spark, corpus, sf_dir, root, **kw)
    assert idx2 == idx1
    assert os.path.getmtime(os.path.join(idx1, "codes")) == stamp  # no rebuild
    # different build parameters key a DIFFERENT index directory
    kw2 = dict(kw, n_codes=16)
    idx3 = ensure_ivf_pq_index(spark, corpus, sf_dir, root, **kw2)
    assert idx3 != idx1


def test_fingerprint_tracks_file_metadata(sf_dir, tmp_path):
    fp1 = corpus_fingerprint(sf_dir)
    assert fp1 == corpus_fingerprint(sf_dir)  # stable
    # a different directory inventory yields a different key
    other = tmp_path / "embeddings.parquet"
    other.write_bytes(b"x")
    assert corpus_fingerprint(str(tmp_path)) != fp1


def test_build_republishes_over_leftover_new_dir(spark, sf_dir, corpus, tmp_path):
    """A crashed previous build leaves <dir>.new; the next build must
    clean it up and still publish atomically."""
    n = corpus.count()
    target = str(tmp_path / "idx")
    os.makedirs(f"{target}.new/codes", exist_ok=True)  # simulated debris
    idx = build_ivf_pq_index(
        spark, corpus, target,
        stride=_ivf_stride(corpus, n), n_codes=64, corpus_count=n,
    )
    assert os.path.isdir(os.path.join(idx, "codes"))
    assert not os.path.exists(f"{target}.new")
