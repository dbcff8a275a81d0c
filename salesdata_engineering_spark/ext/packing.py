"""Sequence packing: assemble documents into fixed token-budget
training sequences (north-star extension; no reference counterpart —
the reference stops at mart tables, a training pipeline must also emit
trainer-ready batches).

Exact first-fit-decreasing bin packing is inherently sequential, so at
scale every real pipeline uses STREAM packing: fix a deterministic
document order, walk it, and cut a new sequence whenever the running
token count passes the budget. Expressed relationally that is one
window cumulative sum — no driver loop, no UDF:

    bucket   = hash(doc) % n_buckets      (independent parallel streams)
    cum      = sum(tokens) over (bucket order by hash)  - tokens
    seq_id   = floor(cum / budget)

Each bucket packs independently (one narrow shuffle on bucket); the
hash order is reproducible across engines and reruns, unlike any
``monotonically_increasing_id``/``zipWithIndex`` scheme. Documents are
binned by the WINDOW OF THEIR STARTING OFFSET, so a document straddling
a budget boundary overfills its sequence and the next one underfills —
each bounded by one document length (the strict "close when over"
cascade is a sequential recurrence; the windowed form is the price of
expressing packing as one parallel window function, and the fill
deviation is the same ±1 doc). A document longer than the budget spans
multiple windows and owns its sequence (oversized docs are chunked
upstream — see text.chunk_documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_long
from .text import tokens


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign every document to a (bucket, seq_id) training sequence and
    return per-sequence stats: document count, token count, fill ratio.

    Id-less rows are NOT packed (nullkeys+layout composite, r13): the
    bucket and the within-bucket order both derive from the id hash, so
    every NULL-id row lands in the NULL bucket with a fully-tied
    (NULL, NULL) sort key — and the running prefix sum over tied rows
    with DIFFERENT token counts depends on scan order, i.e. the packing
    would change across cluster layouts. Mirrored by ``id IS NOT NULL``
    in the paired oracle; free on contract data.
    """
    df = df.filter(F.col(id_col).isNotNull())
    base = df.select(
        F.col(id_col).alias("id"),
        md5_long(F.col(id_col).cast("string")).alias("_h"),
        F.size(tokens(text_col)).alias("n_tok"),
    ).withColumn("bucket", F.pmod("_h", F.lit(n_buckets)))
    # explicit ROWS frame: the default RANGE frame sums ORDER-BY *peers*
    # together, so duplicated (h, id) rows — legitimate multiset input,
    # each copy packed on its own — would each see BOTH copies' tokens
    # in their running sum where the oracle's ROWS frame sees one
    # (bug class 9). Identical on unique keys; deterministic on
    # duplicates because tied rows are value-identical.
    w = Window.partitionBy("bucket").orderBy("_h", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    assigned = base.withColumn(
        "_cum_before", F.sum("n_tok").over(w) - F.col("n_tok")
    ).withColumn("seq_id", F.floor(F.col("_cum_before") / F.lit(float(budget))))
    return (
        assigned.groupBy("bucket", "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .withColumn("fill_ratio", F.round(F.col("n_tokens") / F.lit(budget), 4))
    )
