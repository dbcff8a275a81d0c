"""Deterministic sampling — the reproducible kind a training-data
pipeline needs (engine extension; the reference has no sampling).

``df.sample()`` draws from per-partition RNG streams: resampling after
a repartition, a retry, or at a different parallelism yields a
DIFFERENT subset, and no other engine can reproduce it. Hash-gating on
a stable id fixes all of that: membership is a pure function of the
row, so the sample is identical across reruns, engines (the DuckDB
oracle mirrors the same md5 arithmetic), cluster sizes, and data
layout — and it composes (a 10% sample of a 50% sample is a 5%
sample when the gates use disjoint salt).

Both ops are narrow or single-shuffle: ``hash_sample`` is a pure
filter pushed at the scan (no shuffle at any scale); ``stratified_sample``
is one window over the strata keys — same shuffle as any per-class
top-N.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import md5_long

#: gate resolution: rate quantized to 1/10000ths
_BUCKETS = 10_000


def _gate(id_col: Column, salt: str) -> Column:
    return F.pmod(md5_long(id_col.cast("string"), salt), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keeps a row iff
    md5(salt:id) lands under ``rate``. Pure filter — no RNG state, no
    shuffle; different ``salt`` values give independent samples."""
    return df.filter(_gate(F.col(id_col), salt) < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    id_col: str,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic n-per-class sample: the ``n_per_stratum`` rows with
    the smallest hash per stratum (a reproducible 'random' order). The
    standard class-balancing primitive for training mixes.

    Id-less rows are NOT members (nullkeys axis, r13): sample
    membership is a pure function of the id, and a NULL id has no
    hash — without the explicit exclusion they would sort NULLS FIRST
    into every stratum's head in Spark (and tie among themselves, an
    arbitrary-survivor pick). Mirrored by ``id IS NOT NULL`` in the
    paired oracles; free on contract data."""
    w = Window.partitionBy(*strata).orderBy(_gate(F.col(id_col), salt), id_col)
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("_srk", F.row_number().over(w))
        .filter(F.col("_srk") <= n_per_stratum)
        .drop("_srk")
    )


def split_assignment(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one ``split`` column.

    The hash gate partitions the id space into contiguous bucket
    ranges sized by the split fractions — a row's split is a pure
    function of (salt, id), so the SAME document lands in the SAME
    split across reruns, engines, cluster sizes, and even dataset
    versions (adding documents never moves an existing one between
    splits — the property that keeps eval sets uncontaminated as a
    corpus grows). Pure projection: no shuffle at any scale.

    Fractions must sum to ~1.0 (validated): bucket edges are rounded
    CUMULATIVE fractions, so per-split float error never compounds
    (``int(0.29 * 10_000) == 2899`` truncation undersized a split by a
    whole bucket — review round 4). Any sub-bucket remainder from
    rounding folds into the LAST split — that is the documented
    remainder rule, pinned by the ``otherwise`` branch."""
    total = sum(frac for _, frac in splits)
    if abs(total - 1.0) > 1e-6:
        raise ValueError(
            f"split fractions must sum to 1.0 (got {total!r}): "
            f"{[(n, f) for n, f in splits]}"
        )
    gate = _gate(F.col(id_col), salt)
    expr = None
    acc_frac = 0.0
    for name, frac in splits:
        acc_frac += frac
        cond = gate < round(acc_frac * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(splits[-1][0]))


def rebalance_sources(
    df: DataFrame,
    targets: dict[str, int],
    id_col: str,
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic source-mix rebalancing: down-sample each source to
    ~its target row count (the data-mixture step of a training
    pipeline — cap the over-represented crawl, keep the curated set).

    Per-source keep rate = min(1, target / count); membership is the
    same hash gate as :func:`hash_sample` (pure function of (salt, id),
    so the subset is stable across reruns/engines/layout and a source's
    kept rows never change when OTHER sources grow). Sources absent
    from ``targets`` are dropped — the mixture is a whitelist. Expected
    (not exact) target counts: the gate quantizes to 1/10000ths — the
    shuffle-free trade; for exact-n use rank-based
    :func:`stratified_sample`.

    Scale shape: one tiny counts aggregate broadcast back onto the
    corpus; the corpus itself never shuffles (filter + broadcast join
    only), so this runs at 100 TB for the cost of one scan."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    tmap = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )
    tgt = tmap[F.col(source_col)]
    # guard the whitelist drop explicitly: least() SKIPS nulls (a missing
    # source would silently get rate 1.0 and survive the mixture)
    rates = counts.select(
        source_col,
        F.when(
            tgt.isNotNull(), F.least(F.lit(1.0), tgt / F.col("_n"))
        ).alias("_rate"),
    ).filter(F.col("_rate").isNotNull())
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(_gate(F.col(id_col), salt) < F.col("_rate") * _BUCKETS)
        .drop("_rate")
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    export: (id, shard, pos) where ``shard`` is a uniform hash bucket
    and ``pos`` is the row's position within its shard in hash order —
    the reproducible twin of 'shuffle the corpus and split into N
    files' (an epoch-0 training order any engine can re-derive; no RNG
    state, no layout dependence).

    Scale shape: one shuffle keyed by shard (uniform by construction —
    no skew), then a within-shard sort for positions; pick ``n_shards``
    so one shard's keys sort in executor memory (at 100 TB that is
    simply more shards, not more machinery). The downstream writer maps
    one shard to one output file: ``df.repartition('shard')`` +
    ``partitionBy('shard')`` or ``bucketBy``."""
    key = md5_long(F.col(id_col).cast("string"), salt)
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return (
        df.select(F.col(id_col), key.alias("_k"))
        .withColumn("shard", F.pmod(F.col("_k"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


def curriculum_sample(
    df: DataFrame,
    quality_col: str,
    id_col: str,
    n_tiles: int = 10,
    salt: str = "curriculum",
) -> DataFrame:
    """Quality-weighted curriculum sampling: bucket documents into
    ``n_tiles`` quality tiles and keep tile ``k`` at rate ``k/n_tiles``
    — the top tile survives whole, the bottom tile is decimated. The
    quality-resampling mix (CCNet buckets / DoReMi-style reweighting)
    that up-weights high-quality text without hard-dropping the tail.

    Tile boundaries are EXACT interpolated percentiles of the quality
    column, rounded to 9 decimals: quality scores live on a 6-decimal
    grid, so the rounded thresholds either coincide with a grid value
    exactly or sit >= 1e-9 - 1e-6 away from every score — either way
    the strict ``>`` comparison is unambiguous cross-engine (raw
    interpolated doubles could differ in the last ulp between engines'
    interpolation formulas). Membership within a tile is the same
    hash gate as every sampler here: deterministic, layout-free,
    composable by salt.

    Scale shape: one aggregate produces the (n_tiles-1)-element
    threshold array (exact percentile sorts internally — swap in
    approx_percentile at 100 TB, same plan shape), broadcast to a pure
    projection+filter over the corpus. No shuffle of document rows at
    any scale.

    ``n_tiles`` must be >= 2 (one tile has no thresholds to compute)
    and divide the gate's bucket resolution evenly — otherwise the
    truncated per-tile rate silently under-keeps the top tile (e.g.
    n_tiles=3 would keep it at 3·3333/10000 = 99.99%, not 100%)."""
    if n_tiles < 2 or _BUCKETS % n_tiles != 0:
        raise ValueError(
            f"n_tiles must be >= 2 and divide {_BUCKETS} evenly, got {n_tiles}"
        )
    probs = ", ".join(str(i / n_tiles) for i in range(1, n_tiles))
    th = df.agg(
        F.expr(
            f"transform(percentile({quality_col}, array({probs})), x -> round(x, 9))"
        ).alias("_th")
    )
    tile = F.lit(1)
    for i in range(n_tiles - 1):
        tile = tile + (F.col(quality_col) > F.col("_th")[i]).cast("int")
    per_tile = _BUCKETS // n_tiles
    return (
        df.crossJoin(F.broadcast(th))
        .withColumn("tile", tile)
        .filter(_gate(F.col(id_col), salt) < F.col("tile") * per_tile)
        .drop("_th")
    )


def mixture_epochs(
    df: DataFrame,
    epochs: dict[str, float],
    id_col: str,
    source_col: str = "source",
    salt: str = "epochs",
) -> DataFrame:
    """Deterministic fractional-epoch UPsampling: the mixture-weighting
    step of a training pipeline where curated sources REPEAT (wiki
    ×3.3, books ×2) while bulk crawl stays ×1 or below —
    :func:`rebalance_sources` only caps, this one multiplies.

    A row of source s appears ``floor(e_s)`` times, plus once more iff
    its hash gate lands under ``frac(e_s)`` — so expected source volume
    is n_s·e_s (gate quantized to 1/10000ths) and WHICH rows get the
    extra repeat is a pure function of (salt, id): stable across
    reruns, engines, layout, and task retries, and independent per
    salt. The ``epoch`` output column (0..reps−1) keeps the copies
    distinguishable so shard shuffling can spread a document's repeats
    across training order instead of packing them back to back.
    Sources absent from ``epochs`` are dropped (whitelist — same
    contract as :func:`rebalance_sources`). e_s < 1 degrades to plain
    hash down-sampling.

    Scale shape: a literal CASE map + one gate comparison + one
    explode — purely narrow, no shuffle, no RNG state; the corpus is
    read once and rows fan out in place."""
    e_whole: Column | None = None
    e_fb: Column | None = None
    for s, e in epochs.items():
        if e < 0:
            raise ValueError(f"negative epochs for source {s!r}: {e}")
        w, fb = int(e), int(round((e - int(e)) * _BUCKETS))
        e_whole = (F.when(F.col(source_col) == s, w) if e_whole is None
                   else e_whole.when(F.col(source_col) == s, w))
        e_fb = (F.when(F.col(source_col) == s, fb) if e_fb is None
                else e_fb.when(F.col(source_col) == s, fb))
    # id-less rows are not members (nullkeys axis, r13): a NULL id has
    # no gate, so `whole + NULL` reps silently dropped them in Spark
    # while a CASE-based oracle emitted `whole` copies — the exclusion
    # is now explicit and mirrored as `id IS NOT NULL` in the oracles
    reps = e_whole + (_gate(F.col(id_col), salt) < e_fb).cast("int")
    out = (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("_reps", reps)
        .filter(F.col("_reps") > 0)
    )
    return (
        out.withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_reps") - 1)))
        .drop("_reps")
    )


def negative_pair_sample(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    salt: str = "neg",
    payload: Sequence[str] = (),
    auto_rekey: bool = False,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor row, ``k`` pseudo-random OTHER rows drawn uniformly
    (with replacement) from the corpus — the (anchor, negative) pair
    generator behind embedding-model and reranker training sets.

    neg(anchor, j) = md5(salt:anchor:j) mod N, with the self-collision
    deterministically rejected to (neg+1) mod N. A pure function of
    (salt, anchor, j): the same pairs on every rerun, engine, layout,
    and cluster size, and independent pair sets per salt. Requires a
    dense 0-based integer id space (same contract as the PQ codebook
    sampler — the modulus IS the id map). ``payload`` columns are
    joined back from the corpus for the sampled negatives, which also
    proves each drawn id exists.

    Scale shape: one tiny stats aggregate broadcast onto the corpus, a
    k-way explode, and (with payload) one id-equi-join — no shuffle
    beyond that join, no RNG state."""
    if k < 1:
        # Spark's sequence(0, k-1) would auto-step DOWNWARD for k<=0
        # and emit [0, -1] per anchor instead of nothing
        raise ValueError(f"negative_pair_sample: k must be >= 1, got {k}")
    if auto_rekey:
        # opt-in lift of the dense-id precondition (VERDICT r11 item
        # 1): re-key to dense 0-based ids over ascending original id
        # (ops/sorts.py rekey_dense — the remedy the error below
        # prescribes), draw negatives in the dense space (the pair set
        # is a deterministic function of the rekey order), map both
        # sides of every pair back to original ids. The two id-equi-
        # joins are hash-partitioned and 100 TB-parallel; no broadcast
        # of the corpus-sized mapping anywhere.
        from ..ops.sorts import rekey_dense

        orig = f"_orig_{id_col}"
        df2 = rekey_dense(
            df, id_col, orig_alias=orig,
            persist_key="rekey_dense:negative_pair_sample",
        )
        mapping = df2.select(id_col, orig)
        res = negative_pair_sample(
            df2.drop(orig), id_col, k=k, salt=salt, payload=payload
        )
        amap = mapping.select(
            F.col(id_col).alias("anchor_id"), F.col(orig).alias("_a_orig")
        )
        nmap = mapping.select(
            F.col(id_col).alias("neg_id"), F.col(orig).alias("_n_orig")
        )
        return (
            res.join(amap, "anchor_id")
            .join(nmap, "neg_id")
            .select(
                F.col("_a_orig").alias("anchor_id"),
                "j",
                F.col("_n_orig").alias("neg_id"),
                *payload,
            )
        )
    # dense-id precondition asserted loudly (same contract — and same
    # silent-corruption failure mode — as the PQ codebook sampler): on
    # sparse/offset ids the modulus draws ids that don't exist, so the
    # payload join silently under-delivers negatives per anchor. The
    # distinct count closes the duplicate-with-gap loophole (ids
    # [0,1,1,3] have min=0, max=n-1, count=n but are NOT dense), and
    # the dtype check rejects fractional id columns the min/max/count
    # arithmetic cannot see.
    from pyspark.sql import types as T

    if not isinstance(
        df.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    ):
        raise ValueError(
            f"negative_pair_sample: '{id_col}' must be an integral "
            f"column, got {df.schema[id_col].dataType.simpleString()}"
        )
    lo, hi, n, nd = df.agg(
        F.min(id_col), F.max(id_col), F.count("*"), F.countDistinct(id_col)
    ).first()
    if lo != 0 or hi != n - 1 or nd != n:
        raise ValueError(
            f"negative_pair_sample: '{id_col}' must be a dense 0-based "
            f"integer id space (ids 0..N-1); got min={lo}, max={hi}, "
            f"count={n}, distinct={nd}. Re-key the corpus first, e.g. "
            "with a row_number over a deterministic order."
        )
    # n is a concrete int here — embedding it as a literal avoids a
    # SECOND corpus-count aggregate riding the plan via a crossJoin
    expanded = df.select(F.col(id_col).alias("anchor_id")).withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    h = md5_long(
        F.concat(
            F.col("anchor_id").cast("string"), F.lit(":"), F.col("j").cast("string")
        ),
        salt,
    )
    cand = F.pmod(h, F.lit(n))
    neg = F.when(cand == F.col("anchor_id"), F.pmod(cand + 1, F.lit(n))).otherwise(
        cand
    )
    out = expanded.select("anchor_id", "j", neg.alias("neg_id"))
    if payload:
        right = df.select(F.col(id_col).alias("neg_id"), *payload)
        out = out.join(right, "neg_id").select("anchor_id", "j", "neg_id", *payload)
    return out
