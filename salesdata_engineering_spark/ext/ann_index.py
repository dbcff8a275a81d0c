"""Persisted IVF-PQ index: build once, serve many.

Every composed-ANN query in this engine (``ivf_quantized_topk``,
``ivf_pq_topk``) rebuilds its index — centroids, cell assignment, PQ
codebooks, corpus codes — inside the query, so the benched wall time is
dominated by index CONSTRUCTION, not search (classified in
PERF_NOTES.md).  A production deployment does neither: it builds the
index once, persists it next to the corpus, and serves every query
against the persisted artifact.  This module is that split.

Layout on disk (all vanilla parquet, so the index lives wherever the
corpus lives — local FS here, an object store on a cluster):

* ``<dir>/centroids``  — (cid, _cvec, _cn): the IVF centroids with
  their norms (~√N of them, capped at a constant beyond 128² vectors —
  see registry_ext._IVF_MAX_CELLS — so the build stays linear).  Tiny;
  broadcast at serve time.
* ``<dir>/codebooks``  — (s, c, _cchunk, _cc): the PQ codebooks
  (n_sub·n_codes rows).  Tiny; broadcast at serve time.
* ``<dir>/codes``      — (id, s, code) **partitioned by cid**: the
  inverted file.  Partitioning by cell is the point: a query probing
  ``nprobe`` of the cells pushes ``cid IN (...)`` into the scan as a
  PARTITION filter, so serving reads only the probed posting lists —
  ~nprobe/n_cells of the index (shrinking with the corpus up to the
  cell cap, constant ~3% beyond it).
* ``<dir>/meta``       — one-row parquet recording the build parameters
  (dim, n_sub, n_codes, stride, corpus count); serve-time mismatches
  raise instead of silently searching a differently-shaped index.

Publication is crash-safe the same way ``ops/layout.compact_parquet_dir``
swaps: build into ``<dir>.new``, then one FileSystem rename — readers
either see the old complete index or the new complete index, never a
half-written one.

Determinism: the build re-uses the exact machinery of the in-query
composed ANN (strided centroids, cc − 2·dot argmin encode with integer
picounits, lowest-code ties), and doubles round-trip parquet exactly, so
a search over the persisted index returns bit-identical results to
``ivf_pq_topk`` on the same corpus — the same DuckDB oracle covers both.

Reference parity: the reference has no ANN at all; this extends the X2
similarity family (SURVEY §2.12) with the serving-side shape the round-6
verdict asked the round-7 composed ANN to grow into.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ops.partitioning import spread as _spread
from .similarity import (
    _assign_cells,
    _exact_rerank,
    _local_centroids,
    _pq_chunks_expr,
    _pq_codebooks,
    _pq_encode,
    _pq_query_tables,
    norm_fold,
)


def build_ivf_pq_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    *,
    stride: int,
    n_sub: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
) -> str:
    """Build and atomically publish an IVF-PQ index for ``corpus``.

    Exactly the stage-0/stage-1 work of :func:`ext.similarity.ivf_pq_topk`
    (strided centroids → cell assignment → strided codebooks → argmin
    PQ encode), materialized instead of consumed: the coded inverted
    file is written partitioned by ``cid`` so serve-time cell probes
    become partition pruning.  Returns ``index_dir``.
    """
    from ..fsops import _fs_and_path

    n = corpus.count() if corpus_count is None else corpus_count
    centroids = corpus.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("_cvec")
    )
    # collected local relation (r15, see similarity._local_broadcast):
    # the cell assignment references cents and the centroids parquet
    # write below reads the same sample — collecting once means the
    # strided-centroid corpus scan runs exactly once per build
    cents = _local_centroids(centroids, dim)
    cells = _assign_cells(
        _spread(corpus).select(id_col, vec_col), cents, id_col, 1, vec_col, dim
    )
    chunks = _pq_chunks_expr(n_sub, dim // n_sub)
    cents_b = _pq_codebooks(corpus, n_codes, chunks, id_col, vec_col, n=n)
    corpus_chunks = cells.select(
        F.col(id_col),
        "cid",
        F.posexplode(F.expr(chunks.format(v=vec_col))).alias("s", "_vchunk"),
    )
    enc = _pq_encode(corpus_chunks, cents_b, [id_col, "cid"])

    new_dir = f"{index_dir}.new"
    fs, live_p = _fs_and_path(spark, index_dir)
    new_p = _fs_and_path(spark, new_dir)[1]
    if fs.exists(new_p):  # leftover from a crashed build — never partial-live
        fs.delete(new_p, True)
    # written from the collected local relation — no corpus re-scan
    cents.select("cid", "_cvec").write.mode("overwrite").parquet(
        f"{new_dir}/centroids"
    )
    # select() fixes the column order; partitionBy moves cid into the path
    enc.select(id_col, "s", "code", "cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(f"{new_dir}/codes")
    spark.createDataFrame(
        [(dim, n_sub, n_codes, stride, n, id_col)],
        "dim int, n_sub int, n_codes int, stride int, n bigint, id_col string",
    ).write.mode("overwrite").parquet(f"{new_dir}/meta")
    cents_b.select("s", "c", "_cchunk", "_cc").write.mode("overwrite").parquet(
        f"{new_dir}/codebooks"
    )

    if fs.exists(live_p):
        fs.delete(live_p, True)
    if not fs.rename(new_p, live_p):
        raise IOError(f"publish failed: rename {new_dir} -> {index_dir}")
    return index_dir


#: The index artifacts' schemas, fixed by build_ivf_pq_index at write
#: time (meta is written with exactly the _META_SCHEMA DDL; centroids
#: carry the corpus vector cast to array<double>; codebooks are the
#: _pq_codebooks projection). Passing them at read time skips the
#: per-serve footer schema inference on every artifact (guide §5).
_META_SCHEMA = (
    "dim int, n_sub int, n_codes int, stride int, n bigint, id_col string"
)
_CENTROIDS_SCHEMA = "cid bigint, _cvec array<double>"
_CODEBOOKS_SCHEMA = "s int, c int, _cchunk array<double>, _cc double"


def _read_probed_codes(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    id_col: str,
    probe_cids: list,
) -> DataFrame:
    """The coded inverted file restricted to the probed cells, read by
    EXPLICIT leaf directories instead of whole-tree partition discovery
    (r15, guide §5/§6 — VERDICT r14 item 2's '45-path file listing').

    ``spark.read.parquet(codes)`` listed every ``cid=`` partition (a
    listing JOB once the cell count passes the 32-path parallel-
    discovery threshold — thousands of paths per serve at production
    nlist) and inferred the schema from footers, only for the
    ``cid IN (...)`` filter to prune all but ~nprobe·|Q| of them. The
    probed cids are already collected, so this lists the codes dir ONCE
    (one listStatus: cell names only, no per-file recursion outside
    probed cells), reads exactly the probed leaf dirs under a basePath
    (cid is recovered from the path, inference types it INT exactly as
    whole-tree discovery did), and keeps the ``isin`` partition filter
    so the scan still carries the PartitionFilters prune. A probed cell
    with no directory (possible: a centroid can itself be assigned to
    ANOTHER centroid's cell, so an empty cell writes no dir) contributes
    zero rows — exactly what partition pruning produced. The data schema is pinned from the build contract: the
    id column keeps the corpus's id dtype (the fingerprint-pinned build
    corpus IS this corpus), and s/code are the INTs _pq_encode emits.
    This is also debris-proof: a crashed compaction's ``cid=N.old``
    leftovers can never widen cid to string here, because only exact
    ``cid=N`` names are ever read."""
    from pyspark.sql import types as T

    from ..fsops import _fs_and_path

    codes_dir = f"{index_dir}/codes"
    fs, codes_p = _fs_and_path(spark, codes_dir)
    live = {
        st.getPath().getName()
        for st in fs.listStatus(codes_p)
        if not st.isFile()
    }
    data_schema = T.StructType(
        [
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("s", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
        ]
    )
    paths = [f"{codes_dir}/cid={c}" for c in probe_cids if f"cid={c}" in live]
    if not paths:
        return spark.createDataFrame(
            [],
            T.StructType(
                data_schema.fields + [T.StructField("cid", T.IntegerType())]
            ),
        )
    return (
        spark.read.option("basePath", codes_dir)
        .schema(data_schema)
        .parquet(*paths)
        .filter(F.col("cid").isin(probe_cids))
    )


def search_ivf_pq_index(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    m_cand: int = 20,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    small_queries: bool = True,
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF-PQ index.

    The serve plan touches, in order: the broadcast centroid/codebook
    frames (tiny), the probed PARTITIONS of the coded inverted file
    (``cid IN (...)`` is collected from the bounded |Q|·nprobe probe set
    — a metadata-sized collect, like ingest's file list — and pushed
    into the scan as a partition filter), and full-precision vectors for
    the |Q|·m_cand re-rank survivors only.  The corpus itself is never
    scanned for candidate generation — that is the whole point of
    persisting the index.
    """
    # every artifact read passes its KNOWN schema (r15, guide §5 /
    # VERDICT r14 item 2 — the serve path's sequential bounded driver
    # steps): build_ivf_pq_index fixes these schemas at write time, so
    # re-inferring them from footers on every serve paid a driver-side
    # footer read per artifact (and, for the cid-partitioned codes
    # tree, a full partition-discovery listing of EVERY cell — a
    # listing job past the 32-path parallel-discovery threshold; at
    # production cell counts that is thousands of paths per serve).
    meta = (
        spark.read.schema(_META_SCHEMA).parquet(f"{index_dir}/meta").collect()[0]
    )
    dim, n_sub = meta["dim"], meta["n_sub"]
    cents_raw = spark.read.schema(_CENTROIDS_SCHEMA).parquet(
        f"{index_dir}/centroids"
    )
    cents = F.broadcast(
        cents_raw.select("cid", "_cvec", norm_fold("_cvec", dim).alias("_cn"))
    )
    probes = _assign_cells(
        queries.select(F.col(query_id_col), F.col(vec_col)),
        cents, query_id_col, nprobe, vec_col, dim,
        tiny=small_queries, with_vec=False,
    )
    probe_rows = probes.collect()  # bounded: |Q| · nprobe rows
    probe_cids = sorted({r["cid"] for r in probe_rows})
    # re-create from the collected rows (schema derived, not hardcoded)
    # so the probe subtree is not recomputed for the join below
    probes_b = F.broadcast(spark.createDataFrame(probe_rows, probes.schema))
    codes = _read_probed_codes(spark, index_dir, corpus, id_col, probe_cids)
    cb = F.broadcast(
        spark.read.schema(_CODEBOOKS_SCHEMA).parquet(f"{index_dir}/codebooks")
    )
    chunks = _pq_chunks_expr(n_sub, dim // n_sub)
    dt = _pq_query_tables(queries, cb, chunks, query_id_col, vec_col)
    dtp = dt.withColumnRenamed("c", "code").join(probes_b, query_id_col)
    adc = (
        codes.join(F.broadcast(dtp), ["cid", "s", "code"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_qd").alias("_adc"))
    )
    wq = Window.partitionBy(query_id_col).orderBy("_adc", id_col)
    cand = (
        adc.withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= m_cand)
        .select(query_id_col, id_col)
    )
    return _exact_rerank(
        cand, corpus, queries, k, id_col, vec_col, query_id_col, dim
    )


def encode_batch_for_index(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    *,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode a NEW batch against a persisted index's frozen geometry.

    Returns the (id, s, code, cid) coded rows for ``batch`` using the
    index's PERSISTED centroids and codebooks — both tiny, both
    broadcast. The plan reads the batch, ``<dir>/centroids`` and
    ``<dir>/codebooks`` and nothing else: the existing posting lists
    (``<dir>/codes``) are never scanned, which is what makes append
    O(|batch|) instead of O(corpus). Split out from
    :func:`append_ivf_pq_index` so tests can assert that plan shape
    directly.

    Because the geometry is frozen, encoding a batch here is
    bit-identical to what :func:`build_ivf_pq_index` would have coded
    for the same rows in a full rebuild — PROVIDED the batch contains
    none of the strided centroid/codebook sample ids (else the rebuild
    would have picked different geometry). Callers own that split;
    the registered query derives the batch predicate from the same
    stride/step arithmetic the build uses.
    """
    meta = (
        spark.read.schema(_META_SCHEMA).parquet(f"{index_dir}/meta").collect()[0]
    )
    dim, n_sub = meta["dim"], meta["n_sub"]
    id_col = id_col or meta["id_col"]
    cents = F.broadcast(
        spark.read.schema(_CENTROIDS_SCHEMA)
        .parquet(f"{index_dir}/centroids")
        .select("cid", "_cvec", norm_fold("_cvec", dim).alias("_cn"))
    )
    cells = _assign_cells(
        _spread(batch).select(id_col, vec_col), cents, id_col, 1, vec_col, dim
    )
    chunks = _pq_chunks_expr(n_sub, dim // n_sub)
    cb = F.broadcast(
        spark.read.schema(_CODEBOOKS_SCHEMA).parquet(f"{index_dir}/codebooks")
    )
    batch_chunks = cells.select(
        F.col(id_col),
        "cid",
        F.posexplode(F.expr(chunks.format(v=vec_col))).alias("s", "_vchunk"),
    )
    return _pq_encode(batch_chunks, cb, [id_col, "cid"]).select(
        id_col, "s", "code", "cid"
    )


def append_ivf_pq_index(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    *,
    id_col: str | None = None,
    vec_col: str = "embedding",
) -> str:
    """Incrementally add ``batch`` to a persisted IVF-PQ index — the
    production operation a 100 TB corpus needs where full rebuilds are
    not an option (VERDICT r7 item 2; the asymmetric-new-batch pattern
    of ``dedup_incremental_new_batch``, applied to the ANN index).

    Mechanics: encode the batch against the index's frozen
    centroids/codebooks (:func:`encode_batch_for_index` — broadcast
    geometry, batch-only scan) and APPEND the coded rows into the
    cid-partitioned posting lists. Only the partitions of cells the
    batch actually lands in receive new files; every pre-existing file
    is untouched (asserted by test_ann_index.py at the filesystem
    level).

    Crash safety: Spark's file committer stages task output under
    ``codes/_temporary`` and publishes at job commit; readers ignore
    ``_``-prefixed paths, so a crash mid-append leaves the OLD index
    fully intact and the retry is idempotent-by-rerun. ``<dir>/meta``
    is deliberately IMMUTABLE under append: everything serve-time reads
    from it (dim, n_sub, id_col) is invariant across appends, and its
    ``n`` documents the BASE build — leaving it untouched means there
    is no meta-rewrite crash window at all.
    """
    enc = encode_batch_for_index(
        spark, index_dir, batch, id_col=id_col, vec_col=vec_col
    )
    enc.write.mode("append").partitionBy("cid").parquet(f"{index_dir}/codes")
    return index_dir


def index_counts(spark: SparkSession, index_dir: str) -> dict:
    """Authoritative row accounting for a persisted index.

    ``meta/n`` is the BUILD PARAMETER n — the corpus size the geometry
    (stride, codebook step) was derived for — and is deliberately
    immutable under append so there is no meta-rewrite crash window
    (see :func:`append_ivf_pq_index`). It is NOT the number of indexed
    vectors: an incremental base build already passes the intended
    full-corpus n for geometry while indexing only the base rows, and
    every append widens the gap further. Any consumer that needs the
    CURRENT indexed count (stats, selectivity, recall denominators)
    must read the codes-side truth; this is that readout (VERDICT r8
    item 5b). Each indexed vector contributes exactly ``n_sub`` coded
    rows, so the id count is ``count(codes) / n_sub`` — a parquet
    footer-metadata count, no data scan."""
    meta = (
        spark.read.schema(_META_SCHEMA).parquet(f"{index_dir}/meta").collect()[0]
    )
    indexed = spark.read.parquet(f"{index_dir}/codes").count() // meta["n_sub"]
    return {"meta_n": meta["n"], "indexed_n": indexed}


def _parquet_files(fs, leaf_path) -> list:
    return [
        s
        for s in fs.listStatus(leaf_path)
        if s.isFile() and s.getPath().getName().endswith(".parquet")
    ]


def compact_index_postings(
    spark: SparkSession,
    index_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    batch_cells: int = 32,
) -> dict:
    """Compact the posting lists after N appends (VERDICT r8 item 5a).

    Every append lands >=1 new small file in each touched ``cid=``
    partition; after many increments the per-cell file count — not data
    volume — starts to dominate serve-time open cost (the classic
    small-files regression ``ops/layout.compact_parquet_dir`` exists
    for). Multi-file leaves are rewritten in place; single-file leaves
    are left untouched (no needless rewrite, no mtime churn). Partition
    pruning is preserved by construction: the hive ``cid=`` layout
    never changes.

    Job shape (VERDICT r9 item 3): the r9 form submitted one Spark job
    per multi-file leaf — at production cell counts that is 10k+
    sequential job submissions for one maintenance pass, with driver
    round-trip latency dominating. Now every multi-file leaf whose data
    fits ONE target file (the overwhelmingly common small-files case)
    is rewritten in BATCHES: up to ``batch_cells`` leaves are read
    together (``basePath`` recovers cid), repartitioned by cid and
    written partitioned-by-cid to a ``_``-prefixed scratch dir — ONE
    Spark job per batch, exactly one output file per cell — and then
    each cell is swapped in with the same per-cell crash-safe
    .new/.old rename discipline ``ops/layout.compact_parquet_dir``
    uses. Oversized leaves (> target_file_bytes, needing a computed
    multi-file output) still go through compact_parquet_dir
    individually. ``batch_cells`` stays at Spark's default
    parallelPartitionDiscovery threshold so the batched read never
    spawns its own listing job.

    Crash safety, window by window: a kill during the batched scratch
    write leaves only ``codes/_compact_scratch`` (readers ignore
    ``_``-prefixed paths; the next call deletes it). A kill after a
    cell's scratch output was renamed to ``cid=N.new`` but before its
    swap is healed by the debris pass below (stale .new next to a live
    leaf is deleted and the leaf recompacted). A kill between the two
    swap renames is compact_parquet_dir's documented self-heal. Readers
    either see the old complete posting list or the new complete one.

    Serving results are bit-identical before/after — compaction only
    re-bins the same (id, s, code) rows into fewer files
    (test_ann_index.py pins this against the full-corpus oracle).

    Returns {"cells_compacted", "files_before", "files_after"} counted
    over parquet data files in the cid partitions (debris-healed cells
    count toward cells_compacted and files_after; their pre-heal file
    count is ill-defined and excluded from files_before)."""
    from ..fsops import _fs_and_path
    from ..ops.layout import compact_parquet_dir

    codes_dir = f"{index_dir}/codes"
    fs, codes_p = _fs_and_path(spark, codes_dir)
    scratch = f"{codes_dir}/_compact_scratch"
    scratch_p = _fs_and_path(spark, scratch)[1]
    fs.delete(scratch_p, True)  # debris from a kill mid-batch-write
    # Heal crash-window debris FIRST: a kill inside a previous call's
    # swap can leave cid=N.old / cid=N.new (possibly with cid=N gone).
    # Left alone they would be mis-read as live partitions — Spark's
    # partition discovery parses 'N.old' and widens cid to string,
    # silently breaking the serve-time cid IN (...) prune. Invoking
    # compact_parquet_dir on the LIVE path runs its documented
    # self-heal (restores a missing live dir from .new/.old, deletes
    # stale scratch) before any new work.
    debris_live = {
        st.getPath().getName().rsplit(".", 1)[0]
        for st in fs.listStatus(codes_p)
        if not st.isFile()
        and st.getPath().getName().startswith("cid=")
        and st.getPath().getName().endswith((".old", ".new"))
    }
    for live in sorted(debris_live):
        compact_parquet_dir(spark, f"{codes_dir}/{live}", target_file_bytes)
    before = after = 0
    compacted = len(debris_live)
    small_leaves = []  # multi-file leaves fitting ONE target file
    for st in fs.listStatus(codes_p):
        name = st.getPath().getName()
        if (
            st.isFile()
            or not name.startswith("cid=")
            or name.endswith((".old", ".new"))
        ):
            continue
        if name in debris_live:
            after += len(_parquet_files(fs, st.getPath()))
            continue
        leaf = st.getPath()
        files = _parquet_files(fs, leaf)
        before += len(files)
        if len(files) <= 1:
            after += len(files)
            continue
        if sum(f.getLen() for f in files) > target_file_bytes:
            # needs a computed multi-file output — per-leaf path
            compact_parquet_dir(spark, leaf.toString(), target_file_bytes)
            after += len(_parquet_files(fs, leaf))
            compacted += 1
        else:
            small_leaves.append(leaf)
    # Job accounting for the batch loop (the whole point of batching):
    # parquet schema inference launches its own footer-reading job per
    # read, so the schema is inferred ONCE (first batch) and passed
    # explicitly after; AQE executes every shuffle query as 2+ jobs
    # (map stage + re-planned write), so it is disabled around the
    # loop — the plan is a fixed repartition(len(group), cid) with
    # nothing for AQE to re-plan. Net: ceil(n_small/batch_cells) write
    # jobs + 1 inference job for the whole pass (pinned by
    # test_ann_index.py's job-group counter).
    aqe_key = "spark.sql.adaptive.enabled"
    aqe_prev = spark.conf.get(aqe_key, None) if small_leaves else None
    if small_leaves:
        spark.conf.set(aqe_key, "false")
    schema = None
    try:
        for i in range(0, len(small_leaves), max(1, batch_cells)):
            group = small_leaves[i : i + max(1, batch_cells)]
            n_after, schema = _compact_leaf_group(
                spark, fs, codes_p, scratch, scratch_p, group, schema,
                target_file_bytes,
            )
            after += n_after
            compacted += len(group)
    finally:
        # conf.get(key, None) returns None — NOT the effective default
        # "true" — when the session never set the key explicitly (the
        # driver's bare session); a plain "restore if not None" would
        # leave AQE disabled for every later query in that session.
        # unset() returns the conf to its default instead.
        if small_leaves:
            if aqe_prev is not None:
                spark.conf.set(aqe_key, aqe_prev)
            else:
                spark.conf.unset(aqe_key)
    return {
        "cells_compacted": compacted,
        "files_before": before,
        "files_after": after,
    }


def _compact_leaf_group(
    spark, fs, codes_p, scratch, scratch_p, group, schema, target_file_bytes
):
    """One batched rewrite: read ``group`` leaves together, write one
    file per cell to scratch in ONE Spark job, then swap each cell in
    with the per-cell crash-safe rename discipline. Returns (number of
    parquet files now in the group's leaves, the codes schema) so the
    caller can pass the schema to later batches (skipping per-read
    inference jobs)."""
    from ..fsops import _fs_and_path
    from ..ops.layout import compact_parquet_dir

    fs.delete(scratch_p, True)
    reader = spark.read.option("basePath", codes_p.toString())
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*[leaf.toString() for leaf in group])
    # each cid hashes into exactly one shuffle partition, so the
    # partitionBy write emits exactly one file per cell
    df.repartition(len(group), "cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(scratch)
    n_after = 0
    for leaf in group:
        src = _fs_and_path(spark, f"{scratch}/{leaf.getName()}")[1]
        if not fs.exists(src):
            # all-empty leaf: partitionBy wrote no dir — rare, fall
            # back to the per-leaf rewrite (emits one empty file)
            compact_parquet_dir(spark, leaf.toString(), target_file_bytes)
        else:
            # the compact_parquet_dir swap discipline, per cell:
            # .new is complete before the live dir moves, and every
            # intermediate state is healed at the next call's entry
            new_p = _fs_and_path(spark, f"{leaf}.new")[1]
            old_p = _fs_and_path(spark, f"{leaf}.old")[1]
            fs.delete(new_p, True)
            if not fs.rename(src, new_p):
                raise IOError(f"compaction failed staging {leaf}.new")
            fs.delete(old_p, True)
            if not fs.rename(leaf, old_p):
                raise IOError(f"compaction swap failed renaming {leaf}")
            if not fs.rename(new_p, leaf):
                raise IOError(f"compaction swap failed installing {leaf}")
            fs.delete(old_p, True)
        n_after += len(_parquet_files(fs, leaf))
    fs.delete(scratch_p, True)
    return n_after, df.schema


def inventory_fingerprint(path: str, suffix: str | None = None) -> str:
    """md5 over the file inventory (path, size, mtime_ns) of ``path`` —
    a file or a tree, optionally filtered to ``suffix`` files.  Pure
    os.stat metadata: no data is read.  The shared content-key helper
    behind index caching here and bench.py's derived-dataset caches
    (one implementation, so inventory-hash fixes propagate to both)."""
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if suffix and not f.endswith(suffix):
                    continue
                st = os.stat(os.path.join(root, f))
                entries.append(f"{root}/{f}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append(f"{path}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("\n".join(entries).encode()).hexdigest()


def corpus_fingerprint(data_dir: str, table: str = "embeddings.parquet") -> str:
    """Content key for index caching: md5 over the corpus parquet file
    inventory (path, size, mtime_ns).  Any regeneration of the testdata
    — same path, same row count, different values — changes mtimes and
    therefore the key, so a cached index can never silently serve stale
    results."""
    return inventory_fingerprint(os.path.join(data_dir, table))


def ensure_ivf_pq_index(
    spark: SparkSession,
    corpus: DataFrame,
    sf_dir: str,
    cache_root: str,
    deferred_sizing=None,
    **build_kwargs,
) -> str:
    """Build-or-reuse: the persisted index for ``sf_dir``'s embeddings,
    keyed by corpus fingerprint + build parameters.  First call builds
    (one-time cost); every later call — across sessions — returns the
    published directory immediately.  The crash-safe ``.new`` swap in
    :func:`build_ivf_pq_index` makes a concurrent double-build benign:
    both publish identical bits, last rename wins atomically.

    ``deferred_sizing`` (r14, guide §5 "the driver should do almost no
    data work"): a thunk returning extra build kwargs that require
    scanning the corpus (``{"stride": ..., "corpus_count": n}``), called
    ONLY on a cache miss.  Without it the serve path paid a full
    ``corpus.count()`` job per call just to reconstruct the cache key —
    at 100 TB that is a corpus scan to look up a cache hit.  Keying on
    the fingerprint alone is equally sound for those kwargs: the
    fingerprint pins the corpus bytes, which pin N, which pins the
    derived stride — one content, one key, one index.

    CONTRACT (ADVICE r14): every ``deferred_sizing`` caller for a given
    ``sf_dir`` must pass the CANONICAL corpus — the ``_embs_nn`` intake
    (vec_id IS NOT NULL AND embedding IS NOT NULL, cast to
    array<double>) — and a thunk returning the ``_ivf_stride`` formula
    over that corpus's count.  The ``:derived-sizing`` key suffix
    encodes this convention, not the thunk itself: two callers with
    different corpora or sizing formulas would collide on one key and
    whichever builds first would silently serve the other.  Current
    callers (the registered serve query and bench's _ann_serve_scaling)
    both honor it; a new caller with a different intake must key its
    index explicitly (pass stride/corpus_count directly) instead."""
    key_src = corpus_fingerprint(sf_dir) + repr(sorted(build_kwargs.items()))
    if deferred_sizing is not None:
        key_src += ":derived-sizing"
    key = hashlib.md5(key_src.encode()).hexdigest()[:16]
    index_dir = os.path.join(cache_root, f"ivf_pq_{key}")
    if os.path.isdir(index_dir) and os.path.isdir(f"{index_dir}/codes"):
        return index_dir
    if deferred_sizing is not None:
        build_kwargs.update(deferred_sizing())
    os.makedirs(cache_root, exist_ok=True)
    return build_ivf_pq_index(spark, corpus, index_dir, **build_kwargs)
