"""SCD2 merge edge semantics on a synthetic dimension: new keys,
changed rows, idempotent re-loads, NULL attribute transitions, history
passthrough — plus the incremental-aggregate ≡ full-recompute invariant
split at several cutoffs."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesdata_engineering_spark.ops.scd import OPEN_END, merge_partial_sums, scd2_merge


def _dim(spark):
    rows = [
        # key, segment, valid_from, valid_to, is_current
        (1, "A", "1995-01-01", OPEN_END, 1),          # will change A -> B
        (2, "A", "1995-01-01", OPEN_END, 1),          # reloaded identical -> no-op
        (3, None, "1995-01-01", OPEN_END, 1),         # NULL -> value = real change
        (4, "D", "1995-01-01", OPEN_END, 1),          # untouched (no update row)
        (1, "Z", "1990-01-01", "1995-01-01", 0),      # history passthrough
    ]
    return spark.createDataFrame(
        rows, "key int, segment string, valid_from string, valid_to string, is_current int"
    )


def _updates(spark):
    rows = [
        (1, "B", "1997-01-01"),   # change
        (2, "A", "1997-01-01"),   # identical reload
        (3, "C", "1997-01-01"),   # NULL -> C
        (5, "E", "1997-01-01"),   # brand-new key
    ]
    return spark.createDataFrame(rows, "key int, segment string, effective_date string")


def test_scd2_merge_semantics(spark):
    out = scd2_merge(_dim(spark), _updates(spark), key="key", attrs=["segment"])
    rows = {(r.key, r.segment, r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows == {
        (1, "Z", "1990-01-01", "1995-01-01", 0),       # history untouched
        (1, "A", "1995-01-01", "1997-01-01", 0),       # closed at effective date
        (1, "B", "1997-01-01", OPEN_END, 1),           # new open version
        (2, "A", "1995-01-01", OPEN_END, 1),           # idempotent reload no-op
        (3, None, "1995-01-01", "1997-01-01", 0),      # NULL->C closes (null-safe)
        (3, "C", "1997-01-01", OPEN_END, 1),
        (4, "D", "1995-01-01", OPEN_END, 1),           # untouched open row
        (5, "E", "1997-01-01", OPEN_END, 1),           # new key inserted open
    }
    # exactly one open row per live key
    open_counts = (
        out.filter(F.col("is_current") == 1).groupBy("key").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_scd2_merge_idempotent_on_reapply(spark):
    """Re-applying the same updates to the merged result changes nothing."""
    first = scd2_merge(_dim(spark), _updates(spark), key="key", attrs=["segment"])
    second = scd2_merge(first, _updates(spark), key="key", attrs=["segment"])
    a = {tuple(r) for r in first.collect()}
    b = {tuple(r) for r in second.collect()}
    assert a == b


def test_incremental_equals_full_at_any_cutoff(spark, tables):
    o = tables["orders"]
    dec = F.col("o_totalprice").cast("decimal(14,2)")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.sum(dec).alias("s"), F.count("*").alias("n")
        )

    full = {
        r.o_orderpriority: (str(r.s), r.n) for r in partial(o).collect()
    }
    for cutoff in ("1993-06-01", "1996-01-01", "1998-01-01"):
        cut = F.lit(cutoff).cast("timestamp")
        merged = merge_partial_sums(
            partial(o.filter(F.col("o_orderdate") < cut)).unionByName(
                partial(o.filter(F.col("o_orderdate") >= cut))
            ),
            keys=["o_orderpriority"],
            sum_cols=["s"],
            count_col="n",
        )
        got = {r.o_orderpriority: (str(r.s), r.n) for r in merged.collect()}
        assert got == full, f"cutoff {cutoff}: incremental != full"


def test_merge_into_api_gated_to_v2_tables(spark, tables):
    """Spark 4 DataFrame.mergeInto: the builder API resolves (alias-
    qualified condition, updateAll/insertAll clauses), and the v1
    parquet catalog rejects execution with UNSUPPORTED_FEATURE.
    TABLE_OPERATION — pinning exactly where the engine's CDC merge
    (cdc_apply_changes / scd2_merge) takes over until a v2 catalog
    (Delta/Iceberg) is attached. If this test ever FAILS because the
    merge succeeded, a v2 catalog arrived: wire cdc_apply_changes'
    foreachBatch sink to native MERGE and retire the anti-join
    rewrite."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    spark.sql("DROP TABLE IF EXISTS merge_gate_probe")
    spark.range(5).withColumn("v", F.col("id") * 10).write.saveAsTable(
        "merge_gate_probe"
    )
    try:
        src = spark.range(3, 8).withColumn("v", F.col("id") * 100).alias("s")
        builder = (
            src.mergeInto("merge_gate_probe", F.expr("merge_gate_probe.id = s.id"))
            .whenMatched()
            .updateAll()
            .whenNotMatched()
            .insertAll()
        )
        with pytest.raises(Exception) as exc:
            builder.merge()
        assert "UNSUPPORTED_FEATURE.TABLE_OPERATION" in str(exc.value), (
            "v1 parquet table accepted MERGE INTO — a v2 catalog is "
            f"present; revisit the CDC path. Got: {exc.value}"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS merge_gate_probe")
