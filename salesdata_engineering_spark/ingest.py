"""File-ingestion lifecycle (SURVEY §2.1 S1-S8, §3.1 steps 1-5, 9).

The reference's pipeline (in /root/reference): list S3 keys
(src/main/read/aws_read.py:7-22), download locally
(download/aws_file_download.py:12-25), probe each CSV header
(main.py:110-121), route schema-violating files to error dirs
(main.py:127-140, move/move_files.py:26-62), track per-file status
A(ctive)/I(nactive) in a MySQL staging table (main.py:39-49,157-174,
318-334), fold surplus columns into a catch-all string column literally
named "additional column" (main.py:189-202), and positional-union
everything onto an empty seed frame (main.py:183-204).

Engine re-expression, Spark-first:

- No download step: Spark reads object-store paths directly.
- The ledger is a parquet table; "which files are new" is a left-anti
  join, "already in flight" a left-semi join — not cursor SQL.
- Union is ``unionByName(allowMissingColumns=True)`` over per-file
  frames; the "additional column" fold is kept as an explicit compat
  op (exact name with the space, main.py:195-197).
- File moves go through the local/Hadoop filesystem module and work on
  any FS the JVM can mount.

Scale: validation probes only CSV headers (1-row scans); the data scan
is one multi-path ``spark.read.csv`` over all accepted files, so
Catalyst sees a single source — partition count follows file splits,
not file count.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import fold_extra_columns

#: the reference's mandatory-column contract (resources/dev/config.py:40)
MANDATORY_COLUMNS: tuple[str, ...] = (
    "customer_id",
    "store_id",
    "product_name",
    "sales_date",
    "sales_person_id",
    "price",
    "quantity",
    "total_cost",
)

#: exact catch-all name — WITH the space (main.py:195-197)
ADDITIONAL_COLUMN = "additional column"

STATUS_ACTIVE = "A"
STATUS_DONE = "I"


@dataclass
class ValidationResult:
    ok: list[str] = field(default_factory=list)
    rejected: dict[str, list[str]] = field(default_factory=dict)  # path -> missing cols


def probe_columns(spark: SparkSession, path: str) -> list[str]:
    """S1 — header-only schema probe (parity: main.py:113)."""
    return spark.read.csv(path, header=True).columns


def validate_files(
    spark: SparkSession,
    paths: list[str],
    mandatory: tuple[str, ...] = MANDATORY_COLUMNS,
) -> ValidationResult:
    """Set-difference each file's header against the contract
    (parity: main.py:110-121). Missing columns ⇒ whole-file reject."""
    res = ValidationResult()
    for p in paths:
        missing = sorted(set(mandatory) - set(probe_columns(spark, p)))
        if missing:
            res.rejected[p] = missing
        else:
            res.ok.append(p)
    return res


def route_rejected(rejected: dict[str, list[str]], error_dir: str) -> list[str]:
    """Move rejected files to the error directory
    (parity: main.py:127-140 + move_files.py:26-62). Local/NFS paths via
    shutil; object stores route through their own rename API."""
    Path(error_dir).mkdir(parents=True, exist_ok=True)
    moved = []
    for p in rejected:
        dest = str(Path(error_dir) / Path(p).name)
        shutil.move(p, dest)
        moved.append(dest)
    return moved


def read_with_fold(
    spark: SparkSession,
    path: str,
    mandatory: tuple[str, ...] = MANDATORY_COLUMNS,
) -> DataFrame:
    """S2 + the extra-column fold (parity: main.py:189-202).

    Surplus columns' VALUES are comma-joined per row into the catch-all
    column (schema evolution by stringification — observable reference
    behavior, preserved exactly, space in the name included); missing
    catch-all when no extras ⇒ NULL literal (main.py:200)."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    extra = [c for c in df.columns if c not in mandatory]
    if extra:
        df = df.withColumn(ADDITIONAL_COLUMN, fold_extra_columns(extra))
    else:
        df = df.withColumn(ADDITIONAL_COLUMN, F.lit(None).cast("string"))
    return df.select(*mandatory, ADDITIONAL_COLUMN)


def read_rows_validated(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """Row-level validation: (good_rows, bad_rows) from one PERMISSIVE scan.

    The reference rejects whole FILES on a bad header (main.py:115-118,
    a committed example at error_files/sales_data_2019-08-19.csv); this
    is the finer-grained alternative SURVEY §1.3 maps it to — rows that
    fail the typed schema land in Spark's corrupt-record column and are
    routed instead of the file. One scan serves both outputs (the split
    is two filters over the same cached-by-scan frame); at 100 TB the
    good path streams on while a tiny bad-rows side table preserves the
    raw line for forensics, replacing an all-or-nothing reject of a
    multi-GB file.

    ``schema`` is the typed DDL for the expected columns; the corrupt
    column is appended automatically. The parsed frame is PERSISTED
    before the split: Spark disallows queries whose referenced columns
    reduce to only the corrupt-record column on a raw CSV scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    documented remedy is cache-or-save), and the persist also means the
    file parses once, not once per side. Callers splitting a very large
    landing zone should ``unpersist()`` after both sides are consumed,
    or write the parsed frame to a staging table instead."""
    from pyspark.storagelevel import StorageLevel

    corrupt = "_corrupt_record"
    df = (
        spark.read.csv(
            path,
            header=True,
            schema=f"{schema}, {corrupt} STRING",
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=corrupt,
        )
        # capture provenance BELOW the persist: input_file_name() reads
        # scan-task state and returns '' once the rows come from the
        # in-memory relation instead of the file scan
        .withColumn("src_file", F.input_file_name())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    good = df.filter(F.col(corrupt).isNull()).drop(corrupt, "src_file")
    bad = df.filter(F.col(corrupt).isNotNull()).select(
        "src_file", F.col(corrupt).alias("raw_line")
    )
    return good, bad


def union_files(
    spark: SparkSession,
    paths: list[str],
    mandatory: tuple[str, ...] = MANDATORY_COLUMNS,
) -> DataFrame:
    """U1 — union the canonical per-file frames by NAME (replaces the
    reference's positional union onto an empty JDBC seed frame,
    main.py:183-204)."""
    frames = [read_with_fold(spark, p, mandatory) for p in paths]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


class FileLedger:
    """Parquet-backed processing ledger (parity: product_staging_table,
    resources/sql_scripts/table_scripts.sql:1-8 + main.py:39-49,157-174,
    318-334). Status A = in-flight, I = done.

    Append-only log; current status = latest row per file (ts, seq
    ordering). At scale this is a tiny dimension — broadcast in every
    join against file lists."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        # Resume from the persisted high-water mark: a fresh process
        # appending to an existing ledger must not restart seq at 1, or
        # its new status rows would be shadowed by older higher-seq rows
        # in snapshot()'s latest-per-file resolution.
        self._seq = 0
        if self._exists():
            row = self.spark.read.parquet(self.path).agg(F.max("seq")).first()
            self._seq = int(row[0] or 0)

    def _exists(self) -> bool:
        try:
            self.spark.read.parquet(self.path)
            return True
        except Exception:
            return False

    def snapshot(self) -> DataFrame:
        """Latest status per file (empty frame if no ledger yet)."""
        if not self._exists():
            return self.spark.createDataFrame([], "file_name string, status string, seq long")
        log = self.spark.read.parquet(self.path)
        from pyspark.sql import Window

        w = Window.partitionBy("file_name").orderBy(F.col("seq").desc())
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("file_name", "status", "seq")
        )

    def record(self, files: list[str], status: str) -> None:
        """INSERT/UPDATE equivalent: append (file, status, seq) rows.

        Already batched per status transition (one tiny parquet appended
        per CALL, not per file) — pass the whole cycle's file list at
        once. A long-lived ingest loop still accretes one small file per
        transition; compact_parquet(ledger.path) is the standing remedy,
        same as for any append-log table."""
        self._seq += 1
        rows = [(Path(f).name, status, self._seq) for f in files]
        self.spark.createDataFrame(rows, "file_name string, status string, seq long").write.mode(
            "append"
        ).parquet(self.path)

    def in_flight(self) -> DataFrame:
        return self.snapshot().filter(F.col("status") == STATUS_ACTIVE).select("file_name")

    def pending(self, files: list[str]) -> list[str]:
        """Files never completed: anti-join against status I
        (the relational form of main.py:39-49's cursor check)."""
        names = self.spark.createDataFrame(
            [(Path(f).name, f) for f in files], "file_name string, path string"
        )
        done = self.snapshot().filter(F.col("status") == STATUS_DONE).select("file_name")
        keep = names.join(F.broadcast(done), "file_name", "left_anti")
        return [r.path for r in keep.collect()]


@dataclass
class IngestReport:
    accepted: list[str]
    rejected: list[str]
    rows: int


def ingest_batch(
    spark: SparkSession,
    landing_dir: str,
    error_dir: str,
    ledger: FileLedger,
    mandatory: tuple[str, ...] = MANDATORY_COLUMNS,
) -> tuple[DataFrame | None, IngestReport]:
    """The reference's main.py pipeline, steps 1-5: discover → skip
    already-done → validate → route rejects → mark A → union. Caller
    transforms/writes the frame, then calls ``ledger.record(accepted,
    STATUS_DONE)`` (step 9)."""
    files = sorted(str(p) for p in Path(landing_dir).glob("*.csv"))
    files = ledger.pending(files)
    result = validate_files(spark, files, mandatory)
    moved = route_rejected(result.rejected, error_dir)
    if not result.ok:
        return None, IngestReport([], moved, 0)
    ledger.record(result.ok, STATUS_ACTIVE)
    df = union_files(spark, result.ok, mandatory)
    return df, IngestReport(result.ok, moved, df.count())
