"""SparkSession builder tuned for this engine.

The reference builds a bare local session with default configs
(`src/main/utility/spark_session.py:10-13` in /root/reference). We instead
pin the settings that matter for correctness parity and for scale:

- ``spark.sql.session.timeZone=UTC``: parquet timestamps must render
  identically in Spark and the DuckDB oracle (DuckDB is UTC-naive).
- AQE on (+ partition coalescing + skew-join splitting): at 100 TB the
  static plan is always wrong somewhere; AQE re-plans from runtime stats.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this should be ~2-3x total cores or driven by
  ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` (AQE coalescing
  makes the static number much less sensitive).
- Arrow enabled so any Pandas-UDF extension operators move data in
  vectorized batches instead of pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "salesdata-engineering-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so bench.py and the
    driver agree on the core count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else max(os.cpu_count() or 8, 8)
    if driver_memory is None:
        driver_memory = os.environ.get("SPARK_DRIVER_MEMORY", "16g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE keep small shuffles wide enough to use every core:
        # the 1 MiB default floor coalesces CPU-bound stages over small
        # inputs down to 1-2 tasks. At scale the 64 MiB advisory target
        # governs; this floor only binds on small/local data.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The testdata parquet carries INT64 TIMESTAMP(NANOS,...) which Spark
        # rejects by default; read as long and convert in datasets.load_tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
