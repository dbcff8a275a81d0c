"""File-source streaming pipelines.

Replaces the reference's poll-download-ledger loop (aws_read.py /
aws_file_download.py / main.py:39-49 in /root/reference) with Spark's
file source + checkpoint: exactly-once file tracking comes from the
checkpoint's file index instead of a MySQL staging table, and
`maxFilesPerTrigger` gives the same per-file micro-batching the
reference achieved by rerunning the job.

``run_to_completion`` drains a bounded source with
``Trigger.AvailableNow`` into an in-memory sink and hands back the
result as a batch DataFrame — which is how the driver's oracle checks
can cover streaming plans too.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events.parquet physical schema (ts is INT64 nanos — see datasets.py).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over the events parquet with nanos→timestamp restore."""
    reader = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(sf_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def run_to_completion(
    stream_df: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
) -> DataFrame:
    """Drain a bounded stream (Trigger.AvailableNow) into a memory sink
    and return the sink table as a batch DataFrame.

    The memory sink is driver-local — test/driver harness use only; real
    deployments writeStream to parquet/Kafka with a durable checkpoint
    (see ``write_stream_parquet``)."""
    name = name or f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def write_stream_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = (),
    available_now: bool = True,
):
    """Durable file sink with checkpoint (the production shape)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_pipeline(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = True,
):
    """foreachBatch: reuse a BATCH transform/writer per micro-batch —
    how the reference's mart writers (parquet + JDBC) slot into a
    streaming pipeline without a streaming-capable sink."""
    w = stream_df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
