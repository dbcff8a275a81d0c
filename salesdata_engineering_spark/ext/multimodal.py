"""Multimodal (image/audio/video) column support (north-star extension).

Design: media is an opaque ``binary`` column + typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
Pandas functions under ``mapInPandas`` — the standard shape for Python
per-item compute in a Spark plan (vectorized transfer, no per-row
pickling). Real codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are STUBS:

- ``decode_media`` raises NotImplementedError (clearly marked seam
  where a real codec plugs in), and
- ``fake_decode_features`` is a deterministic md5-based stand-in that
  exercises the identical Spark-side plumbing (schema, batching,
  partitioning) and is cross-checkable in DuckDB.

Scale notes: media rows are large and skew-prone — keep binary columns
OUT of shuffles (derive features first, then drop the payload), size
``spark.sql.files.maxPartitionBytes`` so one task holds a few hundred
items, and ``repartition`` before mapInPandas when the source is a few
giant files. maxRecordsPerBatch bounds Arrow batch memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_media(payload: bytes, kind: str):  # pragma: no cover - stub
    """REAL-CODEC SEAM. Decode bytes into pixels/samples/frames.

    Plug in PIL / soundfile / pyav here in a real deployment; this
    container ships no media libraries."""
    raise NotImplementedError(
        f"no codec for kind={kind!r} in this environment; "
        "wire a real decoder (PIL/ffmpeg) into decode_media()"
    )


def fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in 'embedding': dim doubles derived from the
    md5 of the payload — exercises the exact plumbing a real encoder
    would (bytes in, float vector out), reproducible cross-engine."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{i}:".encode() + payload).hexdigest()[:15]
        out.append((int(h, 16) % 2001 - 1000) / 1000.0)
    return out


def _cap_arrow_batch(df: DataFrame, batch_size: int | None) -> None:
    """Bound Arrow batch memory for large-payload mapInPandas stages.

    ``spark.sql.execution.arrow.maxRecordsPerBatch`` is the only knob —
    there is no per-plan override — and it is read at EXECUTION time, so
    a set-then-restore around building the (lazy) plan would silently
    drop the bound before it ever applied. Hence: ``None`` (default)
    leaves the session conf untouched; an explicit value is set for the
    session and stays set, which the caller opts into knowingly."""
    if batch_size is not None:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
        )


def featurize(df: DataFrame, dim: int = 8, batch_size: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA rows.

    One Arrow batch in, one out; the binary payload never survives past
    this operator (features replace it), so downstream shuffles stay
    narrow. Pass ``batch_size`` to cap Arrow batch memory when payloads
    are real media (session-scoped — see ``_cap_arrow_batch``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NULL payloads (absent/corrupt media — routine at 100 TB) take
        # SQL NULL-propagation semantics: NULL n_bytes/digest/features,
        # matching octet_length(NULL)/md5(NULL). The nullable Int32
        # dtype keeps Arrow happy where plain int32 would reject NA.
        for pdf in batches:
            pay = pdf["payload"]
            ok = pay.notna()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(
                        [len(b) if o else None for b, o in zip(pay, ok)],
                        dtype="Int32",
                    ),
                    "digest": [
                        hashlib.md5(b).hexdigest() if o else None
                        for b, o in zip(pay, ok)
                    ],
                    "features": [
                        fake_decode_features(b, dim) if o else None
                        for b, o in zip(pay, ok)
                    ],
                }
            )

    _cap_arrow_batch(df, batch_size)
    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (decode stubbed). Shows the explode-shaped plumbing: rows
    multiply by duration/every_ms BEFORE the (stubbed) per-frame decode,
    so frame work parallelizes across tasks."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "payload", "meta")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def fake_resize_bytes(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a pixel resample: a digest-derived
    payload tagged with the target dims — same bytes-in/bytes-out
    contract a real PIL/ffmpeg resize kernel has."""
    return hashlib.md5(payload).digest() + f":{w}x{h}".encode()

def resize_images(df: DataFrame, max_side: int = 224, batch_size: int | None = None) -> DataFrame:
    """Aspect-preserving image resize under ``mapInPandas``.

    Target dims are PURE METADATA math and computed JVM-side BEFORE the
    Python stage (codegen; rows where the image is already small enough
    skip Python entirely via the filter) — only the pixel resample
    itself crosses into the Arrow batch, through the same real-codec
    seam as ``decode_media`` (``fake_resize_bytes`` stands in: no
    PIL/ffmpeg in this container)."""
    scale = F.lit(max_side) / F.greatest(F.col("meta.width"), F.col("meta.height"))
    needs = (
        df.filter((F.col("kind") == "image") & (F.greatest("meta.width", "meta.height") > max_side))
        .select(
            "media_id",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.greatest((F.col("meta.width") * scale).cast("int"), F.lit(1)).alias("new_width"),
            F.greatest((F.col("meta.height") * scale).cast("int"), F.lit(1)).alias("new_height"),
            "payload",
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                fake_resize_bytes(p, w, h)
                for p, w, h in zip(pdf["payload"], pdf["new_width"], pdf["new_height"])
            ]
            yield pdf

    _cap_arrow_batch(df, batch_size)
    return needs.mapInPandas(run, RESIZED_SCHEMA)


def audio_segment_plan(
    df: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio segmentation *plan*: one output row per overlapping
    analysis window (decode stubbed), the ASR/feature-extraction
    sibling of :func:`frame_sample_plan`. Rows multiply by
    duration/hop BEFORE the (stubbed) per-segment decode, so segment
    work parallelizes across tasks; ``n_samples`` is the exact sample
    count the decoder would hand each window (from the row's own
    ``meta.sample_rate``), computed from metadata alone — the real codec plugs into the
    per-row seam exactly like ``decode_media``."""
    start = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
            F.lit(hop_ms),
        )
    )
    out = (
        df.filter(F.col("kind") == "audio")
        .withColumn("seg_start_ms", start)
        .withColumn(
            "seg_end_ms",
            F.least(F.col("seg_start_ms") + window_ms, F.col("meta.duration_ms")),
        )
    )
    # n_samples derives from the row's OWN sample rate — a hardcoded
    # 16/ms would be silently ~2.8x off for 44.1 kHz media
    n_samples = F.floor(
        (F.col("seg_end_ms") - F.col("seg_start_ms"))
        * F.col("meta.sample_rate")
        / 1000
    ).cast("long")
    return out.select(
        "media_id",
        (F.col("seg_start_ms") / hop_ms).cast("long").alias("seg_idx"),
        "seg_start_ms",
        "seg_end_ms",
        n_samples.alias("n_samples"),
        "payload",
        "meta",
    )
