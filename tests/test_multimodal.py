"""Multimodal plumbing tests: Arrow-batched featurize over binary
payloads, deterministic stub features, frame-sample fan-out, and the
clearly-marked real-codec seam."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from salesdata_engineering_spark.ext.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    fake_decode_features,
    featurize,
    frame_sample_plan,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("image/png", 64, 48, None)),
        (2, "image", b"\x89PNG-fake-bytes-22", ("image/png", 32, 32, None)),
        (3, "video", b"RIFF-fake-avi", ("video/avi", 320, 240, 3500)),
        (4, "audio", b"fLaC-fake-audio", ("audio/flac", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_featurize_schema_and_determinism(spark, media):
    out = featurize(media, dim=8).orderBy("media_id").collect()
    assert [r.media_id for r in out] == [1, 2, 3, 4]
    r1 = out[0]
    assert r1.n_bytes == len(b"\x89PNG-fake-bytes-1")
    assert r1.digest == hashlib.md5(b"\x89PNG-fake-bytes-1").hexdigest()
    assert r1.features == fake_decode_features(b"\x89PNG-fake-bytes-1", 8)
    assert all(len(r.features) == 8 for r in out)
    # re-run is bit-identical (no RNG state)
    again = featurize(media, dim=8).orderBy("media_id").collect()
    assert [r.features for r in again] == [r.features for r in out]


def test_frame_sample_fanout(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # 3500ms video sampled at 0,1000,2000,3000
    assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000, 3000]
    assert {r.media_id for r in frames} == {3}


def test_decode_media_is_a_marked_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"xx", "image")


def test_payload_dropped_before_downstream(spark, media):
    out = featurize(media)
    assert "payload" not in out.columns  # binary never reaches a shuffle

def test_resize_plan_and_kernel(spark, media):
    from salesdata_engineering_spark.ext.multimodal import fake_resize_bytes, resize_images

    out = {r.media_id: r for r in resize_images(media, max_side=40).collect()}
    # only images larger than max_side resize; video/audio never enter
    assert set(out) == {1}
    r = out[1]  # 64x48 -> 40x30 (aspect preserved)
    assert (r.new_width, r.new_height) == (40, 30)
    assert bytes(r.payload) == fake_resize_bytes(b"\x89PNG-fake-bytes-1", 40, 30)
    # 32x32 image already fits: filtered out JVM-side before Python
    assert 2 not in out


def test_default_calls_leave_arrow_conf_untouched(spark, media):
    """Session conf hygiene: featurize/resize must not mutate the
    session-global Arrow batch size unless the caller opts in (the conf
    is read at execution time, so an eager set-then-restore would be a
    silent no-op — see _cap_arrow_batch)."""
    from salesdata_engineering_spark.ext.multimodal import resize_images

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key)
    featurize(media).collect()
    resize_images(media, max_side=40).collect()
    assert spark.conf.get(key) == before
    # explicit opt-in DOES set it (and is executed with the bound live)
    featurize(media, batch_size=2).collect()
    assert spark.conf.get(key) == "2"
    spark.conf.set(key, before)
