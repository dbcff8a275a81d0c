"""Event-time window operators over timestamp streams (events table).

All three window shapes are plain DataFrame transforms — the SAME
function runs in a batch plan or under readStream (Spark's unified
batch/streaming semantics). Watermarking is the caller's choice via
``withWatermark`` before the agg (see runner.py); in batch it's a no-op.

Scale notes: tumbling/sliding aggs are hash aggregates on (window,
keys) — partial aggregation map-side, one shuffle. Session windows
shuffle on the session keys and merge ranges per key (Spark's
UpdatingSessionsIterator); skewed users → AQE skew handling, or salt by
(user, day) when sessions can't span days.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _window_cols(win: Column) -> list[Column]:
    return [
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
    ]


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    **aggs: Column,
) -> DataFrame:
    """Fixed, non-overlapping event-time windows (`F.window(ts, d)`).

    Rows with a NULL event time are dropped EXPLICITLY (all three
    shapes): a NULL timestamp has no window, which is also what a
    watermarked stream does with it — the explicit IsNotNull documents
    that and pushes to the scan instead of dying inside the window
    expression (all-NULL-column probe axis, round 11).
    """
    g = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.window(ts_col, duration).alias("_w"), *keys
    )
    out = g.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(*_window_cols(F.col("_w")), *keys, *aggs.keys())


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    **aggs: Column,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows.
    NULL event times are dropped — see tumbling_agg."""
    g = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.window(ts_col, duration, slide).alias("_w"), *keys
    )
    out = g.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(*_window_cols(F.col("_w")), *keys, *aggs.keys())


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    **aggs: Column,
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of inactivity.

    Window = [first event, last event + gap). Equivalent to the classic
    gaps-and-islands rewrite (lag + cumulative new-session flags) — the
    oracle proves that equivalence; in streaming mode this is Spark's
    native stateful session operator instead of a window-function scan.
    """
    g = df.filter(F.col(ts_col).isNotNull()).groupBy(
        F.session_window(ts_col, gap).alias("_w"), *keys
    )
    out = g.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        *keys,
        *aggs.keys(),
    )
