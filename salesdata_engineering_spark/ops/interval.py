"""Interval (range) join — banded equi-join formulation.

A plain inequality join (``l.ts BETWEEN r.ts AND r.ts + 10min``) gives
Catalyst no equi-key, so it plans BroadcastNestedLoopJoin — O(|L|·|R|)
comparisons and a broadcast requirement; unusable at scale. The banded
rewrite turns it into an equi-join: quantize time into buckets at least
as wide as the interval, explode the PROBE side into the (at most two)
buckets its match window can overlap, equi-join on (keys, bucket), then
apply the exact bound as a post-filter. Cost: one hash-partition
shuffle on (keys, bucket), ≤2× probe-row duplication, zero pairwise
scan — the same plan shape at sf0.01 and at 100 TB. (This is the
standard banding trick behind range-join optimizers; here it's plain
DataFrame ops.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_delay: str,
) -> DataFrame:
    """Pairs (l, r) sharing ``keys`` with
    ``l.ts <= r.ts <= l.ts + max_delay`` (e.g. every error within
    ``max_delay`` after a click).

    ``max_delay`` is an interval literal like ``'10 minutes'``; it is
    also the band width, so each left row probes exactly its own and
    the next bucket."""
    width = F.expr(f"unix_timestamp(timestamp '1970-01-01 00:00:00' + interval {max_delay})")
    r_bucket = F.floor(F.unix_timestamp(F.col(right_ts)) / width)
    l_bucket = F.floor(F.unix_timestamp(F.col(left_ts)) / width)
    lt = left.withColumn("_bucket", F.explode(F.array(l_bucket, l_bucket + 1)))
    rt = right.withColumn("_bucket", r_bucket)
    cond = (F.col(left_ts) <= F.col(right_ts)) & (
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"interval {max_delay}")
    )
    return lt.join(rt, [*keys, "_bucket"]).filter(cond).drop("_bucket")
