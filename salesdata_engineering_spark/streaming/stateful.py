"""Custom stateful streaming operators (applyInPandasWithState).

The built-in stateful ops (windowed aggs, dropDuplicates,
session_window — streaming/windows.py) cover the reference surface;
this module is the escape hatch for state machines Spark has no
operator for, per the north-star's "custom stateful operators" row.

``running_user_totals`` keeps one (count, total) accumulator per user
in Spark's managed state store and emits the updated totals every
micro-batch the user appears in. The state store is checkpointed with
the query, so a restart resumes the accumulation exactly — the same
guarantee the reference hand-rolled with its MySQL staging ledger
(/root/reference src/main/transformations/jobs/main.py:39-49), applied
to per-key aggregation state instead of file status.

Scale shape: state is hash-partitioned by the grouping key across
executors (one shuffle per batch), each key's state is O(1) bytes, and
Pandas batches arrive Arrow-vectorized — this is the
applyInPandasWithState contract, identical on local[32] and a
1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the persisted (n, total).

    Never materializes the group — pdfs is an iterator of Arrow batches;
    only two scalars live in state.
    """
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) with managed state.

    Works on a streaming DataFrame (state carried across micro-batches
    via the checkpoint) — each emitted row is the accumulator AFTER
    folding the current batch, so draining a bounded source with one
    file per trigger yields the per-batch running history and the last
    row per user equals the global aggregate.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
