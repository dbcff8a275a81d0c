"""Registry entries for event-time windows and Structured Streaming.

The window operators run the SAME DataFrame transform in batch and
streaming plans; `stream_tumbling_counts` actually executes a streaming
query (file source → watermark → windowed agg → AvailableNow drain into
a memory sink) and hands the driver the sink as a batch DataFrame — so
even the streaming path is oracle-checked.

Oracle timestamp rule: DuckDB's to_timestamp() yields TIMESTAMPTZ
(renders with +00:00, breaking the canonical compare); make_timestamp
(microseconds) yields naive UTC exactly like Spark's session-UTC
timestamps.

Money/value rule: events.value is a 2-decimal double; SUM in
DECIMAL(12,2) (exact, order-independent) and cast out to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .datasets import load_tables
from .ext.hashing import md5_long, sql_md5_long
from .registry import register
from .streaming.runner import read_events_stream, run_to_completion
from .streaming.windows import session_agg, sliding_agg, tumbling_agg

_VAL = "CAST(value AS DECIMAL(12,2))"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


def _events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with NULL timestamps dropped — the sequence/time-series
    intake. An event with no timestamp has no position in an ordered
    stream and no hour bucket; including it at either end (Spark's
    implicit asc puts NULLs FIRST, DuckDB's LAST) fabricates
    transitions that differ per engine. Queries using this loader
    mirror it with WHERE ts IS NOT NULL in their oracles. Free pushed
    IsNotNull on contract-valid data (nullmix probe axis, round 11)."""
    return _events(spark, sf_dir).filter(F.col("ts").isNotNull())


def _events_sane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_events_ts plus the SANE EVENT-TIME DOMAIN (extreme probe axis,
    r12) — the intake for queries that generate a DATA-DRIVEN DENSE
    GRID from [min(ts), max(ts)] (hourly gap-fill / interpolation):
    one corrupt pre-epoch or far-future timestamp widens their spine
    from a few thousand rows to millions of hours x series (a 1899 ->
    2199 domain is 2.6M hours), turning the "tiny KB-sized spine" of
    the docstrings into the dominant cost in BOTH engines. Same
    (1970-01-01, 2100-01-01) exclusive-epoch domain as the streaming
    intake (streaming/runner.py read_events_stream); oracles mirror
    with the same predicate."""
    return _events_ts(spark, sf_dir).filter(
        (F.col("ts") > F.lit("1970-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2100-01-01").cast("timestamp"))
    )


def _dec_val() -> F.Column:
    return F.col("value").cast("decimal(12,2)")


@register(
    "events_tumbling_counts",
    f"""
    SELECT make_timestamp((floor(epoch(ts)/600)::BIGINT * 600) * 1000000) AS window_start,
           make_timestamp(((floor(epoch(ts)/600)::BIGINT + 1) * 600) * 1000000) AS window_end,
           event_type,
           count(*) AS n,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
    """,
    doc="Tumbling 10-minute event-time windows per event_type "
    "(engine extension; SURVEY §2.9 — reference has no streaming/window surface).",
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tumbling_agg(
        _events(spark, sf_dir),
        "ts",
        "10 minutes",
        ["event_type"],
        n=F.count("*"),
        sum_value=F.sum(_dec_val()).cast("double"),
    )
    return out


#: Sliding-window oracle (10-min length / 5-min slide: every event in
#: exactly 2 windows, both starts derived arithmetically) — shared by
#: the batch operator and its streaming twin.
#: The streaming intake's EVENT-TIME SANITY DOMAIN (extreme probe axis,
#: r12), mirrored into every streaming oracle: read_events_stream
#: quarantines pre-epoch, EXACTLY-epoch-zero (the runtime's initial
#: watermark — droppable as late; also the classic zero-initialized
#: sentinel), and >= 2100-01-01 timestamps, because one
#: corrupt far-future row advances every watermark to its horizon and
#: silently drops ALL later-arriving valid events — the batch oracle
#: cannot express watermark drops, so engine and oracle must agree the
#: poisoned rows never enter. NULL ts passes through (each query's
#: NULL-event-time convention is applied downstream, unchanged).
_SANE_EVENTS_SQL = (
    "(SELECT * FROM events WHERE ts IS NULL OR (ts > TIMESTAMP "
    "'1970-01-01 00:00:00' AND ts < TIMESTAMP '2100-01-01 00:00:00')) "
    "events"
)


def _stream_oracle(sql: str) -> str:
    """The streaming twin of a batch oracle: same SQL with the events
    scan replaced by the sanity-domain quarantine subquery — documented
    proof that streaming results equal batch results OVER THE DOMAIN
    the watermark contract admits."""
    return sql.replace("FROM events", f"FROM {_SANE_EVENTS_SQL}")



_SLIDING_ORACLE = f"""
    SELECT make_timestamp(((floor(epoch(ts)/300)::BIGINT - k.k) * 300) * 1000000) AS window_start,
           make_timestamp((((floor(epoch(ts)/300)::BIGINT - k.k) + 2) * 300) * 1000000) AS window_end,
           count(*) AS n,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value
    FROM events, (SELECT unnest([0, 1]) AS k) k
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """


@register(
    "events_sliding_avg",
    _SLIDING_ORACLE,
    doc="Sliding windows (10-minute length, 5-minute slide): every event "
    "lands in exactly 2 windows; oracle derives both starts arithmetically.",
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(
        _events(spark, sf_dir),
        "ts",
        "10 minutes",
        "5 minutes",
        [],
        n=F.count("*"),
        sum_value=F.sum(_dec_val()).cast("double"),
    )


_GAP_S = 6 * 3600


#: One sessionization semantics, shared by the batch query, the
#: streaming twin, and (as the proof) this gaps-and-islands oracle.
_SESSION_ORACLE = f"""
    WITH lagd AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events WHERE ts IS NOT NULL
    ),
    flag AS (
        SELECT *, CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) >= {_GAP_S}
                       THEN 1 ELSE 0 END AS new_s
        FROM lagd
    ),
    isl AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flag
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 6 HOUR AS session_end,
           user_id,
           count(*) AS n_events,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value
    FROM isl GROUP BY user_id, sid
    """


def _session_windows(df: DataFrame) -> DataFrame:
    return session_agg(
        df,
        "ts",
        "6 hours",
        ["user_id"],
        n_events=F.count("*"),
        sum_value=F.sum(_dec_val()).cast("double"),
    )


@register(
    "events_session_windows",
    _SESSION_ORACLE,
    doc="Per-user session windows (6h inactivity gap) via native "
    "session_window; the oracle proves equivalence to the gaps-and-islands "
    "rewrite. Session end = last event + gap (half-open: an event exactly "
    "gap later starts a NEW session — hence >= in the oracle).",
)
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _session_windows(_events(spark, sf_dir))


@register(
    "stream_session_windows",
    _stream_oracle(_SESSION_ORACLE),
    doc="STREAMING session windows (new r6): the same 6h-gap "
    "sessionization on the live runtime — file source -> 1h watermark "
    "-> native stateful session_window aggregate -> AvailableNow drain "
    "(complete mode: session aggregates don't support update, and "
    "append would hold back sessions the final watermark hasn't "
    "passed). Drained, the session set equals the batch operator's — "
    "and both equal the ONE gaps-and-islands oracle, the same "
    "one-semantics-N-runtimes contract as the CDC trio. State scales "
    "as open sessions per user (merged on gap overlap by the session "
    "operator), watermark bounds it.",
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    return run_to_completion(
        _session_windows(stream), output_mode="complete"
    )


@register(
    "events_type_stats",
    f"""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value,
           round(CAST(SUM({_VAL}) AS DOUBLE) / count(*), 6) AS avg_value,
           CAST(min(value) AS DOUBLE) AS min_value,
           CAST(max(value) AS DOUBLE) AS max_value
    FROM events GROUP BY 1
    """,
    doc="Per-type event stats (count/sum/avg/min/max on the stream table).",
)
def q_events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(_dec_val()).cast("double").alias("sum_value"),
        F.round(F.sum(_dec_val()).cast("double") / F.count("*"), 6).alias("avg_value"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
    )


@register(
    "stream_tumbling_counts",
    _stream_oracle(f"""
    SELECT make_timestamp((floor(epoch(ts)/600)::BIGINT * 600) * 1000000) AS window_start,
           make_timestamp(((floor(epoch(ts)/600)::BIGINT + 1) * 600) * 1000000) AS window_end,
           event_type,
           count(*) AS n
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
    """),
    doc="REAL Structured Streaming run: file source (readStream) → "
    "1-hour watermark → tumbling window count → Trigger.AvailableNow "
    "drain → memory sink returned as a batch frame. Unified semantics "
    "make the result equal the batch oracle.",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = tumbling_agg(stream, "ts", "10 minutes", ["event_type"], n=F.count("*"))
    return run_to_completion(agg, output_mode="complete")


@register(
    "stream_stateful_totals",
    _stream_oracle("""
    SELECT user_id, count(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
    FROM events GROUP BY 1
    """),
    doc="Custom stateful operator (applyInPandasWithState): per-user "
    "running (count, sum) accumulators in Spark's managed state store, "
    "streaming/stateful.py. Drained with AvailableNow in one batch, the "
    "final per-user state equals the batch GROUP BY — which is the "
    "oracle. Cross-micro-batch state carry is covered in "
    "tests/test_streaming.py.",
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.stateful import running_user_totals

    stream = read_events_stream(spark, sf_dir)
    out = run_to_completion(running_user_totals(stream), output_mode="update")
    # one emission per (user, micro-batch); keep the final accumulator
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("user_id", "n_events", F.round("total_value", 2).alias("total_value"))
    )


@register(
    "asof_click_purchase",
    """
    WITH p AS (
        SELECT user_id, ts, value FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click' AND ts IS NOT NULL)
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS ts_matched, p.value AS value_matched
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="As-of join (ops/asof.py): for each click, the same user's most "
    "recent purchase at-or-before it. Union+window-last composition — "
    "O(|L|+|R|) rows, one key shuffle, no range-join blowup; verified "
    "against DuckDB's native ASOF LEFT JOIN. Right-side equal-ts dups "
    "collapsed deterministically (max event_id) in both engines.",
)
def q_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.asof import asof_join

    # a temporal join needs a timestamp on BOTH sides: NULL-ts rows
    # match differently per engine (DuckDB's ASOF sorts them LAST and
    # hands them the user's final purchase; Spark's union+window puts
    # them FIRST and matches nothing) — excluded, like every other
    # event-time operator (nullmix probe axis)
    e = _events_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        clicks, purchases, keys=["user_id"], ts="ts", payload=["value"], tiebreak="event_id"
    )


@register(
    "interval_join_click_error",
    """
    SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id,
           c.ts AS click_ts, e.ts AS error_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND c.ts <= e.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
    """,
    doc="Interval join (ops/interval.py): every error within 10 minutes "
    "after a click by the same user. Banded equi-join rewrite — a naive "
    "inequality join plans BroadcastNestedLoopJoin (O(|L|*|R|), plan-"
    "asserted away in tests); banding gives one hash shuffle on "
    "(user, time-bucket) at any scale. Oracle is the plain inequality "
    "join.",
)
def q_interval_join_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.interval import interval_join

    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
    )
    out = interval_join(
        clicks, errors, keys=["user_id"], left_ts="click_ts", right_ts="error_ts",
        max_delay="10 minutes",
    )
    return out.select("click_id", "error_id", "user_id", "click_ts", "error_ts")


@register(
    "stream_dedup_keys",
    _stream_oracle("""
    SELECT DISTINCT user_id, event_type FROM events
    """),
    doc="Streaming deduplication: readStream -> watermark -> "
    "dropDuplicates on the dedup key, state-store backed — the "
    "streaming half of the X1 dedup family (a live ingest pipeline "
    "dedups in-flight, not in a nightly batch). Drained with "
    "AvailableNow; only the distinct KEYS are emitted so the result is "
    "arrival-order-insensitive and equals the batch SELECT DISTINCT "
    "oracle. At scale the watermark variant "
    "(dropDuplicatesWithinWatermark) bounds the state store to the "
    "late-data horizon instead of all history.",
)
def q_stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = stream.dropDuplicates(["user_id", "event_type"])
    out = run_to_completion(
        deduped.select("user_id", "event_type"), output_mode="append"
    )
    return out.distinct()  # sink may replay across drains; keys are the contract


@register(
    "stream_dedup_within_watermark",
    _stream_oracle("""
    SELECT DISTINCT user_id, event_type FROM events
    """),
    doc="Bounded-state streaming dedup (dropDuplicatesWithinWatermark, "
    "Spark 3.5+): unlike dropDuplicates — whose state grows with ALL "
    "keys ever seen — state here is evicted once the watermark passes a "
    "key's event time, bounding the store to the late-data horizon; the "
    "guarantee narrows to 'duplicates arriving within the delay of each "
    "other are dropped'. Drained as ONE AvailableNow batch (the events "
    "source is a single file), eviction cannot fire mid-drain, so the "
    "result deterministically equals the global SELECT DISTINCT oracle; "
    "multi-batch replay semantics are exercised in "
    "tests/test_streaming.py for the plain-dropDuplicates twin.",
)
def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = stream.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    out = run_to_completion(
        deduped.select("user_id", "event_type"), output_mode="append"
    )
    return out.distinct()  # sink may replay across drains; keys are the contract


@register(
    "stream_stream_join",
    _stream_oracle("""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           c.ts AS click_ts, p.ts AS purchase_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """),
    doc="Stream-stream watermarked inner join: purchases within 30 "
    "minutes after a click by the same user, BOTH sides readStream. The "
    "time-range join condition plus the 1-hour watermarks is what lets "
    "Spark evict join state (without it, both sides buffer forever — "
    "the scale-critical part of a streaming join). Inner-join matches "
    "are emitted as soon as both rows arrive, so the AvailableNow drain "
    "equals the batch interval join — which is the oracle. Streaming "
    "counterpart of ops/interval.py; unit-level late-data behavior in "
    "tests/test_streaming.py.",
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    def side(event_type: str, alias: str) -> DataFrame:
        s = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
        return s.filter(F.col("event_type") == event_type).select(
            F.col("event_id").alias(f"{alias}_id"),
            F.col("user_id").alias(f"_{alias}_user"),
            F.col("ts").alias(f"{alias}_ts"),
        )

    clicks, purchases = side("click", "click"), side("purchase", "purchase")
    joined = clicks.join(
        purchases,
        (F.col("_click_user") == F.col("_purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    out = run_to_completion(joined, output_mode="append")
    return out.select(
        "click_id",
        "purchase_id",
        F.col("_click_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
    )


@register(
    "stream_static_enrich",
    _stream_oracle(f"""
    SELECT make_timestamp((floor(epoch(ts)/600)::BIGINT * 600) * 1000000) AS window_start,
           c_mktsegment AS segment,
           count(*) AS n,
           round(CAST(SUM({_VAL}) AS DOUBLE), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """),
    doc="Stream-static join: the streaming events source enriched by the "
    "STATIC customer dimension (joined per micro-batch — no state, no "
    "watermark needed on the static side; at scale the dim broadcasts "
    "or bucket-joins exactly like a batch star join), then a tumbling "
    "per-segment count/sum drained with AvailableNow. Unified batch/"
    "stream semantics make the memory-sink result equal the plain "
    "join+GROUP BY oracle.",
)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load_tables(spark, sf_dir)["customer"].select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    stream = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
    )
    agg = (
        stream.groupBy(F.window("ts", "10 minutes"), "segment")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec_val()).alias("_tv"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "segment",
            "n",
            F.round(F.col("_tv").cast("double"), 2).alias("total_value"),
        )
    )
    return run_to_completion(agg, output_mode="complete")


def _funnel_steps(frames: list[tuple[int, str, DataFrame]], alias: str) -> DataFrame:
    """Stack per-step count scalars into (step_no, step, <alias>) rows —
    shared by the global and sessionized funnels."""
    out = None
    for no, name, df in frames:
        piece = df.agg(F.count("*").alias(alias)).select(
            F.lit(no).alias("step_no"), F.lit(name).alias("step"), alias
        )
        out = piece if out is None else out.unionAll(piece)
    return out


@register(
    "events_funnel_conversion",
    """
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(ts) AS t2
          FROM events e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
    p AS (SELECT e.user_id, min(ts) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
    SELECT * FROM (
        SELECT 1 AS step_no, 'view' AS step, count(*) AS users FROM v
        UNION ALL SELECT 2, 'click', count(*) FROM c
        UNION ALL SELECT 3, 'purchase', count(*) FROM p
    )
    """,
    doc="Ordered funnel analysis (view -> click -> purchase): each step "
    "counts users whose FIRST qualifying event strictly follows their "
    "previous step's timestamp — the product-analytics conversion "
    "funnel, an operator family the reference lacks entirely. Scale "
    "shape: all three aggregates and both joins key on user_id, so the "
    "whole funnel is ONE shuffle key; the per-step frames are "
    "|users|-sized and join as broadcasts at real scale. Deepening the "
    "funnel adds joins on the same key, never a new shuffle key.",
    bench=True,
)
def q_events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    return _funnel_steps([(1, "view", v), (2, "click", c), (3, "purchase", p)], "users")


@register(
    "events_retention_cohorts",
    """
    WITH first AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY 1
    ),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, wk) / 7 AS INTEGER) AS week_no,
           count(*) AS active_users
    FROM act JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Weekly retention cohorts: users bucketed by the week of their "
    "first event, counted once per (cohort, activity-week) — the "
    "classic retention triangle. Scale shape: the first-seen aggregate "
    "and the per-user-week DISTINCT both shuffle on user_id (shared "
    "key), the cohort join is |users|-sized, and the final (cohort, "
    "week) aggregate is tiny. Spark datediff(wk, cohort)/7 == DuckDB "
    "date_diff('day', ...) / 7 — integer division on exact day counts, "
    "and both engines' date_trunc('week') is Monday-based.",
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = e.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_no"),
        )
        .agg(F.count("*").alias("active_users"))
    )


@register(
    "events_hourly_gapfill",
    """
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                      date_trunc('hour', max(ts)) AS hi FROM events
               WHERE ts > TIMESTAMP '1970-01-01 00:00:00' AND ts < TIMESTAMP '2100-01-01 00:00:00'),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
              FROM b),
    c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
                 SUM(CAST(value AS DECIMAL(12,2))) AS sv
          FROM events WHERE ts > TIMESTAMP '1970-01-01 00:00:00' AND ts < TIMESTAMP '2100-01-01 00:00:00' GROUP BY 1)
    SELECT spine.hour, COALESCE(c.n, 0) AS n,
           CAST(COALESCE(round(c.sv, 2), 0.0) AS DOUBLE) AS sum_value
    FROM spine LEFT JOIN c USING (hour)
    """,
    doc="Time-series resample + gap fill: an hourly spine generated "
    "from the corpus min/max (sequence-explode of a 1-row aggregate) "
    "left-joined to hourly counts, missing hours filled with zero "
    "rows — the resampling primitive dashboards and downstream window "
    "models need (a groupBy alone silently DROPS empty buckets). "
    "Scale shape: the spine is tiny (hours, not events) and "
    "broadcast-joins to the single hash-aggregated counts frame; event "
    "rows shuffle once.",
)
def q_events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_sane(spark, sf_dir)
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    counts = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"), F.sum(_dec_val()).alias("sv")
    )
    return spine.join(counts, "hour", "left_outer").select(
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.round(F.col("sv"), 2), F.lit(0.0)).cast("double").alias("sum_value"),
    )


@register(
    "events_hourly_interpolate",
    """
    WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                      date_trunc('hour', max(ts)) AS hi FROM events
               WHERE ts > TIMESTAMP '1970-01-01 00:00:00' AND ts < TIMESTAMP '2100-01-01 00:00:00'),
    types AS (SELECT DISTINCT event_type FROM events WHERE ts > TIMESTAMP '1970-01-01 00:00:00' AND ts < TIMESTAMP '2100-01-01 00:00:00'),
    spine AS (SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
              FROM b, types),
    k AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                 count(*) AS n, SUM(CAST(value AS DECIMAL(12,2))) AS sv
          FROM events WHERE ts > TIMESTAMP '1970-01-01 00:00:00' AND ts < TIMESTAMP '2100-01-01 00:00:00' AND value > 150 GROUP BY 1, 2),
    g AS (SELECT s.event_type, s.hour, COALESCE(k.n, 0) AS n,
                 CAST(k.sv AS DOUBLE) / k.n AS ka
          FROM spine s LEFT JOIN k USING (event_type, hour)),
    w AS (SELECT event_type, hour, n, ka,
                 last_value(ka IGNORE NULLS) OVER wb AS pv,
                 last_value(CASE WHEN ka IS NOT NULL THEN hour END
                            IGNORE NULLS) OVER wb AS pt,
                 first_value(ka IGNORE NULLS) OVER wf AS nv,
                 first_value(CASE WHEN ka IS NOT NULL THEN hour END
                             IGNORE NULLS) OVER wf AS nt
          FROM g
          WINDOW wb AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY event_type ORDER BY hour
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, hour, n,
           floor((CASE WHEN ka IS NOT NULL THEN ka
                       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                            pv + (nv - pv) * ((epoch(hour) - epoch(pt))
                                              / (epoch(nt) - epoch(pt)))
                  END) * 1e6 + 0.5) / 1e6 AS avg_value
    FROM w
    """,
    doc="Per-series linear interpolation over a gap-filled hourly grid "
    "— the missing-value repair step after resampling (gap-fill "
    "inserts the empty buckets; this estimates them): for each "
    "(event_type, hour) with no qualifying observations (value > 150 "
    "keeps the series sparse so the interpolation path actually "
    "exercises), the value is the time-weighted blend of the nearest "
    "known neighbors, pv + (nv-pv)*(t-pt)/(nt-pt); hours before the "
    "first / after the last known point stay NULL (no extrapolation). "
    "LOCF carry-forward/backward comes from IGNORE NULLS window "
    "navigation over the tiny spine grid (types x hours — KB-sized at "
    "any corpus scale; the event rows themselves shuffle once into "
    "the hourly aggregate). Interpolation weights are exact integer "
    "epoch-second differences, so both engines compute identical "
    "doubles.",
)
def q_events_hourly_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_sane(spark, sf_dir)
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    ).crossJoin(e.select("event_type").distinct())
    known = (
        e.filter(F.col("value") > 150)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"), F.sum(_dec_val()).alias("_sv"))
    )
    g = spine.join(known, ["event_type", "hour"], "left_outer").select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        (F.col("_sv").cast("double") / F.col("n")).alias("_ka"),
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward look runs on a DESCENDING prefix frame, NOT
    # [currentRow, unboundedFollowing]: Spark's unbounded-FOLLOWING
    # frame recomputes its aggregate from scratch per row — O(n^2) per
    # partition, found hanging on the extreme probe's 123k-hour spine
    # (a few hundred hours hid it); last() over the reversed prefix is
    # the same value in O(n), at the cost of one extra sort on the
    # same exchange
    wf = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    known_hour = F.when(F.col("_ka").isNotNull(), F.col("hour"))
    w = g.select(
        "event_type",
        "hour",
        "n",
        "_ka",
        F.last("_ka", ignorenulls=True).over(wb).alias("_pv"),
        F.last(known_hour, ignorenulls=True).over(wb).alias("_pt"),
        F.last("_ka", ignorenulls=True).over(wf).alias("_nv"),
        F.last(known_hour, ignorenulls=True).over(wf).alias("_nt"),
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("_pt")).cast("double")
        / (F.unix_timestamp("_nt") - F.unix_timestamp("_pt")).cast("double")
    )
    filled = (
        F.when(F.col("_ka").isNotNull(), F.col("_ka"))
        .when(
            F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
            F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac,
        )
    )
    # floor-quantized to micro-units, NOT round(_, 6): the engines'
    # double-round implementations disagree in the last digit near
    # rounding boundaries (caught at sf0.01); floor(x*1e6 + 0.5) is the
    # same IEEE ops in both (the PQ-ADC picounit trick at 1e6)
    return w.select(
        "event_type",
        "hour",
        "n",
        (F.floor(filled * 1e6 + 0.5) / 1e6).alias("avg_value"),
    )


@register(
    "events_hourly_anomalies",
    """
    WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
               FROM events GROUP BY 1),
    st AS (SELECT CAST(SUM(n) AS BIGINT) AS s,
                  CAST(SUM(n * n) AS BIGINT) AS s2,
                  count(*) AS cnt
           FROM c)
    SELECT hour, n,
           CASE WHEN CAST(s2 AS DOUBLE) / cnt
                     - (CAST(s AS DOUBLE) / cnt) * (CAST(s AS DOUBLE) / cnt) > 0
           THEN
           round((n - CAST(s AS DOUBLE) / cnt)
                 / sqrt(CAST(s2 AS DOUBLE) / cnt
                        - (CAST(s AS DOUBLE) / cnt) * (CAST(s AS DOUBLE) / cnt)),
                 6) END AS z,
           CASE WHEN CAST(s2 AS DOUBLE) / cnt
                     - (CAST(s AS DOUBLE) / cnt) * (CAST(s AS DOUBLE) / cnt) > 0
                AND abs((n - CAST(s AS DOUBLE) / cnt)
                 / sqrt(CAST(s2 AS DOUBLE) / cnt
                        - (CAST(s AS DOUBLE) / cnt) * (CAST(s AS DOUBLE) / cnt)))
                > 2.0 THEN 1 ELSE 0 END AS is_anomaly
    FROM c CROSS JOIN st
    """,
    doc="Hourly volume anomaly flags: population z-score of per-hour "
    "event counts, |z| > 2 flagged — the ops-observability gate over "
    "the same integer-exact moment sums the stats family uses (S and "
    "S2 are exact BIGINT sums, so mean/variance are order-independent "
    "and the z boundary is bit-identical cross-engine; only the final "
    "fixed IEEE divide/sqrt sequence touches doubles). One hash "
    "aggregate + a broadcast 1-row moment frame; event rows shuffle "
    "once.",
)
def q_events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    c = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    st = c.agg(
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count("*").alias("cnt"),
    )
    mean = F.col("s").cast("double") / F.col("cnt")
    var = F.col("s2").cast("double") / F.col("cnt") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    # Zero-variance guard: when every hour bucket has the same count (or
    # there is a single bucket), var == 0 and Spark's non-ANSI divide
    # yields NULL while DuckDB's double divide yields NaN/inf — gate the
    # z-score on the SAME double expression both engines compute so the
    # boundary agrees bit-for-bit (stats_bivariate_regression convention).
    return c.crossJoin(F.broadcast(st)).select(
        "hour",
        "n",
        F.when(var > 0, F.round(z, 6)).alias("z"),
        F.when((var > 0) & (F.abs(z) > 2.0), 1).otherwise(0).alias("is_anomaly"),
    )


from .registry_maintenance import CDC_SNAPSHOT_ORACLE  # noqa: E402


@register(
    "stream_cdc_latest",
    _stream_oracle(CDC_SNAPSHOT_ORACLE),
    doc="Streaming CDC apply-changes (streaming/stateful.py "
    "streaming_cdc_latest): the batch cdc_apply_changes semantics on "
    "the live runtime — per-key last-writer-wins state folded by max "
    "(ts, event_id) in applyInPandasWithState, one O(1) tuple per key "
    "in the managed store, snapshot rows emitted per micro-batch "
    "(update mode). Drained with AvailableNow the final state equals "
    "the batch max_by snapshot, which IS the oracle — one semantics, "
    "two runtimes. Tombstones filter after the drain, same as batch.",
)
def q_stream_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.stateful import streaming_cdc_latest

    stream = read_events_stream(spark, sf_dir)
    out = run_to_completion(streaming_cdc_latest(stream), output_mode="update")
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ts").desc(), F.col("last_seq").desc()
    )
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter((F.col("_rk") == 1) & (F.col("last_op") != "error"))
        .select("user_id", "last_op", "last_value", "last_ts")
    )


@register(
    "stream_upsert_sink_snapshot",
    _stream_oracle(CDC_SNAPSHOT_ORACLE),
    doc="foreachBatch UPSERT sink (streaming/runner.py "
    "run_foreach_batch_upsert): the third runtime for the ONE CDC "
    "snapshot semantics - batch max_by (cdc_apply_changes), managed "
    "state (stream_cdc_latest), and now a durable incremental sink: "
    "each micro-batch merges into a parquet snapshot by last-writer "
    "max_by, exactly-once per epoch via the checkpoint, idempotent on "
    "replay (max_by absorbs duplicates). The final snapshot read back "
    "from disk verifies against the same shared oracle. At real scale "
    "the per-batch overwrite becomes MERGE INTO a table format; the "
    "per-batch plan is identical.",
)
def q_stream_upsert_sink_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from .streaming.runner import run_foreach_batch_upsert

    # same last-writer pick order as the other two CDC paths (see
    # CDC_SNAPSHOT_ORACLE): NULL-ts changes excluded, payload columns
    # as final tie-breaks
    stream = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", "value", "ts", "event_id")
    )
    # FIXED per-(query, sf_dir, PROCESS) paths, cleaned at the start of
    # each invocation: a driver/check loop re-running this query reuses
    # one snapshot + checkpoint slot instead of accumulating a fresh
    # mkdtemp set per run (the same per-invocation-leak bound
    # swap_persist gives in-memory frames). The pid in the tag keeps
    # CONCURRENT processes (driver loop + a manual check_all) from
    # rmtree'ing each other's live checkpoint mid-stream; slots are
    # bounded by distinct pids, and the dirs must outlive the return
    # because the result frame lazily reads the snapshot.
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.getpid()}".encode()
    ).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"upsert_sink_{tag}")
    out_dir, ckpt = f"{base}.snap", f"{base}.ckpt"
    for d in (out_dir, f"{out_dir}.new", f"{out_dir}.old", ckpt):
        shutil.rmtree(d, ignore_errors=True)
    run_foreach_batch_upsert(
        stream, out_dir, "user_id",
        ["ts", "event_id", "event_type", "value"], checkpoint=ckpt,
    )
    snap = spark.read.parquet(out_dir)
    return snap.filter(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.col("value").cast("double").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "events_rolling_wau",
    """
    WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day, count(DISTINCT du.user_id) AS wau
    FROM days d JOIN du
         ON du.day <= d.day AND du.day > d.day - INTERVAL 7 DAY
    GROUP BY 1
    """,
    doc="Rolling 7-day active users per day (WAU) — the trailing-window "
    "distinct-count product metric. Shape: the fact collapses FIRST to "
    "distinct (day, user) pairs (one hash shuffle over the events) — "
    "countDistinct cannot run in a RANGE window frame, and exploding "
    "each raw event into 7 window copies before deduplication would "
    "multiply the fact 7x. Each collapsed (day, user) row then explodes "
    "into its <=7 candidate target days and equi-joins the broadcast "
    "day spine (drops targets with no events) before the final "
    "distinct count — a pure hash join + hash agg, no "
    "BroadcastNestedLoopJoin (the r5 banded-join form evaluated "
    "|days| x |day-users| pairs; this is |day-users| x 7 rows through "
    "an equi-join, linear in the collapsed frame and still independent "
    "of raw event volume at 100 TB). Plan-asserted BNLJ-free in "
    "test_plans.py.",
)
def q_events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    du = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = du.select(F.col("day").alias("d")).distinct()
    cand = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d"),
        "user_id",
    )
    return (
        cand.join(F.broadcast(days), "d")
        .groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "events_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n,
           round(count(*) / CAST(SUM(count(*)) OVER (PARTITION BY event_type)
                                 AS DOUBLE), 6) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="First-order event transition matrix: per-user event streams "
    "ordered by (ts, event_id), adjacent pairs counted into "
    "(from, to) cells with row-normalized probabilities — the Markov "
    "view behind next-action prediction and anomalous-flow detection. "
    "One (user) window pass + one tiny (from, to) aggregate; the "
    "normalizing window runs over the |types|^2 cell frame, never the "
    "events. The probability denominator is an exact integer sum, so "
    "p is a single deterministic division.",
)
def q_events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cells = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    wn = Window.partitionBy("from_type")
    return cells.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn).cast("double"), 6).alias("p"),
    )


@register(
    "events_time_rollup",
    """
    SELECT * FROM (
        SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'day', date_trunc('day', ts), count(*),
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'week', date_trunc('week', ts), count(*),
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        FROM events GROUP BY 2
    )
    """,
    doc="Multi-granularity time rollup (hour/day/week) in ONE pass: "
    "Spark GROUPING SETS over the three truncation columns — the scan "
    "and the partial aggregation run once and Expand fans each row "
    "into its three grains before the shuffle, where the oracle's "
    "3-way UNION (and a naive pipeline) scans three times. grouping_id "
    "picks the surviving trunc per set; decimal sums stay exact "
    "per grain. The standard pre-aggregation cube a metrics store "
    "maintains.",
)
def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        F.date_trunc("hour", "ts").alias("_h"),
        F.date_trunc("day", "ts").alias("_d"),
        F.date_trunc("week", "ts").alias("_w"),
        _dec_val().alias("_v"),
    )
    grain = (
        F.when((F.grouping("_d") == 1) & (F.grouping("_w") == 1), "hour")
        .when((F.grouping("_h") == 1) & (F.grouping("_w") == 1), "day")
        .otherwise("week")
    )
    return (
        e.groupingSets([["_h"], ["_d"], ["_w"]], "_h", "_d", "_w")
        .agg(
            grain.alias("grain"),
            F.coalesce("_h", "_d", "_w").alias("bucket"),
            F.count("*").alias("n"),
            F.sum("_v").cast("double").alias("sum_value"),
        )
        .select("grain", "bucket", "n", "sum_value")
    )


@register(
    "events_session_funnel",
    """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM seq
    ),
    v AS (SELECT user_id, session_id, min(ts) AS t1 FROM sess
          WHERE event_type = 'view' GROUP BY 1, 2),
    c AS (SELECT s.user_id, s.session_id, min(ts) AS t2
          FROM sess s JOIN v USING (user_id, session_id)
          WHERE event_type = 'click' AND ts > t1 GROUP BY 1, 2),
    p AS (SELECT s.user_id, s.session_id, min(ts) AS t3
          FROM sess s JOIN c USING (user_id, session_id)
          WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1, 2)
    SELECT * FROM (
        SELECT 1 AS step_no, 'view' AS step, count(*) AS sessions FROM v
        UNION ALL SELECT 2, 'click', count(*) FROM c
        UNION ALL SELECT 3, 'purchase', count(*) FROM p
    )
    """,
    doc="Sessionized funnel: gap-based session ids (a new session when "
    "> 30 min elapses — the lag-flag + running-sum islands idiom, the "
    "batch twin of session_window) then the ordered view -> click -> "
    "purchase funnel WITHIN each (user, session): every step's first "
    "qualifying event must follow the previous step inside the same "
    "session. All windows, joins, and aggregates key on user_id (+ the "
    "derived session_id) — one shuffle key end-to-end, same contract "
    "as the global funnel.",
    bench=True,  # stacked-window sessionization + per-session funnel is
    # the heaviest events-analytics shape (VERDICT r5 ask #6)
)
def q_events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        F.when(
            lag_ts.isNull()
            | (F.col("ts") > lag_ts + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
        F.col("event_id"),
    )
    from .ext.caching import swap_persist

    # the sessionized frame feeds six subtrees (v, and v+c, and v+c+p
    # lineages) — without a persist the two-window sessionization would
    # recompute up to six times in one plan (only exchanges get reused,
    # not window sorts); bounded to one live frame per call-site
    sess = swap_persist(
        "session_funnel_sess",
        seq.select(
            "user_id",
            "event_type",
            "ts",
            F.sum("new_sess")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("session_id"),
        ),
    )
    v = (
        sess.filter(F.col("event_type") == "view")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        sess.filter(F.col("event_type") == "click")
        .join(v, ["user_id", "session_id"])
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        sess.filter(F.col("event_type") == "purchase")
        .join(c, ["user_id", "session_id"])
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("t3"))
    )

    return _funnel_steps([(1, "view", v), (2, "click", c), (3, "purchase", p)], "sessions")


@register(
    "events_hourly_ewma",
    """
    WITH RECURSIVE c AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    idx AS (
        SELECT event_type, hour, n,
               row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i
        FROM c),
    r AS (
        SELECT event_type, hour, i, CAST(n AS DOUBLE) AS ewma
        FROM idx WHERE i = 1
        UNION ALL
        SELECT idx.event_type, idx.hour, idx.i,
               CAST(0.25 AS DOUBLE) * CAST(idx.n AS DOUBLE)
               + CAST(0.75 AS DOUBLE) * r.ewma
        FROM r JOIN idx ON idx.event_type IS NOT DISTINCT FROM r.event_type
                       AND idx.i = r.i + 1)
    SELECT event_type, hour, round(ewma, 6) AS ewma FROM r
    """,
    doc="Exponentially-weighted moving average of hourly event volume "
    "per type (alpha = 0.25, seeded at the first observation) — the "
    "time-series smoothing primitive feeding alert baselines, next to "
    "the z-score gate (events_hourly_anomalies). EWMA is a SEQUENTIAL "
    "recurrence, the class of computation SQL window frames cannot "
    "express (the closed-form trick overflows (1/(1-a))^t): the engine "
    "folds each type's sorted hourly series PARTITION-LOCALLY with an "
    "array aggregate (series are bounded per type — one collect per "
    "group, no driver loop), while the oracle runs the identical "
    "recurrence as a recursive CTE — both engines execute the same "
    "mul/mul/add IEEE sequence per step, so the smoothed values match "
    "bit-for-bit. At 100 TB the shuffle key is event_type (+ a time "
    "bucket to bound series length if hours grow unbounded).",
)
def q_events_hourly_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    c = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    series = c.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hour", "n"))).alias("xs")
    )
    fold = (
        "aggregate(xs,"
        " CAST(array() AS ARRAY<STRUCT<hour: TIMESTAMP, ewma: DOUBLE>>),"
        " (acc, x) -> concat(acc, array(struct(x.hour AS hour,"
        "   CASE WHEN size(acc) = 0 THEN CAST(x.n AS DOUBLE)"
        "        ELSE 0.25D * CAST(x.n AS DOUBLE)"
        "             + 0.75D * element_at(acc, -1).ewma END AS ewma))))"
    )
    return (
        series.select("event_type", F.explode(F.expr(fold)).alias("p"))
        .select(
            "event_type",
            F.col("p.hour").alias("hour"),
            F.round("p.ewma", 6).alias("ewma"),
        )
    )


@register(
    "events_top_trigram_paths",
    """
    WITH seq AS (
        SELECT user_id, event_type AS s1,
               lead(event_type, 1) OVER w AS s2,
               lead(event_type, 2) OVER w AS s3
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT s1, s2, s3, count(*) AS n
    FROM seq WHERE s2 IS NOT NULL AND s3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, s1, s2, s3
    LIMIT 20
    """,
    doc="Top-20 three-step event paths (sequence mining over the "
    "per-user event order): two lead() calls over ONE (user_id, ts) "
    "window spec — one user-keyed shuffle + sort shared by both leads "
    "— then a hash aggregate on the tiny (s1,s2,s3) path key and "
    "TakeOrdered for the top paths (ties broken by the full path so "
    "the LIMIT boundary is deterministic). Generalizes the 1-step "
    "transition matrix (events_transition_matrix) to path n-grams; at "
    "100 TB the window is the only event-volume-sized operation.",
)
def q_events_top_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s2").isNotNull() & F.col("s3").isNotNull())
    return (
        seq.groupBy("s1", "s2", "s3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "s1", "s2", "s3")
        .limit(20)
    )


@register(
    "stream_sliding_counts",
    _stream_oracle(_SLIDING_ORACLE),
    doc="STREAMING sliding windows (new r6): the batch "
    "events_sliding_avg semantics (10-minute window, 5-minute slide — "
    "every event in exactly 2 windows) on the live runtime: file "
    "source -> 1h watermark -> overlapping window aggregate -> "
    "AvailableNow drain in complete mode, sharing the batch twin's "
    "arithmetic oracle. Completes the window-family streaming pairs: "
    "tumbling, sliding, and session aggregates now each run in both "
    "runtimes against one oracle.",
)
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = sliding_agg(
        stream,
        "ts",
        "10 minutes",
        "5 minutes",
        [],
        n=F.count("*"),
        sum_value=F.sum(_dec_val()).cast("double"),
    )
    return run_to_completion(agg, output_mode="complete")


@register(
    "events_attribution_position",
    """
    WITH t AS (SELECT user_id, event_id AS touch_id, event_type AS channel,
                      ts AS touch_ts
               FROM events WHERE event_type IN ('view', 'click')),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS mc
          FROM events WHERE event_type = 'purchase'),
    pr AS (SELECT t.channel, t.touch_ts, t.touch_id, p.purchase_id, p.mc
           FROM t JOIN p ON t.user_id = p.user_id
            AND t.touch_ts <= p.purchase_ts
            AND p.purchase_ts <= t.touch_ts + INTERVAL 7 DAY),
    rk AS (SELECT *, row_number() OVER w AS rn,
                  count(*) OVER (PARTITION BY purchase_id) AS n
           FROM pr
           WINDOW w AS (PARTITION BY purchase_id
                        ORDER BY touch_ts, touch_id, mc)),
    sh AS (SELECT channel,
                  CASE WHEN n = 1 THEN mc
                       WHEN n = 2 AND rn = 1 THEN mc // 2
                       WHEN n = 2 THEN mc - mc // 2
                       WHEN rn = 1 OR rn = n THEN (mc * 2) // 5
                       ELSE (mc // 5) // (n - 2) END AS share
           FROM rk)
    SELECT channel, count(*) AS n_touches,
           SUM(share) / 1000000.0 AS attributed_revenue
    FROM sh GROUP BY 1
    """,
    doc="Position-based (40/20/40) multi-touch marketing attribution: "
    "each purchase's value is credited to the user's view/click "
    "touches in the preceding 7 days — first and last touch 40% each, "
    "middles splitting 20% — the standard position model between "
    "last-touch (the as-of join) and linear. The touch-to-purchase "
    "pairing is the banded interval equi-join (ops/interval.py — no "
    "nested-loop scan at any scale); shares are integer MICRO-CENT "
    "floor divisions (mc*2 div 5 etc.), so per-channel sums are exact "
    "integer sums, order-independent across engines, with sub-micro-"
    "cent truncation documented rather than float-drifted.",
)
def q_events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.interval import interval_join

    e = _events(spark, sf_dir)
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        (F.col("value").cast("decimal(12,2)") * 1000000).cast("bigint").alias("_mc"),
    )
    pairs = interval_join(
        touches, purch, ["user_id"], "touch_ts", "purchase_ts", "7 days"
    )
    # mc as final tie-break: duplicated purchases whose copies differ
    # only in value otherwise tie (dupnullmix r12)
    w = Window.partitionBy("purchase_id").orderBy(
        "touch_ts", "touch_id", F.col("_mc").asc_nulls_last()
    )
    wn = Window.partitionBy("purchase_id")
    rk = pairs.select(
        "channel",
        "_mc",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wn).alias("_n"),
    )
    share = (
        F.when(F.col("_n") == 1, F.col("_mc"))
        .when((F.col("_n") == 2) & (F.col("_rn") == 1), F.expr("_mc div 2"))
        .when(F.col("_n") == 2, F.col("_mc") - F.expr("_mc div 2"))
        .when(
            (F.col("_rn") == 1) | (F.col("_rn") == F.col("_n")),
            F.expr("(_mc * 2) div 5"),
        )
        .otherwise(F.expr("(_mc div 5) div (_n - 2)"))
    )
    return (
        rk.select("channel", share.alias("_share"))
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_touches"),
            (F.sum("_share") / F.lit(1000000.0)).alias("attributed_revenue"),
        )
    )


@register(
    "events_hourly_holt",
    """
    WITH RECURSIVE c AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    idx AS (
        SELECT event_type, hour, n,
               row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i
        FROM c),
    r AS (
        SELECT event_type, hour, i, CAST(n AS DOUBLE) AS l,
               CAST(0 AS DOUBLE) AS b, CAST(NULL AS DOUBLE) AS f
        FROM idx WHERE i = 1
        UNION ALL
        SELECT idx.event_type, idx.hour, idx.i,
               CAST(0.25 AS DOUBLE) * CAST(idx.n AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * (r.l + r.b),
               CAST(0.5 AS DOUBLE)
                 * ((CAST(0.25 AS DOUBLE) * CAST(idx.n AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * (r.l + r.b)) - r.l)
                 + CAST(0.5 AS DOUBLE) * r.b,
               r.l + r.b
        FROM r JOIN idx ON idx.event_type IS NOT DISTINCT FROM r.event_type
                       AND idx.i = r.i + 1)
    SELECT event_type, hour,
           floor(l * 1000000 + 0.5) / 1000000 AS level,
           floor(b * 1000000 + 0.5) / 1000000 AS trend,
           floor(f * 1000000 + 0.5) / 1000000 AS forecast
    FROM r
    """,
    doc="Holt double-exponential smoothing of hourly event volume per "
    "type (alpha=0.25, beta=0.5; level seeded at the first "
    "observation, trend at 0): the trend-aware successor to the EWMA "
    "baseline, emitting level, trend, and the one-step-ahead forecast "
    "(l+b of the previous step) that anomaly gates compare against. A "
    "COUPLED two-variable sequential recurrence — beyond both window "
    "frames and single-state closed forms — run partition-locally as "
    "an array fold with struct state in Spark and as the identical "
    "recursive CTE in the oracle; alpha/beta are exact binary "
    "fractions and both engines execute the same IEEE sequence per "
    "step, so level/trend/forecast match bit-for-bit "
    "(floor-quantized at 1e-6 on output). Shuffle key is event_type, "
    "exactly like the EWMA twin.",
)
def q_events_hourly_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    c = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count("*").alias("n"))
    series = c.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hour", "n"))).alias("xs")
    )
    lnew = (
        "0.25D * CAST(x.n AS DOUBLE)"
        " + 0.75D * (element_at(acc, -1).l + element_at(acc, -1).b)"
    )
    fold = (
        "aggregate(xs,"
        " CAST(array() AS ARRAY<STRUCT<hour: TIMESTAMP, l: DOUBLE,"
        " b: DOUBLE, f: DOUBLE>>),"
        " (acc, x) -> concat(acc, array("
        " CASE WHEN size(acc) = 0"
        " THEN struct(x.hour AS hour, CAST(x.n AS DOUBLE) AS l,"
        "             0.0D AS b, CAST(NULL AS DOUBLE) AS f)"
        f" ELSE struct(x.hour AS hour, {lnew} AS l,"
        f"   0.5D * (({lnew}) - element_at(acc, -1).l)"
        "    + 0.5D * element_at(acc, -1).b AS b,"
        "   element_at(acc, -1).l + element_at(acc, -1).b AS f)"
        " END)))"
    )
    out = series.select("event_type", F.explode(F.expr(fold)).alias("p"))
    micro = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return out.select(
        "event_type",
        F.col("p.hour").alias("hour"),
        micro(F.col("p.l")).alias("level"),
        micro(F.col("p.b")).alias("trend"),
        micro(F.col("p.f")).alias("forecast"),
    )


@register(
    "events_cusum_changepoint",
    """
    WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    r AS (SELECT hour,
                 CAST(row_number() OVER (ORDER BY hour) AS HUGEINT) AS i,
                 CAST(SUM(n) OVER (ORDER BY hour) AS HUGEINT) AS s
          FROM c),
    t AS (SELECT CAST(count(*) AS HUGEINT) AS cnt,
                 CAST(SUM(n) AS HUGEINT) AS st FROM c),
    d AS (SELECT hour, i, s, abs(cnt * s - i * st) AS dnum FROM r, t),
    m AS (SELECT max(dnum) AS md FROM d),
    pick AS (SELECT min(i) AS pi FROM d, m WHERE dnum = md)
    SELECT d.hour AS change_hour,
           CAST(t.cnt AS BIGINT) AS n_hours,
           CAST(t.st AS BIGINT) AS total_events,
           round(CAST(m.md AS DOUBLE) / CAST(t.cnt AS DOUBLE), 6) AS cusum_dev,
           round(CAST(d.s AS DOUBLE) / CAST(d.i AS DOUBLE), 6) AS mean_before,
           CASE WHEN t.cnt > d.i
                THEN round(CAST(t.st - d.s AS DOUBLE)
                           / CAST(t.cnt - d.i AS DOUBLE), 6) END AS mean_after
    FROM d, m, t, pick WHERE d.dnum = m.md AND d.i = pick.pi
    """,
    doc="CUSUM changepoint over hourly event volume: the hour i* "
    "maximizing |S_i - (i/n)S_n| — where the cumulative count diverges "
    "most from the constant-rate line — plus the mean rates either "
    "side of the cut (the before/after levels a monitoring alert "
    "shows). Exactness: the deviation is ranked on the INTEGER "
    "|n*S_i - i*S_n| (no float until the final readout divisions), so "
    "argmax and tie-break (earliest hour) are engine-independent; "
    "mean_after is gated on cnt > i with the same expression in both "
    "engines (argmax can land on the last hour only for a constant "
    "series). Scale: everything after the one hash aggregate is "
    "series-sized (hours are calendar-bounded, not data-bounded); the "
    "cumulation window rides that bounded series like the other "
    "hourly-series entries.",
)
def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _events_ts(spark, sf_dir)
    c = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("hour")
    r = c.select(
        "hour",
        F.row_number().over(w).cast("decimal(38,0)").alias("i"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(38,0)")
        .alias("s"),
    )
    t = c.agg(
        F.count("*").cast("decimal(38,0)").alias("cnt"),
        F.sum("n").cast("decimal(38,0)").alias("st"),
    )
    d = r.crossJoin(F.broadcast(t)).select(
        "hour",
        "i",
        "s",
        "cnt",
        "st",
        F.abs(F.col("cnt") * F.col("s") - F.col("i") * F.col("st")).alias("dnum"),
    )
    m = d.agg(F.max("dnum").alias("md"))
    dm = d.join(F.broadcast(m), d["dnum"] == m["md"])
    pick = dm.groupBy().agg(F.min("i").alias("pi"))
    out = dm.join(F.broadcast(pick), dm["i"] == pick["pi"])
    return out.select(
        F.col("hour").alias("change_hour"),
        F.col("cnt").cast("long").alias("n_hours"),
        F.col("st").cast("long").alias("total_events"),
        F.round(F.col("md").cast("double") / F.col("cnt").cast("double"), 6).alias(
            "cusum_dev"
        ),
        F.round(F.col("s").cast("double") / F.col("i").cast("double"), 6).alias(
            "mean_before"
        ),
        F.when(
            F.col("cnt") > F.col("i"),
            F.round(
                (F.col("st") - F.col("s")).cast("double")
                / (F.col("cnt") - F.col("i")).cast("double"),
                6,
            ),
        ).alias("mean_after"),
    )


@register(
    "events_markov_two_step",
    """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events WHERE ts IS NOT NULL
    ),
    cells AS (SELECT event_type AS a, next_type AS b, count(*) AS n
              FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    rowt AS (SELECT a, CAST(SUM(n) AS BIGINT) AS r FROM cells GROUP BY 1),
    terms AS (SELECT c1.a AS from_type, c2.b AS to_type,
                     CAST(round((c1.n / CAST(r1.r AS DOUBLE))
                                * (c2.n / CAST(r2.r AS DOUBLE))
                                * 1000000000000) AS BIGINT) AS term
              FROM cells c1
              JOIN rowt r1 ON c1.a = r1.a
              JOIN cells c2 ON c1.b = c2.a
              JOIN rowt r2 ON c2.a = r2.a)
    SELECT from_type, to_type,
           round(CAST(SUM(term) AS DOUBLE) / 1000000000000, 6) AS p2
    FROM terms GROUP BY 1, 2
    """,
    doc="Two-step Markov transition probabilities P^2(a,c) = "
    "sum_b P(a,b)*P(b,c) over the same per-user event chains as "
    "events_transition_matrix — where does a user land two actions "
    "from now (the lookahead behind journey simulation). Exactness: "
    "each path term P(a,b)*P(b,c) is two deterministic divisions of "
    "exact integer counts, quantized to integer PICO-units before the "
    "sum over intermediate states b — the summation-order-free "
    "discipline of the micro-nat entries, at 1e12 because products of "
    "two probabilities need the headroom. Scale: one user-window pass "
    "builds the |types|^2 cell frame; the matrix square is a "
    "cells-by-cells join on b — |types|^3 work on a frame that never "
    "grows with data.",
)
def q_events_markov_two_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cells = seq.groupBy(
        F.col("event_type").alias("a"), F.col("next_type").alias("b")
    ).agg(F.count("*").alias("n"))
    rowt = cells.groupBy("a").agg(F.sum("n").cast("long").alias("r"))
    c1 = (
        cells.join(rowt, "a")
        .select(
            F.col("a").alias("from_type"),
            F.col("b").alias("mid"),
            (F.col("n") / F.col("r").cast("double")).alias("pa"),
        )
    )
    c2 = (
        cells.join(rowt, "a")
        .select(
            F.col("a").alias("mid"),
            F.col("b").alias("to_type"),
            (F.col("n") / F.col("r").cast("double")).alias("pb"),
        )
    )
    terms = c1.join(c2, "mid").select(
        "from_type",
        "to_type",
        F.round(F.col("pa") * F.col("pb") * 1000000000000).cast("bigint").alias("term"),
    )
    return terms.groupBy("from_type", "to_type").agg(
        F.round(F.sum("term").cast("double") / 1000000000000, 6).alias("p2")
    )


@register(
    "events_conversion_latency_pct",
    """
    WITH c AS (
        SELECT user_id, ts FROM events
        WHERE event_type = 'click' AND ts IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1
    ),
    p AS (SELECT user_id, ts FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL),
    m AS (SELECT epoch_us(p.ts) - epoch_us(c.ts) AS lat
          FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
    h AS (SELECT lat, count(*) AS cnt FROM m GROUP BY 1),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
    cum AS (SELECT lat, SUM(cnt) OVER (ORDER BY lat) AS c FROM h)
    SELECT t.n AS n_pairs,
           min(CASE WHEN cum.c * 2 >= t.n THEN lat END) AS p50_us,
           min(CASE WHEN cum.c * 10 >= 9 * t.n THEN lat END) AS p90_us,
           min(CASE WHEN cum.c * 100 >= 99 * t.n THEN lat END) AS p99_us
    FROM cum, t GROUP BY t.n
    """,
    doc="Time-to-convert percentiles: for every purchase, the latency "
    "since the same user's most recent click (the as-of pair from "
    "ops/asof.py, matched purchases only), then p50/p90/p99 picked by "
    "explicit INTEGER rank arithmetic over the microsecond-latency "
    "histogram (cum*100 >= q*n — the graph_triangle_cliques threshold "
    "pattern; no float percentile boundary to disagree on, and "
    "latencies are exact integer microsecond differences). Scale: the "
    "as-of pairing is the union+window-last composition (one user "
    "shuffle, no range blowup); the percentile cumulation rides the "
    "two-pass global_cumsum over the latency histogram.",
)
def q_events_conversion_latency_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.asof import asof_join
    from .ops.sorts import global_cumsum

    e = _events_ts(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    m = asof_join(
        purchases, clicks, keys=["user_id"], ts="ts", payload=[], tiebreak="event_id"
    ).filter(F.col("ts_matched").isNotNull())
    lat = m.select(
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_matched").cast("timestamp"))
        ).alias("lat")
    )
    h = lat.groupBy("lat").agg(F.count("*").alias("cnt"))
    cum = global_cumsum(h, ["lat"], "cnt", alias="c", persist_key="conv_lat_cum")
    t = cum.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        cum.crossJoin(F.broadcast(t))
        .groupBy(F.col("n").alias("n_pairs"))
        .agg(
            F.min(F.when(F.col("c") * 2 >= F.col("n"), F.col("lat"))).alias("p50_us"),
            F.min(F.when(F.col("c") * 10 >= 9 * F.col("n"), F.col("lat"))).alias(
                "p90_us"
            ),
            F.min(F.when(F.col("c") * 100 >= 99 * F.col("n"), F.col("lat"))).alias(
                "p99_us"
            ),
        )
    )


@register(
    "events_theil_sen_trend",
    """
    WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    r AS (SELECT n, row_number() OVER (ORDER BY hour) AS i FROM c),
    pairs AS (SELECT a.i AS i, b.i AS j,
                     (b.n - a.n) / CAST(b.i - a.i AS DOUBLE) AS slope
              FROM r a JOIN r b ON b.i > a.i),
    t AS (SELECT count(*) AS n_pairs,
                 (count(*) + 1) // 2 AS k
          FROM pairs),
    ranked AS (SELECT slope,
                      row_number() OVER (ORDER BY slope, i, j) AS rk
               FROM pairs)
    SELECT (SELECT count(*) FROM c) AS n_hours,
           t.n_pairs,
           round(ranked.slope, 6) AS ts_slope
    FROM ranked, t WHERE ranked.rk = t.k
    """,
    doc="Theil-Sen slope of hourly event volume: the (lower) median of "
    "all pairwise slopes (c_j - c_i)/(j - i) — the robust trend "
    "estimator a single traffic spike cannot drag the way OLS's is "
    "(stats_bivariate_regression's robust sibling). Exactness: counts "
    "and hour indexes are integers, each slope is ONE IEEE division "
    "identical cross-engine, and the median is an order-statistic "
    "PICK (rank k = (m+1)//2 by (slope, i, j) — never an average of "
    "two floats); ties broken on the integer pair. Scale: the hourly "
    "series is calendar-bounded, so the all-pairs frame is "
    "series^2-bounded — independent of data volume but NOT small (a "
    "2-year series is ~150M pairs), so the rank pick rides the "
    "two-pass global_row_number, never a single-task global window; "
    "the one data-sized operation is the initial hash aggregate.",
)
def q_events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    c = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    from .ext.caching import swap_persist

    r = swap_persist(
        "theil_sen_series",
        c.select("n", F.row_number().over(Window.orderBy("hour")).alias("i")),
    )
    a, b = r.alias("a"), r.alias("b")
    pairs = a.join(b, F.col("b.i") > F.col("a.i")).select(
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        (
            (F.col("b.n") - F.col("a.n"))
            / (F.col("b.i") - F.col("a.i")).cast("double")
        ).alias("slope"),
    )
    t = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.floor((F.count("*") + 1) / 2).cast("long").alias("k"),
    )
    # two-pass global rank: a bare row_number() OVER (ORDER BY ...)
    # would funnel the series^2 pairs frame (153M rows for a 2-year
    # hourly series) through ONE task; the range/offset scheme keeps
    # the order-statistic pick fully parallel
    from .ops.sorts import global_row_number

    ranked = global_row_number(
        pairs, ["slope", "i", "j"], alias="rk", persist_key="theil_sen_rank"
    )
    nh = c.agg(F.count("*").alias("n_hours"))
    return (
        ranked.join(F.broadcast(t), ranked["rk"] == t["k"])
        .crossJoin(F.broadcast(nh))
        .select("n_hours", "n_pairs", F.round("slope", 6).alias("ts_slope"))
    )


@register(
    "events_hourly_acf",
    """
    WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    r AS (SELECT n, row_number() OVER (ORDER BY hour) AS i FROM c),
    g AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(SUM(n) AS BIGINT) AS s,
                 CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS s2
          FROM r),
    lagged AS (SELECT b.i - a.i AS lag,
                      count(*) AS n_pairs,
                      CAST(SUM(CAST(a.n AS HUGEINT) * b.n) AS HUGEINT) AS sab,
                      CAST(SUM(a.n) AS BIGINT) AS sa,
                      CAST(SUM(b.n) AS BIGINT) AS sb
               FROM r a JOIN r b ON b.i > a.i AND b.i <= a.i + 24
               GROUP BY 1)
    SELECT lag, n_pairs,
           round((CAST(sab AS DOUBLE)
                  - CAST(s AS DOUBLE) / m * (sa + sb)
                  + n_pairs * (CAST(s AS DOUBLE) / m)
                            * (CAST(s AS DOUBLE) / m))
                 / (CAST(s2 AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / m), 6) AS acf
    FROM lagged, g
    """,
    doc="Autocorrelation function of hourly event volume at lags 1-24 "
    "— the seasonality fingerprint (a daily cycle shows as the lag-24 "
    "peak) feeding the Holt/seasonal-index entries. Exactness: every "
    "inner sum (sum c_i*c_{i+L}, head/tail sums, global moments) is "
    "an exact integer off the lag equi-join; the mean-centered "
    "numerator and variance denominator are assembled in one fixed "
    "double sequence spelled identically in the oracle. Scale: the "
    "hourly series is calendar-bounded, so the 24-lag banded "
    "self-join is series-sized — independent of event volume; the "
    "one data-sized pass is the initial hash aggregate.",
)
def q_events_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    c = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    from .ext.caching import swap_persist

    r = swap_persist(
        "acf_series",
        c.select("n", F.row_number().over(Window.orderBy("hour")).alias("i")),
    )
    g = r.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("s2"),
    )
    a, b = r.alias("a"), r.alias("b")
    lagged = (
        a.join(b, (F.col("b.i") > F.col("a.i")) & (F.col("b.i") <= F.col("a.i") + 24))
        .groupBy((F.col("b.i") - F.col("a.i")).alias("lag"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("a.n").cast("decimal(38,0)") * F.col("b.n")).alias("sab"),
            F.sum("a.n").cast("long").alias("sa"),
            F.sum("b.n").cast("long").alias("sb"),
        )
    )
    mean = F.col("s").cast("double") / F.col("m")
    num = (
        F.col("sab").cast("double")
        - mean * (F.col("sa") + F.col("sb"))
        + F.col("n_pairs") * mean * mean
    )
    den = F.col("s2").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ).cast("double") / F.col("m")
    return lagged.crossJoin(F.broadcast(g)).select(
        "lag", "n_pairs", F.round(num / den, 6).alias("acf")
    )


@register(
    "events_power_user_share",
    """
    WITH u AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
    h AS (SELECT c, count(*) AS users,
                 CAST(c AS HUGEINT) * count(*) AS ev
          FROM u GROUP BY 1),
    t AS (SELECT CAST(SUM(users) AS BIGINT) AS n_users,
                 CAST(SUM(ev) AS BIGINT) AS total_events,
                 CAST(floor((SUM(users) + 99) / 100) AS BIGINT) AS k
          FROM h),
    cum AS (SELECT c,
                   SUM(users) OVER (ORDER BY c DESC) AS cu,
                   SUM(ev) OVER (ORDER BY c DESC) AS ce
            FROM h),
    pick AS (SELECT min(cu) AS cu_pick FROM cum, t WHERE cu >= t.k)
    SELECT t.n_users, t.k AS k_users, t.total_events,
           CAST(cum.ce - (cum.cu - t.k) * cum.c AS BIGINT) AS topk_events,
           round(CAST(cum.ce - (cum.cu - t.k) * cum.c AS DOUBLE)
                 / t.total_events, 6) AS share
    FROM cum, t, pick WHERE cum.cu = pick.cu_pick
    """,
    doc="Power-user concentration: what share of all events comes from "
    "the top 1% of users (k = ceil(n/100)) — the Pareto readout next "
    "to revenue_gini_by_nation, computed WITHOUT ranking users: the "
    "cut lives on the events-per-user HISTOGRAM (descending "
    "cumulative users/events, boundary bucket corrected by exact "
    "integer (cu - k) * c), so every quantity including the share "
    "numerator is an exact integer and the one division is the "
    "readout. Scale: one user-keyed aggregate, then "
    "histogram-sized frames; the cumulation is over distinct count "
    "VALUES (sub-linear in users), ridden by an ordinary window here "
    "because the count histogram is frequency-bounded.",
)
def q_events_power_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    u = e.groupBy("user_id").agg(F.count("*").alias("c"))
    h = u.groupBy("c").agg(
        F.count("*").alias("users"),
        (F.col("c").cast("decimal(38,0)") * F.count("*")).alias("ev"),
    )
    from .ext.caching import swap_persist

    h = swap_persist("power_user_hist", h)
    t = h.agg(
        F.sum("users").cast("long").alias("n_users"),
        F.sum("ev").cast("long").alias("total_events"),
        F.floor((F.sum("users") + 99) / 100).cast("long").alias("k"),
    )
    w = Window.orderBy(F.col("c").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = h.select(
        "c",
        F.sum("users").over(w).alias("cu"),
        F.sum("ev").over(w).alias("ce"),
    )
    ct = cum.crossJoin(F.broadcast(t))
    pick = ct.filter(F.col("cu") >= F.col("k")).agg(F.min("cu").alias("cu_pick"))
    top = ct.join(F.broadcast(pick), ct["cu"] == pick["cu_pick"])
    topk_ev = F.col("ce") - (F.col("cu") - F.col("k")) * F.col("c")
    return top.select(
        "n_users",
        F.col("k").alias("k_users"),
        "total_events",
        topk_ev.cast("long").alias("topk_events"),
        F.round(topk_ev.cast("double") / F.col("total_events"), 6).alias("share"),
    )


@register(
    "events_funnel_time_capped",
    """
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(ts) AS t2
          FROM events e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts > t1
            AND ts <= t1 + INTERVAL 1 HOUR GROUP BY 1),
    p AS (SELECT e.user_id, min(ts) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts > t2
            AND ts <= t2 + INTERVAL 1 HOUR GROUP BY 1),
    s AS (
        SELECT 1 AS step_no, 'view' AS step, count(*) AS users FROM v
        UNION ALL SELECT 2, 'click', count(*) FROM c
        UNION ALL SELECT 3, 'purchase', count(*) FROM p
    )
    SELECT step_no, step, users,
           round(CAST(users AS DOUBLE)
                 / lag(users, 1, users) OVER (ORDER BY step_no), 6)
               AS step_conversion
    FROM s
    """,
    doc="Time-capped ordered funnel (view -> click -> purchase, each "
    "step within ONE HOUR of the previous step's first qualifying "
    "event) with per-step conversion rates — the standard "
    "product-analytics definition where stale conversions do not "
    "count, beside events_funnel_conversion's uncapped variant. "
    "Exactness: per-user step timestamps are exact min-aggregates, "
    "the interval predicate is identical timestamp arithmetic in both "
    "engines, and each rate is one division of exact counts. Scale: "
    "same single-shuffle-key shape as the uncapped funnel — every "
    "join and aggregate keys on user_id.",
)
def q_events_funnel_time_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    s = (
        v.agg(F.count("*").alias("users"))
        .select(F.lit(1).alias("step_no"), F.lit("view").alias("step"), "users")
        .unionByName(
            c.agg(F.count("*").alias("users")).select(
                F.lit(2).alias("step_no"), F.lit("click").alias("step"), "users"
            )
        )
        .unionByName(
            p.agg(F.count("*").alias("users")).select(
                F.lit(3).alias("step_no"), F.lit("purchase").alias("step"), "users"
            )
        )
    )
    w = Window.orderBy("step_no")
    # mirror the oracle's lag(users, 1, users): step 1 divides by its
    # OWN count (users/users = 1.0 when non-empty, 0/0 = NULL on empty
    # input), and try_divide matches DuckDB's x/0 -> NULL where plain
    # '/' is an ANSI DIVIDE_BY_ZERO crash
    return s.select(
        "step_no",
        "step",
        "users",
        F.round(
            F.try_divide(
                F.col("users").cast("double"),
                F.coalesce(F.lag("users", 1).over(w), F.col("users")).cast(
                    "double"
                ),
            ),
            6,
        ).alias("step_conversion"),
    )


@register(
    "events_peak_concurrency",
    f"""
    WITH lagd AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events WHERE ts IS NOT NULL
    ),
    flag AS (
        SELECT *, CASE WHEN prev IS NULL
                         OR epoch_us(ts) - epoch_us(prev) >= {21600 * 1000000}
                       THEN 1 ELSE 0 END AS new_s
        FROM lagd
    ),
    isl AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flag
    ),
    sess AS (SELECT user_id, sid, epoch_us(min(ts)) AS s_us,
                    epoch_us(max(ts)) + 1 AS e_us
             FROM isl GROUP BY 1, 2),
    delta AS (SELECT us, CAST(SUM(dx) AS BIGINT) AS dx FROM (
        SELECT s_us AS us, 1 AS dx FROM sess
        UNION ALL SELECT e_us, -1 AS dx FROM sess) GROUP BY 1),
    cum AS (SELECT us, SUM(dx) OVER (ORDER BY us) AS conc FROM delta),
    m AS (SELECT max(conc) AS peak FROM cum),
    t AS (SELECT count(*) AS n_sessions FROM sess)
    SELECT t.n_sessions, CAST(m.peak AS BIGINT) AS peak_concurrency,
           CAST(min(cum.us) AS BIGINT) AS at_epoch_us
    FROM cum, m, t WHERE cum.conc = m.peak GROUP BY 1, 2
    """,
    doc="Peak concurrent sessions: 6h-gap sessionization (the "
    "events_session_windows islands), each session an active interval "
    "[first event, last event], swept with the same +1/-1 boundary "
    "technique as orders_open_backlog_daily in exact integer "
    "microseconds — the capacity-planning number (how many users were "
    "on AT ONCE, and when). Closed intervals: the -1 fires one "
    "microsecond after the last event, so touching sessions both "
    "count. Exactness: all integers until none — peak, argmax time "
    "(earliest, by integer min) and session count are exact. Scale: "
    "one user-window pass, one session aggregate, then the boundary "
    "histogram rides the two-pass global cumsum.",
)
def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.sorts import global_cumsum

    e = _events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond-exact gap compare: unix_timestamp floors to whole
    # seconds, so a 21599.2s gap would round UP across the 21600
    # boundary and split a session the fractional-epoch oracle (and
    # the canonical session_window sessionization) keeps together
    flag = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                >= 21600 * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    isl = flag.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = isl.groupBy("user_id", "sid").agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("s_us"),
        (F.unix_micros(F.max("ts").cast("timestamp")) + 1).alias("e_us"),
    )
    from .ext.caching import swap_persist

    sess = swap_persist("peak_conc_sessions", sess)
    delta = (
        sess.select(F.col("s_us").alias("us"), F.lit(1).alias("dx"))
        .unionAll(sess.select(F.col("e_us").alias("us"), F.lit(-1).alias("dx")))
        .groupBy("us")
        .agg(F.sum("dx").cast("long").alias("dx"))
    )
    cum = global_cumsum(delta, ["us"], "dx", alias="conc", persist_key="peak_conc_cum")
    m = cum.agg(F.max("conc").alias("peak"))
    t = sess.agg(F.count("*").alias("n_sessions"))
    return (
        cum.join(F.broadcast(m), cum["conc"] == m["peak"])
        .crossJoin(F.broadcast(t))
        .groupBy("n_sessions", F.col("peak").cast("long").alias("peak_concurrency"))
        .agg(F.min("us").cast("long").alias("at_epoch_us"))
    )


@register(
    "events_dau_mau_stickiness",
    """
    WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
    mau AS (SELECT d.day, count(DISTINCT du.user_id) AS mau
            FROM days d JOIN du
                 ON du.day <= d.day AND du.day > d.day - INTERVAL 28 DAY
            GROUP BY 1)
    SELECT dau.day, dau.dau, mau.mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON dau.day = mau.day
    """,
    doc="DAU / trailing-28-day MAU stickiness per day — the canonical "
    "engagement ratio (what fraction of the monthly audience shows up "
    "daily). Same shape discipline as events_rolling_wau: the fact "
    "collapses FIRST to distinct (day, user) pairs, each pair "
    "explodes into its <=28 candidate target days and equi-joins the "
    "broadcast day spine — |day-users| x 28 rows through a hash "
    "join, no BNLJ, independent of raw event volume. Exact integer "
    "counts, one division per day.",
)
def q_events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    from .ext.caching import swap_persist

    du = swap_persist(
        "dau_mau_du",
        e.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct(),
    )
    days = du.select(F.col("day").alias("d")).distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    cand = du.select(
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 27 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d"),
        "user_id",
    )
    mau = (
        cand.join(F.broadcast(days), "d")
        .groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return dau.join(mau, "day").select(
        "day",
        "dau",
        "mau",
        F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias("stickiness"),
    )


@register(
    "events_hourly_robust_z",
    """
    WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS n
               FROM events GROUP BY 1),
    hh AS (SELECT n, count(*) AS cnt FROM c GROUP BY 1),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS m FROM hh),
    cm AS (SELECT n, SUM(cnt) OVER (ORDER BY n) AS cum FROM hh),
    med AS (SELECT min(CASE WHEN cum * 2 >= t.m THEN n END) AS med
            FROM cm, t),
    dh AS (SELECT abs(c.n - med.med) AS d, count(*) AS cnt
           FROM c, med GROUP BY 1),
    dcm AS (SELECT d, SUM(cnt) OVER (ORDER BY d) AS cum FROM dh),
    mad AS (SELECT min(CASE WHEN cum * 2 >= t.m THEN d END) AS mad
            FROM dcm, t)
    SELECT c.hour, c.n,
           CASE WHEN mad.mad > 0
                THEN round((c.n - med.med) / (1.4826 * mad.mad), 6) END
               AS robust_z,
           CASE WHEN mad.mad > 0
                AND abs((c.n - med.med) / (1.4826 * mad.mad)) > 3.5
                THEN 1 ELSE 0 END AS is_anomaly
    FROM c, med, mad
    """,
    doc="Robust hourly anomaly flags: median/MAD z-score with the "
    "|z| > 3.5 rule — the outlier-resistant twin of "
    "events_hourly_anomalies (a single traffic spike inflates the "
    "mean/stddev gate into missing the next spike; the median/MAD "
    "gate doesn't move). Exactness: median and MAD are integer "
    "rank picks over the count histogram (two passes of the same "
    "cum*2 >= m arithmetic), the 1.4826 consistency constant is one "
    "fixed double multiply, and the zero-MAD degenerate case gates "
    "to NULL identically in both engines. Scale: the hourly series "
    "is calendar-bounded; everything after the one fact aggregate is "
    "histogram-sized.",
)
def q_events_hourly_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    c = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    from .ext.caching import swap_persist

    c = swap_persist("robust_z_hours", c)
    hh = c.groupBy("n").agg(F.count("*").alias("cnt"))
    t = hh.agg(F.sum("cnt").cast("long").alias("m"))
    w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cm = hh.withColumn("cum", F.sum("cnt").over(w)).crossJoin(F.broadcast(t))
    med = cm.agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("m"), F.col("n"))).alias("med")
    )
    dh = (
        c.crossJoin(F.broadcast(med))
        .groupBy(F.abs(F.col("n") - F.col("med")).alias("d"))
        .agg(F.count("*").alias("cnt"))
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dcm = dh.withColumn("cum", F.sum("cnt").over(wd)).crossJoin(F.broadcast(t))
    mad = dcm.agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("m"), F.col("d"))).alias("mad")
    )
    rz = (F.col("n") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        c.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "hour",
            "n",
            F.when(F.col("mad") > 0, F.round(rz, 6)).alias("robust_z"),
            F.when((F.col("mad") > 0) & (F.abs(rz) > 3.5), 1)
            .otherwise(0)
            .alias("is_anomaly"),
        )
    )


@register(
    "events_cooccurrence_pmi",
    f"""
    WITH lagd AS (
        SELECT user_id, ts, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events WHERE ts IS NOT NULL
    ),
    flag AS (
        SELECT *, CASE WHEN prev IS NULL
                         OR epoch_us(ts) - epoch_us(prev) >= {21600 * 1000000}
                       THEN 1 ELSE 0 END AS new_s
        FROM lagd
    ),
    isl AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flag
    ),
    st AS (SELECT DISTINCT user_id, sid, event_type FROM isl),
    t AS (SELECT CAST(count(DISTINCT (user_id, sid)) AS BIGINT) AS n_sessions
          FROM st),
    sing AS (SELECT event_type, count(*) AS n FROM st GROUP BY 1),
    pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     count(*) AS n_ab
              FROM st a JOIN st b
                ON a.user_id = b.user_id AND a.sid = b.sid
               AND a.event_type < b.event_type
              GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_ab,
           round(ln((p.n_ab * CAST(t.n_sessions AS DOUBLE))
                    / (CAST(sa.n AS DOUBLE) * sb.n)), 6) AS pmi
    FROM pairs p
    JOIN sing sa ON p.type_a = sa.event_type
    JOIN sing sb ON p.type_b = sb.event_type
    CROSS JOIN t
    """,
    doc="Pointwise mutual information of event-type pairs within "
    "6h-gap sessions: PMI = ln(P(ab) / P(a)P(b)) over session-level "
    "co-occurrence — which behaviors genuinely travel together vs "
    "just being common (raw co-occurrence counts rank frequent types "
    "first; PMI corrects for the margins), the association-mining "
    "view beside basket_brand_affinity's order-side lift. Exactness: "
    "all session/pair counts are exact integers off the distinct "
    "(session, type) frame; PMI is one ln of a ratio of integers, "
    "identical cross-engine. Scale: the pair join keys on the "
    "session id — |session-types| x |types| worst case, never raw "
    "events squared; |types|^2 output.",
)
def q_events_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    flag = e.select(
        "user_id",
        "ts",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                >= 21600 * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    isl = flag.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    from .ext.caching import swap_persist

    st = swap_persist(
        "pmi_session_types", isl.select("user_id", "sid", "event_type").distinct()
    )
    t = st.select("user_id", "sid").distinct().agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    sing = st.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = st.alias("a"), st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    sa = sing.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sing.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(t))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n_sessions").cast("double"))
                    / (F.col("na").cast("double") * F.col("nb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "events_pattern_match_cep",
    """
    WITH sym AS (
        SELECT user_id,
               CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
                    WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
                    ELSE 'E' END AS s,
               ts, event_id
        FROM events WHERE ts IS NOT NULL),
    strs AS (
        SELECT user_id, count(*) AS n_events,
               -- s as final tie-break: duplicate (ts, event_id)
               -- copies differing in event_type (dupnullmix r12)
               string_agg(s, '' ORDER BY ts, event_id, s) AS seq
        FROM sym GROUP BY user_id),
    m AS (
        SELECT user_id, n_events,
               regexp_extract_all(seq, 'V[CE]*P') AS hits
        FROM strs)
    SELECT user_id, n_events,
           len(hits) AS n_matches,
           coalesce(list_max(list_transform(hits, x -> length(x)::BIGINT)), 0)
               AS max_match_len
    FROM m
    """,
    doc="MATCH_RECOGNIZE-shaped complex-event-processing: symbolize "
    "each user's event stream (deterministic (ts, event_id) order), "
    "fold it to ONE string per user, and count non-overlapping "
    "matches of the funnel pattern V[CE]*P (a view reaching a "
    "purchase through any run of clicks/errors) plus the longest "
    "match. Left-to-right non-overlapping greedy semantics are "
    "identical in Java regex and RE2, and both engines implement the "
    "count as len(extract_all), so the whole CEP readout is "
    "value-exact. The operator class (regex over an ordered event "
    "alphabet) is what SQL MATCH_RECOGNIZE / Flink CEP provide and "
    "plain relational operators cannot express row-wise. Scale: one "
    "user-keyed shuffle into a sort-agg; per-user strings are "
    "event-count-bounded — at 100 TB compose with sessionization "
    "(events_session_windows) first so each folded string is a "
    "session, not a lifetime.",
)
def q_events_pattern_match_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    sym = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", "V")
        .when(F.col("event_type") == "click", "C")
        .when(F.col("event_type") == "purchase", "P")
        .when(F.col("event_type") == "signup", "S")
        .otherwise("E")
        .alias("s"),
    )
    strs = sym.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "s"))),
                lambda x: x["s"],
            ),
            "",
        ).alias("seq"),
    )
    hits = F.regexp_extract_all(F.col("seq"), F.lit("V[CE]*P"), F.lit(0))
    return strs.select(
        "user_id",
        "n_events",
        F.size(hits).cast("bigint").alias("n_matches"),
        F.coalesce(
            F.array_max(F.transform(hits, lambda x: F.length(x).cast("bigint"))),
            F.lit(0).cast("bigint"),
        ).alias("max_match_len"),
    )


@register(
    "stream_stream_left_outer_join",
    _stream_oracle("""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click' AND ts IS NOT NULL),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL)
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           c.ts AS click_ts, p.ts AS purchase_ts
    FROM c LEFT JOIN p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """),
    doc="Stream-stream LEFT OUTER join — the state-EVICTION semantics "
    "the inner join never exercises: an unmatched click is emitted "
    "(null-padded) only when the watermark passes its whole 30-minute "
    "match window, i.e. outer results are produced by state expiry, "
    "not row arrival. A bounded single-file drain emits NO outer row "
    "(eviction in batch N uses the watermark of batch N-1, and "
    "availableNow runs no flush batch after the last data batch), so "
    "the source is staged with TWO far-future PUNCTUATION files — "
    "click+purchase sentinel rows, one file per trigger — "
    "the streaming twin of a Kafka heartbeat topic: the first "
    "sentinel batch carries the base data's watermark, the second "
    "carries the first sentinel's (max+9h), flushing every base "
    "click. Sentinels pass both sides' event-type filters (pushed "
    "below the watermark node, so each SIDE's watermark advances "
    "only on rows of its own type) and carry NEGATIVE user ids: "
    "non-null, because the join key makes Catalyst infer "
    "IsNotNull(user_id) on the match side and push it into the scan "
    "— a null-user sentinel is dropped BEFORE the watermark node "
    "and the flush never happens (observed, not hypothetical) — yet "
    "never equal to a real user or to each other; the negative-user "
    "guard drops them from the result. With the full flush, the "
    "drain == batch left join "
    "EXACTLY — full SQL oracle, no horizon carve-out. State per user "
    "stays bounded by the 90-minute expiry horizon at any scale.",
)
def q_stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os
    import shutil
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    max_ts = _events(spark, sf_dir).agg(F.max("ts").alias("m")).collect()[0]["m"]
    if max_ts is None:
        # empty events (a filtered-to-empty source at scale): any
        # constant anchors the watermark-flush sentinels — they never
        # match each other (-1 vs -2) and are filtered from the output,
        # so the result is correctly empty
        max_ts = datetime.datetime(1970, 1, 1)
    src = os.path.join(sf_dir, "events.parquet")
    stage = tempfile.mkdtemp(prefix="outer_join_stage_")
    try:
        d = os.path.join(stage, "events.parquet")
        os.makedirs(d)
        base_paths = (
            [
                os.path.join(src, f)
                for f in sorted(os.listdir(src))
                if f.endswith(".parquet")
            ]
            if os.path.isdir(src)
            else [src]
        )
        now = time.time()
        # The base corpus must land in ONE micro-batch: the punctuation
        # design needs batch 1 = all base data, then one sentinel per
        # batch. With maxFilesPerTrigger=1 and a MULTI-FILE source
        # whose part files each span the full time range (repartition
        # mixes event times), file 1 would advance each side's
        # watermark to ~max-1h and files 2..N would arrive as LATE
        # data and be dropped — observed at sf1: 25k of 199k oracle
        # rows survived. Consolidating to a single staged file keeps
        # the arrival order event-time-honest on any source layout
        # (and is a no-op copy for the driver's single-file layout).
        tgt = os.path.join(d, "base-0000.parquet")
        if len(base_paths) == 1:
            shutil.copy(base_paths[0], tgt)
        else:
            # Stream row groups file-by-file instead of pa.concat_tables:
            # materializing every part at once is a driver OOM at derived
            # scales (sf3+ holds the whole events table in driver memory
            # twice — once as tables, once as the concat).
            writer = None
            try:
                for bp in base_paths:
                    f = pq.ParquetFile(bp)
                    for rg in range(f.num_row_groups):
                        batch_tbl = f.read_row_group(rg)
                        if writer is None:
                            writer = pq.ParquetWriter(
                                tgt, batch_tbl.schema, version="2.6"
                            )
                        writer.write_table(batch_tbl)
                if writer is None:
                    # every part file was empty (zero row groups) — an
                    # empty repartitioned events table does this; the
                    # staged base file must still exist for the utime +
                    # stream below (the concat_tables path always wrote
                    # a valid, possibly empty, file)
                    writer = pq.ParquetWriter(
                        tgt, pq.read_schema(base_paths[0]), version="2.6"
                    )
            finally:
                if writer is not None:
                    writer.close()
        os.utime(tgt, (now - 60, now - 60))
        schema = pq.read_schema(base_paths[0])
        for k in (1, 2):
            cols = {}
            for field in schema:
                if field.name == "ts":
                    cols[field.name] = pa.array(
                        [max_ts + datetime.timedelta(hours=10 * k)] * 2,
                        type=field.type,
                    )
                elif field.name == "event_type":
                    cols[field.name] = pa.array(
                        ["click", "purchase"], type=field.type
                    )
                elif field.name == "user_id":
                    # MUST be non-null: the outer join's equi-key makes
                    # Catalyst infer IsNotNull(user_id) on the match
                    # (right) side and push it into the parquet scan —
                    # a null-user sentinel is dropped BEFORE the
                    # watermark node and the flush never happens.
                    # Negative ids survive the pushdown but can never
                    # equal a real user (and the two sentinels differ,
                    # so they never match each other either).
                    cols[field.name] = pa.array([-1, -2], type=field.type)
                else:
                    cols[field.name] = pa.array([None, None], type=field.type)
            sp = os.path.join(d, f"zz-sentinel-{k}.parquet")
            pq.write_table(pa.table(cols, schema=schema), sp, version="2.6")
            os.utime(sp, (now - 60 + 30 * k, now - 60 + 30 * k))

        def side(event_type: str, alias: str) -> DataFrame:
            # NULL-ts rows are dropped EXPLICITLY (the watermark node
            # would silently discard them anyway); the oracle mirrors
            # with ts IS NOT NULL so the LEFT side's unmatched set
            # agrees (nullmix probe axis)
            s = (
                read_events_stream(
                    spark, stage, max_files_per_trigger=1, recursive=True
                )
                .filter(F.col("ts").isNotNull())
                .withWatermark("ts", "1 hour")
            )
            return s.filter(F.col("event_type") == event_type).select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"_{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
            )

        clicks, purchases = side("click", "click"), side("purchase", "purchase")
        # NULL-key BYPASS (nullkeys axis, r13): SQL LEFT JOIN preserves
        # a NULL-key left row (it matches nothing and emits null-padded)
        # but Spark's streaming symmetric-hash join cannot store or
        # expire a NULL key — those clicks silently vanished from the
        # drain. They can NEVER match, so they need no join state and no
        # watermark wait: route them AROUND the join, null-padded, and
        # emit on arrival. At 100 TB this is also the efficient plan —
        # NULL keys would otherwise hash into one skewed state
        # partition for nothing. The join itself gets only keyed rows
        # (purchases with NULL users match nothing either: dropped).
        null_clicks = clicks.filter(F.col("_click_user").isNull()).select(
            "click_id",
            F.lit(None).cast("long").alias("purchase_id"),
            "_click_user",
            "click_ts",
            F.lit(None).cast("timestamp").alias("purchase_ts"),
        )
        joined = clicks.filter(F.col("_click_user").isNotNull()).join(
            purchases.filter(F.col("_purchase_user").isNotNull()),
            (F.col("_click_user") == F.col("_purchase_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
            "left_outer",
        ).select(
            "click_id", "purchase_id", "_click_user", "click_ts",
            "purchase_ts",
        )
        out = run_to_completion(
            joined.unionByName(null_clicks), output_mode="append"
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    # keep the NULL-user bypass rows; drop only the negative sentinels
    return out.filter(
        (F.col("_click_user") >= 0) | F.col("_click_user").isNull()
    ).select(
        "click_id",
        "purchase_id",
        F.col("_click_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
    )


@register(
    "events_stl_decomposition",
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h_ts, count(*) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1),
    w AS (
        SELECT h_ts, y,
               SUM(y)   OVER (ORDER BY h_ts ROWS BETWEEN 12 PRECEDING
                              AND 12 FOLLOWING) AS sum25,
               COUNT(*) OVER (ORDER BY h_ts ROWS BETWEEN 12 PRECEDING
                              AND 12 FOLLOWING) AS n25
        FROM hourly),
    full_w AS (
        SELECT h_ts, y, sum25, 25 * y - sum25 AS d25,
               extract(hour FROM h_ts) AS hod
        FROM w WHERE n25 = 25),
    seas AS (
        SELECT hod, SUM(d25) AS s_num, 25 * count(*) AS s_den
        FROM full_w GROUP BY 1)
    SELECT f.h_ts, f.y,
           round(f.sum25 / 25.0, 6) AS trend,
           round(s.s_num / (s.s_den * 1.0), 6) + 0.0 AS seasonal,
           round(f.y - f.sum25 / 25.0 - s.s_num / (s.s_den * 1.0), 6) + 0.0
               AS residual
    FROM full_w f JOIN seas s USING (hod)
    """,
    doc="STL-style additive decomposition of the hourly event series: "
    "trend = centered 25-hour moving average (full windows only), "
    "seasonal = hour-of-day mean of the detrended series, residual = "
    "observed - trend - seasonal — the classic "
    "trend/seasonality/noise split behind anomaly baselines, one "
    "level up from the EWMA and Holt operators (which smooth but "
    "never separate components). Exactness: every aggregate sums "
    "INTEGERS (counts, and the detrended value is kept as the "
    "integer 25*y - sum25), so no float accumulation order exists; "
    "the final divisions/subtractions are single deterministic IEEE "
    "ops mirrored verbatim (a trailing + 0.0 folds IEEE negative "
    "zero, which the two engines round to with opposite signs). "
    "Scale: the hourly rollup is the only "
    "event-volume-sized operation; the windows/joins run on the "
    "bounded one-row-per-hour series (a year is 8,760 rows on one "
    "partition — negligible; partition the rollup by range if the "
    "series itself ever stops fitting).",
)
def q_events_stl_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h_ts")).agg(
        F.count("*").alias("y")
    )
    w = Window.orderBy("h_ts").rowsBetween(-12, 12)
    wd = hourly.select(
        "h_ts",
        "y",
        F.sum("y").over(w).alias("sum25"),
        F.count("*").over(w).alias("n25"),
    )
    full_w = wd.filter(F.col("n25") == 25).select(
        "h_ts",
        "y",
        "sum25",
        (25 * F.col("y") - F.col("sum25")).alias("d25"),
        F.hour("h_ts").alias("hod"),
    )
    seas = full_w.groupBy("hod").agg(
        F.sum("d25").alias("s_num"), (25 * F.count("*")).alias("s_den")
    )
    trend = F.col("sum25") / 25.0
    seasonal = F.col("s_num") / (F.col("s_den") * 1.0)
    return full_w.join(F.broadcast(seas), "hod").select(
        "h_ts",
        "y",
        F.round(trend, 6).alias("trend"),
        (F.round(seasonal, 6) + 0.0).alias("seasonal"),
        (F.round(F.col("y") - trend - seasonal, 6) + 0.0).alias("residual"),
    )


@register(
    "events_psi_drift",
    """
    WITH vals AS (
        SELECT value AS v, ts < TIMESTAMP '2024-01-16 00:00:00' AS is_base
        FROM events WHERE value IS NOT NULL),
    rng AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
    binned AS (
        SELECT least(9, CAST(floor((v - lo) / (hi - lo) * 10) AS BIGINT))
                   AS bin, is_base
        FROM vals CROSS JOIN rng),
    counts AS (
        SELECT bin,
               count(*) FILTER (WHERE is_base) AS c_base,
               count(*) FILTER (WHERE NOT is_base) AS c_recent
        FROM binned GROUP BY 1),
    spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
    tot AS (SELECT SUM(c_base)::BIGINT AS n_base,
                   SUM(c_recent)::BIGINT AS n_recent FROM counts),
    terms AS (
        SELECT s.bin,
               coalesce(c.c_base, 0) AS n_base_bin,
               coalesce(c.c_recent, 0) AS n_recent_bin,
               ((coalesce(c.c_base, 0) + 1.0) / (t.n_base + 10)
                - (coalesce(c.c_recent, 0) + 1.0) / (t.n_recent + 10))
               * ln(((coalesce(c.c_base, 0) + 1.0) / (t.n_base + 10))
                    / ((coalesce(c.c_recent, 0) + 1.0) / (t.n_recent + 10)))
                   AS term
        FROM spine s LEFT JOIN counts c ON c.bin = s.bin CROSS JOIN tot t)
    SELECT bin, n_base_bin, n_recent_bin,
           round(term, 6) + 0.0 AS psi_term,
           round(SUM(term) OVER (ORDER BY bin
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW), 6) + 0.0 AS psi_running
    FROM terms
    """,
    doc="Population stability index drift monitor: the event value "
    "distribution of the first half of January vs the second, 10 "
    "equi-width bins over the global range, Laplace +1 smoothing so "
    "empty bins stay defined, per-bin PSI terms plus the running "
    "total (the last bin's psi_running IS the PSI; > 0.25 is the "
    "classic retrain alarm). The ML-monitoring drift statistic the "
    "stats family lacked: KS (events_ks_two_sample) compares CDFs "
    "rank-wise, PSI compares binned masses — the production scorecard "
    "standard. Determinism: the only float SUM is the running total, "
    "whose order is pinned by the window's ORDER BY bin (10 rows), "
    "so both engines fold identically; all counts are exact "
    "integers. Scale: one pass to bin+count (broadcast 1-row range), "
    "then everything runs on 10 rows.",
)
def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    vals = e.filter(F.col("value").isNotNull()).select(
        F.col("value").alias("v"),
        (F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")).alias(
            "is_base"
        ),
    )
    rng = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = vals.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.lit(9),
            # try_divide: a single distinct value makes hi = lo; both
            # engines then bin NULL and least() skips it (r10 sweep)
            F.floor(
                F.try_divide(F.col("v") - F.col("lo"), F.col("hi") - F.col("lo"))
                * 10
            )
            .cast("bigint"),
        ).alias("bin"),
        "is_base",
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("is_base")).alias("c_base"),
        F.count_if(~F.col("is_base")).alias("c_recent"),
    )
    # counts is consumed twice (spine join + totals); without the
    # persist the WHOLE event binning pass runs twice — the persist is
    # 10 rows
    from .ext.caching import swap_persist

    counts = swap_persist("psi_counts", counts)
    spine = spark.range(10).select(F.col("id").alias("bin"))
    tot = counts.agg(
        F.sum("c_base").alias("n_base"), F.sum("c_recent").alias("n_recent")
    )
    t = (
        spine.join(F.broadcast(counts), "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.coalesce("c_base", F.lit(0)).alias("n_base_bin"),
            F.coalesce("c_recent", F.lit(0)).alias("n_recent_bin"),
            F.col("n_base"),
            F.col("n_recent"),
        )
    )
    p = (F.col("n_base_bin") + 1.0) / (F.col("n_base") + 10)
    q = (F.col("n_recent_bin") + 1.0) / (F.col("n_recent") + 10)
    term = (p - q) * F.log(p / q)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t.select(
        "bin",
        "n_base_bin",
        "n_recent_bin",
        (F.round(term, 6) + 0.0).alias("psi_term"),
        (F.round(F.sum(term).over(w), 6) + 0.0).alias("psi_running"),
    )


@register(
    "events_cuped_adjustment",
    f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(coalesce(SUM({_VAL}) FILTER (
                   WHERE ts < TIMESTAMP '2024-01-16 00:00:00'), 0)
                    AS DECIMAL(14,2)) AS x,
               CAST(coalesce(SUM({_VAL}) FILTER (
                   WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'), 0)
                    AS DECIMAL(14,2)) AS y
        FROM events WHERE value IS NOT NULL GROUP BY 1),
    s AS (
        SELECT count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
        FROM per_user),
    m AS (
        SELECT n,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n AS cov,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n AS varx,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n AS vary
        FROM s)
    SELECT n AS n_users,
           CASE WHEN varx > 0 THEN round(cov / varx, 6) END AS theta,
           round(vary / n, 6) AS var_y,
           CASE WHEN varx > 0
                THEN round((vary - cov * cov / varx) / n, 6) END AS var_adjusted,
           CASE WHEN varx > 0 AND vary > 0
                THEN round(cov * cov / (varx * vary), 6) END
               AS variance_reduction
    FROM m
    """,
    doc="CUPED variance reduction (controlled experiments using "
    "pre-experiment data): per-user pre-period spend as covariate x, "
    "experiment-period spend as metric y; theta = cov/var(x), and "
    "the adjusted metric y - theta*(x - mean x) has variance "
    "var(y)*(1 - r^2) — reported in closed form from ONE pass of "
    "exact decimal power sums (n, Sx, Sy, Sxx, Sxy, Syy), the same "
    "discipline as stats_bivariate_regression; no second adjusted "
    "pass is needed because the optimal-theta variance collapses "
    "algebraically. variance_reduction IS r^2 — the fraction of "
    "metric variance the covariate removes, the number that sizes "
    "how much smaller an A/B test can get. Scale: one user-keyed "
    "aggregate then a 1-row reduction.",
)
def q_events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < cut, _dec_val())), F.lit(0))
        .cast("decimal(14,2)")
        .alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cut, _dec_val())), F.lit(0))
        .cast("decimal(14,2)")
        .alias("y"),
    )
    s = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / n
    varx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / n
    vary = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double") / n
    return s.select(
        n.alias("n_users"),
        F.when(varx > 0, F.round(cov / varx, 6)).alias("theta"),
        F.round(vary / n, 6).alias("var_y"),
        F.when(varx > 0, F.round((vary - cov * cov / varx) / n, 6)).alias(
            "var_adjusted"
        ),
        F.when((varx > 0) & (vary > 0), F.round(cov * cov / (varx * vary), 6)).alias(
            "variance_reduction"
        ),
    )


_SEG_SSE = """(
    (CAST({syy} AS DOUBLE) - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE) / {n})
    - CASE WHEN CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE) / {n} > 0
           THEN (CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE) / {n})
                * (CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE) / {n})
                / (CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE) / {n})
           ELSE 0.0 END)"""

_SEG_SLOPE = """(
    CASE WHEN CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE) / {n} > 0
         THEN (CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE) / {n})
              / (CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE) / {n})
         END)"""


def _seg_sql() -> str:
    s1 = {"n": "b", "sx": "psx", "sy": "psy", "sxx": "psxx", "sxy": "psxy", "syy": "psyy"}
    s2 = {
        "n": "(tn - b)",
        "sx": "(tsx - psx)",
        "sy": "(tsy - psy)",
        "sxx": "(tsxx - psxx)",
        "sxy": "(tsxy - psxy)",
        "syy": "(tsyy - psyy)",
    }
    tot = {"n": "tn", "sx": "tsx", "sy": "tsy", "sxx": "tsxx", "sxy": "tsxy", "syy": "tsyy"}
    return f"""
    WITH c AS (SELECT date_trunc('hour', ts) AS hour, count(*) AS y
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    r AS (SELECT hour, y, row_number() OVER (ORDER BY hour) AS i FROM c),
    p AS (SELECT hour, i,
                 CAST(SUM(i)     OVER w AS BIGINT) AS psx,
                 CAST(SUM(y)     OVER w AS BIGINT) AS psy,
                 CAST(SUM(i * i) OVER w AS BIGINT) AS psxx,
                 CAST(SUM(i * y) OVER w AS BIGINT) AS psxy,
                 CAST(SUM(y * y) OVER w AS BIGINT) AS psyy
          FROM r
          WINDOW w AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)),
    t AS (SELECT count(*) AS tn, CAST(SUM(i) AS BIGINT) AS tsx,
                 CAST(SUM(y) AS BIGINT) AS tsy,
                 CAST(SUM(i * i) AS BIGINT) AS tsxx,
                 CAST(SUM(i * y) AS BIGINT) AS tsxy,
                 CAST(SUM(y * y) AS BIGINT) AS tsyy
          FROM r),
    cand AS (
        SELECT hour, i AS b, psx, psy, psxx, psxy, psyy,
               tn, tsx, tsy, tsxx, tsxy, tsyy,
               {_SEG_SSE.format(**s1)} + {_SEG_SSE.format(**s2)} AS sse2
        FROM p CROSS JOIN t
        WHERE i >= 3 AND i <= tn - 3),
    best AS (SELECT * FROM cand ORDER BY sse2, b LIMIT 1)
    SELECT hour AS break_hour, b AS break_index, tn AS n_hours,
           round({_SEG_SSE.format(**tot)}, 6) AS sse_single,
           round(sse2, 6) AS sse_two_segment,
           round({_SEG_SLOPE.format(**s1)}, 6) AS slope_before,
           round({_SEG_SLOPE.format(**s2)}, 6) AS slope_after,
           round(1.0 - sse2 / nullif({_SEG_SSE.format(**tot)}, 0), 6)
               AS sse_reduction
    FROM best
    """


@register(
    "events_segmented_regression",
    _seg_sql(),
    doc="Two-segment (piecewise-linear) regression changepoint over "
    "hourly event volume: for every candidate break b, fit OLS on "
    "[1..b] and [b+1..n] and keep the b minimizing the summed SSE — "
    "the regression-based changepoint that finds SLOPE changes where "
    "CUSUM (events_cusum_changepoint) only sees level shifts. Each "
    "segment's SSE is closed-form from prefix power sums "
    "(Σi, Σy, Σi², Σiy, Σy² — all exact BIGINTs built by ONE window "
    "pass; segment 2's sums are total minus prefix), so the n-1 "
    "candidate fits cost O(n) total, not O(n²). The SSE doubles are "
    "assembled with an identical expression tree from identical "
    "integers in both engines, so the argmin and the earliest-b "
    "tie-break agree. Scale: the hourly rollup is the only "
    "event-volume-sized step; candidates live on the bounded "
    "one-row-per-hour series.",
)
def q_events_segmented_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    c = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("y")
    )
    r = c.withColumn("i", F.row_number().over(Window.orderBy("hour")))
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = r.select(
        "hour",
        "i",
        F.sum("i").over(w).cast("bigint").alias("psx"),
        F.sum("y").over(w).cast("bigint").alias("psy"),
        F.sum(F.col("i") * F.col("i")).over(w).cast("bigint").alias("psxx"),
        F.sum(F.col("i") * F.col("y")).over(w).cast("bigint").alias("psxy"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("psyy"),
    )
    t = r.agg(
        F.count("*").alias("tn"),
        F.sum("i").cast("bigint").alias("tsx"),
        F.sum("y").cast("bigint").alias("tsy"),
        F.sum(F.col("i") * F.col("i")).cast("bigint").alias("tsxx"),
        F.sum(F.col("i") * F.col("y")).cast("bigint").alias("tsxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("tsyy"),
    )
    s1 = {"n": "b", "sx": "psx", "sy": "psy", "sxx": "psxx", "sxy": "psxy", "syy": "psyy"}
    s2 = {
        "n": "(tn - b)",
        "sx": "(tsx - psx)",
        "sy": "(tsy - psy)",
        "sxx": "(tsxx - psxx)",
        "sxy": "(tsxy - psxy)",
        "syy": "(tsyy - psyy)",
    }
    tot = {"n": "tn", "sx": "tsx", "sy": "tsy", "sxx": "tsxx", "sxy": "tsxy", "syy": "tsyy"}
    cand = (
        p.withColumnRenamed("i", "b")
        .crossJoin(F.broadcast(t))
        .filter((F.col("b") >= 3) & (F.col("b") <= F.col("tn") - 3))
        .withColumn(
            "sse2",
            F.expr(f"{_SEG_SSE.format(**s1)} + {_SEG_SSE.format(**s2)}"),
        )
    )
    best = cand.orderBy("sse2", "b").limit(1)
    return best.select(
        F.col("hour").alias("break_hour"),
        F.col("b").alias("break_index"),
        F.col("tn").alias("n_hours"),
        F.round(F.expr(_SEG_SSE.format(**tot)), 6).alias("sse_single"),
        F.round(F.col("sse2"), 6).alias("sse_two_segment"),
        F.round(F.expr(_SEG_SLOPE.format(**s1)), 6).alias("slope_before"),
        F.round(F.expr(_SEG_SLOPE.format(**s2)), 6).alias("slope_after"),
        F.round(
            1.0 - F.col("sse2") / F.expr(f"nullif({_SEG_SSE.format(**tot)}, 0)"), 6
        ).alias("sse_reduction"),
    )


@register(
    "events_attribution_shapley",
    """
    WITH conv AS (
        SELECT user_id, min(ts) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
    pre AS (
        SELECT c.user_id,
               CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS bit
        FROM conv c JOIN events e ON e.user_id = c.user_id
        WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'
        GROUP BY 1, 2),
    masks AS (
        SELECT c.user_id,
               coalesce((SELECT SUM(bit)::BIGINT FROM pre
                         WHERE pre.user_id = c.user_id), 0) AS mask
        FROM conv c),
    mcnt AS (SELECT mask, count(*) AS cnt FROM masks GROUP BY 1),
    spine AS (SELECT unnest(generate_series(0, 15)) AS s),
    v AS (
        SELECT s.s, coalesce(SUM(m.cnt), 0)::BIGINT AS val
        FROM spine s LEFT JOIN mcnt m ON (m.mask | s.s) = s.s
        GROUP BY 1),
    ch AS (SELECT * FROM (VALUES (0, 'click'), (1, 'error'),
                                 (2, 'signup'), (3, 'view')) AS t(cbit, channel)),
    terms AS (
        SELECT ch.channel,
               (CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                     WHEN 2 THEN 2 ELSE 6 END)
               * (v1.val - v0.val) AS w_term
        FROM ch
        JOIN v v0 ON (v0.s & (1 << ch.cbit)) = 0
        JOIN v v1 ON v1.s = v0.s + (1 << ch.cbit))
    SELECT channel,
           SUM(w_term)::BIGINT AS phi_num_24,
           round(SUM(w_term) / 24.0, 6) AS shapley_value
    FROM terms GROUP BY 1
    """,
    doc="Exact Shapley-value attribution over the four pre-purchase "
    "channels (click/error/signup/view): coalition value v(S) = "
    "converting users whose touched-channel set is covered by S, "
    "enumerated over all 16 bitmask coalitions, then the exact "
    "Shapley sum phi_c = sum over S without c of "
    "|S|!(n-|S|-1)!/n! * (v(S+c) - v(S)) — the game-theoretic "
    "attribution that position/last-touch heuristics approximate, "
    "with the efficiency axiom making the phis sum to "
    "v(all) - v(empty) exactly. Exactness: the factorial weights are "
    "scaled by 4! = 24 so every term is an INTEGER (phi_num_24); the "
    "single division is the display value. Scale: one user-keyed "
    "pass builds per-user channel bitmasks; everything after runs on "
    "16 coalition rows (at n channels the spine is 2^n — exact "
    "Shapley is for small channel sets by nature; sample-permutation "
    "approximation is the >20-channel path).",
)
def q_events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    pre = (
        conv.join(e, "user_id")
        .filter(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id", bit.alias("bit"))
        .distinct()
    )
    masks = conv.join(
        pre.groupBy("user_id").agg(F.sum("bit").cast("bigint").alias("mask")),
        "user_id",
        "left",
    ).select(F.coalesce("mask", F.lit(0)).alias("mask"))
    mcnt = masks.groupBy("mask").agg(F.count("*").alias("cnt"))
    spine = spark.range(16).select(F.col("id").alias("s"))
    v = (
        spine.join(
            F.broadcast(mcnt),
            (F.col("mask").bitwiseOR(F.col("s")) == F.col("s")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("val"))
    )
    ch = spark.createDataFrame(
        [(0, "click"), (1, "error"), (2, "signup"), (3, "view")],
        "cbit int, channel string",
    )
    v0 = v.select(F.col("s").alias("s0"), F.col("val").alias("val0"))
    v1 = v.select(F.col("s").alias("s1"), F.col("val").alias("val1"))
    w = (
        F.when(F.bit_count(F.col("s0")) == 0, 6)
        .when(F.bit_count(F.col("s0")) == 1, 2)
        .when(F.bit_count(F.col("s0")) == 2, 2)
        .otherwise(6)
    )
    terms = (
        ch.join(
            F.broadcast(v0),
            F.col("s0").bitwiseAND(F.expr("shiftleft(1, cbit)")) == 0,
        )
        .join(
            F.broadcast(v1),
            F.col("s1") == F.col("s0") + F.expr("shiftleft(1, cbit)"),
        )
        .select("channel", (w * (F.col("val1") - F.col("val0"))).alias("w_term"))
    )
    return terms.groupBy("channel").agg(
        F.sum("w_term").cast("bigint").alias("phi_num_24"),
        F.round(F.sum("w_term") / 24.0, 6).alias("shapley_value"),
    )


@register(
    "asof_nearest_click_purchase",
    """
    WITH p AS (
        SELECT user_id, ts, value FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1),
    c AS (
        -- ONE deterministic click per event_id (nullkeysdup composite,
        -- r13): duplicate ingest copies that differ only in NULL
        -- pattern (one keeps user_id, the twin lost it) would
        -- otherwise each survive the DISTINCT and the final
        -- JOIN USING (event_id) recombination would CROSS them
        -- (2 b-rows x 2 f-rows). Survivor = the keyed copy first
        -- (user_id IS NULL sorts it last), then (user_id, ts).
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'click' AND ts IS NOT NULL
          AND event_id IS NOT NULL
        QUALIFY row_number() OVER (
            PARTITION BY event_id
            ORDER BY (user_id IS NULL), user_id, ts) = 1),
    b AS (
        SELECT c.event_id, p.ts AS b_ts, p.value AS b_value
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts),
    f AS (
        SELECT c.event_id, p.ts AS f_ts, p.value AS f_value
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
                     epoch_us(c.ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(c.ts))
                THEN b_ts ELSE f_ts END AS ts_matched,
           CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
                     epoch_us(c.ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(c.ts))
                THEN b_value ELSE f_value END AS value_matched,
           CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
                     epoch_us(c.ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(c.ts))
                THEN 'backward' ELSE 'forward' END AS direction
    FROM c JOIN b USING (event_id) JOIN f USING (event_id)
    """,
    doc="NEAREST as-of join (pandas merge_asof direction='nearest', "
    "completing the temporal-join family's direction matrix): each "
    "click matched to the user's closest purchase on EITHER side, "
    "equal-distance and exact-timestamp ties resolving backward. "
    "Both directional candidates come from ONE union-scan over one "
    "user-keyed shuffle (the backward last() and forward first() "
    "windows share the exchange; distances compare as exact integer "
    "microseconds), still O(|L|+|R|) rows — verified against a "
    "double DuckDB ASOF JOIN with the same CASE pick.",
)
def q_asof_nearest_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.asof import asof_nearest_join

    e = _events_ts(spark, sf_dir)
    # the match is per click EVENT: ONE deterministic survivor per
    # event_id (bug class 9 + nullkeysdup r13 — duplicate ingest
    # copies differing only in NULL pattern would each survive a plain
    # distinct and cross-multiply in the oracle's USING (event_id)
    # recombination). Survivor = the keyed copy first (user_id IS NULL
    # sorts last), then (user_id, ts) — mirrored in the oracle's c
    # CTE. An id-LESS click has no event identity and is excluded in
    # both dialects; the purchase side dedups inside
    # asof_nearest_join's (keys, ts) tie-break window.
    w_click = Window.partitionBy("event_id").orderBy(
        F.col("user_id").isNull().asc(),
        F.col("user_id").asc_nulls_last(),
        F.col("ts").asc_nulls_last(),
    )
    clicks = (
        e.filter(
            (F.col("event_type") == "click") & F.col("event_id").isNotNull()
        )
        .select("event_id", "user_id", "ts")
        .withColumn("_crn", F.row_number().over(w_click))
        .filter(F.col("_crn") == 1)
        .drop("_crn")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_nearest_join(
        clicks,
        purchases,
        keys=["user_id"],
        ts="ts",
        payload=["value"],
        tiebreak="event_id",
    )


@register(
    "events_forecast_naive_eval",
    """
    WITH h AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               count(*) AS c
        FROM events GROUP BY 1),
    ev AS (
        SELECT a.c AS actual, s.c AS season, p.c AS persist
        FROM h a
        JOIN h s ON a.hr = s.hr + 24
        JOIN h p ON a.hr = p.hr + 1),
    agg AS (
        SELECT count(*) AS n_hours,
               CAST(SUM(abs(actual - season)) AS BIGINT) AS sae_seasonal,
               CAST(SUM(abs(actual - persist)) AS BIGINT) AS sae_persistence
        FROM ev)
    SELECT n_hours, sae_seasonal, sae_persistence,
           round(CAST(sae_seasonal AS DOUBLE) / n_hours, 6) AS mae_seasonal,
           round(CAST(sae_persistence AS DOUBLE) / n_hours, 6)
               AS mae_persistence,
           round(CAST(sae_seasonal AS DOUBLE) / sae_persistence, 6) AS mase
    FROM agg
    """,
    doc="Forecast backtest of the two canonical naive models over hourly "
    "event volume: seasonal-naive (predict this hour with the count 24 "
    "hours earlier) vs persistence (previous hour), scored on every "
    "hour where both references exist (equi-joins on the integer hour "
    "index, so calendar gaps exclude themselves instead of silently "
    "pairing wrong rows the way a row-offset LAG would). MASE is the "
    "ratio of the two raw absolute-error sums — exact integers off "
    "integer hourly counts; only the final three ratios are doubles. "
    "This is the eval harness the forecasting operators (events_hourly_"
    "holt, events_stl_decomposition) were missing: a model beats "
    "the bar only if its error sits below both naive baselines. "
    "Scale: one fact scan collapses to an hourly frame (8,760 rows/"
    "year no matter the event volume); the twin self-joins are over "
    "that tiny frame, broadcast-eligible.",
)
def q_events_forecast_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    h = (
        e.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr")
        )
        .groupBy("hr")
        .agg(F.count("*").alias("c"))
    )
    from .ext.caching import swap_persist

    h = swap_persist("naive_eval_hours", h)
    a = h.select(F.col("hr").alias("hra"), F.col("c").alias("actual"))
    s = h.select((F.col("hr") + 24).alias("hrs"), F.col("c").alias("season"))
    p = h.select((F.col("hr") + 1).alias("hrp"), F.col("c").alias("persist"))
    ev = a.join(F.broadcast(s), F.col("hra") == F.col("hrs")).join(
        F.broadcast(p), F.col("hra") == F.col("hrp")
    )
    agg = ev.agg(
        F.count("*").alias("n_hours"),
        F.sum(F.abs(F.col("actual") - F.col("season")))
        .cast("bigint")
        .alias("sae_seasonal"),
        F.sum(F.abs(F.col("actual") - F.col("persist")))
        .cast("bigint")
        .alias("sae_persistence"),
    )
    return agg.select(
        "n_hours",
        "sae_seasonal",
        "sae_persistence",
        F.round(F.col("sae_seasonal").cast("double") / F.col("n_hours"), 6).alias(
            "mae_seasonal"
        ),
        F.round(
            F.col("sae_persistence").cast("double") / F.col("n_hours"), 6
        ).alias("mae_persistence"),
        F.round(
            F.col("sae_seasonal").cast("double") / F.col("sae_persistence"), 6
        ).alias("mase"),
    )


@register(
    "events_ohlc_hourly",
    """
    WITH seq AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               CAST(value AS DECIMAL(12,2)) AS v,
               row_number() OVER (
                   PARTITION BY event_type, CAST(floor(epoch(ts)/3600) AS BIGINT)
                   ORDER BY ts, event_id,
                            CAST(value AS DECIMAL(12,2))) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type, CAST(floor(epoch(ts)/3600) AS BIGINT)
                   ORDER BY ts DESC, event_id DESC,
                            CAST(value AS DECIMAL(12,2)) DESC) AS rn_d
        FROM events),
    bars AS (
        SELECT event_type, hr,
               count(*) AS n_trades,
               CAST(SUM(CASE WHEN rn_a = 1 THEN v END) AS DOUBLE) AS open,
               CAST(max(v) AS DOUBLE) AS high,
               CAST(min(v) AS DOUBLE) AS low,
               CAST(SUM(CASE WHEN rn_d = 1 THEN v END) AS DOUBLE) AS close,
               CAST(SUM(v) AS DOUBLE) AS volume
        FROM seq GROUP BY 1, 2)
    SELECT event_type,
           count(*) AS n_bars,
           CAST(SUM(n_trades) AS BIGINT) AS n_events,
           round(SUM(CASE WHEN close > open THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS up_bar_ratio,
           CAST(max(high) AS DOUBLE) AS max_high,
           CAST(min(low) AS DOUBLE) AS min_low,
           round(CAST(SUM(CAST(volume AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_volume
    FROM bars GROUP BY event_type ORDER BY event_type
    """,
    doc="Hourly OHLC candlestick bars per event type — the canonical "
    "time-series downsample (open/high/low/close/volume) — summarized "
    "per type so the readout stays bounded while every bar feeds it. "
    "Open/close are picked by twin row_numbers over (ts, event_id) — "
    "the explicit tie-break makes first/last deterministic in both "
    "engines (first_value semantics without frame ambiguity); values "
    "go through DECIMAL(12,2) so bar volume and the total are exact "
    "integers in cents. Scale: ONE shuffle keyed (event_type, hour) "
    "shared by both window passes and the bar aggregate (same "
    "partition key), then a tiny per-type rollup; bars are bounded by "
    "hours x types regardless of event volume.",
)
def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    hr = F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr")
    seq = e.select("event_type", hr, _dec_val().alias("v"), "ts", "event_id")
    # v as final tie-break both directions (dupnullmix r12): duplicate
    # (ts, event_id) copies differing only in value otherwise make
    # open/close picks engine-arbitrary
    wa = Window.partitionBy("event_type", "hr").orderBy(
        "ts", "event_id", F.col("v").asc_nulls_last()
    )
    wd = Window.partitionBy("event_type", "hr").orderBy(
        F.col("ts").desc(), F.col("event_id").desc(), F.col("v").desc()
    )
    seq = seq.select(
        "event_type",
        "hr",
        "v",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    bars = seq.groupBy("event_type", "hr").agg(
        F.count("*").alias("n_trades"),
        F.sum(F.when(F.col("rn_a") == 1, F.col("v"))).cast("double").alias("open"),
        F.max("v").cast("double").alias("high"),
        F.min("v").cast("double").alias("low"),
        F.sum(F.when(F.col("rn_d") == 1, F.col("v"))).cast("double").alias("close"),
        F.sum("v").cast("double").alias("volume"),
    )
    return (
        bars.groupBy("event_type")
        .agg(
            F.count("*").alias("n_bars"),
            F.sum("n_trades").cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.when(F.col("close") > F.col("open"), 1).otherwise(0))
                / F.count("*").cast("double"),
                6,
            ).alias("up_bar_ratio"),
            F.max("high").cast("double").alias("max_high"),
            F.min("low").cast("double").alias("min_low"),
            F.round(
                F.sum(F.col("volume").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_volume"),
        )
        .orderBy("event_type")
    )


@register(
    "events_twap_value",
    """
    WITH seq AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               epoch_us(lead(ts) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id,
                                                CAST(value AS DECIMAL(12,2))))
                   - epoch_us(ts) AS dur_us
        FROM events),
    iv AS (SELECT * FROM seq WHERE dur_us IS NOT NULL)
    SELECT event_type,
           count(*) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
           CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * dur_us)
                     AS DECIMAL(38,0)) AS BIGINT) AS weighted_cents_us,
           round(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * dur_us) AS DOUBLE)
                 / CAST(SUM(dur_us) AS DOUBLE) / 100, 6) AS twap
    FROM iv GROUP BY event_type ORDER BY event_type
    """,
    doc="Time-weighted average value (TWAP) per event type: each "
    "observation is held until the next observation of the same type, "
    "so its weight is the exact microsecond duration of that interval "
    "(lead over (ts, event_id) — the last observation has no interval "
    "and drops, standard TWAP convention). Values quantize to integer "
    "cents via DECIMAL(12,2)*100 and the weighted sum accumulates in "
    "DECIMAL(38,0) — cents x microseconds x years overflows BIGINT at "
    "warehouse scale, 38 digits does not — so the numerator is exact "
    "and order-free; the only double is the final division. Scale: "
    "one shuffle keyed by event_type shared by the lead window and "
    "the aggregate; no self-join.",
)
def q_events_twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # value tie-break (dupnullmix r12): duplicate (ts, event_id) copies
    # differing only in value otherwise swap interval assignments
    w = Window.partitionBy("event_type").orderBy(
        "ts", "event_id", _dec_val().asc_nulls_last()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        "event_type",
        (_dec_val() * 100).cast("bigint").alias("cents"),
        (F.unix_micros(F.lead("ts").over(w).cast("timestamp")) - us).alias(
            "dur_us"
        ),
    ).filter(F.col("dur_us").isNotNull())
    wsum = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dur_us"))
    return (
        seq.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("total_dur_us"),
            wsum.cast("decimal(38,0)").cast("bigint").alias("weighted_cents_us"),
            F.round(
                wsum.cast("double") / F.sum("dur_us").cast("double") / 100, 6
            ).alias("twap"),
        )
        .orderBy("event_type")
    )


@register(
    "events_burstiness_fano",
    """
    WITH h AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               count(*) AS c
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT event_type,
               count(*) AS n_hours,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM h GROUP BY event_type)
    SELECT event_type, n_hours, s1 AS n_events,
           round(CAST(s1 AS DOUBLE) / n_hours, 6) AS mean_per_hour,
           round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_hours)
                 / (n_hours - 1) / (CAST(s1 AS DOUBLE) / n_hours), 6)
               AS fano_factor,
           round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_hours)
                      / (n_hours - 1)) / (CAST(s1 AS DOUBLE) / n_hours), 6)
               AS cv
    FROM m ORDER BY event_type
    """,
    doc="Burstiness of the arrival process per event type over hourly "
    "counts: Fano factor (variance-to-mean of counts; 1 = Poisson, "
    ">1 = overdispersed/bursty) and the coefficient of variation. "
    "Active-hour convention: only hours with >=1 event enter (gap "
    "hours would need a spine join; the active-hour Fano is the "
    "standard overdispersion screen). Variance comes from exact "
    "integer power sums (counts are integers, s1/s2 exact BIGINTs) in "
    "one fixed double expression, so both engines evaluate the same "
    "IEEE sequence. Scale: one scan to the bounded hourly frame, then "
    "a 5-row readout.",
)
def q_events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    h = (
        e.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("c"))
    )
    m = h.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    # try_divide: a single active hour zeroes the (n-1) denominator (r10)
    var = F.try_divide(
        F.col("s2").cast("double") - s1d * F.col("s1") / F.col("n_hours"),
        F.col("n_hours") - 1,
    )
    mean = s1d / F.col("n_hours")
    return m.select(
        "event_type",
        "n_hours",
        F.col("s1").alias("n_events"),
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(var / mean, 6).alias("fano_factor"),
        F.round(F.sqrt(var) / mean, 6).alias("cv"),
    ).orderBy("event_type")


_DYN_SESSION_ORACLE = """
    WITH g AS (
        SELECT user_id, epoch_us(ts) AS tus,
               epoch_us(ts) + CASE WHEN event_type = 'purchase'
                                   THEN 1800000000 ELSE 600000000 END AS eus
        FROM events WHERE ts IS NOT NULL),
    f AS (
        SELECT user_id, tus, eus,
               CASE WHEN max(eus) OVER (
                        PARTITION BY user_id ORDER BY tus, eus
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                     OR tus >= max(eus) OVER (
                        PARTITION BY user_id ORDER BY tus, eus
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_s
        FROM g),
    isl AS (
        SELECT user_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, eus
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM f),
    sess AS (
        SELECT user_id, sid, count(*) AS n
        FROM isl GROUP BY user_id, sid)
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           count(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           round(CAST(SUM(n) AS DOUBLE) / count(*), 6)
               AS avg_events_per_session,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS singleton_sessions,
           CAST(SUM(CASE WHEN n >= 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS big_sessions,
           CAST(max(n) AS BIGINT) AS max_session_events
    FROM sess
    """


@register(
    "events_session_dynamic_gap",
    _DYN_SESSION_ORACLE,
    doc="Sessionization with a DYNAMIC inactivity gap — purchases hold "
    "the session open 30 minutes, everything else 10 — via Spark's "
    "native session_window with a per-event interval EXPRESSION (the "
    "Spark 3.2+ dynamic-gap API; the fixed-gap twin is "
    "events_session_windows). The oracle is the gaps-and-islands "
    "generalization: each event proposes an end ts+gap(event), a new "
    "session starts exactly when the event time reaches the RUNNING "
    "MAX of proposed ends (running max, not lag, because a long-gap "
    "event can outlast several short-gap successors), matching "
    "Spark's merge rule (new.start < current.end merges, half-open). "
    "All comparisons are exact integer microseconds. Scale: the "
    "native aggregate is one user-keyed shuffle with state merged "
    "map-side (UpdatingSessionsIterator), same key as every other "
    "per-user events operator; the readout is a 1-row summary over "
    "the bounded session frame.",
)
def q_events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # string-literal gaps: session_window requires CalendarIntervalType,
    # and 'interval value unit' strings are what the dynamic-gap API casts
    # (INTERVAL 30 MINUTE literals are DayTimeIntervalType and are rejected)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    sess = e.groupBy(
        F.session_window(F.col("ts"), gap), F.col("user_id")
    ).agg(F.count("*").alias("n"))
    return sess.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count("*").alias("n_sessions"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.round(F.sum("n").cast("double") / F.count("*"), 6).alias(
            "avg_events_per_session"
        ),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("singleton_sessions"),
        F.sum(F.when(F.col("n") >= 10, 1).otherwise(0))
        .cast("bigint")
        .alias("big_sessions"),
        F.max("n").cast("bigint").alias("max_session_events"),
    )


@register(
    "stream_session_dynamic_gap",
    _stream_oracle(_DYN_SESSION_ORACLE),
    doc="Streaming twin of events_session_dynamic_gap: the SAME "
    "dynamic-gap session_window aggregate run as a Structured "
    "Streaming query (file source -> watermark -> native stateful "
    "session merge -> AvailableNow drain into a memory sink), then "
    "the bounded-frame summary computed on the drained sink — "
    "proving the per-event gap expression works under the streaming "
    "state-store merge path, not just batch. Shares the running-max "
    "gaps-and-islands oracle verbatim. Complete output mode because "
    "the readout aggregates across every session.",
)
def q_stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    sess = stream.groupBy(
        F.session_window(F.col("ts"), gap), F.col("user_id")
    ).agg(F.count("*").alias("n"))
    drained = run_to_completion(sess, output_mode="complete")
    return drained.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count("*").alias("n_sessions"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.round(F.sum("n").cast("double") / F.count("*"), 6).alias(
            "avg_events_per_session"
        ),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("singleton_sessions"),
        F.sum(F.when(F.col("n") >= 10, 1).otherwise(0))
        .cast("bigint")
        .alias("big_sessions"),
        F.max("n").cast("bigint").alias("max_session_events"),
    )


@register(
    "events_crosscorr_lag",
    """
    WITH h AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1),
    lags AS (SELECT i AS lag FROM range(-12, 13) t(i)),
    pairs AS (
        SELECT lags.lag, a.x, b.y
        FROM lags JOIN h a ON TRUE JOIN h b ON b.hr = a.hr + lags.lag),
    m AS (
        SELECT lag, count(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pairs GROUP BY lag)
    SELECT lag, n AS n_hours,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 6) AS xcorr
    FROM m ORDER BY lag
    """,
    doc="Cross-correlation function between the hourly purchase and "
    "error series at lags -12h..+12h — the lead/lag diagnostic that "
    "answers 'do errors foreshadow (negative lag) or follow "
    "(positive lag) purchase volume?', and the input to choosing "
    "exogenous-regressor offsets for the forecasting ops. Pearson r "
    "per lag from exact integer power sums over the hours where both "
    "shifted series exist (equi-join on the shifted hour index — "
    "calendar gaps self-exclude, cf. events_forecast_naive_eval). "
    "Scale: one fact scan collapses to the bounded hourly frame; the "
    "25-lag expansion and self-join run on that frame (25 x hours "
    "rows), never on raw events.",
)
def q_events_crosscorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    h = (
        e.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr"),
            "event_type",
        )
        .groupBy("hr")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    from .ext.caching import swap_persist

    h = swap_persist("xcorr_hours", h)
    lags = e.sparkSession.range(-12, 13).select(F.col("id").alias("lag"))
    a = h.crossJoin(F.broadcast(lags))
    b = h.select((F.col("hr")).alias("hrb"), F.col("y").alias("yb"))
    pairs = a.join(
        b, F.col("hrb") == F.col("hr") + F.col("lag")
    ).select("lag", "x", F.col("yb").alias("y"))
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return m.select(
        "lag",
        F.col("n").alias("n_hours"),
        # try_divide: one overlapping hour zeroes both variances (r10)
        F.round(
            F.try_divide(
                F.col("n") * d("sxy") - d("sx") * F.col("sy"),
                F.sqrt(
                    (F.col("n") * d("sxx") - d("sx") * F.col("sx"))
                    * (F.col("n") * d("syy") - d("sy") * F.col("sy"))
                ),
            ),
            6,
        ).alias("xcorr"),
    ).orderBy("lag")


@register(
    "events_rate_limit_audit",
    """
    WITH s AS (
        SELECT user_id, epoch(ts) AS sec
        FROM events),
    c AS (
        SELECT user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY sec
                              RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
                   AS burst
        FROM s),
    mx AS (
        SELECT user_id, max(burst) AS max_burst
        FROM c GROUP BY user_id)
    SELECT least(CAST(floor(max_burst / 5) AS INT), 10) AS burst_band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(max_burst) AS BIGINT) AS min_burst,
           CAST(max(max_burst) AS BIGINT) AS max_burst
    FROM mx GROUP BY 1 ORDER BY 1
    """,
    doc="Rate-limit audit: each user's maximum burst = most events in "
    "any trailing 10-minute window, banded into a bounded histogram "
    "(bands of 5, capped at 10+) — the sizing readout for per-user "
    "throttles and for streaming state-store hot-key planning. The "
    "trailing count is a RANGE frame over integer epoch SECONDS "
    "(range frames need a numeric ordering key in both engines; "
    "second resolution matches the 600 s window), which counts ALL "
    "rows in the value range regardless of tie order — so ties on "
    "the same second need no tie-break to be deterministic. Scale: "
    "ONE user-keyed shuffle shared by the range window and the "
    "per-user max; the histogram is a bounded readout. The frame "
    "is O(window-occupancy) per row, not O(n^2): Spark evaluates "
    "range frames with a sliding two-pointer over the sorted "
    "partition.",
)
def q_events_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    s = e.select("user_id", F.unix_timestamp("ts").alias("sec"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-600, Window.currentRow)
    )
    c = s.select("user_id", F.count("*").over(w).alias("burst"))
    mx = c.groupBy("user_id").agg(F.max("burst").alias("max_burst"))
    return (
        mx.groupBy(
            F.least(
                F.floor(F.col("max_burst") / 5).cast("int"), F.lit(10)
            ).alias("burst_band")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("max_burst").cast("bigint").alias("min_burst"),
            F.max("max_burst").cast("bigint").alias("max_burst"),
        )
        .orderBy("burst_band")
    )


@register(
    "events_mix_shift_decomposition",
    """
    WITH t0 AS (SELECT min(ts) AS t0 FROM events),
    w AS (
        SELECT event_type,
               CASE WHEN ts < t0 + INTERVAL 7 DAY THEN 1
                    WHEN ts < t0 + INTERVAL 14 DAY THEN 2 END AS wk,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events CROSS JOIN t0),
    k AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN wk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN wk = 1 THEN cents ELSE 0 END) AS BIGINT)
                   AS s1,
               CAST(SUM(CASE WHEN wk = 2 THEN cents ELSE 0 END) AS BIGINT)
                   AS s2
        FROM w WHERE wk IS NOT NULL GROUP BY event_type)
    SELECT event_type, n1, n2,
           round((s2 - s1) / 100.0, 6) AS delta_value,
           round((n2 - n1) * (CAST(s1 AS DOUBLE) / n1) / 100.0, 6)
               AS volume_effect,
           round((s2 - n2 * (CAST(s1 AS DOUBLE) / n1)) / 100.0, 6)
               AS rate_effect
    FROM k ORDER BY event_type
    """,
    doc="Week-over-week metric decomposition per event type: the "
    "change in total value splits into a VOLUME effect ((n2-n1) x "
    "week-1 average) and a RATE effect (week-2 volume x change in "
    "average) — the standard two-factor bridge every product-"
    "analytics 'why did the metric move' review starts from "
    "(volume_effect + rate_effect = delta_value identically, up to "
    "the final rounding). Counts and cent sums are exact integers; "
    "the two divisions are IEEE correctly-rounded on exact inputs, "
    "so the decomposition is bit-stable with no quantized-log "
    "machinery. Windows anchored at the global min event time like "
    "stats_poisson_rate_test. Scale: one scan with a broadcast "
    "1-row anchor, 5-row readout.",
)
def q_events_mix_shift_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    t0 = e.agg(F.min("ts").alias("t0"))
    w = e.crossJoin(F.broadcast(t0)).select(
        "event_type",
        F.when(F.col("ts") < F.col("t0") + F.expr("INTERVAL 7 DAY"), 1)
        .when(F.col("ts") < F.col("t0") + F.expr("INTERVAL 14 DAY"), 2)
        .alias("wk"),
        (_dec_val() * 100).cast("bigint").alias("cents"),
    )
    k = (
        w.filter(F.col("wk").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("wk") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
            F.sum(F.when(F.col("wk") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n2"),
            F.sum(F.when(F.col("wk") == 1, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("s1"),
            F.sum(F.when(F.col("wk") == 2, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("s2"),
        )
    )
    avg1 = F.col("s1").cast("double") / F.col("n1")
    return k.select(
        "event_type",
        "n1",
        "n2",
        F.round((F.col("s2") - F.col("s1")) / 100.0, 6).alias("delta_value"),
        F.round((F.col("n2") - F.col("n1")) * avg1 / 100.0, 6).alias(
            "volume_effect"
        ),
        F.round((F.col("s2") - F.col("n2") * avg1) / 100.0, 6).alias(
            "rate_effect"
        ),
    ).orderBy("event_type")


@register(
    "events_slo_burn_alerts",
    """
    WITH h AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               count(*) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS e
        FROM events GROUP BY 1),
    r AS (
        SELECT hr, n, e,
               CAST(SUM(n) OVER (ORDER BY hr
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS n6,
               CAST(SUM(e) OVER (ORDER BY hr
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS e6
        FROM h),
    b AS (
        SELECT hr,
               CAST(e AS DOUBLE) / n / 0.25 AS burn1,
               CAST(e6 AS DOUBLE) / n6 / 0.25 AS burn6
        FROM r)
    SELECT count(*) AS n_hours,
           CAST(SUM(CASE WHEN burn1 > 1.5 AND burn6 > 1.2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alert_hours,
           round(max(burn1), 6) AS max_burn_1h,
           round(max(burn6), 6) AS max_burn_6h,
           CAST(min(CASE WHEN burn1 > 1.5 AND burn6 > 1.2 THEN hr END)
                AS BIGINT) AS first_alert_hr
    FROM b
    """,
    doc="Error-budget burn-rate alerting (the SRE multiwindow rule): "
    "with an SLO of 75% non-error events (the synthetic stream runs "
    "~20-25% errors, so the budget is 25% — same arithmetic as a "
    "99.9% SLO, scaled to where this data actually lives), compute "
    "the 1-hour and trailing-6-hour burn rates (error rate / budget) "
    "and alert only when BOTH exceed their thresholds (1.5x fast + "
    "1.2x slow — the two-window AND that suppresses blips but pages "
    "on sustained burn). The 6h window is a rows-frame over active "
    "hours (gap hours carry no traffic and consume no budget). "
    "Counts are exact integers; burns are correctly-rounded double "
    "ratios. Scale: one scan to the hourly frame; the rolling sums "
    "and the 1-row readout run on bounded hours.",
)
def q_events_slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    h = (
        e.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("ee"),
        )
        .groupBy("hr")
        .agg(F.count("*").alias("n"), F.sum("ee").cast("bigint").alias("e"))
    )
    w6 = Window.orderBy("hr").rowsBetween(-5, 0)
    r = h.select(
        "hr",
        "n",
        "e",
        F.sum("n").over(w6).cast("bigint").alias("n6"),
        F.sum("e").over(w6).cast("bigint").alias("e6"),
    )
    b = r.select(
        "hr",
        (F.col("e").cast("double") / F.col("n") / 0.25).alias("burn1"),
        (F.col("e6").cast("double") / F.col("n6") / 0.25).alias("burn6"),
    )
    alert = (F.col("burn1") > 1.5) & (F.col("burn6") > 1.2)
    return b.agg(
        F.count("*").alias("n_hours"),
        F.sum(F.when(alert, 1).otherwise(0)).cast("bigint").alias(
            "n_alert_hours"
        ),
        F.round(F.max("burn1"), 6).alias("max_burn_1h"),
        F.round(F.max("burn6"), 6).alias("max_burn_6h"),
        F.min(F.when(alert, F.col("hr"))).cast("bigint").alias(
            "first_alert_hr"
        ),
    )


@register(
    "events_cohort_ltv_curve",
    """
    WITH t0 AS (SELECT min(ts) AS t0 FROM events),
    base AS (
        SELECT user_id,
               CAST(floor(date_diff('second', t0, ts) / 604800.0) AS BIGINT)
                   AS wk,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events CROSS JOIN t0 WHERE ts IS NOT NULL),
    cohort AS (
        SELECT user_id, min(wk) AS cw FROM base GROUP BY user_id),
    cell AS (
        SELECT c.cw AS cohort_week, b.wk - c.cw AS age_week,
               CAST(SUM(b.cents) AS BIGINT) AS cents
        FROM base b JOIN cohort c ON b.user_id = c.user_id
        GROUP BY 1, 2),
    sz AS (SELECT cw AS cohort_week, count(*) AS n_users
           FROM cohort GROUP BY cw)
    SELECT cell.cohort_week AS cohort_week, age_week, n_users,
           round(CAST(CAST(floor(
                     CAST(SUM(cents) OVER (PARTITION BY cell.cohort_week
                                           ORDER BY age_week) AS DOUBLE)
                     / n_users * 10000 + 0.5) AS BIGINT) AS DOUBLE)
                 / 1000000, 6) AS cum_ltv_per_user
    FROM cell JOIN sz ON cell.cohort_week = sz.cohort_week
    ORDER BY cell.cohort_week, age_week
    """,
    doc="Cohort LTV curves: users are cohorted by their first active "
    "week (weeks since the global stream start), and each cohort's "
    "CUMULATIVE value per user is tracked by age week — the "
    "triangle every growth team reads to see whether newer cohorts "
    "monetize faster. Week indexing is exact integer arithmetic on "
    "second differences; value rides as integer cents until the one "
    "per-user division, whose readout quantizes to integer "
    "micro-units (floor(x*10^4+0.5) on the cents-per-user double — "
    "the stats_poisson_bootstrap_ci recipe) so the 6-decimal readout "
    "is a single IEEE division both engines perform identically; a "
    "bare round(x/n/100, 6) forks at the 16th digit on extreme "
    "magnitudes (EXTREMESWEEP r12). Scale: one user-keyed aggregate for "
    "cohorting, one (cohort, age) aggregate, and the running sum on "
    "the bounded cohort-age triangle (weeks x weeks, regardless of "
    "event volume).",
)
def q_events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_ts(spark, sf_dir)
    t0 = e.agg(F.min("ts").alias("t0"))
    base = e.crossJoin(F.broadcast(t0)).select(
        "user_id",
        F.floor(
            (
                F.unix_timestamp("ts") - F.unix_timestamp("t0")
            )
            / 604800.0
        )
        .cast("bigint")
        .alias("wk"),
        (_dec_val() * 100).cast("bigint").alias("cents"),
    )
    cohort = base.groupBy("user_id").agg(F.min("wk").alias("cw"))
    cell = (
        base.join(cohort, "user_id")
        .groupBy(F.col("cw").alias("cohort_week"), (F.col("wk") - F.col("cw")).alias("age_week"))
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    sz = cohort.groupBy(F.col("cw").alias("cohort_week")).agg(
        F.count("*").alias("n_users")
    )
    wc = Window.partitionBy("cohort_week").orderBy("age_week").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cell.join(F.broadcast(sz), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "n_users",
            F.round(
                F.floor(
                    F.sum("cents").over(wc).cast("double")
                    / F.col("n_users")
                    * 10000
                    + 0.5
                ).cast("double")
                / 1000000,
                6,
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "age_week")
    )


@register(
    "stats_poisson_bootstrap_ci",
    f"""
    WITH reps AS (SELECT i AS r FROM range(0, 20) t(i)),
    w AS (
        SELECT event_type, r,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               CASE
                 WHEN u < 0.36787944117144233 THEN 0
                 WHEN u < 0.7357588823428847 THEN 1
                 WHEN u < 0.9196986029286058 THEN 2
                 WHEN u < 0.9810118431238462 THEN 3
                 WHEN u < 0.9963401531726563 THEN 4
                 ELSE 5 END AS wt
        FROM (
            SELECT event_type, value, r,
                   {sql_md5_long("event_id::VARCHAR || ':' || r::VARCHAR", "boot")}
                       / 1152921504606846976.0 AS u
            FROM events CROSS JOIN reps)),
    means AS (
        SELECT event_type, r,
               CAST(floor(CAST(SUM(wt * cents) AS DOUBLE) / SUM(wt)
                          * 10000 + 0.5) AS BIGINT) AS mean_cmicro
        FROM w GROUP BY event_type, r HAVING SUM(wt) > 0),
    agg AS (
        SELECT event_type,
               count(*) AS n_replicates,
               CAST(SUM(mean_cmicro) AS BIGINT) AS s1,
               CAST(SUM(CAST(mean_cmicro AS DECIMAL(38,0)) * mean_cmicro)
                    AS DECIMAL(38,0)) AS s2,
               CAST(min(mean_cmicro) AS BIGINT) AS lo,
               CAST(max(mean_cmicro) AS BIGINT) AS hi
        FROM means GROUP BY event_type)
    SELECT event_type, n_replicates,
           round(CAST(s1 AS DOUBLE) / n_replicates / 1000000, 6)
               AS boot_mean,
           round(sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * s1 / n_replicates)
                      / (n_replicates - 1)) / 1000000, 6) AS boot_sd,
           round(CAST(lo AS DOUBLE) / 1000000, 6) AS boot_lo,
           round(CAST(hi AS DOUBLE) / 1000000, 6) AS boot_hi
    FROM agg ORDER BY event_type
    """,
    doc="Poisson bootstrap of the mean event value per type — the "
    "DISTRIBUTED bootstrap (each row draws an independent "
    "Poisson(1) replicate weight, so no resampling pass needs the "
    "full dataset on one node; the estimator large-scale A/B "
    "platforms actually use). Weights come from the deterministic "
    "md5 hash of (event_id, replicate) mapped through the exact "
    "Poisson(1) CDF cutoffs (double literals spelled identically in "
    "both engines; u = hash/2^60 is an exact-input IEEE division), "
    "so all 20 replicates are reproducible and hash-checked. Each "
    "replicate mean quantizes to integer hundredth-cent micro-units; "
    "the CI readout (min/max of 20 replicates ~ the 5% band, plus "
    "the bootstrap sd from integer power sums) is order-free. "
    "Scale: one scan fanned x20 by a broadcast replicate spine, one "
    "hash-agg keyed (type, replicate) — the classic weight-fanout "
    "bootstrap shape; no per-row state, no driver resampling.",
)
def q_stats_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    reps = e.sparkSession.range(0, 20).select(F.col("id").alias("r"))
    u = md5_long(
        F.concat(
            F.col("event_id").cast("string"), F.lit(":"), F.col("r").cast("string")
        ),
        "boot",
    ) / F.lit(1152921504606846976.0)
    wt = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )
    w = e.crossJoin(F.broadcast(reps)).select(
        "event_type",
        "r",
        (_dec_val() * 100).cast("bigint").alias("cents"),
        wt.alias("wt"),
    )
    means = (
        w.groupBy("event_type", "r")
        .agg(
            F.sum(F.col("wt") * F.col("cents")).alias("swc"),
            F.sum("wt").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            F.floor(
                F.col("swc").cast("double") / F.col("sw") * 10000 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("mean_cmicro"),
        )
    )
    agg = means.groupBy("event_type").agg(
        F.count("*").alias("n_replicates"),
        F.sum("mean_cmicro").cast("bigint").alias("s1"),
        F.sum(F.col("mean_cmicro").cast("decimal(38,0)") * F.col("mean_cmicro"))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.min("mean_cmicro").cast("bigint").alias("lo"),
        F.max("mean_cmicro").cast("bigint").alias("hi"),
    )
    return agg.select(
        "event_type",
        "n_replicates",
        F.round(
            F.col("s1").cast("double") / F.col("n_replicates") / 1000000, 6
        ).alias("boot_mean"),
        F.round(
            F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1") / F.col("n_replicates")
                )
                / (F.col("n_replicates") - 1)
            )
            / 1000000,
            6,
        ).alias("boot_sd"),
        F.round(F.col("lo").cast("double") / 1000000, 6).alias("boot_lo"),
        F.round(F.col("hi").cast("double") / 1000000, 6).alias("boot_hi"),
    ).orderBy("event_type")


@register(
    "events_rollup_cascade",
    """
    WITH h AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
        FROM events GROUP BY 1),
    d AS (
        SELECT CAST(floor(hr / 24) AS BIGINT) AS dy,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(v) AS DECIMAL(18,2)) AS v
        FROM h GROUP BY 1),
    w AS (
        SELECT CAST(floor(dy / 7) AS BIGINT) AS wk,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(v) AS DECIMAL(18,2)) AS v
        FROM d GROUP BY 1)
    SELECT 'hour' AS grain, count(*) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value,
           CAST(max(n) AS BIGINT) AS peak_bucket_events
    FROM h
    UNION ALL
    SELECT 'day', count(*), CAST(SUM(n) AS BIGINT),
           CAST(SUM(v) AS DOUBLE), CAST(max(n) AS BIGINT) FROM d
    UNION ALL
    SELECT 'week', count(*), CAST(SUM(n) AS BIGINT),
           CAST(SUM(v) AS DOUBLE), CAST(max(n) AS BIGINT) FROM w
    ORDER BY grain
    """,
    doc="Multi-granularity rollup cascade: hour -> day -> week, where "
    "each coarser grain RE-AGGREGATES the next finer one instead of "
    "rescanning the fact (day buckets = floor(hr/24), week = "
    "floor(day/7) — pure integer bucket arithmetic, and counts/"
    "decimal sums re-aggregate losslessly). The per-grain summary "
    "row pins the invariant a rollup cascade must keep: identical "
    "n_events and total_value at every grain. Scale: THE "
    "materialized-rollup pattern for 100 TB dashboards — the fact "
    "is scanned once for the hourly frame (persisted; plan-asserted "
    "single scan), and the day/week grains cost aggregations over "
    "bounded frames, not fact scans.",
)
def q_events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    h = (
        e.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr"),
            _dec_val().alias("v"),
        )
        .groupBy("hr")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").cast("decimal(18,2)").alias("v"),
        )
    )
    from .ext.caching import swap_persist

    h = swap_persist("rollup_cascade_h", h)
    d = (
        h.groupBy(F.floor(F.col("hr") / 24).cast("bigint").alias("dy"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v").cast("decimal(18,2)").alias("v"),
        )
    )
    d = swap_persist("rollup_cascade_d", d)
    w = (
        d.groupBy(F.floor(F.col("dy") / 7).cast("bigint").alias("wk"))
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v").cast("decimal(18,2)").alias("v"),
        )
    )

    def summary(df: DataFrame, grain: str) -> DataFrame:
        return df.agg(
            F.lit(grain).alias("grain"),
            F.count("*").alias("n_buckets"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("v").cast("double").alias("total_value"),
            F.max("n").cast("bigint").alias("peak_bucket_events"),
        ).select(
            "grain", "n_buckets", "n_events", "total_value", "peak_bucket_events"
        )

    return (
        summary(h, "hour")
        .unionByName(summary(d, "day"))
        .unionByName(summary(w, "week"))
        .orderBy("grain")
    )


@register(
    "events_weekend_lift",
    """
    WITH h AS (
        SELECT event_type,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
        FROM events),
    c AS (
        SELECT event_type, we, count(*) AS n,
               CAST(count(DISTINCT hr) AS BIGINT) AS n_hours
        FROM h GROUP BY 1, 2),
    piv AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN we = 1 THEN n ELSE 0 END) AS BIGINT) AS n_we,
               CAST(SUM(CASE WHEN we = 1 THEN n_hours ELSE 0 END) AS BIGINT)
                   AS h_we,
               CAST(SUM(CASE WHEN we = 0 THEN n ELSE 0 END) AS BIGINT) AS n_wd,
               CAST(SUM(CASE WHEN we = 0 THEN n_hours ELSE 0 END) AS BIGINT)
                   AS h_wd
        FROM c GROUP BY event_type)
    SELECT event_type, n_we AS weekend_events, n_wd AS weekday_events,
           round(CAST(n_we AS DOUBLE) / h_we, 6) AS weekend_rate_per_hour,
           round(CAST(n_wd AS DOUBLE) / h_wd, 6) AS weekday_rate_per_hour,
           round((CAST(n_we AS DOUBLE) / h_we)
                 / (CAST(n_wd AS DOUBLE) / h_wd), 6) AS weekend_lift
    FROM piv ORDER BY event_type
    """,
    doc="Weekend lift per event type: active-hour-normalized weekend "
    "vs weekday event rates and their ratio — the day-mix control "
    "every traffic comparison needs before reading a WoW delta "
    "(normalizing by ACTIVE hours, not calendar hours, so partial "
    "first/last weeks don't bias the rate). DuckDB dayofweek is "
    "0=Sunday; Spark's dayofweek is 1=Sunday — the Spark side "
    "subtracts 1 so both engines test {0,6}. Exact counts, two "
    "IEEE divisions and one ratio. Scale: one scan, bounded "
    "readout.",
)
def q_events_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    h = e.select(
        "event_type",
        F.when((F.dayofweek("ts") - 1).isin(0, 6), 1).otherwise(0).alias("we"),
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr"),
    )
    c = h.groupBy("event_type", "we").agg(
        F.count("*").alias("n"),
        F.countDistinct("hr").cast("bigint").alias("n_hours"),
    )
    piv = c.groupBy("event_type").agg(
        F.sum(F.when(F.col("we") == 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_we"),
        F.sum(F.when(F.col("we") == 1, F.col("n_hours")).otherwise(0))
        .cast("bigint")
        .alias("h_we"),
        F.sum(F.when(F.col("we") == 0, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_wd"),
        F.sum(F.when(F.col("we") == 0, F.col("n_hours")).otherwise(0))
        .cast("bigint")
        .alias("h_wd"),
    )
    # try_divide throughout: activity confined to one side of the
    # weekend split zeroes the other side's hour count (r10 sweep)
    rwe = F.try_divide(F.col("n_we").cast("double"), F.col("h_we"))
    rwd = F.try_divide(F.col("n_wd").cast("double"), F.col("h_wd"))
    return piv.select(
        "event_type",
        F.col("n_we").alias("weekend_events"),
        F.col("n_wd").alias("weekday_events"),
        F.round(rwe, 6).alias("weekend_rate_per_hour"),
        F.round(rwd, 6).alias("weekday_rate_per_hour"),
        F.round(F.try_divide(rwe, rwd), 6).alias("weekend_lift"),
    ).orderBy("event_type")


@register(
    "events_alert_flapping",
    """
    WITH h AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               count(*) AS n,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS e
        FROM events GROUP BY 1),
    a AS (
        SELECT hr,
               CASE WHEN CAST(e AS DOUBLE) / n / 0.25 > 1.5 THEN 1 ELSE 0 END
                   AS alert
        FROM h),
    al AS (SELECT hr FROM a WHERE alert = 1),
    isl AS (
        SELECT hr, hr - row_number() OVER (ORDER BY hr) AS grp
        FROM al),
    runs AS (
        SELECT grp, count(*) AS run_len,
               CAST(min(hr) AS BIGINT) AS run_start
        FROM isl GROUP BY grp)
    SELECT count(*) AS n_alert_runs,
           CAST(COALESCE(SUM(run_len), 0) AS BIGINT) AS n_alert_hours,
           CAST(COALESCE(max(run_len), 0) AS BIGINT) AS longest_run_hours,
           CAST(COALESCE(SUM(CASE WHEN run_len = 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS flapping_runs,
           round(COALESCE(SUM(CASE WHEN run_len = 1 THEN 1 ELSE 0 END), 0)
                 / NULLIF(CAST(count(*) AS DOUBLE), 0), 6) AS flap_ratio
    FROM runs
    """,
    doc="Alert flapping analysis over the fast-burn signal of "
    "events_slo_burn_alerts: consecutive alert hours collapse into "
    "RUNS via gaps-and-islands on the hour index (hr minus its rank "
    "is constant within a consecutive run — the classic islands "
    "trick on an integer spine), and the readout separates sustained "
    "incidents (long runs) from flapping (1-hour runs) — the number "
    "that decides whether the alert needs hysteresis. Integer "
    "arithmetic throughout; the islands window runs on the bounded "
    "alert-hour frame. Scale: one scan to hours, filter to alert "
    "hours, bounded-frame window + 1-row readout.",
)
def q_events_alert_flapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    h = (
        e.select(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("hr"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("ee"),
        )
        .groupBy("hr")
        .agg(F.count("*").alias("n"), F.sum("ee").cast("bigint").alias("e"))
    )
    al = h.filter(
        F.col("e").cast("double") / F.col("n") / 0.25 > 1.5
    ).select("hr")
    isl = al.select(
        "hr",
        (F.col("hr") - F.row_number().over(Window.orderBy("hr"))).alias("grp"),
    )
    runs = isl.groupBy("grp").agg(
        F.count("*").alias("run_len"),
        F.min("hr").cast("bigint").alias("run_start"),
    )
    return runs.agg(
        F.count("*").alias("n_alert_runs"),
        F.coalesce(F.sum("run_len"), F.lit(0))
        .cast("bigint")
        .alias("n_alert_hours"),
        F.coalesce(F.max("run_len"), F.lit(0))
        .cast("bigint")
        .alias("longest_run_hours"),
        F.coalesce(
            F.sum(F.when(F.col("run_len") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("flapping_runs"),
        # try_divide, not /: with NO alert hours anywhere (possible at
        # scale — replica mixing pulls every hour under the burn
        # threshold, first seen at sf1) the global agg divides 0 by 0,
        # which ANSI Spark throws on while DuckDB's NULLIF twin yields
        # NULL; both now yield NULL for the empty-runs readout
        F.round(
            F.try_divide(
                F.coalesce(
                    F.sum(F.when(F.col("run_len") == 1, 1).otherwise(0)),
                    F.lit(0),
                ),
                F.count("*").cast("double"),
            ),
            6,
        ).alias("flap_ratio"),
    )


@register(
    "events_attribution_time_decay",
    """
    WITH t AS (SELECT user_id, event_id AS touch_id, event_type AS channel,
                      ts AS touch_ts
               FROM events WHERE event_type IN ('view', 'click')),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS mc
          FROM events WHERE event_type = 'purchase'),
    pr AS (SELECT t.channel, t.touch_id, p.purchase_id, p.mc,
                  epoch_us(p.purchase_ts) - epoch_us(t.touch_ts) AS age_us
           FROM t JOIN p ON t.user_id = p.user_id
            AND t.touch_ts <= p.purchase_ts
            AND p.purchase_ts <= t.touch_ts + INTERVAL 7 DAY),
    wt AS (SELECT channel, purchase_id, mc,
                  CAST(floor(pow(2.0, -(CAST(age_us AS DOUBLE)
                                        / 302400000000.0)) * 1000000 + 0.5)
                       AS BIGINT) AS w
           FROM pr),
    sw AS (SELECT *, SUM(w) OVER (PARTITION BY purchase_id) AS s FROM wt),
    alloc AS (SELECT channel, (mc * w) // s AS share FROM sw)
    SELECT channel, count(*) AS n_touches,
           SUM(share) / 1000000.0 AS attributed_revenue
    FROM alloc GROUP BY 1 ORDER BY channel
    """,
    doc="Time-decay multi-touch attribution (half-life 3.5 days): "
    "each purchase's value is split over the user's view/click "
    "touches in the prior 7 days proportionally to 2^(-age/halflife) "
    "— the recency-weighted model between position-based (40/20/40) "
    "and Shapley in this engine's attribution family. Weights "
    "quantize to integer micro-units immediately after the one pow() "
    "call (the ln-pinning convention applied to exp2), so the "
    "proportional split is integer arithmetic: share = mc*w div "
    "SUM(w) per purchase, exact and order-free, sub-micro-cent "
    "truncation documented like the position model's. Touch-purchase "
    "pairing reuses the banded interval join. Scale: one user-keyed "
    "interval join, one purchase-keyed window on the touch frame, "
    "hash-agg by channel.",
)
def q_events_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        (_dec_val() * 1000000).cast("bigint").alias("mc"),
    )
    pr = t.join(p, "user_id").filter(
        (F.col("touch_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("touch_ts") + F.expr("INTERVAL 7 DAY")
        )
    ).select(
        "channel",
        "purchase_id",
        "mc",
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("touch_ts").cast("timestamp"))
        ).alias("age_us"),
    )
    w = pr.select(
        "channel",
        "purchase_id",
        "mc",
        F.floor(
            F.pow(F.lit(2.0), -(F.col("age_us").cast("double") / 302400000000.0))
            * 1000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("w"),
    )
    sw = w.withColumn(
        "s", F.sum("w").over(Window.partitionBy("purchase_id"))
    )
    # exact BIGINT division (`div`), not floor(double /): at warehouse
    # scale mc*w approaches 2^53 and the double quotient can round
    # across an integer boundary where true integer division would not
    alloc = sw.select("channel", F.expr("(mc * w) div s").alias("share"))
    return (
        alloc.groupBy("channel")
        .agg(
            F.count("*").alias("n_touches"),
            (F.sum("share") / 1000000.0).alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


@register(
    "events_retention_decay_fit",
    """
    WITH first AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY 1),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
            FROM events),
    tri AS (
        SELECT CAST(date_diff('day', cohort_week, wk) / 7 AS INTEGER)
                   AS week_no,
               count(*) AS active
        FROM act JOIN first USING (user_id)
        GROUP BY 1),
    base AS (SELECT active AS cohort0 FROM tri WHERE week_no = 0),
    pts AS (
        SELECT week_no,
               CAST(floor(ln(CAST(week_no AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS lx,
               CAST(floor(ln(CAST(active AS DOUBLE)
                             / (SELECT cohort0 FROM base))
                          * 1000000 + 0.5) AS BIGINT) AS ly
        FROM tri WHERE week_no >= 1 AND active > 0),
    m AS (
        SELECT count(*) AS n,
               CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * lx) AS DECIMAL(38,0))
                   AS sxx,
               CAST(SUM(CAST(lx AS DECIMAL(38,0)) * ly) AS DECIMAL(38,0))
                   AS sxy
        FROM pts)
    SELECT CAST(n AS BIGINT) AS n_weeks,
           round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 6)
               AS decay_exponent,
           round((CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
                    * sx) / n / 1000000, 6) AS ln_r1
    FROM m
    """,
    doc="Retention decay-curve fit: pooled weekly retention ratios "
    "(active users at week w over week-0 actives, all cohorts "
    "pooled) fitted to the power law r(w) ~ r1 * w^b by OLS in "
    "ln-ln space — the decay exponent is the single number that "
    "separates a flattening (habit-forming) retention curve (b "
    "near 0) from a churn-to-zero one, and projecting it forward "
    "is how LTV horizons get set (composes with "
    "events_cohort_ltv_curve). Same ln micro-nat + DECIMAL power-"
    "sum convention as price_elasticity_loglog. Scale: the "
    "retention triangle is the same two user-keyed passes as "
    "events_retention_cohorts; the fit sees only the bounded "
    "week_no frame.",
)
def q_events_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    tri = (
        act.join(first, "user_id")
        .groupBy(
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_no")
        )
        .agg(F.count("*").alias("active"))
    )
    from .ext.caching import swap_persist

    tri = swap_persist("retention_decay_tri", tri)
    base = tri.filter(F.col("week_no") == 0).select(
        F.col("active").alias("cohort0")
    )
    pts = (
        tri.filter((F.col("week_no") >= 1) & (F.col("active") > 0))
        .crossJoin(F.broadcast(base))
        .select(
            F.floor(
                F.log(F.col("week_no").cast("double")) * 1000000 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lx"),
            F.floor(
                F.log(
                    F.col("active").cast("double") / F.col("cohort0")
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("ly"),
        )
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("lx").cast("bigint").alias("sx"),
        F.sum("ly").cast("bigint").alias("sy"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("lx"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("lx").cast("decimal(38,0)") * F.col("ly"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    slope = (F.col("n") * d("sxy") - d("sx") * F.col("sy")) / (
        F.col("n") * d("sxx") - d("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_weeks"),
        F.round(slope, 6).alias("decay_exponent"),
        F.round((d("sy") - slope * F.col("sx")) / F.col("n") / 1000000, 6).alias(
            "ln_r1"
        ),
    )
