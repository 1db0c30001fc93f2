"""Structured Streaming over `events` (SURVEY.md §2 B8 — EXT; the
reference is batch-only).

Each query builds a real `readStream` (file source over the events
parquet), runs it to completion against a memory sink
(`processAllAvailable` — the deterministic local harness for a
file-bounded stream), and returns the materialized result. In
production the same DataFrames run unmodified against kafka/s3 sources
with `writeStream` sinks — that source/sink symmetry is the point of
Structured Streaming.

Scale/state posture:
- tumbling/sliding windows + watermark bound state: the store holds
  only open windows per key, and the watermark GC's closed ones;
- stateful dedup keys expire with the watermark — unbounded-key dedup
  without a watermark is a state leak at 100 TB/day;
- session windows merge in the state store (`session_window`), the
  one window shape that can't be precomputed batch-side.

Oracles: tumbling/sliding have exact batch twins (epoch-grid
arithmetic); session/watermark/dedup are ◐ rows-only (driver records
the weaker check), with behavioral tests in tests/test_streaming.py.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.vectors import nonzero_milli
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

_COUNTER = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet with the same
    nanos->micros conversion as the batch loader (tables.py).

    The file source wants a directory; testdata is read-only, so the
    single events.parquet is staged (once per sf) into a temp dir —
    in production the source would already be a directory/prefix.
    """
    import shutil

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    stage = os.path.join(tempfile.gettempdir(), f"spark990_events_{sf_tag}")
    os.makedirs(stage, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(stage, "events.parquet")
    # re-stage when the driver regenerates testdata (size is a cheap proxy)
    if not os.path.exists(dst) or os.path.getsize(dst) != os.path.getsize(src):
        shutil.copy(src, dst)
    # The file stream needs a declared schema; mirror whatever the current
    # generator wrote (nanos-as-long vs micros TIMESTAMP_NTZ) and normalize
    # ts to a session-TZ timestamp exactly like the batch loader (tables.py).
    raw_schema = spark.read.parquet(src).schema
    raw = spark.readStream.schema(raw_schema).format("parquet").load(stage)
    ts_type = raw_schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_completion(result: DataFrame, output_mode: str) -> DataFrame:
    """Drive a bounded stream to its end synchronously via a memory
    sink; returns the sink table as a batch DataFrame."""
    name = f"stream_out_{next(_COUNTER)}"
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = result.sparkSession
    # copy out of the memory sink so the result survives q.stop()
    return spark.createDataFrame(
        spark.table(name).collect(), schema=spark.table(name).schema
    )


@register(
    "stream_tumbling_count",
    oracle="""
    SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
           event_type,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows by event_type. Windows are epoch-aligned,
    so the batch twin is date_trunc('hour') — the streaming and batch
    answers are identical on a bounded input, which is exactly what the
    oracle verifies."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("sum_value"),
        )
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    return run_to_completion(agg, "complete")


@register(
    "stream_sliding_agg",
    oracle="""
    WITH grid AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS e,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(CAST(ts AS TIMESTAMP)) % 1800000000 AS s0
      FROM events
    )
    SELECT ws_us, event_type, count(*) AS cnt
    FROM (
      SELECT event_type, e, unnest([s0, s0 - 1800000000]) AS ws_us FROM grid
    )
    GROUP BY ws_us, event_type
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in two
    windows. The batch twin enumerates the same two epoch-grid starts
    per event — an exact, engine-neutral reformulation."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_micros("window.start").alias("ws_us"),
            "event_type",
            "cnt",
        )
    )
    return run_to_completion(agg, "complete")


@register(
    "stream_session_window",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    ),
    agg AS (
      SELECT user_id, sid,
             epoch_us(min(ts)) AS session_start_us,
             epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
             count(*) AS n_events
      FROM sess GROUP BY user_id, sid
    ),
    wm AS (SELECT epoch_us(max(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR) AS w
           FROM events)
    SELECT user_id, session_start_us, session_end_us,
           CAST(n_events AS BIGINT) AS n_events
    FROM agg, wm WHERE session_end_us <= w
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute inactivity gap) — the
    stateful window shape that merges in the state store as events
    arrive. Emits one row per closed session with its span and size.

    EXACT oracle (upgraded from rows-only): append mode emits exactly
    the sessions whose end (last event + gap) falls at or before the
    final watermark (max ts - 1h), so the batch twin is gaps-and-
    islands sessionization + that same closure predicate — verified
    hash-identical at sf0.001/0.01/0.1."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
    )
    # session windows merge in the state store -> append is the
    # supported output mode (complete would need unmergeable state)
    return run_to_completion(agg, "append")


def _write_batches(spark: SparkSession, root: str, batches: list[DataFrame]) -> str:
    """Write DataFrames as an N-file streaming input dir; with
    maxFilesPerTrigger=1 the file source replays them as N ordered
    micro-batches (mtime order)."""
    import glob as globmod
    import shutil
    import time

    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir, exist_ok=True)
    for i, df in enumerate(batches):
        staged = os.path.join(root, f"b{i}")
        df.coalesce(1).write.mode("overwrite").parquet(staged)
        src = globmod.glob(os.path.join(staged, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(in_dir, f"batch{i}.parquet"))
        time.sleep(0.05)  # distinct mtimes -> deterministic batch order
    return in_dir


@register(
    "stream_watermark_late",
    oracle="""
    WITH ontime AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events WHERE event_id % 10 <> 0
    ),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ontime)
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type, count(*) AS cnt
    FROM ontime, wm
    GROUP BY window_start_us, event_type, wm.w
    HAVING epoch_us(date_trunc('hour', min(ts)) + INTERVAL 1 HOUR)
             <= epoch_us(wm.w)
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + late-data drop: batches 0-1 are on-time and advance
    the watermark to max(ts) - 10 minutes; batch 2 replays 10% of the
    events shifted 30 days into the past — beyond the watermark for
    every window, so the stateful aggregation drops them
    (numRowsDroppedByWatermark). Emitted window counts therefore
    contain on-time rows only (asserted per-window in
    tests/test_streaming.py).

    Empirical Spark subtlety encoded here: the updated watermark
    becomes effective for *dropping* one batch after the batch whose
    data produced it, so the late data arrives two batches after the
    on-time maximum — as it would in any real stream.

    The replay shift is DATA-DEPENDENT (full ts span + 30 days, from
    one bounded 2-value agg collect), not a fixed 30 days: a fixed
    shift only lands below the watermark when the data spans less
    than the shift, and the calendar edge axis
    (tests/test_edge_calendar.py) planted a 2024-12-30 event whose
    30-day replay landed ABOVE the watermark of a mid-January corpus
    — accepted as on-time, two phantom windows emitted. Shifting by
    span+30d puts every replayed row before min(ts) - 30d, which is
    below any watermark max(ts) - 10min can take."""
    ev = load(spark, sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"spark990_wm_{next(_COUNTER)}")
    span = ev.agg(
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("us")
    ).collect()[0]["us"]
    # span is NULL on an empty / all-NULL-ts table — nothing to shift
    # then, but the plan must still build
    late_shift_us = int(span or 0) + 30 * 24 * 3600 * 1_000_000
    in_dir = _write_batches(
        spark,
        root,
        [
            ev.filter((F.col("event_id") % 10).isin(1, 2, 3, 4, 6, 7, 8, 9)),
            ev.filter(F.col("event_id") % 10 == 5),
            ev.filter(F.col("event_id") % 10 == 0).withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros("ts") - F.lit(late_shift_us)
                ),
            ),
        ],
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            "event_type",
            "cnt",
        )
    )
    return run_to_completion(agg, "append")


@register(
    "stream_foreachbatch_sink",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``foreachBatch`` sink — the production pattern for streaming
    into batch-only destinations (parquet tables, JDBC, MERGE targets):
    each micro-batch arrives as a batch DataFrame plus a monotonically
    increasing batch_id for exactly-once idempotence (write paths keyed
    by batch_id are safely re-runnable after failure).

    Here each batch's per-type partial counts land in a parquet dir
    keyed by batch_id; the final read-back re-aggregates the partials —
    and must equal the one-shot batch aggregate, which is exactly what
    the oracle checks (partial-per-batch + final merge == global agg:
    the same partial/final contract Catalyst uses inside a single
    query, replayed across micro-batches).
    """
    ev = load(spark, sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"spark990_fb_{next(_COUNTER)}")
    in_dir = _write_batches(
        spark,
        root,
        [ev.filter(F.col("event_id") % 3 == i) for i in range(3)],
    )
    out_dir = os.path.join(root, "out")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    partial = stream.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent: re-running batch N overwrites batch N's partition
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        partial.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # complete mode: the LAST batch's snapshot is the final state
    import glob as globmod

    last = max(
        globmod.glob(os.path.join(out_dir, "batch_id=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    return (
        spark.read.parquet(last)
        .select(
            "event_type",
            "cnt",
            (F.col("cents").cast("double") / 100.0).alias("sum_value"),
        )
    )


@register(
    "stream_custom_state",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    modern `process_record`-with-state surface, SURVEY B8/B9): a
    per-user accumulator that survives micro-batch boundaries.

    Events arrive in two micro-batches (even event_ids, then odd); the
    grouped state carries (count, value-cents) across them and each
    batch emits the running totals for the users it touched. The final
    per-user row (max of the running counters) must equal the batch
    groupBy — an EXACT oracle over a custom stateful streaming
    operator, proving state persistence rather than assuming it.

    (Spark 4's successor API, `transformWithStateInPandas`, declares
    the same logic as a StatefulProcessor with typed ValueState; its
    Python side requires google.protobuf, absent from this sandbox,
    so this engine standardizes on applyInPandasWithState — the
    migration is mechanical when the dependency is available.)

    Scale posture: state lives in the executor state store partitioned
    by user_id (one shuffle), values are two longs per user — bounded,
    watermark-free state is fine here because the key domain is the
    user base, not an unbounded stream dimension. Integer cents keep
    the accumulation exact and order-independent.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = load(spark, sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"spark990_cs_{next(_COUNTER)}")
    in_dir = _write_batches(
        spark,
        root,
        [ev.filter(F.col("event_id") % 2 == 0), ev.filter(F.col("event_id") % 2 == 1)],
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def accumulate(key, pdfs, state: GroupState):
        cnt, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((cnt, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "cum_events": [cnt], "cum_value_cents": [cents]}
        )

    running = stream.groupBy("user_id").applyInPandasWithState(
        accumulate,
        outputStructType="user_id long, cum_events long, cum_value_cents long",
        stateStructType="cnt long, cents long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    table = run_to_completion(running, "append")
    # the last (= max) running row per user is the stream-end total
    return table.groupBy("user_id").agg(
        F.max("cum_events").alias("n_events"),
        (F.max("cum_value_cents").cast("double") / 100.0).alias("sum_value"),
    )


@register(
    "stream_dedup_stateful",
    oracle="""
    SELECT event_type, count(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful exact-once dedup on event_id under a watermark: batch 1
    replays a subset of batch 0's rows verbatim; dropDuplicates state
    absorbs them. Output counts equal the distinct event_ids of the
    input — which is exactly the batch DISTINCT oracle (complete-mode
    memory sink holds the final snapshot), so this carries an exact
    SQL twin, not just the rows-only check."""
    ev = load(spark, sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"spark990_dd_{next(_COUNTER)}")
    in_dir = _write_batches(
        spark, root, [ev, ev.filter(F.col("event_id") % 7 == 0)]
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
    )
    return run_to_completion(deduped, "complete")


@register(
    "stream_topk_windowed",
    oracle="""
    SELECT window_start_us, event_type, cnt
    FROM (
      SELECT window_start_us, event_type, cnt,
             row_number() OVER (PARTITION BY window_start_us
                                ORDER BY cnt DESC, event_type ASC) AS rn
      FROM (
        SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                 AS window_start_us,
               event_type,
               count(*) AS cnt
        FROM events
        GROUP BY 1, 2
      )
    ) WHERE rn <= 2
    """,
)
def stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed aggregation composed with batch top-k: the
    stream maintains per-(window, type) counts; the rank runs on the
    bounded result AFTER the stream completes (ranking inside an
    update-mode stream would re-rank every trigger — do it downstream,
    which is also where it belongs operationally). Top-2 event types
    per hour, deterministic via the type tiebreak, exact batch oracle.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_micros("window.start").alias("window_start_us"),
            "event_type",
            "cnt",
        )
    )
    counts = run_to_completion(agg, "complete")
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start_us").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("window_start_us", "event_type", "cnt")
    )


@register(
    "stream_static_join",
    oracle="""
    SELECT e.event_type,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'signup') s
      ON e.user_id = s.user_id
    GROUP BY e.event_type
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the live event stream enriched/filtered
    against a STATIC dimension (users who ever signed up) — the
    standard enrichment shape (stream ⋈ user table, stream ⋈ feature
    store snapshot). The static side is planned per micro-batch like
    any batch DataFrame (unhinted — the planner broadcasts it when its
    size estimate warrants, same policy as the scaling dims in
    queries/joins.py), needs no watermark and holds no state; only the
    streaming aggregate keeps state."""
    signups = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
    )
    ev = read_events_stream(spark, sf_dir)
    # the join runs streaming (per micro-batch, static side planner-
    # sized); exact COUNT(DISTINCT) isn't available inside a streaming
    # agg, so the final counts aggregate the bounded output batch-side
    enriched = ev.join(signups, "user_id").select(
        "event_type", "user_id"
    )
    rows = run_to_completion(enriched, "append")
    return rows.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND epoch_us(CAST(c.ts AS TIMESTAMP))
         BETWEEN epoch_us(CAST(p.ts AS TIMESTAMP)) - 1800000000
             AND epoch_us(CAST(p.ts AS TIMESTAMP))
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time bounds: purchases
    joined to the same user's clicks from the preceding 30 minutes.
    Both sides buffer in the state store; the watermark + time-range
    condition bound how long a click is retained (without them the
    state grows forever — the condition IS the state-eviction policy).
    On bounded input the result equals the batch range join, which the
    oracle checks exactly."""
    ev = read_events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    ev2 = read_events_stream(spark, sf_dir)
    clicks = (
        ev2.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", "user_id")
    return run_to_completion(joined, "append")


@register(
    "stream_outer_join_unmatched",
    # Exact oracle over the DETERMINISTIC region of the outer join:
    # rows whose purchase time sits >= 2 hours below both streams'
    # max event time are guaranteed resolved (matched or evicted ->
    # NULL-emitted) by the final no-data micro-batch, so the streaming
    # answer on that region equals the batch left range-join exactly.
    # The tail region (where emission depends on final-watermark
    # timing) is excluded on BOTH sides by the same cutoff predicate.
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_id, user_id AS c_user_id,
             CAST(ts AS TIMESTAMP) AS c_ts
      FROM events WHERE event_type = 'click'
    ),
    cutoff AS (
      SELECT least((SELECT max(p_ts) FROM p), (SELECT max(c_ts) FROM c))
             - INTERVAL 2 HOUR AS t
    )
    SELECT purchase_id, click_id, user_id,
           epoch_us(p_ts) AS p_ts_us
    FROM p
    LEFT JOIN c ON user_id = c_user_id
               AND c_ts >= p_ts - INTERVAL 30 MINUTE
               AND c_ts <= p_ts, cutoff
    WHERE p_ts <= cutoff.t
    """,
)
def stream_outer_join_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-outer stream-stream join: every purchase joined to the same
    user's clicks from the preceding 30 minutes; purchases with no
    qualifying click emit with a NULL click_id AFTER the watermark
    passes their join-eviction bound (the outer row cannot be emitted
    earlier — a matching click might still arrive). The watermark +
    range condition is therefore not just state GC but the CORRECTNESS
    clock for the outer side.

    On a bounded file stream the final no-data micro-batch advances the
    watermark to min(max_p, max_c) - 30min and flushes every evicted
    unmatched row below it; only the tail (rows near the final
    watermark) has engine-defined emission. The registered result is
    therefore post-filtered to p_ts <= min(side maxima) - 2h — the
    provably-resolved region — which makes the streaming answer equal
    the batch left range-join EXACTLY and turns the former rows-only
    check into a hash-checked oracle. tests/test_streaming.py keeps the
    behavioral assertion on the matched subset for the full range."""
    ev = read_events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    ev2 = read_events_stream(spark, sf_dir)
    clicks = (
        ev2.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "click_id", "user_id", "p_ts")
    out = run_to_completion(joined, "append")
    # Deterministic-region cutoff, computed from the batch table (the
    # same bound the final watermark is derived from).
    ev_batch = load(spark, sf_dir, "events")
    bounds = ev_batch.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("mp"),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("mc"),
    ).collect()[0]
    if bounds["mp"] is None or bounds["mc"] is None:
        # a fixture with no purchases or no clicks has no deterministic
        # region at all — emit the empty frame instead of raising
        return out.filter(F.lit(False)).select(
            "purchase_id",
            "click_id",
            "user_id",
            F.unix_micros("p_ts").alias("p_ts_us"),
        )
    cutoff = min(bounds["mp"], bounds["mc"]) - __import__("datetime").timedelta(
        hours=2
    )
    return out.filter(F.col("p_ts") <= F.lit(cutoff)).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.unix_micros("p_ts").alias("p_ts_us"),
    )


@register(
    "stream_outer_join_pending_state",
    # Exact oracle over the join's FINAL STATE-STORE CONTENT (r9,
    # VERDICT r8 task 5): after the bounded stream drains (incl.
    # trailing no-data batches), each side's state holds exactly the
    # input rows its state watermark has not yet evicted. Empirically
    # pinned on boundary-ladder fixtures (1 us steps around both
    # bounds): with global watermark wm_ms = min(ms-floor(max p_ts),
    # ms-floor(max c_ts)) - 30 min, the left side retains rows with
    # p_ts_us >= wm_ms*1000 - 999 (the engine's eviction predicate is
    # ts_us <= state_watermark_us - 1000) and the right side retains
    # c_ts_us >= (wm_ms - 30 min)*1000 - 999 — the right bound is
    # LOOSER by the range width because a click at c_ts can still
    # match future purchases up to c_ts + 30 min (the condition-derived
    # state value watermark of Spark's symmetric hash join).
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    c AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    ),
    wm AS (
      SELECT least((SELECT epoch_us(max(ts)) // 1000 FROM p),
                   (SELECT epoch_us(max(ts)) // 1000 FROM c))
             - 1800000 AS wm_ms
    )
    SELECT 'left' AS side, event_id, user_id, epoch_us(ts) AS ts_us
    FROM p, wm WHERE epoch_us(ts) >= wm.wm_ms * 1000 - 999
    UNION ALL
    SELECT 'right' AS side, event_id, user_id, epoch_us(ts) AS ts_us
    FROM c, wm
    WHERE epoch_us(ts) >= (wm.wm_ms - 1800000) * 1000 - 999
    """,
)
def stream_outer_join_pending_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE OTHER SIDE of [[stream_outer_join_unmatched]] (r9, VERDICT
    r8 task 5): that query exact-checks the EMITTED rows on the
    provably-resolved region and leaves the tail — rows whose
    emission depends on final-watermark timing — as the one ◐
    streaming semantics. This audit pins the tail from the state
    store instead: run the same left-outer stream-stream join to
    completion against a checkpoint, then read BOTH sides' join state
    back (`spark.read.format("statestore").option("joinSide", ...)`)
    and return every buffered row. Emission TIMING near the tail is
    engine-defined; the final state CONTENT is not — it is exactly
    the input rows above each side's condition-derived state
    watermark, which the oracle recomputes from the batch table (rule
    pinned by a 1-microsecond boundary ladder; see the oracle
    comment). Emitted ∪ pending now covers both sides of the
    watermark clock exactly.

    At 100 TB-of-state scale this is the join-state X-ray next to
    [[stream_statestore_introspect]]'s aggregation-state one: "what
    is my outer join still holding, and is that consistent with the
    watermark?" answered from checkpoint files, no running query.

    Null-timestamp events are excluded on both engines up front: a
    row with no event time can neither advance the watermark nor be
    evicted by it, so it has no well-defined place on the watermark
    clock (this audit's contract is over timestamped events)."""
    import uuid

    ev = read_events_stream(spark, sf_dir)
    purchases = (
        ev.filter(
            (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter((F.col("event_type") == "click") & F.col("ts").isNotNull())
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "click_id", "user_id", "p_ts")
    schema = "side string, event_id long, user_id long, ts_us long"
    # a fixture with no purchases or no clicks never advances a joint
    # watermark — no deterministic pending contract exists; mirror
    # stream_outer_join_unmatched's empty-frame convention
    bounds = (
        load(spark, sf_dir, "events")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("mp"),
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "mc"
            ),
        )
        .collect()[0]
    )
    if bounds["mp"] is None or bounds["mc"] is None:
        return spark.createDataFrame([], schema=schema)
    ckpt = os.path.join(
        tempfile.gettempdir(), f"spark990_ssjoin_{uuid.uuid4().hex[:8]}"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        left = (
            spark.read.format("statestore")
            .option("joinSide", "left")
            .load(ckpt)
            .select(
                F.lit("left").alias("side"),
                F.col("value.purchase_id").alias("event_id"),
                F.col("value.user_id").alias("user_id"),
                F.unix_micros(F.col("value.p_ts")).alias("ts_us"),
            )
        )
        right = (
            spark.read.format("statestore")
            .option("joinSide", "right")
            .load(ckpt)
            .select(
                F.lit("right").alias("side"),
                F.col("value.click_id").alias("event_id"),
                F.col("value.c_user_id").alias("user_id"),
                F.unix_micros(F.col("value.c_ts")).alias("ts_us"),
            )
        )
        st = left.unionByName(right)
        # materialize the (pending-rows-sized) report so the
        # checkpoint dir can be removed before returning
        rows = st.collect()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema)


@register(
    "stream_dedup_near_static_index",
    # Batch twin: identical to dedup_incremental_minhash's contract —
    # the streamed probe must converge to exactly the batch join's
    # result (SCALE.md §6 backfill equivalence).
    oracle="""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    batch AS (
      SELECT doc_id + 5000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '') AS text
      FROM documents WHERE doc_id % 10 = 0
    ),
    cs AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    ),
    bs AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM batch)
    ),
    csw AS (
      SELECT doc_id,
             min(substr(md5(shingle),  1, 8)) AS m0,
             min(substr(md5(shingle),  9, 8)) AS m1,
             min(substr(md5(shingle), 17, 8)) AS m2,
             min(substr(md5(shingle), 25, 8)) AS m3
      FROM cs GROUP BY doc_id
    ),
    bsw AS (
      SELECT doc_id,
             min(substr(md5(shingle),  1, 8)) AS m0,
             min(substr(md5(shingle),  9, 8)) AS m1,
             min(substr(md5(shingle), 17, 8)) AS m2,
             min(substr(md5(shingle), 25, 8)) AS m3
      FROM bs GROUP BY doc_id
    ),
    csig AS (
      SELECT doc_id, 0 AS band, m0 AS band_min FROM csw
      UNION ALL SELECT doc_id, 1, m1 FROM csw
      UNION ALL SELECT doc_id, 2, m2 FROM csw
      UNION ALL SELECT doc_id, 3, m3 FROM csw
    ),
    bsig AS (
      SELECT doc_id, 0 AS band, m0 AS band_min FROM bsw
      UNION ALL SELECT doc_id, 1, m1 FROM bsw
      UNION ALL SELECT doc_id, 2, m2 FROM bsw
      UNION ALL SELECT doc_id, 3, m3 FROM bsw
    )
    SELECT b.doc_id AS new_id, c.doc_id AS corpus_id,
           count(*) AS n_shared_bands
    FROM bsig b JOIN csig c
      ON b.band = c.band AND b.band_min = c.band_min
    GROUP BY new_id, corpus_id
    """,
)
def stream_dedup_near_static_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup ingest — `dedup_incremental_minhash` run as a
    live stream instead of a nightly batch: new documents arrive as
    micro-batches, each is banded MAP-SIDE by
    `band_signatures_stateless` (a pure projection — no aggregation —
    so it runs unmodified on an unbounded stream), and probed against the STATIC corpus
    signature index via a stream-static join — Spark re-plans the
    static side per micro-batch, the streaming side never waits.

    The only stateful operator is the final (new_id, corpus_id) count
    (complete mode); its result after the last micro-batch equals the
    batch twin's output exactly — the backfill-equivalence property
    (SCALE.md §6) that lets one codebase serve both the live dedup
    gate and the historical rebuild. Replayed here as 2 micro-batches
    (maxFilesPerTrigger=1); at 100 TB the static index is the
    persisted signature table and the state store holds only
    candidate pairs, never documents."""
    from apache_spark_irs_form_990_spark.operators.dedup import (
        band_signatures,
        band_signatures_stateless,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    batch = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    root = os.path.join(
        tempfile.gettempdir(), f"spark990_neardup_{next(_COUNTER)}"
    )
    in_dir = _write_batches(
        spark,
        root,
        [
            batch.filter(F.col("doc_id") % 20 == 10),
            batch.filter(F.col("doc_id") % 20 == 0),
        ],
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    csig = band_signatures(docs).localCheckpoint().alias("c")
    # Stateful dedup on (doc_id, band): the stateless banding is
    # per-ROW, so a duplicated doc_id row (identical text) would emit
    # its signature twice and double n_shared_bands, breaking the
    # backfill-equivalence contract with the batch twin whose
    # groupBy(doc_id) collapses duplicates (tests/test_edge_corpus.py).
    # State is one row per (doc, band) — signatures, never documents.
    bsig = (
        band_signatures_stateless(stream)
        .dropDuplicates(["doc_id", "band"])
        .alias("b")
    )
    agg = (
        bsig.join(
            csig,
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.band_min") == F.col("c.band_min")),
        )
        .groupBy(
            F.col("b.doc_id").alias("new_id"),
            F.col("c.doc_id").alias("corpus_id"),
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )
    result = run_to_completion(agg, "complete")
    # the result is a materialized copy; the replay input dir can go
    shutil.rmtree(root, ignore_errors=True)
    return result


@register(
    "stream_statestore_introspect",
    # Deterministic contract: after processAllAvailable drains the
    # bounded stream (and its trailing no-data batches), state holds
    # exactly the groups whose window END is above the final watermark
    # max(ts) - 10min — emitted-and-evicted windows are gone, pending
    # ones remain with their running counts.
    oracle="""
    WITH ev AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
    ),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM ev)
    SELECT event_type,
           epoch_us(date_trunc('hour', ts)) AS window_start_us,
           count(*) AS pending_cnt
    FROM ev, wm
    GROUP BY event_type, date_trunc('hour', ts), wm.w
    HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR > wm.w
    """,
)
def stream_statestore_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE STORE INTROSPECTION (`spark.read.format("statestore")`,
    Spark 4): run the watermarked tumbling-window count to completion
    against a checkpoint, then read the checkpoint's state store back
    as a DataFrame — the operational X-ray every production streaming
    job eventually needs ("what is my state holding, and why is it
    10x bigger than yesterday?"). The returned rows are the PENDING
    windows: groups whose window hasn't crossed the watermark yet,
    with their running counts — re-derivable exactly from the input
    (the oracle does), which is itself the proof that watermark
    eviction ran: emitted windows are absent from state.

    At 100 TB-of-state scale this reader is how state bloat is
    debugged and how stuck keys are found without instrumenting the
    job itself; it reads checkpoint files directly, no running query
    required."""
    import uuid

    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    ckpt = os.path.join(
        tempfile.gettempdir(), f"spark990_ssread_{uuid.uuid4().hex[:8]}"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        st = spark.read.format("statestore").load(ckpt).select(
            F.col("key.event_type").alias("event_type"),
            F.unix_micros(F.col("key.window.start")).alias("window_start_us"),
            F.col("value.count").cast("long").alias("pending_cnt"),
        )
        # materialize the (pending-windows-sized) report so the
        # checkpoint dir can be removed before returning
        rows, schema = st.collect(), st.schema
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema)


def _stream_ann_oracle() -> str:
    from apache_spark_irs_form_990_spark.operators.similarity import (
        _batch_query_oracle,
    )

    return _batch_query_oracle()


@register("stream_sim_ann_static_index", oracle=_stream_ann_oracle())
def stream_sim_ann_static_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ANN ingest — the embedding twin of
    [[stream_dedup_near_static_index]] (r6, VERDICT r5 task 4): new
    vectors arrive as micro-batches, each is BUCKETED MAP-SIDE
    (`_bucket_udf` + `sq_norm` are pure projections — no aggregation,
    so they run unmodified on an unbounded stream), multiprobe-exploded
    (own bucket + 8 one-bit flips), and joined against the STATIC
    capped `_flat_index` via a stream-static join. The join itself is
    STATELESS — each (query, index-member) candidate appears exactly
    once (an index member has one bucket; the 9 probe values are
    distinct), so the stream emits exact-cosine-scored candidates in
    append mode with zero state store; the serving layer's top-3
    re-rank runs as a batch window on the drained result.

    Backfill equivalence: the streamed probe of the 2-micro-batch
    replay equals [[sim_ann_batch_query]]'s batch join exactly — the
    oracle IS the batch query's oracle (SCALE.md §6). At 100 TB the
    static side is the persisted bucket-partitioned index
    ([[sim_ann_index_persist_probe]] proves that round trip) and this
    query is the live scorer in front of it; per-micro-batch cost is
    |batch| * 9 * C regardless of corpus size."""
    from apache_spark_irs_form_990_spark.functions.vectors import (
        milli_vec,
        pair_dot_udf,
        sq_norm,
    )
    from apache_spark_irs_form_990_spark.operators.similarity import (
        _PLANES,
        _bucket_udf,
        _flat_bucketed,
        _flat_index,
    )
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", milli_vec(F.col("embedding")).alias("v")
    ).transform(nonzero_milli)  # zero-norm convention (r7)
    bucketed = _flat_bucketed(emb)
    index = _flat_index(bucketed).localCheckpoint()
    batch = emb.filter(F.col("vec_id") % 97 == 0)
    root = os.path.join(
        tempfile.gettempdir(), f"spark990_annstream_{next(_COUNTER)}"
    )
    in_dir = _write_batches(
        spark,
        root,
        [
            batch.filter(F.col("vec_id") % 194 == 0),
            batch.filter(F.col("vec_id") % 194 != 0),
        ],
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    # map-side bucketing + norm: pure projections, stream-safe
    qstream = stream.select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("va"),
        _bucket_udf(_PLANES)(F.col("v")).getItem(0).alias("bucket"),
        sq_norm(F.col("v")).alias("na"),
    )
    probes = qstream.select(
        "qid",
        "va",
        "na",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(len(_PLANES))
                ],
            )
        ).alias("probe"),
    )
    idx = index.select(
        F.col("vec_id").alias("nid"),
        F.col("v").alias("vb"),
        F.col("bucket"),
        F.col("n").alias("nb"),
    )
    cosine = pair_dot_udf()(F.col("va"), F.col("vb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    scored = probes.join(
        idx,
        (F.col("probe") == F.col("bucket")) & (F.col("qid") != F.col("nid")),
    ).select("qid", "nid", cosine.alias("cosine"))
    out = run_to_completion(scored, "append")
    shutil.rmtree(root, ignore_errors=True)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "nid")
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
