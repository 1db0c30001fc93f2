"""Behavioral tests for the streaming operators whose semantics the
rows-only driver check can't see (SURVEY.md §5.2: watermark late-drop,
stateful dedup exactness, session shape)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import load
from tests.conftest import SMOKE_SF_DIR

QUERIES = registry.queries()


def test_stream_dedup_matches_batch_distinct(spark):
    """Replayed duplicates are absorbed: per-type unique counts equal
    the batch distinct counts."""
    out = {
        (r.event_type, r.n_unique)
        for r in QUERIES["stream_dedup_stateful"](spark, SMOKE_SF_DIR).collect()
    }
    batch = {
        (r.event_type, r.n)
        for r in load(spark, SMOKE_SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    assert out == batch


def test_stream_watermark_drops_late(spark):
    """The 30-days-late replay must not appear anywhere: every emitted
    window count equals the batch count of on-time rows in that window,
    and no 30-days-ago window materializes."""
    out = QUERIES["stream_watermark_late"](spark, SMOKE_SF_DIR)
    got = {
        (r.window_start_us, r.event_type): r.cnt for r in out.collect()
    }
    assert got, "no finalized windows emitted"
    expected_df = (
        load(spark, SMOKE_SF_DIR, "events")
        .filter(F.col("event_id") % 10 != 0)
        .groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("ws"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
    )
    expected = {(r.ws, r.event_type): r.cnt for r in expected_df.collect()}
    for key, cnt in got.items():
        assert expected.get(key) == cnt, f"window {key}: {cnt} != {expected.get(key)}"
    # no window from the shifted-late region (30 days before the data)
    min_ontime_ws = min(ws for ws, _ in expected)
    assert all(ws >= min_ontime_ws for ws, _ in got)


def test_stream_session_window_shape(spark):
    """Sessions are per-user, non-empty, and start <= end."""
    out = QUERIES["stream_session_window"](spark, SMOKE_SF_DIR)
    rows = out.collect()
    assert rows, "no sessions emitted"
    assert all(r.session_start_us <= r.session_end_us for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_stream_outer_join_matched_subset_exact(spark):
    """The matched rows of the left-outer stream-stream join must equal
    the batch range-join exactly; unmatched purchases may be held back
    by the final watermark but never fabricated."""
    from apache_spark_irs_form_990_spark.streaming.stream_queries import (
        stream_outer_join_unmatched,
    )
    from apache_spark_irs_form_990_spark.tables import load
    from pyspark.sql import functions as F

    out = stream_outer_join_unmatched(spark, SMOKE_SF_DIR)
    matched = {
        (r.purchase_id, r.click_id)
        for r in out.filter(F.col("click_id").isNotNull()).collect()
    }
    ev = load(spark, SMOKE_SF_DIR, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    batch = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        ).collect()
    }
    assert matched == batch
    # no duplicate emission of any purchase row (matched or outer)
    assert out.count() == out.distinct().count()


def _staged_chunks(spark, tmp_path, n=4):
    """Stage the smoke events as n chronological single-file chunks
    (written in time order, so the file stream's modification-time
    ordering replays them as n microbatches)."""
    import time

    from pyspark.sql import Window

    ev = load(spark, SMOKE_SF_DIR, "events")
    w = Window.orderBy("ts")
    chunked = ev.withColumn("chunk", F.ntile(4).over(w))
    root = str(tmp_path / "stream_chunks")
    for i in range(1, n + 1):
        (
            chunked.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("append")
            .parquet(root)
        )
        time.sleep(1.1)  # distinct mtimes -> deterministic replay order
    return root


def _tumbling_append(stream_df):
    return (
        stream_df.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_micros("window.start").alias("ws_us"), "event_type", "cnt"
        )
    )


def test_multibatch_replay_matches_single_batch(spark, tmp_path):
    """Replay invariance: the same append-mode tumbling aggregate over
    4 chronological microbatches (maxFilesPerTrigger=1, watermark
    advancing and evicting state between triggers) emits exactly what
    the single-batch run emits — the property that lets a streaming
    pipeline be backfilled or re-sharded without changing answers."""
    from apache_spark_irs_form_990_spark.streaming.stream_queries import (
        run_to_completion,
    )

    root = _staged_chunks(spark, tmp_path)
    ev = load(spark, SMOKE_SF_DIR, "events")

    multi = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(root)
    single = spark.readStream.schema(ev.schema).parquet(root)

    got_multi = {
        (r.ws_us, r.event_type, r.cnt)
        for r in run_to_completion(_tumbling_append(multi), "append").collect()
    }
    got_single = {
        (r.ws_us, r.event_type, r.cnt)
        for r in run_to_completion(_tumbling_append(single), "append").collect()
    }
    assert got_multi == got_single
    # and every emitted window matches the batch ground truth
    batch = {
        (r.ws_us, r.event_type, r.cnt)
        for r in ev.groupBy(
            F.unix_micros(F.date_trunc("hour", "ts")).alias("ws_us"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got_multi <= batch
    assert got_multi, "append mode should have emitted closed windows"


def test_stream_near_dup_probe_matches_batch_probe(spark):
    """Backfill equivalence for the streaming near-dup gate: the
    2-micro-batch streamed probe must produce exactly the rows the
    batch `dedup_incremental_minhash` probe produces."""
    from apache_spark_irs_form_990_spark.operators.dedup import (
        dedup_incremental_minhash,
    )
    from apache_spark_irs_form_990_spark.streaming.stream_queries import (
        stream_dedup_near_static_index,
    )
    from tests.conftest import SF_DIR

    streamed = sorted(
        tuple(r) for r in stream_dedup_near_static_index(spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r) for r in dedup_incremental_minhash(spark, SF_DIR).collect()
    )
    assert streamed == batch and len(streamed) > 0


def test_stream_ann_probe_matches_batch_query(spark):
    """Backfill equivalence for the streaming ANN scorer: the
    2-micro-batch streamed probe of the static capped index must
    produce exactly `sim_ann_batch_query`'s batch join result —
    bit-identical cosines included (both sides run the same integer
    milli dot product and the same IEEE division)."""
    from apache_spark_irs_form_990_spark.operators.similarity import (
        sim_ann_batch_query,
    )
    from apache_spark_irs_form_990_spark.streaming.stream_queries import (
        stream_sim_ann_static_index,
    )
    from tests.conftest import SF_DIR

    streamed = sorted(
        tuple(r) for r in stream_sim_ann_static_index(spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r) for r in sim_ann_batch_query(spark, SF_DIR).collect()
    )
    assert streamed == batch and len(streamed) > 0


def _stage_chunk(spark, root, chunk_df):
    """Append one chronological chunk as a single file (distinct
    mtime, so the file source replays arrivals in order)."""
    import time

    chunk_df.coalesce(1).write.mode("append").parquet(root)
    time.sleep(1.1)


def _four_chunks(spark):
    from pyspark.sql import Window

    ev = load(spark, SMOKE_SF_DIR, "events")
    w = Window.orderBy("ts")
    chunked = ev.withColumn("chunk", F.ntile(4).over(w))
    return [
        chunked.filter(F.col("chunk") == i).drop("chunk") for i in range(1, 5)
    ]


def _counted(df):
    """Multiset of rows — catches duplicates, not just missing rows."""
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_crash_recovery_file_sink_exactly_once(spark, tmp_path):
    """KILL-AND-RESTART exactly-once, file-sink path (VERDICT r9
    task 4): the query stops after batch N (checkpoint holds the
    committed offsets + watermark state), more data arrives, the
    RESTARTED query resumes from the checkpoint — and the final sink
    is byte-for-byte the uninterrupted run's sink: no lost windows,
    no duplicated emissions (multiset compare, not set compare)."""
    chunks = _four_chunks(spark)
    ev_schema = load(spark, SMOKE_SF_DIR, "events").schema

    def run(src_root, out, cp):
        stream = (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_root)
        )
        q = (
            _tumbling_append(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # interrupted: 2 chunks -> stop -> 2 more chunks -> restart
    src_a = str(tmp_path / "src_a")
    out_a, cp_a = str(tmp_path / "out_a"), str(tmp_path / "cp_a")
    for c in chunks[:2]:
        _stage_chunk(spark, src_a, c)
    run(src_a, out_a, cp_a)  # "crash" between batches: query exits here
    for c in chunks[2:]:
        _stage_chunk(spark, src_a, c)
    run(src_a, out_a, cp_a)  # restart from the same checkpoint

    # uninterrupted twin over identical arrivals
    src_b = str(tmp_path / "src_b")
    out_b, cp_b = str(tmp_path / "out_b"), str(tmp_path / "cp_b")
    for c in chunks:
        _stage_chunk(spark, src_b, c)
    run(src_b, out_b, cp_b)

    got = _counted(spark.read.parquet(out_a))
    want = _counted(spark.read.parquet(out_b))
    assert got == want
    assert sum(got.values()) > 0


def test_crash_recovery_foreachbatch_idempotent_redelivery(spark, tmp_path):
    """Kill MID-BATCH on the foreachBatch path: the sink fn tears a
    partial write for batch 1 and dies before the checkpoint commits;
    the restart RE-DELIVERS batch 1 under the SAME batch_id (the
    exactly-once contract the checkpoint exists for), and the
    batch_id-keyed idempotent write heals the torn output — final
    sink equals the uninterrupted run byte-for-byte."""
    import glob
    import json as _json

    from pyspark.errors.exceptions.captured import StreamingQueryException

    chunks = _four_chunks(spark)
    ev_schema = load(spark, SMOKE_SF_DIR, "events").schema

    def agg_stream(src_root):
        stream = (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_root)
        )
        return stream.groupBy("event_type").agg(F.count("*").alias("cnt"))

    def make_sink(out_dir, crash_on=None, crashed=None, deliveries=None):
        def sink(df, bid):
            rows = sorted(
                (r["event_type"], r["cnt"]) for r in df.collect()
            )
            if deliveries is not None:
                deliveries.append((bid, rows))
            path = os.path.join(out_dir, f"batch-{bid}.json")
            if crash_on == bid and crashed is not None and not crashed:
                with open(path, "w") as f:  # torn write: half the rows
                    _json.dump(rows[: len(rows) // 2], f)
                crashed.append(bid)
                raise RuntimeError("injected crash mid-batch")
            with open(path, "w") as f:  # idempotent: keyed by batch_id
                _json.dump(rows, f)

        return sink

    def run(src_root, out_dir, cp, sink):
        os.makedirs(out_dir, exist_ok=True)
        q = (
            agg_stream(src_root)
            .writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    src = str(tmp_path / "src")
    for c in chunks:
        _stage_chunk(spark, src, c)

    # run 1 crashes inside batch 1 (after batch 0 committed)
    out_a, cp_a = str(tmp_path / "out_a"), str(tmp_path / "cp_a")
    crashed, deliveries = [], []
    with pytest.raises(StreamingQueryException):
        run(
            src,
            out_a,
            cp_a,
            make_sink(out_a, crash_on=1, crashed=crashed, deliveries=deliveries),
        )
    assert crashed == [1]  # died mid-batch with a torn file on disk

    # restart: batch 1 must be re-delivered with the SAME id + data
    run(src, out_a, cp_a, make_sink(out_a, deliveries=deliveries))
    b1 = [rows for bid, rows in deliveries if bid == 1]
    assert len(b1) == 2 and b1[0] == b1[1]

    # uninterrupted twin
    out_b, cp_b = str(tmp_path / "out_b"), str(tmp_path / "cp_b")
    run(src, out_b, cp_b, make_sink(out_b))

    def final(out_dir):
        last = max(
            glob.glob(os.path.join(out_dir, "batch-*.json")),
            key=lambda p: int(os.path.basename(p)[6:-5]),
        )
        with open(last) as f:
            return _json.load(f)

    assert final(out_a) == final(out_b)
    assert len(final(out_a)) > 0
