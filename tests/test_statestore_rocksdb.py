"""RocksDB state store for the stateful streaming family (VERDICT r10
task 4): at 100 TB of state the production provider is
RocksDBStateStoreProvider (state lives off-heap/on-disk per executor,
not in the JVM heap the default HDFSBackedStateStoreProvider keeps it
in), so every stateful query must produce IDENTICAL results under
both providers, survive kill-and-restart under RocksDB, and expose
the state-size metrics the 100 TB capacity answer is written in
(SCALE.md §18).

The provider class is read from the session conf when a streaming
query STARTS, so the fixture flips
`spark.sql.streaming.stateStore.providerClass` around each run — no
new session needed; rocksdbjni ships in pyspark's jars."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections import Counter

import pytest
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import load
from tests.conftest import SMOKE_SF_DIR

QUERIES = registry.queries()

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS_DEFAULT = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)

# The stateful registered queries: every shape that holds state —
# windowed agg + watermark eviction, session windows, stateful dedup,
# applyInPandasWithState custom state, stream-stream joins (inner +
# both outer forms), windowed top-k, and the state-store reader.
STATEFUL_QUERIES = [
    "stream_tumbling_count",
    "stream_session_window",
    "stream_watermark_late",
    "stream_dedup_stateful",
    "stream_custom_state",
    "stream_topk_windowed",
    "stream_stream_join",
    "stream_outer_join_unmatched",
    "stream_outer_join_pending_state",
    "stream_statestore_introspect",
]


class _provider:
    def __init__(self, spark, cls: str):
        self.spark, self.cls = spark, cls

    def __enter__(self):
        self.old = self.spark.conf.get(_PROVIDER_KEY, None)
        self.spark.conf.set(_PROVIDER_KEY, self.cls)

    def __exit__(self, *exc):
        if self.old is None:
            self.spark.conf.unset(_PROVIDER_KEY)
        else:
            self.spark.conf.set(_PROVIDER_KEY, self.old)


def _rows(df) -> Counter:
    return Counter(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("name", STATEFUL_QUERIES)
def test_stateful_query_identical_under_rocksdb(spark, name):
    """Provider equivalence, the whole contract: the state BACKEND
    must be invisible to results. Each stateful query runs once under
    the default HDFS-backed provider and once under RocksDB; the
    emitted multisets must match exactly."""
    with _provider(spark, HDFS_DEFAULT):
        want = _rows(QUERIES[name](spark, SMOKE_SF_DIR))
    with _provider(spark, ROCKSDB):
        got = _rows(QUERIES[name](spark, SMOKE_SF_DIR))
    assert got == want
    assert sum(got.values()) > 0


def test_kill_and_restart_under_rocksdb(spark, tmp_path):
    """The r9 kill-and-restart exactly-once case re-run with RocksDB
    holding the state: stop after 2 of 4 chunks, restart from the
    SAME checkpoint (whose state now lives in RocksDB SST files), and
    the final file sink is byte-identical to an uninterrupted run's."""
    from tests.test_streaming import (
        _four_chunks,
        _stage_chunk,
        _tumbling_append,
    )

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

    with _provider(spark, ROCKSDB):
        src_a = str(tmp_path / "src_a")
        out_a, cp_a = str(tmp_path / "out_a"), str(tmp_path / "cp_a")
        for c in chunks[:2]:
            _stage_chunk(spark, src_a, c)
        run(src_a, out_a, cp_a)  # "crash" between batches
        for c in chunks[2:]:
            _stage_chunk(spark, src_a, c)
        run(src_a, out_a, cp_a)  # restart: state rehydrates from RocksDB

        src_b = str(tmp_path / "src_b")
        out_b, cp_b = str(tmp_path / "out_b"), str(tmp_path / "cp_b")
        for c in chunks:
            _stage_chunk(spark, src_b, c)
        run(src_b, out_b, cp_b)

    got = _rows(spark.read.parquet(out_a))
    want = _rows(spark.read.parquet(out_b))
    assert got == want
    assert sum(got.values()) > 0


def test_rocksdb_state_metrics_exposed(spark):
    """The capacity-planning surface (SCALE.md §18): under RocksDB the
    query progress must report per-operator state rows AND the
    provider's own size metrics (rocksdbSstFileSize etc.) — the
    numbers a 100 TB state budget is written against. Runs the
    watermarked tumbling count and inspects the LAST progress with
    state (trailing no-data batches may report empty operators)."""
    from apache_spark_irs_form_990_spark.streaming.stream_queries import (
        read_events_stream,
    )

    ev = read_events_stream(spark, SMOKE_SF_DIR)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    ckpt = os.path.join(
        tempfile.gettempdir(), f"spark990_rocksmetrics_{uuid.uuid4().hex[:8]}"
    )
    with _provider(spark, ROCKSDB):
        q = (
            agg.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            ops = [
                op
                for p in q.recentProgress
                for op in p["stateOperators"]
                if op.get("numRowsTotal", 0) > 0
            ]
        finally:
            q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
    assert ops, "no state operator reported rows"
    last = ops[-1]
    assert last["numRowsTotal"] > 0
    custom = last.get("customMetrics", {})
    rocks_keys = [k for k in custom if k.startswith("rocksdb")]
    assert rocks_keys, f"no rocksdb custom metrics in {sorted(custom)}"
    # the size metrics the capacity answer uses exist and are sane
    assert "rocksdbSstFileSize" in custom
    assert custom.get("rocksdbTotalMemoryUsage", 0) >= 0
