"""Commit-log table contract (sources/lakehouse.py, VERDICT r9
task 1): snapshot isolation, optimistic-concurrency conflict
detection, aborted-commit invisibility, selective MERGE rewrite,
time travel, and lossless compaction."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.sources.lakehouse import (
    CommitConflict,
    _try_commit,
    _write_data_files,
    compact_table,
    create_table,
    latest_version,
    merge_into,
    read_snapshot,
    snapshot_files,
)

SF_DIR = "/root/testdata/sf0.001"


def _nation(spark):
    from apache_spark_irs_form_990_spark.sources.lakehouse import _base_nation

    return _base_nation(spark, SF_DIR)


def _rows(df):
    return {
        (r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in df.collect()
    }


def test_create_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)
    assert latest_version(path) == 0
    assert _rows(read_snapshot(spark, path)) == _rows(_nation(spark))
    # the manifest carries disjoint per-file key ranges (what makes
    # MERGE pruning selective)
    stats = sorted(snapshot_files(path, 0).values(), key=lambda s: s["lo"])
    assert len(stats) == 4
    for a, b in zip(stats, stats[1:]):
        assert a["hi"] < b["lo"]


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    """A single-key update must rewrite exactly the one file whose
    range holds the key; the other files' PATHS carry forward
    verbatim across the commit — the O(changed partitions) claim as
    an assertion, not narrative."""
    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)
    live0 = set(snapshot_files(path, 0))
    one = spark.createDataFrame(
        [(3, "U", "PATCHED", 9)],
        "n_nationkey int, op string, n_name string, n_regionkey long",
    )
    v = merge_into(spark, path, one)
    assert v == 1
    live1 = set(snapshot_files(path, 1))
    carried = live0 & live1
    assert len(carried) == 3  # 3 of 4 files untouched, paths identical
    want = {
        (k, "PATCHED" if k == 3 else n, 9 if k == 3 else r)
        for (k, n, r) in _rows(_nation(spark))
    }
    assert _rows(read_snapshot(spark, path)) == want


def test_time_travel_pins_premerge_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)
    before = _rows(read_snapshot(spark, path, version=0))
    merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(0, "D", None, None)],
            "n_nationkey int, op string, n_name string, n_regionkey long",
        ),
    )
    # latest lost key 0; version 0 still serves the original bytes
    assert _rows(read_snapshot(spark, path, version=0)) == before
    assert _rows(read_snapshot(spark, path)) == {
        t for t in before if t[0] != 0
    }


def test_concurrent_writer_conflict_detected_and_retried(spark, tmp_path):
    """Two writers plan against the same snapshot; the second to
    commit MUST see the advanced log. The low-level protocol raises
    CommitConflict on the stale link attempt; `merge_into`'s retry
    loop re-plans against the new snapshot and lands BOTH changes."""
    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)

    # writer A stages + commits version 1 under writer B's feet
    a_files = _write_data_files(
        spark,
        path,
        spark.createDataFrame(
            [(200, "A_ROW", 1)], "n_nationkey int, n_name string, n_regionkey long"
        ),
        "n_nationkey",
    )
    _try_commit(path, 1, {"op": "merge", "added": a_files, "removed": []})

    # a stale direct commit at version 1 must fail...
    with pytest.raises(CommitConflict):
        _try_commit(path, 1, {"op": "merge", "added": {}, "removed": []})

    # ...and merge_into re-plans: its change lands at version 2 with
    # writer A's row still present
    v = merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(3, "U", "B_PATCH", 9)],
            "n_nationkey int, op string, n_name string, n_regionkey long",
        ),
    )
    assert v == 2
    got = _rows(read_snapshot(spark, path))
    assert (200, "A_ROW", 1) in got
    assert (3, "B_PATCH", 9) in got


def test_aborted_commit_invisible(spark, tmp_path):
    """A writer that stages data but dies before linking its manifest
    leaves bytes on disk but NO change in any snapshot — readers list
    files from the log, never the directory."""
    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)
    before = _rows(read_snapshot(spark, path))
    # staged, never committed
    _write_data_files(
        spark,
        path,
        spark.createDataFrame(
            [(999, "GHOST", 9)],
            "n_nationkey int, n_name string, n_regionkey long",
        ),
        "n_nationkey",
    )
    assert _rows(read_snapshot(spark, path)) == before
    assert latest_version(path) == 0
    # the torn temp-manifest case: a .tmp file in _commits is ignored
    with open(os.path.join(path, "_commits", ".tmp-dead"), "w") as f:
        json.dump({"added": {"x": {}}}, f)
    assert latest_version(path) == 0


def test_compact_is_lossless_commit(spark, tmp_path):
    """Compaction = a commit that replaces files without changing
    rows: fragment the table via many tiny merges, compact to the
    planner-ish file count, assert row-set hash equality and that the
    live file count actually dropped — and that time travel still
    reaches the fragmented version."""
    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)
    for k in (1, 7, 13, 19):  # four single-key merges -> fragmentation
        merge_into(
            spark,
            path,
            spark.createDataFrame(
                [(k, "U", f"P{k}", 9)],
                "n_nationkey int, op string, n_name string, n_regionkey long",
            ),
        )
    v_frag = latest_version(path)
    n_frag = len(snapshot_files(path, v_frag))
    before = _rows(read_snapshot(spark, path))
    v = compact_table(spark, path, n_files=2)
    assert v == v_frag + 1
    assert _rows(read_snapshot(spark, path)) == before  # lossless
    assert len(snapshot_files(path, v)) < n_frag
    assert len(snapshot_files(path, v)) <= 2
    assert len(snapshot_files(path, v_frag)) == n_frag  # history intact


def test_two_process_concurrent_merge(spark, tmp_path):
    """TRUE concurrency, not a simulated stale commit: two separate
    driver PROCESSES (own JVMs, own sessions) merge different keys
    into the same table at the same time. Whichever link loses the
    version race must re-plan and land at the next version — both
    changes survive, the log holds exactly 3 commits, and no torn or
    duplicate row exists."""
    import subprocess
    import sys

    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)

    script = """
import sys
sys.path.insert(0, "/root/repo")
from apache_spark_irs_form_990_spark.session import get_session
from apache_spark_irs_form_990_spark.sources.lakehouse import merge_into
key, name, path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = get_session(app_name=f"writer_{name}", shuffle_partitions=4)
changes = spark.createDataFrame(
    [(key, "U", name, 9)],
    "n_nationkey int, op string, n_name string, n_regionkey long",
)
v = merge_into(spark, path, changes, max_retries=10)
print(f"committed at {v}")
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(k), nm, path],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        )
        for k, nm in ((3, "WRITER_A"), (20, "WRITER_B"))
    ]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert latest_version(path) == 2  # both landed, one after a retry
    got = _rows(read_snapshot(spark, path))
    assert (3, "WRITER_A", 9) in got
    assert (20, "WRITER_B", 9) in got
    assert len(got) == len(_rows(_nation(spark)))  # no dup, no loss


def test_streaming_foreachbatch_merge_sink_exactly_once(spark, tmp_path):
    """The capstone of tasks 1+4: a STREAM lands CDC batches into the
    commit-log table via foreachBatch(merge_into), and the crash falls
    in the nastiest window — AFTER the table commit, BEFORE the
    checkpoint commit. The restart re-delivers the in-flight batch and
    merge_into applies it AGAIN; exactly-once must emerge from MERGE
    idempotence (re-applying the same U/I/D set is a semantic no-op),
    so the final table equals the uninterrupted expectation while the
    log honestly records the duplicate delivery as an extra version."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    path = str(tmp_path / "t")
    create_table(spark, path, _nation(spark), key="n_nationkey", n_files=4)

    # two chronological CDC chunks: batch 0 updates keys 1,2; batch 1
    # updates keys 7,9 and deletes key 14
    src = str(tmp_path / "cdc")
    chunks = [
        [(1, "U", "S1", 7), (2, "U", "S2", 7)],
        [(7, "U", "S7", 7), (9, "U", "S9", 7), (14, "D", None, None)],
    ]
    schema = "n_nationkey int, op string, n_name string, n_regionkey long"
    import time as _t

    for c in chunks:
        spark.createDataFrame(c, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _t.sleep(1.1)

    crash_marker = str(tmp_path / "crashed_once")

    def sink(df, bid):
        if df.isEmpty():
            return
        merge_into(spark, path, df)  # the table commit lands...
        if bid == 1 and not os.path.exists(crash_marker):
            with open(crash_marker, "w") as f:
                f.write("")
            raise RuntimeError("crash AFTER table commit, BEFORE checkpoint")

    def run():
        q = (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(StreamingQueryException):
        run()
    v_crash = latest_version(path)  # batch 1's merge DID commit
    run()  # restart: batch 1 re-delivered, merged again (idempotent)
    assert latest_version(path) == v_crash + 1  # the duplicate is logged

    want = {
        (k, {1: "S1", 2: "S2", 7: "S7", 9: "S9"}.get(k, n),
         7 if k in (1, 2, 7, 9) else r)
        for (k, n, r) in _rows(_nation(spark))
        if k != 14
    }
    assert _rows(read_snapshot(spark, path)) == want
