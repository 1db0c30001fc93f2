"""Streaming tail of the commit-log table
(sources/lakehouse_stream.py, r11): offset determinism, non-append
refusal, skipChangeCommits, startingVersion, and checkpointed
kill-and-restart exactly-once."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest

from apache_spark_irs_form_990_spark.sources.lakehouse import (
    compact_table,
    create_table,
    merge_into,
)
from apache_spark_irs_form_990_spark.sources.lakehouse_stream import (
    tail_stream,
)

SCHEMA = "n_nationkey int, op string, n_name string, n_regionkey long"


def _mk_table(spark, path):
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)],
        "n_nationkey int, n_name string, n_regionkey long",
    )
    create_table(spark, path, base, key="n_nationkey", n_files=1)


def _append(spark, path, rows):
    merge_into(spark, path, spark.createDataFrame(rows, SCHEMA))


def _drain(spark, df, ckpt=None):
    """Run the stream to exhaustion into a memory sink; return rows."""
    sink = f"tail_test_{uuid.uuid4().hex[:8]}"
    w = df.writeStream.outputMode("append").format("memory").queryName(sink)
    if ckpt:
        w = w.option("checkpointLocation", ckpt)
    q = w.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return {
        (r["n_nationkey"], r["n_name"], r["_commit_version"])
        for r in spark.table(sink).collect()
    }


def test_tail_replays_create_and_appends_with_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _append(spark, path, [(10, "I", "x", 1)])
    got = _drain(spark, tail_stream(spark, path))
    assert got == {
        (1, "a", 0),
        (2, "b", 0),
        (3, "c", 0),
        (10, "x", 1),
    }


def test_tail_emits_nothing_for_compaction(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    compact_table(spark, path, n_files=1)
    got = _drain(spark, tail_stream(spark, path))
    assert {v for (_, _, v) in got} == {0}  # no echo of rewritten rows
    assert len(got) == 3


def test_tail_refuses_non_append_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _append(spark, path, [(2, "U", "b2", 5)])  # rewrites a file
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="NonAppendCommit|retract"):
        _drain(spark, tail_stream(spark, path))


def test_tail_skip_change_commits(spark, tmp_path):
    """skipChangeCommits: the update commit is skipped wholesale; a
    later pure append still streams."""
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _append(spark, path, [(2, "U", "b2", 5)])   # version 1: change
    _append(spark, path, [(20, "I", "y", 2)])   # version 2: append
    got = _drain(
        spark, tail_stream(spark, path, skipChangeCommits="true")
    )
    assert got == {
        (1, "a", 0),
        (2, "b", 0),   # the ORIGINAL row; the update was skipped
        (3, "c", 0),
        (20, "y", 2),
    }


def test_tail_starting_version_skips_history(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    _append(spark, path, [(10, "I", "x", 1)])
    got = _drain(spark, tail_stream(spark, path, startingVersion="1"))
    assert got == {(10, "x", 1)}


def test_tail_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart: drain, stop, append a new commit, restart on
    the SAME checkpoint — the second run must deliver ONLY the new
    commit's rows (offsets replay from the checkpoint; immutable
    files make the re-read deterministic)."""
    path = str(tmp_path / "t")
    ckpt = os.path.join(tempfile.gettempdir(), f"tailckpt_{uuid.uuid4().hex[:8]}")
    try:
        _mk_table(spark, path)
        batches: list = []

        def _run():
            q = (
                tail_stream(spark, path)
                .writeStream.outputMode("append")
                .option("checkpointLocation", ckpt)
                .foreachBatch(
                    lambda df, epoch: batches.append(
                        {
                            (r["n_nationkey"], r["_commit_version"])
                            for r in df.collect()
                        }
                    )
                )
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        _run()
        first = set().union(*batches) if batches else set()
        assert first == {(1, 0), (2, 0), (3, 0)}
        batches.clear()
        _append(spark, path, [(10, "I", "x", 1)])
        _run()
        second = set().union(*batches) if batches else set()
        assert second == {(10, 1)}  # ONLY the new commit — no replay
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_tail_refuses_deletion_vector_commit(spark, tmp_path):
    """A delete_mor commit adds no files but IS a change commit — the
    tail must refuse it (or skip under skipChangeCommits), never
    silently treat it as an empty append."""
    from apache_spark_irs_form_990_spark.sources.lakehouse import (
        delete_keys_mor,
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    path = str(tmp_path / "t")
    _mk_table(spark, path)
    delete_keys_mor(
        spark, path, spark.createDataFrame([(2,)], "n_nationkey int")
    )
    with pytest.raises(StreamingQueryException, match="NonAppendCommit|retract"):
        _drain(spark, tail_stream(spark, path))
    _append(spark, path, [(20, "I", "y", 2)])
    got = _drain(spark, tail_stream(spark, path, skipChangeCommits="true"))
    assert got == {(1, "a", 0), (2, "b", 0), (3, "c", 0), (20, "y", 2)}
