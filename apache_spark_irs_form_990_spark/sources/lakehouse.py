"""Engine-native commit-log table — minimal snapshot-isolated ACID
tables over parquet (SURVEY.md §7 M9 made EXECUTABLE, VERDICT r9
task 1).

The sandbox ships neither Delta nor Iceberg, but the repo already
owns every ingredient a log-structured table format is made of (the
two-phase-commit Python sink in `sources/python_datasource.py` staged
parts + driver-side manifest commit); this module composes them into
the real thing:

  table_dir/
    _commits/00000000.json ...   the COMMIT LOG: one JSON per version,
                                 {added: [...], removed: [...], stats}
    d-<uuid>/part-*.parquet      immutable data subdirs, one per commit

Snapshot isolation falls out of three properties:

  * data files are IMMUTABLE — a commit only adds new subdirs and
    marks old files removed; the live set at version V is the replay
    of commits 0..V (added minus removed), so `read_snapshot(path, V)`
    is time travel for free and a reader holding version V can never
    see a torn write (files it references are never mutated).
  * the commit itself is one `os.link(tmp, _commits/{V+1}.json)` —
    link fails with EEXIST if ANY other writer claimed that version,
    which is the whole optimistic-concurrency protocol: detect the
    advanced log, re-plan against the new snapshot, retry (the
    `merge_into` loop; `CommitConflict` surfaces when retries run
    out). No locks, no coordinator — the same protocol Delta runs on
    its _delta_log, expressed in 30 lines.
  * staged-but-uncommitted subdirs are INVISIBLE: readers list files
    from the log, never from the directory, so an aborted writer
    leaves garbage bytes but no torn table
    (tests/test_lakehouse.py pins both conflict and abort).

MERGE INTO rewrites ONLY touched files: the create path writes data
`repartitionByRange` on the key, the log carries per-file [min, max]
key stats (gathered with one `input_file_name()` aggregate — the
manifest pass every table format runs at write time), and the merge
probes the change keys against those ranges to pick its rewrite set —
an untouched file's path is carried forward verbatim across versions
(asserted by test). At 100 TB this is the difference between a
nightly MERGE costing O(changed partitions) and O(table).

Compaction (VERDICT r9 task 3) is then just a commit whose added
files hold exactly the removed files' rows — `compact_table` rewrites
the live set to the 128 MB planner's file count without changing a
row; see also `layout_compact_binpack` (sources/layout.py) for the
plain-directory form.

Provenance: the reference overwrite-rebuilds one managed table per
run (IRSSpark.py:183-188); the commit log is the 100 TB upgrade of
that sink contract (mutate in place, read any point in time).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.scratch import ScratchDirs
from apache_spark_irs_form_990_spark.operators.merge import merge_apply
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

_TABLE_DIRS = ScratchDirs("spark990_lakehouse")


class CommitConflict(RuntimeError):
    """Another writer committed the version this writer planned for."""


def _commits_dir(path: str) -> str:
    return os.path.join(path, "_commits")


def _commit_path(path: str, version: int) -> str:
    return os.path.join(_commits_dir(path), f"{version:08d}.json")


def latest_version(path: str) -> int:
    """Highest committed version, or -1 for an empty/absent log."""
    cdir = _commits_dir(path)
    if not os.path.isdir(cdir):
        return -1
    versions = [
        int(f[:8])
        for f in os.listdir(cdir)
        if f.endswith(".json") and f[:8].isdigit()
    ]
    return max(versions, default=-1)


def _read_commit(path: str, version: int) -> dict:
    with open(_commit_path(path, version)) as f:
        return json.load(f)


def snapshot_files(path: str, version: int | None = None) -> dict:
    """Replay the log through ``version`` (default: latest) → the live
    file set: {relpath: stats}. Metadata-sized driver work, exactly
    like any table format's manifest resolution."""
    v = latest_version(path) if version is None else version
    if v < 0 or not os.path.exists(_commit_path(path, v)):
        raise FileNotFoundError(f"no commit {version} in {path}")
    live: dict = {}
    for i in range(v + 1):
        c = _read_commit(path, i)
        for r in c.get("removed", []):
            live.pop(r, None)
        live.update(c.get("added", {}))
    return live


def _try_commit(path: str, version: int, payload: dict) -> None:
    """Atomically claim ``version``: write a temp manifest, then
    hard-link it into place — EEXIST from ANY concurrent writer
    becomes CommitConflict, the optimistic-concurrency signal."""
    cdir = _commits_dir(path)
    os.makedirs(cdir, exist_ok=True)
    tmp = os.path.join(cdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump({"version": version, **payload}, f)
    try:
        os.link(tmp, _commit_path(path, version))
    except FileExistsError as exc:
        raise CommitConflict(
            f"version {version} already committed in {path}"
        ) from exc
    finally:
        os.unlink(tmp)


def _write_data_files(
    spark: SparkSession, path: str, df: DataFrame, key: str
) -> dict:
    """Stage one immutable data subdir and return {relpath: stats}
    with per-file [min, max] key ranges + row counts — one
    `input_file_name()` aggregate over what was just written (the
    manifest pass). The subdir is INVISIBLE until a commit names it."""
    sub = f"d-{uuid.uuid4().hex[:12]}"
    full = os.path.join(path, sub)
    df.write.parquet(full)
    stats = (
        spark.read.parquet(full)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min(key).alias("lo"),
            F.max(key).alias("hi"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    out = {}
    for r in stats:
        rel = os.path.join(sub, os.path.basename(r["f"]))
        out[rel] = {"lo": r["lo"], "hi": r["hi"], "rows": r["rows"]}
    return out


def create_table(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    key: str,
    n_files: int = 4,
) -> int:
    """Commit 0: range-partition ``df`` on ``key`` into ``n_files``
    immutable files (disjoint key ranges — what makes MERGE's
    touched-file pruning selective) and write the first manifest."""
    added = _write_data_files(
        spark, path, df.repartitionByRange(n_files, key), key
    )
    _try_commit(path, 0, {"op": "create", "key": key, "added": added})
    return 0


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the live files of ``version`` (default
    latest), listed from the LOG — staged/aborted subdirs and
    files removed by later commits are invisible by construction."""
    live = snapshot_files(path, version)
    if not live:
        raise FileNotFoundError(f"snapshot of {path} has no live files")
    return spark.read.parquet(*[os.path.join(path, rel) for rel in live])


def _touched_files(
    spark: SparkSession, live: dict, changes: DataFrame, key: str
) -> list[str]:
    """Files whose [min, max] key range holds at least one change key.
    Computed as one broadcast range-join of the (metadata-sized) file
    list against the change keys — never collecting the change set.
    Integer merge keys only (the stats frame is typed long); a string-
    keyed table would need the schema derived from the stats values."""
    stats = spark.createDataFrame(
        [(rel, s["lo"], s["hi"]) for rel, s in live.items()],
        "rel string, lo long, hi long",
    )
    hit = (
        changes.select(F.col(key).alias("k"))
        .distinct()
        .join(
            F.broadcast(stats),
            (F.col("k") >= F.col("lo")) & (F.col("k") <= F.col("hi")),
        )
        .select("rel")
        .distinct()
        .collect()
    )
    return [r["rel"] for r in hit]


def merge_into(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str | None = None,
    op_col: str = "op",
    max_retries: int = 3,
) -> int:
    """MERGE INTO the table: full CDC semantics (op ∈ {'U','I','D'},
    the `merge_apply` contract) rewriting ONLY the files the change
    keys touch; untouched file paths carry forward verbatim. On a
    log-advanced conflict the whole plan re-runs against the NEW
    snapshot (the change set must re-probe ranges and re-merge — a
    blind re-link would commit stale data), up to ``max_retries``."""
    for _ in range(max_retries):
        v = latest_version(path)
        key = key or _read_commit(path, 0).get("key")
        live = snapshot_files(path, v)
        touched = _touched_files(spark, live, changes, key)
        if touched:
            base = spark.read.parquet(
                *[os.path.join(path, rel) for rel in touched]
            )
        else:
            # pure insert outside every range: merge against an empty
            # base with the table's schema
            base = read_snapshot(spark, path, v).limit(0)
        merged = merge_apply(base, changes, key=key, op_col=op_col)
        added = _write_data_files(
            spark, path, merged.repartitionByRange(max(len(touched), 1), key), key
        )
        try:
            _try_commit(
                path, v + 1, {"op": "merge", "added": added, "removed": touched}
            )
            return v + 1
        except CommitConflict:
            continue
    raise CommitConflict(f"merge_into gave up after {max_retries} retries")


def compact_table(
    spark: SparkSession, path: str, n_files: int
) -> int:
    """OPTIMIZE: one commit whose added files hold exactly the live
    rows, bin-packed to ``n_files`` — rows never change, only layout
    (the read-back hash equality is the test's lossless proof)."""
    v = latest_version(path)
    key = _read_commit(path, 0).get("key")
    live = snapshot_files(path, v)
    df = spark.read.parquet(*[os.path.join(path, rel) for rel in live])
    added = _write_data_files(
        spark, path, df.repartitionByRange(n_files, key), key
    )
    _try_commit(
        path,
        v + 1,
        {"op": "compact", "added": added, "removed": sorted(live)},
    )
    return v + 1


def _nation_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME deterministic CDC set as [[merge_upsert_cdc]] — every
    even nation key becomes U/D/I by key mod, three brand-new keys
    insert — so the commit-log path re-lands the operator-form MERGE
    through a real table under the identical oracle."""
    n = load(spark, sf_dir, "nation")
    mod_changes = n.filter(F.col("n_nationkey") % 2 == 0).select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 3 == 0, "U")
        .when(F.col("n_nationkey") % 3 == 1, "D")
        .otherwise("I")
        .alias("op"),
        F.concat(F.lit("NATION_"), F.col("n_nationkey").cast("string")).alias(
            "n_name"
        ),
        (F.col("n_nationkey") % 5).cast("long").alias("n_regionkey"),
    )
    new_rows = n.filter(F.col("n_nationkey") < 3).select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.lit("I").alias("op"),
        F.concat(F.lit("NEW_"), F.col("n_nationkey").cast("string")).alias(
            "n_name"
        ),
        (F.col("n_nationkey") % 5).cast("long").alias("n_regionkey"),
    )
    return mod_changes.unionByName(new_rows)


def _base_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )


def _create_and_merge(spark: SparkSession, sf_dir: str) -> str:
    """Shared fixture for the registered queries: commit 0 = nation
    range-partitioned into 4 files, commit 1 = the CDC merge."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = _TABLE_DIRS.new_dir(tag)
    create_table(
        spark, path, _base_nation(spark, sf_dir), key="n_nationkey", n_files=4
    )
    merge_into(spark, path, _nation_changes(spark, sf_dir))
    return path


@register(
    "lakehouse_merge_commitlog",
    oracle="""
    WITH changes AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN 'U'
                  WHEN n_nationkey % 3 = 1 THEN 'D'
                  ELSE 'I' END AS op,
             concat('NATION_', CAST(n_nationkey AS VARCHAR)) AS n_name,
             CAST(n_nationkey % 5 AS BIGINT) AS n_regionkey
      FROM nation WHERE n_nationkey % 2 = 0
      UNION ALL
      SELECT 100 + n_nationkey, 'I',
             concat('NEW_', CAST(n_nationkey AS VARCHAR)),
             CAST(n_nationkey % 5 AS BIGINT)
      FROM nation WHERE n_nationkey < 3
    )
    SELECT coalesce(b.n_nationkey, c.n_nationkey) AS n_nationkey,
           CASE WHEN c.op IN ('U','I') THEN c.n_name ELSE b.n_name END AS n_name,
           CASE WHEN c.op IN ('U','I') THEN c.n_regionkey
                ELSE b.n_regionkey END AS n_regionkey
    FROM nation b
    FULL OUTER JOIN changes c ON b.n_nationkey = c.n_nationkey
    WHERE c.op IS NULL OR c.op != 'D'
    """,
)
def lakehouse_merge_commitlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[[merge_upsert_cdc]] RE-LANDED through the commit-log table
    (VERDICT r9 task 1): commit 0 writes nation range-partitioned on
    its key with per-file range stats in the manifest; commit 1 is
    MERGE INTO with the same deterministic CDC set, rewriting only
    the touched files; the returned DataFrame is an independent
    read of the POST-MERGE SNAPSHOT — so the oracle (identical to the
    operator-form query's) now checks the whole create→merge→commit→
    snapshot-read round trip, not just the join expression.
    Concurrency (conflict retry), abort invisibility, time travel and
    selective rewrite are pinned by tests/test_lakehouse.py."""
    path = _create_and_merge(spark, sf_dir)
    return read_snapshot(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "lakehouse_time_travel_read",
    oracle="""
    SELECT n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    """,
)
def lakehouse_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: after the same create + MERGE history as
    [[lakehouse_merge_commitlog]], read the table AS OF version 0 —
    the pre-merge snapshot must still be byte-available (immutable
    files + log replay), i.e. exactly the original nation. The merge
    commit physically removed/added files; version pinning is what
    makes the removal logical, not physical."""
    path = _create_and_merge(spark, sf_dir)
    return read_snapshot(spark, path, version=0).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
