"""Frontier extensions, part 9 — batch-mode time windows (tumbling and
session), SQL join-strategy hints, parameterized SQL, and nested-struct
scan pruning (SURVEY.md §2 B11 continuation).

`window()`/`session_window()` are the SAME expressions the streaming
queries use (B8) — running them in batch proves the batch/stream
symmetry Structured Streaming promises: one query definition, two
execution modes, identical grouping semantics (and the batch run IS
the backfill recipe for the streaming pipeline's history).
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OWN_MEDIA_DIRS: list[str] = []  # this process's media caches, rm'd at exit


def _cleanup_own_media_dirs() -> None:
    import shutil

    for d in _OWN_MEDIA_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _sweep_dead_media_dirs() -> None:
    """Remove media-cache dirs whose creator process no longer exists
    (path format ``spark990_media_{pid}_{tag}``); live pids' dirs are
    never touched. Legacy pid-less dirs (pre-r8 naming) fail the int
    parse and are skipped."""
    import shutil

    for d in glob.glob(os.path.join(tempfile.gettempdir(), "spark990_media_*")):
        try:
            pid = int(os.path.basename(d).split("_")[2])
            os.kill(pid, 0)
        except (ValueError, IndexError):
            continue
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            continue


import atexit as _atexit

_atexit.register(_cleanup_own_media_dirs)

from apache_spark_irs_form_990_spark.operators.multimodal import media_table
from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


@register(
    "agg_time_window_batch",
    oracle="""
    SELECT strftime(make_timestamp((epoch_us(CAST(ts AS TIMESTAMP))
                                    // 21600000000) * 21600000000),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_time_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour windows via the `window()` expression in BATCH
    mode — the literal same expression [[stream_tumbling_count]] runs
    under `readStream`, executed over the table instead: this is the
    batch/stream symmetry that makes Structured Streaming backfills
    trivial (same query text, swap the source). The window boundary is
    pure epoch arithmetic (floor to the 6-hour grid), which is exactly
    what the oracle computes; window() adds no shuffle beyond the
    count's own aggregate."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
            "n",
        )
    )


@register(
    "agg_session_window_batch",
    oracle="""
    WITH lagd AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(CAST(ts AS TIMESTAMP))
                       - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
                       > 1800000000
                  THEN 1 ELSE 0 END AS new_s,
             CAST(round(value * 100) AS BIGINT) AS v_cents
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
    ),
    sess AS (
      SELECT user_id, ts, v_cents,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagd
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           CAST(sum(v_cents) AS DOUBLE) / 100.0 AS session_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def agg_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions via the `session_window()` expression in
    BATCH mode — the built-in merging-window twin of the hand-rolled
    gaps-and-islands sessionization ([[win_sessionize_batch]]) and the
    batch half of [[stream_session_window]]'s symmetry. Spark's
    session end is (last event + gap), which the oracle reproduces
    from the island aggregate. One shuffle on user_id; the window
    merge happens inside the aggregate, no separate window pass."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")).cast("double") / 100.0).alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "session_value",
        )
    )


@register(
    "sql_join_hints",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           CAST(sum({sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def sql_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINTS: `/*+ SHUFFLE_HASH(o) */` forces a shuffled
    hash join where the planner's default for two fact tables is
    sort-merge — the explicit-control escape hatch when statistics
    mislead the optimizer (hash beats sort-merge when one side fits a
    task's memory but exceeds the broadcast threshold). Results are
    strategy-invariant — the oracle checks that; the plan test
    (test_plans.py) checks the hint actually took effect. The full
    hint family (BROADCAST / MERGE / SHUFFLE_HASH /
    SHUFFLE_REPLICATE_NL) rides the same syntax."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT /*+ SHUFFLE_HASH(o) */
               o_orderpriority,
               count(*) AS n_lines,
               CAST(sum({sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0
                 AS total_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o_orderpriority
        """
    )


@register(
    "sql_parameterized_args",
    oracle=f"""
    SELECT c_mktsegment,
           count(*) AS n,
           CAST(sum({sql_cents('c_acctbal')}) AS DOUBLE) / 100.0 AS total_bal
    FROM customer
    WHERE c_acctbal > 1000.0
    GROUP BY c_mktsegment
    """,
)
def sql_parameterized_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (`spark.sql(query, args={...})`) — named
    `:threshold`-style binding, the injection-safe surface for
    user-supplied predicates (string interpolation into SQL is the
    anti-pattern this replaces). The parameter binds at parse time to
    a literal, so Catalyst constant-folds and pushes it down exactly
    like a hand-written literal — same plan, same scan-level
    PushedFilters."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT c_mktsegment,
               count(*) AS n,
               CAST(sum({sql_cents('c_acctbal')}) AS DOUBLE) / 100.0
                 AS total_bal
        FROM customer
        WHERE c_acctbal > :threshold
        GROUP BY c_mktsegment
        """,
        args={"threshold": 1000.0},
    )


@register(
    "scan_nested_struct_prune",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1
    """,
)
def scan_nested_struct_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-field pruning through a parquet round-trip: the media
    table (binary payload + metadata STRUCT) is written once, then a
    metadata-only aggregate reads back JUST `meta.kind` and
    `meta.n_bytes` — the physical scan's ReadSchema must contain the
    two struct leaves and NOT the payload column (plan-tested). This
    is the property that makes struct-typed metadata free at 100 TB:
    a query that never mentions the payload never pays its I/O, even
    through nested projections."""
    import hashlib

    m = media_table(spark, sf_dir)
    # Cache key = THIS PROCESS (pid) + source IDENTITY (abspath +
    # mtime + size of the documents parquet), never the sf_dir
    # basename: test fixtures reuse basenames across sessions (pytest
    # tmp dirs are always "edge_sf0"), and a basename-keyed marker
    # cache re-served a STALE media table written from last session's
    # fixture (r8 edge-suite find). The pid bounds accumulation the
    # same way the persisted-ANN index does (r8 review find — a
    # path-keyed sweep can never reclaim other sessions' unique tmp
    # paths): dirs whose creator pid is dead are swept at entry, this
    # process's dirs are removed at exit, and within-process reuse
    # (the cache's purpose — bench reruns) still hits the marker.
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    _sweep_dead_media_dirs()
    dest = os.path.join(
        tempfile.gettempdir(), f"spark990_media_{os.getpid()}_{tag}"
    )
    marker = os.path.join(dest, "_SUCCESS")
    if not os.path.exists(marker):
        _OWN_MEDIA_DIRS.append(dest)
        m.write.mode("overwrite").parquet(dest)
    back = spark.read.parquet(dest)
    return (
        back.groupBy(F.col("meta.kind").alias("kind"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("meta.n_bytes").alias("total_bytes"),
        )
    )
