"""Frontier extensions, part 12 — custom Python DataSource connector,
VARIANT semi-structured parsing, and exactly-once incremental streaming
with Trigger.AvailableNow (SURVEY.md §2 B1/B7/B8 continuation).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.sources.python_datasource import (
    register_filing990,
)
from apache_spark_irs_form_990_spark.streaming.stream_queries import (
    read_events_stream,
    run_to_completion,
)
from apache_spark_irs_form_990_spark.tables import load


@register(
    "source_python_datasource",
    oracle="""
    WITH gen AS (
      SELECT i AS ein,
             ['berkeley', 'madison', 'austin', 'chicago', 'boston']
               [CAST(i % 5 AS INT) + 1] AS city,
             (i * 7919) % 10000000 AS revenue_cents
      FROM range(0, 5000) AS t(i)
    )
    SELECT city,
           count(*) AS n_filings,
           CAST(sum(revenue_cents) AS DOUBLE) / 100.0 AS total_revenue
    FROM gen
    GROUP BY city
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A CUSTOM CONNECTOR through Spark 4's Python DataSource API —
    the engine-extension point that replaces the reference's
    hand-rolled S3 fetch loop (`IRSSpark.py:192-244`) with a declared
    source: `partitions()` plans the splits (8 EIN ranges here, file
    lists or byte ranges in production), `read(partition)` streams
    each split inside its task, and Spark owns scheduling/retries.
    The synthetic filing generator is pure integer arithmetic, so the
    oracle regenerates the identical corpus with `range()` SQL and
    the whole connector path — registration, split planning,
    per-partition iteration, schema application — is hash-checked
    end to end."""
    register_filing990(spark)
    df = (
        spark.read.format("filing990")
        .option("rows", 5000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("city").agg(
        F.count(F.lit(1)).alias("n_filings"),
        (F.sum("revenue_cents").cast("double") / 100.0).alias(
            "total_revenue"
        ),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                     AS BIGINT) AS DOUBLE) / count(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    `parse_json` ingests the props payload once into the binary
    Variant encoding, `variant_get` extracts typed paths — the
    engine-native replacement for repeated `get_json_object` string
    re-parsing ([[fn_json]] is the classic path), and the right
    target for schema-drifting event properties at 100 TB (parse
    once, navigate many). The oracle extracts the same path with
    DuckDB's JSON machinery — two independent JSON implementations
    agreeing on typed values."""
    e = load(spark, sf_dir, "events")
    v = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.select("event_type", v.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


@register(
    "stream_available_now_incremental",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def stream_available_now_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental batch via `Trigger.AvailableNow` + checkpoint — the
    'process whatever has arrived, then stop' mode that turns a
    streaming query into a restartable nightly job with exactly-once
    file tracking: each run consumes only files the checkpoint hasn't
    seen and terminates. On the bounded fixture one run consumes
    everything, so the per-type counts equal the batch aggregate —
    checked exactly by the oracle, which is precisely the exactly-once
    guarantee (no file skipped, none double-counted). A fresh
    checkpoint dir per invocation keeps repeat calls deterministic;
    production keeps ONE checkpoint so successive runs are true
    increments ([[stream_foreachbatch_sink]] shows the idempotent
    sink half)."""
    ev = read_events_stream(spark, sf_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = f"avnow_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tempfile.gettempdir(), f"spark990_ckpt_{name}")
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(
        spark.table(name).collect(), schema=spark.table(name).schema
    )


@register(
    "source_python_stream_reader",
    oracle="""
    WITH gen AS (
      SELECT i AS ein,
             ['berkeley', 'madison', 'austin', 'chicago', 'boston']
               [CAST(i % 5 AS INT) + 1] AS city,
             (i * 7919) % 10000000 AS revenue_cents
      FROM range(0, 2000) AS t(i)
    )
    SELECT city,
           count(*) AS n_filings,
           CAST(sum(revenue_cents) AS DOUBLE) / 100.0 AS total_revenue
    FROM gen
    GROUP BY city
    """,
)
def source_python_stream_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same custom connector as a STREAMING source (Spark 4 Python
    DataSource streaming API): `readStream.format("filing990")` drives
    `Filing990StreamReader`, whose dict offsets cursor through EIN
    ranges micro-batch by micro-batch (5 batches of 400 here) and
    whose `readBetweenOffsets` replays any committed range
    byte-identically — the exactly-once recovery contract. The count
    aggregate's final state equals the batch connector's answer over
    the same range (oracle regenerates it in SQL), proving
    stream-vs-batch parity for the connector path itself, not just
    for file sources."""
    register_filing990(spark)
    stream = (
        spark.readStream.format("filing990")
        .option("rows", 2000)
        .option("batchrows", 400)
        .load()
    )
    agg = stream.groupBy("city").agg(
        F.count(F.lit(1)).alias("n_filings"),
        (F.sum("revenue_cents").cast("double") / 100.0).alias("total_revenue"),
    )
    return run_to_completion(agg, "complete")


@register(
    "sink_python_datasource_writer",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def sink_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUNDTRIP through the custom Python SINK (`CityReportSink`):
    the events aggregate writes via the connector's two-phase commit —
    per-task staged jsonl parts, driver-side commit renaming them into
    place behind a `_SUCCESS` manifest, abort leaving the destination
    clean — then the committed files are read back and returned. The
    oracle recomputes the aggregate directly, so the whole write
    protocol (task write → commit message → driver commit) is
    hash-checked, not just exercised. This completes connector parity:
    `source_python_datasource` (batch in), `source_python_stream_reader`
    (stream in), and this (batch out) are the three faces a real
    Python-reachable system integration needs."""
    import os
    import shutil
    import tempfile

    from apache_spark_irs_form_990_spark.sources.python_datasource import (
        register_cityreport,
    )

    register_cityreport(spark)
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / 100.0
        ).alias("sum_value"),
    )
    out = tempfile.mkdtemp(prefix="spark990_cityreport_")
    try:
        agg.write.format("cityreport").option("path", out).mode("append").save()
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            # explicit raise, not `assert` — the commit-protocol check
            # must survive `python -O`
            raise RuntimeError(
                f"cityreport sink commit left no _SUCCESS manifest in {out}"
            )
        schema = "event_type string, cnt long, sum_value double"
        # materialize the tiny (|event types|-row) report so the temp
        # output dir can be removed before returning
        rows = (
            spark.read.schema(schema)
            .json(os.path.join(out, "part-*.jsonl"))
            .collect()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema)
