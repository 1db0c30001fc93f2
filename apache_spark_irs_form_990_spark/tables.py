"""Table loaders for the driver's parquet star schema (TESTDATA.md).

One parquet file per table under ``{sf_dir}/``. All reads go through
``spark.read.parquet`` so Catalyst gets predicate pushdown + column
pruning for free; callers select/filter on the returned DataFrame and
the scan narrows automatically (verify with ``.explain`` —
``PushedFilters``/``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as long and truncate to microseconds
        # (Spark's native timestamp precision — same truncation DuckDB
        # applies on CAST(ts AS TIMESTAMP)). Runtime-settable legacy conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer `div`, not `/1000` + cast: double division can round
            # up across a microsecond boundary and diverge from DuckDB's
            # exact floor on the same nanos.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # Some generator versions write micros TIMESTAMP_NTZ instead of
            # nanos. unix_micros()/window() require TIMESTAMP_LTZ; the session
            # TZ is pinned to UTC (session.py) so this cast relabels the same
            # instant without shifting values, matching DuckDB's naive reads.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` queries run
    against the same data the DuckDB oracle sees."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
