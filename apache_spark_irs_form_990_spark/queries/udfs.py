"""UDF / UDAF / UDTF surface (SURVEY.md §2 B9) — the modern form of the
reference's ``process_record`` hook (``/root/reference/IRSSpark.py:260-268``,
``CitiesCountJob.py:18-23``), which was a row-at-a-time pickled Python
generator.

Every entry here is Arrow-vectorized (pandas_udf / mapInPandas /
applyInPandas): data crosses the JVM<->Python boundary in columnar
batches, not row by row — the 10-100x difference that makes a Python
extension point tolerable at 100 TB. These exist to prove the
*extension surface*; anything expressible with built-ins should use
built-ins (see scalar_functions.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@F.pandas_udf(T.StringType())
def _normalize_key(s: pd.Series) -> pd.Series:
    """Series->Series scalar UDF: trim + lowercase + whitespace collapse
    (the reference's city normalization, vectorized)."""
    return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)


@register(
    "udf_scalar",
    oracle="""
    SELECT lower(trim(event_type)) AS key, count(*) AS cnt
    FROM events
    GROUP BY lower(trim(event_type))
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in a groupBy key — the flagship query with the
    normalization step running in Python (Arrow batches)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(_normalize_key("event_type").alias("key"))
        .agg(F.count("*").alias("cnt"))
    )


@F.pandas_udf(T.DoubleType())
def _exact_sum_cents(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: order-independent exact sum via integer
    cents (same convention as functions.money.dsum, but computed in Python)."""
    return float((v * 100).round().astype("int64").sum()) / 100.0


@register(
    "udaf_grouped",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (reference A10's reduce, in Python)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(_exact_sum_cents("value").alias("total_value"))
    )


def _tokenize_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas UDTF: one doc in, many (doc_id, word) out — the exact
    contract of the reference's process_record (one record -> iterable
    of tuples), Arrow-batched."""
    for pdf in batches:
        words = pdf["text"].str.split(" ")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].repeat(words.str.len()),
                "word": [w for lst in words for w in lst],
            }
        )


@register(
    "udtf_flatmap",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-in-many-out over mapInPandas (the A6 generalization)."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(_tokenize_partition, schema="doc_id long, word string")
    )


def _demean_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas grouped-map: per-language centering of n_chars.
    Integer sums keep the mean exact, so the oracle window twin matches
    bit-for-bit."""
    mean = pdf["n_chars"].sum() / len(pdf)
    return pdf.assign(chars_dev=pdf["n_chars"] - mean)[
        ["doc_id", "lang", "n_chars", "chars_dev"]
    ]


@register(
    "udtf_grouped_map",
    oracle="""
    SELECT doc_id, lang, n_chars,
           n_chars - (CAST(sum(n_chars) OVER (PARTITION BY lang) AS DOUBLE)
                      / count(*) OVER (PARTITION BY lang)) AS chars_dev
    FROM documents
    """,
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group DataFrame transform via applyInPandas. Each language
    group lands in one Python worker as a pandas frame — the per-group
    imperative escape hatch. Skew note: a hot group serializes into one
    task; prefer window functions (see windows.py) when the logic fits
    a frame spec."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(
            _demean_group,
            schema="doc_id long, lang string, n_chars long, chars_dev double",
        )
    )


@register(
    "udtf_python_lateral",
    oracle="""
    SELECT doc_id, u.pos, u.word
    FROM (
      SELECT doc_id,
             unnest([{'pos': i - 1, 'word': t[i]}
                     FOR i IN generate_series(1, len(t))]) AS u
      FROM (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id % 20 = 0)
    )
    """,
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF (Spark 4 `@udtf`) applied via LATERAL join —
    the table-function face of the reference's `process_record` hook
    (A6): one input row in, an arbitrary row set out, declared schema.

    Compared with the mapInPandas formulation (udtf_flatmap), a UDTF
    is per-ROW logic with SQL-surface ergonomics (`LATERAL fn(col)`),
    composable by any SQL author without touching partitions. Arrow
    batching keeps the boundary columnar. Hot-path caveat stands: for
    a pure tokenize like this, built-in explode(split()) (see
    fn_explode_tokens) stays fully in codegen and wins; UDTFs are for
    logic expressions can't reach.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, word string", useArrow=True)
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.pos, s.word FROM udtf_docs, LATERAL split_words(text) s"
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id,
           n_chars,
           n_chars * 2 AS doubled
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python boundary: the UDF
    receives raw ``pyarrow.RecordBatch``es (no pandas conversion at
    all) and returns the same. The tier list for Python interop, fast
    to slow: built-in expr >> mapInArrow > mapInPandas/pandas_udf >>
    row-at-a-time F.udf. Use this tier when the Python work is itself
    Arrow-native (pyarrow.compute, polars, DuckDB-in-executor)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def double_chars(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("n_chars"),
                    pc.multiply(batch.column("n_chars"), pa.scalar(2, pa.int64())),
                ],
                names=["doc_id", "n_chars", "doubled"],
            )

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "n_chars")
    )
    return d.mapInArrow(
        double_chars, schema="doc_id long, n_chars long, doubled long"
    )
