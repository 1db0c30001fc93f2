"""Frontier extensions, part 7 — the XML/codec scalar surface: xpath
extraction, schema-based from_xml parsing, CSV row codecs, and the SQL
UNPIVOT clause (SURVEY.md §2 B11 continuation).

This family deepens the reference-domain parity: the reference's whole
purpose is pulling fields out of IRS-990 XML (`IRSSpark.py:246-249`,
`CitiesCountJob.py:18-23`). The manifest/flatten source
(`sources/xml_ingest.py`) covers the schema-on-read path; these
queries cover the SCHEMA-DECLARED path — xpath navigation and
`from_xml` struct parsing as row-level expressions, the way a 990
pipeline with a known year-schema would run entirely inside codegen
with no Python. XML payloads are constructed deterministically from
table columns so the DuckDB oracle can re-derive every extraction with
an independent implementation (regexp / direct columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


@register(
    "fn_xpath_extract",
    oracle=f"""
    WITH xml AS (
      SELECT c_custkey,
             '<Return><Filer><CityNm>' || c_name || '</CityNm><BalCents>'
               || CAST({sql_cents('c_acctbal')} AS VARCHAR)
               || '</BalCents></Filer></Return>' AS doc
      FROM customer
    )
    SELECT c_custkey,
           regexp_extract(doc, '<CityNm>([^<]*)</CityNm>', 1) AS filer_name,
           CAST(regexp_extract(doc, '<BalCents>(-?[0-9]+)</BalCents>', 1)
                AS BIGINT) AS bal_cents
    FROM xml
    WHERE c_custkey % 101 = 0
    """,
)
def fn_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath field extraction over 990-shaped XML documents —
    `xpath_string`/`xpath_long` navigating a real element tree, the
    schema-declared alternative to the reference's flatten-everything
    IR (the reference chose RDD + ElementTree because of per-year
    schema drift, `README.md:28-29`; for fields whose path IS stable
    across years, xpath inside whole-stage codegen beats a Python
    parse by orders of magnitude and never leaves the JVM). The
    oracle extracts the same fields with an independent
    implementation (regex capture groups), so parser agreement is
    checked, not assumed. Documents are built deterministically from
    customer rows; output is a 1/101 key sample."""
    c = load(spark, sf_dir, "customer")
    doc = F.concat(
        F.lit("<Return><Filer><CityNm>"),
        F.col("c_name"),
        F.lit("</CityNm><BalCents>"),
        cents("c_acctbal").cast("string"),
        F.lit("</BalCents></Filer></Return>"),
    )
    return (
        c.filter(F.col("c_custkey") % 101 == 0)
        .select("c_custkey", doc.alias("doc"))
        .select(
            "c_custkey",
            F.expr("xpath_string(doc, '/Return/Filer/CityNm')").alias(
                "filer_name"
            ),
            F.expr("xpath_long(doc, '/Return/Filer/BalCents')").alias(
                "bal_cents"
            ),
        )
    )


@register(
    "fn_from_xml_struct",
    oracle=f"""
    SELECT o_orderstatus AS status,
           count(*) AS n,
           CAST(sum({sql_cents('o_totalprice')}) AS DOUBLE) / 100.0
             AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def fn_from_xml_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared XML parsing with `from_xml`: order rows are
    serialized to XML fragments, parsed back through a declared
    `STRUCT<status STRING, cents BIGINT>` schema, and aggregated off
    the parsed struct — the lossless-codec proof for the XML path
    (parse(serialize(x)) == x), which is exactly the property a
    known-schema 990 ingest relies on. The oracle aggregates the
    source columns directly, so any field the codec drops or mangles
    breaks the hash. All JVM-side: concat → from_xml → struct access
    stay in one codegen span; the aggregate shuffles 2 longs per
    status."""
    o = load(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><cents>"),
        cents("o_totalprice").cast("string"),
        F.lit("</cents></o>"),
    )
    parsed = o.select(
        F.from_xml(xml, "status STRING, cents BIGINT").alias("st")
    )
    return (
        parsed.groupBy(F.col("st.status").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("st.cents").cast("double") / 100.0).alias("total_price"),
        )
    )


@register(
    "fn_csv_codec",
    oracle=f"""
    -- expectation: the codec is lossless for EVERY row, so
    -- n_lossless == n_rows; the decoded total must equal the
    -- source-column aggregate.
    SELECT count(*) AS n_rows,
           count(*) AS n_lossless,
           CAST(sum({sql_cents('o_totalprice')}) AS DOUBLE) / 100.0
             AS decoded_total
    FROM orders
    """,
)
def fn_csv_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CSV codec round-trip: `to_csv(struct)` serializes each
    order, `from_csv` parses it back under the declared schema, and
    the audit counts rows whose re-serialization matches the original
    line byte-for-byte (lossless both directions), plus an aggregate
    computed from DECODED fields — so the oracle (source-column
    arithmetic) catches any codec corruption. This is the A13 family
    (`IRSSpark.py:66-78`, csv as an output format) at expression
    granularity: the codec runs per-row inside codegen, the shape
    used for embedding typed records in message queues."""
    o = load(spark, sf_dir, "orders")
    line = F.to_csv(
        F.struct(
            F.col("o_orderkey"),
            F.col("o_orderpriority"),
            cents("o_totalprice").alias("c"),
        ),
        {"sep": "|"},
    )
    parsed = F.from_csv(
        line, "k BIGINT, prio STRING, c BIGINT", {"sep": "|"}
    )
    roundtrip = F.to_csv(
        F.struct(
            parsed.getField("k").alias("o_orderkey"),
            parsed.getField("prio").alias("o_orderpriority"),
            parsed.getField("c").alias("c"),
        ),
        {"sep": "|"},
    )
    return o.select(
        line.alias("line"), roundtrip.alias("rt"), parsed.alias("p")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("line") == F.col("rt"), 1).otherwise(0)).alias(
            "n_lossless"
        ),
        (F.sum(F.col("p").getField("c")).cast("double") / 100.0).alias(
            "decoded_total"
        ),
    )


@register(
    "sql_unpivot_clause",
    oracle="""
    SELECT l_returnflag, 'O' AS status, CAST(sum(CASE WHEN l_linestatus = 'O'
             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'F' AS status, CAST(sum(CASE WHEN l_linestatus = 'F'
             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL `UNPIVOT` clause — wide→long through the parser surface,
    completing the reshape matrix ([[reshape_pivot_api]] /
    [[sql_pivot_clause]] for long→wide, [[reshape_unpivot]] for the
    DataFrame API). The wide frame is the PIVOT query's own output, so
    the two clauses are exercised as inverses; UNPIVOT plans the same
    Expand node as `DataFrame.unpivot`. Zero-filled cells survive the
    round trip as explicit zeros (INCLUDE NULLS is not needed since
    the pivot coalesces)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, status, qty FROM (
          SELECT * FROM (
            SELECT l_returnflag, l_linestatus,
                   CAST(l_quantity AS BIGINT) AS q
            FROM lineitem
          )
          PIVOT (coalesce(sum(q), 0) FOR l_linestatus IN ('O' AS qty_o,
                                                          'F' AS qty_f))
        )
        UNPIVOT (qty FOR status IN (qty_o AS O, qty_f AS F))
        """
    )
