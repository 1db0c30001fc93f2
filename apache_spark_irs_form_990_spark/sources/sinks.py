"""Multi-format sinks (SURVEY.md §2 A13/B1).

The reference's sink is a `DataFrameWriter` chain with a format arg
(parquet default / orc / json / csv), a compression arg (gzip default,
orc auto-fixed to zlib), passthrough key=value options, and a coalesce
to --num_output_partitions (/root/reference/IRSSpark.py:66-78,102-110,
183-188). `write_table` carries that surface over verbatim — it IS the
idiomatic Spark API already — and the roundtrip queries prove
write->read fidelity per format.

Scale posture: `coalesce(n)` (narrow, no shuffle) controls output file
count exactly as the reference does; for 100 TB writes prefer
`maxRecordsPerFile` + AQE coalescing over a tiny hard-coded n, and
partitionBy/bucketBy for downstream-join-friendly layouts.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

FORMATS = ("parquet", "orc", "json", "csv")

# gzip default as in the reference (IRSSpark.py:69-71); orc's gzip
# equivalent is zlib — the reference patches this in validate_arguments
# (IRSSpark.py:102-106) and so do we.
DEFAULT_COMPRESSION = {
    "parquet": "gzip",
    "orc": "zlib",
    "json": "gzip",
    "csv": "gzip",
}


def write_table(
    df: DataFrame,
    path: str,
    output_format: str = "parquet",
    compression: str | None = None,
    num_output_partitions: int | None = None,
    options: dict | None = None,
    table_name: str | None = None,
) -> None:
    """The reference's sink chain (IRSSpark.py:183-188): coalesce ->
    format -> compression -> options -> save. `table_name` switches to
    a managed saveAsTable in spark.sql.warehouse.dir, the reference's
    default destination (IRSSpark.py:34)."""
    if output_format not in FORMATS:
        raise ValueError(f"unsupported format {output_format!r}; known: {FORMATS}")
    if compression is None:
        compression = DEFAULT_COMPRESSION[output_format]
    if output_format == "orc" and compression == "gzip":
        compression = "zlib"
    if num_output_partitions:
        df = df.coalesce(num_output_partitions)
    writer = (
        df.write.mode("overwrite")
        .format(output_format)
        .option("compression", compression)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if table_name:
        writer.saveAsTable(table_name)
    else:
        writer.save(path)


def _roundtrip(
    spark: SparkSession, sf_dir: str, output_format: str, options: dict | None = None
) -> DataFrame:
    """Write the nation table in `output_format`, read it back.

    nation is ints+strings only, so even the text formats (json/csv)
    roundtrip losslessly with an explicit read schema — the fidelity
    contract the oracle then hash-checks against the original table.
    """
    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    out = os.path.join(
        tempfile.gettempdir(), f"spark990_roundtrip_{output_format}"
    )
    write_table(
        src, out, output_format=output_format, num_output_partitions=2,
        options=options,
    )
    reader = spark.read.format(output_format)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if output_format in ("json", "csv"):
        reader = reader.schema("n_nationkey int, n_name string, n_regionkey int")
    return reader.load(out).select("n_nationkey", "n_name", "n_regionkey")


_ORACLE_NATION = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@register("sink_roundtrip_parquet", oracle=_ORACLE_NATION)
def sink_roundtrip_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "parquet")


@register("sink_roundtrip_orc", oracle=_ORACLE_NATION)
def sink_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orc with the gzip->zlib compression fixup exercised."""
    return _roundtrip(spark, sf_dir, "orc")


@register("sink_roundtrip_json", oracle=_ORACLE_NATION)
def sink_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register("sink_roundtrip_csv", oracle=_ORACLE_NATION)
def sink_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """csv with a passthrough header=true option (the reference's
    --output_option example, IRSSpark.py:72-78).

    nullValue is pinned to the \\N dump convention (r8, found by the
    dimension edge sweep): Spark's CSV defaults write NULL and '' the
    same way and read empty fields back as NULL, so an empty-string
    name silently became NULL through the roundtrip — a fidelity
    violation, not a formatting choice. With a distinct null sentinel
    both values survive exactly (probed: '', NULL, and non-empty all
    roundtrip)."""
    return _roundtrip(
        spark, sf_dir, "csv", options={"header": "true", "nullValue": "\\N"}
    )
