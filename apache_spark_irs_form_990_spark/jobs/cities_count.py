"""CitiesCountJob — the reference's one concrete job, DataFrame-native.

Drop-in workflow parity with ``/root/reference/CitiesCountJob.py``:

    python -m apache_spark_irs_form_990_spark.jobs.cities_count \
        manifest.txt citiesnames --num_output_partitions 1 --log_level WARN

reads a manifest of IRS-990 XML URIs, flattens each file to (tag, text)
pairs, counts occurrences of CityNm per lowercased city, and writes the
(City, Count) table — same output schema the reference declares
(``CitiesCountJob.py:11-12``), same multiplicity semantics (every
CityNm occurrence counts: filer, preparer, officer addresses each,
``CitiesCountJob.py:18-23``), with the reference's two flatten bugs
fixed (SURVEY.md §2 A′).

The whole job is the relational expression the reference hand-builds in
RDD steps (filter :19, lower+seed :21, reduceByKey IRSSpark.py:181):

    SELECT lower(text) AS City, count(*) AS Count
    FROM flattened WHERE tag = 'CityNm' GROUP BY lower(text)
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.jobs.base import SparkJob, main_for
from apache_spark_irs_form_990_spark.sources.xml_ingest import (
    cities_count,
    read_xml_manifest,
)


class CitiesCountJob(SparkJob):
    """Count of IRS-990 filings per city (lower-cased), from XML manifests."""

    name = "CitiesCountJob"

    def add_arguments(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument(
            "--base_dir",
            default=None,
            help="base directory for relative manifest entries "
                 "(defaults to the manifest's directory, mirroring the "
                 "reference's job-file-relative resolution)",
        )

    def build(self, spark: SparkSession, args: argparse.Namespace) -> DataFrame:
        base = args.base_dir or os.path.dirname(os.path.abspath(args.input))
        flattened = read_xml_manifest(
            spark,
            args.input,
            base_dir=base,
            num_partitions=args.num_input_partitions,
        )
        return cities_count(flattened)

    def metrics(self, df: DataFrame):
        return [
            F.count(F.lit(1)).alias("output_rows"),
            F.sum("Count").alias("city_mentions"),
        ]


if __name__ == "__main__":
    main_for(CitiesCountJob)
