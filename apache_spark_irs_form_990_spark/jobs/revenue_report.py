"""RevenueReportJob — a second concrete job on the SparkJob framework.

Where CitiesCountJob proves parity with the reference's one workload
(`/root/reference/CitiesCountJob.py`), this job proves the framework
GENERALIZES: the same CLI surface, observe-metrics and sink machinery
(`IRSSpark.py:45-110,119-125,184-188` analogs in `jobs/base.py`)
drives a 5-table star-schema join — a workload class the reference
couldn't express at all (it has no joins; SURVEY.md §2 Part A).

    python -m apache_spark_irs_form_990_spark.jobs.revenue_report \
        /root/testdata/sf0.001 revenue_report --output_path out/ \
        --region ASIA --num_output_partitions 1

`input` is the star-schema directory (TESTDATA.md layout) instead of a
URI manifest; `--region` demonstrates the `add_arguments` extension
hook (`IRSSpark.py:96-97`).
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.jobs.base import SparkJob, main_for
from apache_spark_irs_form_990_spark.functions.money import revenue_sum
from apache_spark_irs_form_990_spark.tables import load


class RevenueReportJob(SparkJob):
    """Revenue by region/nation over the TPC-H-ish star schema."""

    name = "RevenueReportJob"

    def add_arguments(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument(
            "--region",
            default=None,
            help="restrict the report to one region name (e.g. ASIA); "
                 "the filter prunes the broadcast dimension before the join",
        )

    def build(self, spark: SparkSession, args: argparse.Namespace) -> DataFrame:
        sf_dir = args.input
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders")
        c = load(spark, sf_dir, "customer")
        n = load(spark, sf_dir, "nation")
        r = load(spark, sf_dir, "region")
        if args.region:
            r = r.filter(F.col("r_name") == args.region)
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(revenue_sum("revenue"), F.count("*").alias("n_lines"))
        )

    def metrics(self, df: DataFrame):
        return [
            F.count(F.lit(1)).alias("output_rows"),
            F.sum("n_lines").alias("lines_aggregated"),
        ]


if __name__ == "__main__":
    main_for(RevenueReportJob)
