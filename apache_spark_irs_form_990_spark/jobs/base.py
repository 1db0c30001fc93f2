"""Job framework: the reference's CLI/config surface on DataFrames.

Mirrors ``/root/reference/IRSSpark.py``'s control plane — argparse
surface (``:45-110``), validate/patch hooks (``:99-110``), session
bootstrap (``:134-154``), metrics reporting (``:156-165``) — with the
execution model swapped from hand-built RDD lineage to a single
DataFrame expression the subclass declares.

CLI parity (same flags, same defaults):

    --num_input_partitions   400   (IRSSpark.py:42,58-62)
    --num_output_partitions  10    (IRSSpark.py:43,63-65)
    --output_format          parquet {parquet,orc,json,csv} (66-68)
    --output_compression     gzip  (69-71; orc auto-zlib 102-106)
    --output_option/-o       key=value passthrough (72-78)
    --log_level              INFO  (83-85)
    --spark_profiler               (86-89)

(--local_temp_dir is intentionally gone: there is no hand-rolled S3
download to stage — the DataSource streams.)

Metrics: the reference's accumulators (records / files processed /
failed, IRSSpark.py:119-125) become ``DataFrame.observe`` rows reported
after the write — same numbers, no side-channel mutable state.
"""

from __future__ import annotations

import argparse
import logging

from pyspark.sql import DataFrame, SparkSession

from apache_spark_irs_form_990_spark.session import get_session
from apache_spark_irs_form_990_spark.sources.sinks import write_table


class SparkJob:
    """Subclass point (the reference's IRSSpark class, DataFrame-ized):
    override ``name``, ``build(spark, args) -> DataFrame`` and
    optionally ``add_arguments`` / ``validate_arguments``."""

    name = "SparkJob"

    # -- config surface ----------------------------------------------------
    def parse_arguments(self, argv: list[str] | None = None) -> argparse.Namespace:
        p = argparse.ArgumentParser(prog=self.name, description=self.__doc__)
        p.add_argument("input", help="path to file listing input paths")
        p.add_argument("output", help="output table name (managed) or path")
        p.add_argument("--num_input_partitions", type=int, default=400,
                       help="number of input splits/partitions")
        p.add_argument("--num_output_partitions", type=int, default=10,
                       help="number of output partitions (coalesce)")
        p.add_argument("--output_format", default="parquet",
                       choices=["parquet", "orc", "json", "csv"],
                       help="output format")
        p.add_argument("--output_compression", default="gzip",
                       choices=["none", "gzip", "snappy", "zlib", "lzo"],
                       help="output compression codec")
        p.add_argument("--output_option", "-o", action="append", default=[],
                       metavar="KEY=VALUE",
                       help="repeatable writer option passthrough")
        p.add_argument("--output_path", action="store_true",
                       help="treat `output` as a filesystem path instead of "
                            "a managed table name")
        p.add_argument("--log_level", default="INFO", help="log level")
        p.add_argument("--spark_profiler", action="store_true",
                       help="enable spark.python.profile")
        self.add_arguments(p)
        args = p.parse_args(argv)
        if not self.validate_arguments(args):
            raise SystemExit(1)
        args.output_options = dict(kv.split("=", 1) for kv in args.output_option)
        return args

    def add_arguments(self, parser: argparse.ArgumentParser) -> None:
        """Extension hook (IRSSpark.py:96-97)."""

    def validate_arguments(self, args: argparse.Namespace) -> bool:
        """Extension hook (IRSSpark.py:99-110). The orc gzip->zlib fixup
        itself lives in sinks.write_table."""
        return True

    # -- dataflow ----------------------------------------------------------
    def build(self, spark: SparkSession, args: argparse.Namespace) -> DataFrame:
        """Declare the job as ONE DataFrame expression. Catalyst plans
        it; there is no process_record loop to hand-schedule."""
        raise NotImplementedError

    # -- lifecycle ---------------------------------------------------------
    def run(self, argv: list[str] | None = None) -> dict:
        """Parse -> session -> build -> observe -> write -> report.

        Returns the observed job metrics (the reference logged its
        accumulators at the same point, IRSSpark.py:156-165,190).
        """
        from pyspark.sql import Observation

        args = self.parse_arguments(argv)
        logging.basicConfig(level=args.log_level)
        log = logging.getLogger(self.name)
        extra = {"spark.python.profile": "true"} if args.spark_profiler else {}
        spark = get_session(app_name=self.name, extra_conf=extra)
        spark.sparkContext.setLogLevel(args.log_level)
        try:
            df = self.build(spark, args)
            obs = Observation("job_metrics")
            observed = df.observe(obs, *self.metrics(df))
            write_table(
                observed,
                path=args.output if args.output_path else None,
                output_format=args.output_format,
                compression=(None if args.output_compression == "none"
                             else args.output_compression),
                num_output_partitions=args.num_output_partitions,
                options=args.output_options,
                table_name=None if args.output_path else args.output,
            )
            metrics = obs.get
            for k, v in metrics.items():
                log.info("%s metric %s = %s", self.name, k, v)
            if args.spark_profiler:
                spark.sparkContext.show_profiles()
            return metrics
        finally:
            spark.stop()

    def metrics(self, df: DataFrame):
        """Observed metrics columns (reference A14 analogs)."""
        from pyspark.sql import functions as F

        return [F.count(F.lit(1)).alias("output_rows")]


def main_for(job_cls: type[SparkJob]) -> None:
    job_cls().run()
