"""End-to-end CLI job test: the reference's documented workflow
(`spark-submit CitiesCountJob.py <manifest> <table>`,
/root/reference/README.md:34-35) runs against our engine and produces
the golden city counts."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

from apache_spark_irs_form_990_spark.sources.xml_ingest import write_fixture
from tests.conftest import REPO_ROOT


def test_cities_count_job_cli(tmp_path):
    manifest = write_fixture(str(tmp_path))
    out_dir = str(tmp_path / "citiesnames")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO_ROOT)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "apache_spark_irs_form_990_spark.jobs.cities_count",
            manifest,
            out_dir,
            "--output_path",
            "--num_input_partitions", "2",
            "--num_output_partitions", "1",
            "--log_level", "WARN",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = {
        (r[0], r[1])
        for r in duckdb.sql(
            f"SELECT City, Count FROM read_parquet('{out_dir}/*.parquet')"
        ).fetchall()
    }
    assert got == {("berkeley", 2), ("madison", 2)}
    # one output partition requested -> exactly one data file
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert len(files) == 1
