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


def test_revenue_report_job_cli(tmp_path):
    """The job framework generalizes past the reference's one workload:
    same CLI drives a 5-table star join, with the --region extension
    argument pruning the report."""
    out_dir = str(tmp_path / "revenue")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO_ROOT)
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "apache_spark_irs_form_990_spark.jobs.revenue_report",
            "/root/testdata/sf0.001",
            out_dir,
            "--output_path",
            "--region", "ASIA",
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
    rows = duckdb.sql(
        f"SELECT r_name, n_name, revenue, n_lines "
        f"FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchall()
    assert rows, "empty report"
    assert {r[0] for r in rows} == {"ASIA"}
    # oracle: same aggregate straight off the parquet
    expected = duckdb.sql(
        """
        SELECT n.n_name, count(*) AS n_lines
        FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') l
        JOIN read_parquet('/root/testdata/sf0.001/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        JOIN read_parquet('/root/testdata/sf0.001/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN read_parquet('/root/testdata/sf0.001/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        JOIN read_parquet('/root/testdata/sf0.001/region.parquet') r
          ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        """
    ).fetchall()
    assert {(r[1], r[3]) for r in rows} == {(e[0], e[1]) for e in expected}
