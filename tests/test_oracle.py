"""Oracle-differential tests (SURVEY.md §5.2 item 1) — every registered
query with a SQL twin is run on Spark and on DuckDB over the same
parquet and compared order-insensitively. This mirrors the driver's
t2 correctness gate, so a green run here predicts a green
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from apache_spark_irs_form_990_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()
SQL_CHECKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_match(spark, duck, name):
    assert_matches_oracle(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, name):
    """Weaker check for non-SQL-expressible ops: runs, yields >= 0 rows,
    stable schema."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
