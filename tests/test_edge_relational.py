"""Edge-case ORDERS/LINEITEM differential (r7, fourth axis of the
edge-fixture program): degenerate relational rows — a zero-totalprice
order, an exactly duplicated order row, a zero-quantity/zero-price
lineitem with full discount, and a duplicated lineitem row — swept
over every oracled consumer of either table.

Found-by-this-suite fixes: positive-domain restrictions on the
geometric/harmonic means and the Efraimidis-Spirakis weights, the
x->0 limit of the Theil term, ln(0)'s NULL contract in
fn_math_extended, and ts_periodogram_candidates' final power now
squares the exact milli sums in int128 (HUGEINT / decimal(38,0))
instead of squaring ~1e14 doubles whose 1-ulp engine difference
flipped round(,2).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import TABLES
from tests.conftest import SMOKE_SF_DIR, assert_matches_oracle

# EVERY oracled query whose SQL twin reads orders or lineitem.
EDGE_QUERIES = sorted(
    name
    for name, sql in registry.oracle_sql().items()
    if "orders" in sql or "lineitem" in sql
)

EDGE_ORDERS = """
      (990001, 5, 'O', 0.0,      TIMESTAMP '1995-06-15', '1-URGENT'),
      (990002, 5, 'F', 12345.67, TIMESTAMP '1995-06-15', '5-LOW'),
      (990002, 5, 'F', 12345.67, TIMESTAMP '1995-06-15', '5-LOW')
"""
EDGE_LINEITEM = """
      (990001, 3, 2, 1, 0.0, 0.0, 1.0, 0.0, 'N', 'O', TIMESTAMP '1995-07-01'),
      (990002, 4, 3, 1, 5.0, 100.0, 0.0, 0.08, 'R', 'F', TIMESTAMP '1995-07-02'),
      (990002, 4, 3, 1, 5.0, 100.0, 0.0, 0.08, 'R', 'F', TIMESTAMP '1995-07-02')
"""


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_rel_sf")
    for t in TABLES:
        src = os.path.join(SMOKE_SF_DIR, f"{t}.parquet")
        if t not in ("orders", "lineitem") and os.path.exists(src):
            shutil.copy(src, d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/orders.parquet')
          UNION ALL
          SELECT * FROM (VALUES {EDGE_ORDERS})
            v(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              o_orderdate, o_orderpriority)
        ) TO '{d / "orders.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/lineitem.parquet')
          UNION ALL
          SELECT * FROM (VALUES {EDGE_LINEITEM})
            v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
              l_extendedprice, l_discount, l_tax, l_returnflag,
              l_linestatus, l_shipdate)
        ) TO '{d / "lineitem.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(edge_sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_relational_oracle_match(spark, edge_duck, edge_sf_dir, name):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    assert name in queries and name in oracles
    assert_matches_oracle(
        queries[name](spark, edge_sf_dir), edge_duck, oracles[name]
    )
