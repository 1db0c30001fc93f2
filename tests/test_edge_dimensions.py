"""Edge-case DIMENSION differential (r8, fifth axis of the
edge-fixture program — VERDICT r7 task 7): degenerate dimension rows
the generated fixtures never contain, swept over every oracled
consumer of customer/supplier/part/nation/region.

Injected classes:

- duplicate dim keys on HOT keys the fact tables actually reference
  (c_custkey=5: 7 orders; s_suppkey=3: 617 lineitems; p_partkey=7:
  48 lineitems) with DIFFERING payloads — breaking the unique-key
  assumption a fact⋈dim join silently relies on: a plain join fans
  out identically in both engines, but any side that dedups-by-key or
  aggregates-then-joins diverges;
- an identically-duplicated full dim row (multiplicity class), both
  on a cold key and on nation 0 (which every nationkey-0 customer and
  supplier joins through);
- zero-balance and negative-balance customers/suppliers (ratio and
  sign-bucket denominators);
- empty-string names / segments / types (group-by keys and LIKE
  patterns over '');
- a part with p_size = 0 and p_retailprice = 0.0;
- a nation (key 25) no customer or supplier references, with an
  empty name (left-join unmatched + '' group key).

Discovery is dynamic (word-boundary regex over the oracle SQL) so
future dimension consumers are auto-covered — the same contract as
the corpus/embeddings/events/relational suites.

Found-by-this-suite fixes (r8): fn_map_higher_order aborted with
DUPLICATED_MAP_KEY on a duplicated dimension row (identical entries
now collapse before map_from_entries; conflicting values stay a loud
error); merge_scd2_dimension_apply double-closed/double-opened a
duplicate-loaded key (both sides now dedup on (key, attribute) — the
SCD2 unique-key contract); sink_roundtrip_csv silently turned an
empty-string name into NULL through the write/read cycle (nullValue
pinned to the \\N dump sentinel so '' and NULL both survive).
"""

from __future__ import annotations

import os
import re
import shutil

import duckdb
import pytest

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import TABLES
from tests.conftest import SMOKE_SF_DIR, assert_matches_oracle

# \b so `part` does not match read_parquet / PARTITION BY, and
# `nation` does not match n_nationkey-in-longer-words.
_DIM_PATS = [
    re.compile(p)
    for p in (r"\bcustomer\b", r"\bsupplier\b", r"\bpart\b", r"\bnation\b",
              r"\bregion\b")
]

EDGE_QUERIES = sorted(
    name
    for name, sql in registry.oracle_sql().items()
    if any(p.search(sql) for p in _DIM_PATS)
)

EDGE_CUSTOMER = """
      (990001, '', 24, 0.0, 'BUILDING'),
      (990002, 'Customer#990002', 0, -999.99, ''),
      (5, 'Customer#000000005-dup', 21, 111.11, 'MACHINERY'),
      (990003, 'Customer#990003', 3, 500.0, 'MACHINERY'),
      (990003, 'Customer#990003', 3, 500.0, 'MACHINERY')
"""
EDGE_SUPPLIER = """
      (3, 'Supplier#000000003-dup', 3, 0.0),
      (990011, '', 24, 0.0),
      (990012, 'Supplier#990012', 0, 42.42),
      (990012, 'Supplier#990012', 0, 42.42)
"""
EDGE_PART = """
      (7, 'small widget dup', 'Brand#1', 'STANDARD', 0, 0.0),
      (990021, '', 'Brand#0', '', 0, 0.0),
      (990022, 'dup part', 'Brand#2', 'PROMO', 5, 1.0),
      (990022, 'dup part', 'Brand#2', 'PROMO', 5, 1.0)
"""


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_dim_sf")
    mutated = {"customer", "supplier", "part", "nation"}
    for t in TABLES:
        src = os.path.join(SMOKE_SF_DIR, f"{t}.parquet")
        if t not in mutated and os.path.exists(src):
            shutil.copy(src, d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/customer.parquet')
          UNION ALL
          SELECT * FROM (VALUES {EDGE_CUSTOMER})
            v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        ) TO '{d / "customer.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/supplier.parquet')
          UNION ALL
          SELECT * FROM (VALUES {EDGE_SUPPLIER})
            v(s_suppkey, s_name, s_nationkey, s_acctbal)
        ) TO '{d / "supplier.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/part.parquet')
          UNION ALL
          SELECT * FROM (VALUES {EDGE_PART})
            v(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
        ) TO '{d / "part.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/nation.parquet')
          UNION ALL
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/nation.parquet')
          WHERE n_nationkey = 0
          UNION ALL
          SELECT CAST(25 AS INT), '', CAST(0 AS INT)
        ) TO '{d / "nation.parquet"}' (FORMAT PARQUET)
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
def test_edge_dimensions_oracle_match(spark, edge_duck, edge_sf_dir, name):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    assert name in queries and name in oracles
    assert_matches_oracle(
        queries[name](spark, edge_sf_dir), edge_duck, oracles[name]
    )
