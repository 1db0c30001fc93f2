"""Edge-case EMBEDDINGS differential (r7, the test_edge_corpus move
applied to the vector axis): real corpora at scale contain zero
embeddings (failed encoder outputs), near-zero embeddings that
quantize to the zero milli-int vector, and duplicated vec_ids — and a
cosine kernel that divides by a zero norm either crashes the job
(Spark ANSI divide-by-zero) or silently diverges from the oracle
(NaN/inf ordering). This suite rebuilds an sf0.001-sized fixture dir
with a hardened `embeddings` table and re-runs the embedding registry
slice against its DuckDB oracles on that data.

Engine convention pinned here: ZERO-NORM vectors (after milli-int
quantization) are excluded from cosine-based candidate generation and
scoring — they have no direction, so no cosine relation is defined for
them. Operators that enumerate the corpus (e.g. SemDeDup's per-cell
report) still count them as members; they simply cannot match or drop.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import TABLES
from tests.conftest import SMOKE_SF_DIR, assert_matches_oracle

# EVERY oracled query whose SQL twin reads `embeddings` (discovered
# dynamically so new registrations are edge-covered automatically).
EDGE_QUERIES = sorted(
    name
    for name, sql in registry.oracle_sql().items()
    if "embeddings" in sql
)

DIM = 64

EDGE_VECS = [
    # (vec_id, python list of 64 floats, label)
    # exact zero vector: no direction, must not reach any cosine
    (900000, [0.0] * DIM, 0),
    # underflow vector: nonzero floats that quantize to the zero
    # milli-int vector (round(1e-5 * 1000) = 0) — same class as the
    # exact zero AFTER quantization, the subtler production case
    (900015, [1e-5] * DIM, 1),
    # constant vector (valid direction, all dims equal)
    (900005, [0.5] * DIM, 2),
    # duplicated vec_id, identical embedding (row-level dup)
    (900010, [float(i % 7) / 10 + 0.1 for i in range(DIM)], 3),
    (900010, [float(i % 7) / 10 + 0.1 for i in range(DIM)], 3),
    # duplicated vec_id with DIFFERING embeddings (r8, ADVICE r7): a
    # per-key window keeps one row where DISTINCT (vec_id, embedding)
    # keeps both — oracles must mirror the dataflow (carry the payload
    # through the window), not re-join the schema
    (900020, [float(i % 5) / 10 + 0.2 for i in range(DIM)], 4),
    (900020, [float(i % 6) / 10 + 0.3 for i in range(DIM)], 4),
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_emb_sf")
    for t in TABLES:
        src = os.path.join(SMOKE_SF_DIR, f"{t}.parquet")
        if t != "embeddings" and os.path.exists(src):
            shutil.copy(src, d / f"{t}.parquet")
    con = duckdb.connect()
    rows = ", ".join(
        "(%d, %s, %d)" % (i, str(v), lb) for i, v, lb in EDGE_VECS
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SMOKE_SF_DIR}/embeddings.parquet')
          UNION ALL
          SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label
          FROM (VALUES {rows}) v(vec_id, embedding, label)
        ) TO '{d / "embeddings.parquet"}' (FORMAT PARQUET)
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
def test_edge_embedding_oracle_match(spark, edge_duck, edge_sf_dir, name):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    assert name in queries, f"{name} not registered"
    assert name in oracles, f"{name} has no oracle"
    assert_matches_oracle(
        queries[name](spark, edge_sf_dir), edge_duck, oracles[name]
    )
