"""Edge-case EVENTS differential (r7, third axis of the edge-fixture
program): degenerate event streams the generated fixtures never
produce — multiple events at ONE identical instant (exposes missing
sort tiebreaks in lag/lead/sessionize logic and zero-duration
segments), an exactly duplicated row (join/count multiplicity), a
single-event user (degenerate session), and a zero-value purchase
(ratio denominators). Every oracled query whose SQL twin reads
`events` re-runs against its oracle on this fixture.

Found-by-this-suite fixes: win_time_weighted_avg divided by a zero
total span (a user whose whole history is one instant has no defined
TWAP — now filtered before the division on both engines), and
join_range_bucketed's oracle probed duplicated purchase rows twice
where the Spark plan's bucket-dedup distinct collapses them.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.tables import TABLES
from tests.conftest import SMOKE_SF_DIR, assert_matches_oracle

# EVERY oracled query whose SQL twin reads `events`.
EDGE_QUERIES = sorted(
    name for name, sql in registry.oracle_sql().items() if "events" in sql
)

EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    # 5 events at ONE identical hour-aligned instant: sort-tiebreak
    # and zero-duration-segment exposure
    (99010, "2024-01-15 12:00:00", 9901, "click", 1.0, '{"k": 1}'),
    (99011, "2024-01-15 12:00:00", 9901, "view", 2.0, '{"k": 2}'),
    (99012, "2024-01-15 12:00:00", 9901, "purchase", 3.0, '{"k": 3}'),
    (99013, "2024-01-15 12:00:00", 9901, "click", 4.0, '{"k": 4}'),
    (99014, "2024-01-15 12:00:00", 9901, "error", 5.0, '{"k": 5}'),
    # exact duplicate row (same event_id, same everything)
    (99020, "2024-01-16 08:30:00", 9902, "purchase", 42.0, '{"k": 6}'),
    (99020, "2024-01-16 08:30:00", 9902, "purchase", 42.0, '{"k": 6}'),
    # duplicated event_id with a DIFFERING unprojected payload (r8,
    # ADVICE r7): a DISTINCT * oracle keeps both rows where a plan
    # that projects-then-dedups keeps one — oracles must dedup on the
    # plan's own key set (value/props differ; user_id+ts+type agree)
    (99025, "2024-01-16 09:00:00", 9902, "purchase", 10.0, '{"k": 60}'),
    (99025, "2024-01-16 09:00:00", 9902, "purchase", 11.0, '{"k": 61}'),
    # single-event user (degenerate session)
    (99030, "2024-01-17 09:15:27", 9903, "signup", 7.5, '{"k": 7}'),
    # zero-value purchase (ratio denominators)
    (99040, "2024-01-18 10:00:01", 9904, "purchase", 0.0, '{"k": 8}'),
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_events_sf")
    for t in TABLES:
        src = os.path.join(SMOKE_SF_DIR, f"{t}.parquet")
        if t != "events" and os.path.exists(src):
            shutil.copy(src, d / f"{t}.parquet")
    con = duckdb.connect()
    rows = ", ".join(
        "(%d, TIMESTAMP '%s', %d, '%s', %s, '%s')" % r for r in EDGE_EVENTS
    )
    con.execute(
        f"""
        COPY (
          SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                 event_type, value, props
          FROM read_parquet('{SMOKE_SF_DIR}/events.parquet')
          UNION ALL
          SELECT * FROM (VALUES {rows})
            v(event_id, ts, user_id, event_type, value, props)
        ) TO '{d / "events.parquet"}' (FORMAT PARQUET)
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
def test_edge_events_oracle_match(spark, edge_duck, edge_sf_dir, name):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    assert name in queries and name in oracles
    assert_matches_oracle(
        queries[name](spark, edge_sf_dir), edge_duck, oracles[name]
    )
