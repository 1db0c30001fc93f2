"""Edge-case CALENDAR differential (r9, seventh axis of the
edge-fixture program): boundary timestamps the generated fixtures
never produce — the epoch instant itself (unix second 0: any
bucketing arithmetic anchored at 0, and "days since" spans of half a
century), a 1-microsecond-after-epoch twin (sub-second truncation on
both engines), a year boundary crossed by 1 microsecond (same user,
sessionization + year/week extraction straddling the edge),
2024-12-30 (ISO week 1 of 2025 while year() = 2024 — the classic
year+weekofyear grouping mismatch), leap day, a month boundary pair,
and a Sunday midnight (day-of-week numbering differs between engines:
Spark dayofweek() is 1=Sunday, DuckDB dow is 0=Sunday — any oracle
pair that mixes the raw numberings diverges exactly here). Every
oracled query whose SQL twin reads `events` re-runs against its
oracle on this fixture.

Distinct from tests/test_edge_events.py (the events axis), which
stresses ROW-shape degeneracies (identical instants, duplicate rows,
single-event users); this axis stresses the VALUES of the time domain
itself.

Found-by-this-suite fixes: stream_watermark_late's late-replay batch
used a FIXED 30-day shift, which the 2024-12-30 row pushed above the
watermark of the mid-January corpus — Spark accepted the "late" rows
as on-time and emitted two phantom windows the oracle (correctly)
excluded. The shift is now data-dependent (full ts span + 30 days),
provably below any reachable watermark.
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
    # the epoch instant itself + a 1-microsecond-later twin
    (99110, "1970-01-01 00:00:00", 9911, "click", 1.0, '{"k": 11}'),
    (99111, "1970-01-01 00:00:00.000001", 9911, "view", 2.0, '{"k": 12}'),
    # year boundary crossed by 1 microsecond, same user
    (99120, "2023-12-31 23:59:59.999999", 9912, "click", 3.0, '{"k": 13}'),
    (99121, "2024-01-01 00:00:00", 9912, "purchase", 4.0, '{"k": 14}'),
    # ISO week 1 of 2025 while year() = 2024
    (99130, "2024-12-30 00:00:00", 9913, "click", 5.0, '{"k": 15}'),
    # leap day
    (99140, "2024-02-29 12:00:00", 9914, "purchase", 6.0, '{"k": 16}'),
    # month boundary pair, same user, 1 second apart
    (99150, "2024-01-31 23:59:59", 9915, "view", 7.0, '{"k": 17}'),
    (99151, "2024-02-01 00:00:00", 9915, "click", 8.0, '{"k": 18}'),
    # Sunday midnight (dow-numbering divergence anchor)
    (99160, "2024-07-07 00:00:00", 9916, "click", 9.0, '{"k": 19}'),
]


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_calendar_sf")
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
def test_edge_calendar_oracle_match(spark, edge_duck, edge_sf_dir, name):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    assert name in queries and name in oracles
    assert_matches_oracle(
        queries[name](spark, edge_sf_dir), edge_duck, oracles[name]
    )
