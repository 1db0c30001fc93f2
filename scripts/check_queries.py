"""Run named registered queries against their DuckDB oracles at a
given SF dir — the same rows+schema+value comparison as the driver's
correctness gate and tests/test_oracle.py, runnable for a subset:

    python scripts/check_queries.py ml_gain_deciles beh_rfm_segments
    SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 python scripts/check_queries.py --all
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    import duckdb

    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.session import get_session
    from apache_spark_irs_form_990_spark.tables import TABLES
    from tests.conftest import SF_DIR, assert_matches_oracle

    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    queries, oracles = registry.queries(), registry.oracle_sql()
    if "--all" in sys.argv:
        names = sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = get_session(app_name="check_queries", shuffle_partitions=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    results, failed = {}, []
    for n in names:
        t0 = time.time()
        try:
            df = queries[n](spark, SF_DIR)
            if n in oracles:
                assert_matches_oracle(df, duck, oracles[n])
                status = "pass"
            else:
                assert df.columns and df.count() >= 0
                status = "rows_only_pass"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            failed.append(n)
        results[n] = {"status": status, "sec": round(time.time() - t0, 2)}
        print(f"{n}: {results[n]['status']} ({results[n]['sec']}s)", flush=True)
    out = {
        "sf_dir": SF_DIR,
        "n_checked": len(names),
        "n_failed": len(failed),
        "failed": failed,
        "results": results,
    }
    path = os.environ.get("CHECK_QUERIES_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
