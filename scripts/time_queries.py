"""Focused same-VM timing for named registered queries: warm once,
then min-of-3 noop-sink timings (bench.py's methodology), one JSON
line to stdout — the per-change A/B evidence tool for optimization
rounds (guide §1.4).

    python scripts/time_queries.py q1 q2 ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/time_queries.py q1
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    spark = get_session(app_name="time_queries")
    qs = registry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    def run(name: str) -> None:
        spark.sparkContext.setJobDescription(name)
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.sparkContext.setJobDescription(None)

    for n in names:
        run(n)  # warm-up
    best = {n: float("inf") for n in names}
    for _ in range(3):
        for n in names:
            t0 = time.perf_counter()
            run(n)
            best[n] = min(best[n], time.perf_counter() - t0)
    print(json.dumps({n: round(t, 3) for n, t in best.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
