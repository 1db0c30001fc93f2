"""Capture .explain('formatted') for named registered queries into
plans/r<N>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (guide §1: measure first; §7.2: read the plan).

    python scripts/capture_plans.py before sim_pq_recall_at_k ...
    python scripts/capture_plans.py after --sf /root/testdata/sf0.01 q1 q2

Target round dir via $PLANS_ROUND (default r12)."""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

OUT_DIR = os.path.join(
    REPO_ROOT, "plans", os.environ.get("PLANS_ROUND", "r12")
)


def main() -> int:
    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.session import get_session

    args = sys.argv[1:]
    suffix = args.pop(0)
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        args.pop(0)
        sf_dir = args.pop(0)
    names = args
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_session(app_name="capture_plans")
    qs = registry.queries()
    rc = 0
    for n in names:
        if n not in qs:
            print(f"unknown query: {n}")
            rc = 2
            continue
        try:
            df = qs[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{n}: FAILED to build/explain: {e}")
            rc = 1
            continue
        path = os.path.join(OUT_DIR, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{n} -> {path} ({len(plan)} chars)")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
