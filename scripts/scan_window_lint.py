"""One-off audit: list every registered query whose optimized plan
contains an unpartitioned Window node (the single-task-sort
anti-pattern). Feeds the whitelist in tests/test_plan_lint.py."""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from apache_spark_irs_form_990_spark import registry  # noqa: E402
from apache_spark_irs_form_990_spark.plans.inspect import (  # noqa: E402
    unpartitioned_windows,
)
from apache_spark_irs_form_990_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    spark = get_session(app_name="window_lint_scan", shuffle_partitions=8)
    flagged = {}
    for name, fn in sorted(registry.queries().items()):
        try:
            hits = unpartitioned_windows(fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD ERROR {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        if hits:
            flagged[name] = hits
            print(f"{name}: {len(hits)} unpartitioned window(s)", flush=True)
            for h in hits:
                print(f"    {h[:160]}")
    print(f"\n== {len(flagged)} queries flagged ==")
    for n in sorted(flagged):
        print(n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
