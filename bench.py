#!/usr/bin/env python
"""Benchmark runner — the driver's per-round performance probe.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + a count-style action
that materializes every row) after a warm-up pass of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.session import get_session

# Headline set: one representative per operator family; kept stable
# across rounds so BENCH_r{N}.json is comparable.
HEADLINE = [
    "agg_count_by_key",
    "agg_sum_min_max_avg",
    "agg_having",
    "agg_pricing_summary",
    "filter_range",
    "project_compute",
    "join_inner_equi",
    "join_star_revenue",
    "join_asof_event",
    "win_rank_topn_per_group",
    "win_latest_per_key",
    "topk_limit",
    "dedup_exact_hash",
    "text_tokenize_stats",
    "sim_cosine_topk",
    "pipeline_corpus_prep",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session(app_name="bench")

    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm-up: run every headline query once at the TARGET sf so JVM
    # class-loading, whole-stage codegen compilation, and file
    # listing/footer reads are not measured — all are one-time
    # per-plan/per-dataset costs that amortize to nothing at 100 TB;
    # the timed loop below measures steady-state execution throughput.
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        # noop sink: materializes every output row/column without the
        # count() shortcut (which lets Catalyst prune projections) and
        # without filesystem write cost. min-of-2 runs: local[N] timings
        # carry 20-30% machine-load noise per run; the min is the
        # stable steady-state estimate (both runs are post-warm-up).
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
