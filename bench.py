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

# Stable headline set: one representative per operator family; kept
# byte-identical across rounds so the `value` field of BENCH_r{N}.json
# is directly comparable to every earlier round (and to BASELINE).
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

# Extended set (round 3+): the heavy families added since round 1 —
# multi-join TPC-H, LSH banding, IVF ANN, the fused pretraining mix,
# the sketch-only distinct, and the bucketed embedding dedup. Timed
# and reported alongside, summed separately (`extended_total`) so the
# stable total stays round-comparable while regressions here are no
# longer invisible to BENCH_r{N}.
EXTENDED = [
    "join_q9_product_profit",
    "join_q18_large_orders",
    "join_q21_waiting_supplier",
    "dedup_minhash_banding_md5",
    "sim_cosine_ann_ivf",
    "pipeline_pretrain_mix",
    "agg_approx_count_distinct_raw",
    "dedup_near_embedding",
    "dedup_incremental_minhash",
    # r3.1 additions — extended_total is therefore only comparable
    # per-query across rounds, not as a total; the stable-16 headline
    # total remains the round-over-round number.
    "mm_phash_hamming_dedup",
    "sim_ann_lsh_multiprobe",
    "pipeline_dedup_cascade",
    "text_rolling_winnow_fingerprints",
]


def _run_set(spark, qs, names: list[str], sf_dir: str) -> dict[str, float]:
    """Warm every query in ``names`` once, then time each min-of-3.

    Warm-up excludes JVM class-loading, whole-stage codegen
    compilation, and file listing/footer reads — one-time
    per-plan/per-dataset costs that amortize to nothing at 100 TB;
    the timed loop measures steady-state execution throughput.

    noop sink: materializes every output row/column without the
    count() shortcut (which lets Catalyst prune projections) and
    without filesystem write cost. min-of-3 runs: local[N] timings
    on a shared VM carry 30-50% load/GC noise per run; the min is
    the stable steady-state estimate (all runs are post-warm-up).
    The timed passes are interleaved (3 full sweeps over the set)
    so one GC pause or load spike cannot inflate one query's every
    sample.
    """
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(3):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)
    return {n: round(t, 3) for n, t in best.items()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session(app_name="bench")

    qs = registry.queries()

    # Two phases: the stable-16 headline set is warmed and timed FIRST,
    # in isolation — the same session state rounds 1-2 measured it
    # under — so its total stays round-comparable; the extended heavy
    # set runs afterwards and cannot perturb the headline numbers.
    timings = _run_set(spark, qs, [n for n in HEADLINE if n in qs], sf_dir)
    timings.update(_run_set(spark, qs, [n for n in EXTENDED if n in qs], sf_dir))

    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    extended_total = round(sum(timings[n] for n in EXTENDED if n in timings), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extended_total": extended_total,
                "all_total": round(total + extended_total, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
