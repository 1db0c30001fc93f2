"""Partitioning-invariance sweep (SCALE.md §4).

The engine's determinism claim is stronger than "matches DuckDB once":
results must be BIT-IDENTICAL under any partitioning, or they are not
reproducible across cluster sizes. This sweep re-runs a sample of the
numerically-sensitive queries (derived-double aggregations, windowed
statistics, LSH candidate generation, iterative clustering) with
different `spark.sql.shuffle.partitions` settings and asserts exact
row-set equality — the failure mode it guards (naive double summation
whose value depends on merge order) is invisible to a single-run
oracle comparison that happens to use one partitioning.
"""

from __future__ import annotations

import pytest

from apache_spark_irs_form_990_spark import registry
from tests.conftest import SF_DIR

# Queries whose math would drift under reordering if any accumulation
# were a raw double sum; one representative per risk family.
SWEEP = [
    "agg_corr_covar",          # exact int64 moments -> closed form
    "agg_gini_concentration",  # rank window + integer moments
    "sim_label_contrast",      # micro-cosine integerized pair sums
    "ml_embedding_norm_audit", # per-row integerized norms, group mean
    "stats_welch_t_test",      # per-group exact moments
    "ts_acf_multi_lag",        # lagged products over a calendar sort
    "dedup_near_embedding",    # LSH candidates + cosine threshold
    "dedup_cluster_components",  # iterative min-label propagation
    "dedup_incremental_minhash",  # asymmetric signature probe
    "layout_zorder_stats",     # broadcast bounds + bit interleave
    "mm_phash_hamming_dedup",  # Arrow block-mean kernel + quarter banding
    "sim_ann_lsh_multiprobe",  # probe explode + capped-index join + re-rank
    "sim_ann_batch_query",     # r5: batch probes the capped md5-sampled index
    "dedup_fuzzy_cascade",     # r5: banded cand + thresholded levenshtein
    "pipeline_dedup_cascade",  # window keeper + band signatures + scalars
    "text_rolling_winnow_fingerprints",  # Arrow sliding-window hash kernel
    "agg_approx_percentile_contract",    # GK sketch merge under tolerance
    "dedup_semantic_ivf_cells",  # r6: cell argmax + capped priority join
    "dedup_substring_coverage",  # r6: gram-count window + island sweep
    "sample_weighted_reservoir",  # r6: ln-key top-k boundary under merge
    "mm_clip_score_filter",      # r6: micro-int cosine mean per lang
    "pipeline_dsir_weights",     # r6: integer-ln LM sums, top-25 cut
    "dedup_bloom_prefilter_audit",  # r6: broadcast bitset probe counts
    "layout_zorder_prune_roundtrip",  # r6: range-partitioned write+scan
    "sim_pq_train_loop_audit",   # r7: iterated trunc-avg updates per round
    "sim_pq_trained_adc_audit",  # r7: trained codebook + ADC-vs-exact NN
    "dedup_semantic_ivf_nprobe2",  # r7: 2-cell probe + capped priority join
    "dedup_semdedup_nprobe_audit",  # r7: pair recall under dual policy
]


def _rows(spark, name: str) -> list[tuple]:
    df = registry.queries()[name](spark, SF_DIR)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SWEEP)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name}: result depends on shuffle partitioning"
