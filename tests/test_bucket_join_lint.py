"""Bucket-join lint (SURVEY.md §4.2, r5): NO registered query may plan
a join keyed on an LSH bucket-like attribute (``bucket`` / ``band_min``
/ ``probe``) without an OCCUPANCY GUARD in the join subtree — a Filter
on ``_occ`` (hot-bucket cap / star split, `banded_lsh_pairs`) or
``_bucket_seq`` (capped per-bucket index sample, `_flat_index`).

Why: a self-join on a SMALL FIXED bucket space costs Sum over buckets
of occ_a*occ_b ~ n^2/|buckets| — the quadratic the r4 scale-step
measured on the flat 2^8-bucket index (multiprobe: 14.9x runtime for
10x vectors, SCALE_STEP_r04.json) and the r4/r5 caps fixed. This test
is the structural guard that keeps the fix stuck, the same role
tests/test_plan_lint.py plays for unpartitioned windows: a NEW LSH op
joining on an uncapped bucket fails CI here, in both directions (a new
violation fails; a stale whitelist entry fails).

Whitelist policy: a guardless bucket-keyed join is acceptable ONLY
when bucket occupancy is bounded by something other than an explicit
cap — a VALUE-KEYED bucket space (md5-chunk band minima / minhash
band hashes: the key space is 16^8+ per band, so occupancy tracks
true duplicate-CLUSTER size, adjudicated acceptable in SCALE.md §11
finding 2 because pair output is the declared result and
`dedup_minhash_star_links` is the registered megacluster path), or a
STAR topology (one hub row per bucket on the build side, so join
output is O(occ), never occ^2). Fixed small bucket spaces (2^planes
hyperplane signatures) are NOT bounded and never belong here.
"""

from __future__ import annotations

import pytest

from apache_spark_irs_form_990_spark import registry
from apache_spark_irs_form_990_spark.plans.inspect import (
    unguarded_bucket_joins,
)
from tests.conftest import SMOKE_SF_DIR

# query id -> why its guardless bucket-keyed join is bounded anyway
WHITELIST = {
    # --- value-keyed md5-chunk band minima: key space 16^8 per band;
    # occupancy == true near-dup cluster size; pairwise output is the
    # declared result (SCALE.md §11 finding 2); megacluster path is
    # dedup_minhash_star_links ---
    "dedup_minhash_banding_md5": "value-keyed (band, band_min), 16^8 keyspace",
    "dedup_fuzzy_cascade": "value-keyed (band, band_min); banded-DP rescore",
    "dedup_star_vs_pairwise_audit": "audit: value-keyed (band, band_min); sample at scale",
    "dedup_lsh_recall_audit": "value-keyed (band, band_min) on bounded slice",
    "dedup_minhash_jaccard_audit": "value-keyed (band, band_min), bounded slice",
    "pipeline_dedup_cascade": "value-keyed (band, band_min) on exact-dedup survivors",
    # --- asymmetric batch-probes-index: probe side is the (tiny)
    # incremental batch, so join output is |batch| * occ, not occ^2 ---
    "dedup_incremental_minhash": "asymmetric batch-probes-index join",
    # --- star topology: build side is one hub row per bucket ---
    "dedup_minhash_star_links": "hub join: one row per bucket on build side",
    "dedup_fuzzy_star_rescore": "hub join: one row per bucket on build side",
    # (dedup_fuzzy_star_components needs no entry: it returns the
    # CC loop's localCheckpoint'ed labels, whose truncated lineage
    # carries no bucket join — the hub-join guard is exercised inside
    # the edge derivation, covered by dedup_fuzzy_star_rescore's plan)
    # --- persisted capped index: the _bucket_seq cap ran in the BUILD
    # job before the parquet write, so the probe join's plan cannot
    # show the guard Filter; probe side is the tiny ~1% batch ---
    "sim_ann_index_persist_probe": "probes persisted capped index; asymmetric batch probe",
    # --- value-keyed minhash band hash (R concatenated minhashes):
    # keyspace is the full hash range, occupancy tracks cluster size ---
    "dedup_near_minhash": "value-keyed band-hash bucket, full hash-range keyspace",
}


def test_whitelist_entries_exist():
    names = set(registry.queries())
    stale = sorted(set(WHITELIST) - names)
    assert not stale, f"whitelist names not in registry: {stale}"


def test_no_unguarded_bucket_join(spark):
    """Walk every registered query's optimized plan; fail on any
    bucket-keyed join lacking an occupancy guard outside the
    documented whitelist — and on whitelist entries whose queries no
    longer plan such a join."""
    violations = {}
    unused_whitelist = set(WHITELIST)
    for name, fn in sorted(registry.queries().items()):
        try:
            hits = unguarded_bucket_joins(fn(spark, SMOKE_SF_DIR))
        except Exception as e:  # noqa: BLE001 — build errors are other tests' job
            pytest.fail(f"{name}: query build failed in lint: {e}")
        if not hits:
            continue
        if name in WHITELIST:
            unused_whitelist.discard(name)
            continue
        violations[name] = [h[:160] for h in hits]
    assert not violations, (
        "bucket-keyed join without occupancy guard (cap the bucket via "
        "the _occ / _bucket_seq patterns in operators/similarity.py, or "
        f"whitelist with a bounded-occupancy reason): {violations}"
    )
    assert not unused_whitelist, (
        "whitelist entries whose queries no longer plan a guardless "
        f"bucket join — remove them: {sorted(unused_whitelist)}"
    )
