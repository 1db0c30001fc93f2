"""Semantic contracts for the r7 trained-PQ and SemDeDup-nprobe2
additions — properties the oracle differential cannot see because both
engines would agree even if the contract broke:

- Lloyd training SSE is monotone non-increasing across rounds and the
  trained total SSE strictly beats the anchor codebook's.
- The trained codebook's top-1 ADC agreement is at least the untrained
  audit's (the whole point of training).
- nprobe=2 drop decisions are a strict superset of nprobe=1 decisions
  (same-cell pairs reduce to the identical rank order), and pair
  recall never exceeds the threshold ceiling.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from apache_spark_irs_form_990_spark import registry
from tests.conftest import SF_DIR

QUERIES = registry.queries()


def test_pq_training_sse_monotone(spark):
    rows = sorted(
        QUERIES["sim_pq_train_loop_audit"](spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    sses = [r.sse for r in rows]
    assert len(sses) >= 3
    assert all(a >= b for a, b in zip(sses, sses[1:])), sses
    assert sses[-1] < sses[0], "training did not improve SSE at all"


def test_pq_trained_beats_untrained(spark):
    trained = QUERIES["sim_pq_trained_adc_audit"](spark, SF_DIR).collect()[0]
    untrained = QUERIES["sim_pq_adc_recall_audit"](spark, SF_DIR).collect()[0]
    assert trained.total_sse < untrained.total_sse
    assert trained.pq_nn_match >= untrained.pq_nn_match, (
        trained.pq_nn_match,
        untrained.pq_nn_match,
    )


def test_semdedup_nprobe2_superset_and_ceiling(spark):
    audit = QUERIES["dedup_semdedup_nprobe_audit"](spark, SF_DIR).collect()[0]
    assert audit.n1_pairs_recovered <= audit.n2_pairs_recovered
    assert audit.n2_pairs_recovered <= audit.n_pairs_above_tau
    assert audit.n_pairs_above_tau <= audit.n_planted_pairs
    # the knob must actually buy recall on this fixture
    assert audit.n2_pairs_recovered > audit.n1_pairs_recovered


def test_semdedup_nprobe2_drops_superset(spark):
    """Cell-level check: nprobe=2 never drops fewer vectors in any
    cell than the single-cell form (its drop predicate strictly
    extends the nprobe=1 predicate)."""
    n1 = {
        r.cell: r.n_dropped
        for r in QUERIES["dedup_semantic_ivf_cells"](spark, SF_DIR).collect()
    }
    n2 = {
        r.cell: r.n_dropped
        for r in QUERIES["dedup_semantic_ivf_nprobe2"](
            spark, SF_DIR
        ).collect()
    }
    assert set(n1) == set(n2)
    for cell, d1 in n1.items():
        assert n2[cell] >= d1, (cell, d1, n2[cell])
