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


def test_kernel_collects_are_guarded(spark):
    """The kernel-constant collects must FAIL LOUDLY on an over-bound
    input instead of silently pulling an unbounded frame onto the
    driver (r12, VERDICT r11 task 2): `_cosine_topk_pairs`' stored
    side, `_codebook_arrays`, and `_cent_arrays` each raise on
    more rows than their documented bound."""
    import pytest

    from apache_spark_irs_form_990_spark.operators.similarity import (
        _CODEBOOK_COLLECT_BOUND,
        _STORED_COLLECT_BOUND,
        _cent_arrays,
        _codebook_arrays,
        _cosine_topk_pairs,
    )

    over_stored = spark.range(_STORED_COLLECT_BOUND + 1).select(
        F.col("id").alias("nid"),
        F.array(F.lit(1).cast("long")).alias("vr"),
    )
    q = spark.range(1).select(
        F.col("id").alias("qid"),
        F.array(F.lit(1).cast("long")).alias("vq"),
    )
    with pytest.raises(ValueError, match="more than"):
        _cosine_topk_pairs(q, over_stored, k=1)

    over_cb = spark.range(_CODEBOOK_COLLECT_BOUND + 1).select(
        F.lit(0).alias("s"),
        F.col("id").cast("int").alias("cid"),
        F.array(F.lit(1).cast("long")).alias("c"),
    )
    with pytest.raises(ValueError, match="more than"):
        _codebook_arrays(over_cb)

    over_cents = spark.range(_CODEBOOK_COLLECT_BOUND + 1).select(
        F.col("id").alias("cid"),
        F.array(F.lit(1).cast("long")).alias("cv"),
    )
    with pytest.raises(ValueError, match="more than"):
        _cent_arrays(over_cents)


def test_cent_arrays_rejects_zero_norm(spark):
    """A zero-norm centroid would make every cosine against it NaN,
    which numpy ranks differently from Spark's ORDER BY DESC — the
    kernel refuses it instead of silently re-ranking (ADVICE r11)."""
    import pytest

    from apache_spark_irs_form_990_spark.operators.similarity import (
        _cent_arrays,
    )

    cents = spark.range(2).select(
        F.col("id").alias("cid"),
        F.array(F.lit(0).cast("long")).alias("cv"),
    )
    with pytest.raises(ValueError, match="zero-norm"):
        _cent_arrays(cents)


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
