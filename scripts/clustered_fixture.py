"""Clustered-embedding fixture study (VERDICT r9 task 5): every ANN /
PQ recall number committed so far is bounded by the near-isotropic
synthetic corpus (`embeddings.parquet` — the ceiling note named
inline since r8). Real embedding corpora are CLUSTERED, and PQ/IVF
recall is much higher on clustered data: quantization error is
measured against local structure the codebook can actually learn.

This script generates a mixture-of-Gaussians corpus with the SAME
schema and scale as synthetic sf1 (20k vectors, 64-d): 64 anisotropic
clusters (per-cluster, per-dimension spread in [0.05, 0.5] around
unit-normal centers — axis-aligned anisotropy, the regime PQ's
per-sub-space codebooks are built for), fixed seed, written once to
/tmp. It then re-runs the PQ code-budget study (`measure_pq_budget` —
the identical train→encode→ADC→re-rank chain, same helpers, same
integer metric, K=64 and K=256) plus the registered IVF and PQ
serving-contract queries on it, and writes PQ_CLUSTERED_{round}.json
next to SCALE_STEP's isotropic numbers.

Usage: python scripts/clustered_fixture.py [round]   (default r10)
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

OUT_DIR = "/tmp/spark990_clustered"
_VERSION = 1  # bump when the generator changes (reuse-marker contract)
N_VECS = 20_000
N_CLUSTERS = 64
DIM = 64
SEED = 990


def synthesize() -> str:
    """Write the clustered corpus once (reuse-marker guarded, same
    protocol as scale_step's synthetic decades)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    marker = os.path.join(OUT_DIR, f".complete_v{_VERSION}")
    if os.path.exists(marker):
        return OUT_DIR
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0.0, 1.0, (N_CLUSTERS, DIM))
    spreads = rng.uniform(0.05, 0.5, (N_CLUSTERS, DIM))  # anisotropic
    assign = rng.integers(0, N_CLUSTERS, N_VECS)
    x = centers[assign] + rng.normal(0.0, 1.0, (N_VECS, DIM)) * spreads[assign]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), type=pa.int64()),
            "embedding": pa.array(
                x.astype("float32").tolist(),
                type=pa.list_(pa.float32()),
            ),
            # label = true cluster id: lets the per-label serving
            # queries group meaningfully on this corpus too
            "label": pa.array(assign.astype("int32"), type=pa.int32()),
        }
    )
    papq.write_table(tbl, os.path.join(OUT_DIR, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return OUT_DIR


def cluster_precision(spark, fdir: str) -> dict:
    """The DIAGNOSIS metric for clustered corpora: top-k OVERLAP with
    the exact list is a tie-breaking contest when ~312 co-cluster
    members are near-equidistant (the gap between exact rank 10 and
    rank 50 is tiny), so also measure what semantic dedup actually
    needs — does the served top-10 land in the query's TRUE cluster?
    Reported for the exact list (the yardstick: even it is not 100%
    where clusters overlap) and the K=256 re-ranked PQ serving tier,
    plus the agreement of per-list cluster-hit counts."""
    from pyspark.sql import functions as F

    from apache_spark_irs_form_990_spark.functions.vectors import (
        milli_vec,
        nonzero_milli,
    )
    from apache_spark_irs_form_990_spark.operators.similarity import (
        _PQ_RERANK_CAND,
        _PQ_ROUNDS,
        _cosine_topk_pairs,
        _pq_recon_vectors,
        _pq_train,
    )
    from apache_spark_irs_form_990_spark.tables import load

    emb = load(spark, fdir, "embeddings")
    mm = (
        emb.select("vec_id", milli_vec(F.col("embedding")).alias("v"))
        .transform(nonzero_milli)
        .localCheckpoint()
    )
    train = mm.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id").limit(
        2000
    ).localCheckpoint()
    queries = (
        mm.orderBy(
            F.md5(F.concat(F.lit("q|"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(1000)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("vq"))
        .localCheckpoint()
    )
    stored = mm.select(F.col("vec_id").alias("nid"), F.col("v").alias("vr"))
    exact_top = _cosine_topk_pairs(queries, stored, 10).localCheckpoint()
    cb = _pq_train(spark, train, _PQ_ROUNDS, k=256)
    recon = _pq_recon_vectors(mm, cb).select(
        F.col("vec_id").alias("nid"), F.col("r").alias("vr")
    )
    adc_rank = _cosine_topk_pairs(queries, recon, _PQ_RERANK_CAND)
    rr_top = _cosine_topk_pairs(
        queries, stored, 10, pairs=adc_rank.select("qid", "nid")
    ).localCheckpoint()

    labels = emb.select("vec_id", "label")
    ql = labels.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("q_label")
    )
    nl = labels.select(
        F.col("vec_id").alias("nid"), F.col("label").alias("n_label")
    )
    out = {}
    for name, top in (("exact_top10", exact_top), ("pq_reranked_top10", rr_top)):
        hit = (
            top.join(F.broadcast(ql), "qid")
            .join(F.broadcast(nl), "nid")
            .agg(
                F.avg(
                    (F.col("q_label") == F.col("n_label")).cast("double")
                ).alias("p")
            )
            .collect()[0]["p"]
        )
        out[name] = round(float(hit), 4)
    return out


def main() -> None:
    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.session import get_session
    from scripts.scale_step import measure_pq_budget

    rnd = sys.argv[1] if len(sys.argv) > 1 else "r10"
    spark = get_session(app_name="clustered_fixture")
    fdir = synthesize()

    result: dict = {
        "fixture": {
            "n_vecs": N_VECS,
            "n_clusters": N_CLUSTERS,
            "dim": DIM,
            "seed": SEED,
            "spread_range": [0.05, 0.5],
            "note": (
                "mixture of 64 axis-aligned anisotropic Gaussians; the "
                "corpus-shaped counterpart of the near-isotropic default "
                "fixture — compare against SCALE_STEP pq_budget_sf1"
            ),
        }
    }
    # the identical K=64 / K=256 train->encode->ADC->re-rank chain the
    # isotropic sf1 study runs (shared helpers, shared integer metric),
    # r11: plus the shortlist-width curve at K=256 (VERDICT r10 task 5
    # — the committed r10 gap was re-ranked recall@10 = 0.55 at width
    # 50; the curve prices what a wider constant-per-query shortlist
    # buys before reaching for OPQ)
    result["pq_budget_clustered"] = measure_pq_budget(
        spark, fdir, rerank_curve=(50, 100, 200, 400)
    )

    qs = registry.queries()
    for name in ("sim_pq_recall_at_k", "sim_ivf_recall_audit"):
        try:
            rows = qs[name](spark, fdir).collect()
            result[name] = [r.asDict() for r in rows]
        except Exception as exc:  # noqa: BLE001
            result[name] = f"error: {exc}"[:300]

    result["cluster_precision"] = cluster_precision(spark, fdir)

    path = os.path.join(REPO_ROOT, f"PQ_CLUSTERED_{rnd}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1, default=str)
    print(json.dumps(result, indent=1, default=str))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
