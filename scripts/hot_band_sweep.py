"""Adversarial HOT-BAND sweep (r8, VERDICT r7 task 5): the megacluster
edge fixture (12 identical docs) proves correctness; this script
measures THROUGHPUT when a single band bucket holds a planted
5,000-doc identical cluster on top of the sf0.1 corpus — the worst
realistic banding input (a boilerplate page, a license block, an
empty-template crawl artifact repeated across a mirror farm).

What it measures, per corpus (base sf0.1 vs planted):

- bucket occupancy (max occ, total buckets) from the operators' own
  `band_signatures` kernel;
- PAIRWISE candidate mass Σ occ·(occ-1)/2 — the cost law of the
  banded pair self-join (`dedup_minhash_banding_md5`), computed
  analytically from occupancy AND the join itself timed (~30 s for
  the planted 50M-pair row at this scale — the measured blowup);
- STAR edge mass Σ (occ-1) — the cost law of the hub plans
  (`dedup_minhash_star_links`, `dedup_fuzzy_star_rescore`,
  `dedup_fuzzy_star_components`);
- measured wall time of the pairwise form AND the star forms on both
  corpora — the "hot-bucket cap's measured effect" as runtime, not
  just algebra;
- the SemDeDup capped-cell flavor (`dedup_semantic_ivf_cells`) on an
  embeddings table with the same 5,000-identical-vector plant: the
  C=64 per-cell candidate cap is the explicit hot-cell bound, so its
  runtime must stay flat where an uncapped within-cell join would be
  25M pairs.

r9 (VERDICT r8 task 3): `dedup_minhash_banding_md5` now carries a
per-bucket occupancy cap (occ > 256 buckets skip pair enumeration),
so the sweep additionally reports the CAPPED pair mass (what the
guarded pairwise form actually enumerates) next to the raw mass, runs
the new `dedup_banding_occupancy_audit` pricing query on both
corpora, and counts planted-cluster edges recovered by the capped
pairwise form (expected 0 under the cap) vs the star form (expected
~N_PLANT hub edges) — the recall price and its named mitigation,
measured.

Writes HOTBAND_{round}.json (CLI arg, default r10 — the round-param
fix of ADVICE r9 applied here too); adjudication narrative in SCALE.md.

Usage: python scripts/hot_band_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
PLANT_ROOT = "/tmp/spark990_hotband"
_PLANT_VERSION = 1
N_PLANT = 5_000


def synthesize_planted(spark) -> str:
    """sf0.1 plus a planted identical cluster: 5,000 copies of one
    document's text under fresh doc_ids, and 5,000 copies of one
    embedding under fresh vec_ids. Every copy is byte-identical — the
    adversarial case for any bucket-keyed plan."""
    out = os.path.join(PLANT_ROOT, "planted")
    marker = os.path.join(out, f".complete_v{_PLANT_VERSION}")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    seed_doc = docs.orderBy("doc_id").limit(1)
    plant_docs = seed_doc.crossJoin(
        spark.range(N_PLANT).select(F.col("id").alias("_k"))
    ).select(
        (F.col("_k") + 50_000_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    docs.unionByName(plant_docs).repartition(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "documents.parquet"))
    seed_emb = embs.orderBy("vec_id").limit(1)
    plant_embs = seed_emb.crossJoin(
        spark.range(N_PLANT).select(F.col("id").alias("_k"))
    ).select(
        (F.col("_k") + 50_000_000).alias("vec_id"), "embedding", "label"
    )
    embs.unionByName(plant_embs).repartition(8).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


SWEEP_QUERIES = [
    "dedup_minhash_banding_md5",      # pairwise Σ occ² — now _occ-capped
    "dedup_banding_occupancy_audit",  # the cap's price, as data
    "dedup_minhash_star_links",       # Σ (occ-1) hub links
    "dedup_fuzzy_star_rescore",       # Σ (occ-1) hub rescores
    "dedup_fuzzy_star_components",    # star edges + O(log) components
    "dedup_semantic_ivf_cells",       # C=64 per-cell cap on embeddings
    "dedup_incremental_probe_audit",  # the daily-merge probe bound's price
]


def measure(spark, sf_dir: str) -> dict:
    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.operators.dedup import band_signatures
    from apache_spark_irs_form_990_spark.tables import load

    qs = registry.queries()
    out: dict = {"sf_dir": sf_dir}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out["n_docs"] = docs.count()
    # occupancy over the SAME corpus the banding query buckets —
    # documents ∪ the %5 near-dup injection — not docs alone: the
    # injected twins of planted docs raise real bucket occupancies,
    # and a docs-only occupancy would report a kept_pair_mass the
    # capped query does not actually enumerate (r9 self-review
    # finding)
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        ).alias("text"),
    )
    sig = band_signatures(docs.unionByName(near)).localCheckpoint()
    occ = sig.groupBy("band", "band_min").agg(F.count(F.lit(1)).alias("occ"))
    masses = occ.agg(
        F.sum(F.col("occ") * (F.col("occ") - 1) / 2).alias("pair_mass"),
        F.sum(F.col("occ") - 1).alias("star_mass"),
        F.max("occ").alias("max_occ"),
        F.count(F.lit(1)).alias("n_buckets"),
    ).collect()[0]
    out["pair_mass"] = int(masses.pair_mass)
    out["star_mass"] = int(masses.star_mass)
    out["max_bucket_occ"] = int(masses.max_occ)
    out["n_buckets"] = int(masses.n_buckets)
    from apache_spark_irs_form_990_spark.operators.dedup import _BAND_OCC_CAP
    capped = occ.filter(F.col("occ") <= _BAND_OCC_CAP).agg(
        F.sum(F.col("occ") * (F.col("occ") - 1) / 2).alias("m")
    ).collect()[0]
    out["occ_cap"] = _BAND_OCC_CAP
    out["kept_pair_mass"] = int(capped.m or 0)
    for name in SWEEP_QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[f"{name}_s"] = round(time.perf_counter() - t0, 3)
    # recall price + mitigation, measured (r9): candidate edges that
    # TOUCH the planted cluster (ids >= 50M), from the capped pairwise
    # form (expected 0 — every band bucket of an identical cluster is
    # hot) vs the star form (expected ~N_PLANT hub edges)
    planted_pred = (F.col("id_a") >= 50_000_000) | (
        F.col("id_b") >= 50_000_000
    )
    out["pairwise_planted_edges"] = (
        qs["dedup_minhash_banding_md5"](spark, sf_dir)
        .filter(planted_pred)
        .count()
    )
    out["star_planted_edges"] = (
        qs["dedup_minhash_star_links"](spark, sf_dir)
        .filter(
            (F.col("hub_id") >= 50_000_000)
            | (F.col("doc_id") >= 50_000_000)
        )
        .count()
    )
    # the registered probe audit's actual ROW on this corpus — on the
    # planted fixture its batch (the %5 drop-2 generation) contains
    # 1,000 copies of the megacluster text, so the row shows the
    # sdf<=cap bound ACTIVE (r9: n_hot_shingles > 0, kept << uncapped)
    out["incremental_probe_audit_row"] = (
        qs["dedup_incremental_probe_audit"](spark, sf_dir)
        .collect()[0]
        .asDict()
    )
    return out


def measure_incremental_hot_batch(spark, planted_dir: str) -> dict:
    """The incremental daily merge under a HOT BATCH (r9): standing
    state = the planted corpus (sf0.1 + the 5,000-doc identical
    cluster), batch = 200 MORE byte-identical copies of the planted
    text — the nightly/daily analogue of the banding megacluster.
    apply_batch's probe filters batch-present shingles to standing
    df <= cap BEFORE touching the posting index, so the cluster's
    shingles (df ~5k) pull ZERO postings rows instead of 5k rows
    EACH; this reports the kept vs counterfactual probe mass from the
    persisted df table, the merge wall time, and the recall price
    (batch copies of the megacluster text attach to no component —
    they exceed the cap, the same contract as the banding form)."""
    from apache_spark_irs_form_990_spark.operators.incremental import (
        _DF_CAP,
        _postings,
        apply_batch,
        scratch_state_dir,
        write_standing_state,
    )
    from apache_spark_irs_form_990_spark.tables import load

    out: dict = {}
    standing = load(spark, planted_dir, "documents").select("doc_id", "text")
    seed = standing.filter(F.col("doc_id") == 50_000_000).limit(1)
    batch = (
        seed.crossJoin(spark.range(200).select(F.col("id").alias("_k")))
        .select((F.col("_k") + 60_000_000).alias("doc_id"), "text")
        .localCheckpoint()
    )
    sdir = scratch_state_dir("hotbatch")
    t0 = time.perf_counter()
    write_standing_state(spark, standing, sdir)
    out["nightly_write_s"] = round(time.perf_counter() - t0, 3)
    # probe mass, kept vs counterfactual, from the persisted df table
    df_tbl = spark.read.parquet(os.path.join(sdir, "shingle_df"))
    bvocab = _postings(batch).select("shingle").distinct()
    mass = (
        df_tbl.join(bvocab, "shingle")
        .agg(
            F.sum("df").alias("uncapped"),
            F.sum(F.when(F.col("df") <= _DF_CAP, F.col("df"))).alias("kept"),
        )
        .collect()[0]
    )
    out["probe_rows_uncapped"] = int(mass.uncapped or 0)
    out["probe_rows_kept"] = int(mass.kept or 0)
    t0 = time.perf_counter()
    merged = apply_batch(spark, sdir, batch).localCheckpoint()
    out["daily_merge_s"] = round(time.perf_counter() - t0, 3)
    attached = (
        merged.filter(
            (F.col("id") >= 60_000_000) & (F.col("component") < 60_000_000)
        ).count()
    )
    out["batch_planted_attached"] = attached
    return out, sdir


def measure_incremental_hot_delete(spark, sdir: str) -> dict:
    """The TAKEDOWN under a megacluster (r10): delete 4,950 of the
    5,000 planted docs from the standing state. This is the delete
    path's adversarial extreme — the megacluster's whole vocabulary
    (df ≈ 5,001 >> cap) falls back UNDER the cap, so every surviving
    copy gains its shingles back, the affected set is the planted
    component's remnant, and the re-cluster must RESTORE the edges the
    cap had suppressed: the ~50 surviving copies (plus the seed
    original) coalesce into one genuine cluster that the pre-delete
    state deliberately kept as singletons. Bounds measured: the
    crossing probe is O(Σ df' ≤ cap) per crossing shingle, the
    re-cluster O(affected mass) — both flat in N_PLANT."""
    from apache_spark_irs_form_990_spark.operators.incremental import (
        _DF_CAP,
        apply_delete_batch,
        scratch_state_dir,
    )

    out: dict = {}
    deletes = spark.range(4950).select(
        (F.col("id") + 50_000_000).alias("doc_id")
    )
    s2 = scratch_state_dir("hotdelete")
    t0 = time.perf_counter()
    labels = apply_delete_batch(
        spark, sdir, deletes, out_state_dir=s2
    ).localCheckpoint()
    out["hot_delete_s"] = round(time.perf_counter() - t0, 3)
    df1 = spark.read.parquet(os.path.join(sdir, "shingle_df"))
    df2 = spark.read.parquet(os.path.join(s2, "shingle_df"))
    out["cap_crossing_shingles"] = (
        df1.filter(F.col("df") > _DF_CAP)
        .select("shingle")
        .join(df2.filter(F.col("df") <= _DF_CAP).select("shingle"), "shingle")
        .count()
    )
    # the restored cluster: component sizes over surviving planted ids
    surv = labels.filter(F.col("id") >= 50_000_000)
    out["surviving_planted_docs"] = surv.count()
    comp_of_planted = (
        surv.groupBy("component").agg(F.count("*").alias("n")).collect()
    )
    out["planted_components_after_delete"] = len(comp_of_planted)
    out["largest_planted_component"] = max(
        (r["n"] for r in comp_of_planted), default=0
    )
    return out


def main() -> None:
    from apache_spark_irs_form_990_spark.session import get_session

    rnd = sys.argv[1] if len(sys.argv) > 1 else "r10"
    spark = get_session(app_name="hot_band_sweep")
    planted = synthesize_planted(spark)
    rows = [measure(spark, BASE), measure(spark, planted)]
    result = {"n_planted": N_PLANT, "queries": SWEEP_QUERIES, "steps": rows}
    # write the expensive two-corpus sweep FIRST: a failure in the
    # appended incremental step must not discard minutes of completed
    # measurement (r9 self-review finding)
    path = os.path.join(REPO_ROOT, f"HOTBAND_{rnd}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    hot, sdir = measure_incremental_hot_batch(spark, planted)
    result["incremental_hot_batch"] = hot
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    # r10: the takedown twin, reusing the hot batch's standing state
    result["incremental_hot_delete"] = measure_incremental_hot_delete(
        spark, sdir
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
