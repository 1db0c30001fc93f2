"""Scale-step study (VERDICT r3 task 5, extended r5): run the
dedup/ANN family AND the global_order-rewired queries at sf0.01 /
sf0.1 / synthetic-sf1 and record CANDIDATE-PAIR counts and max-task
input sizes next to runtimes — the empirical check that candidate
generation and distributed ranking grow ~linearly in corpus size,
which no fixed-SF oracle can show.

No sf1 testdata exists, so sf1 is synthesized at 10x sf0.1 into
/tmp/spark990_scale/sf1 (testdata itself is read-only): 10 deterministic
copies of documents/embeddings/orders with content MUTATED per copy —
every 7th word gets a copy-suffix (so copies are near- but not exact
duplicates: shingle overlap ~0.5, the realistic near-dup regime),
embeddings rotate by the copy index (different hyperplane projections,
so LSH buckets spread instead of stacking 10 exact clones per bucket,
which would fake quadratic growth that no natural corpus has), and
orders shift both keys (10x the customer population for the RFM
rankings). The on-disk reuse marker carries _SYNTH_VERSION so a
generator change can never silently re-measure stale data (ADVICE r4).

r5 additions:
- `sim_cosine_ann_lsh` + flat-LSH candidate counts: the r4 verdict's
  two uncapped 256-bucket self-joins are now capped via the
  md5-sampled per-bucket index (`_flat_index`); this sweep is the
  "done" evidence that both consumers grow ~linearly post-cap
  (multiprobe was 14.9x runtime for 10x vectors pre-cap).
- Four `global_order` rewires (`text_pack_bins`, `beh_rfm_segments`,
  `pipeline_epoch_shuffle`, `ml_rank_biased_overlap` — the last runs
  TWO full-corpus orders): runtime at each step plus the
  max-task-rows profile of the distributed rank itself, vs the
  whitelisted single-task form whose one window task holds ALL rows.

r6 additions (VERDICT r5 tasks 1, 2):
- `dedup_fuzzy_star_rescore` next to `dedup_fuzzy_cascade`: the
  megacluster-safe hub-rescored cascade vs the pairwise one whose r5
  sweep hit 50.8 s at sf1 — the "done" evidence for the r5 verdict's
  one weak item is this pair of rows.
- The CLUSTERING family (`dedup_semantic_cluster`,
  `dedup_cluster_components`, `dedup_cluster_size_histogram`,
  `graph_kcore_peel`): runtimes per step PLUS the iterative loop's own
  growth axes measured with the operators' kernels — symmetrized edge
  counts and connected-components rounds-to-converge (rounds x edges
  bounds total loop cost; diameter growth is a distinct risk from edge
  growth). lineitem is now synthesized at sf1 (all keys shifted per
  copy => 10 disjoint subgraph copies) for the kcore rows.
- `sim_ann_index_persist_probe`: the persisted-index round trip next
  to the in-query `sim_ann_batch_query` form.
- The three late-r6 ops: `dedup_semantic_ivf_cells` (|corpus| x C
  capped cell join — expected ~linear), `dedup_substring_coverage`
  (no pair join at all — expected ~linear in tokens), and
  `sample_weighted_reservoir` (map-side mint + TakeOrdered — expected
  near-flat).

r7 additions (VERDICT r6 task 5): the PQ/IVFPQ family
(`sim_cosine_ann_ivfpq`, `sim_pq_adc_recall_audit`,
`sim_pq_trained_adc_audit`) — the broadcast codebook crossjoin is the
one assign step whose cost grows with K x n and should be measured
like everything else (the trained variant adds 6 such sweeps) — and
`dedup_semantic_ivf_nprobe2` (2x the probe fan-out of the single-cell
SemDeDup row, expected to track it at ~2x or better).

r8 additions (VERDICT r7 tasks 1+3): `dedup_cluster_components_star`
(the diameter-independent kernel) and `sim_pq_recall_at_k` join the
3-step sweep; both CC kernels' round counts are profiled side by side
(min-label refusal recorded as rounds=-1 rather than aborting the
sweep); and the AT-SCALE query subset gets a FOURTH synthetic decade —
sf10 = 500k docs / 200k vecs, 10 second-level mutated copies of sf1 —
to confirm the sf0.01→sf1 linearity claims for another 10x and to
surface CC round growth (`measure_at_scale`, single-run protocol).

r9 additions (VERDICT r8 tasks 1+3+4): the sf10 at-scale step now
uses the SAME warm best-of-2 protocol as the three lower decades
(task 4 — r8's single-run/cold-cache step made the fourth decade's
ratios not like-for-like; SCALE.md §15.2 documented a 3.4x cold/warm
gap for dedup_substring_coverage); `dedup_incremental_persisted`
joins the at-scale subset with its NIGHTLY WRITE and DAILY MERGE
timed separately (the persisted split exists precisely so the daily
job stops replaying phase 1 — the split timing is the evidence); and
`dedup_banding_occupancy_audit` (the hot-bucket cap pricing row)
joins both subsets.

r10 additions (VERDICT r9 task 6 + ADVICE r9):
- the output filename is parameterized by round (CLI arg, default
  ROUND below) so a rerun can never clobber a committed prior-round
  artifact whose "queries" list is declared ground truth;
- every timed query row now carries MEMORY POSTURE next to runtime:
  executor peak execution memory, memory+disk spill bytes, and
  shuffle write bytes for the measured run, read from the Spark
  status REST API (stage-diff attribution) — a 100 TB judgment needs
  "does it spill" as data, not narrative;
- the delete path joins the at-scale split timing: nightly write →
  daily delete batch (`apply_delete_batch`), the takedown twin of the
  r9 nightly/daily asymmetry measurement.

Usage: python scripts/scale_step.py [round]   (writes SCALE_STEP_{round}.json, default r10)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

SCALE_ROOT = "/tmp/spark990_scale"
ROUND = "r10"  # default output tag; override via CLI arg (ADVICE r9)
_SYNTH_VERSION = 3  # bump when synthesize_sf1's generated content changes


class StageMetrics:
    """Per-query memory posture from the Spark status REST API
    (VERDICT r9 task 6): snapshot completed stage ids before a run,
    then attribute every NEW completed stage to it — peak execution
    memory (max across stages), memory+disk spill bytes and shuffle
    write bytes (sums). Degrades to empty dicts when the UI is off."""

    def __init__(self, spark) -> None:
        self.base = None
        try:
            sc = spark.sparkContext
            ui = sc.uiWebUrl
            if ui:
                self.base = f"{ui}/api/v1/applications/{sc.applicationId}"
        except Exception:
            pass

    def _stages(self) -> list:
        import urllib.request

        with urllib.request.urlopen(
            f"{self.base}/stages?status=complete", timeout=15
        ) as r:
            return json.load(r)

    def snapshot(self) -> set:
        if not self.base:
            return set()
        try:
            return {
                (s["stageId"], s.get("attemptId", 0)) for s in self._stages()
            }
        except Exception:
            return set()

    def since(self, before: set) -> dict:
        if not self.base:
            return {}
        try:
            new = [
                s
                for s in self._stages()
                if (s["stageId"], s.get("attemptId", 0)) not in before
            ]
        except Exception:
            return {}
        if not new:
            return {}
        return {
            "peak_mem": max(
                int(s.get("peakExecutionMemory", 0)) for s in new
            ),
            "spill_bytes": sum(
                int(s.get("memoryBytesSpilled", 0))
                + int(s.get("diskBytesSpilled", 0))
                for s in new
            ),
            "shuffle_write_bytes": sum(
                int(s.get("shuffleWriteBytes", 0)) for s in new
            ),
        }
QUERIES = [
    "dedup_minhash_banding_md5",
    "dedup_near_embedding",
    "sim_cosine_ann_lsh",
    "sim_ann_lsh_multiprobe",
    "sim_ann_batch_query",
    "pipeline_dedup_cascade",
    "dedup_fuzzy_cascade",
    "dedup_fuzzy_star_rescore",
    "sim_ann_index_persist_probe",
    "dedup_semantic_cluster",
    "dedup_cluster_components",
    "dedup_cluster_size_histogram",
    "graph_kcore_peel",
    "text_pack_bins",
    "beh_rfm_segments",
    "pipeline_epoch_shuffle",
    "ml_rank_biased_overlap",
    "dedup_semantic_ivf_cells",
    "dedup_substring_coverage",
    "sample_weighted_reservoir",
    "mm_clip_score_filter",
    "pipeline_dsir_weights",
    "dedup_bloom_prefilter_audit",
    # r7: the PQ/IVFPQ family (the crossjoin-with-codebook assign step
    # grows with K x n and gets measured like everything else) and the
    # SemDeDup soft-assignment pair
    "sim_cosine_ann_ivfpq",
    "sim_pq_adc_recall_audit",
    "sim_pq_trained_adc_audit",
    "dedup_semantic_ivf_nprobe2",
    # r8: the diameter-independent CC twin, the PQ serving contract +
    # its ADC+R re-rank closer, and incremental cluster maintenance
    "dedup_cluster_components_star",
    "sim_pq_recall_at_k",
    "sim_pq_reranked_recall_audit",
    "dedup_cluster_components_incremental",
    # r9: the hot-bucket cap pricing audit — linear by construction,
    # measured to prove it
    "dedup_banding_occupancy_audit",
    # enrolled AFTER SCALE_STEP_r09.json was recorded (its "queries"
    # list is the ground truth for that artifact) — first measured in
    # the r10 refresh: the daily-merge probe-bound pricing audit and
    # the production-code-budget PQ chain
    "dedup_incremental_probe_audit",
    "sim_pq_code_budget_audit",
]

# r8 (VERDICT r7 task 3): the queries whose docstrings claim an
# AT-SCALE (100 TB) plan get a THIRD synthetic decade — sf10 = 500k
# docs / 200k vecs — to confirm the linearity claims measured over
# sf0.01→sf1 hold for another 10x, and to surface CC round growth.
# The pairwise pair-list form (dedup_fuzzy_cascade) is deliberately
# absent: it is documented sample-scale-only and its sf1 row already
# costs 65 s.
AT_SCALE_QUERIES = [
    "dedup_minhash_banding_md5",
    "dedup_fuzzy_star_rescore",
    "dedup_substring_coverage",
    "dedup_semantic_ivf_cells",
    "dedup_semantic_ivf_nprobe2",
    "dedup_cluster_components",
    "dedup_cluster_components_star",
    "dedup_cluster_components_incremental",
    "sim_ann_batch_query",
    # r9: the occupancy-cap pricing audit. dedup_incremental_persisted
    # is deliberately NOT here: each registered-query call writes a
    # fresh sf10-sized standing state, so warm best-of-2 would time a
    # repeated state RE-WRITE (and stack ~3 posting-index copies in
    # /tmp) — the nightly-write / daily-merge split below is its
    # correct at-scale measurement (r9 self-review finding)
    "dedup_banding_occupancy_audit",
]


def synthesize_sf1(spark, base: str = "/root/testdata/sf0.1", copies: int = 10) -> str:
    out = os.path.join(SCALE_ROOT, "sf1")
    marker = os.path.join(out, f".complete_v{_SYNTH_VERSION}")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    orders = spark.read.parquet(os.path.join(base, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(base, "lineitem.parquet"))

    doc_parts, emb_parts, ord_parts, li_parts = [], [], [], []
    for k in range(copies):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            ord_parts.append(orders)
            li_parts.append(lineitem)
            continue
        def mutate(kk: int):
            return lambda w, i: F.when(
                i % 7 == kk % 7, F.concat(w, F.lit(f"_{kk}"))
            ).otherwise(w)

        words = F.split("text", " ")
        mutated = F.array_join(F.transform(words, mutate(k)), " ")
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                mutated.alias("text"),
                "lang",
                "source",
                F.length(mutated).alias("n_chars"),
            )
        )
        rot = F.concat(
            F.slice("embedding", k + 1, 64 - k), F.slice("embedding", 1, k)
        )
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
        ord_parts.append(
            orders.select(
                (F.col("o_orderkey") + k * 100_000_000).alias("o_orderkey"),
                (F.col("o_custkey") + k * 10_000_000).alias("o_custkey"),
                *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
            )
        )
        # every key shifted => each copy is a DISJOINT co-purchase
        # subgraph: edges grow exactly 10x, component structure per
        # copy unchanged — the clean per-copy scaling for graph rows
        li_parts.append(
            lineitem.select(
                (F.col("l_orderkey") + k * 100_000_000).alias("l_orderkey"),
                (F.col("l_partkey") + k * 10_000_000).alias("l_partkey"),
                (F.col("l_suppkey") + k * 10_000_000).alias("l_suppkey"),
                *[
                    c
                    for c in lineitem.columns
                    if c not in ("l_orderkey", "l_partkey", "l_suppkey")
                ],
            )
        )

    def union_write(parts, name):
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d.repartition(8).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )

    union_write(doc_parts, "documents")
    union_write(emb_parts, "embeddings")
    union_write(ord_parts, "orders")
    union_write(li_parts, "lineitem")
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def synthesize_sf10(spark, copies: int = 10) -> str:
    """sf10 = 10 second-level copies of synthetic sf1 (500k docs /
    200k vecs), documents + embeddings only (the at-scale subset reads
    nothing else). Second-level mutation lands on DIFFERENT positions
    than level 1 (every 11th word vs every 7th, suffix `_x{k}`), and
    embeddings rotate by 7k % 64 — so copies are near- but not exact
    duplicates at both levels, the crawl-mirror regime."""
    base = synthesize_sf1(spark)
    out = os.path.join(SCALE_ROOT, "sf10")
    marker = os.path.join(out, f".complete_v{_SYNTH_VERSION}")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    doc_parts, emb_parts = [docs], [embs]
    def mutate2(kk: int):
        return lambda w, i: F.when(
            i % 11 == kk % 11, F.concat(w, F.lit(f"_x{kk}"))
        ).otherwise(w)

    for k in range(1, copies):
        words = F.split("text", " ")
        mutated = F.array_join(F.transform(words, mutate2(k)), " ")
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + k * 1_000_000_000).alias("doc_id"),
                mutated.alias("text"),
                "lang",
                "source",
                F.length(mutated).alias("n_chars"),
            )
        )
        r = (7 * k) % 64
        rot = F.concat(
            F.slice("embedding", r + 1, 64 - r), F.slice("embedding", 1, r)
        )
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + k * 1_000_000_000).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )

    def union_write(parts, name):
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )

    union_write(doc_parts, "documents")
    union_write(emb_parts, "embeddings")
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def measure_at_scale(spark, sf_dir: str) -> dict:
    """The sf10 step, on the SAME warm best-of-2 protocol as the three
    lower decades (r9, VERDICT r8 task 4 — r8 ran this single-run and
    had to document a 24.2 s-cold vs 7.1 s-warm gap for
    dedup_substring_coverage; uniform protocol makes the fourth
    decade's ratios like-for-like), plus the banding occupancy masses
    and both CC kernels' round counts — the growth axes the linearity
    claims ride on — and the persisted-incremental nightly-write /
    daily-merge split timing."""
    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.operators.dedup import band_signatures
    from apache_spark_irs_form_990_spark.tables import load

    qs = registry.queries()
    out: dict = {"sf_dir": sf_dir, "protocol": "warm_best_of_2"}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out["n_docs"] = docs.count()
    out["n_vecs"] = load(spark, sf_dir, "embeddings").count()
    # candidate/star masses analytically from bucket occupancy — the
    # pairwise join's Σ occ·(occ-1)/2 without materializing it.
    # Occupancy is taken over the same corpus the banding query
    # buckets (documents ∪ the %5 near-dup injection), not docs alone
    # (r9 self-review finding, same fix as scripts/hot_band_sweep.py)
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
    ).collect()[0]
    out["minhash_pair_mass"] = int(masses.pair_mass)
    out["minhash_star_mass"] = int(masses.star_mass)
    out["minhash_max_bucket_occ"] = int(masses.max_occ)
    out.update(clustering_profile(spark, sf_dir, semantic=False))
    met = StageMetrics(spark)
    for name in AT_SCALE_QUERIES:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            best = float("inf")
            before = set()
            for i in range(2):
                if i == 1:
                    before = met.snapshot()  # attribute the last run only
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
        except RuntimeError as exc:
            # a min-label budget refusal is a DATA POINT at this scale
            # (clustering_profile records it as rounds=-1); don't let
            # it abort the multi-minute sweep and lose the JSON
            out[f"{name}_s"] = None
            out[f"{name}_note"] = f"refused: {exc}"[:200]
            continue
        out[f"{name}_s"] = round(best, 3)
        for k, v in met.since(before).items():
            out[f"{name}_{k}"] = v
    # r9: the persisted-incremental split — the whole point of the
    # persisted form is that the DAILY job stops replaying phase 1,
    # so time the nightly write and the daily merge separately
    # (single-run: each phase mutates/creates its own state dir, so
    # best-of-2 would re-measure a re-write, not the same work)
    from apache_spark_irs_form_990_spark.operators.incremental import (
        apply_batch,
        apply_delete_batch,
        fixture_base_batch,
        fixture_delete_set,
        scratch_state_dir,
        write_standing_state,
    )

    base, batch = fixture_base_batch(spark, sf_dir)
    sdir = scratch_state_dir("scale10")
    t0 = time.perf_counter()
    write_standing_state(spark, base, sdir)
    out["incremental_nightly_write_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    apply_batch(spark, sdir, batch).write.format("noop").mode(
        "overwrite"
    ).save()
    out["incremental_daily_merge_s"] = round(time.perf_counter() - t0, 3)
    # r10: the takedown twin of the nightly/daily asymmetry — one
    # delete batch against the same standing state (state untouched:
    # no out_state_dir), its cost dominated by the one column-pruned
    # anti-join index scan the docstring names as the honest floor
    t0 = time.perf_counter()
    apply_delete_batch(spark, sdir, fixture_delete_set(base)).write.format(
        "noop"
    ).mode("overwrite").save()
    out["incremental_delete_batch_s"] = round(time.perf_counter() - t0, 3)
    return out


def measure_pq_budget(spark, sf1_dir: str, rerank_curve=()) -> dict:
    """PQ code budget AT SF1 (r9, the sf1 half of VERDICT r8 task 2):
    the registered [[sim_pq_code_budget_audit]] commits K=64 on a
    1000-vector slice — but sf0.1 only HAS 2000 vectors, so the
    'production budget on a production corpus' claim needs the
    synthetic-sf1 decade (20k vectors). This runs the identical
    train -> encode -> ADC -> re-rank chain (same helpers, same
    integer metric) the PRODUCTION way: codebooks trained on an
    md5-sampled 2000-vector slice, the FULL 20k-vector corpus
    encoded and served, 1000 md5-sampled queries, at K=64 AND K=256
    (8-bit codes — the Jégou et al. standard setting the committed
    ceiling note could previously only cite). Exact truth = one
    brute-force pass shared by both budgets. Single-run timing (the
    recall numbers, not the wall clock, are the deliverable)."""
    from apache_spark_irs_form_990_spark.functions.vectors import (
        milli_vec,
        nonzero_milli,
    )
    from apache_spark_irs_form_990_spark.operators.similarity import (
        _PQ_RECALL_K,
        _PQ_RERANK_CAND,
        _PQ_ROUNDS,
        _cosine_topk_pairs,
        _pq_recon_vectors,
        _pq_train,
        _recall_vs_exact_table,
    )
    from apache_spark_irs_form_990_spark.tables import load

    N_TRAIN, N_Q = 2000, 1000
    mm = (
        load(spark, sf1_dir, "embeddings")
        .select("vec_id", milli_vec(F.col("embedding")).alias("v"))
        .transform(nonzero_milli)
        .localCheckpoint()
    )
    md5 = F.md5(F.col("vec_id").cast("string"))
    train = mm.orderBy(md5, "vec_id").limit(N_TRAIN).localCheckpoint()
    queries = (
        mm.orderBy(F.md5(F.concat(F.lit("q|"), F.col("vec_id").cast("string"))), "vec_id")
        .limit(N_Q)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("vq"))
        .localCheckpoint()
    )
    stored = mm.select(F.col("vec_id").alias("nid"), F.col("v").alias("vr"))
    out: dict = {
        "sf_dir": sf1_dir,
        "n_corpus": mm.count(),
        "n_train": N_TRAIN,
        "n_q": N_Q,
        "rounds": _PQ_ROUNDS,
        "rerank_cand": _PQ_RERANK_CAND,
    }
    t0 = time.perf_counter()
    exact_top = _cosine_topk_pairs(queries, stored, _PQ_RECALL_K).localCheckpoint()
    out["exact_truth_s"] = round(time.perf_counter() - t0, 3)
    for k_budget in (64, 256):
        t0 = time.perf_counter()
        cb = _pq_train(spark, train, _PQ_ROUNDS, k=k_budget)
        out[f"k{k_budget}_train_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        recon = _pq_recon_vectors(mm, cb).select(
            F.col("vec_id").alias("nid"), F.col("r").alias("vr")
        )
        adc_rank = _cosine_topk_pairs(
            queries, recon, _PQ_RERANK_CAND
        ).localCheckpoint()
        out[f"k{k_budget}_encode_serve_s"] = round(time.perf_counter() - t0, 3)
        raw_top = adc_rank.filter(F.col("rn") <= _PQ_RECALL_K).withColumn(
            "variant", F.lit("adc")
        )
        rr_top = _cosine_topk_pairs(
            queries, stored, _PQ_RECALL_K, pairs=adc_rank.select("qid", "nid")
        ).withColumn("variant", F.lit("reranked"))
        table = _recall_vs_exact_table(
            spark,
            exact_top,
            raw_top.unionByName(rr_top),
            ks=(1, _PQ_RECALL_K),
            variant_col="variant",
            variant_values=("adc", "reranked"),
        )
        for row in table.collect():
            out[f"k{k_budget}_{row['variant']}_recall_at_{row['k']}"] = float(
                row["recall"]
            )
        # r11 (VERDICT r10 task 5): the SHORTLIST-WIDTH curve — how
        # much re-ranked recall a wider ADC shortlist buys at the SAME
        # code budget. One ADC ranking at the widest width, then each
        # narrower width is a prefix filter (rn <= w) re-ranked
        # against the stored vectors; still constant work per query.
        if rerank_curve and k_budget == 256:
            wide = _cosine_topk_pairs(
                queries, recon, max(rerank_curve)
            ).localCheckpoint()
            for w in sorted(rerank_curve):
                rr_w = _cosine_topk_pairs(
                    queries,
                    stored,
                    _PQ_RECALL_K,
                    pairs=wide.filter(F.col("rn") <= w).select("qid", "nid"),
                ).withColumn("variant", F.lit("rr"))
                t_w = _recall_vs_exact_table(
                    spark,
                    exact_top,
                    rr_w,
                    ks=(1, _PQ_RECALL_K),
                    variant_col="variant",
                    variant_values=("rr",),
                )
                for row in t_w.collect():
                    out[
                        f"k{k_budget}_rerank_w{w}_recall_at_{row['k']}"
                    ] = float(row["recall"])
    return out


def global_order_task_profile(spark, sf_dir: str) -> dict:
    """Max-task input rows of the distributed rank vs the single-task
    form, on the heaviest rewired input shape (documents ordered by
    the epoch-shuffle md5 key — `pipeline_epoch_shuffle`'s order).
    The distributed form's window stage holds max-per-range-partition
    rows per task; the whitelisted single-task form would hold ALL
    rows in ONE task. Near-flat max_task_rows / total across SF steps
    is the claim the r4 rewires shipped on — this measures it."""
    from apache_spark_irs_form_990_spark.functions.ranks import (
        _resolve_partitions,
    )
    from apache_spark_irs_form_990_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("epoch7|"), F.col("doc_id").cast("string")))
    n = _resolve_partitions(spark, None)
    parted = (
        docs.select("doc_id", key.alias("_ekey"))
        .repartitionByRange(n, "_ekey", "doc_id")
        .withColumn("_gpid", F.spark_partition_id())
    )
    prof = (
        parted.groupBy("_gpid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .agg(
            F.max("rows").alias("max_task_rows"),
            F.sum("rows").alias("total_rows"),
            F.count(F.lit(1)).alias("n_tasks"),
        )
        .collect()[0]
    )
    return {
        "global_order_max_task_rows": int(prof.max_task_rows),
        "global_order_total_rows": int(prof.total_rows),
        "global_order_n_tasks": int(prof.n_tasks),
        "single_task_form_rows": int(prof.total_rows),
    }


def clustering_profile(spark, sf_dir: str, semantic: bool = True) -> dict:
    """Edge counts and CC rounds-to-converge for the two
    connected-components consumers, measured with the operators' OWN
    kernels (instrumented via connected_components' stats hook), plus
    the kcore co-purchase edge count — the growth axes of the last
    heavy family with no committed scale measurement (VERDICT r5
    task 2). Rounds x edges bounds the loop's total join work; rounds
    track graph DIAMETER, which can grow even when edges grow
    linearly (truncation-chain clusters are paths, not cliques)."""
    from apache_spark_irs_form_990_spark.operators.components import (
        _doc_jaccard_edges,
        _semantic_corpus,
        _semantic_edges,
        _three_gen_corpus,
        connected_components,
        connected_components_star,
    )

    out: dict = {}
    corpus = _three_gen_corpus(spark, sf_dir)
    st: dict = {}
    try:
        connected_components(
            corpus.select(F.col("doc_id").alias("id")),
            _doc_jaccard_edges(corpus),
            stats=st,
        ).write.format("noop").mode("overwrite").save()
        out["cc_doc_rounds"] = st["rounds"]
    except RuntimeError:
        # the min-label budget refusal IS a data point at high SF —
        # the star twin below is the plan that must absorb it
        out["cc_doc_rounds"] = -1
    out["cc_doc_sym_edges"] = st.get("sym_edges")
    # r8: the star-contraction twin's alternation count next to the
    # min-label round count — O(log n) vs O(diameter) as measured data
    st = {}
    connected_components_star(
        corpus.select(F.col("doc_id").alias("id")),
        _doc_jaccard_edges(corpus),
        stats=st,
    ).write.format("noop").mode("overwrite").save()
    out["cc_doc_star_rounds"] = st["rounds"]

    if not semantic:
        return out

    from apache_spark_irs_form_990_spark.queries.graph_ext import (
        copurchase_edges,
    )

    sem = _semantic_corpus(spark, sf_dir)
    st = {}
    connected_components(
        sem.select(F.col("vec_id").alias("id")),
        _semantic_edges(spark, sf_dir),
        stats=st,
    ).write.format("noop").mode("overwrite").save()
    out["cc_sem_sym_edges"] = st["sym_edges"]
    out["cc_sem_rounds"] = st["rounds"]

    out["kcore_copurchase_edges"] = (
        copurchase_edges(spark, sf_dir, support=2).count()
    )
    return out


def measure(spark, sf_dir: str) -> dict:
    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.functions.vectors import milli_vec
    from apache_spark_irs_form_990_spark.operators.dedup import band_signatures
    from apache_spark_irs_form_990_spark.operators.similarity import (
        _flat_bucketed,
        _flat_index,
        banded_lsh_pairs,
        emb_milli_corpus,
    )
    from apache_spark_irs_form_990_spark.tables import load

    qs = registry.queries()
    out: dict = {"sf_dir": sf_dir}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out["n_docs"] = docs.count()
    out["n_vecs"] = load(spark, sf_dir, "embeddings").count()

    # candidate-pair counts from the ops' own shared kernels
    sig = band_signatures(docs).localCheckpoint()
    a, b = sig.alias("a"), sig.alias("b")
    out["minhash_candidate_pairs"] = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_min") == F.col("b.band_min"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    out["embedding_lsh_candidate_pairs"] = banded_lsh_pairs(
        emb_milli_corpus(spark, sf_dir)
    ).count()
    # star-link edge count on the same signatures: Σ (occ - 1) per
    # bucket = rows - #buckets — the O(bucket) alternative SCALE.md
    # §11 finding 2 documents, measured next to the pairwise count
    occ = sig.groupBy("band", "band_min").agg(F.count(F.lit(1)).alias("occ"))
    out["minhash_star_link_edges"] = int(
        occ.agg(F.sum(F.col("occ") - 1)).collect()[0][0]
    )
    # flat-LSH candidate volume through the r5 capped index: the
    # registered single-probe and 9x-multiprobe joins' own shapes
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", milli_vec(F.col("embedding")).alias("v")
    )
    bucketed = _flat_bucketed(emb)
    index = _flat_index(bucketed)
    out["flat_lsh_single_candidates"] = (
        bucketed.alias("a")
        .join(
            index.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .count()
    )
    # capped candidates/vec are bounded by C (single) and 9C (multi):
    # the ratio to n_vecs across steps is the linearity evidence
    probes = bucketed.select(
        "vec_id",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(8)],
            )
        ).alias("probe"),
    )
    out["flat_lsh_multi_candidates"] = (
        probes.alias("a")
        .join(
            index.alias("b"),
            (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )

    out.update(global_order_task_profile(spark, sf_dir))
    out.update(clustering_profile(spark, sf_dir))

    met = StageMetrics(spark)
    for name in QUERIES:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        before = set()
        for i in range(2):
            if i == 1:
                before = met.snapshot()  # attribute the last run only
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_s"] = round(best, 3)
        for k, v in met.since(before).items():
            out[f"{name}_{k}"] = v
    return out


def main() -> None:
    from apache_spark_irs_form_990_spark.session import get_session

    rnd = sys.argv[1] if len(sys.argv) > 1 else ROUND
    # UI on: the status REST API is where the per-query memory/spill
    # posture comes from (StageMetrics)
    spark = get_session(
        app_name="scale_step", extra_conf={"spark.ui.enabled": "true"}
    )
    sf1 = synthesize_sf1(spark)
    sf10 = synthesize_sf10(spark)
    path = os.path.join(REPO_ROOT, f"SCALE_STEP_{rnd}.json")
    result = {
        "queries": QUERIES,
        "at_scale_queries": AT_SCALE_QUERIES,
        "steps": [],
    }

    def dump() -> None:
        # dump after EVERY completed phase: a crash in a late phase
        # must not discard an hour of completed measurement (the
        # hot_band_sweep r9 finding, applied here after the r10 sweep
        # lost its first run to exactly that)
        with open(path, "w") as f:
            json.dump(result, f, indent=1)

    for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1", sf1):
        result["steps"].append(measure(spark, d))
        dump()
    result["at_scale_step"] = measure_at_scale(spark, sf10)
    dump()
    result["pq_budget_sf1"] = measure_pq_budget(spark, sf1)
    dump()
    print(json.dumps(result, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
