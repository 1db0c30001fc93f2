"""PERSISTED standing state for incremental dedup — the nightly job /
daily merge split actually run as two independent jobs (VERDICT r8
task 1).

`dedup_cluster_components_incremental` (operators/components.py)
proves the merge ALGEBRA — contracted star edges stand in for the
standing edge set — but recomputes phase 1 inline every run, which at
sf10 makes it the slowest at-scale entry (99.5 s, mostly phase-1
replay). This module closes the loop: the nightly job WRITES the
standing state to a real partitioned sink, and the daily merge READS
it back as an independent scan and never touches the standing corpus'
text again:

  * ``labels``   — (id, component): the standing cluster assignment.
  * ``postings`` — (doc_id, shingle) distinct, partitioned by
    ``sbucket = pmod(xxhash64(shingle), 16)``: the inverted shingle
    index. The merge broadcast-joins it on (sbucket, shingle) against
    the batch shingle set and STATICALLY prunes bucket directories
    (the materialized batch vocabulary's distinct sbuckets become an
    isin partition filter at file-listing time; DPP does not fire on
    this shape — the build side has no selective predicate) — the
    same partition-pruned probe shape as `sim_ann_index_persist_probe`
    (operators/similarity.py).
  * ``shingle_df`` — (shingle, df): per-shingle document frequency
    over the standing corpus.
  * ``sizes``    — (doc_id, n): per-doc count of shingles surviving
    the standing corpus' own df<=100 cap.

The merge must price the UNION-time df cap (the per-pass contract of
`_incremental_cc_oracle`: edges as computed at their pass time) while
reading only persisted aggregates plus the batch. The identity that
makes this O(batch x overlap) instead of an O(corpus) recount:
union_df differs from standing df ONLY on shingles the batch contains
(df never decreases), so

  union_df(s)     = standing_df(s) + batch_df(s)          (s in batch)
  size_union(doc) = size_standing(doc)
                    - #{s in doc : standing_df <= 100 < union_df}

and the correction set is again batch-present-only. (The identity is
an ADD-path contract; DELETE batches — opt-outs, takedowns, license
revocations — violate it and get their own exact pass,
``apply_delete_batch`` below, r10.) Pair generation,
sizes, and the Jaccard>=0.6 predicate then reproduce
`_incident_jaccard_edges` EXACTLY (the registered query is
hash-checked against the same two-phase oracle), and the state update
after a merge emits the next night's four tables from quantities the
merge already computed — no recount, which is what makes true nightly
replay (batch N+1 against the state batch N wrote) cheap.

Provenance: re-expression target is the reference's one standing
dataset refreshed per run (IRSSpark.py:177-268 rebuilds its whole
index every invocation); the incremental split is the 100 TB upgrade
of that contract.
"""

from __future__ import annotations

import hashlib
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.scratch import ScratchDirs
from apache_spark_irs_form_990_spark.functions.text import shingles
from apache_spark_irs_form_990_spark.operators.components import (
    _SQL_INCR_FIXTURE_CTES,
    _SQL_JACCARD_EDGE_BLOCK,
    _SQL_SHINGLE_POSTINGS,
    _incremental_cc_oracle,
    connected_components,
    connected_components_star,
    _doc_jaccard_edges,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

_DF_CAP = 100  # same posting-frequency cap as _doc_jaccard_edges
_N_SBUCKETS = 16

_STATE_DIRS = ScratchDirs("spark990_cc_state")


def scratch_state_dir(tag: str) -> str:
    """Per-invocation scratch directory for a standing-state sink,
    bounded the same two ways as the ANN index dirs (ADVICE r7/r9):
    this process rmtree's its own dirs at exit, and dirs whose
    embedded creator pid is dead are swept at entry across ALL tags —
    the shared functions/scratch.py lifecycle (r9 self-review:
    previously a near-verbatim copy of similarity.py's)."""
    return _STATE_DIRS.new_dir(tag)


def _sbucket(col):
    return F.pmod(F.xxhash64(col), F.lit(_N_SBUCKETS)).cast("int")


def _postings(corpus: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle) — identical to the shingle stream
    inside _doc_jaccard_edges/_incident_jaccard_edges."""
    return corpus.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text")))).alias("shingle"),
    ).distinct()


def write_standing_state(
    spark: SparkSession, corpus: DataFrame, state_dir: str
) -> None:
    """The NIGHTLY job: cluster ``corpus`` (doc_id, text) from scratch
    and persist the four standing tables. This is the only pass that
    ever shingles or self-joins the standing corpus."""
    # r11 (guide §2.4): materialize the posting list FIRST and feed it
    # to both consumers — the clustering pass previously re-shingled
    # and re-deduped the corpus for its edge derivation even though
    # the state writer checkpoints the identical distinct
    # (doc_id, shingle) set two lines later
    post = _postings(corpus).localCheckpoint()

    # r11 (guide §2.6 — overlap independent jobs): given the
    # materialized postings, the clustering chain (edge derivation +
    # CC rounds + labels write) and the three count-table writes are
    # INDEPENDENT; submitting them from two driver threads lets the
    # count-table write tasks back-fill executors idled by the CC
    # loop's per-round barriers instead of serializing after them.
    # Outputs are disjoint directories; results byte-identical.
    def _write_labels() -> None:
        labels = connected_components(
            corpus.select(F.col("doc_id").alias("id")),
            _doc_jaccard_edges(corpus, postings=post),
        )
        labels.write.mode("overwrite").parquet(
            os.path.join(state_dir, "labels")
        )

    def _write_counts() -> None:
        post.withColumn("sbucket", _sbucket(F.col("shingle"))).write.mode(
            "overwrite"
        ).partitionBy("sbucket").parquet(os.path.join(state_dir, "postings"))
        df_tbl = post.groupBy("shingle").agg(F.count("*").alias("df"))
        df_tbl.write.mode("overwrite").parquet(
            os.path.join(state_dir, "shingle_df")
        )
        sizes = (
            post.join(df_tbl, "shingle")
            .filter(F.col("df") <= _DF_CAP)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"))
        )
        sizes.write.mode("overwrite").parquet(
            os.path.join(state_dir, "sizes")
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [pool.submit(_write_labels), pool.submit(_write_counts)]
        for f in futures:
            f.result()


def _batch_hot_vocab(bpost: DataFrame, df_tbl: DataFrame) -> DataFrame:
    """(shingle, sdf, bdf, udf, sbucket), MATERIALIZED, for the batch
    vocabulary: union-time df exists only for batch-present shingles —
    everything else keeps its standing df and can never form a
    batch-incident pair anyway. |batch shingle vocabulary|-sized.
    Broadcast is applied at every JOIN SITE downstream, never here:
    localCheckpoint materializes to a LogicalRDD and would discard a
    pre-checkpoint broadcast hint, silently planning the postings
    probe as a full shuffle join (r9 self-review finding)."""
    bdf = bpost.groupBy("shingle").agg(F.count("*").alias("bdf"))
    return (
        bdf.join(df_tbl, "shingle", "left")
        .select(
            "shingle",
            F.coalesce(F.col("df"), F.lit(0)).alias("sdf"),
            "bdf",
            (F.coalesce(F.col("df"), F.lit(0)) + F.col("bdf")).alias("udf"),
        )
        .withColumn("sbucket", _sbucket(F.col("shingle")))
    ).localCheckpoint()


def _probe_postings_on(postings: DataFrame, vocab: DataFrame) -> DataFrame:
    """Partition-pruned broadcast probe of the standing posting index
    by a (sbucket, shingle, ...) vocabulary frame: the vocabulary's
    distinct sbuckets become a static isin partition filter at
    file-listing time (one bounded ≤ _N_SBUCKETS-int collect; DPP
    would not fire — the build side carries no selective predicate),
    then one BroadcastHashJoin on (sbucket, shingle). Shared by the
    daily-merge probe and the delete path's cap-crossing probe."""
    buckets = [r["sbucket"] for r in vocab.select("sbucket").distinct().collect()]
    return postings.filter(F.col("sbucket").isin(buckets)).join(
        F.broadcast(vocab), ["sbucket", "shingle"]
    )


def _probe_standing_postings(postings: DataFrame, hot: DataFrame) -> DataFrame:
    """The daily merge's ONLY read of the standing posting index —
    exposed un-checkpointed so tests/test_plans.py can assert the
    probe's physical plan on the REAL code path (apply_batch
    materializes the result immediately): one BroadcastHashJoin of
    the sdf-capped batch vocabulary against the index, with the
    vocabulary's distinct sbuckets statically pruning bucket
    directories at file-listing time (one bounded ≤ _N_SBUCKETS-int
    collect; DPP would not fire here — the build side carries no
    selective predicate). The sdf ≤ cap filter is the probe BOUND: a
    shingle whose standing df already exceeds the cap can feed
    neither eligible pairs (udf ≥ sdf > cap) nor the size correction
    (needs sdf ≤ cap), so without it a batch containing a 1M-doc
    boilerplate cluster's shingle would drag 1M postings rows per hot
    shingle into the probe; with it the probe is O(Σ min(df, cap))
    per batch shingle regardless of megacluster size (priced as data
    by [[dedup_incremental_probe_audit]])."""
    hot_cold = hot.filter(F.col("sdf") <= _DF_CAP)
    return _probe_postings_on(postings, hot_cold).select(
        "doc_id", "shingle", "sdf", "udf"
    )


def apply_batch(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    out_state_dir: str | None = None,
) -> DataFrame:
    """The DAILY merge: read the persisted standing state, probe it
    with ``batch`` (doc_id, text), and return the merged labels
    (id, component) over standing ∪ batch ids. Never re-shingles or
    re-clusters the standing corpus.

    If ``out_state_dir`` is given, also writes the UPDATED standing
    state there (labels = the merged labels; postings/df/sizes rolled
    forward under the union-time cap), so the next batch can merge
    against state this merge wrote — true nightly replay, pinned by
    tests/test_incremental_persisted.py."""
    labels1 = spark.read.parquet(os.path.join(state_dir, "labels"))
    postings = spark.read.parquet(os.path.join(state_dir, "postings"))
    df_tbl = spark.read.parquet(os.path.join(state_dir, "shingle_df"))
    sizes1 = spark.read.parquet(os.path.join(state_dir, "sizes"))

    bpost = _postings(batch).localCheckpoint()
    hot = _batch_hot_vocab(bpost, df_tbl)
    # standing postings on batch-present shingles — the ONLY standing
    # rows the merge reads; probe bound + static bucket pruning live
    # in _probe_standing_postings (plan-asserted by tests/test_plans)
    shit = _probe_standing_postings(postings, hot).localCheckpoint()

    # pair generation under the union cap: batch x standing plus
    # batch x batch, each (pair, shingle) exactly once, exactly the
    # rows _incident_jaccard_edges' batch-incident predicate keeps
    eligible_std = shit.filter(F.col("udf") <= _DF_CAP)
    eligible_b = bpost.join(
        F.broadcast(hot.select("shingle", "udf")), "shingle"
    ).filter(F.col("udf") <= _DF_CAP)
    bs = (
        eligible_b.alias("a")
        .join(eligible_std.alias("b"), "shingle")
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
        )
    )
    bb = (
        eligible_b.alias("a")
        .join(
            eligible_b.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    overlap = bs.unionByName(bb).groupBy("id_a", "id_b").agg(
        F.count("*").alias("shared")
    )

    # sizes under the union cap: batch docs counted directly; standing
    # docs corrected by the shingles the batch pushed over the cap
    sizes_b = eligible_b.groupBy("doc_id").agg(F.count("*").alias("n"))
    # sdf <= cap is already an invariant of shit (the hot_cold probe
    # bound above), so the crossing test reduces to udf > cap
    corr = (
        shit.filter(F.col("udf") > _DF_CAP)
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
    )
    # n > 0: a standing doc whose every cap-eligible shingle was pushed
    # over the cap by the batch corrects to n=0 — a from-scratch
    # recount emits NO row for it, and the rolled-forward state must
    # stay byte-equivalent to the nightly writer's format (r9
    # self-review finding).
    # UNION-AGGREGATE, not a join (r10): the correction frame corr is
    # bounded by ~cap x |batch vocabulary| — too big to blindly
    # broadcast (ADVICE r9) — and at sf10 the AQE shuffle-join
    # replacement fed connected_components_star a plan whose
    # localCheckpoint tripped Spark's "PartitioningCollection requires
    # all of its partitionings have the same numPartitions" (found by
    # the r10 sweep; invisible at small SF where AQE auto-broadcasts).
    # Every corr doc has >=1 under-cap shingle, so corr docs are a
    # subset of sizes1 docs and the left-join-minus IS a summed union:
    # one map-side-combinable shuffle, no broadcast decision at all.
    sizes_s = (
        sizes1.select("doc_id", "n")
        .unionByName(corr.select("doc_id", (-F.col("c")).alias("n")))
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
    )
    sizes_u = sizes_s.unionByName(sizes_b)

    sa, sb = sizes_u.alias("sa"), sizes_u.alias("sb")
    jac = F.col("shared").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("shared")
    )
    e2 = (
        overlap.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.6)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )

    star1 = labels1.filter(F.col("id") != F.col("component")).select(
        F.col("component").alias("src"), F.col("id").alias("dst")
    )
    nodes = labels1.select("id").unionByName(
        batch.select(F.col("doc_id").alias("id"))
    )
    merged = connected_components_star(nodes, star1.unionByName(e2))

    if out_state_dir is not None:
        post_u = postings.select("doc_id", "shingle", "sbucket").unionByName(
            bpost.withColumn("sbucket", _sbucket(F.col("shingle")))
        )
        # rolled-forward df: standing df + batch df on batch-present
        # shingles, standing df unchanged elsewhere — no recount
        df_u = df_tbl.join(
            F.broadcast(hot.select("shingle", "bdf")), "shingle", "left"
        ).select(
            "shingle",
            (F.col("df") + F.coalesce(F.col("bdf"), F.lit(0))).alias("df"),
        ).unionByName(
            hot.filter(F.col("sdf") == 0).select(
                "shingle", F.col("bdf").alias("df")
            )
        )
        # sizes_u IS the union-cap size table — the next pass's
        # standing sizes by definition. r11 (guide §2.6): the four
        # table writes land in disjoint directories and share only
        # already-checkpointed inputs — overlap them on driver threads
        writes = [
            lambda: merged.write.mode("overwrite").parquet(
                os.path.join(out_state_dir, "labels")
            ),
            lambda: post_u.write.mode("overwrite")
            .partitionBy("sbucket")
            .parquet(os.path.join(out_state_dir, "postings")),
            lambda: df_u.write.mode("overwrite").parquet(
                os.path.join(out_state_dir, "shingle_df")
            ),
            lambda: sizes_u.write.mode("overwrite").parquet(
                os.path.join(out_state_dir, "sizes")
            ),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            for f in [pool.submit(w) for w in writes]:
                f.result()
    return merged


@register("dedup_incremental_persisted", oracle=_incremental_cc_oracle())
def dedup_incremental_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_cluster_components_incremental` with the standing state
    actually PERSISTED across jobs (VERDICT r8 task 1): phase 1 writes
    labels + shingle postings + df + capped sizes to a partitioned
    parquet sink; phase 2 is an independent read of that sink plus the
    batch — the standing corpus' text is never touched again. Same
    fixture, same per-pass df-cap contract, same two-phase oracle, so
    the persisted round-trip is hash-checked identical to the inline
    form.

    Cost shape at 100 TB, per batch: one broadcastable batch-shingle
    vocabulary, one partition-prunable probe of the posting index
    restricted to batch-present shingles (O(batch x overlap) rows), a
    size CORRECTION join instead of a corpus recount (union-time df
    cap priced via union_df = standing_df + batch_df, valid because
    df never decreases), and one star-contraction pass over
    {contracted standing labels} ∪ {batch-incident edges}. The state
    update is emitted from quantities the merge already holds —
    batch N+1 merges against state batch N wrote
    (tests/test_incremental_persisted.py pins the replay)."""
    base, batch = fixture_base_batch(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    state_dir = scratch_state_dir(tag)
    write_standing_state(spark, base, state_dir)
    merged = apply_batch(spark, state_dir, batch)
    return merged.select(
        F.col("id").alias("doc_id"), F.col("component").alias("component_id")
    )


def fixture_base_batch(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The incremental family's shared fixture: base = documents + a
    drop-4-words generation of every 5th doc; batch = the drop-2-words
    generation (same derivation as `_three_gen_corpus` /
    `_incremental_cc_oracle`). Exposed so scripts/scale_step.py can
    time the nightly write and the daily merge SEPARATELY."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")

    def gen(offset: int, drop: int) -> DataFrame:
        return docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + offset).alias("doc_id"),
            F.concat_ws(
                " ", F.slice(toks, 1, F.greatest(F.size(toks) - drop, F.lit(0)))
            ).alias("text"),
        )

    return docs.unionByName(gen(2000000, 4)), gen(1000000, 2)


def _incremental_probe_oracle() -> str:
    """DuckDB replay of the daily-merge probe-mass accounting: the
    standing per-shingle df over the base corpus, probed by the batch
    vocabulary, split at the df cap — built from the SAME shared CTE
    text as `_incremental_cc_oracle` (fixture derivation) and the
    jaccard edge block (shingle postings), so a fixture or shingle
    change lands in one place."""
    bpost = _SQL_SHINGLE_POSTINGS.replace("{name}", "bpost").replace(
        "{corpus}", "base"
    )
    qpost = _SQL_SHINGLE_POSTINGS.replace("{name}", "qpost").replace(
        "{corpus}", "batch"
    )
    return f"""
    WITH {_SQL_INCR_FIXTURE_CTES},
    {bpost},
    sdf AS (SELECT shingle, count(*) AS df FROM bpost GROUP BY shingle),
    {qpost},
    qvocab AS (SELECT DISTINCT shingle FROM qpost),
    probed AS (
      SELECT coalesce(df, 0) AS sdf
      FROM qvocab LEFT JOIN sdf USING (shingle)
    )
    SELECT CAST({_DF_CAP} AS INT) AS df_cap,
           count(*) AS n_batch_shingles,
           CAST(sum(CASE WHEN sdf > {_DF_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot_shingles,
           CAST(sum(sdf) AS BIGINT) AS probe_rows_uncapped,
           CAST(sum(CASE WHEN sdf <= {_DF_CAP} THEN sdf ELSE 0 END)
                AS BIGINT) AS probe_rows_kept
    FROM probed
    """


@register("dedup_incremental_probe_audit", oracle=_incremental_probe_oracle())
def dedup_incremental_probe_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE PRICE AND BOUND OF THE DAILY-MERGE PROBE, as data (r9 —
    the [[dedup_banding_occupancy_audit]] pricing pattern applied to
    the incremental path): one row reporting, for the shared
    base/batch fixture, the batch vocabulary size, how many batch
    shingles are HOT (standing df > cap — provably dead weight for
    the merge: they can feed neither eligible pairs nor the size
    correction), the counterfactual probe mass an unfiltered probe
    would pull from the posting index (Σ standing df over batch
    shingles), and the mass the sdf ≤ cap bound actually reads.

    On well-behaved corpora the row reads n_hot_shingles≈0 and
    kept≈uncapped — the bound is invisible until an input needs it.
    Under HOTBAND_r09.json's planted megacluster batch the same
    accounting reads 260,541 counterfactual rows vs 0 kept. Cost: two
    linear shingle passes + one vocabulary-sized join — safe on
    exactly the adversarial inputs the unfiltered probe is not."""
    base, batch = fixture_base_batch(spark, sf_dir)
    sdf_tbl = _postings(base).groupBy("shingle").agg(
        F.count("*").alias("df")
    )
    bvocab = _postings(batch).select("shingle").distinct()
    probed = bvocab.join(sdf_tbl, "shingle", "left").select(
        F.coalesce(F.col("df"), F.lit(0)).alias("sdf")
    )
    hot = F.col("sdf") > _DF_CAP
    return probed.agg(
        F.count(F.lit(1)).alias("n_batch_shingles"),
        F.sum(F.when(hot, 1).otherwise(0)).alias("n_hot_shingles"),
        F.sum("sdf").alias("probe_rows_uncapped"),
        F.sum(F.when(~hot, F.col("sdf")).otherwise(0)).alias(
            "probe_rows_kept"
        ),
    ).select(
        F.lit(_DF_CAP).cast("int").alias("df_cap"),
        "n_batch_shingles",
        "n_hot_shingles",
        "probe_rows_uncapped",
        "probe_rows_kept",
    )


def apply_delete_batch(
    spark: SparkSession,
    state_dir: str,
    deletes: DataFrame,
    out_state_dir: str | None = None,
) -> DataFrame:
    """The TAKEDOWN job (VERDICT r9 task 2): remove ``deletes``
    (doc_id) from the persisted standing state and return the
    surviving labels — never re-shingling any surviving document.

    Deletes invert the add-path's roll-forward identity (df never
    decreases there; here it never increases), and every state table
    is a PURE COUNT over the corpus, so the post-delete state is
    EXACTLY what ``write_standing_state`` would produce from scratch
    on the survivors — that strong equivalence is the registered
    query's oracle ([[dedup_incremental_delete]]). Per table:

      * postings: drop deleted docs' rows (anti-join; one column-
        pruned scan of the index — doc_id does not prune sbucket
        directories, and that full-index pass is the honest floor for
        a takedown over an inverted index).
      * shingle_df: df' = df − (deleted docs' per-shingle counts);
        the decrement vocabulary is |delete-batch vocab|-bounded and
        rides a broadcast, every other shingle's df is untouched.
      * sizes: eligibility only GROWS under delete (df' ≤ df), so
        n' = n + #{cap-CROSSING shingles in doc} where crossing means
        df > cap ≥ df' — the mirror of the add path's correction. The
        crossing probe reuses the partition-pruned broadcast probe
        (`_probe_postings_on`), so its cost is O(Σ df' ≤ cap) per
        crossing shingle, bounded exactly like the daily merge's.
      * labels: only components containing a deleted doc or a doc
        with a crossing shingle can change. Proof sketch (the
        affected-set closure the relabel relies on): for a surviving
        doc U in an unaffected component, U has no crossing shingle,
        so n_U' = n_U and every shared-shingle count with another
        survivor is unchanged (a crossing shingle shared with U would
        make U affected); a NEW edge needs a newly-eligible — i.e.
        crossing — shingle, marking both endpoints affected; a LOST
        edge needs a grown size, marking that endpoint affected; and
        any pre-existing passing edge from U to an affected doc
        placed U in that (affected) component already. So the
        affected components = components of {deleted docs} ∪ {docs
        holding a crossing shingle}, and their induced subgraph is
        re-clustered from the surviving postings under df' (star
        kernel, O(log n) rounds) while every other label is carried
        through verbatim. min-id canonical labels are preserved:
        recomputing on the induced subgraph yields the same min
        member id a global from-scratch pass would.

    If ``out_state_dir`` is given the four survivor tables are
    written there in the nightly writer's exact format, so delete
    batches compose with add batches in any order
    (tests/test_incremental_persisted.py pins add→delete replay)."""
    labels1 = spark.read.parquet(os.path.join(state_dir, "labels"))
    postings = spark.read.parquet(os.path.join(state_dir, "postings"))
    df_tbl = spark.read.parquet(os.path.join(state_dir, "shingle_df"))
    sizes1 = spark.read.parquet(os.path.join(state_dir, "sizes"))

    dset = deletes.select("doc_id").distinct().localCheckpoint()

    # deleted docs' postings -> per-shingle decrement (delete batches
    # are takedown-sized: the id set broadcasts; the scan is the index)
    dpost = postings.join(F.broadcast(dset), "doc_id")
    ddf = dpost.groupBy("shingle").agg(F.count("*").alias("ddf"))
    # df' on the delete vocabulary only; every other shingle unchanged
    df_delta = (
        df_tbl.join(F.broadcast(ddf), "shingle")
        .select(
            "shingle",
            F.col("df").alias("df_old"),
            (F.col("df") - F.col("ddf")).alias("df"),
        )
        .localCheckpoint()
    )
    # shingles the delete pulls back UNDER the cap: newly eligible
    crossing = df_delta.filter(
        (F.col("df_old") > _DF_CAP) & (F.col("df") <= _DF_CAP)
    ).select("shingle", F.col("df").alias("dfp")).withColumn(
        "sbucket", _sbucket(F.col("shingle"))
    ).localCheckpoint()

    # survivors gaining newly-eligible shingles (partition-pruned
    # broadcast probe — same bounded shape as the daily merge's)
    gains = (
        _probe_postings_on(postings, crossing)
        .join(F.broadcast(dset), "doc_id", "anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("g"))
        .localCheckpoint()
    )
    sizes_kept = sizes1.join(F.broadcast(dset), "doc_id", "anti")
    # union-aggregate, not an outer join (same reasoning as the add
    # path's sizes_s, r10): a doc absent from sizes (zero eligible
    # shingles) enters via its gains row; one summed shuffle, no
    # broadcast decision, no PartitioningCollection-prone join shape
    sizes2 = (
        sizes_kept.select("doc_id", "n")
        .unionByName(gains.select("doc_id", F.col("g").alias("n")))
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
    )

    # affected components: any component holding a deleted doc or a
    # crossing-shingle doc (see proof sketch above). NO broadcast
    # hints from aff_comps onward (ADVICE r10): their size is the
    # affected components' total MASS, not the delete-batch size —
    # deleting one doc inside a megacluster would broadcast the whole
    # component, the same blind-broadcast hazard the r10 union-
    # aggregate rewrite removed from the add path. The planner (AQE)
    # picks the strategy from observed sizes; only the genuinely
    # batch-bounded frames (dset, ddf/df_delta/crossing — delete-vocab
    # sized) keep explicit hints.
    touched = dset.unionByName(gains.select("doc_id")).distinct()
    aff_comps = (
        labels1.join(touched, labels1["id"] == touched["doc_id"])
        .select("component")
        .distinct()
        .localCheckpoint()
    )
    aff_docs = (
        labels1.join(aff_comps, "component")
        .select(F.col("id").alias("doc_id"))
        .join(F.broadcast(dset), "doc_id", "anti")
        .localCheckpoint()
    )

    # re-cluster the affected induced subgraph from surviving postings
    # under df' (exact survivor df): eligibility pre-filter bounds the
    # shingle self-join occupancy at the cap, as everywhere else
    aff_post = postings.join(aff_docs, "doc_id").select(
        "doc_id", "shingle"
    )
    dfp = df_tbl.join(F.broadcast(ddf), "shingle", "left").select(
        "shingle",
        (F.col("df") - F.coalesce(F.col("ddf"), F.lit(0))).alias("dfp"),
    )
    aff_elig = (
        aff_post.join(dfp, "shingle")
        .filter(F.col("dfp") <= _DF_CAP)
        .select("doc_id", "shingle")
        .localCheckpoint()
    )
    overlap = (
        aff_elig.alias("a")
        .join(
            aff_elig.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa, sb = sizes2.alias("sa"), sizes2.alias("sb")
    jac = F.col("shared").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("shared")
    )
    edges = (
        overlap.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.6)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    relabeled = connected_components_star(
        aff_docs.select(F.col("doc_id").alias("id")), edges
    )
    labels2 = labels1.join(aff_comps, "component", "anti").select(
        "id", "component"
    ).unionByName(relabeled.select("id", "component"))

    if out_state_dir is not None:
        df2 = df_tbl.join(
            F.broadcast(df_delta.select("shingle", F.col("df").alias("dfn"))),
            "shingle",
            "left",
        ).select(
            "shingle", F.coalesce(F.col("dfn"), F.col("df")).alias("df")
        ).filter(F.col("df") > 0)
        # r11 (guide §2.6): four survivor-table writes into disjoint
        # directories over already-checkpointed inputs — overlapped
        writes = [
            lambda: labels2.write.mode("overwrite").parquet(
                os.path.join(out_state_dir, "labels")
            ),
            lambda: postings.join(F.broadcast(dset), "doc_id", "anti")
            .select("doc_id", "shingle", "sbucket")
            .write.mode("overwrite")
            .partitionBy("sbucket")
            .parquet(os.path.join(out_state_dir, "postings")),
            lambda: df2.write.mode("overwrite").parquet(
                os.path.join(out_state_dir, "shingle_df")
            ),
            lambda: sizes2.write.mode("overwrite").parquet(
                os.path.join(out_state_dir, "sizes")
            ),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            for f in [pool.submit(w) for w in writes]:
                f.result()
    return labels2


def fixture_delete_set(base: DataFrame) -> DataFrame:
    """The delete family's shared fixture: every 10th ORIGINAL doc
    (the +2M truncation generation is excluded by the id bound), so
    near-dup pairs {d, d+2M} with d % 10 == 0 lose their canonical
    member and the survivor must re-label — the relabel path is
    exercised on every run, not just when a cap crosses."""
    return base.filter(
        (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 2000000)
    ).select("doc_id")


def _incremental_delete_oracle() -> str:
    """From-scratch clustering of the SURVIVORS — the strong
    equivalence the delete pass is proven against: every state table
    is a pure count over the corpus, so deletion must land exactly
    where a full nightly rebuild of C \\ D would (unlike the add
    path, whose per-pass df-cap contract is deliberately
    path-dependent). Reuses the shared fixture CTEs and the one-copy
    Jaccard edge block."""
    edge_block = _SQL_JACCARD_EDGE_BLOCK.format(
        p="s", corpus="surv", pair_pred=""
    )
    return f"""
    WITH RECURSIVE {_SQL_INCR_FIXTURE_CTES},
    surv AS (
      SELECT doc_id, text FROM base
      WHERE NOT (doc_id % 10 = 0 AND doc_id < 2000000)
    ),
    {edge_block},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM spairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM spairs
    ),
    reach(id, comp) AS (
      SELECT doc_id, doc_id FROM surv
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id
    """


@register("dedup_incremental_delete", oracle=_incremental_delete_oracle())
def dedup_incremental_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETES THROUGH THE PERSISTED DEDUP STATE (VERDICT r9 task 2):
    build the standing state for the shared base corpus, then apply a
    takedown batch (every 10th original doc) via `apply_delete_batch`
    — postings dropped, df decremented, sizes corrected for shingles
    falling back UNDER the cap, deleted labels retired, and affected
    components re-clustered (splits included) from surviving postings
    only. The oracle is a from-scratch rebuild of the survivor corpus
    — the strongest possible contract, valid because every standing
    table is a pure count (see `apply_delete_batch`'s proof sketch
    for why untouched components provably keep their labels).

    Cost shape at 100 TB, per takedown batch: one column-pruned
    anti-join scan of the posting index (the unavoidable floor), a
    |delete vocab|-bounded broadcast decrement, one partition-pruned
    crossing probe, and a re-cluster bounded by the affected
    components' mass — the standing corpus' text is never read."""
    base, _ = fixture_base_batch(spark, sf_dir)
    tag = hashlib.md5(("del|" + sf_dir).encode()).hexdigest()[:8]
    state_dir = scratch_state_dir(tag)
    write_standing_state(spark, base, state_dir)
    merged = apply_delete_batch(spark, state_dir, fixture_delete_set(base))
    return merged.select(
        F.col("id").alias("doc_id"), F.col("component").alias("component_id")
    )


def _takedown_e2e_oracle() -> str:
    """The combined contract: the survivor rebuild (labels — same CTE
    chain as `_incremental_delete_oracle`) INNER-joined with the
    survivor corpus itself (text length) — so one oracle checks that
    table rows, corpus text, and index state all agree after the same
    takedown. The Spark side returns a FULL OUTER join of the two
    independently-mutated stores; any doc present in only one of them
    surfaces as a null column and fails the value hash."""
    edge_block = _SQL_JACCARD_EDGE_BLOCK.format(
        p="s", corpus="surv", pair_pred=""
    )
    return f"""
    WITH RECURSIVE {_SQL_INCR_FIXTURE_CTES},
    surv AS (
      SELECT doc_id, text FROM base
      WHERE NOT (doc_id % 10 = 0 AND doc_id < 2000000)
    ),
    {edge_block},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM spairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM spairs
    ),
    reach(id, comp) AS (
      SELECT doc_id, doc_id FROM surv
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
    ),
    labels AS (
      SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id
    )
    SELECT l.doc_id, l.component_id,
           CAST(length(s.text) AS BIGINT) AS text_len
    FROM labels l JOIN surv s USING (doc_id)
    """


@register("lakehouse_takedown_e2e", oracle=_takedown_e2e_oracle())
def lakehouse_takedown_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAKEDOWN THROUGH THE LAKEHOUSE (VERDICT r10 task 7): r10 built
    deletes for the dedup state (`apply_delete_batch`) and MERGE 'D'
    ops for the commit log separately; this registers the combined
    job a real takedown runs — ONE delete batch flows through BOTH
    mutation paths:

      * the corpus TABLE: commit-log table holding (doc_id, text),
        MERGE INTO op='D' for every takedown id (selective file
        rewrite, time-travelable, vacuum-reclaimable);
      * the dedup INDEX STATE: `apply_delete_batch` over the persisted
        postings/df/sizes/labels.

    The returned frame FULL-OUTER-joins the post-takedown snapshot
    read (doc_id, text length) with the post-takedown surviving labels
    (doc_id, component) — and the oracle is the from-scratch survivor
    rebuild joined with the survivor corpus, so a doc surviving in one
    store but not the other, a stale text, or a wrong relabel all
    break the hash. Disagreement between the two stores is exactly
    the failure mode a split mutation path invites; this query makes
    it a standing differential."""
    from apache_spark_irs_form_990_spark.sources.lakehouse import (
        _TABLE_DIRS,
        create_table,
        merge_into,
        read_snapshot,
    )

    base, _ = fixture_base_batch(spark, sf_dir)
    tag = hashlib.md5(("takedown|" + sf_dir).encode()).hexdigest()[:8]
    state_dir = scratch_state_dir(tag)
    tpath = _TABLE_DIRS.new_dir(tag)
    dels = fixture_delete_set(base).localCheckpoint()

    # r11 (guide §2.6): the corpus-table chain (create -> MERGE 'D')
    # and the dedup-state build touch disjoint stores and share only
    # the materialized inputs above — run them from two driver
    # threads so the table writes back-fill the CC loop's idle gaps.
    def _table_side() -> None:
        create_table(spark, tpath, base, key="doc_id", n_files=8)
        merge_into(
            spark,
            tpath,
            dels.select(
                "doc_id",
                F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("text"),
            ),
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [
            pool.submit(_table_side),
            pool.submit(write_standing_state, spark, base, state_dir),
        ]
        for f in futures:
            f.result()
    labels2 = apply_delete_batch(spark, state_dir, dels)
    tbl = read_snapshot(spark, tpath).select(
        "doc_id", F.length("text").cast("long").alias("text_len")
    )
    return labels2.select(
        F.col("id").alias("doc_id"), F.col("component").alias("component_id")
    ).join(tbl, "doc_id", "full")


def _cdf_consumer_oracle() -> str:
    """Two-phase oracle for the CDF-driven state update — the same
    contract chain as `_incremental_cc_oracle`, with the standing
    corpus REPLACED by the post-delete survivors (valid because the
    delete pass is from-scratch-equivalent on survivors — the
    [[dedup_incremental_delete]] contract) and the batch REPLACED by
    everything the change feed routed to the add path (inserts +
    update post-images): phase 1 closes survivor edges under the
    survivor df cap, phase 2 adds newdoc-incident edges under the
    union cap and re-closes. Final select joins labels with the
    post-merge corpus text, so table rows and index state must agree
    doc-for-doc."""
    surv_block = _SQL_JACCARD_EDGE_BLOCK.format(
        p="b", corpus="surv", pair_pred=""
    )
    inc_block = _SQL_JACCARD_EDGE_BLOCK.format(
        p="a",
        corpus="all_docs",
        pair_pred="WHERE (a.doc_id IN (SELECT doc_id FROM newdocs) "
        "OR b.doc_id IN (SELECT doc_id FROM newdocs))",
    )
    return f"""
    WITH RECURSIVE {_SQL_INCR_FIXTURE_CTES},
    surv AS (
      SELECT doc_id, text FROM base
      WHERE NOT (doc_id % 10 = 0 AND doc_id < 2000000)
        AND NOT (doc_id % 100 = 7 AND doc_id < 1000000)
    ),
    newdocs AS (
      SELECT doc_id, text FROM batch
      UNION ALL
      SELECT doc_id, 'UPDATED ' || text AS text FROM base
      WHERE doc_id % 100 = 7 AND doc_id < 1000000
    ),
    all_docs AS (SELECT * FROM surv UNION ALL SELECT * FROM newdocs),
    {surv_block},
    bedges AS (
      SELECT id_a AS src, id_b AS dst FROM bpairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM bpairs
    ),
    reach1(id, comp) AS (
      SELECT doc_id, doc_id FROM surv
      UNION
      SELECT e.dst, r.comp FROM reach1 r JOIN bedges e ON e.src = r.id
    ),
    labels1 AS MATERIALIZED (
      SELECT id, min(comp) AS comp FROM reach1 GROUP BY id
    ),
    {inc_block},
    alledges AS (
      SELECT comp AS src, id AS dst FROM labels1 WHERE id <> comp
      UNION SELECT id, comp FROM labels1 WHERE id <> comp
      UNION SELECT id_a, id_b FROM apairs
      UNION SELECT id_b, id_a FROM apairs
    ),
    reach2(id, comp) AS (
      SELECT doc_id, doc_id FROM all_docs
      UNION
      SELECT e.dst, r.comp FROM reach2 r JOIN alledges e ON e.src = r.id
    ),
    labels AS (
      SELECT id AS doc_id, min(comp) AS component_id FROM reach2 GROUP BY id
    )
    SELECT l.doc_id, l.component_id,
           CAST(length(a.text) AS BIGINT) AS text_len
    FROM labels l JOIN all_docs a USING (doc_id)
    """


@register("lakehouse_cdf_drives_state", oracle=_cdf_consumer_oracle())
def lakehouse_cdf_drives_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE CDF CONSUMER (r11): the persisted dedup state updated FROM
    the lakehouse change feed — the loop [[lakehouse_change_feed]]
    exists to close. One CDC merge lands deletes (every 10th original
    doc), inserts (the shared drop-2 batch), and text UPDATES (every
    100th-ish original doc re-prefixed) on the commit-log corpus
    table; the state job then reads `read_changes` for that commit —
    NEVER the table — and routes by change type:

      * delete + update_preimage  → `apply_delete_batch`
      * insert + update_postimage → `apply_batch`

    (an update is delete-then-add by construction, which is exactly
    how an inverted-index state must treat a text change). The
    returned frame full-outer-joins the merged labels with the
    post-merge snapshot's text lengths; the oracle is the two-phase
    rebuild over survivors + routed adds joined with the same corpus
    — a mis-routed change type, a carried-row echo (which would
    delete-and-re-add every untouched row in the rewritten files), or
    stores disagreeing on any doc all break the hash.

    Cost shape at 100 TB, per nightly CDC batch: the feed reads
    O(files the commit touched); the state update costs what the
    delete+add passes cost on the routed rows — standing corpus text
    is read by NEITHER."""
    from apache_spark_irs_form_990_spark.sources.lakehouse import (
        _TABLE_DIRS,
        create_table,
        merge_into,
        read_changes,
        read_snapshot,
    )

    base, batch = fixture_base_batch(spark, sf_dir)
    tag = hashlib.md5(("cdfstate|" + sf_dir).encode()).hexdigest()[:8]
    state_dir = scratch_state_dir(tag)
    state_dir2 = scratch_state_dir(tag + "_postdel")
    tpath = _TABLE_DIRS.new_dir(tag)

    dels = fixture_delete_set(base)
    upds = base.filter(
        (F.col("doc_id") % 100 == 7) & (F.col("doc_id") < 1000000)
    ).select(
        "doc_id",
        F.concat(F.lit("UPDATED "), F.col("text")).alias("text"),
    )
    changes = (
        dels.select(
            "doc_id",
            F.lit("D").alias("op"),
            F.lit(None).cast("string").alias("text"),
        )
        .unionByName(batch.select("doc_id", F.lit("I").alias("op"), "text"))
        .unionByName(upds.select("doc_id", F.lit("U").alias("op"), "text"))
    )

    # r11 (guide §2.6): the CDC-table chain (create -> merge) and the
    # standing-state build are independent until the feed is read —
    # overlap them on two driver threads (disjoint output dirs)
    def _table_side() -> None:
        create_table(spark, tpath, base, key="doc_id", n_files=8)
        merge_into(spark, tpath, changes)

    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [
            pool.submit(_table_side),
            pool.submit(write_standing_state, spark, base, state_dir),
        ]
        for f in futures:
            f.result()

    # the state job's ONLY input: the commit's change feed
    feed = read_changes(spark, tpath, v_from=1).localCheckpoint()
    del_ids = feed.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select("doc_id")
    adds = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("doc_id", "text")
    apply_delete_batch(spark, state_dir, del_ids, out_state_dir=state_dir2)
    labels = apply_batch(spark, state_dir2, adds)

    tbl = read_snapshot(spark, tpath).select(
        "doc_id", F.length("text").cast("long").alias("text_len")
    )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("component").alias("component_id")
    ).join(tbl, "doc_id", "full")


def state_cluster_histogram(spark: SparkSession, state_dir: str) -> DataFrame:
    """Cluster-size histogram read from a persisted state's labels —
    the corpus-health report pointed at the MUTABLE corpus (VERDICT
    r9 task 7): after an add or delete batch lands, this is the
    dataset-card input that tracks the standing state instead of
    re-deriving clusters from text. (cluster_size, n_clusters)."""
    labels = spark.read.parquet(os.path.join(state_dir, "labels"))
    return (
        labels.groupBy("component")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )
