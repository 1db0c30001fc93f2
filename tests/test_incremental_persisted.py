"""Nightly-replay contract for the PERSISTED incremental dedup state
(VERDICT r8 task 1, operators/incremental.py): the daily merge must
read ONLY the state the previous pass wrote, and a second batch must
merge against the state written by the first — with every pass
hash-identical to the inline two-phase dataflow it replaces
(`_incident_jaccard_edges` + star merge under the per-pass df-cap
contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.operators.components import (
    _doc_jaccard_edges,
    _incident_jaccard_edges,
    connected_components,
    connected_components_star,
)
from apache_spark_irs_form_990_spark.operators.incremental import (
    _postings,
    apply_batch,
    scratch_state_dir,
    write_standing_state,
)
from apache_spark_irs_form_990_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")

    def gen(offset, drop):
        return docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + offset).alias("doc_id"),
            F.concat_ws(
                " ", F.slice(toks, 1, F.greatest(F.size(toks) - drop, F.lit(0)))
            ).alias("text"),
        )

    base = docs.unionByName(gen(2000000, 4)).localCheckpoint()
    batch1 = gen(1000000, 2).localCheckpoint()
    batch2 = gen(3000000, 6).localCheckpoint()
    return base, batch1, batch2


def _inline_merge(standing_labels, standing_corpus, batch):
    """The inline twin of one daily pass: incident edges over the
    union corpus (batch-ness structural), star merge over contracted
    standing labels ∪ incident edges."""
    all_docs = (
        standing_corpus.withColumn("is_batch", F.lit(False))
        .unionByName(batch.withColumn("is_batch", F.lit(True)))
        .localCheckpoint()
    )
    star = standing_labels.filter(F.col("id") != F.col("component")).select(
        F.col("component").alias("src"), F.col("id").alias("dst")
    )
    e = _incident_jaccard_edges(all_docs)
    return connected_components_star(
        all_docs.select(F.col("doc_id").alias("id")), star.unionByName(e)
    )


def _d(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_two_batch_nightly_replay(spark, tmp_path):
    """Pass 1 merges batch1 against the state the nightly job wrote;
    pass 2 merges batch2 against the state PASS 1 wrote. Both passes
    must equal the inline dataflow run under the same per-pass
    contract — the second equality is the actual replay proof (no
    inline phase-1 anywhere near it)."""
    base, batch1, batch2 = _corpus(spark)

    # inline twin, two passes
    labels1 = connected_components(
        base.select(F.col("doc_id").alias("id")), _doc_jaccard_edges(base)
    ).localCheckpoint()
    inline2 = _d(_inline_merge(labels1, base, batch1))
    standing2 = base.unionByName(batch1).localCheckpoint()
    labels2 = spark.createDataFrame(
        list(inline2.items()), "id long, component long"
    )
    inline3 = _d(_inline_merge(labels2, standing2, batch2))

    # persisted path: state0 --batch1--> state1 --batch2--> labels
    s0, s1 = str(tmp_path / "state0"), str(tmp_path / "state1")
    write_standing_state(spark, base, s0)
    m1 = apply_batch(spark, s0, batch1, out_state_dir=s1)
    assert _d(m1) == inline2
    m2 = apply_batch(spark, s1, batch2)
    assert _d(m2) == inline3


def test_rolled_forward_state_matches_recount(spark, tmp_path):
    """The state update is emitted from merge-held quantities (no
    recount); this pins the roll-forward identities directly: the
    written shingle_df equals a from-scratch recount over the new
    standing corpus, and the written sizes equal a from-scratch
    df<=100-capped recount."""
    base, batch1, _ = _corpus(spark)
    s0, s1 = str(tmp_path / "state0"), str(tmp_path / "state1")
    write_standing_state(spark, base, s0)
    apply_batch(spark, s0, batch1, out_state_dir=s1).collect()

    union = base.unionByName(batch1)
    post = _postings(union)
    truth_df = {
        r["shingle"]: r["df"]
        for r in post.groupBy("shingle").agg(F.count("*").alias("df")).collect()
    }
    got_df = {
        r["shingle"]: r["df"]
        for r in spark.read.parquet(f"{s1}/shingle_df").collect()
    }
    assert got_df == truth_df

    df_tbl = post.groupBy("shingle").agg(F.count("*").alias("df"))
    truth_sizes = {
        r["doc_id"]: r["n"]
        for r in post.join(df_tbl, "shingle")
        .filter(F.col("df") <= 100)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got_sizes = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{s1}/sizes").collect()
    }
    assert got_sizes == truth_sizes

    labels_rows = spark.read.parquet(f"{s1}/labels").count()
    assert labels_rows == union.count()


def test_scratch_state_dir_sweeps_dead_pids(tmp_path):
    """Dead-pid dirs are reclaimed across ALL tags (the r9 advisor
    refinement to the ANN-index sweep, applied here from the start);
    the caller's own fresh dir is registered for atexit cleanup."""
    import os
    import subprocess
    import sys
    import tempfile

    # a GUARANTEED-dead pid: spawn-and-wait a child, then use its pid
    # (a fixed large literal like 999999 is live-able on hosts with
    # kernel.pid_max raised — r9 self-review finding)
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    dead = os.path.join(
        tempfile.gettempdir(),
        f"spark990_cc_state_othertag_{child.pid}_0",
    )
    os.makedirs(dead, exist_ok=True)
    mine = scratch_state_dir("sometag")
    assert not os.path.exists(dead)
    assert "spark990_cc_state_sometag_" in mine


def test_delete_after_merge_replay(spark, tmp_path):
    """Takedown replay (VERDICT r9 task 2): batch 1 merges, then a
    DELETE batch removes docs batch 1 merged (plus some standing
    docs). The rolled-forward add-state's postings/df/sizes are exact
    counts over base ∪ batch1 (pinned above), and the delete pass's
    decrements are exact, so the post-delete state tables must equal
    a from-scratch nightly write over the survivors byte-for-byte —
    and the labels must retire every deleted id while staying
    min-canonical over the surviving partition."""
    from apache_spark_irs_form_990_spark.operators.incremental import (
        apply_delete_batch,
    )

    base, batch1, _ = _corpus(spark)
    s0, s1, s2 = (
        str(tmp_path / "state0"),
        str(tmp_path / "state1"),
        str(tmp_path / "state2"),
    )
    write_standing_state(spark, base, s0)
    apply_batch(spark, s0, batch1, out_state_dir=s1).collect()

    union = base.unionByName(batch1).localCheckpoint()
    deletes = union.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    labels2 = apply_delete_batch(spark, s1, deletes, out_state_dir=s2)

    surv = union.join(deletes, "doc_id", "anti").localCheckpoint()
    truth_dir = str(tmp_path / "truth")
    write_standing_state(spark, surv, truth_dir)

    for tbl, key in (("shingle_df", "shingle"), ("sizes", "doc_id")):
        got = {
            tuple(r) for r in spark.read.parquet(f"{s2}/{tbl}").collect()
        }
        want = {
            tuple(r) for r in spark.read.parquet(f"{truth_dir}/{tbl}").collect()
        }
        assert got == want, tbl
    got_post = {
        (r["doc_id"], r["shingle"])
        for r in spark.read.parquet(f"{s2}/postings").collect()
    }
    want_post = {
        (r["doc_id"], r["shingle"])
        for r in spark.read.parquet(f"{truth_dir}/postings").collect()
    }
    assert got_post == want_post

    got_labels = _d(labels2)
    deleted_ids = {r["doc_id"] for r in deletes.collect()}
    surv_ids = {r["doc_id"] for r in surv.select("doc_id").collect()}
    assert set(got_labels) == surv_ids
    assert not (set(got_labels) & deleted_ids)
    # min-canonical partition: every component id is the min of its
    # own member set (deleted canonical members must be replaced)
    by_comp: dict = {}
    for i, c in got_labels.items():
        by_comp.setdefault(c, []).append(i)
    for c, members in by_comp.items():
        assert c == min(members)


def test_delete_component_split(spark, tmp_path):
    """Deletion can DISCONNECT a cluster: a path corpus a—b—c (J(a,b)
    and J(b,c) ≥ 0.6 but J(a,c) < 0.6) collapses to two singletons
    when the bridge doc b is taken down. Pins the re-cluster path —
    carrying the old component through would leave a and c falsely
    fused."""
    from apache_spark_irs_form_990_spark.operators.incremental import (
        apply_delete_batch,
    )

    words = [f"w{i}" for i in range(1, 21)]
    a_txt = " ".join(words[0:14])  # 12 shingles, all in b
    b_txt = " ".join(words)  # 18 shingles
    c_txt = " ".join(words[6:20])  # 12 shingles, all in b; 6 shared with a
    corpus = spark.createDataFrame(
        [(1, a_txt), (2, b_txt), (3, c_txt)], "doc_id long, text string"
    )
    sdir, s2 = str(tmp_path / "state"), str(tmp_path / "state_del")
    write_standing_state(spark, corpus, sdir)
    before = _d(spark.read.parquet(f"{sdir}/labels"))
    assert before == {1: 1, 2: 1, 3: 1}  # one path-connected cluster

    deletes = spark.createDataFrame([(2,)], "doc_id long")
    after = _d(apply_delete_batch(spark, sdir, deletes, out_state_dir=s2))
    assert after == {1: 1, 3: 3}  # split into singletons


def test_state_cluster_histogram_tracks_deletes(spark, tmp_path):
    """The corpus-health report reads the MUTABLE state (VERDICT r9
    task 7): after a takedown lands, the state-backed cluster-size
    histogram equals the histogram of a from-scratch rebuild of the
    survivors (the delete pass's strong equivalence, aggregated)."""
    from apache_spark_irs_form_990_spark.operators.incremental import (
        apply_delete_batch,
        fixture_delete_set,
        state_cluster_histogram,
    )

    base, _, _ = _corpus(spark)
    sdir, s2 = str(tmp_path / "state"), str(tmp_path / "state_del")
    write_standing_state(spark, base, sdir)
    apply_delete_batch(
        spark, sdir, fixture_delete_set(base), out_state_dir=s2
    ).collect()

    surv = base.join(fixture_delete_set(base), "doc_id", "anti")
    truth_dir = str(tmp_path / "truth")
    write_standing_state(spark, surv, truth_dir)
    got = {
        (r["cluster_size"], r["n_clusters"])
        for r in state_cluster_histogram(spark, s2).collect()
    }
    want = {
        (r["cluster_size"], r["n_clusters"])
        for r in state_cluster_histogram(spark, truth_dir).collect()
    }
    assert got == want


def test_delete_edge_cases(spark, tmp_path):
    """Two takedown edges: deleting ids that don't exist is a no-op
    (state tables and labels byte-identical — a replayed tombstone
    batch must not drift the state), and deleting the ENTIRE corpus
    (a whole-source license revocation) returns an empty label set
    without erroring."""
    from apache_spark_irs_form_990_spark.operators.incremental import (
        apply_delete_batch,
    )

    words = [f"w{i}" for i in range(1, 21)]
    corpus = spark.createDataFrame(
        [(1, " ".join(words[0:14])), (2, " ".join(words)), (3, " ".join(words[6:20]))],
        "doc_id long, text string",
    )
    sdir = str(tmp_path / "state")
    write_standing_state(spark, corpus, sdir)
    before_labels = _d(spark.read.parquet(f"{sdir}/labels"))

    # nonexistent ids: full no-op
    ghosts = spark.createDataFrame([(99,), (100,)], "doc_id long")
    out1 = str(tmp_path / "after_ghosts")
    got = _d(apply_delete_batch(spark, sdir, ghosts, out_state_dir=out1))
    assert got == before_labels
    for tbl in ("shingle_df", "sizes"):
        a = {tuple(r) for r in spark.read.parquet(f"{sdir}/{tbl}").collect()}
        b = {tuple(r) for r in spark.read.parquet(f"{out1}/{tbl}").collect()}
        assert a == b, tbl

    # total takedown: empty survivor set, no error
    everyone = corpus.select("doc_id")
    assert apply_delete_batch(spark, sdir, everyone).count() == 0
