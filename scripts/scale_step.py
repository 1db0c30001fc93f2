"""Scale-step study (VERDICT r3 task 5): run the dedup/ANN family at
sf0.01 / sf0.1 / synthetic-sf1 and record CANDIDATE-PAIR counts next
to runtimes — the empirical check that banded candidate generation
grows ~linearly in corpus size, which no fixed-SF oracle can show.

No sf1 testdata exists, so sf1 is synthesized at 10x sf0.1 into
/tmp/spark990_scale/sf1 (testdata itself is read-only): 10 deterministic
copies of documents/embeddings with content MUTATED per copy — every
7th word gets a copy-suffix (so copies are near- but not exact
duplicates: shingle overlap ~0.5, the realistic near-dup regime) and
embeddings rotate by the copy index (different hyperplane projections,
so LSH buckets spread instead of stacking 10 exact clones per bucket,
which would fake quadratic growth that no natural corpus has).

Usage: python scripts/scale_step.py   (writes SCALE_STEP_r04.json)
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
QUERIES = [
    "dedup_minhash_banding_md5",
    "dedup_near_embedding",
    "sim_ann_lsh_multiprobe",
    "pipeline_dedup_cascade",
]


def synthesize_sf1(spark, base: str = "/root/testdata/sf0.1", copies: int = 10) -> str:
    out = os.path.join(SCALE_ROOT, "sf1")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(base, "embeddings.parquet"))

    doc_parts, emb_parts = [], []
    for k in range(copies):
        if k == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
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
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    e.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def measure(spark, sf_dir: str) -> dict:
    from apache_spark_irs_form_990_spark import registry
    from apache_spark_irs_form_990_spark.operators.dedup import band_signatures
    from apache_spark_irs_form_990_spark.operators.similarity import (
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

    for name in QUERIES:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_s"] = round(best, 3)
    return out


def main() -> None:
    from apache_spark_irs_form_990_spark.session import get_session

    spark = get_session(app_name="scale_step")
    sf1 = synthesize_sf1(spark)
    rows = [
        measure(spark, "/root/testdata/sf0.01"),
        measure(spark, "/root/testdata/sf0.1"),
        measure(spark, sf1),
    ]
    result = {"queries": QUERIES, "steps": rows}
    path = os.path.join(REPO_ROOT, "SCALE_STEP_r04.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
