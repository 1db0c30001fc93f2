"""Scale probe for the r11 lakehouse consumer path (SCALE.md §20):
create → MERGE → change feed on synthetically scaled document corpora
(the same offset-copy scaling the scale-step sweep uses), timing each
leg and recording the touched-file evidence for the O(changed files)
claim.

Two merge shapes per decade:
  * RANGE-LOCAL batch — change keys confined to one narrow key range
    (the realistic nightly shape: new crawl partitions, one tenant,
    one date). Must touch ~1 of the table's files; the feed then
    reads only those.
  * UNIFORM batch — the same row count spread over the whole key
    domain (the adversarial shape). Touches every file by design;
    the feed's cost scales with the rewrite, not the table.

Usage: python scripts/cdf_scale_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> int:
    from pyspark.sql import functions as F

    from apache_spark_irs_form_990_spark.functions.scratch import ScratchDirs
    from apache_spark_irs_form_990_spark.session import get_session
    from apache_spark_irs_form_990_spark.sources.lakehouse import (
        _read_commit,
        create_table,
        delete_keys_mor,
        latest_version,
        merge_into,
        read_changes,
        snapshot_files,
    )
    from apache_spark_irs_form_990_spark.tables import load

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="cdf_scale_probe", shuffle_partitions=32)
    dirs = ScratchDirs("spark990_cdfprobe")
    docs0 = load(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs0.count()
    out: dict = {"sf_dir": sf_dir, "base_docs": n0, "decades": {}}

    for mult in (10, 100, 1000):
        copies = spark.range(mult).select(
            (F.col("id") * 10_000_000).alias("off")
        )
        corpus = (
            docs0.crossJoin(copies)
            .select((F.col("doc_id") + F.col("off")).alias("doc_id"), "text")
            .localCheckpoint()
        )
        n = corpus.count()
        n_files = max(8, mult // 4)
        path = dirs.new_dir(f"m{mult}")
        t0 = time.time()
        create_table(spark, path, corpus, key="doc_id", n_files=n_files)
        t_create = time.time() - t0
        rec: dict = {
            "rows": n,
            "n_files": len(snapshot_files(path, 0)),
            "create_s": round(t_create, 2),
            "merges": {},
        }

        batch_n = max(n // 100, 1)  # a 1% CDC batch
        local = corpus.filter(F.col("doc_id") < batch_n).select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, "D").otherwise("U").alias("op"),
            F.concat(F.lit("v2 "), F.col("text")).alias("text"),
        )
        uniform = corpus.filter(F.col("doc_id") % 100 == 7).select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, "D").otherwise("U").alias("op"),
            F.concat(F.lit("v2 "), F.col("text")).alias("text"),
        )
        for name, changes in (("range_local", local), ("uniform", uniform)):
            v_before = latest_version(path)
            t0 = time.time()
            v = merge_into(spark, path, changes)
            t_merge = time.time() - t0
            c = _read_commit(path, v)
            t0 = time.time()
            feed_counts = {
                r["_change_type"]: r["n"]
                for r in read_changes(spark, path, v_from=v, v_to=v)
                .groupBy("_change_type")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            t_feed = time.time() - t0
            rec["merges"][name] = {
                "batch_rows": changes.count(),
                "merge_s": round(t_merge, 2),
                "files_removed": len(c.get("removed", [])),
                "files_added": len(c.get("added", {})),
                "files_live_before": len(snapshot_files(path, v_before)),
                "feed_s": round(t_feed, 2),
                "feed_counts": feed_counts,
            }
            print(f"mult={mult} {name}: {rec['merges'][name]}", flush=True)
        # r11 §20.2: the SAME adversarial shape (uniform 1% spread,
        # deletes only) through merge-on-read deletion vectors — the
        # takedown that under copy-on-write rewrote every file. DV
        # still scans the touched files to find positions, but writes
        # O(batch) positions and zero data files; the feed then reads
        # O(batch) too.
        mor_keys = corpus.filter(F.col("doc_id") % 100 == 23).select("doc_id")
        t0 = time.time()
        v = delete_keys_mor(spark, path, mor_keys)
        t_mor = time.time() - t0
        c = _read_commit(path, v)
        t0 = time.time()
        feed_n = (
            read_changes(spark, path, v_from=v, v_to=v).count()
        )
        t_feed = time.time() - t0
        rec["mor_delete_uniform"] = {
            "batch_rows": mor_keys.count(),
            "delete_s": round(t_mor, 2),
            "files_rewritten": len(c.get("removed", [])),
            "dv_files": len(c["dv"]["files"]),
            "dv_rows": c["dv"]["rows"],
            "feed_s": round(t_feed, 2),
            "feed_rows": feed_n,
        }
        print(f"mult={mult} mor: {rec['mor_delete_uniform']}", flush=True)
        out["decades"][str(mult)] = rec
        print(f"mult={mult}: rows={n} create={t_create:.1f}s", flush=True)

    dest = sys.argv[1] if len(sys.argv) > 1 else "CDF_SCALE_r11.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
