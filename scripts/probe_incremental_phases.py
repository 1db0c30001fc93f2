"""Phase-level timing probe for the incremental-state family (guide
§1: measure before changing). Times each phase of the persisted
nightly/daily/delete pipeline separately at $SPARK_GRAFT_SF_DIR
(default sf0.1), labels jobs, and reports state-table file counts —
the evidence base for OPT-3 in OPTIMIZATION_r11.md."""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from apache_spark_irs_form_990_spark.operators import incremental as inc  # noqa: E402
from apache_spark_irs_form_990_spark.operators.components import (  # noqa: E402
    _doc_jaccard_edges,
    connected_components,
)
from apache_spark_irs_form_990_spark.session import get_session  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{dt:8.3f}  {label}", flush=True)
    return out


def count_files(d):
    n = 0
    for root, _, files in os.walk(d):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="probe_incremental")
    sc = spark.sparkContext

    base, batch = inc.fixture_base_batch(spark, sf_dir)
    state_dir = inc.scratch_state_dir("probe")

    sc.setJobDescription("phase: nightly write_standing_state")
    t(
        "nightly: write_standing_state (all four tables)",
        lambda: inc.write_standing_state(spark, base, state_dir),
    )
    for sub in ("labels", "postings", "shingle_df", "sizes"):
        print(f"    files[{sub}] = "
              f"{count_files(os.path.join(state_dir, sub))}")

    sc.setJobDescription("phase: daily merge (apply_batch)")
    t(
        "daily: apply_batch (labels only)",
        lambda: inc.apply_batch(spark, state_dir, batch)
        .write.format("noop").mode("overwrite").save(),
    )

    sc.setJobDescription("phase: delete batch")
    dels = inc.fixture_delete_set(base)
    t(
        "takedown: apply_delete_batch (labels only)",
        lambda: inc.apply_delete_batch(spark, state_dir, dels)
        .write.format("noop").mode("overwrite").save(),
    )

    out2 = inc.scratch_state_dir("probe_out")
    sc.setJobDescription("phase: delete batch with state write")
    t(
        "takedown: apply_delete_batch + state write",
        lambda: inc.apply_delete_batch(
            spark, state_dir, dels, out_state_dir=out2
        ).write.format("noop").mode("overwrite").save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
