"""Property-based oracle tests (SURVEY.md §5.2 item 5): hypothesis
generates small frames and predicate/aggregation parameters; Spark and
DuckDB must agree on every one. This probes the operator semantics the
fixed testdata can't reach — empty groups, all-null columns, negative
thresholds, duplicate keys, empty results.

Determinism rules as everywhere: integer aggregates only (exact under
any summation order), explicit schemas, unique tiebreak columns for
window ordering.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import canonicalize

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),               # k: group key
        st.one_of(st.none(), st.integers(-1000, 1000)),      # v: nullable measure
        st.text(alphabet="abc ", max_size=6),                # s: short string
    ),
    min_size=0,
    max_size=40,
)

SCHEMA = "k int, v double, s string"


def _frames(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "s"])
    # v as float64 in BOTH engines: a nullable int column would promote
    # to float in DuckDB but stay integral in Spark, and stringified
    # canonical forms would differ ('1' vs '1.000000'). The generated
    # ints are < 2^53 so float64 sums stay exact and order-independent.
    pdf["v"] = pdf["v"].astype("float64")
    pdf["id"] = range(len(pdf))  # unique tiebreak
    sdf = spark.createDataFrame(pdf, schema=SCHEMA + ", id long")
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


def _assert_same(sdf, con, sql):
    actual = canonicalize(sdf.toPandas())
    expected = canonicalize(con.execute(sql).fetchdf())
    assert list(actual.columns) == list(expected.columns)
    # list compare, not DataFrame.equals: empty frames carry engine-
    # specific dtypes that .equals would flag despite identical values
    assert actual.values.tolist() == expected.values.tolist(), (
        f"mismatch:\nspark:\n{actual}\nduckdb:\n{expected}"
    )


@given(rows=rows_st, thr=st.integers(-500, 500))
@settings(**SETTINGS)
def test_filter_groupby_agg(spark, rows, thr):
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    out = (
        sdf.filter(F.col("v") > thr)
        .groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count("*").alias("n"),
            F.max("s").alias("max_s"),
        )
    )
    _assert_same(
        out,
        con,
        f"SELECT k, sum(v) AS sum_v, count(*) AS n, max(s) AS max_s "
        f"FROM t WHERE v > {thr} GROUP BY k",
    )


@given(rows=rows_st)
@settings(**SETTINGS)
def test_running_sum_window(spark, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = sdf.select("id", "k", F.sum("v").over(w).alias("run_v"))
    _assert_same(
        out,
        con,
        "SELECT id, k, sum(v) OVER (PARTITION BY k ORDER BY id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_v FROM t",
    )


@given(
    base=st.dictionaries(st.integers(0, 8), st.integers(-50, 50), max_size=9),
    changes=st.dictionaries(
        st.integers(0, 12),
        st.tuples(st.sampled_from(["U", "I", "D"]), st.integers(-50, 50)),
        max_size=13,
    ),
)
@settings(**SETTINGS)
def test_merge_apply_semantics(spark, base, changes):
    """merge_apply == the dictionary-update model: D removes the key,
    U/I upsert the payload, untouched keys pass through."""
    from apache_spark_irs_form_990_spark.operators.merge import merge_apply

    expected = dict(base)
    for k, (op, v) in changes.items():
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = v

    bdf = spark.createDataFrame(
        list(base.items()) or [(None, None)], "key int, val int"
    )
    if not base:
        bdf = bdf.filter("key IS NOT NULL")
    cdf = spark.createDataFrame(
        [(k, op, v) for k, (op, v) in changes.items()] or [(None, None, None)],
        "key int, op string, val int",
    )
    if not changes:
        cdf = cdf.filter("key IS NOT NULL")
    got = {
        r["key"]: r["val"]
        for r in merge_apply(bdf, cdf, key="key").collect()
    }
    assert got == expected


@given(rows=rows_st, rows2=rows_st)
@settings(**SETTINGS)
def test_left_join_agg(spark, rows, rows2):
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    pdf2 = pd.DataFrame(rows2, columns=["k", "v", "s"])
    pdf2["v"] = pdf2["v"].astype("float64")
    pdf2["id"] = range(len(pdf2))
    sdf2 = spark.createDataFrame(pdf2, schema=SCHEMA + ", id long")
    con.register("t2", pdf2)
    out = (
        sdf.alias("a")
        .join(sdf2.alias("b"), F.col("a.k") == F.col("b.k"), "left")
        .groupBy(F.col("a.id").alias("id"))
        .agg(
            F.count(F.col("b.id")).alias("n_match"),
            F.sum(F.col("b.v")).alias("sum_bv"),
        )
    )
    _assert_same(
        out,
        con,
        "SELECT a.id AS id, count(b.id) AS n_match, sum(b.v) AS sum_bv "
        "FROM t a LEFT JOIN t2 b ON a.k = b.k GROUP BY a.id",
    )


events_st = st.lists(
    st.tuples(
        st.integers(0, 3),       # user
        st.integers(0, 20),      # ts (small domain forces ties)
        st.booleans(),           # is_purchase
    ),
    min_size=0,
    max_size=30,
)


@given(evts=events_st)
@settings(**SETTINGS)
def test_asof_join_composition(spark, evts):
    """The window-composition as-of join (joins.py join_asof_event)
    must agree with DuckDB's native ASOF LEFT JOIN on arbitrary event
    sets — including same-timestamp ties (click at ts == purchase at
    ts matches) and users with no clicks (NULL)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(evts, columns=["user", "ts", "is_p"])
    pdf["eid"] = range(len(pdf))
    sdf = spark.createDataFrame(pdf, schema="user int, ts int, is_p boolean, eid long")
    con = duckdb.connect()
    con.register("ev", pdf)

    clicks = sdf.filter(~F.col("is_p")).select(
        "user", F.col("ts").alias("ev_ts"), F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("eid"),
    )
    purchases = sdf.filter(F.col("is_p")).select(
        "user", F.col("ts").alias("ev_ts"), F.lit(1).alias("kind"), "eid",
    )
    w = (
        Window.partitionBy("user")
        .orderBy("ev_ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        clicks.unionByName(purchases)
        .withColumn(
            "last_click_ts",
            F.last(F.when(F.col("kind") == 0, F.col("ev_ts")), ignorenulls=True).over(w),
        )
        .filter(F.col("kind") == 1)
        .select("eid", "user", F.col("ev_ts").alias("p_ts"), "last_click_ts")
    )
    _assert_same(
        out,
        con,
        "SELECT p.eid, p.user, p.ts AS p_ts, c.ts AS last_click_ts "
        "FROM (SELECT * FROM ev WHERE is_p) p "
        "ASOF LEFT JOIN (SELECT * FROM ev WHERE NOT is_p) c "
        "ON p.user = c.user AND p.ts >= c.ts",
    )


@given(rows=rows_st, rows2=rows_st)
@settings(**SETTINGS)
def test_union_distinct_except(spark, rows, rows2):
    import pandas as pd

    sdf, con = _frames(spark, rows)
    pdf2 = pd.DataFrame(rows2, columns=["k", "v", "s"])
    pdf2["id"] = range(len(pdf2))
    sdf2 = spark.createDataFrame(pdf2, schema=SCHEMA + ", id long")
    con.register("t2", pdf2)
    out = (
        sdf.select("k", "s")
        .unionByName(sdf2.select("k", "s"))
        .distinct()
        .exceptAll(sdf2.select("k", "s").distinct())
    )
    _assert_same(
        out,
        con,
        "SELECT DISTINCT k, s FROM (SELECT k, s FROM t UNION ALL SELECT k, s FROM t2) "
        "EXCEPT ALL SELECT DISTINCT k, s FROM t2",
    )


@given(
    evts=st.lists(
        st.tuples(
            st.integers(0, 3),                    # user
            st.sampled_from(["a", "b", "c"]),     # state
        ),
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_scd2_interval_model(spark, evts):
    """SCD2 compaction against a pure-Python interval model: compacted
    intervals must tile each user's event range, alternate states, and
    mark exactly one open (is_current) interval per active user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(evts, columns=["u", "state"])
    pdf["id"] = range(len(pdf))  # event time = arrival order, unique
    sdf = spark.createDataFrame(pdf, schema="u int, state string, id long")

    w = Window.partitionBy("u").orderBy("id")
    changes = (
        sdf.withColumn("prev", F.lag("state").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
    )
    out = (
        changes.select(
            "u",
            "state",
            F.col("id").alias("valid_from"),
            F.lead("id").over(Window.partitionBy("u").orderBy("id")).alias(
                "valid_to"
            ),
        )
        .toPandas()
        .sort_values(["u", "valid_from"], ignore_index=True)
    )

    # model: itertools.groupby-style compaction per user
    model = []
    for u in sorted(pdf["u"].unique()):
        seq = pdf[pdf["u"] == u].sort_values("id")
        runs = []
        for _, r in seq.iterrows():
            if not runs or runs[-1][0] != r["state"]:
                runs.append([r["state"], r["id"]])
        for i, (state, start) in enumerate(runs):
            end = runs[i + 1][1] if i + 1 < len(runs) else None
            model.append((u, state, start, end))
    model_df = pd.DataFrame(
        model, columns=["u", "state", "valid_from", "valid_to"]
    )
    out = out.astype(object).where(pd.notna(out), None)
    model_df = model_df.astype(object).where(pd.notna(model_df), None)
    assert out.astype(str).values.tolist() == model_df.astype(str).values.tolist()


@given(
    lines=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 6)),  # (order, part)
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_basket_pairs_bruteforce(spark, lines):
    """Co-occurrence pair counts against an itertools brute force —
    duplicate lines must not inflate counts (DISTINCT pre-pass)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    pdf = pd.DataFrame(lines, columns=["ok", "part"])
    sdf = spark.createDataFrame(pdf, schema="ok int, part int")

    items = sdf.distinct()
    a = items.select(F.col("ok").alias("oka"), F.col("part").alias("pa"))
    b = items.select(F.col("ok").alias("okb"), F.col("part").alias("pb"))
    out = (
        a.join(b, (F.col("oka") == F.col("okb")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n"))
        .toPandas()
        .sort_values(["pa", "pb"], ignore_index=True)
    )

    from collections import Counter

    cnt = Counter()
    for ok in pdf["ok"].unique():
        parts = sorted(set(pdf[pdf["ok"] == ok]["part"]))
        for x, y in combinations(parts, 2):
            cnt[(x, y)] += 1
    model_df = pd.DataFrame(
        [(x, y, n) for (x, y), n in sorted(cnt.items())],
        columns=["pa", "pb", "n"],
    )
    if len(out) == 0 and len(model_df) == 0:
        return
    assert out.values.tolist() == model_df.values.tolist()


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=20), min_size=1, max_size=15
    )
)
@settings(**SETTINGS)
def test_normalized_fingerprint_invariance(spark, texts):
    """The normalization fingerprint (lower/trim/collapse-whitespace →
    md5) must be invariant under case flips and whitespace padding, and
    distinct for texts that differ after normalization."""
    from pyspark.sql import functions as F

    rows = []
    for i, t in enumerate(texts):
        rows.append((2 * i, t))
        rows.append((2 * i + 1, "  " + t.upper() + " "))  # mutated twin
    pdf = pd.DataFrame(rows, columns=["id", "text"])
    sdf = spark.createDataFrame(pdf, schema="id long, text string")
    norm_fp = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " "))
    out = sdf.select("id", norm_fp.alias("fp")).toPandas()
    fp = dict(zip(out["id"], out["fp"]))

    import hashlib
    import re

    for i, t in enumerate(texts):
        # twin pairs always collapse
        assert fp[2 * i] == fp[2 * i + 1]
        # fingerprint equals the python model of the same normalization
        model = hashlib.md5(
            re.sub(" +", " ", t.lower().strip()).encode()
        ).hexdigest()
        assert fp[2 * i] == model


@given(
    counts=st.lists(
        st.tuples(st.integers(0, 4), st.integers(1, 30)),  # (type, n)
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_entropy_identity_bounds(spark, counts):
    """The ln-identity entropy aggregate must equal the direct
    -Σ p·ln p within float tolerance and respect 0 <= H <= ln(k)."""
    import math

    from pyspark.sql import functions as F

    # collapse duplicate types (mirror groupBy(user,type) pre-agg)
    agg: dict[int, int] = {}
    for t, n in counts:
        agg[t] = agg.get(t, 0) + n
    pdf = pd.DataFrame(
        [(t, n) for t, n in sorted(agg.items())], columns=["t", "n_t"]
    )
    sdf = spark.createDataFrame(pdf, schema="t int, n_t long")
    n = F.sum("n_t").cast("double")
    out = sdf.agg(
        (
            F.log(n)
            - F.sum(F.col("n_t").cast("double") * F.log(F.col("n_t").cast("double")))
            / n
        ).alias("h")
    ).collect()[0]["h"]

    total = sum(agg.values())
    model = -sum(
        (c / total) * math.log(c / total) for c in agg.values()
    )
    assert abs(out - model) < 1e-9
    assert -1e-12 <= out <= math.log(len(agg)) + 1e-9


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # doc id
            st.integers(min_value=1, max_value=60),     # dup-gram start pos
        ),
        min_size=0,
        max_size=50,
        unique=True,
    ),
    k=st.integers(min_value=1, max_value=20),            # gram width
)
@settings(**SETTINGS)
def test_interval_union_sweep_bruteforce(spark, docs, k):
    """The island sweep `dedup_substring_coverage` uses for its exact
    interval-union length (running-max break flag + island numbering +
    per-island max(e)-min(i)+1) must equal the brute-force union of
    [i, i+k-1] token ranges — including overlapping, nested, and
    adjacent windows, which hypothesis generates freely."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    expected = {}
    grams = {}
    for d, i in docs:
        expected.setdefault(d, set()).update(range(i, i + k))
        grams[d] = grams.get(d, 0) + 1
    if not docs:
        return
    sdf = spark.createDataFrame(
        [(d, i) for d, i in docs], schema="doc_id int, i int"
    )
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    prev_max_e = F.max(F.col("i") + (k - 1)).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = sdf.select(
        "doc_id",
        "i",
        (F.col("i") + (k - 1)).alias("e"),
        F.when(prev_max_e >= F.col("i"), 0).otherwise(1).alias("brk"),
    )
    islands = swept.withColumn(
        "isl",
        F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    got = {
        r.doc_id: (r.covered, r.n_pos)
        for r in islands.groupBy("doc_id", "isl")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            (F.max("e") - F.min("i") + 1).alias("ilen"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("ilen").alias("covered"), F.sum("n_pos").alias("n_pos")
        )
        .collect()
    }
    assert got == {
        d: (len(expected[d]), grams[d]) for d in expected
    }, f"k={k} docs={docs}"


def test_zorder_interleave_bijective(spark):
    """The 16-bit Morton interleave in sources/layout.py must be a
    BIJECTION from (cx, cy) in [0,255]^2 onto [0, 65535] with the
    documented bit layout (cx on even bits, cy on odd) — one wrong
    shift would silently degrade z-locality without failing any
    result-level oracle (the rectangle query is layout-independent).
    Checked exhaustively over the whole domain."""
    from pyspark.sql import functions as F

    from apache_spark_irs_form_990_spark.sources.layout import _zval

    grid = (
        spark.range(0, 65536)
        .select(
            (F.col("id") % 256).cast("int").alias("cx"),
            (F.col("id") / 256).cast("int").alias("cy"),
        )
        .select(
            "cx", "cy", _zval(F.col("cx"), F.col("cy")).cast("long").alias("z")
        )
    )
    agg = grid.agg(
        F.count_distinct("z").alias("nz"),
        F.min("z").alias("mn"),
        F.max("z").alias("mx"),
        # de-interleave: even bits -> cx, odd bits -> cy, must match
        F.count(
            F.when(
                sum(
                    F.shiftleft(
                        F.shiftright(F.col("z"), 2 * i).bitwiseAND(F.lit(1)), i
                    )
                    for i in range(8)
                )
                != F.col("cx"),
                1,
            )
        ).alias("bad_cx"),
        F.count(
            F.when(
                sum(
                    F.shiftleft(
                        F.shiftright(F.col("z"), 2 * i + 1).bitwiseAND(
                            F.lit(1)
                        ),
                        i,
                    )
                    for i in range(8)
                )
                != F.col("cy"),
                1,
            )
        ).alias("bad_cy"),
    ).collect()[0]
    assert agg.nz == 65536 and agg.mn == 0 and agg.mx == 65535
    assert agg.bad_cx == 0 and agg.bad_cy == 0
