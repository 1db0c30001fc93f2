"""Data-science / experimentation extensions — hypothesis tests (Welch,
ANOVA), distribution drift (PSI), correlograms, seasonal decomposition,
new-vs-returning traffic split, and the ML data-prep primitives a
training pipeline needs (deterministic train/val/test carving, k-fold
assignment, class weights, embedding-norm audits, term burstiness).

All EXT relative to the reference (whose only aggregate is the
CitiesCount frequency sum, `IRSSpark.py:181` + `CitiesCountJob.py:14-16`);
these generalize that partial+final aggregation pattern to the
experiment-analysis and dataset-curation layer of a 100 TB platform.

Cross-engine determinism (same conventions as sibling modules):

- Moments are EXACT BIGINT sums of integer-valued or integerized
  inputs; closed-form statistics are one double expression written
  with the IDENTICAL association tree on both engines (IEEE ops are
  correctly rounded, so identical inputs + identical tree = identical
  bits). No `pow()` anywhere — squares are written `x*x` because libm
  `pow` is not correctly rounded on every platform.
- Per-group double terms that must be SUMMED across groups are first
  snapped to exact integers (`round(term * 1e6)`), making the sum
  order-independent under any partitioning.
- Deterministic sampling/splits use md5 (cross-engine-stable), never
  `df.sample()` (seed- and partitioning-dependent) — same reasoning
  as [[sample_hash_deterministic]] / [[ml_feature_hash_bucket]].
- Ordering keys over derived doubles carry full integer tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import (
    global_order,
    ntile_from_rn,
)
from apache_spark_irs_form_990_spark.functions.money import (
    cents,
    dsum,
    sql_cents,
    sql_dsum,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


# --------------------------------------------------------------------------
# Hypothesis tests
# --------------------------------------------------------------------------


def _var_expr(q: Column, s: Column, n: Column) -> Column:
    """Sample variance from exact integer moments: (Σx² − (Σx)²/n)/(n−1)."""
    return (q.cast("double") - s.cast("double") * s.cast("double") / n) / (n - 1)


_SQL_VAR = (
    "(CAST({q} AS DOUBLE) - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE) / {n})"
    " / ({n} - 1)"
)


@register(
    "stats_welch_t_test",
    oracle=f"""
    WITH m AS (
      SELECT
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
        CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS s2,
        CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q2
      FROM lineitem
    )
    SELECT n1, n2,
      round(CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2, 6) AS mean_diff,
      round((CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
            / sqrt({_SQL_VAR.format(q="q1", s="s1", n="n1")} / n1
                 + {_SQL_VAR.format(q="q2", s="s2", n="n2")} / n2), 6) AS t_stat,
      round((({_SQL_VAR.format(q="q1", s="s1", n="n1")} / n1
              + {_SQL_VAR.format(q="q2", s="s2", n="n2")} / n2)
             * ({_SQL_VAR.format(q="q1", s="s1", n="n1")} / n1
              + {_SQL_VAR.format(q="q2", s="s2", n="n2")} / n2))
            / (({_SQL_VAR.format(q="q1", s="s1", n="n1")} / n1
                * ({_SQL_VAR.format(q="q1", s="s1", n="n1")} / n1)) / (n1 - 1)
             + ({_SQL_VAR.format(q="q2", s="s2", n="n2")} / n2
                * ({_SQL_VAR.format(q="q2", s="s2", n="n2")} / n2)) / (n2 - 1)),
            6) AS dof
    FROM m
    """,
)
def stats_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on order quantity
    between return flags 'R' and 'A': t statistic and Welch–
    Satterthwaite degrees of freedom. One aggregation pass collects
    six exact BIGINT moments (conditional n/Σq/Σq² per arm — the
    map-side combine handles everything, no join, no second scan);
    the statistic is a single closed-form double expression, so the
    plan is scan → partial agg → 1-row exchange → final agg at any
    data size. Squares are spelled `x*x`, not `pow`, for cross-libm
    bit-identity."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    flag = F.col("l_returnflag")
    m = li.agg(
        F.sum(F.when(flag == "R", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(flag == "R", q).otherwise(0)).alias("s1"),
        F.sum(F.when(flag == "R", q * q).otherwise(0)).alias("q1"),
        F.sum(F.when(flag == "A", 1).otherwise(0)).alias("n2"),
        F.sum(F.when(flag == "A", q).otherwise(0)).alias("s2"),
        F.sum(F.when(flag == "A", q * q).otherwise(0)).alias("q2"),
    )
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    n2, s2, q2 = F.col("n2"), F.col("s2"), F.col("q2")
    vn1 = _var_expr(q1, s1, n1) / n1
    vn2 = _var_expr(q2, s2, n2) / n2
    mean_diff = s1.cast("double") / n1 - s2.cast("double") / n2
    return m.select(
        "n1",
        "n2",
        F.round(mean_diff, 6).alias("mean_diff"),
        F.round(mean_diff / F.sqrt(vn1 + vn2), 6).alias("t_stat"),
        F.round(
            ((vn1 + vn2) * (vn1 + vn2))
            / ((vn1 * vn1) / (n1 - 1) + (vn2 * vn2) / (n2 - 1)),
            6,
        ).alias("dof"),
    )


@register(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS q
      FROM lineitem GROUP BY 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(s) AS BIGINT) AS st,
             CAST(sum(CAST(round((CAST(q AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                            * 1000000) AS BIGINT)) AS BIGINT) AS ssw_micro,
             CAST(sum(CAST(round((CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                            * 1000000) AS BIGINT)) AS BIGINT) AS sb_micro
      FROM g
    )
    SELECT k, nt AS n_total,
      round(CAST(ssw_micro AS DOUBLE) / 1000000.0, 6) AS ss_within,
      round(CAST(sb_micro AS DOUBLE) / 1000000.0
            - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt, 6) AS ss_between,
      round(((CAST(sb_micro AS DOUBLE) / 1000000.0
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt) / (k - 1))
            / ((CAST(ssw_micro AS DOUBLE) / 1000000.0) / (nt - k)), 6) AS f_stat
    FROM t
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of quantity across the return-flag groups.
    Two-level aggregation: the only data-sized pass collects exact
    (n, Σq, Σq²) per group; the second aggregate runs over the tiny
    group table. Per-group double terms (s²/n, the within-group sum
    of squares) are snapped to exact micro-units before the cross-
    group sum so the result is independent of group merge order —
    the same integerize-then-sum discipline as [[agg_geo_harmonic_mean]]."""
    li = load(spark, sf_dir, "lineitem")
    qv = F.col("l_quantity").cast("long")
    g = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(qv).alias("s"),
        F.sum(qv * qv).alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    ssw_term = (q.cast("double") - s.cast("double") * s.cast("double") / n)
    sb_term = s.cast("double") * s.cast("double") / n
    t = g.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(n).alias("nt"),
        F.sum(s).alias("st"),
        F.sum(F.round(ssw_term * 1000000).cast("long")).alias("ssw_micro"),
        F.sum(F.round(sb_term * 1000000).cast("long")).alias("sb_micro"),
    )
    k, nt, st = F.col("k"), F.col("nt"), F.col("st")
    ssw = F.col("ssw_micro").cast("double") / 1000000.0
    ssb = F.col("sb_micro").cast("double") / 1000000.0 - st.cast(
        "double"
    ) * st.cast("double") / nt
    return t.select(
        "k",
        nt.alias("n_total"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(ssb, 6).alias("ss_between"),
        F.round((ssb / (k - 1)) / (ssw / (nt - k)), 6).alias("f_stat"),
    )


@register(
    "stats_psi_drift",
    oracle="""
    WITH b AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS is_a
      FROM orders
    ),
    c AS (SELECT bin, CAST(sum(is_a) AS BIGINT) AS ca,
                 CAST(sum(1 - is_a) AS BIGINT) AS cb FROM b GROUP BY bin),
    t AS (
      SELECT bin, ca, cb,
             CAST(count(*) OVER () AS BIGINT) AS k,
             CAST(sum(ca) OVER () AS BIGINT) AS na,
             CAST(sum(cb) OVER () AS BIGINT) AS nb
      FROM c
    )
    SELECT max(k) AS n_bins, max(na) AS n_a, max(nb) AS n_b,
      round(CAST(sum(CAST(round(
        ((CAST(ca + 1 AS DOUBLE) / (na + k)) - (CAST(cb + 1 AS DOUBLE) / (nb + k)))
        * ln((CAST(ca + 1 AS DOUBLE) / (na + k))
             / (CAST(cb + 1 AS DOUBLE) / (nb + k)))
        * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000.0, 6) AS psi
    FROM t
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-price distribution,
    early period (< 1998) vs late — the standard model-monitoring
    drift score. Prices land in fixed $50k bins by exact integer-cents
    division (no data-dependent quantile pass); both period counts
    come out of ONE aggregation via conditional sums; bin count and
    totals are unordered windows over the tiny bin table. Laplace
    +1 smoothing keeps ln finite on one-sided bins. Per-bin PSI terms
    are integerized to nano-nats before summing (order-independent;
    ≫ the ≤1-ulp cross-libm ln discrepancy, same argument as
    [[text_js_divergence]])."""
    o = load(spark, sf_dir, "orders")
    b = o.select(
        F.expr(f"{'CAST(round(o_totalprice * 100) AS BIGINT)'} div 5000000").alias(
            "bin"
        ),
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"), 1)
        .otherwise(0)
        .alias("is_a"),
    )
    c = b.groupBy("bin").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    w = Window.partitionBy()
    t = c.select(
        "bin",
        "ca",
        "cb",
        F.count("*").over(w).cast("long").alias("k"),
        F.sum("ca").over(w).alias("na"),
        F.sum("cb").over(w).alias("nb"),
    )
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("k"))
    qq = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("k"))
    term_nano = F.round((p - qq) * F.log(p / qq) * 1000000000).cast("long")
    return t.agg(
        F.max("k").alias("n_bins"),
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.round(F.sum(term_nano).cast("double") / 1000000000.0, 6).alias("psi"),
    )


# --------------------------------------------------------------------------
# Time series
# --------------------------------------------------------------------------

_SQL_DAILY_REV = """
    daily AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS rev
      FROM orders GROUP BY 1
    )
"""


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue in exact whole dollars (cents div 100 —
    integer floor, not a rounding double division)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
            ).alias("day")
        )
        .agg(F.sum(cents("o_totalprice")).alias("rc"))
        .select("day", F.expr("rc div 100").alias("rev"))
    )


_ACF_LAGS = (1, 2, 3, 4, 5, 6, 7)


def _acf_oracle() -> str:
    lag_cols = ",\n             ".join(
        f"lag(rev, {k}) OVER (ORDER BY day) AS y{k}" for k in _ACF_LAGS
    )
    stacked = "\n      UNION ALL ".join(
        f"SELECT {k} AS lag_k, rev AS x, y{k} AS y FROM lagged"
        f" WHERE y{k} IS NOT NULL"
        for k in _ACF_LAGS
    )
    return f"""
    WITH {_SQL_DAILY_REV},
    lagged AS (
      SELECT day, rev,
             {lag_cols}
      FROM daily
    ),
    stacked AS (
      {stacked}
    )
    SELECT lag_k, CAST(count(*) AS BIGINT) AS n,
      round((count(*) * CAST(sum(x * y) AS DOUBLE)
             - CAST(sum(x) AS DOUBLE) * sum(y))
            / (sqrt(count(*) * CAST(sum(x * x) AS DOUBLE)
                    - CAST(sum(x) AS DOUBLE) * sum(x))
               * sqrt(count(*) * CAST(sum(y * y) AS DOUBLE)
                      - CAST(sum(y) AS DOUBLE) * sum(y))), 6) AS acf
    FROM stacked GROUP BY lag_k
    """


@register("ts_acf_multi_lag", oracle=_acf_oracle())
def ts_acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlogram: Pearson autocorrelation of daily revenue at lags
    1..7 — the multi-lag generalization of [[ts_autocorr_daily]].
    All seven lag columns come out of ONE window pass over the
    post-aggregation daily series (tiny at any fact size — the
    single-partition sort is over ~n_days rows, not the fact table),
    `stack` unpivots them to (lag, x, y) pairs map-side, and one
    hash aggregate computes the five exact BIGINT moments per lag.
    Daily revenue is held in whole dollars so Σxy stays under 2^63
    through SF ~100; beyond that, swap the moment sums to
    decimal(38,0) (same plan shape)."""
    daily = _daily_revenue(spark, sf_dir)
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev", *[F.lag("rev", k).over(w).alias(f"y{k}") for k in _ACF_LAGS]
    )
    stack_args = ", ".join(f"{k}, rev, y{k}" for k in _ACF_LAGS)
    stacked = lagged.selectExpr(
        f"stack({len(_ACF_LAGS)}, {stack_args}) AS (lag_k, x, y)"
    ).filter(F.col("y").isNotNull())
    n = F.count("*")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    acf = (n * sxy.cast("double") - sx.cast("double") * sy) / (
        F.sqrt(n * sxx.cast("double") - sx.cast("double") * sx)
        * F.sqrt(n * syy.cast("double") - sy.cast("double") * sy)
    )
    return stacked.groupBy("lag_k").agg(
        n.cast("long").alias("n"), F.round(acf, 6).alias("acf")
    )


@register(
    "ts_seasonal_decompose_dow",
    oracle=f"""
    WITH {_SQL_DAILY_REV},
    w AS (
      SELECT day, rev,
             sum(rev) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             count(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
      FROM daily
    ),
    d AS (
      SELECT ((day + 3) % 7) + 1 AS dow,
             CAST(round((rev - CAST(s7 AS DOUBLE) / 7) * 1000000) AS BIGINT) AS dm
      FROM w WHERE n7 = 7
    )
    SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
           round(CAST(sum(dm) AS DOUBLE) / 1000000.0 / count(*), 6) AS seasonal
    FROM d GROUP BY dow
    """,
)
def ts_seasonal_decompose_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition, step one: detrend daily
    revenue with a centered 7-row moving average (full windows only),
    then average the detrended residual per ISO weekday — the
    classical-decomposition seasonal component. The weekday comes from
    pure integer arithmetic on the epoch day number (day 0 = Thursday
    → ISO dow = ((day+3) % 7) + 1), sidestepping locale-dependent
    date builtins entirely. Trend is an exact-integer sum divided
    once; residuals are integerized to micro-dollars before the
    per-dow mean so the aggregation is order-independent. The window
    runs on the post-agg daily series (single partition over ~n_days
    rows — bounded regardless of fact scale)."""
    daily = _daily_revenue(spark, sf_dir)
    fr = Window.orderBy("day").rowsBetween(-3, 3)
    w = daily.select(
        "day",
        "rev",
        F.sum("rev").over(fr).alias("s7"),
        F.count("*").over(fr).alias("n7"),
    )
    dm = F.round(
        (F.col("rev") - F.col("s7").cast("double") / 7) * 1000000
    ).cast("long")
    d = w.filter(F.col("n7") == 7).select(
        (((F.col("day") + 3) % 7) + 1).alias("dow"), dm.alias("dm")
    )
    return d.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(F.sum("dm").cast("double") / 1000000.0 / F.count("*"), 6).alias(
            "seasonal"
        ),
    )


# --------------------------------------------------------------------------
# Behavioral
# --------------------------------------------------------------------------


@register(
    "beh_new_vs_returning",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      FROM events
    ),
    f AS (
      SELECT user_id, day,
             min(day) OVER (PARTITION BY user_id) AS first_day
      FROM ud
    )
    SELECT day,
           CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
    FROM f GROUP BY day
    """,
)
def beh_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into first-ever-seen (new) vs
    returning — the growth-accounting view every product dashboard
    leads with. One user_id exchange serves both the user-day dedup
    and the per-user first-day window (unordered min — no sort frame);
    the final per-day aggregate shuffles only the deduped user-day
    table. No self-join back to events."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).distinct()
    f = ud.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return f.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)).alias(
            "n_returning"
        ),
    )


# --------------------------------------------------------------------------
# ML data prep
# --------------------------------------------------------------------------


@register(
    "ml_train_test_split",
    oracle="""
    WITH s AS (
      SELECT CASE
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
               ELSE 'test' END AS split,
             n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM s GROUP BY split
    """,
)
def ml_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test carve of the document
    corpus by content hash of the key: the first md5 byte partitions
    the hex space at 'cc' (204/256 ≈ 79.7%) and 'e6' (+26/256 ≈
    10.2%). Hash-based splits are stable under re-partitioning,
    re-ingestion order, and engine choice — `df.sample()` and
    `randomSplit()` are neither reproducible cross-engine nor stable
    as the corpus grows (same reasoning as
    [[sample_hash_deterministic]]). Map-side classification; the only
    shuffle carries 3 groups of partial aggregates."""
    docs = load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    s = docs.select(
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test").alias(
            "split"
        ),
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    return s.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@register(
    "ml_kfold_balance",
    oracle=f"""
    WITH f AS (
      SELECT CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                  AS BIGINT) % 5 AS fold,
             o_custkey, o_totalprice, o_orderpriority
      FROM orders
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           {sql_dsum("o_totalprice", "sum_price")},
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
    FROM f GROUP BY fold
    """,
)
def ml_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment by md5 of the order key
    (16 bits of hash mod 5), with the per-fold balance audit that
    validates the split: row count, distinct customers, exact-cents
    revenue, and high-priority share. Hash-mod assignment keeps every
    fold stable as data arrives — no global row numbering, no shuffle
    to assign; the fold id is a map-side expression and the audit is
    one aggregation (distinct-count planned via Expand)."""
    o = load(spark, sf_dir, "orders")
    fold = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 5
    )
    return (
        o.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
            dsum("o_totalprice", "sum_price"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            ).alias("n_urgent"),
        )
    )


@register(
    "ml_class_weights",
    oracle="""
    WITH g AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    )
    SELECT lang, n AS n_docs,
           round(CAST(sum(n) OVER () AS DOUBLE)
                 / (count(*) OVER () * n), 6) AS weight
    FROM g
    """,
)
def ml_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced inverse-frequency class weights per document language
    (sklearn's `class_weight='balanced'`: N / (k · n_c)) — the
    knob that reweights a skewed training corpus. One aggregation
    pass over the data; the N and k normalizers are unordered windows
    over the |langs|-row group table, so no scalar-subquery second
    scan. The weight is one ratio of exact integers (single IEEE
    division — bit-identical cross-engine)."""
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy()
    return g.select(
        "lang",
        F.col("n").alias("n_docs"),
        F.round(
            F.sum("n").over(w).cast("double") / (F.count("*").over(w) * F.col("n")),
            6,
        ).alias("weight"),
    )


@register(
    "ml_embedding_norm_audit",
    oracle="""
    WITH v AS (
      SELECT label,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
               AS BIGINT) AS ss
      FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      round(CAST(sum(CAST(round(sqrt(CAST(ss AS DOUBLE) / 1000000000000.0)
                                * 1000000) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / count(*), 6) AS avg_norm,
      round(min(sqrt(CAST(ss AS DOUBLE) / 1000000000000.0)), 6) AS min_norm,
      round(max(sqrt(CAST(ss AS DOUBLE) / 1000000000000.0)), 6) AS max_norm
    FROM v GROUP BY label
    """,
)
def ml_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm audit per label: count, mean, min, max of
    vector norms — the sanity gate before cosine math (zero or
    exploding norms break similarity search). The squared norm is an
    exact BIGINT via per-element micro-integerization folded entirely
    inside the array (higher-order `aggregate` — no explode, no
    shuffle of elements; only (label, ss) pairs move). sqrt of
    identical doubles is correctly rounded, hence bit-identical;
    the mean re-integerizes per-row norms so the group sum is
    order-independent."""
    emb = load(spark, sf_dir, "embeddings")

    def micro(x: Column) -> Column:
        return F.round(x.cast("double") * 1000000).cast("long")

    ss = F.aggregate(
        "embedding",
        F.lit(0).cast("long"),
        lambda acc, x: acc + micro(x) * micro(x),
    )
    v = emb.select("label", ss.alias("ss"))
    norm = F.sqrt(F.col("ss").cast("double") / 1000000000000.0)
    return v.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.round(
            F.sum(F.round(norm * 1000000).cast("long")).cast("double")
            / 1000000.0
            / F.count("*"),
            6,
        ).alias("avg_norm"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


# --------------------------------------------------------------------------
# Text / corpus curation
# --------------------------------------------------------------------------


@register(
    "text_term_burstiness",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dc AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE term <> '' GROUP BY term, doc_id
    ),
    pt AS (
      SELECT term, CAST(sum(c) AS BIGINT) AS tf,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c * c) AS BIGINT) AS ssc
      FROM dc GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
    SELECT term, tf, df,
           round((CAST(ssc AS DOUBLE) - CAST(tf AS DOUBLE) * tf / nd) / tf,
                 6) AS burstiness
    FROM pt, n
    ORDER BY tf DESC, term LIMIT 20
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (variance-to-mean ratio of per-document counts,
    zeros included) for the corpus's top-20 terms — bursty terms
    concentrate in few documents (topical), VMR≈1 is Poisson-like
    (function words); a standard corpus-curation diagnostic. The VMR
    reduces to (Σc² − tf²/N)/tf, so only exact integer moments
    (tf, df, Σc²) flow through the two aggregation levels; the corpus
    size N is a 1-row broadcast cross join. Top-20 by exact integer
    tf with a term tiebreak plans as TakeOrderedAndProject — no
    global sort."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    dc = tok.groupBy("term", "doc_id").agg(F.count("*").cast("long").alias("c"))
    pt = dc.groupBy("term").agg(
        F.sum("c").alias("tf"),
        F.count("*").cast("long").alias("df"),
        F.sum(F.col("c") * F.col("c")).alias("ssc"),
    )
    n = docs.agg(F.count("*").cast("long").alias("nd"))
    tf, ssc, nd = F.col("tf"), F.col("ssc"), F.col("nd")
    return (
        pt.crossJoin(F.broadcast(n))
        .select(
            "term",
            "tf",
            "df",
            F.round(
                (ssc.cast("double") - tf.cast("double") * tf / nd) / tf, 6
            ).alias("burstiness"),
        )
        .orderBy(F.col("tf").desc(), "term")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Batch 2: rank statistics, inequality, information theory, profiling
# --------------------------------------------------------------------------


@register(
    "stats_spearman_rho",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_discount * 100) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    mq AS (SELECT q, CAST(sum(c) AS BIGINT) AS cq FROM cells GROUP BY q),
    mq2 AS (
      SELECT q,
             2 * (CAST(sum(cq) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) - cq) + cq + 1 AS mx
      FROM mq
    ),
    md AS (SELECT d, CAST(sum(c) AS BIGINT) AS cd FROM cells GROUP BY d),
    md2 AS (
      SELECT d,
             2 * (CAST(sum(cd) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) - cd) + cd + 1 AS my
      FROM md
    ),
    j AS (
      SELECT c, mx, my
      FROM cells JOIN mq2 USING (q) JOIN md2 USING (d)
    ),
    m AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * mx) AS BIGINT) AS sx,
             CAST(sum(c * my) AS BIGINT) AS sy,
             CAST(sum(c * mx * my) AS BIGINT) AS sxy,
             CAST(sum(c * mx * mx) AS BIGINT) AS sxx,
             CAST(sum(c * my * my) AS BIGINT) AS syy
      FROM j
    )
    SELECT n,
      round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
            / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
            6) AS rho
    FROM m
    """,
)
def stats_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and discount with
    EXACT midrank tie handling. Both variables live on tiny integer
    domains (50 quantities × 11 discount cents), so ranks come from
    the domain-collapsed contingency table, not a data-sized sort:
    one aggregation builds the (q, d, count) cells; doubled midranks
    (2·avg-rank, kept integral) derive from running sums over the
    ~50-row marginals; Pearson-over-midranks needs five more exact
    BIGINT moments. The only data-sized pass is the first hash
    aggregate — ranking 600M rows costs the same shuffle as counting
    them. Moment products stay under 2^63 through SF ~1 (Σc·mx² ≤
    4n³); beyond that, decimal(38,0) sums, same plan."""
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").cast("long").alias("q"),
        cents("l_discount").alias("d"),
    ).agg(F.count("*").cast("long").alias("c"))
    cum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    mq2 = (
        cells.groupBy("q")
        .agg(F.sum("c").alias("cq"))
        .select(
            "q",
            (
                2 * (F.sum("cq").over(cum).cast("long") - F.col("cq"))
                + F.col("cq")
                + 1
            ).alias("mx"),
        )
    )
    cum_d = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    md2 = (
        cells.groupBy("d")
        .agg(F.sum("c").alias("cd"))
        .select(
            "d",
            (
                2 * (F.sum("cd").over(cum_d).cast("long") - F.col("cd"))
                + F.col("cd")
                + 1
            ).alias("my"),
        )
    )
    j = cells.join(F.broadcast(mq2), "q").join(F.broadcast(md2), "d")
    c, mx, my = F.col("c"), F.col("mx"), F.col("my")
    m = j.agg(
        F.sum(c).alias("n"),
        F.sum(c * mx).alias("sx"),
        F.sum(c * my).alias("sy"),
        F.sum(c * mx * my).alias("sxy"),
        F.sum(c * mx * mx).alias("sxx"),
        F.sum(c * my * my).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    rho = (n * sxy.cast("double") - sx.cast("double") * sy) / (
        F.sqrt(n * sxx.cast("double") - sx.cast("double") * sx)
        * F.sqrt(n * syy.cast("double") - sy.cast("double") * sy)
    )
    return m.select("n", F.round(rho, 6).alias("rho"))


@register(
    "stats_wilson_ci",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS s
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, s,
      round(CAST(s AS DOUBLE) / n, 6) AS p_hat,
      round(((CAST(s AS DOUBLE) / n + 3.8416 / (2 * n))
             - 1.96 * sqrt((CAST(s AS DOUBLE) / n) * (1 - CAST(s AS DOUBLE) / n) / n
                           + 3.8416 / (4 * n * n)))
            / (1 + 3.8416 / n), 6) AS ci_low,
      round(((CAST(s AS DOUBLE) / n + 3.8416 / (2 * n))
             + 1.96 * sqrt((CAST(s AS DOUBLE) / n) * (1 - CAST(s AS DOUBLE) / n) / n
                           + 3.8416 / (4 * n * n)))
            / (1 + 3.8416 / n), 6) AS ci_high
    FROM g
    """,
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score confidence interval for the high-value rate
    (value ≥ 50) per event type — the binomial CI that behaves at
    extreme rates, which dashboards should use instead of the normal
    approximation. One aggregation pass (n and successes per group);
    the interval is a closed-form double expression from two exact
    integers (z = 1.96, z² = 3.8416 as literals), identical tree both
    engines, so no tolerance needed."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("value") >= 50, 1).otherwise(0)).alias("s"),
    )
    n, s = F.col("n"), F.col("s")
    p = s.cast("double") / n
    center = p + F.lit(3.8416) / (2 * n)
    half = 1.96 * F.sqrt(p * (1 - p) / n + F.lit(3.8416) / (4 * n * n))
    denom = 1 + F.lit(3.8416) / n
    return g.select(
        "event_type",
        "n",
        "s",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("ci_low"),
        F.round((center + half) / denom, 6).alias("ci_high"),
    )


@register(
    "agg_theil_index",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT o.o_orderpriority, g.n,
             -- x -> 0 limit of (x/mu) ln(x/mu) is 0: zero-value orders
             -- contribute nothing instead of ln(0) erroring
             CASE WHEN round(o.o_totalprice * 100) > 0 THEN
             CAST(round(
               (CAST(CAST(round(o.o_totalprice * 100) AS BIGINT) AS DOUBLE)
                / (CAST(g.s AS DOUBLE) / g.n))
               * ln(CAST(CAST(round(o.o_totalprice * 100) AS BIGINT) AS DOUBLE)
                    / (CAST(g.s AS DOUBLE) / g.n))
               * 1000000000) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS term_nano
      FROM orders o JOIN g ON o.o_orderpriority = g.o_orderpriority
    )
    SELECT o_orderpriority, max(n) AS n_orders,
           round(CAST(sum(term_nano) AS DOUBLE) / 1000000000.0 / max(n),
                 6) AS theil
    FROM t GROUP BY o_orderpriority
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of order value per priority class —
    the decomposable entropy-based concentration measure that
    complements [[agg_gini_concentration]] (Gini needs a global rank;
    Theil needs only the group mean). Two passes: a tiny group-mean
    aggregate broadcast back onto the fact scan, then per-row
    (x/μ)·ln(x/μ) terms integerized to nano-nats for an order-
    independent sum. Terms are bounded by (max/μ)·ln(max/μ), so the
    nano-sum holds under 2^63 through ~1e9 rows per group; swap to
    decimal sums beyond."""
    o = load(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.sum(cents("o_totalprice")).alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    j = o.join(F.broadcast(g), "o_orderpriority")
    x = cents("o_totalprice").cast("double")
    mu = F.col("s").cast("double") / F.col("n")
    # x -> 0 limit of (x/mu) ln(x/mu) is 0 (zero-value orders)
    term = F.when(
        cents("o_totalprice") > 0,
        F.round((x / mu) * F.log(x / mu) * 1000000000).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        j.select("o_orderpriority", "n", term.alias("term_nano"))
        .groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.round(
                F.sum("term_nano").cast("double") / 1000000000.0 / F.max("n"), 6
            ).alias("theil"),
        )
    )


@register(
    "agg_entropy_conditional",
    oracle="""
    WITH c AS (
      SELECT isodow(ts) AS dow, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT dow, c,
             CAST(sum(c) OVER (PARTITION BY dow) AS BIGINT) AS cd
      FROM c
    )
    SELECT dow, max(cd) AS n_events,
      round(-(CAST(sum(CAST(round((CAST(c AS DOUBLE) / cd)
                                  * ln(CAST(c AS DOUBLE) / cd)
                                  * 1000000000) AS BIGINT)) AS DOUBLE)
              / 1000000000.0), 6) AS h_bits_nat
    FROM t GROUP BY dow
    """,
)
def agg_entropy_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(event_type | weekday): how predictable
    the event mix is on each ISO weekday — the information-theoretic
    companion to [[beh_user_entropy]] (per-user) and
    [[text_js_divergence]] (per-source drift). The domain collapses
    to ≤ 7×|types| cells in one aggregation; the per-day normalizer
    is an unordered window over that tiny table; each p·ln p term is
    integerized to nano-nats before summing (order-independent,
    ≫ 1-ulp libm ln spread). ISO weekday via `weekday()+1` /
    `isodow` as in [[ts_seasonality_dow]]."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        (F.weekday("ts") + 1).cast("long").alias("dow"), "event_type"
    ).agg(F.count("*").cast("long").alias("c"))
    t = c.select(
        "dow",
        "c",
        F.sum("c").over(Window.partitionBy("dow")).cast("long").alias("cd"),
    )
    p = F.col("c").cast("double") / F.col("cd")
    term = F.round(p * F.log(p) * 1000000000).cast("long")
    return t.groupBy("dow").agg(
        F.max("cd").alias("n_events"),
        F.round(
            -(F.sum(term).cast("double") / 1000000000.0), 6
        ).alias("h_bits_nat"),
    )


@register(
    "beh_type_overlap_jaccard",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    cnt AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ),
    pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both, ca.n AS n_a, cb.n AS n_b,
           round(CAST(p.n_both AS DOUBLE) / (ca.n + cb.n - p.n_both),
                 6) AS jaccard
    FROM pair p
    JOIN cnt ca ON p.type_a = ca.event_type
    JOIN cnt cb ON p.type_b = cb.event_type
    """,
)
def beh_type_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: Jaccard similarity of the user sets
    behind every pair of event types — the segment-overlap question
    ("do purchasers also click?") answered without materializing user
    sets. The (user, type) dedup and the ordered self-join share one
    user_id exchange; pair fan-out is bounded by |types|² per user
    (≤ C(5,2) = 10 pairs here), independent of event volume. Type
    totals broadcast back onto the 10-row pair table."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    cnt = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("uid2"), F.col("event_type").alias("type_b"))
    pair = (
        a.join(
            b,
            (F.col("user_id") == F.col("uid2"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    ca = cnt.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = cnt.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "profile_histogram_equidepth",
    oracle="""
    WITH w AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi
    FROM w GROUP BY bucket
    """,
)
def profile_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order value: 10 buckets of
    equal row count with their exact boundaries — the companion to
    the fixed-width [[agg_histogram_bins]] and the shape optimizers
    use for selectivity estimation. `ntile` is ANSI-identical on both
    engines; the unique (price, key) sort makes bucket assignment
    deterministic under ties. Computed scale-safe: the exact global
    row_number comes from `global_order` (range-partition +
    per-partition rank + broadcast offsets — no single-task window),
    and `ntile_from_rn` reproduces ANSI NTILE arithmetic from that
    rank plus the broadcast total, so the buckets stay hash-identical
    to the oracle's `ntile(10)`. The sloppier 100 TB shortcut —
    `approx_percentile` cutpoints, one pass, no exactness — remains
    noted; the decile COUNTS this exact query audits are what validate
    that approximation."""
    o = load(spark, sf_dir, "orders")
    ranked = global_order(
        o.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        rn_col="_rn",
    )
    total = o.agg(F.count(F.lit(1)).alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "o_totalprice",
            ntile_from_rn(F.col("_rn"), F.col("_total"), 10).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "ops_fulfillment_latency",
    oracle="""
    WITH j AS (
      SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
             (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
               // 86400000000 AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT month, CAST(count(*) AS BIGINT) AS n_lines,
           quantile_cont(lag_days, 0.5) AS p50_days,
           quantile_cont(lag_days, 0.9) AS p90_days
    FROM j GROUP BY month
    """,
)
def ops_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order month (p50/p90
    days) — the accumulating-snapshot metric behind every fulfillment
    SLA dashboard. The orders side prunes to two columns before the
    join (broadcastable at dimension-like sizes; shuffle join with
    AQE otherwise); lag lands as an exact integer day count (floored
    epoch-micros difference), and the exact interpolated percentiles
    use the same `percentile` ↔ `quantile_cont` pairing as
    [[agg_percentiles]]. At 100 TB the exact percentile's per-group
    sort swaps for `approx_percentile` with identical plan shape."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.expr(
            "(unix_micros(cast(l_shipdate as timestamp))"
            " - unix_micros(cast(o_orderdate as timestamp))) div 86400000000"
        ).alias("lag_days"),
    )
    return j.groupBy("month").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.expr("percentile(lag_days, 0.5)").alias("p50_days"),
        F.expr("percentile(lag_days, 0.9)").alias("p90_days"),
    )


@register(
    "text_stopword_coverage",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN token IN ('a', 'the', 'of', 'in', 'to')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
           round(CAST(sum(CASE WHEN token IN ('a', 'the', 'of', 'in', 'to')
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*),
                 6) AS stop_ratio
    FROM tok WHERE token <> ''
    GROUP BY lang
    """,
)
def text_stopword_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword coverage per language — the cheap language-quality
    gate from the C4/Gopher filter families (natural prose carries a
    stable function-word share; machine-generated or boilerplate text
    does not). The stopword list is a tiny literal IN-list compiled
    into codegen (no join); the explode is map-side and the shuffle
    carries |langs| groups of three integers. The ratio is one IEEE
    division of exact counts."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    stop = F.col("token").isin("a", "the", "of", "in", "to")
    n_stop = F.sum(F.when(stop, 1).otherwise(0))
    return tok.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        n_stop.alias("n_stop"),
        F.round(n_stop.cast("double") / F.count("*"), 6).alias("stop_ratio"),
    )


@register(
    "ml_embedding_quantize_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    d AS (
      SELECT vec_id, label, v,
             list_max(list_transform(v, x -> abs(x))) AS maxabs
      FROM m
    )
    SELECT vec_id, label,
           CAST(maxabs AS BIGINT) AS scale_milli,
           array_to_string(list_transform(v,
             x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / maxabs)
                       AS BIGINT)), ',') AS q
    FROM d WHERE maxabs > 0
    """,
)
def ml_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization — the TRANSFORM that builds
    a compressed vector store (fp32 -> int8 = 4x less storage and
    memory bandwidth for ANN serving): per vector, scale =
    max|v_i|/127 and q_i = round(127 * v_i / maxabs) ∈ [-127, 127],
    emitted alongside the per-vector scale needed to dequantize.
    Complements `ml_embedding_quantize_audit` (frontier4_ext), which
    reports the reconstruction ERROR of this exact scheme — that query
    is the go/no-go check, this one materializes the index. Entirely
    in-array (higher-order transform at the scan, no explode, no
    Python); identical double rounding on both engines makes the
    quantized vectors hash-exact. The q vector serializes to a
    positional comma-joined string (the registry's canonical form for
    array outputs — harness hashers cannot sort array cells); a
    production writer would keep it `array<tinyint>`. Zero vectors
    (maxabs=0, unquantizable) are excluded on both engines."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")
        ).alias("v"),
    )
    maxabs = F.array_max(F.transform("v", lambda x: F.abs(x)))
    d = emb.withColumn("maxabs", maxabs).filter(F.col("maxabs") > 0)
    return d.select(
        "vec_id",
        "label",
        F.col("maxabs").cast("long").alias("scale_milli"),
        F.array_join(
            F.transform(
                "v",
                lambda x: F.round(
                    x.cast("double") * 127.0 / F.col("maxabs")
                ).cast("long"),
            ),
            ",",
        ).alias("q"),
    )


@register(
    "sample_weighted_reservoir",
    oracle="""
    WITH keyed AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(round(ln((CAST(concat('0x',
                    substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
                    AS BIGINT) + 1) / 65536.0) * 1000000000) AS BIGINT)
               AS lnu_nano
      FROM orders
    )
    SELECT o_orderkey, price_cents,
           CAST(lnu_nano AS DOUBLE) / price_cents AS es_key
    FROM keyed
    WHERE price_cents > 0
    ORDER BY es_key DESC, o_orderkey
    LIMIT 100
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling without replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each
    row draws a deterministic uniform u from md5 of its key and is
    ranked by u^(1/w) — the top-k under that key IS an exact weighted
    sample without replacement (here w = order value in exact cents,
    k = 100, so high-value orders are proportionally favored). The
    rank is computed in log space, ln(u)/w, which orders identically
    and never overflows.

    Oracle-stability around the one transcendental: u is drawn from a
    16-BIT hash domain, u = (h16+1)/65536 — an exact dyadic double —
    so ln() is evaluated on only 65,536 distinct inputs, and
    tests/test_weighted_sample.py checks Spark and DuckDB agree on the
    nano-nat integerization over that ENTIRE domain (the value-domain
    device the micro-nat family uses, made exhaustive); es_key is then
    an IEEE division of two exact integers, identical cross-engine.

    Scale shape: the key mint is one map-side expression (no shuffle,
    no RNG state — reruns and stragglers redraw identical keys, the
    reproducibility property ad-hoc rand() sampling lacks), and the
    global top-k plans as TakeOrderedAndProject: per-partition k-row
    reservoirs merged at the driver — O(k) memory per task, which is
    precisely the distributed form of the paper's k-heap. Adding data
    never perturbs previously-drawn keys, so the sample composes with
    incremental ingest."""
    u16 = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10
        ).cast("long")
        + 1
    )
    lnu_nano = F.round(F.log(u16 / F.lit(65536.0)) * 1000000000).cast("long")
    # zero-weight rows have sampling probability 0 in E-S (u^(1/w) is
    # undefined at w = 0) and would divide by zero here — excluded on
    # both engines, which IS the estimator's contract
    keyed = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            cents("o_totalprice").alias("price_cents"),
            lnu_nano.alias("lnu_nano"),
        )
        .filter(F.col("price_cents") > 0)
    )
    return (
        keyed.select(
            "o_orderkey",
            "price_cents",
            (F.col("lnu_nano").cast("double") / F.col("price_cents")).alias(
                "es_key"
            ),
        )
        .orderBy(F.col("es_key").desc(), "o_orderkey")
        .limit(100)
    )
