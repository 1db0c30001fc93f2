"""Scalar functions: string / regex / date / math / array / map / JSON /
conditional (SURVEY.md §2 B7).

The reference's entire scalar-function surface is ``str.lower()``
(``/root/reference/CitiesCountJob.py:21``) and ``str.strip()``
(``/root/reference/IRSSpark.py:248-249``) — executed row-at-a-time in
Python. Here every function is a built-in ``pyspark.sql.functions``
expression: JVM-side, whole-stage-codegen'd, vectorized over the
parquet reader's columnar batches. Nothing in this module crosses into
Python at runtime — that 10-100x difference is the engine's scalar
throughput story at 100 TB.

`fn_string_regex` also carries the reference's namespace-strip bug fix
(SURVEY §2 A′1): a proper regex prefix strip instead of the char-set
``str.strip`` that mangles tag names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           trim(p_type) AS type_trim,
           substr(p_name, 1, 5) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           length(p_name) AS name_len
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/trim/substr/concat/length (reference A9's lower() and
    A5's strip(), generalized)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "fn_string_regex",
    oracle="""
    SELECT t.tag,
           regexp_replace(t.tag, '^\\{[^}]*\\}', '') AS tag_stripped,
           regexp_extract(t.tag, '\\{([^}]*)\\}', 1) AS namespace
    FROM (
      SELECT '{http://www.irs.gov/efile}' || p_name AS tag FROM part
    ) t
    """,
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper XML-namespace strip — the A′1 bug fix. The reference's
    ``elem.tag.strip("{'{http://www.irs.gov/efile}")`` strips a CHAR SET
    (so ``}Filer`` -> ``F``); the correct operation is this regex prefix
    removal (``/root/reference/IRSSpark.py:248``)."""
    tagged = load(spark, sf_dir, "part").select(
        F.concat(F.lit("{http://www.irs.gov/efile}"), F.col("p_name")).alias("tag")
    )
    return tagged.select(
        "tag",
        F.regexp_replace("tag", r"^\{[^}]*\}", "").alias("tag_stripped"),
        F.regexp_extract("tag", r"\{([^}]*)\}", 1).alias("namespace"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           count(*) AS n_orders,
           CAST(max(datediff('day', CAST('1995-01-01' AS DATE),
                             CAST(o_orderdate AS DATE))) AS INT) AS max_days_since
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/datediff over order dates. date_trunc
    emitted as a formatted string; day-diffs as ints (engine-neutral)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.max(
                F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
            )
            .cast("int")
            .alias("max_days_since"),
        )
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(round(l_quantity) AS BIGINT) AS qty_round,
           CAST(ceil(l_discount * 10) AS BIGINT) AS disc_decile,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(floor(sqrt(l_extendedprice)) AS BIGINT) AS price_sqrt_floor,
           CAST(l_quantity AS INT) % 7 AS qty_mod
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/ceil/abs/sqrt/mod arithmetic — all codegen'd column math.
    Irrational results (sqrt) pass through floor so output is integral
    and engine-neutral."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity").cast("long").alias("qty_round"),
        F.ceil(F.col("l_discount") * 10).cast("long").alias("disc_decile"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor(F.sqrt("l_extendedprice")).cast("long").alias("price_sqrt_floor"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))
                AS DOUBLE) / 1000.0 AS sum_milli
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/transform/aggregate higher-order functions over
    the embedding array — all JVM-side (no UDF), which is what makes
    array analytics viable on a 100 TB embedding table.

    The elementwise sum goes through integer-milli units: float32
    summation order differs between engines, integers don't."""
    e = load(spark, sf_dir, "embeddings")
    milli = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000).cast("long"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
        (
            F.aggregate(milli, F.lit(0).cast("long"), lambda acc, x: acc + x)
            .cast("double")
            / 1000.0
        ).alias("sum_milli"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE props IS NOT NULL
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("props").isNotNull())
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        )
    )


@register(
    "fn_map",
    oracle="""
    SELECT r_regionkey,
           CASE r_name WHEN 'AMERICA' THEN 'NEW WORLD' ELSE 'OLD WORLD' END
             AS world,
           r_name AS name
    FROM region
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build + lookup (reference A16's tag->texts transpose,
    relationalized): a literal map applied via element_at. The map
    itself is a Catalyst literal — no join, no UDF."""
    world_map = F.create_map(
        F.lit("AMERICA"), F.lit("NEW WORLD"),
        F.lit("AFRICA"), F.lit("OLD WORLD"),
        F.lit("ASIA"), F.lit("OLD WORLD"),
        F.lit("EUROPE"), F.lit("OLD WORLD"),
        F.lit("MIDDLE EAST"), F.lit("OLD WORLD"),
    )
    return load(spark, sf_dir, "region").select(
        "r_regionkey",
        F.element_at(world_map, F.col("r_name")).alias("world"),
        F.col("r_name").alias("name"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'TOP') AS prio,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END
             AS status_or_null
    FROM orders
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif (reference A15's skip-bad-record
    intent expressed as null semantics)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("1-URGENT")), F.lit("TOP")).alias(
            "prio"
        ),
        F.when(F.col("o_orderstatus") == "O", F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_or_null"),
    )


@register(
    "fn_array_predicates",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.9)) > 0
             AS any_hot,
           len(list_filter(embedding, x -> CAST(x AS DOUBLE) <= -1.0)) = 0
             AS all_gt_m1,
           CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0))
             AS BIGINT) AS n_pos
    FROM embeddings
    """,
)
def fn_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array predicate higher-order functions (exists / forall /
    filter) — short-circuiting JVM-side element scans, no UDF. The
    float32→double widening is bit-exact in both engines, so raw
    threshold compares are safe without the integer trick."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.exists(emb, lambda x: x.cast("double") > 0.9).alias("any_hot"),
        F.forall(emb, lambda x: x.cast("double") > -1.0).alias("all_gt_m1"),
        F.size(F.filter(emb, lambda x: x.cast("double") > 0.0))
        .cast("long")
        .alias("n_pos"),
    )


@register(
    "fn_posexplode_zip",
    oracle="""
    SELECT vec_id, u.pos, u.av, u.bv
    FROM (
      SELECT vec_id,
             unnest([{'pos': CAST(i - 1 AS BIGINT), 'av': a[i], 'bv': b[i]}
                     FOR i IN generate_series(1, 3)]) AS u
      FROM (
        SELECT vec_id,
               list_transform(embedding[1:3],
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS a,
               list_transform(embedding[4:6],
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS b
        FROM embeddings
      )
    )
    WHERE vec_id % 10 = 0
    """,
)
def fn_posexplode_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode of zipped arrays (arrays_zip + posexplode):
    the relational form of 'iterate two sequences in lockstep'. The
    zip is an O(1) struct-view, the explode is partition-local
    Generate — no shuffle until something aggregates."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    milli = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.round(x.cast("double") * 1000).cast("long")
    )
    z = e.select(
        "vec_id",
        milli(F.slice("embedding", 1, 3)).alias("a"),
        milli(F.slice("embedding", 4, 3)).alias("b"),
    ).select("vec_id", F.posexplode(F.arrays_zip("a", "b")).alias("pos", "z"))
    return z.select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("z.a").alias("av"),
        F.col("z.b").alias("bv"),
    )


@register(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(make_date(CAST(year(o_orderdate) AS INT),
                              CAST(month(o_orderdate) AS INT), 1),
                    '%Y-%m-%d') AS month_floor,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d')
             AS plus_2mo,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow_sun1
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date construction and arithmetic: make_date, month addition
    (both engines clamp Jan 31 + 1mo to end-of-Feb), last_day,
    quarter, day-of-week. Emitted as formatted strings/ints so the
    comparison is calendar-value, not engine date-type, equality.
    DOW convention pinned to Sunday=1 (Spark's default; DuckDB's
    dow Sunday=0 is shifted in the oracle)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(
            F.make_date(F.year(d), F.month(d), F.lit(1)), "yyyy-MM-dd"
        ).alias("month_floor"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2mo"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).cast("long").alias("qtr"),
        F.dayofweek(d).cast("long").alias("dow_sun1"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    SELECT l_returnflag, mode_qty, mode_count
    FROM (
      SELECT l_returnflag,
             l_quantity AS mode_qty,
             count(*) AS mode_count,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY count(*) DESC, l_quantity ASC) AS rn
      FROM lineitem
      GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group, deterministically:
    built-in ``mode()`` breaks frequency ties arbitrarily in BOTH
    engines, so this is the count-then-rank formulation with a value
    tiebreak — two aggregates and a tiny window over #distinct-values
    rows, still fully parallel."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", F.col("l_quantity").alias("mode_qty")).agg(
        F.count("*").alias("mode_count")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("mode_count").desc(), F.col("mode_qty").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", "mode_qty", "mode_count")
    )


@register(
    "text_ngram_profile",
    oracle="""
    SELECT gram, count(*) AS cnt
    FROM (
      SELECT unnest([substring(text, i, 3)
                     FOR i IN generate_series(1, length(text) - 2)]) AS gram
      FROM documents
    )
    GROUP BY gram
    ORDER BY cnt DESC, gram ASC
    LIMIT 20
    """,
)
def text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character trigram frequency profile (top 20) — the feature
    space of charset language-ID models. The gram expansion is a
    JVM-side sequence+transform+explode (~length(text) rows per doc,
    partition-local); only (gram, partial count) rows shuffle. Top-20
    via TakeOrderedAndProject with a gram tiebreak."""
    d = load(spark, sf_dir, "documents")
    k = F.length("text") - 2
    idx = F.when(k > 0, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = d.select(
        F.explode(
            F.transform(idx, lambda i: F.col("text").substr(i, F.lit(3)))
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram").asc())
        .limit(20)
    )


@register(
    "fn_map_higher_order",
    oracle="""
    SELECT DISTINCT n_regionkey,
           n_name AS k,
           CAST(n_nationkey * 10 AS BIGINT) AS v
    FROM nation
    WHERE n_nationkey % 2 = 0
    """,
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions round-trip: build a map per region
    from (name → nationkey) entries, transform_values (×10),
    map_filter (even keys only), then explode back to rows. The oracle
    states the same relation without map types (DuckDB's map surface
    is thinner) — proving the map pipeline preserves exactly the
    relational content. Map ops are JVM expressions; the groupBy is
    the only shuffle.

    Map-key contract (r8, found by the dimension edge sweep): a map is
    a KEYED structure, so identical duplicate entries are collapsed
    before `map_from_entries` (array_distinct here, DISTINCT in the
    oracle) — a duplicated dimension row must not abort the build.
    Duplicate keys with CONFLICTING values stay a loud ANSI
    DUPLICATED_MAP_KEY error: silently picking one value would be a
    correctness lie."""
    n = load(spark, sf_dir, "nation")
    per_region = n.groupBy("n_regionkey").agg(
        F.map_from_entries(
            F.array_distinct(F.collect_list(F.struct("n_name", "n_nationkey")))
        ).alias("m")
    )
    transformed = per_region.select(
        "n_regionkey",
        F.map_filter(
            F.transform_values(F.col("m"), lambda k, v: v * 10),
            lambda k, v: v % 20 == 0,
        ).alias("m"),
    )
    return transformed.select(
        "n_regionkey", F.explode("m").alias("k", "v")
    ).select("n_regionkey", "k", F.col("v").cast("long").alias("v"))


@register(
    "join_cross_dims",
    oracle="""
    SELECT r.r_name, s.status, coalesce(o.n, 0) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    LEFT JOIN (
      SELECT n.n_regionkey, o_orderstatus, count(*) AS n
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ) o ON o.n_regionkey = r.r_regionkey AND o.o_orderstatus = s.status
    """,
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one legitimate cross join: a dense report scaffold from two
    TINY dimension domains (5 regions × 3 statuses), left-joined with
    actual counts so empty cells show 0 instead of vanishing. Cross
    joins of anything non-dimension-sized are a bug — that's why Spark
    gates them behind explicit crossJoin()."""
    r = load(spark, sf_dir, "region")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    statuses = o.select(F.col("o_orderstatus").alias("status")).distinct()
    grid = r.crossJoin(statuses)
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    return (
        grid.join(
            counts,
            (grid.r_regionkey == counts.n_regionkey)
            & (grid.status == counts.o_orderstatus),
            "left",
        )
        .select(
            "r_name", "status", F.coalesce("n", F.lit(0)).alias("n_orders")
        )
    )


@register(
    "fn_encode_decode",
    oracle="""
    SELECT n_nationkey,
           to_base64(encode(n_name)) AS b64,
           lower(hex(encode(n_name))) AS hexed,
           decode(from_base64(to_base64(encode(n_name)))) AS roundtrip
    FROM nation
    """,
)
def fn_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encodings: base64/hex over utf-8 bytes, with a
    base64 round-trip back to the original string — the plumbing for
    binary payload columns (multimodal.py) crossing text protocols."""
    n = load(spark, sf_dir, "nation")
    raw = F.encode("n_name", "utf-8")
    return n.select(
        "n_nationkey",
        F.base64(raw).alias("b64"),
        F.lower(F.hex(raw)).alias("hexed"),
        F.decode(F.unbase64(F.base64(raw)), "utf-8").alias("roundtrip"),
    )


@register(
    "fn_math_extended",
    oracle="""
    SELECT q,
           round(sqrt(CAST(q AS DOUBLE)), 6) AS sqrt_q,
           round(exp(CAST(q AS DOUBLE) / 50.0), 6) AS exp_q,
           CASE WHEN q > 0 THEN round(ln(CAST(q AS DOUBLE)), 6)
                ELSE NULL END AS ln_q,
           round(sin(CAST(q AS DOUBLE)), 6) AS sin_q,
           round(pow(1.01, CAST(q AS DOUBLE)), 6) AS pow_q,
           count(*) AS n
    FROM (SELECT CAST(round(l_quantity) AS BIGINT) AS q FROM lineitem)
    GROUP BY q
    """,
)
def fn_math_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental scalar surface: sqrt/exp/ln/sin/pow over the
    quantity domain — grouped FIRST so each function evaluates once per
    distinct value (50 rows), not once per fact row; at 100 TB that
    turns 6e9 libm calls into 50. All outputs rounded to 6 decimals:
    JVM StrictMath and libm agree to ≤1 ulp, which 6-decimal rounding
    absorbs (see analytics_ext module docstring)."""
    li = load(spark, sf_dir, "lineitem")
    g = li.select(
        F.round("l_quantity").cast("long").alias("q")
    ).groupBy("q").agg(F.count("*").alias("n"))
    qd = F.col("q").cast("double")
    return g.select(
        "q",
        F.round(F.sqrt(qd), 6).alias("sqrt_q"),
        F.round(F.exp(qd / 50.0), 6).alias("exp_q"),
        # ln undefined at q = 0: NULL on both engines (DuckDB errors
        # on ln(0), Spark returns NULL — pin the NULL contract)
        F.when(F.col("q") > 0, F.round(F.log(qd), 6)).alias("ln_q"),
        F.round(F.sin(qd), 6).alias("sin_q"),
        F.round(F.pow(F.lit(1.01), qd), 6).alias("pow_q"),
        "n",
    )


@register(
    "fn_regex_extract_all",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(
             list_sort(regexp_extract_all(text, '[a-z]*ow[a-z]*')), ','), '')
               AS hits,
           len(regexp_extract_all(text, '[a-z]*ow[a-z]*')) AS n_hits
    FROM documents
    """,
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: every match per document as an array (the
    multi-match sibling of regexp_extract, needed for entity/URL
    harvesting). Matches emitted sorted and comma-joined — match ORDER
    is identical in both engines (left-to-right), but the sorted,
    serialized scalar form is the only representation every
    canonicalization harness can sort and hash; count comes from the
    same expression, which Catalyst's common-subexpression elimination
    evaluates once."""
    d = load(spark, sf_dir, "documents")
    hits = F.expr("regexp_extract_all(text, '[a-z]*ow[a-z]*', 0)")
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(hits), ",").alias("hits"),
        F.size(hits).cast("long").alias("n_hits"),
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity - 25 = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - 25) END AS per_unit_off25,
           CASE WHEN l_quantity - 25 = 0 THEN NULL
                ELSE CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                          % CAST(l_quantity - 25 AS BIGINT) AS BIGINT) END
               AS cents_mod
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode: `try_divide` / `try_mod`
    return NULL where strict evaluation would raise (division by zero
    when quantity hits the offset). Under ANSI SQL (this engine's
    default) a plain `/` would fail the whole job on one bad row —
    try_* is how a 100 TB pipeline survives dirty denominators without
    disabling ANSI everywhere. Oracle twin states the same semantics
    with explicit CASE guards. The quotient is emitted UNROUNDED:
    both engines produce the bit-identical IEEE double from identical
    operands, whereas round(x, 2) of a near-half-boundary quotient is
    where engine rounding rules diverge (the cents convention exists
    precisely to avoid that — here the raw double is already stable)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    denom = (F.col("l_quantity") - 25).cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("try_divide(l_extendedprice, l_quantity - 25)").alias(
            "per_unit_off25"
        ),
        F.expr(
            "try_mod(CAST(round(l_extendedprice * 100) AS BIGINT),"
            " CAST(l_quantity - 25 AS BIGINT))"
        ).alias("cents_mod"),
    )


@register(
    "fn_timezone_convert",
    oracle="""
    SELECT event_id,
           strftime(timezone('America/New_York',
                             CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'),
                    '%Y-%m-%d %H:%M:%S') AS ny_local,
           strftime(timezone('Asia/Tokyo',
                             CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'),
                    '%Y-%m-%d %H:%M:%S') AS tokyo_local,
           CAST(hour(timezone('America/New_York',
                              CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'))
                AS BIGINT) AS ny_hour
    FROM events
    """,
)
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion: UTC event times rendered in named zones
    (DST-correct via tzdata on both engines; January and July events
    in the fixture cross the EST/EDT boundary). Output as second-
    precision formatted strings — the cross-engine-stable rendering;
    the oracle expression anchors the zone explicitly on both ends so
    it is independent of either engine's session timezone."""
    from apache_spark_irs_form_990_spark.tables import load as _load

    e = _load(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return e.select(
        "event_id",
        F.date_format(ny, fmt).alias("ny_local"),
        F.date_format(tokyo, fmt).alias("tokyo_local"),
        F.hour(ny).cast("long").alias("ny_hour"),
    )
