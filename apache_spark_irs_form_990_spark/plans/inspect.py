"""Physical-plan inspection utilities (SURVEY.md §4).

The engine's scale posture is encoded in plan shapes, not prose:
filters must reach the parquet scan, projections must prune the read
schema, dimension joins must broadcast, aggregates must have a partial
phase before the exchange, global top-k must avoid a full sort. These
helpers make those properties assertable in tests (tests/test_plans.py)
so a regression in plan quality fails CI like a wrong answer would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final (AQE-resolved where available) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the scan (PushedFilters: [...])."""
    plan = explain_formatted(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed to scan; PushedFilters lines: {pushed}\n{plan}"
    )


def assert_read_schema_only(df: DataFrame, columns: set[str], table_hint: str) -> None:
    """Assert column pruning: the scan's ReadSchema contains exactly
    `columns` (for the scan whose line mentions `table_hint`)."""
    plan = explain_formatted(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and table_hint in ln:
            inner = ln.split("struct<", 1)[1].rsplit(">", 1)[0]
            got = {c.split(":")[0].strip() for c in inner.split(",") if c.strip()}
            assert got == columns, f"ReadSchema {got} != expected {columns}"
            return
    raise AssertionError(f"no ReadSchema line mentioning {table_hint!r}:\n{plan}")


def _iter_logical_nodes(node):
    """Depth-first walk of a Catalyst logical plan via py4j, descending
    into children AND subquery expressions' plans."""
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_logical_nodes(children.apply(i))
    try:
        subs = node.subqueries()
        for i in range(subs.size()):
            yield from _iter_logical_nodes(subs.apply(i))
    except Exception:  # noqa: BLE001 — node types without subqueries()
        pass


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec in the optimized
    logical plan — each one Spark executes as a single task holding
    that window's entire input ("No Partition Defined for Window
    operation! Moving all data to a single partition"). The scale
    anti-pattern tests/test_plan_lint.py bans for every registered
    query."""
    plan = df._jdf.queryExecution().optimizedPlan()
    hits = []
    for node in _iter_logical_nodes(plan):
        if node.getClass().getSimpleName() == "Window":
            if node.partitionSpec().isEmpty():
                hits.append(node.simpleString(120))
    return hits


_BUCKET_KEY_EQ = None  # compiled lazily below


def unguarded_bucket_joins(df: DataFrame) -> list[str]:
    """Join nodes in the optimized logical plan keyed on an LSH
    bucket-like attribute (``bucket`` / ``band_min`` / ``probe``) on
    both sides of an equality, whose join subtree lacks an OCCUPANCY
    GUARD — a Filter on ``_occ`` (hot-bucket cap / star split,
    `banded_lsh_pairs`) or ``_bucket_seq`` (capped per-bucket index
    sample, `_flat_index`).

    An unguarded join on a small fixed bucket space is the quadratic
    the r4 scale-step measured (Sum over buckets of occ_a*occ_b ~
    n^2/|buckets|): correct at test SF, fatal at corpus scale. The
    guard column names are the structural markers the similarity
    module's capped kernels emit; tests/test_bucket_join_lint.py bans
    new unguarded bucket joins registry-wide the way
    tests/test_plan_lint.py bans unpartitioned windows."""
    import re

    global _BUCKET_KEY_EQ
    if _BUCKET_KEY_EQ is None:
        name = r"(?:bucket|band_min|probe)#\d+L?"  # L = long-typed attr
        _BUCKET_KEY_EQ = re.compile(f"{name} = {name}")
    plan = df._jdf.queryExecution().optimizedPlan()
    hits = []
    for node in _iter_logical_nodes(plan):
        if node.getClass().getSimpleName() != "Join":
            continue
        cond = node.condition()
        if not cond.isDefined():
            continue
        cond_str = cond.get().toString()
        if not _BUCKET_KEY_EQ.search(cond_str):
            continue
        if not _join_input_guarded(node, cond_str):
            hits.append(node.simpleString(160))
    return hits


def _join_input_guarded(join_node, cond_str: str = "") -> bool:
    """True iff a guard Filter (on ``_occ`` / ``_bucket_seq``) sits in
    one of THIS join's direct input subtrees — children only, NOT the
    join's own subquery expressions (r6, ADVICE r5: the r5 search ran
    `_iter_logical_nodes` on the join node itself, which also swept
    subquery plans that feed no join input).

    r7 strengthening (ADVICE r6): a guard Filter only counts if the
    joined bucket-key ATTRIBUTE ID (``bucket#N`` / ``band_min#N`` /
    ``probe#N`` parsed from the join condition) appears in the guard
    filter subtree's OUTPUT — directly, or through the EQUALITY
    CLASSES of the bucket-ish join conditions inside this join's
    inputs (a union-find over ``key#a = key#b`` pairs: the capped
    kernels thread their guard through a `banded ⋈ cold_keys`
    restriction join, so the guard's aggregated bucket id is a
    different exprId that the restriction join equates to the probe
    stream's). This proves the guard sits on (a stream equated to)
    the joined key's producer, so an unrelated capped frame unioned
    into the input no longer vouches for an unguarded bucket join.

    Remaining limitation, documented deliberately: id-equivalence
    shows the guard is on the key-producing stream, not that it
    dominates ALL rows of that stream; the whitelist review in
    tests/test_bucket_join_lint.py remains the human backstop."""
    import re

    _key = r"(?:bucket|band_min|probe)"
    key_ids = set(re.findall(rf"{_key}#(\d+)", cond_str or ""))

    # Union-find over bucket-ish equality pairs from every Join
    # condition in this join's input subtrees.
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        parent[find(a)] = find(b)

    def collect_eqs(node) -> None:
        if node.getClass().getSimpleName() == "Join":
            cond = node.condition()
            if cond.isDefined():
                for a, b in re.findall(
                    rf"{_key}#(\d+)L? = {_key}#(\d+)L?",
                    cond.get().toString(),
                ):
                    union(a, b)
        children = node.children()
        for i in range(children.size()):
            collect_eqs(children.apply(i))

    children = join_node.children()
    for i in range(children.size()):
        collect_eqs(children.apply(i))

    def outputs_key(node) -> bool:
        if not key_ids:
            return True  # no parsed ids -> keep the r6 behavior
        out_ids = set(re.findall(rf"{_key}#(\d+)", node.output().toString()))
        key_roots = {find(k) for k in key_ids}
        return any(find(o) in key_roots for o in out_ids)

    def side_guarded(node) -> bool:
        if node.getClass().getSimpleName() == "Filter":
            fs = node.condition().toString()
            if ("_occ#" in fs or "_bucket_seq#" in fs) and outputs_key(node):
                return True
        children = node.children()
        return any(
            side_guarded(children.apply(i)) for i in range(children.size())
        )

    return any(
        side_guarded(children.apply(i)) for i in range(children.size())
    )


def count_occurrences(df: DataFrame, op: str) -> int:
    return physical_plan(df).count(op)


def assert_in_plan(df: DataFrame, op: str, at_least: int = 1) -> None:
    n = count_occurrences(df, op)
    assert n >= at_least, f"expected >={at_least} {op!r} in plan, found {n}:\n{physical_plan(df)}"


def assert_not_in_plan(df: DataFrame, op: str) -> None:
    n = count_occurrences(df, op)
    assert n == 0, f"expected no {op!r} in plan, found {n}:\n{physical_plan(df)}"
