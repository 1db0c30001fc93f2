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
        name = r"(?:bucket|band_min|probe)#\d+"
        _BUCKET_KEY_EQ = re.compile(f"{name} = {name}")
    plan = df._jdf.queryExecution().optimizedPlan()
    hits = []
    for node in _iter_logical_nodes(plan):
        if node.getClass().getSimpleName() != "Join":
            continue
        cond = node.condition()
        if not cond.isDefined():
            continue
        if not _BUCKET_KEY_EQ.search(cond.get().toString()):
            continue
        if not _join_input_guarded(node):
            hits.append(node.simpleString(160))
    return hits


def _join_input_guarded(join_node) -> bool:
    """True iff a guard Filter (on ``_occ`` / ``_bucket_seq``) sits in
    one of THIS join's direct input subtrees — children only, NOT the
    join's own subquery expressions (r6, ADVICE r5: the r5 search ran
    `_iter_logical_nodes` on the join node itself, which also swept
    subquery plans that feed no join input).

    Scoping limitation, documented deliberately: the guard is required
    to be in an input subtree, not proven to DOMINATE the joined
    bucket stream. The capped kernels thread their guard through a
    broadcast restriction join (`banded_lsh_pairs`: Filter(_occ) lives
    UNDER the `banded JOIN cold_keys` bucket-keyed join that feeds the
    pair join), so any rule that refuses to descend past nested
    bucket-keyed joins flags the guard mechanism itself; proving the
    Filter constrains the specific key attribute would need transitive
    equality/attribute-lineage propagation across joins, which the
    py4j plan surface does not support robustly. A query unioning an
    unrelated capped frame into a join input could therefore still
    pass — the whitelist review in tests/test_bucket_join_lint.py is
    the human backstop for that shape."""

    def side_guarded(node) -> bool:
        if node.getClass().getSimpleName() == "Filter":
            fs = node.condition().toString()
            if "_occ#" in fs or "_bucket_seq#" in fs:
                return True
        children = node.children()
        return any(
            side_guarded(children.apply(i)) for i in range(children.size())
        )

    children = join_node.children()
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
