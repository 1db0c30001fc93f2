"""Query registry — the engine's catalog of named, oracle-checkable queries.

Every operator in SURVEY.md §2 Part B lands here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an ANSI-SQL twin that DuckDB runs on the same parquet tables. The
driver's correctness gate diffs the two (row count + schema +
order-insensitive value hash), so:

- every computed column is explicitly aliased identically on both sides;
- double-typed aggregates are rounded identically on both sides
  (floating-point sum order differs between engines);
- timestamps are emitted as formatted strings (Spark session TZ is UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional DuckDB twin.

    ``oracle=None`` marks a non-SQL-expressible operator (streaming,
    LSH-based near-dedup, ...) — the driver then runs the weaker
    rows-only check (SURVEY.md §2 Part B "◐" rows).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred so `import registry` alone stays cheap.
    from apache_spark_irs_form_990_spark.queries import (  # noqa: F401
        aggregates,
        analytics_ext,
        behavioral,
        datasci_ext,
        filters,
        frontier_ext,
        frontier2_ext,
        frontier3_ext,
        frontier4_ext,
        frontier5_ext,
        frontier6_ext,
        frontier7_ext,
        frontier8_ext,
        frontier9_ext,
        frontier10_ext,
        frontier11_ext,
        frontier12_ext,
        frontier13_ext,
        frontier14_ext,
        frontier15_ext,
        frontier16_ext,
        frontier17_ext,
        frontier18_ext,
        frontier19_ext,
        frontier20_ext,
        frontier21_ext,
        frontier22_ext,
        frontier23_ext,
        graph_ext,
        inference_ext,
        mining_ext,
        patterns_ext,
        joins,
        profiling_ext,
        quality_ext,
        relational_ext,
        robust_ext,
        scans,
        sorts_sets,
        scalar_functions,
        stats_ext,
        temporal_ext,
        tpch_suite,
        windows,
        udfs,
    )
    from apache_spark_irs_form_990_spark.operators import (  # noqa: F401
        dedup,
        components,
        incremental,
        similarity,
        text_analysis,
        multimodal,
        pipeline,
        merge,
    )
    from apache_spark_irs_form_990_spark.sources import (  # noqa: F401
        xml_ingest,
        sinks,
        lakehouse,
        lakehouse_stream,
        layout,
    )
    from apache_spark_irs_form_990_spark.streaming import (  # noqa: F401
        stream_queries,
    )
    _LOADED = True
