"""Custom Python DataSource (Spark 4 DataSource API) — a first-class
connector, the modern answer to the reference's hand-rolled per-URI
fetch loop (`IRSSpark.py:192-244`): instead of smuggling I/O into
`mapPartitionsWithIndex`, the source declares its schema and its
partitioning and Spark owns scheduling, retries and pruning.

`Filing990Source` generates deterministic synthetic 990-filing records
(the shape of the reference's domain — EIN, filer city, revenue) from
pure integer arithmetic, split across N input partitions exactly like
a real connector splits files/ranges. Registered under the short name
``filing990``; `spark.read.format("filing990").option("rows", ...)`.

In production the same class shape wraps any Python-reachable system
(a REST API, a proprietary archive, a message queue snapshot): the
`partitions()` method is the split planner, `read(partition)` the
per-task iterator — both run distributed, nothing flows through the
driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_CITIES = ("berkeley", "madison", "austin", "chicago", "boston")


class Filing990Source(DataSource):
    """Synthetic 990-filings connector: rows = (ein, city, revenue_cents)."""

    @classmethod
    def name(cls) -> str:
        return "filing990"

    def schema(self) -> str:
        return "ein bigint, city string, revenue_cents bigint"

    def reader(self, schema) -> "Filing990Reader":
        return Filing990Reader(self.options)

    def simpleStreamReader(self, schema) -> "Filing990StreamReader":
        return Filing990StreamReader(self.options)


class Filing990Reader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):
        # split planner: contiguous EIN ranges, one per input partition
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        per = -(-self.rows // self.num_partitions)  # ceil
        start = partition.value * per
        end = min(start + per, self.rows)
        for i in range(start, end):
            yield (i, _CITIES[i % 5], (i * 7919) % 10000000)


class Filing990StreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the connector (Spark 4 Python DataSource
    streaming API): offsets are plain dicts ({"i": next_ein}), each
    trigger reads the next EIN range, and `readBetweenOffsets` makes
    replay DETERMINISTIC — a failed/restarted micro-batch re-reads
    exactly its [start, end) slice, which is the exactly-once
    contract a real connector implements against an upstream cursor
    (change stream, queue offset, ledger sequence). The generated
    rows are byte-identical to the batch reader's, so a streaming
    ingest and a batch backfill of the same range agree hash-for-hash
    (the engine-wide backfill-equivalence property, SCALE.md §6)."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.batch = int(options.get("batchrows", 400))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _gen(self, start: int, end: int):
        for j in range(start, end):
            yield (j, _CITIES[j % 5], (j * 7919) % 10000000)

    def read(self, start: dict):
        # a list_iterator, not a generator: the prefetch cache needs a
        # next()-able that copy.copy() can duplicate for replay
        i = start["i"]
        end = min(i + self.batch, self.rows)
        return (iter(list(self._gen(i, end))), {"i": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._gen(start["i"], end["i"])


def register_filing990(spark) -> None:
    """Idempotent registration of the connector short name."""
    try:
        spark.dataSource.register(Filing990Source)
    except Exception:
        pass  # already registered in this session


class _PartFile(WriterCommitMessage):
    """Commit message: the staged part-file a task wrote."""

    def __init__(self, staged: str) -> None:
        self.staged = staged


class CityReportSink(DataSource):
    """Custom Python SINK with a real two-phase commit: tasks stage
    part files under a hidden `_staging/` dir and report them via
    commit messages; only the DRIVER's `commit()` renames staged files
    into place and drops a `_SUCCESS` manifest — so readers never see
    a torn write, and `abort()` leaves the destination untouched. This
    is the connector-sink mirror of `Filing990Source`: the reference
    hand-rolled its sink through saveAsTable (`IRSSpark.py:183-188`);
    here the commit protocol itself is the declared, testable surface."""

    @classmethod
    def name(cls) -> str:
        return "cityreport"

    def writer(self, schema, overwrite: bool) -> "CityReportWriter":
        return CityReportWriter(self.options)


class CityReportWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.path = options.get("path")

    def write(self, iterator) -> _PartFile:
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
        return _PartFile(staged)

    def commit(self, messages) -> None:
        import os
        import uuid

        # Per-commit unique component in the final names: a second
        # mode('append') write to the same path must ADD parts, never
        # silently overwrite the first commit's part-0000N files
        # (append semantics across invocations — ADVICE r3).
        commit_id = uuid.uuid4().hex[:12]
        for i, m in enumerate(messages):
            os.replace(
                m.staged,
                os.path.join(self.path, f"part-{i:05d}-{commit_id}.jsonl"),
            )
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("")

    def abort(self, messages) -> None:
        import os

        # failed tasks contribute None instead of a commit message
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


def register_cityreport(spark) -> None:
    """Idempotent registration of the sink short name."""
    try:
        spark.dataSource.register(CityReportSink)
    except Exception:
        pass  # already registered in this session
