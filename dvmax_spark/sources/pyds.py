"""Python Data Source API connector (Spark 4): a paginated REST-style
market-data source as a FIRST-CLASS `spark.read.format(...)` connector
rather than a driver-side fetch (the Spark-native answer to the
reference's paged HTTP ingestion, `src/dataprep/fetcher/*` — same
page/params surface, but each page becomes an input partition that
executors read in parallel, so ingest scales with the cluster instead
of serializing through the driver).

The transport is injectable like sources/rest.py: by default pages are
synthesized deterministically (seeded arithmetic — CI/oracle mode); a
real deployment points ``endpoint`` at an HTTP pager. Filter pushdown:
an equality filter on ``page`` prunes input partitions at planning
time (pushFilters), the connector-level analog of partition pruning.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYMBOLS = ("AAA", "BBB", "CCC", "DDD", "EEE")


def synth_page(page: int, page_size: int) -> Iterator[tuple]:
    """Deterministic page payload — pure integer arithmetic so a SQL
    oracle can regenerate it exactly (no floats until the final
    division by 100, which is exact for 2-decimal cents)."""
    for i in range(page_size):
        item_id = page * page_size + i
        symbol = SYMBOLS[item_id % len(SYMBOLS)]
        px_cents = (item_id * 37 + 11) % 100_000
        yield (page, item_id, symbol, px_cents / 100.0)


class PagedRestReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 100))
        self.page_filter: int | None = None

    def pushFilters(self, filters: Sequence):  # noqa: N802 (API name)
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("page",):
                self.page_filter = int(f.value)
            else:
                yield f  # not handled -> Spark re-applies it

    def partitions(self):
        pages = range(self.n_pages)
        if self.page_filter is not None:
            pages = [p for p in pages if p == self.page_filter]
        return [InputPartition(p) for p in pages]

    def read(self, partition: InputPartition):
        yield from synth_page(partition.value, self.page_size)


class PagedRestDataSource(DataSource):
    """``spark.read.format("dvmax_paged_rest")`` — one input partition
    per page; executors fetch pages concurrently."""

    @classmethod
    def name(cls) -> str:
        return "dvmax_paged_rest"

    def schema(self) -> str:
        return "page int, item_id bigint, symbol string, px double"

    def reader(self, schema) -> DataSourceReader:
        return PagedRestReader(self.options)

    def streamReader(self, schema):  # noqa: N802 (API name)
        # full partition-parallel stream reader (executors fetch the
        # batch's pages concurrently). Spark prefers streamReader when
        # both are defined; reader_mode=simple opts into the
        # driver-side Simple variant (kept for the two-tier API story).
        if self.options.get("reader_mode", "parallel") == "simple":
            # pyspark's fallback catches PySparkNotImplementedError
            # specifically (datasource_internal._streamReader), not
            # the builtin NotImplementedError
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader (reader_mode=simple)"},
            )
        return ParallelPagedRestStreamReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: N802 (API name)
        return PagedRestStreamReader(self.options)


def register(spark) -> None:
    # connector-level filter pushdown is opt-in for Python sources;
    # runtime conf, set here so vanilla (driver) sessions work too
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedRestDataSource)
    spark.dataSource.register(JsonlDirDataSource)


class JsonlDirDataSource(DataSource):
    """``df.writeStream.format("dvmax_jsonl_dir")`` — write-side
    Python Data Source: an exactly-once batch-keyed JSONL directory
    sink (see :class:`JsonlDirStreamWriter`)."""

    @classmethod
    def name(cls) -> str:
        return "dvmax_jsonl_dir"

    def schema(self) -> str:
        # sink-only source: reads are not supported; the writer takes
        # whatever schema the stream carries
        return "value string"

    def streamWriter(self, schema, overwrite):  # noqa: N802 (API name)
        return JsonlDirStreamWriter(self.options, overwrite)


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: the pager as a Structured Streaming SOURCE —
    offset = next page to fetch, one page per micro-batch. Offsets make
    the feed REPLAYABLE: after a crash Spark re-asks for
    [start, end) via readBetweenOffsets and gets identical rows
    (deterministic pages), which is what upgrades checkpoint recovery
    to exactly-once ingestion."""

    def __init__(self, options):
        self.n_pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 100))

    def initialOffset(self):
        return {"page": 0}

    def read(self, start):
        p = int(start["page"])
        if p >= self.n_pages:
            return iter([]), start  # drained: offset unchanged
        return iter(list(synth_page(p, self.page_size))), {"page": p + 1}

    def readBetweenOffsets(self, start, end):
        for p in range(int(start["page"]), int(end["page"])):
            yield from synth_page(p, self.page_size)


class ParallelPagedRestStreamReader(DataSourceStreamReader):
    """Full DataSourceStreamReader: partition-PER-PAGE micro-batches.

    Unlike the Simple variant (driver reads one page per batch),
    ``partitions(start, end)`` exposes one InputPartition per page in
    the micro-batch, so EXECUTORS fetch the batch's pages concurrently
    — the S5-at-scale story: a 1000-page backlog drains at cluster
    width, not driver width. Offsets are page cursors ({"page": n} =
    pages [0, n) consumed). ``latestOffset`` reports what the FEED has
    available (a real pager would ask the server; it must NOT be
    reader-local state — the reader is rebuilt on restart and a
    remembered cursor could regress behind the checkpointed start, and
    the Python API has no ReadLimit hook to hand it the start). Replay
    of [start, end) regenerates identical rows (deterministic pages),
    which upgrades checkpoint recovery to exactly-once. ``commit(end)``
    is where a real pager would ack/garbage-collect server-side
    cursors; the synthetic feed needs no state, so it is a documented
    no-op.
    """

    def __init__(self, options):
        self.n_pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 100))

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        return {"page": self.n_pages}

    def partitions(self, start, end):
        return [
            InputPartition(p) for p in range(int(start["page"]), int(end["page"]))
        ]

    def read(self, partition: InputPartition):
        # runs ON EXECUTORS (pickled partition value = page number)
        yield from synth_page(partition.value, self.page_size)

    def commit(self, end):
        # synthetic feed: nothing to ack; a real pager would release
        # server-side cursors up to `end` here
        return


@dataclass
class _PageCommit(WriterCommitMessage):
    """Per-task commit message: where the task staged its rows."""

    staged_path: str
    n_rows: int


class JsonlDirStreamWriter(DataSourceStreamWriter):
    """Python DataSourceStreamWriter (Spark 4): an exactly-once JSONL
    directory sink, the write-side completion of the paged connector's
    two-tier read story.

    Protocol (the two-phase commit every custom sink needs):
      * ``write(iterator)`` runs ON EXECUTORS — each task streams its
        partition to a uniquely-named file under ``<path>/.staging/``
        and returns a commit message naming it (never writing into the
        visible directory);
      * ``commit(messages, batchId)`` runs on the driver AFTER every
        task succeeded — staged files move into ``<path>/batch=<id>/``
        in one pass. Replays of an already-committed batch are detected
        by the batch directory's presence and become no-ops, which is
        what upgrades at-least-once task execution to exactly-once
        OUTPUT (same contract as the parquet sinks' batch-keyed
        dynamic overwrite, at the connector level);
      * ``abort(messages, batchId)`` removes staged files so a failed
        batch leaves no trace.
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires option 'path'")

    def write(self, iterator):
        import json
        import os
        import uuid

        staging = os.path.join(self.path, ".staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"task-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PageCommit(staged_path=staged, n_rows=n)

    def commit(self, messages, batchId):  # noqa: N803 (API name)
        import os

        batch_dir = os.path.join(self.path, f"batch={batchId}")
        if os.path.isdir(batch_dir):
            # replayed batch: output already visible — drop the new
            # staging files and keep the committed state (exactly-once)
            for m in messages:
                if m is not None:
                    try:
                        os.remove(m.staged_path)
                    except OSError:
                        pass
            return
        tmp = batch_dir + ".tmp"
        # A crash mid-commit (some renames done, visible rename not)
        # strands part files in tmp; the replay must start from an
        # EMPTY tmp or stale files from the crashed attempt could ride
        # into the committed batch next to the replay's files.
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        for i, m in enumerate(messages):
            if m is not None and m.n_rows > 0:
                os.rename(m.staged_path, os.path.join(tmp, f"part-{i:05d}.jsonl"))
        os.rename(tmp, batch_dir)  # single visible-making rename

    def abort(self, messages, batchId):  # noqa: N803 (API name)
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.staged_path)
                except OSError:
                    pass
