"""Custom Python DataSource (the Spark 4 ``pyspark.sql.datasource``
API) — the engine-extension surface that lets pure-Python connectors
plug into Catalyst as first-class tables: partition planning happens
in the planner, per-partition reads run executor-side in Arrow
batches, and (4.1+) filters PUSH DOWN into the Python reader itself.

The concrete source here is a deterministic synthetic-events
generator — a table with NO files behind it: rows derive from md5 of
the row index, so any executor, any retry, any partition count
produces identical data (the TESTDATA determinism contract applied
to a connector). Real uses of the same shape: REST/paginated-API
readers, JDBC-less database connectors, queue snapshots.

Also exposes the streaming face (``SimpleDataSourceStreamReader``):
offset = next row index, each micro-batch a fixed slice, replayable
between offsets — the custom-connector twin of the file streams the
ingest loops consume.

Scale notes: ``partitions()`` is the parallelism contract — the
planner fans one Python worker per InputPartition, so a 1000-executor
cluster reads 1000 slices concurrently; the generator never
materializes driver-side. Pushdown drops non-matching rows INSIDE the
reader, before Arrow serialization — the Python analogue of
parquet's PushedFilters.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SYNTH_SCHEMA = "event_id bigint, event_type string, value double, part int"

_TYPES = ["click", "view", "purchase", "signup", "error"]


def synth_row(i: int) -> tuple:
    """Deterministic row i: md5-derived type and value (engine- and
    worker-independent — the same hash-not-RNG rule as sampling)."""
    h = hashlib.md5(f"pysrc:{i}".encode()).hexdigest()
    etype = _TYPES[int(h[:2], 16) % len(_TYPES)]
    value = (int(h[2:10], 16) % 50000) / 100.0
    return (i, etype, value)


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n_rows", 1000))
        self.parts = int(options.get("partitions", 4))
        self.type_filter: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept one event_type equality; everything else stays with
        Spark (returned = unsupported, per the API contract)."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and self.type_filter is None
            ):
                self.type_filter = f.value
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition: InputPartition):
        p = partition.value
        for i in range(p, self.n, self.parts):
            row = synth_row(i)
            if self.type_filter is not None and row[1] != self.type_filter:
                continue
            yield (*row, p)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.batch = int(options.get("rows_per_batch", 10))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        s = int(start["i"])
        e = s + self.batch
        return ([(*synth_row(i), 0) for i in range(s, e)], {"i": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay path: identical rows for identical offsets — the
        # property that makes crash recovery exactly-once upstream.
        return [
            (*synth_row(i), 0)
            for i in range(int(start["i"]), int(end["i"]))
        ]


class SyntheticEventsDataSource(DataSource):
    """``spark.dataSource.register(SyntheticEventsDataSource)`` then
    ``spark.read.format("synthetic_events").option(...)`` (batch) or
    ``spark.readStream.format("synthetic_events")`` (stream)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SynthStreamReader(self.options)


# --------------------------------------------------------------------------
# "commitlog" format: the snapshot table as a first-class DataFrame
# format — df.write.format("commitlog").save(path) runs the Python
# DataSourceWriter two-phase protocol (tasks write invisible files,
# the DRIVER commit publishes one atomic manifest), and
# spark.read.format("commitlog").load(path) scans a pinned snapshot
# (option("version", n) = time travel). Local-filesystem paths (the
# task-side writer uses pyarrow directly; a production connector
# would route through fsspec — the protocol is unchanged).
# --------------------------------------------------------------------------

from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _FileCommit(WriterCommitMessage):
    file: str | None = None


class _CommitlogWriter(DataSourceWriter):
    def __init__(self, path: str, schema, overwrite: bool):
        self.path = path
        self.schema = schema
        self.overwrite = overwrite

    def write(self, it) -> _FileCommit:
        """Task-side: write this partition as one parquet file under
        an unreferenced commit dir — invisible until the driver's
        commit() publishes a manifest naming it."""
        import os
        import uuid as _uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(it)
        if not rows:
            return _FileCommit(None)
        pdf = pd.DataFrame(rows, columns=self.schema.names)
        fdir = os.path.join(self.path, "data", _uuid.uuid4().hex)
        os.makedirs(fdir, exist_ok=True)
        f = os.path.join(fdir, f"part-{_uuid.uuid4().hex}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
        return _FileCommit(f)

    def commit(self, messages) -> None:
        """Driver-side: all tasks succeeded — publish ONE manifest.
        This is where the write becomes visible, atomically."""
        from pyspark.sql import SparkSession

        from cds_etl_spark.sources.commitlog import _publish

        files = sorted(
            m.file for m in messages if m is not None and m.file
        )
        # commit() can run on a driver thread with no ACTIVE session;
        # getOrCreate returns the existing instantiated one.
        spark = (
            SparkSession.getActiveSession()
            or SparkSession.builder.getOrCreate()
        )
        _publish(
            spark,
            self.path,
            files,
            "overwrite" if self.overwrite else "append",
            self.schema.json(),
        )

    def abort(self, messages) -> None:
        """Task failure: delete the orphaned files — nothing was ever
        referenced, so the table is untouched."""
        import os

        for m in messages:
            if m is not None and m.file and os.path.exists(m.file):
                os.remove(m.file)


class _CommitlogReader(DataSourceReader):
    def __init__(self, path: str, options):
        import json
        import os

        self.path = path
        version = options.get("version")
        logdir = os.path.join(path, "_log")
        versions = sorted(
            int(n[: -len(".json")])
            for n in os.listdir(logdir)
            if n.endswith(".json") and not n.startswith(".")
        )
        v = int(version) if version is not None else versions[-1]
        with open(os.path.join(logdir, f"{v:012d}.json")) as fh:
            self.manifest = json.load(fh)

    def partitions(self):
        # One planner partition per data file — reader parallelism
        # follows the snapshot's file layout.
        return [
            InputPartition(f.removeprefix("file:"))
            for f in self.manifest["files"]
        ]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(partition.value).iter_batches()


class CommitlogDataSource(DataSource):
    """``spark.dataSource.register(CommitlogDataSource)`` then
    ``df.write.format("commitlog").mode("append"|"overwrite")
    .save(path)`` / ``spark.read.format("commitlog")
    .option("version", n).load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "commitlog"

    def schema(self):
        import json

        from pyspark.sql.types import StructType

        return StructType.fromJson(
            json.loads(
                _CommitlogReader(
                    self.options["path"], self.options
                ).manifest["schema"]
            )
        )

    def reader(self, schema) -> DataSourceReader:
        return _CommitlogReader(self.options["path"], self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _CommitlogWriter(self.options["path"], schema, overwrite)
