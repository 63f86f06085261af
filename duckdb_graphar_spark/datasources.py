"""Custom batch sink through the public Python Data Source V2 writer API
(pyspark.sql.datasource, Spark 4): each PARTITION writes its own parquet
file via pyarrow — executor-side, Arrow-batched, no driver
materialization — and the driver-side commit records a manifest only
after every task reported success (the standard two-phase file-sink
contract; an abort removes the partials).

The reference has no sinks at all (SURVEY §2.A6); together with the
distributed GraphAr writer and the foreachBatch streaming sink this
completes the write surface through the OFFICIAL extension point, so a
user can `df.write.format("arrow_parquet_sink")` like any built-in.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class _ArrowParquetWriter(DataSourceArrowWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator):  # executor-side, per partition
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        batches = list(iterator)
        if not batches:
            return _FileCommit("", 0)
        table = pa.Table.from_batches(batches)
        os.makedirs(self.path, exist_ok=True)
        # task-unique name: a re-attempted task never collides, and only
        # committed files are listed in the manifest
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.parquet"
        full = os.path.join(self.path, fname)
        pq.write_table(table, full)
        return _FileCommit(full, table.num_rows)

    def commit(self, messages):  # driver-side, all tasks succeeded
        manifest = {
            "files": [m.path for m in messages if m and m.n_rows],
            "rows": sum(m.n_rows for m in messages if m),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):  # driver-side, something failed
        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)


class ArrowParquetSinkDataSource(DataSource):
    """`format("arrow_parquet_sink")` — register with
    ``spark.dataSource.register(ArrowParquetSinkDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "arrow_parquet_sink"

    def writer(self, schema, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("arrow_parquet_sink requires option 'path'")
        if overwrite and os.path.isdir(path):
            for f in os.listdir(path):
                if f.endswith(".parquet") or f == "_MANIFEST.json":
                    os.remove(os.path.join(path, f))
        return _ArrowParquetWriter(path)


class _CounterStreamReader:
    """SimpleDataSourceStreamReader: a deterministic bounded counter —
    each micro-batch advances the offset by ``step`` until ``limit``;
    exhausted reads return an empty batch at the same offset, so
    ``processAllAvailable`` converges.  ``readBetweenOffsets`` replays
    any offset range exactly (the replayability contract that makes the
    source usable with checkpoint recovery)."""

    def __init__(self, step: int, limit: int) -> None:
        self.step = step
        self.limit = limit

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.step, self.limit)
        return iter([(i, i * i) for i in range(lo, hi)]), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(i, i * i) for i in range(int(start["offset"]), int(end["offset"]))])

    def commit(self, end: dict) -> None:
        pass


class CounterStreamDataSource(DataSource):
    """Streaming source through the public Python Data Source V2 API
    (``spark.readStream.format("counter_stream")``): the read-side twin
    of :class:`ArrowParquetSinkDataSource`, completing the DSv2 surface
    (batch source u02, batch sink u03, streaming source here).  Exactly
    replayable offsets make the declared query's final state equal a
    plain ``range()`` SQL — a FULL value oracle for a custom streaming
    source."""

    @classmethod
    def name(cls) -> str:
        return "counter_stream"

    def schema(self) -> str:
        return "n long, sq long"

    def simpleStreamReader(self, schema):
        return _CounterStreamReader(
            int(self.options.get("step", 100)), int(self.options.get("limit", 1000))
        )


class _BucketPartition(InputPartition):
    def __init__(self, bucket: int) -> None:
        self.bucket = bucket


class _BucketedRangeReader(DataSourceReader):
    """Batch reader WITH FILTER PUSHDOWN (Spark 4.1 `pushFilters`):
    an `EqualTo(("bucket",), b)` predicate prunes planning down to the
    single matching partition — the Python-DataSource analogue of
    GraphAr's chunk-file pruning (SURVEY §2.B2).  Unsupported filters
    are yielded back so Spark re-applies them after the scan (the
    contract that keeps pushdown always-correct)."""

    def __init__(self, n_buckets: int, rows_per_bucket: int) -> None:
        self.n_buckets = n_buckets
        self.rows_per_bucket = rows_per_bucket
        self.bucket_eq: int | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("bucket",):
                self.bucket_eq = int(f.value)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        if self.bucket_eq is None:
            buckets = list(range(self.n_buckets))
        elif 0 <= self.bucket_eq < self.n_buckets:
            buckets = [self.bucket_eq]
        else:
            # Spark's reader contract needs >= 1 partition (an empty
            # list makes it call read(None)) — plan one EMPTY sentinel
            buckets = [-1]
        return [_BucketPartition(b) for b in buckets]

    def read(self, partition):
        b = partition.bucket
        if not (0 <= b < self.n_buckets):
            return  # the out-of-range sentinel: no rows
        base = b * self.rows_per_bucket
        for i in range(base, base + self.rows_per_bucket):
            # deterministic synthetic payload, SQL-replayable
            yield (b, i, (i * i) % 997)


class BucketedRangeDataSource(DataSource):
    """Python Data Source batch READER with filter pushdown — the
    fourth corner of the DSv2 surface (u03 batch sink, u04 streaming
    source, u02 generator): `spark.read.format("bucketed_range")` with
    a `bucket = b` predicate plans exactly ONE input partition.
    Options: n_buckets (default 8), rows_per_bucket (default 1000)."""

    @classmethod
    def name(cls) -> str:
        return "bucketed_range"

    def schema(self) -> str:
        return "bucket int, id bigint, value bigint"

    def reader(self, schema):
        return _BucketedRangeReader(
            int(self.options.get("n_buckets", 8)),
            int(self.options.get("rows_per_bucket", 1000)),
        )


class _StreamFileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class _ArrowParquetStreamWriter(DataSourceStreamArrowWriter):
    """Per-micro-batch two-phase parquet commit: every partition writes
    a task-unique file (a re-attempted task never collides), the driver
    commit publishes a `_batch_<id>.json` manifest naming ONLY the
    files of the successful attempt — readers that union manifest-listed
    files get exactly-once semantics even across batch retries (a
    retried batch id atomically overwrites its own manifest); abort
    removes the orphan partials.

    Each writer instance carries a driver-generated ``writer_id`` baked
    into its file names (``part-<writer_id>-<uuid>.parquet``).  The
    commit-time orphan sweep deletes this writer's own unreferenced
    files at any age, but FOREIGN files (a crashed previous run's
    orphans — a restart gets a fresh writer_id) only once they are
    older than ``gc_grace_seconds``, so two streaming queries (or an
    external writer) sharing a sink path cannot delete each other's
    not-yet-committed task files mid-flight.  Readers go by manifests,
    so sharing a path still interleaves manifests —
    single-writer-per-path remains the supported contract; the scoped
    sweep just makes a violation non-destructive."""

    def __init__(self, path: str, gc_grace_seconds: float = 600.0) -> None:
        self.path = path
        self.gc_grace_seconds = gc_grace_seconds
        # generated once on the driver, serialized to every task
        self.writer_id = uuid.uuid4().hex[:12]

    def write(self, iterator):  # executor-side, per partition per batch
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches:
            return _StreamFileCommit("", 0)
        table = pa.Table.from_batches(batches)
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{self.writer_id}-{uuid.uuid4().hex}.parquet"
        full = os.path.join(self.path, fname)
        pq.write_table(table, full)
        return _StreamFileCommit(full, table.num_rows)

    def commit(self, messages, batchId):  # driver-side, batch succeeded
        manifest = {
            "batch": batchId,
            "files": [m.path for m in messages if m and m.n_rows],
            "rows": sum(m.n_rows for m in messages if m),
        }
        tmp = os.path.join(self.path, f"._batch_{batchId}.json.tmp")
        final = os.path.join(self.path, f"_batch_{batchId}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # atomic publish
        # garbage-collect orphans: parquet files named by NO manifest
        # (a driver that died between task completion and commit/abort
        # leaves them; readers already ignore them, this bounds the
        # directory growth).  This writer's OWN files
        # (part-<writer_id>-*) are swept at any age; FOREIGN files
        # (a crashed previous run — restarts get a fresh writer_id)
        # only once older than gc_grace_seconds, so a concurrent query
        # or external writer sharing the path never loses in-flight
        # task files.  Anything referenced by ANY manifest or written
        # by this batch's messages is always kept.
        import glob as _glob
        import time as _time

        referenced = set(manifest["files"])
        for mf in _glob.glob(os.path.join(self.path, "_batch_*.json")):
            try:
                with open(mf) as f:
                    referenced.update(json.load(f)["files"])
            except (OSError, ValueError):
                continue
        this_batch = {m.path for m in messages if m and m.path}
        own_prefix = os.path.join(self.path, f"part-{self.writer_id}-")
        cutoff = _time.time() - self.gc_grace_seconds
        for pf in _glob.glob(os.path.join(self.path, "part-*.parquet")):
            if pf in referenced or pf in this_batch:
                continue
            if not pf.startswith(own_prefix):
                try:
                    if os.path.getmtime(pf) > cutoff:
                        continue  # foreign + fresh: maybe another writer
                except OSError:
                    continue
            try:
                os.remove(pf)
            except OSError:
                pass

    def abort(self, messages, batchId):
        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)


class ParquetStreamSinkDataSource(DataSource):
    """`writeStream.format("parquet_stream_sink")` — the STREAMING
    corner of the Python Data Source V2 write surface (the batch sink
    above is `arrow_parquet_sink`), Arrow-batched end to end.  Register
    with ``spark.dataSource.register(ParquetStreamSinkDataSource)``;
    requires option ``path``.  Use :func:`read_stream_sink_output` to
    read back exactly the committed rows."""

    @classmethod
    def name(cls) -> str:
        return "parquet_stream_sink"

    def streamWriter(self, schema, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("parquet_stream_sink requires option 'path'")
        grace = float(self.options.get("gc_grace_seconds", 600.0))
        return _ArrowParquetStreamWriter(path, gc_grace_seconds=grace)


def read_stream_sink_output(spark, path: str):
    """Exactly-once readback for :class:`ParquetStreamSinkDataSource`:
    union only the files named by committed batch manifests (orphans
    from failed attempts are invisible)."""
    import glob

    files: list[str] = []
    for mf in sorted(glob.glob(os.path.join(path, "_batch_*.json"))):
        with open(mf) as f:
            files.extend(json.load(f)["files"])
    if not files:
        raise ValueError(f"no committed batches under {path}")
    return spark.read.parquet(*files)
