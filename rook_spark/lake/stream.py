"""Lake changelog as a native Structured Streaming source — subscribe
to a table's change feed with ``spark.readStream`` (the Delta CDF /
Iceberg incremental-read analog, built on the PySpark 4 Python Data
Source API).

The scale insight that makes this O(batch): on a MERGE-ON-READ engine
table, each commit's NEW DELTA FILES *are* that epoch's LWW-reduced
change set — key+payload, 'D' tombstones included, already bucketed.
The feed therefore never reads base files, never joins, never touches
state: per trigger it lists the delta files added in the version
window and streams their rows out, tagged with the committing
version. Cost per trigger ∝ change volume; a 100 TB table with a
1 GB epoch streams 1 GB.

Semantics — PER-EPOCH FEED, not net-across-window (Debezium shape,
same as rook's listener feed, ``rook-api/.../ReplicationListener
.java:24-27``): a key updated in three epochs yields three rows;
consumers fold with the carried ``(ordinal, offset)`` LWW pair, the
same discipline every sink in this repo uses. For a NET diff between
two versions use ``LakeTable.changes`` (batch).

CONTRACT (enforced loudly, not silently):

- The table's DATA commits must be merge-on-read (``CdcEngine(...,
  write_mode='mor')`` or ``merge_mor``/``delete_where(mode='mor')``).
  A COW data commit changes state without delta files — the reader
  detects it (batch id advanced AND base files rewritten with no new
  deltas) and raises rather than silently dropping the epoch; empty
  MOR epochs (batch id advances, nothing else changes) and
  rollback/abort (batch id moves backward) correctly emit nothing.
  The one undetectable shape is a batch-id-preserving COW rewrite
  (``delete_where(mode='cow')``) — indistinguishable from compaction,
  which is why erasure on a fed table must use ``mode='mor'``.
- Write-audit-publish: the feed ends at the PUBLISHED ``main`` ref
  while staging is active (same resolution as default reads) — staged
  pre-audit epochs are never emitted, so an audit failure's rollback
  never needs un-emitting.
- Maintenance commits (compact / rebucket / vacuum / tags / WAP
  refs / rollback) advance the version WITHOUT advancing the batch
  id and are logically state-preserving — the feed correctly emits
  nothing for them. After a ROLLBACK the re-replayed epochs re-emit
  (at-least-once at recovery boundaries — identical rows, consumers'
  LWW fold absorbs them), mirroring the engine's own recovery story.
- Retention: the feed reads snapshot JSONs and delta files of PAST
  versions — ``vacuum`` must keep them until the slowest consumer has
  passed (``keep_last`` / ``min_age_s`` grace), the standard CDF
  retention rule. A vacuumed-away version fails with a clear error.
- Schema is locked at query start (current snapshot); columns added
  by mid-stream evolution appear as nulls until the query restarts
  (the Delta CDF behavior). POSIX metadata layout (the default
  store); other catalogs would plug their own loader.

Usage::

    spark.dataSource.register(LakeChangeDataSource)
    feed = (spark.readStream.format("rook_lake_changes")
            .option("path", table_path)
            .option("start_version", 0)   # or "earliest" / "latest";
            .load())                      # default: latest (new commits)
    # batch mode reads a closed window:
    df = (spark.read.format("rook_lake_changes")
          .option("path", table_path)
          .option("start_version", 0).option("end_version", 7).load())

Output columns: the table's user columns, then ``op`` ('U'/'D'),
``ordinal``/``offset`` (the LWW pair), ``commit_version``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FEED_COLS = ("op", "ordinal", "offset", "commit_version")


def _resolve_start(table_path: str, sv) -> int:
    """``start_version`` option: an int version, ``"earliest"`` (full
    retained history, = -1), or ``"latest"``/absent (only commits after
    query start — the Kafka-offset-alias convention)."""
    if sv is None or sv == "latest":
        return _published_version(table_path)
    if sv == "earliest":
        return -1
    return int(sv)


# ------------------------------------------------------- sparkless loader

def _load_snapshot(table_path: str, version: int | None = None):
    """Load a Snapshot WITHOUT a SparkSession (driver- and worker-safe):
    the same POSIX read + manifest-blob resolution as
    ``LakeTable.snapshot`` (lake/table.py:423) — metadata JSON only,
    never data files."""
    from rook_spark.lake.metastore import PosixMetadataStore
    from rook_spark.lake.table import Snapshot

    store = PosixMetadataStore(os.path.join(table_path, "_meta"))
    v = store.read_pointer() if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no lake table at {table_path}")
    try:
        data = json.loads(store.read(v))
    except FileNotFoundError:
        raise FileNotFoundError(
            f"snapshot v{v} of {table_path} is gone (vacuumed?) — the "
            "change feed needs retention to cover its lag; raise vacuum "
            "keep_last/min_age_s or restart from a retained version"
        ) from None
    refs = data.pop("manifest_refs", None)
    snap = Snapshot(**data)
    if refs:
        for key in refs.values():
            for b, e in json.loads(store.read_blob(key)).items():
                if e.get("files"):
                    snap.buckets[b] = list(e["files"])
                if e.get("deltas"):
                    snap.deltas[b] = list(e["deltas"])
                snap.stats.update(e.get("stats", {}))
                snap.blooms.update(e.get("blooms", {}))
    return snap


def _published_version(table_path: str) -> int:
    """The feed's end-of-stream: the published WAP ref when staging is
    active (consumers must never see pre-audit epochs — the same
    resolution default reads apply, lake/table.py read()), else the
    chain head."""
    snap = _load_snapshot(table_path)
    return snap.refs.get("main", snap.version)


def _new_delta_files(table_path: str, v: int, prev) -> tuple[list[tuple[int, str]], object]:
    """(version, abs_path) for every delta file ADDED by version ``v``
    (vs its parent — ``prev`` is reused when it IS the parent, halving
    metadata loads on window scans), plus ``v``'s snapshot for the
    caller's rolling iteration. Guard (see module contract): a commit
    that ADVANCES the batch id and REWRITES base files without new
    deltas is a copy-on-write data commit — refused loudly. An empty
    MOR epoch (batch id advances, nothing else changes) and
    rollback/abort (batch id moves BACKWARD with the reverted state)
    correctly emit nothing. The one undetectable case: a COW rewrite
    that preserves the batch id (``delete_where(mode='cow')``) looks
    exactly like maintenance — which is why the contract mandates
    ``mode='mor'`` erasure on fed tables."""
    snap = _load_snapshot(table_path, v)
    if snap.parent < 0:
        prev_deltas: dict[str, list[str]] = {}
        prev_batch = snap.batch_id
        prev_buckets = snap.buckets
    else:
        if prev is None or prev.version != snap.parent:
            prev = _load_snapshot(table_path, snap.parent)
        prev_deltas, prev_batch = prev.deltas, prev.batch_id
        prev_buckets = prev.buckets
    fresh: list[tuple[int, str]] = []
    for b, files in snap.deltas.items():
        seen = set(prev_deltas.get(b, []))
        fresh.extend((v, os.path.join(table_path, f))
                     for f in files if f not in seen)
    if not fresh and snap.batch_id > prev_batch and snap.buckets != prev_buckets:
        raise ValueError(
            f"version {v} of {table_path} advanced batch_id "
            f"{prev_batch} -> {snap.batch_id} by rewriting base files "
            "without delta files — a copy-on-write data commit. The "
            "change feed requires merge-on-read data commits "
            "(CdcEngine(write_mode='mor') / merge_mor / "
            "delete_where(mode='mor')); use LakeTable.changes() for COW "
            "tables."
        )
    return fresh, snap


def _feed_schema(table_path: str) -> T.StructType:
    """User columns of the CURRENT snapshot + the feed columns."""
    snap = _load_snapshot(table_path)
    fields = [
        f for f in T.StructType.fromJson(json.loads(snap.schema_json)).fields
        if not f.name.startswith("__")
    ]
    fields += [
        T.StructField("op", T.StringType(), False),
        T.StructField("ordinal", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("commit_version", T.IntegerType(), False),
    ]
    return T.StructType(fields)


# ------------------------------------------------------------- partitions

class _DeltaFilesPartition(InputPartition):
    def __init__(self, files: list[tuple[int, str]], schema_json: str,
                 phys_map: dict[str, str] | None = None):
        self.files = files
        self.schema_json = schema_json
        # logical→physical column names (Snapshot.phys_map): delta file
        # BYTES are name-stable across rename_column, so one map —
        # loaded when the partitions were planned — covers every file
        # in the window regardless of which version wrote it
        self.phys_map = phys_map or {}


def _window_partitions(
    table_path: str, start_v: int, end_v: int, schema: T.StructType
) -> Sequence[_DeltaFilesPartition]:
    """One partition per touched BUCKET across the window (parallelism
    tracks the table layout; files of one bucket stay together so a
    downstream repartition-free fold sees each key in one task)."""
    by_bucket: dict[str, list[tuple[int, str]]] = {}
    prev = None
    for v in range(start_v + 1, end_v + 1):
        fresh, prev = _new_delta_files(table_path, v, prev)
        for ver, f in fresh:
            # delta files live under v{N}/b{bucket}/ — group by dirname
            by_bucket.setdefault(os.path.basename(os.path.dirname(f)), []).append(
                (ver, f)
            )
    sj = schema.json()
    pm = (prev if prev is not None and prev.version == end_v
          else _load_snapshot(table_path, end_v)).phys_map if end_v >= 0 else {}
    if not by_bucket:
        # an empty window still needs ONE (fileless) partition — the
        # Python DS batch path calls read(None) when partitions() is
        # empty instead of planning zero tasks
        return [_DeltaFilesPartition([], sj, pm)]
    return [
        _DeltaFilesPartition(files, sj, pm)
        for _, files in sorted(by_bucket.items())
    ]


def _read_partition(part: _DeltaFilesPartition) -> Iterator:
    """Worker-side: stream each delta file's rows as Arrow batches
    conformed to the declared schema — missing columns (pre-evolution
    files) null-filled, internals renamed to the public feed names,
    extra columns dropped. Pure pyarrow; no SparkSession."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = T.StructType.fromJson(json.loads(part.schema_json))
    target = to_arrow_schema(schema)
    rename = {"op": "__op", "ordinal": "__ordinal", "offset": "__offset"}
    for version, path in part.files:
        tbl = pq.read_table(path)
        cols = []
        for field in target:
            if field.name == "commit_version":
                arr = pa.array([version] * len(tbl), type=field.type)
            else:
                src = rename.get(field.name, field.name)
                src = part.phys_map.get(src, src)
                if src in tbl.column_names:
                    arr = tbl.column(src).cast(field.type)
                else:
                    arr = pa.nulls(len(tbl), type=field.type)
            cols.append(arr)
        for batch in pa.Table.from_arrays(cols, schema=target).to_batches():
            yield batch


# ------------------------------------------------------------ the source

class LakeChangeStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("rook_lake_changes requires .option('path', ...)")
        self.schema = schema
        self.start_version = _resolve_start(self.table_path,
                                            options.get("start_version"))

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        # published-ref resolution: staged (pre-audit) WAP epochs must
        # never reach consumers — abort rolls them back, and a feed
        # that emitted them would have relayed phantom rows
        return {"version": _published_version(self.table_path)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return _window_partitions(
            self.table_path, int(start["version"]), int(end["version"]),
            self.schema,
        )

    def read(self, partition: _DeltaFilesPartition) -> Iterator:
        return _read_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # retention is the table's vacuum policy, not the reader's


class LakeChangeBatchReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("rook_lake_changes requires .option('path', ...)")
        self.schema = schema
        sv = options.get("start_version")
        # batch default = full history (a closed-window read wants it
        # all; the STREAM default is "latest" — only new commits)
        self.start_version = -1 if sv is None else _resolve_start(self.table_path, sv)
        ev = options.get("end_version")
        self.end_version = (
            int(ev) if ev is not None
            else _published_version(self.table_path)
        )

    def partitions(self) -> Sequence[InputPartition]:
        return _window_partitions(
            self.table_path, self.start_version, self.end_version, self.schema
        )

    def read(self, partition: _DeltaFilesPartition) -> Iterator:
        return _read_partition(partition)


class LakeChangeDataSource(DataSource):
    """``spark.dataSource.register(LakeChangeDataSource)`` then
    ``spark.readStream.format("rook_lake_changes")`` (see module
    docstring)."""

    @classmethod
    def name(cls) -> str:
        return "rook_lake_changes"

    def schema(self) -> T.StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("rook_lake_changes requires .option('path', ...)")
        return _feed_schema(path)

    def streamReader(self, schema: T.StructType) -> LakeChangeStreamReader:
        return LakeChangeStreamReader(schema, dict(self.options))

    def reader(self, schema: T.StructType) -> LakeChangeBatchReader:
        return LakeChangeBatchReader(schema, dict(self.options))
