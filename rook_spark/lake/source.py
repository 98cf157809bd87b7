"""The lake table as a first-class Spark batch format with
FILTER-PUSHDOWN-DRIVEN file skipping — ``spark.read.format("rook_lake")
.load(path).where("lang = 'py'")`` prunes files through the table's own
footer stats and bloom filters via Catalyst's pushdown, no manual
``ranges=``/``points=`` hints (PySpark 4 Python Data Source API,
``pushFilters``).

Why this matters at 100 TB: predicate pushdown normally stops at the
format reader — a generic parquet scan of this table would list every
file and rely on row-group stats alone. This source intercepts the
pushed predicates driver-side and drops whole FILES from the plan using
the snapshot's min/max stats (range predicates) and per-file blooms
(equality on ``bloom_cols``) — the same two pruning axes
``LakeTable.read(ranges=, points=)`` exposes as hints, now wired to the
optimizer so every consumer gets them for free.

Soundness (same contract as the hints): skipping is a SUPERSET
operation — a file is dropped only when its stats PROVE no row can
match; ``pushFilters`` returns every filter back to Spark, which
re-applies them exactly. A bloom false positive or missing stats merely
keeps a file. Buckets carrying unfolded MOR deltas are never
stat-pruned (a delta row may revive a key outside the base file's
bounds — the exemption ``read()`` applies, mirrored here).

Merge-on-read resolution runs WORKER-SIDE per bucket (pure
pyarrow/pandas, no inner SparkSession): base rows are implicit
upserts, the per-key winner is the max-``(ordinal, offset)`` row,
nulls coalesced to -1, a winning tombstone drops the key — bit-for-bit
the fold ``LakeTable.read`` executes (lake/table.py:619-645), pinned
by an equality test across COW, MOR-with-deltas, and post-delete
states. Bucket layout makes this embarrassingly parallel: one input
partition per bucket, each folding only its own files.

Scope: snapshot reads (``version`` option for time travel; default =
current, resolving the published WAP ref like ``read()``). The
``columns`` option (comma-separated) is projection pushdown — the
Python Data Source API has no prune interface, so without it Spark
prunes only AFTER workers decode every column chunk; with it the
worker-side parquet reads themselves narrow (key columns always ride
along), the format-level twin of ``LakeTable.read(columns=...)``.
POSIX metadata layout. Writes still go through the engine/MERGE — this
is the consumer-side read surface.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from rook_spark.lake.stream import _load_snapshot


def _read_snapshot(table_path: str, version: int | None):
    """The snapshot a CONSUMER read resolves: an explicit version wins;
    otherwise the published WAP ``main`` ref when staging is active,
    else the chain head — one resolution shared by schema(),
    pushFilters() and partitions() so a staged schema-evolving commit
    can never make the declared schema diverge from the planned files."""
    snap = _load_snapshot(table_path, version)
    if version is None and "main" in snap.refs:
        snap = _load_snapshot(table_path, snap.refs["main"])
    return snap


def _parse_columns(options: dict) -> list[str] | None:
    """The ``columns`` reader option (comma-separated logical names):
    projection pushdown for the format. The Python Data Source API has
    no column-pruning interface (only ``pushFilters``), so Spark prunes
    AFTER the source yields full rows — on a wide table every worker
    still decodes every column chunk. This option narrows the
    worker-side parquet reads themselves (key columns always ride
    along; the fold's internals stay) — the format-level twin of
    ``LakeTable.read(columns=...)``."""
    raw = options.get("columns")
    if raw is None:
        return None
    return [c.strip() for c in raw.split(",") if c.strip()]


def _narrow_stored(stored: T.StructType, key_cols: list[str],
                   columns: list[str]) -> T.StructType:
    have = {f.name for f in stored.fields if not f.name.startswith("__")}
    missing = [c for c in columns if c not in have]
    if missing:
        raise ValueError(f"unknown columns {missing}; table has {sorted(have)}")
    wanted = set(key_cols) | set(columns)
    return T.StructType([
        f for f in stored.fields if f.name in wanted or f.name.startswith("__")
    ])


def _merge_range(ranges: dict, col: str, lo, hi) -> None:
    plo, phi = ranges.get(col, (None, None))
    if lo is not None:
        plo = lo if plo is None else max(plo, lo)
    if hi is not None:
        phi = hi if phi is None else min(phi, hi)
    ranges[col] = (plo, phi)


class _BucketPartition(InputPartition):
    def __init__(self, base: list[str], deltas: list[str], schema_json: str,
                 key_cols: list[str], phys_map: dict[str, str] | None = None):
        self.base = base
        self.deltas = deltas
        self.schema_json = schema_json
        self.key_cols = key_cols
        # logical→physical in-file names (Snapshot.phys_map) — file
        # bytes are name-stable across rename_column
        self.phys_map = phys_map or {}


class LakeTableReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.table_path = options.get("path")
        if not self.table_path:
            raise ValueError("rook_lake requires .option('path', ...) / load(path)")
        self.user_schema = schema
        v = options.get("version")
        self.version = int(v) if v is not None else None
        self.columns = _parse_columns(options)
        self.ranges: dict[str, tuple] = {}
        self.points: dict[str, object] = {}

    # ------------------------------------------------------------ pushdown

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Harvest range/equality predicates for file skipping; EVERY
        filter is returned for Spark to re-apply (skipping is superset-
        only, see module docstring). Unsupported shapes just don't
        prune."""
        snap = _read_snapshot(self.table_path, self.version)
        bloomable = set(snap.bloom_cols)
        for f in filters:
            col = getattr(f, "attribute", None)
            if not col or len(col) != 1:
                continue
            c = col[0]
            if isinstance(f, EqualTo):
                if c in bloomable:
                    self.points[c] = f.value
                if isinstance(f.value, (int, float)) and not isinstance(f.value, bool):
                    _merge_range(self.ranges, c, f.value, f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                _merge_range(self.ranges, c, f.value, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                _merge_range(self.ranges, c, None, f.value)
        return filters  # Spark applies the exact predicates

    # ----------------------------------------------------------- partitions

    def partitions(self) -> Sequence[InputPartition]:
        from rook_spark.lake.table import _bloom_may_contain, _stats_may_match

        snap = _read_snapshot(self.table_path, self.version)
        # delta files keep the FULL stored schema + __op; worker-side
        # fold needs the internals even though the declared schema hides
        # them
        stored = T.StructType.fromJson(json.loads(snap.schema_json))
        if self.columns is not None:
            stored = _narrow_stored(stored, list(snap.key_cols), self.columns)
        sj = stored.json()
        parts = []
        # pushed predicates carry LOGICAL names; footer stats and bloom
        # keys are PHYSICAL (table.py read() applies the same translation)
        ranges = {snap.phys(c): v for c, v in self.ranges.items()}
        points = {snap.phys(c): v for c, v in self.points.items()}
        for b in sorted(set(snap.buckets) | set(snap.deltas), key=int):
            base = snap.buckets.get(b, [])
            deltas = snap.deltas.get(b, [])
            if not deltas and (ranges or points):
                if ranges:
                    base = [f for f in base
                            if _stats_may_match(snap.stats.get(f), ranges)]
                if points:
                    base = [
                        f for f in base
                        if all(_bloom_may_contain(snap.blooms.get(f, {}).get(c), v)
                               for c, v in points.items())
                    ]
            if base or deltas:
                parts.append(_BucketPartition(
                    [os.path.join(self.table_path, f) for f in base],
                    [os.path.join(self.table_path, f) for f in deltas],
                    sj, list(snap.key_cols), snap.phys_map,
                ))
        return parts

    # ----------------------------------------------------------------- read

    def read(self, partition: _BucketPartition) -> Iterator:
        """Worker-side bucket fold (see module docstring). Arrow-native
        IO; the LWW fold runs in pandas with arrow-backed frames so
        nullable int64 ordinals survive the round trip."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        stored = T.StructType.fromJson(json.loads(partition.schema_json))
        full = to_arrow_schema(
            T.StructType(list(stored.fields)
                         + [T.StructField("__op", T.StringType())])
        )

        phys = partition.phys_map

        def conform(path: str, implicit_upsert: bool):
            # read ONLY the chunks the (possibly narrowed) schema needs:
            # with the ``columns`` option this is where the IO is saved
            pf = pq.ParquetFile(path)
            present = set(pf.schema_arrow.names)
            want = list(dict.fromkeys(
                phys.get(f.name, f.name) for f in full
            ))
            t = pf.read(columns=[c for c in want if c in present])
            cols = []
            for field in full:
                src = phys.get(field.name, field.name)
                if src in t.column_names:
                    cols.append(t.column(src).cast(field.type))
                elif field.name == "__op" and implicit_upsert:
                    cols.append(pa.array(["U"] * len(t), type=field.type))
                else:
                    cols.append(pa.nulls(len(t), type=field.type))
            return pa.Table.from_arrays(cols, schema=full)

        tables = [conform(p, True) for p in partition.base]
        tables += [conform(p, False) for p in partition.deltas]
        if not tables:
            return
        t = pa.concat_tables(tables)
        if partition.deltas:
            import pandas as pd

            keys = partition.key_cols
            df = pd.DataFrame({k: t.column(k).to_pandas() for k in keys})
            df["__o"] = t.column("__ordinal").fill_null(-1).to_pandas() \
                if "__ordinal" in t.column_names else -1
            df["__f"] = t.column("__offset").fill_null(-1).to_pandas() \
                if "__offset" in t.column_names else -1
            # winner = max (ordinal, offset) per key: stable sort then
            # keep the last occurrence — ties are byte-identical replays
            df = df.sort_values(["__o", "__f"], kind="stable")
            winners = df.drop_duplicates(subset=keys, keep="last").index.to_numpy()
            t = t.take(pa.array(sorted(winners)))
            t = t.filter(pa.compute.not_equal(
                t.column("__op").fill_null("U"), pa.scalar("D")))
        user = [f.name for f in stored.fields if not f.name.startswith("__")]
        for batch in t.select(user).to_batches():
            yield batch


class LakeTableDataSource(DataSource):
    """``spark.dataSource.register(LakeTableDataSource)`` then
    ``spark.read.format("rook_lake").load(path)`` (module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "rook_lake"

    def schema(self) -> T.StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("rook_lake requires .option('path', ...) / load(path)")
        v = self.options.get("version")
        snap = _read_snapshot(path, int(v) if v is not None else None)
        stored = T.StructType.fromJson(json.loads(snap.schema_json))
        columns = _parse_columns(dict(self.options))
        if columns is not None:
            stored = _narrow_stored(stored, list(snap.key_cols), columns)
        return T.StructType([
            f for f in stored.fields if not f.name.startswith("__")
        ])

    def reader(self, schema: T.StructType) -> LakeTableReader:
        return LakeTableReader(schema, dict(self.options))
