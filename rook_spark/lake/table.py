"""A minimal transactional, bucket-partitioned lake table.

The target environment has no Iceberg/Delta jars, so the engine ships its
own Iceberg-style table format with exactly the properties the CDC apply
path needs (SURVEY.md §2.9 K5/K6; reference semantics:
``DefaultRowsMutationIndexer.java:44-58`` — one transaction per batch,
commit-or-rollback):

- **Snapshot isolation + atomic commit**: table state is an immutable
  JSON snapshot (schema + lineage watermarks + batch fence + refs to
  content-addressed manifest-group blobs carrying the per-bucket file
  lists, MOR delta lists, stats, and bloom filters — Iceberg's
  manifest-list → manifest-file split; see ``_write_snapshot``). A
  commit writes the touched groups' blobs and the new snapshot file,
  then atomically flips a ``LATEST`` pointer via ``os.replace``
  (POSIX-atomic). A crash anywhere before the flip leaves the table at
  the old snapshot — orphaned data files and manifest blobs are
  invisible. This is the same commit protocol as Iceberg's metadata
  pointer swap, minus the catalog; per-commit metadata IO is
  O(touched buckets), never O(table).
- **Bucket partitioning**: rows are hash-bucketed on the key columns
  (``pmod(xxhash64(*key), n_buckets)``). A MERGE only reads and rewrites
  the buckets actually touched by the batch — at 100 TB with e.g. 2^16
  buckets, a batch touching 1% of keys rewrites ~1% of the table, and the
  merge join shuffles only that slice, never the full table. (With real
  Iceberg this maps 1:1 onto ``bucket(N, repo, path)`` partition specs and
  storage-partitioned joins.) The bucket id is *derivable* from the key,
  so it is never stored — files stay pure payload.
- **Lineage in the same epoch**: per-source-partition offset watermarks
  (``partition_id -> last_applied_offset, rows_applied, bytes``,
  north_rule) are fields of the snapshot JSON itself, so the data MERGE
  and the lineage write are ONE atomic commit — the "pair the snapshot
  with the offset-lineage write in one transactional epoch" requirement
  is satisfied structurally rather than by a two-phase protocol.
- **Batch-id fencing**: each snapshot records the streaming ``batch_id``
  it applied; re-delivery of an already-committed batch (foreachBatch
  replay after crash) is detected and skipped, giving exactly-once table
  state on top of Structured Streaming's at-least-once foreachBatch.
- **Additive schema evolution**: the snapshot stores the table schema;
  ``merge`` widens it when the batch carries new columns, and old data
  files are read through the widened schema (missing columns → null),
  mirroring north_rule's "new columns appear mid-stream and are
  back-filled as nulls" (the reference punts on this:
  ``MySQLReplicationStream.java:212`` "todo: do something about schema
  changes").

Single-writer deployment, multi-writer SAFETY: one streaming query owns
the table (true for the reference too — one binlog client per stream),
but the commit is a compare-and-swap on the parent version
(``lake/metastore.py``), so a second writer — a zombie driver after a
partition, an operator double-start — fails loudly with
``CommitConflict`` instead of silently last-write-winning. Readers are
never blocked and always see a consistent snapshot.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.lake.metastore import CommitConflict

_META = "_meta"
_DATA = "data"
_LATEST = "LATEST"
# buckets per manifest-group blob (see _write_snapshot): commit metadata
# IO is O(touched_buckets / group + 1) blobs; at 2^16 buckets a
# single-bucket epoch rewrites one 64-bucket group, not the whole map
_MANIFEST_GROUP = 64


def bucket_expr(key_cols: list[str] | tuple[str, ...], n_buckets: int):
    """Deterministic bucket id for a row: pmod(xxhash64(*key), n)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


# Iceberg type-promotion lattice (spec "Schema Evolution": int -> long,
# float -> double, decimal(P,S) -> decimal(P'>P, S)); the byte/short
# steps are the Spark-side prefix of the same integer chain.
_INT_CHAIN = ("byte", "short", "integer", "long")
_FLOAT_CHAIN = ("float", "double")


def _promote_type(stored: T.DataType, incoming: T.DataType) -> T.DataType | None:
    """The widened type two promotion-compatible types resolve to, else
    ``None``.

    Symmetric on purpose: an upstream that widened a column (MySQL
    ``ALTER ... BIGINT``) sends wider values than the table stores, and
    an upstream that was ALWAYS wide keeps sending wide values after the
    table schema widened — both directions must resolve to the wider
    type. Anything off the Iceberg promotion lattice (int -> string,
    scale changes, struct reshapes) returns ``None`` and the caller
    fails loudly: silently casting would corrupt data.
    """
    if stored == incoming:
        return stored
    for chain in (_INT_CHAIN, _FLOAT_CHAIN):
        a, b = stored.typeName(), incoming.typeName()
        if a in chain and b in chain:
            return stored if chain.index(a) >= chain.index(b) else incoming
    if isinstance(stored, T.DecimalType) and isinstance(incoming, T.DecimalType):
        if stored.scale == incoming.scale:
            return stored if stored.precision >= incoming.precision else incoming
    return None


def _widen_schema(
    cur_schema: T.StructType,
    payload_fields: list[T.StructField],
    key_cols: list[str],
) -> T.StructType:
    """Target schema for a merge: additive columns appended, existing
    columns promoted along the Iceberg lattice (``_promote_type``).

    Metadata-only, like Iceberg/Delta type widening: existing narrow
    parquet files are NEVER rewritten — the Spark 4 parquet reader
    upcasts int32 under a ``long`` read schema (float under double,
    decimal under higher precision), verified empirically in
    tests/test_lake.py. KEY columns refuse promotion: the bucket id is
    ``xxhash64(*key)`` and murmur/xxhash of an int differs from the same
    value hashed as a long, so a widened key would silently re-bucket
    every row (reads miss, merges duplicate). The migration path for a
    key-type change is an explicit ``rebucket`` of a recreated table.
    """
    by_name = {f.name: f for f in cur_schema.fields}
    out = list(cur_schema.fields)
    appended: list[T.StructField] = []
    for f in payload_fields:
        cur = by_name.get(f.name)
        if cur is None:
            appended.append(f)
            continue
        if cur.dataType == f.dataType:
            continue
        if cur.dataType.simpleString() == f.dataType.simpleString():
            # same type up to NULLABILITY metadata (array<int> with
            # containsNull true vs false, e.g. a stored nullable array
            # column fed from collect_list) — not an evolution; the
            # stored (more permissive) form stands and the merge's cast
            # loop aligns the incoming frame
            continue
        wide = _promote_type(cur.dataType, f.dataType)
        if wide is None:
            raise ValueError(
                f"incompatible type change for column {f.name!r}: stored "
                f"{cur.dataType.simpleString()}, incoming "
                f"{f.dataType.simpleString()} — only Iceberg promotions "
                "(int->long, float->double, decimal precision widening) "
                "are supported"
            )
        if f.name in key_cols and wide != cur.dataType:
            raise ValueError(
                f"type widening on key column {f.name!r} "
                f"({cur.dataType.simpleString()} -> {wide.simpleString()}) "
                "is not supported: bucket ids are xxhash64 of the native "
                "key type, so widening a key re-buckets every row. "
                "Recreate the table with the wide key type and backfill."
            )
        if wide != cur.dataType:
            out = [
                T.StructField(x.name, wide, x.nullable) if x.name == f.name else x
                for x in out
            ]
    return T.StructType(out + appended)


_BLOOM_M = 8192  # bits per (file, column) filter — 1 KiB packed
_BLOOM_K = 6  # hash probes; ~1% FP at ~850 distinct values per file


def _bloom_hashes(value) -> tuple[int, int]:
    """Two independent 64-bit hashes of a value (Kirsch–Mitzenmacher
    double hashing: probe_i = h1 + i*h2). Values are hashed through
    their string form so the filter is type-stable across the
    JSON/parquet round trip (1 and "1" differ: a type tag prefixes)."""
    import hashlib

    tag = type(value).__name__
    d = hashlib.blake2b(f"{tag}:{value}".encode(), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


def _bloom_build(values) -> str:
    """Pack the distinct values of one file-column into a base64 bloom
    filter (the Iceberg puffin blob analog, inlined into the snapshot
    manifest — fine at this format's file counts; a real catalog would
    side-load it)."""
    import base64

    bits = bytearray(_BLOOM_M // 8)
    for v in values:
        if v is None:
            continue
        h1, h2 = _bloom_hashes(v)
        for i in range(_BLOOM_K):
            p = (h1 + i * h2) % _BLOOM_M
            bits[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(bits)).decode()


def _bloom_may_contain(b64: str | None, value) -> bool:
    """False only when the filter PROVES the value absent from the file
    (missing filter ⇒ cannot prove ⇒ keep — skipping is an optimization,
    never a filter; false positives only weaken pruning)."""
    if not b64:
        return True
    import base64

    bits = base64.b64decode(b64)
    h1, h2 = _bloom_hashes(value)
    for i in range(_BLOOM_K):
        p = (h1 + i * h2) % _BLOOM_M
        if not bits[p >> 3] & (1 << (p & 7)):
            return False
    return True


_STR_STAT_LEN = 16  # Iceberg write.metadata.metrics truncate(16) analog


def _truncate_upper(s: str, n: int = _STR_STAT_LEN) -> str | None:
    """A value ``u`` with ``u >= s`` and ``len(u) <= n`` (the Iceberg
    ``truncate-and-increment`` upper bound): a plain prefix of an upper
    bound is NOT an upper bound, so the last incrementable code point of
    the prefix is bumped and the tail dropped. None when no such string
    exists (prefix is all U+10FFFF) — the caller stores a missing upper
    bound, which can never prune, so soundness is preserved."""
    if len(s) <= n:
        return s
    p = s[:n]
    for i in range(n - 1, -1, -1):
        cp = ord(p[i])
        if cp < 0x10FFFF:
            return p[:i] + chr(cp + 1)
    return None


def _stats_may_match(stats: dict | None, ranges: dict[str, tuple]) -> bool:
    """True unless the file's footer stats PROVE no row can fall in every
    requested range (missing stats for a column ⇒ cannot prove ⇒ keep —
    skipping is only ever an optimization, never a filter). Bounds are
    checked per side: a file whose upper bound was untruncatable keeps a
    lower bound and still prunes on it. A hint whose type cannot compare
    against the stored bounds (int range on a string column) proves
    nothing and keeps the file."""
    if not stats:
        return True
    for col, (lo, hi) in ranges.items():
        mm = stats.get(col)
        if not mm:
            continue
        mn, mx = mm
        try:
            if hi is not None and mn is not None and mn > hi:
                return False
            if lo is not None and mx is not None and mx < lo:
                return False
        except TypeError:
            continue
    return True


def _read_files_logical(spark, snap, files, extra_fields=(), schema=None):
    """Read parquet ``files`` under ``snap``'s LOGICAL schema (plus
    ``extra_fields``, e.g. the MOR ``__op``): the files carry PHYSICAL
    column names (see ``Snapshot.phys_map``), so the read schema is
    built physical and the result renamed positionally back to logical.
    The no-rename case is byte-identical to a plain schema'd read."""
    logical = list((schema or snap.schema()).fields) + list(extra_fields)
    phys = T.StructType(
        [T.StructField(snap.phys(f.name), f.dataType, f.nullable) for f in logical]
    )
    names = [f.name for f in logical]
    if not files:
        return spark.createDataFrame([], T.StructType(logical))
    df = spark.read.schema(phys).parquet(*files)
    return df.toDF(*names) if phys.fieldNames() != names else df


def _alloc_phys(snap, target_schema: T.StructType) -> dict[str, str]:
    """The phys_map governing a commit whose LOGICAL schema widened to
    ``target_schema``: existing mappings carry over verbatim; a logical
    column NEW in this commit normally maps to itself, but gets a fresh
    suffixed physical name when its name was ever used physically by a
    since-dropped/renamed column — retained files still carry data under
    that name, and reading it back into the new column would resurrect
    dropped values (the reason Iceberg re-adds under a new field id)."""
    cur_logical = {f.name for f in snap.schema().fields}
    new_map = dict(snap.phys_map)
    blocked = set(snap.retired_phys) | {snap.phys(n) for n in cur_logical}
    for f in target_schema.fields:
        if f.name in cur_logical or f.name.startswith("__") or f.name in new_map:
            continue
        if f.name in blocked:
            i = 2
            while f"{f.name}__v{i}" in blocked:
                i += 1
            new_map[f.name] = f"{f.name}__v{i}"
            blocked.add(new_map[f.name])
        else:
            blocked.add(f.name)
    return new_map


class ConstraintViolation(ValueError):
    """An ingest write carried rows that violate a table CHECK
    constraint (Delta ``InvariantViolationException`` analog). Raised
    BEFORE any file is written or snapshot committed — the epoch fails
    atomically and the table is unchanged. ``CdcEngine(
    constraint_mode='dead_letter')`` converts this into per-row routing
    instead: violating events go to the dead-letter path and the clean
    remainder applies."""


def _constraint_cols(constraints: dict[str, str]):
    """(violates, violated_names) columns for a row under ANSI CHECK
    semantics: a row violates a constraint iff its expression evaluates
    to FALSE — NULL (unknown) passes, exactly like SQL CHECK, so
    NOT-NULL intent must be written explicitly (``col IS NOT NULL``).
    ``violated_names`` lists which constraints failed (dead-letter
    forensics)."""
    flags = [
        (name, ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True)))
        for name, expr in sorted(constraints.items())
    ]
    violates = flags[0][1]
    for _, f in flags[1:]:
        violates = violates | f
    names = F.array_compact(F.array(*[F.when(f, F.lit(n)) for n, f in flags]))
    return violates, names


def constraint_split_cols(df: "DataFrame", constraints: dict[str, str],
                          schema: T.StructType):
    """(check_frame, violates, violated_names) for evaluating table
    constraints against a change set: table columns the batch does not
    carry are null-filled first — that is the value the merged row will
    store under additive evolution, so it is the value the CHECK must
    judge (NULL passes, per ANSI). Shared by the merge-path gate and
    the engine's dead-letter split so both judge identically."""
    chk = df
    for f in schema.fields:
        # internal __ columns are unreferencable by constraints and may
        # exist under a DIFFERENT pre-rename name in a raw change set
        # (commit_ordinal -> __ordinal) — adding a null twin would make
        # the later rename ambiguous
        if f.name not in chk.columns and not f.name.startswith("__"):
            chk = chk.withColumn(f.name, F.lit(None).cast(f.dataType))
    violates, names = _constraint_cols(constraints)
    return chk, violates, names


def _validate_constraints(spark, schema: T.StructType, constraints: dict[str, str],
                          context: str) -> None:
    """Every constraint expression must ANALYZE against the given
    logical schema (plan analysis only — no job). This is both the
    create/add-time sanity gate and the rename/drop refusal check: a
    DDL that would leave a stored constraint unresolvable must not
    commit (the next ingest would die with an AnalysisException instead
    of a actionable message)."""
    probe = spark.createDataFrame([], schema)
    for name, expr in sorted(constraints.items()):
        try:
            probe.where(F.expr(expr).cast("boolean"))
        except Exception as e:  # AnalysisException / ParseException
            raise ValueError(
                f"constraint {name!r} ({expr!r}) does not resolve against "
                f"{context}: {type(e).__name__}: {e}"
            ) from None


@dataclass
class Snapshot:
    version: int
    batch_id: int  # -1 before any batch
    schema_json: str
    key_cols: list[str]
    n_buckets: int
    # bucket id (as str, JSON keys are strings) -> list of file paths
    # relative to the table root
    buckets: dict[str, list[str]] = field(default_factory=dict)
    # partition_id (str) -> {last_applied_offset, rows_applied, bytes}
    lineage: dict[str, dict[str, int]] = field(default_factory=dict)
    committed_at: float = 0.0
    parent: int = -1
    # merge-on-read: bucket id -> ordered delta file lists (unresolved
    # change rows incl. tombstones, folded in by read()/compact())
    deltas: dict[str, list[str]] = field(default_factory=dict)
    # checkpoint-lineage identifier of the stream/run that committed
    # batch_id: foreachBatch batch ids restart at 0 for a NEW checkpoint
    # dir, so the batch-id fence is only valid within one run. "" = batch
    # (non-streaming) lineage.
    run_id: str = ""
    # file-level column statistics for BASE data files (Iceberg manifest
    # min/max analog): relative file path -> {column: [min, max]} for
    # numeric columns, harvested from the parquet footers at commit time.
    # Drives read(ranges=...) file skipping; see LakeTable.read.
    stats: dict[str, dict[str, list]] = field(default_factory=dict)
    # columns carrying per-file bloom filters (equality-skipping axis —
    # the stats axis for point predicates on any-typed columns, where
    # min/max can't help). Set at create(); harvested on every write.
    bloom_cols: list[str] = field(default_factory=list)
    # relative file path -> {column: base64 bloom bits} for base files.
    # Drives read(points=...) file skipping; see LakeTable.read.
    blooms: dict[str, dict[str, str]] = field(default_factory=dict)
    # movable branch ref: name -> version. One name is load-bearing:
    # "main" — when present the table is in WRITE-AUDIT-PUBLISH staging
    # (Iceberg WAP): default reads resolve refs["main"] (the last
    # audited/published version) while writes advance the chain head
    # past it; publish() fast-forwards the ref away, abort_staging()
    # rolls the head back onto it. Unlike tags, refs MOVE.
    refs: dict[str, int] = field(default_factory=dict)
    # named refs: tag name -> version (Iceberg create_tag analog).
    # Tags are REFS riding the snapshot chain, not state — every commit
    # carries them forward verbatim, tag()/drop_tag() are metadata-only
    # commits, and vacuum retains tagged versions (and their files)
    # past the keep_last window. See LakeTable.tag.
    tags: dict[str, int] = field(default_factory=dict)
    # bucket-routing columns: a PREFIX/subset of key_cols (Iceberg
    # bucket-transform-on-identifier-subset analog). None = key_cols
    # (the historical layout; old snapshots load as None). Lets a table
    # whose merge key is finer than its locality key — e.g. an inverted
    # index merged on (doc, token) but co-located by doc — keep one
    # row-set with two orthogonal pruning axes (buckets for the
    # locality key, blooms/stats for the rest).
    bucket_cols: list[str] | None = None
    # LOGICAL → PHYSICAL column-name map (Iceberg field-id analog,
    # expressed as names): ``schema_json``/key_cols/bucket_cols and
    # every public surface speak LOGICAL names; parquet files, footer
    # stats, and bloom keys always carry PHYSICAL names. A physical
    # name never changes once a file has been written with it — that
    # single invariant is what makes ``rename_column`` and
    # ``drop_column`` O(1) metadata commits on a 100 TB table: a rename
    # re-points the logical name at the same physical column, and a
    # column re-added after a drop maps to a FRESH physical name so the
    # dropped data can never resurrect out of old files. Identity
    # entries are omitted; {} = the historical all-identity layout
    # (old snapshots load unchanged).
    phys_map: dict[str, str] = field(default_factory=dict)
    # physical names released by rename/drop that may still exist in
    # retained data files — the allocation blacklist for additive
    # evolution (see ``phys_map``). Grows monotonically; entries only
    # matter until every file carrying them is compacted+vacuumed, but
    # keeping them forever is a few bytes and removes a whole class of
    # resurrection races.
    retired_phys: list[str] = field(default_factory=list)
    # table-level CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT`
    # analog): name -> SQL expression over LOGICAL column names. ANSI
    # CHECK semantics — a row violates iff the expression evaluates to
    # FALSE (NULL passes; write `col IS NOT NULL` for NOT NULL).
    # Enforced on every INGEST write (merge/merge_mor/overwrite) against
    # the incoming change set's upsert images — O(batch), never
    # O(table); rewrites (compact/cluster/rebucket) are exempt so a
    # constraint added with validate=False can never wedge maintenance.
    # State, not refs: rollback reverts them, clone carries them.
    constraints: dict[str, str] = field(default_factory=dict)
    # schema-evolution policy (the column-level data contract next to
    # `constraints`' row-level one): "auto" (historical behavior —
    # additive columns append, types promote along the Iceberg lattice)
    # or "locked" (Delta mergeSchema=false analog: a batch whose shape
    # would CHANGE the stored schema refuses loudly — an upstream typo
    # must not silently add a junk column to a 100 TB table). Batches
    # missing columns still apply (null-fill is not evolution). State:
    # rollback reverts it, clone carries it.
    evolution: str = "auto"
    # what produced this snapshot (Delta DESCRIBE HISTORY `operation` /
    # Iceberg snapshot-summary `operation` analog): "merge",
    # "merge-mor", "compact", "rollback", ... — surfaced by history().
    # "" = written before the label existed (old snapshots load fine).
    op: str = ""

    def bucket_key(self) -> list[str]:
        return self.bucket_cols or self.key_cols

    def phys(self, name: str) -> str:
        """Physical (in-file) name for a logical column. Internal
        ``__``-prefixed columns are never remapped."""
        return self.phys_map.get(name, name)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "batch_id": self.batch_id,
                "schema_json": self.schema_json,
                "key_cols": self.key_cols,
                "n_buckets": self.n_buckets,
                "buckets": self.buckets,
                "lineage": self.lineage,
                "committed_at": self.committed_at,
                "parent": self.parent,
                "deltas": self.deltas,
                "run_id": self.run_id,
                "stats": self.stats,
                "bloom_cols": self.bloom_cols,
                "blooms": self.blooms,
                "tags": self.tags,
                "refs": self.refs,
                "bucket_cols": self.bucket_cols,
                "phys_map": self.phys_map,
                "retired_phys": self.retired_phys,
                "constraints": self.constraints,
                "evolution": self.evolution,
                "op": self.op,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        return Snapshot(**json.loads(s))


class LakeTable:
    """Transactional bucketed table; see module docstring for guarantees."""

    def __init__(self, spark: SparkSession, path: str, store=None):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._meta_dir = os.path.join(self.path, _META)
        # the catalog seam (lake/metastore.py: snapshot CAS + manifest
        # blobs): every
        # snapshot read/commit goes through it; default = the POSIX
        # directory layout this table has always used
        if store is None:
            from rook_spark.lake.metastore import PosixMetadataStore

            store = PosixMetadataStore(self._meta_dir)
        self._store = store
        # manifest-group blob cache: blobs are immutable and
        # content-addressed, so entries never invalidate; bounded below
        self._manifest_cache: dict[str, dict] = {}

    # ---------------------------------------------------------------- create

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str] | tuple[str, ...],
        n_buckets: int = 32,
        store=None,
        bloom_cols: list[str] | tuple[str, ...] | None = None,
        bucket_cols: list[str] | tuple[str, ...] | None = None,
        constraints: dict[str, str] | None = None,
        schema_evolution: str = "auto",
    ) -> "LakeTable":
        """``bloom_cols``: columns to harvest per-file bloom filters for
        at every commit (drives ``read(points=...)`` equality skipping —
        the point-predicate pruning axis for columns min/max stats can't
        serve, e.g. a high-cardinality ``commit`` string). Costs one
        driver-local column read per fresh file at commit time.

        ``bucket_cols``: route buckets by a SUBSET of ``key_cols``
        (default: all of them) — the Iceberg bucket-transform-on-a-
        -key-prefix analog. Rows sharing the subset co-locate even when
        the merge key is finer (an inverted index merged on
        ``(doc, token)`` but co-located by doc); the subset constraint
        is what keeps every MERGE/delete path correct, since a row's
        bucket stays a pure function of its merge key."""
        if bucket_cols is not None:
            extra = set(bucket_cols) - set(key_cols)
            if extra or not bucket_cols:
                raise ValueError(
                    f"bucket_cols must be a non-empty subset of key_cols "
                    f"{list(key_cols)}, got {list(bucket_cols)}"
                )
        if constraints:
            _validate_constraints(spark, schema, constraints, "the table schema")
        if schema_evolution not in ("auto", "locked"):
            raise ValueError(
                f"schema_evolution must be 'auto' or 'locked', "
                f"got {schema_evolution!r}")
        t = cls(spark, path, store=store)
        t._store.init()
        if t.current_version() >= 0:
            raise ValueError(f"table already exists at {path}")
        snap = Snapshot(
            version=0,
            batch_id=-1,
            schema_json=json.dumps(schema.jsonValue()),
            key_cols=list(key_cols),
            n_buckets=n_buckets,
            committed_at=time.time(),
            bloom_cols=list(bloom_cols or []),
            bucket_cols=list(bucket_cols) if bucket_cols else None,
            constraints=dict(constraints or {}),
            evolution=schema_evolution,
            op="create",
        )
        t._write_snapshot(snap)
        return t

    @classmethod
    def clone(
        cls,
        spark: SparkSession,
        src_path: str,
        dst_path: str,
        version: int | None = None,
        tag: str | None = None,
        store=None,
    ) -> "LakeTable":
        """ZERO-COPY shallow clone (Delta ``SHALLOW CLONE`` / Iceberg
        snapshot-export analog): a new, independently writable table
        whose first snapshot REFERENCES the source's data files by
        absolute path — no bytes move, so forking a 100 TB table costs
        one metadata commit. Writes to the clone land under its own
        root and never touch the source; the source keeps evolving
        unaffected. The fork carries the source's LINEAGE WATERMARKS,
        so a cloned CDC target is a what-if fork of the pipeline: point
        a second engine at the clone and re-replay an alternate suffix
        of the log with full exactly-once semantics (the anti-filter
        admits exactly the offsets past the fork point).

        Resolution: ``tag`` / ``version`` pick the fork point; default
        is what consumers see (the published WAP ref while the source
        is staging, else head).

        HONEST CAVEATS (same as Delta's): the source's ``vacuum`` does
        not know about clones — reclaiming a version the clone still
        references breaks the clone's reads (loudly, at scan time).
        Durable forks should ``tag`` the source version first and keep
        the tag while the clone lives, or run ``clone.compact(
        max_files_per_bucket=0)`` — compaction rewrites every referenced
        byte under the clone's own root, turning the shallow clone into
        a deep one bucket by bucket. The clone starts with NO tags/refs
        (they would point into the source's chain) and a fresh version
        line at 0. ``store`` is the CLONE's metadata store; the source
        is opened with its default (POSIX) store."""
        src = cls.load(spark, src_path)
        if tag is not None:
            if version is not None:
                raise ValueError("pass at most one of version / tag")
            version = src.resolve_tag(tag)
        snap = src.snapshot(version)
        if version is None and "main" in snap.refs:
            snap = src.snapshot(snap.refs["main"])
        root = src.path

        def _abs(f: str) -> str:
            return f if os.path.isabs(f) else os.path.join(root, f)

        buckets = {b: [_abs(f) for f in fs] for b, fs in snap.buckets.items()}
        deltas = {b: [_abs(f) for f in fs] for b, fs in snap.deltas.items()}
        first = Snapshot(
            version=0,
            batch_id=snap.batch_id,
            schema_json=snap.schema_json,
            key_cols=list(snap.key_cols),
            n_buckets=snap.n_buckets,
            buckets=buckets,
            lineage={p: dict(m) for p, m in snap.lineage.items()},
            committed_at=time.time(),
            parent=-1,
            deltas=deltas,
            run_id="",
            stats={_abs(f): dict(mm) for f, mm in snap.stats.items()},
            bloom_cols=list(snap.bloom_cols),
            blooms={_abs(f): dict(bb) for f, bb in snap.blooms.items()},
            bucket_cols=snap.bucket_cols,
            phys_map=dict(snap.phys_map),
            retired_phys=list(snap.retired_phys),
            constraints=dict(snap.constraints),
            evolution=snap.evolution,
            op="clone",
        )
        t = cls(spark, dst_path, store=store)
        t._store.init()
        if t.current_version() >= 0:
            raise ValueError(f"clone target {dst_path} already exists")
        os.makedirs(os.path.join(t.path, _DATA), exist_ok=True)
        t._write_snapshot(first)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str, store=None) -> "LakeTable":
        t = cls(spark, path, store=store)
        if t.current_version() < 0:
            raise FileNotFoundError(f"no lake table at {path}")
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        # POSIX-layout convenience check (callers with a custom store use
        # LakeTable(..., store=...).current_version() >= 0 instead)
        return os.path.exists(os.path.join(os.path.abspath(path), _META, _LATEST))

    # ------------------------------------------------------------- snapshots

    def current_version(self) -> int:
        return self._store.read_pointer()

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = self.current_version() if version is None else version
        data = json.loads(self._store.read(v))
        refs = data.pop("manifest_refs", None)
        snap = Snapshot(**data)
        if refs:
            for key in refs.values():
                for b, e in self._read_manifest(key).items():
                    if e.get("files"):
                        snap.buckets[b] = list(e["files"])
                    if e.get("deltas"):
                        snap.deltas[b] = list(e["deltas"])
                    snap.stats.update(e.get("stats", {}))
                    snap.blooms.update(e.get("blooms", {}))
        return snap

    def _read_manifest(self, key: str) -> dict:
        m = self._manifest_cache.get(key)
        if m is None:
            if len(self._manifest_cache) > 4096:  # bound a long-lived driver
                self._manifest_cache.clear()
            m = self._manifest_cache[key] = json.loads(self._store.read_blob(key))
        return m

    def _write_snapshot(self, snap: Snapshot) -> None:
        """Durably store the snapshot, then atomically move the table
        pointer (the store's ``commit`` contract carries atomicity).

        Conditional on the parent this snapshot was built from: every
        construction path sets ``snap.parent`` to the version it read
        (``-1`` for ``create``), so a concurrent writer that committed
        in between surfaces as :class:`~rook_spark.lake.metastore
        .CommitConflict` instead of silently clobbering its bucket map
        — the Iceberg optimistic-concurrency contract.

        MANIFEST SHARDING (Iceberg manifest-list → manifest-file
        analog): the per-bucket state (file lists, MOR delta lists,
        min/max stats, bloom filters) is NOT inlined in the snapshot —
        it is sharded into content-addressed manifest-group blobs of
        ``_MANIFEST_GROUP`` consecutive buckets each, written via the
        store's idempotent ``put_blob`` BEFORE the pointer flip (no
        dangling refs at the commit point, same crash contract as data
        files). Content addressing makes unchanged groups free: an
        epoch touching b buckets writes ~ceil(b/G)+1 small objects
        instead of re-serializing every file entry in the table — the
        difference between O(touched) and O(table) metadata IO per
        commit, which is what lets a 2^16-bucket table at 10^10 events
        commit thousands of epochs without the manifest becoming the
        bottleneck. Old inline snapshots (pre-sharding) still load."""
        core = json.loads(snap.to_json())
        groups: dict[int, dict[str, dict]] = {}
        for b in set(snap.buckets) | set(snap.deltas):
            gid = int(b) // _MANIFEST_GROUP
            e: dict[str, Any] = groups.setdefault(gid, {}).setdefault(b, {})
            files = snap.buckets.get(b) or []
            deltas = snap.deltas.get(b) or []
            if files:
                e["files"] = files
            if deltas:
                e["deltas"] = deltas
            for f in files + deltas:
                if f in snap.stats:
                    e.setdefault("stats", {})[f] = snap.stats[f]
                if f in snap.blooms:
                    e.setdefault("blooms", {})[f] = snap.blooms[f]
        import hashlib

        refs: dict[str, str] = {}
        for gid, content in groups.items():
            js = json.dumps(content, sort_keys=True)
            key = hashlib.sha256(js.encode()).hexdigest()[:24]
            self._store.put_blob(key, js)
            refs[str(gid)] = key
        core.update(buckets={}, deltas={}, stats={}, blooms={}, manifest_refs=refs)
        self._store.commit(snap.version, json.dumps(core), expected_parent=snap.parent)

    # ----------------------------------------------------------------- reads

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_internal: bool = False,
        spark: SparkSession | None = None,
        ranges: dict[str, tuple] | None = None,
        points: dict[str, Any] | None = None,
        tag: str | None = None,
        ref: str | None = None,
        as_of=None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Read the table (optionally a past version / a subset of buckets).

        ``tag``: read the version a named tag points at (``VERSION AS OF
        'tag'`` by name; see :meth:`tag`). Mutually exclusive with
        ``version``.

        ``as_of``: wall-clock time travel (``TIMESTAMP AS OF``): epoch
        seconds, a datetime, or an ISO string — resolves to the newest
        retained version committed at or before that instant
        (:meth:`version_at`). Mutually exclusive with version/tag/ref.

        ``ref``: read a movable branch ref — ``"main"`` is the published
        (last-audited) version while write-audit-publish staging is
        active, ``"head"`` forces the chain head. DEFAULT reads resolve
        the ``"main"`` ref when it exists: consumers of a staging table
        only ever see audited state (see :meth:`begin_staging`); the
        engine's own write/maintenance paths read ``ref="head"``.

        ``columns`` — projection pushdown through the merge-on-read
        fold: the LWW resolution aggregates a struct of every payload
        column, which blocks Catalyst's column pruning — on a wide
        table a 2-column query would still scan every column chunk of
        every delta-bearing file. Passing ``columns`` narrows the
        parquet read schema itself; key columns are always included.

        File-level pruning: when ``buckets`` is given only those buckets'
        files are even listed — stronger than predicate pushdown, and the
        mechanism the MERGE uses to avoid scanning untouched data.
        Old files are read through the *current* schema, so columns added
        by schema evolution are null-backfilled for pre-evolution rows.

        ``ranges`` — STATS-BASED FILE SKIPPING (Iceberg manifest min/max
        analog, the second pruning axis next to buckets): a dict
        ``{column: (lo, hi)}`` (either bound None = unbounded) drops
        base files whose footer [min, max] for every named column cannot
        intersect the requested range — before Spark ever lists them, so
        at 100 TB a bounded scan (e.g. ``{"__ordinal": (watermark,
        None)}`` for an incremental sweep) reads only the files a
        predicate pushdown could never skip at the scan level. Contract:
        the result is a SUPERSET of the matching rows — the caller still
        applies the exact row filter; files are skipped only when no row
        can match (missing stats ⇒ file kept). Soundness under
        merge-on-read: pruning base files under a key-state (LWW)
        resolution could surface a stale delta as the apparent winner,
        so buckets carrying ANY deltas keep all their base files —
        pruning applies in full force exactly where rows ARE final state
        (COW / compacted buckets, where each key's single stored row is
        its current winner).

        ``points`` — BLOOM-BASED EQUALITY SKIPPING (Iceberg puffin-blob
        analog, the third pruning axis): ``{column: value}`` drops base
        files whose per-file bloom filter proves the value absent.
        Covers exactly what ``ranges`` can't — point predicates on
        any-typed (esp. string) columns, e.g. "every row commit C
        touched" over a table bucketed by (repo, path). Only columns in
        the table's ``bloom_cols`` ever have filters; others never
        prune. Same superset contract and MOR-delta exemption as
        ``ranges`` (a bloom false positive merely keeps a file).

        ``spark``: session to build the plan under (defaults to the
        table's). The MERGE passes the change set's session so the whole
        write plan executes under ONE session — foreachBatch hands out a
        CLONED session, and an Observation registered there never fires
        if the write's QueryExecution runs under the original session's
        listener manager.
        """
        spark = spark or self.spark
        if as_of is not None:
            if version is not None or tag is not None or ref is not None:
                raise ValueError("pass exactly one of version / tag / ref / as_of")
            version = self.version_at(as_of)
        if tag is not None:
            if version is not None or ref is not None:
                raise ValueError("pass exactly one of version / tag / ref")
            version = self.resolve_tag(tag)
        elif ref is not None and ref != "head":
            if version is not None:
                raise ValueError("pass exactly one of version / tag / ref")
            cur_refs = self.snapshot().refs
            if ref not in cur_refs:
                raise ValueError(f"no ref {ref!r} (have: {sorted(cur_refs)})")
            version = cur_refs[ref]
        snap = None
        if ref is None and version is None and tag is None:
            # WRITE-AUDIT-PUBLISH default: while staging is active the
            # published ref — the last AUDITED version — is what the
            # table "is" to consumers; staged epochs past it stay
            # invisible until publish(). Auditors and the engine's own
            # write paths read the chain head with ref="head".
            snap = self.snapshot()
            if "main" in snap.refs:
                snap = self.snapshot(snap.refs["main"])
        if snap is None:
            snap = self.snapshot(version)
        schema = snap.schema()
        if columns is not None:
            # PROJECTION PUSHDOWN THROUGH THE MOR FOLD. The delta
            # resolution below aggregates max_by(struct(<every payload
            # column>)), and Catalyst cannot prune columns through an
            # aggregate that references all of them — so a downstream
            # .select() on a wide table still scans every column chunk
            # of every delta-bearing file. Declaring the projection HERE
            # narrows the parquet read schema itself (columnar skip at
            # the source, the Iceberg scan-with-projection analog). Key
            # columns always ride along (the fold groups on them), and
            # ``__``-prefixed internals stay for winner ordering — then
            # drop at the end as usual. COW-only reads get pruning from
            # Catalyst anyway; ``columns`` just makes it explicit.
            have = {f.name for f in schema.fields}
            missing = [c for c in columns if c not in have]
            if missing:
                raise ValueError(
                    f"unknown columns {missing}; table has {sorted(have)}"
                )
            wanted = set(snap.key_cols) | set(columns)
            schema = T.StructType([
                f for f in schema.fields
                if f.name in wanted or f.name.startswith("__")
            ])
        # footer stats / bloom keys are PHYSICAL names (they describe
        # file bytes); callers speak logical — translate the hint keys
        if ranges:
            ranges = {snap.phys(c): v for c, v in ranges.items()}
        if points:
            points = {snap.phys(c): v for c, v in points.items()}
        keys = {str(b) for b in buckets} if buckets is not None else None

        def pick(mapping: dict[str, list[str]], prune: bool = False) -> list[str]:
            items = mapping.items() if keys is None else (
                (b, fs) for b, fs in mapping.items() if b in keys
            )
            out = []
            for b, fs in items:
                if prune and (ranges or points) and not snap.deltas.get(b):
                    if ranges:
                        fs = [f for f in fs if _stats_may_match(snap.stats.get(f), ranges)]
                    if points:
                        fs = [
                            f for f in fs
                            if all(
                                _bloom_may_contain(snap.blooms.get(f, {}).get(c), v)
                                for c, v in points.items()
                            )
                        ]
                out.extend(os.path.join(self.path, f) for f in fs)
            return out

        base_files = pick(snap.buckets, prune=True)
        df = _read_files_logical(spark, snap, base_files, schema=schema)

        delta_files = pick(snap.deltas)
        if delta_files:
            # merge-on-read resolution: base rows are implicit upserts; the
            # winner per key is the max-(ordinal, offset) row; a winning
            # tombstone drops the key. Same semantics the COW MERGE bakes
            # into files at write time, applied lazily here.
            have = {f.name for f in schema.fields}
            ord_cols = [c for c in ("__ordinal", "__offset") if c in have]
            if ord_cols:
                # the engine path: events carry their own total order
                deltas = _read_files_logical(
                    spark, snap, delta_files, schema=schema,
                    extra_fields=[T.StructField("__op", T.StringType())],
                )
                base = df.withColumn("__op", F.lit("U"))
                merged = base.unionByName(deltas)
                rank = F.struct(*[
                    F.coalesce(F.col(c), F.lit(-1)) for c in ord_cols])
                drop_after = ["__op"]
            else:
                # ordinal-less table (direct merge_mor callers): rank by
                # position in the bucket's delta chain instead — seq is
                # commit order, so later epochs win; base files rank -1.
                # Within ONE delta file ties are unordered: pre-reduce
                # each batch to one row per key (the engine's LWW reduce
                # does; merge_mor batches are epochs, not raw logs).
                by_seq: dict[int, list[str]] = {}
                for b, fs in snap.deltas.items():
                    if keys is not None and b not in keys:
                        continue
                    for seq, rel in enumerate(fs):
                        by_seq.setdefault(seq, []).append(
                            os.path.join(self.path, rel))
                merged = df.withColumn("__op", F.lit("U")).withColumn(
                    "__seq", F.lit(-1))
                for seq in sorted(by_seq):
                    d = _read_files_logical(
                        spark, snap, by_seq[seq], schema=schema,
                        extra_fields=[T.StructField("__op", T.StringType())],
                    ).withColumn("__seq", F.lit(seq))
                    merged = merged.unionByName(d)
                rank = F.col("__seq")
                drop_after = ["__op", "__seq"]
            payload = [c for c in merged.columns if c not in snap.key_cols]
            winner = F.max_by(F.struct(*payload), rank).alias("w")
            df = (
                merged.groupBy(*snap.key_cols)
                .agg(winner)
                .select(*snap.key_cols, *[F.col(f"w.{c}").alias(c) for c in payload])
                .where(F.col("__op") != "D")
                .drop(*drop_after)
            )
        if not include_internal:
            df = df.drop(*[c for c in df.columns if c.startswith("__")])
        return df

    def version_at(self, ts) -> int:
        """The newest retained version committed AT OR BEFORE ``ts``
        (Iceberg ``TIMESTAMP AS OF`` resolution; ts = epoch seconds, a
        datetime, or an ISO string). Walks retained metadata newest-
        first — vacuumed versions are skipped, and a timestamp older
        than everything retained raises (retention erodes wall-clock
        travel exactly like version travel; pin a tag for durable
        anchors)."""
        import datetime as _dt

        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts).timestamp()
        elif isinstance(ts, _dt.datetime):
            ts = ts.timestamp()
        for v in range(self.current_version(), -1, -1):
            try:
                s = self.snapshot(v)
            except FileNotFoundError:  # vacuumed
                continue
            if s.committed_at <= ts:
                return v
        raise ValueError(
            f"no retained version of {self.path} committed at or before "
            f"{ts} — older snapshots were vacuumed (tag the versions you "
            "need durable wall-clock access to)")

    def lineage(self, version: int | None = None) -> DataFrame:
        """The per-partition offset-watermark table (north_rule lineage)."""
        snap = self.snapshot(version)
        rows = [
            (int(p), int(m["last_applied_offset"]), int(m["rows_applied"]), int(m["bytes"]),
             int(snap.batch_id), float(snap.committed_at))
            for p, m in snap.lineage.items()
        ]
        schema = (
            "partition_id int, last_applied_offset long, rows_applied long, "
            "bytes long, batch_id long, committed_at double"
        )
        return self.spark.createDataFrame(rows, schema)

    def last_committed_batch(self) -> int:
        return self.snapshot().batch_id

    def history(self) -> DataFrame:
        """Version history as a DataFrame (Iceberg `snapshots` / Delta
        `DESCRIBE HISTORY` analog): one row per retained snapshot —
        version, the OPERATION that produced it (``merge``,
        ``merge-mor``, ``compact``, ``cluster``, ``rebucket``,
        ``rollback``, ``delete``, ``overwrite``, ``tag``/``drop-tag``,
        ``add-constraint``/``drop-constraint``, ``set-evolution``,
        ``rename-column``/``drop-column``, WAP ``begin-staging``/
        ``publish``/``abort-staging``, ``create``, ``clone``; null for
        snapshots written before the label existed), batch id, run id,
        commit time, parent, file/delta counts, and the total applied
        rows/bytes recorded in that version's lineage. Ops surface:
        answer "what changed this table and when" (the incident-review
        question) from metadata alone, monitor delta backlog
        (``n_delta_files`` growth → compaction cadence too slow), audit
        the epoch cadence, and pick time-travel targets. Vacuumed
        versions are absent (their snapshot json is retained metadata's
        boundary). Driver-side metadata only — never scans data files."""
        rows = []
        cur = self.current_version()
        for v in range(cur + 1):
            try:
                s = self.snapshot(v)
            except FileNotFoundError:  # vacuumed
                continue
            rows.append((
                s.version, s.op or None, s.batch_id, s.run_id,
                float(s.committed_at), s.parent,
                sum(len(f) for f in s.buckets.values()),
                sum(len(f) for f in s.deltas.values()),
                sum(int(m.get("rows_applied", 0)) for m in s.lineage.values()),
                sum(int(m.get("bytes", 0)) for m in s.lineage.values()),
            ))
        return self.spark.createDataFrame(
            rows,
            "version int, op string, batch_id long, run_id string, "
            "committed_at double, "
            "parent int, n_data_files long, n_delta_files long, "
            "total_rows_applied long, total_bytes long",
        )

    def files(self, version: int | None = None) -> DataFrame:
        """Live-file inventory as a DataFrame (Iceberg ``tbl.files``
        metadata-table analog): one row per data file referenced by the
        given snapshot (default: current) — bucket, kind (``base`` or
        ``delta``), position in the bucket's delta chain (``seq``, -1
        for base files), path relative to the table root, on-disk size,
        and which pruning axes the file carries (footer min/max stat
        columns, bloom columns). Ops surface: diagnose bucket skew
        (bytes per bucket), verify stats/bloom coverage before relying
        on ``read(ranges=/points=)`` pruning, and size compaction work
        (delta-chain depth per bucket). Driver-side metadata only —
        sizes come from the filesystem listing the snapshot already
        names, never from scanning file contents. Complements
        :meth:`history` (one row per snapshot) at file granularity."""
        snap = self.snapshot(version)
        rows = []

        def _row(bucket: str, kind: str, seq: int, rel: str):
            full = os.path.join(self.path, rel)
            try:
                size = int(os.path.getsize(full))
            except OSError:
                size = -1  # listed by the snapshot but missing on disk
            st = snap.stats.get(rel, {})
            bl = snap.blooms.get(rel, {})
            n_rows = int(st["__rows"][0]) if "__rows" in st else -1
            rows.append((
                snap.version, int(bucket), kind, seq, rel, size, n_rows,
                sorted(k for k in st if not k.startswith("__")),
                sorted(bl.keys()),
            ))

        for bucket, fs in snap.buckets.items():
            for rel in fs:
                _row(bucket, "base", -1, rel)
        for bucket, fs in snap.deltas.items():
            for seq, rel in enumerate(fs):
                _row(bucket, "delta", seq, rel)
        return self.spark.createDataFrame(
            rows,
            "version int, bucket int, kind string, seq int, path string, "
            "size_bytes long, rows long, stat_cols array<string>, "
            "bloom_cols array<string>",
        )

    def health(
        self,
        version: int | None = None,
        small_file_bytes: int = 32 << 20,
        compact_depth: int = 3,
        skew_ratio_warn: float = 4.0,
    ) -> dict:
        """Table health report, O(metadata) and zero Spark jobs — the
        day-2 dashboard a 100 TB deployment polls between epochs to
        decide WHEN to run the maintenance ops this table ships
        (``compact``, ``rebucket``, ``vacuum``): per-bucket file counts
        and bytes, MOR delta-chain depth (each unfolded delta is one
        more frame in every read's fold), the small-file census (files
        under ``small_file_bytes`` — the death-by-a-thousand-tasks
        signal), byte skew across buckets (max/median — a hot bucket is
        a straggler in every epoch), and retained-version count. Pure
        snapshot walk + filesystem stat of files the snapshot already
        names; never opens file contents (that is
        :meth:`verify_integrity`'s job). ``advice`` lists which
        maintenance op the numbers currently call for — the same
        thresholds ``compact_every``/``compact_depth`` cadences act on,
        surfaced for operators running maintenance out-of-band."""
        snap = self.snapshot(version)
        per_bucket_bytes: dict[int, int] = {}
        base_files = delta_files = small = missing = 0
        max_depth = 0
        buckets_over_depth = 0

        def _size(rel: str) -> int:
            try:
                return int(os.path.getsize(os.path.join(self.path, rel)))
            except OSError:
                return -1

        for b, fs in snap.buckets.items():
            for rel in fs:
                sz = _size(rel)
                if sz < 0:
                    missing += 1
                    continue
                base_files += 1
                if sz < small_file_bytes:
                    small += 1
                per_bucket_bytes[int(b)] = per_bucket_bytes.get(int(b), 0) + sz
        for b, fs in snap.deltas.items():
            depth = len(fs)
            max_depth = max(max_depth, depth)
            if depth >= compact_depth:
                buckets_over_depth += 1
            for rel in fs:
                sz = _size(rel)
                if sz < 0:
                    missing += 1
                    continue
                delta_files += 1
                per_bucket_bytes[int(b)] = per_bucket_bytes.get(int(b), 0) + sz

        sizes = sorted(per_bucket_bytes.values())
        p50 = sizes[len(sizes) // 2] if sizes else 0
        mx = sizes[-1] if sizes else 0
        skew = (mx / p50) if p50 else 0.0

        advice: list[str] = []
        if buckets_over_depth:
            advice.append(
                f"compact: {buckets_over_depth} bucket(s) at delta depth >= "
                f"{compact_depth} (max {max_depth}) — every read folds the chain"
            )
        if base_files and small / base_files > 0.5 and base_files > len(sizes):
            advice.append(
                f"compact: {small}/{base_files} base files under "
                f"{small_file_bytes >> 20} MB — task-per-file overhead dominates"
            )
        if skew > skew_ratio_warn and len(sizes) > 1:
            advice.append(
                f"rebucket: max bucket holds {skew:.1f}x the median bucket's "
                "bytes — hot-bucket straggler in every epoch"
            )
        if missing:
            advice.append(
                f"fsck: {missing} referenced file(s) missing on disk — run "
                "verify_integrity()/repair()"
            )

        return {
            "version": snap.version,
            "n_buckets": snap.n_buckets,
            "live_buckets": len(sizes),
            "base_files": base_files,
            "delta_files": delta_files,
            "missing_files": missing,
            "total_bytes": sum(sizes),
            "max_delta_depth": max_depth,
            "buckets_over_depth": buckets_over_depth,
            "small_files": small,
            "max_bucket_bytes": mx,
            "p50_bucket_bytes": p50,
            "bucket_skew": round(skew, 2),
            "versions_retained": len(self._store.versions()),
            "advice": advice,
        }

    def row_count(self, version: int | None = None) -> int:
        """EXACT table row count, O(metadata) where the snapshot allows
        it (the Iceberg snapshot-summary ``total-records`` analog): a
        delta-free bucket's count is the sum of its base files' parquet
        footer row counts, recorded in the snapshot at commit time —
        zero file IO, zero Spark jobs. Buckets that cannot be answered
        from metadata — they carry unfolded MOR deltas (the fold dedups
        and drops tombstoned keys, so base rows ≠ table rows) or were
        written before row counts were recorded — fall back to ONE
        bucket-pruned Spark count over exactly those buckets. On a
        steadily compacted 100 TB table this answers ``count(*)`` from
        the manifest alone; right after a MOR burst it degrades
        gracefully to counting only the delta-carrying slice. Default
        resolves what consumers read (the published WAP ref while
        staging, like :meth:`read`)."""
        snap = self.snapshot(version)
        if version is None and "main" in snap.refs:
            snap = self.snapshot(snap.refs["main"])
        total = 0
        fold_buckets: list[int] = []
        for b, fs in snap.buckets.items():
            if snap.deltas.get(b):
                fold_buckets.append(int(b))
                continue
            counts = [snap.stats.get(f, {}).get("__rows") for f in fs]
            if any(c is None for c in counts):
                fold_buckets.append(int(b))  # pre-feature files
                continue
            total += sum(int(c[0]) for c in counts)
        # delta-only buckets (no base yet) still need the fold
        fold_buckets += [
            int(b) for b, fs in snap.deltas.items()
            if fs and b not in snap.buckets
        ]
        if fold_buckets:
            total += self.read(version=snap.version,
                               buckets=sorted(set(fold_buckets))).count()
        return total

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        buckets: list[int] | None = None,
        images: str = "winner",
    ) -> DataFrame:
        """Incremental changelog read — CDC *out* of the lake (the
        Iceberg-changelog / Delta-CDF analog, and the table-level
        counterpart of rook's listener feed,
        ``rook-api/.../ReplicationListener.java:24-27``): the NET per-key
        difference between two committed versions as change rows.

        Output: the target schema's columns (image of the WINNING side —
        the new row for ``'U'``, the final old row for ``'D'``) plus
        ``op`` ('U' insert-or-update / 'D' delete) and the winning
        ``__ordinal``/``__offset``, so the result is itself a valid LWW
        change set: applying it to the ``from_version`` state reproduces
        the ``to_version`` state exactly (pinned by test).

        Net-effect semantics (like Iceberg's net_changes): intermediate
        flips between the two versions collapse — a key inserted and
        deleted in the window does not appear.

        Plan shape at scale: both versions read through the SAME bucket
        layout, so the full-outer key join is storage-co-partitioned (an
        Iceberg storage-partitioned join — no shuffle); pass ``buckets``
        to prune the scan to touched buckets (the touched-bucket set per
        epoch is in each snapshot's commit). Cost is O(scanned buckets),
        independent of how many epochs the window spans — for a
        per-epoch physical feed at O(batch) cost, MOR delta files are
        themselves the change rows.

        Schema evolution: columns added inside the window are
        null-backfilled on the 'D' (old-image) side.

        ``buckets`` pruning requires both versions to share a bucket
        layout: across a ``rebucket`` boundary the same bucket id names
        DISJOINT key sets, so a pruned diff would emit phantom
        deletes/upserts — refused loudly (full unpruned diffs stay
        correct: the key join never uses bucket ids).

        ``images``: ``"winner"`` (default — the historical single-row
        shape above) or ``"pair"``, the Delta Change Data Feed shape: an
        updated key emits TWO rows — ``op='update_preimage'`` carrying
        the ``from_version`` image and ``op='update_postimage'`` carrying
        the new one — while pure arrivals emit ``op='insert'`` and
        departures ``op='delete'`` (old image). Pre-images are what
        signed-fold consumers (incremental aggregates à la
        ``DeltaAggView``, downstream reconciliation, audit diffs) need:
        the negative contribution is IN the feed instead of requiring a
        join back to the old version. Same net-effect window semantics —
        the pre-image is the ``from_version`` row even if the key
        changed many times inside the window. Each row's
        ``__ordinal``/``__offset`` are its OWN image's winners, so the
        pair also says which event versions the window replaced. One
        extra plan branch (an explode over the same single join), zero
        extra shuffles or scans vs ``"winner"``.
        """
        if images not in ("winner", "pair"):
            raise ValueError(f"images must be 'winner' or 'pair', got {images!r}")
        snap_to = self.snapshot(to_version)
        if buckets is not None:
            n_from = self.snapshot(from_version).n_buckets
            if n_from != snap_to.n_buckets:
                raise ValueError(
                    f"changes(buckets=...) across a rebucket boundary: "
                    f"version {from_version} has {n_from} buckets, version "
                    f"{snap_to.version} has {snap_to.n_buckets} — bucket ids "
                    "name different key sets; run without buckets= pruning"
                )
        old = self.read(version=from_version, buckets=buckets, include_internal=True)
        new = self.read(version=snap_to.version, buckets=buckets, include_internal=True)
        # align the old side to the TO version's schema by PHYSICAL
        # identity (Snapshot.phys_map), not by name: across a
        # rename_column boundary the same column carries two logical
        # names (diff it with itself), across a drop + re-add boundary
        # the same NAME is two different columns (the re-added one is
        # null at from_version — never diffed against the dropped
        # values), and columns dropped in the window leave the diff
        # entirely (a column drop is not a row change).
        snap_from = self.snapshot(from_version)
        phys_to_old = {snap_from.phys(f.name): f.name
                       for f in snap_from.schema().fields}
        if snap_from.phys_map != snap_to.phys_map or \
                snap_from.schema_json != snap_to.schema_json:
            old = old.select(
                *[F.col(c) for c in old.columns if c.startswith("__")],
                *[
                    (F.col(src).alias(f.name) if src is not None
                     else F.lit(None).cast(f.dataType).alias(f.name))
                    for f in snap_to.schema().fields
                    if not f.name.startswith("__")
                    for src in [phys_to_old.get(snap_to.phys(f.name))]
                ],
            )
        keys = snap_to.key_cols
        payload = [c for c in new.columns if c not in keys]
        for c in payload:  # schema evolution: widen the old side with nulls
            if c not in old.columns:
                old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        o = old.withColumn("__p", F.lit(True)).alias("o")
        n = new.withColumn("__p", F.lit(True)).alias("n")
        cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
        j = o.join(n, cond, "full_outer")
        o_present = F.coalesce(F.col("o.__p"), F.lit(False))
        n_present = F.coalesce(F.col("n.__p"), F.lit(False))
        if "__ordinal" in new.columns and "__ordinal" in old.columns:
            # engine-written tables: the stored LWW (ordinal, offset) pair
            # identifies an unchanged row without comparing payloads
            same = F.struct(
                F.coalesce(F.col("o.__ordinal"), F.lit(-1)).alias("o"),
                F.coalesce(F.col("o.__offset"), F.lit(-1)).alias("t"),
            ) == F.struct(
                F.coalesce(F.col("n.__ordinal"), F.lit(-1)).alias("o"),
                F.coalesce(F.col("n.__offset"), F.lit(-1)).alias("t"),
            )
        else:
            # tables merged without ordinal columns: fall back to
            # null-safe payload equality
            same = F.lit(True)
            for c in payload:
                if c != "__p":
                    same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        is_delete = o_present & ~n_present
        is_upsert = n_present & (~o_present | ~same)
        key_cols_out = [
            F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
        ]
        pay = [c for c in payload if c != "__p"]
        if images == "pair":
            def _img(side: str, tag: str):
                return F.struct(
                    F.lit(tag).alias("op"),
                    *[F.col(f"{side}.{c}").alias(c) for c in pay],
                )

            is_insert = n_present & ~o_present
            is_update = o_present & n_present & ~same
            emits = (
                F.when(is_insert, F.array(_img("n", "insert")))
                .when(is_delete, F.array(_img("o", "delete")))
                .when(is_update, F.array(_img("o", "update_preimage"),
                                         _img("n", "update_postimage")))
            )
            return (
                j.where(is_delete | is_upsert)
                .select(*key_cols_out, F.explode(emits).alias("__e"))
                .select(*keys, "__e.op", *[F.col(f"__e.{c}").alias(c) for c in pay])
            )
        side = F.when(is_delete, F.lit("o")).otherwise(F.lit("n"))
        out_cols = key_cols_out + [
            F.when(side == "o", F.col(f"o.{c}")).otherwise(F.col(f"n.{c}")).alias(c)
            for c in payload
        ] + [F.when(is_delete, "D").otherwise("U").alias("op")]
        return j.where(is_delete | is_upsert).select(*out_cols)

    # ----------------------------------------------------------------- merge

    def merge(
        self,
        changes: DataFrame,
        batch_id: int,
        op_col: str = "op",
        lineage_update: dict[int, dict[str, int]] | None = None,
        validate_cardinality: bool = True,
        ordinal_col: str = "__ordinal",
        tiebreak_col: str = "__offset",
        touched_buckets: list[int] | None = None,
        post_write_lineage: Any = None,
        run_id: str = "",
        enforce_constraints: bool = True,
    ) -> dict[str, Any]:
        """Apply a deduplicated change set in one atomic snapshot commit.

        ``enforce_constraints=False`` skips the CHECK-constraint gate —
        ONLY for callers that already split violations out of the batch
        (the engine's dead-letter mode); every other ingest leaves it on.

        ``post_write_lineage``: optional callable invoked with
        ``lineage_update`` AFTER the data files are written but BEFORE
        the snapshot commit — lets callers fill metrics observed during
        the write job (still inside the same atomic epoch).

        ``changes`` must carry the key columns, payload columns, and an
        ``op`` column ('U'-like upsert rows and 'D' delete rows; inserts
        are upserts that match nothing) and must already be reduced to at
        most ONE row per key (the caller runs the LWW reduce — same
        cardinality contract as Iceberg/Delta MERGE). Semantics mirror the
        canonical CDC MERGE (SURVEY.md K5):

            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

        Exactly-once: if ``batch_id`` <= the last committed batch id AND
        ``run_id`` matches the committing run's, the call is a no-op
        (fencing for foreachBatch re-delivery). A different run_id (new
        checkpoint dir / fresh batch lineage) falls through — batch ids
        restart at 0 across checkpoints, so cross-run fencing would drop
        genuinely-new events; idempotency across runs comes from the
        caller's watermark filter + the conditional-ordinal MERGE.

        **DELETED-KEY CAVEAT (API contract, not an implementation
        detail):** the conditional-ordinal MERGE protects LIVE rows from
        stale re-delivered upserts, but COW keeps no tombstone for a
        deleted key — a stale upsert for a key deleted in an earlier
        batch matches nothing and would RE-INSERT it. Protection for
        deleted keys comes entirely from the per-partition offset
        watermark contract (``rook_spark.cdc.apply.watermark_filter``,
        which ``CdcEngine`` always applies): within a source partition,
        offsets at-or-below the applied high-water mark never reach this
        MERGE. Callers invoking ``merge()`` / ``apply_batch`` directly —
        e.g. a bootstrap-then-tail flow whose tail overlaps the
        bootstrap range — MUST either run the same watermark filter or
        guarantee their change feed never re-delivers offsets at-or-
        below a previously applied one; otherwise deleted rows can be
        resurrected.
        """
        snap = self.snapshot()
        if batch_id <= snap.batch_id and run_id == snap.run_id:
            return {"skipped": True, "reason": "batch already committed",
                    "version": snap.version, "batch_id": snap.batch_id}

        key_cols = snap.key_cols
        cur_schema = snap.schema()

        # --- schema evolution: new payload columns append; existing columns
        # promote along the Iceberg lattice (int->long, float->double,
        # decimal precision). Metadata-only — old files upcast at read.
        # __setmask/__inherit are patch-mode internals (cdc/patch.py):
        # merge bookkeeping, never table columns.
        internal = (op_col, "__bucket", "__setmask", "__inherit")
        payload_cols = [f for f in changes.schema.fields if f.name not in internal]
        target_schema = _widen_schema(cur_schema, payload_cols, key_cols)
        self._enforce_evolution_lock(snap, cur_schema, target_schema)
        target_cols = [f.name for f in target_schema.fields]

        # Cast incoming columns to the target types BEFORE bucket
        # assignment: xxhash64(int) != xxhash64(long), so a narrow key
        # arriving at a wide-keyed table must hash as the stored type or
        # the row lands in (and the merge reads) the wrong bucket.
        for f in target_schema.fields:
            if f.name in changes.columns and changes.schema[f.name].dataType != f.dataType:
                changes = changes.withColumn(f.name, F.col(f.name).cast(f.dataType))
        changes = changes.withColumn("__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets))
        # cache only when the change set feeds >1 action (guard and/or
        # touched-bucket listing besides the COW write); on the engine
        # fast path (cardinality guaranteed by LWW, buckets piggybacked
        # on the lineage job) the single write needs no materialization
        do_persist = (validate_cardinality or touched_buckets is None
                      or (enforce_constraints and bool(snap.constraints)))
        if do_persist:
            changes.persist()
        try:
            if enforce_constraints:
                self._enforce_constraints(changes, snap, target_schema, op_col)
            return self._merge_inner(
                changes, snap, batch_id, op_col, lineage_update,
                validate_cardinality, ordinal_col, tiebreak_col,
                target_schema, target_cols, cur_schema, key_cols,
                touched_buckets, post_write_lineage, run_id,
            )
        finally:
            if do_persist:
                changes.unpersist()

    def _merge_inner(
        self,
        changes: DataFrame,
        snap: Snapshot,
        batch_id: int,
        op_col: str,
        lineage_update: dict[int, dict[str, int]] | None,
        validate_cardinality: bool,
        ordinal_col: str,
        tiebreak_col: str,
        target_schema: T.StructType,
        target_cols: list[str],
        cur_schema: T.StructType,
        key_cols: list[str],
        touched_buckets: list[int] | None = None,
        post_write_lineage: Any = None,
        run_id: str = "",
    ) -> dict[str, Any]:
        if validate_cardinality:
            # same contract as Iceberg/Delta MERGE: at most one source row
            # per target key. One small aggregate over the (post-LWW) batch.
            dup = (
                changes.groupBy(*key_cols).count().where(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                raise ValueError(
                    "MERGE source has multiple rows for key "
                    f"{tuple(dup[0][k] for k in key_cols)}; run an LWW reduce first "
                    "(rook_spark.cdc.reduce.lww_reduce)"
                )

        # --- which buckets does this batch touch? (tiny collect: <= n_buckets
        #     ints; callers that already know — e.g. apply_batch piggybacks it
        #     on the lineage aggregate — pass it in and skip this job)
        if touched_buckets is not None:
            touched = sorted(touched_buckets)
        else:
            touched = sorted(
                r["__bucket"] for r in changes.select("__bucket").distinct().collect()
            )
        if not touched:
            new_snap = self._child_snapshot(snap, batch_id, target_schema, lineage_update, run_id, op="merge")
            self._write_snapshot(new_snap)
            return {"skipped": False, "version": new_snap.version, "touched_buckets": 0,
                    "buckets_rewritten": 0}

        # --- current state of ONLY the touched buckets. read() resolves
        #     any MOR deltas for those buckets, so a COW merge doubles as
        #     localized compaction (their delta lists are cleared below);
        #     old files/new columns null-fill through the widened schema.
        # build the current-state plan under the CHANGE SET'S session: in
        # foreachBatch that is a cloned session, and the final write must
        # execute there for the caller's Observation to be delivered
        spk = changes.sparkSession
        has_deltas = any(snap.deltas.get(str(b)) for b in touched)
        if has_deltas:
            current = self.read(buckets=touched, include_internal=True, spark=spk, ref="head")
        else:
            files = [os.path.join(self.path, f)
                     for b in touched for f in snap.buckets.get(str(b), [])]
            current = _read_files_logical(spk, snap, files)
        # Widen current state through the target schema: evolution-added
        # columns null-fill; type-promoted columns upcast (no-op casts
        # are elided by Catalyst, so the common unchanged case is free).
        cur_types = {f.name: f.dataType for f in current.schema.fields}
        current = current.select(*[
            (F.col(f.name).cast(f.dataType) if cur_types[f.name] != f.dataType
             else F.col(f.name)).alias(f.name)
            if f.name in cur_types
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target_schema.fields
        ])

        # --- MERGE as a full-outer join on the key.
        # Both sides are only touched-bucket data; on a real cluster with
        # Iceberg bucket specs this join is storage-partitioned (no shuffle);
        # here Catalyst shuffles just the touched slice.
        src = changes  # already cast to target types by merge()
        # partial-row-image mode (cdc/patch.py): the change set carries a
        # per-column authority mask + inheritance flag instead of claiming
        # the whole row. Detected structurally so merge() keeps one API.
        patch = "__setmask" in src.columns
        for f in target_schema.fields:  # old cols missing from the batch → null
            if f.name not in src.columns:
                src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
        src = src.select(*key_cols, op_col,
                         *[c for c in target_cols if c not in key_cols],
                         *(["__setmask", "__inherit"] if patch else []))

        t = current.withColumn("__t_present", F.lit(True)).alias("t")
        s = src.alias("s")
        cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]
        joined = t.join(s, cond, "full_outer")

        s_present = F.col(f"s.{op_col}").isNotNull()
        t_present = F.coalesce(F.col("t.__t_present"), F.lit(False))
        if ordinal_col in src.columns:
            # LWW against the STORED ordinal: a change only wins if its
            # (ordinal, offset) is >= the target row's. Makes the apply
            # commutative per key across batches FOR LIVE KEYS — replay or
            # out-of-order re-delivery of an older change cannot clobber a
            # newer stored row (cross-batch generalization of W1; rook gets
            # the same guarantee by re-reading final DB state per key,
            # DefaultRowsMutationIndexer.java:75-81). DELETED keys have no
            # stored ordinal (COW drops the row without a tombstone), so a
            # stale re-delivered upsert for a deleted key would match
            # nothing and re-insert it; protection there relies on the
            # per-partition watermark ordering contract (watermark_filter),
            # which drops any offset at-or-below the applied high-water mark
            # before it reaches this MERGE.
            s_ord = F.struct(
                F.coalesce(F.col(f"s.{ordinal_col}"), F.lit(-1)).alias("o"),
                F.coalesce(F.col(f"s.{tiebreak_col}"), F.lit(-1)).alias("t"),
            )
            t_ord = F.struct(
                F.coalesce(F.col(f"t.{ordinal_col}"), F.lit(-1)).alias("o"),
                F.coalesce(F.col(f"t.{tiebreak_col}"), F.lit(-1)).alias("t"),
            )
            s_wins = s_present & (~t_present | (s_ord >= t_ord))
        else:
            s_wins = s_present
        drop_row = s_wins & (F.col(f"s.{op_col}") == "D")
        mask_names = (
            set(src.schema["__setmask"].dataType.fieldNames()) if patch else set()
        )
        out_cols = []
        for c in target_cols:
            if c in key_cols:
                out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
            elif patch and c not in (ordinal_col, tiebreak_col):
                # per-column authority: set -> batch value; unset ->
                # stored value only while the batch didn't break
                # inheritance (I/D reset), else NULL. Columns the batch
                # never saw (schema-carried) have no mask field -> unset.
                set_c = (
                    F.coalesce(F.col("s.__setmask").getField(c), F.lit(False))
                    if c in mask_names
                    else F.lit(False)
                )
                s_val = F.when(set_c, F.col(f"s.{c}")).otherwise(
                    F.when(F.col("s.__inherit") & t_present, F.col(f"t.{c}"))
                )
                out_cols.append(
                    F.when(s_wins, s_val).otherwise(F.col(f"t.{c}")).alias(c)
                )
            else:
                out_cols.append(
                    F.when(s_wins, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                )
        merged = joined.where(~drop_row).select(*out_cols)
        merged = merged.withColumn("__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets))

        # --- write new files for touched buckets (copy-on-write).
        # Shuffle/task width = O(touched buckets), NOT O(table buckets): a
        # steady-state epoch touching 3 of 2^16 buckets must not schedule
        # a 65536-task stage (task-launch overhead would dominate the
        # epoch; measured 4096-bucket single-key epochs spent their whole
        # wall time on empty tasks). partitionBy still splits one task's
        # rows per bucket value, so the ~1-file-per-bucket layout holds
        # even when several buckets hash into one shuffle partition.
        new_version = snap.version + 1
        written = self._write_bucket_files(
            merged, new_version, min(snap.n_buckets, len(touched)),
            _alloc_phys(snap, target_schema))

        new_buckets = dict(snap.buckets)
        buckets_rewritten = 0
        for b in touched:
            fs = written.get(str(b), [])  # [] = bucket emptied (all deleted)
            if fs:
                new_buckets[str(b)] = fs
                buckets_rewritten += 1
            else:
                new_buckets.pop(str(b), None)

        if post_write_lineage is not None:
            lineage_update = post_write_lineage(lineage_update)
        new_snap = self._child_snapshot(snap, batch_id, target_schema, lineage_update, run_id, op="merge")
        new_snap.buckets = new_buckets
        # touched buckets' deltas were folded into the rewrite above
        for b in touched:
            new_snap.deltas.pop(str(b), None)
        self._carry_stats(new_snap, snap, self._file_stats(written),
                          self._file_blooms(written, new_snap))
        self._write_snapshot(new_snap)
        return {"skipped": False, "version": new_snap.version,
                "touched_buckets": len(touched), "buckets_rewritten": buckets_rewritten}

    def merge_mor(
        self,
        changes: DataFrame,
        batch_id: int,
        op_col: str = "op",
        lineage_update: dict[int, dict[str, int]] | None = None,
        touched_buckets: list[int] | None = None,
        post_write_lineage: Any = None,
        run_id: str = "",
        enforce_constraints: bool = True,
    ) -> dict[str, Any]:
        """Merge-on-read apply: write the (LWW-reduced) change rows as
        DELTA files — including 'D' tombstones — and defer resolution to
        read()/compact().

        This is the 10^10-event write path: epoch write cost is O(batch),
        never O(touched-bucket content) — no read of current state, no
        join, no rewrite amplification. The price is read amplification
        (read() folds base + deltas with an LWW aggregate), bounded by
        compaction (``compact`` folds deltas back into the base).
        Same exactly-once guarantees as the COW path: batch-id fence,
        lineage in the same atomic snapshot, conditional-ordinal
        semantics enforced at resolution time.
        """
        if "__setmask" in changes.columns:
            # a patch (cdc/patch.py) is not self-contained: deferring it
            # to a delta file would push the per-column fold into every
            # read and every delta consumer. Completing it against
            # current state IS the COW merge's touched-bucket join.
            raise ValueError(
                "partial-row-image change sets (__setmask present) require "
                "the COW path: call merge(), or run the engine with "
                "write_mode='cow' (see rook_spark.cdc.patch)"
            )
        snap = self.snapshot()
        if batch_id <= snap.batch_id and run_id == snap.run_id:
            return {"skipped": True, "reason": "batch already committed",
                    "version": snap.version, "batch_id": snap.batch_id}
        key_cols = snap.key_cols
        cur_schema = snap.schema()
        # Same evolution contract as the COW path: additive columns
        # append, existing columns promote along the Iceberg lattice
        # (metadata-only; narrow base/delta files upcast at read).
        payload_cols = [f for f in changes.schema.fields if f.name not in (op_col, "__bucket")]
        target_schema = _widen_schema(cur_schema, payload_cols, key_cols)
        self._enforce_evolution_lock(snap, cur_schema, target_schema)

        src = changes.withColumnRenamed(op_col, "__op")
        for f in target_schema.fields:
            if f.name not in src.columns:
                src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
            elif src.schema[f.name].dataType != f.dataType:
                # cast BEFORE bucket assignment — xxhash64(int) !=
                # xxhash64(long), so narrow keys must hash as stored
                src = src.withColumn(f.name, F.col(f.name).cast(f.dataType))
        src = src.select(*[f.name for f in target_schema.fields], "__op")
        src = src.withColumn("__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets))
        if enforce_constraints:
            # pre-write gate: a violating epoch writes NO delta file (a
            # delta would defer the violation into every read)
            self._enforce_constraints(src, snap, target_schema, "__op")

        new_version = snap.version + 1
        # Same O(touched) task-width rule as the COW path. The engine
        # piggybacks the touched-bucket list on its lineage aggregate and
        # passes it in; a direct caller without it gets a width clamped to
        # the session's core count — at 2^16 buckets an epoch write must
        # never schedule 65536 tasks (partitionBy keeps files split per
        # bucket either way), and computing distinct buckets here would
        # cost the extra job this O(batch) path exists to avoid.
        if touched_buckets is not None:
            width = min(snap.n_buckets, max(1, len(touched_buckets)))
        else:
            width = min(snap.n_buckets,
                        changes.sparkSession.sparkContext.defaultParallelism)
        delta_files = self._write_bucket_files(
            src, new_version, width, _alloc_phys(snap, target_schema))

        new_deltas = {b: list(fs) for b, fs in snap.deltas.items()}
        written = 0
        for b, fs in delta_files.items():
            new_deltas.setdefault(b, []).extend(fs)
            written += 1
        if post_write_lineage is not None:
            lineage_update = post_write_lineage(lineage_update or {})
        new_snap = self._child_snapshot(snap, batch_id, target_schema, lineage_update, run_id, op="merge-mor")
        new_snap.deltas = new_deltas
        self._write_snapshot(new_snap)
        return {"skipped": False, "version": new_snap.version,
                "touched_buckets": written, "mode": "mor"}

    def overwrite(self, df: DataFrame, batch_id: int | None = None) -> None:
        """Replace the whole table content (bulk load / test setup)."""
        snap = self.snapshot()
        schema = T.StructType([f for f in df.schema.fields if f.name != "__bucket"])
        self._enforce_evolution_lock(snap, snap.schema(), schema)
        self._enforce_constraints(df, snap, schema, None)
        new_version = snap.version + 1
        with_bucket = df.withColumn("__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets))
        buckets = self._write_bucket_files(
            with_bucket, new_version, None, _alloc_phys(snap, schema))
        new_snap = self._child_snapshot(
            snap, snap.batch_id if batch_id is None else batch_id, schema, None,
            op="overwrite",
        )
        new_snap.buckets = buckets
        self._carry_stats(new_snap, snap, self._file_stats(buckets),
                          self._file_blooms(buckets, new_snap))
        self._write_snapshot(new_snap)

    # ----------------------------------------------------------- maintenance

    def vacuum(self, keep_last: int = 2, min_age_s: float = 0.0,
               dry_run: bool = False) -> dict:
        """Delete data files unreferenced by the last ``keep_last``
        snapshots (and drop older snapshot metadata).

        ``dry_run=True`` (Delta ``VACUUM ... DRY RUN`` analog) computes
        the exact reclamation — same liveness walk, same grace checks —
        and returns it WITHOUT deleting anything, plus the candidate
        file list under ``"files"``: size a retention change before
        committing to it. A dry run mutates nothing, so it is also
        allowed inside an open catalog group (a real vacuum refuses). COW writes one new
        file set per touched bucket per epoch, so without vacuum a
        long-running stream accumulates every historical version. Safe
        with concurrent readers of retained versions only — same
        contract as Iceberg's expire_snapshots.

        ``min_age_s`` — GRACE FOR IN-FLIGHT COMMITS (Iceberg
        ``remove_orphan_files older_than`` analog): an unreferenced file
        or manifest blob younger than this many seconds is KEPT. A
        concurrent writer lands its data files and manifest blobs
        BEFORE its snapshot commit references them, so to vacuum's
        liveness sweep an in-flight commit is indistinguishable from
        garbage — deleting it would publish a snapshot with dangling
        refs the moment the writer's CAS succeeds. When vacuum runs
        beside live writers (the deployment ``_commit_rewrite``'s
        rebase-on-conflict exists for), set ``min_age_s`` above the
        longest plausible write-files→commit window (Iceberg defaults
        to 3 DAYS); the default 0 keeps the historical
        exclusive-maintenance behavior and reclaims everything
        immediately. Blob ages come from the store's ``blob_mtime``
        seam (0.0 = unknown age = eligible, preserving old-store
        behavior)."""
        import glob

        # vacuum PHYSICALLY deletes (data files first): inside an open
        # catalog group the staged head is not durable, so a later
        # group abort would leave the durable snapshot referencing
        # deleted bytes — refuse up front, before any os.remove (the
        # store's own delete/delete_blob guards fire too late to
        # protect the data files)
        probe = getattr(self._store, "in_active_group", None)
        if not dry_run and probe is not None and probe():
            raise RuntimeError(
                "vacuum inside an open catalog group is not atomic — "
                "run retention outside the group"
            )
        now = time.time()
        current = self.current_version()
        window_start = max(0, current - keep_last + 1)
        # tagged versions are retained OUTSIDE the window (the whole
        # point of a tag: pin an audit/repro snapshot while untagged
        # history is reclaimed aggressively); their files and metadata
        # both survive, and the blob-GC below follows automatically
        # because liveness is computed over whatever versions remain
        head_snap = self.snapshot()
        tagged = set(head_snap.tags.values()) | set(head_snap.refs.values())
        keep_versions = sorted(
            set(range(window_start, current + 1)) | {v for v in tagged if v <= current}
        )
        referenced: set[str] = set()
        for v in keep_versions:
            try:
                snap = self.snapshot(v)
            except FileNotFoundError:
                continue
            for fs in snap.buckets.values():
                referenced.update(fs)
            for fs in snap.deltas.values():
                referenced.update(fs)
        removed_files = 0
        dead_files: list[str] = []
        data_root = os.path.join(self.path, _DATA)
        for f in glob.glob(os.path.join(data_root, "**", "*.parquet"), recursive=True):
            rel = os.path.relpath(f, self.path)
            if rel not in referenced:
                if min_age_s > 0:
                    try:
                        if now - os.path.getmtime(f) < min_age_s:
                            continue  # possibly an in-flight commit's file
                    except OSError:
                        continue
                if not dry_run:
                    os.remove(f)
                removed_files += 1
                dead_files.append(rel)
        # prune now-empty version dirs and expired snapshot json
        for d in glob.glob(os.path.join(data_root, "v*")) if not dry_run else []:
            for sub in glob.glob(os.path.join(d, "__bucket=*")):
                if not os.listdir(sub):
                    os.rmdir(sub)
            if not any(os.scandir(d)):
                os.rmdir(d)
        removed_snaps = 0
        for v in self._store.versions():
            if v < window_start and v not in tagged:
                if not dry_run:
                    self._store.delete(v)
                removed_snaps += 1
        # manifest-blob GC: a blob is live iff some RETAINED snapshot's
        # refs name it (content addressing means blobs are shared across
        # snapshots, so liveness is a set union, exactly like data files)
        live_blobs: set[str] = set()
        for v in self._store.versions():
            if dry_run and v < window_start and v not in tagged:
                continue  # a real run would have deleted this snapshot
            try:
                live_blobs.update(
                    json.loads(self._store.read(v)).get("manifest_refs", {}).values()
                )
            except FileNotFoundError:
                continue
        removed_blobs = 0
        for key in self._store.blob_keys():
            if key not in live_blobs:
                if min_age_s > 0 and now - self._store.blob_mtime(key) < min_age_s:
                    continue  # possibly an in-flight commit's manifest
                if not dry_run:
                    self._store.delete_blob(key)
                    self._manifest_cache.pop(key, None)
                removed_blobs += 1
        out = {"removed_files": removed_files, "removed_snapshots": removed_snaps,
               "removed_manifests": removed_blobs,
               "kept_versions": len(keep_versions)}
        if dry_run:
            out["dry_run"] = True
            out["files"] = sorted(dead_files)
        return out

    def verify_integrity(self, version: int | None = None,
                         all_versions: bool = False, deep: bool = False,
                         strict: bool = False) -> dict:
        """FSCK for the table — the read-side dual of ``vacuum``'s
        liveness walk: instead of deleting what no snapshot references,
        verify that everything the snapshots DO reference is actually
        there and consistent. Checks, cheapest first:

        - **references**: every data file the checked snapshot(s) name
          exists on disk with nonzero size (``missing_files`` — a clone
          whose source was vacuumed, a fat-fingered rm, a partial
          restore);
        - **manifests**: every retained snapshot's metadata loads,
          sharded manifest blobs included (``unreadable_versions`` — a
          GC'd blob a snapshot still refs would otherwise only surface
          when a reader happens to time-travel there);
        - **stats** (``deep=True``): per file carrying a ``__rows``
          stat, the parquet FOOTER row count equals it
          (``stat_mismatches`` — a drifted count silently corrupts
          O(metadata) ``row_count()`` and the pruning-soundness story).
          Footer-only driver-side reads, O(checked files), no Spark job;
        - **blob hashes** (``deep=True``): every checked snapshot's
          manifest-group blob re-hashes to its content-addressed key
          (``blob_hash_mismatches`` — bit rot or tampering in the
          metadata itself, which the reference/stat checks would only
          catch indirectly);
        - **orphans**: data files on disk referenced by NO retained
          version (informational — they are exactly what the next
          ``vacuum`` reclaims, so never an error).

        Default checks the CURRENT snapshot's references;
        ``all_versions=True`` walks every retained version (time travel
        and rollback targets must be servable too). ``strict=True``
        raises ``RuntimeError`` on missing files / unreadable versions /
        stat drift — the CI-gate mode. At 100 TB this is O(metadata +
        one stat per file), the same driver-side scale as vacuum's walk;
        it never reads data pages."""
        import glob

        current = self.current_version()
        check = sorted(self._store.versions()) if all_versions else [
            current if version is None else version
        ]
        missing: list[str] = []
        unreadable: list[tuple[int, str]] = []
        mismatches: list[dict] = []
        blob_bad: list[str] = []
        blobs_seen: set[str] = set()
        files_checked = 0
        seen: set[str] = set()
        for v in check:
            try:
                snap = self.snapshot(v)
            except Exception as e:  # missing json OR missing manifest blob
                unreadable.append((v, f"{type(e).__name__}: {e}"))
                continue
            if deep:
                import hashlib

                refs_map = json.loads(self._store.read(v)).get(
                    "manifest_refs", {})
                for key in refs_map.values():
                    if key in blobs_seen:
                        continue
                    blobs_seen.add(key)
                    payload = self._store.read_blob(key)
                    if hashlib.sha256(payload.encode()).hexdigest()[:24] != key:
                        blob_bad.append(key)
            refs = [f for fs in snap.buckets.values() for f in fs]
            refs += [f for fs in snap.deltas.values() for f in fs]
            for rel in refs:
                if rel in seen:
                    continue
                seen.add(rel)
                files_checked += 1
                full = os.path.join(self.path, rel)  # abs rel (clone) wins
                try:
                    size = os.path.getsize(full)
                except OSError:
                    missing.append(rel)
                    continue
                if size == 0:
                    missing.append(rel)
                    continue
                if deep and "__rows" in snap.stats.get(rel, {}):
                    import pyarrow.parquet as pq

                    stored = int(snap.stats[rel]["__rows"][0])
                    actual = int(pq.ParquetFile(full).metadata.num_rows)
                    if stored != actual:
                        mismatches.append(
                            {"path": rel, "stored_rows": stored,
                             "footer_rows": actual})
        # orphan inventory vs ALL retained versions (not just `check`)
        live: set[str] = set()
        for v in self._store.versions():
            try:
                s = self.snapshot(v)
            except Exception:
                continue
            for fs in s.buckets.values():
                live.update(fs)
            for fs in s.deltas.values():
                live.update(fs)
        orphans = sorted(
            os.path.relpath(f, self.path)
            for f in glob.glob(
                os.path.join(self.path, _DATA, "**", "*.parquet"),
                recursive=True)
            if os.path.relpath(f, self.path) not in live
        )
        ok = (not missing and not unreadable and not mismatches
              and not blob_bad)
        out = {"ok": ok, "versions_checked": check,
               "files_checked": files_checked, "missing_files": sorted(missing),
               "unreadable_versions": unreadable,
               "stat_mismatches": mismatches,
               "blob_hash_mismatches": sorted(blob_bad), "orphans": orphans}
        if strict and not ok:
            raise RuntimeError(f"integrity check failed: {out}")
        return out

    def repair(self) -> dict:
        """The FIX half of :meth:`verify_integrity` (Delta ``FSCK REPAIR
        TABLE`` analog): one metadata commit dropping every reference to
        a data file that is MISSING on disk (absent or zero bytes), so
        the table is readable again after an unrecoverable loss — a
        vacuumed clone source, a partial restore, a fat-fingered rm.

        This is LOUD, QUANTIFIED data loss, not recovery: a dropped base
        file loses its un-shadowed rows, a dropped MOR delta loses that
        epoch's changes to the bucket; the return value lists both and
        estimates ``rows_lost`` from the stored footer counts
        (``rows_unknown`` counts dropped files that carried no stat).
        Watermarks are deliberately NOT reverted — the rows' offsets
        were consumed, so a re-replay would be fenced; when the source
        log is still retained, ``rollback`` to a healthy version +
        re-replay is the LOSSLESS repair and should be preferred. Like
        every commit, this moves history forward: pre-repair versions
        keep (and keep failing on) the missing refs until vacuumed.
        No-op without a commit when nothing is missing."""
        cur = self.snapshot()

        def _gone(rel: str) -> bool:
            full = os.path.join(self.path, rel)
            try:
                return os.path.getsize(full) == 0
            except OSError:
                return True

        dropped_bases = sorted(
            f for fs in cur.buckets.values() for f in fs if _gone(f))
        dropped_deltas = sorted(
            f for fs in cur.deltas.values() for f in fs if _gone(f))
        gone = set(dropped_bases) | set(dropped_deltas)
        if not gone:
            return {"ok": True, "version": cur.version,
                    "dropped_base_files": [], "dropped_delta_files": [],
                    "rows_lost": 0, "rows_unknown": 0}
        rows_lost, rows_unknown = 0, 0
        for f in gone:
            st = cur.stats.get(f, {})
            if "__rows" in st:
                rows_lost += int(st["__rows"][0])
            else:
                rows_unknown += 1
        new = Snapshot(
            version=cur.version + 1,
            batch_id=cur.batch_id,
            schema_json=cur.schema_json,
            key_cols=list(cur.key_cols),
            n_buckets=cur.n_buckets,
            buckets={b: keep for b, fs in cur.buckets.items()
                     if (keep := [f for f in fs if f not in gone])},
            lineage={p: dict(m) for p, m in cur.lineage.items()},
            committed_at=time.time(),
            parent=cur.version,
            deltas={b: keep for b, fs in cur.deltas.items()
                    if (keep := [f for f in fs if f not in gone])},
            run_id=cur.run_id,
            bucket_cols=cur.bucket_cols,
            stats={f: dict(mm) for f, mm in cur.stats.items() if f not in gone},
            bloom_cols=list(cur.bloom_cols),
            blooms={f: dict(bb) for f, bb in cur.blooms.items() if f not in gone},
            tags=dict(cur.tags),
            refs=dict(cur.refs),
            phys_map=dict(cur.phys_map),
            retired_phys=list(cur.retired_phys),
            constraints=dict(cur.constraints),
            evolution=cur.evolution,
            op="repair",
        )
        self._write_snapshot(new)
        return {"ok": False, "version": new.version,
                "dropped_base_files": dropped_bases,
                "dropped_delta_files": dropped_deltas,
                "rows_lost": rows_lost, "rows_unknown": rows_unknown}

    def compact(self, max_files_per_bucket: int = 1, batch_id: int | None = None,
                target_files_per_bucket: int = 1,
                buckets: list[int] | None = None) -> dict[str, int]:
        """Rewrite buckets whose base-file count exceeds the threshold —
        or that carry ANY merge-on-read deltas — into ``target_files_per_
        bucket`` resolved files each (bin-packing compaction + delta
        fold). The rewrite is a new snapshot — readers are never blocked;
        vacuum reclaims the old files. This is the MOR read-amplification
        bound: run it on a cadence (or delta-count trigger) and reads
        stay O(base).

        ``buckets`` restricts the rewrite to an explicit bucket set
        (targeted compaction): the thresholds are ignored and exactly
        the named buckets that hold any files or deltas are rewritten.
        This is the primitive depth-triggered maintenance builds on
        (``CdcEngine(compact_depth=N)``) — at 100 TB, compaction work
        should be proportional to the BACKLOG (the few hot buckets a
        skewed key pushed deep), not to the table or the cadence.

        ``target_files_per_bucket`` is the OUTPUT sizing knob (the
        ``cluster()`` twin without the sort): the default 1 maximizes
        fold density, but a 100 TB table at a few thousand buckets would
        fold each bucket into one multi-GB file — one task writes it,
        one task reads it, and a single straggler owns the bucket. >1
        splits each rewritten bucket across that many tasks/files by a
        key hash, so file size — not bucket count — bounds parallelism.
        Per-file stats/blooms are re-harvested per OUTPUT file either
        way, so pruning granularity improves with the split."""
        snap = self.snapshot()
        if buckets is not None:
            fat = sorted(
                int(b) for b in {str(x) for x in buckets}
                if snap.buckets.get(b) or snap.deltas.get(b)
            )
        else:
            fat = sorted(
                {int(b) for b, fs in snap.buckets.items() if len(fs) > max_files_per_bucket}
                | {int(b) for b, fs in snap.deltas.items() if fs}
            )
        if not fat:
            return {"compacted_buckets": 0}
        df = self.read(buckets=fat, include_internal=True, ref="head").withColumn(
            "__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets)
        )
        new_version = snap.version + 1
        if target_files_per_bucket > 1:
            # pre-split each bucket across ~target tasks by full-key hash
            # (finer than the bucket key, so the split is even);
            # partitionBy still routes rows to per-bucket files, so a
            # task holding two buckets' rows writes two files, never a
            # mixed one
            df = df.repartition(
                len(fat) * target_files_per_bucket, "__bucket",
                F.xxhash64(*[F.col(c) for c in snap.key_cols]),
            )
            written = self._write_bucket_files(df, new_version, None, snap.phys_map)
        else:
            written = self._write_bucket_files(df, new_version, len(fat), snap.phys_map)
        applied, skipped, version = self._commit_rewrite(snap, fat, written, batch_id,
                                                         op="compact")
        return {"compacted_buckets": len(applied), "version": version,
                "skipped_buckets": len(skipped)}

    def rollback(self, version: int) -> dict[str, int]:
        """Atomic revert to a retained ``version`` (Iceberg
        ``rollback_to_snapshot`` analog — the bad-batch recovery path):
        commits a NEW snapshot whose bucket map, deltas, schema, lineage
        watermarks, and batch/run fences are copied from the target
        version — history moves FORWARD (the bad versions stay readable
        for audit until vacuumed), readers flip atomically, and because
        the lineage watermarks revert WITH the data, the exactly-once
        anti-filter re-admits the rolled-back offsets: recovery is
        ``rollback(v_good)`` + re-replay of the source log, no manual
        fence surgery. Zero data movement — metadata-only, same ~ms cost
        as any commit. Refuses to roll back onto files vacuum already
        reclaimed (checked against the live tree before the flip).

        Streaming caveat: a Structured Streaming checkpoint tracks its
        OWN source progress and will not re-deliver batches it already
        committed, so after a rollback the re-replay leg must come from
        outside the stream — a batch backfill of the source log over the
        rolled-back offset range (``CdcEngine.replay``; the reverted
        watermarks admit exactly that range, and the run_id-scoped fence
        means the backfill's batch ids never collide with the stream's),
        or a fresh checkpoint dir. Resuming the OLD checkpoint alone
        would silently leave the rolled-back window unapplied."""
        cur = self.snapshot()
        target = self.snapshot(version)  # FileNotFoundError if expired
        missing = [
            f
            for fs in list(target.buckets.values()) + list(target.deltas.values())
            for f in fs
            if not os.path.exists(os.path.join(self.path, f))
        ]
        if missing:
            raise ValueError(
                f"cannot roll back to version {version}: {len(missing)} of its "
                f"data files were vacuumed (first: {missing[0]})"
            )
        new = Snapshot(
            version=cur.version + 1,
            batch_id=target.batch_id,
            schema_json=target.schema_json,
            key_cols=list(target.key_cols),
            n_buckets=target.n_buckets,
            buckets={b: list(fs) for b, fs in target.buckets.items()},
            lineage={p: dict(m) for p, m in target.lineage.items()},
            committed_at=time.time(),
            parent=cur.version,
            deltas={b: list(fs) for b, fs in target.deltas.items()},
            run_id=target.run_id,
            bucket_cols=target.bucket_cols,
            stats={f: dict(mm) for f, mm in target.stats.items()},
            bloom_cols=list(target.bloom_cols),
            blooms={f: dict(bb) for f, bb in target.blooms.items()},
            # tags/refs are refs, not state: they survive the revert
            # (Iceberg tags are independent of the branch rollback;
            # abort_staging clears the "main" ref itself after reverting)
            tags=dict(cur.tags),
            refs=dict(cur.refs),
            # the map matches the reverted schema; the retirement
            # blacklist stays MONOTONE across the revert (files written
            # by the rolled-back versions still exist until vacuum)
            phys_map=dict(target.phys_map),
            retired_phys=sorted(set(cur.retired_phys) | set(target.retired_phys)),
            # constraints are schema-adjacent STATE (like schema_json):
            # a rollback past an add_constraint removes the check, past
            # a drop_constraint restores it
            constraints=dict(target.constraints),
            evolution=target.evolution,
            op="rollback",
        )
        self._write_snapshot(new)
        return {"rolled_back_to": version, "version": new.version}

    # ----------------------------------------------------------------- tags

    def tag(self, name: str, version: int | None = None, replace: bool = False) -> dict:
        """Name a version (Iceberg ``create_tag`` analog): ``read(tag=
        name)`` resolves it, and ``vacuum`` RETAINS the tagged version's
        metadata and data files past the ``keep_last`` window — tags are
        the retention policy for audit/repro snapshots ("the corpus the
        model trained on") on a table whose untagged history is GC'd
        aggressively. Metadata-only commit (~ms, zero data movement);
        the ref map rides every subsequent snapshot, so tagging is
        atomic with the same CAS as any commit. Refuses to overwrite an
        existing tag unless ``replace`` (Iceberg's replace_tag), and
        refuses to tag a version whose files were already vacuumed."""
        cur = self.snapshot()
        v = cur.version if version is None else version
        if not replace and name in cur.tags:
            raise ValueError(
                f"tag {name!r} already points at v{cur.tags[name]}; "
                "pass replace=True to move it"
            )
        target = self.snapshot(v)  # FileNotFoundError if expired
        missing = [
            f
            for fs in list(target.buckets.values()) + list(target.deltas.values())
            for f in fs
            if not os.path.exists(os.path.join(self.path, f))
        ]
        if missing:
            raise ValueError(
                f"cannot tag version {v}: {len(missing)} of its data files "
                f"were vacuumed (first: {missing[0]})"
            )
        new = self._child_snapshot(cur, cur.batch_id, cur.schema(), None, op="tag")
        new.tags[name] = v
        self._write_snapshot(new)
        return {"tag": name, "tagged_version": v, "version": new.version}

    def drop_tag(self, name: str) -> dict:
        """Remove a tag (metadata-only commit). The formerly tagged
        version becomes an ordinary historical version: reclaimed by the
        next vacuum once it leaves the ``keep_last`` window."""
        cur = self.snapshot()
        if name not in cur.tags:
            raise ValueError(f"no tag {name!r} (have: {sorted(cur.tags)})")
        new = self._child_snapshot(cur, cur.batch_id, cur.schema(), None, op="drop-tag")
        del new.tags[name]
        self._write_snapshot(new)
        return {"dropped": name, "version": new.version}

    # ------------------------------------------------------------ constraints

    def add_constraint(self, name: str, expr: str, validate: bool = True) -> dict:
        """Add a table CHECK constraint (Delta ``ALTER TABLE ADD
        CONSTRAINT`` analog): ``expr`` is a SQL boolean expression over
        LOGICAL column names, enforced against every subsequent ingest
        write's upsert images (``merge``/``merge_mor``/``overwrite`` —
        O(batch) per epoch, never O(table); see
        :class:`ConstraintViolation`). ANSI CHECK semantics: FALSE
        violates, NULL passes.

        ``validate=True`` (the Delta default) scans CURRENT state first
        and refuses if any existing row violates — one filtered read of
        the table, the deliberately-O(table) part, exactly once at add
        time. ``validate=False`` skips the scan (known-clean migration /
        forward-only contract); maintenance rewrites never re-check, so
        pre-existing violations can't wedge compaction — they surface
        only if an ingest re-delivers them. Metadata-only commit."""
        cur = self.snapshot()
        if name in cur.constraints:
            raise ValueError(
                f"constraint {name!r} already exists "
                f"({cur.constraints[name]!r}); drop_constraint first")
        _validate_constraints(self.spark, cur.schema(), {name: expr},
                              "the table schema")
        if validate:
            violates, _ = _constraint_cols({name: expr})
            bad = self.read(ref="head").where(violates).limit(3).collect()
            if bad:
                raise ConstraintViolation(
                    f"cannot add constraint {name!r} ({expr!r}): existing "
                    f"rows violate it (sample: {[r.asDict() for r in bad]}); "
                    "clean the data first or pass validate=False")
        new = self._child_snapshot(cur, cur.batch_id, cur.schema(), None, op="add-constraint")
        new.constraints[name] = expr
        self._write_snapshot(new)
        return {"constraint": name, "expr": expr, "version": new.version,
                "validated": validate}

    def set_schema_evolution(self, mode: str) -> dict:
        """Switch the evolution policy (metadata-only commit):
        ``"locked"`` (Delta ``mergeSchema=false`` analog) makes any
        ingest whose shape would CHANGE the stored schema — a new
        column, a type promotion — refuse loudly instead of silently
        evolving; the column-level data contract next to CHECK
        constraints' row-level one. ``"auto"`` restores the historical
        append/promote behavior. Explicit DDL (``rename_column`` /
        ``drop_column``) stays available either way — locked guards
        against ACCIDENTAL evolution riding a data batch, not against
        operators. Unlock → migrate → re-lock is the planned-evolution
        path."""
        if mode not in ("auto", "locked"):
            raise ValueError(f"mode must be 'auto' or 'locked', got {mode!r}")
        cur = self.snapshot()
        new = self._child_snapshot(cur, cur.batch_id, cur.schema(), None, op="set-evolution")
        new.evolution = mode
        self._write_snapshot(new)
        return {"schema_evolution": mode, "version": new.version}

    def _enforce_evolution_lock(self, snap: Snapshot, cur_schema: T.StructType,
                                target_schema: T.StructType) -> None:
        """Refuse an ingest whose widened schema differs from the stored
        one while evolution is locked. Shape compare is (name, type) —
        nullability is not evolution."""
        if snap.evolution != "locked":
            return
        cur_shape = [(f.name, f.dataType) for f in cur_schema.fields]
        new_shape = [(f.name, f.dataType) for f in target_schema.fields]
        if cur_shape != new_shape:
            added = [n for n, _ in new_shape if n not in dict(cur_shape)]
            changed = [n for n, t in new_shape
                       if n in dict(cur_shape) and dict(cur_shape)[n] != t]
            raise ValueError(
                f"schema evolution is LOCKED on this table: the batch "
                f"would add {added or 'nothing'} / promote {changed or 'nothing'}"
                " — fix the feed, or set_schema_evolution('auto'), "
                "migrate deliberately, and re-lock")

    def drop_constraint(self, name: str) -> dict:
        """Remove a CHECK constraint (metadata-only commit)."""
        cur = self.snapshot()
        if name not in cur.constraints:
            raise ValueError(
                f"no constraint {name!r} (have: {sorted(cur.constraints)})")
        new = self._child_snapshot(cur, cur.batch_id, cur.schema(), None, op="drop-constraint")
        del new.constraints[name]
        self._write_snapshot(new)
        return {"dropped": name, "version": new.version}

    def _enforce_constraints(
        self, changes: DataFrame, snap: Snapshot,
        target_schema: T.StructType, op_col: str | None,
    ) -> None:
        """Pre-write gate for ingest paths: raise
        :class:`ConstraintViolation` if any upsert image in ``changes``
        violates a stored constraint. Runs BEFORE any file lands, so a
        violating epoch leaves the table byte-unchanged. One bounded
        action over the batch (``limit(3)``) — O(batch) scan, collects
        at most 3 forensic rows. Delete rows (``op='D'``) are exempt
        (their payload may be a partial/null before-image; the row is
        leaving the table). Partial row images (``__setmask``) refuse:
        an unset column is NULL in the batch but inherits the stored
        value at apply time, so a multi-column constraint evaluated
        against the batch alone could silently pass a violating
        completed row — complete images are the evaluable unit."""
        if not snap.constraints:
            return
        if "__setmask" in changes.columns:
            raise ValueError(
                "CHECK constraints require complete row images: this "
                "change set carries partial-row-image masks (__setmask); "
                "run the engine with row_image='full' or drop the "
                "constraints")
        chk, violates, names = constraint_split_cols(
            changes, snap.constraints, target_schema)
        if op_col is not None and op_col in chk.columns:
            violates = (F.col(op_col) != F.lit("D")) & violates
        bad = (
            chk.where(violates)
            .select(names.alias("__violated"), *[f.name for f in target_schema.fields
                                                 if not f.name.startswith("__")])
            .limit(3)
            .collect()
        )
        if bad:
            raise ConstraintViolation(
                f"{len(bad)}+ rows violate table constraints "
                f"{sorted(snap.constraints)} (sample: "
                f"{[r.asDict() for r in bad]}); nothing was written — fix "
                "the feed, drop the constraint, or run the engine with "
                "constraint_mode='dead_letter'")

    def resolve_tag(self, name: str) -> int:
        tags = self.snapshot().tags
        if name not in tags:
            raise ValueError(f"no tag {name!r} (have: {sorted(tags)})")
        return tags[name]

    # -------------------------------------------- write-audit-publish

    def begin_staging(self) -> dict:
        """Enter WRITE-AUDIT-PUBLISH mode (the Iceberg WAP pattern over
        this table's linear chain): pins the movable ``"main"`` ref at
        the current version. From here, every write advances the chain
        HEAD past the ref — but default :meth:`read` keeps resolving the
        ref, so consumers only ever see the last AUDITED state.
        Auditors inspect the staged segment with ``read(ref="head")``
        (or :meth:`changes` from the published version), then either
        :meth:`publish` (fast-forward the ref to head) or
        :meth:`abort_staging` (roll the head back onto the ref). A
        metadata-only commit; staged writes cost exactly what published
        writes cost. The published version's files are vacuum-pinned
        like a tag's, so aggressive retention cannot reclaim the state
        readers are being served."""
        cur = self.snapshot()
        if "main" in cur.refs:
            raise ValueError(
                f"staging already active (published = v{cur.refs['main']})"
            )
        new = self._child_snapshot(cur, cur.batch_id, cur.schema(), None, op="begin-staging")
        new.refs["main"] = cur.version
        self._write_snapshot(new)
        return {"published": cur.version, "version": new.version}

    def publish(self, keep_staging: bool = False) -> dict:
        """Audit passed: fast-forward the published ref to the chain
        head (metadata-only, atomic — consumers flip from the old
        audited state to the new one in one pointer move, never seeing
        a half-audited intermediate). ``keep_staging=True`` leaves the
        ref pinned AT the new head — the continuous-ingest mode where
        every epoch is audited then published and readers always lag
        the head by at most one in-flight epoch."""
        cur = self.snapshot()
        if "main" not in cur.refs:
            raise ValueError("no staging session active (begin_staging first)")
        prev = cur.refs["main"]
        new = self._child_snapshot(cur, cur.batch_id, cur.schema(), None, op="publish")
        if keep_staging:
            new.refs["main"] = new.version
        else:
            del new.refs["main"]
        self._write_snapshot(new)
        return {"published_from": prev, "version": new.version,
                "staging": keep_staging}

    def abort_staging(self) -> dict:
        """Audit failed: atomically revert the chain head to the
        published version (reusing :meth:`rollback`, so data, schema,
        lineage watermarks, and batch fences ALL revert — the rejected
        epochs' offsets are re-admitted by the exactly-once anti-filter
        and can be re-delivered after the upstream fix), then clear the
        ref. Consumers never observed the rejected epochs at any point."""
        cur = self.snapshot()
        if "main" not in cur.refs:
            raise ValueError("no staging session active (begin_staging first)")
        pub = cur.refs["main"]
        self.rollback(pub)
        cur2 = self.snapshot()
        new = self._child_snapshot(cur2, cur2.batch_id, cur2.schema(), None, op="abort-staging")
        new.refs.pop("main", None)
        self._write_snapshot(new)
        return {"aborted_to": pub, "version": new.version}

    # ------------------------------------------------- schema evolution DDL

    def rename_column(self, old: str, new: str) -> dict:
        """Rename a column — METADATA-ONLY, O(1) at any table size (the
        Iceberg field-id rename analog): the logical name re-points at
        the same PHYSICAL in-file column (``Snapshot.phys_map``), so no
        data file is touched, footer stats and bloom filters keep
        working (they are keyed physical), time travel shows each
        version under ITS OWN names, and an in-flight change feed —
        whose schema locked at query start — keeps streaming seamlessly
        because the bytes in every delta file are name-stable. Key and
        bucket columns rename freely (bucket ids hash VALUES, not
        names). A later additive merge that re-introduces the OLD name
        allocates a fresh physical column, so it can never read back
        this column's historical values (``_alloc_phys``)."""
        cur = self.snapshot()
        schema = cur.schema()
        names = {f.name for f in schema.fields}
        if old.startswith("__") or new.startswith("__"):
            raise ValueError("internal __ columns cannot be renamed")
        if old not in names:
            raise ValueError(f"no column {old!r} (have: {sorted(n for n in names if not n.startswith('__'))})")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        if new == old or not new:
            raise ValueError(f"invalid rename target {new!r}")
        new_schema = T.StructType([
            T.StructField(new, f.dataType, f.nullable) if f.name == old else f
            for f in schema.fields
        ])
        if cur.constraints:
            # a stored CHECK expression referencing the old name would
            # stop analyzing — refuse now with an actionable message
            # instead of failing the next ingest (expressions are opaque
            # SQL strings; we don't rewrite them)
            _validate_constraints(
                self.spark, new_schema, cur.constraints,
                f"the schema after renaming {old!r} -> {new!r} "
                "(drop_constraint first, re-add under the new name)")
        snap = self._child_snapshot(cur, cur.batch_id, new_schema, None, op="rename-column")
        phys = dict(cur.phys_map)
        phys[new] = phys.pop(old, old)
        if phys[new] == new:  # renaming BACK to the physical name
            del phys[new]
        snap.phys_map = phys
        snap.key_cols = [new if c == old else c for c in cur.key_cols]
        if cur.bucket_cols is not None:
            snap.bucket_cols = [new if c == old else c for c in cur.bucket_cols]
        snap.bloom_cols = [new if c == old else c for c in cur.bloom_cols]
        self._write_snapshot(snap)
        return {"renamed": {old: new}, "version": snap.version,
                "physical": snap.phys(new)}

    def drop_column(self, name: str) -> dict:
        """Drop a column — METADATA-ONLY, O(1) at any table size (the
        Iceberg drop-column analog): the logical field leaves the
        schema and its physical name joins the retirement blacklist, so
        (a) no read ever projects it again, (b) a future column re-added
        under the same name maps to a FRESH physical column and cannot
        resurrect the dropped values, and (c) the bytes remain in
        retained files — readable via time travel to pre-drop versions —
        until ``compact()`` rewrites (compaction projects the CURRENT
        logical schema, purging dropped physicals) and ``vacuum()``
        reclaims: GDPR-complete column erasure is drop + compact +
        vacuum, the same honesty contract as ``delete_where(mode='mor')``.
        Key/bucket columns refuse (dropping one would re-route every
        row); internal columns refuse."""
        cur = self.snapshot()
        schema = cur.schema()
        if name.startswith("__"):
            raise ValueError("internal __ columns cannot be dropped")
        if name not in {f.name for f in schema.fields}:
            raise ValueError(f"no column {name!r}")
        if name in cur.key_cols or name in (cur.bucket_cols or []):
            raise ValueError(
                f"column {name!r} is a key/bucket column — dropping it "
                "would re-route every row; recreate the table instead")
        new_schema = T.StructType([f for f in schema.fields if f.name != name])
        if cur.constraints:
            _validate_constraints(
                self.spark, new_schema, cur.constraints,
                f"the schema after dropping {name!r} "
                "(drop_constraint first)")
        snap = self._child_snapshot(cur, cur.batch_id, new_schema, None, op="drop-column")
        phys = dict(cur.phys_map)
        released = phys.pop(name, name)
        snap.phys_map = phys
        snap.retired_phys = sorted(set(cur.retired_phys) | {released})
        snap.bloom_cols = [c for c in cur.bloom_cols if c != name]
        self._write_snapshot(snap)
        return {"dropped": name, "version": snap.version,
                "retired_physical": released}

    def is_staging(self) -> bool:
        return "main" in self.snapshot().refs

    def published_version(self) -> int:
        """The version default reads resolve: the ``main`` ref while
        staging, else the chain head."""
        snap = self.snapshot()
        return snap.refs.get("main", snap.version)

    def staged_changes(self, buckets: list[int] | None = None) -> DataFrame:
        """What the staged segment would publish: the net per-key diff
        from the published version to the chain head (:meth:`changes`
        with the WAP refs filled in) — the DataFrame an audit inspects
        when scanning the whole head is too much ("did this epoch touch
        keys it shouldn't?", "are all new rows schema-valid?"). Cost is
        O(touched buckets) when the staged epochs' touched sets are
        passed as ``buckets``."""
        cur = self.snapshot()
        if "main" not in cur.refs:
            raise ValueError("no staging session active (begin_staging first)")
        return self.changes(cur.refs["main"], cur.version, buckets=buckets)

    def rebucket(self, n_buckets: int, batch_id: int | None = None) -> dict[str, int]:
        """Change the table's bucket count (Iceberg partition-spec
        evolution analog — the classic ops need when a table created at
        2^8 buckets grows to 100 TB and every bucket is now tens of GB):
        ONE full rewrite into the new layout, committed as one atomic
        snapshot — readers are never blocked, time travel still reads old
        versions under their own bucket maps, and every subsequent MERGE
        routes by the NEW count because all write paths take
        ``n_buckets`` from the current snapshot, never from config.
        Pending MOR deltas are folded in by the rewrite (it reads through
        ``read(include_internal=True)``). Write parallelism = new bucket
        count; vacuum reclaims the old files. At scale this is the one
        deliberately O(table) operation here — schedule it like a
        compaction of everything, which is what it is."""
        snap = self.snapshot()
        if n_buckets == snap.n_buckets:
            return {"rebucketed": 0, "n_buckets": n_buckets}
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        df = self.read(include_internal=True, ref="head").withColumn(
            "__bucket", bucket_expr(snap.bucket_key(), n_buckets)
        )
        new_version = snap.version + 1
        new_buckets = self._write_bucket_files(df, new_version, n_buckets, snap.phys_map)
        new_snap = self._child_snapshot(
            snap, snap.batch_id if batch_id is None else batch_id, snap.schema(), None,
            op="rebucket",
        )
        new_snap.n_buckets = n_buckets
        new_snap.buckets = new_buckets
        new_snap.deltas = {}
        self._carry_stats(new_snap, snap, self._file_stats(new_buckets),
                          self._file_blooms(new_buckets, new_snap))
        self._write_snapshot(new_snap)
        return {
            "rebucketed": 1,
            "n_buckets": n_buckets,
            "version": new_snap.version,
            "files": sum(len(f) for f in new_buckets.values()),
        }

    def cluster(
        self,
        zorder: list[str] | tuple[str, ...],
        target_files_per_bucket: int = 4,
        buckets: list[int] | None = None,
        batch_id: int | None = None,
    ) -> dict[str, int]:
        """Z-order the table's data layout (Delta ``OPTIMIZE ZORDER BY``
        analog): rewrite buckets so each bucket's files cover
        near-disjoint ranges of the interleaved-bit z-value of
        ``zorder`` columns — which is what makes the per-file min/max
        stats TIGHT on every z column at once, so ``read(ranges=...)``
        skips files *within* buckets, not just across commits. The
        canonical use here is ``zorder=["__ordinal"]``: after clustering,
        an incremental scan (ordinal > watermark) touches only the files
        whose rows actually arrived after the watermark, even inside
        buckets that were rewritten many times.

        Mechanics (all JVM-side expressions, no Python on the data
        path): each z column is normalized to a 16-bit code by linear
        scaling over its [p01, p99] quantile range (quantile clipping so
        outliers saturate the end codes instead of flattening the body —
        the all-expression trade vs Delta's range-partition-id
        interleave), codes are bit-interleaved into one long, and rows
        are ``repartitionByRange(__bucket, __z)`` +
        ``sortWithinPartitions`` so every output task writes a
        contiguous z-slice of one-or-two buckets. MOR deltas of the
        rewritten buckets are folded in (reads via
        ``read(include_internal=True)``), same as compact.

        ``buckets``: restrict the rewrite to a subset — at 100 TB you
        cluster incrementally (the buckets compaction just touched), not
        the world; clustering everything is rebucket-shaped O(table) and
        should be scheduled like one. Readers are never blocked; time
        travel still reads the pre-cluster layout. State identity
        (content unchanged) — enforced by the ops-algebra property test.
        """
        snap = self.snapshot()
        if not zorder:
            raise ValueError("zorder needs at least one column")
        schema = snap.schema()
        numeric = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                   T.FloatType, T.DoubleType, T.DecimalType, T.TimestampType, T.DateType)
        for c in zorder:
            # strictly the STORED schema: engine-written tables carry
            # __ordinal/__offset there, but a plain table that never
            # stored ordinals must fail loudly here, not as an
            # unresolved column three plans deep
            dt = next((f.dataType for f in schema.fields if f.name == c), None)
            if dt is None:
                raise ValueError(f"zorder column {c!r} not in table schema")
            if not isinstance(dt, numeric):
                raise ValueError(
                    f"zorder column {c!r} is {dt.simpleString()}; z-ordering "
                    "needs a numeric/temporal column (string layouts: use "
                    "bloom_cols point skipping instead)")
        target = sorted({int(b) for b in snap.buckets} if buckets is None
                        else set(buckets))
        target = [b for b in target
                  if snap.buckets.get(str(b)) or snap.deltas.get(str(b))]
        if not target:
            return {"clustered_buckets": 0}
        df = self.read(buckets=target, include_internal=True, ref="head").withColumn(
            "__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets)
        )
        # quantile fences: one bounded driver-side pass for all z columns
        zc = [F.col(c).cast("double").alias(c) for c in zorder]
        fences = df.select(*zc).stat.approxQuantile(list(zorder), [0.01, 0.99], 0.001)
        n = len(zorder)
        bits = min(16, 60 // n)  # interleaved z stays inside a positive long
        zval = F.lit(0).cast("long")
        for j, c in enumerate(zorder):
            lo, hi = fences[j]
            if lo is None or hi is None or hi <= lo:
                code = F.lit(0).cast("long")  # constant/empty column: no order info
            else:
                scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
                code = F.least(
                    F.lit((1 << bits) - 1), F.greatest(F.lit(0), F.floor(scaled * (1 << bits)))
                ).cast("long")
            code = F.coalesce(code, F.lit(0).cast("long"))  # nulls cluster at 0
            for bit in range(bits):
                zval = zval.bitwiseOR(
                    F.shiftleft(F.shiftright(code, bit).bitwiseAND(F.lit(1)),
                                bit * n + j)
                )
        n_out = max(1, len(target) * target_files_per_bucket)
        out = (
            df.withColumn("__z", zval)
            .repartitionByRange(n_out, F.col("__bucket"), F.col("__z"))
            .sortWithinPartitions("__bucket", "__z")
            .drop("__z")
        )
        new_version = snap.version + 1
        written = self._write_bucket_files(out, new_version, None, snap.phys_map)
        applied, skipped, version = self._commit_rewrite(snap, target, written, batch_id,
                                                         op="cluster")
        return {
            "clustered_buckets": len(applied),
            "files": sum(len(written.get(str(b), [])) for b in applied),
            "version": version,
            "skipped_buckets": len(skipped),
        }

    def delete_where(
        self,
        condition,
        ranges: dict[str, tuple] | None = None,
        points: dict[str, Any] | None = None,
        buckets: list[int] | None = None,
        batch_id: int | None = None,
        mode: str = "cow",
    ) -> dict[str, Any]:
        """Transactional predicate delete (Iceberg ``DELETE FROM ...
        WHERE`` / GDPR-erasure analog): rewrite ONLY the files that may
        contain matching rows, dropping them; everything else is carried
        by reference in one atomic commit.

        ``mode="mor"`` writes DELETE TOMBSTONES as delta files instead
        of rewriting bases (the Iceberg v2 delete-file analog): the
        matching rows are resolved once (same pruning hints), and each
        emits a key-only 'D' delta whose LWW sort key is strictly above
        the stored winner's, so the existing merge-on-read fold drops
        the key on every subsequent read. Write cost is O(matching
        rows), zero base rewrite — at 100 TB, erasing 0.001% of rows
        writes kilobytes instead of rewriting the candidate files. The
        trade is LOGICAL erasure: the matched content stays in the base
        files (readable only via time travel to pre-delete versions)
        until ``compact()`` folds the tombstones and ``vacuum()``
        reclaims the old files — GDPR-complete physical purge is
        ``delete_where(mode='mor')`` + ``compact()`` + ``vacuum()``,
        exactly Iceberg's delete-files → rewrite_data_files →
        expire_snapshots pipeline. Tombstoned buckets also lose
        stats/bloom file skipping until compacted (the MOR pruning
        exemption in :meth:`read`). Later upserts with a higher ordinal
        re-insert the key, same as the COW path. Requires the stored
        ``__ordinal``/``__offset`` sort-key columns (engine-written
        tables carry them); plain tables must use ``mode="cow"``.

        ``condition`` is a Column or SQL string; rows where it is TRUE
        are deleted (NULL keeps the row — SQL WHERE semantics).
        ``ranges`` / ``points`` are PRUNING HINTS with the same contract
        as :meth:`read`: they must be IMPLIED by ``condition`` (a file
        they exclude must contain no matching row) — the hint bounds the
        rewrite set via the per-file min/max stats and bloom filters, it
        never changes the result. ``buckets`` restricts scope the same
        way (caller guarantees matches only live there, e.g. a key-
        prefix delete). At 100 TB this is the difference between
        rewriting one repo's bucket and scanning the table: a delete
        with a good hint is O(matching files), and the returned
        ``files_scanned`` / ``files_carried`` counts say exactly what
        the hints bought.

        MOR buckets: a bucket carrying deltas is FOLDED (resolved
        through the LWW read) and rewritten whole — deleting from the
        base under unresolved deltas could resurrect a shadowed row —
        so a delete doubles as localized compaction, like the COW merge.

        Concurrency: a delete is an INGEST-class writer — its output
        depends on the state it read, and it does not commute with
        concurrent upserts (upsert-then-delete kills the row;
        delete-then-upsert keeps it). It therefore takes the loud
        :class:`CommitConflict` path like ``merge``, never the
        maintenance rebase (``_commit_rewrite``) — retry by re-running
        against the new head. Reference contrast: rook evicts by key
        only (``DefaultRowsMutationIndexer.java`` delete path);
        predicate erasure is the lake-side requirement the reference
        never had.
        """
        from pyspark.sql import Observation

        if mode not in ("cow", "mor"):
            raise ValueError(f"delete_where mode must be 'cow' or 'mor', got {mode!r}")
        snap = self.snapshot()
        cond = F.expr(condition) if isinstance(condition, str) else condition
        # stats/bloom keys are physical; hints arrive logical (same
        # translation read() applies)
        if ranges:
            ranges = {snap.phys(c): v for c, v in ranges.items()}
        if points:
            points = {snap.phys(c): v for c, v in points.items()}
        keys = {str(b) for b in buckets} if buckets is not None else None
        in_scope = lambda b: keys is None or b in keys  # noqa: E731

        fold_buckets = sorted(
            int(b) for b, d in snap.deltas.items() if d and in_scope(b)
        )
        rewrite: dict[str, list[str]] = {}   # clean buckets: files to rewrite
        carried: dict[str, list[str]] = {}   # clean buckets: files kept as-is
        files_scanned = files_carried = 0
        for b, fs in snap.buckets.items():
            if not in_scope(b) or int(b) in fold_buckets:
                continue
            cands = fs
            if ranges:
                cands = [f for f in cands if _stats_may_match(snap.stats.get(f), ranges)]
            if points:
                cands = [
                    f for f in cands
                    if all(
                        _bloom_may_contain(snap.blooms.get(f, {}).get(c), v)
                        for c, v in points.items()
                    )
                ]
            files_carried += len(fs) - len(cands)
            if cands:
                rewrite[b] = cands
                if len(cands) < len(fs):
                    kept = set(cands)
                    carried[b] = [f for f in fs if f not in kept]
        files_scanned = sum(len(fs) for fs in rewrite.values())

        if not rewrite and not fold_buckets:
            return {"skipped": True, "deleted_rows": 0, "files_scanned": 0,
                    "files_carried": files_carried, "version": snap.version,
                    "mode": mode}
        if mode == "mor":
            return self._delete_where_mor(
                snap, cond, rewrite, fold_buckets,
                files_scanned, files_carried, batch_id)

        schema = snap.schema()
        parts = []
        if rewrite:
            paths = [os.path.join(self.path, f) for fs in rewrite.values() for f in fs]
            parts.append(_read_files_logical(self.spark, snap, paths))
        if fold_buckets:
            parts.append(
                self.read(buckets=fold_buckets, include_internal=True, ref="head")
            )
        df_raw = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        obs = Observation()
        df = df_raw.observe(
            obs, F.sum(F.coalesce(cond, F.lit(False)).cast("long")).alias("n_del")
        )
        kept = df.where(~F.coalesce(cond, F.lit(False))).withColumn(
            "__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets)
        )
        new_version = snap.version + 1
        width = max(1, len(rewrite) + len(fold_buckets))
        written = self._write_bucket_files(
            kept, new_version, min(snap.n_buckets, width), snap.phys_map)
        # bounded wait: the observation is delivered by the listener of
        # the already-completed write job; a miss (e.g. the PySpark
        # empty-partitionBy-result defect apply.py documents) degrades
        # to one recompute over the pruned candidate set, never a hang
        import threading

        res: dict = {}

        def _watch():
            try:
                res.update(obs.get)
            except Exception:
                pass

        th = threading.Thread(target=_watch, daemon=True)
        th.start()
        th.join(timeout=30)
        if res:
            deleted = int(res.get("n_del") or 0)
        else:
            deleted = int(df_raw.where(F.coalesce(cond, F.lit(False))).count())

        new_snap = self._child_snapshot(snap, batch_id if batch_id is not None
                                        else snap.batch_id, schema, None,
                                        op="delete")
        for b in list(rewrite) + [str(x) for x in fold_buckets]:
            fs = carried.get(b, []) + written.get(b, [])
            if fs:
                new_snap.buckets[b] = fs
            else:
                new_snap.buckets.pop(b, None)
        for b in fold_buckets:
            new_snap.deltas.pop(str(b), None)
        self._carry_stats(new_snap, snap, self._file_stats(written),
                          self._file_blooms(written, new_snap))
        self._write_snapshot(new_snap)
        return {"skipped": False, "deleted_rows": deleted,
                "files_scanned": files_scanned, "files_carried": files_carried,
                "buckets_rewritten": len(rewrite) + len(fold_buckets),
                "version": new_snap.version, "mode": "cow"}

    def _delete_where_mor(
        self,
        snap: "Snapshot",
        cond,
        rewrite: dict[str, list[str]],
        fold_buckets: list[int],
        files_scanned: int,
        files_carried: int,
        batch_id: int | None,
    ) -> dict[str, Any]:
        """The tombstone half of :meth:`delete_where` (``mode="mor"``).

        Each matching row (resolved through the same pruning + MOR fold
        as the COW path) emits ONE key-only 'D' delta row at LWW sort
        key ``(winner.__ordinal, winner.__offset + 1)`` — strictly above
        the row it shadows, so the read-time fold drops the key, and
        strictly below any later real event (epochs never split a tx,
        so every not-yet-applied event carries a higher ordinal than
        any applied winner) — post-delete upserts resurrect the key
        exactly like the COW path. Non-key payload columns are NULLed
        in the tombstone: the delta itself carries none of the erased
        content.

        Rows whose stored sort keys are NULL (a direct merge that never
        populated them) tombstone at ``(-1, -1+1)`` — resurrection then
        needs the later event to carry a real ordinal or a higher
        offset, which the engine always does; hand-rolled NULL-ordinal
        writers should prefer ``mode="cow"``."""
        from pyspark.sql import Observation

        schema = snap.schema()
        names = {f.name for f in schema.fields}
        if "__ordinal" not in names or "__offset" not in names:
            # strictly the STORED schema, same contract as cluster():
            # a table that never stored LWW sort keys cannot express a
            # tombstone that wins the fold — fail here, not as a wrong
            # winner three reads later
            raise ValueError(
                "delete_where(mode='mor') needs the stored __ordinal/"
                "__offset LWW sort-key columns (engine-written tables "
                "carry them); plain tables must use mode='cow'")
        key_cols = snap.key_cols
        parts = []
        if rewrite:
            paths = [os.path.join(self.path, f)
                     for fs in rewrite.values() for f in fs]
            parts.append(_read_files_logical(self.spark, snap, paths))
        if fold_buckets:
            parts.append(
                self.read(buckets=fold_buckets, include_internal=True,
                          ref="head")
            )
        df_raw = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        matches = df_raw.where(F.coalesce(cond, F.lit(False)))

        def _field(f):
            if f.name in key_cols:
                return F.col(f.name)
            if f.name == "__ordinal":
                return (F.coalesce(F.col("__ordinal"), F.lit(-1))
                        .cast(f.dataType).alias("__ordinal"))
            if f.name == "__offset":
                return ((F.coalesce(F.col("__offset"), F.lit(-1)) + F.lit(1))
                        .cast(f.dataType).alias("__offset"))
            return F.lit(None).cast(f.dataType).alias(f.name)

        tomb = matches.select(
            *[_field(f) for f in schema.fields], F.lit("D").alias("__op")
        ).withColumn("__bucket", bucket_expr(snap.bucket_key(), snap.n_buckets))
        obs = Observation()
        tomb = tomb.observe(obs, F.count(F.lit(1)).alias("n_del"))

        width = min(snap.n_buckets,
                    max(1, self.spark.sparkContext.defaultParallelism))
        delta_files = self._write_bucket_files(
            tomb, snap.version + 1, width, snap.phys_map)
        if not delta_files:
            # no matching rows: nothing to commit (the empty write dir
            # is unreferenced and waits for vacuum, like any orphan)
            return {"skipped": True, "deleted_rows": 0,
                    "files_scanned": files_scanned,
                    "files_carried": files_carried,
                    "version": snap.version, "mode": "mor"}

        # bounded wait on the Observation delivered by the write job's
        # listener; a miss degrades to one recompute, never a hang
        # (same pattern + rationale as the COW path)
        import threading

        res: dict = {}

        def _watch():
            try:
                res.update(obs.get)
            except Exception:
                pass

        th = threading.Thread(target=_watch, daemon=True)
        th.start()
        th.join(timeout=30)
        if res:
            deleted = int(res.get("n_del") or 0)
        else:
            deleted = int(matches.count())

        new_snap = self._child_snapshot(
            snap, batch_id if batch_id is not None else snap.batch_id,
            schema, None, op="delete")
        for b, fs in delta_files.items():
            new_snap.deltas.setdefault(b, []).extend(fs)
        self._write_snapshot(new_snap)
        return {"skipped": False, "deleted_rows": deleted,
                "files_scanned": files_scanned,
                "files_carried": files_carried,
                "tombstone_buckets": len(delta_files),
                "version": new_snap.version, "mode": "mor"}

    def _commit_rewrite(
        self,
        parent: Snapshot,
        rewritten: list[int],
        written: dict[str, list[str]],
        batch_id: int | None,
        max_retries: int = 5,
        op: str = "rewrite",
    ) -> tuple[list[int], list[int], int]:
        """Publish a maintenance rewrite (compact / cluster) built at
        ``parent``, REBASING across concurrent ingest commits instead of
        failing — the Iceberg ``RewriteDataFiles`` commit-retry analog,
        and what lets a compaction/z-order service run beside a live
        CDC writer without ever stopping the stream.

        Why the rebase is sound: the rewrite folded each bucket's base
        files plus the delta list *as of parent* into new base files.
        Delta resolution is an order-insensitive LWW max_by on
        (ordinal, offset), so for a bucket whose base is unchanged and
        whose live delta list still has parent's list as a PREFIX
        (merge_mor only ever appends), fold-prefix-then-apply-suffix is
        state-identical to applying every delta — the new base simply
        carries the suffix forward. Buckets that fail that check (a COW
        merge or another maintenance op replaced their base, a rollback
        rewrote their delta list) are SKIPPED — the live state wins and
        our orphaned rewrite files wait for vacuum — mirroring Iceberg's
        per-file-group conflict handling. Structural divergence
        (rebucket changed the layout, key columns changed) cannot be
        rebased and re-raises :class:`CommitConflict`.

        Ingest commits themselves never rebase: a MERGE's content
        depends on the state it read, so its conflicts stay loud
        (``_write_snapshot``). Maintenance is the one writer class whose
        output is provably position-independent.

        Returns (applied_buckets, skipped_buckets, committed_version).
        """
        base = parent
        for attempt in range(max_retries + 1):
            applied: list[int] = []
            skipped: list[int] = []
            new_snap = self._child_snapshot(
                base, base.batch_id if batch_id is None else batch_id,
                base.schema(), None, op=op,
            )
            for b in rewritten:
                key = str(b)
                if base is parent:
                    suffix: list[str] = []
                else:
                    if (base.n_buckets != parent.n_buckets
                            or base.key_cols != parent.key_cols):
                        raise CommitConflict(
                            parent.version,
                            f"v{base.version} changed the table layout "
                            "(rebucket/key change) during the rewrite",
                        )
                    if base.buckets.get(key) != parent.buckets.get(key):
                        skipped.append(b)
                        continue
                    pd = parent.deltas.get(key) or []
                    ld = base.deltas.get(key) or []
                    if ld[: len(pd)] != pd:
                        skipped.append(b)
                        continue
                    suffix = ld[len(pd):]
                fs = written.get(key, [])
                if fs:
                    new_snap.buckets[key] = fs
                else:
                    new_snap.buckets.pop(key, None)  # resolved to empty
                if suffix:
                    new_snap.deltas[key] = suffix
                else:
                    new_snap.deltas.pop(key, None)
                applied.append(b)
            if not applied and base is not parent:
                # everything was superseded — nothing to publish
                return [], skipped, base.version
            self._carry_stats(new_snap, base, self._file_stats(written),
                              self._file_blooms(written, new_snap))
            try:
                self._write_snapshot(new_snap)
                return applied, skipped, new_snap.version
            except CommitConflict:
                if attempt == max_retries:
                    raise
                base = self.snapshot()
        raise AssertionError("unreachable")

    def _write_bucket_files(
        self, df: DataFrame, new_version: int, repartition_n: int | None,
        phys_map: dict[str, str],
    ) -> dict[str, list[str]]:
        """Shared write-then-list step for every bucket-file producer
        (COW merge, MOR delta append, overwrite, compact, rebucket):
        write ``df`` (carrying ``__bucket``) partitioned by bucket under
        the new version's data dir and return the bucket → relative-file
        map of what landed (non-empty buckets only). ``repartition_n``
        is the shuffle/task width; callers size it O(buckets actually
        being written) — epoch writes pass the touched-bucket count, not
        the table's bucket count, so a 3-bucket epoch on a 2^16-bucket
        table schedules 3 tasks, not 65536. ``partitionBy`` splits each
        task's rows per bucket value, so the ~1-file-per-bucket layout
        is independent of the width (several buckets hashing into one
        shuffle partition still land in separate files)."""
        # Writer-unique directory (Iceberg's UUID file-name discipline):
        # two CONCURRENT writers both building version N+1 must never
        # write into the same path — with a shared dir, the loser of the
        # CAS race would have its files clobbered by the winner's
        # mode("overwrite") before a rebase could publish them. The
        # version prefix stays for debuggability; the suffix makes the
        # path writer-private. Vacuum globs data/**/*.parquet, so
        # suffixed dirs GC like any other.
        import uuid as _uuid

        out_dir_rel = os.path.join(
            _DATA, f"v{new_version:010d}-{_uuid.uuid4().hex[:8]}")
        out_dir = os.path.join(self.path, out_dir_rel)
        # files always carry PHYSICAL names (Snapshot.phys_map): rename
        # the logical frame just before the write so every producer —
        # merge, MOR append, compact, rebucket, cluster, delete — lands
        # the same in-file layout. Callers pass the map that will govern
        # the snapshot REFERENCING these files. Identity map = no-op.
        out = df if repartition_n is None else df.repartition(repartition_n, "__bucket")
        if phys_map:
            out = out.toDF(*[phys_map.get(c, c) for c in out.columns])
        out.write.partitionBy("__bucket").mode("overwrite").parquet(out_dir)
        files: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if not entry.startswith("__bucket="):
                continue
            fs = sorted(
                os.path.join(out_dir_rel, entry, fn)
                for fn in os.listdir(os.path.join(out_dir, entry))
                if fn.endswith(".parquet")
            )
            if fs:
                files[entry.split("=", 1)[1]] = fs
        return files

    def _file_stats(self, files: dict[str, list[str]]) -> dict[str, dict[str, list]]:
        """Harvest per-file [min, max] for NUMERIC and STRING columns
        from the parquet footers of freshly written base files (the
        Iceberg writer collects the same stats into manifests at commit
        time). Driver-local footer reads, O(files written this commit) —
        the same order of work as the existing write-then-list step.

        String bounds are truncated snapshot-side to ``_STR_STAT_LEN``
        code points (Iceberg ``truncate(16)``): the lower bound is a
        plain prefix (a prefix of a lower bound is still ≤ every value),
        the upper bound is the incremented prefix (``_truncate_upper``) —
        a multi-KB ``content`` column must not turn the snapshot JSON
        into a copy of the data. An unincrementable upper stores None
        (prunes on the lower side only). Binary columns are skipped
        (bytes don't serialize to the JSON snapshot and have no single
        honest text ordering)."""
        import pyarrow.parquet as pq

        out: dict[str, dict[str, list]] = {}
        for fs in files.values():
            for rel in fs:
                try:
                    md = pq.ParquetFile(os.path.join(self.path, rel)).metadata
                except Exception:  # unreadable footer -> no stats, no pruning
                    continue
                # footer row count (free with the same read): the
                # O(metadata) counting axis — see row_count()
                col_mm: dict[str, list] = {"__rows": [md.num_rows, md.num_rows]}
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            continue
                        mn, mx = st.min, st.max
                        if isinstance(mn, str) and isinstance(mx, str):
                            mn = mn[:_STR_STAT_LEN]
                            mx = _truncate_upper(mx)
                        elif not isinstance(mn, (int, float)) or isinstance(mn, bool):
                            continue
                        name = col.path_in_schema
                        cur = col_mm.get(name)
                        if cur is None:
                            col_mm[name] = [mn, mx]
                        else:
                            col_mm[name] = [
                                min(cur[0], mn),
                                None if cur[1] is None or mx is None
                                else max(cur[1], mx),
                            ]
                out[rel] = col_mm
        return out

    def _file_blooms(self, files: dict[str, list[str]], snap: Snapshot) -> dict[str, dict[str, str]]:
        """Harvest per-file bloom filters for the table's ``bloom_cols``
        from freshly written base files (Iceberg writers collect the
        same into puffin blobs at commit time). One driver-local
        column-projected read per new file — O(rows written this
        commit), bounded by the same epoch that just wrote them; any
        read failure simply yields no filter, which never prunes."""
        if not snap.bloom_cols:
            return {}
        import pyarrow.parquet as pq

        present = {f.name for f in snap.schema().fields}
        # bloom_cols are logical; files and the stored bloom keys are
        # PHYSICAL (read(points=) translates before consulting)
        cols = [snap.phys(c) for c in snap.bloom_cols if c in present]
        if not cols:
            return {}
        out: dict[str, dict[str, str]] = {}
        for fs in files.values():
            for rel in fs:
                try:
                    tbl = pq.read_table(os.path.join(self.path, rel), columns=cols)
                except Exception:  # unreadable -> no filter, no pruning
                    continue
                entry = {
                    c: _bloom_build(tbl.column(c).unique().to_pylist()) for c in cols
                }
                if entry:
                    out[rel] = entry
        return out

    def _carry_stats(
        self, new_snap: Snapshot, prev: Snapshot,
        fresh: dict[str, dict[str, list]],
        fresh_blooms: dict[str, dict[str, str]] | None = None,
    ) -> None:
        """Snapshot stats bookkeeping: carry the previous snapshot's
        entries for files still referenced, add the fresh files', drop
        everything else (stats and blooms always describe exactly the
        base files of THIS snapshot)."""
        live = {f for fs in new_snap.buckets.values() for f in fs}
        merged = {**prev.stats, **fresh}
        new_snap.stats = {f: merged[f] for f in live if f in merged}
        merged_b = {**prev.blooms, **(fresh_blooms or {})}
        new_snap.blooms = {f: merged_b[f] for f in live if f in merged_b}

    def _child_snapshot(
        self,
        parent: Snapshot,
        batch_id: int,
        schema: T.StructType,
        lineage_update: dict[int, dict[str, int]] | None,
        run_id: str | None = None,
        op: str = "",
    ) -> Snapshot:
        lineage = {k: dict(v) for k, v in parent.lineage.items()}
        for p, m in (lineage_update or {}).items():
            prev = lineage.get(str(p), {"last_applied_offset": -1, "rows_applied": 0, "bytes": 0})
            lineage[str(p)] = {
                "last_applied_offset": max(
                    int(m.get("last_applied_offset", -1)), int(prev["last_applied_offset"])
                ),
                "rows_applied": int(prev["rows_applied"]) + int(m.get("rows_applied", 0)),
                "bytes": int(prev["bytes"]) + int(m.get("bytes", 0)),
            }
        return Snapshot(
            version=parent.version + 1,
            batch_id=batch_id,
            schema_json=json.dumps(schema.jsonValue()),
            key_cols=parent.key_cols,
            n_buckets=parent.n_buckets,
            buckets=dict(parent.buckets),
            lineage=lineage,
            committed_at=time.time(),
            parent=parent.version,
            deltas={b: list(fs) for b, fs in parent.deltas.items()},
            # maintenance commits (compact/vacuum/overwrite) pass None and
            # inherit the committing run's identity unchanged
            run_id=parent.run_id if run_id is None else run_id,
            bucket_cols=parent.bucket_cols,
            # base files unchanged unless the caller rewrites buckets, in
            # which case it re-derives stats via _carry_stats; stats are
            # keyed by version-scoped paths so carried entries can never
            # describe the wrong file
            stats={f: dict(mm) for f, mm in parent.stats.items()},
            bloom_cols=list(parent.bloom_cols),
            blooms={f: dict(bb) for f, bb in parent.blooms.items()},
            tags=dict(parent.tags),
            refs=dict(parent.refs),
            # logical→physical map: carried, extended deterministically
            # for columns this commit's schema added (_alloc_phys is a
            # pure function of parent + schema, so write paths that
            # renamed files before this snapshot existed computed the
            # SAME map)
            phys_map=_alloc_phys(parent, schema),
            retired_phys=list(parent.retired_phys),
            constraints=dict(parent.constraints),
            evolution=parent.evolution,
            op=op,
        )
