"""CDC-maintained SCD type-2 history — every key's full version timeline
as validity intervals, incrementally appended per epoch.

The reference keeps only the *latest* row per key (LWW sink state,
``h4com/IntegrationTest.java:187-197`` asserts final state); its
listener feed (``rook-api/.../ReplicationListener.java:24-27``) is the
hook a consumer would use to build history downstream. This module IS
that downstream consumer, Spark-first: an engine sink (K1 fan-out) that
turns the change feed into the classic warehouse type-2 dimension —
one row per (key, version) carrying ``[valid_from, valid_to)`` in the
source's commit-ordinal domain, ``is_current`` for the open interval,
and ``end_op`` recording *how* the interval closed ('U' superseded,
'D' deleted).

Why this beats snapshot time travel for point-in-time reads: the lake
table's time travel resolves only COMMIT boundaries (epoch
granularity, and ``vacuum`` erodes old versions), while SCD2 answers
``state_at(any ordinal)`` forever, from ONE table, with no snapshot
retention cost — the standard trade of storing the timeline once
instead of N snapshots.

Incremental maintenance per epoch is O(batch) + O(touched keys):

1. ONE window pass over the batch ordered by ``(commit_ordinal,
   offset)`` per key turns events into intervals (``lead`` supplies
   each version's close); delete events close their predecessor and
   emit no row.
2. The previously-OPEN interval of each touched key is closed by an
   upsert: current rows inner-joined (key-equi, bucket-colocated)
   against the batch's per-key first event. Keys untouched by the
   batch are never read or rewritten.
3. Both row sets MERGE into the history table in one atomic, fenced
   commit. Exactly-once is layered like ``DeltaAggView``'s: the run_id
   fence absorbs foreachBatch re-deliveries, and the history keeps its
   OWN per-source-partition offset watermarks in its snapshot lineage
   — the sink-committed/main-uncommitted crash window restarted from a
   FRESH checkpoint (where the fence cannot help and the MAIN table's
   watermark never advanced) is screened by the history's own
   watermark, which would otherwise re-append rows and collide the
   re-computed open interval with the close of the stored one.

The history table's merge key is ``key + (valid_from, valid_from_off)``
but it BUCKETS by the key prefix alone (``bucket_cols`` routing), so a
key's whole timeline co-locates: closing currents, ``state_at`` point
lookups and timeline scans all prune to one bucket.

ORDINAL CONTRACT: commit ordinals must be non-decreasing per key across
epochs (the binlog-position property the whole engine already relies
on — ``apply.watermark_filter`` guarantees no re-delivery below the
high-water mark, and a binlog never moves backwards). Within an epoch,
``offset`` breaks ties. Feeds that violate cross-epoch monotonicity
corrupt intervals silently; the invariant test (history == full-log
recompute) is the detector.

FAILURE CONTRACT: same as every derived sink (``DedupIndex`` module
docstring) — a dead-lettered sink epoch never reaches the history
again through the stream; repair is :meth:`rebuild_from_log` with the
retained log (O(log), one window pass — no per-epoch loop).

Scope: full row images only. A minimal-row-image feed (``cdc/patch.py``)
delivers masked columns; folding patches into history rows would need
the patch machinery per version — callers run the engine with
``row_image='full'`` for SCD2 (enforced with a loud error).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from rook_spark.cdc.apply import watermark_filter
from rook_spark.lake.table import LakeTable, bucket_expr

# batch bookkeeping columns that never become history payload
_NON_PAYLOAD = ("op", "commit_ordinal", "offset", "source_partition", "tx_id")


class Scd2History:
    """Type-2 history table for one CDC-replicated table. See module
    docstring for semantics, guarantees, and contracts.

    ``key_cols`` is the LOGICAL key (same as the main table's); the
    stored merge key appends ``(valid_from, valid_from_off)`` so every
    version is its own row, while bucketing stays on the logical key
    prefix (timeline co-location)."""

    VERSION_COLS = ("valid_from", "valid_from_off", "valid_to", "end_op",
                    "is_current")

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Iterable[str] = ("repo", "path"),
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets

    # ---------------------------------------------------------------- table

    def table(self, reference: DataFrame | None = None) -> LakeTable:
        """Load the history table, creating it lazily from the first
        batch's schema (key + payload types taken from ``reference``)."""
        if LakeTable.exists(self.path):
            return LakeTable.load(self.spark, self.path)
        if reference is None:
            raise FileNotFoundError(
                f"no SCD2 history at {self.path} yet — created by the first "
                "applied batch (or rebuild_from_log); pass a reference frame "
                "to create it explicitly"
            )
        fields = [
            T.StructField(f.name, f.dataType, f.name not in self.key_cols)
            for f in reference.schema.fields
            if f.name in self.key_cols or f.name in self._payload_cols(reference)
        ]
        fields += [
            T.StructField("valid_from", T.LongType(), False),
            T.StructField("valid_from_off", T.LongType(), False),
            T.StructField("valid_to", T.LongType()),
            T.StructField("end_op", T.StringType()),
            T.StructField("is_current", T.BooleanType()),
        ]
        return LakeTable.create(
            self.spark, self.path, T.StructType(fields),
            key_cols=self.key_cols + ["valid_from", "valid_from_off"],
            bucket_cols=self.key_cols, n_buckets=self.n_buckets,
        )

    def _payload_cols(self, flat: DataFrame) -> list[str]:
        skip = set(self.key_cols) | set(_NON_PAYLOAD) | set(self.VERSION_COLS)
        return [c for c in flat.columns if c not in skip]

    # ------------------------------------------------------------- readers

    def history(self) -> DataFrame:
        """Every version of every key (the full type-2 dimension)."""
        return self.table().read()

    def current(self) -> DataFrame:
        """Open intervals only — equals the main table's live state."""
        return self.history().where(F.col("is_current"))

    def state_at(self, ordinal: int) -> DataFrame:
        """Point-in-time state at ANY commit ordinal (not just epoch
        boundaries): rows whose interval covers ``ordinal``. Zero-length
        intervals (tied ordinals within a key) self-exclude, so the
        latest tied version wins — LWW semantics preserved."""
        return self.history().where(
            (F.col("valid_from") <= F.lit(ordinal))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ordinal)))
        ).drop(*self.VERSION_COLS)

    # ----------------------------------------------------------- transform

    def _intervals(self, flat: DataFrame) -> DataFrame:
        """One window pass: batch events → interval rows (non-deletes
        only; a delete closes its predecessor via ``lead`` and emits
        nothing). Shared by the per-epoch sink and the full-log rebuild —
        incremental maintenance and recompute CANNOT diverge on this
        step because it is literally the same plan."""
        if "updated_cols" in flat.columns or "__setmask" in flat.columns:
            raise ValueError(
                "SCD2 requires full row images; this feed carries partial-"
                "image masks (row_image='minimal'). Run the engine with "
                "row_image='full' for history tracking."
            )
        # byte-identical re-deliveries INSIDE one batch (at-least-once
        # sources) would otherwise mint two rows with the same
        # (key, valid_from, valid_from_off) merge key
        flat = flat.dropDuplicates(self.key_cols + ["commit_ordinal", "offset"])
        w = Window.partitionBy(*self.key_cols).orderBy("commit_ordinal", "offset")
        seq = flat.select(
            *self.key_cols, *self._payload_cols(flat),
            "op", "commit_ordinal", "offset",
            F.lead("commit_ordinal").over(w).alias("__next_ord"),
            F.lead("offset").over(w).alias("__next_off"),
            F.lead("op").over(w).alias("__next_op"),
        )
        return seq.where(F.col("op") != "D").select(
            *self.key_cols, *self._payload_cols(flat),
            F.col("commit_ordinal").alias("valid_from"),
            F.col("offset").alias("valid_from_off"),
            F.col("__next_ord").alias("valid_to"),
            F.col("__next_op").alias("end_op"),
            F.col("__next_ord").isNull().alias("is_current"),
            # the LWW guard ordinal: the last event that shaped this row
            F.coalesce("__next_ord", "commit_ordinal").alias("__ordinal"),
            F.coalesce("__next_off", "offset").alias("__offset"),
            F.lit("U").alias("op"),
        )

    # ----------------------------------------------------------------- sink

    def sink(self):
        """The engine listener: register with
        ``engine.with_sink("scd2", hist.sink(), when="before")``.
        Receives the normalized, watermark-filtered batch plus the
        checkpoint-scoped run_id; appends the batch's intervals and
        closes touched keys' open intervals in one fenced commit."""

        def fn(flat: DataFrame, batch_id: int, run_id: str = "") -> None:
            t = self.table(reference=flat)
            snap0 = t.snapshot()
            if batch_id <= snap0.batch_id and run_id == snap0.run_id:
                return
            # the history's OWN per-partition offset watermark — the
            # fence alone is not exactly-once for this sink: in the
            # sink-committed / main-uncommitted crash window restarted
            # from a FRESH checkpoint, re-delivered rows pass the MAIN
            # table's watermark (it never advanced) and would re-append
            # — the re-computed open row and the close of the stored
            # open interval then collide on the same merge key
            # (key, valid_from, valid_from_off), duplicating rows.
            flat = watermark_filter(flat, snap0.lineage)
            # three plan branches consume the batch (lineage aggregate
            # + intervals + firsts)
            flat.persist()
            try:
                lin_rows = (
                    flat.groupBy("source_partition")
                    .agg(F.max("offset").alias("max_off"),
                         F.count(F.lit(1)).alias("n"))
                    .collect()
                )
                if not lin_rows:
                    return  # fully re-delivered batch — already appended
                lineage_update = {
                    int(r["source_partition"]): {
                        "last_applied_offset": int(r["max_off"]),
                        "rows_applied": int(r["n"]),
                        "bytes": 0,
                    }
                    for r in lin_rows
                }
                fresh = self._intervals(flat)
                # per-key FIRST batch event = the closer of the stored
                # open interval; struct-min orders by (ordinal, offset)
                # and carries op along
                firsts = flat.groupBy(*self.key_cols).agg(
                    F.min(F.struct("commit_ordinal", "offset", "op")).alias("__f")
                )
                # file-level pruning for the close-currents read: only
                # the buckets the batch's keys route to are even LISTED
                # (bucket_cols co-location makes this exact) — the scan
                # is O(touched buckets), never O(history), the same
                # mechanism the MERGE itself uses
                touched = sorted(
                    r[0]
                    for r in flat.select(
                        bucket_expr(snap0.bucket_key(), snap0.n_buckets)
                    ).distinct().collect()
                )
                cur = t.read(buckets=touched).where(F.col("is_current"))
                # carry the STORED row's columns (not the batch's — an
                # additive-evolution batch has columns old rows lack)
                keep = [c for c in cur.columns
                        if c not in ("valid_to", "end_op", "is_current")]
                closed = (
                    cur.join(firsts, self.key_cols, "inner")
                    .select(
                        *keep,
                        F.col("__f.commit_ordinal").alias("valid_to"),
                        F.col("__f.op").alias("end_op"),
                        F.lit(False).alias("is_current"),
                        F.col("__f.commit_ordinal").alias("__ordinal"),
                        F.col("__f.offset").alias("__offset"),
                        F.lit("U").alias("op"),
                    )
                )
                # cardinality by construction: fresh rows are distinct
                # events, closed rows have pre-batch valid_froms.
                # allowMissingColumns: an additive-evolution batch has
                # columns the stored current rows don't yet (merge
                # widens the table; old intervals read back as null)
                t.merge(
                    fresh.unionByName(closed, allowMissingColumns=True),
                    batch_id, op_col="op", lineage_update=lineage_update,
                    validate_cardinality=False, run_id=run_id,
                )
            finally:
                flat.unpersist()

        return fn

    # --------------------------------------------------------------- repair

    def rebuild_from_log(self, flat_log: DataFrame, batch_id: int | None = None) -> int:
        """O(log) bootstrap/repair: recompute the ENTIRE history from a
        normalized event log (``cdc.normalize.normalize`` output) in one
        window pass and overwrite the table atomically. This is the
        recovery path after a dead-lettered sink epoch — unlike
        ``DedupIndex.rebuild`` it cannot source from the main table
        (final state has forgotten the timeline); it needs the retained
        log, the same requirement as the engine's own
        rollback-and-re-replay recovery. Returns the row count."""
        rows = self._intervals(flat_log)
        t = self.table(reference=flat_log)
        t.overwrite(rows.drop("op"), batch_id=batch_id)
        return t.read().count()
