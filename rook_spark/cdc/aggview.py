"""Incrementally-maintained aggregate view by ALGEBRAIC DELTA FOLDING —
per-epoch cost O(batch + touched groups), reading no other rows.

The third point on the derived-table cost spectrum, and the cheapest:

- ``Rollup`` (cdc/derived.py) RECOMPUTES each touched parent from all
  of its children — supports arbitrary aggregates (count distinct,
  max), but a hot parent with 10^6 children re-reads 10^6 rows per
  epoch.
- ``DedupIndex`` / ``InvertedIndex`` recompute per-KEY state — O(batch)
  but the derived row depends only on its own key's latest image.
- ``DeltaAggView`` (this module) maintains per-GROUP additive
  aggregates (counts, sums) by folding signed contributions: each
  changed key contributes ``-measures(old image)`` and
  ``+measures(new image)``; the group's stored total moves by the
  difference. The hot-parent epoch cost drops from O(children) to
  O(changed children) — at 10^10 rows with a skewed feed this is the
  difference between re-aggregating a million-row group every epoch
  and touching two rows of it. The price is the algebraic restriction:
  measures must form a commutative group (sum/count over integers
  here, with null measure values counting as 0; min/max/distinct need
  the Rollup shape because deletes can't be un-folded).

Plan shape per epoch (all JVM-side, partial-aggregable):

1. LWW-reduce the batch per key (net change — same reduce the main
   MERGE applies).
2. Pre-images: main-table rows key-equi-joined against the batch's
   keys ("before"-phase delivery makes this the pre-commit state; the
   join prunes to the batch's buckets).
3. Signed union → ONE groupBy(group) sum — shuffle sized by touched
   groups, not table.
4. Fold into stored totals (left join on touched groups only), delete
   groups whose row count reaches zero, MERGE in one atomic commit.

EXACTLY-ONCE — stronger than the fence alone: delta folds are NOT
value-idempotent (re-applying a fold double-counts, unlike
``DedupIndex``'s identical-row upserts), so the view maintains its OWN
per-source-partition offset watermarks in its snapshot lineage —
``watermark_filter`` against the VIEW's lineage, the exact discipline
the main table uses (``apply.watermark_filter``). The crash window
that motivates it: sink commits its fold, the process dies before the
main-table commit, and the operator restarts from a FRESH checkpoint —
batch ids restart and the run_id fence cannot help, but the view's own
watermark drops the re-delivered offsets. Covered by the
fresh-checkpoint test. The watermark also makes the REVERSE window
detectable — the view folded offsets the main table never committed —
and the sink repairs it by rolling the view back (metadata-only) to
its latest version whose watermarks are ≤ main's, then re-folding the
re-delivered batch against consistent pre-images; without the repair,
later events for the same keys would fold against pre-images that
never absorbed the lost epoch (double-subtraction).

ORDINAL/ORDERING CONTRACT: same as the engine's (per-source-partition
non-decreasing offsets); the view additionally inherits the main
table's assumption that the watermark filter screens every stale
event — a feed the main MERGE would refuse by conditional ordinal but
that passes the watermark would fold here unconditionally.

FAILURE CONTRACT: same as every derived sink (see ``DedupIndex``) — a
dead-lettered epoch is repaired by :meth:`full_recompute`, the
O(corpus) aggregate over the main table's current state (which also
doubles as the test invariant: incremental folds must be
indistinguishable from it).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.apply import watermark_filter
from rook_spark.cdc.reduce import lww_reduce
from rook_spark.lake.table import LakeTable, bucket_expr


class DeltaAggView:
    """One additive aggregate view over a CDC-replicated table.

    ``group_expr`` maps a (flattened) row to its group (any expression
    over key/payload columns — payload-derived groups migrate rows
    between groups correctly, the old image's group gets the negative).
    ``measures`` maps measure names to integer-valued row expressions;
    each is maintained as its group SUM, plus an implicit ``n_rows``
    count. Integer (long) arithmetic keeps folds drift-free — float
    sums would accumulate error across epochs; use scaled integers.

    Scope: assumes no KEEP/SKIP/REMOVE policy on the engine (sinks see
    the pre-policy feed — same caveat as ``DedupIndex``).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        main: LakeTable | Callable[[], LakeTable],
        group_expr: Callable[[], Column],
        measures: dict[str, Callable[[], Column]],
        group_name: str = "grp",
        key_cols: Iterable[str] = ("repo", "path"),
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.path = path
        self._main = main
        self.group_expr = group_expr
        self.measures = dict(measures)
        self.group_name = group_name
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets

    def main(self) -> LakeTable:
        return self._main() if callable(self._main) else self._main

    # ---------------------------------------------------------------- table

    def table(self, reference: DataFrame | None = None) -> LakeTable:
        if LakeTable.exists(self.path):
            return LakeTable.load(self.spark, self.path)
        if reference is None:
            raise FileNotFoundError(
                f"no aggregate view at {self.path} yet — created by the "
                "first applied batch (or full_recompute); pass a reference "
                "frame to create it explicitly"
            )
        gtype = reference.select(
            self.group_expr().alias(self.group_name)
        ).schema[0].dataType
        schema = T.StructType(
            [T.StructField(self.group_name, gtype, False),
             T.StructField("n_rows", T.LongType(), False)]
            + [T.StructField(m, T.LongType()) for m in self.measures]
        )
        return LakeTable.create(
            self.spark, self.path, schema,
            key_cols=[self.group_name], n_buckets=self.n_buckets,
        )

    def read(self) -> DataFrame:
        return self.table().read()

    # ---------------------------------------------------- crash-window sync

    @staticmethod
    def _wm(snap) -> dict[int, int]:
        return {int(p): int(m["last_applied_offset"])
                for p, m in snap.lineage.items()}

    def _ahead_of(self, view_snap, main_snap) -> bool:
        main_wm = self._wm(main_snap)
        return any(off > main_wm.get(p, -1)
                   for p, off in self._wm(view_snap).items())

    def _sync_point(self, t: LakeTable, main_snap) -> int:
        """Latest retained view version whose watermarks are all ≤ the
        main table's — version 0 (empty lineage) always qualifies, so
        the walk terminates; a vacuumed gap raises through rollback's
        own retention check with its clear error."""
        main_wm = self._wm(main_snap)
        for v in range(t.current_version(), -1, -1):
            try:
                s = t.snapshot(v)
            except FileNotFoundError:  # vacuumed — keep walking
                continue
            if all(off <= main_wm.get(p, -1)
                   for p, off in self._wm(s).items()):
                return v
        raise RuntimeError(
            "no retained view version is behind the main table — vacuum "
            "erased the sync point; repair with full_recompute() after "
            "re-replaying the main table past the view's watermarks"
        )

    # ------------------------------------------------------------ the fold

    def _contrib(self, rows: DataFrame, sign: int) -> DataFrame:
        # null measure values count as 0 — WITHOUT the coalesce, a null
        # old-image measure (e.g. a pre-evolution row) would subtract
        # nothing while its non-null replacement adds, and a group whose
        # delta sums to null would null out its stored total through
        # the fold's `stored + delta` arithmetic
        return rows.select(
            self.group_expr().alias(self.group_name),
            F.lit(sign).cast("long").alias("n_rows"),
            *[
                (F.lit(sign) * F.coalesce(fn().cast("long"), F.lit(0))).alias(m)
                for m, fn in self.measures.items()
            ],
        )

    def sink(self):
        """Engine listener — register with
        ``engine.with_sink("agg_view", view.sink(), when="before")``
        ("before" is LOAD-BEARING twice over: the pre-image join must
        see pre-commit state, and an after-phase crash would lose the
        fold forever since re-delivered rows fail the main watermark)."""

        def fn(flat: DataFrame, batch_id: int, run_id: str = "") -> None:
            t = self.table(reference=flat)
            snap = t.snapshot()
            if batch_id <= snap.batch_id and run_id == snap.run_id:
                return
            main_snap = self.main().snapshot()
            # VIEW-AHEAD-OF-MAIN repair (the sink-committed /
            # main-uncommitted crash window, restarted from a FRESH
            # checkpoint): the view's watermark would screen its
            # already-folded offsets, but the pre-image join reads MAIN
            # state that never received them — folding the batch's later
            # events against those stale images double-subtracts. The
            # watermarks make the divergence DETECTABLE: if the view is
            # ahead of main anywhere, roll the view back to its latest
            # version whose watermarks are ≤ main's (metadata-only;
            # totals and watermarks revert together), then fold the
            # whole re-delivered batch against consistent pre-images.
            if self._ahead_of(snap, main_snap):
                t.rollback(self._sync_point(t, main_snap))
                snap = t.snapshot()
            fresh = watermark_filter(flat, snap.lineage)
            # one narrow pass: per-partition watermarks + the MAIN
            # table's touched buckets (piggybacked here so the
            # pre-image read below lists only those files — the scan is
            # O(touched buckets), never O(main table))
            lin_rows = (
                fresh.groupBy("source_partition")
                .agg(F.max("offset").alias("max_off"),
                     F.count(F.lit(1)).alias("n"),
                     F.collect_set(
                         bucket_expr(main_snap.bucket_key(),
                                     main_snap.n_buckets)
                     ).alias("bks"))
                .collect()
            )
            if not lin_rows:
                return  # everything already folded (crash-window replay)
            lineage_update = {
                int(r["source_partition"]): {
                    "last_applied_offset": int(r["max_off"]),
                    "rows_applied": int(r["n"]),
                    "bytes": 0,
                }
                for r in lin_rows
            }
            main_buckets = sorted({b for r in lin_rows for b in r["bks"]})
            # the fold row's LWW guard stamp must be MONOTONE per view
            # commit — the batch's event ordinals are NOT (source
            # partitions have incomparable ordinal domains, so a later
            # epoch's max can be lower and the conditional MERGE would
            # silently refuse the fold). The view's own commit sequence
            # is the clock that is always monotone.
            fold_ord = snap.version + 1

            reduced = lww_reduce(fresh, key_cols=self.key_cols)
            reduced.persist()
            delta = None
            try:
                old = self.main().read(buckets=main_buckets).join(
                    reduced.select(*self.key_cols), self.key_cols, "inner"
                )
                # the pre-image read may PREDATE an additive evolution
                # the batch carries (the main table widens only when its
                # own MERGE commits, which is after this before-phase
                # sink): evaluate group/measure expressions over the
                # batch's schema by adding the missing columns as nulls
                # — exactly how narrow files read under the widened
                # schema. Without this, the first epoch whose batch
                # carries a new measure column throws UNRESOLVED_COLUMN
                # on its own pre-image branch and dead-letters silently.
                have = set(old.columns)
                old = old.select(
                    "*",
                    *[F.lit(None).cast(f.dataType).alias(f.name)
                      for f in flat.schema.fields if f.name not in have],
                )
                delta = (
                    self._contrib(old, -1)
                    .unionByName(self._contrib(reduced.where(F.col("op") != "D"), +1))
                    .groupBy(self.group_name)
                    .agg(F.sum("n_rows").alias("n_rows"),
                         *[F.sum(m).alias(m) for m in self.measures])
                    .where(
                        # groups whose contributions cancel exactly (an
                        # update that changes no measure) need no write
                        ~((F.col("n_rows") == 0)
                          & _all_zero(list(self.measures)))
                    )
                )
                # same pruning for the stored-totals read: the touched
                # GROUPS' buckets only (delta is tiny — persisted so the
                # bucket listing doesn't recompute the fold; unpersisted
                # in the shared finally below)
                delta.persist()
                mv_buckets = sorted(
                    r[0]
                    for r in delta.select(
                        bucket_expr(snap.bucket_key(), snap.n_buckets)
                    ).distinct().collect()
                )
                cur = t.read(buckets=mv_buckets).select(
                    self.group_name,
                    F.col("n_rows").alias("__cur_n"),
                    *[F.col(m).alias(f"__cur_{m}") for m in self.measures],
                )
                folded = (
                    delta.join(cur, self.group_name, "left")
                    .select(
                        self.group_name,
                        (F.coalesce("__cur_n", F.lit(0)) + F.col("n_rows"))
                        .alias("n_rows"),
                        *[
                            (F.coalesce(f"__cur_{m}", F.lit(0)) + F.col(m)).alias(m)
                            for m in self.measures
                        ],
                    )
                    .withColumn(
                        "op",
                        F.when(F.col("n_rows") <= 0, "D").otherwise("U"),
                    )
                    .withColumn("__ordinal", F.lit(fold_ord).cast("long"))
                    .withColumn("__offset", F.lit(0).cast("long"))
                )
                t.merge(
                    folded, batch_id, op_col="op",
                    lineage_update=lineage_update,
                    validate_cardinality=False, run_id=run_id,
                )
            finally:
                reduced.unpersist()
                if delta is not None:
                    delta.unpersist()

        return fn

    # --------------------------------------------------------------- repair

    def full_recompute(self, batch_id: int | None = None) -> DataFrame:
        """O(corpus) bootstrap/repair AND the correctness oracle: one
        aggregate over the main table's current state. NOTE: overwrite
        does not advance the view's lineage — after a repair, the next
        epoch's watermark filter still screens by the last successfully
        folded offsets, which is exactly right (the recompute absorbed
        everything the main table had, and the main table is ahead of
        or equal to the view's watermarks)."""
        main_rows = self.main().read()
        rows = (
            self._contrib(main_rows, +1)
            .groupBy(self.group_name)
            .agg(F.sum("n_rows").alias("n_rows"),
                 *[F.sum(m).alias(m) for m in self.measures])
        )
        t = self.table(reference=main_rows)
        t.overwrite(rows, batch_id=batch_id)
        return t.read()


def _all_zero(measures: list[str]) -> Column:
    cond = F.lit(True)
    for m in measures:
        cond = cond & (F.col(m) == 0)
    return cond
