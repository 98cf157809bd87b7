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
  here; min/max/distinct need the Rollup shape because deletes can't
  be un-folded).

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
fresh-checkpoint test.

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

    # ------------------------------------------------------------ the fold

    def _contrib(self, rows: DataFrame, sign: int) -> DataFrame:
        return rows.select(
            self.group_expr().alias(self.group_name),
            F.lit(sign).cast("long").alias("n_rows"),
            *[
                (F.lit(sign) * fn().cast("long")).alias(m)
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
            fresh = watermark_filter(flat, snap.lineage)
            # one narrow pass: per-partition watermarks + global fold
            # guard + the MAIN table's touched buckets (piggybacked here
            # so the pre-image read below lists only those files — the
            # scan is O(touched buckets), never O(main table))
            main_snap = self.main().snapshot()
            lin_rows = (
                fresh.groupBy("source_partition")
                .agg(F.max("offset").alias("max_off"),
                     F.count(F.lit(1)).alias("n"),
                     F.max("commit_ordinal").alias("max_ord"),
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
            max_ord = max(int(r["max_ord"]) for r in lin_rows)
            max_off = max(int(r["max_off"]) for r in lin_rows)
            main_buckets = sorted({b for r in lin_rows for b in r["bks"]})

            reduced = lww_reduce(fresh, key_cols=self.key_cols)
            reduced.persist()
            delta = None
            try:
                old = self.main().read(buckets=main_buckets).join(
                    reduced.select(*self.key_cols), self.key_cols, "inner"
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
                    .withColumn("__ordinal", F.lit(max_ord).cast("long"))
                    .withColumn("__offset", F.lit(max_off).cast("long"))
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
