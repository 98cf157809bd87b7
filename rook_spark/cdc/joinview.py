"""Incrementally maintained JOIN view over two lake tables.

The last point on the derived-table cost spectrum: ``Rollup`` recomputes
touched groups, ``DeltaAggView`` folds signed deltas, and ``JoinView``
maintains a denormalized LEFT JOIN — the "enrich every fact row with its
dimension" table a downstream consumer actually reads. Reference
parity: rook's Hibernate cache synchronizer keeps per-ENTITY regions in
lockstep (E2, ``SecondLevelCacheSynchronizer.java``); the join view is
the cross-entity version of the same lockstep — the thing rook users
hand-build by invalidating BOTH caches and re-reading.

DESIGN — recompute-from-state, driven by table VERSIONS (not event
deltas). Each refresh:

1. reads its own per-side base-table VERSION watermarks out of the view
   snapshot's lineage (partition 0 = left, 1 = right) — the same atomic
   bookkeeping slot the engine uses for offsets, so the watermarks
   commit/rollback/time-travel WITH the view's data;
2. derives each side's net changed keys via ``LakeTable.changes(from_v,
   to_v)``, pruned to the buckets whose file/delta lists differ between
   the two snapshots (a metadata-only diff — O(touched buckets), never
   O(table));
3. expands right-side changes into affected LEFT keys through a REVERSE
   index table keyed ``join_key + left_key`` but BUCKETED by the join
   key (``bucket_cols`` routing) — the fan-out lookup is a bucket-pruned
   point read, O(changed dims × fanout), which is what makes a hot-dim
   update affordable at 10^10 fact rows;
4. RECOMPUTES every affected left key from the CURRENT committed states
   (bucket-pruned point reads of both sides) and merges the rows —
   affected keys missing from the left table become deletes.

Why recompute-from-state instead of folding the event deltas: the
recompute is VALUE-IDEMPOTENT — re-running a refresh, re-delivering an
epoch, restarting from a fresh checkpoint, or racing a crash between
the reverse-index commit and the view commit all converge to the same
rows, because the output depends only on (affected key set, committed
base state) and the key set is a superset under every failure. The
whole crash-window watermark machinery ``DeltaAggView`` needs (folds
are not idempotent) simply does not arise; the view's only bookkeeping
is "which base versions have I seen", and rollback of a BASE table is
handled for free — versions only move forward and ``changes()`` diffs
STATE, so a rollback's net un-happening is just another diff.

Honest contracts, stated loudly:
- The reverse index is maintained as a SUPERSET (stale ``(old_fk, k)``
  entries after an fk-changing update survive until the next refresh
  touching them, or ``full_recompute``): a stale entry costs one
  redundant key recompute, never a wrong row.
- Vacuum retention on the base tables must cover the view's refresh lag
  (same contract as the change feed): a vacuumed from-version raises
  with a ``full_recompute`` instruction instead of silently diffing
  against the wrong state.
- While a base table is in WAP staging, the view reads its PUBLISHED
  ref — pre-audit epochs never reach the view (same resolution as
  default reads and the change feed).

Reference: the two-phase listener delivery rook uses so every derived
store sees a transaction exactly once (``MySQLReplicationStream.java:
161-179``); here the lake tables' own commit log plays that role.
"""
from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.lake.table import LakeTable, bucket_expr

_L, _R = "0", "1"  # lineage partition slots: left / right base version


def _resolve(t) -> LakeTable:
    return t() if callable(t) else t


class JoinView:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        left: Callable[[], LakeTable] | LakeTable,
        right: Callable[[], LakeTable] | LakeTable,
        join_on: list[str],
        right_cols: dict[str, str] | None = None,
        n_buckets: int = 16,
    ):
        """``join_on``: columns of the LEFT table that equal the RIGHT
        table's key (the FK). ``right_cols``: {right column: view column}
        projection of the dimension payload; default = every right
        payload column as ``r_<name>``."""
        self.spark = spark
        self.path = path
        self._left = left
        self._right = right
        self.join_on = list(join_on)
        self.right_cols = right_cols
        self.n_buckets = n_buckets

    # ------------------------------------------------------------- plumbing

    def left(self) -> LakeTable:
        return _resolve(self._left)

    def right(self) -> LakeTable:
        return _resolve(self._right)

    def _right_map(self) -> dict[str, str]:
        if self.right_cols is not None:
            return dict(self.right_cols)
        rk = set(self.right().snapshot().key_cols)
        return {
            f.name: f"r_{f.name}"
            for f in self.right().snapshot().schema().fields
            if f.name not in rk and not f.name.startswith("__")
        }

    def table(self) -> LakeTable:
        if LakeTable.exists(self.path):
            return LakeTable.load(self.spark, self.path)
        lsnap = self.left().snapshot()
        rsnap = self.right().snapshot()
        if rsnap.key_cols != self.join_on and sorted(rsnap.key_cols) != sorted(self.join_on):
            raise ValueError(
                f"join_on {self.join_on} must equal the right table's key "
                f"{rsnap.key_cols} — the view is the FK point-join; for "
                "non-key joins materialize a re-keyed right table first")
        rmap = self._right_map()
        rtypes = {f.name: f.dataType for f in rsnap.schema().fields}
        fields = [f for f in lsnap.schema().fields if not f.name.startswith("__")]
        names = {f.name for f in fields}
        for rc, vc in rmap.items():
            if vc in names:
                raise ValueError(f"view column {vc!r} collides with a left column")
            fields.append(T.StructField(vc, rtypes[rc], True))
        return LakeTable.create(
            self.spark, self.path, T.StructType(fields),
            key_cols=list(lsnap.key_cols), n_buckets=self.n_buckets,
        )

    def _reverse_table(self) -> LakeTable:
        p = self.path + "__reverse"
        if LakeTable.exists(p):
            return LakeTable.load(self.spark, p)
        lsnap = self.left().snapshot()
        ltypes = {f.name: f for f in lsnap.schema().fields}
        fields = [ltypes[c] for c in self.join_on] + \
                 [ltypes[k] for k in lsnap.key_cols if k not in self.join_on]
        return LakeTable.create(
            self.spark, p, T.StructType(fields),
            key_cols=self.join_on + [k for k in lsnap.key_cols
                                     if k not in self.join_on],
            n_buckets=self.n_buckets, bucket_cols=list(self.join_on),
        )

    def read(self) -> DataFrame:
        return self.table().read()

    # ------------------------------------------------------- version window

    @staticmethod
    def _published_version(t: LakeTable) -> int:
        snap = t.snapshot()
        return snap.refs.get("main", snap.version)

    @staticmethod
    def _touched_buckets(t: LakeTable, from_v: int, to_v: int) -> list[int] | None:
        """Buckets whose file or delta lists differ between the two
        snapshots — metadata only. None = no pruning possible (rebucket
        boundary: bucket ids name different key sets)."""
        try:
            a, b = t.snapshot(from_v), t.snapshot(to_v)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"base version {from_v} of {t.path} is gone (vacuumed?) — "
                "the join view's refresh lag exceeded retention; repair "
                "with full_recompute() (and size vacuum keep_last/"
                "min_age_s to cover view lag)") from None
        if a.n_buckets != b.n_buckets:
            return None
        return sorted(
            int(bk)
            for bk in set(a.buckets) | set(b.buckets) | set(a.deltas) | set(b.deltas)
            if a.buckets.get(bk) != b.buckets.get(bk)
            or a.deltas.get(bk) != b.deltas.get(bk)
        )

    def _changed_keys(self, t: LakeTable, from_v: int, to_v: int,
                      cols: list[str]) -> DataFrame | None:
        if to_v == from_v:
            return None
        buckets = self._touched_buckets(t, from_v, to_v)
        if buckets == []:
            return None
        return t.changes(from_v, to_v, buckets=buckets).select(*cols).distinct()

    # -------------------------------------------------------------- refresh

    def refresh(self) -> dict:
        """Bring the view up to the CURRENT committed base states. Safe
        to call at any time, from any number of retries: idempotent by
        construction (see module docstring). Returns refresh stats."""
        view = self.table()
        rev = self._reverse_table()
        snap = view.snapshot()
        wm = {p: int(m["last_applied_offset"]) for p, m in snap.lineage.items()}
        l_from, r_from = wm.get(_L, 0), wm.get(_R, 0)
        left, right = self.left(), self.right()
        l_to = self._published_version(left)
        r_to = self._published_version(right)
        if l_to == l_from and r_to == r_from:
            return {"skipped": True, "version": snap.version}

        lkeys = left.snapshot().key_cols
        dl = self._changed_keys(left, l_from, l_to, lkeys)
        dr = self._changed_keys(right, r_from, r_to, self.join_on)

        # right-side fan-out: changed dim keys -> affected left keys via
        # the reverse index, bucket-pruned on the join key
        affected = dl
        if dr is not None:
            dr = dr.persist()
            rsnap = rev.snapshot()
            fk_buckets = sorted(
                r[0] for r in dr.select(
                    bucket_expr(rsnap.bucket_key(), rsnap.n_buckets)).distinct().collect()
            )
            fan = (
                rev.read(buckets=fk_buckets)
                .join(dr, self.join_on, "left_semi")
                .select(*lkeys).distinct()
            )
            affected = fan if affected is None else affected.unionByName(fan).distinct()
        if affected is None:
            # version moved with zero net key changes (maintenance-only
            # window) — just advance the watermarks
            self._commit(view, None, None, l_to, r_to)
            return {"skipped": False, "recomputed_keys": 0,
                    "version": view.snapshot().version}

        affected = affected.persist()
        try:
            # recompute against the EXACT watermark versions, not "now":
            # a concurrent base commit between the version read and this
            # scan would otherwise leak state past the recorded watermark
            # (it gets its own refresh next time either way)
            lsnap = left.snapshot(l_to)
            l_buckets = sorted(
                r[0] for r in affected.select(
                    bucket_expr(lsnap.bucket_key(), lsnap.n_buckets)).distinct().collect()
            )
            cur = (
                left.read(version=l_to, buckets=l_buckets)
                .join(affected, lkeys, "left_semi")
            ).persist()
            try:
                rsnap2 = right.snapshot(r_to)
                r_buckets = sorted(
                    r[0] for r in cur.select(
                        bucket_expr(self.join_on, rsnap2.n_buckets)).distinct().collect()
                )
                rmap = self._right_map()
                dim = right.read(version=r_to, buckets=r_buckets).select(
                    *[F.col(k) for k in self.join_on],
                    *[F.col(rc).alias(vc) for rc, vc in rmap.items()],
                )
                joined = cur.join(dim, self.join_on, "left").withColumn("op", F.lit("U"))
                # affected keys no longer in the left table -> deletes
                gone = (
                    affected.join(cur.select(*lkeys), lkeys, "left_anti")
                    .withColumn("op", F.lit("D"))
                )
                for f in joined.schema.fields:
                    if f.name not in ("op", *lkeys):
                        gone = gone.withColumn(f.name, F.lit(None).cast(f.dataType))
                change_set = joined.unionByName(gone, allowMissingColumns=True)

                # reverse-index upserts FIRST (superset-safe ordering: a
                # crash after this commit only leaves extra entries)
                rev.merge(
                    cur.select(*self.join_on,
                               *[k for k in lkeys if k not in self.join_on])
                       .withColumn("op", F.lit("U")),
                    rev.snapshot().batch_id + 1, validate_cardinality=False,
                )
                n = self._commit(view, change_set, affected.count(), l_to, r_to)
                return {"skipped": False, "recomputed_keys": n,
                        "version": view.snapshot().version}
            finally:
                cur.unpersist()
        finally:
            affected.unpersist()
            if dr is not None:
                dr.unpersist()

    def _commit(self, view: LakeTable, change_set: DataFrame | None,
                n_keys: int | None, l_to: int, r_to: int) -> int:
        lineage = {
            0: {"last_applied_offset": l_to, "rows_applied": n_keys or 0, "bytes": 0},
            1: {"last_applied_offset": r_to, "rows_applied": 0, "bytes": 0},
        }
        bid = view.snapshot().batch_id + 1
        if change_set is None:
            # metadata-only watermark advance: an empty merge carries the
            # lineage in one atomic snapshot like any data commit
            empty = self.spark.createDataFrame(
                [], T.StructType(list(view.snapshot().schema().fields)
                                 + [T.StructField("op", T.StringType())]))
            view.merge(empty, bid, lineage_update=lineage,
                       validate_cardinality=False)
            return 0
        view.merge(change_set, bid, lineage_update=lineage,
                   validate_cardinality=False)
        return int(n_keys or 0)

    # ------------------------------------------------------------ streaming

    def sink(self):
        """Adapter for the engine's after-phase fan-out
        (``CdcEngine.with_sink(..., when="after")``): refresh after each
        epoch's base commits. The batch contents are deliberately
        IGNORED — refresh is driven by the tables' own version
        watermarks, so a re-delivered, reordered, or partially-applied
        epoch changes nothing about correctness (it just refreshes
        whatever actually committed). Attach to whichever engine commits
        LAST in the epoch (or to both — the second call no-ops)."""
        def fn(flat: DataFrame, batch_id: int, run_id: str = "") -> None:
            self.refresh()
        return fn

    # --------------------------------------------------------------- repair

    def full_recompute(self) -> dict:
        """O(left ⋈ right) rebuild — bootstrap and the repair path for
        vacuumed-past-retention windows. Rebuilds the reverse index too
        (the one place superset staleness is pruned)."""
        view = self.table()
        rev = self._reverse_table()
        left, right = self.left(), self.right()
        lkeys = left.snapshot().key_cols
        rmap = self._right_map()
        cur = left.read()
        dim = right.read().select(
            *[F.col(k) for k in self.join_on],
            *[F.col(rc).alias(vc) for rc, vc in rmap.items()],
        )
        joined = cur.join(dim, self.join_on, "left")
        view.overwrite(joined, batch_id=view.snapshot().batch_id + 1)
        rev.overwrite(cur.select(
            *self.join_on, *[k for k in lkeys if k not in self.join_on]))
        # stamp the watermarks at the states we just read
        self._commit(view, None, None,
                     self._published_version(left), self._published_version(right))
        return {"rows": view.read().count()}
