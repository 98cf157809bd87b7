"""J3 — container/parent propagation as incrementally-maintained derived
tables, RECURSIVE across containment levels.

The reference walks ``@ContainedIn`` references from a changed entity up
through its parent container(s) transitively, re-indexing each container
at most once per batch via an IndexingLog guard
(``DefaultRowsMutationIndexer.java:90-123``, ``indexContainer`` recursion
at ``:141-163``; directive wiring
``fulltextindex/SynchronizationContext.java:99-116``; exercised by the
``@ContainedIn`` parent-reindex tests,
``h4ftiom/IntegrationTest.java:254-368``). Our repo model has two
containment levels: path → repo → org. The Spark-first re-expression is a
chain of **derived rollup tables**, each refreshed incrementally per
epoch: level N recomputes ONLY the parents touched by level N-1's changed
keys (a semi-join, never a driver-side key list) and MERGEs them; parents
of unchanged children are never read or rewritten. The walk is a bounded
worklist loop with a refreshed-level guard — the IndexingLog analog —
so cyclic containment specs terminate after visiting each level once.

Scale notes: the recompute semi-joins the source against the batch's
changed-key DataFrame — the key set never leaves the executors (round-1
used ``collect()``+``isin``, which puts 10⁵⁺ literals in the plan at
100× scale); on Iceberg the semi-join's build side feeds runtime row-group
filtering. The rollup MERGEs reuse the bucketed COW machinery. Cost per
epoch ∝ data of touched containers, not table size.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.lake.table import LakeTable

ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("n_paths", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("n_langs", T.IntegerType()),
        T.StructField("last_commit", T.StringType()),
        T.StructField("last_commit_ordinal", T.LongType()),
    ]
)

ORG_SCHEMA = T.StructType(
    [
        T.StructField("org", T.StringType(), False),
        T.StructField("n_repos", T.LongType()),
        T.StructField("n_paths", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("last_commit_ordinal", T.LongType()),
    ]
)

def default_org_expr() -> Column:
    """Default repo → org containment: the org is derivable from the repo
    name (last-character bucket) the way rook derives the container
    reference from the contained entity's FK. Lazy (a Column needs an
    active SparkContext)."""
    return F.concat(F.lit("org-"), F.substring(F.col("repo"), -1, 1))


class Rollup:
    """One containment level: a derived LakeTable holding one row per
    parent key, incrementally refreshed from a source DataFrame.

    ``refresh`` recomputes rollup rows for ONLY the changed parents
    (semi-join against the changed-key DataFrame) and MERGEs them; a
    parent whose children all vanished gets a 'D' row (parent purge —
    rook purges a container's index entry when it no longer resolves,
    ``DefaultRowsMutationIndexer.java:79-81``).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_col: str,
        source: Callable[[], DataFrame],
        agg_exprs: Callable[[], list[Column]],
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.key_col = key_col
        self.source = source
        self.agg_exprs = agg_exprs
        self.schema = schema
        if LakeTable.exists(path):
            self.table = LakeTable.load(spark, path)
        else:
            self.table = LakeTable.create(
                spark, path, schema, key_cols=[key_col], n_buckets=n_buckets
            )

    def read(self) -> DataFrame:
        return self.table.read()

    def refresh(self, changed_keys: DataFrame) -> dict:
        """``changed_keys``: a one-column DataFrame of parent keys touched
        by this batch. No driver-side key list — the semi-join keeps the
        key set distributed.

        The merge uses the rollup table's OWN monotone batch counter, not
        a caller-supplied foreachBatch id: stream batch ids restart at 0
        on a fresh checkpoint, and fencing a recompute-style refresh on
        them would silently skip every post-restart refresh (the same
        cross-lineage fence bug fixed for the main table via run_id).
        Refreshes are recompute-idempotent, so no fence is needed at all —
        re-delivered batches fan out watermark-filtered (empty) key sets
        and hit the early exit below.
        """
        changed = changed_keys.select(self.key_col).distinct()
        changed.persist()  # feeds the emptiness probe, semi-join, and anti-join
        try:
            if changed.isEmpty():  # re-delivered/empty batch: nothing touched
                return {"skipped": True}
            batch_id = self.table.last_committed_batch() + 1
            state = self.source().join(changed, self.key_col, "left_semi")
            agg = state.groupBy(self.key_col).agg(*self.agg_exprs())
            # parents that vanished entirely -> delete their rollup row
            gone = changed.join(agg, self.key_col, "left_anti")
            for f in self.schema.fields:
                if f.name != self.key_col:
                    gone = gone.withColumn(f.name, F.lit(None).cast(f.dataType))
            changes = agg.withColumn("op", F.lit("U")).unionByName(
                gone.withColumn("op", F.lit("D"))
            )
            return self.table.merge(changes, batch_id, op_col="op")
        finally:
            changed.unpersist()

    def full_recompute(self) -> DataFrame:
        """Oracle for tests: the same aggregate over the whole source."""
        return self.source().groupBy(self.key_col).agg(*self.agg_exprs())


class ContainmentLevel:
    """One edge of the containment graph: maps a changed-key DataFrame of
    the child level to the parent keys it touches, and owns the parent's
    rollup."""

    def __init__(self, rollup: Rollup, parent_keys: Callable[[DataFrame], DataFrame]):
        self.rollup = rollup
        self.parent_keys = parent_keys


def propagate(
    levels: list[ContainmentLevel],
    changed_keys: DataFrame,
    edges: dict[int, list[int]] | None = None,
) -> list[str]:
    """Walk the containment graph transitively: each level's refresh is
    driven by the child level's changed keys. ``edges`` maps a level
    index to the level(s) containing it (default: the linear chain
    ``idx → idx+1``) — the reference's ``@ContainedIn`` reference graph.

    The ``refreshed`` set is the IndexingLog analog
    (``DefaultRowsMutationIndexer.java:90-123``): a level refreshes at
    most once per batch, so CYCLIC containment specs (A contains B
    contains A) terminate after visiting each level once instead of
    recursing forever — the per-key dedup the reference's log does
    row-by-row falls out of ``distinct()`` on the changed-key DataFrame.

    DIAMOND shapes (two children sharing a parent, e.g. edges
    ``{0: [1, 2], 1: [2]}`` — level 2 contains both 0 and 1) are handled
    by ACCUMULATING each level's pending contributions and always
    refreshing the smallest pending index first — so a shared parent
    sees the union of ALL its children's changed keys in one refresh,
    never just the first arrival's. ``parent_keys`` is applied to each
    contribution SEPARATELY (contributions from different children may
    carry different key schemas; the callable may dispatch on columns)
    and the results — all in this level's key space — union safely.
    Contract: containment edges point to HIGHER level indexes (parents
    above children); back-edges are cycles and are cut by the guard.

    Returns the ordered list of refreshed level key columns (test hook).
    """
    refreshed: set[int] = set()
    order: list[str] = []
    pending: dict[int, list[DataFrame]] = {0: [changed_keys]}
    while pending:
        idx = min(pending)  # smallest index first: children before parents
        contributions = pending.pop(idx)
        if idx >= len(levels) or idx in refreshed:  # cycle / end guard
            if idx in refreshed:
                # A contribution reached a level that already refreshed
                # this batch. For a DELIBERATE cycle (A⊃B⊃A) dropping it
                # is the termination guard working as designed; but the
                # same drop silently under-refreshes a parent when the
                # spec violates the "edges point to higher indexes"
                # contract — so make the drop visible instead of silent.
                logging.getLogger(__name__).warning(
                    "propagate: dropping %d contribution(s) for level %d "
                    "(key %r) which already refreshed this batch — a "
                    "back-edge. Expected only for cyclic containment "
                    "specs; if this graph is meant to be acyclic, an "
                    "edge points to a lower/equal index (contract "
                    "violation) and that parent is now stale until the "
                    "next batch that touches it.",
                    len(contributions), idx, levels[idx].rollup.key_col,
                )
            continue
        level = levels[idx]
        mapped = [level.parent_keys(k) for k in contributions]
        parent_changed = mapped[0]
        for m in mapped[1:]:
            parent_changed = parent_changed.unionByName(m)
        level.rollup.refresh(parent_changed)
        refreshed.add(idx)
        order.append(level.rollup.key_col)
        for nxt in (edges or {}).get(idx, [idx + 1]):
            pending.setdefault(nxt, []).append(parent_changed)
    return order


# -------------------------------------------------------- concrete levels


def repo_rollup(spark: SparkSession, path: str, main: LakeTable) -> Rollup:
    """Level 1: path → repo (file count, byte total, last commit)."""
    return Rollup(
        spark,
        path,
        ROLLUP_SCHEMA,
        key_col="repo",
        source=lambda: main.read(include_internal=True, ref="head"),
        agg_exprs=lambda: [
            F.count(F.lit(1)).alias("n_paths"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.countDistinct("lang").cast("int").alias("n_langs"),
            F.max_by("commit", F.struct("__ordinal", "__offset")).alias("last_commit"),
            F.max("__ordinal").alias("last_commit_ordinal"),
        ],
    )


def org_rollup(
    spark: SparkSession, path: str, repos: Rollup, org_expr: Column | None = None
) -> Rollup:
    """Level 2: repo → org — a rollup OF the rollup (the reference's
    container-of-container case, parent-of-parent reindex in
    ``h4ftiom/IntegrationTest.java:254-368``)."""
    org_expr = default_org_expr() if org_expr is None else org_expr
    return Rollup(
        spark,
        path,
        ORG_SCHEMA,
        key_col="org",
        source=lambda: repos.read().withColumn("org", org_expr),
        agg_exprs=lambda: [
            F.count(F.lit(1)).alias("n_repos"),
            F.sum("n_paths").alias("n_paths"),
            F.sum("total_bytes").alias("total_bytes"),
            F.max("last_commit_ordinal").alias("last_commit_ordinal"),
        ],
    )


# --------------------------------------------------------- engine wiring


def attach_rollup(engine, rollup_path: str) -> Rollup:
    """Wire a repo rollup as an engine sink (K1 fan-out): after each
    epoch's MERGE, the rollup refreshes for the batch's touched repos.
    The sink receives the watermark-filtered flattened batch — its
    distinct repos ARE the changed containers."""
    rollup = repo_rollup(engine.spark, rollup_path, engine.target())

    def sink(flat: DataFrame, batch_id: int) -> None:
        rollup.refresh(flat.select("repo"))

    engine.with_sink("repo_rollup", sink)
    return rollup


def attach_rollup_chain(
    engine, repo_path: str, org_path: str, org_expr: Column | None = None
) -> tuple[Rollup, Rollup]:
    """Wire the full recursive chain: path → repo → org, refreshed
    transitively per epoch via :func:`propagate`."""
    org_expr = default_org_expr() if org_expr is None else org_expr
    repos = repo_rollup(engine.spark, repo_path, engine.target())
    orgs = org_rollup(engine.spark, org_path, repos, org_expr)
    levels = [
        ContainmentLevel(repos, lambda keys: keys.select("repo")),
        ContainmentLevel(
            orgs, lambda keys: keys.select(org_expr.alias("org"))
        ),
    ]

    def sink(flat: DataFrame, batch_id: int) -> None:
        propagate(levels, flat.select("repo"))

    engine.with_sink("containment_chain", sink)
    return repos, orgs
