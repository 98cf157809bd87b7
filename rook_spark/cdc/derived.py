"""J3 — container/parent propagation as an incrementally-maintained
derived table.

The reference walks ``@ContainedIn`` references from a changed entity up
to its parent container(s) and re-indexes those too
(``DefaultRowsMutationIndexer.java:90-123``, directive wiring
``fulltextindex/SynchronizationContext.java:99-116``). Our repo model has
one containment level: path → repo. The Spark-first re-expression is a
**derived rollup table** (one row per repo: file count, byte total, last
commit ordinal) refreshed incrementally: each epoch recomputes ONLY the
repos touched by the batch (the FK join of changed keys up to the parent)
and MERGEs them into the rollup — parents of unchanged children are never
read or rewritten.

Scale notes: the recompute reads the main table filtered to the touched
repos — a predicate the parquet scan prunes by row-group stats; the
rollup MERGE reuses the same bucketed COW machinery (rollup key = repo).
Cost per epoch ∝ data of touched repos, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


class RepoRollup:
    """Derived per-repo aggregate table, incrementally maintained."""

    def __init__(self, spark: SparkSession, path: str, main: LakeTable):
        self.spark = spark
        self.main = main
        if LakeTable.exists(path):
            self.table = LakeTable.load(spark, path)
        else:
            self.table = LakeTable.create(
                spark, path, ROLLUP_SCHEMA, key_cols=["repo"], n_buckets=8
            )

    def read(self) -> DataFrame:
        return self.table.read()

    def refresh(self, changed_repos: list[str], batch_id: int) -> dict:
        """Recompute rollup rows for the touched repos only and MERGE.

        A repo whose last file was deleted gets a 'D' row (parent purge —
        the rollup mirrors rook purging a parent's index entry when it no
        longer resolves, ``DefaultRowsMutationIndexer.java:79-81``).
        """
        if not changed_repos:
            return {"skipped": True}
        state = self.main.read(include_internal=True).where(
            F.col("repo").isin(list(changed_repos))
        )
        agg = state.groupBy("repo").agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.countDistinct("lang").cast("int").alias("n_langs"),
            F.max_by("commit", F.struct("__ordinal", "__offset")).alias("last_commit"),
            F.max("__ordinal").alias("last_commit_ordinal"),
        )
        # repos that vanished entirely -> delete their rollup row
        present = {r["repo"] for r in agg.select("repo").collect()}
        gone = [r for r in changed_repos if r not in present]
        changes = agg.withColumn("op", F.lit("U"))
        if gone:
            gone_df = self.spark.createDataFrame(
                [(r,) for r in gone], "repo string"
            )
            for f in ROLLUP_SCHEMA.fields:
                if f.name != "repo":
                    gone_df = gone_df.withColumn(f.name, F.lit(None).cast(f.dataType))
            changes = changes.unionByName(gone_df.withColumn("op", F.lit("D")))
        return self.table.merge(changes, batch_id, op_col="op")

    def full_recompute(self) -> DataFrame:
        """Oracle for tests: the same aggregate over the whole main table."""
        state = self.main.read(include_internal=True)
        return state.groupBy("repo").agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.countDistinct("lang").cast("int").alias("n_langs"),
            F.max_by("commit", F.struct("__ordinal", "__offset")).alias("last_commit"),
            F.max("__ordinal").alias("last_commit_ordinal"),
        )


def attach_rollup(engine, rollup_path: str) -> RepoRollup:
    """Wire a RepoRollup as an engine sink (K1 fan-out): after each
    epoch's MERGE, the rollup refreshes for the batch's touched repos."""
    rollup = RepoRollup(engine.spark, rollup_path, engine.target())

    def sink(flat: DataFrame, batch_id: int) -> None:
        changed = [r["repo"] for r in flat.select("repo").distinct().collect()]
        rollup.refresh(changed, batch_id)

    engine.with_sink("repo_rollup", sink)
    return rollup
