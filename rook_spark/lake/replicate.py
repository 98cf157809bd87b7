"""Table-to-table CDC relay: tail one lake table's change feed and
maintain a replica — the downstream half of the reference's
master→slave replication loop (``h4com/IntegrationTest.java:187-197``
mutates on master and asserts sink state on slave), re-expressed as a
composition of two first-class pieces: the changelog streaming source
(:mod:`rook_spark.lake.stream`) and the conditional-ordinal MERGE
(:meth:`LakeTable.merge`).

Per trigger the relay costs O(change volume): the feed emits the
version window's delta rows (already LWW-reduced per epoch), one
reduce collapses multi-epoch windows per key, one MERGE applies them.
The replica never re-reads the source's base data — a 100 TB source
with 1 GB epochs replicates at 1 GB per epoch.

Exactly-once, layer by layer (same stack as the engine's own tail):

- the stream checkpoint tracks the version offset (a restarted query
  resumes where it left off, nothing re-emitted);
- the replica's batch-id fence (scoped to this checkpoint's run_id)
  absorbs foreachBatch re-deliveries;
- a FRESH checkpoint restarts the feed from ``start_version`` and
  re-applies the whole history — the conditional-ordinal MERGE (cow)
  or the LWW fold (mor) makes that a convergent no-op, so recovery is
  "delete the checkpoint and re-tail", the same story as the engine.

The replica defaults to merge-on-read — which makes it ITSELF a valid
feed source, so relays CHAIN (master → replica → replica², pinned by
test): fan-out topologies at O(change volume) per hop.

Deletes propagate (feed 'D' rows — including ``delete_where(
mode='mor')`` tombstones — become MERGE deletes): GDPR erasure on the
source erases downstream, no coordination needed.

Schema: locked at query start (the feed's contract); columns added on
the source mid-stream appear after a relay restart (the replica widens
via the MERGE's evolution path on the first batch carrying them).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from rook_spark.cdc.reduce import lww_reduce
from rook_spark.lake.stream import LakeChangeDataSource, _load_snapshot
from rook_spark.lake.table import LakeTable


def replicate(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint_dir: str,
    start_version: int = -1,
    n_buckets: int | None = None,
    write_mode: str = "mor",
) -> StreamingQuery:
    """Start the relay; returns the StreamingQuery (caller owns its
    lifecycle — ``processAllAvailable`` to drain in tests, triggers in
    production). ``start_version=-1`` replays the source's full
    retained history (bootstrap + tail in one query); pass a later
    version to tail from a known-replicated point. Key/bucket layout
    is inherited from the source unless ``n_buckets`` overrides."""
    if write_mode not in ("cow", "mor"):
        raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
    src_snap = _load_snapshot(src_path)
    key_cols = [k for k in src_snap.key_cols]
    dst_buckets = n_buckets or src_snap.n_buckets
    run_id = os.path.abspath(checkpoint_dir)

    try:
        spark.dataSource.register(LakeChangeDataSource)
    except Exception:
        pass  # a prior registration in this session wins; same class

    feed = (
        spark.readStream.format("rook_lake_changes")
        .option("path", src_path)
        .option("start_version", start_version)
        .load()
    )

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        dst = _dst_table(spark, dst_path, df, key_cols, dst_buckets)
        # a trigger may span several source epochs → several feed rows
        # per key; ONE reduce restores the at-most-one-row-per-key MERGE
        # cardinality contract (ties impossible: (ordinal, offset) pairs
        # are unique per key in any engine-written feed)
        reduced = lww_reduce(
            df.drop("commit_version"), key_cols=key_cols,
            ordinal_col="ordinal", offset_col="offset",
        )
        changes = reduced.select(
            *[c for c in reduced.columns if c not in ("op", "ordinal", "offset")],
            F.col("op"),
            F.col("ordinal").alias("__ordinal"),
            F.col("offset").alias("__offset"),
        )
        merge = dst.merge_mor if write_mode == "mor" else dst.merge
        merge(changes, batch_id, op_col="op", run_id=run_id)

    return (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _dst_table(
    spark: SparkSession,
    dst_path: str,
    batch: DataFrame,
    key_cols: list[str],
    n_buckets: int,
) -> LakeTable:
    if LakeTable.exists(dst_path):
        return LakeTable.load(spark, dst_path)
    fields = [
        T.StructField(f.name, f.dataType, f.name not in key_cols)
        for f in batch.schema.fields
        if f.name not in ("op", "ordinal", "offset", "commit_version")
    ]
    fields += [
        T.StructField("__ordinal", T.LongType()),
        T.StructField("__offset", T.LongType()),
    ]
    return LakeTable.create(
        spark, dst_path, T.StructType(fields), key_cols=key_cols,
        n_buckets=n_buckets,
    )
