"""K5/K6 — the idempotent per-batch apply (the foreachBatch body).

Reference semantics being re-expressed:

- one transaction per batch, commit-or-rollback
  (``DefaultRowsMutationIndexer.java:44-58``) → one atomic LakeTable
  snapshot commit per micro-batch (epoch strengthens rook's per-TX
  atomicity: a Spark micro-batch contains whole tx groups because the
  fixture's tx_ids are contiguous in offset order);
- upsert-or-purge per key (``DefaultRowsMutationIndexer.java:64-88``)
  → MERGE with op='D' → DELETE, else UPDATE/INSERT;
- within-batch dedup (``IndexingLog``,
  ``DefaultRowsMutationIndexer.java:151-180``) → the LWW reduce (W1);
  rook's first-wins is replaced by last-writer-wins because we replay a
  log instead of re-reading final DB state;
- at-least-once delivery → exactly-once table state via per-partition
  offset watermarks (anti-filter of already-applied offsets) + batch-id
  fencing, both stored in the same atomic snapshot (north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import chain
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rook_spark.cdc.reduce import lww_reduce, salted_lww_reduce
from rook_spark.lake.table import LakeTable


@dataclass
class ApplyStats:
    batch_id: int
    skipped: bool
    rows_in: int
    rows_applied: int
    touched_buckets: int
    version: int


def watermark_filter(flat: DataFrame, lineage: dict[str, dict[str, int]]) -> DataFrame:
    """Drop events at-or-below the per-source-partition applied watermark.

    ORDERING CONTRACT: within one source partition, offsets must arrive
    non-decreasing across batches — exactly what a binlog or one Kafka
    partition provides (the reference preserves it via single-threaded
    dispatch, ``MySQLReplicationStream.java:161-179``). Under that
    contract, everything at-or-below the watermark is a duplicate and
    dropping it is exactly-once dedup (north_rule). A source that
    violates the contract loses events here by design; cross-partition
    disorder is always fine (watermarks are per partition), and
    *overlapping re-delivery* of already-applied suffixes is additionally
    made harmless by the conditional-ordinal MERGE (LakeTable.merge).

    The watermark map is tiny (one entry per source partition), so it is
    inlined as a literal ``map`` expression — evaluated JVM-side inside
    whole-stage codegen, no join, no shuffle, no Python.
    """
    if not lineage:
        return flat
    pairs = list(
        chain.from_iterable(
            (F.lit(int(p)), F.lit(int(m["last_applied_offset"]))) for p, m in lineage.items()
        )
    )
    wm = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col("source_partition")), F.lit(-1)
    )
    return flat.where(F.col("offset") > wm)


def apply_batch(
    table: LakeTable,
    flat: DataFrame,
    batch_id: int,
    key_cols: tuple[str, ...] = ("repo", "path"),
    ordinal_col: str = "commit_ordinal",
    offset_col: str = "offset",
    salted: bool = False,
    n_salts: int = 16,
    content_col: str = "content",
) -> ApplyStats:
    """Apply one normalized micro-batch to the target table.

    ``flat`` is the output of :func:`rook_spark.cdc.normalize.normalize`:
    key cols + payload cols + op + commit_ordinal + offset +
    source_partition (+ tx_id).
    """
    snap = table.snapshot()
    if batch_id <= snap.batch_id:  # foreachBatch re-delivery fence
        return ApplyStats(batch_id, True, 0, 0, 0, snap.version)

    fresh = watermark_filter(flat, snap.lineage)

    # lineage accounting per source partition (one small aggregate; the
    # collect returns <= n_source_partitions rows)
    bytes_expr = (
        F.coalesce(F.sum(F.length(F.col(content_col))), F.lit(0))
        if content_col in fresh.columns
        else F.lit(0)
    )
    lin_rows = (
        fresh.groupBy("source_partition")
        .agg(
            F.max(offset_col).alias("max_off"),
            F.count(F.lit(1)).alias("n"),
            bytes_expr.alias("b"),
        )
        .collect()
    )
    lineage_update = {
        int(r["source_partition"]): {
            "last_applied_offset": int(r["max_off"]),
            "rows_applied": int(r["n"]),
            "bytes": int(r["b"]),
        }
        for r in lin_rows
    }
    rows_in = sum(int(r["n"]) for r in lin_rows)

    drop = [c for c in ("source_partition", "tx_id") if c in fresh.columns]
    reducible = fresh.drop(*drop)
    reducer = salted_lww_reduce if salted else lww_reduce
    kwargs: dict[str, Any] = {"n_salts": n_salts} if salted else {}
    # keep the winning (ordinal, offset) as internal target columns: the
    # MERGE compares them against stored state so cross-batch replay of
    # older changes can never regress a row (see LakeTable.merge)
    changes = (
        reducer(
            reducible, key_cols=key_cols, ordinal_col=ordinal_col, offset_col=offset_col, **kwargs
        )
        .withColumnRenamed(ordinal_col, "__ordinal")
        .withColumnRenamed(offset_col, "__offset")
    )

    result = table.merge(changes, batch_id, op_col="op", lineage_update=lineage_update)
    return ApplyStats(
        batch_id=batch_id,
        skipped=bool(result.get("skipped")),
        rows_in=rows_in,
        rows_applied=rows_in,
        touched_buckets=int(result.get("touched_buckets", 0)),
        version=int(result.get("version", -1)),
    )
