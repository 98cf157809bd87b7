"""Event normalization: the reference's filter/projection operators as
pure, Catalyst-optimizable DataFrame transforms (SURVEY.md §2.2).

Each function cites the reference operator it re-expresses. All are
narrow column expressions — no shuffle, fully pushed into the scan by
Catalyst (filters appear in the parquet scan's PushedFilters at plan
level; see tests/test_plans.py).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qualified_name() -> Column:
    """F1 — ``lower(schema) + '.' + lower(table)``
    (``SecondLevelCacheSynchronizer.java:44``)."""
    return F.concat_ws(".", F.lower(F.col("schema_name")), F.lower(F.col("table_name")))


def filter_ignored_servers(events: DataFrame, ignored_server_ids: Iterable[int]) -> DataFrame:
    """P1 — drop events from ignored server ids (ring-replication loop
    prevention, ``MySQLReplicationStream.java:196-202``)."""
    ids = list(ignored_server_ids)
    if not ids:
        return events
    return events.where(~F.col("server_id").isin(ids))


def filter_tracked_tables(events: DataFrame, tracked_tables: Iterable[str]) -> DataFrame:
    """P2 + P6 — keep only events for tracked qualified tables.

    The reference expresses this both as a deny-list
    (``ignoredTables``, ``MySQLReplicationStream.java:196-202``) and as
    static pruning to cache-enabled tables
    (``SynchronizationContext.java:66-78``); a MERGE target is
    allow-listed, so we prune to the tracked set — Catalyst pushes the
    isin() into the scan. Empty tx groups vanish naturally under any
    later groupBy (P3, ``MySQLReplicationStream.java:181-194``).
    """
    tracked = [t.lower() for t in tracked_tables]
    return events.where(qualified_name().isin(tracked))


def affected_image(op_col: str = "op") -> Column:
    """P4 — the row image that identifies the affected key: the BEFORE
    image for deletes (and the reference also keys updates by before so
    key-changing updates hit the old key,
    ``AbstractCacheSynchronizer.java:63-79``). For a MERGE engine the
    upsert payload is the AFTER image; key-changing updates are handled
    by :func:`split_key_changing_updates`."""
    return F.when(F.col(op_col) == "D", F.col("before")).otherwise(F.col("after"))


def split_key_changing_updates(events: DataFrame, key_cols: Iterable[str]) -> DataFrame:
    """Rewrite updates whose before/after key differ into D(before) +
    I(after) pairs — preserving the reference's before-image-keyed update
    subtlety (``AbstractCacheSynchronizer.java:67-74``) under MERGE
    semantics. Key-stable updates (the common case) pass through
    untouched; the rewrite is a flatMap-shaped select + explode with no
    shuffle."""
    keys = list(key_cols)
    key_changed = (
        (F.col("op") == "U")
        & F.col("before").isNotNull()
        & ~F.struct(*[F.col(f"before.{k}") for k in keys]).eqNullSafe(
            F.struct(*[F.col(f"after.{k}") for k in keys])
        )
    )
    stable = events.where(~F.coalesce(key_changed, F.lit(False)))
    changed = events.where(F.coalesce(key_changed, F.lit(False)))
    # D keeps the same offset; the synthetic I gets the same ordinal so
    # LWW ordering between the pair and other events is unaffected.
    as_delete = changed.withColumn("op", F.lit("D")).withColumn("after", F.lit(None).cast(changed.schema["after"].dataType))
    as_insert = changed.withColumn("op", F.lit("I")).withColumn("before", F.lit(None).cast(changed.schema["before"].dataType))
    return stable.unionByName(as_delete).unionByName(as_insert)


def normalize(
    events: DataFrame,
    tracked_tables: Iterable[str] = ("rook.repos",),
    ignored_server_ids: Iterable[int] = (),
    key_cols: Iterable[str] = ("repo", "path"),
) -> DataFrame:
    """Full normalize pipeline: P1 → P2/P6 → op demux sanity (S2) →
    key-changing-update split → flatten key + payload columns.

    Output schema: key cols + payload cols (from the affected image,
    after-image for I/U, before-image for D) + op + commit_ordinal +
    offset + source_partition + tx_id.
    """
    keys = list(key_cols)
    ev = filter_ignored_servers(events, ignored_server_ids)
    ev = filter_tracked_tables(ev, tracked_tables)
    ev = ev.where(F.col("op").isin("I", "U", "D"))  # S2 demux-as-filter
    ev = split_key_changing_updates(ev, keys)
    img = affected_image()
    payload_fields = events.schema["after"].dataType.fieldNames()
    flat = ev.select(
        *[img.getField(k).alias(k) for k in keys],
        *[img.getField(c).alias(c) for c in payload_fields if c not in keys],
        F.col("op"),
        F.col("commit_ordinal"),
        F.col("offset"),
        F.col("source_partition"),
        F.col("tx_id"),
    )
    return flat
