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
    key_changed = F.coalesce(
        (F.col("op") == "U")
        & F.col("before").isNotNull()
        & ~F.struct(*[F.col(f"before.{k}") for k in keys]).eqNullSafe(
            F.struct(*[F.col(f"after.{k}") for k in keys])
        ),
        F.lit(False),
    )
    # SINGLE-PASS rewrite (a union of filtered branches would scan the
    # batch 3×): each row becomes an array of 1 event (common case) or 2
    # (D@before-key + I@after-key, same ordinal so LWW ordering against
    # other events is unaffected), then one explode.
    other_cols = [c for c in events.columns if c not in ("op", "before", "after")]
    ev_struct = F.struct(F.col("op"), F.col("before"), F.col("after"))
    null_after = F.lit(None).cast(events.schema["after"].dataType)
    null_before = F.lit(None).cast(events.schema["before"].dataType)
    as_delete = F.struct(F.lit("D").alias("op"), F.col("before").alias("before"), null_after.alias("after"))
    as_insert = F.struct(F.lit("I").alias("op"), null_before.alias("before"), F.col("after").alias("after"))
    arr = F.when(key_changed, F.array(as_delete, as_insert)).otherwise(F.array(ev_struct))
    return events.select(*other_cols, F.explode(arr).alias("__e")).select(
        *other_cols,
        F.col("__e.op").alias("op"),
        F.col("__e.before").alias("before"),
        F.col("__e.after").alias("after"),
    )


def filter_events(
    events: DataFrame,
    tracked_tables: Iterable[str] = ("rook.repos",),
    ignored_server_ids: Iterable[int] = (),
) -> DataFrame:
    """P1 → P2/P6 → S2 demux-as-filter: the cheap narrow filters, all
    pushed into the scan."""
    ev = filter_ignored_servers(events, ignored_server_ids)
    ev = filter_tracked_tables(ev, tracked_tables)
    return ev.where(F.col("op").isin("I", "U", "D"))


def flatten_events(ev: DataFrame, key_cols: Iterable[str] = ("repo", "path")) -> DataFrame:
    """Key-changing-update split + flatten to key + payload columns
    (after-image for I/U, before-image for D)."""
    keys = list(key_cols)
    ev = split_key_changing_updates(ev, keys)
    img = affected_image()
    payload_fields = ev.schema["after"].dataType.fieldNames()
    return ev.select(
        *[img.getField(k).alias(k) for k in keys],
        *[img.getField(c).alias(c) for c in payload_fields if c not in keys],
        F.col("op"),
        F.col("commit_ordinal"),
        F.col("offset"),
        F.col("source_partition"),
        F.col("tx_id"),
        # partial-row-image mask (cdc/patch.py) rides through when the
        # source carries it; absent for full-image streams
        *([F.col("updated_cols")] if "updated_cols" in ev.columns else []),
    )


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
    return flatten_events(
        filter_events(events, tracked_tables, ignored_server_ids), key_cols
    )
