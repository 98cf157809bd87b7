"""Partial row images (``binlog_row_image=MINIMAL``) — per-column patch
fold + LWW.

The reference assumes FULL row images: every ``UpdateRowsReplicationEvent``
carries the complete before/after ``Serializable[]`` rows
(``rook-api/.../UpdateRowsReplicationEvent.java:27-40``), which is MySQL's
default ``binlog_row_image=FULL``. Production binlogs are often shipped
MINIMAL (before = PK only, after = changed columns only) and Mongo-style
CDC (Debezium ``updateDescription.updatedFields``) is inherently partial —
an update event then tells you WHICH columns changed, not the whole row.

Representation: events carry an ``updated_cols: array<string>`` column —
NULL means "full image" (every after-image column is authoritative,
including its NULLs), an array means "patch" (only the listed columns are
authoritative; the rest of the after image is meaningless filler). An
explicit mask instead of null-means-unchanged because MINIMAL emits NULL
for unchanged columns too — "set to NULL" and "didn't change" are
indistinguishable without one.

Semantics of folding an ordered per-key event sequence:

- ``I`` sets its masked columns (every column for a true source insert —
  NULL mask — to the after image's values, NULLs included) and BREAKS
  inheritance from prior state. Mask-carrying ``I`` rows only arise from
  the key-changing-update split (see :func:`_sets_col`).
- ``U`` sets exactly its masked columns (all, when the mask is NULL).
- ``D`` removes the row and breaks inheritance: a later ``I``/``U``
  starts from an empty row, NOT from pre-delete values.

:func:`patch_reduce` computes the net per-key effect of one batch in ONE
hash aggregation — per column, the latest event that sets it; plus the
latest inheritance break and the latest op. Every aggregate is a plain
``max`` over per-event candidate structs, so Catalyst plans partial
(map-side combine) + final aggregate exactly like :func:`~rook_spark.cdc.
reduce.lww_reduce` — a hot key collapses on every mapper before the
shuffle, and the fold is associative by construction (max of maxes), so
the plan is the same shuffle the full-image LWW pays. No extra salting
variant is needed: unlike a non-combinable UDAF, these maxes always
partial-aggregate.

The output feeds :meth:`rook_spark.lake.table.LakeTable.merge` (COW),
which applies ``__setmask``/``__inherit`` per column against current
state. Patch mode is COW-ONLY by design: a patch is not self-contained,
so MOR delta files holding patches would push the per-column fold into
EVERY read and every downstream delta consumer; completing the patch
against current state is exactly the read-modify-write the COW merge's
touched-bucket join already performs (same reason Iceberg/Delta
``MERGE ... UPDATE SET col = ...`` rewrites files). ``merge_mor``
rejects patch change sets loudly.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: internal columns patch_reduce adds for the merge (stripped from the
#: published table schema by the COW merge)
SETMASK_COL = "__setmask"
INHERIT_COL = "__inherit"
UPDATED_COL = "updated_cols"


def _sets_col(c: str, updated_col: str) -> Column:
    """Does this event set column ``c``? I and U set their mask (NULL
    mask = full image = all columns); D sets none. A true source insert
    always carries a NULL mask (full image by definition); a mask-
    carrying I only exists as the second half of a key-changing-update
    split (normalize.split_key_changing_updates), where the row at its
    NEW key legitimately carries only the event-set columns —
    inheritance never crosses keys."""
    return F.col("op").isin("I", "U") & (
        F.col(updated_col).isNull() | F.array_contains(F.col(updated_col), c)
    )


def patch_reduce(
    df: DataFrame,
    key_cols: Iterable[str] = ("repo", "path"),
    ordinal_col: str = "commit_ordinal",
    offset_col: str = "offset",
    updated_col: str = UPDATED_COL,
) -> DataFrame:
    """Net per-key effect of one batch of (possibly partial) events.

    Input: flattened events — key cols + payload cols + ``op`` +
    ordering cols + ``updated_col`` (see module docstring). Output: one
    row per key shaped for :meth:`LakeTable.merge`:

    - payload columns: the folded value where set, NULL where not;
    - ``op``: ``'D'`` if the key's last event deletes it, else ``'U'``;
    - ordering cols: the key's max (ordinal, offset) — the stored-ordinal
      bookkeeping the cross-batch LWW guard compares against;
    - ``__setmask struct<c: boolean>``: which payload columns the batch
      authoritatively sets;
    - ``__inherit boolean``: whether UNSET columns inherit current stored
      state (true iff the batch contains no I/D for the key — an
      inheritance break means unset columns are NULL, not carried).

    Mask hygiene: a mask naming a column ABSENT from the batch's payload
    has no effect (there is no value to set — ``array_contains`` over a
    nonexistent name never fires), and a column present in the payload
    but never masked is simply never set. Neither is an error: CDC
    sources legitimately ship masks for columns a downstream projection
    dropped. A mask naming a column that exists but arrives NULL sets it
    to NULL (authoritative), which is the whole reason the mask exists.

    Correctness of the single-pass trick: per column the candidate is the
    max (ordinal, offset) event that sets it; a column's value survives
    iff its candidate is at-or-after the latest inheritance break
    (``reset``). An ``I`` at the break is itself a candidate for every
    column, so "at-or-after" keeps exactly its values; a ``U`` after a
    ``D`` patches onto the empty row. All aggregates ignore NULL
    candidates (Spark ``max`` semantics), so non-setting events simply
    don't compete.
    """
    keys = list(key_cols)
    internal = {updated_col, "op", ordinal_col, offset_col}
    payload = [c for c in df.columns if c not in keys and c not in internal]
    ordk = F.struct(F.col(ordinal_col).alias("o"), F.col(offset_col).alias("t"))

    aggs = [
        F.max(
            F.when(
                _sets_col(c, updated_col),
                F.struct(ordk.alias("k"), F.col(c).alias("v")),
            )
        ).alias(f"__c_{c}")
        for c in payload
    ]
    aggs.append(F.max(F.when(F.col("op").isin("I", "D"), ordk)).alias("__reset"))
    aggs.append(F.max(F.struct(ordk.alias("k"), F.col("op").alias("op"))).alias("__last"))
    g = df.groupBy(*keys).agg(*aggs)

    reset = F.col("__reset")
    val_cols, mask_fields = [], []
    for c in payload:
        cand = F.col(f"__c_{c}")
        set_c = cand.isNotNull() & (reset.isNull() | (cand.getField("k") >= reset))
        val_cols.append(F.when(set_c, cand.getField("v")).alias(c))
        mask_fields.append(set_c.alias(c))
    return g.select(
        *keys,
        *val_cols,
        F.when(F.col("__last").getField("op") == "D", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("__last").getField("k").getField("o").alias(ordinal_col),
        F.col("__last").getField("k").getField("t").alias(offset_col),
        F.struct(*mask_fields).alias(SETMASK_COL),
        reset.isNull().alias(INHERIT_COL),
    )
