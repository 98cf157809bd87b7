"""Consistent multi-table snapshot reads — cross-table epoch alignment.

The reference's whole purpose is keeping MULTIPLE sinks in lockstep
with one source: the binlog fan-out drives a cache synchronizer AND a
full-text-index synchronizer from the same event stream (rook
readme.md:29-66; the two-phase listener delivery at
``MySQLReplicationStream.java:161-179`` exists so no sink acts on a
transaction the others may never see). In rook the sinks share one
process, so a crash leaves them equally behind. In this engine each
demuxed table is a :class:`~rook_spark.lake.table.LakeTable` whose
commits are per-table atomic: one epoch fans out as N independent
MERGEs (``MultiTableCdcEngine``), so a crash BETWEEN two tables'
commits leaves table A fenced at epoch ``B`` and table B at ``B-1``.
Re-delivery repairs each table exactly-once — but until it arrives,
a cross-table reader (the JOIN over two replicated tables, the
"cache + index agree" invariant) sees a TORN epoch.

This module restores the invariant read-side, with zero write-path
cost: every snapshot already records the epoch ``batch_id`` it
committed, so the greatest common fence across the tables picks, per
table, the newest retained version at-or-before the fence — a
coordinated time travel. Tables that ran ahead travel back; tables at
the fence read their head. The result set is exactly "the lake as of
epoch ``fence``", the multi-table analog of reading one table's
snapshot (and the read-side dual of the per-table exactly-once
watermark: writes converge forward, reads align backward).

Contract: the tables must share ONE epoch sequence — demuxed targets
of a single ``MultiTableCdcEngine`` (one stream checkpoint / one
replay driver), or any set of tables whose writers pass the same
``batch_id`` per epoch. Batch ids from unrelated engines (or from a
fresh stream checkpoint, which restarts at 0 — see the ``run_id``
fence on :meth:`LakeTable.merge`) are different number lines; aligning
on them is meaningless and NOT detected here.

Write-audit-publish composes: a staging table contributes (and is
read at) its PUBLISHED ref, never the unaudited head — consumers'
consistency domain is audited state.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame

from rook_spark.lake.table import LakeTable

__all__ = [
    "consistent_fence",
    "version_at_fence",
    "consistent_versions",
    "consistent_read",
]


def consistent_fence(tables: Mapping[str, LakeTable]) -> int:
    """The greatest epoch every table has durably committed: the min
    over the tables' published-head batch ids. ``-1`` (the pre-any-epoch
    sentinel) when some table has never applied a batch — the aligned
    read is then every table's empty initial version, which is honest:
    no common epoch exists yet."""
    if not tables:
        raise ValueError("consistent_fence needs at least one table")
    return min(
        t.snapshot(t.published_version()).batch_id for t in tables.values()
    )


def version_at_fence(table: LakeTable, fence: int) -> int:
    """The newest retained version whose ``batch_id`` <= ``fence``,
    walking the snapshot chain down from the published head.

    Maintenance commits (compact / cluster / tag / staging markers)
    inherit their parent's batch id, so the walk lands on the newest
    state-identical rewrite of the fenced epoch — the cheapest version
    to read. Predicate-erasure commits (``delete_where``, either mode)
    ALSO inherit the fence while changing state — deliberate: retention
    erasure is out-of-band of the epoch stream and must not be
    escapable by fence alignment, so an aligned read serves "epoch B,
    with all erasures to date applied". Rollback commits REVERT the
    batch id, so a rolled-back table naturally lowers the fence for
    the whole group (those epochs officially un-happened; the group
    must not serve them).

    Walk cost is O(versions past the fence) metadata loads — i.e. the
    cross-table commit skew (normally a handful of epochs), never the
    chain length.

    Raises ``ValueError`` when the walk hits a vacuumed gap before
    finding a qualifying version: the fenced state is no longer
    retained, and silently serving an older tagged survivor would be a
    wrong answer dressed as a right one. Retention for consistent
    readers = ``vacuum(keep_last=...)`` sized to the maximum cross-table
    commit skew (a handful of epochs), or a tag on the fence version.
    """
    v = table.published_version()
    while v >= 0:
        try:
            snap = table.snapshot(v)
        except FileNotFoundError:
            raise ValueError(
                f"no retained version at-or-before batch fence {fence}: "
                f"version {v} was vacuumed before the walk found a "
                f"qualifying snapshot — increase vacuum keep_last (size "
                f"it to the cross-table commit skew) or tag fence versions"
            ) from None
        if snap.batch_id <= fence:
            return v
        v = snap.parent if snap.parent is not None else v - 1
    raise ValueError(
        f"no version at-or-before batch fence {fence} exists "
        f"(initial version carries batch_id=-1, so this means an "
        f"empty/corrupt chain)"
    )


def consistent_versions(
    tables: Mapping[str, LakeTable], batch_id: int | None = None
) -> dict[str, int]:
    """Per-table version picks for a coordinated read: each table's
    newest retained version at-or-before the common fence (or an
    explicit ``batch_id`` — e.g. re-reading the exact epoch an earlier
    aligned read served, the repeatable-read handle)."""
    fence = consistent_fence(tables) if batch_id is None else batch_id
    return {name: version_at_fence(t, fence) for name, t in tables.items()}


def consistent_read(
    tables: Mapping[str, LakeTable], batch_id: int | None = None
) -> dict[str, DataFrame]:
    """Coordinated time travel: one DataFrame per table, every one the
    state of the SAME epoch fence (see module docstring). Plans are
    plain versioned reads — all pruning axes (buckets / stats / blooms)
    remain available via each table's :meth:`LakeTable.read` if the
    caller needs a narrower scan at the picked version."""
    picks = consistent_versions(tables, batch_id=batch_id)
    return {name: tables[name].read(version=v) for name, v in picks.items()}
