"""Cross-table consistent reads: epoch-fence alignment semantics.

The invariant under test is the multi-sink lockstep the reference's
two-phase listener delivery exists for (MySQLReplicationStream.java:
161-179 — no sink acts on a transaction the others may never see):
an aligned read over N demuxed LakeTables serves ONE epoch, even when
a crash between per-table commits left the group torn.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.lake.consistent import (
    consistent_fence,
    consistent_read,
    consistent_versions,
    version_at_fence,
)
from rook_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string"
    )


def _pair(spark, tmp_path):
    a = LakeTable.create(spark, str(tmp_path / "a"), SCHEMA, ["repo", "path"], n_buckets=4)
    b = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, ["repo", "path"], n_buckets=4)
    return {"a": a, "b": b}


def _state(df):
    return {(r["repo"], r["path"]): r["content"] for r in df.collect()}


def test_torn_epoch_aligns_to_common_fence(spark, tmp_path):
    """Crash between table commits: A landed epoch 1, B did not. The
    aligned read time-travels A back — both tables serve epoch 0. After
    re-delivery repairs B, the fence advances and both serve epoch 1."""
    tables = _pair(spark, tmp_path)
    a, b = tables["a"], tables["b"]
    a.merge(_changes(spark, [("r1", "x", "a0", "I")]), 0)
    b.merge(_changes(spark, [("r1", "x", "b0", "I")]), 0)
    # epoch 1 fans out; "crash" after A's commit, before B's
    a.merge(_changes(spark, [("r1", "x", "a1", "U")]), 1)

    assert consistent_fence(tables) == 0
    picks = consistent_versions(tables)
    # A travelled back below its head; B reads its head
    assert picks["a"] < a.published_version()
    assert picks["b"] == b.published_version()
    got = consistent_read(tables)
    assert _state(got["a"]) == {("r1", "x"): "a0"}
    assert _state(got["b"]) == {("r1", "x"): "b0"}

    # re-delivery repairs B: the group converges forward
    b.merge(_changes(spark, [("r1", "x", "b1", "U")]), 1)
    assert consistent_fence(tables) == 1
    got = consistent_read(tables)
    assert _state(got["a"]) == {("r1", "x"): "a1"}
    assert _state(got["b"]) == {("r1", "x"): "b1"}


def test_explicit_batch_id_is_repeatable_read(spark, tmp_path):
    """Passing the fence back re-serves the exact epoch an earlier
    aligned read observed, regardless of writes since."""
    tables = _pair(spark, tmp_path)
    for e in range(3):
        tables["a"].merge(_changes(spark, [("r1", "x", f"a{e}", "U")]), e)
        tables["b"].merge(_changes(spark, [("r1", "x", f"b{e}", "U")]), e)
    fence = consistent_fence(tables)
    picks = consistent_versions(tables, batch_id=1)
    assert fence == 2
    got = consistent_read(tables, batch_id=1)
    assert _state(got["a"]) == {("r1", "x"): "a1"}
    assert _state(got["b"]) == {("r1", "x"): "b1"}
    # identical picks on a second call — the repeatable-read handle
    assert consistent_versions(tables, batch_id=1) == picks


def test_never_applied_table_fences_at_initial_version(spark, tmp_path):
    """A table with no batches yet pins the fence at -1: the aligned
    read is every table's empty v0 — no common epoch exists."""
    tables = _pair(spark, tmp_path)
    tables["a"].merge(_changes(spark, [("r1", "x", "a0", "I")]), 0)
    assert consistent_fence(tables) == -1
    got = consistent_read(tables)
    assert got["a"].count() == 0
    assert got["b"].count() == 0


def test_maintenance_commit_lands_on_newest_rewrite(spark, tmp_path):
    """compact() inherits its parent's batch id, so the fence walk
    picks the compacted (cheapest-to-read) version, not the pre-compact
    original of the same epoch."""
    tables = _pair(spark, tmp_path)
    a = tables["a"]
    a.merge(_changes(spark, [("r1", "x", "a0", "I")]), 0)
    a.merge(_changes(spark, [("r2", "y", "a0", "I")]), 1)
    a.compact()
    head = a.published_version()
    assert a.snapshot(head).batch_id == 1  # inherited, not advanced
    assert version_at_fence(a, 1) == head
    assert _state(a.read(version=version_at_fence(a, 1))) == {
        ("r1", "x"): "a0",
        ("r2", "y"): "a0",
    }


def test_rollback_lowers_the_group_fence(spark, tmp_path):
    """Rolling one table back to epoch 0 reverts its batch fence, so
    the GROUP fence drops and the aligned read travels the healthy
    table back too: the rolled-back epochs un-happened for everyone."""
    tables = _pair(spark, tmp_path)
    a, b = tables["a"], tables["b"]
    a.merge(_changes(spark, [("r1", "x", "a0", "I")]), 0)
    b.merge(_changes(spark, [("r1", "x", "b0", "I")]), 0)
    v_good = a.published_version()
    a.merge(_changes(spark, [("r1", "x", "BAD", "U")]), 1)
    b.merge(_changes(spark, [("r1", "x", "b1", "U")]), 1)
    a.rollback(v_good)
    assert consistent_fence(tables) == 0
    got = consistent_read(tables)
    assert _state(got["a"]) == {("r1", "x"): "a0"}
    assert _state(got["b"]) == {("r1", "x"): "b0"}


def test_wap_staging_contributes_published_ref(spark, tmp_path):
    """A staging table's unaudited head is invisible to the group: the
    fence reads the published ref, so consumers' consistency domain is
    audited state only — and publish() advances the group atomically."""
    tables = _pair(spark, tmp_path)
    a, b = tables["a"], tables["b"]
    a.merge(_changes(spark, [("r1", "x", "a0", "I")]), 0)
    b.merge(_changes(spark, [("r1", "x", "b0", "I")]), 0)
    a.begin_staging()
    a.merge(_changes(spark, [("r1", "x", "a1-unaudited", "U")]), 1)
    b.merge(_changes(spark, [("r1", "x", "b1", "U")]), 1)
    assert consistent_fence(tables) == 0
    got = consistent_read(tables)
    assert _state(got["a"]) == {("r1", "x"): "a0"}
    assert _state(got["b"]) == {("r1", "x"): "b0"}
    a.publish()
    assert consistent_fence(tables) == 1
    assert _state(consistent_read(tables)["a"]) == {("r1", "x"): "a1-unaudited"}


def test_vacuumed_fence_refuses_loudly(spark, tmp_path):
    """When the walk hits a vacuumed gap before a qualifying version,
    the aligned read raises instead of silently serving older state."""
    tables = _pair(spark, tmp_path)
    a = tables["a"]
    for e in range(5):
        a.merge(_changes(spark, [("r1", "x", f"a{e}", "U")]), e)
    a.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="vacuum"):
        version_at_fence(a, 0)


def test_engine_consistent_read_e2e(spark, tmp_path):
    """MultiTableCdcEngine wiring: after a full replay the fence is the
    last epoch and the aligned reads equal the per-table head reads;
    reading back at epoch 0 serves epoch 0 on every table."""
    from rook_spark.cdc.engine import MultiTableCdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 1200, seed=77, decoy_frac=0.3)
    tables = ("rook.repos", "rook.decoy_table")
    mte = MultiTableCdcEngine(
        spark, str(tmp_path / "lake"), tables, n_buckets=4
    ).ignoring_servers(99)
    mte.replay(ev.where(F.col("offset") < 600), 0)
    mte.replay(ev.where(F.col("offset") >= 600), 1)

    vers = mte.consistent_versions()
    assert set(vers) == set(tables)
    got = mte.consistent_read()
    for t in tables:
        head = {tuple(r) for r in mte.target(t).read().collect()}
        assert {tuple(r) for r in got[t].collect()} == head, t

    early = mte.consistent_read(batch_id=0)
    for t in tables:
        want = {tuple(r) for r in mte.target(t).read(
            version=mte.consistent_versions(batch_id=0)[t]).collect()}
        assert {tuple(r) for r in early[t].collect()} == want, t
        # epoch-0 state differs from head (the second epoch changed rows)
    assert any(
        {tuple(r) for r in early[t].collect()}
        != {tuple(r) for r in got[t].collect()}
        for t in tables
    )
