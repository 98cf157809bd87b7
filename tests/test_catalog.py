"""Atomic multi-table commits (lake/catalog.py): the write-side dual of
consistent.py's read alignment — one POINTERS flip covers every demuxed
table, so a torn epoch is unrepresentable. Reference semantics: rook
mutates ALL entities of a transaction inside ONE Hibernate tx
(``DefaultRowsMutationIndexer.java:44-58``); the two-phase listener
delivery (``MySQLReplicationStream.java:161-179``) exists so no sink
acts on a tx the others may never see."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.engine import CdcEngine, MultiTableCdcEngine
from rook_spark.lake.catalog import InMemoryLakeCatalog, LakeCatalog
from rook_spark.lake.metastore import CommitConflict
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


def _catalogs(tmp_path):
    return [
        ("posix", LakeCatalog(str(tmp_path / "cat"))),
        ("mem", InMemoryLakeCatalog()),
    ]


def test_single_table_lifecycle_through_catalog(spark, tmp_path):
    """Every existing LakeTable operation works unchanged on a catalog
    table: merge, time travel, tags, rollback, compact, vacuum — the
    pointer just lives in the shared map instead of _meta/LATEST."""
    for label, cat in _catalogs(tmp_path):
        cat.init()
        t = LakeTable.create(
            spark, str(tmp_path / f"t_{label}"), SCHEMA, ["repo", "path"],
            n_buckets=4, store=cat.store("t"),
        )
        t.merge(_changes(spark, [("r", "a", "v1", "I")]), 0)
        v1 = t.current_version()
        t.tag("epoch1")
        t.merge(_changes(spark, [("r", "a", "v2", "U"), ("r", "b", "v1", "I")]), 1)
        assert t.read(version=v1).first()["content"] == "v1", label
        assert t.read().count() == 2, label
        assert cat.tables() == ["t"], label
        t.rollback(t.resolve_tag("epoch1"))
        assert t.read().count() == 1, label
        t.compact()
        t.vacuum(keep_last=1, min_age_s=0.0)
        assert t.read().first()["content"] == "v1", label


def test_group_commit_is_atomic_across_tables(spark, tmp_path):
    """THE torn-epoch killer: table A's merge runs and 'commits'
    (staged) inside the group, then table B's apply blows up — NOTHING
    becomes visible, not even A's half. The same failure WITHOUT a
    catalog leaves A torn one epoch ahead (the window consistent_read
    exists to mask). Re-delivery then lands the epoch on both tables."""
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 2500, seed=7).cache()
    tables = ("rook.repos", "rook.meta")
    # meta gets the same stream demuxed (rename the decoy-free events)
    ev2 = ev.withColumn(
        "table_name",
        F.when(F.col("table_name") == "repos", "meta").otherwise(F.col("table_name")),
    )
    both = ev.unionByName(ev2)

    def boom(*a, **k):
        raise RuntimeError("injected failure on the second table")

    # --- torn baseline: per-table commits ---
    torn = MultiTableCdcEngine(
        spark, str(tmp_path / "torn"), tables, n_buckets=4
    ).ignoring_servers(99)
    torn.replay(both.where("offset < 1200"))
    torn.engines["rook.meta"].replay = boom
    with pytest.raises(RuntimeError, match="injected"):
        torn.replay(both.where("offset >= 1200"))
    a, b = torn.target("rook.repos"), torn.target("rook.meta")
    assert a.last_committed_batch() == b.last_committed_batch() + 1  # TORN

    # --- catalog: one atomic flip, failure discards everything ---
    cat = LakeCatalog(str(tmp_path / "cat"))
    cat.init()
    eng = MultiTableCdcEngine(
        spark, str(tmp_path / "at"), tables, catalog=cat, n_buckets=4
    ).ignoring_servers(99)
    eng.replay(both.where("offset < 1200"))
    va = eng.target("rook.repos").current_version()
    rows_a = eng.target("rook.repos").read().count()
    orig = eng.engines["rook.meta"].replay
    eng.engines["rook.meta"].replay = boom
    with pytest.raises(RuntimeError, match="injected"):
        eng.replay(both.where("offset >= 1200"))
    # A's commit was staged then discarded: pointer AND state unmoved
    assert eng.target("rook.repos").current_version() == va
    assert eng.target("rook.repos").read().count() == rows_a
    assert not cat.in_group()  # the aborted group closed
    # re-delivery applies the epoch to BOTH tables exactly-once
    eng.engines["rook.meta"].replay = orig
    eng.replay(both.where("offset >= 1200"))
    got_a = sorted(map(tuple, eng.target("rook.repos").read().collect()))
    got_b = sorted(map(tuple, eng.target("rook.meta").read().collect()))
    # oracle: the never-failing engine pair
    clean = MultiTableCdcEngine(
        spark, str(tmp_path / "clean"), tables, n_buckets=4
    ).ignoring_servers(99)
    clean.replay(both.where("offset < 1200"))
    clean.replay(both.where("offset >= 1200"))
    assert got_a == sorted(map(tuple, clean.target("rook.repos").read().collect()))
    assert got_b == sorted(map(tuple, clean.target("rook.meta").read().collect()))
    assert eng.target("rook.repos").last_committed_batch() == \
        eng.target("rook.meta").last_committed_batch()
    ev.unpersist()


def test_group_conflict_publishes_nothing(spark, tmp_path):
    """Two drivers race a group onto the same catalog: exactly one wins;
    the loser's CommitConflict leaves zero partial state (no pointer
    entry moved, for ANY of its tables)."""
    root = str(tmp_path / "cat")
    cat1, cat2 = LakeCatalog(root), LakeCatalog(root)
    cat1.init()
    t1 = LakeTable.create(
        spark, str(tmp_path / "x"), SCHEMA, ["repo", "path"],
        n_buckets=2, store=cat1.store("x"),
    )
    t1.merge(_changes(spark, [("r", "a", "v1", "I")]), 0)
    # driver 2 opens the SAME table (and a second one) via its own catalog
    t2 = LakeTable.load(spark, str(tmp_path / "x"), store=cat2.store("x"))
    y2 = LakeTable.create(
        spark, str(tmp_path / "y"), SCHEMA, ["repo", "path"],
        n_buckets=2, store=cat2.store("y"),
    )
    before_y = y2.current_version()
    with pytest.raises(CommitConflict):
        with cat2.group():
            y2.merge(_changes(spark, [("q", "q", "q1", "I")]), 0)
            t2.merge(_changes(spark, [("r", "a", "LOSER", "U")]), 1)
            # winner slips in between driver 2's reads and its flip
            t1.merge(_changes(spark, [("r", "a", "WINNER", "U")]), 1)
    assert t1.read().first()["content"] == "WINNER"
    # the loser's whole group vanished — including the y table's epoch
    assert LakeTable.load(spark, str(tmp_path / "y"),
                          store=LakeCatalog(root).store("y")).current_version() == before_y
    assert LakeCatalog(root)._read_map()["x"] == t1.current_version()


def test_crash_between_payloads_and_flip_is_invisible(spark, tmp_path):
    """Kill the group at the exact worst instant — payload files
    durable, POINTERS not yet replaced: a fresh catalog (the restarted
    driver) sees the old epoch on every table, and re-delivery wins."""
    root = str(tmp_path / "cat")
    cat = LakeCatalog(root)
    cat.init()
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"],
        n_buckets=2, store=cat.store("t"),
    )
    t.merge(_changes(spark, [("r", "a", "v1", "I")]), 0)
    v_before = t.current_version()

    real_apply = cat._apply_map

    def crash(m):
        raise OSError("simulated power loss before the pointer flip")

    cat._apply_map = crash
    with pytest.raises(OSError, match="power loss"):
        with cat.group():
            t.merge(_changes(spark, [("r", "a", "v2", "U")]), 1)
    cat._apply_map = real_apply
    # restart: fresh catalog + table objects see the OLD state
    t2 = LakeTable.load(spark, str(tmp_path / "t"),
                        store=LakeCatalog(root).store("t"))
    assert t2.current_version() == v_before
    assert t2.read().first()["content"] == "v1"
    # the orphan payload file exists but was never visible; the next
    # winner of that version safely overwrites it
    t2.merge(_changes(spark, [("r", "a", "v2-retry", "U")]), 1)
    assert t2.read().first()["content"] == "v2-retry"


def test_wap_and_compact_chain_inside_group(spark, tmp_path):
    """Read-your-own-staged-writes: a WAP epoch is THREE metadata
    commits (begin_staging, merge, publish) plus a compaction — all
    chain through the staged head and publish as ONE flip."""
    for label, cat in _catalogs(tmp_path):
        cat.init()
        t = LakeTable.create(
            spark, str(tmp_path / f"w_{label}"), SCHEMA, ["repo", "path"],
            n_buckets=2, store=cat.store("w"),
        )
        t.merge(_changes(spark, [("r", "a", "v1", "I")]), 0)
        outside = LakeTable(spark, str(tmp_path / f"w_{label}"),
                            store=(LakeCatalog(cat.root).store("w")
                                   if label == "posix" else None))
        v_pub = t.current_version()
        with cat.group():
            t.begin_staging()
            t.merge(_changes(spark, [("r", "b", "v1", "I")]), 1)
            t.publish()
            t.compact(max_files_per_bucket=1)
            # in-group reads see the staged chain...
            assert t.read().count() == 2, label
            # ...external readers (posix only — a second process) don't
            if label == "posix":
                assert outside.current_version() == v_pub, label
        assert t.read().count() == 2, label
        if label == "posix":
            assert outside.read().count() == 2, label


def test_vacuum_refused_inside_group_allowed_outside(spark, tmp_path):
    for label, cat in _catalogs(tmp_path):
        cat.init()
        t = LakeTable.create(
            spark, str(tmp_path / f"v_{label}"), SCHEMA, ["repo", "path"],
            n_buckets=2, store=cat.store("v"),
        )
        t.merge(_changes(spark, [("r", "a", "v1", "I")]), 0)
        t.merge(_changes(spark, [("r", "a", "v2", "U")]), 1)
        t.merge(_changes(spark, [("r", "a", "v3", "U")]), 2)
        with pytest.raises(RuntimeError, match="outside the group"):
            with cat.group():
                t.merge(_changes(spark, [("r", "a", "v4", "U")]), 3)
                t.vacuum(keep_last=1, min_age_s=0.0)
        # the failed group discarded the merge too — all-or-nothing
        assert t.read().first()["content"] == "v3", label
        t.vacuum(keep_last=1, min_age_s=0.0)  # fine between epochs
        assert t.read().first()["content"] == "v3", label


def test_streaming_fanout_commits_atomically(spark, tmp_path):
    """The deployment shape: one file-tail checkpoint fanning out to two
    catalog tables — after the stream drains, both tables sit at the
    same epoch and match the per-table-commit engine's state."""
    from rook_spark.cdc.fixtures import generate_events, write_events

    ev = generate_events(spark, 2000, seed=11)
    both = ev.unionByName(
        ev.withColumn(
            "table_name",
            F.when(F.col("table_name") == "repos", "meta")
            .otherwise(F.col("table_name")),
        )
    )
    log = str(tmp_path / "log")
    write_events(both, log, n_files=3)
    cat = LakeCatalog(str(tmp_path / "cat"))
    cat.init()
    eng = MultiTableCdcEngine(
        spark, str(tmp_path / "s"), ("rook.repos", "rook.meta"),
        catalog=cat, n_buckets=4,
    ).ignoring_servers(99)
    q = eng.stream(log, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    a, b = eng.target("rook.repos"), eng.target("rook.meta")
    assert a.last_committed_batch() == b.last_committed_batch() >= 0
    ref = CdcEngine(spark, str(tmp_path / "ref"), n_buckets=4).ignoring_servers(99)
    ref.replay(ev)
    assert sorted(map(tuple, a.read().collect())) == \
        sorted(map(tuple, ref.target().read().collect()))
    assert sorted(map(tuple, b.read().collect())) == \
        sorted(map(tuple, ref.target().read().collect()))


# ------------------------------------------------ atomicity property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


class _Boom(Exception):
    pass


_EPOCH = st.tuples(
    st.lists(
        st.tuples(st.integers(0, 7), st.one_of(st.none(), st.integers(0, 99))),
        min_size=1, max_size=4, unique_by=lambda kv: kv[0],
    ),
    st.sampled_from(["ok", "fail_before_any", "fail_after_first", "redeliver"]),
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(epochs=st.lists(_EPOCH, min_size=1, max_size=6))
def test_catalog_group_atomicity_property(spark, tmp_path_factory, epochs):
    """Any sequence of two-table epochs with failures injected at any
    point inside the group (before either table, or between the two —
    the torn instant) followed by clean re-delivery matches a dict
    model on BOTH tables, with the tables' batch fences aligned after
    every epoch; re-delivering an already-committed epoch is a no-op
    (the batch fence rides the group)."""
    tmp = tmp_path_factory.mktemp("cat_prop")
    cat = LakeCatalog(str(tmp / "cat"))
    cat.init()
    ta = LakeTable.create(spark, str(tmp / "a"), SCHEMA, ["repo", "path"],
                          n_buckets=2, store=cat.store("a"))
    tb = LakeTable.create(spark, str(tmp / "b"), SCHEMA, ["repo", "path"],
                          n_buckets=2, store=cat.store("b"))
    model: dict[str, str] = {}

    def state(t: LakeTable) -> dict[str, str]:
        return {r["path"]: r["content"] for r in t.read().collect()}

    for bid, (rows, mode) in enumerate(epochs):
        df = _changes(spark, [
            ("r", f"p{k}", f"v{bid}_{k}" if v is not None else None,
             "U" if v is not None else "D")
            for k, v in rows
        ])
        if mode in ("fail_before_any", "fail_after_first"):
            with pytest.raises(_Boom):
                with cat.group():
                    if mode == "fail_before_any":
                        raise _Boom()
                    ta.merge(df, bid)
                    raise _Boom()
            # the aborted group published NOTHING anywhere
            assert state(ta) == model and state(tb) == model
        # (re-)deliver the epoch cleanly — exactly-once
        with cat.group():
            ta.merge(df, bid)
            tb.merge(df, bid)
        if mode == "redeliver":  # duplicate of a COMMITTED epoch: no-op
            with cat.group():
                ta.merge(df, bid)
                tb.merge(df, bid)
        for k, v in rows:
            if v is None:
                model.pop(f"p{k}", None)
            else:
                model[f"p{k}"] = f"v{bid}_{k}"
        assert state(ta) == model and state(tb) == model, (bid, mode)
        assert ta.last_committed_batch() == tb.last_committed_batch() == bid


def test_vacuum_cadence_defers_past_the_group(spark, tmp_path):
    """vacuum_every composes with an atomic catalog: the cadence vacuum
    that comes due INSIDE a group (where the store refuses physical
    deletes — an abort could not un-delete bytes) is deferred and
    drained by run_due_vacuum() right after the flip, so retention
    stays bounded without failing epochs. The final state matches a
    catalog-free engine running the same cadence."""
    from rook_spark.cdc.fixtures import generate_events, write_events

    log = str(tmp_path / "log")
    write_events(generate_events(spark, 2500, seed=41), log, n_files=3)
    events = spark.read.parquet(log)
    tables = ("rook.repos",)
    cat = LakeCatalog(str(tmp_path / "cat"))
    cat.init()
    eng = MultiTableCdcEngine(
        spark, str(tmp_path / "at"), tables, catalog=cat, n_buckets=4,
        vacuum_every=1, vacuum_keep_last=2, vacuum_min_age_s=0,
    ).ignoring_servers(99)
    cuts = [(0, 800), (800, 1600), (1600, 2500)]
    for i, (lo, hi) in enumerate(cuts):
        eng.replay(events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
        # the deferred vacuum already drained — the flag is clear and a
        # manual drain is an idempotent no-op
        assert not eng.engines["rook.repos"].run_due_vacuum()
    t = eng.target("rook.repos")
    # retention is bounded (keep_last window, not one version per epoch)
    assert len(t._store.versions()) <= 2
    # oracle: same cadence, no catalog
    plain = CdcEngine(
        spark, str(tmp_path / "plain"), n_buckets=4,
        vacuum_every=1, vacuum_keep_last=2, vacuum_min_age_s=0,
    ).ignoring_servers(99).tracking("rook.repos")
    for i, (lo, hi) in enumerate(cuts):
        plain.replay(events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    got = sorted(map(tuple, t.read().collect()))
    assert got == sorted(map(tuple, plain.target().read().collect()))


def test_deferred_vacuum_survives_a_group_abort(spark, tmp_path):
    """The deferral flag set inside a group that later ABORTS is not
    lost (the drain loop never runs on the failing epoch) and not
    spuriously executed either — it drains after the next SUCCESSFUL
    group, where vacuum is safe because it only reclaims expired
    versions of durable state."""
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 2000, seed=43).cache()
    tables = ("rook.repos", "rook.meta")
    ev2 = ev.withColumn(
        "table_name",
        F.when(F.col("table_name") == "repos", "meta").otherwise(F.col("table_name")),
    )
    both = ev.unionByName(ev2)
    cat = LakeCatalog(str(tmp_path / "cat"))
    cat.init()
    eng = MultiTableCdcEngine(
        spark, str(tmp_path / "at"), tables, catalog=cat, n_buckets=4,
        vacuum_every=1, vacuum_keep_last=2, vacuum_min_age_s=0,
    ).ignoring_servers(99)
    eng.replay(both.where("offset < 1000"))
    a = eng.engines["rook.repos"]
    assert not a._vacuum_due  # epoch 0's deferral drained

    def boom(*args, **kwargs):
        raise RuntimeError("injected failure on the second table")

    orig = eng.engines["rook.meta"].replay
    eng.engines["rook.meta"].replay = boom
    with pytest.raises(RuntimeError, match="injected"):
        eng.replay(both.where("offset >= 1000"))
    # A's apply ran inside the aborted group: its cadence vacuum came
    # due, was deferred, and the abort skipped the drain — flag survives
    assert a._vacuum_due
    eng.engines["rook.meta"].replay = orig
    eng.replay(both.where("offset >= 1000"))  # clean re-delivery drains
    assert not a._vacuum_due
    for t in tables:
        assert len(eng.target(t)._store.versions()) <= 2, t
    # state parity with a catalog-free cadence engine on the same stream
    plain = MultiTableCdcEngine(
        spark, str(tmp_path / "plain"), tables, n_buckets=4,
        vacuum_every=1, vacuum_keep_last=2, vacuum_min_age_s=0,
    ).ignoring_servers(99)
    plain.replay(both.where("offset < 1000"))
    plain.replay(both.where("offset >= 1000"))
    for t in tables:
        got = sorted(map(tuple, eng.target(t).read().collect()))
        assert got == sorted(map(tuple, plain.target(t).read().collect())), t
    ev.unpersist()
