"""LakeTable unit semantics: MERGE matrix, atomicity, time travel,
bucket pruning, cardinality contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=8)


def test_merge_matrix(spark, table):
    """The canonical CDC MERGE truth table (K5):
    not-matched+I→insert, matched+U→update, matched+D→delete,
    not-matched+D→no-op, not-matched+U→insert (upsert)."""
    table.merge(_changes(spark, [("r1", "a", "v1", "I"), ("r1", "b", "v1", "I")]), 0)
    table.merge(
        _changes(
            spark,
            [
                ("r1", "a", "v2", "U"),   # matched update
                ("r1", "b", None, "D"),   # matched delete
                ("r1", "c", "v1", "U"),   # unmatched upsert -> insert
                ("r1", "z", None, "D"),   # unmatched delete -> no-op
            ],
        ),
        1,
    )
    state = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    assert state == {("r1", "a"): "v2", ("r1", "c"): "v1"}


def test_time_travel_and_atomicity(spark, table):
    table.merge(_changes(spark, [("r1", "a", "v1", "I")]), 0)
    v1 = table.current_version()
    table.merge(_changes(spark, [("r1", "a", "v2", "U")]), 1)
    assert table.read(version=v1).first()["content"] == "v1"
    assert table.read().first()["content"] == "v2"


def test_crash_before_pointer_flip_is_invisible(spark, table, tmp_path):
    """Simulate a crash after data files are written but before the
    LATEST pointer flips: readers still see the old snapshot (the
    rollback half of K6, ``DefaultRowsMutationIndexer.java:52-55``)."""
    table.merge(_changes(spark, [("r1", "a", "v1", "I")]), 0)
    v = table.current_version()
    # orphan data: write files the snapshot never references
    junk = _changes(spark, [("r9", "q", "junk", "I")]).drop("op")
    junk.write.parquet(os.path.join(table.path, "data", "orphan"))
    assert table.current_version() == v
    assert table.read().where("repo = 'r9'").count() == 0


def test_bucket_pruning_reads_only_touched_files(spark, table):
    """File-level pruning: reading one bucket lists only that bucket's
    files (the mechanism that bounds MERGE I/O at 100 TB)."""
    rows = [(f"r{i}", f"p{i}", "v", "I") for i in range(50)]
    table.merge(_changes(spark, rows), 0)
    snap = table.snapshot()
    assert len(snap.buckets) > 1
    some_bucket = int(next(iter(snap.buckets)))
    pruned = table.read(buckets=[some_bucket])
    full = table.read()
    assert 0 < pruned.count() < full.count()
    # the pruned scan's file list really is a subset
    pruned_files = {f for f in pruned.inputFiles()}
    full_files = {f for f in full.inputFiles()}
    assert pruned_files < full_files


def test_merge_cardinality_guard(spark, table):
    with pytest.raises(ValueError, match="LWW"):
        table.merge(
            _changes(spark, [("r", "p", "x1", "U"), ("r", "p", "x2", "U")]), 0
        )


def test_untouched_buckets_files_carried_forward(spark, table):
    """COW: a merge touching one key must not rewrite other buckets'
    files (scan-amplification guard at scale)."""
    rows = [(f"r{i}", f"p{i}", "v", "I") for i in range(50)]
    table.merge(_changes(spark, rows), 0)
    before = dict(table.snapshot().buckets)
    table.merge(_changes(spark, [("r0", "p0", "v2", "U")]), 1)
    after = dict(table.snapshot().buckets)
    changed = [b for b in before if before[b] != after.get(b)]
    unchanged = [b for b in before if before[b] == after.get(b)]
    assert len(changed) == 1 and len(unchanged) == len(before) - 1


def test_overwrite_and_lineage_defaults(spark, table):
    df = spark.createDataFrame([("r", "p", "v")], SCHEMA)
    table.overwrite(df)
    assert table.read().count() == 1
    assert table.lineage().count() == 0


def test_changelog_read_reproduces_target_version(spark, tmp_path):
    """changes(v_from, v_to) over an engine-written table is a valid LWW
    change set: applying it to the v_from state reproduces v_to exactly,
    deletes included; net-effect semantics collapse intermediate flips;
    same-version diff is empty."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 3000, seed=83)
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    engine.replay(ev.where(F.col("offset") < 1000), 0)
    v_from = engine.target().snapshot().version
    engine.replay(ev.where((F.col("offset") >= 1000) & (F.col("offset") < 2000)), 1)
    engine.replay(ev.where(F.col("offset") >= 2000), 2)
    table = engine.target()
    v_to = table.snapshot().version

    log = table.changes(v_from, v_to)
    assert set(log.select("op").distinct().toPandas()["op"]) == {"U", "D"}

    # apply the log to the v_from state -> must equal the v_to state
    old = table.read(version=v_from)
    ups = log.where(F.col("op") == "U").select(*old.columns)
    keys = log.select("repo", "path")
    expected = old.join(keys, ["repo", "path"], "left_anti").unionByName(ups)
    got = expected.orderBy("repo", "path").toPandas()
    want = table.read(version=v_to).orderBy("repo", "path").toPandas()
    assert got["content"].tolist() == want["content"].tolist()
    assert len(got) == len(want)

    # unchanged keys never appear in the log (net diff, not a dump):
    # strictly fewer log rows than table rows
    assert log.count() < table.read(version=v_to).count()

    # net-effect: keys whose final state within the window is identical
    # to their v_from state are absent; same-version diff is empty
    assert table.changes(v_to, v_to).count() == 0

    # ---- images='pair' (Delta CDF shape) over the same window --------
    pairs = table.changes(v_from, v_to, images="pair")
    ops = set(pairs.select("op").distinct().toPandas()["op"])
    assert ops <= {"insert", "delete", "update_preimage", "update_postimage"}
    pd_pairs = pairs.toPandas()
    pre = pd_pairs[pd_pairs["op"] == "update_preimage"]
    post = pd_pairs[pd_pairs["op"] == "update_postimage"]
    # every updated key has exactly one pre and one post
    assert sorted(map(tuple, pre[["repo", "path"]].values.tolist())) == \
        sorted(map(tuple, post[["repo", "path"]].values.tolist()))
    assert len(pre) > 0
    # pre-images ARE the from_version rows for exactly those keys
    old_pdf = table.read(version=v_from).toPandas().set_index(["repo", "path"])
    for _, r in pre.iterrows():
        assert old_pdf.loc[(r["repo"], r["path"]), "content"] == r["content"]
    # applying (inserts + postimages as 'U', deletes as 'D') reproduces
    # v_to — i.e. the pair shape carries the full winner change set
    old = table.read(version=v_from)
    ups2 = pairs.where(F.col("op").isin("insert", "update_postimage")).select(*old.columns)
    keys2 = pairs.where(F.col("op") != "update_preimage").select("repo", "path")
    expected2 = old.join(keys2, ["repo", "path"], "left_anti").unionByName(ups2)
    got2 = expected2.orderBy("repo", "path").toPandas()
    assert got2["content"].tolist() == want["content"].tolist()
    # row accounting: pair mode adds exactly one pre-image per update
    assert len(pd_pairs) == log.count() + len(pre)
    # insert keys are absent from v_from
    ins = pd_pairs[pd_pairs["op"] == "insert"]
    assert not any((r["repo"], r["path"]) in old_pdf.index for _, r in ins.iterrows())
    with pytest.raises(ValueError, match="images"):
        table.changes(v_from, v_to, images="both")


def test_history_and_metrics_surfaces(spark, tmp_path):
    """Ops surfaces: history() = one row per retained version with
    file/delta counts and cumulative lineage totals; engine.metrics() =
    per-epoch ApplyStats including fence skips."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 1200, seed=89)
    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=4,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 600), 0)
    eng.replay(ev.where(F.col("offset") >= 600), 1)
    eng.replay(ev.where(F.col("offset") >= 600), 1)  # fenced duplicate
    eng.target().compact()

    h = eng.target().history().orderBy("version").collect()
    assert [r["version"] for r in h] == list(range(len(h)))
    # op labels (DESCRIBE HISTORY `operation` analog): create, the two
    # applied MOR epochs (the fenced duplicate never commits), compact
    assert [r["op"] for r in h] == ["create", "merge-mor", "merge-mor", "compact"]
    assert h[0]["n_data_files"] == 0                      # empty create
    assert any(r["n_delta_files"] > 0 for r in h)         # MOR epochs
    assert h[-1]["n_delta_files"] == 0                    # compacted
    totals = [r["total_rows_applied"] for r in h]
    assert totals == sorted(totals) and totals[-1] > 0    # cumulative
    assert h[-1]["total_bytes"] > 0

    m = {r["batch_id"]: r for r in eng.metrics().collect()}
    assert m[0]["rows_in"] > 0 and not m[0]["skipped"]
    assert m[1]["skipped"]  # the fenced re-delivery shows up as a skip
    assert m[1]["version"] >= 0


def test_history_op_labels_full_lifecycle(spark, tmp_path):
    """Every commit kind carries its operation label into history() —
    the incident-review surface ("what changed this table and when")
    answered from metadata alone."""
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("size_val", T.LongType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         ["repo", "path"], n_buckets=4)
    t.merge(spark.createDataFrame(
        [("r1", "a", 1, "I"), ("r1", "b", 2, "I")],
        "repo string, path string, size_val long, op string"), 0)
    t.merge_mor(spark.createDataFrame(
        [("r1", "c", 3, "I")],
        "repo string, path string, size_val long, op string"), 1)
    t.compact()
    t.tag("audit")
    t.add_constraint("pos", "size_val >= 0", validate=False)
    t.set_schema_evolution("locked")
    t.set_schema_evolution("auto")
    t.drop_constraint("pos")  # rename refuses while a constraint holds the col
    t.rename_column("size_val", "nbytes")
    t.delete_where("nbytes = 2")
    v_before = t.current_version()
    t.rollback(v_before - 1)
    ops = [r["op"] for r in t.history().orderBy("version").collect()]
    assert ops == [
        "create", "merge", "merge-mor", "compact", "tag",
        "add-constraint", "set-evolution", "set-evolution",
        "drop-constraint", "rename-column", "delete", "rollback",
    ]
    # the label is a fact about each snapshot, not derived state: time
    # travel metadata survives rollback (history keeps the full chain)
    c = LakeTable.clone(spark, t.path, str(tmp_path / "c"))
    assert c.history().orderBy("version").collect()[0]["op"] == "clone"


def test_changelog_composes_across_versions(spark, tmp_path):
    """Changelog algebra: applying changes(v0,v1) then changes(v1,v2) to
    the v0 state must equal applying changes(v0,v2) directly — the net
    diff composes, so consumers may batch windows freely."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 2400, seed=91)
    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=4).ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 800), 0)
    t = eng.target()
    v0 = t.snapshot().version
    eng.replay(ev.where((F.col("offset") >= 800) & (F.col("offset") < 1600)), 1)
    v1 = t.snapshot().version
    eng.replay(ev.where(F.col("offset") >= 1600), 2)
    v2 = t.snapshot().version

    def apply_log(state, log):
        ups = log.where(F.col("op") == "U").select(*state.columns)
        return state.join(log.select("repo", "path"), ["repo", "path"],
                          "left_anti").unionByName(ups)

    s0 = t.read(version=v0)
    stepwise = apply_log(apply_log(s0, t.changes(v0, v1)), t.changes(v1, v2))
    direct = apply_log(s0, t.changes(v0, v2))
    assert stepwise.exceptAll(direct).count() == 0
    assert direct.exceptAll(stepwise).count() == 0
    assert direct.exceptAll(t.read(version=v2)).count() == 0


def test_snapshot_metadata_flat_per_epoch(spark, tmp_path):
    """Round-4 hardening (verdict item 7): snapshot JSON size must not
    grow epoch-over-epoch on a steady compact+vacuum cadence. Since
    manifest sharding the version file carries only core fields plus
    manifest-group refs (the bucket→files map lives in content-addressed
    blobs), so flatness is even stronger — but the invariant under test
    is unchanged: consecutive post-compaction snapshots are the same
    size (±10%), and vacuum bounds the _meta dir to keep_last version
    files + LATEST (+ the manifests/ blob dir, GC'd to live refs)."""
    import glob

    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 4000, seed=101)
    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    sizes = []
    for i in range(4):
        eng.replay(ev.where((F.col("offset") >= i * 1000) & (F.col("offset") < (i + 1) * 1000)), i)
        t = eng.target()
        t.compact()
        t.vacuum(keep_last=2)
        v = t.current_version()
        sizes.append(os.path.getsize(str(tmp_path / "repos" / "_meta" / f"v{v:010d}.json")))
    # flat after the first full-coverage epoch: no epoch-over-epoch growth
    assert sizes[-1] <= sizes[1] * 1.10, sizes
    # vacuum keeps exactly keep_last snapshot files
    metas = glob.glob(str(tmp_path / "repos" / "_meta" / "v*.json"))
    assert len(metas) == 2, metas


def test_rebucket_evolution(spark, tmp_path):
    """Bucket-count evolution (Iceberg partition-spec evolution analog):
    rebucket mid-stream preserves state exactly, folds pending MOR
    deltas, routes every subsequent MERGE by the new count (write paths
    read n_buckets from the snapshot, not config), keeps time travel
    working under the OLD bucket map, and the end state matches an
    independent replay into a fresh table."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 3000, seed=113)
    eng = CdcEngine(
        spark, str(tmp_path / "repos"), n_buckets=4, write_mode="mor"
    ).ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 1500), 0)
    t = eng.target()
    v_pre = t.snapshot().version
    before = [
        (r["repo"], r["path"], r["content"])
        for r in t.read().orderBy("repo", "path").collect()
    ]
    assert any(fs for fs in t.snapshot().deltas.values())  # MOR deltas pending

    res = t.rebucket(16)
    assert res["n_buckets"] == 16 and t.snapshot().n_buckets == 16
    assert t.snapshot().deltas == {}  # folded by the rewrite
    after = [
        (r["repo"], r["path"], r["content"])
        for r in t.read().orderBy("repo", "path").collect()
    ]
    assert after == before  # rebucket is state-identity

    # no-op short circuit
    assert t.rebucket(16) == {"rebucketed": 0, "n_buckets": 16}

    # subsequent merges route by the NEW count; end state == fresh replay
    eng.replay(ev.where(F.col("offset") >= 1500), 1)
    eng2 = CdcEngine(
        spark, str(tmp_path / "repos2"), n_buckets=16
    ).ignoring_servers(99)
    eng2.replay(ev, 0)
    got = t.read().orderBy("repo", "path").collect()
    want = eng2.target().read().orderBy("repo", "path").collect()
    assert [(r["repo"], r["path"], r["content"]) for r in got] == [
        (r["repo"], r["path"], r["content"]) for r in want
    ]

    # bucket pruning under the new layout: per-bucket reads partition the
    # table exactly
    n = t.read().count()
    assert sum(t.read(buckets=[b]).count() for b in range(16)) == n

    # time travel reads the OLD version under its own 4-bucket map
    assert t.read(version=v_pre).count() == len(before)


def test_rollback_bad_batch_recovery(spark, tmp_path):
    """rollback(v) is a metadata-only atomic revert whose watermark
    reversion makes recovery = rollback + re-replay: the exactly-once
    anti-filter re-admits the rolled-back offsets, and the final state
    is identical to the never-rolled-back replay. Vacuumed targets are
    refused loudly."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 2400, seed=127)
    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=4).ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 1200), 0)
    t = eng.target()
    v_good = t.snapshot().version
    good = [
        (r["repo"], r["path"], r["content"])
        for r in t.read().orderBy("repo", "path").collect()
    ]
    eng.replay(ev.where(F.col("offset") >= 1200), 1)  # the "bad" batch
    final_want = [
        (r["repo"], r["path"], r["content"])
        for r in t.read().orderBy("repo", "path").collect()
    ]

    res = t.rollback(v_good)
    assert res["rolled_back_to"] == v_good
    # state reverted exactly; the bad version remains readable for audit
    assert [
        (r["repo"], r["path"], r["content"])
        for r in t.read().orderBy("repo", "path").collect()
    ] == good
    assert t.read(version=res["version"] - 1).count() == len(final_want)
    # watermarks reverted with the data -> re-replay is re-admitted and
    # reconverges to the never-rolled-back state
    eng.replay(ev.where(F.col("offset") >= 1200), 2)
    assert [
        (r["repo"], r["path"], r["content"])
        for r in t.read().orderBy("repo", "path").collect()
    ] == final_want

    # a second rollback to the same good version still works (forward
    # history), and a vacuumed target is refused
    t.rollback(v_good)
    t.vacuum(keep_last=1)
    with pytest.raises((ValueError, FileNotFoundError)):
        t.rollback(v_good)


def test_inmemory_metadata_store_runs_full_engine(spark, tmp_path):
    """The catalog seam (lake/metastore.py): the ENTIRE engine path —
    create, 2-epoch replay with MERGE + lineage, time travel, rollback —
    runs against a non-POSIX MetadataStore with zero _meta/ directory on
    disk. This is the proof that swapping the sandbox catalog for a
    JDBC/REST one is one small class, not an engine change."""
    import os as _os

    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events
    from rook_spark.lake.metastore import InMemoryMetadataStore
    from rook_spark.lake.table import LakeTable

    ev = generate_events(spark, 1600, seed=131)
    # build the same flattened change shape the engine writes via a
    # POSIX-store engine, then MERGE the batches through a memory-store
    # table directly (the engine API takes a path; the table API takes
    # the store)
    eng = CdcEngine(spark, str(tmp_path / "posix_repos"), n_buckets=4).ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 800), 0)
    eng.replay(ev.where(F.col("offset") >= 800), 1)
    want = [
        (r["repo"], r["path"], r["content"])
        for r in eng.target().read().orderBy("repo", "path").collect()
    ]

    store = InMemoryMetadataStore()
    posix_t = eng.target()
    mem_t = LakeTable.create(
        spark, str(tmp_path / "mem_repos"), posix_t.snapshot().schema(),
        key_cols=posix_t.snapshot().key_cols, n_buckets=4, store=store,
    )
    # replay the SAME net changelog (upserts AND deletes) through the
    # memory-store table
    chg = posix_t.changes(0).select(
        "repo", "path", "commit", "lang", "content", "op"
    )
    mem_t.merge(chg, batch_id=0)
    got = [
        (r["repo"], r["path"], r["content"])
        for r in mem_t.read().orderBy("repo", "path").collect()
    ]
    assert got == want
    # no _meta directory was ever created for the memory-store table
    assert not _os.path.exists(str(tmp_path / "mem_repos" / "_meta"))
    # snapshots + pointer live in the store; rollback works through it
    v_good = mem_t.current_version()
    mem_t.merge(
        chg.where(F.col("op") == "U").limit(10)
        .withColumn("content", F.lit("clobbered")),
        batch_id=1,
    )
    mem_t.rollback(v_good)
    assert [
        (r["repo"], r["path"], r["content"])
        for r in mem_t.read().orderBy("repo", "path").collect()
    ] == want


def test_changes_refuses_bucket_pruning_across_rebucket(spark, tmp_path):
    """Reviewer finding r4: bucket ids name DISJOINT key sets across a
    rebucket boundary, so a bucket-pruned changelog would emit phantom
    deletes — refused loudly; the unpruned diff stays correct."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 1200, seed=137)
    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=4).ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 600), 0)
    t = eng.target()
    v_pre = t.snapshot().version
    t.rebucket(8)
    eng.replay(ev.where(F.col("offset") >= 600), 1)

    with pytest.raises(ValueError, match="rebucket boundary"):
        t.changes(v_pre, buckets=[3])
    # unpruned diff across the boundary is a valid LWW change set
    log = t.changes(v_pre)
    old = t.read(version=v_pre)
    ups = log.where(F.col("op") == "U").select(*old.columns)
    expected = old.join(log.select("repo", "path"), ["repo", "path"],
                        "left_anti").unionByName(ups)
    want = t.read().orderBy("repo", "path").toPandas()
    got = expected.orderBy("repo", "path").toPandas()
    assert got["content"].tolist() == want["content"].tolist()
    # same-layout pruning still allowed
    assert t.changes(t.snapshot().version, buckets=[3]).count() == 0


# --------------------------------------------------- concurrent-writer CAS


def _two_writer_conflict(spark, make_tables):
    """Deterministic two-writer interleave: writer B reads its parent
    snapshot and builds its commit, but at B's commit point writer A has
    already advanced the pointer — exactly the zombie-driver /
    double-start scenario the catalog CAS exists for (verdict r4 item 1).
    One winner, one loud CommitConflict, and a clean retry path."""
    from rook_spark.lake.metastore import CommitConflict

    t_a, t_b = make_tables()
    t_a.merge(_changes(spark, [("r1", "a", "v1", "I")]), 0)
    assert t_b.current_version() == t_a.current_version()

    # interleave: when B reaches its commit point, A commits first
    store_b = t_b._store
    orig_commit = store_b.commit
    fired = {}

    def commit_with_interloper(version, payload, expected_parent):
        if not fired:
            fired["x"] = True
            t_a.merge(_changes(spark, [("r1", "winner", "vA", "I")]), 1)
        orig_commit(version, payload, expected_parent)

    store_b.commit = commit_with_interloper
    try:
        with pytest.raises(CommitConflict):
            t_b.merge(_changes(spark, [("r1", "loser", "vB", "I")]), 1)
    finally:
        store_b.commit = orig_commit

    # the winner's commit survives intact (bucket map not clobbered)
    state = {r["path"]: r["content"] for r in t_a.read().collect()}
    assert state == {"a": "v1", "winner": "vA"}
    # the loser retries against the NEW current snapshot and succeeds
    t_b.merge(_changes(spark, [("r1", "loser", "vB", "I")]), 2)
    state = {r["path"]: r["content"] for r in t_a.read().collect()}
    assert state == {"a": "v1", "winner": "vA", "loser": "vB"}


def test_concurrent_commit_conflicts_posix(spark, tmp_path):
    def make_tables():
        t_a = LakeTable.create(
            spark, str(tmp_path / "cas"), SCHEMA, ["repo", "path"], n_buckets=4
        )
        t_b = LakeTable.load(spark, str(tmp_path / "cas"))
        return t_a, t_b

    _two_writer_conflict(spark, make_tables)


def test_concurrent_commit_conflicts_in_memory(spark, tmp_path):
    from rook_spark.lake.metastore import InMemoryMetadataStore

    def make_tables():
        store = InMemoryMetadataStore()
        t_a = LakeTable.create(
            spark, str(tmp_path / "cas_mem"), SCHEMA, ["repo", "path"],
            n_buckets=4, store=store,
        )
        t_b = LakeTable(spark, str(tmp_path / "cas_mem"), store=store)
        return t_a, t_b

    _two_writer_conflict(spark, make_tables)


def test_create_conflicts_on_existing_table(spark, tmp_path):
    """create() builds from parent -1; racing a second create against a
    committed table surfaces as the ValueError guard (pointer already
    ≥ 0), and a raw commit with a stale -1 parent is a CommitConflict."""
    from rook_spark.lake.metastore import CommitConflict, PosixMetadataStore

    t = LakeTable.create(spark, str(tmp_path / "c"), SCHEMA, ["repo", "path"])
    store = PosixMetadataStore(t._meta_dir)
    with pytest.raises(CommitConflict):
        store.commit(0, t.snapshot().to_json(), expected_parent=-1)


# ------------------------------------------------- file-level stats skipping


def _ord_changes(spark, rows):
    """(repo, path, size, op, ordinal) -> change set with LWW ordinals."""
    return spark.createDataFrame(
        [(r, p, s, op, o, o) for (r, p, s, op, o) in rows],
        "repo string, path string, size long, op string, "
        "__ordinal long, __offset long",
    )


@pytest.fixture()
def stats_table(spark, tmp_path):
    """Two commits with disjoint key sets and disjoint value bands — the
    shape stats skipping exists for: later commits' files carry higher
    ordinals/values, so a bounded scan can skip every untouched bucket's
    files."""
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "st"), schema, ["repo", "path"], n_buckets=8
    )
    t.merge(_ord_changes(
        spark, [("r", f"p{i:03d}", i * 10, "I", 1) for i in range(64)]), 0)
    t.merge(_ord_changes(
        spark, [("r", f"q{i}", 9000 + i, "I", 2) for i in range(3)]), 1)
    return t


def test_stats_skipping_prunes_files_and_loses_nothing(spark, stats_table):
    """read(ranges=...) must scan strictly fewer parquet files than a
    full read while returning every matching row (superset contract:
    caller applies the exact filter) — the Iceberg manifest min/max
    analog on top of bucket pruning. The incremental-scan shape
    (ordinal > watermark) skips every bucket the later commit did not
    rewrite."""
    t = stats_table
    full = t.read()
    n_full = full.select(F.input_file_name()).distinct().count()

    for ranges, flt, want_rows in [
        ({"size": (8000, None)}, "size >= 8000", {"q0", "q1", "q2"}),
        ({"__ordinal": (2, None)}, None, {"q0", "q1", "q2"}),
    ]:
        pruned = t.read(ranges=ranges, include_internal=True)
        n_pruned = pruned.select(F.input_file_name()).distinct().count()
        assert n_pruned < n_full, (ranges, n_pruned, n_full)
        got = pruned.where(flt or "__ordinal >= 2")
        assert {r["path"] for r in got.collect()} == want_rows
    # the exact filter over the pruned scan equals the full scan's result
    a = sorted(r["path"] for r in t.read(ranges={"size": (0, 100)})
               .where("size <= 100").collect())
    b = sorted(r["path"] for r in full.where("size <= 100").collect())
    assert a == b and len(a) == 11
    # stats describe exactly the current base files
    snap = t.snapshot()
    live = {f for fs in snap.buckets.values() for f in fs}
    assert set(snap.stats) == live and len(live) > 0


def test_stats_skipping_exempts_mor_buckets(spark, stats_table):
    """Soundness under merge-on-read: pruning a base file under LWW
    resolution could surface a stale delta as the winner, so buckets
    carrying deltas keep ALL base files. A newer delta overwrite whose
    size falls OUTSIDE the range must still shadow its base row."""
    t = stats_table
    # p001 (size 10) gets overwritten by a delta with size 9000
    t.merge_mor(_ord_changes(spark, [("r", "p001", 9000, "U", 5)]), 2)
    pruned = t.read(ranges={"size": (0, 50)}).where("size between 0 and 50")
    got = {r["path"]: r["size"] for r in pruned.collect()}
    want = {
        r["path"]: r["size"]
        for r in t.read().where("size between 0 and 50").collect()
    }
    assert got == want
    assert "p001" not in got  # the out-of-range delta winner shadowed it


def test_stats_survive_maintenance_ops(spark, stats_table):
    """compact / rebucket / rollback re-derive or carry stats so skipping
    keeps working across the table's whole maintenance lifecycle."""
    t = stats_table
    t.merge_mor(_ord_changes(spark, [("r", "p001", 9000, "U", 5)]), 2)
    t.compact()
    v_compacted = t.current_version()
    t.rebucket(4)
    for step in ["compact", "rebucket"]:
        snap = t.snapshot()
        live = {f for fs in snap.buckets.values() for f in fs}
        assert set(snap.stats) == live, step
    # after compaction the delta is folded -> pruning applies again and
    # the 9000-size row lives in some file whose stats admit it
    got = {r["path"] for r in t.read(ranges={"size": (8000, None)})
           .where("size >= 8000").collect()}
    assert got == {"p001", "q0", "q1", "q2"}
    t.rollback(v_compacted)
    snap = t.snapshot()
    live = {f for fs in snap.buckets.values() for f in fs}
    assert set(snap.stats) == live
    assert t.read(ranges={"size": (8000, None)}).where("size >= 8000").count() == 4


# ------------------------------------------- z-order clustering + blooms


def _nfiles(df) -> int:
    return df.select(F.input_file_name()).distinct().count()


def test_cluster_zorder_tightens_stats_and_prunes(spark, tmp_path):
    """Before clustering, every file in a multiply-rewritten bucket spans
    the full ordinal range, so an incremental range scan prunes nothing
    WITHIN buckets; after cluster(zorder=["__ordinal"]) each bucket's
    files carry near-disjoint ordinal ranges and the same scan reads
    strictly fewer files — while remaining a superset (no row lost),
    preserving content exactly, and keeping time travel to the
    pre-cluster layout."""
    t = LakeTable.create(
        spark, str(tmp_path / "zc"),
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("size", T.LongType()),
        ]),
        ["repo", "path"], n_buckets=2,
    )
    # interleave ordinals across keys so hash-bucketing scatters every
    # ordinal band across both buckets (the anti-clustered worst case)
    rows = [("r", f"p{i:03d}", i, "I", i % 97 + 1) for i in range(200)]
    t.merge(_ord_changes(spark, rows), 0)
    before = dict(
        content={r["path"]: r["size"] for r in t.read().collect()},
        version=t.current_version(),
    )
    res = t.cluster(zorder=["__ordinal"], target_files_per_bucket=8)
    assert res["clustered_buckets"] == 2 and res["files"] >= 4

    # content identity + time travel
    after = {r["path"]: r["size"] for r in t.read().collect()}
    assert after == before["content"]
    tv = {r["path"]: r["size"] for r in t.read(version=before["version"]).collect()}
    assert tv == before["content"]

    # the bounded incremental scan now skips files inside buckets
    full = _nfiles(t.read(include_internal=True))
    scan = t.read(ranges={"__ordinal": (90, None)}, include_internal=True)
    assert _nfiles(scan) < full
    got = sorted(r["path"] for r in scan.where("__ordinal >= 90").collect())
    want = sorted(r["path"] for r in t.read(include_internal=True)
                  .where("__ordinal >= 90").collect())
    assert got == want and len(got) == 16  # ordinals 90..97, two i-bands

    # stats describe exactly the live base files
    snap = t.snapshot()
    live = {f for fs in snap.buckets.values() for f in fs}
    assert set(snap.stats) == live


def test_cluster_folds_deltas_and_validates(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "zd"),
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("size", T.LongType()),
        ]),
        ["repo", "path"], n_buckets=2,
    )
    t.merge(_ord_changes(spark, [("r", f"p{i}", i, "I", 1) for i in range(8)]), 0)
    t.merge_mor(_ord_changes(spark, [("r", "p1", 999, "U", 2),
                                     ("r", "p2", 0, "D", 2)]), 1)
    t.cluster(zorder=["size"])
    snap = t.snapshot()
    assert not snap.deltas  # folded
    got = {r["path"]: r["size"] for r in t.read().collect()}
    assert got["p1"] == 999 and "p2" not in got and len(got) == 7
    with pytest.raises(ValueError, match="not in table schema"):
        t.cluster(zorder=["nope"])
    with pytest.raises(ValueError, match="needs a numeric"):
        t.cluster(zorder=["repo"])


def test_bloom_point_skipping(spark, tmp_path):
    """read(points=...) prunes base files whose bloom filter proves a
    value absent — the equality axis for string columns where min/max
    stats are useless (e.g. 'all rows commit C touched' on a table
    bucketed by (repo, path)) — while never losing a matching row, and
    surviving compact + rollback."""
    t = LakeTable.create(
        spark, str(tmp_path / "bl"),
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
        ]),
        ["repo", "path"], n_buckets=8, bloom_cols=["commit"],
    )

    def chg(rows):
        return spark.createDataFrame(
            [(r, p, c, op, o, o) for (r, p, c, op, o) in rows],
            "repo string, path string, commit string, op string, "
            "__ordinal long, __offset long",
        )

    # two commits with disjoint commit-hash sets over disjoint keys
    t.merge(chg([("r", f"a{i:02d}", f"c_early_{i % 4}", "I", 1) for i in range(32)]), 0)
    t.merge(chg([("r", f"b{i}", "c_late", "I", 2) for i in range(4)]), 1)

    full = _nfiles(t.read())
    pruned = t.read(points={"commit": "c_late"})
    assert _nfiles(pruned) < full
    got = sorted(r["path"] for r in pruned.where("commit = 'c_late'").collect())
    want = sorted(r["path"] for r in t.read().where("commit = 'c_late'").collect())
    assert got == want and len(got) == 4

    # absent value: prunes to (near-)nothing, returns empty after filter
    assert t.read(points={"commit": "no_such"}).where("commit = 'no_such'").count() == 0

    # non-bloom column never prunes (missing filter => keep)
    assert _nfiles(t.read(points={"path": "a00"})) == full

    # survives compaction (filters re-harvested for rewritten files)
    t.compact(max_files_per_bucket=0)
    v_compacted = t.current_version()
    snap = t.snapshot()
    live = {f for fs in snap.buckets.values() for f in fs}
    assert set(snap.blooms) == live and all("commit" in b for b in snap.blooms.values())
    pruned2 = t.read(points={"commit": "c_late"})
    assert _nfiles(pruned2) < _nfiles(t.read())
    assert pruned2.where("commit = 'c_late'").count() == 4

    # survives rollback (blooms copied with the target snapshot)
    t.merge(chg([("r", "zz", "c_bad", "I", 3)]), 2)
    t.rollback(v_compacted)
    assert set(t.snapshot().blooms) == {
        f for fs in t.snapshot().buckets.values() for f in fs
    }
    assert t.read(points={"commit": "c_late"}).where("commit = 'c_late'").count() == 4


def test_bloom_skipping_exempts_mor_buckets(spark, tmp_path):
    """Same LWW soundness rule as ranges: a bucket carrying deltas keeps
    all its base files, so a delta rewriting a row to a NEW commit value
    still shadows the base row even when the probe value only matches
    the base file."""
    t = LakeTable.create(
        spark, str(tmp_path / "blm"),
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
        ]),
        ["repo", "path"], n_buckets=1, bloom_cols=["commit"],
    )

    def chg(rows):
        return spark.createDataFrame(
            [(r, p, c, op, o, o) for (r, p, c, op, o) in rows],
            "repo string, path string, commit string, op string, "
            "__ordinal long, __offset long",
        )

    t.merge(chg([("r", "p0", "c0", "I", 1), ("r", "p1", "c0", "I", 1)]), 0)
    t.merge_mor(chg([("r", "p0", "c1", "U", 2)]), 1)
    # probing for the OLD value: p0's current state is c1, so the exact
    # filter must drop it — which requires the base file NOT be pruned
    # away before LWW resolution
    got = {r["path"]: r["commit"]
           for r in t.read(points={"commit": "c0"}).where("commit = 'c0'").collect()}
    assert got == {"p1": "c0"}


# ------------------------------------------------- manifest sharding


def test_manifest_sharding_metadata_io_o_touched(spark, tmp_path):
    """The commit path must write O(touched buckets) metadata, not
    O(table): per-bucket state lives in content-addressed manifest-group
    blobs, so an epoch touching one bucket writes exactly one new group
    blob and reuses every other group's key unchanged — at 2^16 buckets
    and thousands of epochs, this is what keeps the manifest from
    becoming the commit bottleneck."""
    t = LakeTable.create(
        spark, str(tmp_path / "ms"), SCHEMA, ["repo", "path"], n_buckets=128
    )
    t.merge(_changes(
        spark, [("r", f"p{i:03d}", f"v{i}", "I") for i in range(300)]), 0)
    store = t._store
    keys_before = set(store.blob_keys())
    refs_v1 = __import__("json").loads(store.read(t.current_version()))["manifest_refs"]
    assert len(refs_v1) == 2  # 128 buckets / 64 per group

    # single-key epoch: exactly one bucket => one group rewritten
    t.merge(_changes(spark, [("r", "p000", "v2", "U")]), 1)
    refs_v2 = __import__("json").loads(store.read(t.current_version()))["manifest_refs"]
    new_blobs = set(store.blob_keys()) - keys_before
    assert len(new_blobs) == 1, new_blobs
    assert sum(refs_v1[g] != refs_v2[g] for g in refs_v1) == 1  # other group reused

    # the snapshot payload itself inlines NO per-file state
    raw = __import__("json").loads(store.read(t.current_version()))
    assert raw["buckets"] == {} and raw["stats"] == {} and raw["blooms"] == {}
    # and resolution rebuilds the full picture (stats resolution is
    # covered by the stats_table tests — this schema is all-string, so
    # there are legitimately no numeric min/max entries to carry)
    snap = t.snapshot()
    assert len(snap.buckets) > 100
    assert {r["content"] for r in t.read().where("path = 'p000'").collect()} == {"v2"}


def test_manifest_vacuum_gc_and_time_travel(spark, tmp_path):
    """Vacuum GCs manifest blobs unreferenced by every retained
    snapshot (liveness = union of retained refs — blobs are shared
    across snapshots by content addressing), while every retained
    version keeps resolving; an expired version's read fails loudly."""
    t = LakeTable.create(
        spark, str(tmp_path / "mg"), SCHEMA, ["repo", "path"], n_buckets=4
    )
    for i in range(5):
        t.merge(_changes(spark, [("r", f"p{i}", f"v{i}", "I")]), i)
    store = t._store
    res = t.vacuum(keep_last=2)
    assert res["removed_manifests"] > 0
    live = set()
    for v in store.versions():
        live |= set(__import__("json").loads(store.read(v))["manifest_refs"].values())
    assert set(store.blob_keys()) == live
    # retained versions resolve; both content-correct
    cur = t.current_version()
    assert t.read(version=cur).count() == 5
    assert t.read(version=cur - 1).count() == 4
    with pytest.raises(FileNotFoundError):
        t.snapshot(cur - 2)


def test_vacuum_min_age_spares_in_flight_commit(spark, tmp_path):
    """The GC-vs-in-flight-commit race (Iceberg remove_orphan_files
    older_than analog): a concurrent writer lands data files and
    manifest blobs BEFORE its snapshot commit references them, so
    vacuum's liveness sweep sees them as garbage. With ``min_age_s``
    set, young unreferenced files and blobs are spared — the
    in-flight commit can still CAS and publish without dangling refs —
    while old garbage is still reclaimed (and the default 0 keeps
    reclaiming everything, exclusive-maintenance behavior)."""
    t = LakeTable.create(
        spark, str(tmp_path / "ga"), SCHEMA, ["repo", "path"], n_buckets=4
    )
    for i in range(4):
        t.merge(_changes(spark, [("r", f"p{i}", f"v{i}", "I")]), i)

    # simulate a concurrent writer mid-commit: data file + manifest blob
    # written, snapshot NOT yet committed (exactly _write_bucket_files /
    # put_blob before the CAS)
    pend_dir = os.path.join(t.path, "data", "v0000000099-deadbeef", "__bucket=0")
    os.makedirs(pend_dir)
    pend_file = os.path.join(pend_dir, "part-inflight.parquet")
    with open(pend_file, "wb") as f:
        f.write(b"PAR1")
    t._store.put_blob("feedfacefeedfacefeedface", '{"0": {}}')

    res = t.vacuum(keep_last=2, min_age_s=3600)
    # old unreferenced versions still reclaimed...
    assert res["removed_snapshots"] > 0
    # ...but the in-flight writer's artifacts survive the sweep
    assert os.path.exists(pend_file)
    assert "feedfacefeedfacefeedface" in t._store.blob_keys()
    assert t.read().count() == 4

    # age the pending artifacts past the grace: now they are garbage
    old = __import__("time").time() - 7200
    os.utime(pend_file, (old, old))
    os.utime(t._store._blob_path("feedfacefeedfacefeedface"), (old, old))
    t.vacuum(keep_last=2, min_age_s=3600)
    assert not os.path.exists(pend_file)
    assert "feedfacefeedfacefeedface" not in t._store.blob_keys()


def test_vacuum_min_age_in_memory_store(spark, tmp_path):
    """blob_mtime seam on the in-memory store: a just-put blob reports
    a fresh mtime and survives a graced vacuum; the ABC default (0.0 =
    unknown age) would make it GC-eligible, so the override matters."""
    from rook_spark.lake.metastore import InMemoryMetadataStore

    store = InMemoryMetadataStore()
    t = LakeTable.create(
        spark, str(tmp_path / "gm"), SCHEMA, ["repo", "path"],
        n_buckets=4, store=store,
    )
    t.merge(_changes(spark, [("r", "a", "v1", "I")]), 0)
    store.put_blob("cafecafecafecafecafecafe", "{}")
    assert store.blob_mtime("cafecafecafecafecafecafe") > 0
    t.vacuum(keep_last=1, min_age_s=3600)
    assert "cafecafecafecafecafecafe" in store.blob_keys()
    t.vacuum(keep_last=1)  # default: reclaim immediately
    assert "cafecafecafecafecafecafe" not in store.blob_keys()


def test_tags_pin_versions_through_vacuum(spark, tmp_path):
    """Iceberg create_tag analog: a tag names a version, read(tag=...)
    resolves it, and vacuum retains the tagged version's metadata AND
    data files past the keep_last window — the retention policy for
    audit/repro snapshots on a table whose untagged history is GC'd.
    Dropping the tag releases it to the next vacuum."""
    t = LakeTable.create(
        spark, str(tmp_path / "tg"), SCHEMA, ["repo", "path"], n_buckets=4
    )
    t.merge(_changes(spark, [("r", "a", "v1", "I")]), 0)
    pinned = t.current_version()
    t.tag("train-corpus", pinned)
    for i in range(1, 5):
        t.merge(_changes(spark, [("r", "a", f"v{i + 1}", "U")]), i)

    t.vacuum(keep_last=2)
    # untagged old versions are gone; the tagged one still reads
    assert t.read(tag="train-corpus").first()["content"] == "v1"
    assert t.resolve_tag("train-corpus") == pinned
    with pytest.raises(FileNotFoundError):
        t.read(version=pinned + 1).collect()
    assert t.read().first()["content"] == "v5"

    # tags survive rollback (refs, not state)
    t.rollback(t.current_version() - 1)
    assert t.resolve_tag("train-corpus") == pinned

    # duplicate tag refuses without replace; replace moves it
    with pytest.raises(ValueError):
        t.tag("train-corpus")
    t.tag("train-corpus", replace=True)
    assert t.resolve_tag("train-corpus") == t.current_version() - 1

    # the formerly pinned version is now ordinary history: vacuumed away,
    # and tagging an expired version refuses loudly
    t.merge(_changes(spark, [("r", "b", "x", "I")]), 99)
    t.merge(_changes(spark, [("r", "c", "x", "I")]), 100)
    t.vacuum(keep_last=2)
    with pytest.raises(FileNotFoundError):
        t.tag("too-late", pinned)

    t.drop_tag("train-corpus")
    with pytest.raises(ValueError):
        t.resolve_tag("train-corpus")
    with pytest.raises(ValueError):
        t.read(tag="train-corpus")
    with pytest.raises(ValueError):
        t.drop_tag("train-corpus")
    with pytest.raises(ValueError):
        t.read(version=3, tag="x")  # mutually exclusive


def test_inline_snapshot_backward_compat(spark, tmp_path):
    """Pre-sharding snapshots inlined the full bucket map in the
    version payload; those tables must keep loading (manifest_refs
    absent => the inline fields are the state)."""
    t = LakeTable.create(
        spark, str(tmp_path / "bc"), SCHEMA, ["repo", "path"], n_buckets=4
    )
    t.merge(_changes(spark, [("r", "a", "v1", "I"), ("r", "b", "v2", "I")]), 0)
    # re-commit the resolved snapshot as an INLINE payload (the exact
    # bytes a pre-sharding build would have written)
    snap = t.snapshot()
    inline = snap.to_json()
    snap2 = type(snap).from_json(inline)
    snap2.version = snap.version + 1
    snap2.parent = snap.version
    t._store.commit(snap2.version, snap2.to_json(), expected_parent=snap.version)
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"a": "v1", "b": "v2"}
    # and a sharded commit on top of the inline one still works
    t.merge(_changes(spark, [("r", "c", "v3", "I")]), 1)
    assert t.read().count() == 3


def test_epoch_write_width_is_o_touched_not_o_table(spark, tmp_path, monkeypatch):
    """A steady-state epoch touching k of N buckets must schedule O(k)
    write tasks, not O(N): at 2^16 buckets an every-epoch N-task stage
    is pure task-launch overhead (measured: single-key epochs on a
    4096-bucket table spent their whole wall time on 4096 empty tasks).
    Pins the shuffle width passed to _write_bucket_files for both write
    modes, and that the per-bucket file layout is unchanged by the
    narrower width."""
    ord_schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("size", T.LongType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "wide"), ord_schema, ["repo", "path"], n_buckets=4096
    )
    widths: list[int | None] = []
    orig = LakeTable._write_bucket_files

    def spy(self, df, new_version, repartition_n, phys_map):
        widths.append(repartition_n)
        return orig(self, df, new_version, repartition_n, phys_map)

    monkeypatch.setattr(LakeTable, "_write_bucket_files", spy)

    t.merge(_ord_changes(spark, [("r", "a", 1, "U", 1), ("r", "b", 1, "U", 1)]), 0)
    assert widths[-1] <= 2  # COW: width = touched buckets (<= 2 keys)

    # MOR with the engine-piggybacked touched list
    t.merge_mor(_ord_changes(spark, [("r", "a", 2, "U", 2)]), 1, touched_buckets=[3])
    assert widths[-1] == 1

    # MOR without a touched list: clamped to core count, never table width
    t.merge_mor(_ord_changes(spark, [("r", "b", 2, "U", 3)]), 2)
    assert widths[-1] <= spark.sparkContext.defaultParallelism < 4096

    # layout + correctness unaffected: one file per touched bucket, LWW state right
    snap = t.snapshot()
    assert all(len(fs) == 1 for fs in snap.buckets.values())
    rows = {(r["repo"], r["path"]): r["size"] for r in t.read().collect()}
    assert rows == {("r", "a"): 2, ("r", "b"): 2}


def _ord_table(spark, path, n_buckets=4):
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("size", T.LongType()),
        ]
    )
    return LakeTable.create(spark, path, schema, ["repo", "path"], n_buckets=n_buckets)


def _inject_before_commit(t_maint, concurrent):
    """Make `concurrent()` land a real commit right before t_maint's next
    store-level commit attempt (the classic CAS-race interleaving)."""
    store = t_maint._store
    orig = store.commit
    fired = {"done": False}

    def racing(version, payload, expected_parent=None, **kw):
        if not fired["done"]:
            fired["done"] = True
            concurrent()
        return orig(version, payload, expected_parent=expected_parent, **kw)

    store.commit = racing
    return lambda: setattr(store, "commit", orig)


def test_compact_rebases_across_concurrent_mor_append(spark, tmp_path):
    """Iceberg RewriteDataFiles-style commit retry: a compaction built at
    version V loses the CAS race to a concurrent MOR ingest epoch, then
    REBASES — its folded base files are published with the concurrently
    appended delta suffix carried forward — instead of failing. Sound
    because LWW delta resolution is order-insensitive (fold prefix +
    apply suffix == apply all). Final state must equal the serial
    execution, with the concurrent (newer-ordinal) update winning."""
    t = _ord_table(spark, str(tmp_path / "rebase1"), n_buckets=1)
    t.merge(_ord_changes(spark, [("r", "a", 1, "U", 1), ("r", "b", 1, "U", 1)]), 0)
    t.merge_mor(_ord_changes(spark, [("r", "a", 2, "U", 2)]), 1)
    t2 = LakeTable.load(spark, t.path)

    restore = _inject_before_commit(
        t, lambda: t2.merge_mor(_ord_changes(spark, [("r", "b", 9, "U", 3)]), 2)
    )
    try:
        res = t.compact()
    finally:
        restore()
    assert res["compacted_buckets"] == 1 and res["skipped_buckets"] == 0
    snap = t.snapshot()
    assert snap.version == res["version"]
    # the concurrent epoch's delta survived as the bucket's suffix
    assert sum(len(fs) for fs in snap.deltas.values()) == 1
    assert snap.batch_id == 2  # rebased child carries the LATEST ingest fence
    rows = {(r["repo"], r["path"]): r["size"] for r in t.read().collect()}
    assert rows == {("r", "a"): 2, ("r", "b"): 9}
    # a follow-up compact folds the suffix too
    t.compact()
    assert not any(t.snapshot().deltas.values())
    rows = {(r["repo"], r["path"]): r["size"] for r in t.read().collect()}
    assert rows == {("r", "a"): 2, ("r", "b"): 9}


def test_compact_skips_bucket_replaced_by_concurrent_cow(spark, tmp_path):
    """A bucket whose BASE a concurrent COW merge replaced cannot be
    rebased (the rewrite folded a stale base): it is skipped — the live
    state wins, the orphaned rewrite files wait for vacuum — while
    unconflicted buckets still publish. Mirrors Iceberg's per-file-group
    conflict handling."""
    t = _ord_table(spark, str(tmp_path / "rebase2"), n_buckets=4)
    # find two keys landing in different buckets
    from rook_spark.lake.table import bucket_expr

    probe = spark.createDataFrame(
        [("r", f"p{i}") for i in range(16)], "repo string, path string"
    ).withColumn("b", bucket_expr(["repo", "path"], 4)).collect()
    by_bucket: dict[int, str] = {}
    for r in probe:
        by_bucket.setdefault(r["b"], r["path"])
        if len(by_bucket) >= 2:
            break
    (b1, k1), (b2, k2) = list(by_bucket.items())[:2]

    t.merge(_ord_changes(spark, [("r", k1, 1, "U", 1), ("r", k2, 1, "U", 1)]), 0)
    t.merge_mor(_ord_changes(spark, [("r", k1, 2, "U", 2), ("r", k2, 2, "U", 2)]), 1)
    t2 = LakeTable.load(spark, t.path)

    # concurrent COW rewrites bucket b2's base (merge folds its deltas too)
    restore = _inject_before_commit(
        t, lambda: t2.merge(_ord_changes(spark, [("r", k2, 50, "U", 3)]), 2)
    )
    try:
        res = t.compact()
    finally:
        restore()
    assert res["skipped_buckets"] == 1 and res["compacted_buckets"] == 1
    rows = {(r["repo"], r["path"]): r["size"] for r in t.read().collect()}
    assert rows == {("r", k1): 2, ("r", k2): 50}
    # skipped bucket kept the live (post-COW) state: no stale deltas for it
    assert str(b2) not in t.snapshot().deltas or not t.snapshot().deltas[str(b2)]


def test_rewrite_conflict_with_rebucket_stays_loud(spark, tmp_path):
    """Structural divergence cannot be rebased: a concurrent rebucket
    changes the layout under the rewrite, so the maintenance commit must
    re-raise CommitConflict, not guess."""
    from rook_spark.lake.metastore import CommitConflict

    t = _ord_table(spark, str(tmp_path / "rebase3"), n_buckets=2)
    t.merge(_ord_changes(spark, [("r", "a", 1, "U", 1)]), 0)
    t.merge_mor(_ord_changes(spark, [("r", "a", 2, "U", 2)]), 1)
    t2 = LakeTable.load(spark, t.path)

    restore = _inject_before_commit(t, lambda: t2.rebucket(8))
    try:
        with pytest.raises(CommitConflict):
            t.compact()
    finally:
        restore()
    # table is untouched by the failed rewrite: rebucketed state intact
    assert t.snapshot().n_buckets == 8
    rows = {(r["repo"], r["path"]): r["size"] for r in t.read().collect()}
    assert rows == {("r", "a"): 2}


# ------------------------------------------------------------ type widening
# Iceberg promotion lattice (int->long, float->double, decimal precision)
# as METADATA-ONLY evolution: old narrow parquet files are never rewritten;
# the Spark 4 parquet reader upcasts them under the widened read schema.

WIDEN_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("x", T.FloatType()),
    ]
)


def _wchanges(spark, rows, n_type="int", x_type="float"):
    return spark.createDataFrame(
        rows, f"k string, n {n_type}, x {x_type}, op string"
    )


def _wtable(spark, path):
    return LakeTable.create(spark, path, WIDEN_SCHEMA, ["k"], n_buckets=4)


def test_type_widening_cow(spark, tmp_path):
    """A wide batch promotes the snapshot schema int->long /
    float->double; pre-widening rows (still int32/float parquet) read
    back correctly through the widened schema, and time travel to the
    pre-widening version still presents the narrow schema."""
    t = _wtable(spark, str(tmp_path / "w1"))
    t.merge(_wchanges(spark, [("a", 1, 1.5, "I"), ("b", 2, 2.5, "I")]), 0)
    v_narrow = t.current_version()

    big = 2**40  # does not fit in int32 — only correct if truly long
    t.merge(_wchanges(spark, [("b", big, 2.75, "U"), ("c", 3, 3.5, "I")],
                      n_type="bigint", x_type="double"), 1)

    sch = {f.name: f.dataType for f in t.snapshot().schema().fields}
    assert sch["n"] == T.LongType() and sch["x"] == T.DoubleType()
    state = {r["k"]: (r["n"], r["x"]) for r in t.read().collect()}
    assert state["a"] == (1, pytest.approx(1.5))  # old narrow file upcast
    assert state["b"] == (big, pytest.approx(2.75))
    assert state["c"] == (3, pytest.approx(3.5))
    # time travel preserves the historical (narrow) schema
    old = t.read(version=v_narrow)
    old_sch = {f.name: f.dataType for f in old.schema.fields}
    assert old_sch["n"] == T.IntegerType() and old_sch["x"] == T.FloatType()
    assert {r["k"] for r in old.collect()} == {"a", "b"}


def test_type_widening_mor_and_compact(spark, tmp_path):
    """Widening through the MOR path: narrow base files + a wide delta
    resolve under the widened schema; compaction folds them into wide
    base files with re-harvested stats. (MOR resolution is LWW over the
    stored (__ordinal, __offset), so the table carries both.)"""
    sch0 = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("__ordinal", T.LongType()),
            T.StructField("__offset", T.LongType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "w2"), sch0, ["k"], n_buckets=4)

    def _mor(rows, n_type, bid):
        t.merge_mor(spark.createDataFrame(
            rows, f"k string, n {n_type}, __ordinal bigint, __offset bigint, op string"
        ), bid)

    _mor([("a", 1, 0, 0, "I"), ("b", 2, 0, 1, "I")], "int", 0)
    big = 2**40
    _mor([("a", big, 1, 2, "U")], "bigint", 1)

    sch = {f.name: f.dataType for f in t.snapshot().schema().fields}
    assert sch["n"] == T.LongType()
    state = {r["k"]: r["n"] for r in t.read().collect()}
    assert state == {"a": big, "b": 2}

    t.compact()
    assert {r["k"]: r["n"] for r in t.read().collect()} == {"a": big, "b": 2}
    # stats re-harvested over the folded wide files still carry the max
    stats = t.snapshot().stats
    n_maxes = [mm["n"][1] for mm in stats.values() if "n" in mm]
    assert max(n_maxes) == big


def test_type_widening_narrow_arrivals_upcast(spark, tmp_path):
    """After widening, a NARROW batch (int32 arrivals at a long column)
    upcasts into the wide schema — and, critically, narrow KEY values
    hash into the same buckets as their wide-typed equivalents (string
    key here; numeric payload upcast is what's exercised)."""
    t = _wtable(spark, str(tmp_path / "w3"))
    t.merge(_wchanges(spark, [("a", 2**40, 1.5, "I")], n_type="bigint"), 0)
    t.merge(_wchanges(spark, [("a", 7, 2.5, "U"), ("b", 8, 3.5, "I")]), 1)  # int batch
    sch = {f.name: f.dataType for f in t.snapshot().schema().fields}
    assert sch["n"] == T.LongType()  # stays wide; narrow arrivals upcast
    assert {r["k"]: r["n"] for r in t.read().collect()} == {"a": 7, "b": 8}


def test_type_widening_rejects_incompatible_and_key_changes(spark, tmp_path):
    """Off-lattice changes (int -> string) and any key-column promotion
    fail loudly: silently casting would corrupt data, and bucket ids are
    xxhash64 of the NATIVE key type, so a widened key would re-bucket
    every row."""
    t = _wtable(spark, str(tmp_path / "w4"))
    t.merge(_wchanges(spark, [("a", 1, 1.5, "I")]), 0)
    with pytest.raises(ValueError, match="incompatible type change"):
        t.merge(spark.createDataFrame([("a", "oops", 1.5, "U")],
                                      "k string, n string, x float, op string"), 1)

    ki = LakeTable.create(
        spark, str(tmp_path / "w4k"),
        T.StructType([T.StructField("id", T.IntegerType()),
                      T.StructField("v", T.StringType())]),
        ["id"], n_buckets=4,
    )
    ki.merge(spark.createDataFrame([(1, "a", "I")], "id int, v string, op string"), 0)
    with pytest.raises(ValueError, match="key column"):
        ki.merge(spark.createDataFrame([(2**40, "b", "I")],
                                       "id bigint, v string, op string"), 1)


def test_changelog_across_widening_boundary(spark, tmp_path):
    """changes() spanning a type-widening commit: the diff presents the
    WIDE column type and pre-widening old-images upcast into it."""
    t = _wtable(spark, str(tmp_path / "w5"))
    t.merge(_wchanges(spark, [("a", 1, 1.5, "I"), ("b", 2, 2.5, "I")]), 0)
    v0 = t.current_version()
    big = 2**40
    t.merge(_wchanges(spark, [("a", big, 1.75, "U"), ("b", None, None, "D")],
                      n_type="bigint", x_type="double"), 1)
    diff = t.changes(v0)
    assert dict(diff.dtypes)["n"] == "bigint"
    rows = {r["k"]: (r["op"], r["n"]) for r in diff.collect()}
    assert rows["a"] == ("U", big)
    assert rows["b"][0] == "D" and rows["b"][1] == 2  # old image, upcast


# ------------------------------------------------------- delete_where


def _num_changes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, n long, op string"
    )


@pytest.fixture()
def num_table(spark, tmp_path):
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("n", T.LongType()),
    ])
    return LakeTable.create(
        spark, str(tmp_path / "nt"), schema, ["repo", "path"], n_buckets=4
    )


def test_delete_where_basic_and_time_travel(spark, num_table):
    t = num_table
    t.merge(_num_changes(spark, [
        ("r", f"p{i}", f"v{i}", i, "I") for i in range(10)
    ]), 0)
    v_before = t.current_version()
    res = t.delete_where(F.col("n") >= 7)
    assert res["deleted_rows"] == 3 and not res["skipped"]
    got = {r["path"] for r in t.read().collect()}
    assert got == {f"p{i}" for i in range(7)}
    # NULL predicate keeps the row (SQL WHERE semantics)
    t.merge(_num_changes(spark, [("r", "pn", "vn", None, "I")]), 1)
    res = t.delete_where("n >= 0")  # NULL >= 0 is NULL -> kept
    assert res["deleted_rows"] == 7
    assert {r["path"] for r in t.read().collect()} == {"pn"}
    # time travel: pre-delete version intact
    assert {r["path"] for r in t.read(version=v_before).collect()} \
        == {f"p{i}" for i in range(10)}


def test_delete_where_ranges_hint_prunes_files(spark, num_table):
    """The ranges hint must bound the rewrite set via per-file min/max
    stats: two epochs write disjoint n-ranges into each bucket; a hinted
    delete targeting the high range must scan only the high-range files
    and still produce the exact result."""
    t = num_table
    t.merge(_num_changes(
        spark, [("r", f"a{i}", "lo", i, "I") for i in range(8)]), 0)
    t.merge(_num_changes(
        spark, [("r", f"b{i}", "hi", 1000 + i, "I") for i in range(8)]), 1)
    total_files = sum(len(fs) for fs in t.snapshot().buckets.values())
    res = t.delete_where(
        F.col("n") >= 1000, ranges={"n": (1000, None)})
    assert res["deleted_rows"] == 8
    assert res["files_scanned"] < total_files, res
    assert res["files_carried"] > 0, res
    got = {r["path"] for r in t.read().collect()}
    assert got == {f"a{i}" for i in range(8)}


def test_delete_where_folds_mor_deltas(spark, num_table):
    """A delta-shadowed base row must NOT be resurrected: the bucket is
    resolved through the LWW read before the predicate applies, and its
    delta list clears (the delete doubles as localized compaction)."""
    t = num_table
    t.merge(_num_changes(spark, [
        ("r", "k1", "DELME", 1, "I"), ("r", "k2", "DELME", 2, "I"),
    ]), 0)
    # shadow k1's content via a MOR delta (newer ordinal wins at read)
    ch = _num_changes(spark, [("r", "k1", "keep", 1, "U")]) \
        .withColumn("__ordinal", F.lit(5)).withColumn("__offset", F.lit(5))
    t.merge_mor(ch, 1)
    assert any(t.snapshot().deltas.values())
    res = t.delete_where(F.col("content") == "DELME")
    # k1 resolves to 'keep' (survives); k2 is DELME (deleted)
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"k1": "keep"}
    assert res["deleted_rows"] == 1
    assert not any(t.snapshot().deltas.values())


def test_delete_where_everything_and_noop(spark, num_table):
    t = num_table
    t.merge(_num_changes(spark, [("r", "p", "v", 1, "I")]), 0)
    res = t.delete_where(F.lit(True))
    assert res["deleted_rows"] == 1
    assert t.read().count() == 0
    # empty table: nothing to scan -> skipped, no commit
    v = t.current_version()
    res = t.delete_where(F.lit(True))
    assert res["skipped"] and t.current_version() == v


# --------------------------------------------------- delete_where mode=mor


def _del_changes(spark, rows):
    """Engine-shaped change set: carries the __ordinal/__offset LWW sort
    keys that mode='mor' tombstones need in the stored schema."""
    return spark.createDataFrame(
        rows,
        "repo string, path string, content string, n long, "
        "__ordinal long, __offset long, op string",
    )


@pytest.fixture()
def del_table(spark, tmp_path):
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("__ordinal", T.LongType()),
        T.StructField("__offset", T.LongType()),
    ])
    return LakeTable.create(
        spark, str(tmp_path / "ot"), schema, ["repo", "path"], n_buckets=4
    )


def test_delete_where_mor_tombstones_no_base_rewrite(spark, del_table):
    """mode='mor': matching rows vanish from read() via tombstone
    deltas; base files are untouched (O(matches) write, the 100 TB
    erasure path); time travel still serves the pre-delete state."""
    t = del_table
    t.merge(_del_changes(spark, [
        ("r", f"p{i}", f"v{i}", i, i, i, "I") for i in range(10)
    ]), 0)
    v_before = t.current_version()
    base_before = {b: list(fs) for b, fs in t.snapshot().buckets.items()}
    res = t.delete_where(F.col("n") >= 7, mode="mor")
    assert res["mode"] == "mor" and not res["skipped"]
    assert res["deleted_rows"] == 3
    assert {r["path"] for r in t.read().collect()} == {f"p{i}" for i in range(7)}
    snap = t.snapshot()
    assert snap.buckets == base_before, "mor delete must not rewrite bases"
    assert any(snap.deltas.values()), "tombstones must land as deltas"
    assert {r["path"] for r in t.read(version=v_before).collect()} \
        == {f"p{i}" for i in range(10)}
    # tombstones carry no erased content: delta rows for deleted keys
    # are 'D' with NULL payload
    delta_paths = [os.path.join(t.path, f)
                   for fs in snap.deltas.values() for f in fs]
    d = spark.read.parquet(*delta_paths)
    assert d.count() == 3
    assert d.where(F.col("__op") != "D").count() == 0
    assert d.where(F.col("content").isNotNull() | F.col("n").isNotNull()).count() == 0


def test_delete_where_mor_upsert_resurrects_key(spark, del_table):
    """A later real event (higher ordinal) must win over the tombstone —
    the same post-delete-upsert semantics as the COW path."""
    t = del_table
    t.merge(_del_changes(spark, [
        ("r", "p1", "v1", 1, 1, 1, "I"), ("r", "p2", "v2", 2, 2, 2, "I"),
    ]), 0)
    t.delete_where(F.col("path") == "p1", mode="mor")
    assert {r["path"] for r in t.read().collect()} == {"p2"}
    t.merge_mor(_del_changes(spark, [("r", "p1", "back", 9, 100, 100, "U")]), 1)
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"p1": "back", "p2": "v2"}


def test_delete_where_mor_compact_purges_physically(spark, del_table):
    """compact() folds the tombstones: read unchanged, deltas cleared,
    and the new base files no longer contain the erased rows — the
    delete→compact→vacuum physical-purge pipeline."""
    t = del_table
    t.merge(_del_changes(spark, [
        ("r", f"p{i}", f"v{i}", i, i, i, "I") for i in range(6)
    ]), 0)
    t.delete_where(F.col("n") % 2 == 0, mode="mor")
    want = {r["path"] for r in t.read().collect()}
    assert want == {"p1", "p3", "p5"}
    t.compact()
    snap = t.snapshot()
    assert not any(snap.deltas.values())
    assert {r["path"] for r in t.read().collect()} == want
    base = spark.read.parquet(
        *[os.path.join(t.path, f) for fs in snap.buckets.values() for f in fs]
    )
    assert {r["path"] for r in base.collect()} == want, \
        "erased rows must be physically absent from the compacted base"


def test_delete_where_mor_resolves_shadowed_winner(spark, del_table):
    """The predicate applies to the RESOLVED state: a base row shadowed
    by a newer delta must not be tombstoned on its stale content."""
    t = del_table
    t.merge(_del_changes(spark, [
        ("r", "k1", "DELME", 1, 1, 1, "I"), ("r", "k2", "DELME", 2, 2, 2, "I"),
    ]), 0)
    t.merge_mor(_del_changes(spark, [("r", "k1", "keep", 1, 5, 5, "U")]), 1)
    res = t.delete_where(F.col("content") == "DELME", mode="mor")
    assert res["deleted_rows"] == 1
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"k1": "keep"}


def test_delete_where_mor_hint_prunes_and_noop_skips(spark, del_table):
    """ranges hints bound the scan in mor mode too; a no-match delete
    commits nothing."""
    t = del_table
    t.merge(_del_changes(
        spark, [("r", f"a{i}", "lo", i, i, i, "I") for i in range(8)]), 0)
    t.merge(_del_changes(
        spark, [("r", f"b{i}", "hi", 1000 + i, 100 + i, 100 + i, "I")
                for i in range(8)]), 1)
    total_files = sum(len(fs) for fs in t.snapshot().buckets.values())
    res = t.delete_where(F.col("n") >= 1000, ranges={"n": (1000, None)},
                         mode="mor")
    assert res["deleted_rows"] == 8
    assert res["files_scanned"] < total_files
    assert res["files_carried"] > 0
    assert {r["path"] for r in t.read().collect()} == {f"a{i}" for i in range(8)}
    v = t.current_version()
    res = t.delete_where(F.col("n") < 0, ranges={"n": (None, -1)}, mode="mor")
    assert res["skipped"] and t.current_version() == v


def test_delete_where_mor_requires_sort_keys(spark, num_table):
    """A table whose stored schema lacks __ordinal/__offset cannot
    express a winning tombstone — loud ValueError, not a wrong fold."""
    t = num_table
    t.merge(_num_changes(spark, [("r", "p", "v", 1, "I")]), 0)
    with pytest.raises(ValueError, match="mor"):
        t.delete_where(F.lit(True), mode="mor")


# ---------------------------------------------------------------- clone


def _clone_changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "repo string, path string, content string, "
        "__ordinal long, __offset long, op string",
    )


def _clone_src(spark, tmp_path):
    """Source with COW bases, MOR deltas, lineage, and a tag."""
    schema = T.StructType(
        list(SCHEMA)
        + [T.StructField("__ordinal", T.LongType()),
           T.StructField("__offset", T.LongType())]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "src"), schema, ["repo", "path"], n_buckets=4
    )
    t.merge(
        _clone_changes(spark, [("r1", "a", "v1", 0, 0, "I"), ("r2", "b", "v1", 0, 1, "I")]),
        0,
        lineage_update={0: {"last_applied_offset": 10, "rows_applied": 2, "bytes": 64}},
    )
    t.tag("fork-point")
    v1 = t.current_version()
    t.merge_mor(
        _clone_changes(spark, [("r1", "a", "v2", 1, 2, "U"), ("r3", "c", "v1", 1, 3, "I")]), 1
    )
    return t, v1


def test_clone_zero_copy_reads_equal(spark, tmp_path):
    """A shallow clone reads byte-identically to its source (bases AND
    unfolded MOR deltas) while moving ZERO data bytes: its data dir is
    empty and every referenced file is an absolute path into the
    source's root."""
    src, _ = _clone_src(spark, tmp_path)
    c = LakeTable.clone(spark, src.path, str(tmp_path / "c"))
    assert sorted(map(tuple, c.read().collect())) == sorted(
        map(tuple, src.read().collect())
    )
    assert os.listdir(os.path.join(c.path, "data")) == []
    snap = c.snapshot()
    refs = [f for fs in list(snap.buckets.values()) + list(snap.deltas.values()) for f in fs]
    assert refs and all(f.startswith(src.path + os.sep) for f in refs)
    # stats/bloom keys follow the file refs (pruning still works)
    assert all(k.startswith(src.path + os.sep) for k in snap.stats)
    # fresh identity: no tags/refs, version line restarts at 0
    assert snap.tags == {} and snap.refs == {} and snap.version == 0
    # lineage watermarks carried: the clone is a what-if CDC fork
    assert snap.lineage == src.snapshot().lineage
    assert snap.lineage["0"]["last_applied_offset"] == 10


def test_clone_writes_are_independent(spark, tmp_path):
    """Divergence: writes to the clone land under ITS root and never
    touch the source; the source keeps evolving without moving the
    clone."""
    src, _ = _clone_src(spark, tmp_path)
    c = LakeTable.clone(spark, src.path, str(tmp_path / "c"))
    src_files_before = {
        f for fs in src.snapshot().buckets.values() for f in fs
    }
    c.merge(_clone_changes(spark, [("r9", "z", "clone-only", 2, 10, "I")]), 99)
    src2 = LakeTable.load(spark, src.path)
    assert {f for fs in src2.snapshot().buckets.values() for f in fs} == src_files_before
    assert src2.read().where("repo = 'r9'").count() == 0
    src.merge(_clone_changes(spark, [("r8", "y", "src-only", 2, 11, "I")]), 2)
    assert c.read().where("repo = 'r8'").count() == 0
    assert c.read().where("repo = 'r9'").count() == 1


def test_clone_at_version_and_tag(spark, tmp_path):
    """version= / tag= pick the fork point; both together is an error."""
    src, v1 = _clone_src(spark, tmp_path)
    by_v = LakeTable.clone(spark, src.path, str(tmp_path / "cv"), version=v1)
    by_tag = LakeTable.clone(spark, src.path, str(tmp_path / "ct"), tag="fork-point")
    want = sorted(map(tuple, src.read(version=v1).collect()))
    assert sorted(map(tuple, by_v.read().collect())) == want
    assert sorted(map(tuple, by_tag.read().collect())) == want
    with pytest.raises(ValueError, match="at most one"):
        LakeTable.clone(spark, src.path, str(tmp_path / "cx"), version=v1, tag="fork-point")
    with pytest.raises(ValueError, match="already exists"):
        LakeTable.clone(spark, src.path, str(tmp_path / "cv"))


def test_clone_wap_source_defaults_to_published(spark, tmp_path):
    """Cloning a WAP-staging source forks what CONSUMERS see (the
    published ref), not the unaudited staging head; version= still
    reaches the staging head explicitly."""
    src, _ = _clone_src(spark, tmp_path)
    src.begin_staging()
    src.merge(_clone_changes(spark, [("r7", "w", "staged", 2, 12, "I")]), 5)
    pub = src.published_version()
    c = LakeTable.clone(spark, src.path, str(tmp_path / "c"))
    assert sorted(map(tuple, c.read().collect())) == sorted(
        map(tuple, src.read(version=pub).collect())
    )
    head = LakeTable.clone(
        spark, src.path, str(tmp_path / "ch"), version=src.current_version()
    )
    assert head.read().where("repo = 'r7'").count() == 1


def test_clone_compact_localizes_then_survives_source_vacuum(spark, tmp_path):
    """The deep-copy escape hatch: compact(0) rewrites every referenced
    byte under the clone's root; afterwards reclaiming the source
    entirely leaves the clone readable. Without localization, a source
    vacuum that drops the forked version breaks the clone LOUDLY at
    scan time (the documented Delta-shallow-clone caveat)."""
    import shutil

    src, _ = _clone_src(spark, tmp_path)
    broken = LakeTable.clone(spark, src.path, str(tmp_path / "b"))
    c = LakeTable.clone(spark, src.path, str(tmp_path / "c"))
    c.compact(max_files_per_bucket=0)
    snap = c.snapshot()
    refs = [f for fs in list(snap.buckets.values()) + list(snap.deltas.values()) for f in fs]
    assert refs and not any(f.startswith(src.path + os.sep) for f in refs)
    rows = sorted(map(tuple, c.read().collect()))
    shutil.rmtree(os.path.join(src.path, "data"))
    assert sorted(map(tuple, c.read().collect())) == rows
    with pytest.raises(Exception):
        broken.read().collect()


def test_files_metadata_table(spark, tmp_path):
    """files() = Iceberg tbl.files analog: one row per live file at a
    snapshot, with bucket/kind/delta-seq, on-disk size, and the pruning
    axes (stat/bloom columns) each file carries; time travel via
    version=; MOR deltas appear with their chain position and vanish
    after compact; sizes agree with the filesystem."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4,
        bloom_cols=["repo"],
    )
    def _ord(df, start):
        return df.withColumn("__ordinal", F.lit(start) + F.monotonically_increasing_id()) \
                 .withColumn("__offset", F.col("__ordinal"))

    t.merge(_ord(_changes(spark, [("r1", "a", "v1", "I"), ("r2", "b", "v1", "I")]), 0), 0)
    v0 = t.current_version()
    t.merge_mor(_ord(_changes(spark, [("r1", "a", "v2", "U"), ("r3", "c", "v1", "I")]), 10), 1)

    f = t.files().collect()
    snap = t.snapshot()
    n_base = sum(len(fs) for fs in snap.buckets.values())
    n_delta = sum(len(fs) for fs in snap.deltas.values())
    assert len(f) == n_base + n_delta
    kinds = {r["kind"] for r in f}
    assert kinds == {"base", "delta"}  # MOR second epoch wrote deltas
    for r in f:
        full = os.path.join(t.path, r["path"])
        assert os.path.exists(full), r["path"]
        assert r["size_bytes"] == os.path.getsize(full)
        assert 0 <= r["bucket"] < 4
        assert (r["seq"] == -1) == (r["kind"] == "base")
    # the reported pruning axes are exactly the snapshot's stat/bloom
    # maps (stats are numeric-only by design — this schema is strings,
    # so stat_cols is whatever numeric internals each footer carried)
    base = [r for r in f if r["kind"] == "base"]
    for r in f:
        # stat_cols surfaces only PRUNING axes — the __rows bookkeeping
        # entry shows up in the dedicated rows column instead
        assert set(r["stat_cols"]) == {
            k for k in snap.stats.get(r["path"], {}) if not k.startswith("__")
        }, r["path"]
        assert set(r["bloom_cols"]) == set(snap.blooms.get(r["path"], {})), r["path"]
    # per-file footer row counts ride the inventory (base files only;
    # delta rows are unresolved until folded)
    assert all(r["rows"] >= 1 for r in base)
    assert all(r["rows"] == -1 for r in f if r["kind"] == "delta")
    # the configured bloom column is present on every base file
    assert base and all("repo" in r["bloom_cols"] for r in base)
    # time travel: the v0 inventory has no deltas and fewer files
    f0 = t.files(version=v0).collect()
    assert {r["kind"] for r in f0} == {"base"}
    assert all(r["version"] == v0 for r in f0)
    # compact folds the chains: delta rows disappear, state unchanged
    before = sorted(map(tuple, t.read().collect()))
    t.compact()
    f2 = t.files().collect()
    assert {r["kind"] for r in f2} == {"base"}
    assert sorted(map(tuple, t.read().collect())) == before


def test_row_count_metadata_and_fold_paths(spark, tmp_path):
    """row_count(): exact from footer metadata on delta-free buckets,
    exact through the LWW fold where deltas are pending, correct across
    compaction, deletes, and time travel."""
    t = LakeTable.create(spark, str(tmp_path / "rc"), SCHEMA, ["repo", "path"],
                         n_buckets=4)

    def _ord(df, start):
        return df.withColumn("__ordinal", F.lit(start) + F.monotonically_increasing_id()) \
                 .withColumn("__offset", F.col("__ordinal"))

    rows = [(f"r{i}", f"p{i}", "v1", "I") for i in range(30)]
    t.merge(_ord(_changes(spark, rows), 0), 0)
    v0 = t.current_version()
    assert t.row_count() == 30 == t.read().count()
    # MOR deltas: 5 updates (no net change) + 3 deletes + 2 inserts
    ups = [(f"r{i}", f"p{i}", "v2", "U") for i in range(5)]
    dels = [(f"r{i}", f"p{i}", None, "D") for i in range(5, 8)]
    ins = [(f"n{i}", f"q{i}", "v1", "I") for i in range(2)]
    t.merge_mor(_ord(_changes(spark, ups + dels + ins), 100), 1)
    assert t.row_count() == 29 == t.read().count()  # fold path exact
    # compaction folds the deltas -> back to pure metadata; the output
    # sizing knob splits each rewritten bucket across multiple files
    # (file size bounds task parallelism at scale, not bucket count)
    t.compact(target_files_per_bucket=3)
    snap = t.snapshot()
    assert not any(fs for fs in snap.deltas.values())
    assert any(len(fs) > 1 for fs in snap.buckets.values())
    assert t.row_count() == 29 == t.read().count()
    # per-output-file stats were re-harvested (row counts included)
    live = {f for fs in snap.buckets.values() for f in fs}
    assert {f for f in snap.stats if "__rows" in snap.stats[f]} == live
    # a plain follow-up compact repacks to one file per bucket
    t.compact(max_files_per_bucket=1)
    assert all(len(fs) <= 1 for fs in t.snapshot().buckets.values())
    assert t.row_count() == 29
    # time travel counts the old snapshot
    assert t.row_count(version=v0) == 30


def test_read_columns_projection_through_mor_fold(spark, tmp_path):
    """read(columns=...) pushes projection through the merge-on-read
    fold. The LWW resolution aggregates max_by(struct(<all payload>)),
    which blocks Catalyst column pruning — without the parameter a
    2-column query scans EVERY column chunk of every delta-bearing
    file. With it, the parquet ReadSchema itself is narrow, and the
    result is value-identical to selecting from the full read."""
    wide = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("stars", T.LongType()),
    ])

    def _rows(spark, rows, start):
        df = spark.createDataFrame(
            rows, "repo string, path string, content string, lang string, "
                  "stars long, op string")
        return df.withColumn(
            "__ordinal", F.lit(start) + F.monotonically_increasing_id()
        ).withColumn("__offset", F.col("__ordinal"))

    t = LakeTable.create(spark, str(tmp_path / "t"), wide, ["repo", "path"], n_buckets=4)
    t.merge(_rows(spark, [
        ("r1", "a", "v1", "py", 10, "I"), ("r2", "b", "v1", "md", 20, "I"),
    ], 0), 0)
    t.merge_mor(_rows(spark, [
        ("r1", "a", "v2", "py", 11, "U"), ("r3", "c", "v1", "rs", 5, "I"),
        ("r2", "b", None, None, None, "D"),
    ], 10), 1)

    full = t.read().select("repo", "path", "lang").orderBy("repo", "path")
    narrow = t.read(columns=["lang"]).orderBy("repo", "path")
    assert sorted(narrow.columns) == ["lang", "path", "repo"]  # keys ride along
    assert [tuple(r) for r in narrow.collect()] == [tuple(r) for r in full.collect()]

    # the parquet scan itself is narrow: heavy columns never read
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    read_schemas = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    assert read_schemas, "no parquet scan in plan"
    for rs in read_schemas:
        assert "content" not in rs and "stars" not in rs, rs
        assert "lang" in rs or "__op" in rs, rs

    # unknown column fails loudly; key column request is idempotent
    with pytest.raises(ValueError, match="unknown columns"):
        t.read(columns=["nope"])
    assert sorted(t.read(columns=["repo"]).columns) == ["path", "repo"]


def test_string_stats_truncated_bounds_and_pruning(spark, tmp_path):
    """String columns now carry footer min/max into the snapshot with
    Iceberg-style truncate(16) bounds — prefix lower bound, incremented-
    prefix upper bound — so read(ranges=...) prunes files on string
    predicates (repo prefixes, ISO dates) without the snapshot storing
    whole document values."""
    from rook_spark.lake.table import _STR_STAT_LEN, _truncate_upper

    # bound function: exact when short; strictly-greater 16-char bound
    # when long; bump skips unincrementable tail; all-max -> no bound
    assert _truncate_upper("short") == "short"
    long = "m" * 40
    u = _truncate_upper(long)
    assert len(u) == _STR_STAT_LEN and u > long
    bumped = _truncate_upper("a" * 15 + chr(0x10FFFF) * 25)
    assert bumped == "a" * 14 + "b" and bumped > "a" * 15 + chr(0x10FFFF) * 25
    assert _truncate_upper(chr(0x10FFFF) * 20) is None

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         ["repo", "path"], n_buckets=8)

    def batch(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, content string, op string")

    t.merge(batch([("r", f"p{i:03d}", f"aaa-document-{i:03d}-" + "x" * 40, "I")
                   for i in range(64)]), 0)
    t.merge(batch([("r", f"q{i}", f"zzz-document-{i}-" + "y" * 40, "I")
                   for i in range(3)]), 1)

    # bounds in the snapshot are truncated, and the upper REALLY bounds
    snap = t.snapshot()
    content_bounds = [mm["content"] for mm in snap.stats.values()
                      if "content" in mm]
    assert content_bounds
    for lo, hi in content_bounds:
        assert len(lo) <= _STR_STAT_LEN
        assert hi is None or len(hi) <= _STR_STAT_LEN
    # epoch-1-only files bound below "z" (prunable); the buckets epoch 2
    # rewrote hold both bands, so their upper covers the z rows (kept)
    assert any(hi is not None and hi < "z" for _, hi in content_bounds)
    assert any(hi is None or hi >= "zzz-document-0" for _, hi in content_bounds)

    # pruning: the z-band scan skips the 5+ buckets epoch 2 never touched
    full = t.read()
    n_full = full.select(F.input_file_name()).distinct().count()
    pruned = t.read(ranges={"content": ("z", None)})
    assert pruned.select(F.input_file_name()).distinct().count() < n_full
    got = {r["path"] for r in pruned.where("content >= 'z'").collect()}
    assert got == {"q0", "q1", "q2"}
    # superset contract: exact filter over pruned scan == full-scan filter
    a = sorted(r["path"] for r in pruned.where("content like 'zzz%'").collect())
    b = sorted(r["path"] for r in full.where("content like 'zzz%'").collect())
    assert a == b
    # mixed-type hint proves nothing and keeps every file (no crash)
    assert t.read(ranges={"content": (0, 5)}).count() == full.count()


def test_vacuum_dry_run_predicts_real_run(spark, tmp_path):
    """vacuum(dry_run=True) (Delta VACUUM DRY RUN analog) computes the
    exact reclamation — counts AND the candidate file list — while
    deleting nothing; the subsequent real run removes precisely what
    the dry run predicted. Mutating nothing also makes it legal inside
    an open catalog group, where a real vacuum refuses."""
    import glob as _glob

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["k"], n_buckets=2)

    def batch(rows):
        return spark.createDataFrame(rows, "k long, v long, op string")

    for e in range(4):  # 4 COW epochs over the same keys -> 3 dead file sets
        t.merge(batch([(k, e * 10 + k, "I") for k in range(6)]), e)

    on_disk = lambda: {os.path.relpath(f, t.path) for f in _glob.glob(
        os.path.join(t.path, "data", "**", "*.parquet"), recursive=True)}
    before = on_disk()
    v = t.current_version()

    dry = t.vacuum(keep_last=2, dry_run=True)
    assert dry["dry_run"] and dry["removed_files"] == len(dry["files"]) > 0
    assert on_disk() == before                     # nothing deleted
    assert t.current_version() == v
    t.read(version=v - 3).collect()                # old versions still read

    # dry run is allowed mid-group; a real vacuum refuses
    t._store.in_active_group = lambda: True
    assert t.vacuum(keep_last=2, dry_run=True)["files"] == dry["files"]
    with pytest.raises(RuntimeError, match="catalog group"):
        t.vacuum(keep_last=2)
    del t._store.in_active_group

    real = t.vacuum(keep_last=2)
    assert real["removed_files"] == dry["removed_files"]
    assert real["removed_snapshots"] == dry["removed_snapshots"]
    assert real["removed_manifests"] == dry["removed_manifests"]
    assert before - on_disk() == set(dry["files"])  # exactly as predicted


def test_verify_integrity_fsck(spark, tmp_path):
    """FSCK matrix: a healthy multi-version table passes (deep footer
    check included); a planted unreferenced file is ORPHAN-reported but
    never an error; a tampered __rows stat in the manifest blob is
    caught only by deep=True; a hand-deleted manifest blob makes
    exactly that version unreadable; deleting a referenced data file is
    a loud miss (strict raises)."""
    import glob
    import json
    import os

    from rook_spark.lake.table import LakeTable as LT

    t = LT.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4)
    t.merge(_changes(spark, [("r1", "a", "v1", "I"), ("r2", "b", "v1", "I")]), 0)
    t.merge(_changes(spark, [("r1", "a", "v2", "U"), ("r3", "c", "v1", "I")]), 1)

    rep = t.verify_integrity(all_versions=True, deep=True)
    assert rep["ok"] and rep["files_checked"] > 0
    assert rep["missing_files"] == [] and rep["stat_mismatches"] == []
    assert rep["orphans"] == [] and rep["unreadable_versions"] == []
    assert rep["blob_hash_mismatches"] == []

    # planted junk file -> orphan, not an error
    junk = tmp_path / "t" / "data" / "planted.parquet"
    junk.write_bytes(b"not a real parquet")
    rep = t.verify_integrity()
    assert rep["ok"] and any("planted" in o for o in rep["orphans"])
    os.remove(junk)

    # tampered __rows stat inside a manifest blob -> deep catches it
    # (fresh LakeTable.load each probe: the live object caches blobs)
    blob_dir = str(tmp_path / "t" / "_meta" / "manifests")
    cur = json.loads(t._store.read(t.current_version()))
    key = next(iter(cur["manifest_refs"].values()))
    bp = os.path.join(blob_dir, f"{key}.json")
    blob = json.loads(open(bp).read())
    victim_bucket = next(b for b, e in blob.items() if e.get("stats"))
    victim = next(f for f, st in blob[victim_bucket]["stats"].items()
                  if "__rows" in st)
    blob[victim_bucket]["stats"][victim]["__rows"][0] += 5
    open(bp, "w").write(json.dumps(blob, sort_keys=True))
    tampered = LT.load(spark, str(tmp_path / "t")).verify_integrity(deep=True)
    assert tampered["stat_mismatches"]
    # deep also re-hashes the blob against its content-addressed key
    assert key in tampered["blob_hash_mismatches"]
    assert LT.load(spark, str(tmp_path / "t")).verify_integrity(
        deep=False)["ok"]
    blob[victim_bucket]["stats"][victim]["__rows"][0] -= 5
    open(bp, "w").write(json.dumps(blob, sort_keys=True))
    assert LT.load(spark, str(tmp_path / "t")).verify_integrity(
        deep=True)["blob_hash_mismatches"] == []

    # a deleted manifest blob referenced ONLY by an old version makes
    # exactly that version unreadable under all_versions
    v_old, v_new = t.current_version() - 1, t.current_version()
    refs_old = set(json.loads(t._store.read(v_old))["manifest_refs"].values())
    refs_new = set(json.loads(t._store.read(v_new))["manifest_refs"].values())
    only_old = refs_old - refs_new
    assert only_old  # content addressing: changed groups get new keys
    if True:
        os.remove(os.path.join(blob_dir, f"{next(iter(only_old))}.json"))
        rep = LT.load(spark, str(tmp_path / "t")).verify_integrity(
            all_versions=True)
        assert [v for v, _ in rep["unreadable_versions"]] == [v_old]
        assert not rep["ok"]

    # deleted referenced data file -> missing + strict raises
    ref = t.files().where("kind = 'base'").first()["path"]
    os.remove(os.path.join(str(tmp_path / "t"), ref))
    rep = t.verify_integrity()
    assert not rep["ok"] and ref in rep["missing_files"]
    with pytest.raises(RuntimeError, match="integrity"):
        t.verify_integrity(strict=True)


def test_repair_drops_missing_refs_loudly(spark, tmp_path):
    """FSCK repair: after an unrecoverable file loss, repair() commits
    one metadata-only snapshot dropping the dead references — the table
    reads again, the loss is quantified (footer-count rows_lost),
    integrity goes green, a second repair is a commit-free no-op, and
    the PRE-repair version keeps its broken refs for audit."""
    import os

    from rook_spark.lake.table import LakeTable as LT

    t = LT.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4)
    t.merge(_changes(spark, [
        ("r1", "a", "v1", "I"), ("r2", "b", "v1", "I"),
        ("r3", "c", "v1", "I"), ("r4", "d", "v1", "I")]), 0)
    before = t.read().count()
    assert before == 4

    victim = t.files().where("kind = 'base'").first()
    os.remove(os.path.join(str(tmp_path / "t"), victim["path"]))
    broken_v = t.current_version()

    rep = t.repair()
    assert not rep["ok"]
    assert rep["dropped_base_files"] == [victim["path"]]
    assert rep["rows_lost"] == victim["rows"] and rep["rows_unknown"] == 0
    assert t.read().count() == before - victim["rows"]
    assert t.verify_integrity()["ok"]
    assert t.history().where("op = 'repair'").count() == 1

    # second repair: nothing missing -> no commit
    v = t.current_version()
    again = t.repair()
    assert again["ok"] and t.current_version() == v

    # pre-repair version keeps the dead ref (audit), listed at size -1
    f = {r["path"]: r for r in t.files(version=broken_v).collect()}
    assert f[victim["path"]]["size_bytes"] == -1

    # surviving keys still upsert normally after the repair
    t.merge(_changes(spark, [("r9", "z", "v1", "I")]), 1)
    assert t.read().count() == before - victim["rows"] + 1


def test_health_report(spark, tmp_path):
    """health() = the O(metadata) day-2 dashboard: file/byte census per
    snapshot, MOR delta-chain depth with compact advice, small-file and
    skew signals, missing-file fsck advice; zero Spark jobs, agrees
    with files(); compact clears the depth advice."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4,
    )

    def _ord(df, start):
        return df.withColumn(
            "__ordinal", F.lit(start) + F.monotonically_increasing_id()
        ).withColumn("__offset", F.col("__ordinal"))

    t.merge(_ord(_changes(spark, [("r1", "a", "v1", "I"), ("r2", "b", "v1", "I")]), 0), 0)
    # three MOR epochs: delta chains deepen past the default threshold
    t.merge_mor(_ord(_changes(spark, [("r1", "a", "v2", "U")]), 10), 1)
    t.merge_mor(_ord(_changes(spark, [("r1", "a", "v3", "U")]), 20), 2)
    t.merge_mor(_ord(_changes(spark, [("r1", "a", "v4", "U")]), 30), 3)

    h = t.health(compact_depth=3)
    f = t.files().collect()
    assert h["version"] == t.current_version()
    assert h["base_files"] == sum(1 for r in f if r["kind"] == "base")
    assert h["delta_files"] == sum(1 for r in f if r["kind"] == "delta")
    assert h["total_bytes"] == sum(r["size_bytes"] for r in f)
    assert h["max_delta_depth"] == 3
    assert h["buckets_over_depth"] == 1
    assert h["missing_files"] == 0
    assert h["n_buckets"] == 4 and 1 <= h["live_buckets"] <= 4
    assert h["versions_retained"] >= 1
    # local tiny files: everything is "small", so the census fires
    assert h["small_files"] == h["base_files"]
    assert any(a.startswith("compact:") and "delta depth" in a for a in h["advice"])

    # compact folds the chains -> depth advice clears
    t.compact()
    h2 = t.health(compact_depth=3)
    assert h2["max_delta_depth"] == 0 and h2["buckets_over_depth"] == 0
    assert not any("delta depth" in a for a in h2["advice"])

    # sabotage one referenced file -> fsck advice
    victim = os.path.join(t.path, [r["path"] for r in t.files().collect()][0])
    os.remove(victim)
    h3 = t.health()
    assert h3["missing_files"] == 1
    assert any(a.startswith("fsck:") for a in h3["advice"])
