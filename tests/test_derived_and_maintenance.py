"""J3 derived rollup (incremental == full recompute) and lake
maintenance (vacuum / compaction)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from rook_spark.cdc.derived import attach_rollup
from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_rollup_incremental_matches_full_recompute(spark, tmp_path):
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    rollup = attach_rollup(engine, str(tmp_path / "rollup"))
    ev = generate_events(spark, 3000, seed=13, n_repos=20, paths_per_repo=50)
    # three epochs, each refreshing only touched repos
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    got = _canon(rollup.read())
    want = _canon(rollup.full_recompute())
    assert got == want and len(got) > 5


def test_rollup_deletes_vanished_repos(spark, tmp_path):
    engine = CdcEngine(spark, str(tmp_path / "repos"))
    rollup = attach_rollup(engine, str(tmp_path / "rollup"))
    img = "struct<repo string, path string, commit string, lang string, content string>"
    schema = (
        "offset long, tx_id long, server_id long, schema_name string, table_name string, "
        f"op string, before {img}, after {img}, commit_ordinal long, "
        "source_partition int, ts timestamp"
    )
    ins = spark.createDataFrame(
        [(1, 1, 1, "rook", "repos", "I", None, ("r1", "p1", "c1", "py", "xyz"), 1, 0, None)],
        schema,
    )
    dele = spark.createDataFrame(
        [(2, 1, 1, "rook", "repos", "D", ("r1", "p1", "c1", "py", "xyz"), None, 2, 0, None)],
        schema,
    )
    engine.replay(ins, 0)
    assert rollup.read().where("repo = 'r1'").count() == 1
    engine.replay(dele, 1)
    assert rollup.read().where("repo = 'r1'").count() == 0  # parent purged


def test_multilevel_rollup_matches_full_recompute(spark, tmp_path):
    """J3 recursion: path → repo → org refreshed transitively per epoch;
    the parent-of-parent (org) rollup must equal a full recompute from
    the repo rollup after every incremental walk (the reference's
    @ContainedIn parent-reindex semantics,
    h4ftiom/IntegrationTest.java:254-368)."""
    from rook_spark.cdc.derived import attach_rollup_chain

    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    repos, orgs = attach_rollup_chain(
        engine, str(tmp_path / "repo_rollup"), str(tmp_path / "org_rollup")
    )
    ev = generate_events(spark, 3000, seed=19, n_repos=20, paths_per_repo=50)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
        assert _canon(repos.read()) == _canon(repos.full_recompute())
        assert _canon(orgs.read()) == _canon(orgs.full_recompute())
    assert orgs.read().count() > 1
    # org totals really roll up level-1 aggregates
    got_total = orgs.read().agg(F.sum("n_paths")).first()[0]
    want_total = repos.read().agg(F.sum("n_paths")).first()[0]
    assert got_total == want_total


def test_multilevel_rollup_purges_vanished_parents(spark, tmp_path):
    """Deleting a repo's last file purges the repo rollup row AND, if the
    org loses its last repo, the org row too (parent purge up the chain)."""
    from rook_spark.cdc.derived import attach_rollup_chain

    engine = CdcEngine(spark, str(tmp_path / "repos"))
    repos, orgs = attach_rollup_chain(
        engine, str(tmp_path / "repo_rollup"), str(tmp_path / "org_rollup")
    )
    img = "struct<repo string, path string, commit string, lang string, content string>"
    schema = (
        "offset long, tx_id long, server_id long, schema_name string, table_name string, "
        f"op string, before {img}, after {img}, commit_ordinal long, "
        "source_partition int, ts timestamp"
    )
    # two repos in DIFFERENT orgs (org = last repo-name char)
    ins = spark.createDataFrame(
        [
            (1, 1, 1, "rook", "repos", "I", None, ("r1", "p1", "c1", "py", "xyz"), 1, 0, None),
            (2, 1, 1, "rook", "repos", "I", None, ("r2", "p2", "c2", "py", "abc"), 2, 0, None),
        ],
        schema,
    )
    engine.replay(ins, 0)
    assert orgs.read().where("org = 'org-1'").first()["n_repos"] == 1
    assert orgs.read().where("org = 'org-2'").first()["n_repos"] == 1
    dele = spark.createDataFrame(
        [(3, 2, 1, "rook", "repos", "D", ("r1", "p1", "c1", "py", "xyz"), None, 3, 0, None)],
        schema,
    )
    engine.replay(dele, 1)
    assert repos.read().where("repo = 'r1'").count() == 0  # parent purged
    assert orgs.read().where("org = 'org-1'").count() == 0  # parent-of-parent purged
    assert orgs.read().where("org = 'org-2'").count() == 1  # untouched org intact


def test_propagate_cycle_guard_terminates(spark, tmp_path):
    """A cyclic containment spec (level chain longer than the list, or a
    self-referential walk) refreshes each level at most once per batch —
    the IndexingLog analog (DefaultRowsMutationIndexer.java:90-123)."""
    from rook_spark.cdc.derived import (
        ContainmentLevel,
        Rollup,
        propagate,
    )
    from pyspark.sql import types as T

    calls = []

    class CountingRollup(Rollup):
        def refresh(self, changed_keys):
            calls.append(self.key_col)
            return {"skipped": True}

    schema = T.StructType([T.StructField("k", T.StringType(), False),
                           T.StructField("n", T.LongType())])
    src = spark.createDataFrame([("a", 1)], schema)
    r = CountingRollup(spark, str(tmp_path / "cyc"), schema, "k",
                       lambda: src, lambda: [F.count(F.lit(1)).alias("n")])
    levels = [ContainmentLevel(r, lambda keys: keys.select("k")),
              ContainmentLevel(r, lambda keys: keys.select("k"))]
    # a TRUE cycle: level 0 contained in 1, level 1 contained in 0
    order = propagate(levels, src.select("k"), edges={0: [1], 1: [0]})
    assert calls == ["k", "k"]  # each level refreshed exactly once, then stop
    # self-cycle
    calls.clear()
    order = propagate(levels, src.select("k"), edges={0: [0]})
    assert len(order) == len(calls) == 1


def test_vacuum_reclaims_old_versions(spark, tmp_path):
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    ev = generate_events(spark, 1200, seed=17, n_repos=5, paths_per_repo=20)
    for i, (lo, hi) in enumerate([(0, 400), (400, 800), (800, 1200)]):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    t = engine.target()
    before_state = _canon(t.read())
    n_files_before = len(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True))
    res = t.vacuum(keep_last=1)
    assert res["removed_files"] > 0
    n_files_after = len(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True))
    assert n_files_after < n_files_before
    # current state untouched
    assert _canon(t.read()) == before_state


def test_compact_merges_small_files(spark, tmp_path):
    from pyspark.sql import types as T

    from rook_spark.lake.table import LakeTable

    schema = T.StructType(
        [T.StructField("repo", T.StringType()), T.StructField("path", T.StringType()),
         T.StructField("content", T.StringType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["repo", "path"], n_buckets=2)
    # force multi-file buckets by lying in the snapshot? No — merge writes
    # one file per bucket; simulate fragmentation via repeated overwrite
    # merges then verify compact() no-ops (1 file) and after manual
    # fragmentation compacts back to 1.
    rows = [(f"r{i}", f"p{i}", "v") for i in range(40)]
    # bulk load from many input partitions: partitionBy writes one file
    # per (task, bucket) -> real multi-file buckets
    df = spark.createDataFrame(rows, schema).repartition(4)
    t.overwrite(df)
    assert any(len(fs) > 1 for fs in t.snapshot().buckets.values())
    state_before = _canon(t.read())
    res = t.compact()
    assert res["compacted_buckets"] >= 1
    assert all(len(fs) == 1 for fs in t.snapshot().buckets.values())
    assert _canon(t.read()) == state_before  # content preserved


def test_join_table_containment_level(spark, tmp_path):
    """Many-to-many containment via a JOIN TABLE (the reference resolves
    @ContainedIn through association tables,
    fulltextindex/SynchronizationContext.java:165-189): the parent_keys
    edge of a ContainmentLevel is a join against the mapping, and the
    team rollup aggregates the main table THROUGH the mapping. Changed
    repos refresh exactly the teams that contain them."""
    from pyspark.sql import types as T

    from rook_spark.cdc.derived import ContainmentLevel, Rollup, propagate, repo_rollup

    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    target = engine.target()
    # mapping table: repo -> teams (many-to-many; repo-0000 in two teams)
    mapping = spark.createDataFrame(
        [("repo-0000", "team-a"), ("repo-0000", "team-b"),
         ("repo-0001", "team-a"), ("repo-0002", "team-b"),
         ("repo-0003", "team-c")],
        "repo string, team string",
    )
    team_schema = T.StructType([
        T.StructField("team", T.StringType(), False),
        T.StructField("n_paths", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ])
    repos = repo_rollup(engine.spark, str(tmp_path / "rr"), target)
    teams = Rollup(
        engine.spark, str(tmp_path / "tr"), team_schema, key_col="team",
        source=lambda: target.read().join(mapping, "repo"),
        agg_exprs=lambda: [
            F.count(F.lit(1)).alias("n_paths"),
            F.sum(F.length("content")).alias("total_bytes"),
        ],
    )
    levels = [
        ContainmentLevel(repos, lambda keys: keys.select("repo")),
        ContainmentLevel(
            teams,
            # join-table edge: changed repos -> containing teams
            lambda keys: keys.select("repo").join(mapping, "repo").select("team"),
        ),
    ]
    engine.with_sink("chain", lambda flat, bid: propagate(levels, flat.select("repo")))

    ev = generate_events(spark, 2000, seed=37, n_repos=6, paths_per_repo=30)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000)]):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
        assert _canon(teams.read()) == _canon(teams.full_recompute())
    got = teams.read()
    assert got.count() >= 2
    # repo-0000 counts into BOTH team-a and team-b (many-to-many)
    main = engine.target().read()
    n_r0 = main.where("repo = 'repo-0000'").count()
    if n_r0:
        ta = {r["team"]: r["n_paths"] for r in got.collect()}
        base = {
            r["repo"]: r["n"]
            for r in main.groupBy("repo").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert ta["team-a"] == base.get("repo-0000", 0) + base.get("repo-0001", 0)
        assert ta["team-b"] == base.get("repo-0000", 0) + base.get("repo-0002", 0)


def test_rollup_survives_fresh_checkpoint_restart(spark, tmp_path):
    """Regression (round-2 review): the rollup's MERGE must not fence on
    the caller's foreachBatch id — stream batch ids restart at 0 on a new
    checkpoint, and a cross-lineage fence would silently skip every
    post-restart refresh while the main table (run_id-scoped) applies."""
    import os
    import shutil

    from rook_spark.cdc.fixtures import write_events

    log = str(tmp_path / "log")
    write_events(generate_events(spark, 2000, seed=41, n_repos=10), log, n_files=4)
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    files = sorted(f for f in os.listdir(log) if f.endswith(".parquet"))
    for f in files[:2]:
        shutil.copy2(os.path.join(log, f), os.path.join(staged, f))

    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    rollup = attach_rollup(engine, str(tmp_path / "rollup"))
    q = engine.stream(staged, str(tmp_path / "ckptA"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()

    for f in files[2:]:
        shutil.copy2(os.path.join(log, f), os.path.join(staged, f))
    engine2 = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    rollup2 = attach_rollup(engine2, str(tmp_path / "rollup"))
    q2 = engine2.stream(staged, str(tmp_path / "ckptB"), max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()
    # rollup reflects the post-restart events (would be stale under a
    # cross-lineage batch-id fence)
    assert _canon(rollup2.read()) == _canon(rollup2.full_recompute())
    assert rollup2.read().count() > 0


def test_propagate_diamond_unions_shared_parent_keys(spark, tmp_path):
    """Regression (round-2 review): two child levels sharing a parent
    (diamond edges) — the shared parent must refresh with the UNION of
    both children's changed keys, not just the first arrival's."""
    from pyspark.sql import types as T

    from rook_spark.cdc.derived import ContainmentLevel, Rollup, propagate

    received: dict[int, list[str]] = {}
    schema = T.StructType([T.StructField("k", T.StringType(), False),
                           T.StructField("n", T.LongType())])
    src = spark.createDataFrame([("a", 1), ("b", 1)], schema)

    def make(i):
        class CapturingRollup(Rollup):
            def refresh(self, changed_keys, _i=i):
                received[_i] = sorted(
                    r["k"] for r in changed_keys.select("k").distinct().collect()
                )
                return {"skipped": True}

        return CapturingRollup(spark, str(tmp_path / f"cap{i}"), schema, "k",
                               lambda: src, lambda: [F.count(F.lit(1)).alias("n")])

    levels = [
        ContainmentLevel(make(0), lambda keys: keys.select("k")),
        ContainmentLevel(make(1), lambda keys: keys.selectExpr("concat(k, 'x') AS k")),
        ContainmentLevel(make(2), lambda keys: keys.select("k")),
    ]
    order = propagate(levels, src.select("k"), edges={0: [1, 2], 1: [2]})
    assert len(order) == 3
    assert received[0] == ["a", "b"]
    assert received[1] == ["ax", "bx"]
    assert received[2] == ["a", "ax", "b", "bx"]  # the UNION, not first-wins
