"""Merge-on-read write mode: O(batch) epoch writes + read-time LWW
resolution + compaction fold — must be state-identical to COW and to the
DuckDB replay oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events, oracle_final_state_sql, write_events

N = 3000


def _canon(df):
    return sorted(tuple(r) for r in df.select("repo", "path", "commit", "lang", "content").collect())


def _replay(spark, path, events, **engine_kw):
    engine = CdcEngine(spark, path, **engine_kw).ignoring_servers(99)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, N)]):
        engine.replay(events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    return engine


def test_mor_matches_cow_and_oracle(spark, tmp_path):
    log = str(tmp_path / "log")
    write_events(generate_events(spark, N, seed=21), log, n_files=3)
    events = spark.read.parquet(log)

    cow = _replay(spark, str(tmp_path / "cow"), events, write_mode="cow")
    mor = _replay(spark, str(tmp_path / "mor"), events, write_mode="mor")

    snap = mor.target().snapshot()
    assert snap.deltas and not snap.buckets  # nothing ever rewritten
    got_cow, got_mor = _canon(cow.target().read()), _canon(mor.target().read())
    assert got_mor == got_cow

    con = duckdb.connect()
    try:
        want = con.execute(oracle_final_state_sql(f"{log}/*.parquet")).fetch_df()
    finally:
        con.close()
    assert len(got_mor) == len(want)
    assert [r[4] for r in got_mor] == want.sort_values(["repo", "path"])["content"].tolist()


def test_mor_compaction_folds_deltas(spark, tmp_path):
    log = str(tmp_path / "log")
    write_events(generate_events(spark, N, seed=22), log, n_files=3)
    events = spark.read.parquet(log)
    mor = _replay(spark, str(tmp_path / "mor"), events, write_mode="mor")
    t = mor.target()
    before = _canon(t.read())
    res = t.compact()
    assert res["compacted_buckets"] > 0
    snap = t.snapshot()
    assert not snap.deltas and snap.buckets  # all folded into base
    assert _canon(t.read()) == before
    # vacuum reclaims the now-unreferenced delta files
    assert t.vacuum(keep_last=1)["removed_files"] > 0
    assert _canon(t.read()) == before


def test_mor_auto_compaction_cadence(spark, tmp_path):
    log = str(tmp_path / "log")
    write_events(generate_events(spark, N, seed=23), log, n_files=3)
    events = spark.read.parquet(log)
    engine = CdcEngine(
        spark, str(tmp_path / "mor"), write_mode="mor", compact_every=2
    ).ignoring_servers(99)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, N)]):
        engine.replay(events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    snap = engine.target().snapshot()
    # epochs 0,1 -> compacted; epoch 2 left as deltas
    assert snap.buckets  # base exists from the compaction
    assert snap.deltas   # last epoch still delta-form
    # state still equals a pure-COW replay
    cow = _replay(spark, str(tmp_path / "cow"), events, write_mode="cow")
    assert _canon(engine.target().read()) == _canon(cow.target().read())


def test_auto_vacuum_cadence(spark, tmp_path):
    """Engine-integrated retention: vacuum_every expires history past
    vacuum_keep_last as the stream runs, so a long-running ingest never
    accumulates unbounded versions — while the final state stays
    identical to a no-vacuum replay and a tagged snapshot survives the
    cadence (min_age_s=0 here so reclamation is immediate)."""
    log = str(tmp_path / "log")
    write_events(generate_events(spark, N, seed=31), log, n_files=3)
    events = spark.read.parquet(log)
    engine = CdcEngine(
        spark, str(tmp_path / "av"), write_mode="mor", compact_every=2,
        vacuum_every=2, vacuum_keep_last=2, vacuum_min_age_s=0,
    ).ignoring_servers(99)
    cuts = [(0, 800), (800, 1600), (1600, 2400), (2400, N)]
    for i, (lo, hi) in enumerate(cuts):
        engine.replay(events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
        if i == 1:
            engine.target().tag("mid")
            tagged_state = _canon(engine.target().read())
    t = engine.target()
    retained = t._store.versions()
    # history is bounded: keep_last window + the tagged pin, not one
    # version per epoch+compaction+vacuum commit
    assert len(retained) <= 2 + 1 + 1  # window + tag + tag-commit slack
    assert _canon(t.read(tag="mid")) == tagged_state
    cow = _replay(spark, str(tmp_path / "cow"), events, write_mode="cow")
    assert _canon(t.read()) == _canon(cow.target().read())


def test_cow_merge_on_table_with_deltas_folds_them(spark, tmp_path):
    """Mode mixing: a COW merge over buckets that carry deltas resolves
    and clears them (localized compaction)."""
    log = str(tmp_path / "log")
    write_events(generate_events(spark, N, seed=24), log, n_files=3)
    events = spark.read.parquet(log)
    engine = CdcEngine(spark, str(tmp_path / "t"), write_mode="mor").ignoring_servers(99)
    engine.replay(events.where(F.col("offset") < 2000), 0)
    assert engine.target().snapshot().deltas
    engine.write_mode = "cow"
    engine.replay(events.where(F.col("offset") >= 2000), 1)
    snap = engine.target().snapshot()
    assert not snap.deltas  # folded by the COW pass (all buckets touched)
    cow = _replay(spark, str(tmp_path / "cow"), events, write_mode="cow")
    assert _canon(engine.target().read()) == _canon(cow.target().read())


def test_mor_stream_kill_and_resume(spark, tmp_path):
    """MOR single-job epochs under the streaming wrapper survive
    kill/resume exactly-once, including a mid-stream compaction."""
    import os
    import shutil

    log = str(tmp_path / "log")
    write_events(generate_events(spark, N, seed=29), log, n_files=6)
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    files = sorted(f for f in os.listdir(log) if f.endswith(".parquet"))
    for f in files[:3]:
        shutil.copy2(os.path.join(log, f), os.path.join(staged, f))

    kw = dict(write_mode="mor", n_source_partitions=8, compact_every=2)
    engine = CdcEngine(spark, str(tmp_path / "repos"), **kw).ignoring_servers(99)
    q = engine.stream(staged, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()

    for f in files[3:]:
        shutil.copy2(os.path.join(log, f), os.path.join(staged, f))
    engine2 = CdcEngine(spark, str(tmp_path / "repos"), **kw).ignoring_servers(99)
    q2 = engine2.stream(staged, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()

    got = _canon(engine2.target().read())
    con = duckdb.connect()
    try:
        want = con.execute(oracle_final_state_sql(f"{log}/*.parquet")).fetch_df()
    finally:
        con.close()
    assert len(got) == len(want)
    assert [r[4] for r in got] == want.sort_values(["repo", "path"])["content"].tolist()


def test_mor_schema_evolution(spark, tmp_path):
    """Additive evolution through the MOR delta path: the new column
    widens the target mid-replay; pre-evolution rows read back null —
    identical to the COW behavior and the evolved oracle."""
    log = str(tmp_path / "log")
    ev = generate_events(spark, N, seed=33, evolve_after_frac=0.5)
    write_events(ev, log, n_files=3)
    events = spark.read.parquet(log)

    engine = _replay(spark, str(tmp_path / "repos"), events,
                     write_mode="mor", n_source_partitions=8)
    got = engine.target().read().orderBy("repo", "path").toPandas()
    assert "size_bytes" in got.columns

    con = duckdb.connect()
    try:
        want = con.execute(
            oracle_final_state_sql(f"{log}/*.parquet", evolved=True)
        ).fetch_df()
    finally:
        con.close()
    assert len(got) == len(want)
    assert got["content"].tolist() == want["content"].tolist()
    gs = got["size_bytes"].astype("float64").fillna(-1.0)
    ws = want["size_bytes"].astype("float64").fillna(-1.0)
    assert gs.tolist() == ws.tolist()
    # both eras present in the surviving state
    assert got["size_bytes"].isna().any() and got["size_bytes"].notna().any()


def test_mor_epoch_is_one_spark_job(spark, tmp_path):
    """The single-job MOR epoch claim, literally: with AQE off (the bench
    profile — AQE splits execution into per-stage jobs) one replay epoch
    schedules exactly ONE Spark job: flatten → LWW → delta write with all
    lineage metrics observed in-flight."""
    log = str(tmp_path / "log")
    generate_events(spark, 2000, seed=5).write.parquet(log)
    engine = CdcEngine(
        spark, str(tmp_path / "repos"), write_mode="mor", n_source_partitions=8
    ).ignoring_servers(99)
    engine.replay(spark.read.parquet(log).where(F.col("offset") < 1000), 0)
    events = spark.read.parquet(log).where(F.col("offset") >= 1000)  # infer outside
    old = spark.conf.get("spark.sql.adaptive.enabled")
    sc = spark.sparkContext
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        sc.setJobGroup("mor_epoch", "single-job mor epoch")
        engine.replay(events, 1)
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert len(sc.statusTracker().getJobIdsForGroup("mor_epoch")) == 1


def test_mor_cluster_zorder_maintenance(spark, tmp_path):
    """cluster_zorder=["__ordinal"]: the periodic maintenance pass
    z-orders the buckets compact would have bin-packed — state stays
    identical to the DuckDB replay oracle, deltas are folded on the
    cadence, and the bounded incremental scan prunes files afterwards
    (the steady-state reason to cluster at all)."""
    log = str(tmp_path / "log")
    write_events(generate_events(spark, N, seed=33), log, n_files=3)
    events = spark.read.parquet(log)

    eng = _replay(
        spark, str(tmp_path / "morz"), events,
        write_mode="mor", compact_every=2, cluster_zorder=["__ordinal"],
    )
    t = eng.target()
    snap = t.snapshot()
    assert snap.buckets  # the clustering pass rewrote base files
    # epoch 3 (batch 2) ran after the cadence-2 maintenance pass, so at
    # most one epoch of deltas remains pending
    assert all(len(fs) <= 1 for fs in snap.deltas.values())

    con = duckdb.connect()
    ora = con.execute(oracle_final_state_sql(f"{log}/*.parquet")).fetchall()
    got = _canon(t.read())
    assert got == sorted(tuple(r) for r in ora)

    # fold the trailing epoch, then the incremental scan must skip files
    t.compact()
    full = t.read(include_internal=True).select(F.input_file_name()).distinct().count()
    hi = t.read(include_internal=True).agg(F.max("__ordinal")).first()[0]
    scan = t.read(ranges={"__ordinal": (hi, None)}, include_internal=True)
    assert scan.select(F.input_file_name()).distinct().count() < full
    assert (scan.where(F.col("__ordinal") >= hi).count()
            == t.read(include_internal=True).where(F.col("__ordinal") >= hi).count())


def test_mor_ordinal_less_table_seq_fallback(spark, tmp_path):
    """A bare LakeTable whose schema has NO __ordinal/__offset columns
    must still resolve MOR deltas (regression: the fold used to
    hard-reference the engine's ordinal columns and blow up at read).
    Fallback order = position in the bucket's delta chain: later epochs
    win, a winning tombstone drops the key, a later upsert resurrects
    it, and compact() folds the same answer into base files."""
    from rook_spark.lake.table import LakeTable
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["k"], n_buckets=2)

    def batch(rows):
        return spark.createDataFrame(rows, "k string, v long, op string")

    t.merge_mor(batch([("a", 1, "I"), ("b", 1, "I"), ("c", 1, "I")]), 0)
    t.merge_mor(batch([("a", 2, "U"), ("b", None, "D")]), 1)   # update + delete
    t.merge_mor(batch([("b", 3, "I")]), 2)                     # resurrect b

    expect = {("a", 2), ("b", 3), ("c", 1)}
    assert {(r["k"], r["v"]) for r in t.read().collect()} == expect
    # bucket-pruned reads take the same fallback path
    per_bucket = set()
    for b in range(2):
        per_bucket |= {(r["k"], r["v"]) for r in t.read(buckets=[b]).collect()}
    assert per_bucket == expect
    # compact folds deltas with identical semantics
    t.compact()
    assert not any(t.snapshot().deltas.values())
    assert {(r["k"], r["v"]) for r in t.read().collect()} == expect


def test_compact_buckets_targeted(spark, tmp_path):
    """compact(buckets=[...]) rewrites exactly the named buckets: their
    deltas fold, every other bucket's chain is untouched, and the read
    answer never changes."""
    from rook_spark.lake.table import LakeTable
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ["k"], n_buckets=4)

    def batch(rows):
        return spark.createDataFrame(rows, "k long, v long, op string")

    # keys 0..15 spread across all 4 buckets, one delta per bucket
    t.merge_mor(batch([(k, k, "I") for k in range(16)]), 0)
    snap = t.snapshot()
    assert sum(1 for fs in snap.deltas.values() if fs) == 4
    target = int(next(iter(sorted(snap.deltas))))
    before = {(r["k"], r["v"]) for r in t.read().collect()}

    res = t.compact(buckets=[target])
    assert res["compacted_buckets"] == 1
    snap2 = t.snapshot()
    assert not snap2.deltas.get(str(target))          # folded
    assert sum(1 for fs in snap2.deltas.values() if fs) == 3  # rest untouched
    assert {(r["k"], r["v"]) for r in t.read().collect()} == before
    # empty target set is a metadata no-op (no commit)
    v = t.current_version()
    assert t.compact(buckets=[])["compacted_buckets"] == 0
    assert t.current_version() == v


def test_compact_depth_triggered_maintenance(spark, tmp_path):
    """CdcEngine(compact_depth=N): after each epoch, ONLY buckets whose
    delta chain reached N are folded — maintenance work proportional to
    the backlog, not the table (the hot-bucket policy a skewed stream
    needs at scale). Cold buckets keep their shallow chains; the final
    state still matches the DuckDB replay oracle."""
    ev = generate_events(spark, 6000, seed=51)
    keyf = F.coalesce(F.col("after.repo"), F.col("before.repo"))
    lo = ev.where("offset < 2000")                       # epoch 0: wide spread
    pathf = F.coalesce(F.col("after.path"), F.col("before.path"))
    hk = (ev.where("offset >= 2000").where("server_id != 99")
            .groupBy(keyf.alias("__r"), pathf.alias("__p")).count()
            .orderBy(F.desc("count"), "__r", "__p").first())
    hot = (ev.where("offset >= 2000")
             .where((keyf == hk["__r"]) & (pathf == hk["__p"])))
    e1 = hot.where("offset < 4000")
    e2 = hot.where("offset >= 4000")
    assert e1.count() > 0 and e2.count() > 0

    log = str(tmp_path / "log")
    write_events(lo.unionByName(e1).unionByName(e2), log, n_files=3)

    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8,
                    write_mode="mor", compact_depth=2).ignoring_servers(99)
    eng.replay(lo, 0)
    d0 = {b: len(fs) for b, fs in eng.target().snapshot().deltas.items() if fs}
    assert d0 and max(d0.values()) == 1                  # no trigger yet

    eng.replay(e1, 1)
    snap = eng.target().snapshot()
    d1 = {b: len(fs) for b, fs in snap.deltas.items() if fs}
    # hot buckets hit depth 2 and were folded back to 0; cold buckets
    # still carry exactly their epoch-0 delta
    assert d1 and max(d1.values()) == 1
    folded = set(d0) - set(d1)
    assert folded                                        # something was folded
    ops = [r["op"] for r in eng.target().history().orderBy("version").collect()]
    assert ops.count("compact") == 1

    eng.replay(e2, 2)
    t = eng.target()
    assert all(len(fs) < 2 for fs in t.snapshot().deltas.values())

    con = duckdb.connect()
    ora = con.execute(oracle_final_state_sql(f"{log}/*.parquet")).fetchall()
    got = _canon(t.read())
    assert got == sorted(tuple(r) for r in ora)
