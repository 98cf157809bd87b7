"""Structured Streaming wrapper: S1 source analog + kill/resume
exactly-once (SURVEY.md §2.10; rook's reconnect scenario re-expressed as
checkpoint resume)."""

from __future__ import annotations

import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events, oracle_final_state_sql

N_EVENTS = 3000


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    """Event log split into 6 ordered files — file == micro-batch feed."""
    d = tmp_path_factory.mktemp("stream_src")
    ev = generate_events(spark, N_EVENTS, seed=11)
    from rook_spark.cdc.fixtures import write_events

    write_events(ev, str(d / "log"), n_files=6)
    return str(d / "log")


def _oracle(source_dir):
    con = duckdb.connect()
    try:
        return con.execute(oracle_final_state_sql(f"{source_dir}/*.parquet")).fetch_df()
    finally:
        con.close()


def _assert_state(table, source_dir):
    got = table.read().orderBy("repo", "path").toPandas()
    want = _oracle(source_dir)
    assert len(got) == len(want)
    assert got["content"].tolist() == want["content"].tolist()


def test_stream_end_to_end(spark, source_dir, tmp_path):
    from rook_spark.cdc import apply as apply_mod

    fallbacks_before = apply_mod.OBS_FALLBACKS["count"]
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream(source_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    q.processAllAvailable()
    q.stop()
    assert len(engine.stats) >= 3  # really ran as multiple micro-batches
    _assert_state(engine.target(), source_dir)
    # ONE content-decoding job per streamed batch: the byte metric rode
    # the write job's Observation (no recompute fallback fired) and the
    # observed values landed in the committed lineage
    assert apply_mod.OBS_FALLBACKS["count"] == fallbacks_before
    lineage = {r["partition_id"]: r for r in engine.target().lineage().collect()}
    assert len(lineage) >= 4
    assert all(r["bytes"] > 0 for r in lineage.values())


def test_stream_kill_and_resume(spark, source_dir, tmp_path):
    """Stop mid-log, restart from the same checkpoint: no loss, no dup.
    Then restart from a FRESH checkpoint over the full source: batch +
    watermark fences keep the state identical (at-least-once replay →
    exactly-once state, north_rule)."""
    staged = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(staged)
    files = sorted(
        f for f in os.listdir(source_dir) if f.endswith(".parquet")
    )
    # stage only half the files, run, "crash" (stop)
    for f in files[:3]:
        shutil.copy2(os.path.join(source_dir, f), os.path.join(staged, f))
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream(staged, ckpt, max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    v_mid = engine.target().current_version()
    assert v_mid >= 1

    # deliver the rest, resume from the same checkpoint
    for f in files[3:]:
        shutil.copy2(os.path.join(source_dir, f), os.path.join(staged, f))
    engine2 = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q2 = engine2.stream(staged, ckpt, max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()
    _assert_state(engine2.target(), source_dir)

    # fresh checkpoint => Spark replays ALL files; state must not change
    engine3 = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q3 = engine3.stream(staged, str(tmp_path / "ckpt2"), max_files_per_trigger=2)
    q3.processAllAvailable()
    q3.stop()
    _assert_state(engine3.target(), source_dir)


def test_stream_mor_single_job_epoch(spark, source_dir, tmp_path):
    """Streaming + MOR + known source-partition count takes the
    single-job epoch (all lineage metrics observed in-flight on the
    delta write): final state still equals the oracle and no observation
    fallback (= no second heavy pass) fires."""
    from rook_spark.cdc import apply as apply_mod

    fallbacks_before = apply_mod.OBS_FALLBACKS["count"]
    engine = CdcEngine(
        spark, str(tmp_path / "repos"), write_mode="mor", n_source_partitions=8,
        compact_every=4,
    ).ignoring_servers(99)
    q = engine.stream(source_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    q.processAllAvailable()
    q.stop()
    _assert_state(engine.target(), source_dir)
    assert apply_mod.OBS_FALLBACKS["count"] == fallbacks_before
    lineage = {r["partition_id"]: r for r in engine.target().lineage().collect()}
    assert len(lineage) == 8 and all(r["bytes"] > 0 for r in lineage.values())


def test_fresh_checkpoint_with_new_files_applies_them(spark, source_dir, tmp_path):
    """Regression (round-1 ADVICE): foreachBatch batch ids restart at 0 on
    a NEW checkpoint dir. A cross-run batch-id fence would skip every
    restarted batch — including ones carrying genuinely NEW files — and
    the fresh checkpoint would mark them processed: silent permanent loss.
    The fence must be scoped to the run (run_id) so a new-checkpoint
    restart falls through to the watermark filter, which dedups the old
    events and applies the new ones."""
    import os

    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    files = sorted(f for f in os.listdir(source_dir) if f.endswith(".parquet"))
    for f in files[:3]:
        shutil.copy2(os.path.join(source_dir, f), os.path.join(staged, f))
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream(staged, str(tmp_path / "ckptA"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()

    # new files arrive; operator restarts with a FRESH checkpoint whose
    # batch ids (0,1,2 at mft=2) are all <= the already-committed max (2)
    for f in files[3:]:
        shutil.copy2(os.path.join(source_dir, f), os.path.join(staged, f))
    engine2 = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q2 = engine2.stream(staged, str(tmp_path / "ckptB"), max_files_per_trigger=2)
    q2.processAllAvailable()
    q2.stop()
    _assert_state(engine2.target(), source_dir)


def test_sink_fanout_is_watermark_filtered(spark, source_dir, tmp_path):
    """Sinks receive the exactly-once (watermark-filtered) event set: a
    full same-data replay through a fresh checkpoint fans out ZERO rows
    instead of double-counting (round-1 ADVICE)."""
    totals = []

    def counting_sink(df, bid):
        totals.append(df.count())

    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream(source_dir, str(tmp_path / "ckptA"), max_files_per_trigger=3)
    q.processAllAvailable()
    q.stop()
    first_rows = engine.target().read().count()

    engine2 = (
        CdcEngine(spark, str(tmp_path / "repos"))
        .ignoring_servers(99)
        .with_sink("counts", counting_sink)
    )
    q2 = engine2.stream(source_dir, str(tmp_path / "ckptB"), max_files_per_trigger=3)
    q2.processAllAvailable()
    q2.stop()
    assert sum(totals) == 0  # every event was a duplicate — sinks saw none
    assert engine2.target().read().count() == first_rows


def test_stream_sink_fanout_and_error_isolation(spark, source_dir, tmp_path):
    """K1: a failing auxiliary sink must not stop the stream or the MERGE;
    failures land in the dead-letter table
    (``MySQLReplicationStream.java:167-176``)."""
    seen = []

    def counting_sink(df, bid):
        seen.append((bid, df.where(F.col("op") == "D").count()))

    def broken_sink(df, bid):
        raise RuntimeError("sink exploded")

    engine = (
        CdcEngine(spark, str(tmp_path / "repos"))
        .ignoring_servers(99)
        .with_sink("counts", counting_sink)
        .with_sink("broken", broken_sink)
    )
    q = engine.stream(source_dir, str(tmp_path / "ckpt"), max_files_per_trigger=3)
    q.processAllAvailable()
    q.stop()
    _assert_state(engine.target(), source_dir)  # MERGE unaffected
    assert len(seen) >= 2  # healthy sink saw every batch
    dead = spark.read.parquet(engine.dead_letter_path)
    assert dead.where(F.col("sink") == "broken").count() >= 2
    assert "sink exploded" in dead.first()["error"]


def test_stream_rollback_batch_backfill_recovery(spark, source_dir, tmp_path):
    """The documented rollback recovery path for STREAMED apply: the old
    checkpoint will not re-deliver committed batches, so after
    rollback(v_good) the rolled-back window comes back via a BATCH
    backfill (different run_id lineage → the run-scoped fence falls
    through to the reverted watermarks, which admit exactly that range)
    — final state equals the oracle, and the resumed stream continues
    exactly-once on top."""
    import os

    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream(source_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    q.processAllAvailable()
    q.stop()
    t = engine.target()
    _assert_state(t, source_dir)
    v_final = t.current_version()

    # operator decides the last stream epoch was bad -> revert one commit
    v_good = t.snapshot(v_final).parent
    t.rollback(v_good)
    assert t.current_version() == v_final + 1  # forward history
    assert t.read().count() == t.read(version=v_good).count()

    # recovery leg: batch backfill of the FULL source log (watermarks
    # dedup everything below the reverted high-water mark; the stream's
    # committed batch ids don't fence it — different run lineage)
    log = spark.read.parquet(os.path.join(source_dir, "*.parquet"))
    engine.replay(log, start_batch_id=10_000)
    _assert_state(t, source_dir)

    # the resumed stream (same checkpoint) stays exactly-once: nothing
    # re-applies, state still oracle-identical
    q2 = engine.stream(source_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    q2.processAllAvailable()
    q2.stop()
    _assert_state(engine.target(), source_dir)
