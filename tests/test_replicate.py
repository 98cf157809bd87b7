"""Table-to-table CDC relay (lake/replicate.py): the invariant is the
reference's own master→slave test shape (h4com/IntegrationTest.java:
187-197) — after any replay, the replica equals the source — held
across multi-epoch tails, checkpoint restarts, chained relays, and
erasure propagation."""

from __future__ import annotations

from pyspark.sql import functions as F

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events
from rook_spark.lake.replicate import replicate
from rook_spark.lake.table import LakeTable


def _state(df):
    return {
        (r["repo"], r["path"]): r["content"]
        for r in df.select("repo", "path", "content").collect()
    }


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_replica_equals_source_and_survives_restart(spark, tmp_path):
    ev = generate_events(spark, 2000, seed=81)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 700), 0)
    eng.replay(ev.where((F.col("offset") >= 700) & (F.col("offset") < 1400)), 1)

    q = replicate(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                  str(tmp_path / "ckpt"))
    _drain(q)
    dst = LakeTable.load(spark, str(tmp_path / "dst"))
    assert _state(dst.read()) == _state(eng.target().read())

    # more epochs land while the relay is DOWN; a restarted relay
    # catches up from its checkpoint without re-applying history
    eng.replay(ev.where(F.col("offset") >= 1400), 2)
    q2 = replicate(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                   str(tmp_path / "ckpt"))
    _drain(q2)
    want = _state(eng.target().read())
    assert _state(dst.read()) == want
    assert len(want) > 300


def test_fresh_checkpoint_full_replay_converges(spark, tmp_path):
    """Recovery story: delete the checkpoint, re-tail from scratch —
    the whole history re-applies and the replica converges (LWW fold /
    conditional ordinal make re-application a no-op)."""
    ev = generate_events(spark, 1200, seed=82)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 600), 0)
    eng.replay(ev.where(F.col("offset") >= 600), 1)
    _drain(replicate(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                     str(tmp_path / "ckpt_a")))
    dst = LakeTable.load(spark, str(tmp_path / "dst"))
    want = _state(eng.target().read())
    assert _state(dst.read()) == want
    # fresh checkpoint: full history re-emitted, replica must not drift
    _drain(replicate(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                     str(tmp_path / "ckpt_b")))
    assert _state(dst.read()) == want


def test_relays_chain(spark, tmp_path):
    """The replica is merge-on-read, so it is ITSELF a valid feed
    source: master → replica → replica² all agree."""
    ev = generate_events(spark, 1200, seed=83)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 600), 0)
    eng.replay(ev.where(F.col("offset") >= 600), 1)
    _drain(replicate(spark, str(tmp_path / "src"), str(tmp_path / "r1"),
                     str(tmp_path / "ck1")))
    _drain(replicate(spark, str(tmp_path / "r1"), str(tmp_path / "r2"),
                     str(tmp_path / "ck2")))
    want = _state(eng.target().read())
    assert _state(LakeTable.load(spark, str(tmp_path / "r1")).read()) == want
    assert _state(LakeTable.load(spark, str(tmp_path / "r2")).read()) == want


def test_erasure_propagates(spark, tmp_path):
    ev = generate_events(spark, 1200, seed=84)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev, 0)
    res = eng.target().delete_where(F.col("lang") == "md", mode="mor")
    assert res["deleted_rows"] > 0
    _drain(replicate(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                     str(tmp_path / "ckpt")))
    dst = LakeTable.load(spark, str(tmp_path / "dst"))
    assert _state(dst.read()) == _state(eng.target().read())
    assert dst.read().where(F.col("lang") == "md").count() == 0


def test_schema_evolution_lands_after_relay_restart(spark, tmp_path):
    """Feed schema is locked per query (the CDF contract): an additive
    source column streams as null until the relay restarts; after the
    restart the replica widens via the MERGE's evolution path and the
    new column's values match the source."""
    ev = generate_events(spark, 1600, seed=85, evolve_after_frac=0.5)
    eng = CdcEngine(spark, str(tmp_path / "src"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 800), 0)  # size_bytes all-null
    _drain(replicate(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                     str(tmp_path / "ckpt")))

    eng.replay(ev.where(F.col("offset") >= 800), 1)  # values appear
    _drain(replicate(spark, str(tmp_path / "src"), str(tmp_path / "dst"),
                     str(tmp_path / "ckpt")))  # restart = fresh schema
    got = {
        (r["repo"], r["path"]): r["size_bytes"]
        for r in LakeTable.load(spark, str(tmp_path / "dst")).read().collect()
    }
    want = {
        (r["repo"], r["path"]): r["size_bytes"]
        for r in eng.target().read().collect()
    }
    assert got == want
    assert any(v is not None for v in want.values())
