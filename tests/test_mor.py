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
