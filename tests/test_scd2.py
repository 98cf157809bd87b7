"""SCD type-2 history sink (cdc/scd2.py): the invariant is that
incrementally-appended history — multi-epoch, duplicate re-delivery,
deletes — is indistinguishable from one full-log recompute, and that
point-in-time reads at ANY ordinal equal an independent LWW replay of
the log prefix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events, with_replayed_suffix
from rook_spark.cdc.normalize import normalize
from rook_spark.cdc.scd2 import Scd2History

N_EVENTS = 3000


def _hist_state(h):
    return {
        (r["repo"], r["path"], r["valid_from"], r["valid_from_off"]):
        (r["valid_to"], r["end_op"], r["is_current"], r["content"])
        for r in h.history().collect()
    }


def _replayed(spark, tmp_path, ev, bounds):
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    hist = Scd2History(spark, str(tmp_path / "scd2"), n_buckets=8)
    engine.with_sink("scd2", hist.sink(), when="before")
    for i, (lo, hi) in enumerate(bounds):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    return engine, hist


def test_incremental_history_equals_full_log_recompute(spark, tmp_path):
    """Three epochs + a duplicated suffix through the real engine with
    the SCD2 sink: history must equal one full-log window recompute,
    interval for interval, including end_op and is_current."""
    ev = generate_events(spark, N_EVENTS, seed=61)
    engine, hist = _replayed(
        spark, tmp_path, ev, [(0, 900), (900, 2100), (2100, N_EVENTS)]
    )
    # at-least-once source: re-delivered suffix must change nothing
    before = _hist_state(hist)
    engine.replay(ev.where(F.col("offset") >= int(N_EVENTS * 0.7)), 3)
    assert _hist_state(hist) == before

    ref = Scd2History(spark, str(tmp_path / "scd2_ref"), n_buckets=8)
    ref.rebuild_from_log(normalize(ev, ignored_server_ids=(99,)))
    want = _hist_state(ref)
    got = _hist_state(hist)
    assert got == want
    assert len(got) > 200


def test_current_equals_main_table(spark, tmp_path):
    ev = generate_events(spark, 1500, seed=62)
    engine, hist = _replayed(spark, tmp_path, ev, [(0, 700), (700, 1500)])
    cur = {
        (r["repo"], r["path"]): r["content"]
        for r in hist.current().collect()
    }
    main = {
        (r["repo"], r["path"]): r["content"]
        for r in engine.target().read().collect()
    }
    assert cur == main


def test_state_at_equals_prefix_lww_replay(spark, tmp_path):
    """state_at(mid) — an ordinal INSIDE an epoch, not a commit
    boundary — must equal an independent LWW replay of the log prefix."""
    ev = generate_events(spark, 1500, seed=63)
    _, hist = _replayed(spark, tmp_path, ev, [(0, 700), (700, 1500)])
    mid = 1100  # inside epoch 2
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in hist.state_at(mid).collect()
    }
    flat = normalize(ev, ignored_server_ids=(99,)).where(
        F.col("commit_ordinal") <= mid
    )
    w = Window.partitionBy("repo", "path").orderBy(
        F.col("commit_ordinal").desc(), F.col("offset").desc()
    )
    want = {
        (r["repo"], r["path"]): r["content"]
        for r in flat.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .collect()
    }
    assert got == want
    assert len(got) > 100


def test_end_op_records_how_intervals_closed(spark, tmp_path):
    ev = generate_events(spark, 1500, seed=64)
    _, hist = _replayed(spark, tmp_path, ev, [(0, 1500)])
    h = hist.history()
    # the LAST interval of a key closed by 'D' means the key is dead:
    # it must not appear in current()
    w = Window.partitionBy("repo", "path").orderBy(F.col("valid_from").desc())
    last = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    dead = last.where(F.col("end_op") == "D").select("repo", "path")
    live = hist.current().select("repo", "path")
    assert dead.join(live, ["repo", "path"], "inner").count() == 0
    assert dead.count() > 0  # the fixture mixes deletes in
    # every open interval has a null close
    bad = h.where(
        F.col("is_current") & (F.col("valid_to").isNotNull() | F.col("end_op").isNotNull())
    )
    assert bad.count() == 0
    # exactly one open interval per live key
    assert (
        hist.current().groupBy("repo", "path").count().where(F.col("count") > 1).count()
        == 0
    )


def test_duplicates_within_one_batch_collapse(spark, tmp_path):
    """Byte-identical re-delivered rows inside ONE batch must not mint
    zero-length phantom intervals that survive as duplicates."""
    ev = generate_events(spark, 1000, seed=65)
    engine, hist = _replayed(
        spark, tmp_path, with_replayed_suffix(ev, 1000, 0.2), [(0, 2000)]
    )
    ref = Scd2History(spark, str(tmp_path / "scd2_ref"), n_buckets=8)
    ref.rebuild_from_log(normalize(ev, ignored_server_ids=(99,)))
    assert _hist_state(hist) == _hist_state(ref)


def test_partial_row_images_rejected(spark, tmp_path):
    hist = Scd2History(spark, str(tmp_path / "scd2"))
    flat = spark.createDataFrame(
        [("r", "p", "c", "U", 0, 0, 0, 0, ["content"])],
        "repo string, path string, content string, op string, "
        "commit_ordinal long, offset long, source_partition int, "
        "tx_id long, updated_cols array<string>",
    )
    with pytest.raises(ValueError, match="full row images"):
        hist.sink()(flat, 0)


def test_streaming_tail_maintains_history(spark, tmp_path):
    """The SCD2 sink under a REAL Structured Streaming tail (S1 →
    foreachBatch): micro-batched delivery must land the same timeline
    as one full-log recompute — the production deployment shape."""
    from rook_spark.cdc.fixtures import write_events

    src = str(tmp_path / "log")
    ev = generate_events(spark, 1200, seed=66)
    write_events(ev, src, n_files=4)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    hist = Scd2History(spark, str(tmp_path / "scd2"), n_buckets=8)
    engine.with_sink("scd2", hist.sink(), when="before")
    q = engine.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    assert len(engine.stats) >= 3  # genuinely micro-batched
    ref = Scd2History(spark, str(tmp_path / "scd2_ref"), n_buckets=8)
    ref.rebuild_from_log(normalize(spark.read.parquet(src), ignored_server_ids=(99,)))
    assert _hist_state(hist) == _hist_state(ref)
