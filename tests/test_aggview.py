"""Delta-fold aggregate view (cdc/aggview.py): the invariant is that
folding signed per-key contributions epoch by epoch is
indistinguishable from one full aggregate over the final table — under
multi-epoch replay, deletes, duplicate re-delivery, and the
fresh-checkpoint crash window where the run_id fence cannot help and
only the view's own watermarks prevent double-counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from rook_spark.cdc.aggview import DeltaAggView
from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events, with_replayed_suffix

N_EVENTS = 3000


def _view(spark, tmp_path, engine):
    return DeltaAggView(
        spark, str(tmp_path / "mv"), engine.target,
        group_expr=lambda: F.col("repo"),
        measures={"total_chars": lambda: F.length("content")},
        group_name="repo", n_buckets=8,
    )


def _state(view):
    return {
        r["repo"]: (r["n_rows"], r["total_chars"])
        for r in view.read().collect()
    }


def _recompute(view):
    return {
        r["repo"]: (r["n"], r["t"])
        for r in (
            view.main().read()
            .groupBy("repo")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.length("content")).alias("t"))
            .collect()
        )
    }


def test_incremental_fold_equals_full_aggregate(spark, tmp_path):
    """Three epochs + a duplicated suffix: the folded view must equal a
    full groupBy over the final main table, group for group."""
    ev = generate_events(spark, N_EVENTS, seed=71)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = _view(spark, tmp_path, engine)
    engine.with_sink("agg_view", view.sink(), when="before")
    bounds = [(0, 900), (900, 2100), (2100, N_EVENTS)]
    for i, (lo, hi) in enumerate(bounds):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)

    # at-least-once: a re-delivered suffix must fold NOTHING
    before = _state(view)
    engine.replay(ev.where(F.col("offset") >= int(N_EVENTS * 0.7)), 3)
    assert _state(view) == before

    assert _state(view) == _recompute(view)
    assert len(before) > 10
    # deletes really subtract: total rows < live events
    assert sum(n for n, _ in before.values()) == view.main().read().count()


def test_duplicates_within_one_batch_collapse(spark, tmp_path):
    ev = generate_events(spark, 1200, seed=72)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = _view(spark, tmp_path, engine)
    engine.with_sink("agg_view", view.sink(), when="before")
    engine.replay(with_replayed_suffix(ev, 1200, 0.2), 0)
    assert _state(view) == _recompute(view)


def test_fresh_checkpoint_restart_does_not_double_fold(spark, tmp_path):
    """The crash window the view-local watermark exists for: after a
    fold commits, re-deliver the SAME offsets under a NEW run_id with
    batch ids restarting at 0 (fresh checkpoint). The run_id fence
    falls through by design; only the view's own lineage watermark can
    reject the rows. A second GENUINELY NEW batch under the new run_id
    must still fold."""
    ev = generate_events(spark, 1600, seed=73)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = _view(spark, tmp_path, engine)
    first = ev.where(F.col("offset") < 800)
    engine.with_sink("agg_view", view.sink(), when="before")
    engine.replay(first, 0)
    before = _state(view)

    # simulate the fresh-checkpoint re-delivery AT THE SINK: same rows,
    # batch 0, different run_id (the engine's own watermark would also
    # screen this; the sink must not depend on it)
    from rook_spark.cdc.normalize import normalize
    flat = normalize(first, ignored_server_ids=(99,))
    view.sink()(flat, 0, run_id="fresh-run")
    assert _state(view) == before, "fresh-checkpoint re-delivery double-folded"

    # and the stream continues: new offsets under the new lineage fold
    engine.replay(ev.where(F.col("offset") >= 800), 1)
    assert _state(view) == _recompute(view)


def test_full_recompute_repairs_and_matches(spark, tmp_path):
    ev = generate_events(spark, 1200, seed=74)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = _view(spark, tmp_path, engine)
    engine.with_sink("agg_view", view.sink(), when="before")
    engine.replay(ev, 0)
    incremental = _state(view)
    view.full_recompute()
    assert _state(view) == incremental == _recompute(view)


def test_payload_derived_group_migration(spark, tmp_path):
    """A group derived from the PAYLOAD (content length bucket) — an
    update that moves a key between groups must subtract from the old
    group and add to the new one."""
    ev = generate_events(spark, 1500, seed=75)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = DeltaAggView(
        spark, str(tmp_path / "mv"), engine.target,
        group_expr=lambda: (F.length("content") % 7).cast("string"),
        measures={"total_chars": lambda: F.length("content")},
        group_name="len_bucket", n_buckets=4,
    )
    engine.with_sink("agg_view", view.sink(), when="before")
    engine.replay(ev.where(F.col("offset") < 700), 0)
    engine.replay(ev.where(F.col("offset") >= 700), 1)
    got = {
        r["len_bucket"]: (r["n_rows"], r["total_chars"])
        for r in view.read().collect()
    }
    want = {
        r["len_bucket"]: (r["n"], r["t"])
        for r in (
            engine.target().read()
            .groupBy((F.length("content") % 7).cast("string").alias("len_bucket"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("content")).alias("t"))
            .collect()
        )
    }
    assert got == want


def test_streaming_tail_maintains_view(spark, tmp_path):
    """The delta-fold sink under a REAL Structured Streaming tail:
    micro-batched folds must land the same totals as one full
    aggregate — the production deployment shape."""
    from rook_spark.cdc.fixtures import write_events

    src = str(tmp_path / "log")
    write_events(generate_events(spark, 1200, seed=76), src, n_files=4)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = _view(spark, tmp_path, engine)
    engine.with_sink("agg_view", view.sink(), when="before")
    q = engine.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    assert len(engine.stats) >= 3  # genuinely micro-batched
    assert _state(view) == _recompute(view)


def test_view_ahead_of_main_crash_window_repairs(spark, tmp_path):
    """The REVERSE crash window: the view folded an epoch the main
    table never committed, then a fresh-checkpoint restart re-delivers
    a WIDER batch. The view's watermark alone would screen its folded
    offsets while the pre-image join reads main state that never
    absorbed them — double-subtracting. The sink must detect the view
    is ahead, roll back to the sync point, and re-fold consistently."""
    from rook_spark.cdc.normalize import normalize

    ev = generate_events(spark, 1600, seed=77)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = _view(spark, tmp_path, engine)
    engine.with_sink("agg_view", view.sink(), when="before")
    engine.replay(ev.where(F.col("offset") < 800), 0)

    # crash window: the sink folds 800-1200 but main NEVER applies it
    lost = normalize(ev.where((F.col("offset") >= 800) & (F.col("offset") < 1200)),
                     ignored_server_ids=(99,))
    view.sink()(lost, 1, run_id="doomed-run")

    # fresh checkpoint: the full suffix 800-1600 re-delivers through the
    # engine (main watermark never advanced past 800)
    engine.replay(ev.where(F.col("offset") >= 800), 1)
    assert _state(view) == _recompute(view)


def test_null_measures_count_as_zero(spark, tmp_path):
    """A measure over a nullable column (the evolution-added size_bytes)
    must fold null as 0 — not skip the negative asymmetrically or null
    out a stored total."""
    ev = generate_events(spark, 1500, seed=78, evolve_after_frac=0.5)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    view = DeltaAggView(
        spark, str(tmp_path / "mv"), engine.target,
        group_expr=lambda: F.col("repo"),
        measures={"total_size": lambda: F.col("size_bytes")},
        group_name="repo", n_buckets=4,
    )
    engine.with_sink("agg_view", view.sink(), when="before")
    engine.replay(ev.where(F.col("offset") < 700), 0)   # mostly-null era
    engine.replay(ev.where(F.col("offset") >= 700), 1)  # values era
    got = {r["repo"]: (r["n_rows"], r["total_size"])
           for r in view.read().collect()}
    want = {r["repo"]: (r["n"], r["t"])
            for r in (engine.target().read().groupBy("repo")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum(F.coalesce(F.col("size_bytes"), F.lit(0)))
                           .alias("t")).collect())}
    assert got == want
    assert all(v is not None for _, v in got.values())
