"""CDC-maintained incremental MinHash dedup index (cdc/dedup_index.py):
the invariant is that maintaining signatures incrementally from the
change feed is indistinguishable from recomputing them over the final
table — under multi-epoch replay, deletes, duplicate re-delivery,
crash-window re-delivery, and long→short content updates."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from rook_spark.cdc.dedup_index import DedupIndex
from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events, with_replayed_suffix

N_EVENTS = 3000


def _index_state(idx):
    return {
        tuple(r[c] for c in idx.key_cols): tuple(r[c] for c in idx.sig_cols)
        for r in idx.signatures().collect()
    }


def _recompute_state(idx, docs):
    return {
        tuple(r[c] for c in idx.key_cols): tuple(r[c] for c in idx.sig_cols)
        for r in idx.compute_signatures(docs).collect()
    }


def test_incremental_index_equals_full_recompute(spark, tmp_path):
    """Three epochs + a duplicated suffix through the real engine with
    the index sink: the index must equal a full signature recompute over
    the final main-table state, key for key, hash for hash."""
    ev = generate_events(spark, N_EVENTS, seed=51)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    idx = DedupIndex(spark, str(tmp_path / "sigs"), k=3, n_hashes=8, n_buckets=8)
    engine.with_sink("dedup_index", idx.sink(), when="before")

    bounds = [(0, 900), (900, 2100), (2100, N_EVENTS)]
    for i, (lo, hi) in enumerate(bounds):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    # at-least-once source: re-deliver the last 30% — watermark filter
    # hands the sink an EMPTY fresh set, index must not change
    before = _index_state(idx)
    engine.replay(ev.where(F.col("offset") >= int(N_EVENTS * 0.7)), 3)
    assert _index_state(idx) == before

    want = _recompute_state(idx, engine.target().read())
    got = _index_state(idx)
    assert got == want
    assert len(got) > 100
    # deletes really dropped keys: strictly fewer index rows than events
    assert len(got) < N_EVENTS


def test_duplicates_within_one_batch_collapse(spark, tmp_path):
    ev = generate_events(spark, 1500, seed=52)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    idx = DedupIndex(spark, str(tmp_path / "sigs"), n_buckets=8)
    engine.with_sink("dedup_index", idx.sink(), when="before")
    engine.replay(with_replayed_suffix(ev, 1500, 0.2), 0)
    assert _index_state(idx) == _recompute_state(idx, engine.target().read())


def _flat(spark, rows):
    """Hand-built normalized batch rows:
    (repo, path, content, op, commit_ordinal, offset)."""
    return spark.createDataFrame(
        [(r, p, c, op, o, o, 0, 0) for (r, p, c, op, o) in rows],
        "repo string, path string, content string, op string, "
        "commit_ordinal long, offset long, source_partition int, tx_id long",
    )


def test_long_to_short_update_clears_stale_signature(spark, tmp_path):
    """A doc whose content shrinks below k tokens must carry an all-null
    signature row after the update — NOT the stale signature of the old
    long content (the left-join-including-shingleless-docs contract)."""
    idx = DedupIndex(spark, str(tmp_path / "sigs"), k=3, n_hashes=4, n_buckets=4)
    sink = idx.sink()
    sink(_flat(spark, [("r", "a", "one two three four five", "I", 1)]), 0)
    st = _index_state(idx)
    assert st[("r", "a")][0] is not None
    sink(_flat(spark, [("r", "a", "two words", "U", 2)]), 1)
    st = _index_state(idx)
    assert st[("r", "a")] == (None,) * 4
    # and a delete drops the key entirely
    sink(_flat(spark, [("r", "a", None, "D", 3)]), 2)
    assert _index_state(idx) == {}


def test_crash_window_redelivery_is_idempotent(spark, tmp_path):
    """The 'before'-phase crash scenario: the index committed batch 0
    but the main table did not, so restart re-delivers the SAME batch id
    with the same rows — the index's batch fence skips it; and a stale
    lower-ordinal change for the same key inside a later batch loses to
    the stored ordinal (conditional MERGE)."""
    idx = DedupIndex(spark, str(tmp_path / "sigs"), k=3, n_hashes=4, n_buckets=4)
    sink = idx.sink()
    batch = _flat(spark, [("r", "a", "alpha beta gamma delta", "I", 5)])
    sink(batch, 0)
    st = _index_state(idx)
    v = idx.table().current_version()
    sink(batch, 0)  # re-delivery, same batch id -> fenced, no new version
    assert idx.table().current_version() == v
    assert _index_state(idx) == st
    # out-of-order stale change in a later batch: stored ordinal wins
    sink(_flat(spark, [("r", "a", "totally different old text", "U", 3)]), 1)
    assert _index_state(idx) == st


def test_streaming_tail_maintains_index(spark, tmp_path):
    """The index sink under a REAL Structured Streaming tail (S1 →
    foreachBatch): micro-batched delivery must land the same index as a
    full recompute — the production deployment shape, not just batch
    replay. Note the sink runs inside foreachBatch's cloned session;
    the index's lake MERGE plans under the change set's session, so the
    listener plumbing is exercised too."""
    from rook_spark.cdc.fixtures import write_events

    src = str(tmp_path / "log")
    write_events(generate_events(spark, 1200, seed=53), src, n_files=4)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    idx = DedupIndex(spark, str(tmp_path / "sigs"), n_buckets=8)
    engine.with_sink("dedup_index", idx.sink(), when="before")
    q = engine.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    assert len(engine.stats) >= 3  # genuinely micro-batched
    assert _index_state(idx) == _recompute_state(idx, engine.target().read())


def test_fresh_checkpoint_restart_does_not_fence_new_batches(spark, tmp_path):
    """r5 review finding 1: the index's fence is scoped to the engine's
    checkpoint run_id. A restart from a FRESH checkpoint restarts batch
    ids at 0 — with an unscoped fence the index would silently drop
    every new batch until the counter caught up; with the run_id
    threaded through the sink fan-out it falls through to the
    conditional-ordinal MERGE and stays in lockstep."""
    idx = DedupIndex(spark, str(tmp_path / "sigs"), k=3, n_hashes=4, n_buckets=4)
    sink = idx.sink()
    # "run A" applies batches 0..2
    for bid in range(3):
        sink(_flat(spark, [("r", f"a{bid}", f"alpha beta gamma {bid}", "I", bid + 1)]),
             bid, "ckptA")
    before = _index_state(idx)
    assert len(before) == 3
    # restart from a fresh checkpoint: batch ids restart at 0, new run_id
    sink(_flat(spark, [("r", "new", "delta epsilon zeta eta", "I", 10)]), 0, "ckptB")
    st = _index_state(idx)
    assert ("r", "new") in st and len(st) == 4
    # same run_id + old batch id IS still fenced (crash-window replay)
    v = idx.table().current_version()
    sink(_flat(spark, [("r", "dup", "theta iota kappa lambda", "I", 11)]), 0, "ckptB")
    assert idx.table().current_version() == v and ("r", "dup") not in _index_state(idx)


def test_non_string_keys_get_typed_index(spark, tmp_path):
    """r5 review finding 4: the index table's key columns take their
    ACTUAL types from the first batch — a long doc_id must round-trip as
    long, not be silently declared string."""
    idx = DedupIndex(
        spark, str(tmp_path / "sigs"), key_cols=["doc_id"], text_col="text",
        k=2, n_hashes=4, n_buckets=4,
    )
    flat = spark.createDataFrame(
        [(7, "some words to shingle here", "I", 1, 1, 0, 0)],
        "doc_id long, text string, op string, commit_ordinal long, "
        "offset long, source_partition int, tx_id long",
    )
    idx.sink()(flat, 0)
    row = idx.signatures().first()
    assert row["doc_id"] == 7 and isinstance(row["doc_id"], int)
    assert idx.table().snapshot().schema()["doc_id"].dataType.typeName() == "long"
    # loading before any batch exists is a loud error, not a bad create
    idx2 = DedupIndex(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="rebuild"):
        idx2.table()


def test_rebuild_repairs_a_dead_lettered_epoch(spark, tmp_path):
    """The FAILURE-CONTRACT repair path: an epoch whose sink invocation
    failed (dead-lettered; main table committed and advanced watermarks)
    leaves the index diverged — rebuild() recomputes from the main table,
    restores equality AND the stored ordinals, so later incremental
    maintenance still refuses stale re-deliveries."""
    ev = generate_events(spark, 1200, seed=54)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    idx = DedupIndex(spark, str(tmp_path / "sigs"), n_buckets=8)
    calls = {"n": 0}
    real = idx.sink()

    def flaky(flat, batch_id, run_id=""):
        calls["n"] += 1
        if calls["n"] == 2:  # epoch 1's sink invocation dies
            raise RuntimeError("simulated sink failure")
        real(flat, batch_id, run_id)

    engine.with_sink("dedup_index", flaky, when="before")
    for i, (lo, hi) in enumerate([(0, 400), (400, 800), (800, 1200)]):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    want = _recompute_state(idx, engine.target().read())
    assert _index_state(idx) != want          # diverged (epoch 1 lost)
    n = idx.rebuild(engine.target())
    assert _index_state(idx) == want and n == len(want)
    # post-rebuild: stale re-delivery for an indexed key still loses
    some_key = next(iter(want))
    stale = _flat(spark, [(*some_key, "stale text body", "U", -1)])
    idx.sink()(stale, 10 ** 6)
    assert _index_state(idx)[some_key] == want[some_key]


def test_candidates_probe_batch_against_index(spark, tmp_path):
    """Incremental near-dup probe: a new doc near-identical to an
    already-indexed doc collides in a band; unrelated docs do not; the
    batch never joins itself (cross pairs only, self-matches removed)."""
    idx = DedupIndex(spark, str(tmp_path / "sigs"), k=2, n_hashes=8, n_buckets=4)
    sink = idx.sink()
    base = "the quick brown fox jumps over the lazy dog again and again"
    sink(
        _flat(
            spark,
            [
                ("r", "orig", base, "I", 1),
                ("r", "other", "completely unrelated legal boilerplate text here", "I", 2),
                ("r", "tiny", "x", "I", 3),  # shingleless: must never collide
            ],
        ),
        0,
    )
    batch = spark.createDataFrame(
        [("r", "copy", base + " trailing"), ("r", "fresh", "nothing in common with anything")],
        "repo string, path string, content string",
    )
    pairs = {
        ((r["repo_a"], r["path_a"]), (r["repo_b"], r["path_b"]))
        for r in idx.candidates(idx.compute_signatures(batch)).collect()
    }
    assert (("r", "orig"), ("r", "copy")) in pairs
    assert all(b != ("r", "fresh") for _, b in pairs)
    assert all(a != ("r", "tiny") for a, _ in pairs)


def test_with_sink_run_id_detection_by_name(spark, tmp_path):
    """r5 second review pass: run_id injection keys off the parameter
    NAME (or an explicit pass_run_id override), never arity — a sink
    with an unrelated defaulted third parameter must not have a run_id
    string rammed into it, and a keyword-only run_id must be detected."""
    ev = generate_events(spark, 300, seed=55)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=4).ignoring_servers(99)
    seen = {}

    def unrelated_third(flat, bid, tag="mytag"):
        seen["unrelated"] = tag          # must stay the default, not a run_id

    def kw_only(flat, bid, *, run_id=""):
        seen["kw_only"] = run_id

    def forced_off(flat, bid, run_id="sentinel"):
        seen["forced_off"] = run_id      # pass_run_id=False -> default kept

    engine.with_sink("a", unrelated_third, when="before")
    engine.with_sink("b", kw_only, when="before")
    engine.with_sink("c", forced_off, when="before", pass_run_id=False)
    engine.replay(ev, 0)
    assert seen["unrelated"] == "mytag"
    assert seen["kw_only"] == ""          # batch replay's run_id
    assert seen["forced_off"] == "sentinel"
    # nothing got dead-lettered by a mis-injected argument
    import os
    assert not os.path.exists(engine.dead_letter_path)


def test_rebuild_tolerates_tables_without_stored_ordinals(spark, tmp_path):
    """rebuild() on a bulk-loaded table that never went through the
    conditional-MERGE path (no stored __ordinal/__offset) must index it
    with -1 ordinals instead of crashing on the missing columns."""
    from pyspark.sql import types as T

    from rook_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "plain"), schema,
                         ["repo", "path"], n_buckets=4)
    t.merge(spark.createDataFrame(
        [("r", "a", "alpha beta gamma delta", "I"),
         ("r", "b", "epsilon zeta eta theta", "I")],
        "repo string, path string, content string, op string"), 0)
    assert "__ordinal" not in t.read(include_internal=True).columns

    idx = DedupIndex(spark, str(tmp_path / "sigs"), k=3, n_hashes=4, n_buckets=4)
    n = idx.rebuild(t)
    assert n == 2
    assert _index_state(idx) == _recompute_state(idx, t.read())
    # post-bootstrap: any real change (ordinal >= 0) beats the -1 baseline
    idx.sink()(_flat(spark, [("r", "a", "totally new words here", "U", 0)]), 10)
    st = _index_state(idx)
    assert st[("r", "a")] == _recompute_state(
        idx, spark.createDataFrame([("r", "a", "totally new words here")],
                                   "repo string, path string, content string")
    )[("r", "a")]
