"""CDC-maintained incremental curation (cdc/curation.py): first-arrival
verdict assignment against maintained fingerprint/signature/count
state — crafted-batch semantics, delete-frees-state, frozen verdicts,
duplicate re-delivery, and the engine-fed e2e invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rook_spark.cdc.curation import CurationSink
from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events

# Disjoint vocabularies: near-dup verdicts must come only from docs the
# test DESIGNS to collide. Docs meant to near-dup share the cyclic base,
# and their suffixes reuse base words so the k=3 shingle SET is
# identical -> every minhash equal -> band collision is guaranteed, not
# probabilistic (disjoint sets can't collide: band keys hash 64-bit
# minima). Quality clears 0.36 on length+alpha alone (>=500 chars).
GOOD_A = ("alpha bravo charlie delta echo foxtrot " * 25).strip()
GOOD_B = ("golf hotel india juliet kilo lima " * 25).strip()
GOOD_C = ("mike november oscar papa quebec romeo " * 25).strip()
GOOD_D = ("sierra tango uniform victor whiskey xray " * 25).strip()
GOOD_E = ("yankee zulu maple cedar walnut spruce " * 25).strip()


def _flat(spark, rows):
    """(repo, path, content, op, commit_ordinal, offset) -> normalized
    batch frame (same shape the engine hands its before-phase sinks)."""
    return spark.createDataFrame(
        [(r, p, c, op, o, o, 0, 0) for (r, p, c, op, o) in rows],
        "repo string, path string, content string, op string, "
        "commit_ordinal long, offset long, source_partition int, tx_id long",
    )


def _verdicts(cs):
    return {
        (r["repo"], r["path"]): r["verdict"] for r in cs.verdicts().collect()
    }


def test_crafted_epoch_semantics(spark, tmp_path):
    bench = spark.createDataFrame(
        [("b", "b", "leak marker benchmark answer here definitely")],
        "repo string, path string, content string",
    )
    cs = CurationSink(
        spark, str(tmp_path / "cur"), bench=bench, domain_cap=2,
        n_buckets=4,
    )

    # epoch 0: canonical, later near-dup, exact dup, low quality,
    # contaminated — every verdict class in one batch
    cs._apply(_flat(spark, [
        ("r1", "a1", GOOD_A + " alpha", "U", 0),
        ("r1", "a2", GOOD_A + " alpha bravo", "U", 1),  # near-dup of a1 (later)
        ("r2", "b1", GOOD_B + " base", "U", 2),
        ("r2", "b2", GOOD_B + " base", "U", 3),       # byte-identical -> exact
        ("r2", "lq", "zz", "U", 4),                   # low quality
        ("r3", "e1", GOOD_C + " leak marker benchmark answer here yes", "U", 5),
    ]), 0, "run1")
    v = _verdicts(cs)
    assert v[("r1", "a1")].startswith("kept_")
    assert v[("r1", "a2")] == "near_dup"              # predecessor rule
    assert v[("r2", "b1")].startswith("kept_")
    assert v[("r2", "b2")] == "exact_dup"
    assert v[("r2", "lq")] == "low_quality"
    assert v[("r3", "e1")] == "contaminated"

    # epoch 1: near-dup vs the INDEX, domain cap at 2, frozen verdicts
    cs._apply(_flat(spark, [
        ("r1", "a3", GOOD_A + " alpha bravo charlie", "U", 10),  # near-dup of stored a1
        ("r1", "c1", GOOD_D + " fresh", "U", 11),     # admit #2 in r1
        ("r1", "c2", GOOD_E + " fresh", "U", 12),     # r1 full -> capped
        ("r1", "a2", GOOD_D + " totally new", "U", 13),  # update dropped doc
    ]), 1, "run1")
    v = _verdicts(cs)
    assert v[("r1", "a3")] == "near_dup"
    assert v[("r1", "c1")].startswith("kept_")
    assert v[("r1", "c2")] == "domain_capped"
    assert v[("r1", "a2")] == "near_dup"              # frozen at first arrival

    # epoch 2: delete the canonical b1 -> state freed; re-insert the
    # SAME bytes under a new key -> admitted again
    cs._apply(_flat(spark, [("r2", "b1", "", "D", 20)]), 2, "run1")
    v = _verdicts(cs)
    assert ("r2", "b1") not in v
    cs._apply(_flat(spark, [("r2", "b3", GOOD_B + " base", "U", 30)]), 3, "run1")
    v = _verdicts(cs)
    assert v[("r2", "b3")].startswith("kept_")

    # crash-window duplicate re-delivery of epoch 3: fence absorbs it
    before = _verdicts(cs)
    cs._apply(_flat(spark, [("r2", "b3", GOOD_B + " base", "U", 30)]), 3, "run1")
    assert _verdicts(cs) == before


def test_split_is_key_stable_and_cap_counts_persist(spark, tmp_path):
    cs = CurationSink(
        spark, str(tmp_path / "cur"), domain_cap=3, n_buckets=4,
        quality_threshold=0.0,
    )
    # 5 fully-distinct docs (per-doc vocabulary — no shared shingles, so
    # near-dup can never fire) in one domain across two epochs:
    # admissions stop at 3 even though each epoch alone is under the cap
    def doc(i: int) -> str:
        return " ".join(f"doc{i}word{j}" for j in range(80))

    cs._apply(_flat(spark, [
        ("d", f"p{i}", doc(i), "U", i) for i in range(2)
    ]), 0, "r")
    cs._apply(_flat(spark, [
        ("d", f"p{i}", doc(i), "U", 10 + i) for i in range(2, 5)
    ]), 1, "r")
    v = _verdicts(cs)
    kept = [k for k, x in v.items() if x.startswith("kept_")]
    capped = [k for k, x in v.items() if x == "domain_capped"]
    assert len(kept) == 3 and len(capped) == 2
    # earlier arrivals won the slots
    assert ("d", "p0") in kept and ("d", "p1") in kept and ("d", "p2") in kept

    # split is the pure key hash: recompute independently
    from rook_spark.functions.sampling import hash_split

    ref = hash_split(
        spark.createDataFrame(list(kept), "repo string, path string"),
        {"train": 0.8, "val": 0.1, "test": 0.1}, on=["repo", "path"], seed=1,
    ).collect()
    want = {(r["repo"], r["path"]): f"kept_{r['split']}" for r in ref}
    assert {k: v[k] for k in kept} == want


def test_engine_fed_invariants(spark, tmp_path):
    """Through the real engine on the seeded log: every live main-table
    key carries exactly one verdict, verdicts come from the closed enum,
    per-domain kept counts respect the cap, and a duplicated-suffix
    re-delivery changes nothing."""
    ev = generate_events(spark, 2500, seed=77)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    cs = CurationSink(
        spark, str(tmp_path / "cur"), domain_cap=50, n_buckets=8,
        quality_threshold=0.0,   # fixture contents are tiny — pass all
    )
    engine.with_sink("curation", cs.sink(), when="before")
    engine.replay(ev.where(F.col("offset") < 1200), 0)
    engine.replay(ev.where(F.col("offset") >= 1200), 1)

    before = _verdicts(cs)
    engine.replay(ev.where(F.col("offset") >= 1800), 2)   # dup re-delivery
    after = _verdicts(cs)
    assert after == before

    enum_prefixes = ("kept_", "low_quality", "exact_dup", "near_dup",
                     "contaminated", "domain_capped")
    assert all(any(x.startswith(p) for p in enum_prefixes) for x in after.values())

    # verdict keys ⊇ live main-table keys (deleted keys have no verdict;
    # dropped-then-deleted mains may keep a frozen verdict only while
    # live — here: every live key has exactly one verdict row)
    live = {(r["repo"], r["path"]) for r in engine.target().read().collect()}
    missing = live - set(after)
    assert not missing

    # per-domain kept counts respect the cap AND match the counts table
    kept_by_dom: dict[str, int] = {}
    for (repo, _p), x in after.items():
        if x.startswith("kept_"):
            kept_by_dom[repo] = kept_by_dom.get(repo, 0) + 1
    assert all(n <= 50 for n in kept_by_dom.values())
    stored = {
        r["repo"]: r["n_admitted"]
        for r in cs._counts_table().read().collect()
    }
    live_kept = {
        d: n for d, n in kept_by_dom.items()
    }
    for d, n in live_kept.items():
        assert stored.get(d, 0) >= n  # stored counts admissions incl. later-deleted


def test_streaming_tail_assigns_verdicts(spark, tmp_path):
    """The curation sink under a REAL Structured Streaming tail (S1 →
    foreachBatch): micro-batched delivery must keep every invariant the
    batch-replay e2e pins — the production deployment shape. (Verdicts
    are first-arrival so the exact kept/dropped SET depends on epoch
    boundaries; the INVARIANTS are what's delivery-shape-independent.)"""
    from rook_spark.cdc.fixtures import write_events

    src = str(tmp_path / "log")
    write_events(generate_events(spark, 1500, seed=31), src, n_files=4)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    cs = CurationSink(
        spark, str(tmp_path / "cur"), domain_cap=50, n_buckets=8,
        quality_threshold=0.0,
    )
    engine.with_sink("curation", cs.sink(), when="before")
    q = engine.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    assert len(engine.stats) >= 3  # genuinely micro-batched

    v = _verdicts(cs)
    live = {(r["repo"], r["path"]) for r in engine.target().read().collect()}
    assert live <= set(v)
    pref = ("kept_", "low_quality", "exact_dup", "near_dup",
            "contaminated", "domain_capped")
    assert all(any(x.startswith(p) for p in pref) for x in v.values())
    kept_by_dom: dict[str, int] = {}
    for (repo, _p), x in v.items():
        if x.startswith("kept_"):
            kept_by_dom[repo] = kept_by_dom.get(repo, 0) + 1
    assert kept_by_dom and all(n <= 50 for n in kept_by_dom.values())


def test_fresh_checkpoint_restart_admits_new_batches(spark, tmp_path):
    """A restart from a FRESH checkpoint restarts batch ids at 0 under a
    new run_id: the run_id-scoped fence must fall through (new docs land)
    while frozen verdicts make any overlapping re-delivery a no-op."""
    cs = CurationSink(
        spark, str(tmp_path / "cur"), domain_cap=10, n_buckets=4,
        quality_threshold=0.0,
    )
    for bid in range(3):
        cs._apply(_flat(spark, [
            ("r", f"a{bid}", " ".join(f"w{bid}x{j}" for j in range(60)), "U", bid)
        ]), bid, "ckptA")
    before = _verdicts(cs)
    assert len(before) == 3
    # fresh checkpoint: batch 0 again, NEW run_id, one new + one re-delivered doc
    cs._apply(_flat(spark, [
        ("r", "new", " ".join(f"nz{j}" for j in range(60)), "U", 10),
        ("r", "a1", " ".join(f"w1x{j}" for j in range(60)), "U", 1),
    ]), 0, "ckptB")
    after = _verdicts(cs)
    assert ("r", "new") in after and len(after) == 4
    assert {k: after[k] for k in before} == before  # frozen survived


def test_update_of_admitted_doc_refreshes_fingerprint(spark, tmp_path):
    """An UPDATE to an ADMITTED doc must refresh its fingerprint row
    (old fp freed, new fp owned): a later doc byte-identical to the
    NEW content is exact_dup; one identical to the OLD content passes
    the exact stage and is judged on near-dup against CURRENT sigs —
    and a final delete (via the now-current verdict fp) frees the slot."""
    cs = CurationSink(
        spark, str(tmp_path / "cur"), domain_cap=10, n_buckets=4,
    )
    cs._apply(_flat(spark, [("r", "x1", GOOD_A + " alpha", "U", 0)]), 0, "run")
    assert _verdicts(cs)[("r", "x1")].startswith("kept_")
    # update x1 to a completely different text
    cs._apply(_flat(spark, [("r", "x1", GOOD_B + " base", "U", 10)]), 1, "run")
    v = _verdicts(cs)
    assert v[("r", "x1")].startswith("kept_")  # verdict frozen
    # new doc == x1's NEW bytes -> exact_dup; == x1's OLD bytes -> the
    # old fp was freed AND old sigs replaced, so it is admitted fresh
    cs._apply(_flat(spark, [
        ("r", "x2", GOOD_B + " base", "U", 20),
        ("r", "x3", GOOD_A + " alpha", "U", 21),
    ]), 2, "run")
    v = _verdicts(cs)
    assert v[("r", "x2")] == "exact_dup"
    assert v[("r", "x3")].startswith("kept_")
    # delete x1: its CURRENT fp row must be freed (stale-fp bug would
    # leave GOOD_B's fp owned forever) -> same bytes re-admit
    cs._apply(_flat(spark, [("r", "x1", "", "D", 30)]), 3, "run")
    cs._apply(_flat(spark, [("r", "x4", GOOD_B + " base", "U", 40)]), 4, "run")
    assert _verdicts(cs)[("r", "x4")].startswith("kept_")
