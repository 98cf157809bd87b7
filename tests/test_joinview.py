"""JoinView — incrementally maintained LEFT JOIN over two lake tables
(cdc/joinview.py). The invariant everywhere: after any sequence of base
commits and refresh() calls (including duplicates and maintenance-only
windows), the view equals the full Spark join of the CURRENT base
states; refresh cost is O(changed keys + dim fan-out), never O(table)
(pinned through the recomputed_keys stat)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.joinview import JoinView
from rook_spark.lake.table import LakeTable


@pytest.fixture()
def lr(spark, tmp_path):
    L = LakeTable.create(spark, str(tmp_path / "L"), key_cols=["k"], n_buckets=8,
                         schema=T.StructType.fromDDL("k long, fk long, v string"))
    R = LakeTable.create(spark, str(tmp_path / "R"), key_cols=["fk"], n_buckets=4,
                         schema=T.StructType.fromDDL("fk long, owner string"))
    jv = JoinView(spark, str(tmp_path / "V"), lambda: L, lambda: R,
                  join_on=["fk"], n_buckets=8)
    return L, R, jv


def _full(L, R):
    return {r["k"]: (r["v"], r["r_owner"]) for r in
            L.read().join(R.read().select("fk", F.col("owner").alias("r_owner")),
                          "fk", "left").collect()}


def _got(jv):
    return {r["k"]: (r["v"], r["r_owner"]) for r in jv.read().collect()}


def _facts(spark, rows):
    return spark.createDataFrame(rows, "k long, fk long, v string, op string")


def _dims(spark, rows):
    return spark.createDataFrame(rows, "fk long, owner string, op string")


def test_incremental_equals_full_join_through_epochs(spark, lr):
    L, R, jv = lr
    L.merge(_facts(spark, [(i, i % 3, f"v{i}", "U") for i in range(12)]), 0)
    R.merge(_dims(spark, [(i, f"own{i}", "U") for i in range(3)]), 0)
    assert jv.refresh()["recomputed_keys"] == 12
    assert _got(jv) == _full(L, R)

    # dim update fans out through the reverse index, O(fanout) not O(L)
    R.merge(_dims(spark, [(1, "OWN1B", "U")]), 1)
    r = jv.refresh()
    assert r["recomputed_keys"] == 4  # k in {1,4,7,10}
    assert _got(jv) == _full(L, R)

    # fact-side: fk change, delete, dangling fk (left-join null)
    L.merge(_facts(spark, [(2, 9, "v2b", "U"), (3, 0, None, "D"),
                           (20, 9, "v20", "U")]), 1)
    jv.refresh()
    assert _got(jv) == _full(L, R)
    assert _got(jv)[2] == ("v2b", None) and 3 not in _got(jv)

    # dim delete nulls out its facts
    R.merge(_dims(spark, [(0, None, "D")]), 2)
    jv.refresh()
    assert _got(jv) == _full(L, R)
    assert all(v[1] is None for k, v in _got(jv).items() if k % 3 == 0 and k != 2)


def test_refresh_is_idempotent_and_noop_detects(spark, lr):
    L, R, jv = lr
    L.merge(_facts(spark, [(1, 0, "a", "U")]), 0)
    R.merge(_dims(spark, [(0, "o", "U")]), 0)
    jv.refresh()
    state = _got(jv)
    assert jv.refresh()["skipped"] is True
    assert _got(jv) == state
    # maintenance-only window: versions move, zero net key changes
    L.compact(max_files_per_bucket=0)
    r = jv.refresh()
    assert r["skipped"] is False and r["recomputed_keys"] == 0
    assert _got(jv) == state


def test_base_rollback_is_just_another_diff(spark, lr):
    L, R, jv = lr
    L.merge(_facts(spark, [(i, 0, f"v{i}", "U") for i in range(6)]), 0)
    R.merge(_dims(spark, [(0, "o", "U")]), 0)
    jv.refresh()
    v_good = L.current_version()
    L.merge(_facts(spark, [(1, 0, "BAD", "U"), (99, 0, "BAD", "U")]), 1)
    jv.refresh()
    assert _got(jv)[1] == ("BAD", "o") and 99 in _got(jv)
    L.rollback(v_good)  # bad epoch un-happens
    jv.refresh()
    assert _got(jv) == _full(L, R)
    assert _got(jv)[1] == ("v1", "o") and 99 not in _got(jv)


def test_mor_bases_with_unfolded_deltas(spark, tmp_path):
    L = LakeTable.create(spark, str(tmp_path / "L"), key_cols=["k"], n_buckets=4,
                         schema=T.StructType.fromDDL(
                             "k long, fk long, v string, __ordinal long, __offset long"))
    R = LakeTable.create(spark, str(tmp_path / "R"), key_cols=["fk"], n_buckets=2,
                         schema=T.StructType.fromDDL("fk long, owner string"))
    jv = JoinView(spark, str(tmp_path / "V"), lambda: L, lambda: R,
                  join_on=["fk"], right_cols={"owner": "r_owner"}, n_buckets=4)
    mk = lambda rows, o: spark.createDataFrame(  # noqa: E731
        [(k, fk, v, o, i) for i, (k, fk, v) in enumerate(rows)],
        "k long, fk long, v string, __ordinal long, __offset long",
    ).withColumn("op", F.lit("U"))
    L.merge_mor(mk([(i, i % 2, f"v{i}") for i in range(8)], 1), 0)
    R.merge(_dims(spark, [(0, "e", "U"), (1, "o", "U")]), 0)
    jv.refresh()
    L.merge_mor(mk([(2, 1, "v2b"), (9, 0, "v9")], 2), 1)  # unfolded deltas
    jv.refresh()
    want = {r["k"]: (r["v"], r["r_owner"]) for r in
            L.read().join(R.read().select("fk", F.col("owner").alias("r_owner")),
                          "fk", "left").collect()}
    got = {r["k"]: (r["v"], r["r_owner"]) for r in jv.read().collect()}
    assert got == want and got[2] == ("v2b", "o")


def test_vacuumed_window_refuses_with_repair_path(spark, lr):
    L, R, jv = lr
    L.merge(_facts(spark, [(1, 0, "a", "U")]), 0)
    R.merge(_dims(spark, [(0, "o", "U")]), 0)
    jv.refresh()
    for i in range(4):  # churn versions past retention
        L.merge(_facts(spark, [(1, 0, f"a{i}", "U")]), 1 + i)
    L.vacuum(keep_last=1)
    with pytest.raises(FileNotFoundError, match="full_recompute"):
        jv.refresh()
    jv.full_recompute()
    assert _got(jv) == _full(L, R)
    # and incremental maintenance resumes after the repair
    L.merge(_facts(spark, [(2, 0, "b", "U")]), 9)
    jv.refresh()
    assert _got(jv) == _full(L, R)


def test_wap_staging_base_contributes_published_state(spark, lr):
    L, R, jv = lr
    L.merge(_facts(spark, [(1, 0, "clean", "U")]), 0)
    R.merge(_dims(spark, [(0, "o", "U")]), 0)
    jv.refresh()
    L.begin_staging()
    L.merge(_facts(spark, [(1, 0, "STAGED", "U"), (2, 0, "STAGED", "U")]), 1)
    r = jv.refresh()
    assert r["skipped"] is True  # published ref unchanged -> nothing to do
    assert _got(jv)[1] == ("clean", "o") and 2 not in _got(jv)
    L.publish()
    jv.refresh()
    assert _got(jv)[1] == ("STAGED", "o") and 2 in _got(jv)


def test_engine_fed_bases_end_to_end(spark, tmp_path):
    """Two live CdcEngines demux one log (facts keyed (repo,path) with
    fk=repo; dims keyed repo); the view tracks both through epochs and
    equals the full join of the final engine states."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 1200, seed=41)
    eng_l = CdcEngine(spark, str(tmp_path / "facts"), n_buckets=8).ignoring_servers(99)
    # dim stream: same log re-keyed by repo; owner changes over time so
    # dim-side updates actually fan out
    dim_ev = ev.withColumn(
        "after",
        F.when(F.col("after").isNotNull(), F.struct(
            F.col("after.repo").alias("repo"),
            F.concat(F.lit("own|"), F.substring(F.md5(
                F.concat(F.col("after.repo"), F.lit("|"),
                         F.floor(F.col("offset") / 400).cast("string"))), 1, 8)
            ).alias("owner"))),
    ).withColumn("before", F.lit(None).cast("struct<repo:string,owner:string>")) \
     .where(F.col("op") != "D")
    eng_r = CdcEngine(spark, str(tmp_path / "dims"), n_buckets=4,
                      key_cols=("repo",)).ignoring_servers(99)
    jv = JoinView(spark, str(tmp_path / "V"),
                  eng_l.target, eng_r.target, join_on=["repo"],
                  right_cols={"owner": "owner"}, n_buckets=8)
    for lo, hi, bid in ((0, 600, 0), (600, 1200, 1)):
        win = (F.col("offset") >= lo) & (F.col("offset") < hi)
        eng_l.replay(ev.where(win), bid)
        eng_r.replay(dim_ev.where(win), bid)
        jv.refresh()
    want = {(r["repo"], r["path"]): (r["content"], r["owner"]) for r in
            eng_l.target().read().join(
                eng_r.target().read().select("repo", "owner"), "repo", "left"
            ).collect()}
    got = {(r["repo"], r["path"]): (r["content"], r["owner"])
           for r in jv.read().collect()}
    assert got == want
    assert len(got) > 0 and any(v[1] is not None for v in got.values())


def test_streaming_tail_maintains_view(spark, tmp_path):
    """The deployment shape: a live file-tail stream drives the facts
    engine with the view attached as an after-phase sink — the view
    converges to the full join at stream end (and the sink's batch args
    are ignored by design: refresh is version-driven)."""
    from rook_spark.cdc.engine import CdcEngine, await_stream_ready
    from rook_spark.cdc.fixtures import generate_events, write_events

    ev = generate_events(spark, 900, seed=43)
    src = str(tmp_path / "src")
    write_events(ev, src, n_files=3)
    eng_l = CdcEngine(spark, str(tmp_path / "facts"), n_buckets=8).ignoring_servers(99)
    R = LakeTable.create(spark, str(tmp_path / "R"), key_cols=["lang"], n_buckets=2,
                         schema=T.StructType.fromDDL("lang string, family string"))
    R.merge(spark.createDataFrame(
        [(lg, f"fam_{lg}") for lg in ("I", "U", "D", "error", "click", "view")],
        "lang string, family string").withColumn("op", F.lit("U")), 0)
    jv = JoinView(spark, str(tmp_path / "V"), eng_l.target, lambda: R,
                  join_on=["lang"], right_cols={"family": "family"}, n_buckets=8)
    eng_l.with_sink("join_view", jv.sink(), when="after")
    q = eng_l.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    await_stream_ready(q)
    q.processAllAvailable()
    q.stop()
    want = {(r["repo"], r["path"]): r["family"] for r in
            eng_l.target().read().join(R.read().select(
                "lang", F.col("family").alias("family")), "lang", "left").collect()}
    got = {(r["repo"], r["path"]): r["family"] for r in jv.read().collect()}
    assert got == want and len(got) > 0
