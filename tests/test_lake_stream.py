"""Lake changelog as a Structured Streaming source (lake/stream.py):
the invariant is that the streamed per-epoch feed, LWW-folded, always
reproduces the table state — across multi-epoch tails, maintenance
commits interleaved mid-stream, and checkpoint restarts (exactly-once:
a recovered query re-emits nothing) — and that the COW contract is
enforced loudly rather than epochs being dropped silently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events
from rook_spark.lake.stream import LakeChangeDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(LakeChangeDataSource)
    return spark


def _feed(spark, path, start=-1, end=None):
    r = (spark.read.format("rook_lake_changes")
         .option("path", path).option("start_version", start))
    if end is not None:
        r = r.option("end_version", end)
    return r.load()


def _fold(df):
    w = Window.partitionBy("repo", "path").orderBy(
        F.col("ordinal").desc(), F.col("offset").desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("repo", "path", "content")
    )


def _same(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_batch_feed_folds_to_table_state(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 2000, seed=91)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 1000), 0)
    eng.replay(ev.where(F.col("offset") >= 1000), 1)
    feed = _feed(spark, str(tmp_path / "t"))
    assert set(feed.select("commit_version").distinct().toPandas()
               ["commit_version"]) == {1, 2}
    assert _same(_fold(feed), eng.target().read().select("repo", "path", "content"))
    # ops survive verbatim (I/U/D — the reduced rows' own ops)
    assert set(feed.select("op").distinct().toPandas()["op"]) <= {"I", "U", "D"}


def test_bounded_window_reads_one_epoch(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 1500, seed=92)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 700), 0)
    eng.replay(ev.where(F.col("offset") >= 700), 1)
    one = _feed(spark, str(tmp_path / "t"), start=1, end=2)
    assert set(one.select("commit_version").distinct().toPandas()
               ["commit_version"]) == {2}


def test_streaming_tail_with_maintenance_and_restart(registered, tmp_path):
    """The full production shape: tail the feed while epochs land, a
    compact interleaves (maintenance = version bump, NO change rows,
    no error), the query restarts from its checkpoint (re-emits
    nothing), then keeps tailing."""
    spark = registered
    ev = generate_events(spark, 2400, seed=93)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 600), 0)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("rook_lake_changes")
            .option("path", str(tmp_path / "t")).option("start_version", 0)
            .load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    q.processAllAvailable()
    eng.replay(ev.where((F.col("offset") >= 600) & (F.col("offset") < 1200)), 1)
    eng.target().compact()
    eng.replay(ev.where((F.col("offset") >= 1200) & (F.col("offset") < 1800)), 2)
    q.processAllAvailable()
    q.stop()
    n_before = spark.read.parquet(out).count()

    q2 = start()
    q2.processAllAvailable()
    assert spark.read.parquet(out).count() == n_before  # nothing re-emitted
    eng.replay(ev.where(F.col("offset") >= 1800), 3)
    q2.processAllAvailable()
    q2.stop()
    df = spark.read.parquet(out)
    assert df.count() > n_before  # the tail continued after restart
    assert _same(_fold(df), eng.target().read().select("repo", "path", "content"))


def test_cow_data_commit_refused_loudly(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 800, seed=94)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4).ignoring_servers(99)
    eng.replay(ev, 0)
    with pytest.raises(Exception, match="copy-on-write"):
        _feed(spark, str(tmp_path / "t")).count()


def test_mor_predicate_delete_rides_the_feed(registered, tmp_path):
    """delete_where(mode='mor') writes key tombstone deltas — they must
    surface as 'D' feed rows, so downstream consumers erase too (the
    GDPR-propagation story)."""
    spark = registered
    ev = generate_events(spark, 1200, seed=95)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev, 0)
    res = eng.target().delete_where(F.col("lang") == "md", mode="mor")
    assert res["deleted_rows"] > 0
    last = _feed(spark, str(tmp_path / "t"), start=1)
    assert last.where(F.col("op") == "D").count() >= res["deleted_rows"]
    assert _same(_fold(_feed(spark, str(tmp_path / "t"))),
                 eng.target().read().select("repo", "path", "content"))


def test_start_version_aliases(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 800, seed=96)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev, 0)
    full = (spark.read.format("rook_lake_changes")
            .option("path", str(tmp_path / "t"))
            .option("start_version", "earliest").load())
    assert full.count() > 0
    none_yet = (spark.read.format("rook_lake_changes")
                .option("path", str(tmp_path / "t"))
                .option("start_version", "latest").load())
    assert none_yet.count() == 0  # nothing after the current version


def test_vacuumed_window_fails_with_retention_error(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 1200, seed=97)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4,
                    write_mode="mor").ignoring_servers(99)
    for i, (lo, hi) in enumerate([(0, 400), (400, 800), (800, 1200)]):
        eng.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    eng.target().compact()
    eng.target().vacuum(keep_last=1, min_age_s=0)
    with pytest.raises(Exception, match="vacuum|retention"):
        _feed(spark, str(tmp_path / "t"), start="earliest").count()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FEED_OP = st.one_of(
    st.tuples(
        st.just("merge"),
        st.lists(
            st.tuples(st.integers(0, 9), st.one_of(st.none(), st.integers(0, 99))),
            min_size=1, max_size=6, unique_by=lambda kv: kv[0],
        ),
    ),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("delete"), st.integers(0, 5)),
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=st.lists(_FEED_OP, min_size=2, max_size=6))
def test_feed_fold_matches_state_under_interleavings(
    spark, tmp_path_factory, registered, ops
):
    """Property: after ANY interleaving of MOR merges, compactions, and
    tombstone erasures, the full batch feed LWW-folds to exactly the
    table's state AND an independent dict model — compaction emits
    nothing yet loses nothing, erasures ride as 'D' rows, and no epoch
    is dropped or double-emitted."""
    from pyspark.sql import types as T

    from rook_spark.lake.table import LakeTable

    tmp = tmp_path_factory.mktemp("feed_alg")
    table = LakeTable.create(
        spark, str(tmp / "t"),
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("content", T.StringType()),
        ]),
        ["repo", "path"], n_buckets=4,
    )
    model: dict[str, str] = {}
    for i, (kind, arg) in enumerate(ops):
        if kind == "merge":
            rows = [
                ("r", f"p{k}", f"v{i}_{k}" if v is not None else None,
                 "U" if v is not None else "D", i, k)
                for k, v in arg
            ]
            table.merge_mor(spark.createDataFrame(
                rows, "repo string, path string, content string, op string, "
                      "__ordinal long, __offset long"), i)
            for k, v in arg:
                if v is None:
                    model.pop(f"p{k}", None)
                else:
                    model[f"p{k}"] = f"v{i}_{k}"
        elif kind == "compact":
            table.compact()
        elif kind == "delete":
            table.delete_where(
                F.col("content").startswith(f"v{arg}_"), mode="mor")
            model = {p: c for p, c in model.items()
                     if not c.startswith(f"v{arg}_")}
    feed = (registered.read.format("rook_lake_changes")
            .option("path", str(tmp / "t"))
            .option("start_version", "earliest").load())
    folded = {r["path"]: r["content"] for r in _fold(feed).collect()}
    state = {r["path"]: r["content"] for r in table.read().collect()}
    assert folded == state == model


def test_empty_mor_epoch_and_rollback_emit_nothing(registered, tmp_path):
    """An epoch whose events are all decoys (empty MOR commit — batch id
    advances, nothing else changes) and a rollback (batch id moves
    BACKWARD) must both ride the feed silently — neither is a COW
    commit, and either once crashed the stream."""
    spark = registered
    ev = generate_events(spark, 1000, seed=98)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 500), 0)
    v_good = eng.target().current_version()
    # decoy-only epoch: every event filtered out -> empty commit
    eng.replay(ev.where((F.col("offset") >= 500)
                        & (F.col("server_id") == 99)), 1)
    eng.replay(ev.where(F.col("offset") >= 500), 2)
    eng.target().rollback(v_good)
    feed = _feed(spark, str(tmp_path / "t"), start="earliest")
    assert feed.count() > 0  # no ValueError, rollback emitted nothing
    # after re-replay, fold still converges (re-emission absorbed by LWW)
    eng.replay(ev.where(F.col("offset") >= 500), 3)
    assert _same(_fold(_feed(spark, str(tmp_path / "t"), start="earliest")),
                 eng.target().read().select("repo", "path", "content"))


def test_staged_wap_epochs_never_reach_the_feed(registered, tmp_path):
    """Write-audit-publish: while staging is active the feed must end at
    the PUBLISHED ref — pre-audit epochs are never emitted, so a failed
    audit's rollback never needs un-emitting from consumers."""
    spark = registered
    ev = generate_events(spark, 1000, seed=99)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=4,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 500), 0)
    t = eng.target()
    t.begin_staging()
    eng.replay(ev.where(F.col("offset") >= 500), 1)  # staged, unaudited
    staged_versions = set(
        r["commit_version"] for r in
        _feed(spark, str(tmp_path / "t"), start="earliest")
        .select("commit_version").distinct().collect()
    )
    assert max(staged_versions) <= t.snapshot().refs["main"]
    t.publish()
    published = _feed(spark, str(tmp_path / "t"), start="earliest")
    assert _same(_fold(published),
                 t.read().select("repo", "path", "content"))
