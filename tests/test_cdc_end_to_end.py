"""The minimum end-to-end slice (SURVEY.md §7.2 step 1) and its
extensions: generate seeded event log → normalize → LWW reduce → MERGE
→ final table state equals the independent DuckDB replay oracle,
per-row sha256(content) included.

Reference test style being mirrored: deterministic mutations + golden
final sink state (``h4com/IntegrationTest.java:187-197``).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import (
    generate_events,
    oracle_final_state_sql,
    with_replayed_suffix,
    write_events,
)

N_EVENTS = 4000


def _oracle_df(events_path: str, evolved: bool = False):
    con = duckdb.connect()
    try:
        return con.execute(
            oracle_final_state_sql(f"{events_path}/*.parquet", evolved=evolved)
        ).fetch_df()
    finally:
        con.close()


def _final_state_pdf(table):
    df = table.read()
    cols = [c for c in df.columns]
    return (
        df.withColumn("content_sha", F.sha2("content", 256))
        .select(*cols, "content_sha")
        .orderBy("repo", "path")
        .toPandas()
    )


def _assert_matches_oracle(table, events_path: str, evolved: bool = False):
    import hashlib

    got = _final_state_pdf(table)
    want = _oracle_df(events_path, evolved=evolved)
    want["content_sha"] = want["content"].map(
        lambda s: hashlib.sha256(s.encode()).hexdigest()
    )
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    got = got.sort_values(["repo", "path"]).reset_index(drop=True)
    want = want.sort_values(["repo", "path"]).reset_index(drop=True)
    for col in ["repo", "path", "commit", "lang", "content", "content_sha"]:
        assert got[col].tolist() == want[col].tolist(), f"mismatch in column {col}"
    return got


@pytest.fixture(scope="module")
def event_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events") / "log")
    ev = generate_events(spark, N_EVENTS, seed=42)
    write_events(ev, path, n_files=4)
    return path


def test_batch_replay_matches_duckdb_oracle(spark, event_log, tmp_path):
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    events = spark.read.parquet(event_log)
    stats = engine.replay(events)
    assert not stats.skipped and stats.rows_in > 0
    got = _assert_matches_oracle(engine.target(), event_log)
    assert len(got) > 100


def test_replay_in_epochs_matches_oracle(spark, event_log, tmp_path):
    """Multiple sequential epochs (micro-batch analog) converge to the
    same state as one big batch."""
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    events = spark.read.parquet(event_log)
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2500), (2500, N_EVENTS)]):
        engine.replay(events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    _assert_matches_oracle(engine.target(), event_log)


def test_duplicate_replay_is_exactly_once(spark, event_log, tmp_path):
    """At-least-once source: a re-delivered suffix (duplicate offsets in a
    LATER batch) must not change final state — the lineage watermark
    anti-filter drops already-applied offsets (north_rule exactly-once)."""
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    events = spark.read.parquet(event_log)
    engine.replay(events, 0)
    v1 = engine.target().current_version()
    # batch 1 re-delivers the last 20% verbatim
    dup = events.where(F.col("offset") >= int(N_EVENTS * 0.8))
    stats = engine.replay(dup, 1)
    assert stats.rows_in == 0  # all fenced by watermark
    _assert_matches_oracle(engine.target(), event_log)
    assert engine.target().snapshot().lineage == engine.target().snapshot(v1).lineage


def test_duplicates_within_one_batch(spark, event_log, tmp_path):
    """Duplicates inside a single batch collapse via LWW tie-break."""
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    events = spark.read.parquet(event_log)
    engine.replay(with_replayed_suffix(events, N_EVENTS, 0.2), 0)
    _assert_matches_oracle(engine.target(), event_log)


def test_batch_id_fencing(spark, event_log, tmp_path):
    """Re-delivery of an already-committed batch id is a no-op (K6
    idempotence; foreachBatch crash-retry contract)."""
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    events = spark.read.parquet(event_log)
    engine.replay(events, 7)
    v = engine.target().current_version()
    stats = engine.replay(events, 7)
    assert stats.skipped
    assert engine.target().current_version() == v
    _assert_matches_oracle(engine.target(), event_log)


def test_decoy_tables_and_ignored_servers_are_inert(spark, event_log, tmp_path):
    """P1/P2: decoy-table and ignored-server events exist in the log but
    must not affect the target (``h4com/IntegrationTest.java:154-169``,
    multi-database isolation ``:301-353``)."""
    events = spark.read.parquet(event_log)
    n_decoy = events.where(F.col("table_name") != "repos").count()
    n_ignored = events.where(F.col("server_id") == 99).count()
    assert n_decoy > 0 and n_ignored > 0  # fixture really contains them
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    engine.replay(events)
    _assert_matches_oracle(engine.target(), event_log)


def test_lineage_watermarks_advance(spark, event_log, tmp_path):
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    events = spark.read.parquet(event_log)
    engine.replay(events)
    lin = engine.target().lineage().toPandas()
    assert lin["rows_applied"].sum() > 0
    assert lin["bytes"].sum() > 0
    assert (lin["last_applied_offset"] >= 0).all()


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_policy_interceptor_skip_and_remove(spark, tmp_path, mode):
    """Per-row indexing interceptor (DefaultRowsMutationIndexer.java:129-144,
    IndexingDirective.java:25-55): SKIP leaves the target rows untouched
    (suppressSelfIndexing); REMOVE purges the key despite op='U'.
    Covers both write paths (COW merge and the single-job MOR epoch)."""
    img = "struct<repo string, path string, commit string, lang string, content string>"
    schema = (
        "offset long, tx_id long, server_id long, schema_name string, table_name string, "
        f"op string, before {img}, after {img}, commit_ordinal long, "
        "source_partition int, ts timestamp"
    )

    def row(off, op, repo, path, lang, content):
        im = (repo, path, f"c{off}", lang, content)
        return (off, 0, 1, "rook", "repos",
                op, im if op != "I" else None, im if op != "D" else None, off, 0, None)

    base = spark.createDataFrame(
        [row(1, "I", "r1", "p1", "py", "keep-me"),
         row(2, "I", "r2", "p2", "md", "doc"),
         row(3, "I", "r3", "p3", "py", "remove-later")],
        schema,
    )
    engine = CdcEngine(
        spark, str(tmp_path / "repos"), write_mode=mode,
        n_source_partitions=1 if mode == "mor" else None,
    )
    engine.replay(base, 0)
    assert engine.target().read().count() == 3

    # SKIP: an update to r1/p1 under a skip-md policy AND an insert of a
    # new md row — neither touches the table; non-md rows apply normally
    policy = (
        F.when(F.col("lang") == "md", "SKIP")
        .when(F.col("content") == "purge", "REMOVE")
        .otherwise("KEEP")
    )
    engine.with_policy(policy)
    batch = spark.createDataFrame(
        [row(10, "U", "r2", "p2", "md", "doc-v2"),      # SKIP: target untouched
         row(11, "I", "r9", "p9", "md", "new-doc"),     # SKIP: never inserted
         row(12, "U", "r1", "p1", "py", "keep-me-v2"),  # KEEP: normal update
         row(13, "U", "r3", "p3", "py", "purge")],      # REMOVE despite op='U'
        schema,
    )
    engine.replay(batch, 1)
    state = {(r["repo"], r["path"]): r["content"] for r in engine.target().read().collect()}
    assert state == {
        ("r1", "p1"): "keep-me-v2",   # KEEP applied
        ("r2", "p2"): "doc",          # SKIP left the old row untouched
    }                                  # r3 purged by REMOVE; r9 never appeared
    # skipped rows still advanced the watermark: re-delivering the batch
    # (same events) is a no-op even with the policy removed
    engine.policy = None
    engine.replay(batch, 2)
    state2 = {(r["repo"], r["path"]): r["content"] for r in engine.target().read().collect()}
    assert state2 == state


def test_bootstrap_snapshot_then_tail(spark, tmp_path):
    """The classic CDC onboarding flow (Debezium's snapshot-then-stream;
    rook's initial Hibernate index build then binlog tail): bulk-load the
    current table state via overwrite, then apply the change tail — final
    state equals replaying the WHOLE log from scratch."""
    ev = generate_events(spark, 3000, seed=61)
    log = str(tmp_path / "log")
    write_events(ev, log, n_files=3)
    events = spark.read.parquet(log)

    # path A: full replay from empty (the reference truth)
    full = CdcEngine(spark, str(tmp_path / "full")).ignoring_servers(99)
    full.replay(events, 0)

    # path B: bootstrap = state after the first 2000 offsets (computed by
    # a throwaway replay), bulk-loaded via overwrite with its ordinals,
    # then the tail applied as CDC
    boot_src = CdcEngine(spark, str(tmp_path / "bootsrc")).ignoring_servers(99)
    boot_src.replay(events.where(F.col("offset") < 2000), 0)
    snapshot_state = boot_src.target().read(include_internal=True)

    engine = CdcEngine(spark, str(tmp_path / "boot")).ignoring_servers(99)
    target = engine.target()
    # include_internal carries the stored (__ordinal, __offset) into the
    # bulk load, so the conditional-ordinal MERGE protects live keys even
    # against a tail that overlaps the snapshot boundary
    target.overwrite(snapshot_state, batch_id=0)
    from rook_spark.cdc.apply import apply_batch
    from rook_spark.cdc.normalize import filter_events

    tail = filter_events(
        events.where(F.col("offset") >= 2000), ignored_server_ids=(99,)
    )
    apply_batch(target, tail, batch_id=1)

    got = sorted(tuple(r) for r in engine.target().read().collect())
    want = sorted(tuple(r) for r in full.target().read().collect())
    assert got == want and len(got) > 100


def test_bootstrap_then_overlapping_tail_exactly_once(spark, tmp_path):
    """Snapshot + tail (the Debezium deployment shape): bootstrap the
    table from a consistent snapshot at position X with watermarks in
    the same commit, then tail-replay a feed that OVERLAPS the snapshot
    range. The overlap — including upserts for keys that were deleted
    inside it, the resurrection caveat on LakeTable.merge — must be
    fully deduplicated: final state equals the full-log replay oracle."""
    ev = generate_events(spark, 2500, seed=73)
    raw = str(tmp_path / "raw")
    ev.write.parquet(raw)
    events = spark.read.parquet(raw)

    # source-of-truth state at the snapshot position: an engine replay
    # of the prefix (itself oracle-verified elsewhere)
    src_engine = CdcEngine(spark, str(tmp_path / "src_state")).ignoring_servers(99)
    src_engine.replay(events.where(F.col("offset") < 1500), 0)
    snapshot_df = src_engine.target().read()
    as_of = {
        int(r["partition_id"]): int(r["last_applied_offset"])
        for r in src_engine.target().lineage().collect()
    }
    # non-vacuous: the overlap window re-delivers at least one DELETE
    # (a stale 'U' for such a key is the resurrection hazard)
    assert events.where(
        (F.col("offset") >= 800) & (F.col("offset") < 1500)
        & (F.col("op") == "D")).count() > 0

    engine = CdcEngine(spark, str(tmp_path / "repos"),
                       n_source_partitions=8).ignoring_servers(99)
    stats = engine.bootstrap(snapshot_df, as_of)
    assert stats.version >= 0 and not stats.skipped
    # watermarks committed atomically with the data
    lin = {int(r["partition_id"]): int(r["last_applied_offset"])
           for r in engine.target().lineage().collect()}
    assert lin == as_of

    # the tail resumes BEFORE the snapshot position (offset 800 < 1500)
    engine.replay(events.where(F.col("offset") >= 800))

    got = engine.target().read().orderBy("repo", "path").toPandas()
    want = _oracle_df(raw)
    assert len(got) == len(want)
    assert got["content"].tolist() == want["content"].tolist()


def test_bootstrap_guards(spark, tmp_path):
    """bootstrap is loud: refuses an existing table, refuses an int
    position without a known partition set."""
    ev = generate_events(spark, 300, seed=79)
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    engine.replay(ev, 0)
    snap = engine.target().read()
    with pytest.raises(ValueError, match="first write"):
        engine.bootstrap(snap, {0: 100})
    e2 = CdcEngine(spark, str(tmp_path / "repos2"))
    with pytest.raises(ValueError, match="n_source_partitions"):
        e2.bootstrap(snap, 100)


def test_bootstrap_ordinal_domain_not_conflated_with_offsets(spark, tmp_path):
    """Self-review round 3: offsets (transport positions) and commit
    ordinals (the LWW domain) are different number lines. A snapshot
    bootstrapped at a numerically huge transport offset must NOT freeze
    its keys against tail updates that carry small commit ordinals."""
    from pyspark.sql import functions as F

    snap = spark.createDataFrame(
        [("r1", "p1", "c0", "py", "old")],
        "repo string, path string, commit string, lang string, content string",
    )
    engine = CdcEngine(spark, str(tmp_path / "repos"))
    # Kafka-style: partition offset far ahead of any DB ordinal
    engine.bootstrap(snap, {0: 5_000_000})
    img = F.struct(
        F.lit("r1").alias("repo"), F.lit("p1").alias("path"),
        F.lit("c1").alias("commit"), F.lit("py").alias("lang"),
        F.lit("new").alias("content"),
    )
    tail = spark.range(1).select(
        F.lit(5_000_001).alias("offset"), F.lit(None).cast("long").alias("tx_id"),
        F.lit(1).cast("long").alias("server_id"), F.lit("rook").alias("schema_name"),
        F.lit("repos").alias("table_name"), F.lit("U").alias("op"),
        F.lit(None).cast(
            "struct<repo:string,path:string,commit:string,lang:string,content:string>"
        ).alias("before"),
        img.alias("after"),
        F.lit(80_001).alias("commit_ordinal"),  # small DB ordinal
        F.lit(0).cast("int").alias("source_partition"),
        F.current_timestamp().alias("ts"),
    )
    engine.replay(tail)
    row = engine.target().read().where(F.col("path") == "p1").first()
    assert row["content"] == "new", "tail update lost LWW against the snapshot image"


def test_multi_table_demux_replay_and_stream(spark, tmp_path):
    """One change stream, two tracked tables (rook delivers every
    table's mutations through one listener pipeline): each target must
    equal ITS OWN independent DuckDB replay oracle, batch replay and
    streaming both; crash-style re-delivery stays exactly-once per
    table."""
    from rook_spark.cdc.engine import MultiTableCdcEngine

    ev = generate_events(spark, 3000, seed=101, decoy_frac=0.3)
    raw = str(tmp_path / "raw")
    ev.write.parquet(raw)
    events = spark.read.parquet(raw)
    tables = ("rook.repos", "rook.decoy_table")

    mte = MultiTableCdcEngine(
        spark, str(tmp_path / "lake"), tables, n_buckets=4
    ).ignoring_servers(99)
    mte.replay(events.where(F.col("offset") < 1500), 0)
    stats = mte.replay(events.where(F.col("offset") >= 1500), 1)
    assert set(stats) == set(tables)
    # re-delivery of epoch 1: fenced (or watermark-zeroed) on EVERY table
    stats2 = mte.replay(events.where(F.col("offset") >= 1500), 1)
    assert all(s.skipped or s.rows_in == 0 for s in stats2.values())

    import duckdb
    from rook_spark.cdc.fixtures import oracle_final_state_sql

    for t in tables:
        got = mte.target(t).read().orderBy("repo", "path").toPandas()
        want = duckdb.execute(
            oracle_final_state_sql(f"{raw}/*.parquet", table=t)
        ).fetch_df()
        assert len(got) == len(want) > 0, t
        assert got["content"].tolist() == want["content"].tolist(), t

    # streaming fan-out from one checkpoint
    src = str(tmp_path / "slog")
    write_events(ev, src, n_files=3)
    mte2 = MultiTableCdcEngine(
        spark, str(tmp_path / "lake2"), tables, n_buckets=4
    ).ignoring_servers(99)
    q = mte2.stream(src, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    for t in tables:
        got = mte2.target(t).read().orderBy("repo", "path").toPandas()
        want = duckdb.execute(
            oracle_final_state_sql(f"{raw}/*.parquet", table=t)
        ).fetch_df()
        assert got["content"].tolist() == want["content"].tolist(), t
