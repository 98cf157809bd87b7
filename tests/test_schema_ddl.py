"""Metadata-only column rename/drop (the Iceberg field-id analog).

The invariant under test everywhere: parquet files carry PHYSICAL names
that never change once written (``Snapshot.phys_map``); logical renames
re-point, drops retire, re-adds allocate fresh physical names — so no
operation here ever rewrites a data file, and dropped values can never
resurrect. Reference contrast: rook re-reads upstream schema per
TABLE_MAP event (``MySQLReplicationStream.java:210-253``) but its sink
side has no rename/drop story at all — this is the lake-side DDL a
100 TB table needs (rewriting for a rename is a non-starter).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.lake.table import LakeTable


def _mk(spark, path, bloom=False, n_buckets=4):
    return LakeTable.create(
        spark, path, key_cols=["k"], n_buckets=n_buckets,
        schema=T.StructType.fromDDL("k long, a string, b long"),
        bloom_cols=["a"] if bloom else [],
    )


def _rows(spark, lo, hi, a="a", b_mul=10):
    return spark.createDataFrame(
        [(i, f"{a}{i}", i * b_mul) for i in range(lo, hi)],
        "k long, a string, b long",
    ).withColumn("op", F.lit("U"))


def test_rename_is_metadata_only_and_values_survive(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 20), 0)
    files_before = sorted(f for fs in t.snapshot().buckets.values() for f in fs)
    v_pre = t.current_version()
    t.rename_column("a", "name_a")
    # zero data movement: the exact same files are referenced
    assert sorted(f for fs in t.snapshot().buckets.values() for f in fs) == files_before
    got = {r["k"]: r["name_a"] for r in t.read().collect()}
    assert got == {i: f"a{i}" for i in range(20)}
    # time travel shows each version under ITS OWN names
    old_cols = t.read(version=v_pre).columns
    assert "a" in old_cols and "name_a" not in old_cols


def test_merge_after_rename_mixes_old_and_new_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 20), 0)
    t.rename_column("a", "name_a")
    df2 = spark.createDataFrame(
        [(i, f"n{i}", i) for i in range(15, 25)],
        "k long, name_a string, b long",
    ).withColumn("op", F.lit("U"))
    t.merge(df2, 1)
    got = {r["k"]: r["name_a"] for r in t.read().collect()}
    assert got[3] == "a3" and got[16] == "n16" and got[24] == "n24"
    # new files still carry the ORIGINAL physical name (name-stable bytes)
    assert t.snapshot().phys("name_a") == "a"


def test_key_and_bucket_columns_rename_freely(spark, tmp_path):
    # bucket ids hash VALUES, not names — a key rename must not re-route
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 30), 0)
    buckets_before = {b: sorted(fs) for b, fs in t.snapshot().buckets.items()}
    t.rename_column("k", "id")
    assert t.snapshot().key_cols == ["id"]
    assert {b: sorted(fs) for b, fs in t.snapshot().buckets.items()} == buckets_before
    t.merge(
        spark.createDataFrame([(5, "z5", 0)], "id long, a string, b long")
        .withColumn("op", F.lit("U")), 1)
    got = {r["id"]: r["a"] for r in t.read().collect()}
    assert got[5] == "z5" and len(got) == 30  # updated in place, no dup key


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 20), 0)
    r = t.drop_column("b")
    assert r["retired_physical"] == "b"
    assert "b" not in t.read().columns
    # re-add under the same logical name: fresh physical, old data dark
    t.merge(
        spark.createDataFrame([(1, "x1", 999)], "k long, a string, b long")
        .withColumn("op", F.lit("U")), 1)
    assert t.snapshot().phys("b") != "b"
    got = {x["k"]: x["b"] for x in t.read().collect()}
    assert got[1] == 999
    assert all(v is None for k, v in got.items() if k != 1), got


def test_compact_purges_dropped_physical_column(spark, tmp_path):
    import pyarrow.parquet as pq

    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 20), 0)
    t.drop_column("b")
    t.rename_column("a", "name_a")
    state_pre = {r["k"]: r["name_a"] for r in t.read().collect()}
    t.compact(max_files_per_bucket=0)
    snap = t.snapshot()
    cols = set()
    for fs in snap.buckets.values():
        for rel in fs:
            cols |= set(pq.ParquetFile(os.path.join(t.path, rel)).schema_arrow.names)
    assert "b" not in cols          # dropped physical purged from new files
    assert "a" in cols              # renamed column keeps its physical name
    assert {r["k"]: r["name_a"] for r in t.read().collect()} == state_pre


def test_mor_fold_and_change_feed_across_rename(spark, tmp_path):
    from rook_spark.lake.stream import LakeChangeDataSource

    spark.dataSource.register(LakeChangeDataSource)
    p = str(tmp_path / "t")
    t = LakeTable.create(
        spark, p, key_cols=["k"], n_buckets=4,
        schema=T.StructType.fromDDL(
            "k long, v string, __ordinal long, __offset long"))
    mk = lambda lo, hi, tag, o: spark.createDataFrame(  # noqa: E731
        [(i, f"{tag}{i}", o, i) for i in range(lo, hi)],
        "k long, v string, __ordinal long, __offset long",
    ).withColumnRenamed("v", "val" if o > 1 else "v").withColumn("op", F.lit("U"))
    t.merge_mor(mk(0, 30, "v", 1), 0)
    t.rename_column("v", "val")
    t.merge_mor(mk(25, 35, "w", 2), 1)   # deltas under the NEW name
    got = {r["k"]: r["val"] for r in t.read().collect()}
    assert got[5] == "v5" and got[27] == "w27" and got[34] == "w34"
    feed = (spark.read.format("rook_lake_changes").option("path", p)
            .option("start_version", "earliest").load())
    assert "val" in feed.columns and "v" not in feed.columns
    lww = (feed.groupBy("k")
           .agg(F.max_by(F.struct("op", "val"),
                         F.struct("ordinal", "offset")).alias("w"))
           .where(F.col("w.op") != "D").select("k", "w.val"))
    assert {r["k"]: r["val"] for r in lww.collect()} == got


def test_batch_source_pushdown_and_delete_hints_after_rename(spark, tmp_path):
    from rook_spark.lake.source import LakeTableDataSource

    spark.dataSource.register(LakeTableDataSource)
    p = str(tmp_path / "t")
    t = _mk(spark, p, bloom=True, n_buckets=16)
    t.merge(_rows(spark, 0, 40), 0)          # b = k*10 <= 390
    t.rename_column("a", "val")
    t.rename_column("b", "num")
    # epoch 2 touches FEW buckets with high num values — the untouched
    # buckets' files carry only low ranges and must prune under the
    # renamed hint name
    t.merge(
        spark.createDataFrame([(k, f"h{k}", 1000 + k) for k in (100, 101, 102)],
                              "k long, val string, num long")
        .withColumn("op", F.lit("U")), 1)
    r = (spark.read.format("rook_lake").load(p)
         .where(F.col("val") == "a7").collect())
    assert len(r) == 1 and r[0]["num"] == 70
    res = t.delete_where(F.col("num") >= 1000, ranges={"num": (1000, None)})
    assert res["deleted_rows"] == 3
    assert res["files_carried"] > 0  # the stats hint pruned under the new name
    assert t.read().count() == 40


def test_changes_across_rename_and_drop_readd_boundary(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 20), 0)
    v0 = t.current_version()
    t.rename_column("a", "name_a")
    t.drop_column("b")
    t.merge(
        spark.createDataFrame([(1, "upd", 111), (50, "new", 500)],
                              "k long, name_a string, b long")
        .withColumn("op", F.lit("U")), 1)
    ch = {r["k"]: (r["name_a"], r["b"], r["op"]) for r in t.changes(v0).collect()}
    # ONLY genuinely touched keys appear: the rename aligns the column
    # with itself, and the re-added b never diffs against dropped values
    assert set(ch) == {1, 50}, ch
    assert ch[1] == ("upd", 111, "U") and ch[50] == ("new", 500, "U")


def test_rollback_across_rename_reverts_names(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 10), 0)
    v_pre = t.current_version()
    t.rename_column("a", "name_a")
    t.drop_column("b")
    t.rollback(v_pre)
    cols = t.read().columns
    assert "a" in cols and "b" in cols and "name_a" not in cols
    # blacklist stays monotone: re-adding the dropped-name column after
    # the revert is still safe (it existed in the interim chain's files)
    assert "b" in t.snapshot().retired_phys or t.snapshot().phys("b") == "b"
    got = {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}
    assert got == {i: (f"a{i}", i * 10) for i in range(10)}


def test_refusal_matrix(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 5), 0)
    with pytest.raises(ValueError, match="key/bucket"):
        t.drop_column("k")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("a", "b")
    with pytest.raises(ValueError, match="internal"):
        t.rename_column("a", "__x")
    with pytest.raises(ValueError, match="internal"):
        t.drop_column("__ordinal")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("a", "a")  # self-rename = collision, same refusal


def test_engine_table_rename_between_epochs(spark, tmp_path):
    """The coordinated-producer story: rename the table AND the event
    payload between epochs — epoch 2's `body` merges into the renamed
    column (same physical), while its re-added `note` maps to a fresh
    physical so epoch 1's dropped note values stay dark."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 1500, seed=21)
    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)

    def with_note(df, tag):
        e = F.concat(F.lit(tag), F.col("after.commit"))
        eb = F.concat(F.lit(tag), F.col("before.commit"))
        return (df.withColumn("after", F.col("after").withField("note", e))
                  .withColumn("before", F.col("before").withField("note", eb)))

    def renamed(df):
        for side in ("after", "before"):
            df = df.withColumn(
                side,
                F.col(side).withField("body", F.col(f"{side}.content"))
                 .dropFields("content"))
        return df

    eng.replay(with_note(ev.where(F.col("offset") < 700), "E1|"), 0)
    t = eng.target()
    t.rename_column("content", "body")
    t.drop_column("note")
    eng.replay(renamed(with_note(ev.where(F.col("offset") >= 700), "E2|")), 1)

    got = {(r["repo"], r["path"]): (r["body"], r["note"])
           for r in t.read().collect()}
    # oracle: independent LWW replay over the raw log
    from rook_spark.cdc.normalize import normalize
    flat = normalize(ev, ignored_server_ids=(99,))
    w = (flat.groupBy("repo", "path")
         .agg(F.max_by(F.struct("op", "content", "commit", "offset"),
                       F.struct("commit_ordinal", "offset")).alias("w"))
         .where(F.col("w.op") != "D"))
    want = {}
    for r in w.collect():
        note = "E2|" + r["w"]["commit"] if r["w"]["offset"] >= 700 else None
        want[(r["repo"], r["path"])] = (r["w"]["content"], note)
    assert got == want


def test_timestamp_time_travel(spark, tmp_path):
    """read(as_of=...) — Iceberg TIMESTAMP AS OF: resolves the newest
    retained version committed at or before the instant; older-than-
    retention timestamps raise (wall-clock travel erodes with vacuum,
    same as version travel)."""
    import time

    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_rows(spark, 0, 5), 0)
    ts1 = t.snapshot().committed_at
    time.sleep(0.05)
    t.merge(_rows(spark, 5, 10, a="b"), 1)
    ts2 = t.snapshot().committed_at
    assert t.read(as_of=ts1).count() == 5
    assert t.read(as_of=ts2).count() == 10
    assert t.read(as_of=(ts1 + ts2) / 2).count() == 5  # between commits
    assert t.version_at(ts2) == t.current_version()
    import datetime
    iso = datetime.datetime.fromtimestamp(ts2 + 1).isoformat()
    assert t.read(as_of=iso).count() == 10
    with pytest.raises(ValueError, match="no retained version"):
        t.read(as_of=ts1 - 10_000)
    with pytest.raises(ValueError, match="exactly one"):
        t.read(as_of=ts1, version=1)
