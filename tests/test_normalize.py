"""Normalization operators P1-P6/F1/S2 (SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rook_spark.cdc.fixtures import generate_events
from rook_spark.cdc.normalize import (
    filter_ignored_servers,
    filter_tracked_tables,
    normalize,
    qualified_name,
    split_key_changing_updates,
)


def test_qualified_name_normalization(spark):
    """F1 (``SecondLevelCacheSynchronizer.java:44``)."""
    df = spark.createDataFrame(
        [("RoOk", "RePoS")], "schema_name string, table_name string"
    )
    assert df.select(qualified_name().alias("q")).first()["q"] == "rook.repos"


def test_server_and_table_filters(spark):
    ev = generate_events(spark, 2000, seed=5)
    no_srv = filter_ignored_servers(ev, [99])
    assert no_srv.where(F.col("server_id") == 99).count() == 0
    tracked = filter_tracked_tables(ev, ["rook.repos"])
    assert tracked.where(F.col("table_name") != "repos").count() == 0
    # filters drop something real
    assert no_srv.count() < ev.count()
    assert tracked.count() < ev.count()


def test_normalize_keys_delete_by_before_image(spark):
    """P4: deletes are keyed by the BEFORE image
    (``AbstractCacheSynchronizer.java:63-79``)."""
    ev = generate_events(spark, 1000, seed=5)
    flat = normalize(ev, ignored_server_ids=[99])
    assert flat.where(F.col("repo").isNull() | F.col("path").isNull()).count() == 0
    assert set(r["op"] for r in flat.select("op").distinct().collect()) <= {"I", "U", "D"}


def test_split_key_changing_updates(spark):
    """A 'U' whose key moved becomes D(old key) + I(new key) — rook's
    before-image-keyed eviction semantics under MERGE."""
    img = "struct<repo string, path string, content string>"
    rows = [
        # key-stable update
        (1, 1, 1, "rook", "repos", "U", ("r", "p", "old"), ("r", "p", "new"), 1, 0, None),
        # key-changing update: (r,p2) -> (r,p3)
        (2, 1, 1, "rook", "repos", "U", ("r", "p2", "old"), ("r", "p3", "new"), 2, 0, None),
    ]
    schema = (
        "offset long, tx_id long, server_id long, schema_name string, "
        f"table_name string, op string, before {img}, after {img}, "
        "commit_ordinal long, source_partition int, ts timestamp"
    )
    ev = spark.createDataFrame(rows, schema)
    out = split_key_changing_updates(ev, ["repo", "path"])
    ops = sorted(
        (r["op"], (r["before"] or r["after"])["path"]) for r in out.collect()
    )
    # stable U passes through; changing U becomes D@p2 + I@p3
    assert ops == [("D", "p2"), ("I", "p3"), ("U", "p")]

    flat = normalize(ev, key_cols=["repo", "path"])
    keyed = {(r["repo"], r["path"]): r["op"] for r in flat.collect()}
    assert keyed[("r", "p2")] == "D" and keyed[("r", "p3")] == "I"
