"""W1 LWW reduce: plain vs salted equivalence, ordering subtleties
(D-then-I / I-then-D, FIXTURES.md scenario 4), skew behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from rook_spark.cdc.fixtures import generate_events
from rook_spark.cdc.normalize import normalize
from rook_spark.cdc.reduce import lww_reduce, salted_lww_reduce


def _flat(spark, n=3000, seed=42, **kw):
    ev = generate_events(spark, n, seed=seed, **kw)
    return normalize(ev, ignored_server_ids=[99])


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_equals_plain(spark):
    flat = _flat(spark)
    plain = lww_reduce(flat)
    salted = salted_lww_reduce(flat, n_salts=8)
    assert _canon(plain) == _canon(salted)


def test_single_survivor_per_key(spark):
    flat = _flat(spark)
    red = lww_reduce(flat)
    assert red.groupBy("repo", "path").count().where("count > 1").count() == 0
    # survivor is the max ordinal of its key
    joined = flat.groupBy("repo", "path").agg(F.max("commit_ordinal").alias("mx"))
    chk = red.join(joined, ["repo", "path"]).where(F.col("commit_ordinal") != F.col("mx"))
    assert chk.count() == 0


def test_delete_then_insert_order(spark):
    """An 'I' with higher ordinal beats an earlier 'D' and vice versa —
    the survivor's op decides row existence after MERGE (mirrors the
    update-keyed-by-before-image subtlety,
    ``AbstractCacheSynchronizer.java:67-74``)."""
    rows = [
        # key A: D@5 then I@9  -> survivor I (row exists)
        ("a", "p", "c1", "py", "x", "D", 5, 5, 0, 0),
        ("a", "p", "c2", "py", "y", "I", 9, 9, 0, 0),
        # key B: I@5 then D@9  -> survivor D (row gone)
        ("b", "p", "c3", "py", "x", "I", 5, 15, 0, 0),
        ("b", "p", "c4", "py", "y", "D", 9, 19, 0, 0),
    ]
    schema = (
        "repo string, path string, commit string, lang string, content string, "
        "op string, commit_ordinal long, offset long, source_partition int, tx_id long"
    )
    flat = spark.createDataFrame(rows, schema)
    red = {(r["repo"]): r["op"] for r in lww_reduce(flat).collect()}
    assert red == {"a": "I", "b": "D"}


def test_skewed_input_still_reduces(spark):
    """>50% of events on the top repo (fixture scenario 9) — both reduce
    paths produce the identical result set."""
    flat = _flat(spark, n=5000, seed=3)
    hot = (
        flat.groupBy("repo").count().orderBy(F.desc("count")).first()
    )
    assert hot["count"] > 0.4 * flat.count()  # skew really present
    assert _canon(lww_reduce(flat)) == _canon(salted_lww_reduce(flat, n_salts=16))
