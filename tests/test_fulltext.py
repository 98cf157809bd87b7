"""CDC-maintained incremental inverted text index (cdc/fulltext.py):
the invariant is that maintaining posting lists incrementally from the
change feed is indistinguishable from tokenizing the final table —
under multi-epoch replay, token-set-shrinking updates, deletes, and
duplicate re-delivery. Plus the bucket_cols locality/lookup split the
index rides on (bucket by doc, bloom by token)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events
from rook_spark.cdc.fulltext import InvertedIndex, tokens_expr
from rook_spark.lake.table import LakeTable

N_EVENTS = 2400


def _postings_state(idx):
    return {
        tuple(r[c] for c in idx.key_cols) + (r["token"],)
        for r in idx.postings().collect()
    }


def _recompute_state(idx, docs):
    rows = docs.select(
        *idx.key_cols, F.explode(tokens_expr(idx.text_col)).alias("token")
    ).collect()
    return {tuple(r[c] for c in idx.key_cols) + (r["token"],) for r in rows}


def test_incremental_postings_equal_full_tokenization(spark, tmp_path):
    """Three epochs + a duplicated suffix through the real engine with
    the index sink: postings must equal tokenizing the final main-table
    state, doc for doc, token for token."""
    ev = generate_events(spark, N_EVENTS, seed=61)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=8)
    engine.with_sink("fulltext_index", idx.sink(), when="before")

    bounds = [(0, 800), (800, 1700), (1700, N_EVENTS)]
    for i, (lo, hi) in enumerate(bounds):
        engine.replay(ev.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    # at-least-once source: re-delivery hands the sink an empty fresh
    # set; the index must not change
    before = _postings_state(idx)
    engine.replay(ev.where(F.col("offset") >= int(N_EVENTS * 0.7)), 3)
    assert _postings_state(idx) == before

    want = _recompute_state(idx, engine.target().read())
    got = _postings_state(idx)
    assert got == want
    assert len(got) > 200


def _flat(spark, rows):
    """Hand-shaped normalized batch: (repo, path, op, commit_ordinal,
    offset, content)."""
    return spark.createDataFrame(
        rows,
        "repo string, path string, op string, commit_ordinal long, "
        "offset long, content string",
    )


def test_stale_tokens_tombstoned_and_lookup(spark, tmp_path):
    """An update that drops tokens must remove their postings (rook's
    purge half of index-or-purge); deletes purge the whole posting set;
    lookup/search_all serve the doc sets."""
    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=4)
    sink = idx.sink()
    sink(_flat(spark, [
        ("r", "a", "I", 0, 0, "Hello world foo"),
        ("r", "b", "I", 0, 1, "hello bar"),
    ]), 0)
    assert _postings_state(idx) == {
        ("r", "a", "hello"), ("r", "a", "world"), ("r", "a", "foo"),
        ("r", "b", "hello"), ("r", "b", "bar"),
    }
    # update drops 'world'/'foo', adds 'baz'
    sink(_flat(spark, [("r", "a", "U", 1, 2, "hello baz")]), 1)
    assert _postings_state(idx) == {
        ("r", "a", "hello"), ("r", "a", "baz"),
        ("r", "b", "hello"), ("r", "b", "bar"),
    }
    assert {tuple(r) for r in idx.lookup("hello").collect()} == {("r", "a"), ("r", "b")}
    assert {tuple(r) for r in idx.lookup("foo").collect()} == set()
    assert {tuple(r) for r in idx.search_all(["hello", "baz"]).collect()} == {("r", "a")}
    # delete purges every posting of the doc
    sink(_flat(spark, [("r", "a", "D", 2, 3, None)]), 2)
    assert _postings_state(idx) == {("r", "b", "hello"), ("r", "b", "bar")}
    # duplicate re-delivery of batch 2: fenced, nothing changes
    sink(_flat(spark, [("r", "a", "D", 2, 3, None)]), 2)
    assert _postings_state(idx) == {("r", "b", "hello"), ("r", "b", "bar")}


def test_rebuild_equals_incremental(spark, tmp_path):
    """rebuild() from the main table must produce the same posting set
    the incremental path maintained."""
    ev = generate_events(spark, 1200, seed=62)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=4).ignoring_servers(99)
    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=4)
    engine.with_sink("fulltext_index", idx.sink(), when="before")
    engine.replay(ev, 0)
    incremental = _postings_state(idx)

    idx2 = InvertedIndex(spark, str(tmp_path / "fts2"), n_buckets=4)
    n = idx2.rebuild(engine.target())
    assert n == len(incremental)
    assert _postings_state(idx2) == incremental
    # positions parity too — phrase adjacency must not depend on which
    # path built the index
    def _pos(ix):
        return {(r["repo"], r["path"], r["token"]): r["positions"]
                for r in ix.postings().collect()}
    assert _pos(idx) == _pos(idx2)


def _nfiles(df) -> int:
    return df.select(F.input_file_name()).distinct().count()


def test_lookup_bloom_prunes_files(spark, tmp_path):
    """The token bloom axis: a lookup must scan fewer files than the
    doc-bucketed table holds (tokens are spread across doc buckets, so
    without blooms every file is a candidate)."""
    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=8)
    sink = idx.sink()
    # 64 docs, each with a UNIQUE token + a shared one, over several
    # epochs so buckets carry several files
    for e in range(4):
        sink(_flat(spark, [
            ("r", f"d{e}_{i}", "I", e, e * 100 + i, f"common uniq{e}x{i}")
            for i in range(16)
        ]), e)
    t = idx.table()
    total = sum(len(fs) for fs in t.snapshot().buckets.values())
    hit = idx.lookup("uniq2x5")
    assert {tuple(r) for r in hit.collect()} == {("r", "d2_5")}
    assert _nfiles(t.read(points={"token": "uniq2x5"})) < total
    # the shared token is everywhere: blooms keep every file (superset
    # contract, no false drops)
    assert idx.lookup("common").count() == 64


# ------------------------------------------------------------ bucket_cols


def test_bucket_cols_colocate_by_prefix(spark, tmp_path):
    """bucket_cols=(doc key) on a (doc, token)-keyed table: all of one
    doc's rows land in ONE bucket (the locality the index maintenance
    depends on), and MERGE semantics are unchanged."""
    schema = T.StructType([
        T.StructField("doc", T.StringType()),
        T.StructField("token", T.StringType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ["doc", "token"],
        n_buckets=8, bucket_cols=["doc"],
    )
    rows = [(f"d{i}", f"t{j}", "I") for i in range(6) for j in range(10)]
    t.merge(spark.createDataFrame(rows, "doc string, token string, op string"), 0)
    # every doc's rows in exactly one bucket
    per_doc = (
        t.read(include_internal=False)
        .select("doc", F.input_file_name().alias("f"))
        .groupBy("doc").agg(F.count_distinct("f").alias("nf"))
        .collect()
    )
    assert all(r["nf"] == 1 for r in per_doc)
    # delete one (doc, token) pair; the doc's other rows survive
    t.merge(spark.createDataFrame(
        [("d1", "t3", None, "D")], "doc string, token string, x string, op string"
    ).drop("x"), 1)
    got = {(r["doc"], r["token"]) for r in t.read().collect()}
    assert ("d1", "t3") not in got and ("d1", "t4") in got
    assert len(got) == 59
    # rebucket preserves the routing subset
    t.rebucket(4)
    assert t.snapshot().bucket_cols == ["doc"]
    assert t.read().count() == 59


def test_bucket_cols_validation(spark, tmp_path):
    schema = T.StructType([
        T.StructField("a", T.StringType()), T.StructField("b", T.StringType()),
    ])
    with pytest.raises(ValueError, match="subset"):
        LakeTable.create(spark, str(tmp_path / "t1"), schema, ["a"],
                         bucket_cols=["b"])
    with pytest.raises(ValueError, match="subset"):
        LakeTable.create(spark, str(tmp_path / "t2"), schema, ["a"],
                         bucket_cols=[])


def test_streaming_tail_maintains_postings(spark, tmp_path):
    """The index sink under a REAL Structured Streaming tail (S1 →
    foreachBatch): micro-batched delivery must land the same postings
    as tokenizing the final table — the production deployment shape."""
    from rook_spark.cdc.fixtures import write_events

    src = str(tmp_path / "log")
    write_events(generate_events(spark, 1200, seed=63), src, n_files=4)
    engine = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8).ignoring_servers(99)
    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=8)
    engine.with_sink("fulltext_index", idx.sink(), when="before")
    q = engine.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    assert len(engine.stats) >= 3  # genuinely micro-batched
    assert _postings_state(idx) == _recompute_state(idx, engine.target().read())


def test_fresh_checkpoint_restart_does_not_fence_new_postings(spark, tmp_path):
    """The fence is scoped to the checkpoint run_id (same contract as
    DedupIndex): a restart from a FRESH checkpoint restarts batch ids
    at 0 — the new run's batches must fall through to the conditional-
    ordinal MERGE, while re-delivery within ONE run stays fenced."""
    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=4)
    sink = idx.sink()
    for bid in range(3):
        sink(_flat(spark, [
            ("r", f"a{bid}", "I", bid + 1, bid, f"alpha beta{bid}")
        ]), bid, "ckptA")
    before = _postings_state(idx)
    # same run, duplicate batch: fenced
    sink(_flat(spark, [("r", "zz", "I", 9, 9, "zeta")]), 2, "ckptA")
    assert _postings_state(idx) == before
    # fresh checkpoint, batch ids restart at 0: must apply
    sink(_flat(spark, [("r", "b0", "I", 10, 10, "delta")]), 0, "ckptB")
    assert ("r", "b0", "delta") in _postings_state(idx)


def test_positions_and_phrase_search(spark, tmp_path):
    """Positional postings: word positions index the raw split array
    (adjacent words differ by exactly 1), and phrase_search matches
    CONSECUTIVE occurrences only — order matters, updates move
    positions, malformed phrase words refuse loudly."""
    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=4)
    sink = idx.sink()
    sink(_flat(spark, [
        ("r", "a", "I", 0, 0, "Hello, world hello"),
        ("r", "b", "I", 0, 1, "world hello"),
    ]), 0)
    pos = {(r["repo"], r["path"], r["token"]): list(r["positions"])
           for r in idx.postings().collect()}
    assert pos[("r", "a", "hello")] == [0, 2]
    assert pos[("r", "a", "world")] == [1]
    assert pos[("r", "b", "world")] == [0]

    assert {tuple(r) for r in idx.phrase_search(["hello", "world"]).collect()} \
        == {("r", "a")}
    assert {tuple(r) for r in idx.phrase_search(["world", "hello"]).collect()} \
        == {("r", "a"), ("r", "b")}
    assert {tuple(r) for r in
            idx.phrase_search(["hello", "world", "hello"]).collect()} == {("r", "a")}
    # single word degrades to lookup; case folds
    assert {tuple(r) for r in idx.phrase_search(["HELLO"]).collect()} \
        == {("r", "a"), ("r", "b")}
    # an update moves positions: the old phrase stops matching
    sink(_flat(spark, [("r", "a", "U", 1, 2, "world of hello")]), 1)
    assert idx.phrase_search(["hello", "world"]).count() == 0
    assert {tuple(r) for r in idx.phrase_search(["world", "of", "hello"]).collect()} \
        == {("r", "a")}
    with pytest.raises(ValueError, match="single token"):
        idx.phrase_search(["two words"])
    with pytest.raises(ValueError, match="at least one"):
        idx.phrase_search([])


def test_rank_search_tfidf_ordering(spark, tmp_path):
    """tf-idf ranking: higher term frequency of a rarer word wins; the
    OR semantics admit partial matches; scores match a hand model."""
    import math

    idx = InvertedIndex(spark, str(tmp_path / "fts"), n_buckets=4)
    sink = idx.sink()
    sink(_flat(spark, [
        ("r", "a", "I", 0, 0, "rare rare common"),
        ("r", "b", "I", 0, 1, "rare common common"),
        ("r", "c", "I", 0, 2, "common common common"),
        ("r", "d", "I", 0, 3, "nothing else here"),
    ]), 0)
    got = [(r["path"], r["score"])
           for r in idx.rank_search(["rare", "common"], k=3, n_docs=4).collect()]
    idf_rare = math.log(5 / 3)    # df(rare)=2
    idf_common = math.log(5 / 4)  # df(common)=3
    want = sorted(
        [("a", 2 * idf_rare + 1 * idf_common),
         ("b", 1 * idf_rare + 2 * idf_common),
         ("c", 3 * idf_common)],
        key=lambda x: -x[1],
    )
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gs), (wp, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, (gp, gs, ws)
    # k bounds the result; OR semantics exclude non-matching docs
    assert idx.rank_search(["rare"], k=1, n_docs=4).first()["path"] == "a"
    assert {r["path"] for r in
            idx.rank_search(["rare", "common"], k=10, n_docs=4).collect()} \
        == {"a", "b", "c"}
    with pytest.raises(ValueError, match="at least one"):
        idx.rank_search([])
