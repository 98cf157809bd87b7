"""Deterministic sampling / dataset-mixing operators
(rook_spark.functions.sampling): cross-system hash parity, key
stability, exact-integer mixture thresholds, DuckDB oracle parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rook_spark.functions.sampling import (
    hash_split,
    mixture_plan,
    stratified_sample,
    uniform_hash,
    weighted_mixture,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_uniform_hash_duckdb_parity(spark):
    """The cross-system primitive: Spark's conv(substr(md5)) equals
    DuckDB's CAST('0x'||substr(md5)) for the same key/seed — the pin
    every oracle in this module rests on."""
    df = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    got = {
        r["k"]: (r["u48"], r["u24"])
        for r in df.select(
            "k",
            uniform_hash(["k"], seed=7).alias("u48"),
            uniform_hash(["k"], seed=7, bits=24).alias("u24"),
        ).collect()
    }
    want = dict(
        (k, (u48, u24))
        for k, u48, u24 in duckdb.connect().execute(
            """
            SELECT k,
                   CAST(('0x' || substr(md5('7|' || CAST(k AS VARCHAR)), 1, 12)) AS BIGINT),
                   CAST(('0x' || substr(md5('7|' || CAST(k AS VARCHAR)), 1, 6)) AS BIGINT)
            FROM range(50) t(k)
            """
        ).fetchall()
    )
    assert got == want


def test_hash_split_partitions_and_key_stability(spark, docs):
    """Every row lands in exactly one split; assignment depends only on
    the key — splitting any SUBSET assigns each key identically (the
    property that keeps a held-out set held out across corpus
    refreshes)."""
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = {r["doc_id"]: r["split"]
            for r in hash_split(docs, w, on=["doc_id"], seed=1).collect()}
    assert len(full) == docs.count()
    assert set(full.values()) == {"train", "val", "test"}
    n = len(full)
    n_train = sum(1 for v in full.values() if v == "train")
    assert 0.7 < n_train / n < 0.9  # 500 docs: loose but real bound

    sub = {r["doc_id"]: r["split"]
           for r in hash_split(docs.where("doc_id % 3 = 0"), w,
                               on=["doc_id"], seed=1).collect()}
    assert all(full[k] == v for k, v in sub.items())
    # a different seed reshuffles
    reseeded = {r["doc_id"]: r["split"]
                for r in hash_split(docs, w, on=["doc_id"], seed=2).collect()}
    assert reseeded != full


def test_stratified_sample_allowlist_and_determinism(spark, docs):
    """Dict fractions act as an allowlist over the strata column; the
    kept set is a deterministic, repeatable subset."""
    out = stratified_sample(
        docs, {"en": 0.5, "fr": 1.0}, strata_col="lang", on=["doc_id"], seed=3
    )
    rows = out.select("doc_id", "lang").collect()
    langs = {r["lang"] for r in rows}
    assert langs <= {"en", "fr"}
    n_fr = docs.where("lang = 'fr'").count()
    assert sum(1 for r in rows if r["lang"] == "fr") == n_fr  # frac 1.0 keeps all
    n_en = sum(1 for r in rows if r["lang"] == "en")
    assert 0 < n_en < docs.where("lang = 'en'").count()
    again = {r["doc_id"] for r in stratified_sample(
        docs, {"en": 0.5, "fr": 1.0}, strata_col="lang", on=["doc_id"], seed=3
    ).select("doc_id").collect()}
    assert again == {r["doc_id"] for r in rows}


def test_mixture_plan_exact_integer_invariants():
    """T=1 plan: pure integer math, no source oversampled, expected
    composition proportional to the weights up to the scale floor."""
    counts = {"en": 1930, "fr": 820, "es": 800, "zh": 740, "de": 710}
    weights = {"en": 4, "fr": 2, "es": 2, "zh": 1, "de": 1}
    plan = mixture_plan(counts, weights)
    grid = 1 << 24
    W = sum(weights.values())
    scale = min(counts[s] * W // weights[s] for s in weights)
    for s, row in plan.items():
        assert 0 <= row["threshold"] <= grid
        assert row["expect_rows"] == weights[s] * scale // W
        assert row["expect_rows"] <= counts[s]  # never oversample
    # composition: expected fraction ~ w_i / W
    tot = sum(r["expect_rows"] for r in plan.values())
    for s in weights:
        assert abs(plan[s]["expect_rows"] / tot - weights[s] / W) < 0.01

    with pytest.raises(ValueError, match="integer weights"):
        mixture_plan(counts, {**weights, "en": 4.5})
    with pytest.raises(ValueError, match="same sources"):
        mixture_plan(counts, {"en": 1})


def test_mixture_plan_temperature_flattens():
    """T > 1 moves the target composition toward uniform — the
    multilingual flattening knob (weights^(1/T) renormalized)."""
    counts = {"big": 10_000_000, "small": 10_000_000}
    weights = {"big": 9, "small": 1}
    t1 = mixture_plan(counts, weights, temperature=1.0)
    t4 = mixture_plan(counts, weights, temperature=4.0)
    share_t1 = t1["small"]["expect_rows"] / (t1["small"]["expect_rows"] + t1["big"]["expect_rows"])
    share_t4 = t4["small"]["expect_rows"] / (t4["small"]["expect_rows"] + t4["big"]["expect_rows"])
    assert share_t1 == pytest.approx(0.1, abs=1e-6)
    assert 0.1 < share_t4 < 0.5  # flattened toward uniform, not past it


def test_weighted_mixture_vs_duckdb_oracle(spark, docs):
    """End-to-end: the kept row set (not just counts) matches an
    independent DuckDB replay of the integer-threshold derivation."""
    weights = {"en": 4, "fr": 2, "es": 2, "zh": 1, "de": 1}
    out = weighted_mixture(docs, "lang", weights, on=["doc_id"], seed=5)
    got = sorted((r["lang"], r["doc_id"]) for r in out.select("lang", "doc_id").collect())
    oracle = duckdb.connect().execute(
        f"""
        WITH d AS (SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')),
        src AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
        wt AS (SELECT * FROM (VALUES ('en', 4), ('fr', 2), ('es', 2),
                                     ('zh', 1), ('de', 1)) w(lang, w)),
        j AS (SELECT s.lang, s.n, w.w FROM src s JOIN wt w USING (lang)),
        tot AS (SELECT sum(w) AS tw FROM j),
        sc AS (SELECT min((n * tw) // w) AS scale FROM j, tot),
        thr AS (SELECT j.lang,
                       least(16777216, (w * scale * 16777216) // (tw * n)) AS t
                FROM j, tot, sc)
        SELECT d.lang, d.doc_id
        FROM d JOIN thr ON d.lang = thr.lang
        WHERE CAST(('0x' || substr(md5('5|' || CAST(d.doc_id AS VARCHAR)), 1, 6))
                   AS BIGINT) < thr.t
        """
    ).fetchall()
    assert got == sorted(oracle)
    assert len(got) > 0


def test_weighted_mixture_plan_is_scan_shaped(spark, docs):
    """The mixture filter is a CASE over broadcast-sized thresholds —
    the plan must contain no join, no exchange on the corpus side."""
    out = weighted_mixture(docs, "lang", {"en": 1, "fr": 1}, on=["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_pack_sequences_greedy_rule(spark):
    """First-fit-in-order semantics: fits join the current sequence,
    overflows open the next, oversize rows get their own sequence."""
    from rook_spark.functions.sampling import pack_sequences

    rows = [(0, i, w) for i, w in enumerate([30, 30, 30, 50, 120, 10, 95, 10])]
    df = spark.createDataFrame(rows, "shard int, doc_id int, tokens int")
    out = pack_sequences(df, "tokens", 100, order_cols=["doc_id"], shard_col="shard")
    got = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    # 30+30+30=90 fits; +50 overflows -> seq1 (50); +120 oversize -> seq2
    # alone; 10 -> seq3... wait: after 50, fill=50, +120 > 100 -> seq2;
    # 120 occupies seq2 past capacity so 10 -> seq3; 95 -> 95+10>100? fill
    # 10+95=105 > 100 -> seq4; final 10: 95+10 > 100 -> seq5? no: fits
    # (95+10=105>100) -> seq5.
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5}
    # every non-oversize sequence's fill <= capacity
    fills = (
        out.groupBy("seq_id").agg(F.sum("tokens").alias("fill"),
                                  F.count(F.lit(1)).alias("n")).collect()
    )
    for r in fills:
        assert r["fill"] <= 100 or r["n"] == 1


def test_pack_sequences_vs_duckdb_recursive_oracle(spark, docs):
    """Per-row sequence assignment over the real documents table (8
    hash shards, n_chars as weight) matches an independent recursive-CTE
    replay of the same greedy rule."""
    from rook_spark.functions.sampling import pack_sequences

    cap = 4000
    d = docs.select("doc_id", (F.col("doc_id") % 8).alias("shard"), "n_chars")
    out = pack_sequences(d, "n_chars", cap, order_cols=["doc_id"], shard_col="shard")
    got = sorted((r["shard"], r["doc_id"], r["seq_id"]) for r in out.collect())
    oracle = duckdb.connect().execute(
        f"""
        WITH RECURSIVE ordered AS (
          SELECT doc_id % 8 AS shard, doc_id, n_chars,
                 row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
          FROM read_parquet('{SF_DIR}/documents.parquet')
        ),
        packed AS (
          SELECT shard, doc_id, n_chars, rn,
                 CAST(0 AS BIGINT) AS seq_id, n_chars AS fill
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.shard, o.doc_id, o.n_chars, o.rn,
                 CASE WHEN p.fill + o.n_chars <= {cap} THEN p.seq_id
                      ELSE p.seq_id + 1 END,
                 CASE WHEN p.fill + o.n_chars <= {cap} THEN p.fill + o.n_chars
                      ELSE o.n_chars END
          FROM ordered o JOIN packed p ON o.shard = p.shard AND o.rn = p.rn + 1
        )
        SELECT shard, doc_id, seq_id FROM packed
        """
    ).fetchall()
    assert got == sorted(oracle)
    assert max(r[2] for r in got) > 0  # actually packed into many sequences


def test_group_cap_matches_naive_window_under_skew(spark):
    """The salted two-phase top-cap must be exactly order-equivalent to
    the naive single window — verified on a skewed input where one group
    holds 90% of the rows (the mega-domain case the salting exists for),
    including a group smaller than the cap and priority ties resolved by
    id."""
    from pyspark.sql.window import Window

    from rook_spark.functions.sampling import group_cap

    rows = [(i, "mega", i % 7) for i in range(900)]          # hot domain, many ties
    rows += [(1000 + i, f"s{i % 5}", i) for i in range(95)]  # 5 normal domains
    rows += [(2000, "tiny", 3), (2001, "tiny", 9)]           # group smaller than cap
    df = spark.createDataFrame(rows, "doc_id bigint, source string, prio bigint")

    got = sorted(
        (r["source"], r["cap_rank"], r["doc_id"])
        for r in group_cap(
            df, group_col="source", cap=5,
            order_by=[F.col("prio").desc()], id_col="doc_id", n_salts=8,
        ).collect()
    )
    w = Window.partitionBy("source").orderBy(F.desc("prio"), F.asc("doc_id"))
    want = sorted(
        (r["source"], r["cap_rank"], r["doc_id"])
        for r in df.withColumn("cap_rank", F.row_number().over(w))
        .where(F.col("cap_rank") <= 5)
        .collect()
    )
    assert got == want
    assert ("tiny", 2, 2000) in got  # undersized group kept whole, ranked


def test_group_cap_rejects_bad_params(spark):
    import pytest as _pytest

    from rook_spark.functions.sampling import group_cap

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, source string")
    with _pytest.raises(ValueError):
        group_cap(df, cap=0)
    with _pytest.raises(ValueError):
        group_cap(df, n_salts=0)
