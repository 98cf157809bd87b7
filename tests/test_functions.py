"""Training-data pipeline operators: text / dedup / ANN / multimodal."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rook_spark.functions import ann, dedup, multimodal, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------------- text

def test_sha256_udf_matches_builtin_and_python(spark, docs):
    """The mandated pandas-UDF sha256 is bit-identical to F.sha2 and to
    hashlib (the invariant kernel, BASELINE.json input_hint)."""
    out = docs.select(
        "doc_id",
        "text",
        text.sha256_udf("text").alias("udf_sha"),
        text.sha256_builtin("text").alias("jvm_sha"),
    ).collect()
    assert len(out) > 0
    for r in out[:50]:
        want = hashlib.sha256(r["text"].encode()).hexdigest()
        assert r["udf_sha"] == want and r["jvm_sha"] == want
    assert all(r["udf_sha"] == r["jvm_sha"] for r in out)


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("",), ("  ",), ("one",), ("two words",), (" padded  tokens  here ",)],
        "text string",
    )
    got = [r["n_tokens"] for r in df.select(text.token_count()).collect()]
    assert got == [0, 0, 1, 2, 3]


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist hier"),
            (3, "le chat et la maison les arbres"),
            (4, "el perro y los gatos que corren"),
            (5, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in df.select("doc_id", text.lang_id()).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}
    q = df.select(text.quality_score().alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in q)


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], "text string"
    )
    fps = [r["fingerprint"] for r in df.select(text.fingerprint()).collect()]
    assert fps[0] == fps[1] != fps[2]


# ------------------------------------------------------------------ dedup

def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "A  b C"), (3, "unique text")], "doc_id long, text string"
    )
    groups = {r["keep_id"]: r["group_size"] for r in dedup.exact_dedup(df).collect()}
    assert groups == {1: 2, 3: 1}


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5"),
            (2, "w1 w2 w3 w4 w6"),  # shares 2 of its 3 shingles' neighbors
            (3, "x1 x2 x3 x4 x5"),
        ],
        "doc_id long, text string",
    )
    sh = dedup.shingles(df, k=3)
    assert sh.where("id = 1").count() == 3  # 5 tokens -> 3 tri-shingles
    pairs = dedup.ngram_jaccard_pairs(df, k=3, threshold=0.3).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    # |A∩B| = 2 tri-shingles, |A∪B| = 4 -> 0.5
    assert pairs[0]["jaccard"] == 0.5


def test_minhash_lsh_finds_near_dups(spark, docs):
    """Near-identical docs collide in at least one band; candidates are a
    superset-filter verified by exact Jaccard on a sample."""
    base = docs.limit(40)
    # make guaranteed near-dups: copy docs with one appended token
    dups = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
    )
    both = base.select("doc_id", "text").unionByName(dups)
    cand = dedup.minhash_lsh_pairs(both, k=3, n_hashes=16, n_bands=8)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    planted = {(i, i + 100000) for i in [r["doc_id"] for r in base.collect()]}
    # banded LSH at b=8,r=2 catches the overwhelming majority of ~0.95-sim pairs
    assert len(planted & got) >= int(0.8 * len(planted))


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [
            (1, "spark query engine for big data processing"),
            (2, "spark query engine for big data processing extra"),
            (3, "completely unrelated words about cooking pasta recipes"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r["simhash"] for r in dedup.simhash(df).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(out[1], out[2]) < hamming(out[1], out[3])
    assert all(0 <= v < 2 ** 32 for v in out.values())


def test_embedding_near_dup(spark, embs):
    dups = embs.limit(5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label"
    )
    both = embs.unionByName(dups)
    pairs = dedup.embedding_near_dup_pairs(both, threshold=0.9999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 10000) for i in range(5)} <= got


# -------------------------------------------------------------------- ann

def test_brute_force_topk(spark, embs):
    queries = embs.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    topk = ann.brute_force_topk(embs, queries, k=5).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        # the query vector itself is rank 1 with cos == 1
        assert rows[0]["vec_id"] == qid and rows[0]["cos"] == 1.0
        assert [r["rank"] for r in sorted(rows, key=lambda x: x["rank"])] == [1, 2, 3, 4, 5]


def test_lsh_topk_recall_vs_exact(spark, embs):
    queries = embs.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = ann.brute_force_topk(embs, queries, k=5).collect()
    approx = ann.lsh_topk(embs, queries, dim=64, k=5, n_planes=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    # self-match always survives (query is in its own bucket)
    for qid, s in approx_sets.items():
        assert qid in s
    recall = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) / 5 for q in exact_sets
    ) / len(exact_sets)
    assert recall >= 0.2  # approximate, but must find a real fraction


def test_lsh_multiprobe_recall_floor_on_clustered_data(spark):
    """The recall floor that matters: when neighbors are genuinely near
    (clustered corpus — the real-world shape), multi-probe LSH at
    Hamming ≤ 2 (22 of 64 buckets probed, ~1/3 of the corpus scanned)
    must achieve recall@10 ≥ 0.9 vs exact brute force. On an isotropic
    random corpus recall ≈ fraction scanned by information-theoretic
    necessity; that number is measured (not asserted) by the
    `ann_lsh_recall` driver query."""
    import numpy as np

    rng = np.random.default_rng(7)
    cents = rng.normal(size=(10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.repeat(cents, 50, axis=0) + 0.05 * rng.normal(size=(500, 64))
    embs = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(500)],
        "vec_id long, embedding array<float>",
    )
    queries = embs.where(F.col("vec_id").isin(0, 100, 250)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.brute_force_topk(embs, queries, k=10)
    approx = ann.lsh_topk(embs, queries, dim=64, k=10, n_planes=6, probe_hamming=2)
    recalls = {r["query_id"]: r["recall"] for r in ann.recall_at_k(approx, exact, k=10).collect()}
    assert len(recalls) == 3
    assert all(v >= 0.9 for v in recalls.values()), recalls
    # multi-probe really prunes: the scored candidate set (corpus rows in
    # a probed bucket) stays well under the full corpus per query
    from rook_spark.functions.ann import lsh_bucket, probe_masks

    assert len(probe_masks(6, 2)) == 22  # 22/64 buckets probed
    cb = embs.select("vec_id", lsh_bucket(F.col("embedding"), 64, 6).alias("b"))
    qb = {r["query_id"]: r["b"] for r in queries.select(
        "query_id", lsh_bucket(F.col("embedding"), 64, 6).alias("b")).collect()}
    for qid, b in qb.items():
        n_cand = cb.where(
            F.bit_count(F.col("b").bitwiseXOR(F.lit(b))) <= 2
        ).count()
        assert n_cand < 400, (qid, n_cand)  # pruned vs 500-row corpus


# ------------------------------------------------------------- multimodal

def test_multimodal_pipeline(spark):
    media = multimodal.synthesize_media(spark, n=48)
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in multimodal.MEDIA_SCHEMA.fields
    ]
    payload = media.first()["payload"]
    assert isinstance(payload, bytearray | bytes) and len(payload) == 64  # sha2-512 bytes

    feats = multimodal.extract_features(media, feature_dim=8).collect()
    assert len(feats) == 48
    for r in feats[:5]:
        assert len(r["feature"]) == 8 and r["n_bytes"] == 64
    # determinism: same input -> same features
    again = multimodal.extract_features(media, feature_dim=8).collect()
    assert [r["feature"] for r in feats] == [r["feature"] for r in again]

    sizes = multimodal.resize_images(media, max_side=128).collect()
    for r in sizes:
        assert max(r["target_width"], r["target_height"]) <= 128

    frames = multimodal.sample_frames(media, every_ms=10000)
    assert frames.count() > 0
    assert frames.first()["frame_ts_ms"][0] == 0


def test_multimodal_real_codec_path_raises(spark):
    media = multimodal.synthesize_media(spark, n=2)
    with pytest.raises(Exception, match="codecs are not available"):
        multimodal.extract_features(media, use_fake=False).collect()


def test_arrow_topk_identical_to_expr_topk(spark, embs):
    """The vectorized (numpy matmul) brute-force top-k and the pure
    expression path must agree exactly after the shared round-to-4 —
    same members, same cos, same ranks."""
    queries = embs.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    a = {
        (r["query_id"], r["vec_id"]): (r["cos"], r["rank"])
        for r in ann.brute_force_topk(embs, queries, k=7).collect()
    }
    b = {
        (r["query_id"], r["vec_id"]): (round(r["cos"], 4), r["rank"])
        for r in ann.brute_force_topk_arrow(embs, queries, k=7).collect()
    }
    assert a == b and len(a) == 28


def test_ivf_arrow_identical_to_expr(spark, embs):
    """IVF with vectorized cell assignment must equal the expression path
    exactly (same rounded argmax, same ties-to-larger-centroid-id)."""
    queries = embs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {
        (r["query_id"], r["vec_id"]): (r["cos"], r["rank"])
        for r in ann.ivf_topk(embs, queries, n_centroids=16, nprobe=4, k=10).collect()
    }
    b = {
        (r["query_id"], r["vec_id"]): (r["cos"], r["rank"])
        for r in ann.ivf_topk(
            embs, queries, n_centroids=16, nprobe=4, k=10, use_arrow=True
        ).collect()
    }
    assert a == b and len(a) == 30


def test_near_dup_arrow_identical_to_expr(spark, embs):
    """Bucketed near-dup pairs via per-bucket numpy matmul must equal the
    expression path exactly after the shared round-to-4."""
    b = embs.withColumn("bucket", ann.lsh_bucket(F.col("embedding"), 64, 3))
    expr = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in dedup.embedding_near_dup_pairs(
            b, threshold=0.4, group_col="bucket"
        ).collect()
    }
    arrow = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in dedup.embedding_near_dup_pairs_arrow(
            b, group_col="bucket", threshold=0.4
        ).collect()
    }
    assert expr == arrow and len(expr) > 0


def test_ivf_kmeans_centroids_recall_on_clustered_data(spark):
    """Trained spherical k-means codebook vs the lowest-id sample, on a
    corpus with genuine cluster structure (10 clusters): at nprobe=2 the
    k-means IVF must hit recall@10 >= 0.9 on every query and be at least
    as good as the sample codebook on average — the quality story behind
    the `centroids="kmeans"` option. Also pins determinism (two runs,
    identical centroids)."""
    import numpy as np

    from rook_spark.functions import ann

    rng = np.random.default_rng(13)
    cents = rng.normal(size=(10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.repeat(cents, 50, axis=0) + 0.05 * rng.normal(size=(500, 64))
    embs = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(500)],
        "vec_id long, embedding array<float>",
    )
    queries = embs.where(F.col("vec_id").isin(0, 120, 260, 430)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = ann.brute_force_topk(embs, queries, k=10)

    def mean_recall(centroids_mode):
        approx = ann.ivf_topk(
            embs, queries, n_centroids=10, nprobe=2, k=10,
            centroids=centroids_mode, use_arrow=True,
        )
        r = {x["query_id"]: x["recall"]
             for x in ann.recall_at_k(approx, exact, k=10).collect()}
        return r

    km = mean_recall("kmeans")
    smp = mean_recall("sample")
    assert len(km) == 4
    assert all(v >= 0.9 for v in km.values()), km
    assert sum(km.values()) >= sum(smp.values())

    c1 = ann.kmeans_centroids(embs, n_centroids=10, n_iter=3)
    c2 = ann.kmeans_centroids(embs, n_centroids=10, n_iter=3)
    assert c1 == c2


def test_connected_components_chain_singletons_and_convergence(spark):
    """Min-label propagation: a 5-node chain collapses to one component
    (diameter > 1 hop, so labels must propagate transitively), two
    disconnected cliques stay separate, isolated nodes label themselves,
    and an unconvergeable cap raises instead of returning partial
    labels."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),   # chain 1-5
         (10, 11), (11, 12), (10, 12)],    # triangle 10-12
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 99]],
                                  "id long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 99: 99}

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, nodes=nodes, max_iter=1)


def test_connected_components_checkpoint_dir(spark, tmp_path):
    """The durable-checkpoint path (cluster mode: survives executor
    loss, unlike localCheckpoint): same answer, and the checkpoint dir
    actually receives RDD checkpoint data."""
    import os

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    ckdir = str(tmp_path / "cc_ckpt")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(
               edges, checkpoint_dir=ckdir).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    # reliable checkpoints were written under the dir
    walked = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert walked, "checkpoint dir is empty — durable checkpoint not used"


def test_connected_components_log_rounds_on_long_chain(spark):
    """Pointer doubling makes convergence O(log diameter): a 300-link
    path graph must settle within 12 rounds (plain min-label propagation
    would need ~300) and label every node with the chain head."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a long, id_b long"
    )
    got = dedup.connected_components(chain, max_iter=12).collect()
    assert len(got) == 301
    assert all(r["component"] == 0 for r in got)


def test_ivf_arrow_zero_norm_raises(spark):
    """Reviewer finding r4: a zero-norm DATA vector must fail loudly in
    the Arrow cell assignment (the expression twin and SQL oracle would
    silently NULL it out — silent twin divergence), while zero-norm
    derived CENTROIDS are clamped, not fatal."""
    import pytest as _pytest

    embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries = embs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with _pytest.raises(Exception, match="degenerate embedding"):
        ann.ivf_topk(embs, queries, n_centroids=2, nprobe=1, k=2,
                     use_arrow=True).collect()
    # NaN components are equally degenerate (NaN norm is truthy — must
    # not slip past the guard and silently poison argmax)
    nan_embs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [float("nan"), 1.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="degenerate embedding"):
        ann.ivf_topk(nan_embs, queries, n_centroids=2, nprobe=1, k=2,
                     use_arrow=True).collect()
    # zero-norm CENTROID (sampled from data) with clean data vectors: the
    # clamp keeps assignment NaN-free and the query completes
    clean = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    # centroids = lowest-id vectors -> includes the zero vector as a
    # centroid; corpus passed to assignment must be non-degenerate
    good = clean.where(F.col("vec_id") > 0)
    from rook_spark.functions.ann import _ivf_cells_arrow, _sample_centroids
    cents = _sample_centroids(clean, 2, "vec_id", "embedding")
    assert any(all(x == 0.0 for x in v) for _, v in cents)
    rows = _ivf_cells_arrow(good, cents, "vec_id", "embedding").collect()
    assert len(rows) == 2 and all(r["__cell"] is not None for r in rows)


def test_lsh_hot_bucket_cap(spark):
    """The 100 TB hot-bucket guard: a boilerplate cluster larger than the
    cap emits ZERO pairs (m^2 blowup prevented), normal near-dup pairs
    survive, and lsh_hot_buckets reports what the cap drops. Default
    (None) keeps exact all-candidates semantics."""
    boiler = [(i, "license header identical text apache foundation") for i in range(30)]
    near = [
        (100, "a genuinely unique document about spark engines"),
        (101, "a genuinely unique document about spark engines extra"),
    ]
    df = spark.createDataFrame(boiler + near, "doc_id long, text string")

    uncapped = {(r["id_a"], r["id_b"])
                for r in dedup.minhash_lsh_pairs(df, k=3, n_hashes=16, n_bands=8).collect()}
    assert (100, 101) in uncapped
    assert len(uncapped) > 400  # 30 identical docs -> 435 boilerplate pairs

    capped = {(r["id_a"], r["id_b"])
              for r in dedup.minhash_lsh_pairs(
                  df, k=3, n_hashes=16, n_bands=8, max_bucket_size=10).collect()}
    assert (100, 101) in capped          # small buckets untouched
    assert all(a >= 100 for a, _ in capped), capped  # boilerplate m^2 gone

    hot = dedup.lsh_hot_buckets(df, k=3, n_hashes=16, n_bands=8).collect()
    assert hot[0]["bucket_size"] == 30   # the monitor names the cluster


def test_embedding_hot_bucket_cap_both_paths(spark):
    """Verdict r4 item 2: the Arrow embedding near-dup path (an m×m
    matmul per bucket in ONE task) gets the same hot-bucket guard as the
    LSH band join — an oversized bucket is dropped before the
    applyInPandas/self-join, small buckets are untouched, BOTH twins
    drop identically (shared _cap_hot_groups derivation), and the
    embedding_hot_buckets monitor predicts exactly what the cap drops."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.normal(size=8)
    # bucket 0: a 30-vector boilerplate cluster (pairwise near-identical)
    boiler = [
        (i, 0, (base + 1e-4 * rng.normal(size=8)).tolist()) for i in range(30)
    ]
    # bucket 1: two genuine near-dups
    v = rng.normal(size=8)
    near = [(100, 1, v.tolist()), (101, 1, (v + 1e-4 * rng.normal(size=8)).tolist())]
    df = spark.createDataFrame(
        boiler + near, "vec_id long, bucket int, embedding array<double>"
    )

    def pairs(fn, **kw):
        return {
            (r["id_a"], r["id_b"])
            for r in fn(
                df, group_col="bucket", threshold=0.99, max_bucket_size=10, **kw
            ).collect()
        }

    capped_arrow = pairs(dedup.embedding_near_dup_pairs_arrow)
    capped_expr = pairs(dedup.embedding_near_dup_pairs)
    assert capped_arrow == capped_expr == {(100, 101)}  # big bucket gone, twin parity

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs_arrow(
            df, group_col="bucket", threshold=0.99
        ).collect()
    }
    assert (100, 101) in uncapped and len(uncapped) == 1 + 30 * 29 // 2

    # monitor's bucket list == exactly what the cap dropped
    hot = dedup.embedding_hot_buckets(df, "bucket", min_size=11).collect()
    assert [(r["bucket"], r["bucket_size"]) for r in hot] == [(0, 30)]
    dropped = uncapped - capped_arrow
    assert dropped == {(a, b) for a in range(30) for b in range(a + 1, 30)}

    # cap without a group_col on the expression path is refused loudly
    with pytest.raises(ValueError, match="group_col"):
        dedup.embedding_near_dup_pairs(df, max_bucket_size=10)


def test_benchmark_contamination(spark):
    """Planted leak: a corpus doc embedding a benchmark passage scores
    high contamination; clean docs are absent from the result; the
    fraction is exact."""
    bench = spark.createDataFrame(
        [(0, "what is the capital of france paris obviously")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "training text what is the capital of france paris and more words"),
            (2, "completely clean document about distributed joins"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.benchmark_contamination(corpus, bench, k=3).collect()
    assert [r["id"] for r in rows] == [1]
    r = rows[0]
    assert r["n_contaminated"] >= 5  # the embedded passage's tri-shingles
    assert 0 < r["contamination"] <= 1.0
    assert r["contamination"] == round(r["n_contaminated"] / r["n_shingles"], 4)


def test_benchmark_contamination_k8_vs_duckdb(spark):
    """Verdict r4 item 7: real eval decontamination runs 8-13-gram
    overlap, where shingle counts and hit rates behave very differently
    from k=3 (an 8-gram match is near-certain verbatim leakage; random
    collisions vanish). Full DuckDB oracle at k=8 over the sf0.01
    documents table, same deterministic 97-split as the k=3 driver
    query. CHOOSING k: 3-grams measure topical overlap (high false-hit
    rate — any doc sharing phrasing fires); 8+-grams measure verbatim
    contamination (the thing decontamination actually removes);
    production pipelines typically use k=8-13 with a 'any hit = drop'
    or windowed-overlap policy. The k=3 driver query stays as-is (the
    oracle-rotation entry); this pins the realistic operating point."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    k = 8
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r["id"]: (r["n_shingles"], r["n_contaminated"], r["contamination"])
        for r in dedup.benchmark_contamination(
            docs.where(F.col("doc_id") % 97 != 0),
            docs.where(F.col("doc_id") % 97 == 0),
            k=k,
        ).collect()
    }

    grams = ", ".join(f"t[i+{j}]" for j in range(k))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle = con.execute(f"""
        WITH toks AS (
          SELECT doc_id AS id,
                 regexp_split_to_array(lower(trim(text)), '\\s+') AS t
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT id, concat_ws(' ', {grams}) AS shingle
          FROM toks, unnest(generate_series(1, len(t) - {k - 1})) AS g(i)
          WHERE len(t) >= {k}
        ),
        bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 97 = 0),
        corp AS (SELECT * FROM sh WHERE id % 97 <> 0),
        agg AS (
          SELECT c.id, CAST(count(*) AS BIGINT) AS n_shingles,
                 CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_contaminated
          FROM corp c LEFT JOIN bench b ON c.shingle = b.shingle
          GROUP BY c.id
        )
        SELECT id, n_shingles, n_contaminated,
               round(n_contaminated * 1.0 / n_shingles, 4) AS contamination
        FROM agg WHERE n_contaminated > 0
    """).fetchall()
    con.close()
    want = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert got == want
    # at k=8 hits are verbatim runs: strictly fewer contaminated docs
    # than the k=3 sweep finds on the same split
    k3 = dedup.benchmark_contamination(
        docs.where(F.col("doc_id") % 97 != 0),
        docs.where(F.col("doc_id") % 97 == 0),
        k=3,
    ).count()
    assert len(got) <= k3


# ------------------------------------------------- product quantization

def test_pq_encode_shape_and_determinism(spark, embs):
    books = ann.pq_codebooks_sample(embs, m=8, ks=16)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    a = {r["vec_id"]: list(r["codes"]) for r in ann.pq_encode(embs, books).collect()}
    b = {r["vec_id"]: list(r["codes"]) for r in ann.pq_encode(embs, books).collect()}
    assert a == b and len(a) == embs.count()
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in a.values())


def test_pq_topk_recall_vs_exact(spark, embs):
    """PQ-ADC recall@10 against exact brute force on the driver corpus —
    the quantization-error budget check. m=8 × ks=16 over 64 dims is a
    64× memory cut; the floor asserts the approximation still surfaces a
    usable fraction of the true neighbors, and the trained codebooks
    must not be WORSE than the sample ones."""
    queries = embs.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = ann.brute_force_topk(embs, queries, k=10)

    def mean_recall(books):
        approx = ann.pq_topk(embs, queries, books, k=10)
        rs = ann.recall_at_k(approx, exact, k=10).collect()
        return sum(r["recall"] for r in rs) / len(rs)

    r_sample = mean_recall(ann.pq_codebooks_sample(embs, m=8, ks=16))
    r_trained = mean_recall(ann.pq_train(embs, m=8, ks=16, sample_n=256))
    assert r_sample >= 0.3, r_sample
    assert r_trained >= r_sample - 0.05, (r_trained, r_sample)


def test_pq_trained_recall_floor_on_clustered_data(spark):
    """On genuinely clustered data (the real-world shape): ADC alone must
    land a usable fraction, and the ADC-shortlist + exact-re-rank second
    stage (the production shape) must hit recall@10 >= 0.9; training is
    deterministic."""
    import numpy as np

    rng = np.random.default_rng(13)
    cents = rng.normal(size=(10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.repeat(cents, 50, axis=0) + 0.05 * rng.normal(size=(500, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = df.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    books = ann.pq_train(df, m=8, ks=16, sample_n=256)
    assert books == ann.pq_train(df, m=8, ks=16, sample_n=256)  # deterministic
    exact = ann.brute_force_topk(df, queries, k=10)

    def mean_recall(approx):
        rs = ann.recall_at_k(approx, exact, k=10).collect()
        return sum(r["recall"] for r in rs) / len(rs)

    # ADC alone: 50 same-cluster near-ties per query sit inside the
    # quantization noise — the cluster is right, the fine order is
    # scrambled (measured ~0.5); this is WHY production PQ re-ranks
    r_adc = mean_recall(ann.pq_topk(df, queries, books, k=10))
    assert r_adc >= 0.4, r_adc
    # ADC shortlist (50) + exact cosine re-rank: the production shape
    r_rr = mean_recall(ann.pq_topk(df, queries, books, k=10, rerank=50))
    assert r_rr >= 0.9, r_rr
    assert r_rr > r_adc


def test_gopher_quality_flags_degenerate_docs(spark):
    """The keep flag must trip on each Gopher signal independently:
    repetition (one bigram dominates), sub-word tokens (mean word
    length), copy-paste vocabulary collapse (distinct fraction) — and
    a zero-bigram doc gets frac 0, not a null that poisons the flag."""
    from rook_spark.functions.text import gopher_quality

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a genuinely varied sentence "
                "with plenty distinct tokens appearing once each time"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),   # repetition
            (3, "a b c d e f g h i j"),                                  # mean len 1
            (4, "word"),                                                 # 1 token, 0 bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["top_bigram_frac"] == 1.0
    assert out[2]["distinct_word_frac"] == 0.1
    assert out[3]["keep"] is False and out[3]["mean_word_len"] == 1.0
    assert out[4]["top_bigram_frac"] == 0.0 and out[4]["n_words"] == 1


def test_gopher_repetition_char_fractions(spark):
    """Hand-verifiable n-gram char-mass fractions: a clean doc keeps, a
    doc dominated by one repeated bigram trips top_2gram, a doc that is
    one long verbatim loop trips the duplicated-5gram rule, and the dup
    mass clamps at 1.0 instead of exceeding it (overlapping occurrences
    double-count by construction — the documented deviation)."""
    from rook_spark.functions.text import gopher_repetition

    loop = " ".join(["alpha beta gamma delta epsilon"] * 4)  # 20 toks
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over one genuinely varied "
                "sentence with plenty distinct tokens appearing once"),
            (2, "go go go go go go stop"),
            (3, loop),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           gopher_repetition(docs, top_ns=(2,), dup_ns=(5,)).collect()}

    assert out[1]["keep"] is True
    assert out[1]["dup_5gram_char_frac"] == 0.0

    # doc 2: tokens [go x6, stop]; tc = 16 chars. 2-grams: "go go" x5,
    # "go stop" x1 -> top = 5 * 4 = 20 chars -> clamp-free top frac
    # 20/16 = 1.25 (top frac is NOT clamped: >1 is a valid smell signal)
    assert out[2]["top_2gram_char_frac"] == 1.25
    assert out[2]["keep"] is False

    # doc 3: every 5-gram repeats (4x loop of a 5-token phrase), so the
    # occurrence-weighted dup mass far exceeds tc and must clamp to 1.0
    assert out[3]["dup_5gram_char_frac"] == 1.0
    assert out[3]["keep"] is False


def test_dedup_keep_canonical_semantics(spark):
    """Canonical pick per near-dup cluster: the LONGEST doc wins, equal
    lengths break to the MIN id, singletons keep themselves, and every
    cluster keeps exactly one doc. Docs 1/2/3 are shingle-identical up
    to an extension (so LSH pairs them); doc 9 is unrelated."""
    from rook_spark.functions.dedup import dedup_keep_canonical

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # tie with 1 -> 1 wins
            (3, base + " iota kappa"),      # longest -> canonical
            (9, "completely different words about unrelated matters here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            dedup_keep_canonical(docs, n_hashes=16, n_bands=8).collect()}
    assert len(rows) == 4
    assert rows[1]["cluster"] == rows[2]["cluster"] == rows[3]["cluster"] == 1
    assert rows[9]["cluster"] == 9 and rows[9]["keep"] is True
    assert rows[3]["keep"] is True          # longest
    assert rows[1]["keep"] is False and rows[2]["keep"] is False
    assert sum(r["keep"] for r in rows.values()) == 2  # one per cluster


def test_top_ngrams_hand_pinned(spark):
    """Hand-computed corpus: counts, per-n ranks, tie-break (cnt desc,
    gram asc), and the short-doc guard (a doc shorter than n contributes
    no n-grams, not a malformed one)."""
    from rook_spark.functions.text import top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),   # bigrams: 'a b'×2, 'b a'×1
            (2, "a b"),       # bigram 'a b'×1; trigram: none (guard)
            (3, "c"),         # unigram only
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["n"], r["gram"]): (r["cnt"], r["gram_rank"])
        for r in top_ngrams(docs, ns=(1, 2, 3), k=10, n_salts=3).collect()
    }
    assert got[(1, "a")] == (3, 1)
    assert got[(1, "b")] == (3, 2)      # tie with 'a' broken by gram asc
    assert got[(1, "c")] == (1, 3)
    assert got[(2, "a b")] == (3, 1)
    assert got[(2, "b a")] == (1, 2)
    assert got[(3, "a b a")] == (1, 1)  # only doc 1 has trigrams
    assert got[(3, "b a b")] == (1, 2)
    assert len([k for k in got if k[0] == 3]) == 2


def test_curation_funnel_verdict_precedence(spark):
    """Crafted corpus exercising EVERY funnel verdict, including
    exact_dup (absent from the synthetic table): first-drop-wins
    ordering, canonical-longest near-dup pick, benchmark labeling,
    the domain cap, bench=None skipping stage 4, and every input doc
    receiving exactly one verdict."""
    from rook_spark.functions.pipeline import curation_funnel

    # three shingle-disjoint stopword-rich bases (cyclic word orders
    # differ, so their 3-gram sets never overlap)
    A = ("the and of to in a " * 30).strip()
    B = ("a in to of and the " * 30).strip()
    C = ("in the of and to a " * 30).strip()
    rows = [
        (1, A + " one", "s1"),
        (2, A + " two", "s1"),
        (3, A + " two", "s1"),       # byte-identical to 2 -> exact_dup
        (4, "zz", "s1"),             # short, no stopwords -> low_quality
        (5, A + " two extra", "s2"),  # longest in cluster {1,2,5} -> canonical
        (6, B + " leak marker benchmark answer here yes", "s3"),
        (7, C + " standalone survivor", "s2"),
    ]
    bench_rows = [(100, "leak marker benchmark answer here definitely", "b")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    bench = spark.createDataFrame(bench_rows, "doc_id bigint, text string, source string")

    got = {r["doc_id"]: r["verdict"]
           for r in curation_funnel(docs, bench=bench, domain_cap=10).collect()}
    assert len(got) == len(rows) + len(bench_rows)
    assert got[3] == "exact_dup"     # dropped before the LSH pays for it
    assert got[4] == "low_quality"
    assert got[100] == "benchmark"
    assert got[1] == "near_dup" and got[2] == "near_dup"
    assert got[5].startswith("kept_")   # canonical of {1,2,5}: longest
    assert got[6] == "contaminated"     # shares 3-grams with the bench doc
    assert got[7].startswith("kept_")

    # domain cap: 5 and 7 share source s2; cap=1 keeps exactly one
    got2 = {r["doc_id"]: r["verdict"]
            for r in curation_funnel(docs, bench=bench, domain_cap=1).collect()}
    s2_verdicts = sorted([got2[5], got2[7]])
    assert s2_verdicts[0] == "domain_capped" and s2_verdicts[1].startswith("kept_")

    # bench=None: stage 4 skipped -> 6 survives; no benchmark rows
    got3 = {r["doc_id"]: r["verdict"]
            for r in curation_funnel(docs, bench=None).collect()}
    assert 100 not in got3
    assert got3[6].startswith("kept_")
