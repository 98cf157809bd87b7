"""Round-6 optimization internals: the perf changes must be
value-invisible. Each test pins one changed mechanism against the
construction it replaced (or its contract), so a future edit can't
silently drift the fast path from the reference semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from rook_spark.functions import ann, dedup, text


def test_lit_double_array_bit_parity(spark):
    """The one-call SQL array literal must be BIT-identical to the
    per-element F.lit form (repr round-trips doubles exactly)."""
    vals = ann._hyperplane(64, 3) + [1e-300, -0.0, 12345.678e9, 1 / 3]
    df = spark.range(1).select(
        ann._lit_double_array(vals).alias("a"),
        F.array(*[F.lit(x) for x in vals]).alias("b"),
    )
    row = df.first()
    assert list(row["a"]) == list(row["b"])
    assert df.schema["a"].dataType == df.schema["b"].dataType


def test_lsh_bucket_sql_form_matches_column_form(spark, sf_dir):
    """lsh_bucket(name) (one-py4j-call SQL string) must agree row-for-row
    with lsh_bucket(Column) (the compatibility Column-API construction)."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = (
        embs.select(
            ann.lsh_bucket("embedding", dim=64, n_planes=6).alias("by_name"),
            ann.lsh_bucket(F.col("embedding"), dim=64, n_planes=6).alias("by_col"),
        )
        .where(F.col("by_name") != F.col("by_col"))
        .count()
    )
    assert d == 0


def test_ivf_cells_sql_form_matches_column_form(spark, sf_dir):
    """ivf_cells' one-call SQL construction must agree with the
    Column-API construction it replaced (same rounded scores, same
    tie-breaks, same nprobe ordering)."""
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ann._sample_centroids(embs, 8, "vec_id", "embedding")
    scored_old = F.array(*[
        F.struct(
            F.round(
                dedup.cosine(
                    F.col("embedding"), F.array(*[F.lit(x) for x in vec])
                ),
                6,
            ).alias("s"),
            F.lit(cid).alias("i"),
        )
        for cid, vec in cents
    ])
    old_cells = F.transform(
        F.slice(F.reverse(F.array_sort(scored_old)), 1, 3), lambda x: x["i"]
    )
    d = (
        embs.select(
            ann.ivf_cells(cents, "embedding", nprobe=3).alias("n"),
            old_cells.alias("o"),
        )
        .where(F.col("n") != F.col("o"))
        .count()
    )
    assert d == 0


def test_widen_narrow_scan_adaptive(spark, sf_dir):
    """The parallelism floor must repartition a narrow input to
    defaultParallelism, leave an already-wide input alone, and never
    change rows."""
    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def parts(df):
        return df._jdf.queryExecution().toRdd().getNumPartitions()

    narrow = docs.coalesce(1)
    widened = text.widen_narrow_scan(narrow)
    assert parts(widened) == par
    assert widened.count() == docs.count()

    wide = docs.repartition(par + 3)
    assert parts(text.widen_narrow_scan(wide)) == par + 3


def test_cc_superstep_exact_on_long_chain(spark):
    """The two-steps-per-action loop must still converge exactly on a
    path graph (worst case for label propagation) and on a graph whose
    step count is odd, labeling every node with the chain minimum."""
    n = 33  # path 0-1-2-...-32: needs several doubling supersteps
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = {
        r["id"]: r["component"]
        for r in dedup.connected_components(edges).collect()
    }
    assert out == {i: 0 for i in range(n)}


def test_cc_superstep_no_edges_all_singletons(spark):
    """Empty candidate graph: every node is its own component (the
    pre-loop persist/coalesce path must not trip on zero edges)."""
    edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    out = {
        r["id"]: r["component"]
        for r in dedup.connected_components(edges, nodes=nodes).collect()
    }
    assert out == {i: i for i in range(5)}
