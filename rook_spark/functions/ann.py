"""Approximate nearest-neighbor search over an embedding column.

Two paths:

- :func:`brute_force_topk` — exact cosine top-k. The query side is
  **broadcast** (queries are few), so the scan side streams through one
  stage with no shuffle of the corpus; the only shuffle is the final
  per-query top-k, whose input is already cut to k rows per (query,
  input-partition) by a partial window... in practice Catalyst plans
  broadcast-nested-loop + window; at 100 TB the corpus never moves.
- :func:`lsh_topk` — random-hyperplane LSH: sign-bit sketches bucket
  the corpus; only the query's bucket (plus optional multi-probe
  neighbors) is scanned. Buckets are deterministic hash-derived
  hyperplanes, so results are reproducible. This is the scale path:
  the equi-join on bucket prunes the candidate set before any distance
  math.

Plus the two paths that bound COMPUTE (:func:`ivf_topk` — scan only the
query's ``nprobe`` nearest cells, optional distributed k-means codebook)
and MEMORY (:func:`pq_topk` — product quantization: the corpus becomes
``m`` one-byte codes per vector, the scan becomes distance-table
lookups, and an exact re-rank over the ADC shortlist restores recall).
Together: brute (oracle) → LSH (candidate pruning) → IVF (cell pruning)
→ PQ+re-rank (64× smaller scan) — the standard escalation to 10^10
vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rook_spark.functions.dedup import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query (broadcast the small query side).
    ``dim`` (known embedding width) unrolls the cosine into codegen
    arithmetic — see :func:`rook_spark.functions.dedup.cosine`."""
    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")))
    scored = corpus.crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv"), dim=dim), 4).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul — the DENSE-MATH
    scale path. Spark's higher-order-function fold (`cosine`) evaluates
    lambdas interpreted (~100 µs per 64-dim pair, measured); one
    `V @ Q.T` over an Arrow batch does the same work vectorized, ~100×
    faster. Each batch emits only its local top-k per query, so the
    shuffle into the global top-k window carries O(k × partitions), not
    the corpus. Results agree with :func:`brute_force_topk` after the
    shared round-to-4 (asserted on the deterministic driver corpus); the
    two paths sum floats in different orders, so a cosine within ~1 ulp
    of a .00005 boundary could in principle round apart — treat the pair
    as round-4-equivalent, not bit-identical."""
    import numpy as np

    q_rows = queries.select(query_id_col, vec_col).collect()  # few by contract
    qids = np.array([r[query_id_col] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = f"{query_id_col} long, {id_col} long, cos double"

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = np.round(Vn @ Qn.T, 4)  # (n_rows, n_queries)
            ids = pdf[id_col].to_numpy()
            top = min(k, len(ids))
            parts = []
            for j in range(S.shape[1]):
                # local top-k per query: order by (-cos, id) like the window
                order = np.lexsort((ids, -S[:, j]))[:top]
                parts.append(pd.DataFrame({
                    query_id_col: qids[j],
                    id_col: ids[order],
                    "cos": S[order, j],
                }))
            yield pd.concat(parts, ignore_index=True)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane component from a hash —
    reproducible across engines and runs without RNG state."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}|{plane}|{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def _lit_double_array(values: list[float]) -> Column:
    """Literal array<double> column in ONE py4j round-trip.

    ``F.array(*[F.lit(x) for x in values])`` costs 65+ py4j calls per
    64-dim vector (~0.5 ms each — measured 0.52 s just to build 16
    centroid arrays, a driver-side serial cost paid on EVERY query
    build); a single SQL ``array(...)`` string parses JVM-side in one
    call. ``repr(float)`` round-trips exactly through Java's double
    parser, so the resulting Literal values are bit-identical to the
    per-element ``F.lit`` form (asserted in tests)."""
    return F.expr("array(" + ",".join(f"{x!r}D" for x in values) + ")")


def lsh_bucket(
    vec_col: Column | str, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Sign-bit sketch: bucket id = bits of sign(v · hyperplane_i).
    The hyperplanes are literal arrays folded JVM-side — no UDF.
    (Kept as the compact HOF fold on purpose: the r6 unrolling
    experiment — 64 literal terms per plane — blew up plan size
    wherever the bucket expression is duplicated, e.g. once per probe
    mask in ``lsh_topk``, disabling codegen and OOMing the driver;
    see :func:`rook_spark.functions.dedup.cosine`.)

    With a column NAME (the fast path every internal caller uses), the
    whole expression is built as ONE SQL string → one py4j round-trip;
    the Column-API form paid 3 py4j-constructed lambdas per plane on
    every query build. NB the zip_with product casts only the VECTOR
    element (the plane literal is already double) — identical in both
    forms."""
    if isinstance(vec_col, Column):
        # Column input: the SQL fast path below needs the column's NAME
        # (Spark 4's Column wrapper exposes no way back to SQL text);
        # keep the equivalent Column-API construction for compatibility
        bucket = F.lit(0)
        for p in range(n_planes):
            plane = _lit_double_array(_hyperplane(dim, p, seed))
            dot = F.aggregate(
                F.zip_with(vec_col, plane, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bucket = bucket + F.when(dot > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        return bucket.cast("int")
    if n_planes == 0:
        return F.lit(0).cast("int")
    terms = []
    for p in range(n_planes):
        plane = "array(" + ",".join(
            f"{x!r}D" for x in _hyperplane(dim, p, seed)) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {plane}, (a, b) -> "
            f"CAST(a AS DOUBLE) * b), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2 ** p} ELSE 0 END)")
    return F.expr("CAST((0 + " + " + ".join(terms) + ") AS INT)")


def probe_masks(n_planes: int, hamming: int) -> list[int]:
    """All XOR masks within the given Hamming radius (incl. 0 = the
    query's own bucket) — the multi-probe set."""
    return [m for m in range(2**n_planes) if bin(m).count("1") <= hamming]


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket
    are scored. Equi-join on bucket → hash join, prunes before math.

    ``probe_hamming`` > 0 enables multi-probe: the QUERY side expands to
    every bucket within that Hamming distance (C(n_planes, ≤h) probes per
    query — e.g. 22 of 64 buckets at n_planes=6, h=2), so the join stays
    an equi-join and the corpus is still scanned once with no shuffle.
    Recall scales with scanned fraction; on data with real cluster
    structure single-probe already lands the cluster (see
    tests/test_functions.py recall floor), while on isotropic data
    recall ≈ fraction scanned — inherent to any ANN pruning, measured
    honestly by the `ann_lsh_recall` driver query.
    """
    c = corpus.withColumn("__bucket", lsh_bucket(vec_col, dim, n_planes, seed))
    masks = probe_masks(n_planes, probe_hamming)
    qb = lsh_bucket(vec_col, dim, n_planes, seed)
    q = queries.select(
        query_id_col,
        F.col(vec_col).alias("__qv"),
        F.explode(
            F.array(*[qb.bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__qv"), dim=dim), 4).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def ivf_cells(
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> Column:
    """Cell assignment for IVF: the ids of the ``nprobe`` centroids with
    the highest (rounded) cosine to the row's vector — an array column
    computed from literal centroid arrays, JVM-side, no UDF. Rounding to
    6 decimals makes the argmax reproducible across engines (FP fold
    order differs; ties then break on centroid id)."""
    # The whole scored array is built as ONE SQL string → one py4j
    # round-trip. The Column-API form (F.struct/F.round/cosine per
    # centroid) constructed 3 HOF lambdas per dot × 3 dots × n_centroids
    # through py4j — measured 1.0-1.5 s of serial driver time on EVERY
    # query build. The SQL parses to the same resolved expressions
    # (aggregate/zip_with with cast-to-double products, 0.0D zero,
    # round to 6), so values are identical — asserted against the same
    # DuckDB oracle as before.
    def dot(x: str, y: str) -> str:
        return (
            f"aggregate(zip_with({x}, {y}, (p, q) -> CAST(p AS DOUBLE) * "
            f"CAST(q AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
        )

    def cos6(arr_sql: str) -> str:
        return (
            f"round({dot(vec_col, arr_sql)} / (sqrt({dot(vec_col, vec_col)})"
            f" * sqrt({dot(arr_sql, arr_sql)})), 6)"
        )

    def arr_sql(vec: list[float]) -> str:
        return "array(" + ",".join(f"{x!r}D" for x in vec) + ")"

    scored = F.expr(
        "array("
        + ",".join(
            f"named_struct('s', {cos6(arr_sql(vec))}, 'i', {cid})"
            for cid, vec in centroids
        )
        + ")"
    )
    # sort ascending by (s, i); take the last nprobe = best cells
    best = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return F.transform(best, lambda x: x["i"])


def _ivf_cells_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow/numpy twin of :func:`ivf_cells` at nprobe=1: one matmul per
    batch instead of per-row interpreted lambda folds (same round-to-6
    argmax with ties to the larger centroid id — value-identical,
    asserted in tests). ~10× faster per row, measured."""
    import numpy as np

    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)
    # clamp zero norms on CENTROIDS (internal, derived values — a
    # clamped centroid scores 0 everywhere instead of emitting NaN that
    # silently poisons argmax, ADVICE r3); zero-norm DATA vectors raise
    # below instead — clamping them would silently diverge from the
    # expression twin and the SQL oracle, which both map zero-norm to
    # NULL cosine (reviewer finding r4)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-cids)  # columns in cid-desc order: argmax tie → max cid
    cids_desc, Cn_desc = cids[order], Cn[order]

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(V, axis=1, keepdims=True)
            # degenerate = zero OR non-finite (NaN/inf components give a
            # NaN/inf norm, which is truthy — a bare .all() would let it
            # through to silently poison argmax; r4 review finding)
            ok = np.isfinite(norms) & (norms > 0)
            if not ok.all():
                bad = pdf[id_col].iloc[int(np.argmin(ok.ravel()))]
                raise ValueError(
                    f"degenerate embedding ({id_col}={bad}: zero or "
                    "non-finite norm): cosine cell assignment is undefined "
                    "— filter these upstream (the expression twin and SQL "
                    "oracle would silently NULL them out; failing loudly "
                    "keeps the twins value-identical on every input they "
                    "accept)"
                )
            Vn = V / norms
            S = np.round(Vn @ Cn_desc.T, 6)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                vec_col: pdf[vec_col],
                "__cell": cids_desc[np.argmax(S, axis=1)],
            })

    field = df.schema[vec_col].simpleString().split(":", 1)[1]
    return df.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {vec_col} {field}, __cell long"
    )


def _sample_centroids(
    corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> list[tuple[int, list[float]]]:
    """Deterministic codebook seed: the ``n_centroids`` lowest-id corpus
    vectors (a top-N take, not a full sort)."""
    return [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in corpus.orderBy(id_col).limit(n_centroids).collect()
    ]


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 5,
) -> list[tuple[int, list[float]]]:
    """Deterministic distributed spherical k-means (Lloyd's) for IVF:
    init = the ``n_centroids`` lowest-id vectors (reproducible, no RNG),
    then ``n_iter`` rounds of [Arrow cell assignment → per-cell mean].
    Each round is ONE Spark job: the assignment is the same numpy-matmul
    ``mapInPandas`` the query path uses, and the mean is an
    ``applyInPandas`` per cell — the corpus never collects to the driver;
    only the k×dim centroid matrix does (k ≤ dozens). An emptied cell
    keeps its previous centroid, so the cell-id set is stable across
    iterations. Cosine assignment + mean-of-normalized = spherical
    k-means, the right objective for cosine ANN."""
    import numpy as np
    import pandas as pd

    cents = _sample_centroids(corpus, n_centroids, id_col, vec_col)

    def cell_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.array(pdf["__v"].tolist(), dtype=np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame({
            "__cell": [int(pdf["__cell"].iloc[0])],
            "__mean": [np.mean(Vn, axis=0).tolist()],
        })

    for _ in range(n_iter):
        assigned = _ivf_cells_arrow(corpus, cents, id_col, vec_col)
        means = {
            int(r["__cell"]): [float(x) for x in r["__mean"]]
            for r in assigned.select(F.col("__cell"), F.col(vec_col).alias("__v"))
            .groupBy("__cell")
            .applyInPandas(cell_mean, schema="__cell long, __mean array<double>")
            .collect()
        }
        cents = [(cid, means.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    use_arrow: bool = False,
    centroids: str = "sample",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is partitioned
    into cells by nearest centroid; a query scans only its ``nprobe``
    nearest cells. ``centroids`` picks the codebook: ``"sample"`` — the
    ``n_centroids`` lowest-id corpus vectors (deterministic, zero extra
    jobs; fine for plan-shape verification), or ``"kmeans"`` — trained
    spherical k-means (:func:`kmeans_centroids`; n_iter extra jobs,
    better-balanced cells → better recall at the same nprobe). Scale
    shape either way: one narrow cell-assignment pass over the corpus
    (literal centroid math inside codegen), then an equi-join on cell id
    — the corpus never shuffles and only ``nprobe/n_centroids`` of it is
    scored per query.
    """
    if centroids == "kmeans":
        cents = kmeans_centroids(corpus, n_centroids, id_col, vec_col)
    elif centroids == "sample":
        cents = _sample_centroids(corpus, n_centroids, id_col, vec_col)
    else:
        raise ValueError(f"centroids must be 'sample' or 'kmeans', got {centroids!r}")
    if use_arrow:
        # vectorized cell assignment: one numpy matmul per Arrow batch
        c = _ivf_cells_arrow(corpus, cents, id_col, vec_col)
    else:
        # expression twin — now an UNROLLED codegen arithmetic chain
        # (see ivf_cells), no interpreted lambdas; keep the width floor
        # so a single-file corpus scan still parallelizes (guide §2.5)
        from rook_spark.functions.text import widen_narrow_scan

        c = widen_narrow_scan(corpus).withColumn(
            "__cell", F.element_at(ivf_cells(cents, vec_col, nprobe=1), 1)
        )
    q = queries.select(
        query_id_col,
        F.col(vec_col).alias("__qv"),
        F.explode(ivf_cells(cents, vec_col, nprobe=nprobe)).alias("__cell"),
    )
    scored = c.join(F.broadcast(q), "__cell").select(
        query_id_col,
        id_col,
        # unrolled: the embedding width is known from the centroids
        F.round(
            cosine(F.col(vec_col), F.col("__qv"), dim=len(cents[0][1])), 4
        ).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """recall@k of an approximate top-k result against the exact one:
    |approx ∩ exact| / k per query (one tiny join + agg)."""
    hits = approx.select(query_id_col, id_col).join(
        exact.select(query_id_col, id_col), [query_id_col, id_col]
    )
    return (
        exact.select(query_id_col).distinct()
        .join(hits.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("__h")),
              query_id_col, "left")
        .select(
            query_id_col,
            F.round(F.coalesce(F.col("__h"), F.lit(0)) / F.lit(k), 4).alias("recall"),
        )
    )


# --------------------------------------------------- product quantization

def pq_codebooks_sample(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic sample PQ codebooks: subspace ``s``'s centroid ``j``
    is the ``j``-th lowest-id corpus vector's ``s``-th subvector — zero
    training jobs, reproducible in plain SQL (the oracle recomputes it),
    the PQ analog of :func:`_sample_centroids`. Returns
    ``[m][ks][dim/m]``."""
    rows = _sample_centroids(corpus, ks, id_col, vec_col)
    dim = len(rows[0][1])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sd = dim // m
    return [[v[s * sd:(s + 1) * sd] for _, v in rows] for s in range(m)]


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ks: int = 16,
    sample_n: int = 256,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Trained PQ codebooks: plain-L2 Lloyd's per subspace over the
    ``sample_n`` lowest-id vectors (PQ codebooks are universally trained
    on a bounded sample — the collect here is ``sample_n × dim`` floats,
    never the corpus; init = the first ``ks`` sample subvectors, so the
    whole procedure is deterministic with no RNG state). An emptied
    cluster keeps its previous centroid. Returns ``[m][ks][dim/m]``."""
    import numpy as np

    rows = corpus.orderBy(id_col).limit(sample_n).collect()
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sd = dim // m
    books = []
    for s in range(m):
        sub = X[:, s * sd:(s + 1) * sd]
        C = sub[:ks].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(ks):
                members = sub[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def _pq_assign(V, book_arr):
    """Per-subspace nearest-centroid codes for a batch: argmin over
    ``round(||sub - c||, 6)`` with ties to the LOWEST centroid id — the
    exact ordering the SQL oracle's ``ORDER BY round(list_distance(...),
    6), cid`` reproduces. V: (n, dim); book_arr: (m, ks, sd) → (n, m)."""
    import numpy as np

    n = V.shape[0]
    m, ks, sd = book_arr.shape
    codes = np.empty((n, m), dtype=np.int32)
    for s in range(m):
        sub = V[:, s * sd:(s + 1) * sd]
        d = np.round(np.sqrt(
            ((sub[:, None, :] - book_arr[s][None, :, :]) ** 2).sum(axis=2)
        ), 6)
        codes[:, s] = d.argmin(axis=1)  # first minimum = lowest cid
    return codes


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode a vector column: ``(id, codes array<int>)`` — ``m``
    bytes of code replacing ``dim × 8`` bytes of floats (64-dim float64 →
    8 codes is a 64× memory cut; at 10^10 vectors that is an 80 GB scan
    instead of 5 TB — THE reason PQ is the memory-bound scale path).
    One Arrow pass, one matmul-shaped assignment per batch."""
    import numpy as np

    book_arr = np.array(codebooks, dtype=np.float64)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = _pq_assign(V, book_arr)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "codes": list(codes),
            })

    return df.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} long, codes array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rerank: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k via product
    quantization: each query precomputes an ``m × ks`` distance table to
    every centroid (driver-side — queries are few by contract), then the
    corpus scan is TABLE LOOKUPS over the codes, never float math against
    the raw vectors: ``adist = sqrt(Σ_s dtable[s, code_s])``. Scale
    shape: one Arrow pass over the corpus (codes assigned in-pass here;
    a production table stores :func:`pq_encode` output and skips the
    raw vectors entirely), each batch emits only its local top-k per
    query, global top-k is a window over O(k × partitions) rows. Output
    ranks ascending by ``adist`` (smaller = nearer), ties to the lower
    id — DISTANCE semantics, unlike the cosine paths' descending score.

    ``rerank``: the standard production second stage — widen the ADC
    scan to a top-``rerank`` shortlist per query, then score ONLY those
    rows exactly (cosine against the raw vectors, fetched by id) and
    return the exact top-k. Quantization noise scrambles near-tie fine
    ordering (measured: recall@10 ≈ 0.5 on tightly clustered data
    without re-ranking, ≥ 0.9 with rerank ≈ 5k — test-pinned), so ADC
    selects candidates and the float math runs on O(rerank × queries)
    rows, never the corpus. Output columns become ``cos`` (descending)
    instead of ``adist``."""
    import numpy as np

    book_arr = np.array(codebooks, dtype=np.float64)
    m, ks, sd = book_arr.shape
    q_rows = queries.select(query_id_col, vec_col).collect()  # few by contract
    qids = np.array([r[query_id_col] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    # (nq, m, ks) squared subdistances
    dtables = np.stack([
        ((Q[:, s * sd:(s + 1) * sd][:, None, :] - book_arr[s][None, :, :]) ** 2).sum(axis=2)
        for s in range(m)
    ], axis=1)

    shortlist = k if rerank is None else max(int(rerank), k)
    out_schema = f"{query_id_col} long, {id_col} long, adist double"

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = _pq_assign(V, book_arr)
            ids = pdf[id_col].to_numpy()
            top = min(shortlist, len(ids))
            parts = []
            for j in range(dtables.shape[0]):
                # adist per corpus row: sum of table lookups, then sqrt
                ad = np.round(np.sqrt(
                    dtables[j][np.arange(m)[None, :], codes].sum(axis=1)
                ), 4)
                order = np.lexsort((ids, ad))[:top]  # asc dist, id tiebreak
                parts.append(pd.DataFrame({
                    query_id_col: qids[j],
                    id_col: ids[order],
                    "adist": ad[order],
                }))
            yield pd.concat(parts, ignore_index=True)

    scored = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adist"), F.asc(id_col))
    approx = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist)
    )
    if rerank is None:
        return approx.select(query_id_col, id_col, "adist", "rank")

    # exact second stage: fetch the shortlist's raw vectors by id (the
    # candidate set is O(rerank × queries) — broadcast it into the
    # corpus scan) and re-rank by true cosine
    qdf = F.broadcast(
        queries.select(query_id_col, F.col(vec_col).alias("__qv"))
    )
    cand = F.broadcast(approx.select(query_id_col, id_col))
    rescored = (
        corpus.join(cand, id_col)
        .join(qdf, query_id_col)
        .select(
            query_id_col, id_col,
            F.round(cosine(F.col(vec_col), F.col("__qv")), 4).alias("cos"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )
