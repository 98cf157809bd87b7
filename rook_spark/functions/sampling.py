"""Deterministic sampling and dataset-mixing operators for
training-data pipelines.

A 100 TB corpus is never trained on raw: it is split (train/val/test),
stratified (per-language / per-source quality floors), and mixed
(per-source weights, optionally temperature-flattened — the standard
multilingual-LM recipe). All three must be

- **deterministic**: re-running the pipeline reproduces the same split
  byte-for-byte (no ``rand()`` — a retry-rescheduled task would sample
  differently per attempt);
- **key-stable**: a document's split assignment depends only on its
  key, never on partitioning, row order, or cluster size — so an
  incremental re-run assigns new docs without reshuffling old ones
  (val-set contamination by re-splitting is a real training bug);
- **scan-shaped**: one narrow projection + filter per row, no shuffle,
  no driver-side sampling state. At 10^10 docs these ops must ride the
  scan.

The shared primitive is a cross-system uniform: ``u48`` hashes the key
through md5 and keeps 48 bits, an expression DuckDB reproduces
bit-identically (``CAST('0x' || substr(md5(s),1,12) AS BIGINT)``) — so
every operator here is hash-verifiable against an independent SQL
oracle, selection decisions included. Mixture thresholds use EXACT
integer arithmetic (no float boundary can flip a row between systems).

Reference scope: shyiko/rook is the ingest half of this pipeline (the
CDC feed that keeps the corpus table current); these operators are the
consumption half the task brief names as first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "uniform_hash",
    "hash_split",
    "stratified_sample",
    "weighted_mixture",
    "mixture_plan",
    "pack_sequences",
    "group_cap",
]

_U_BITS = 48  # md5 prefix bits for the uniform grid
_MIX_BITS = 24  # mixture threshold grid (int64-overflow-safe: see below)


def uniform_hash(cols: list[str | Column], seed: int = 0, bits: int = _U_BITS) -> Column:
    """Deterministic ``bits``-bit integer uniform on the key columns.

    ``conv(substr(md5(seed|key), 1, bits/4), 16, 10)`` — bit-identical
    in DuckDB as ``CAST('0x' || substr(md5(...), 1, n) AS BIGINT)``
    (parity pinned in tests). Key columns must be non-null (nulls make
    concat_ws skip fields, aliasing distinct keys); seed changes give
    independent draws. 48 bits ≈ 2.8e14 grid points: collision-free
    thresholds down to ~1e-14 fractions.
    """
    key = F.concat_ws("|", F.lit(str(seed)), *[F.col(c) if isinstance(c, str) else c for c in cols])
    return F.conv(F.substring(F.md5(key), 1, bits // 4), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    on: list[str],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to one named split by hashed key — the
    train/val/test split as a pure projection.

    ``weights`` are relative (normalized internally); assignment is the
    half-open interval of the cumulative distribution the row's 48-bit
    uniform falls in. Key-stable: adding documents later never moves an
    existing document between splits (the property that keeps a held-out
    set held out across corpus refreshes).
    """
    if not weights:
        raise ValueError("weights must be a non-empty {split_name: weight} dict")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = uniform_hash(on, seed=seed)
    grid = 1 << _U_BITS
    cum = 0.0
    expr = None
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        # integer threshold: floor once, compare on the exact grid
        thr = int(cum * grid)
        cond = u < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float] | float,
    strata_col: str | None = None,
    on: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample (`sampleBy` without
    the nondeterminism): keep a row iff its hashed uniform clears the
    stratum's threshold. ``fractions`` is either one float or a
    ``{stratum_value: fraction}`` dict over ``strata_col`` (strata
    absent from the dict drop entirely — an allowlist, which is what a
    per-language quality floor wants). Selection is a filter on the
    scan: no shuffle, no state.
    """
    if on is None:
        raise ValueError("pass on=[key cols] — the hash needs a stable row key")
    u = uniform_hash(on, seed=seed)
    grid = 1 << _U_BITS
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        expr = F.lit(False)
        for value, frac in fractions.items():
            expr = expr | ((F.col(strata_col) == F.lit(value)) & (u < F.lit(int(frac * grid))))
        return df.where(expr)
    return df.where(u < F.lit(int(float(fractions) * grid)))


def mixture_plan(
    counts: dict[str, int],
    weights: dict[str, float],
    temperature: float = 1.0,
) -> dict[str, dict[str, int]]:
    """Per-source integer sampling thresholds for a target mixture.

    Standard LM data recipe: target composition p_i ∝ w_i^(1/T)
    (T=1 → proportional; T→∞ → uniform across sources — the
    multilingual flattening knob). The largest achievable corpus without
    oversampling any source is ``scale = min_i floor(n_i / p_i)``; the
    keep-rate for source i is then ``p_i * scale / n_i``.

    All thresholds are INTEGER math on a 2^24 grid so an independent SQL
    replay makes bit-identical keep decisions. With T=1 and integer
    weights the whole derivation is exact integer arithmetic end to end
    (``w_i * scale * 2^24 // (W * n_i)`` — magnitudes bounded so the
    int64 products cannot overflow for weights ≤ 10^4 and corpora ≤
    10^10 rows per source); other temperatures go through one float
    ``pow`` per SOURCE (not per row), so cross-system determinism holds
    whenever the handful of per-source thresholds round identically —
    the driver-oracled path pins T=1.
    """
    if set(counts) != set(weights):
        raise ValueError("counts and weights must cover the same sources")
    if any(n < 0 for n in counts.values()):
        raise ValueError("negative source count")
    grid = 1 << _MIX_BITS
    if temperature == 1.0:
        w = {s: int(weights[s]) for s in weights}
        if any(w[s] != weights[s] or w[s] <= 0 for s in w):
            raise ValueError("T=1 exact path needs positive integer weights")
        W = sum(w.values())
        # scale = min_i floor(n_i * W / w_i): max output size with
        # composition p_i = w_i/W and no source oversampled
        scale = min((counts[s] * W) // w[s] for s in w)
        return {
            s: {
                "threshold": min(grid, (w[s] * scale * grid) // (W * counts[s]))
                if counts[s] else 0,
                "expect_rows": (w[s] * scale) // W,
            }
            for s in w
        }
    p = {s: float(weights[s]) ** (1.0 / temperature) for s in weights}
    P = sum(p.values())
    p = {s: v / P for s, v in p.items()}
    scale = min(int(counts[s] / p[s]) if p[s] else 0 for s in p)
    return {
        s: {
            "threshold": min(grid, int(p[s] * scale / counts[s] * grid)) if counts[s] else 0,
            "expect_rows": int(p[s] * scale),
        }
        for s in p
    }


def weighted_mixture(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    on: list[str],
    seed: int = 0,
    temperature: float = 1.0,
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Sample a multi-source corpus down to a target mixture — the
    dataset-mixing step of an LM training pipeline, as one filter.

    ``df`` carries all sources distinguished by ``source_col`` (sources
    not named in ``weights`` drop). Source sizes are taken from
    ``counts`` or computed with one aggregate (the only action; at
    10^10 rows it is a map-side-combined count, and a production
    pipeline passes the catalog's row counts instead). Each row's keep
    decision is ``u24(key) < threshold(source)`` — thresholds from
    :func:`mixture_plan`, applied as a broadcast-sized CASE expression:
    the corpus itself never shuffles and never leaves the scan.
    """
    if counts is None:
        rows = (
            df.where(F.col(source_col).isin(*weights))
            .groupBy(source_col).count().collect()
        )
        counts = {r[source_col]: r["count"] for r in rows}
        for s in weights:
            counts.setdefault(s, 0)
    plan = mixture_plan(counts, weights, temperature=temperature)
    u = uniform_hash(on, seed=seed, bits=_MIX_BITS)
    expr = F.lit(False)
    for s, row in plan.items():
        expr = expr | ((F.col(source_col) == F.lit(s)) & (u < F.lit(row["threshold"])))
    return df.where(expr)


def pack_sequences(
    df: DataFrame,
    weight_col: str,
    capacity: int,
    order_cols: list[str],
    shard_col: str,
    seq_col: str = "seq_id",
):
    """Greedy first-fit-in-order sequence packing — the LM batch-prep
    step that concatenates documents into fixed-token-capacity training
    sequences (the "packing" in every LLM data pipeline; Spark has no
    built-in because bin assignment is a running reset, not a cumsum).

    Rule (deterministic, oracle-replayable as a recursive CTE): within
    each ``shard_col`` group, walk rows ordered by ``order_cols``; a row
    joins the current sequence iff its weight still fits, else it opens
    the next one. Oversize rows (> capacity) get a sequence of their
    own — the caller's chunker should have split them first.

    Scale shape: one ``applyInPandas`` group per shard. The shard column
    IS the parallelism knob — at 10^10 docs, shard by a key hash so each
    group holds ~10^5-10^6 rows; packing is then embarrassingly parallel
    and each task is one Arrow batch + a tight numpy-backed loop (the
    running reset is inherently sequential WITHIN a shard; sharding is
    what makes that affordable). Output = input columns + ``seq_col``
    (sequence ordinal within the shard).
    """
    import pandas as pd  # noqa: F401 — applyInPandas contract

    if capacity <= 0:
        raise ValueError("capacity must be positive")
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(seq_col, T.LongType())]
    )

    order = list(order_cols)

    def pack(pdf):
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        w = pdf[weight_col].to_numpy()
        bins = [0] * len(w)
        cur, fill = 0, 0
        for i, tokens in enumerate(w):
            if fill and fill + tokens > capacity:
                cur += 1
                fill = 0
            bins[i] = cur
            fill += int(tokens)
        pdf[seq_col] = bins
        return pdf

    return df.groupBy(shard_col).applyInPandas(pack, schema=out_schema)


def group_cap(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 10,
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    n_salts: int = 16,
    rank_col: str = "cap_rank",
) -> DataFrame:
    """Domain throttling: keep the top ``cap`` rows per ``group_col``
    under a deterministic priority order (ties always broken by
    ``id_col`` ascending, so the kept set is unique), emitting the
    surviving rows plus their 1-based ``rank_col``.

    This is the per-domain cap every web-corpus recipe applies (C4,
    RefinedWeb, Dolma all bound docs-per-registered-domain) so one
    crawler-friendly CDN cannot dominate the training mixture.

    Scale shape — the naive plan (one ``row_number`` window partitioned
    by domain) puts EVERY row of the hottest domain in one task; at
    100 TB a mega-domain with 10^9 docs is a guaranteed straggler/OOM.
    Instead: two-phase salted top-k. Phase 1 windows over
    ``(group, salt)`` where salt = hash(id) % n_salts — per-task state
    is bounded by the salt split — and keeps each salt's local top
    ``cap``. Phase 2 re-windows over ``group`` alone, but its input is
    already ≤ ``cap × n_salts`` rows per group, so the hot-domain sort
    is O(cap·n_salts log ·), not O(group). Correctness: the global
    top-``cap`` of a group is contained in the union of its per-salt
    top-``cap``s (removing non-top rows from other salts cannot promote
    anything), so phase 2 sees every global winner. Both phases ride
    ordinary hash shuffles; no collect, no join-back — full rows thread
    through.
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    if n_salts <= 0:
        raise ValueError("n_salts must be positive")
    order = list(order_by) if order_by else []
    order.append(F.col(id_col).asc())

    from pyspark.sql.window import Window

    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w1 = Window.partitionBy(F.col(group_col), salt).orderBy(*order)
    local = (
        df.withColumn("__local_rank", F.row_number().over(w1))
        .where(F.col("__local_rank") <= cap)
        .drop("__local_rank")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        local.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= cap)
    )
