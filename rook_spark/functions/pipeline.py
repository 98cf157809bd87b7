"""End-to-end corpus curation — the funnel a production training-data
pipeline actually runs, composed from this package's individually
oracle-verified stages.

Every stage here exists (and is driver-hash-verified) as its own
operator; what this module adds is the SEQUENTIAL COMPOSITION with an
auditable verdict per document: which stage dropped it, or which split
kept it. That audit column is not a nicety — corpus builds are re-run
constantly, and "why did doc X disappear between v3 and v4 of the
corpus" is the question every data engineer asks first.

Stage order is load-bearing and matches the standard recipe
(RefinedWeb / Dolma / FineWeb pipelines):

1. quality gate first (cheapest per row, biggest kill rate — never pay
   shingling for a doc a length check kills),
2. exact dedup (hash groupBy — removes the free duplicates before the
   LSH pays per-shingle work for them),
3. near-dup removal (MinHash-LSH → connected components → one canonical
   per cluster),
4. benchmark decontamination (broadcast eval-shingle probe),
5. per-domain cap (salted two-phase top-k),
6. train/val/test split (pure hash projection).

Scale shape: stages 1-2 and 4-6 are scans, broadcast probes, or salted
top-ks; stage 3 is banded equi-joins + O(log diameter) rounds over the
candidate GRAPH. Survivor sets thread through as DataFrames (no
driver-side materialization); the verdict assembly is a chain of
left anti/semi joins on the id — each one a plain hash join Catalyst
plans with the corpus on the streaming side.

Reference scope: shyiko/rook is the ingest half (the CDC feed keeping
the documents table current — MySQLReplicationStream.java's pipeline);
this is the consumption half the task brief names first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["curation_funnel"]


def curation_funnel(
    docs: DataFrame,
    bench: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    quality_threshold: float = 0.36,
    quality: Column | None = None,
    domain_cap: int = 10,
    split_weights: dict[str, float] | None = None,
    split_seed: int = 1,
    n_hashes: int = 16,
    n_bands: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Run the full curation funnel; return ``(id, verdict)`` for EVERY
    input document (benchmark docs included), where verdict is the
    FIRST stage that dropped the doc or the split that kept it:

    ``benchmark`` | ``low_quality`` | ``exact_dup`` | ``near_dup`` |
    ``contaminated`` | ``domain_capped`` | ``kept_<split>``.

    ``bench`` is the eval/benchmark document set used for
    decontamination (pass None to skip that stage). ``quality``
    overrides the default :func:`rook_spark.functions.text
    .quality_score` gate expression. Canonical near-dup pick = max
    text length, ties to min id (the ``dedup_keep_canonical`` rule).

    Determinism: every stage is hash- or order-tie-broken — two runs
    (or a DuckDB CTE replay, see ``queries.doc_curation_funnel``)
    produce identical verdicts row-for-row.
    """
    from rook_spark.functions.dedup import (
        benchmark_contamination,
        dedup_keep_canonical,
    )
    from rook_spark.functions.sampling import group_cap, hash_split
    from rook_spark.functions.text import fingerprint, quality_score

    if split_weights is None:
        split_weights = {"train": 0.8, "val": 0.1, "test": 0.1}

    ids = lambda df: df.select(F.col(id_col).alias(id_col))  # noqa: E731

    # stage 1: quality gate (pure scan expression)
    qual = quality if quality is not None else quality_score(text_col)
    s1 = docs.where(qual >= F.lit(quality_threshold))

    # stage 2: exact dedup on the normalized-text fingerprint — keep
    # min id per group (one map-side-combining aggregate)
    keep_ids = (
        s1.select(F.col(id_col), fingerprint(text_col).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .drop("__fp")
    )
    s2 = s1.join(keep_ids, id_col, "semi")

    # stage 3: near-dup removal (LSH -> components -> canonical)
    canon = dedup_keep_canonical(
        s2, id_col=id_col, text_col=text_col,
        n_hashes=n_hashes, n_bands=n_bands,
        max_bucket_size=max_bucket_size,
    )
    s3 = s2.join(canon.where("keep").select(id_col), id_col, "semi")

    # stage 4: benchmark decontamination (broadcast eval shingles);
    # ANY overlapping shingle drops the doc — the conservative rule
    if bench is not None:
        hits = benchmark_contamination(
            s3, bench, id_col=id_col, text_col=text_col
        ).select(F.col("id").alias(id_col))
        s4 = s3.join(hits, id_col, "anti")
    else:
        s4 = s3

    # stage 5: per-domain cap (salted two-phase top-k; longest first)
    s5 = group_cap(
        s4, group_col=source_col, cap=domain_cap,
        order_by=[F.length(F.col(text_col)).desc()], id_col=id_col,
    ).drop("cap_rank")

    # stage 6: split assignment on survivors (pure hash projection)
    kept = hash_split(s5, split_weights, on=[id_col], seed=split_seed).select(
        F.col(id_col), F.concat(F.lit("kept_"), F.col("split")).alias("verdict")
    )

    # verdict assembly: first-drop-wins via coalesce over stage flags
    def flag(surv: DataFrame, name: str) -> DataFrame:
        return ids(surv).withColumn(f"__in_{name}", F.lit(True))

    out = (
        docs.select(F.col(id_col))
        .join(flag(s1, "s1"), id_col, "left")
        .join(flag(s2, "s2"), id_col, "left")
        .join(flag(s3, "s3"), id_col, "left")
        .join(flag(s4, "s4"), id_col, "left")
        .join(flag(s5, "s5"), id_col, "left")
        .join(kept, id_col, "left")
    )
    verdict = (
        F.when(F.col("__in_s1").isNull(), F.lit("low_quality"))
        .when(F.col("__in_s2").isNull(), F.lit("exact_dup"))
        .when(F.col("__in_s3").isNull(), F.lit("near_dup"))
        .when(F.col("__in_s4").isNull(), F.lit("contaminated"))
        .when(F.col("__in_s5").isNull(), F.lit("domain_capped"))
        .otherwise(F.col("verdict"))
    )
    funnel = out.select(F.col(id_col), verdict.alias("verdict"))
    if bench is None:
        return funnel
    bench_rows = ids(bench).select(
        F.col(id_col), F.lit("benchmark").alias("verdict")
    )
    return funnel.unionByName(bench_rows)
