"""As-of (temporal point-in-time) join — an operator Spark lacks natively.

Strategy (the scale path): tag both sides, UNION them on the time axis,
and run one window pass per key ordered by (time, side): each left row
picks up the most recent right row via ``last(col, ignorenulls=True)``.
ONE shuffle on the key, no range cross-product, no per-group Python —
this beats the naive inequality join (which Catalyst can only plan as a
broadcast-nested-loop or cartesian range explosion) and the
``merge_asof``-in-``applyInPandas`` fallback (which serializes every
group through Arrow).

DuckDB's native ``ASOF JOIN`` serves as the value oracle in
``rook_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Iterable[str],
    left_time: str,
    right_time: str,
    value_cols: Iterable[str],
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` within the same key (backward as-of,
    inclusive). Right rows must be unique per (key, time) — pre-aggregate
    otherwise. Left rows with no prior right row get nulls.
    """
    keys = list(key_cols)
    vals = list(value_cols)

    l_tag = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in vals],
        F.struct(*[c for c in left.columns]).alias("__l"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in vals],
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows (side=0) sort before left rows at equal time → inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        "__l",
        *[F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"__r_{v}") for v in vals],
    ).where(F.col("__side") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__r_{v}").alias(v) for v in vals]
    return filled.select(*out_cols)
