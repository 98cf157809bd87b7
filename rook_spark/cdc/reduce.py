"""W1 — last-writer-wins reduce per key (SURVEY.md §2.5).

The reference converges per key by re-reading the database's final state
for every changed key (``DefaultRowsMutationIndexer.java:75-81``). A
log-replay engine must instead pick the max-(commit_ordinal, offset)
event per key within each batch *before* MERGE (MERGE forbids multiple
source rows per target key — Iceberg/Delta raise on it, our LakeTable
would silently produce duplicates).

Two implementations:

- :func:`lww_reduce` — single hash aggregation with ``max_by`` over a
  struct ordering key. Catalyst plans this as partial (map-side combine)
  + final hash aggregate, so a hot key is pre-collapsed on every input
  partition before the shuffle — each mapper emits at most one row per
  key, which already bounds shuffle skew.
- :func:`salted_lww_reduce` — the north_rule's explicit salted
  sub-partitioning + merge-back: stage 1 reduces within (key, salt)
  sub-partitions, stage 2 reduces across salts. Structurally guarantees
  no single reducer ever owns a whole hot key even under aggregation
  strategies without partial combine (e.g. if the payload were a
  non-combinable UDAF). Results are identical; tests assert equality.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordering(ordinal_col: str, offset_col: str):
    return F.struct(F.col(ordinal_col), F.col(offset_col))


def lww_reduce(
    df: DataFrame,
    key_cols: Iterable[str] = ("repo", "path"),
    ordinal_col: str = "commit_ordinal",
    offset_col: str = "offset",
) -> DataFrame:
    """One surviving row per key: the max (commit_ordinal, offset) event.

    ``max_by(struct(<all cols>), struct(ordinal, offset))`` — struct
    comparison is lexicographic, so ordinal wins and offset tie-breaks
    (duplicate replays are byte-identical, making ties harmless).
    """
    keys = list(key_cols)
    payload = [c for c in df.columns if c not in keys]
    winner = F.max_by(F.struct(*payload), _ordering(ordinal_col, offset_col)).alias("w")
    return (
        df.groupBy(*keys)
        .agg(winner)
        .select(*keys, *[F.col(f"w.{c}").alias(c) for c in payload])
    )


def salted_lww_reduce(
    df: DataFrame,
    key_cols: Iterable[str] = ("repo", "path"),
    ordinal_col: str = "commit_ordinal",
    offset_col: str = "offset",
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage LWW: reduce within (key, salt), then across salts.

    Salt = ``pmod(xxhash64(offset), n_salts)`` — uniform over a hot
    key's events, so stage 1 splits the hot key across ``n_salts``
    reducers; stage 2 sees at most ``n_salts`` rows per key (merge-back
    reduce). Stage 2's input is tiny regardless of skew.
    """
    keys = list(key_cols)
    payload = [c for c in df.columns if c not in keys]
    ordering = _ordering(ordinal_col, offset_col)
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(offset_col)), F.lit(n_salts)))
    stage1 = (
        salted.groupBy(*keys, "__salt")
        .agg(F.max_by(F.struct(*payload), ordering).alias("w"))
        .select(*keys, *[F.col(f"w.{c}").alias(c) for c in payload])
    )
    return lww_reduce(stage1, keys, ordinal_col, offset_col)
