"""CDC-maintained incremental MinHash dedup index.

The scale problem this solves: at 10^10 documents, a dedup sweep that
recomputes MinHash signatures over the whole corpus is an O(corpus)
shuffle per run — but the CDC stream already names exactly which
documents changed. :class:`DedupIndex` is an engine sink (K1 listener
fan-out, ``MySQLReplicationStream.java:161-179``) that maintains a
derived lake table of signatures *incrementally*: each epoch computes
signatures for ONLY the batch's fresh rows (linear in batch size, one
shingle explode + one grouped min-agg — partial-combinable) and MERGEs
them into the index under the same conditional-ordinal LWW discipline
as the main table; deletes drop their key. Near-dup candidates for the
epoch then come from a banded-LSH equi-join of the BATCH's signatures
against the index (``O(batch × collisions)``), never an all-pairs or
full-corpus recompute.

Exactly-once: the sink is registered in the **"before"** phase
(event-fed — see ``CdcEngine.with_sink``), so a crash between the index
commit and the main-table commit re-delivers the batch on restart; the
index's own batch-id fence skips the duplicate, and the conditional
ordinal makes any overlap idempotent. (The "after" phase would be
WRONG here: main commit + crash before fan-out ⇒ the watermark filter
drops the rows on re-delivery and the index misses the batch forever.)

Invariant (test-pinned): after ANY replay — multi-epoch, duplicated
suffixes, kill/resume — the index equals a full signature recompute
over the final main-table state, nulls included (a live document whose
content yields no k-shingle carries an all-null signature row, so
long→short content updates cannot leave a stale signature behind).

Scope: assumes no KEEP/SKIP/REMOVE policy on the engine (the index
tracks the raw change feed; a policy makes the main table diverge from
the feed by design — wire policy-filtered feeds through their own
index if needed).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.reduce import lww_reduce
from rook_spark.functions.dedup import MINHASH_PRIME, minhash_params, shingles
from rook_spark.lake.table import LakeTable


class DedupIndex:
    """Derived signature table ``(key_cols..., sig_0..sig_{n-1})`` kept
    in lockstep with a CDC-replicated document table. See module
    docstring for the scale story and guarantees.

    Parameters mirror :func:`rook_spark.functions.dedup
    .minhash_signatures` (same affine min-wise family, same inlinable
    constants — a DuckDB oracle can recompute every signature).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Iterable[str] = ("repo", "path"),
        text_col: str = "content",
        k: int = 3,
        n_hashes: int = 8,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.text_col = text_col
        self.k = k
        self.n_hashes = n_hashes
        self.n_buckets = n_buckets
        self.sig_cols = [f"sig_{i}" for i in range(n_hashes)]

    # ---------------------------------------------------------------- table

    def table(self) -> LakeTable:
        if LakeTable.exists(self.path):
            return LakeTable.load(self.spark, self.path)
        schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in self.key_cols]
            + [T.StructField(c, T.LongType()) for c in self.sig_cols]
        )
        return LakeTable.create(
            self.spark, self.path, schema,
            key_cols=self.key_cols, n_buckets=self.n_buckets,
        )

    def signatures(self) -> DataFrame:
        """Current committed index state."""
        return self.table().read()

    # ----------------------------------------------------------- signatures

    def _sig_aggs(self):
        return [
            F.min(
                (F.lit(a) * F.col("__x") + F.lit(b)) % F.lit(MINHASH_PRIME)
            ).alias(f"sig_{i}")
            for i, (a, b) in enumerate(minhash_params(self.n_hashes))
        ]

    def compute_signatures(self, docs: DataFrame) -> DataFrame:
        """``(key_cols..., sig_*)`` for EVERY row of ``docs`` — including
        an all-null row when the text yields no k-shingle (shorter than
        k tokens), which is what lets the incremental index agree with a
        full recompute after long→short updates. Linear: one shingle
        explode + one grouped min-agg + one key-equi left join."""
        sh = shingles(docs, self.key_cols, self.text_col, self.k).withColumn(
            "__x",
            F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long"),
        )
        sigs = sh.groupBy(*self.key_cols).agg(*self._sig_aggs())
        return docs.select(*self.key_cols).join(sigs, self.key_cols, "left")

    # ----------------------------------------------------------------- sink

    def sink(self):
        """The engine listener: register with
        ``engine.with_sink("dedup_index", idx.sink(), when="before")``.
        Receives the normalized, watermark-filtered batch (the SAME
        event set the main MERGE applies), LWW-reduces it per key, and
        MERGEs fresh signatures / tombstones into the index table in one
        atomic, fenced commit."""

        def fn(flat: DataFrame, batch_id: int) -> None:
            reduced = lww_reduce(flat, key_cols=self.key_cols)
            with_sigs = self.compute_signatures(reduced).join(
                reduced.select(
                    *self.key_cols, "op",
                    F.col("commit_ordinal").alias("__ordinal"),
                    F.col("offset").alias("__offset"),
                ),
                self.key_cols,
            )
            # cardinality is guaranteed by the LWW reduce above; skip the
            # validation aggregate on the per-epoch hot path
            self.table().merge(
                with_sigs, batch_id, op_col="op", validate_cardinality=False
            )

        return fn

    # ----------------------------------------------------- candidate pairs

    def candidates(self, batch_sigs: DataFrame, n_bands: int = 4) -> DataFrame:
        """Banded-LSH near-dup candidates between a BATCH's signatures
        and the whole index — the incremental dedup probe: at 10^10 docs
        the corpus side never recomputes or self-joins; the batch side
        (tiny) explodes into band keys and equi-joins the index's band
        keys. Returns distinct cross pairs
        ``(key_a..., key_b...)`` (a = index side, b = batch side,
        self-matches removed). All-null signature rows (no-shingle docs)
        never collide (null band keys are dropped)."""
        assert self.n_hashes % n_bands == 0
        a = self._banded(self.signatures(), "a", n_bands)
        b = self._banded(batch_sigs, "b", n_bands)
        same_key = None
        for c in self.key_cols:
            eq = F.col(f"a_{c}") == F.col(f"b_{c}")
            same_key = eq if same_key is None else (same_key & eq)
        return (
            a.join(b, ["band", "key"])
            .where(~same_key)
            .select(
                *[F.col(f"a_{c}").alias(f"{c}_a") for c in self.key_cols],
                *[F.col(f"b_{c}").alias(f"{c}_b") for c in self.key_cols],
            )
            .distinct()
        )

    def _banded(self, sigs: DataFrame, side: str, n_bands: int = 4) -> DataFrame:
        rows = self.n_hashes // n_bands
        bands = F.array(
            *[
                F.struct(
                    F.lit(bd).alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"sig_{bd * rows + r}").cast("string")
                                for r in range(rows)
                            ],
                        )
                    ).alias("key"),
                )
                for bd in range(n_bands)
            ]
        )
        return (
            sigs.where(F.col(self.sig_cols[0]).isNotNull())
            .select(
                *[F.col(c).alias(f"{side}_{c}") for c in self.key_cols],
                F.explode(bands).alias("bk"),
            )
            .select(
                *[f"{side}_{c}" for c in self.key_cols],
                F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key"),
            )
        )
