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
full-corpus recompute. The hashing primitives are the shared ones from
:mod:`rook_spark.functions.dedup` (``minhash_signatures`` /
``_banded_keys``), so the index's buckets can never drift from the
corpus-side LSH family or its hot-bucket monitor.

Exactly-once: the sink is registered in the **"before"** phase
(event-fed — see ``CdcEngine.with_sink``) and declares the third
``run_id`` parameter, so its fence is scoped to the SAME checkpoint
lineage as the main table's: a crash between the index commit and the
main-table commit re-delivers the batch and the fence skips the
duplicate, while a restart from a FRESH checkpoint (batch ids restart
at 0, new run_id) falls through to the conditional-ordinal MERGE
instead of being silently dropped. (The "after" phase would be WRONG
here: main commit + crash before fan-out ⇒ the watermark filter drops
the rows on re-delivery and the index misses the batch forever.)

Invariant (test-pinned): after ANY replay — multi-epoch, duplicated
suffixes, kill/resume, fresh-checkpoint restart — the index equals a
full signature recompute over the final main-table state, nulls
included (a live document whose content yields no k-shingle carries an
all-null signature row, so long→short content updates cannot leave a
stale signature behind).

FAILURE CONTRACT — the one way the invariant can break in operation: a
sink exception (executor OOM, filesystem hiccup) is isolated by the
engine's dead-letter path while the MAIN table still commits and
advances its watermarks, so that epoch never reaches the index again
through the stream. This is inherent to any derived table fed from an
at-most-once-after-isolation fan-out; the repair is (1) monitor the
engine's dead-letter table, (2) call :meth:`rebuild` — an O(corpus)
recompute from the main table that also restores the stored LWW
ordinals, the same repair shape as ``Rollup.full_recompute``.

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
from rook_spark.functions.dedup import _banded_keys, minhash_signatures
from rook_spark.lake.table import LakeTable


class DedupIndex:
    """Derived signature table ``(key_cols..., sig_0..sig_{n-1})`` kept
    in lockstep with a CDC-replicated document table. See module
    docstring for the scale story, guarantees, and failure contract.

    Parameters mirror :func:`rook_spark.functions.dedup
    .minhash_signatures` (same affine min-wise family, same inlinable
    constants — a DuckDB oracle can recompute every signature). The
    index table is created lazily from the first batch (or
    :meth:`rebuild` source), taking the key columns' ACTUAL types from
    that frame — composite and non-string keys both work.
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

    def table(self, reference: DataFrame | None = None) -> LakeTable:
        """Load the index table, creating it on first use. ``reference``
        (any frame carrying the key columns — the sink passes the batch)
        supplies the key columns' types at creation; loading an existing
        table needs no reference."""
        if LakeTable.exists(self.path):
            return LakeTable.load(self.spark, self.path)
        if reference is None:
            raise FileNotFoundError(
                f"no dedup index at {self.path} yet — it is created by the "
                "first applied batch (or rebuild()); pass a reference frame "
                "to create it explicitly"
            )
        by_name = {f.name: f.dataType for f in reference.schema.fields}
        schema = T.StructType(
            [T.StructField(c, by_name[c]) for c in self.key_cols]
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

    def compute_signatures(self, docs: DataFrame) -> DataFrame:
        """``(key_cols..., sig_*)`` for EVERY row of ``docs`` — including
        an all-null row when the text yields no k-shingle (shorter than
        k tokens), which is what lets the incremental index agree with a
        full recompute after long→short updates. Linear: one shingle
        explode + one grouped min-agg (the shared
        ``minhash_signatures``) + one key-equi left join."""
        sigs = minhash_signatures(
            docs, self.key_cols, self.text_col, self.k, self.n_hashes
        )
        return docs.select(*self.key_cols).join(sigs, self.key_cols, "left")

    # ----------------------------------------------------------------- sink

    def sink(self):
        """The engine listener: register with
        ``engine.with_sink("dedup_index", idx.sink(), when="before")``.
        Receives the normalized, watermark-filtered batch (the SAME
        event set the main MERGE applies) plus the checkpoint-scoped
        run_id, LWW-reduces it per key, and MERGEs fresh signatures /
        tombstones into the index table in one atomic, fenced commit."""

        def fn(flat: DataFrame, batch_id: int, run_id: str = "") -> None:
            reduced = lww_reduce(flat, key_cols=self.key_cols)
            # the reduce feeds two plan branches (the shingle explode and
            # the keyed left-join base) — materialize it once instead of
            # re-running the aggregate per branch
            reduced.persist()
            try:
                # ONE left join: per-key row (op + ordinals) picks up its
                # signature, null sigs for shingleless docs — same frame
                # compute_signatures builds, without a second keyed join
                sigs = minhash_signatures(
                    reduced, self.key_cols, self.text_col, self.k, self.n_hashes
                )
                with_sigs = reduced.select(
                    *self.key_cols, "op",
                    F.col("commit_ordinal").alias("__ordinal"),
                    F.col("offset").alias("__offset"),
                ).join(sigs, self.key_cols, "left")
                # cardinality is guaranteed by the LWW reduce above; skip
                # the validation aggregate on the per-epoch hot path
                self.table(reference=reduced).merge(
                    with_sigs, batch_id, op_col="op",
                    validate_cardinality=False, run_id=run_id,
                )
            finally:
                reduced.unpersist()

        return fn

    # --------------------------------------------------------------- repair

    def rebuild(self, main_table: LakeTable, batch_id: int | None = None) -> int:
        """O(corpus) repair/bootstrap: recompute every signature from the
        main table's CURRENT state and overwrite the index in one atomic
        commit — the recovery path after a dead-lettered sink epoch (see
        FAILURE CONTRACT in the module docstring) or for indexing a
        pre-existing table. The stored LWW ordinals are carried over
        from the main table so post-rebuild incremental maintenance
        keeps refusing stale re-deliveries; a table that never stored
        ordinals (bulk-loaded without the conditional-MERGE path) gets
        ``-1`` — any future change wins, the right baseline for a fresh
        bootstrap. The corpus read is persisted across the plan's two
        branches (the per-epoch sink persists its batch for the same
        reason — this path is the O(corpus) version of it). Returns the
        number of indexed documents."""
        docs = main_table.read(include_internal=True, ref="head")
        for c in ("__ordinal", "__offset"):
            if c not in docs.columns:
                docs = docs.withColumn(c, F.lit(-1).cast("long"))
        docs.persist()
        try:
            sigs = minhash_signatures(
                docs, self.key_cols, self.text_col, self.k, self.n_hashes
            )
            with_sigs = docs.select(
                *self.key_cols, "__ordinal", "__offset"
            ).join(sigs, self.key_cols, "left")
            t = self.table(reference=docs)
            t.overwrite(with_sigs, batch_id=batch_id)
            return docs.count()  # cached — no re-scan of corpus or index
        finally:
            docs.unpersist()

    # ----------------------------------------------------- candidate pairs

    def candidates(self, batch_sigs: DataFrame, n_bands: int = 4) -> DataFrame:
        """Banded-LSH near-dup candidates between a BATCH's signatures
        and the whole index — the incremental dedup probe: at 10^10 docs
        the corpus side never recomputes or self-joins; the batch side
        (tiny) explodes into band keys and equi-joins the index's band
        keys. Returns distinct cross pairs
        ``(key_a..., key_b...)`` (a = index side, b = batch side,
        self-matches removed). All-null signature rows (no-shingle docs)
        never collide (they are dropped before banding). Band derivation
        is the shared :func:`rook_spark.functions.dedup._banded_keys`."""
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

    def _banded(self, sigs: DataFrame, side: str, n_bands: int) -> DataFrame:
        banded = _banded_keys(
            sigs.where(F.col(self.sig_cols[0]).isNotNull()),
            self.n_hashes, n_bands, id_cols=self.key_cols,
        )
        return banded.select(
            *[F.col(c).alias(f"{side}_{c}") for c in self.key_cols],
            "band", "key",
        )
