"""CDC-maintained incremental corpus curation — the streaming
counterpart of :func:`rook_spark.functions.pipeline.curation_funnel`.

The scale problem: at 10^10 documents, re-running the batch funnel on
every corpus refresh is an O(corpus) sweep (LSH + connected components
over everything) when the CDC stream already names exactly which
documents changed. :class:`CurationSink` is an engine listener (K1
fan-out, registered ``when="before"`` like :class:`~rook_spark.cdc
.dedup_index.DedupIndex`) that assigns each NEW document its funnel
verdict at arrival, against incrementally-maintained per-stage state:

- **quality gate** — per-row expression on the batch (stateless);
- **exact dedup** — the batch's normalized-text fingerprints probe a
  fingerprint-keyed lake table, reading ONLY the buckets the batch's
  fingerprints hash to (bucket-pruned point probe, O(batch));
- **near-dup** — the batch's MinHash signatures probe the shared
  :class:`DedupIndex` machinery (banded equi-join, O(batch ×
  collisions), never a corpus self-join);
- **decontamination** — broadcast probe of the static benchmark
  shingle set;
- **domain cap** — a tiny per-domain admission-count table; the batch
  ranks its own admissions in arrival order on top of the stored
  counts;
- **split** — pure key hash (content-independent, so a document's
  split can never move — the val-set stability property).

STREAMING SEMANTICS — deliberately different from the batch funnel,
and documented because the difference IS the contract:

- **First-arrival-wins.** The batch funnel keeps the LONGEST doc of a
  near-dup cluster and the MIN-ID doc of an exact group, because it
  sees them all at once. A stream cannot: the first admitted document
  becomes the canonical; later near/exact duplicates are dropped
  against it. (This is the standard incremental-dedup rule — Bloom/
  LSH-gated ingest in every production corpus pipeline.)
- **Verdicts are FROZEN at first arrival.** A later update to a
  dropped document never resurrects it, and admission decisions are
  never revisited — re-evaluation is what batch rebuilds are for.
  Exception: an UPDATE to an ADMITTED document refreshes its
  fingerprint and signature rows (future duplicates are judged against
  its CURRENT content), but its verdict (and split) stay.
- **Within-epoch near-dup is predecessor-based, not transitive-
  closure**: a batch row is dropped if its bands collide with any
  indexed canonical OR any EARLIER batch row that reached the near-dup
  stage — conservative (a doc colliding only with an already-dropped
  doc is still dropped); the batch funnel's connected-components pick
  is the batch-mode counterpart. One equi-join either way.
- **Deletes free their state**: an admitted document's delete removes
  its verdict, fingerprint, signature, and domain-count slot, so
  byte-identical content can be re-admitted later. A dropped
  document's delete just clears its verdict row.
- **Index membership mirrors the funnel's stage inputs**: the
  fingerprint table holds exact-stage survivors, the signature index
  holds near-dup-stage survivors (a later-contaminated canonical still
  anchors its cluster, exactly as in the batch composition), the
  domain counts hold only final admissions.

Exactly-once: registered in the "before" phase with the checkpoint-
scoped ``run_id`` (see the ``DedupIndex`` module docstring for why
"after" would silently lose epochs); every maintained table is a
fenced ``LakeTable``, so a crash-window re-delivery re-runs the batch
against already-committed state — and because verdicts are frozen and
every MERGE is LWW-conditional, the re-run is a no-op, not a
double-count.

FAILURE CONTRACT: same as ``DedupIndex`` — a dead-lettered sink epoch
never reaches the verdict table through the stream; the repair is
re-replay (rollback + replay, the engine's established recovery
shape). The four table commits within one epoch are sequential unless
the tables share a :class:`~rook_spark.lake.catalog.LakeCatalog` (pass
``store=``/catalog-backed tables for the atomic multi-table epoch).

Reference scope: shyiko/rook feeds the documents table
(``MySQLReplicationStream.java:161-179`` single-threaded dispatch is
what makes "arrival order" well-defined); the verdict assignment is
the consumption half the task brief names first-class.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.dedup_index import DedupIndex
from rook_spark.cdc.reduce import lww_reduce
from rook_spark.lake.table import LakeTable, bucket_expr

__all__ = ["CurationSink"]

_ARRIVAL = ("__ordinal", "__offset")


class CurationSink:
    """Incremental verdict assignment over a CDC document feed. See the
    module docstring for semantics; see :meth:`sink` for registration.

    ``bench`` (optional) is the static benchmark/eval document set for
    decontamination — its distinct shingles are computed once and
    reused every epoch (broadcast-sized by assumption, like the batch
    operator).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: Iterable[str] = ("repo", "path"),
        text_col: str = "content",
        domain_col: str = "repo",
        bench: DataFrame | None = None,
        quality: Column | None = None,
        quality_threshold: float = 0.36,
        domain_cap: int = 10,
        split_weights: dict[str, float] | None = None,
        split_seed: int = 1,
        k: int = 3,
        n_hashes: int = 8,
        n_bands: int = 4,
        n_buckets: int = 16,
    ):
        from rook_spark.functions.text import quality_score

        self.spark = spark
        self.root = root.rstrip("/")
        self.key_cols = list(key_cols)
        self.text_col = text_col
        self.domain_col = domain_col
        self.quality = (
            quality if quality is not None else quality_score(text_col)
        )
        self.quality_threshold = quality_threshold
        self.domain_cap = domain_cap
        self.split_weights = split_weights or {"train": 0.8, "val": 0.1, "test": 0.1}
        self.split_seed = split_seed
        self.k = k
        self.n_bands = n_bands
        self.n_buckets = n_buckets
        self.index = DedupIndex(
            spark, f"{self.root}/sigs", key_cols=self.key_cols,
            text_col=text_col, k=k, n_hashes=n_hashes, n_buckets=n_buckets,
        )
        self._bench_shingles: DataFrame | None = None
        if bench is not None:
            from rook_spark.functions.dedup import shingles

            self._bench_shingles = (
                shingles(bench, id_col=self.key_cols, text_col=text_col, k=k)
                .select("shingle").distinct()
            )

    # --------------------------------------------------------------- tables

    def verdicts(self) -> DataFrame:
        """Current committed verdict table: key cols + ``verdict``."""
        return self._verdict_table().read().select(*self.key_cols, "verdict")

    def _verdict_table(self, reference: DataFrame | None = None) -> LakeTable:
        return self._table(
            f"{self.root}/verdicts", self.key_cols, reference,
            extra=[T.StructField("verdict", T.StringType()),
                   T.StructField("fp", T.StringType())],
        )

    def _fp_table(self, reference: DataFrame | None = None) -> LakeTable:
        # keyed AND bucketed by fingerprint: the per-epoch probe reads
        # only the buckets the batch's fingerprints hash to
        return self._table(
            f"{self.root}/fingerprints", ["fp"], reference,
            extra=[T.StructField(c, T.StringType()) for c in self.key_cols],
            fp_keyed=True,
        )

    def _counts_table(self) -> LakeTable:
        path = f"{self.root}/domain_counts"
        if LakeTable.exists(path):
            return LakeTable.load(self.spark, path)
        schema = T.StructType([
            T.StructField(self.domain_col, T.StringType()),
            T.StructField("n_admitted", T.LongType()),
        ])
        return LakeTable.create(
            self.spark, path, schema, key_cols=[self.domain_col], n_buckets=4,
        )

    def _table(self, path, keys, reference, extra, fp_keyed=False) -> LakeTable:
        if LakeTable.exists(path):
            return LakeTable.load(self.spark, path)
        if reference is None:
            raise FileNotFoundError(
                f"no table at {path} yet — created by the first applied batch"
            )
        by_name = {f.name: f.dataType for f in reference.schema.fields}
        fields = [
            T.StructField(c, by_name.get(c, T.StringType()))
            for c in (keys if not fp_keyed else ["fp"])
        ]
        fields += [f for f in extra if f.name not in {x.name for x in fields}]
        return LakeTable.create(
            self.spark, path, T.StructType(fields),
            key_cols=(keys if not fp_keyed else ["fp"]),
            n_buckets=self.n_buckets,
        )

    # ----------------------------------------------------------------- sink

    def sink(self):
        """Register with ``engine.with_sink("curation", cs.sink(),
        when="before")`` — the callable declares ``run_id`` so its
        fences share the main table's checkpoint lineage."""

        def fn(flat: DataFrame, batch_id: int, run_id: str = "") -> None:
            self._apply(flat, batch_id, run_id)

        return fn

    # ------------------------------------------------------------ the epoch

    def _apply(self, flat: DataFrame, batch_id: int, run_id: str) -> None:
        from rook_spark.functions.dedup import shingles
        from rook_spark.functions.sampling import uniform_hash
        from rook_spark.functions.text import fingerprint

        keys = self.key_cols
        reduced = lww_reduce(flat, key_cols=keys).select(
            *keys, self.text_col, F.col(self.domain_col).alias("__dom"),
            "op",
            F.col("commit_ordinal").alias("__ordinal"),
            F.col("offset").alias("__offset"),
        )
        reduced.persist()
        try:
            deletes = reduced.where(F.col("op") == "D")
            ups = reduced.where(F.col("op") != "D")

            vt_exists = LakeTable.exists(f"{self.root}/verdicts")
            if vt_exists:
                known = self._verdict_table().read().select(
                    *keys, F.col("verdict").alias("__known"),
                    F.col("fp").alias("__known_fp"),
                )
                ups = ups.join(known, keys, "left")
            else:
                ups = ups.withColumn("__known", F.lit(None).cast("string")) \
                         .withColumn("__known_fp", F.lit(None).cast("string"))

            fresh = ups.where(F.col("__known").isNull())
            # verdicts are frozen: an update to a KNOWN doc re-lands its
            # stored verdict (content refresh handled below for admits)
            frozen = ups.where(F.col("__known").isNotNull())

            # ---- stage 1: quality (stateless scan expression)
            fresh = fresh.withColumn("fp", fingerprint(self.text_col)) \
                         .withColumn("__q_ok", self.quality >= F.lit(self.quality_threshold))

            # ---- stage 2: exact dedup — within batch (first arrival
            # per fingerprint among quality passers) then vs the stored
            # fingerprint index, probing only the batch's buckets
            qpass = fresh.where("__q_ok")
            first = qpass.groupBy("fp").agg(
                F.min(F.struct(*_ARRIVAL, *keys)).alias("__w")
            ).select("fp", F.col("__w.__ordinal").alias("__w_ord"),
                     F.col("__w.__offset").alias("__w_off"))
            qpass = qpass.join(first, "fp").withColumn(
                "__batch_first",
                (F.col("__ordinal") == F.col("__w_ord"))
                & (F.col("__offset") == F.col("__w_off")),
            ).drop("__w_ord", "__w_off")
            if LakeTable.exists(f"{self.root}/fingerprints"):
                fpt = self._fp_table()
                probe_buckets = sorted({
                    r["b"] for r in qpass.select(
                        bucket_expr(["fp"], fpt.snapshot().n_buckets).alias("b")
                    ).distinct().collect()
                })
                stored_fp = (
                    fpt.read(buckets=probe_buckets).select(
                        "fp", F.lit(True).alias("__fp_taken"))
                    if probe_buckets else None
                )
            else:
                stored_fp = None
            if stored_fp is not None:
                qpass = qpass.join(stored_fp, "fp", "left")
            else:
                qpass = qpass.withColumn("__fp_taken", F.lit(None).cast("boolean"))
            qpass = qpass.withColumn(
                "__exact_ok",
                F.col("__batch_first") & F.col("__fp_taken").isNull(),
            )

            # ---- stage 3: near-dup — batch sigs vs the index (banded
            # equi-join) and vs earlier batch rows (predecessor rule)
            epass = qpass.where("__exact_ok")
            sigs = self.index.compute_signatures(
                epass.select(*keys, self.text_col)
            )
            arr = epass.select(*keys, *_ARRIVAL)
            hit_index = (
                self.index.candidates(sigs, n_bands=self.n_bands)
                .select(*[F.col(f"{c}_b").alias(c) for c in keys]).distinct()
                .withColumn("__idx_hit", F.lit(True))
                if LakeTable.exists(f"{self.root}/sigs") else None
            )
            # within-batch predecessor collisions (banded self-join,
            # earlier arrival wins)
            ba = self.index._banded(sigs, "a", self.n_bands)
            bb = self.index._banded(sigs, "b", self.n_bands)
            aa = ba.join(
                arr.select(*[F.col(c).alias(f"a_{c}") for c in keys],
                           *[F.col(c).alias(f"a{c}") for c in _ARRIVAL]),
                [f"a_{c}" for c in keys])
            bbj = bb.join(
                arr.select(*[F.col(c).alias(f"b_{c}") for c in keys],
                           *[F.col(c).alias(f"b{c}") for c in _ARRIVAL]),
                [f"b_{c}" for c in keys])
            earlier = (
                (F.col("a__ordinal") < F.col("b__ordinal"))
                | ((F.col("a__ordinal") == F.col("b__ordinal"))
                   & (F.col("a__offset") < F.col("b__offset")))
            )
            batch_hits = (
                aa.join(bbj, ["band", "key"]).where(earlier)
                .select(*[F.col(f"b_{c}").alias(c) for c in keys]).distinct()
                .withColumn("__pred_hit", F.lit(True))
            )
            epass = epass.join(batch_hits, keys, "left")
            if hit_index is not None:
                epass = epass.join(hit_index, keys, "left")
            else:
                epass = epass.withColumn("__idx_hit", F.lit(None).cast("boolean"))
            epass = epass.withColumn(
                "__near_ok",
                F.col("__pred_hit").isNull() & F.col("__idx_hit").isNull(),
            )

            # ---- stage 4: decontamination (broadcast static shingles)
            npass = epass.where("__near_ok")
            if self._bench_shingles is not None:
                dirty = (
                    shingles(npass, id_col=keys, text_col=self.text_col, k=self.k)
                    .join(F.broadcast(self._bench_shingles), "shingle")
                    .select(*keys).distinct().withColumn("__dirty", F.lit(True))
                )
                npass = npass.join(dirty, keys, "left")
            else:
                npass = npass.withColumn("__dirty", F.lit(None).cast("boolean"))
            npass = npass.withColumn("__clean", F.col("__dirty").isNull())

            # ---- stage 5: domain cap (stored counts + arrival rank)
            cpass = npass.where("__clean")
            from pyspark.sql.window import Window

            w = Window.partitionBy("__dom").orderBy(
                *[F.col(c).asc() for c in _ARRIVAL], *[F.col(c).asc() for c in keys]
            )
            cpass = cpass.withColumn("__rank", F.row_number().over(w))
            ct = self._counts_table()
            counts = ct.read().select(
                F.col(self.domain_col).alias("__dom"),
                F.col("n_admitted").alias("__n0"),
            ) if ct.current_version() >= 0 else None
            if counts is not None:
                cpass = cpass.join(counts, "__dom", "left")
            else:
                cpass = cpass.withColumn("__n0", F.lit(None).cast("long"))
            cpass = cpass.withColumn(
                "__admit",
                (F.coalesce(F.col("__n0"), F.lit(0)) + F.col("__rank"))
                <= F.lit(self.domain_cap),
            )

            # ---- stage 6: split (pure key hash — content-independent)
            total = float(sum(self.split_weights.values()))
            grid = 1 << 48
            cum, cuts = 0.0, []
            names = list(self.split_weights)
            for nme in names[:-1]:
                cum += self.split_weights[nme] / total
                cuts.append(int(cum * grid))
            u = uniform_hash(self.key_cols, seed=self.split_seed)
            split = F.lit(f"kept_{names[-1]}")
            for nme, cut in reversed(list(zip(names[:-1], cuts))):
                split = F.when(u < F.lit(cut), F.lit(f"kept_{nme}")).otherwise(split)

            admitted = cpass.where("__admit")

            # ---- assemble fresh verdicts (first-drop-wins)
            v_quality = fresh.where(~F.col("__q_ok")).select(
                *keys, "fp", F.lit("low_quality").alias("verdict"),
                *_ARRIVAL)
            v_exact = qpass.where(~F.col("__exact_ok")).select(
                *keys, "fp", F.lit("exact_dup").alias("verdict"), *_ARRIVAL)
            v_near = epass.where(~F.col("__near_ok")).select(
                *keys, "fp", F.lit("near_dup").alias("verdict"), *_ARRIVAL)
            v_dirty = npass.where(~F.col("__clean")).select(
                *keys, "fp", F.lit("contaminated").alias("verdict"), *_ARRIVAL)
            v_cap = cpass.where(~F.col("__admit")).select(
                *keys, "fp", F.lit("domain_capped").alias("verdict"), *_ARRIVAL)
            v_kept = admitted.select(
                *keys, "fp", split.alias("verdict"), *_ARRIVAL)
            fresh_v = v_quality
            for v in (v_exact, v_near, v_dirty, v_cap, v_kept):
                fresh_v = fresh_v.unionByName(v)

            # frozen re-deliveries re-land their stored verdict (same
            # content or not); ADMITTED docs re-land their CURRENT
            # fingerprint (an update refreshed the fp index below, and
            # the verdict row's fp must keep naming the row they own so
            # a later delete frees the right slot); deletes drop the row
            frozen_v = frozen.select(
                *keys,
                F.when(F.col("__known").startswith("kept_"),
                       fingerprint(self.text_col))
                 .otherwise(F.col("__known_fp")).alias("fp"),
                F.col("__known").alias("verdict"), *_ARRIVAL)
            del_v = deletes.select(
                *keys, F.lit(None).cast("string").alias("fp"),
                F.lit(None).cast("string").alias("verdict"), *_ARRIVAL)

            changes = (
                fresh_v.withColumn("op", F.lit("U"))
                .unionByName(frozen_v.withColumn("op", F.lit("U")))
                .unionByName(del_v.withColumn("op", F.lit("D")))
            )
            # maintenance rows must see the PRE-epoch verdict state (a
            # delete frees the slots its doc held BEFORE this epoch) —
            # LakeTable.read() pins the current snapshot's file list, so
            # building these frames before the verdict merge keeps them
            # on the old version even though they execute after it
            old_known = self._old_state_changes(deletes, frozen)
            vt = self._verdict_table(reference=reduced)
            vt.merge(changes, batch_id, op_col="op",
                     validate_cardinality=False, run_id=run_id)

            # ---- maintain the fingerprint index: exact-stage survivors
            # in; deleted/updated owners' old fingerprints out. An
            # UPDATE to an admitted doc refreshes its fingerprint.
            fp_new = qpass.where("__exact_ok").select(
                "fp", *keys, *_ARRIVAL).withColumn("op", F.lit("U"))
            fp_changes = fp_new.unionByName(old_known["fp_drop"]) \
                               .unionByName(old_known["fp_add"])
            if fp_changes.limit(1).count() > 0:
                self._fp_table(reference=reduced).merge(
                    fp_changes, batch_id, op_col="op",
                    validate_cardinality=False, run_id=run_id)

            # ---- maintain the signature index: near-dup-stage
            # survivors in (their CURRENT content), deletes out
            sig_rows = sigs.join(
                epass.where("__near_ok").select(*keys, *_ARRIVAL), keys)
            refreshed = old_known["sig_refresh"]
            sig_changes = (
                sig_rows.withColumn("op", F.lit("U"))
                .unionByName(refreshed)
                .unionByName(old_known["sig_drop"])
            )
            if sig_changes.limit(1).count() > 0:
                self.index.table(reference=reduced).merge(
                    sig_changes, batch_id, op_col="op",
                    validate_cardinality=False, run_id=run_id)

            # ---- maintain domain counts: + admissions, − deleted kept
            adm = admitted.groupBy("__dom").agg(
                F.count(F.lit(1)).alias("__plus"))
            gone = old_known["kept_deleted"].groupBy("__dom").agg(
                F.count(F.lit(1)).alias("__minus"))
            delta = adm.join(gone, "__dom", "full").select(
                F.col("__dom").alias(self.domain_col),
                (F.coalesce("__plus", F.lit(0)) - F.coalesce("__minus", F.lit(0))
                 ).alias("__d"))
            if delta.limit(1).count() > 0:
                ct = self._counts_table()
                base = ct.read().select(
                    self.domain_col, F.col("n_admitted").alias("__n0")
                ) if ct.current_version() >= 0 else None
                upd = delta.join(base, self.domain_col, "left") if base is not None \
                    else delta.withColumn("__n0", F.lit(None).cast("long"))
                upd = upd.select(
                    self.domain_col,
                    (F.coalesce("__n0", F.lit(0)) + F.col("__d")).alias("n_admitted"),
                    F.lit("U").alias("op"),
                    F.lit(batch_id).cast("long").alias("__ordinal"),
                    F.lit(0).cast("long").alias("__offset"),
                )
                ct.merge(upd, batch_id, op_col="op",
                         validate_cardinality=False, run_id=run_id)
        finally:
            reduced.unpersist()

    def _old_state_changes(self, deletes: DataFrame, frozen: DataFrame) -> dict:
        """Per-epoch maintenance rows derived from KNOWN docs: deleted
        docs free their fingerprint/signature/count slots; updated
        ADMITTED docs refresh their signature and fingerprint rows
        (drop the stale fp, land the new one via ``fp_add``).

        Corner, stated honestly: the fp table is keyed by fingerprint,
        so if an update makes an admitted doc byte-identical to ANOTHER
        admitted doc, both map to one fp row and the last writer is the
        recorded owner — deleting either doc frees the shared slot. A
        batch rebuild is the repair for drift this can accumulate."""
        keys = self.key_cols
        vt_exists = LakeTable.exists(f"{self.root}/verdicts")
        if vt_exists:
            known = self._verdict_table().read().select(
                *keys, F.col("verdict").alias("__v"), F.col("fp").alias("__ofp"))
            del_known = deletes.join(known, keys)
        else:
            del_known = deletes.limit(0).withColumn("__v", F.lit("")) \
                               .withColumn("__ofp", F.lit(""))
        kept = F.col("__v").startswith("kept_")
        kept_deleted = del_known.where(kept).select(*keys, "__dom")
        # fingerprint rows to drop: deleted exact-stage survivors (their
        # __ofp is non-null and they own it), plus updated admitted docs
        # whose content (fingerprint) changed — whose NEW fingerprint
        # lands via fp_add (frozen docs never reach the fresh fp_new path)
        surv = F.col("__v").isin("near_dup", "contaminated", "domain_capped") | kept
        fp_drop_del = del_known.where(surv & F.col("__ofp").isNotNull()).select(
            F.col("__ofp").alias("fp"), *keys, *_ARRIVAL)
        from rook_spark.functions.text import fingerprint

        upd_adm = frozen.where(F.col("__known").startswith("kept_")).withColumn(
            "__nfp", fingerprint(self.text_col))
        fp_drop_upd = upd_adm.where(
            F.col("__known_fp").isNotNull()
            & (F.col("__nfp") != F.col("__known_fp"))
        ).select(F.col("__known_fp").alias("fp"), *keys, *_ARRIVAL)
        fp_drop = fp_drop_del.unionByName(fp_drop_upd).withColumn(
            "op", F.lit("D"))
        fp_add = upd_adm.where(
            F.col("__known_fp").isNotNull()
            & (F.col("__nfp") != F.col("__known_fp"))
        ).select(F.col("__nfp").alias("fp"), *keys, *_ARRIVAL).withColumn(
            "op", F.lit("U"))
        # signature index: drop deleted near-stage survivors; refresh
        # updated admitted docs with their current content
        near_surv = F.col("__v").isin("contaminated", "domain_capped") | kept
        sig_cols = self.index.sig_cols
        sig_drop = del_known.where(near_surv).select(*keys, *_ARRIVAL)
        for c in sig_cols:
            sig_drop = sig_drop.withColumn(c, F.lit(None).cast("long"))
        sig_drop = sig_drop.withColumn("op", F.lit("D"))
        refreshed = self.index.compute_signatures(
            upd_adm.select(*keys, self.text_col)
        ).join(upd_adm.select(*keys, *_ARRIVAL), keys).withColumn(
            "op", F.lit("U"))
        return {
            "kept_deleted": kept_deleted,
            "fp_drop": fp_drop,
            "fp_add": fp_add,
            "sig_drop": sig_drop,
            "sig_refresh": refreshed,
        }
