"""CDC-maintained incremental inverted text index (posting lists).

The reference's second sink IS a full-text index: the binlog fan-out
drives a Lucene index synchronizer that re-indexes exactly the
documents each transaction touched (rook readme.md:61-66;
``FullTextIndexSynchronizer.java:74-87`` builds per-event work items,
``DefaultRowsMutationIndexer.java:64-88`` loads current state and
index-or-purges per row inside one transaction). This module is the
lakehouse re-expression: :class:`InvertedIndex` is an engine sink (K1
listener fan-out) maintaining a derived posting table
``(key_cols..., token)`` in lockstep with the replicated document
table — each epoch touches ONLY the changed documents' postings, never
the corpus.

Layout is the interesting part, because the two access patterns pull
in opposite directions:

- **Maintenance** wants a changed document's postings co-located (to
  find and tombstone STALE tokens after an update). So the table is
  BUCKETED BY THE DOCUMENT KEY — all of one doc's postings live in one
  bucket, and an epoch's maintenance reads only the touched buckets.
- **Lookup** wants token-selective scans. Bucketing serves the doc
  axis, so the token axis rides the OTHER pruning machinery: per-file
  BLOOM FILTERS on ``token`` (``bloom_cols`` at create), giving
  ``read(points={"token": t})`` file skipping inside every bucket.
  One table, two orthogonal pruning axes — no second copy of the data
  sorted the other way (the classic search-index trade; Lucene pays it
  with a dedicated inverted file, a 100 TB lake pays it with blooms).

Per-epoch cost: O(changed docs × tokens/doc) new postings + a
touched-bucket semi-join to discover stale postings — the same read
width the COW MERGE itself pays. Stale tokens (dropped by an update,
or a deleted document's entire posting set) become 'D' tombstone rows
under the SAME conditional-ordinal LWW discipline as the main table,
so duplicate re-delivery is fenced and out-of-order epochs cannot
resurrect a dropped posting.

Exactly-once, failure contract, and repair are identical to
:class:`rook_spark.cdc.dedup_index.DedupIndex` (registered in the
"before" phase with the run_id-scoped fence; a dead-lettered sink
epoch is repaired by :meth:`rebuild`, the O(corpus) recompute).

Invariant (test-pinned): after ANY replay — multi-epoch, duplicate
re-delivery, token-set-shrinking updates, deletes — the index equals
a full tokenization of the final main-table state.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.reduce import lww_reduce
from rook_spark.lake.table import LakeTable, bucket_expr

__all__ = ["InvertedIndex", "tokens_expr", "token_positions_expr"]


def tokens_expr(text_col: str | Column) -> Column:
    """Deterministic tokenizer shared by the index, its rebuild, and
    the DuckDB oracle: lowercase, split on non-alphanumeric runs, drop
    empties, distinct. Engine-portable — DuckDB replays it as
    ``list_distinct(list_filter(regexp_split_to_array(lower(x),
    '[^a-z0-9]+'), t -> t <> ''))``."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_distinct(
        F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")
    )


def token_positions_expr(text_col: str | Column) -> Column:
    """``array<struct<t: string, p: int>>`` — every token occurrence
    with its WORD position (index in the raw split array; empties are
    dropped but keep their slot, so positions of adjacent words always
    differ by exactly 1 regardless of leading separators). The same
    rule on both the incremental and rebuild paths is what makes
    phrase adjacency well-defined."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    arr = F.split(F.lower(col), "[^a-z0-9]+")
    pairs = F.transform(
        arr, lambda t, i: F.struct(t.alias("t"), i.cast("int").alias("p"))
    )
    return F.filter(pairs, lambda x: x["t"] != "")


class InvertedIndex:
    """Derived posting table ``(key_cols..., token)`` kept in lockstep
    with a CDC-replicated document table. See the module docstring for
    the layout rationale, guarantees, and failure contract."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Iterable[str] = ("repo", "path"),
        text_col: str = "content",
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.text_col = text_col
        self.n_buckets = n_buckets
        self.merge_keys = self.key_cols + ["token"]

    # ---------------------------------------------------------------- table

    def table(self, reference: DataFrame | None = None) -> LakeTable:
        """Load the posting table, creating it on first use (key column
        types taken from ``reference``). Buckets are keyed by the DOC
        key only — co-locating a document's postings is the whole
        maintenance story — while the MERGE key includes ``token``;
        blooms on ``token`` serve the lookup axis."""
        if LakeTable.exists(self.path):
            return LakeTable.load(self.spark, self.path)
        if reference is None:
            raise FileNotFoundError(
                f"no inverted index at {self.path} yet — it is created by "
                "the first applied batch (or rebuild()); pass a reference "
                "frame to create it explicitly"
            )
        by_name = {f.name: f.dataType for f in reference.schema.fields}
        schema = T.StructType(
            [T.StructField(c, by_name[c]) for c in self.key_cols]
            + [T.StructField("token", T.StringType()),
               # word positions of every occurrence (phrase adjacency)
               T.StructField("positions", T.ArrayType(T.IntegerType()))]
            + [T.StructField(c, T.LongType()) for c in ("__ordinal", "__offset")]
        )
        return LakeTable.create(
            self.spark, self.path, schema,
            key_cols=self.merge_keys, n_buckets=self.n_buckets,
            bloom_cols=["token"],
            bucket_cols=self.key_cols,  # co-locate by DOC, merge by (doc, token)
        )

    def postings(self) -> DataFrame:
        """Current committed index state ``(key_cols..., token)``."""
        return self.table().read()

    # --------------------------------------------------------------- lookup

    def lookup(self, token: str) -> DataFrame:
        """Documents containing ``token`` — bloom-pruned file scan (the
        point-predicate axis), exact filter on top per the superset
        contract."""
        t = self.table()
        return (
            t.read(points={"token": token})
            .where(F.col("token") == token)
            .select(*self.key_cols)
        )

    def search_all(self, tokens: Iterable[str]) -> DataFrame:
        """Documents containing EVERY token (AND query): per-token
        bloom-pruned postings intersected on the doc key. Each leg is a
        pruned scan; the intersection joins posting-list-sized frames,
        never the corpus."""
        toks = list(dict.fromkeys(tokens))
        if not toks:
            raise ValueError("search_all needs at least one token")
        out = self.lookup(toks[0])
        for tk in toks[1:]:
            out = out.join(self.lookup(tk), self.key_cols, "leftsemi")
        return out

    def phrase_search(self, words: Iterable[str]) -> DataFrame:
        """Documents containing the words CONSECUTIVELY (Lucene phrase
        query): per-word bloom-pruned posting legs joined on the doc
        key, then one array predicate — a start position of word 0
        whose i-th successor appears in every word i's positions. Cost:
        len(phrase) pruned scans + posting-sized joins, never a content
        re-scan. Words must be single tokens of the index's tokenizer
        (validated loudly)."""
        from functools import reduce as _reduce

        ws = [w.lower() for w in words]
        if not ws:
            raise ValueError("phrase_search needs at least one word")
        for w in ws:
            if not w or any(not ("a" <= c <= "z" or "0" <= c <= "9") for c in w):
                raise ValueError(
                    f"phrase word {w!r} is not a single token of the "
                    "index tokenizer ([a-z0-9]+ after lowercasing)")
        if len(ws) == 1:
            return self.lookup(ws[0])
        t = self.table()

        def leg(w: str, i: int) -> DataFrame:
            return (
                t.read(points={"token": w})
                .where(F.col("token") == w)
                .select(*self.key_cols, F.col("positions").alias(f"__p{i}"))
            )

        out = leg(ws[0], 0)
        for i, w in enumerate(ws[1:], start=1):
            out = out.join(leg(w, i), self.key_cols)
        adjacent = F.exists(
            F.col("__p0"),
            lambda p: _reduce(
                lambda a, b: a & b,
                [F.array_contains(F.col(f"__p{i}"), p + i)
                 for i in range(1, len(ws))],
            ),
        )
        return out.where(adjacent).select(*self.key_cols)

    def rank_search(
        self, words: Iterable[str], k: int = 10, n_docs: int | None = None
    ) -> DataFrame:
        """OR-query with tf-idf ranking (the Lucene scoring shape):
        docs matching ANY word, scored ``Σ_t tf(d,t) · ln((N+1)/(df(t)+1))``
        over the matched words, top-``k`` by score. tf rides the stored
        positions (``size(positions)``); df is counted on the
        bloom-pruned legs themselves (posting-sized, never the corpus).
        ``n_docs`` (corpus size N) should be passed by callers that
        know it — e.g. the main table's row count the engine already
        tracks; when omitted it is counted from the INDEX
        (O(index) — fine for tests, wasteful at 10^10 docs).
        Returns ``(key_cols..., score)``, ties broken by key for
        determinism."""
        ws = list(dict.fromkeys(w.lower() for w in words))
        if not ws:
            raise ValueError("rank_search needs at least one word")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        t = self.table()
        legs = None
        for w in ws:
            leg = (
                t.read(points={"token": w})
                .where(F.col("token") == w)
                .select(*self.key_cols, "token",
                        F.size("positions").alias("tf"))
            )
            legs = leg if legs is None else legs.unionByName(leg)
        if n_docs is None:
            n_docs = t.read().select(*self.key_cols).distinct().count()
        # df per token over the pruned legs (posting-sized aggregate),
        # broadcast back onto them — the corpus is never touched
        df_per_token = legs.groupBy("token").agg(
            F.count_distinct(*[F.col(c) for c in self.key_cols]).alias("df")
        )
        scored = (
            legs.join(F.broadcast(df_per_token), "token")
            .withColumn(
                "__w",
                F.col("tf")
                * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)),
            )
            .groupBy(*self.key_cols)
            .agg(F.sum("__w").alias("score"))
        )
        return scored.orderBy(F.desc("score"), *self.key_cols).limit(k)

    # ----------------------------------------------------------------- sink

    def sink(self):
        """The engine listener: register with
        ``engine.with_sink("fulltext_index", idx.sink(), when="before")``.
        LWW-reduces the batch per doc key, tokenizes the surviving
        after-images, discovers stale postings with a touched-bucket
        semi-join against the index, and MERGEs upserts + tombstones in
        one atomic, fenced commit."""

        def fn(flat: DataFrame, batch_id: int, run_id: str = "") -> None:
            reduced = lww_reduce(flat, key_cols=self.key_cols)
            reduced.persist()
            try:
                idx = self.table(reference=reduced)
                docs = reduced.select(
                    *self.key_cols, "op",
                    F.col("commit_ordinal").alias("__ordinal"),
                    F.col("offset").alias("__offset"),
                    token_positions_expr(self.text_col).alias("__tp"),
                )
                # touched buckets: bounded driver aggregate (≤ n_buckets
                # ints, computed on the persisted reduce — same class of
                # bounded collect as the engine's lineage piggyback)
                touched = [
                    r[0]
                    for r in docs.select(
                        bucket_expr(self.key_cols, self.n_buckets)
                    ).distinct().collect()
                ]
                new = (
                    docs.where(F.col("op") != "D")
                    .select(*self.key_cols, "__ordinal", "__offset",
                            F.explode("__tp").alias("tp"))
                    .groupBy(*self.key_cols, F.col("tp.t").alias("token"))
                    .agg(
                        F.sort_array(F.collect_list("tp.p")).alias("positions"),
                        F.first("__ordinal").alias("__ordinal"),
                        F.first("__offset").alias("__offset"),
                    )
                )
                # stale postings: everything the index holds for the
                # batch's docs (touched buckets only) that the new token
                # sets no longer contain — including every posting of a
                # deleted doc (rook's purge half of index-or-purge,
                # DefaultRowsMutationIndexer.java:64-88)
                # ref="head": the write path must see the chain head —
                # under WAP staging of the index a default read would
                # resolve the published ref and tombstone against stale
                # postings (same convention as every engine write path)
                old = (
                    idx.read(buckets=touched, ref="head")
                    .select(*self.key_cols, "token")
                    .join(
                        docs.select(
                            *self.key_cols, "__ordinal", "__offset"),
                        self.key_cols,
                    )
                )
                stale = old.join(new.select(*self.merge_keys),
                                 self.merge_keys, "leftanti")
                changes = new.withColumn("op", F.lit("U")).unionByName(
                    # tombstones carry no positions (null-filled)
                    stale.withColumn("op", F.lit("D")),
                    allowMissingColumns=True,
                )
                idx.merge(
                    changes, batch_id, op_col="op",
                    validate_cardinality=False, run_id=run_id,
                    touched_buckets=touched,
                )
            finally:
                reduced.unpersist()

        return fn

    # --------------------------------------------------------------- repair

    def rebuild(self, main_table: LakeTable, batch_id: int | None = None) -> int:
        """O(corpus) repair/bootstrap: tokenize the main table's CURRENT
        state and overwrite the index in one atomic commit (the recovery
        path after a dead-lettered sink epoch — see the failure contract
        — or for indexing a pre-existing table). Stored LWW ordinals
        carry over so incremental maintenance keeps fencing stale
        re-deliveries; ordinal-less tables get ``-1``. Returns the
        number of postings."""
        docs = main_table.read(include_internal=True, ref="head")
        for c in ("__ordinal", "__offset"):
            if c not in docs.columns:
                docs = docs.withColumn(c, F.lit(-1).cast("long"))
        post = (
            docs.select(*self.key_cols, "__ordinal", "__offset",
                        F.explode(token_positions_expr(self.text_col)).alias("tp"))
            .groupBy(*self.key_cols, F.col("tp.t").alias("token"))
            .agg(
                F.sort_array(F.collect_list("tp.p")).alias("positions"),
                F.first("__ordinal").alias("__ordinal"),
                F.first("__offset").alias("__offset"),
            )
        )
        post.persist()
        try:
            t = self.table(reference=docs)
            t.overwrite(post, batch_id=batch_id)
            return post.count()  # cached — no corpus re-scan
        finally:
            post.unpersist()
