#!/usr/bin/env python
"""Day-2 operations tour: everything an operator does AFTER the stream
is running, in one runnable script.

1. replay a seeded log in epochs (the steady state),
2. inspect the commit log (``history()``) and per-partition watermarks,
3. suffer a bad batch → **atomic rollback** (watermark reversion makes
   recovery = rollback + re-replay, no fence surgery),
4. outgrow the bucket layout → **rebucket** (partition-spec evolution:
   one atomic rewrite; subsequent MERGEs route by the new count),
5. bound read amplification → **compact** (fold MOR deltas),
6. reclaim storage → **vacuum** (expire old versions; ``min_age_s``
   grace for in-flight commits when running beside live writers),
   sized first with **``dry_run=True``** (the exact reclamation,
   nothing deleted), with a named **tag** pinning an audit snapshot
   through the GC — and the commit log's **operation labels**
   (``history().op``) telling the whole story afterwards,
7. swap the catalog → the same table logic running on an
   ``InMemoryMetadataStore`` (the catalog seam a JDBC/REST
   catalog would implement), and what happens when a SECOND writer
   races a commit (**CommitConflict** — the CAS contract),
8. incremental consumers → **stats-skipped bounded scan**
   (``read(ranges=...)``: "what changed since the watermark" without
   listing the untouched bulk of the table),
9. dedup at ingest → **DedupIndex** (signatures maintained per epoch
   from the change feed; near-dup probe of new docs against the index),
10. time + totals as derived sinks → **Scd2History** (validity
    intervals; ``state_at`` any ordinal — no snapshot needed) and
    **DeltaAggView** (per-group totals moved by signed delta folds,
    O(changed rows) per epoch),
11. the table as first-class Spark formats → the **changelog feed**
    (``readStream.format("rook_lake_changes")`` — MOR delta files ARE
    the epoch's change set), a **relay replica** kept in sync at
    O(change volume), read back via ``format("rook_lake")`` with
    Catalyst filter pushdown driving stats/bloom file skipping.

Run:  python examples/ops_tour.py   (local[4], ~1.5 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events
from rook_spark.lake.metastore import InMemoryMetadataStore
from rook_spark.lake.table import LakeTable
from rook_spark.session import get_spark


def main() -> None:
    spark = get_spark("ops_tour", master="local[4]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="rook_ops_tour_")
    try:
        events = generate_events(spark, 32_000, seed=21)
        engine = CdcEngine(
            spark, os.path.join(work, "repos"), n_buckets=4, write_mode="mor",
        ).ignoring_servers(99)

        # --- 1. steady state: two epochs through the full engine path
        for i, (lo, hi) in enumerate([(0, 8_000), (8_000, 16_000)]):
            engine.replay(
                events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i
            )
        table = engine.target()

        # --- 2. ops surfaces
        print("\n== commit log (history) ==")
        table.history().orderBy("version").show(truncate=False)
        print("== per-partition watermarks (lineage) ==")
        table.lineage().orderBy("partition_id").show(5)
        print("== live-file inventory (files; Iceberg tbl.files analog) ==")
        (table.files().groupBy("bucket", "kind")
         .agg(F.count("*").alias("n_files"), F.sum("size_bytes").alias("bytes"))
         .orderBy("bucket", "kind").show(8))

        # --- 3. bad batch → rollback + re-replay. The corrupted epoch
        # carries FRESH offsets (16k-24k, above every watermark), so it
        # genuinely lands in the table.
        v_good = table.current_version()
        third = events.where((F.col("offset") >= 16_000) & (F.col("offset") < 24_000))
        engine.replay(
            third.withColumn(
                "after",
                F.col("after").withField("content", F.lit("CORRUPTED BY A BAD DEPLOY")),
            ),
            2,
        )
        n_corrupted = table.read().where(
            F.col("content") == "CORRUPTED BY A BAD DEPLOY"
        ).count()
        assert n_corrupted > 0
        print(f"\n== bad batch applied: {n_corrupted} corrupted rows at "
              f"version {table.current_version()} ==")
        res = table.rollback(v_good)
        print(f"rollback -> {res}  (metadata-only, ~ms; bad version stays auditable)")
        engine.replay(third, 3)  # reverted watermarks re-admit 16k-24k
        assert table.read().where(
            F.col("content") == "CORRUPTED BY A BAD DEPLOY"
        ).count() == 0
        rows_good = table.read().count()
        print(f"clean re-replay converged: {rows_good} rows, 0 corrupted")

        # --- 4. the table outgrew 4 buckets; the NEXT epoch (fresh
        # offsets 24k-32k) routes by the new count
        print(f"\n== rebucket 4 -> 16: {table.rebucket(16)} ==")
        stats = engine.replay(events.where(F.col("offset") >= 24_000), 4)
        assert stats.rows_applied > 0
        print(f"post-rebucket epoch applied {stats.rows_applied} rows "
              f"across {stats.touched_buckets} of 16 buckets")

        # --- 4b. metadata-only DDL (Iceberg field-id analog): rename a
        # payload column and rename it back — zero file rewrites either
        # way (files carry name-stable PHYSICAL columns; the snapshot
        # maps logical names onto them), values and pruning survive
        files_pre = sorted(f for fs in table.snapshot().buckets.values() for f in fs)
        print(f"\n== rename_column content -> body: {table.rename_column('content', 'body')} ==")
        n_body = table.read().where(F.col("body").isNotNull()).count()
        assert n_body > 0
        assert sorted(f for fs in table.snapshot().buckets.values() for f in fs) == files_pre
        print(f"{n_body} rows read through the renamed column; "
              "identical file set (O(1) DDL, no rewrite)")
        table.rename_column("body", "content")  # producers still send 'content'

        # --- 5 + 6. compaction + retention. A named tag pins the
        # pre-maintenance snapshot through ANY vacuum (audit/repro:
        # "the corpus the model trained on"); min_age_s is the grace
        # that lets vacuum run beside live writers without GC-ing an
        # in-flight commit's files (Iceberg remove_orphan_files
        # older_than analog).
        tagged_v = table.current_version()
        print(f"tag     -> {table.tag('pre-maint')}")
        # health() is the poll that DECIDES to compact: O(metadata),
        # zero Spark jobs — depth/small-file/skew census with advice
        h = table.health()
        print(f"health  -> depth={h['max_delta_depth']} "
              f"small={h['small_files']}/{h['base_files']} "
              f"skew={h['bucket_skew']} advice={h['advice']}")
        print(f"compact -> {table.compact()}")
        # size the reclamation BEFORE committing to it: dry_run computes
        # the exact file set a real vacuum would delete (and deletes
        # nothing — legal even inside an open catalog group)
        dry = table.vacuum(keep_last=2, min_age_s=0, dry_run=True)
        print(f"vacuum dry-run -> would remove {dry['removed_files']} files, "
              f"{dry['removed_snapshots']} snapshots")
        real = table.vacuum(keep_last=2, min_age_s=0)
        assert real["removed_files"] == dry["removed_files"]
        print(f"vacuum  -> {real}  (exactly as the dry run predicted)")
        assert table.read(tag="pre-maint").count() > 0
        print(f"tagged v{tagged_v} still reads through the tag after vacuum")
        # FSCK after maintenance: every retained version's references
        # must still resolve and every footer row count must match its
        # stored stat — strict mode is the CI gate shape
        fsck = table.verify_integrity(all_versions=True, deep=True,
                                      strict=True)
        print(f"fsck    -> ok={fsck['ok']} files={fsck['files_checked']} "
              f"orphans={len(fsck['orphans'])}")
        print("history after maintenance (expired untagged versions gone):")
        table.history().orderBy("version").show(truncate=False)

        # --- 6b. predicate erasure (GDPR / retention): one atomic commit
        # rewrites only files that may hold matches; the tagged snapshot
        # still serves the pre-erasure corpus for audit
        n_md = table.read().where(F.col("lang") == "md").count()
        res = table.delete_where(F.col("lang") == "md")
        assert res["deleted_rows"] == n_md
        assert table.read().where(F.col("lang") == "md").count() == 0
        assert table.read(tag="pre-maint").where(F.col("lang") == "md").count() > 0
        print(f"\n== delete_where(lang='md') -> {res} ==")
        print("erased rows stay readable through the pre-maint tag (audit)")

        # --- 6c. merge-on-read erasure: tombstone deltas, zero base
        # rewrite (O(matches) write — the 100 TB path), then compact
        # executes the physical purge
        n_py = table.read().where(F.col("lang") == "py").count()
        base_before = dict(table.snapshot().buckets)
        res = table.delete_where(F.col("lang") == "py", mode="mor")
        assert res["deleted_rows"] == n_py
        assert table.snapshot().buckets == base_before  # no base rewrite
        assert table.read().where(F.col("lang") == "py").count() == 0
        print(f"\n== delete_where(lang='py', mode='mor') -> {res} ==")
        print(f"compact (physical purge) -> {table.compact()}")
        assert not any(table.snapshot().deltas.values())

        # --- 6d. inverted text index: bootstrap from the table, then
        # bloom-pruned token lookup + AND-search (rook's full-text sink
        # analog; incrementally maintained when attached as an engine
        # sink — see cdc/fulltext.py)
        from rook_spark.cdc.fulltext import InvertedIndex

        fts = InvertedIndex(spark, os.path.join(work, "fts"), n_buckets=8)
        n_post = fts.rebuild(table)
        # two live tokens from one real document -> lookup and AND-search
        # are guaranteed non-empty
        doc = fts.postings().orderBy("repo", "path", "token").first()
        t1, t2 = [
            r["token"]
            for r in fts.postings()
            .where((F.col("repo") == doc["repo"]) & (F.col("path") == doc["path"]))
            .select("token").distinct().orderBy("token").limit(2).collect()
        ]
        n1 = fts.lookup(t1).count()
        both = fts.search_all([t1, t2]).count()
        assert n1 > 0 and both > 0
        assert fts.table().snapshot().bucket_cols == ["repo", "path"]
        print(f"\n== inverted index: {n_post} postings; lookup({t1!r}) -> "
              f"{n1} docs, search_all({t1!r} AND {t2!r}) -> {both} ==")

        # --- 6e. time and totals as derived sinks: SCD2 history (every
        # version as a validity interval; point-in-time reads at ANY
        # ordinal, beyond epoch-granular time travel) and a delta-fold
        # aggregate view (per-repo totals moved by signed contributions,
        # O(changed rows) per epoch even for hot groups)
        from rook_spark.cdc.aggview import DeltaAggView
        from rook_spark.cdc.scd2 import Scd2History

        eng_d = CdcEngine(
            spark, os.path.join(work, "repos_d"), n_buckets=4,
            write_mode="mor",  # MOR: the delta files double as the
        ).ignoring_servers(99)  # change feed for step 6f
        hist = Scd2History(spark, os.path.join(work, "scd2"), n_buckets=4)
        mv = DeltaAggView(
            spark, os.path.join(work, "mv"), eng_d.target,
            group_expr=lambda: F.col("repo"),
            measures={"total_chars": lambda: F.length("content")},
            group_name="repo", n_buckets=4,
        )
        eng_d.with_sink("scd2", hist.sink(), when="before")
        eng_d.with_sink("agg_view", mv.sink(), when="before")
        small = events.where(F.col("offset") < 8_000)
        eng_d.replay(small.where(F.col("offset") < 4_000), 0)
        eng_d.replay(small.where(F.col("offset") >= 4_000), 1)
        n_int = hist.history().count()
        n_open = hist.current().count()
        probe = 6_000  # an ordinal INSIDE epoch 2 — no snapshot exists here
        n_at = hist.state_at(probe).count()
        top = mv.read().orderBy(F.col("n_rows").desc()).first()
        assert n_open == eng_d.target().read().count()
        print(f"\n== scd2: {n_int} intervals ({n_open} open = live rows); "
              f"state_at({probe}) -> {n_at} rows mid-epoch ==")
        print(f"== delta-fold view: top repo {top['repo']} has "
              f"{top['n_rows']} paths / {top['total_chars']} chars, "
              f"folded per epoch — never re-aggregated ==")

        # --- 6f. the table as FIRST-CLASS Spark formats: tail the
        # changelog with readStream (each MOR commit's delta files ARE
        # the epoch's change set), relay it into a replica, and read
        # the replica back through the batch format with Catalyst
        # filter pushdown driving stats-based file skipping
        from rook_spark.lake.replicate import replicate
        from rook_spark.lake.source import LakeTableDataSource
        from rook_spark.lake.stream import LakeChangeDataSource

        spark.dataSource.register(LakeChangeDataSource)
        spark.dataSource.register(LakeTableDataSource)
        feed = (spark.read.format("rook_lake_changes")
                .option("path", os.path.join(work, "repos_d"))
                .option("start_version", -1).load())
        n_feed = feed.count()
        qr = replicate(spark, os.path.join(work, "repos_d"),
                       os.path.join(work, "replica"),
                       os.path.join(work, "relay_ckpt"))
        qr.processAllAvailable()
        qr.stop()
        replica = (spark.read.format("rook_lake")
                   .load(os.path.join(work, "replica")))
        n_rep, n_src = replica.count(), eng_d.target().read().count()
        assert n_rep == n_src
        print(f"\n== change feed: {n_feed} rows across "
              f"{feed.select('commit_version').distinct().count()} commits; "
              f"relay replica == source ({n_rep} rows), read back via "
              f"format('rook_lake') with pushdown ==")

        # --- 7. same engine logic, different catalog: zero _meta/ on disk
        store = InMemoryMetadataStore()
        mem = LakeTable.create(
            spark, os.path.join(work, "mem"), table.snapshot().schema(),
            key_cols=table.snapshot().key_cols, n_buckets=8, store=store,
        )
        mem.merge(table.read().withColumn("op", F.lit("U")), batch_id=0)
        assert mem.read().count() == table.read().count()
        print(
            f"\n== catalog seam: {mem.read().count()} rows via "
            f"InMemoryMetadataStore ({len(store.versions())} versions, "
            "no _meta directory) =="
        )
        # ...and the seam's CAS: a zombie writer racing a commit loses
        # LOUDLY instead of silently clobbering the winner's commit
        from rook_spark.lake.metastore import CommitConflict

        snap = mem.snapshot()
        try:
            store.commit(snap.version + 1, snap.to_json(),
                         expected_parent=snap.version - 1)  # stale parent
            raise AssertionError("unreachable")
        except CommitConflict as exc:
            print(f"two-writer race -> {type(exc).__name__}: {exc}")

        # --- 8. incremental consumer: bounded scan via file-level stats.
        # Files whose footer says "every ordinal in here predates the
        # watermark" are skipped before Spark lists them. The shape that
        # makes this matter: a broad historical load, then small epochs
        # touching few keys — the steady state of any big CDC table
        # (the tour's main table was just compacted/rebucketed, i.e.
        # fully rewritten, so every file there spans every ordinal).
        inc_t = LakeTable.create(
            spark, os.path.join(work, "inc"), table.snapshot().schema(),
            key_cols=table.snapshot().key_cols, n_buckets=16,
        )
        bulk = (
            table.read()
            .withColumn("op", F.lit("U"))
            .withColumn("__ordinal", F.lit(1)).withColumn("__offset", F.lit(1))
        )
        inc_t.merge(bulk, 0)
        narrow = (
            table.read().orderBy("repo", "path").limit(5)  # a handful of keys
            .withColumn("content", F.lit("hotfix"))
            .withColumn("op", F.lit("U"))
            .withColumn("__ordinal", F.lit(2)).withColumn("__offset", F.lit(2))
        )
        inc_t.merge(narrow, 1)
        changed = (
            inc_t.read(ranges={"__ordinal": (2, None)}, include_internal=True)
            .where(F.col("__ordinal") >= 2)
        )
        n_files_all = inc_t.read().select(F.input_file_name()).distinct().count()
        n_files_inc = changed.select(F.input_file_name()).distinct().count()
        print(
            f"\n== incremental scan (ordinal >= watermark): "
            f"{changed.count()} rows from {n_files_inc}/{n_files_all} files "
            "(footer stats skip every bucket the hotfix epoch didn't touch) =="
        )
        assert n_files_inc < n_files_all

        # --- 9. dedup index maintained FROM the change feed (run on a
        # fresh engine so every epoch flows through the sink)
        from rook_spark.cdc.dedup_index import DedupIndex

        eng2 = CdcEngine(
            spark, os.path.join(work, "repos2"), n_buckets=4
        ).ignoring_servers(99)
        idx = DedupIndex(spark, os.path.join(work, "sigs"), n_buckets=4)
        eng2.with_sink("dedup_index", idx.sink(), when="before")
        eng2.replay(events.where(F.col("offset") < 16_000), 0)
        eng2.replay(events.where(F.col("offset") >= 16_000), 1)
        n_idx = idx.signatures().count()
        n_tab = eng2.target().read().count()
        assert n_idx == n_tab
        batch = eng2.target().read().limit(50)
        cands = idx.candidates(idx.compute_signatures(batch)).count()
        print(
            f"== dedup index: {n_idx} signatures in lockstep with "
            f"{n_tab} rows; {cands} near-dup candidate pairs for a "
            "50-doc probe batch =="
        )
        # --- 10. write-audit-publish: consumers only ever see audited
        # epochs; a failed audit rolls back and re-admits the offsets
        from rook_spark.cdc.engine import AuditFailed

        def no_poison(t):
            return (
                t.read(ref="head")
                .where(F.col("content").startswith("POISON"))
                .limit(1).count() == 0
            )

        eng3 = CdcEngine(
            spark, os.path.join(work, "repos3"), n_buckets=4, audit=no_poison
        ).ignoring_servers(99)
        eng3.replay(events.where(F.col("offset") < 16_000), 0)
        wap = eng3.target()
        published = wap.read().count()
        poisoned = events.where(F.col("offset") >= 16_000).withColumn(
            "after",
            F.when(
                F.col("after").isNotNull(),
                F.col("after").withField(
                    "content", F.concat(F.lit("POISON|"), F.col("after.content"))
                ),
            ),
        )
        try:
            eng3.replay(poisoned, 1)
        except AuditFailed as exc:
            print(f"\n== WAP: audit rejected epoch -> {exc} ==")
        assert wap.read().count() == published  # nothing leaked
        eng3.replay(events.where(F.col("offset") >= 16_000), 1)  # clean retry
        print(
            f"WAP: clean retry published; consumers went "
            f"{published} -> {wap.read().count()} rows without ever seeing poison"
        )
        # --- 11. zero-copy clone: fork the table + its CDC watermarks in
        # one metadata commit; re-replaying the FULL log on the fork
        # admits exactly the post-fork suffix (what-if replay at 100 TB
        # = one commit + the suffix, never a table copy)
        fork_tbl = LakeTable.clone(
            spark, os.path.join(work, "repos3"), os.path.join(work, "fork")
        )
        assert os.listdir(os.path.join(fork_tbl.path, "data")) == []
        eng4 = CdcEngine(
            spark, os.path.join(work, "fork"), n_buckets=4
        ).ignoring_servers(99)
        stats = eng4.replay(events, 2)  # full log: prefix fenced out
        assert stats.rows_in == 0  # everything already applied pre-fork
        assert eng4.target().read().count() == wap.read().count()
        print(
            "== clone: zero-copy fork re-replayed the full log; "
            f"watermarks admitted {stats.rows_in} rows (all pre-fork) =="
        )
        # --- 12. atomic multi-table epochs: one shared-pointer catalog,
        # a failure between two tables' applies publishes NOTHING (the
        # torn-epoch window is unrepresentable, not just masked)
        from rook_spark.cdc.engine import MultiTableCdcEngine
        from rook_spark.lake.catalog import LakeCatalog

        cat = LakeCatalog(os.path.join(work, "catalog"))
        cat.init()
        demux = events.unionByName(events.withColumn(
            "table_name",
            F.when(F.col("table_name") == "repos", "meta")
            .otherwise(F.col("table_name")),
        ))
        multi = MultiTableCdcEngine(
            spark, os.path.join(work, "multi"), ("rook.repos", "rook.meta"),
            catalog=cat, n_buckets=4,
        ).ignoring_servers(99)
        multi.replay(demux.where(F.col("offset") < 16_000))
        v_before = multi.target("rook.repos").current_version()
        orig = multi.engines["rook.meta"].replay

        def die(*a, **k):
            raise RuntimeError("crash between the two tables' applies")

        multi.engines["rook.meta"].replay = die
        try:
            multi.replay(demux.where(F.col("offset") >= 16_000))
        except RuntimeError:
            pass
        assert multi.target("rook.repos").current_version() == v_before
        multi.engines["rook.meta"].replay = orig
        multi.replay(demux.where(F.col("offset") >= 16_000))
        ra = multi.target("rook.repos")
        rb = multi.target("rook.meta")
        assert ra.last_committed_batch() == rb.last_committed_batch()
        print(
            "== catalog: epoch torn mid-group published NOTHING; after "
            f"re-delivery both tables sit at batch {ra.last_committed_batch()} "
            f"with {ra.read().count()} == {rb.read().count()} rows =="
        )
        # --- 13. CHECK constraints: the data contract in the data plane.
        # Violating events dead-letter BEFORE the LWW reduce; clean rows
        # apply; offsets are consumed so re-delivery never re-judges.
        eng5 = CdcEngine(
            spark, os.path.join(work, "guarded"), n_buckets=4,
            constraints={"no_md": "lang <> 'md'"},
            constraint_mode="dead_letter",
        ).ignoring_servers(99)
        s = eng5.replay(events, 0)
        guarded = eng5.target()
        assert guarded.read().where("lang = 'md'").count() == 0
        dl = spark.read.parquet(
            os.path.join(work, "guarded", "_dead_letter", "constraints"))
        assert dl.count() == s.dead_lettered > 0
        # exact count(*) straight from the manifest (no deltas pending)
        assert guarded.row_count() == guarded.read().count()
        print(
            f"== constraints: {s.dead_lettered} violating events "
            f"dead-lettered (names: "
            f"{dl.select('__violated').first()[0]}); guarded table holds "
            f"{guarded.row_count()} rows (row_count answered from "
            "footer metadata) =="
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
