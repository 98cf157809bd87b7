"""CdcEngine — the public facade (rook's ``ReplicationStream`` analog).

API ergonomics mirror the reference
(``rook-api/.../ReplicationStream.java:24-33``: connect / registerListener
/ disconnect; usage ``readme.md:29-34``) but Spark-idiomatic:

    engine = (CdcEngine(spark, target_path)
              .tracking("rook.repos")
              .ignoring_servers(99)
              .with_sink("metrics", fn))          # registerListener analog
    engine.replay(events_df)                      # batch replay
    q = engine.stream(source_dir, checkpoint_dir) # connect() analog
    q.processAllAvailable(); q.stop()             # disconnect() analog

Listener fan-out with per-sink error isolation (K1,
``MySQLReplicationStream.java:161-179``): each registered sink runs per
batch inside try/except; a failing sink is logged to a dead-letter
parquet table and never stops the stream or the primary MERGE sink.

Designed out — ``groupEventsByTX`` toggle
(``MySQLReplicationStream.java:66,82-84``; per-statement vs per-TX
listener delivery, ``h4com/IntegrationTest.java:355-385``): the epoch is
this engine's delivery unit and strictly contains whole tx groups
(SURVEY.md §2.4), so epoch delivery is the strongest of the three
granularities; sinks needing statement- or tx-level views derive them
from the batch's ``tx_id``/``offset`` columns declaratively (see the
``cdc_tx_group`` query) instead of a push-mode toggle.
"""

from __future__ import annotations

import os
import traceback
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from rook_spark.cdc import schema as cdc_schema
from rook_spark.cdc.apply import ApplyStats, apply_batch, watermark_filter
from rook_spark.cdc.normalize import filter_events, flatten_events
from rook_spark.lake.table import LakeTable

# (flat_batch, batch_id) -> None; sinks maintaining their own fenced
# table additionally declare run_id (see CdcEngine.with_sink)
SinkFn = Callable[..., Any]


class AuditFailed(RuntimeError):
    """An epoch's write-audit-publish audit rejected the staged state.

    The engine has already rolled the table back to the published
    version (consumers never saw the rejected epoch) and the reverted
    watermarks re-admit the epoch's offsets — after fixing the upstream
    cause, re-deliver the same offset range to retry."""

    def __init__(self, batch_id: int):
        self.batch_id = batch_id
        super().__init__(
            f"audit rejected staged epoch (batch {batch_id}); table rolled "
            "back to the published version, offsets re-admitted for retry"
        )


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        target_path: str,
        key_cols: tuple[str, ...] = cdc_schema.KEY_COLS,
        n_buckets: int = 32,
        salted: bool = False,
        n_salts: int = 16,
        dead_letter_path: str | None = None,
        cache_batches: bool = False,
        write_mode: str = "cow",
        compact_every: int | None = None,
        compact_depth: int | None = None,
        n_source_partitions: int | None = None,
        cluster_zorder: list[str] | tuple[str, ...] | None = None,
        bloom_cols: list[str] | tuple[str, ...] | None = None,
        vacuum_every: int | None = None,
        vacuum_keep_last: int = 4,
        vacuum_min_age_s: float = 3600.0,
        audit: Callable[[LakeTable], bool] | None = None,
        row_image: str = "full",
        store=None,
        constraints: dict[str, str] | None = None,
        constraint_mode: str = "fail",
    ):
        self.spark = spark
        self.target_path = target_path
        # optional MetadataStore for the target table (e.g. a
        # LakeCatalog table store for atomic multi-table epochs);
        # None = the table's default POSIX layout
        self.store = store
        self.key_cols = tuple(key_cols)
        self.n_buckets = n_buckets
        self.salted = salted
        self.n_salts = n_salts
        self.dead_letter_path = dead_letter_path or os.path.join(target_path, "_dead_letter")
        self.tracked_tables: tuple[str, ...] = ("rook.repos",)
        self.ignored_server_ids: tuple[int, ...] = ()
        self.policy = None  # per-row KEEP/SKIP/REMOVE interceptor column
        # name -> (fn, phase, wants_run_id); phase ∈ {"before", "after"}
        # relative to the table commit (see with_sink)
        self.sinks: dict[str, tuple[SinkFn, str, bool]] = {}
        self.stats: list[ApplyStats] = []
        # "cow" rewrites touched buckets per epoch (read-optimized);
        # "mor" appends delta files and resolves at read (write cost
        # O(batch) — the 10^10-event path), bounded by compaction every
        # `compact_every` epochs (None = manual compact()).
        self.write_mode = write_mode
        self.compact_every = compact_every
        # depth-TRIGGERED maintenance (vs compact_every's cadence): after
        # each epoch, compact exactly the buckets whose delta chain
        # reached `compact_depth` files — an O(buckets) metadata probe,
        # no Spark job when nothing qualifies. Work is proportional to
        # the BACKLOG, not the cadence: a skewed stream that hammers two
        # buckets folds those two and leaves the other 4094 alone, while
        # a cadence pass would rewrite every delta-carrying bucket each
        # period. Composes with compact_every (cadence as the floor for
        # cold buckets, depth as the cap for hot ones).
        if compact_depth is not None and compact_depth < 1:
            raise ValueError(f"compact_depth must be >= 1, got {compact_depth}")
        self.compact_depth = compact_depth
        # with cluster_zorder set (e.g. ["__ordinal"]), the periodic
        # maintenance pass z-orders the buckets it compacts instead of
        # bin-packing them flat — the same rewrite cost buys tight
        # per-file stats, so bounded incremental scans (ordinal >
        # watermark) keep pruning as the stream runs (lake/table.py
        # cluster; a Delta auto-OPTIMIZE ZORDER analog)
        self.cluster_zorder = list(cluster_zorder) if cluster_zorder else None
        # bloom_cols forwards to LakeTable.create on first target()
        # materialization: per-file equality filters for point lookups
        # (read(points=...)) on non-key columns, e.g. "commit"
        self.bloom_cols = list(bloom_cols) if bloom_cols else None
        # retention cadence: every `vacuum_every` epochs the engine
        # expires snapshots past `vacuum_keep_last` and reclaims
        # unreferenced files/blobs — a long-running stream otherwise
        # accumulates every historical version forever (COW: one file
        # set per touched bucket per epoch). The default grace
        # (vacuum_min_age_s=3600) is the in-flight-commit protection
        # for a concurrent maintenance service (see LakeTable.vacuum);
        # tagged snapshots are retained regardless. None = manual
        # vacuum() only.
        self.vacuum_every = vacuum_every
        self.vacuum_keep_last = vacuum_keep_last
        self.vacuum_min_age_s = vacuum_min_age_s
        self._epochs_since_vacuum = 0
        # cadence vacuum that came due INSIDE a catalog group (deferred
        # there because physical deletes cannot be staged); drained by
        # run_due_vacuum() after the group flips
        self._vacuum_due = False
        # known static source-partition count (Kafka topic partitions /
        # binlog shard count) unlocks the single-job MOR epoch
        self.n_source_partitions = n_source_partitions
        # table CHECK constraints (forwarded to LakeTable.create on first
        # target materialization) + enforcement mode: 'fail' poisons the
        # epoch loudly (ConstraintViolation, nothing written — the Delta
        # invariant behavior), 'dead_letter' routes violating EVENTS to
        # <dead_letter_path>/constraints and applies the clean remainder
        # — the data-contract stance for a replication stream that must
        # not stall on one bad upstream row (same philosophy as the
        # per-sink dead-letter, rook's listener error isolation,
        # MySQLReplicationStream.java:161-179).
        if constraint_mode not in ("fail", "dead_letter"):
            raise ValueError(
                f"constraint_mode must be 'fail' or 'dead_letter', "
                f"got {constraint_mode!r}")
        self.constraints = dict(constraints) if constraints else None
        self.constraint_mode = constraint_mode
        self._epochs_since_compact = 0
        # caching the normalized batch trades a full in-memory
        # materialization (~row-size × batch, bandwidth-heavy) against
        # re-running the normalize scan per action. The scan is columnar
        # + codegen and usually CHEAPER than the materialization, so the
        # default is off; turn on when auxiliary sinks make many passes.
        self.cache_batches = cache_batches
        # WRITE-AUDIT-PUBLISH (Iceberg WAP via LakeTable refs): when set,
        # every epoch commits STAGED — default readers keep resolving the
        # published ref — then `audit(table)` inspects the head
        # (read(ref="head") / changes()); True publishes (fast-forward,
        # keep_staging so the next epoch stays gated), False or an
        # exception aborts: the table rolls back to the published
        # version, the reverted watermarks re-admit the epoch's offsets,
        # and AuditFailed propagates. Consumers NEVER observe an
        # unaudited epoch — rook's two-phase listener guarantee lifted
        # to table visibility.
        self.audit = audit
        # "minimal" (binlog_row_image=MINIMAL / Debezium updatedFields):
        # update events carry an `updated_cols` mask naming their
        # authoritative after-image columns; epochs fold per column
        # (cdc/patch.py) and the COW merge completes patches against
        # stored state. COW-only — a patch is not self-contained, so MOR
        # deltas would push the fold into every read (merge_mor rejects).
        # Key-changing updates under minimal images: the D+I split keeps
        # the mask, so the row at its NEW key carries only event-set
        # columns — inheritance never crosses keys (ship key-changing
        # updates full-image, as production MySQL does, to avoid this).
        if row_image not in ("full", "minimal"):
            raise ValueError(f"row_image must be 'full' or 'minimal', got {row_image!r}")
        if row_image == "minimal" and write_mode != "cow":
            raise ValueError(
                "row_image='minimal' requires write_mode='cow': patch "
                "events are not self-contained, so MOR delta files would "
                "defer the per-column fold to every read (see "
                "rook_spark.cdc.patch)"
            )
        self.row_image = row_image

    # ------------------------------------------------------------ configure

    def tracking(self, *tables: str) -> "CdcEngine":
        self.tracked_tables = tuple(tables)
        return self

    def ignoring_servers(self, *server_ids: int) -> "CdcEngine":
        """P1 filter config (``MySQLReplicationStream.java:90-92``)."""
        self.ignored_server_ids = tuple(server_ids)
        return self

    def with_policy(self, policy) -> "CdcEngine":
        """Per-row indexing interceptor (rook's
        ``EntityIndexingInterceptor`` / ``IndexingDirective``,
        ``DefaultRowsMutationIndexer.java:129-144``): a Column expression
        over the flattened event yielding 'KEEP' | 'SKIP' | 'REMOVE'.
        SKIP rows never touch the target table (but still reach sinks and
        advance the watermark — suppressSelfIndexing semantics); REMOVE
        rows purge their key even when the event op is 'U'/'I'."""
        self.policy = policy
        return self

    def with_sink(self, name: str, fn: SinkFn, when: str = "after",
                  pass_run_id: bool | None = None) -> "CdcEngine":
        """Register an auxiliary listener (K1/K2 fan-out). ``fn`` gets the
        *normalized, watermark-filtered* batch DataFrame and the batch id
        — the SAME event set the table MERGE applies, so a re-delivered
        batch fans out as empty rather than double-counting.

        ``when`` picks the delivery phase relative to the table commit,
        which decides the guarantee at CRASH boundaries:

        - ``"before"`` — event-fed sinks (metrics, forwarding): delivered
          before the commit, so a crash in between re-delivers the rows
          on restart — at-least-once; duplicates only in the crash
          window, never in normal operation.
        - ``"after"`` (default) — state-fed sinks (the derived rollups,
          which read the freshly-committed table): a crash between commit
          and fan-out loses that one fan-out (at-most-once); recompute
          style sinks repair on the next batch touching the same keys, or
          explicitly via ``Rollup.refresh``/``full_recompute`` after an
          unclean restart.

        Both beat losing the batch silently in steady state; pick the
        phase that matches what the sink reads.

        A sink whose callable declares a parameter NAMED ``run_id``
        (positional-or-keyword, keyword-only, or via ``**kwargs``) is
        additionally handed the epoch's checkpoint-scoped ``run_id`` as
        a keyword argument (same value the table's batch fence is
        scoped to) — required by any sink that maintains its OWN fenced
        table (e.g. ``DedupIndex``): without it a restart from a fresh
        checkpoint restarts batch ids at 0 and a run-unscoped fence
        would silently drop every genuinely-new batch until the counter
        caught up. Detection is by the parameter's NAME, never by arity
        (a third parameter that happens to exist — ``lambda df, bid,
        log=LOG`` — is left alone), and ``pass_run_id=True/False``
        overrides the inference either way.
        """
        import inspect

        if when not in ("before", "after"):
            raise ValueError(f"when must be 'before' or 'after', got {when!r}")
        wants_run_id = pass_run_id
        if wants_run_id is None:
            try:
                params = inspect.signature(fn).parameters
                wants_run_id = "run_id" in params or any(
                    p.kind == p.VAR_KEYWORD for p in params.values()
                )
            except (TypeError, ValueError):
                wants_run_id = False
        self.sinks[name] = (fn, when, bool(wants_run_id))
        return self

    def without_sink(self, name: str) -> "CdcEngine":
        """Unregister an auxiliary listener
        (``ReplicationStream.unregisterListener``,
        ``rook-api/.../ReplicationStream.java:28-31``). Loud on unknown
        names — silently "removing" a sink that was never registered (or
        already removed) is exactly the kind of config drift that loses
        a downstream feed without a trace."""
        if name not in self.sinks:
            raise KeyError(
                f"no sink named {name!r} registered (have: {sorted(self.sinks)})"
            )
        del self.sinks[name]
        return self

    def sink_names(self) -> tuple[str, ...]:
        """Registered listener names, in registration order."""
        return tuple(self.sinks)

    def metrics(self) -> DataFrame:
        """Per-epoch apply metrics of THIS engine instance as a DataFrame
        (batch id, fence skips, rows in/applied, touched buckets, committed
        version) — the in-process ops view; the durable cross-restart
        counterpart is ``target().lineage()`` (per-partition cumulative
        watermark/rows/bytes) and ``target().history()`` (per-version
        commit log)."""
        rows = [
            (s.batch_id, s.skipped, s.rows_in, s.rows_applied,
             s.touched_buckets, s.version)
            for s in self.stats
        ]
        return self.spark.createDataFrame(
            rows,
            "batch_id long, skipped boolean, rows_in long, rows_applied long, "
            "touched_buckets int, version int",
        )

    # --------------------------------------------------------------- target

    def target(self, payload_schema=None) -> LakeTable:
        t = LakeTable(self.spark, self.target_path, store=self.store)
        if t.current_version() >= 0:
            return t
        return LakeTable.create(
            self.spark,
            self.target_path,
            payload_schema or cdc_schema.repos_schema(),
            key_cols=self.key_cols,
            n_buckets=self.n_buckets,
            bloom_cols=self.bloom_cols,
            store=self.store,
            constraints=self.constraints,
        )

    # ---------------------------------------------------------------- apply

    def _apply(
        self, events: DataFrame, batch_id: int, observe_bytes: bool = True,
        run_id: str = "",
    ) -> ApplyStats:
        ev = filter_events(
            events,
            tracked_tables=self.tracked_tables,
            ignored_server_ids=self.ignored_server_ids,
        )
        if self.cache_batches or self.sinks:
            ev.persist()
        try:
            target = self.target()
            # The fan-out set is watermark-filtered against PRE-apply
            # lineage (the same rows the MERGE applies): in normal
            # operation a re-delivered batch fans out EMPTY. Computed
            # once; delivered in two phases around the commit — see
            # with_sink for the delivery-guarantee difference.
            flat_fresh = None
            if self.sinks:
                snap = target.snapshot()
                # mirror apply_batch's fence: a batch the MERGE will drop
                # must not reach sinks either ('the SAME event set the
                # table applies'); re-deliveries with fresh data fall
                # through to the watermark filter exactly like the MERGE
                fenced = batch_id <= snap.batch_id and run_id == snap.run_id
                if not fenced:
                    fresh = watermark_filter(ev, snap.lineage)
                    flat_fresh = flatten_events(fresh, self.key_cols)
                    self._fan_out(flat_fresh, batch_id, phase="before", run_id=run_id)
            if self.audit is not None and not target.is_staging():
                target.begin_staging()
            stats = apply_batch(
                target,
                ev,
                batch_id,
                key_cols=self.key_cols,
                salted=self.salted,
                n_salts=self.n_salts,
                observe_bytes=observe_bytes,
                write_mode=self.write_mode,
                n_source_partitions=self.n_source_partitions,
                run_id=run_id,
                policy=self.policy,
                row_image=self.row_image,
                constraint_mode=self.constraint_mode,
                dead_letter_path=self.dead_letter_path,
            )
            if self.audit is not None:
                ok = False
                try:
                    ok = bool(self.audit(target))
                finally:
                    if ok:
                        target.publish(keep_staging=True)
                    else:
                        target.abort_staging()
                if not ok:
                    raise AuditFailed(batch_id)
            if self.write_mode == "mor" and self.compact_every:
                self._epochs_since_compact += 1
                if self._epochs_since_compact >= self.compact_every:
                    t = self.target()
                    if self.cluster_zorder:
                        # z-ordering compaction: rewrite the buckets
                        # carrying unfolded deltas, clustered — same IO
                        # as the fold compact would do, tight per-file
                        # stats afterwards. Delta-carrying buckets ONLY:
                        # clustering leaves ~target_files_per_bucket
                        # files per bucket by design, so a file-count
                        # heuristic would re-rewrite every
                        # already-clustered bucket each cadence
                        snap = t.snapshot()
                        pending = sorted(
                            int(b) for b, fs in snap.deltas.items() if fs
                        )
                        if pending:
                            t.cluster(self.cluster_zorder, buckets=pending)
                    else:
                        t.compact()
                    self._epochs_since_compact = 0
            if self.write_mode == "mor" and self.compact_depth:
                t = self.target()
                snap = t.snapshot()
                deep = sorted(
                    int(b) for b, fs in snap.deltas.items()
                    if len(fs) >= self.compact_depth
                )
                if deep:
                    # same zorder upgrade as the cadence pass: the
                    # rewrite IO is identical, clustered output buys
                    # tight per-file stats on exactly the hot buckets
                    if self.cluster_zorder:
                        t.cluster(self.cluster_zorder, buckets=deep)
                    else:
                        t.compact(buckets=deep)
            if self.vacuum_every:
                self._epochs_since_vacuum += 1
                if self._epochs_since_vacuum >= self.vacuum_every:
                    probe = getattr(self.store, "in_active_group", None)
                    if probe is not None and probe():
                        # vacuum physically deletes, which cannot join an
                        # atomic catalog group (a later abort could not
                        # un-delete bytes the durable snapshot needs) —
                        # DEFER it past the group flip instead of failing
                        # the epoch; MultiTableCdcEngine drains the flag
                        # right after its group, other group owners call
                        # run_due_vacuum() themselves
                        self._vacuum_due = True
                    else:
                        self.target().vacuum(
                            keep_last=self.vacuum_keep_last,
                            min_age_s=self.vacuum_min_age_s,
                        )
                    self._epochs_since_vacuum = 0
            if flat_fresh is not None:
                self._fan_out(flat_fresh, batch_id, phase="after", run_id=run_id)
        finally:
            if self.cache_batches or self.sinks:
                ev.unpersist()
        self.stats.append(stats)
        return stats

    def run_due_vacuum(self) -> bool:
        """Drain a cadence vacuum that came due inside an atomic catalog
        group (``_apply`` defers it there — physical deletes cannot be
        staged, because a later group abort could not un-delete bytes
        the still-durable snapshot needs). Call AFTER the group flips;
        :class:`MultiTableCdcEngine` does so automatically. Idempotent;
        returns True iff a deferred vacuum ran."""
        if not self._vacuum_due:
            return False
        self._vacuum_due = False
        self.target().vacuum(
            keep_last=self.vacuum_keep_last,
            min_age_s=self.vacuum_min_age_s,
        )
        return True

    def _fan_out(self, flat: DataFrame, batch_id: int, phase: str = "after",
                 run_id: str = "") -> None:
        """Per-sink error isolation + dead-letter
        (``MySQLReplicationStream.java:167-176``). Sinks that declared a
        third positional parameter receive the checkpoint-scoped run_id
        (see with_sink)."""
        for name, (fn, when, wants_run_id) in self.sinks.items():
            if when != phase:
                continue
            try:
                fn(flat, batch_id, run_id=run_id) if wants_run_id else fn(flat, batch_id)
            except Exception as exc:  # noqa: BLE001 — isolation is the point
                dead = self.spark.createDataFrame(
                    [(int(batch_id), name, str(exc), traceback.format_exc())],
                    "batch_id long, sink string, error string, trace string",
                ).withColumn("ts", F.current_timestamp())
                dead.write.mode("append").parquet(self.dead_letter_path)

    # ------------------------------------------------------------- bootstrap

    def bootstrap(
        self,
        snapshot_df: DataFrame,
        as_of_offsets: dict[int, int] | int,
        as_of_ordinal: int | None = None,
    ) -> ApplyStats:
        """Initial load for the standard CDC deployment shape
        (consistent snapshot → tail; Debezium's snapshot phase, rook's
        assumption of a pre-existing synchronized DB): write
        ``snapshot_df`` (one row per key — the source state as of a
        known log position) as the table's FIRST commit, with the
        per-partition offset watermarks in the SAME atomic snapshot.

        ``as_of_offsets``: the log position the snapshot is consistent
        with — a per-source-partition dict, or a single int applied to
        every partition in ``range(n_source_partitions)`` (requires
        ``n_source_partitions`` at construction — loud instead of
        guessing the partition set).

        Because the watermarks commit WITH the data, a tail that
        overlaps the snapshot range (Debezium always resumes from
        before the snapshot position) is deduplicated by
        ``watermark_filter`` before it reaches the MERGE — including
        stale upserts for keys deleted inside the overlap window, which
        closes the deleted-key resurrection caveat documented on
        :meth:`LakeTable.merge` for bootstrap-then-tail flows.

        Every snapshot row carries ``as_of_ordinal`` as its stored LWW
        commit ordinal. **Its default is 0, NOT an offset**: offsets
        (Kafka positions, binlog coordinates) and commit ordinals (the
        LWW domain) are different number lines — defaulting the snapshot
        ordinal from the offsets would FREEZE bootstrapped keys whenever
        offsets run numerically ahead of ordinals, because every genuine
        tail update would lose ``s_ord >= t_ord`` in the MERGE. With 0,
        every tail change (ordinal > 0) wins over the snapshot image —
        correct, since the watermark filter already guarantees nothing
        at-or-below the snapshot position reaches the MERGE. Pass an
        explicit ``as_of_ordinal`` (in the ``commit_ordinal`` domain)
        only if you also need ordinal-level protection against
        out-of-contract feeds that bypass the watermark.
        Lineage ``rows_applied``/``bytes`` stay 0 — they count
        replicated CHANGE events, and a snapshot applies none.
        """
        if LakeTable.exists(self.target_path):
            raise ValueError(
                f"bootstrap must be the target's first write, but a table "
                f"already exists at {self.target_path!r} — replay/stream "
                f"into it instead, or bootstrap a fresh path"
            )
        if isinstance(as_of_offsets, int):
            if self.n_source_partitions is None:
                raise ValueError(
                    "single-int as_of_offsets needs n_source_partitions "
                    "set on the engine (the partition set cannot be "
                    "inferred from a snapshot, which carries no events)"
                )
            as_of = {p: int(as_of_offsets) for p in range(self.n_source_partitions)}
        else:
            as_of = {int(p): int(o) for p, o in as_of_offsets.items()}
        if not as_of:
            raise ValueError("as_of_offsets must name at least one partition")
        ordinal = int(0 if as_of_ordinal is None else as_of_ordinal)

        table = self.target(payload_schema=snapshot_df.schema)
        changes = (
            snapshot_df.withColumn("op", F.lit("U"))
            .withColumn("__ordinal", F.lit(ordinal).cast("long"))
            .withColumn("__offset", F.lit(ordinal).cast("long"))
        )
        lineage_update = {
            p: {"last_applied_offset": o, "rows_applied": 0, "bytes": 0}
            for p, o in as_of.items()
        }
        result = table.merge(
            changes, batch_id=0, op_col="op", lineage_update=lineage_update,
            validate_cardinality=True,
        )
        stats = ApplyStats(
            batch_id=0,
            skipped=bool(result.get("skipped")),
            rows_in=0,
            rows_applied=0,
            touched_buckets=int(result.get("touched_buckets", 0)),
            version=int(result.get("version", -1)),
        )
        self.stats.append(stats)
        return stats

    # ---------------------------------------------------------------- batch

    def replay(self, events: DataFrame, start_batch_id: int | None = None) -> ApplyStats:
        """Batch-mode replay: apply one event DataFrame as one epoch."""
        bid = (
            self.target().last_committed_batch() + 1
            if start_batch_id is None
            else start_batch_id
        )
        return self._apply(events, bid)

    # ------------------------------------------------------------ streaming

    def stream(
        self,
        source_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
        evolved: bool = False,
    ) -> StreamingQuery:
        """Tail a directory of event parquet files as a Structured
        Streaming source (the sandbox stand-in for the binlog/Kafka tail,
        SURVEY.md S1) and apply each micro-batch via foreachBatch.

        Schema-evolution stance (SURVEY.md §7.4): the read schema is
        **pre-widened** (``evolved=True``) so files that do not yet carry
        the new column null-fill it — a new column appearing mid-stream
        never breaks the running query; the target table widens on the
        first batch where the column is non-null-typed.
        Exactly-once: checkpoint tracks file offsets; re-delivered
        batches hit the batch-id fence (scoped to THIS checkpoint's
        lineage via run_id — a fresh checkpoint dir restarts batch ids at
        0, so cross-checkpoint fencing would drop new events); re-delivered
        *events* (source duplicates) hit the lineage watermark filter.
        """
        from rook_spark.sources import stream_events_files

        src = stream_events_files(
            self.spark, source_dir, max_files_per_trigger=max_files_per_trigger,
            evolved=evolved,
            # a minimal-row-image engine tails with the mask column in
            # the read schema (full-image chunk files null-fill it, so a
            # mixed log still streams — NULL mask = full image)
            partial=self.row_image == "minimal",
        )
        return self.stream_events(src, checkpoint_dir)

    def stream_events(self, events: DataFrame, checkpoint_dir: str) -> StreamingQuery:
        """Apply ANY canonical-schema streaming DataFrame via foreachBatch —
        the transport-agnostic half of S1. ``stream`` (file tail) and the
        Kafka tail both terminate here:

            engine.stream_events(
                sources.parse_kafka_records(raw_kafka_stream), ckpt)

        runs the identical wiring ``stream_events_kafka`` produces, so the
        full Kafka path minus the jar-gated ``.format("kafka").load()`` is
        exercisable (and tested) in environments without the connector.
        Exactly-once semantics are per ``stream``: batch-id fence scoped to
        this checkpoint via run_id, event dedup via lineage watermarks.
        """
        run_id = os.path.abspath(checkpoint_dir)
        return (
            # byte accounting rides the write job's Observation exactly as
            # in batch mode (foreachBatch actions notify Observation
            # listeners on this Spark version — round-1's second
            # content-decoding pass per streamed epoch is gone; a delivery
            # miss degrades to a recompute, counted in apply.OBS_FALLBACKS)
            events.writeStream.foreachBatch(
                lambda df, bid: self._apply(df, bid, run_id=run_id)
            )
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )


class MultiTableCdcEngine:
    """One ordered change stream → N per-table lake targets.

    Reference parity: rook's single listener pipeline delivers EVERY
    tracked table's mutations (``MySQLReplicationStream.java:161-179``);
    the per-entity synchronizers then act table by table (cache regions
    per entity, index per class). Spark-first shape: the micro-batch is
    materialized ONCE per epoch (``persist``) and each table's engine
    filters its slice (P2 — a codegen'd predicate, no extra source
    scan) and MERGEs into its own bucketed ``LakeTable`` with its own
    offset-watermark lineage. The per-table MERGEs run SERIALLY by
    design: each MERGE is one Spark job that already parallelizes
    across the whole cluster, so submitting them concurrently would
    only fragment executor capacity among jobs (and race the
    batch-id-named lineage Observations) — the cached batch keeps the
    serial fan-out one-scan. Exactly-once therefore holds PER TABLE
    independently — the same per-listener independence rook gives; a
    cross-table transactional epoch would need a shared catalog commit
    (Iceberg multi-table transactions in production — the per-table
    snapshots here map 1:1 onto that).

    Until it arrives, :meth:`consistent_read` restores the cross-table
    invariant READ-side: a crash between two tables' commits leaves the
    epoch torn (table A at batch ``B``, table B at ``B-1`` until
    re-delivery repairs it), and an aligned read time-travels every
    table to the greatest COMMON epoch fence — see
    :mod:`rook_spark.lake.consistent`.

    Tables whose payload schema differs from the default should be
    created up front via ``target(table, payload_schema=...)`` — the
    engines load-if-exists.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        tables: tuple[str, ...],
        catalog=None,
        **engine_kwargs,
    ):
        """``catalog`` (a :class:`~rook_spark.lake.catalog.LakeCatalog`
        or its in-memory twin): commit every epoch ATOMICALLY across
        the demuxed tables — each table's store hangs off the shared
        pointer map and :meth:`replay` / :meth:`stream` wrap the
        fan-out in one ``catalog.group()``, so a crash mid-epoch leaves
        NO table at the new epoch (the write-side elimination of the
        torn window :meth:`consistent_read` masks read-side). Composes
        with WAP/compaction inside the epoch (staged commits chain);
        retention (``vacuum_every``) composes too — a cadence vacuum
        that comes due mid-group is deferred (the catalog store refuses
        physical deletes mid-group) and drained via
        :meth:`CdcEngine.run_due_vacuum` right after the flip."""
        self.spark = spark
        self.catalog = catalog
        self.engines: dict[str, CdcEngine] = {}
        for t in tables:
            name = t.replace(".", "__")
            store = catalog.store(name) if catalog is not None else None
            self.engines[t] = CdcEngine(
                spark, os.path.join(base_path, name), store=store, **engine_kwargs
            ).tracking(t)

    def ignoring_servers(self, *server_ids: int) -> "MultiTableCdcEngine":
        for e in self.engines.values():
            e.ignoring_servers(*server_ids)
        return self

    def target(self, table: str, payload_schema=None) -> LakeTable:
        return self.engines[table].target(payload_schema)

    def tables(self) -> dict[str, LakeTable]:
        return {t: e.target() for t, e in self.engines.items()}

    def consistent_versions(self, batch_id: int | None = None) -> dict[str, int]:
        """Per-table version picks at the greatest common epoch fence
        (see :mod:`rook_spark.lake.consistent`): the tables all hang off
        ONE stream checkpoint / replay driver, so their batch ids are
        the same number line by construction."""
        from rook_spark.lake.consistent import consistent_versions

        return consistent_versions(self.tables(), batch_id=batch_id)

    def consistent_read(self, batch_id: int | None = None) -> dict[str, DataFrame]:
        """Coordinated time travel across the demuxed tables: every
        returned DataFrame is the state of the SAME epoch, so cross-table
        joins never observe a torn epoch mid-recovery."""
        from rook_spark.lake.consistent import consistent_read

        return consistent_read(self.tables(), batch_id=batch_id)

    def replay(
        self, events: DataFrame, start_batch_id: int | None = None
    ) -> dict[str, ApplyStats]:
        """Apply one epoch to every tracked table — one materialization
        of the batch, N filtered MERGEs; with a ``catalog``, all N
        commits publish in ONE atomic pointer flip (any failure
        discards the whole epoch everywhere)."""
        events.persist()
        try:
            if self.catalog is not None:
                with self.catalog.group():
                    out = {
                        t: e.replay(events, start_batch_id)
                        for t, e in self.engines.items()
                    }
                for e in self.engines.values():
                    e.run_due_vacuum()
                return out
            return {
                t: e.replay(events, start_batch_id) for t, e in self.engines.items()
            }
        finally:
            events.unpersist()

    def stream(
        self,
        source_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
        evolved: bool = False,
    ) -> StreamingQuery:
        """File-tail → all tables. One checkpoint drives the fan-out; each
        table's batch-id fence is scoped to it via run_id, and per-table
        watermarks make re-delivery after a partial epoch (crash between
        two tables' commits) exactly-once per table."""
        from rook_spark.sources import stream_events_files

        src = stream_events_files(
            self.spark, source_dir, max_files_per_trigger=max_files_per_trigger,
            evolved=evolved,
        )
        run_id = os.path.abspath(checkpoint_dir)

        def apply_all(df: DataFrame, bid: int) -> None:
            df.persist()
            try:
                if self.catalog is not None:
                    with self.catalog.group():
                        for e in self.engines.values():
                            e._apply(df, bid, run_id=run_id)
                    for e in self.engines.values():
                        e.run_due_vacuum()
                else:
                    for e in self.engines.values():
                        e._apply(df, bid, run_id=run_id)
            finally:
                df.unpersist()

        return (
            src.writeStream.foreachBatch(apply_all)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )


def await_stream_ready(query: StreamingQuery, timeout_s: float = 30.0,
                       poll_s: float = 0.1) -> StreamingQuery:
    """``connect(timeout)`` / ``isConnected`` parity for the streaming
    entry points (``rook-api/.../ReplicationStream.java:26-32``): block
    until the query has completed at least one trigger — the source is
    demonstrably connected and polling — or raise. A query that dies
    before its first trigger re-raises its own exception (via
    ``awaitTermination``) instead of a generic timeout, so a bad topic /
    path / schema fails with the real cause. Returns the query for
    chaining; ``query.isActive`` is the live ``isConnected`` check
    thereafter."""
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        # progress first: a query that completed its triggers and then
        # stopped cleanly (processAllAvailable+stop in another thread,
        # AvailableNow finishing) DID connect — inactivity alone is not
        # a failure
        if query.recentProgress:
            return query
        if not query.isActive:
            query.awaitTermination()  # surfaces the stream's own exception
            if query.recentProgress:
                return query
            raise RuntimeError("stream terminated before completing a trigger")
        time.sleep(poll_s)
    raise TimeoutError(f"stream not ready within {timeout_s}s")
