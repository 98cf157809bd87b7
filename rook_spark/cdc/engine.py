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

SinkFn = Callable[[DataFrame, int], Any]


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
        n_source_partitions: int | None = None,
    ):
        self.spark = spark
        self.target_path = target_path
        self.key_cols = tuple(key_cols)
        self.n_buckets = n_buckets
        self.salted = salted
        self.n_salts = n_salts
        self.dead_letter_path = dead_letter_path or os.path.join(target_path, "_dead_letter")
        self.tracked_tables: tuple[str, ...] = ("rook.repos",)
        self.ignored_server_ids: tuple[int, ...] = ()
        self.policy = None  # per-row KEEP/SKIP/REMOVE interceptor column
        # name -> (fn, phase); phase ∈ {"before", "after"} the table commit
        self.sinks: dict[str, tuple[SinkFn, str]] = {}
        self.stats: list[ApplyStats] = []
        # "cow" rewrites touched buckets per epoch (read-optimized);
        # "mor" appends delta files and resolves at read (write cost
        # O(batch) — the 10^10-event path), bounded by compaction every
        # `compact_every` epochs (None = manual compact()).
        self.write_mode = write_mode
        self.compact_every = compact_every
        # known static source-partition count (Kafka topic partitions /
        # binlog shard count) unlocks the single-job MOR epoch
        self.n_source_partitions = n_source_partitions
        self._epochs_since_compact = 0
        # caching the normalized batch trades a full in-memory
        # materialization (~row-size × batch, bandwidth-heavy) against
        # re-running the normalize scan per action. The scan is columnar
        # + codegen and usually CHEAPER than the materialization, so the
        # default is off; turn on when auxiliary sinks make many passes.
        self.cache_batches = cache_batches

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

    def with_sink(self, name: str, fn: SinkFn, when: str = "after") -> "CdcEngine":
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
        """
        if when not in ("before", "after"):
            raise ValueError(f"when must be 'before' or 'after', got {when!r}")
        self.sinks[name] = (fn, when)
        return self

    # --------------------------------------------------------------- target

    def target(self, payload_schema=None) -> LakeTable:
        if LakeTable.exists(self.target_path):
            return LakeTable.load(self.spark, self.target_path)
        return LakeTable.create(
            self.spark,
            self.target_path,
            payload_schema or cdc_schema.repos_schema(),
            key_cols=self.key_cols,
            n_buckets=self.n_buckets,
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
                    self._fan_out(flat_fresh, batch_id, phase="before")
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
            )
            if self.write_mode == "mor" and self.compact_every:
                self._epochs_since_compact += 1
                if self._epochs_since_compact >= self.compact_every:
                    self.target().compact()
                    self._epochs_since_compact = 0
            if flat_fresh is not None:
                self._fan_out(flat_fresh, batch_id, phase="after")
        finally:
            if self.cache_batches or self.sinks:
                ev.unpersist()
        self.stats.append(stats)
        return stats

    def _fan_out(self, flat: DataFrame, batch_id: int, phase: str = "after") -> None:
        """Per-sink error isolation + dead-letter
        (``MySQLReplicationStream.java:167-176``)."""
        for name, (fn, when) in self.sinks.items():
            if when != phase:
                continue
            try:
                fn(flat, batch_id)
            except Exception as exc:  # noqa: BLE001 — isolation is the point
                dead = self.spark.createDataFrame(
                    [(int(batch_id), name, str(exc), traceback.format_exc())],
                    "batch_id long, sink string, error string, trace string",
                ).withColumn("ts", F.current_timestamp())
                dead.write.mode("append").parquet(self.dead_letter_path)

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
        run_id = os.path.abspath(checkpoint_dir)
        src = (
            self.spark.readStream.schema(cdc_schema.event_schema(evolved))
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        return (
            # byte accounting rides the write job's Observation exactly as
            # in batch mode (foreachBatch actions notify Observation
            # listeners on this Spark version — round-1's second
            # content-decoding pass per streamed epoch is gone; a delivery
            # miss degrades to a recompute, counted in apply.OBS_FALLBACKS)
            src.writeStream.foreachBatch(
                lambda df, bid: self._apply(df, bid, run_id=run_id)
            )
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
