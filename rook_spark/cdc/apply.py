"""K5/K6 — the idempotent per-batch apply (the foreachBatch body).

Reference semantics being re-expressed:

- one transaction per batch, commit-or-rollback
  (``DefaultRowsMutationIndexer.java:44-58``) → one atomic LakeTable
  snapshot commit per micro-batch (epoch strengthens rook's per-TX
  atomicity: a Spark micro-batch contains whole tx groups because the
  fixture's tx_ids are contiguous in offset order);
- upsert-or-purge per key (``DefaultRowsMutationIndexer.java:64-88``)
  → MERGE with op='D' → DELETE, else UPDATE/INSERT;
- within-batch dedup (``IndexingLog``,
  ``DefaultRowsMutationIndexer.java:151-180``) → the LWW reduce (W1);
  rook's first-wins is replaced by last-writer-wins because we replay a
  log instead of re-reading final DB state;
- at-least-once delivery → exactly-once table state via per-partition
  offset watermarks (anti-filter of already-applied offsets) + batch-id
  fencing, both stored in the same atomic snapshot (north_rule).

Job structure per epoch (tuned for 10^10-event scale):

1. **Narrow lineage job** — per-source-partition ``max(offset)``, row
   count, and the touched-bucket set, computed over ONLY the key/offset
   columns (nested-schema pruning keeps the heavy ``content`` column out
   of the scan entirely).
2. **The write job** — watermark filter → flatten → LWW reduce → COW
   MERGE write. Byte accounting for the lineage table rides this job as
   a ``DataFrame.observe`` metric (zero extra passes), and lands in the
   same atomic snapshot commit.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from itertools import chain

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from rook_spark.cdc.normalize import flatten_events
from rook_spark.cdc.patch import UPDATED_COL, patch_reduce
from rook_spark.cdc.reduce import lww_reduce, salted_lww_reduce
from rook_spark.lake.table import LakeTable, bucket_expr, constraint_split_cols

# test hook: number of times an Observation failed to deliver and the
# byte metric had to be recomputed with an extra aggregate pass. Stays 0
# on the happy path (one content-decoding job per epoch, batch AND
# streamed — verified by tests/test_streaming.py).
OBS_FALLBACKS = {"count": 0}
# watcher threads currently parked inside a timed-out Observation.get
# (py4j gives no cancellable wait, so a delivery miss strands its
# watcher until process exit). Visible so a degraded long-lived stream
# can be alerted on BEFORE threads accumulate; each miss also logs.
OBS_WATCHERS_LEAKED = {"count": 0}

def _observation_result(obs: Observation, timeout_s: float | None = None) -> dict:
    """Bounded wait on ``Observation.get`` (which blocks indefinitely):
    a delivery miss degrades to the caller's recompute fallback instead
    of hanging the stream. On timeout the watcher daemon thread stays
    parked inside ``obs.get`` (py4j gives no cancellable wait) — one
    leaked thread per miss, counted in OBS_WATCHERS_LEAKED and logged
    at WARNING so a recurring-miss stream is visible long before thread
    accumulation matters; tests pin the count at 0 on the verified
    delivery path. Timeout defaults to 30 s (env ROOK_OBS_TIMEOUT_S):
    the observation is delivered by the listener of the ALREADY-COMPLETED
    write job, so seconds of grace suffice and a miss should cost the
    epoch seconds, not minutes, before the recompute fallback."""
    import threading

    if timeout_s is None:
        # read per call, not at import: operators tune this on a live
        # process (an import-time constant would silently ignore them)
        timeout_s = float(os.environ.get("ROOK_OBS_TIMEOUT_S", "30"))
    box: dict = {}
    err: list[Exception] = []

    def run() -> None:
        try:
            box.update(obs.get)
        except Exception as e:  # e.g. the empty-final-write toPyRow defect
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if t.is_alive():
        OBS_WATCHERS_LEAKED["count"] += 1
        logging.getLogger(__name__).warning(
            "Observation %s not delivered in %.0fs; falling back to a "
            "recompute pass (stranded watcher threads so far: %d)",
            getattr(obs, "_name", "?"), timeout_s, OBS_WATCHERS_LEAKED["count"],
        )
        raise TimeoutError(f"observation not delivered in {timeout_s}s")
    if err:
        raise err[0]
    return box


@dataclass
class ApplyStats:
    batch_id: int
    skipped: bool
    rows_in: int
    rows_applied: int
    touched_buckets: int
    version: int
    # events routed to the dead-letter path by a CHECK-constraint split
    # (constraint_mode='dead_letter'); their offsets are CONSUMED — the
    # watermark advances over them, so re-delivery never re-judges them
    dead_lettered: int = 0


def watermark_filter(df: DataFrame, lineage: dict[str, dict[str, int]]) -> DataFrame:
    """Drop events at-or-below the per-source-partition applied watermark.

    ORDERING CONTRACT: within one source partition, offsets must arrive
    non-decreasing across batches — exactly what a binlog or one Kafka
    partition provides (the reference preserves it via single-threaded
    dispatch, ``MySQLReplicationStream.java:161-179``). Under that
    contract, everything at-or-below the watermark is a duplicate and
    dropping it is exactly-once dedup (north_rule). A source that
    violates the contract loses events here by design; cross-partition
    disorder is always fine (watermarks are per partition), and
    *overlapping re-delivery* of already-applied suffixes is additionally
    made harmless by the conditional-ordinal MERGE (LakeTable.merge).

    The watermark map is tiny (one entry per source partition), so it is
    inlined as a literal ``map`` expression — evaluated JVM-side inside
    whole-stage codegen, no join, no shuffle, no Python.
    """
    if not lineage:
        return df
    pairs = list(
        chain.from_iterable(
            (F.lit(int(p)), F.lit(int(m["last_applied_offset"]))) for p, m in lineage.items()
        )
    )
    wm = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col("source_partition")), F.lit(-1)
    )
    return df.where(F.col("offset") > wm)


def apply_policy(flat: DataFrame, policy: Column | None) -> DataFrame:
    """Per-row indexing interceptor (the reference's per-entity
    ``EntityIndexingInterceptor``, ``DefaultRowsMutationIndexer.java:129-144``
    + ``IndexingDirective.java:25-55``): ``policy`` is a column expression
    over the flattened event yielding 'KEEP' | 'SKIP' | 'REMOVE' per row,
    applied BEFORE the LWW reduce:

    - SKIP   → the mutation is not indexed at all (target row untouched —
               rook's ``suppressSelfIndexing``: the row still fans out to
               sinks/container rollups, which receive the pre-policy set);
    - REMOVE → the row is force-purged (op becomes 'D' regardless of the
               event's op, with the event's ordinal — so it participates
               in LWW and conditional-ordinal MERGE normally);
    - KEEP / null → pass-through.

    Consumed-but-skipped rows still advance the offset watermark (the
    lineage aggregate runs on the pre-policy batch), exactly like rook's
    interceptor consuming the event without indexing it.
    """
    if policy is None:
        return flat
    p = F.coalesce(policy, F.lit("KEEP"))
    return (
        flat.withColumn("__policy", p)
        .where(F.col("__policy") != "SKIP")
        .withColumn("op", F.when(F.col("__policy") == "REMOVE", "D").otherwise(F.col("op")))
        .drop("__policy")
    )


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    key_cols: tuple[str, ...] = ("repo", "path"),
    ordinal_col: str = "commit_ordinal",
    offset_col: str = "offset",
    salted: bool = False,
    n_salts: int = 16,
    content_col: str = "content",
    observe_bytes: bool = True,
    write_mode: str = "cow",
    n_source_partitions: int | None = None,
    run_id: str = "",
    policy: Column | None = None,
    row_image: str = "full",
    constraint_mode: str = "fail",
    dead_letter_path: str | None = None,
) -> ApplyStats:
    """Apply one FILTERED micro-batch (output of
    :func:`rook_spark.cdc.normalize.filter_events` — still in raw
    before/after event shape) to the target table.

    Job structure: COW needs a pre-write pass (touched buckets decide
    which files join the merge). MOR with a known source-partition count
    (``n_source_partitions`` — static for a Kafka topic / binlog shard
    set) runs as ONE job: watermarks, counts, and bytes all ride the
    write job's observation, and the bucket→file mapping falls out of
    the write's own directory listing.
    """
    if row_image == "minimal" and write_mode == "mor":
        raise ValueError(
            "row_image='minimal' requires write_mode='cow' (patch events "
            "are not self-contained; see rook_spark.cdc.patch)"
        )
    if constraint_mode not in ("fail", "dead_letter"):
        raise ValueError(f"constraint_mode must be 'fail' or 'dead_letter', "
                         f"got {constraint_mode!r}")
    snap = table.snapshot()
    # dead-letter splitting needs its own pass over the batch, so the
    # single-job MOR shortcut below is skipped for it; 'fail' mode rides
    # merge_mor's internal pre-write gate unchanged
    split_constraints = bool(snap.constraints) and constraint_mode == "dead_letter"
    # foreachBatch re-delivery fence — only valid WITHIN one checkpoint
    # lineage (run_id): batch ids restart at 0 on a fresh checkpoint, so
    # a mismatched run falls through to the watermark filter (which alone
    # dedups re-applied events) instead of dropping the batch.
    if batch_id <= snap.batch_id and run_id == snap.run_id:
        return ApplyStats(batch_id, True, 0, 0, 0, snap.version)

    fresh_raw = watermark_filter(events, snap.lineage)

    if write_mode == "mor" and observe_bytes and n_source_partitions and not split_constraints:
        return _apply_mor_single_job(
            table, fresh_raw, batch_id, key_cols, ordinal_col, offset_col,
            salted, n_salts, content_col, n_source_partitions, run_id, policy,
        )

    # --- job 1: narrow lineage + touched buckets (no content decode;
    # nested-schema pruning reads only key/offset/partition columns).
    # Buckets of BOTH images are collected so key-changing updates touch
    # the old key's bucket too.
    keys = list(key_cols)
    # route by the snapshot's bucket columns (a subset of the key when
    # bucket_cols is set), never the full key — must stay bit-identical
    # to the MERGE's own bucket assignment
    bkey = snap.bucket_key()
    b_before = bucket_expr([f"before.{k}" for k in bkey], snap.n_buckets)
    b_after = bucket_expr([f"after.{k}" for k in bkey], snap.n_buckets)
    # observe_bytes=False: byte accounting joins this aggregate instead,
    # at the cost of decoding content here too (a second heavy pass —
    # only for callers that opt out of Observation; the streaming path
    # observes like the batch path since foreachBatch actions DO notify
    # Observation listeners, verified by tests/test_streaming.py).
    byte_agg = (
        F.lit(0)
        if observe_bytes
        else F.coalesce(
            F.sum(F.length(F.coalesce(F.col(f"after.{content_col}"), F.col(f"before.{content_col}")))),
            F.lit(0),
        )
    )
    lin_rows = (
        fresh_raw.groupBy("source_partition")
        .agg(
            F.max(offset_col).alias("max_off"),
            F.count(F.lit(1)).alias("n"),
            F.collect_set(F.when(F.col("before").isNotNull(), b_before)).alias("bk_b"),
            F.collect_set(F.when(F.col("after").isNotNull(), b_after)).alias("bk_a"),
            byte_agg.alias("b"),
        )
        .collect()
    )
    touched_buckets = sorted(
        {b for r in lin_rows for b in (list(r["bk_b"]) + list(r["bk_a"])) if b is not None}
    )
    partitions = [int(r["source_partition"]) for r in lin_rows]
    lineage_update = {
        int(r["source_partition"]): {
            "last_applied_offset": int(r["max_off"]),
            "rows_applied": int(r["n"]),
            # batch path: filled from the write job's observation
            "bytes": int(r["b"]),
        }
        for r in lin_rows
    }
    rows_in = sum(int(r["n"]) for r in lin_rows)

    # --- job 2: flatten → LWW → MERGE write, with byte accounting
    # observed in-flight (one heavy pass total)
    flat = flatten_events(fresh_raw, keys)
    obs: Observation | None = None
    if observe_bytes and content_col in flat.columns and partitions:
        obs = Observation(f"lineage_bytes_{batch_id}")
        byte_exprs = [
            F.sum(
                F.when(F.col("source_partition") == p, F.length(F.col(content_col))).otherwise(0)
            ).alias(f"b_{p}")
            for p in partitions
        ]
        flat = flat.observe(obs, *byte_exprs)

    drop = [c for c in ("source_partition", "tx_id") if c in flat.columns]
    reducible = apply_policy(flat, policy).drop(*drop)
    dl_cache = None
    dead_lettered = 0
    if split_constraints:
        # CHECK-constraint dead-letter split (engine constraint_mode=
        # 'dead_letter'): violating upsert EVENTS leave the batch BEFORE
        # the LWW reduce — exactly as if they never arrived, so an
        # earlier clean version of the same key in the same batch still
        # wins, and the state equals an LWW replay of the constraint-
        # filtered log (the oracle-matchable semantics). Their offsets
        # are consumed (watermark advances); the rows land in
        # <dead_letter_path>/constraints with the violated names.
        # Both actions here are FULL scans, so the byte Observation
        # attached upstream delivers complete metrics whichever action
        # fires it first.
        chk, violates, names = constraint_split_cols(
            reducible, snap.constraints, snap.schema())
        is_bad = (F.col("op") != F.lit("D")) & violates
        dl_cache = chk.persist()
        bad = dl_cache.where(is_bad)
        dead_lettered = int(bad.count())
        if dead_lettered:
            if dead_letter_path is None:
                raise ValueError(
                    "constraint_mode='dead_letter' requires dead_letter_path")
            (bad.withColumn("__violated", names)
                .withColumn("__batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(os.path.join(dead_letter_path, "constraints")))
        reducible = dl_cache.where(~is_bad)
    if row_image == "minimal":
        # per-column patch fold (cdc/patch.py): same partial+final hash
        # aggregate shape as the LWW reduce (all plain maxes), so the
        # salted variant is unnecessary — map-side combine already
        # collapses hot keys per mapper
        reduced = patch_reduce(
            reducible, key_cols=key_cols, ordinal_col=ordinal_col, offset_col=offset_col
        )
    else:
        reducer = salted_lww_reduce if salted else lww_reduce
        kwargs = {"n_salts": n_salts} if salted else {}
        if UPDATED_COL in reducible.columns:
            # a full-image engine over a mask-carrying source: the mask
            # is metadata, not payload — never store it
            reducible = reducible.drop(UPDATED_COL)
        reduced = reducer(
            reducible, key_cols=key_cols, ordinal_col=ordinal_col, offset_col=offset_col, **kwargs
        )
    changes = (
        reduced
        # keep the winning (ordinal, offset) as internal target columns:
        # the MERGE compares them against stored state so cross-batch
        # replay of older changes can never regress a row
        .withColumnRenamed(ordinal_col, "__ordinal")
        .withColumnRenamed(offset_col, "__offset")
    )

    def finalize_lineage(lin: dict) -> dict:
        if obs is None:
            return lin
        try:
            got = _observation_result(obs)  # the write action has completed
        except Exception:
            # PySpark defect: Observation.get raises (toPyRow assertion)
            # when the observed plan feeds a partitionBy write whose final
            # result is EMPTY (e.g. a batch that deletes every matched
            # row). Rare — recompute the byte metric with a small
            # aggregate instead.
            OBS_FALLBACKS["count"] += 1
            got = {
                f"b_{r['source_partition']}": r["b"]
                for r in fresh_raw.groupBy("source_partition")
                .agg(
                    F.sum(
                        F.length(
                            F.coalesce(
                                F.col(f"after.{content_col}"),
                                F.col(f"before.{content_col}"),
                            )
                        )
                    ).alias("b")
                )
                .collect()
            }
        for p in partitions:
            lin[p]["bytes"] = int(got.get(f"b_{p}") or 0)
        return lin

    try:
        if write_mode == "mor":
            result = table.merge_mor(
                changes, batch_id, op_col="op", lineage_update=lineage_update,
                touched_buckets=touched_buckets,
                post_write_lineage=finalize_lineage if touched_buckets else None,
                run_id=run_id,
                enforce_constraints=not split_constraints,
            )
        else:
            result = table.merge(
                changes, batch_id, op_col="op", lineage_update=lineage_update,
                validate_cardinality=False, touched_buckets=touched_buckets,
                post_write_lineage=finalize_lineage if touched_buckets else None,
                run_id=run_id,
                enforce_constraints=not split_constraints,
            )
    finally:
        if dl_cache is not None:
            dl_cache.unpersist()
    return ApplyStats(
        batch_id=batch_id,
        skipped=bool(result.get("skipped")),
        rows_in=rows_in,
        rows_applied=rows_in,
        touched_buckets=int(result.get("touched_buckets", 0)),
        version=int(result.get("version", -1)),
        dead_lettered=dead_lettered,
    )


def _apply_mor_single_job(
    table: LakeTable,
    fresh_raw: DataFrame,
    batch_id: int,
    key_cols: tuple[str, ...],
    ordinal_col: str,
    offset_col: str,
    salted: bool,
    n_salts: int,
    content_col: str,
    n_source_partitions: int,
    run_id: str = "",
    policy: Column | None = None,
) -> ApplyStats:
    """One Spark job per epoch: flatten → LWW → delta write, with ALL
    lineage metrics (per-partition watermark, row count, bytes) observed
    in-flight. The 10^10-event fast path."""
    keys = list(key_cols)
    flat = flatten_events(fresh_raw, keys)

    obs = Observation(f"lineage_{batch_id}")
    exprs = []
    for p in range(n_source_partitions):
        cond = F.col("source_partition") == p
        exprs.append(F.max(F.when(cond, F.col(offset_col))).alias(f"o_{p}"))
        exprs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"n_{p}"))
        if content_col in flat.columns:
            exprs.append(
                F.sum(F.when(cond, F.length(F.col(content_col))).otherwise(0)).alias(f"b_{p}")
            )
    flat = flat.observe(obs, *exprs)

    reducible = apply_policy(flat, policy).drop("source_partition", "tx_id")
    reducer = salted_lww_reduce if salted else lww_reduce
    kwargs = {"n_salts": n_salts} if salted else {}
    changes = (
        reducer(reducible, key_cols=key_cols, ordinal_col=ordinal_col,
                offset_col=offset_col, **kwargs)
        .withColumnRenamed(ordinal_col, "__ordinal")
        .withColumnRenamed(offset_col, "__offset")
    )

    stats_box: dict[str, int] = {}

    def finalize(lin: dict | None) -> dict:
        try:
            got = _observation_result(obs)
        except Exception:
            # Observation defect on empty final writes — recompute
            OBS_FALLBACKS["count"] += 1
            got = {}
            for r in (
                fresh_raw.groupBy("source_partition")
                .agg(
                    F.max(offset_col).alias("o"),
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.length(F.coalesce(F.col(f"after.{content_col}"),
                                            F.col(f"before.{content_col}")))
                    ).alias("b"),
                )
                .collect()
            ):
                p = int(r["source_partition"])
                got[f"o_{p}"], got[f"n_{p}"], got[f"b_{p}"] = r["o"], r["n"], r["b"]
        out = {}
        for p in range(n_source_partitions):
            if got.get(f"o_{p}") is None:
                continue  # partition absent from this batch
            out[p] = {
                "last_applied_offset": int(got[f"o_{p}"]),
                "rows_applied": int(got.get(f"n_{p}") or 0),
                "bytes": int(got.get(f"b_{p}") or 0),
            }
        stats_box["rows_in"] = sum(m["rows_applied"] for m in out.values())
        return out

    result = table.merge_mor(
        changes, batch_id, op_col="op", lineage_update=None,
        post_write_lineage=finalize, run_id=run_id,
    )
    return ApplyStats(
        batch_id=batch_id,
        skipped=bool(result.get("skipped")),
        rows_in=stats_box.get("rows_in", 0),
        rows_applied=stats_box.get("rows_in", 0),
        touched_buckets=int(result.get("touched_buckets", 0)),
        version=int(result.get("version", -1)),
    )
