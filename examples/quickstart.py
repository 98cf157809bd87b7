#!/usr/bin/env python
"""The full user journey in one runnable script (the analog of the
reference's readme usage snippet, ``/root/reference/readme.md:29-34`` —
connect, register listeners, replicate):

1. bootstrap a lake table from a consistent snapshot,
2. tail an ordered change-event feed (file-stream stand-in for the
   binlog/Kafka tail) with an auxiliary metrics sink,
3. read the result: current state, time travel, per-version history,
   per-partition lineage watermarks, and the net changelog between two
   versions.

Run:  python examples/quickstart.py   (local[4], ~1 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rook_spark.cdc.engine import CdcEngine, await_stream_ready
from rook_spark.cdc.fixtures import generate_events, write_events
from rook_spark.session import get_spark


def main() -> None:
    spark = get_spark("quickstart", master="local[4]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="rook_quickstart_")
    try:
        # --- a seeded change log: 20k I/U/D events over (repo, path) keys
        events = generate_events(spark, 20_000, seed=7)
        tail_dir = os.path.join(work, "tail")
        write_events(events.where(F.col("offset") >= 8_000), tail_dir, n_files=4)

        # --- 1. bootstrap: snapshot state as of offset 8000, watermarks
        # committed atomically with the data (an overlapping tail is safe)
        seed_engine = CdcEngine(spark, os.path.join(work, "seed")).ignoring_servers(99)
        seed_engine.replay(events.where(F.col("offset") < 8_000), 0)
        snapshot = seed_engine.target().read()
        as_of = {
            int(r["partition_id"]): int(r["last_applied_offset"])
            for r in seed_engine.target().lineage().collect()
        }

        engine = (
            CdcEngine(spark, os.path.join(work, "repos"), n_buckets=16)
            .ignoring_servers(99)                    # P1 filter
            .tracking("rook.repos")                  # P2 filter
            .with_sink("audit", lambda df, bid:      # K1 listener fan-out
                       print(f"  [audit sink] batch {bid}: {df.count()} events"),
                       when="before")
        )
        engine.bootstrap(snapshot, as_of)
        v_bootstrap = engine.target().snapshot().version
        print(f"bootstrapped {snapshot.count()} rows at version {v_bootstrap}")

        # --- 2. tail the stream (exactly-once: checkpoint + watermarks)
        q = engine.stream(tail_dir, os.path.join(work, "ckpt"), max_files_per_trigger=1)
        await_stream_ready(q, timeout_s=120)
        q.processAllAvailable()
        q.stop()
        print(f"applied {len(engine.stats)} micro-batches")
        engine.metrics().show(truncate=False)

        # --- 3. read it all back
        table = engine.target()
        print(f"current state: {table.read().count()} rows "
              f"(version {table.snapshot().version})")
        print(f"time travel to bootstrap: {table.read(version=v_bootstrap).count()} rows")
        print("per-version history:")
        table.history().orderBy("version").show(truncate=False)
        print("per-partition lineage watermarks:")
        table.lineage().orderBy("partition_id").show()
        print("net changelog since bootstrap (first 5 rows):")
        table.changes(v_bootstrap).select("repo", "path", "op", "commit").show(5)
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
