#!/usr/bin/env python
"""spark-submit entry point for the headline replay — the north rule's
invocation mode (``spark-submit --py-files rook_spark.zip bench/replay.py``).

Replays a seeded CDC log (generating it first if absent) through the
full engine path into a fresh lake table and prints ONE JSON line with
events/sec. Run it at two cluster sizes (``--master local[N]`` /
``local[4N]`` here; ``--num-executors N`` / ``4N`` on a real cluster)
on the SAME ``--input`` bytes to measure scaling efficiency — bench.py's
scaling suite automates exactly that locally.

Examples:
    python -m zipfile -c /tmp/rook_spark.zip rook_spark
    spark-submit --master local[1] --py-files /tmp/rook_spark.zip \
        bench/replay.py --input /tmp/replay_log --events 2000000
    spark-submit --master local[4] --py-files /tmp/rook_spark.zip \
        bench/replay.py --input /tmp/replay_log --events 2000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="event-log parquet dir (generated there if absent)")
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--mode", choices=("cow", "mor"), default="mor")
    ap.add_argument("--target", default=None,
                    help="lake table dir (default: a temp dir, removed after)")
    ap.add_argument("--keep-target", action="store_true")
    args = ap.parse_args()

    # under spark-submit a session already has master/conf from the CLI;
    # builder.getOrCreate attaches to it instead of re-configuring
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("rook_replay").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    if not os.path.exists(os.path.join(args.input, "_SUCCESS")):
        generate_events(
            spark, args.events, seed=42, n_repos=200, paths_per_repo=20000,
            num_partitions=max(spark.sparkContext.defaultParallelism, 8),
        ).write.mode("overwrite").parquet(args.input)
    events = spark.read.parquet(args.input)

    target = args.target or tempfile.mkdtemp(prefix="rook_replay_target_")
    engine = CdcEngine(
        spark, os.path.join(target, "repos"), n_buckets=args.buckets,
        write_mode=args.mode, compact_every=8 if args.mode == "mor" else None,
        n_source_partitions=8,
    ).ignoring_servers(99)

    step = args.events // args.epochs
    t0 = time.time()
    for i in range(args.epochs):
        lo = i * step
        hi = (i + 1) * step if i < args.epochs - 1 else args.events
        engine.replay(events.where((F.col("offset") >= lo) & (F.col("offset") < hi)), i)
    if args.mode == "mor":
        engine.target().compact()
    elapsed = time.time() - t0
    final_rows = engine.target().read().count()

    print(json.dumps({
        "metric": "change-events/sec applied (end-to-end MERGE throughput)",
        "events_per_sec": round(args.events / elapsed),
        "seconds": round(elapsed, 2),
        "n_events": args.events,
        "n_epochs": args.epochs,
        "final_rows": final_rows,
        "mode": args.mode,
        "parallelism": spark.sparkContext.defaultParallelism,
        "master": spark.sparkContext.master,
    }), flush=True)

    if args.target is None and not args.keep_target:
        shutil.rmtree(target, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
