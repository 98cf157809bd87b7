"""Micro-benchmark: per-commit METADATA IO and TASK WIDTH at high
bucket counts.

Quantifies two O(touched)-not-O(table) claims for steady-state epochs
on a many-bucket table:

1. Manifest sharding (``LakeTable._write_snapshot``): a single-bucket
   epoch writes ~1 new content-addressed manifest-group blob (~10 KB),
   not the full inline snapshot (~450 KB at 4096 populated buckets) —
   measured as (a) new blobs per commit, (b) metadata bytes per commit,
   against the pre-sharding counterfactual reconstructed from the same
   state via ``Snapshot.to_json``.

2. Epoch write width (``_write_bucket_files`` callers): the epoch's
   shuffle/task width is the TOUCHED bucket count, not the table's —
   A/B'd in-process by re-running the same single-bucket epochs with
   the width forced back to N_BUCKETS (the pre-fix behavior: a
   4096-task stage per epoch of pure task-launch overhead).

Run:  python bench/manifest_io.py
Emits one JSON line; store alongside the other bench artifacts.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rook_spark.session import get_spark  # noqa: E402
from rook_spark.lake.table import LakeTable  # noqa: E402
import pyspark.sql.types as T  # noqa: E402

N_BUCKETS = 4096
N_KEYS = 20_000
EPOCHS = 8


def main() -> None:
    spark = get_spark("manifest-io", master="local[8]", shuffle_partitions=16)
    root = tempfile.mkdtemp(prefix="manifest_io_")
    t = LakeTable.create(
        spark, os.path.join(root, "t"),
        T.StructType([
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("content", T.StringType()),
        ]),
        ["repo", "path"], n_buckets=N_BUCKETS,
    )

    def chg(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, content string, op string")

    # epoch 0: populate every bucket
    t.merge(chg([("r", f"p{i:05d}", f"v{i}", "I") for i in range(N_KEYS)]), 0)
    store = t._store

    def meta_bytes(keys):
        total = os.path.getsize(store._snap_path(t.current_version()))
        for k in keys:
            total += os.path.getsize(store._blob_path(k))
        return total

    baseline_inline = len(t.snapshot().to_json().encode())
    per_epoch = []
    for e in range(1, EPOCHS + 1):
        before = set(store.blob_keys())
        t0 = time.monotonic()
        t.merge(chg([("r", f"p{(e * 37) % N_KEYS:05d}", f"u{e}", "U")]), e)
        wall = time.monotonic() - t0
        new = set(store.blob_keys()) - before
        per_epoch.append({
            "new_blobs": len(new),
            "metadata_bytes_written": meta_bytes(new),
            "epoch_wall_s": round(wall, 2),
        })

    # counterfactual: same epochs with the pre-fix O(table) write width
    orig_write = LakeTable._write_bucket_files

    def wide(self, df, new_version, repartition_n):
        return orig_write(self, df, new_version,
                          None if repartition_n is None else N_BUCKETS)

    LakeTable._write_bucket_files = wide
    wide_walls = []
    try:
        for e in range(EPOCHS + 1, 2 * EPOCHS + 1):
            t0 = time.monotonic()
            t.merge(chg([("r", f"p{(e * 37) % N_KEYS:05d}", f"u{e}", "U")]), e)
            wide_walls.append(round(time.monotonic() - t0, 2))
    finally:
        LakeTable._write_bucket_files = orig_write

    groups = (N_BUCKETS + 63) // 64
    out = {
        "metric": "per-commit metadata IO, single-bucket epoch @4096 buckets",
        "n_buckets": N_BUCKETS,
        "manifest_groups": groups,
        "inline_snapshot_bytes (pre-sharding counterfactual, per EVERY commit)":
            baseline_inline,
        "sharded_per_epoch": per_epoch,
        "median_sharded_bytes": sorted(
            p["metadata_bytes_written"] for p in per_epoch)[len(per_epoch) // 2],
        "median_new_blobs": sorted(
            p["new_blobs"] for p in per_epoch)[len(per_epoch) // 2],
        "median_epoch_wall_s (width = touched buckets)": sorted(
            p["epoch_wall_s"] for p in per_epoch)[len(per_epoch) // 2],
        "median_epoch_wall_s (pre-fix width = 4096)": sorted(
            wide_walls)[len(wide_walls) // 2],
        "wide_epoch_wall_s": wide_walls,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
