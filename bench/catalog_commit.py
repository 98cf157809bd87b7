"""Commit-latency micro-bench for the metadata stores (no Spark): the
snapshot-pointer flip is the per-epoch serial cost every writer pays,
so the catalog seam must not regress it. Measures median/p99 over N
commits for (a) the plain POSIX single-table store, (b) a catalog
table store (single commits = one-entry groups through the shared
map), and (c) a two-table GROUP commit (the atomic epoch — one flip
covering both tables). Prints one JSON line."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rook_spark.lake.catalog import LakeCatalog  # noqa: E402
from rook_spark.lake.metastore import PosixMetadataStore  # noqa: E402

N = int(os.environ.get("N_COMMITS", "300"))
PAYLOAD = json.dumps({"version": 0, "buckets": {}, "filler": "x" * 2048})


def timed(fn, n):
    xs = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(i)
        xs.append((time.perf_counter() - t0) * 1000)
    xs.sort()
    return {"median_ms": round(xs[n // 2], 3), "p99_ms": round(xs[int(n * 0.99)], 3)}


def main():
    root = tempfile.mkdtemp(prefix="cat_bench_")
    try:
        posix = PosixMetadataStore(os.path.join(root, "plain", "_meta"))
        posix.init()
        r_posix = timed(lambda i: posix.commit(i, PAYLOAD, i - 1), N)

        cat = LakeCatalog(os.path.join(root, "cat"))
        cat.init()
        s1 = cat.store("t1")
        s1.init()
        r_single = timed(lambda i: s1.commit(i, PAYLOAD, i - 1), N)

        cat2 = LakeCatalog(os.path.join(root, "cat2"))
        cat2.init()
        a, b = cat2.store("a"), cat2.store("b")
        a.init(); b.init()

        def group_commit(i):
            with cat2.group():
                a.commit(i, PAYLOAD, i - 1)
                b.commit(i, PAYLOAD, i - 1)

        r_group = timed(group_commit, N)
        print(json.dumps({
            "metric": "metadata commit latency", "n_commits": N,
            "posix_single_table": r_posix,
            "catalog_single_commit": r_single,
            "catalog_group_commit_2_tables": r_group,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
