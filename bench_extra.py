#!/usr/bin/env python
"""Round-6 optimization helpers (bench.py is FROZEN for measurement).

Subcommands:
  plans [names...]    — dump .explain("formatted") for bench queries to plans/r06/<name>_<tag>.txt
  time [names...]     — per-query noop-sink timings (3 reps, interleaved), JSON to stdout
  stages              — stage-level timing of the dedup/minhash pipeline pieces

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     TAG (suffix for plan files, default "before").
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("ROOK_SPARK_DRIVER_MEM", "48g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
TAG = os.environ.get("TAG", "before")

BENCH_QUERIES = [
    "cdc_lww_state", "cdc_sessionize", "cdc_broadcast_policy_join",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "doc_sha256_pandas_udf", "dedup_minhash_lsh_pairs",
    "dedup_duplicate_clusters", "dedup_keep_canonical", "doc_contamination",
    "doc_gopher_repetition", "doc_top_ngrams", "emb_cosine_topk",
    "emb_cosine_topk_arrow", "ann_ivf_topk", "ann_ivf_topk_expr",
    "emb_near_dup_pairs", "emb_near_dup_pairs_arrow",
]


def make_spark():
    from bench import make_spark as ms
    return ms(CPUS)


def cmd_plans(names):
    from rook_spark import queries as q
    spark = make_spark()
    reg = q.queries()
    for name in names or BENCH_QUERIES:
        df = reg[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        out = f"plans/r06/{name}_{TAG}.txt"
        with open(out, "w") as f:
            f.write(p)
        print(f"wrote {out} ({p.count('Exchange')} Exchange refs)", file=sys.stderr)


def cmd_time(names, reps=3):
    from rook_spark import queries as q
    spark = make_spark()
    reg = q.queries()
    names = names or BENCH_QUERIES
    # warmup pass
    for name in names:
        reg[name](spark, SF_DIR).count()
    all_reps = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            n = reg[name](spark, SF_DIR).count()
            dt = round(time.time() - t0, 2)
            all_reps[name].append(dt)
            print(f"  {name} rep{rep}: {dt}s ({n} rows)", file=sys.stderr)
    print(json.dumps({
        "medians": {n: round(statistics.median(ts), 2) for n, ts in all_reps.items()},
        "reps": all_reps, "sf": SF_DIR, "cpus": CPUS,
    }))


def cmd_stages():
    """Noop-sink isolation of the dedup pipeline stages (guide §1.4)."""
    from pyspark.sql import functions as F
    from rook_spark.functions import dedup
    spark = make_spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def t(label, df, reps=3):
        times = []
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 2))
        print(f"{label}: med={statistics.median(times)} reps={times}", flush=True)

    t("scan+tokens", docs.select(F.split(F.lower(F.trim(F.col("text"))), "\\s+").alias("t")))
    t("shingles", dedup.shingles(docs))
    t("signatures", dedup.minhash_signatures(docs, n_hashes=16))
    t("banded", dedup._banded_keys(dedup.minhash_signatures(docs, n_hashes=16), 16, 8))
    t("lsh_pairs", dedup.minhash_lsh_pairs(docs, n_hashes=16, n_bands=8))


if __name__ == "__main__":
    args = sys.argv[1:]
    cmd = args[0] if args else "plans"
    rest = args[1:]
    if cmd == "plans":
        cmd_plans(rest)
    elif cmd == "time":
        cmd_time(rest)
    elif cmd == "stages":
        cmd_stages()
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
