"""Additive schema evolution (north_rule): a new payload column appears
mid-stream; earlier rows are back-filled as null. The reference leaves
this unhandled (``MySQLReplicationStream.java:212`` todo)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events, oracle_final_state_sql

N_EVENTS = 3000
CUTOFF = N_EVENTS // 2


def _strip_size_bytes(events):
    """Produce the pre-evolution physical shape: structs WITHOUT the new
    column (what old binlog segments / old files actually contain)."""
    def narrow(side):
        return F.when(
            F.col(side).isNotNull(),
            F.struct(*[F.col(f"{side}.{c}").alias(c)
                       for c in ["repo", "path", "commit", "lang", "content"]]),
        )
    return events.withColumn("before", narrow("before")).withColumn(
        "after", narrow("after")
    )


def _evolved_oracle_sql(evolved_log: str) -> str:
    """Independent replay oracle across the schema break: DuckDB cannot
    union structs of different width, so each era is flattened first."""
    def era(sub: str, size_expr: str) -> str:
        return f"""
  SELECT "offset", op, commit_ordinal, schema_name, table_name, server_id,
         img.repo AS repo, img.path AS path, img."commit" AS commit,
         img.lang AS lang, img.content AS content, {size_expr} AS size_bytes
  FROM (
    SELECT *, CASE WHEN op = 'D' THEN before ELSE after END AS img
    FROM read_parquet('{evolved_log}/{sub}/*.parquet')
  )"""

    return f"""
WITH unioned AS ({era("old", "CAST(NULL AS BIGINT)")} UNION ALL {era("new", "img.size_bytes")}),
filtered AS (
  SELECT * FROM unioned
  WHERE lower(schema_name || '.' || table_name) = 'rook.repos'
    AND server_id NOT IN (99)
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY repo, path ORDER BY commit_ordinal DESC, "offset" DESC) AS rn
  FROM filtered
)
SELECT repo, path, commit, lang, content, size_bytes
FROM ranked WHERE rn = 1 AND op <> 'D' ORDER BY repo, path
"""


@pytest.fixture(scope="module")
def evolved_log(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("evolve")
    ev = generate_events(spark, N_EVENTS, seed=23, evolve_after_frac=0.5)
    old = _strip_size_bytes(ev.where(F.col("offset") < CUTOFF))
    new = ev.where(F.col("offset") >= CUTOFF)
    old.repartitionByRange(3, "offset").write.parquet(str(d / "old"))
    new.repartitionByRange(3, "offset").write.parquet(str(d / "new"))
    return str(d)


def test_batch_schema_evolution(spark, evolved_log, tmp_path):
    """Epoch 1 applies pre-evolution events (narrow schema); epoch 2
    brings the new column; target widens, old rows read back null."""
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    engine.replay(spark.read.parquet(f"{evolved_log}/old"), 0)
    t = engine.target()
    assert "size_bytes" not in t.read().columns

    engine.replay(spark.read.parquet(f"{evolved_log}/new"), 1)
    final = t.read()
    assert "size_bytes" in final.columns

    con = duckdb.connect()
    try:
        want = con.execute(_evolved_oracle_sql(evolved_log)).fetch_df()
    finally:
        con.close()
    got = final.orderBy("repo", "path").toPandas()
    assert len(got) == len(want)
    assert got["content"].tolist() == want["content"].tolist()
    import pandas as pd

    got_sb = got["size_bytes"].astype("Int64").tolist()
    want_sb = pd.array(want["size_bytes"], dtype="Int64").tolist()
    assert got_sb == want_sb
    # keys whose survivor predates the cutoff really are null-backfilled
    assert any(v is pd.NA or v is None for v in got_sb)
    assert any(v is not pd.NA and v is not None for v in got_sb)


def test_streaming_schema_evolution_prewidened(spark, evolved_log, tmp_path):
    """Streaming stance (SURVEY.md §7.4): read schema is pre-widened, so
    old files (struct physically lacks the column) null-fill it and the
    running query survives the mid-stream evolution."""
    import os, shutil, time

    src = str(tmp_path / "src")
    os.makedirs(src)
    # FileStreamSource orders by (mtime, path); fast copies can collide on
    # the same mtime ms and tie-break alphabetically ("new-*" < "old-*"),
    # delivering post-evolution offsets FIRST — which the watermark
    # contract then rightly drops the old era for. Space the mtimes
    # explicitly so delivery follows offset order (what a real tailed
    # binlog provides; same trick as fixtures.write_events).
    base = time.time() - 600
    i = 0
    for sub in ["old", "new"]:
        for f in sorted(os.listdir(f"{evolved_log}/{sub}")):
            if f.endswith(".parquet"):
                dst = f"{src}/{sub}-{f}"
                shutil.copy(f"{evolved_log}/{sub}/{f}", dst)
                os.utime(dst, (base + i * 2, base + i * 2))
                i += 1
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=2, evolved=True)
    q.processAllAvailable()
    q.stop()
    final = engine.target().read()
    assert "size_bytes" in final.columns
    assert final.where(F.col("size_bytes").isNull()).count() > 0
    assert final.where(F.col("size_bytes").isNotNull()).count() > 0
