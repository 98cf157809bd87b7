"""Streaming windows, watermark semantics, custom stateful operator, and
source connectors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rook_spark.cdc.fixtures import generate_events, write_events
from rook_spark.streaming.windows import (
    running_totals_stream,
    session_windows,
    windowed_counts,
)


@pytest.fixture(scope="module")
def driver_events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_windowed_counts_stream_matches_batch(spark, driver_events, tmp_path):
    """The same window expression over a stream (with watermark) and over
    the batch table yields identical closed-window results."""
    src_dir = str(tmp_path / "src")
    driver_events.select("ts", F.col("event_type").alias("table_name")).repartitionByRange(
        4, "ts"
    ).write.parquet(src_dir)

    # watermarks require TIMESTAMP (not NTZ): cast on both paths
    stream = (
        spark.readStream.schema("ts timestamp_ntz, table_name string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = windowed_counts(stream, window="6 hours", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["win"]["start"], r["table_name"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = windowed_counts(
        spark.read.schema("ts timestamp_ntz, table_name string")
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp")),
        window="6 hours",
    )
    want = {
        (r["win"]["start"], r["table_name"]): r["n"] for r in batch.collect()
    }
    # append mode only emits watermark-closed windows; every emitted
    # window must match the batch truth exactly
    assert len(got) > 10
    for k, v in got.items():
        assert want[k] == v


def test_session_windows_batch(spark, driver_events):
    out = session_windows(driver_events, gap="30 minutes")
    assert out.count() > 0
    r = out.first()
    assert r["session"]["end"] >= r["session"]["start"]
    # sessions per user never exceed events per user
    per_user = out.groupBy("user_id").count()
    ev_per_user = driver_events.groupBy("user_id").count().withColumnRenamed("count", "ev")
    bad = per_user.join(ev_per_user, "user_id").where(F.col("count") > F.col("ev"))
    assert bad.count() == 0


def test_apply_in_pandas_with_state_running_totals(spark, tmp_path):
    """Custom stateful streaming operator: state accumulates across
    micro-batches and the final per-key totals equal the batch truth."""
    ev = generate_events(spark, 1000, seed=41, n_source_partitions=4)
    src = str(tmp_path / "src")
    write_events(
        ev.select(
            F.col("offset"),
            F.col("tx_id"),
            F.col("server_id"),
            F.col("schema_name"),
            F.col("table_name"),
            F.col("op"),
            F.col("before"),
            F.col("after"),
            F.col("commit_ordinal"),
            F.col("source_partition"),
            F.col("ts"),
        ),
        src,
        n_files=4,
    )
    stream = (
        spark.readStream.schema(
            "offset long, tx_id long, server_id long, schema_name string, "
            "table_name string, op string, "
            "before struct<repo:string,path:string,commit:string,lang:string,content:string>, "
            "after struct<repo:string,path:string,commit:string,lang:string,content:string>, "
            "commit_ordinal long, source_partition int, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            F.col("source_partition").cast("long").alias("user_id"),
            F.col("offset").cast("double").alias("value"),
            F.col("offset"),
        )
    )
    out = running_totals_stream(stream, key_col="user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last emission per key == batch-computed totals
    final = spark.sql(
        """
        SELECT key, n, total, max_offset FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY max_offset DESC) rn
          FROM running
        ) WHERE rn = 1
        """
    ).collect()
    truth = {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in generate_events(spark, 1000, seed=41, n_source_partitions=4)
        .groupBy(F.col("source_partition").cast("long").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("offset").cast("double")).alias("s"),
            F.max("offset").alias("m"),
        )
        .collect()
    }
    assert len(final) == len(truth) > 0
    for r in final:
        n, s, m = truth[r["key"]]
        assert (r["n"], r["total"], r["max_offset"]) == (n, s, m)
    # multiple micro-batches really happened (state crossed batches)
    n_emissions = spark.sql("SELECT count(*) c FROM running").first()["c"]
    assert n_emissions > len(truth)


def test_sources_json_csv_roundtrip(spark, tmp_path):
    """JSON and CSV feeds decode to the identical canonical event set."""
    from rook_spark import sources

    ev = generate_events(spark, 300, seed=43)
    pq = str(tmp_path / "pq")
    ev.write.parquet(pq)
    canonical = sorted(
        (r["offset"], r["op"], (r["after"] or r["before"])["content"])
        for r in spark.read.parquet(pq).collect()
    )

    js = str(tmp_path / "js")
    spark.read.parquet(pq).write.json(js)
    got_json = sorted(
        (r["offset"], r["op"], (r["after"] or r["before"])["content"])
        for r in sources.read_events_json(spark, js).collect()
    )
    assert got_json == canonical

    cs = str(tmp_path / "cs")
    df = spark.read.parquet(pq)
    df.select(
        *[c for c in df.columns if c not in ("before", "after")],
        F.to_json("before").alias("before_json"),
        F.to_json("after").alias("after_json"),
    ).write.option("header", "true").csv(cs)
    got_csv = sorted(
        (r["offset"], r["op"], (r["after"] or r["before"])["content"])
        for r in sources.read_events_csv(spark, cs).collect()
    )
    assert got_csv == canonical


def test_kafka_source_raises_clear_error_without_jar(spark):
    from rook_spark import sources

    with pytest.raises(Exception, match="[Kk]afka"):
        sources.stream_events_kafka(spark, "localhost:9092", "events")


def test_dedup_within_watermark_drops_replayed_suffix(spark, tmp_path):
    """An at-least-once source (duplicated suffix, arriving in later
    micro-batches within the watermark) yields exactly the distinct event
    set — the operator-level counterpart of the engine's lineage
    watermark filter."""
    import glob
    import os
    import shutil
    import time

    from rook_spark.streaming.windows import dedup_within_watermark

    ev = generate_events(spark, 1200, seed=47)
    src = str(tmp_path / "src")
    write_events(ev, src, n_files=3)
    # re-deliver the last 25% as an EXTRA, LATER file (cross-batch
    # duplicates — write_events alone would range-partition duplicates
    # into the same chunk as their originals)
    replay_dir = str(tmp_path / "replay")
    ev.where(F.col("offset") >= 900).coalesce(1).write.parquet(replay_dir)
    part = glob.glob(os.path.join(replay_dir, "*.parquet"))[0]
    dst = os.path.join(src, "chunk-00999.parquet")
    shutil.copy(part, dst)
    os.utime(dst, (time.time() + 60, time.time() + 60))

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_within_watermark(stream, keys=("offset",), watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) c, count(DISTINCT offset) d FROM dedup_wm").first()
    assert got["c"] == got["d"] == 1200  # every duplicate dropped, nothing lost


def test_stream_stream_join_matches_batch(spark, driver_events, tmp_path):
    """Time-bounded stream-stream join (clicks ⋈ purchases within 6h per
    user, both sides watermarked/state-bounded) emits exactly the batch
    join's result set."""
    from rook_spark.streaming.windows import stream_stream_join

    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    ev = driver_events.withColumn("ts", F.col("ts").cast("timestamp"))
    ev.where("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    ).repartitionByRange(3, "ts").write.parquet(clicks_dir)
    ev.where("event_type = 'purchase'").select(
        "user_id", "ts", F.col("event_id").alias("buy_id")
    ).repartitionByRange(3, "ts").write.parquet(buys_dir)

    c_schema = "user_id long, ts timestamp, click_id long"
    b_schema = "user_id long, ts timestamp, buy_id long"
    sc = spark.readStream.schema(c_schema).option("maxFilesPerTrigger", 1).parquet(clicks_dir)
    sb = spark.readStream.schema(b_schema).option("maxFilesPerTrigger", 1).parquet(buys_dir)
    # watermark must cover the fixture's event-time span (~60h at
    # sf0.001) or state eviction legitimately drops old rows and the
    # result depends on batch interleaving
    joined = stream_stream_join(
        sc, sb, key_col="user_id", within="6 hours", watermark="30 days"
    ).select(F.col("click_id"), F.col("buy_id"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r["click_id"], r["buy_id"]) for r in spark.sql("SELECT * FROM ssj").collect()}

    bc = spark.read.schema(c_schema).parquet(clicks_dir)
    bb = spark.read.schema(b_schema).parquet(buys_dir)
    want = {
        (r["click_id"], r["buy_id"])
        for r in stream_stream_join(bc, bb, key_col="user_id", within="6 hours")
        .select("click_id", "buy_id")
        .collect()
    }
    assert len(want) > 10
    assert got == want


def test_debezium_envelope_roundtrip_and_replay(spark, tmp_path):
    """Debezium-format events decode to the canonical schema and replay
    through the engine to the same final state as the raw log's oracle —
    a user can point the engine at a Debezium topic dump unchanged."""
    import duckdb

    from rook_spark import sources
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import oracle_final_state_sql

    ev = generate_events(spark, 1500, seed=53)
    raw = str(tmp_path / "raw")
    ev.write.parquet(raw)

    # render the log as Debezium envelopes (binlog file rotates mid-log)
    dbz = spark.read.parquet(raw).select(
        F.to_json(
            F.struct(
                F.col("before"),
                F.col("after"),
                F.struct(
                    F.lit("rook-mysql").alias("name"),
                    (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
                    F.col("schema_name").alias("db"),
                    F.col("table_name").alias("table"),
                    F.col("server_id"),
                    # rotate binlog files mid-log: offsets < 700 carry
                    # file seq 1, the rest seq 0 — exercises the weighted
                    # (file, pos) total-order reconstruction
                    F.concat(
                        F.lit("mysql-bin.00000"),
                        (F.col("offset") < 700).cast("int").cast("string"),
                    ).alias("file"),
                    F.col("offset").alias("pos"),
                ).alias("source"),
                F.when(F.col("op") == "I", "c")
                .when(F.col("op") == "U", "u")
                .otherwise("d")
                .alias("op"),
                (F.unix_timestamp("ts") * 1000).alias("ts_ms"),
                F.struct(
                    F.col("tx_id").cast("string").alias("id"),
                    F.col("offset").alias("total_order"),
                ).alias("transaction"),
            )
        ).alias("value")
    )
    jdir = str(tmp_path / "dbz")
    dbz.select(F.col("value")).write.text(jdir)

    decoded = sources.read_events_debezium(spark, jdir)
    # canonical schema shape
    assert {"offset", "op", "before", "after", "commit_ordinal",
            "source_partition", "ts"} <= set(decoded.columns)
    # file rotation: offsets < 700 got file seq 1 => weighted ABOVE the
    # rest — the total order follows (file, pos), not pos alone
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    engine.replay(decoded.where(F.col("offset") < 10**12), 0)   # file 0
    engine.replay(decoded.where(F.col("offset") >= 10**12), 1)  # file 1

    got = engine.target().read().orderBy("repo", "path").toPandas()
    # the raw oracle orders by the ORIGINAL offsets; the weighted mapping
    # puts file-1 events (offsets < 700) AFTER file-0 events, so the
    # oracle must rank by the same (file, pos) order the decoder restores:
    sql = oracle_final_state_sql(f"{raw}/*.parquet").replace(
        'ORDER BY commit_ordinal DESC, "offset" DESC',
        'ORDER BY (CASE WHEN "offset" < 700 THEN 1 ELSE 0 END) DESC, '
        'commit_ordinal DESC, "offset" DESC',
    )
    con = duckdb.connect()
    try:
        want = con.execute(sql).fetch_df()
    finally:
        con.close()
    assert len(got) == len(want)
    assert got["content"].tolist() == want["content"].tolist()


def test_kafka_record_parsing_roundtrip(spark, tmp_path):
    """The Kafka decode plan (value JSON -> canonical events, partition ->
    source_partition), testable without the connector jar: synthesize
    Kafka-shaped records from the fixture log and assert the decoded set
    replays to the same engine state as the original."""
    import duckdb

    from rook_spark import sources
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import oracle_final_state_sql

    ev = generate_events(spark, 1500, seed=59)
    raw = str(tmp_path / "raw")
    ev.write.parquet(raw)
    # kafka record shape: value = JSON event, partition = source_partition
    records = spark.read.parquet(raw).select(
        F.to_json(F.struct("*")).cast("binary").alias("value"),
        F.col("source_partition").cast("int").alias("partition"),
    )
    decoded = sources.parse_kafka_records(records)
    assert decoded.schema["source_partition"].dataType.simpleString() == "int"
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    engine.replay(decoded, 0)
    got = engine.target().read().orderBy("repo", "path").toPandas()
    want = duckdb.execute(oracle_final_state_sql(f"{raw}/*.parquet")).fetch_df()
    assert len(got) == len(want)
    assert got["content"].tolist() == want["content"].tolist()


def test_kafka_shaped_streaming_plan_end_to_end(spark, tmp_path):
    """The FULL Kafka S1 wiring as a running Structured Streaming query —
    readStream over Kafka-shaped records (value binary JSON + partition)
    -> parse_kafka_records INSIDE the streaming plan -> foreachBatch ->
    CdcEngine._apply — i.e. everything stream_events_kafka produces
    except the jar-gated .format("kafka").load() itself. Final state is
    oracle-verified and multiple micro-batches must have fired."""
    import duckdb

    from rook_spark import sources
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import oracle_final_state_sql

    ev = generate_events(spark, 2000, seed=61)
    raw = str(tmp_path / "raw")
    ev.write.parquet(raw)
    # materialize the topic dump as ordered record files (file == poll)
    records = spark.read.parquet(raw).select(
        F.to_json(F.struct("*")).cast("binary").alias("value"),
        F.col("source_partition").cast("int").alias("partition"),
        F.col("offset").alias("__order"),
    )
    topic = str(tmp_path / "topic")
    (records.repartitionByRange(4, "__order").drop("__order")
     .write.parquet(topic))
    # deliver record files oldest-mtime-first IN OFFSET ORDER — the same
    # per-partition non-decreasing-offset contract a real Kafka poll loop
    # provides (see fixtures.write_events for the rationale)
    from rook_spark.cdc.fixtures import order_files_for_tail

    order_files_for_tail(topic, prefix="poll")

    raw_stream = (
        spark.readStream.schema("value binary, partition int")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    )
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream_events(
        sources.parse_kafka_records(raw_stream), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    assert len(engine.stats) >= 3  # really ran as multiple micro-batches

    got = engine.target().read().orderBy("repo", "path").toPandas()
    want = duckdb.execute(oracle_final_state_sql(f"{raw}/*.parquet")).fetch_df()
    assert len(got) == len(want)
    assert got["content"].tolist() == want["content"].tolist()
    # lineage landed through the streaming path too
    assert engine.target().lineage().count() >= 1


def _write_debezium_mixed(tmp_path):
    """6 well-formed envelopes + one 't' (truncate), one heartbeat-style
    'm', and one record with null binlog pos."""
    import json

    rows = []
    for i in range(6):
        rows.append({
            "before": None,
            "after": {"repo": "r0", "path": f"p{i}", "commit": f"c{i}",
                      "lang": "py", "content": f"body{i}"},
            "source": {"name": "db1", "ts_ms": 1000 + i, "db": "s", "table": "repos",
                       "server_id": 1, "file": "mysql-bin.000001", "pos": 100 + i},
            "op": "c", "ts_ms": 1000 + i,
            "transaction": {"id": f"tx{i}", "total_order": i},
        })
    rows.append({"before": None, "after": None,
                 "source": {"name": "db1", "ts_ms": 2000, "db": "s", "table": "repos",
                            "server_id": 1, "file": "mysql-bin.000001", "pos": 200},
                 "op": "t", "ts_ms": 2000, "transaction": None})
    rows.append({"before": None, "after": None,
                 "source": {"name": "db1", "ts_ms": 2001, "db": "s", "table": "repos",
                            "server_id": 1, "file": "mysql-bin.000001", "pos": 201},
                 "op": "m", "ts_ms": 2001, "transaction": None})
    rows.append({"before": None,
                 "after": {"repo": "r0", "path": "px", "commit": "cx",
                           "lang": "py", "content": "bodyx"},
                 "source": {"name": "db1", "ts_ms": 2002, "db": "s", "table": "repos",
                            "server_id": 1, "file": "mysql-bin.000001", "pos": None},
                 "op": "c", "ts_ms": 2002, "transaction": None})
    p = tmp_path / "dbz_mixed"
    p.mkdir()
    (p / "events.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_debezium_unknown_op_fails_fast_by_default(spark, tmp_path):
    """Out-of-contract Debezium records (op 't'/'m', null source.pos) must
    not vanish: the default mode aborts the read in-plan."""
    from rook_spark import sources

    path = _write_debezium_mixed(tmp_path)
    with pytest.raises(Exception, match="unknown op|null source.pos"):
        sources.read_events_debezium(spark, path).collect()


def test_debezium_dead_letter_partitions_input_exactly(spark, tmp_path):
    """dead_letter mode: canonical feed + rejects == the whole input, with
    per-reason tags — the counted quarantine path."""
    from rook_spark import sources

    path = _write_debezium_mixed(tmp_path)
    good = sources.read_events_debezium(spark, path, on_unknown="dead_letter")
    rejects = sources.read_debezium_rejects(spark, path)
    assert good.count() == 6
    assert good.where(F.col("op").isNull()).count() == 0
    assert good.where(F.col("offset").isNull()).count() == 0
    reasons = {r["reject_reason"]: r["n"] for r in
               rejects.groupBy("reject_reason").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert reasons == {"unknown_op": 2, "null_pos": 1}
    assert good.count() + rejects.count() == 9


def test_sink_lifecycle_register_unregister(spark, tmp_path):
    """ReplicationStream listener-lifecycle parity: with_sink /
    without_sink / sink_names; removal is loud on unknown names and a
    removed sink stops receiving batches."""
    from rook_spark.cdc.engine import CdcEngine

    seen = []
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    engine.with_sink("probe", lambda df, bid: seen.append((bid, df.count())),
                     when="before")
    assert engine.sink_names() == ("probe",)

    ev = generate_events(spark, 400, seed=67)
    engine.replay(ev.where(F.col("offset") < 200), 0)
    assert len(seen) == 1 and seen[0][1] > 0

    engine.without_sink("probe")
    assert engine.sink_names() == ()
    engine.replay(ev.where(F.col("offset") >= 200), 1)
    assert len(seen) == 1  # no further deliveries after removal

    with pytest.raises(KeyError, match="no sink named"):
        engine.without_sink("probe")


def test_await_stream_ready_and_isactive(spark, tmp_path):
    """connect(timeout)/isConnected parity: await_stream_ready returns
    once a trigger completed; isActive is the live connected check."""
    from rook_spark.cdc.engine import CdcEngine, await_stream_ready
    from rook_spark.cdc.fixtures import write_events

    ev = generate_events(spark, 600, seed=71)
    src = str(tmp_path / "log")
    write_events(ev, src, n_files=3)
    engine = CdcEngine(spark, str(tmp_path / "repos")).ignoring_servers(99)
    q = engine.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    try:
        assert await_stream_ready(q, timeout_s=60) is q
        assert q.isActive
    finally:
        q.processAllAvailable()
        q.stop()
    assert not q.isActive


def test_debezium_null_op_neither_vanishes_nor_passes(spark, tmp_path):
    """Three-valued-logic trap (self-review round 3): an envelope with a
    NULL op must land in the rejects feed — not disappear from both
    readers because `col IN (...)` evaluates to SQL NULL."""
    import json

    from rook_spark import sources

    rows = [
        {"before": None,
         "after": {"repo": "r", "path": "p", "commit": "c", "lang": "py",
                   "content": "x"},
         "source": {"name": "d", "ts_ms": 1, "db": "s", "table": "t",
                    "server_id": 1, "file": "mysql-bin.000001", "pos": 1},
         "op": "c", "ts_ms": 1, "transaction": None},
        {"before": None, "after": None,
         "source": {"name": "d", "ts_ms": 2, "db": "s", "table": "t",
                    "server_id": 1, "file": "mysql-bin.000001", "pos": 2},
         "op": None, "ts_ms": 2, "transaction": None},
    ]
    p = tmp_path / "dbz_nullop"
    p.mkdir()
    (p / "e.json").write_text("\n".join(json.dumps(r) for r in rows))
    good = sources.read_events_debezium(spark, str(p), on_unknown="dead_letter")
    rejects = sources.read_debezium_rejects(spark, str(p))
    assert good.count() == 1
    assert rejects.count() == 1
    assert rejects.first()["reject_reason"] == "unknown_op"
    # error mode fails even for a NULL op
    with pytest.raises(Exception, match="unknown op"):
        sources.read_events_debezium(spark, str(p)).collect()


def test_debezium_fail_fast_survives_column_pruning(spark, tmp_path):
    """The error-mode guard must fire even when the consumer never reads
    op/offset (e.g. .count()) — a projection-riding raise_error would be
    column-pruned away; the WHERE-based guard cannot be."""
    from rook_spark import sources

    path = _write_debezium_mixed(tmp_path)
    with pytest.raises(Exception, match="unknown op|null source.pos"):
        sources.read_events_debezium(spark, path).count()
