"""Event-source connectors (S1 analogs, SURVEY.md §2.1).

The reference's single source is a MySQL binlog tail
(``MySQLReplicationStream.java:98-116``). The Spark-first engine accepts
any ordered change-event feed that matches the canonical schema
(``rook_spark.cdc.schema.event_schema``):

- parquet / json / csv directories, batch or streamed (file-tail),
- Kafka (the production transport for Debezium-style CDC) — gated
  behind an import/packaging check since the connector jar is not in
  this environment.

All readers return the SAME canonical DataFrame, so everything
downstream (normalize → LWW → MERGE) is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rook_spark.cdc.schema import event_schema


def read_events_parquet(spark: SparkSession, path: str, evolved: bool = False) -> DataFrame:
    return spark.read.schema(event_schema(evolved)).parquet(path)


def read_events_json(spark: SparkSession, path: str, evolved: bool = False) -> DataFrame:
    """JSON lines with the canonical schema (no inference — schema is the
    contract; malformed rows fail loudly via FAILFAST)."""
    return (
        spark.read.schema(event_schema(evolved))
        .option("mode", "FAILFAST")
        .json(path)
    )


def read_events_csv(spark: SparkSession, path: str, evolved: bool = False) -> DataFrame:
    """CSV feed: flat columns with JSON-encoded row images (CSV cannot
    nest) — decoded into the canonical struct columns."""
    schema = event_schema(evolved)
    img_type = schema["after"].dataType
    flat_cols = [f for f in schema.fields if f.name not in ("before", "after")]
    csv_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in flat_cols]
        + ["before_json string", "after_json string"]
    )
    df = spark.read.schema(csv_schema).option("header", "true").csv(path)
    return df.select(
        *[f.name for f in flat_cols],
        F.from_json("before_json", img_type).alias("before"),
        F.from_json("after_json", img_type).alias("after"),
    ).select(*[f.name for f in schema.fields])


def stream_events_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
    evolved: bool = False,
    partial: bool = False,
) -> DataFrame:
    """File-tail streaming source (ordered chunk files — see
    ``write_events`` for the ordering contract). ``partial=True`` reads
    the MINIMAL-row-image schema (``updated_cols`` mask; null-fills on
    full-image chunk files, so a mixed log tails fine)."""
    reader = (
        spark.readStream.schema(event_schema(evolved, partial=partial))
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported streaming format: {fmt}")


def parse_kafka_records(
    records: DataFrame, evolved: bool = False, partial: bool = False
) -> DataFrame:
    """Decode Kafka-shaped records (``value`` binary/string JSON +
    ``partition``) into canonical events — the transformation
    :func:`stream_events_kafka` applies after ``.load()``, factored out
    so the decode plan is testable without the connector jar. The Kafka
    partition becomes ``source_partition`` (per-partition ordering is
    exactly Kafka's guarantee — the engine's watermark contract).
    ``partial=True`` decodes the MINIMAL-row-image ``updated_cols``
    mask (absent in a record's JSON = full image)."""
    return records.select(
        F.from_json(
            F.col("value").cast("string"), event_schema(evolved, partial=partial)
        ).alias("e"),
        F.col("partition").cast("int").alias("__kp"),
    ).select("e.*", "__kp").withColumn(
        "source_partition", F.col("__kp")
    ).drop("__kp")


def stream_events_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    evolved: bool = False,
) -> DataFrame:
    """Kafka tail → canonical events (value = JSON-encoded event).

    Requires the spark-sql-kafka connector jar on the classpath; this
    sandbox does not ship it, so the reader raises a clear error here
    while remaining the production entry point. Per-partition ordering
    (the engine's source contract) is exactly Kafka's guarantee;
    ``source_partition`` should be the Kafka partition.
    """
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # pragma: no cover - jar not present here
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka-0-10 connector jar "
            "(not bundled in this environment): add "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
        ) from exc
    return parse_kafka_records(raw, evolved)


def _debezium_envelope(payload_schema=None, evolved: bool = False):
    """The Debezium JSON envelope schema shared by the canonical reader
    and the dead-letter reader (schema is the contract — no inference)."""
    from pyspark.sql import types as T

    img_type = (payload_schema or event_schema(evolved))["after"].dataType
    return T.StructType([
        T.StructField("before", img_type),
        T.StructField("after", img_type),
        T.StructField("source", T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("db", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("server_id", T.LongType()),
            T.StructField("file", T.StringType()),
            T.StructField("pos", T.LongType()),
        ])),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("transaction", T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("total_order", T.LongType()),
        ])),
    ])


def _debezium_contract() -> tuple:
    """The single definition of the Debezium in-contract predicates,
    shared by BOTH readers so 'canonical + rejects == input' can never
    drift: (known_op, has_pos), each null-safe (a NULL op must count as
    out-of-contract, not vanish into three-valued-logic limbo)."""
    known_op = F.coalesce(F.col("op").isin("c", "r", "u", "d"), F.lit(False))
    has_pos = F.col("source.pos").isNotNull()
    return known_op, has_pos


def read_debezium_rejects(
    spark: SparkSession,
    path: str,
    payload_schema=None,
    evolved: bool = False,
) -> DataFrame:
    """The dead-letter side of ``read_events_debezium(...,
    on_unknown='dead_letter')``: every envelope OUTSIDE the c/r/u/d +
    has-binlog-coordinates contract, tagged with ``reject_reason``
    (``unknown_op`` / ``null_pos``). Together the two readers partition
    the input exactly (same predicates, one definition —
    :func:`_debezium_contract`; pinned by test, null op included) —
    count this one, alert on it, or sink it to a quarantine table;
    nothing vanishes silently."""
    raw = spark.read.schema(_debezium_envelope(payload_schema, evolved)).option(
        "mode", "FAILFAST"
    ).json(path)
    known_op, has_pos = _debezium_contract()
    return raw.where(~known_op | ~has_pos).withColumn(
        "reject_reason", F.when(~known_op, "unknown_op").otherwise("null_pos")
    )


def read_events_debezium(
    spark: SparkSession,
    path: str,
    payload_schema=None,
    evolved: bool = False,
    file_seq_weight: int = 10**12,
    on_unknown: str = "error",
) -> DataFrame:
    """Debezium change-event envelope (the de-facto public CDC wire
    format; the productionized descendant of the reference's binlog tail)
    → canonical events. Mapping:

    - ``op``: c/r (create/snapshot-read) → I, u → U, d → D;
    - ``offset``: total order from the MySQL binlog coordinates —
      ``file_seq * file_seq_weight + pos`` (binlog file numbers rotate,
      position resets per file; the weighted sum restores a total order,
      same scheme Debezium's own offsets use);
    - ``commit_ordinal`` = offset (binlog position IS commit order on a
      single primary — the reference's assumption too);
    - ``source_partition`` = 0: one binlog is ONE ordered stream (the
      per-partition watermark contract holds trivially); a fan-in of
      several databases would map each source's ``source.name`` to a
      partition id;
    - ``tx_id``: hash of ``transaction.id`` when present (Debezium emits
      it when ``provide.transaction.metadata`` is on), else null.

    Real Debezium streams also carry records OUTSIDE the c/r/u/d set —
    ``t`` (truncate), ``m`` (message), heartbeats — and records without
    binlog coordinates. Silently dropping those would turn a config
    change upstream into invisible data loss, so ``on_unknown``
    controls it:

    - ``"error"`` (default): fail the job via in-plan ``raise_error``
      on the first unknown op or null ``source.pos`` — loud by default;
    - ``"dead_letter"``: exclude them from the canonical feed; the
      caller routes/counts them via :func:`read_debezium_rejects`
      (same envelope + a ``reject_reason`` column) — the counted
      dead-letter path.
    """
    if on_unknown not in ("error", "dead_letter"):
        raise ValueError(f"on_unknown must be 'error' or 'dead_letter', got {on_unknown!r}")

    envelope = _debezium_envelope(payload_schema, evolved)
    raw = spark.read.schema(envelope).option("mode", "FAILFAST").json(path)
    file_seq = F.coalesce(
        F.regexp_extract(F.col("source.file"), "([0-9]+)$", 1).cast("long"), F.lit(0)
    )
    offset = file_seq * F.lit(file_seq_weight) + F.col("source.pos")
    known_op, has_pos = _debezium_contract()
    if on_unknown == "error":
        # fail fast via an UNPRUNABLE row filter: a raise_error riding an
        # output projection is column-pruned away whenever the consumer
        # doesn't read that column (e.g. .count()), silently skipping the
        # check — a WHERE affects cardinality and always evaluates
        guard = (
            F.when(
                ~known_op,
                F.raise_error(
                    F.concat(
                        F.lit("debezium: unknown op "),
                        F.coalesce(F.col("op"), F.lit("<null>")),
                    )
                ).cast("boolean"),
            )
            .when(
                ~has_pos,
                F.raise_error(
                    F.lit("debezium: record has null source.pos")
                ).cast("boolean"),
            )
            .otherwise(F.lit(True))
        )
        raw = raw.where(guard)
    else:
        raw = raw.where(known_op & has_pos)
    return raw.select(
        offset.alias("offset"),
        F.when(
            F.col("transaction.id").isNotNull(), F.xxhash64(F.col("transaction.id"))
        ).alias("tx_id"),
        F.col("source.server_id").alias("server_id"),
        F.col("source.db").alias("schema_name"),
        F.col("source.table").alias("table_name"),
        # rows reaching this projection passed the contract filter above,
        # so the mapping is total over c/r/u/d
        F.when(F.col("op").isin("c", "r"), "I")
        .when(F.col("op") == "u", "U")
        .when(F.col("op") == "d", "D")
        .alias("op"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
        offset.alias("commit_ordinal"),
        F.lit(0).cast("int").alias("source_partition"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
    )
