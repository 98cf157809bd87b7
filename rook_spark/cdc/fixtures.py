"""Deterministic synthetic CDC log generator + independent replay oracle.

Mirrors the reference's test strategy (SURVEY.md §5): deterministic
mutation scripts replayed against the sink, asserted by golden final
state (``h4com/IntegrationTest.java:187-197`` mutates on master and
asserts sink state on slave). Here the "mutation script" is a seeded
event log and the golden state is computed independently by DuckDB.

Everything is generated **Spark-natively from ``spark.range``** with
hash-derived pseudo-randomness — no driver-side loops, no ``collect`` —
so the same generator that makes 10k test events makes 10^10 bench
events by changing one argument; generation parallelism = Spark
parallelism.

Covered fixture scenarios (FIXTURES.md §2):
  1/2/3. insert / update-chains / delete mix (op drawn per event)
  4. D-then-I and I-then-D on the same key within a batch (ops are
     independent draws per key occurrence; ordinal decides survivor)
  5. duplicate replay — ``with_replayed_suffix`` re-delivers a suffix
  6. ignored tables / server ids — decoy fraction of events
  7. tx groups — contiguous offsets share tx_id
  8. additive schema evolution — ``size_bytes`` appears after a cutoff
  9. skew — top repo draws >~50% of events (power-law repo assignment)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rook_spark.cdc.schema import event_schema

LANGS = ["py", "java", "md", "rs", "go"]
IGNORED_SERVER_ID = 99
DECOY_TABLE = "decoy_table"


def _u(seed: int, salt: int, *cols: Column) -> Column:
    """Deterministic uniform [0, 1) derived from xxhash64."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), *cols)
    return (F.pmod(h, F.lit(2**61)) / F.lit(float(2**61))).cast("double")


WORDS = ["def", "return", "import", "class", "self", "value", "table", "merge",
         "offset", "commit", "stream", "batch", "index", "apply", "state", "query"]


def _image(repo: Column, path: Column, ordinal: Column, evolved: bool) -> Column:
    """Deterministic row image for (key, ordinal) — content is a pure
    function of the key and ordinal so any independent replayer derives
    identical bytes (the sha256 invariant's foundation). The body is
    word-based (compressible, like real source code) with a short hash
    suffix for uniqueness."""
    base = F.concat_ws("|", repo, path, ordinal.cast("string"))
    words = F.array(*[F.lit(w) for w in WORDS])
    body = F.concat_ws(
        " ",
        *[
            F.element_at(
                words,
                (F.pmod(F.xxhash64(base, F.lit(i)), F.lit(len(WORDS))) + 1).cast("int"),
            )
            for i in range(24)
        ],
    )
    content = F.concat(F.lit("content:"), base, F.lit(":"), body, F.lit(":"),
                       F.substring(F.sha2(base, 256), 1, 16))
    fields = [
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat(base, F.lit("#c")), 256), 1, 12).alias("commit"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.xxhash64(repo, path), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
        content.alias("content"),
    ]
    if evolved:
        fields.append(F.length(content).cast("long").alias("size_bytes"))
    return F.struct(*fields)


def generate_events(
    spark: SparkSession,
    n_events: int,
    seed: int = 42,
    n_repos: int = 50,
    paths_per_repo: int = 1000,
    skew_exponent: float = 6.0,
    tx_size: int = 8,
    n_source_partitions: int = 8,
    decoy_frac: float = 0.05,
    ignored_server_frac: float = 0.05,
    evolve_after_frac: float | None = None,
    op_weights: tuple[float, float, float] = (0.6, 0.3, 0.1),
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the canonical change-event DataFrame (cdc_events fixture).

    ``skew_exponent=6`` puts ~(1/n_repos)^(1/6) ≈ 52% of events on repo 0
    for n_repos=50 — the hot-repo scenario (north_rule skew gate).
    """
    df = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    off = F.col("id")

    u_repo = _u(seed, 1, off)
    repo_idx = F.floor(F.lit(n_repos) * F.pow(u_repo, F.lit(skew_exponent))).cast("int")
    repo = F.concat(F.lit("repo-"), F.lpad(repo_idx.cast("string"), 4, "0"))
    path_idx = F.pmod(F.xxhash64(F.lit(seed), F.lit(2), off), F.lit(paths_per_repo))
    path = F.concat(
        F.lit("src/"), F.lpad(F.pmod(path_idx, 37).cast("string"), 2, "0"),
        F.lit("/f"), F.lpad(path_idx.cast("string"), 6, "0"), F.lit(".txt"),
    )

    u_op = _u(seed, 3, off)
    w_i, w_u, _ = op_weights
    op = (
        F.when(u_op < w_i, F.lit("I"))
        .when(u_op < w_i + w_u, F.lit("U"))
        .otherwise(F.lit("D"))
    )

    u_tbl = _u(seed, 4, off)
    table_name = F.when(u_tbl < decoy_frac, F.lit(DECOY_TABLE)).otherwise(F.lit("repos"))
    u_srv = _u(seed, 5, off)
    server_id = (
        F.when(u_srv < ignored_server_frac, F.lit(IGNORED_SERVER_ID))
        .otherwise(F.lit(1))
        .cast("long")
    )

    ordinal = off  # commit ordinal == log position in the base fixture
    evolved = evolve_after_frac is not None
    cutoff = int(n_events * evolve_after_frac) if evolved else None
    after_img = _image(repo, path, ordinal, evolved)
    before_img = _image(repo, path, ordinal - 1, evolved)
    if evolved:
        # the column "appears" mid-stream: null before the cutoff offset
        def gate(img: Column) -> Column:
            return F.when(
                off >= F.lit(cutoff), img
            ).otherwise(img.withField("size_bytes", F.lit(None).cast("long")))
        after_img = gate(after_img)
        before_img = gate(before_img)

    ev = df.select(
        off.alias("offset"),
        (off / F.lit(tx_size)).cast("long").alias("tx_id"),
        server_id.alias("server_id"),
        F.lit("rook").alias("schema_name"),
        table_name.alias("table_name"),
        op.alias("op"),
        before_img.alias("_b"),
        after_img.alias("_a"),
        off.alias("commit_ordinal"),
        F.pmod(F.xxhash64(repo), F.lit(n_source_partitions)).cast("int").alias("source_partition"),
        F.timestamp_seconds(F.lit(1700000000) + off).alias("ts"),
    )
    # insert: after only; update: before+after; delete: before only
    # (the three event subclasses, rook-api event/*.java)
    ev = ev.select(
        "offset", "tx_id", "server_id", "schema_name", "table_name", "op",
        F.when(F.col("op") != "I", F.col("_b")).alias("before"),
        F.when(F.col("op") != "D", F.col("_a")).alias("after"),
        "commit_ordinal", "source_partition", "ts",
    )
    return ev


def as_minimal_images(ev: DataFrame, payload_cols: tuple[str, ...] = ("commit", "lang", "content")) -> DataFrame:
    """Convert a full-image event log into ``binlog_row_image=MINIMAL``
    shape (rook_spark.cdc.patch): U events get a deterministic
    ``updated_cols`` mask keyed on ``offset % 5`` (0 = full image,
    1 = content, 2 = lang, 3 = commit+content, 4 = lang+content — the
    same rule the ``cdc_partial_row_image`` driver oracle re-derives in
    SQL), their NON-authoritative after-image columns are POISONED with
    filler the engine must never apply, and before images are stripped
    to the key — which is all MINIMAL actually ships."""
    m = F.pmod(F.col("offset"), F.lit(5))
    mask = F.when(
        F.col("op") == "U",
        F.when(m == 1, F.array(F.lit("content")))
        .when(m == 2, F.array(F.lit("lang")))
        .when(m == 3, F.array(F.lit("commit"), F.lit("content")))
        .when(m == 4, F.array(F.lit("lang"), F.lit("content"))),
    )
    filler = F.concat(F.lit("POISON-"), F.col("offset").cast("string"))
    out = ev.withColumn("updated_cols", mask)
    for c in payload_cols:
        poisoned = F.when(
            F.col("after").isNotNull()
            & F.col("updated_cols").isNotNull()
            & ~F.array_contains(F.col("updated_cols"), c),
            F.col("after").withField(c, filler.cast(ev.schema["after"].dataType[c].dataType)),
        )
        out = out.withColumn("after", F.coalesce(poisoned, F.col("after")))
    key_fields = [f.name for f in ev.schema["before"].dataType.fields]
    key_only = F.struct(*[
        (F.col(f"before.{f}") if f in ("repo", "path")
         else F.lit(None).cast(ev.schema["before"].dataType[f].dataType)).alias(f)
        for f in key_fields
    ])
    return out.withColumn("before", F.when(F.col("before").isNotNull(), key_only))


def with_replayed_suffix(events: DataFrame, n_events: int, replay_frac: float = 0.2) -> DataFrame:
    """At-least-once source simulation: re-deliver the last ``replay_frac``
    of the log verbatim (duplicate offsets). Exactly-once gate: final
    table state must equal the non-duplicated replay."""
    cutoff = int(n_events * (1 - replay_frac))
    return events.unionByName(events.where(F.col("offset") >= cutoff))


def order_files_for_tail(path: str, prefix: str = "chunk") -> None:
    """Rename a directory's parquet part files into name order with
    strictly increasing mtimes, so Spark's FileStreamSource (which picks
    oldest-mtime-first) delivers them in the order ``repartitionByRange``
    wrote them — the mechanical half of the ordered-tail contract, shared
    by :func:`write_events` and any test materializing a custom-shaped
    topic dump (e.g. Kafka-record files)."""
    import os
    import time

    parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    base = time.time() - len(parts) * 2
    for i, f in enumerate(parts):
        dst = os.path.join(path, f"{prefix}-{i:05d}.parquet")
        os.rename(os.path.join(path, f), dst)
        os.utime(dst, (base + i * 2, base + i * 2))


def write_events(events: DataFrame, path: str, n_files: int = 8) -> None:
    """Materialize the log as parquet chunks that a file-stream source
    delivers in OFFSET ORDER — the engine's source contract is
    "offsets non-decreasing per source partition" (what a binlog or a
    Kafka partition provides; ``MySQLReplicationStream.java:161-179``
    preserves it by single-threaded dispatch). Spark's FileStreamSource
    picks oldest-mtime-first, so chunks are renamed into range order
    with strictly increasing mtimes."""
    events.repartitionByRange(n_files, "offset").write.mode("overwrite").parquet(path)
    order_files_for_tail(path)


def map_driver_events(ev: DataFrame, n_repos: int = 25, tx_size: int = 8,
                      n_source_partitions: int = 8) -> DataFrame:
    """Map the driver's generic ``events`` table (event_id, ts, user_id,
    event_type, value, props) into the canonical CDC event shape, with
    every derived column a pure engine-portable expression (lpad/md5/
    concat — bit-identical in DuckDB) so an independent SQL replay oracle
    can reproduce the exact final table, sha256(content) included.

    Decoys are derived too, so the driver's log exercises the P1/P2
    filters: ``user_id % 10 == 7`` → ignored server 99;
    ``event_id % 97 == 13`` → decoy table.
    """
    uid = F.col("user_id")
    eid = F.col("event_id")
    repo = F.concat(F.lit("repo-"), F.lpad((uid % n_repos).cast("string"), 4, "0"))
    path = F.concat(F.lit("src/f"), F.lpad(uid.cast("string"), 6, "0"), F.lit(".txt"))
    content = F.concat(
        F.lit("v1|"), F.col("event_type"), F.lit("|"), F.col("props"),
        F.lit("|"), eid.cast("string"),
    )
    img = F.struct(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.md5(content), 1, 12).alias("commit"),
        F.col("event_type").alias("lang"),
        content.alias("content"),
    )
    op = F.when(F.col("event_type") == "error", "D").otherwise("U")
    return ev.select(
        eid.alias("offset"),
        (eid / F.lit(tx_size)).cast("long").alias("tx_id"),
        F.when(uid % 10 == 7, F.lit(IGNORED_SERVER_ID)).otherwise(F.lit(1))
         .cast("long").alias("server_id"),
        F.lit("rook").alias("schema_name"),
        F.when(eid % 97 == 13, F.lit(DECOY_TABLE)).otherwise(F.lit("repos"))
         .alias("table_name"),
        op.alias("op"),
        F.when(op == "D", img).alias("before"),
        F.when(op != "D", img).alias("after"),
        eid.alias("commit_ordinal"),
        (uid % n_source_partitions).cast("int").alias("source_partition"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


# --------------------------------------------------------------------- oracle

def oracle_final_state_sql(
    events_parquet_glob: str, evolved: bool = False, union_by_name: bool = False,
    table: str = "rook.repos",
) -> str:
    """DuckDB SQL computing the golden final state of one tracked table
    from the raw event log — an independent replay implementation
    (LWW by (commit_ordinal, offset), delete drops the key, ignored
    tables/servers filtered; duplicates collapse because replayed rows
    are byte-identical). ``table`` picks the qualified table the oracle
    replays (multi-table demux tests replay each table's oracle)."""
    extra = ', img.size_bytes AS size_bytes' if evolved else ""
    ubn = ", union_by_name=true" if union_by_name else ""
    return f"""
WITH filtered AS (
  SELECT * FROM read_parquet('{events_parquet_glob}'{ubn})
  WHERE lower(schema_name || '.' || table_name) = '{table.lower()}'
    AND server_id NOT IN ({IGNORED_SERVER_ID})
),
keyed AS (
  SELECT "offset", op, commit_ordinal,
         CASE WHEN op = 'D' THEN before ELSE after END AS img
  FROM filtered
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY img.repo, img.path
           ORDER BY commit_ordinal DESC, "offset" DESC) AS rn
  FROM keyed
)
SELECT img.repo AS repo, img.path AS path, img.commit AS commit,
       img.lang AS lang, img.content AS content{extra}
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""
