"""Table CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT` /
InvariantViolationException analog): ANSI semantics, atomic refusal on
every ingest path, add/drop/rollback/clone lifecycle, rename/drop DDL
interplay, and the engine's dead-letter routing mode — the data-contract
stance for a replication stream that must not stall on one bad upstream
row (the table-level form of rook's listener error isolation,
MySQLReplicationStream.java:161-179)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.engine import CdcEngine
from rook_spark.lake.table import ConstraintViolation, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("size_val", T.LongType()),
        T.StructField("content", T.StringType()),
    ]
)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, size_val long, content string, op string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4,
        constraints={"size_nonneg": "size_val >= 0"},
    )


def test_merge_violation_is_atomic_refusal(spark, table):
    table.merge(_changes(spark, [("r1", "a", 5, "v1", "I")]), 0)
    v = table.current_version()
    with pytest.raises(ConstraintViolation, match="size_nonneg"):
        table.merge(
            _changes(spark, [("r1", "a", 7, "v2", "U"), ("r1", "b", -3, "v1", "I")]),
            1,
        )
    # nothing moved: no snapshot, no partial application of the clean row
    assert table.current_version() == v
    state = {(r["repo"], r["path"]): (r["size_val"], r["content"])
             for r in table.read().collect()}
    assert state == {("r1", "a"): (5, "v1")}
    # a clean batch under the SAME batch id applies (the epoch was never
    # consumed)
    table.merge(_changes(spark, [("r1", "a", 7, "v2", "U")]), 1)
    assert table.read().first()["content"] == "v2"


def test_null_passes_ansi_and_explicit_not_null_catches(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, ["repo", "path"], n_buckets=4,
        constraints={"size_nonneg": "size_val >= 0",
                     "content_not_null": "content IS NOT NULL"},
    )
    # NULL size passes the >= 0 check (ANSI: unknown is not a violation)
    t.merge(_changes(spark, [("r1", "a", None, "v1", "I")]), 0)
    assert t.read().count() == 1
    # but a NULL content trips the explicit NOT NULL constraint
    with pytest.raises(ConstraintViolation, match="content_not_null"):
        t.merge(_changes(spark, [("r1", "b", 1, None, "I")]), 1)


def test_delete_rows_exempt(spark, table):
    table.merge(_changes(spark, [("r1", "a", 5, "v1", "I")]), 0)
    # a delete whose before-image payload violates (or is null) still
    # applies: the row is leaving the table
    table.merge(_changes(spark, [("r1", "a", -99, None, "D")]), 1)
    assert table.read().count() == 0


def test_merge_mor_violation_writes_no_delta(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t3"), SCHEMA, ["repo", "path"], n_buckets=4,
        constraints={"size_nonneg": "size_val >= 0"},
    )
    t.merge_mor(_changes(spark, [("r1", "a", 5, "v1", "I")]), 0)
    v = t.current_version()
    with pytest.raises(ConstraintViolation, match="size_nonneg"):
        t.merge_mor(_changes(spark, [("r1", "b", -1, "v1", "I")]), 1)
    snap = t.snapshot()
    assert snap.version == v
    assert sum(len(fs) for fs in snap.deltas.values()) == 1  # only batch 0's


def test_overwrite_enforces(spark, table):
    with pytest.raises(ConstraintViolation):
        table.overwrite(
            _changes(spark, [("r1", "a", -5, "v1", "I")]).drop("op"))


def test_add_constraint_lifecycle(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t4"), SCHEMA, ["repo", "path"],
                         n_buckets=4)
    t.merge(_changes(spark, [("r1", "a", -5, "v1", "I"),
                             ("r1", "b", 3, "v1", "I")]), 0)
    # validate=True scans current state and refuses on the dirty row
    with pytest.raises(ConstraintViolation, match="size_nonneg"):
        t.add_constraint("size_nonneg", "size_val >= 0")
    # unparseable / unresolvable expressions refuse at add time
    with pytest.raises(ValueError, match="does not resolve"):
        t.add_constraint("bad", "no_such_col > 0")
    # known-dirty migration: validate=False commits; INGEST enforcement
    # starts immediately...
    t.add_constraint("size_nonneg", "size_val >= 0", validate=False)
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("size_nonneg", "size_val >= 0")
    with pytest.raises(ConstraintViolation):
        t.merge(_changes(spark, [("r1", "c", -1, "v1", "I")]), 1)
    # ...but maintenance rewrites never re-check pre-existing violations
    t.compact(max_files_per_bucket=0)
    assert t.read().count() == 2
    # drop lifts the gate
    t.drop_constraint("size_nonneg")
    t.merge(_changes(spark, [("r1", "c", -1, "v1", "I")]), 1)
    assert t.read().count() == 3
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("size_nonneg")


def test_rollback_reverts_constraints(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t5"), SCHEMA, ["repo", "path"],
                         n_buckets=4)
    t.merge(_changes(spark, [("r1", "a", 1, "v1", "I")]), 0)
    v_before = t.current_version()
    t.add_constraint("size_nonneg", "size_val >= 0")
    with pytest.raises(ConstraintViolation):
        t.merge(_changes(spark, [("r1", "b", -1, "v1", "I")]), 1)
    # rollback past the add_constraint removes the check (constraints are
    # snapshot STATE, like the schema)
    t.rollback(v_before)
    t.merge(_changes(spark, [("r1", "b", -1, "v1", "I")]), 1)
    assert t.read().count() == 2


def test_rename_and_drop_column_refuse_under_constraint(spark, table):
    table.merge(_changes(spark, [("r1", "a", 5, "v1", "I")]), 0)
    with pytest.raises(ValueError, match="size_nonneg"):
        table.rename_column("size_val", "byte_size")
    with pytest.raises(ValueError, match="size_nonneg"):
        table.drop_column("size_val")
    # un-constrained columns rename freely
    table.rename_column("content", "body")
    # after dropping the constraint the DDL goes through
    table.drop_constraint("size_nonneg")
    table.rename_column("size_val", "byte_size")
    assert {f.name for f in table.snapshot().schema().fields} == {
        "repo", "path", "byte_size", "body"}


def test_clone_carries_constraints(spark, table, tmp_path):
    table.merge(_changes(spark, [("r1", "a", 5, "v1", "I")]), 0)
    c = LakeTable.clone(spark, table.path, str(tmp_path / "fork"))
    assert c.snapshot().constraints == {"size_nonneg": "size_val >= 0"}
    with pytest.raises(ConstraintViolation):
        # batch 1: the fork carries the source's batch-0 fence
        c.merge(_changes(spark, [("r1", "b", -1, "v1", "I")]), 1)


def test_additive_evolution_nullfill_semantics(spark, tmp_path):
    """A batch that does not carry a constrained column stores NULL in
    the merged row — the check judges that stored value: NULL passes a
    range CHECK (ANSI) but trips an explicit NOT NULL."""
    t = LakeTable.create(
        spark, str(tmp_path / "t6"), SCHEMA, ["repo", "path"], n_buckets=4,
        constraints={"size_nonneg": "size_val >= 0"},
    )
    narrow = spark.createDataFrame(
        [("r1", "a", "v1", "I")], "repo string, path string, content string, op string"
    )
    t.merge(narrow, 0)  # size_val absent -> NULL -> passes
    assert t.read().first()["size_val"] is None
    t.add_constraint("size_not_null", "size_val IS NOT NULL", validate=False)
    with pytest.raises(ConstraintViolation, match="size_not_null"):
        t.merge(narrow.withColumn("path", F.lit("b")), 1)


def test_partial_row_images_refuse_constraints(spark, tmp_path):
    """An unset patch column is NULL in the batch but inherits the stored
    value at apply time — the batch alone is not the evaluable unit, so
    the combination refuses loudly rather than silently under-checking."""
    img = "struct<repo string, path string, commit string, lang string, content string>"
    schema = (
        "offset long, tx_id long, server_id long, schema_name string, "
        f"table_name string, op string, before {img}, after {img}, "
        "commit_ordinal long, source_partition int, ts timestamp, "
        "updated_cols array<string>"
    )
    im = ("r1", "p1", "c1", "py", "hello")
    ev = spark.createDataFrame(
        [(1, 0, 1, "rook", "repos", "I", None, im, 1, 0, None, None)], schema)
    engine = CdcEngine(
        spark, str(tmp_path / "repos"), row_image="minimal",
        constraints={"content_not_null": "content IS NOT NULL"},
    )
    with pytest.raises(ValueError, match="complete row images"):
        engine.replay(ev, 0)


# ------------------------------------------------------------------ engine

IMG = "struct<repo string, path string, commit string, lang string, content string>"
EV_SCHEMA = (
    "offset long, tx_id long, server_id long, schema_name string, table_name string, "
    f"op string, before {IMG}, after {IMG}, commit_ordinal long, "
    "source_partition int, ts timestamp"
)


def _row(off, op, repo, path, lang, content):
    im = (repo, path, f"c{off}", lang, content)
    return (off, 0, 1, "rook", "repos",
            op, im if op != "I" else None, im if op != "D" else None, off, off % 2, None)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_engine_dead_letter_routing(spark, tmp_path, mode):
    """constraint_mode='dead_letter': violating EVENTS leave the batch
    before the LWW reduce — state equals the replay of the constraint-
    filtered log (an earlier clean version of a key whose LATEST version
    violates must win), offsets are consumed (re-delivery is a no-op),
    and the rows land under <dead_letter>/constraints with the violated
    constraint names."""
    d = str(tmp_path / ("repos_" + mode))
    engine = CdcEngine(
        spark, d, write_mode=mode,
        n_source_partitions=2 if mode == "mor" else None,
        constraints={"no_bad_lang": "lang <> 'spam'"},
        constraint_mode="dead_letter",
    )
    batch = spark.createDataFrame(
        [_row(1, "I", "r1", "p1", "py", "v1"),
         _row(2, "U", "r1", "p1", "spam", "v2"),   # violating LATEST version
         _row(3, "I", "r2", "p2", "spam", "junk"),  # violating only version
         _row(4, "I", "r3", "p3", "md", "ok")],
        EV_SCHEMA,
    )
    stats = engine.replay(batch, 0)
    assert stats.dead_lettered == 2
    state = {(r["repo"], r["path"]): r["content"]
             for r in engine.target().read().collect()}
    # r1/p1 keeps v1 (the violating v2 never arrived); r2/p2 never appears
    assert state == {("r1", "p1"): "v1", ("r3", "p3"): "ok"}
    dl = spark.read.parquet(f"{d}/_dead_letter/constraints")
    got = {(r["repo"], r["path"]): (r["__violated"], r["__batch_id"])
           for r in dl.collect()}
    assert got == {("r1", "p1"): (["no_bad_lang"], 0),
                   ("r2", "p2"): (["no_bad_lang"], 0)}
    # offsets consumed: verbatim re-delivery is fenced, state unchanged
    stats2 = engine.replay(batch, 1)
    assert stats2.rows_in == 0 and stats2.dead_lettered == 0
    state2 = {(r["repo"], r["path"]): r["content"]
              for r in engine.target().read().collect()}
    assert state2 == state
    # deletes ride through the split untouched
    engine.replay(spark.createDataFrame([_row(9, "D", "r1", "p1", "py", None)],
                                        EV_SCHEMA), 2)
    assert engine.target().read().count() == 1


def test_engine_fail_mode_poisons_epoch(spark, tmp_path):
    engine = CdcEngine(
        spark, str(tmp_path / "repos"),
        constraints={"no_bad_lang": "lang <> 'spam'"},
    )
    clean = spark.createDataFrame([_row(1, "I", "r1", "p1", "py", "v1")], EV_SCHEMA)
    engine.replay(clean, 0)
    v = engine.target().current_version()
    bad = spark.createDataFrame([_row(2, "I", "r2", "p2", "spam", "x")], EV_SCHEMA)
    with pytest.raises(ConstraintViolation, match="no_bad_lang"):
        engine.replay(bad, 1)
    t = engine.target()
    assert t.current_version() == v  # nothing written, watermark unmoved
    # the SAME offsets can re-deliver after the feed is fixed
    fixed = spark.createDataFrame([_row(2, "I", "r2", "p2", "md", "x")], EV_SCHEMA)
    engine.replay(fixed, 1)
    assert t.read().count() == 2
