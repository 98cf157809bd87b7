"""Schema-evolution lock (Delta ``mergeSchema=false`` analog): with
``set_schema_evolution("locked")``, any ingest whose widened schema
differs from the stored one — a new column riding a data batch, a type
promotion — refuses loudly and atomically; ``"auto"`` restores the
historical append/promote behavior. The column-level data contract next
to CHECK constraints' row-level one (an upstream typo must not silently
add a junk column to a 100 TB table). Explicit DDL (rename/drop) stays
available under lock; missing columns still null-fill (not evolution).
Reference parity: rook applies whatever shape the binlog TABLE_MAP
declares (AbstractMySQLReplicationStream.java:161-179) — the lock is the
lake-side guard rook never needed because its sink was schemaless.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rook_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("content", T.StringType()),
    ]
)


def _changes(spark, rows, ddl="repo string, path string, qty int, content string, op string"):
    return spark.createDataFrame(rows, ddl)


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4)
    t.merge(_changes(spark, [("r1", "a", 1, "v1", "I")]), 0)
    return t


def test_locked_refuses_new_column_atomically(spark, table):
    table.set_schema_evolution("locked")
    v = table.current_version()
    wide = _changes(
        spark, [("r1", "a", 2, "v2", "e1", "U"), ("r1", "b", 3, "v1", "e2", "I")],
        "repo string, path string, qty int, content string, extra string, op string",
    )
    with pytest.raises(ValueError, match="LOCKED.*extra"):
        table.merge(wide, 1)
    # atomic refusal: no snapshot, neither row applied
    assert table.current_version() == v
    state = {(r["repo"], r["path"]): r["content"] for r in table.read().collect()}
    assert state == {("r1", "a"): "v1"}
    # unlock -> the same batch evolves and applies
    table.set_schema_evolution("auto")
    table.merge(wide, 1)
    assert "extra" in table.read().columns
    assert table.read().count() == 2


def test_locked_refuses_type_promotion(spark, table):
    table.set_schema_evolution("locked")
    promo = _changes(
        spark, [("r1", "a", 2**40, "v2", "U")],
        "repo string, path string, qty long, content string, op string",
    )
    with pytest.raises(ValueError, match="LOCKED.*qty"):
        table.merge(promo, 1)
    # incompatible changes still surface as the widen error, not the lock
    bad = _changes(
        spark, [("r1", "a", "x", "v2", "U")],
        "repo string, path string, qty string, content string, op string",
    )
    with pytest.raises(ValueError, match="incompatible type change"):
        table.merge(bad, 1)


def test_locked_allows_missing_columns_nullfill(spark, table):
    """A batch MISSING a column is projection, not evolution: it must
    apply under lock (new rows null-fill, updates LWW the sent cols)."""
    table.set_schema_evolution("locked")
    narrow = spark.createDataFrame(
        [("r1", "b", "fresh", "I")], "repo string, path string, content string, op string")
    table.merge(narrow, 1)
    row = {r["path"]: r for r in table.read().collect()}
    assert row["b"]["qty"] is None and row["b"]["content"] == "fresh"


def test_locked_covers_mor_and_overwrite(spark, table):
    table.set_schema_evolution("locked")
    wide_ddl = "repo string, path string, qty int, content string, extra string, op string"
    with pytest.raises(ValueError, match="LOCKED"):
        table.merge_mor(_changes(spark, [("r1", "c", 1, "v", "x", "I")], wide_ddl), 1)
    with pytest.raises(ValueError, match="LOCKED"):
        table.overwrite(
            spark.createDataFrame(
                [("r1", "a", 1, "v", "x")],
                "repo string, path string, qty int, content string, extra string"))
    # same-shape overwrite is fine under lock
    table.overwrite(spark.createDataFrame([("r1", "a", 9, "v9")], SCHEMA))
    assert table.read().first()["qty"] == 9


def test_lock_lifecycle_create_clone_rollback(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4,
        schema_evolution="locked")
    assert t.snapshot().evolution == "locked"
    with pytest.raises(ValueError, match="must be 'auto' or 'locked'"):
        LakeTable.create(spark, str(tmp_path / "bad"), SCHEMA, ["repo"],
                         schema_evolution="strict")
    with pytest.raises(ValueError, match="must be 'auto' or 'locked'"):
        t.set_schema_evolution("frozen")
    t.merge(_changes(spark, [("r1", "a", 1, "v1", "I")]), 0)
    # clone carries the lock
    c = LakeTable.clone(spark, t.path, str(tmp_path / "c"))
    assert c.snapshot().evolution == "locked"
    with pytest.raises(ValueError, match="LOCKED"):
        c.merge(_changes(
            spark, [("r1", "a", 1, "v", "x", "U")],
            "repo string, path string, qty int, content string, extra string, op string"), 1)
    # rollback past the unlock restores the lock (policy is state)
    v_locked = t.current_version()
    t.set_schema_evolution("auto")
    assert t.snapshot().evolution == "auto"
    t.rollback(v_locked)
    assert t.snapshot().evolution == "locked"
    # DDL stays available under lock: rename is deliberate evolution
    t.rename_column("content", "body")
    assert "body" in t.read().columns
