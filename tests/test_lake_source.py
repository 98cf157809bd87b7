"""Lake table as a batch Spark format with pushdown file skipping
(lake/source.py): the invariant is exact equality with
``LakeTable.read()`` in every state (unfolded MOR deltas, post-delete,
time travel) while pushed predicates prune files through the
snapshot's stats/blooms — and NEVER prune a delta-carrying bucket
(the soundness exemption read() applies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

from rook_spark.cdc.engine import CdcEngine
from rook_spark.cdc.fixtures import generate_events
from rook_spark.lake.source import LakeTableDataSource, LakeTableReader


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(LakeTableDataSource)
    return spark


def _state(df):
    return {(r["repo"], r["path"], r["content"]) for r in
            df.select("repo", "path", "content").collect()}


def _mor_engine(spark, path, ev, **kw):
    eng = CdcEngine(spark, path, n_buckets=8, write_mode="mor",
                    **kw).ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 1200), 0)
    eng.target().compact()
    eng.replay(ev.where(F.col("offset") >= 1200), 1)  # unfolded deltas
    return eng


def test_source_equals_read_with_unfolded_deltas(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 2500, seed=121)
    eng = _mor_engine(spark, str(tmp_path / "t"), ev)
    got = spark.read.format("rook_lake").load(str(tmp_path / "t"))
    assert _state(got) == _state(eng.target().read())
    # and after an erasure (tombstone deltas in the mix)
    eng.target().delete_where(F.col("lang") == "md", mode="mor")
    got = spark.read.format("rook_lake").load(str(tmp_path / "t"))
    assert _state(got) == _state(eng.target().read())
    assert got.where("lang = 'md'").count() == 0


def test_version_time_travel(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 1500, seed=122)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8,
                    write_mode="mor").ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < 700), 0)
    eng.replay(ev.where(F.col("offset") >= 700), 1)
    old = (spark.read.format("rook_lake").option("version", 1)
           .load(str(tmp_path / "t")))
    assert _state(old) == _state(eng.target().read(version=1))


def test_pushed_ranges_prune_files_but_stay_exact(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 2000, seed=123)
    eng = _mor_engine(spark, str(tmp_path / "t"), ev)
    eng.target().compact()  # fold → every bucket stat-prunable

    r_all = LakeTableReader(None, {"path": str(tmp_path / "t")})
    n_all = sum(len(p.base) for p in r_all.partitions())
    r = LakeTableReader(None, {"path": str(tmp_path / "t")})
    remaining = list(r.pushFilters([GreaterThanOrEqual(("__ordinal",), 10**9)]))
    assert len(remaining) == 1  # every filter handed back for re-apply
    assert sum(len(p.base) for p in r.partitions()) == 0 < n_all

    # e2e through Spark: a real predicate still returns EXACT rows
    got = (spark.read.format("rook_lake").load(str(tmp_path / "t"))
           .where("lang = 'py'"))
    assert _state(got) == _state(eng.target().read().where("lang = 'py'"))


def test_bloom_equality_pruning(registered, tmp_path):
    spark = registered
    ev = generate_events(spark, 2000, seed=124)
    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=8, write_mode="mor",
                    bloom_cols=("commit",)).ignoring_servers(99)
    eng.replay(ev, 0)
    eng.target().compact()
    probe = eng.target().read().select("commit").first()["commit"]

    r_all = LakeTableReader(None, {"path": str(tmp_path / "t")})
    n_all = sum(len(p.base) for p in r_all.partitions())
    r = LakeTableReader(None, {"path": str(tmp_path / "t")})
    list(r.pushFilters([EqualTo(("commit",), probe)]))
    n_pruned = sum(len(p.base) for p in r.partitions())
    assert n_pruned < n_all  # a high-cardinality hash hits few blooms

    got = (spark.read.format("rook_lake").load(str(tmp_path / "t"))
           .where(F.col("commit") == probe))
    assert got.count() == eng.target().read().where(F.col("commit") == probe).count()


def test_delta_carrying_buckets_never_pruned(registered, tmp_path):
    """Soundness: with unfolded deltas, stats describe only the BASE —
    a delta row may revive a key outside the base bounds, so pruning
    must skip those buckets entirely (mirrors read()'s exemption)."""
    spark = registered
    ev = generate_events(spark, 2000, seed=125)
    eng = _mor_engine(spark, str(tmp_path / "t"), ev)  # deltas pending
    hi = eng.target().read(include_internal=True).agg(
        F.max("__ordinal")).first()[0]
    # a range only the DELTA rows satisfy: pruning by base stats alone
    # would drop base files whose keys the deltas revive
    r = LakeTableReader(None, {"path": str(tmp_path / "t")})
    list(r.pushFilters([GreaterThanOrEqual(("__ordinal",), int(hi))]))
    parts = r.partitions()
    # every delta-carrying bucket keeps ALL its base files
    snap_deltas = {p for p in parts if p.deltas}
    assert snap_deltas, "fixture should leave unfolded deltas"
    full = LakeTableReader(None, {"path": str(tmp_path / "t")})
    by_first = {tuple(p.deltas): len(p.base) for p in full.partitions() if p.deltas}
    for p in snap_deltas:
        assert len(p.base) == by_first[tuple(p.deltas)]


def test_columns_option_projects_at_the_source(registered, tmp_path):
    """The ``columns`` reader option narrows the worker-side parquet
    reads (the Python DS API has no prune interface, so Spark alone
    prunes only after full decode): schema + values match read(columns=)
    exactly, with unfolded MOR deltas in the mix; key columns always
    ride along; unknown columns fail loudly at planning."""
    spark = registered
    ev = generate_events(spark, 2500, seed=124)
    eng = _mor_engine(spark, str(tmp_path / "t"), ev)
    got = (spark.read.format("rook_lake").option("columns", "lang")
           .load(str(tmp_path / "t")))
    want = eng.target().read(columns=["lang"])
    assert sorted(got.columns) == sorted(want.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the reader's per-bucket partitions carry the narrowed schema, so
    # workers never even request the heavy column chunks
    r = LakeTableReader(None, {"path": str(tmp_path / "t"), "columns": "lang"})
    import json as _json
    for p in r.partitions():
        names = [f["name"] for f in _json.loads(p.schema_json)["fields"]]
        assert "content" not in names and "lang" in names
    from pyspark.errors.exceptions.captured import AnalysisException
    with pytest.raises(AnalysisException, match="unknown columns"):
        (spark.read.format("rook_lake").option("columns", "nope")
         .load(str(tmp_path / "t")).collect())


def test_string_predicate_pushdown_prunes_and_loses_nothing(registered, tmp_path):
    """String filters now prune through the snapshot's truncated string
    bounds (Iceberg truncate(16) analog): a repo-prefix scan over a
    compacted table reads fewer files than the full scan and still
    returns exactly LakeTable.read()'s answer."""
    from rook_spark.lake.table import LakeTable
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    spark = registered
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         ["repo", "path"], n_buckets=8)

    def batch(rows):
        return spark.createDataFrame(
            rows, "repo string, path string, content string, op string")

    t.merge(batch([("alpha", f"p{i:03d}", "c" * 30, "I") for i in range(48)]), 0)
    t.merge(batch([("zulu", f"q{i}", "d" * 30, "I") for i in range(3)]), 1)

    base = spark.read.format("rook_lake").load(t.path)
    want = {(r["repo"], r["path"]) for r in
            t.read().where("repo >= 'z'").collect()}
    got = base.where("repo >= 'z'")
    assert {(r["repo"], r["path"]) for r in got.collect()} == want
    assert want == {("zulu", f"q{i}") for i in range(3)}
