"""Partial row images (binlog_row_image=MINIMAL): per-column patch fold
(cdc/patch.py), patch-aware COW merge, engine row_image='minimal' mode.

The oracle throughout is a sequential Python model of the semantics
(apply each event in (ordinal, offset) order; I/U set their masked
columns, I/D break inheritance, D removes the row) — the fold + merge
must match it for every batching of the same event sequence.
"""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.cdc.patch import patch_reduce
from rook_spark.lake.table import LakeTable

PAYLOAD = ("commit", "lang", "content")

FLAT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("commit_ordinal", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("updated_cols", T.ArrayType(T.StringType())),
    ]
)

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _flat(spark, rows):
    """rows: (repo, path, commit, lang, content, op, ord, off, mask)."""
    return spark.createDataFrame(rows, FLAT_SCHEMA)


def _model(rows):
    """Sequential Python oracle over flat rows (any order; sorts by
    (ordinal, offset)). Returns {key: {col: value}} of live rows."""
    state: dict[tuple, dict] = {}
    for r in sorted(rows, key=lambda r: (r[6], r[7])):
        key = (r[0], r[1])
        op, mask = r[5], r[8]
        vals = dict(zip(PAYLOAD, r[2:5]))
        if op == "D":
            state.pop(key, None)
            continue
        sets = set(PAYLOAD) if mask is None else set(mask)
        if op == "I":
            state[key] = {c: (vals[c] if c in sets else None) for c in PAYLOAD}
        else:  # U: patch onto current (absent key -> empty row)
            cur = state.get(key, {c: None for c in PAYLOAD})
            state[key] = {c: (vals[c] if c in sets else cur[c]) for c in PAYLOAD}
    return state


def _read_state(table):
    return {
        (r["repo"], r["path"]): {c: r[c] for c in PAYLOAD}
        for r in table.read().collect()
    }


def _fresh_table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / f"t{uuid.uuid4().hex[:8]}"), TABLE_SCHEMA,
        ["repo", "path"], n_buckets=4,
    )


def _apply(table, spark, rows, batch_id):
    changes = (
        patch_reduce(_flat(spark, rows))
        .withColumnRenamed("commit_ordinal", "__ordinal")
        .withColumnRenamed("offset", "__offset")
    )
    table.merge(changes, batch_id)


# --------------------------------------------------------------- fold


def test_patch_reduce_single_batch_matrix(spark, tmp_path):
    """I sets all; a later masked U overrides ONLY its mask (filler in
    unmasked after-image columns never lands); D resets inheritance so
    pre-delete columns do not leak into a post-delete patch; a patch on
    a never-inserted key creates a row with only its masked columns."""
    rows = [
        # key A: insert, then patch content only (filler commit/lang)
        ("r", "a", "cA0", "lA0", "tA0", "I", 0, 0, None),
        ("r", "a", "FILLER", "FILLER", "tA1", "U", 1, 1, ["content"]),
        # key B: insert, delete, patch lang after the delete
        ("r", "b", "cB0", "lB0", "tB0", "I", 2, 2, None),
        ("r", "b", None, None, None, "D", 3, 3, None),
        ("r", "b", "FILLER", "lB1", "FILLER", "U", 4, 4, ["lang"]),
        # key C: insert then delete -> gone
        ("r", "c", "cC0", "lC0", "tC0", "I", 5, 5, None),
        ("r", "c", None, None, None, "D", 6, 6, None),
        # key D: patch on nothing -> row with only content
        ("r", "d", "FILLER", "FILLER", "tD0", "U", 7, 7, ["content"]),
        # key E: full-image U (NULL mask) sets everything incl. NULLs
        ("r", "e", "cE0", None, "tE0", "U", 8, 8, None),
    ]
    t = _fresh_table(spark, tmp_path)
    _apply(t, spark, rows, 0)
    assert _read_state(t) == _model(rows)
    got = _read_state(t)
    assert got[("r", "a")] == {"commit": "cA0", "lang": "lA0", "content": "tA1"}
    assert got[("r", "b")] == {"commit": None, "lang": "lB1", "content": None}
    assert ("r", "c") not in got
    assert got[("r", "d")] == {"commit": None, "lang": None, "content": "tD0"}
    assert got[("r", "e")] == {"commit": "cE0", "lang": None, "content": "tE0"}


def test_patch_inherits_across_epochs(spark, tmp_path):
    """Unset columns of a patch inherit the STORED row; an in-batch
    I/D break means unset columns are NULL, not carried."""
    t = _fresh_table(spark, tmp_path)
    epoch1 = [
        ("r", "a", "cA0", "lA0", "tA0", "I", 0, 0, None),
        ("r", "b", "cB0", "lB0", "tB0", "I", 1, 1, None),
        ("r", "k", "cK0", "lK0", "tK0", "I", 2, 2, None),
    ]
    _apply(t, spark, epoch1, 0)
    epoch2 = [
        # patch: content only; commit/lang must inherit epoch-1 values
        ("r", "a", "FILLER", "FILLER", "tA1", "U", 10, 10, ["content"]),
        # delete + patch in the same later epoch: no inheritance across D
        ("r", "b", None, None, None, "D", 11, 11, None),
        ("r", "b", "FILLER", "lB1", "FILLER", "U", 12, 12, ["lang"]),
        # untouched key k rides along
    ]
    _apply(t, spark, epoch2, 1)
    expected = _model(epoch1 + epoch2)
    assert _read_state(t) == expected
    got = _read_state(t)
    assert got[("r", "a")] == {"commit": "cA0", "lang": "lA0", "content": "tA1"}
    assert got[("r", "b")] == {"commit": None, "lang": "lB1", "content": None}
    assert got[("r", "k")] == {"commit": "cK0", "lang": "lK0", "content": "tK0"}


def test_stale_patch_batch_is_skipped(spark, tmp_path):
    """Cross-batch LWW guard holds in patch mode: re-delivering an older
    epoch's events (ordinals at-or-below stored) changes nothing."""
    t = _fresh_table(spark, tmp_path)
    epoch1 = [("r", "a", "cA0", "lA0", "tA0", "I", 0, 0, None)]
    epoch2 = [("r", "a", "FILLER", "FILLER", "tA1", "U", 10, 10, ["content"])]
    _apply(t, spark, epoch1, 0)
    _apply(t, spark, epoch2, 1)
    before = _read_state(t)
    _apply(t, spark, epoch1, 2)  # stale re-delivery as a new batch id
    assert _read_state(t) == before


def test_mor_rejects_patch_changes(spark, tmp_path):
    t = _fresh_table(spark, tmp_path)
    changes = patch_reduce(
        _flat(spark, [("r", "a", "c", "l", "t", "U", 0, 0, ["content"])])
    )
    with pytest.raises(ValueError, match="COW"):
        t.merge_mor(changes, 0)


def test_engine_validates_row_image(spark, tmp_path):
    from rook_spark.cdc.engine import CdcEngine

    with pytest.raises(ValueError, match="cow"):
        CdcEngine(spark, str(tmp_path / "x"), write_mode="mor", row_image="minimal")
    with pytest.raises(ValueError, match="row_image"):
        CdcEngine(spark, str(tmp_path / "y"), row_image="partial")


# ------------------------------------------------------------- engine


def test_engine_minimal_row_image_end_to_end(spark, tmp_path):
    """CdcEngine(row_image='minimal') over a generated log converted to
    MINIMAL images (poisoned filler in non-authoritative columns),
    replayed in 3 epochs — final table equals the sequential Python
    model, poison never lands, and batching is invisible."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import as_minimal_images, generate_events

    ev = as_minimal_images(generate_events(spark, 300, seed=7)).persist()
    eng = CdcEngine(
        spark, str(tmp_path / "repos"), n_buckets=4, row_image="minimal"
    ).ignoring_servers(99)
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        eng.replay(ev.where(f"offset >= {lo} and offset < {hi}"))

    tracked = ev.where(
        "lower(schema_name || '.' || table_name) = 'rook.repos' and server_id != 99"
    )
    img = F.when(F.col("op") == "D", F.col("before")).otherwise(F.col("after"))
    flat_rows = tracked.select(
        img.getField("repo"), img.getField("path"),
        img.getField("commit"), img.getField("lang"), img.getField("content"),
        "op", "commit_ordinal", "offset", "updated_cols",
    ).collect()
    expected = _model([tuple(r) for r in flat_rows])
    got = _read_state(eng.target())
    assert got == expected
    assert not any(
        v is not None and v.startswith("POISON")
        for row in got.values() for v in row.values()
    )
    ev.unpersist()


def test_key_changing_update_with_mask(spark, tmp_path):
    """A key-changing U under MINIMAL images: the old key dies, the row
    at the new key carries ONLY the event-set columns (inheritance never
    crosses keys — documented engine contract)."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.schema import event_schema

    def raw(op, before, after, off, mask):
        return (off, 0, 1, "rook", "repos", op, before, after, off, 0, None, mask)

    img = lambda repo, path, c, l, t: (repo, path, c, l, t)  # noqa: E731
    schema = event_schema().add("updated_cols", T.ArrayType(T.StringType()))
    events = spark.createDataFrame(
        [
            raw("I", None, img("r", "a", "c0", "l0", "t0"), 0, None),
            # key moves a -> b; only content is authoritative
            raw("U", img("r", "a", None, None, None),
                img("r", "b", "FILLER", "FILLER", "t1"), 1, ["content"]),
        ],
        schema,
    )
    eng = CdcEngine(
        spark, str(tmp_path / "repos"), n_buckets=4, row_image="minimal"
    )
    eng.replay(events)
    got = _read_state(eng.target())
    assert ("r", "a") not in got
    assert got[("r", "b")] == {"commit": None, "lang": None, "content": "t1"}


# ---------------------------------------------------------- property


_EV = st.tuples(
    st.sampled_from(["k1", "k2"]),
    st.sampled_from(["I", "U", "D"]),
    st.one_of(
        st.none(),
        st.sets(st.sampled_from(PAYLOAD), max_size=3).map(sorted),
    ),
)


@given(st.lists(_EV, min_size=1, max_size=12), st.integers(0, 11))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_patch_fold_matches_model_any_batching(spark, tmp_path, evs, cut):
    """ANY event sequence of I/U(mask)/D over two keys, applied as ONE
    batch and as TWO batches split at an arbitrary point, both equal the
    sequential model — associativity of the fold + merge composition."""
    rows = []
    for i, (key, op, mask) in enumerate(evs):
        mask = None if op in ("I", "D") else mask  # true inserts are full-image
        vals = (f"c{i}", f"l{i}", f"t{i}") if op != "D" else (None, None, None)
        rows.append(("r", key, *vals, op, i, i, mask))
    expected = _model(rows)

    one = _fresh_table(spark, tmp_path)
    _apply(one, spark, rows, 0)
    assert _read_state(one) == expected

    cut = min(cut, len(rows))
    two = _fresh_table(spark, tmp_path)
    if rows[:cut]:
        _apply(two, spark, rows[:cut], 0)
    if rows[cut:]:
        _apply(two, spark, rows[cut:], 1)
    assert _read_state(two) == expected


def test_stream_minimal_row_image(spark, tmp_path):
    """row_image='minimal' through the streaming tail (the deployment
    shape): the engine reads the partial event schema so the mask column
    rides the file stream, and the streamed final state equals the batch
    replay of the same MINIMAL log."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import (
        as_minimal_images, generate_events, write_events,
    )
    from rook_spark.cdc.schema import event_schema

    ev = as_minimal_images(generate_events(spark, 200, seed=9))
    src = str(tmp_path / "src")
    write_events(ev, src, n_files=3)

    eng = CdcEngine(spark, str(tmp_path / "s_repos"), n_buckets=4,
                    row_image="minimal").ignoring_servers(99)
    q = eng.stream(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()

    batch = CdcEngine(spark, str(tmp_path / "b_repos"), n_buckets=4,
                      row_image="minimal").ignoring_servers(99)
    batch.replay(spark.read.schema(event_schema(partial=True)).parquet(src))

    streamed = _read_state(eng.target())
    assert streamed == _read_state(batch.target())
    assert streamed, "stream must have applied rows"
    assert not any(
        v is not None and v.startswith("POISON")
        for row in streamed.values() for v in row.values()
    )


def test_patch_with_additive_evolution(spark, tmp_path):
    """A patch batch carrying a NEW column widens the table (additive
    evolution) and sets it only where masked; pre-evolution rows
    null-fill, and a later patch NOT naming the new column inherits it."""
    t = _fresh_table(spark, tmp_path)
    _apply(t, spark, [("r", "a", "c0", "l0", "t0", "I", 0, 0, None),
                      ("r", "b", "c1", "l1", "t1", "I", 1, 1, None)], 0)

    wide = T.StructType(list(FLAT_SCHEMA.fields[:5])
                        + [T.StructField("stars", T.LongType())]
                        + list(FLAT_SCHEMA.fields[5:]))
    ev2 = spark.createDataFrame(
        [("r", "a", None, None, None, 7, "U", 10, 10, ["stars"])], wide)
    changes = (
        patch_reduce(ev2)
        .withColumnRenamed("commit_ordinal", "__ordinal")
        .withColumnRenamed("offset", "__offset")
    )
    t.merge(changes, 1)
    got = {(r["repo"], r["path"]): (r["content"], r["stars"])
           for r in t.read().collect()}
    # a's content inherited, stars set; b untouched -> stars null-fills
    assert got == {("r", "a"): ("t0", 7), ("r", "b"): ("t1", None)}

    # later patch not naming stars inherits it
    ev3 = spark.createDataFrame(
        [("r", "a", None, None, "t2", None, "U", 20, 20, ["content"])], wide)
    changes = (
        patch_reduce(ev3)
        .withColumnRenamed("commit_ordinal", "__ordinal")
        .withColumnRenamed("offset", "__offset")
    )
    t.merge(changes, 2)
    got = {(r["repo"], r["path"]): (r["content"], r["stars"])
           for r in t.read().collect()}
    assert got == {("r", "a"): ("t2", 7), ("r", "b"): ("t1", None)}
