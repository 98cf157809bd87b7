"""Write-audit-publish: movable refs on the snapshot chain
(LakeTable.begin_staging / publish / abort_staging + read(ref=...)),
vacuum retention of the published version, and the engine audit hook
(consumers never observe an unaudited epoch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rook_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, content string, op string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4)
    t.merge(_changes(spark, [("r", "a", "v1", "I"), ("r", "b", "v1", "I")]), 0)
    return t


def _state(t, **kw):
    return {(r["repo"], r["path"]): r["content"] for r in t.read(**kw).collect()}


def test_staged_writes_invisible_until_publish(spark, table):
    """Default reads resolve the published ref while staging: staged
    epochs are auditor-only (ref='head') until publish fast-forwards."""
    published = _state(table)
    table.begin_staging()
    assert table.is_staging()
    table.merge(_changes(spark, [("r", "a", "v2", "U"), ("r", "c", "v1", "I")]), 1)

    assert _state(table) == published                      # consumers: old state
    head = _state(table, ref="head")                       # auditor: staged state
    assert head == {("r", "a"): "v2", ("r", "b"): "v1", ("r", "c"): "v1"}
    assert table.published_version() < table.current_version()

    table.publish()
    assert not table.is_staging()
    assert _state(table) == head                           # atomic flip
    assert table.published_version() == table.current_version()


def test_abort_reverts_state_and_fences(spark, table):
    """Abort = rollback to the published version + ref clear: data,
    batch fence, and watermarks revert, so the rejected batch can be
    re-delivered (fixed) and applies cleanly."""
    published = _state(table)
    v_pub = table.current_version()
    table.begin_staging()
    table.merge(_changes(spark, [("r", "a", "POISON", "U")]), 1)
    assert _state(table, ref="head")[("r", "a")] == "POISON"

    res = table.abort_staging()
    assert res["aborted_to"] == v_pub
    assert not table.is_staging()
    assert _state(table) == _state(table, ref="head") == published
    # fence reverted: batch 1 re-applies (the retry leg)
    table.merge(_changes(spark, [("r", "a", "v2-fixed", "U")]), 1)
    assert _state(table)[("r", "a")] == "v2-fixed"


def test_publish_keep_staging_continuous_mode(spark, table):
    """keep_staging: the ref fast-forwards WITH the publish, so the next
    epoch is gated too — readers always lag the head by at most the
    in-flight epoch."""
    table.begin_staging()
    table.merge(_changes(spark, [("r", "a", "v2", "U")]), 1)
    table.publish(keep_staging=True)
    assert table.is_staging()
    assert _state(table)[("r", "a")] == "v2"
    table.merge(_changes(spark, [("r", "a", "v3", "U")]), 2)
    assert _state(table)[("r", "a")] == "v2"               # v3 still staged
    table.publish()
    assert _state(table)[("r", "a")] == "v3"


def test_ref_read_errors_and_double_staging(spark, table):
    with pytest.raises(ValueError, match="no ref"):
        table.read(ref="main")  # not staging
    table.begin_staging()
    with pytest.raises(ValueError, match="already active"):
        table.begin_staging()
    with pytest.raises(ValueError, match="exactly one"):
        table.read(ref="main", version=0)
    table.publish()
    with pytest.raises(ValueError, match="no staging session"):
        table.publish()
    with pytest.raises(ValueError, match="no staging session"):
        table.abort_staging()


def test_vacuum_retains_published_version(spark, table):
    """The published ref pins its version's metadata AND data files
    through an aggressive vacuum, like a tag — readers being served
    that state can never have it reclaimed under them."""
    published = _state(table)
    table.begin_staging()
    for i in range(1, 5):  # staged epochs churn the same keys
        table.merge(_changes(spark, [("r", "a", f"s{i}", "U")]), i)
    table.vacuum(keep_last=1)
    assert _state(table) == published                      # still readable
    assert _state(table, ref="head")[("r", "a")] == "s4"
    # the published version's snapshot survived metadata expiry too
    assert table.snapshot(table.published_version()) is not None


def test_maintenance_under_staging_preserves_gating(spark, table):
    """compact/cluster read the chain head and carry the refs forward:
    a maintenance commit mid-staging must not leak staged rows to
    default readers."""
    published = _state(table)
    table.begin_staging()
    table.merge_mor(
        spark.createDataFrame(
            [("r", "a", "v2", 1, 1, "U")],
            "repo string, path string, content string, __ordinal long, __offset long, op string",
        ),
        1,
    )
    table.compact()
    assert table.is_staging()
    assert _state(table) == published
    assert _state(table, ref="head")[("r", "a")] == "v2"
    table.publish()
    assert _state(table)[("r", "a")] == "v2"


def test_engine_audit_hook_publishes_and_aborts(spark, tmp_path):
    """CdcEngine(audit=...): a passing audit publishes the epoch, a
    failing audit rolls back and re-admits the offsets — consumers never
    observe the rejected epoch."""
    from rook_spark.cdc.engine import AuditFailed, CdcEngine
    from rook_spark.cdc.fixtures import generate_events

    ev = generate_events(spark, 600, seed=11)
    ev = ev.persist()
    cut = 300

    def audit(t):
        # the WAP audit: no poison content may reach consumers
        return (
            t.read(ref="head").where(F.col("content").contains("POISON")).limit(1).count() == 0
        )

    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=8,
                    audit=audit).ignoring_servers(99)
    eng.replay(ev.where(F.col("offset") < cut))
    t = eng.target()
    assert t.is_staging()  # continuous mode: gate stays up
    good = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert good  # epoch 1 audited + published

    poisoned = ev.where(F.col("offset") >= cut).withColumn(
        "after",
        F.when(
            F.col("after").isNotNull(),
            F.col("after").withField("content", F.lit("POISON")),
        ),
    )
    with pytest.raises(AuditFailed):
        eng.replay(poisoned)
    after_fail = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert after_fail == good                              # nothing leaked
    # offsets re-admitted: the clean re-delivery applies and publishes
    stats = eng.replay(ev.where(F.col("offset") >= cut))
    assert stats.rows_in > 0
    final = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert final != good
    assert not any("POISON" in c for c in final.values())
    ev.unpersist()


def test_staged_changes_is_the_audit_diff(spark, table):
    """staged_changes() = net diff published -> head: exactly the rows
    an audit must adjudicate, as a valid LWW change set."""
    table.begin_staging()
    table.merge(_changes(spark, [("r", "a", "v2", "U"), ("r", "b", None, "D"),
                                 ("r", "c", "v1", "I")]), 1)
    diff = {(r["repo"], r["path"]): (r["op"], r["content"])
            for r in table.staged_changes().collect()}
    assert diff == {
        ("r", "a"): ("U", "v2"),
        ("r", "b"): ("D", "v1"),   # old image on the delete side
        ("r", "c"): ("U", "v1"),
    }
    table.publish()
    with pytest.raises(ValueError, match="no staging session"):
        table.staged_changes()


def test_streaming_audit_gate(spark, tmp_path):
    """WAP under the streaming tail (the deployment shape): a poisoned
    file arriving mid-stream fails its epoch's audit — the stream stops
    LOUDLY, consumers never see the poison, and the batch-replay retry
    leg (the rollback contract documented on LakeTable.rollback)
    publishes the clean re-delivery."""
    from rook_spark.cdc.engine import CdcEngine
    from rook_spark.cdc.fixtures import generate_events, write_events

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = generate_events(spark, 400, seed=13).persist()
    clean_tail = ev.where("offset >= 200")

    def audit(t):
        return (
            t.read(ref="head").where(F.col("content").startswith("POISON"))
            .limit(1).count() == 0
        )

    eng = CdcEngine(spark, str(tmp_path / "repos"), n_buckets=4,
                    audit=audit).ignoring_servers(99)
    # clean prefix of the log, delivered per the file-tail source
    # contract (ordered chunk files directly in src — write_events)
    write_events(ev.where("offset < 200"), src, n_files=2)
    q = eng.stream(src, ckpt)
    try:
        q.processAllAvailable()
        t = eng.target()
        state = {(r["repo"], r["path"]): r["content"]
                 for r in t.read().collect()}
        assert state, "clean epochs must have published"
        assert not any(c == "POISON" for c in state.values())

        # a poisoned chunk arrives mid-stream (later mtime = next file
        # the tail picks up): its epoch's audit fails, the staged epoch
        # rolls back, and the stream dies LOUDLY
        poisoned = clean_tail.withColumn(
            "after",
            F.when(F.col("after").isNotNull(),
                   F.col("after").withField("content", F.lit("POISON"))),
        )
        poisoned.repartition(1).write.mode("append").parquet(src)
        with pytest.raises(Exception, match="audit rejected|AuditFailed"):
            q.processAllAvailable()
            q.awaitTermination(timeout=60)
    finally:
        if q.isActive:
            q.stop()
    t = eng.target()
    state2 = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    # consumers never saw the poison: published state == pre-poison state
    assert state2 == state
    # retry leg: the abort reverted watermarks, so a clean batch
    # re-delivery of the rolled-back offsets applies normally
    eng.replay(clean_tail)
    final = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert not any(c == "POISON" for c in final.values())
    assert final != state
    ev.unpersist()
