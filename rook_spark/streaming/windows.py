"""Streaming windowed aggregation + custom stateful operators.

The reference has no time-window machinery (binlogs can't deliver late
data — SURVEY.md §2.10), but a complete Spark-first engine exposes the
Structured Streaming surface its users expect alongside the CDC loop:

- tumbling/sliding event-time windows with watermark-bounded state,
- session windows,
- arbitrary per-key state via ``applyInPandasWithState`` (the analog of
  rook's stateful tx-assembly loop, ``MySQLReplicationStream.java:234-249``,
  generalized to user-defined state machines).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "table_name",
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
    distinct_col: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time counts with a watermark bound.

    Watermark semantics: state for a window closes once event time
    passes window.end + watermark; later events are dropped — bounded
    state under unbounded streams. Works identically on a batch
    DataFrame (window() is just an expression), which is how the oracle
    checks it. ``distinct_col`` optionally adds an approximate distinct
    count of that column per (window, key) — it must differ from
    ``key_col`` (distinct-of-the-group-key is identically 1).
    """
    w = F.window(F.col(ts_col), window, slide or window)
    aggs = [F.count(F.lit(1)).alias("n")]
    if distinct_col is not None:
        aggs.append(F.approx_count_distinct(distinct_col).alias("nd"))
    grouped = (
        events.withWatermark(ts_col, watermark) if events.isStreaming else events
    )
    return grouped.groupBy(w.alias("win"), F.col(key_col)).agg(*aggs)


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session windows (native session_window operator)."""
    sw = F.session_window(F.col(ts_col), gap)
    df = events.withWatermark(ts_col, gap) if events.isStreaming else events
    return df.groupBy(sw.alias("session"), F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n_events")
    )


# ------------------------------------------------------- custom stateful op

RUNNING_STATE_SCHEMA = "n LONG, total DOUBLE, max_offset LONG"
RUNNING_OUTPUT_SCHEMA = (
    "key LONG, n LONG, total DOUBLE, max_offset LONG, batch_rows LONG"
)


def running_totals_stream(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value",
    offset_col: str = "offset",
) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum, max offset)
    emitted once per micro-batch per active key. Arrow-batched per group;
    state is typed and checkpointed (rook's in-memory ``txQueue`` state
    machine, ``MySQLReplicationStream.java:234-249``, made
    fault-tolerant and user-definable)."""
    src = events.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("double").alias("value"),
        F.col(offset_col).cast("long").alias("offset"),
    )

    # defined INSIDE so cloudpickle serializes it by value: executors
    # never import this package (driver may run from any cwd)
    def running_totals_fn(key: tuple[Any, ...], pdfs: Any, state: GroupState):
        import pandas as _pd

        if state.exists:
            n, total, max_off = state.get
        else:
            n, total, max_off = 0, 0.0, -1
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            n += len(pdf)
            total += float(pdf["value"].sum())
            max_off = max(max_off, int(pdf["offset"].max()))
        state.update((n, total, max_off))
        yield _pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                "total": [total],
                "max_offset": [max_off],
                "batch_rows": [batch_rows],
            }
        )

    return src.groupBy("key").applyInPandasWithState(
        running_totals_fn,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("offset",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming duplicate elimination with bounded state: rows with an
    already-seen key are dropped as long as they arrive within the
    watermark window; state older than the watermark is evicted
    (``dropDuplicatesWithinWatermark``). This is the Spark-native
    counterpart of the engine's lineage watermark filter for sources
    whose re-deliveries are time-bounded but not offset-ordered — e.g. a
    Kafka producer with retries. On a batch DataFrame it degrades to
    plain ``dropDuplicates`` (the infinite-watermark case), which is how
    the oracle checks it.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Time-bounded stream-stream equi-join: right rows match left rows
    with the same key whose timestamp falls in ``[left_ts, left_ts +
    within]``. Both sides carry watermarks so the join state is bounded:
    a buffered row is evicted once the other side's watermark passes its
    admissible window — without the time bound a stream-stream join would
    buffer forever. Works identically on batch frames (the bound is just
    a predicate), which is how the oracle checks it.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l, r = lw.alias("l"), rw.alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how)
