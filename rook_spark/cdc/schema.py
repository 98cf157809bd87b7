"""Canonical change-event schema (SURVEY.md §1.2).

Re-expresses the reference's event model —
``RowsMutationReplicationEvent(serverId, schema, table, rows)``
(``rook-api/.../RowsMutationReplicationEvent.java:24-36``) with its three
subclasses Insert/Update/Delete (after-image / before+after pair /
before-image; ``InsertRowsReplicationEvent.java:25-33``,
``UpdateRowsReplicationEvent.java:27-40``,
``DeleteRowsReplicationEvent.java:25-33``) — as ONE flat DataFrame row per
changed DB row. Rook's positional ``Serializable[]`` row images become
named structs; its out-of-band column-ordinal maps
(``SynchronizationContext.java:89-113``) are replaced by Spark's analyzer.
"""

from __future__ import annotations

from pyspark.sql import types as T

KEY_COLS = ("repo", "path")
ORDINAL_COL = "commit_ordinal"
OFFSET_COL = "offset"

#: payload of one row image — the `repos` table shape (BASELINE.json input_hint)
ROW_IMAGE_FIELDS = [
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
]

#: additive column that appears mid-stream (schema-evolution scenario)
EVOLVED_FIELD = T.StructField("size_bytes", T.LongType())


def row_image_type(evolved: bool = False) -> T.StructType:
    fields = list(ROW_IMAGE_FIELDS)
    if evolved:
        fields.append(EVOLVED_FIELD)
    return T.StructType(fields)


def event_schema(evolved: bool = False, partial: bool = False) -> T.StructType:
    """``partial=True`` appends the ``updated_cols array<string>`` mask
    column of ``binlog_row_image=MINIMAL`` streams (rook_spark.cdc.patch):
    NULL = full image, array = the after-image columns the event
    authoritatively sets. Full-image logs read fine under the partial
    schema (the column null-fills), so an engine running
    ``row_image='minimal'`` always tails with it."""
    img = row_image_type(evolved)
    fields = [
        T.StructField("offset", T.LongType(), False),
        T.StructField("tx_id", T.LongType()),
        T.StructField("server_id", T.LongType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("before", img),
        T.StructField("after", img),
        T.StructField("commit_ordinal", T.LongType()),
        T.StructField("source_partition", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
    ]
    if partial:
        fields.append(T.StructField("updated_cols", T.ArrayType(T.StringType())))
    return T.StructType(fields)


def repos_schema(evolved: bool = False) -> T.StructType:
    """Schema of the target/state table (key = (repo, path))."""
    return row_image_type(evolved)
