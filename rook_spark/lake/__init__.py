from rook_spark.lake.table import LakeTable, Snapshot

__all__ = ["LakeTable", "Snapshot"]
