from rook_spark.lake.metastore import (
    CommitConflict,
    InMemoryMetadataStore,
    MetadataStore,
    PosixMetadataStore,
)
from rook_spark.lake.table import LakeTable, Snapshot

__all__ = [
    "LakeTable",
    "Snapshot",
    "MetadataStore",
    "PosixMetadataStore",
    "InMemoryMetadataStore",
    "CommitConflict",
]
