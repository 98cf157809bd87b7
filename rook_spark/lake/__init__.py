from rook_spark.lake.metastore import (
    CommitConflict,
    InMemoryMetadataStore,
    MetadataStore,
    PosixMetadataStore,
)
from rook_spark.lake.table import ConstraintViolation, LakeTable, Snapshot

__all__ = [
    "LakeTable",
    "Snapshot",
    "ConstraintViolation",
    "MetadataStore",
    "PosixMetadataStore",
    "InMemoryMetadataStore",
    "CommitConflict",
]
