from rook_spark.cdc.dedup_index import DedupIndex
from rook_spark.cdc.engine import CdcEngine

__all__ = ["CdcEngine", "DedupIndex"]
