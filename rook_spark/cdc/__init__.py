from rook_spark.cdc.engine import CdcEngine

__all__ = ["CdcEngine"]
