"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal plumbing. All hot paths are JVM-side
``pyspark.sql.functions`` compositions; Python appears only as
vectorized Arrow pandas UDFs (sha256 invariant, multimodal decode)."""
