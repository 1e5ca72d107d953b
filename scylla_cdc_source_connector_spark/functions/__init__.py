"""Large-scale training-data pipeline functions: text analysis,
deduplication families, similarity search — all built on JVM-side
pyspark.sql.functions (no per-row Python on the hot path)."""
