"""Sinks (K1-K6, SURVEY.md §2.8): partitioned gzip text documents,
versioned rewrite (Spark-native replacement for in-place mutation)."""
