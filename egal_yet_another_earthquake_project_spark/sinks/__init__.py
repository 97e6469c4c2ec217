"""Sinks (SURVEY §2.1): Elasticsearch bulk upsert, Parquet/object archive."""
