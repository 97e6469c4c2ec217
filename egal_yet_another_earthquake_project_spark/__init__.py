"""EGAL-Spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference earthquake-analytics pipeline
(burakai/EGAL_Yet-Another-Earthquake-Project): Kafka/file ingestion (bronze),
typed parse + dedup + enrichment (silver), descriptive statistics and
filter/group analytics (gold), Elasticsearch-style bulk sinks, plus the
large-scale training-data-pipeline operators (deduplication, similarity
search, text analysis, multimodal column plumbing) the reference never had.

Design stance (SURVEY.md §7): everything is DataFrame/Catalyst — no RDD
stage, no driver-side collect loops, no per-row Python in the hot path.
"""

__version__ = "0.1.0"

from egal_yet_another_earthquake_project_spark.session import get_spark  # noqa: F401
