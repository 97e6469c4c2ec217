"""Streaming ingestion gate — the continuous-crawl twin of
``llm.dedup.incremental_new_docs`` (SURVEY §2.9 beyond-reference).

A production corpus grows by streaming batches of scraped documents;
each batch must be gated against (a) everything already in the corpus
and (b) duplicates arriving within the stream itself. Batch-mode this
is an anti-join + window; stream-mode the same semantics compose from
two supported streaming primitives:

* **stream-static left_anti join** on the content fingerprint against
  the corpus fingerprint index (a static frame, re-resolvable per
  micro-batch so a refreshed index is picked up on restart);
* **``dropDuplicatesWithinWatermark`` on the fingerprint** for
  duplicates inside the stream — state bounded by the watermark horizon
  instead of growing with the corpus (the corpus-side memory lives in
  the static index, where it belongs).

The fingerprint is the same md5-of-normalized-text the batch operators
key on, so a drained stream admits exactly the docs the batch gate
admits (asserted in tests/test_streaming_ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.text import fingerprint


def stream_new_docs(
    incoming: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    event_time: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gate a document stream to genuinely-new docs.

    ``corpus_fps`` is the seen-set index: a static frame with one
    ``fp`` column (md5 of normalized text — build it once with
    ``corpus.select(fingerprint("text").alias("fp")).distinct()`` and
    persist it as a table the stream re-reads). The output carries the
    input columns plus ``fp`` so the sink can append the admitted
    fingerprints back to the index.
    """
    keyed = incoming.withColumn("fp", fingerprint(text_col))
    fresh = keyed.join(corpus_fps, "fp", "left_anti")
    return fresh.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )
