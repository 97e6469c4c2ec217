"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI for very large blobs); metadata
(mime, byte length, content hash, decode params) is a typed struct; decode
and feature extraction run as Arrow-batched ``mapInPandas`` so the heavy
per-item work is vectorized per partition and never touches the driver.

The decode step itself is STUBBED in this container (no PIL/libav): the
deterministic fake below stands in, clearly marked, but the Spark-side
contract — schemas, batch iteration, partition parallelism — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Feature-extraction output schema: input id + fixed-width feature vector.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text as the opaque blob,
    with a typed metadata struct (mime, n_bytes, sha256). Real pipelines
    read the blob from the source (e.g. image bytes in parquet)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def decode_payload(blob: bytes) -> object:
    """The real decoder (image/audio/frame decode) — not available in this
    container. Marked unimplemented on purpose; see fake_features for the
    deterministic stand-in used by tests."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


def fake_features(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: byte-bucket histogram,
    normalized. Same input ⇒ same features, any machine."""
    counts = [0] * dim
    for byte in blob:
        counts[byte % dim] += 1
    total = float(len(blob)) or 1.0
    return [c / total for c in counts]


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each partition streams pandas batches through the
    extractor — this is exactly where a real image/audio model call goes
    (batched, executor-side, GPU-friendly)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len),
                    "features": pdf[payload_col].map(
                        lambda b: fake_features(bytes(b), dim)
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)
