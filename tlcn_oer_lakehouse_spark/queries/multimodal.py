"""Multimodal queries: binary payload metadata (column expressions) and
the Arrow-batched mapInPandas decode/frame-sample stages, each verified
against byte-level DuckDB oracles.

The documents corpus is pure ASCII (verified: max code point 121,
char length == byte length), so UTF-8 payload bytes equal character
codes and every byte-level operator is exactly expressible in SQL via
``ascii``/``substring`` — keeping the Python mapInPandas path honest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.multimodal import (
    fake_image_features,
    frame_sample,
    with_binary_payload,
)
from tlcn_oer_lakehouse_spark.queries.base import QuerySpec, load


def mm_binary_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """S7/U4 metadata enrichment: size, checksum, mime — pure column
    expressions over the binary payload."""
    docs = with_binary_payload(load(spark, sf, "documents"))
    return docs.select(
        "doc_id",
        F.col("asset_meta.size_bytes").alias("size_bytes"),
        F.col("asset_meta.checksum").alias("checksum"),
        F.col("asset_meta.mime_type").alias("mime_type"),
    )


MM_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS size_bytes,
       md5(text) AS checksum,
       'text/plain' AS mime_type
FROM documents
"""


def mm_image_features(spark: SparkSession, sf: str) -> DataFrame:
    """U5-shaped decode stage via Arrow mapInPandas (deterministic fake:
    first-two-byte dims + mean-byte brightness)."""
    docs = with_binary_payload(load(spark, sf, "documents"))
    return fake_image_features(docs, "doc_id")


MM_FEATURES_SQL = """
SELECT doc_id,
       ascii(substring(text, 1, 1)) AS width,
       ascii(substring(text, 2, 1)) AS height,
       CAST(list_sum(list_transform(generate_series(1, length(text)),
                                    i -> ascii(substring(text, i, 1)))) AS DOUBLE)
         / length(text) AS brightness,
       octet_length(encode(text)) AS size_bytes
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video-frame-sampling shape: 4 evenly spaced 64-byte slices per
    payload, fingerprinted — 1→N fan-out inside the task."""
    docs = with_binary_payload(load(spark, sf, "documents"))
    return frame_sample(docs, "doc_id", n_frames=4, frame_bytes=64)


MM_FRAMES_SQL = """
WITH sized AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(1, length(text) // 4) AS step
  FROM documents
),
frames AS (
  SELECT doc_id, f AS frame_no, f * step AS byte_offset, text
  FROM sized, unnest(generate_series(0, 3)) AS t(f)
  WHERE f * step < n
)
SELECT doc_id, CAST(frame_no AS INT) AS frame_no, byte_offset,
       md5(substring(text, CAST(byte_offset AS INT) + 1, 64)) AS frame_md5
FROM frames
"""


SPECS = [
    QuerySpec("mm_binary_metadata", mm_binary_metadata, MM_META_SQL,
              ref="transformer.py:570-609 (S7/U4 asset stat enrichment)",
              doc="binary payload size/checksum/mime metadata", tags=("multimodal",)),
    QuerySpec("mm_image_features", mm_image_features, MM_FEATURES_SQL,
              ref="transformer.py:689-709 (U5 decode shape) — Arrow mapInPandas",
              doc="deterministic fake decode: dims + mean-byte brightness",
              tags=("multimodal",)),
    QuerySpec("mm_frame_sample", mm_frame_sample, MM_FRAMES_SQL,
              ref="scale op: video frame sampling shape (1→N mapInPandas)",
              doc="4×64-byte fingerprinted slices per payload", tags=("multimodal",)),
]
