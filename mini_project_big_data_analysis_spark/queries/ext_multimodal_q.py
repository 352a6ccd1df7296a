"""Multimodal-column queries (SURVEY.md §2.9).

Binary payloads + typed metadata (operators/multimodal.py). The metadata
path is oracle-checked (byte length via octet_length); the feature-extract
path exercises the real mapInPandas Arrow plumbing and is rows-only (byte
entropy has no reasonable SQL mirror) — its values are pinned by unit tests
on known payloads instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register


@register(
    "ext_multimodal_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           'image'                    AS media_type,
           CAST(64 AS INT)            AS width,
           CAST(64 AS INT)            AS height
    FROM documents
    """,
)
def ext_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only query over a binary-payload table: must never touch the
    payload column (column pruning keeps the scan payload-free — asserted in
    tests via ReadSchema)."""
    from ..operators.multimodal import attach_binary_payload

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


@register(
    "ext_multimodal_chunks",
    """
    WITH base AS (
      SELECT doc_id, octet_length(encode(text)) AS nb
      FROM documents WHERE octet_length(encode(text)) > 0
    ),
    expanded AS (
      SELECT doc_id, nb,
             unnest(generate_series(0, CAST(ceil(nb / 256.0) AS BIGINT) - 1))
               AS chunk_idx
      FROM base
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(least(256, nb - chunk_idx * 256) AS INT) AS chunk_len
    FROM expanded
    """,
)
def ext_multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload chunking (frame-sampling plumbing) via mapInPandas; the
    oracle checks the chunk geometry (index/length per doc) — the bytes
    themselves are checked in unit tests."""
    from ..operators.multimodal import attach_binary_payload, sample_chunks

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return sample_chunks(media, chunk_bytes=256).select(
        "doc_id", "chunk_idx", "chunk_len"
    )


@register("ext_multimodal_features", None)  # rows-only: entropy has no SQL mirror
def ext_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (streaming
    Arrow batches — the exact plumbing a real decode/resize UDF uses; the
    codec itself is stubbed, operators/multimodal.py docstring)."""
    from ..operators.multimodal import attach_binary_payload, extract_features

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return extract_features(media)
