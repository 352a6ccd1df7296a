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


_FEATURES_ORACLE = r"""
WITH pay AS (
  SELECT doc_id, encode(text) AS payload FROM documents
),
hx AS (
  SELECT doc_id, lower(hex(payload)) AS h, octet_length(payload) AS n FROM pay
),
bytes AS (
  -- hex pairs of the blob = its bytes: a byte histogram without byte unnest
  SELECT doc_id, substr(h, 2*i + 1, 2) AS byte, n
  FROM hx, LATERAL unnest(range(0, n)) AS r(i)
),
hist AS (
  SELECT doc_id, n, byte, count(*) AS c FROM bytes GROUP BY doc_id, n, byte
),
ent AS (
  SELECT doc_id, round(-sum((c::DOUBLE/n) * log2(c::DOUBLE/n)), 6) AS byte_entropy
  FROM hist GROUP BY doc_id, n
)
SELECT x.doc_id,
       x.n::BIGINT AS n_bytes,
       coalesce(e.byte_entropy, 0.0) AS byte_entropy,
       substr(x.h, 1, 16) AS head_hex
FROM hx x LEFT JOIN ent e USING (doc_id)
"""


@register("ext_multimodal_features", _FEATURES_ORACLE)
def ext_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (streaming
    Arrow batches — the exact plumbing a real decode/resize UDF uses; the
    codec itself is stubbed, operators/multimodal.py docstring). STRONG
    oracle: size, Shannon byte-entropy (6 dp) and header hex reproduced in
    SQL from the payload's hex expansion."""
    from ..operators.multimodal import attach_binary_payload, extract_features

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return extract_features(media)


_FRAMES_ORACLE = """
WITH base AS (
    SELECT doc_id, text, octet_length(encode(text)) AS nb
    FROM documents WHERE octet_length(encode(text)) > 0
), expanded AS (
    SELECT doc_id, text, nb,
           unnest(generate_series(0, CAST(ceil(nb / 256.0) AS BIGINT) - 1))
               AS frame_idx
    FROM base
)
SELECT doc_id,
       CAST(frame_idx AS INT)                          AS frame_idx,
       CAST(least(256, nb - frame_idx * 256) AS INT)   AS frame_len,
       substr(md5(substr(text, frame_idx * 256 + 1, 256)), 1, 16) AS frame_hash
FROM expanded
WHERE frame_idx % 4 = 0
"""


@register("ext_multimodal_framesample", _FRAMES_ORACLE)
def ext_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (the video keyframe-extraction shape): payloads are
    gridded into 256-byte frames and every 4th frame is kept with its
    digest, via the real mapInPandas Arrow plumbing
    (operators/multimodal.py:sample_frames). STRONG byte-level oracle:
    the corpus is ASCII so DuckDB's char-substr md5 reproduces each
    frame's digest exactly.

    Scale shape: row-local fan-out inside the scan stage (no shuffle at
    all); sampled frames carry 16-char digests + 2 ints, so downstream
    dedup/indexing never moves the payload."""
    from ..operators.multimodal import attach_binary_payload, sample_frames

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return sample_frames(media.filter(F.octet_length("payload") > 0))


_RESIZE_ORACLE = """
WITH strided AS (
    SELECT doc_id,
           octet_length(encode(text)) AS orig_bytes,
           -- every 8th char starting at 1 (ASCII corpus: char == byte)
           string_agg(substr(text, i, 1), '' ORDER BY i) AS small
    FROM documents,
         unnest(generate_series(1, octet_length(encode(text)), 8)) u(i)
    GROUP BY doc_id, text
)
SELECT doc_id,
       CAST(orig_bytes AS INT)          AS orig_bytes,
       CAST(length(small) AS INT)       AS resized_bytes,
       substr(md5(small), 1, 16)        AS resized_hash
FROM strided
"""


@register("ext_multimodal_resize", _RESIZE_ORACLE)
def ext_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample over binary payloads (the image-thumbnail shape):
    every 8th byte kept, size + digest of the reduced payload emitted, via
    the real mapInPandas Arrow plumbing
    (operators/multimodal.py:resize_payloads — a codec swaps in for the
    byte decimation, plan unchanged). STRONG byte-level oracle: the ASCII
    corpus lets DuckDB rebuild the strided string and md5 it.

    Scale shape: row-local, zero shuffle; the reduced payload is 1/8 the
    bytes and only its digest + sizes leave the scan stage."""
    from ..operators.multimodal import attach_binary_payload, resize_payloads

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return resize_payloads(media)
