"""Multimodal pipeline queries — binary payload columns with typed
metadata, Arrow-batched decode, frame sampling (north-star training-data
operators; see tradecat_spark/multimodal.py for the stub contract).

The decode stub is deterministic, so its OUTPUT is oracle-checkable:
byte lengths and md5 checksums are recomputed by DuckDB over the same
UTF-8 payloads — the whole Spark plumbing (binary encode → mapInPandas
batches → feature rows) is hash-verified end-to-end, stub and all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tradecat_spark.catalog import load_table
from tradecat_spark.multimodal import attach_payload, decode_features, sample_frames
from tradecat_spark.plans.registry import query


@query(
    "mm_decode_features",
    survey="north-star multimodal: binary payload + metadata struct + "
    "mapInPandas decode/feature-extract (decode stub, plumbing real)",
    description="Decoded feature row per document: bytes, checksum, fake dims/luma",
    oracle="""
SELECT
  doc_id,
  'image/fake' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS checksum
FROM documents
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum + size survive the decode stage unchanged, so DuckDB can
    re-derive them from the source text; width/height/mean_luma come from
    the stub and are checked by tests/test_multimodal.py instead (DuckDB
    has no sha256-over-blob to mirror the fake)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    feats = decode_features(media)
    return feats.select("doc_id", "media_type", "n_bytes", "checksum")


@query(
    "mm_frame_sample",
    survey="north-star multimodal: frame sampling — one input row fans out "
    "to n binary chunks via mapInPandas",
    description="4 even 'frames' per document: offsets and lengths",
    oracle="""
WITH d AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
),
f AS (
  SELECT doc_id, n,
         GREATEST(n // 4, 1) AS step,
         unnest(range(4)) AS frame_idx
  FROM d
)
SELECT
  doc_id,
  CAST(frame_idx AS INT) AS frame_idx,
  CAST(frame_idx * step AS BIGINT) AS frame_offset,
  CAST(CASE WHEN frame_idx < 3
            THEN LEAST(step, GREATEST(n - frame_idx * step, 0))
            ELSE GREATEST(n - frame_idx * step, 0) END AS BIGINT) AS frame_len
FROM f
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The binary chunks themselves stay Spark-side (DuckDB compares the
    arithmetic: offsets/lengths per frame); tests assert the actual chunk
    bytes reassemble to the payload."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs)
    frames = sample_frames(media, n_frames=4)
    return frames.select("doc_id", "frame_idx", "frame_offset", "frame_len")


@query(
    "mm_resize_images",
    survey="north-star multimodal: resize stage — fixed w*h*3 output "
    "contract via mapInPandas (stub body, real batching/memory plumbing)",
    description="8x4 'resize' per document: fixed output length + checksum",
    oracle="""
WITH d AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) AS BIGINT) AS src_len
  FROM documents
)
SELECT
  doc_id,
  CAST(8 AS INT) AS out_w,
  CAST(4 AS INT) AS out_h,
  CAST(96 AS BIGINT) AS resized_len,
  src_len,
  md5(substr(repeat(text, CAST(96 // src_len + 1 AS INTEGER)), 1, 96))
    AS resized_md5
FROM d
""",
)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cycled-payload stub is byte-for-byte re-derivable in SQL
    (synthetic docs are ASCII, so DuckDB's char-based substr/repeat over
    text equals the byte cycling over the encoded payload); the md5 of
    the resized buffer pins the actual bytes, not just the lengths."""
    from tradecat_spark.multimodal import attach_payload, resize_images

    docs = load_table(spark, sf_dir, "documents")
    out = resize_images(attach_payload(docs), w=8, h=4)
    return out.select(
        "doc_id", "out_w", "out_h", "resized_len", "src_len",
        F.md5("resized_bytes").alias("resized_md5"),
    )


@query(
    "mm_audio_windows",
    survey="north-star multimodal: audio framing — payload → "
    "overlapping 64/32 analysis windows via mapInPandas (PCM decode "
    "stub, real fan-out/batching), integer-exact window stats",
    description="Overlapping audio windows per document: energy, peak, RMS",
    oracle="""
WITH d AS (
  SELECT doc_id, text,
    CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
),
w AS (
  SELECT doc_id, text, n, unnest(range((n - 64) // 32 + 1)) AS wi
  FROM d WHERE n >= 64
),
s AS (
  SELECT doc_id,
    CAST(wi AS INT) AS win_idx,
    CAST(wi * 32 AS BIGINT) AS win_off,
    CAST(64 AS INT) AS n_samples,
    CAST(list_aggregate(list_transform(range(1, 65),
      i -> ascii(substr(text, CAST(wi * 32 + i AS INT), 1))
         * ascii(substr(text, CAST(wi * 32 + i AS INT), 1))),
      'sum') AS BIGINT) AS energy,
    CAST(list_aggregate(list_transform(range(1, 65),
      i -> ascii(substr(text, CAST(wi * 32 + i AS INT), 1))),
      'max') AS INT) AS peak
  FROM w
)
SELECT doc_id, win_idx, win_off, n_samples, energy, peak,
  ROUND(sqrt(energy * 1.0 / n_samples), 6) AS rms
FROM s
""",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PCM stub reads payload bytes as samples, so DuckDB re-derives
    every window's integer stats from the ASCII char codes of the same
    text (synthetic docs are ASCII: char code == byte). Energy and peak
    cross the Arrow boundary as exact int64s; only the derived RMS
    touches floats, computed JVM-side with the one-ROUND discipline."""
    from tradecat_spark.multimodal import attach_payload, audio_windows

    docs = load_table(spark, sf_dir, "documents")
    wins = audio_windows(attach_payload(docs), frame_len=64, hop=32)
    return wins.select(
        "doc_id", "win_idx", "win_off", "n_samples", "energy", "peak",
        F.round(
            F.sqrt(F.col("energy") * 1.0 / F.col("n_samples")), 6
        ).alias("rms"),
    )
