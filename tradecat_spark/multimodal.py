"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / feature
extraction / frame sampling as Arrow-batched Python stages. This module
makes all of that plumbing REAL — schemas, metadata structs, mapInPandas
batch shapes, deterministic partitioning — while the actual codec step
is stubbed: the container has no image/audio libraries, so ``_decode``
falls back to a clearly-marked deterministic fake derived from the
payload bytes. Swapping in PIL/librosa/ffmpeg changes ONE function.

The driver's ``documents`` table supplies the bytes (UTF-8 payload of
the text column standing in for an image blob); nothing else in the
pipeline knows or cares that the bytes aren't a JPEG.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Arrow batch size guidance: decode outputs (feature rows) are small, but
#: real decoded frames would be ~H*W*3 bytes — partition the input so a
#: batch of decoded frames fits executor memory (SURVEY.md §4 spill notes).
DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum string, "
    "width int, height int, mean_luma double"
)

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_offset long, frame_bytes binary, "
    "frame_len long"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal rows: opaque ``payload`` binary column plus a
    typed ``meta`` struct (the pattern for any media bronze table)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.col("lang").alias("source_lang"),
        ).alias("meta"),
    )


def _decode(payload: bytes) -> tuple[int, int, float]:
    """Decode stub. A real deployment replaces this body with e.g.::

        from PIL import Image
        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, luma(img)

    The container has no codec libraries, so this returns a
    DETERMINISTIC FAKE computed from the bytes (stable across runs and
    engines): "dimensions" from the digest, "luma" from the byte mean.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 64
    height = 64 + digest[1] % 64
    mean_luma = (sum(payload) / len(payload)) if payload else 0.0
    return width, height, float(mean_luma)


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over (payload, meta) rows.

    ``mapInPandas`` (not a scalar UDF) because real decoders amortize
    per-batch setup (codec contexts, model weights) and may emit 0..n
    rows per input (corrupt payloads are dropped, multi-page media
    fan out)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            decoded = [_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "checksum": [
                        hashlib.md5(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(batches, DECODE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: split each payload into ``n_frames`` even chunks
    ("frames"), one output row per frame — the video → frame-table
    explosion. Emitted via mapInPandas so the batch shape matches a real
    frame extractor (one input row → n output rows with binary chunks)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_offset": [],
                "frame_bytes": [], "frame_len": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    off = i * step
                    chunk = b[off: off + step] if i < n_frames - 1 else b[off:]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_bytes"].append(chunk)
                    rows["frame_len"].append(len(chunk))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, out_w int, out_h int, resized_bytes binary, "
    "resized_len long, src_len long"
)


def _resize(payload: bytes, w: int, h: int) -> bytes:
    """Resize stub. A real deployment replaces this body with e.g.::

        img = Image.open(io.BytesIO(payload)).resize((w, h))
        return img.tobytes()

    Deterministic fake: the output is exactly w*h*3 bytes — the payload
    cycled to length (stable across runs/engines), preserving the
    decoded-image memory contract (len == W*H*3) the downstream batch
    sizing relies on."""
    target = w * h * 3
    if not payload:
        return bytes(target)
    reps = target // len(payload) + 1
    return (payload * reps)[:target]


def resize_images(media: DataFrame, w: int = 32, h: int = 32) -> DataFrame:
    """Arrow-batched resize over (payload, meta) rows.

    Same ``mapInPandas`` shape as decode: per-batch codec amortization,
    and the output rows are FIXED SIZE (w*h*3) — the property that lets
    the pipeline bound executor memory per batch regardless of input
    image dimensions (spark.sql.execution.arrow.maxRecordsPerBatch ×
    w·h·3 bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(p) for p in pdf["payload"]]
            resized = [_resize(p, w, h) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": w,
                    "out_h": h,
                    "resized_bytes": resized,
                    "resized_len": [len(r) for r in resized],
                    "src_len": [len(p) for p in payloads],
                }
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, win_idx int, win_off long, n_samples int, "
    "energy long, peak int"
)


def audio_windows(
    media: DataFrame, frame_len: int = 64, hop: int = 32
) -> DataFrame:
    """Audio payload → overlapping analysis windows (the 25ms/10ms
    framing every audio feature pipeline starts with), one output row
    per complete window with integer-exact energy/peak stats.

    Decode stub: the payload bytes ARE the PCM samples (a real
    deployment replaces the ``np.frombuffer`` line with e.g.
    ``soundfile.read(io.BytesIO(payload))``). Everything else —
    mapInPandas fan-out (one input row → n/hop window rows), the fixed
    output schema, int64 stats that survive Arrow exactly — is the real
    Spark plumbing, and because the stub is deterministic the window
    arithmetic is oracle-checkable end to end.

    Scale: a window row is a handful of scalars, so the fan-out is
    ~n_bytes/hop rows per document with no payload duplication (unlike
    frame sampling, which carries chunk bytes); memory per Arrow batch
    is maxRecordsPerBatch × frame_len int64s in the worst case.
    """
    import numpy as np  # noqa: PLC0415

    cols = ["doc_id", "win_idx", "win_off", "n_samples", "energy", "peak"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8).astype(
                    np.int64
                )
                n = len(samples)
                if n < frame_len:
                    continue
                for w in range((n - frame_len) // hop + 1):
                    seg = samples[w * hop: w * hop + frame_len]
                    rows.append((
                        int(doc_id), w, w * hop, frame_len,
                        int((seg * seg).sum()), int(seg.max()),
                    ))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, AUDIO_WINDOW_SCHEMA)


PHASH_SCHEMA = "doc_id long, b0 int, b1 int, b2 int, b3 int"

#: aHash geometry: 8x8 "pixels" over the w*h*3 resized buffer → 64 bits,
#: emitted as four 16-bit band values (LSH bands AND sign-safe packing:
#: no engine ever materializes a 64-bit value whose top bit could flip
#: the sign of an int64 differently across engines).
PHASH_W = 8
PHASH_H = 8
PHASH_BANDS = 4
PHASH_BITS_PER_BAND = (PHASH_W * PHASH_H) // PHASH_BANDS


def _phash_bands(payload: bytes) -> tuple[int, int, int, int]:
    """Average-hash (aHash) over the decoded 8x8 image, as 4 x 16-bit
    band values. A real deployment swaps ``_resize`` for a codec resize
    and keeps EVERYTHING below the pixel array unchanged.

    Integer-exact throughout: pixel k = sum of its 3 channel bytes;
    bit k set iff pixel_k * 64 > sum(pixels) (cross-multiplied mean
    compare — no float mean, so DuckDB replays it bit-for-bit);
    band j packs bits 16j..16j+15 little-endian.
    """
    buf = _resize(payload, PHASH_W, PHASH_H)
    px = [buf[3 * k] + buf[3 * k + 1] + buf[3 * k + 2] for k in range(64)]
    total = sum(px)
    bits = [1 if p * 64 > total else 0 for p in px]
    return tuple(
        sum(bits[16 * j + i] << i for i in range(16)) for j in range(4)
    )


def phash_bands(media: DataFrame) -> DataFrame:
    """Arrow-batched perceptual-hash stage over (doc_id, payload) rows:
    one output row per document with the 4 band values. Same mapInPandas
    shape as decode (per-batch codec amortization); output rows are 5
    scalars, so downstream band-join shuffles move no payload bytes —
    the property that makes LSH image dedup feasible at 100 TB (hash
    once near the data, join tiny rows)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashed = [_phash_bands(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "b0": [h[0] for h in hashed],
                    "b1": [h[1] for h in hashed],
                    "b2": [h[2] for h in hashed],
                    "b3": [h[3] for h in hashed],
                }
            )

    return media.mapInPandas(batches, PHASH_SCHEMA)
