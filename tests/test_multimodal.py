"""Multimodal plumbing: decode-stub determinism and frame reassembly.

The oracle queries (q_multimodal) hash-check lengths/checksums; these
tests cover what DuckDB can't see — the stub's feature math and the
actual binary chunk contents.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tradecat_spark.multimodal import (
    _decode,
    attach_payload,
    decode_features,
    sample_frames,
)


def test_decode_stub_deterministic():
    payload = "the same bytes".encode()
    assert _decode(payload) == _decode(payload)
    w, h, luma = _decode(payload)
    assert 64 <= w < 128 and 64 <= h < 128
    assert luma == pytest.approx(sum(payload) / len(payload))
    assert _decode(b"") == (_decode(b"")[0], _decode(b"")[1], 0.0)


def test_decode_features_schema_and_values(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = decode_features(attach_payload(docs)).collect()
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == len(raw)
    for r in feats:
        payload = raw[r["doc_id"]].encode()
        assert r["n_bytes"] == len(payload)
        assert r["checksum"] == hashlib.md5(payload).hexdigest()
        w, h, luma = _decode(payload)
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_luma"] == pytest.approx(luma)


def test_frames_reassemble_to_payload(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = attach_payload(docs)
    frames = sample_frames(media, n_frames=4)
    got = {}
    for r in frames.sort("doc_id", "frame_idx").collect():
        got.setdefault(r["doc_id"], []).append(bytes(r["frame_bytes"]))
    raw = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    assert set(got) == set(raw)
    for doc_id, chunks in got.items():
        assert len(chunks) == 4
        assert b"".join(chunks) == raw[doc_id]


def test_resize_fixed_output_contract(spark, sf_dir):
    """Every resized payload is exactly w*h*3 bytes (the memory-bounding
    contract), deterministic, and derived from the source payload."""
    from tradecat_spark.catalog import load_table
    from tradecat_spark.multimodal import attach_payload, resize_images

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_payload(docs)
    out = resize_images(media, w=8, h=4).collect()
    assert len(out) == 20
    for r in out:
        assert r["resized_len"] == 8 * 4 * 3
        assert len(r["resized_bytes"]) == 8 * 4 * 3
    # deterministic across runs
    again = {r["doc_id"]: bytes(r["resized_bytes"])
             for r in resize_images(media, w=8, h=4).collect()}
    for r in out:
        assert bytes(r["resized_bytes"]) == again[r["doc_id"]]
