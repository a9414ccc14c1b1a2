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


def test_phash_stub_math():
    """The aHash math DuckDB replays: pixel sums, cross-multiplied mean
    compare, little-endian 16-bit band packing."""
    from tradecat_spark.multimodal import _phash_bands, _resize

    # All-equal bytes: every pixel equals the mean, p*64 > total is
    # strictly false everywhere -> all four bands zero.
    assert _phash_bands(b"AAAA") == (0, 0, 0, 0)
    # Empty payload: _resize yields 192 zero bytes -> all-zero hash too
    # (the lane drops empties before hashing; the stub stays total).
    assert _phash_bands(b"") == (0, 0, 0, 0)
    # Deterministic, and every band is a 16-bit value.
    p = b"some pixels vary: 123 xyz!"
    assert _phash_bands(p) == _phash_bands(p)
    assert all(0 <= b < 65536 for b in _phash_bands(p))
    # Hand-check bit 0 of band 0: pixel 0 vs mean over the cycled buffer.
    buf = _resize(p, 8, 8)
    px = [buf[3 * k] + buf[3 * k + 1] + buf[3 * k + 2] for k in range(64)]
    expect_bit0 = 1 if px[0] * 64 > sum(px) else 0
    assert _phash_bands(p)[0] & 1 == expect_bit0


def test_phash_identical_payloads_pair_at_hamming_zero(spark):
    """End-to-end on a constructed corpus: exact-duplicate payloads meet
    in every band and verify at hamming 0; a distinct payload doesn't
    pair with them inside the radius."""
    from tradecat_spark.multimodal import attach_payload, phash_bands
    from tradecat_spark.plans.q_text import minhash_candidate_pairs

    docs = spark.createDataFrame(
        [
            (1, "the very same caption bytes", "en"),
            (2, "the very same caption bytes", "en"),
            (3, "zzz 999 ??? utterly other !!! ###", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    wide = phash_bands(attach_payload(docs))
    sig = wide.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).cast("int").alias("band"),
                    F.col(f"b{j}").cast("string").alias("band_sig"),
                )
                for j in range(4)
            ])
        ).alias("s"),
    ).select("doc_id", "s.band", "s.band_sig")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_candidate_pairs(sig).collect()}
    assert (1, 2) in pairs
    rows = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
            for r in wide.collect()}
    assert rows[1] == rows[2]
    ham_13 = sum(
        bin(rows[1][j] ^ rows[3][j]).count("1") for j in range(4)
    )
    assert ham_13 > 12  # the distinct doc stays outside the radius


def test_phash_multiprobe_catches_two_bit_band_diff(spark):
    """The multi-probe guarantee law on constructed hash tables: two
    hashes differing by exactly 2 bits inside ONE band (and by nothing
    elsewhere) must meet in a probe bucket (each side flips one of the
    differing bits) but NOT in any exact band bucket; a pair differing
    by 3 bits in every band escapes both generators."""
    from tradecat_spark.plans.q_multimodal import _phash_cand

    #      doc 1 vs 2: band 0 differs in bits 0 and 5, bands 1-3 equal
    #      doc 3: differs from doc 1 by 3 bits in every band
    rows = [
        (1, 0b0000000000100001, 7, 7, 7),
        (2, 0b0000000000000000, 7, 7, 7),
        (3, 0b0000000000101110, 7 ^ 0b111000, 7 ^ 0b111000, 7 ^ 0b111000),
    ]
    wide = spark.createDataFrame(
        rows, "doc_id long, b0 int, b1 int, b2 int, b3 int"
    )
    band_pairs = {(r["doc_a"], r["doc_b"])
                  for r in _phash_cand(wide, probe=False).collect()}
    probe_pairs = {(r["doc_a"], r["doc_b"])
                   for r in _phash_cand(wide, probe=True).collect()}
    # bands 1-3 are EQUAL for docs 1,2 -> the exact-band join catches
    # them there; band 0's 2-bit diff alone would not.  Verify the
    # probe-specific capability on a pair equal in NO band:
    assert (1, 2) in band_pairs          # equal bands 1-3
    assert (1, 2) in probe_pairs
    # doc 3 shares no band and no <=2-bit band diff with doc 2:
    # band 0 differs by 4 bits, bands 1-3 by 3 bits each
    assert (2, 3) not in probe_pairs
    assert (2, 3) not in band_pairs
    # make a pair that is CAUGHT ONLY via probes: differ by 2 bits in
    # every band
    rows2 = [
        (10, 5, 5, 5, 5),
        (11, 5 ^ 0b11, 5 ^ 0b11, 5 ^ 0b11, 5 ^ 0b11),
    ]
    wide2 = spark.createDataFrame(
        rows2, "doc_id long, b0 int, b1 int, b2 int, b3 int"
    )
    assert _phash_cand(wide2, probe=False).count() == 0
    got = {(r["doc_a"], r["doc_b"])
           for r in _phash_cand(wide2, probe=True).collect()}
    assert got == {(10, 11)}


def test_documents_text_is_ascii_across_sfs():
    """Pin the parity assumption the whole phash/multimodal oracle
    family rides on (r11 ADVICE item 2): the Spark side hashes UTF-8
    BYTES (encode + byte indexing in _resize/_phash_bands) while the
    DuckDB oracles re-derive pixels from CHAR codepoints
    (ascii(substr(..)), length(text)) — identical only while every
    document text is pure ASCII (octet_length == char length and all
    codepoints < 128). Enforced here over every driver SF present, so
    a testdata regeneration that introduces non-ASCII text fails THIS
    test by name instead of five phash lanes by hash mismatch."""
    import os

    import duckdb

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        bad = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{path}') "
            "WHERE strlen(text) <> length(text)"  # bytes vs chars
        ).fetchone()[0]
        assert bad == 0, f"{sf}: {bad} non-ASCII document texts"
        checked += 1
    assert checked > 0, "no driver testdata found to check"


def test_phash_recall_sampled_tracks_full(spark, sf001_dir):
    """r11 verdict item 6: the recall eval's 'run the quadratic truth
    join on a sample at 100 TB' docstring promise, made executable and
    pinned. A deterministic 50% doc sample must (a) leave every radius
    with a nonempty sampled truth set, (b) reproduce the exact-radius
    guarantees (recall 1.0 where the full eval reads 1.0), and (c)
    agree with the full recall within 0.1 everywhere (measured diff at
    sf0.01: <= 0.021). sf0.01 because sf0.001's 500-doc truth set is
    too sparse for a stable sampled estimate."""
    from tradecat_spark.plans.q_multimodal import _phash_recall

    full = {
        (r["radius"], r["generator"]): (r["n_true"], float(r["recall6"]))
        for r in _phash_recall(spark, sf001_dir).collect()
    }
    samp = {
        (r["radius"], r["generator"]): (r["n_true"], float(r["recall6"]))
        for r in _phash_recall(spark, sf001_dir, sample_frac=0.5).collect()
    }
    assert set(full) == set(samp)
    for k, (n_full, r_full) in full.items():
        n_samp, r_samp = samp[k]
        assert 0 < n_samp < n_full, k
        if r_full == 1.0:
            assert r_samp == 1.0, k
        assert abs(r_full - r_samp) <= 0.1, (k, r_full, r_samp)
