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


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup: the multimodal x dedup crossover a 100 TB
# image/caption pipeline runs between ingest and training (reference has
# no media path at all — beyond-reference brief surface, same family as
# dedup_simhash but hashing DECODED PIXELS, not text tokens).
# ---------------------------------------------------------------------------
def phash_ctes_sql(pred: str = "TRUE") -> str:
    """The DuckDB replay of the aHash stub, documents → (doc_id,
    b0..b3) `wide`, with an optional extra doc predicate — the
    streaming image-hash store's oracle reuses the chain restricted
    to the pipeline's delta split (doc_id % 10 = 0)."""
    return f"""
d AS (
  SELECT doc_id, text, length(text) AS n FROM documents
  WHERE length(text) > 0 AND ({pred})
),
rep AS (
  SELECT doc_id,
         substr(repeat(text, CAST(192 // n + 1 AS INTEGER)), 1, 192) AS r
  FROM d
),
px AS (
  SELECT doc_id, CAST(k AS INTEGER) AS k,
    ascii(substr(r, CAST(3 * k + 1 AS INTEGER), 1))
    + ascii(substr(r, CAST(3 * k + 2 AS INTEGER), 1))
    + ascii(substr(r, CAST(3 * k + 3 AS INTEGER), 1)) AS p
  FROM rep, (SELECT unnest(range(0, 64)) AS k) ks
),
tot AS (SELECT doc_id, SUM(p) AS total FROM px GROUP BY doc_id),
bits AS (
  SELECT px.doc_id, k,
    CASE WHEN p * 64 > total THEN 1 ELSE 0 END AS bit
  FROM px JOIN tot USING (doc_id)
),
bands AS (
  SELECT doc_id, CAST(k // 16 AS INTEGER) AS band,
    CAST(SUM(bit * (1 << (k % 16))) AS INTEGER) AS band_val
  FROM bits GROUP BY doc_id, k // 16
),
wide AS (
  SELECT doc_id,
    MAX(CASE WHEN band = 0 THEN band_val END) AS b0,
    MAX(CASE WHEN band = 1 THEN band_val END) AS b1,
    MAX(CASE WHEN band = 2 THEN band_val END) AS b2,
    MAX(CASE WHEN band = 3 THEN band_val END) AS b3
  FROM bands GROUP BY doc_id
)"""


_PHASH_CTES = phash_ctes_sql()

# hash-join machinery promoted to operator level in r12
# (operators/phash.py) so the streaming image-hash store shares it;
# private aliases kept for this module's lanes and tests
from tradecat_spark.operators.phash import (  # noqa: E402
    PHASH_HAMMING_MAX,
    phash_candidate_pairs as _phash_cand,
    phash_verify_pairs as _phash_verify,
)


def _phash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, b0..b3) perceptual-hash table: decode+hash happens ONCE
    per payload, map-side, before any shuffle. Zero-byte payloads are
    corrupt media — dropped here, mirrored by the oracle's n > 0.

    ``localCheckpoint`` materializes the 5-scalar table so the near-dup
    lane's five consumers (band explode, both self-join sides, both
    verify sides) read it instead of re-running the decode stage —
    without it the physical plan re-executed mapInPandas five times,
    which with a real codec is 5x the pipeline's dominant cost. At
    cluster scale this is a persisted hash-table write (the repo-wide
    localCheckpoint caveat in q_cluster.py applies)."""
    from tradecat_spark.multimodal import attach_payload, phash_bands

    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs).filter(F.octet_length("payload") > 0)
    return phash_bands(media).localCheckpoint()


@query(
    "mm_phash_hashes",
    survey="beyond-reference multimodal dedup: perceptual average-hash "
    "(aHash) per decoded image via mapInPandas, 4x16-bit sign-safe bands",
    description="64-bit aHash per document as four 16-bit band values",
    oracle=f"WITH {_PHASH_CTES}\nSELECT doc_id, b0, b1, b2, b3 FROM wide",
)
def mm_phash_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image perceptual hash surface. The decode stub is the cycled-
    payload ``_resize`` (ASCII docs: DuckDB re-derives every pixel from
    char codes); everything above the pixel array — mean-compare bits,
    band packing, the LSH join downstream — is exactly what ships when a
    codec replaces the stub. Integer-exact end to end: pixel sums,
    cross-multiplied mean compare (``p*64 > total``), little-endian band
    packing, so the hash gate pins all 64 bits of every hash."""
    return _phash_wide(spark, sf_dir)


@query(
    "mm_phash_near_dup",
    survey="beyond-reference multimodal dedup: near-duplicate image "
    "pairs via 16-bit LSH band bucket join + hamming verify (star-capped "
    "against degenerate buckets; no all-pairs anywhere)",
    bench=True,  # joined the headline set r11 — totals not comparable r10→r11
    description=f"Image pairs within hamming {PHASH_HAMMING_MAX} of 64 "
    "aHash bits, found via band-bucket LSH",
    oracle=f"""
WITH {_PHASH_CTES},
sized AS (
  SELECT doc_id, band, band_val,
    COUNT(*) OVER (PARTITION BY band, band_val) AS bucket_n,
    MIN(doc_id) OVER (PARTITION BY band, band_val) AS anchor
  FROM bands
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sized a JOIN sized b
      ON a.band = b.band AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id AND a.bucket_n <= 64
    UNION ALL
    SELECT anchor AS doc_a, doc_id AS doc_b
    FROM sized WHERE bucket_n > 64 AND doc_id <> anchor
  )
)
SELECT c.doc_a, c.doc_b,
  CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
     + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
    AS INTEGER) AS hamming
FROM cand c
JOIN wide wa ON wa.doc_id = c.doc_a
JOIN wide wb ON wb.doc_id = c.doc_b
WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
    + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
    <= {PHASH_HAMMING_MAX}
""",
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs, the LSH way: a 64-bit hash within
    hamming r of another must share at least one of 4 contiguous 16-bit
    bands whenever r < 4... strictly: pigeonhole guarantees a shared
    band for r <= 3; wider radii trade recall for the same bounded cost,
    the standard LSH deal (recall at r=12 is what the banding buys, not
    a guarantee). Candidates come from the band bucket join — tiny
    (doc_id, band, band_val) rows, payload bytes never shuffle — reusing
    ``minhash_candidate_pairs``'s star-cap guard verbatim, so one
    degenerate bucket (solid-color images: all-zero hash) emits O(n)
    anchor pairs, never O(n^2). Verification is two joins back to the
    4-column hash table and a JVM-side popcount fold; at 100 TB the
    hash table is ~40 bytes/image and the verify join shuffles only
    candidate ids."""
    wide = _phash_wide(spark, sf_dir)
    pairs = _phash_cand(wide, probe=False)
    return _phash_verify(pairs, wide)


#: multi-probe bucket-row CTE shared by the probe-pairs lane and the
#: recall eval oracle: exact band value plus all 16 single-bit flips.
_PHASH_PROBE_CTES = """
probes AS (
  SELECT doc_id, band,
    CAST(xor(band_val, CASE WHEN f = -1 THEN 0 ELSE (1 << f) END)
      AS INTEGER) AS sig
  FROM bands, (SELECT unnest(range(-1, 16)) AS f) fs
),
psized AS (
  SELECT doc_id, band, sig,
    COUNT(*) OVER (PARTITION BY band, sig) AS bucket_n,
    MIN(doc_id) OVER (PARTITION BY band, sig) AS anchor
  FROM probes
),
pcand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM psized a JOIN psized b
      ON a.band = b.band AND a.sig = b.sig
     AND a.doc_id < b.doc_id AND a.bucket_n <= 64
    UNION ALL
    SELECT anchor AS doc_a, doc_id AS doc_b
    FROM psized WHERE bucket_n > 64 AND doc_id <> anchor
  )
)"""


#: verified-pair transitive closure over the probe candidates (the
#: keep-one component algebra in SQL) — shared by the batch cluster
#: oracle (mm_phash_clusters) and the streaming label-store oracle
#: (q_streaming._pipeline_labels_oracle), so the verify cut and the
#: closure shape can never drift between the two lanes
_PHASH_CLOSURE_CTES = f"""vp AS (
  SELECT c.doc_a, c.doc_b
  FROM pcand c
  JOIN wide wa ON wa.doc_id = c.doc_a
  JOIN wide wb ON wb.doc_id = c.doc_b
  WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
      + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
      <= {PHASH_HAMMING_MAX}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM vp
  UNION ALL
  SELECT doc_b, doc_a FROM vp
),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT reach.doc_id, e.dst FROM reach JOIN edges e ON reach.r = e.src
)"""


@query(
    "mm_phash_multiprobe_pairs",
    survey="beyond-reference multimodal dedup: multi-probe near-dup "
    "pairs — symmetric 1-bit band probes extend the uncapped pigeonhole "
    "guarantee from radius 3 to 11 at ~17x bucket rows (the standard "
    "recall repair for hash-bucket LSH, cf. ann_multiprobe_search); "
    "star-cap trades pairwise recall in degenerate buckets for O(n) "
    "cost while preserving connected components",
    description=f"Image pairs within hamming {PHASH_HAMMING_MAX} found "
    "via exact + 16 single-bit-flip probe buckets per band",
    oracle=f"""
WITH {_PHASH_CTES},
{_PHASH_PROBE_CTES}
SELECT c.doc_a, c.doc_b,
  CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
     + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
    AS INTEGER) AS hamming
FROM pcand c
JOIN wide wa ON wa.doc_id = c.doc_a
JOIN wide wb ON wb.doc_id = c.doc_b
WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
    + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
    <= {PHASH_HAMMING_MAX}
""",
)
def mm_phash_multiprobe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-repaired production path: each band emits its exact
    bucket plus 16 single-bit-flip probes, so two hashes differing by
    <= 2 bits in SOME band meet in a probe bucket (each side flips one
    of the two differing bits) — pigeonhole over 4 bands turns that
    into an UNCAPPED guarantee for total hamming <= 11, vs 3 for the
    exact-band join. Cost is 68 bucket rows per image instead of 4,
    still payload-free scalars. The star-cap guard applies to probe
    buckets too (probing multiplies degenerate-bucket membership, so
    the guard matters MORE here): oversized buckets fall back to
    anchor stars, which sacrifices pairwise candidacy but preserves
    connected components — the object the downstream cluster/keep-one
    dedup actually consumes. ``mm_phash_recall_eval`` measures both
    generators' capped pairwise recall per radius honestly."""
    wide = _phash_wide(spark, sf_dir)
    return _phash_verify(_phash_cand(wide, probe=True), wide)


#: eval radii: 0 = exact dup, 3 = the 4-band pigeonhole GUARANTEE
#: boundary (hamming <= 3 over 4 bands forces a shared band), 6/12 =
#: the decay region where banding trades recall for bounded cost.
PHASH_EVAL_RADII = (0, 3, 6, 12)


@query(
    "mm_phash_recall_eval",
    survey="beyond-reference multimodal dedup: per-radius, per-"
    "generator recall eval vs brute-force hamming truth — the exact-"
    "band join (guarantee r<=3; measured 0.52@12 sf0.01, 0.285@12 "
    "sf0.1) against the 1-bit multi-probe join (uncapped guarantee "
    "r<=11; measured 1.0@12 sf0.01, ~0.78@12 sf0.1 under the star "
    "cap) — the go/no-go metric for the approximate image-dedup path "
    "(same pattern as ann_recall_eval / minhash_lsh_quality)",
    description="One row per (radius 0/3/6/12, generator band/probe1): "
    "true pairs, caught, recall",
    oracle=None,  # set below (needs ratio6_sql)
)
def mm_phash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the true hamming-r pair set does the 4x16-bit band
    join surface, per radius? Pigeonhole guarantees recall 1.0 for
    r <= 3 (4 bands, so <= 3 flipped bits leave one band untouched) —
    this lane VERIFIES that empirically and measures the decay beyond
    (banding past the guarantee trades recall for bounded cost; at
    radius 12 the measured recall is 0.52 at sf0.01 / 0.285 at sf0.1).
    Truth comes from the brute-force hamming join over the materialized
    5-scalar hash table (eval-only: quadratic in corpus size — run it
    on a sample at 100 TB via ``_phash_recall(..., sample_frac=f)``,
    the executable form of that promise (r11 verdict item 6): a
    deterministic hash-based doc sample bounds the truth join at
    ~f^2 x pairs while the generators stay at full production shape,
    and the sampled recall is pinned against the full recall by
    test_multimodal.py. The BANDED paths are the production shape).
    BOTH generators are measured exactly as their lanes emit them —
    star cap included — so a capped bucket's dropped intra-bucket
    pairs count against recall even inside a generator's uncapped
    guarantee radius, keeping the guard honest (star pairs preserve
    components, not pairwise candidacy; measured at sf0.1 the probe
    generator reads ~0.81 within its r<=11 guarantee for exactly this
    reason, vs 1.0 uncapped)."""
    return _phash_recall(spark, sf_dir)


def _phash_recall(
    spark: SparkSession, sf_dir: str, sample_frac: float = 1.0
) -> DataFrame:
    """Recall-eval body; ``sample_frac < 1`` restricts the quadratic
    TRUTH join to a deterministic doc sample (abs(hash(doc_id)) mod
    1e6 < frac*1e6 — stable across runs and partitionings), keeping
    both generators untouched: the estimate degrades only in variance
    (a Bernoulli doc sample keeps ~frac^2 of true pairs), never in
    which candidate pairs the production path emits."""
    from tradecat_spark.plans.exact import ratio6

    wide = _phash_wide(spark, sf_dir)
    truth_src = wide
    if sample_frac < 1.0:
        truth_src = wide.filter(
            F.abs(F.hash("doc_id")) % 1_000_000
            < int(sample_frac * 1_000_000)
        )
    wa = truth_src.alias("wa")
    wb = truth_src.alias("wb")
    ham = sum(
        F.bit_count(F.col(f"wa.b{j}").bitwiseXOR(F.col(f"wb.b{j}")))
        for j in range(4)
    ).cast("int")
    true_pairs = (
        wa.join(wb, F.col("wa.doc_id") < F.col("wb.doc_id"))
        .select(
            F.col("wa.doc_id").alias("doc_a"),
            F.col("wb.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max(PHASH_EVAL_RADII))
    )
    flagged = true_pairs.join(
        _phash_cand(wide, probe=False).withColumn("hit_band", F.lit(1)),
        ["doc_a", "doc_b"],
        "left",
    ).join(
        _phash_cand(wide, probe=True).withColumn("hit_probe", F.lit(1)),
        ["doc_a", "doc_b"],
        "left",
    )
    radii = spark.createDataFrame(
        [(r,) for r in PHASH_EVAL_RADII], "radius int"
    )
    joined = radii.join(
        flagged, flagged["hamming"] <= radii["radius"], "left"
    )
    agg = joined.groupBy("radius").agg(
        F.count("doc_a").cast("long").alias("n_true"),
        F.coalesce(F.sum("hit_band"), F.lit(0)).cast("long")
        .alias("n_band"),
        F.coalesce(F.sum("hit_probe"), F.lit(0)).cast("long")
        .alias("n_probe"),
    )
    out = None
    for gen, col in (("band", "n_band"), ("probe1", "n_probe")):
        part = agg.select(
            "radius",
            F.lit(gen).alias("generator"),
            "n_true",
            F.col(col).alias("n_caught"),
            ratio6(F.col(col), F.col("n_true")).alias("recall6"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def _phash_recall_oracle() -> str:
    from tradecat_spark.plans.exact import ratio6_sql

    return f"""
WITH {_PHASH_CTES},
sized AS (
  SELECT doc_id, band, band_val,
    COUNT(*) OVER (PARTITION BY band, band_val) AS bucket_n,
    MIN(doc_id) OVER (PARTITION BY band, band_val) AS anchor
  FROM bands
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sized a JOIN sized b
      ON a.band = b.band AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id AND a.bucket_n <= 64
    UNION ALL
    SELECT anchor AS doc_a, doc_id AS doc_b
    FROM sized WHERE bucket_n > 64 AND doc_id <> anchor
  )
),
{_PHASH_PROBE_CTES},
tp AS (
  SELECT wa.doc_id AS doc_a, wb.doc_id AS doc_b,
    CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
       + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
      AS INTEGER) AS hamming
  FROM wide wa JOIN wide wb ON wa.doc_id < wb.doc_id
  WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
      + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
      <= {max(PHASH_EVAL_RADII)}
),
j AS (
  SELECT t.doc_a, t.doc_b, t.hamming,
    CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit_band,
    CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit_probe
  FROM tp t
  LEFT JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
  LEFT JOIN pcand p ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
),
radii(radius) AS (
  VALUES {', '.join(f'(CAST({r} AS INTEGER))' for r in PHASH_EVAL_RADII)}
),
agg AS (
  SELECT radius,
    CAST(COUNT(j.doc_a) AS BIGINT) AS n_true,
    CAST(COALESCE(SUM(j.hit_band), 0) AS BIGINT) AS n_band,
    CAST(COALESCE(SUM(j.hit_probe), 0) AS BIGINT) AS n_probe
  FROM radii LEFT JOIN j ON j.hamming <= radii.radius
  GROUP BY radius
)
SELECT radius, 'band' AS generator, n_true, n_band AS n_caught,
  {ratio6_sql('n_band', 'n_true')} AS recall6
FROM agg
UNION ALL
SELECT radius, 'probe1' AS generator, n_true, n_probe AS n_caught,
  {ratio6_sql('n_probe', 'n_true')} AS recall6
FROM agg
"""


from tradecat_spark.plans.registry import REGISTRY as _REG  # noqa: E402

_REG["mm_phash_recall_eval"].oracle = _phash_recall_oracle()


@query(
    "mm_phash_clusters",
    survey="beyond-reference multimodal dedup: duplicate-image cluster "
    "assignment — connected components (shared min-label-propagation "
    "operator) over the VERIFIED multi-probe pairs, canonical = min "
    "doc_id per component: the keep-one step that completes the image "
    "pipeline hash -> candidates -> verify -> clusters -> keep",
    description="Connected components over verified phash pairs: "
    "cluster id, size, canonical flag per hashed image",
    oracle=f"""
WITH RECURSIVE {_PHASH_CTES},
{_PHASH_PROBE_CTES},
{_PHASH_CLOSURE_CTES},
comp AS (
  SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id
)
SELECT
  doc_id,
  cluster_id,
  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
  doc_id = cluster_id AS is_canonical
FROM comp
""",
)
def mm_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-cluster over images: transitive closure of the
    VERIFIED pair set (multi-probe candidates within hamming 12 — the
    recall-repaired generator, since missed candidate pairs become
    missed merges and therefore duplicate clusters kept twice). Nodes
    are every hashed image (zero-byte payloads were dropped at decode),
    so singletons come out as their own canonical cluster. Runs the
    SAME min-label-propagation operator as the text dedup lane
    (operators/components.py) — one edge-join + min-aggregate per
    round, lineage cut per round, edges only ever materialized inside
    probe buckets. Oracle: DuckDB WITH RECURSIVE closure over the
    identical verified pairs."""
    from pyspark.sql import Window
    from tradecat_spark.operators.components import min_label_components

    wide = _phash_wide(spark, sf_dir)
    pairs = _phash_verify(
        _phash_cand(wide, probe=True), wide
    ).select("doc_a", "doc_b")
    labels = min_label_components(wide.select("doc_id"), pairs)
    size = Window.partitionBy("cluster_id")
    return labels.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(size).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )
