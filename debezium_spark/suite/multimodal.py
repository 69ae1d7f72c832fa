"""Multimodal-column correctness queries: opaque binary blobs + metadata,
mapInPandas feature extraction, frame sampling, docling markdown (T21).

The blob layout is deterministic hex (documented in analytics/multimodal.py)
so the DuckDB oracle reproduces every byte without any codec.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.analytics.multimodal import (
    docling_markdown,
    extract_image_meta,
    sample_frames,
    synthesize_image_blob,
)
from debezium_spark.analytics.text import oracle_hash64
from debezium_spark.suite import register

_MD5 = "md5('img:' || CAST(doc_id AS VARCHAR))"
_BYTE = lambda hexpr, i: f"CAST(('0x' || substr({hexpr}, {2 * i - 1}, 2)) AS BIGINT)"  # noqa: E731


# ---------------------------------------------------------------------------
# M1 — blob header parse + byte stats through mapInPandas
# ---------------------------------------------------------------------------
@register(
    "m1_image_meta",
    oracle=f"""
    SELECT doc_id,
           true AS is_valid,
           CAST(16 + doc_id % 64 AS INT) AS width,
           CAST(16 + (doc_id * 7) % 48 AS INT) AS height,
           CAST(16 AS INT) AS payload_bytes,
           CAST(list_aggregate(list_transform(generate_series(1, 16),
               i -> CAST(('0x' || substr({_MD5}, 2 * i - 1, 2)) AS BIGINT)),
               'sum') AS BIGINT) AS byte_sum
    FROM documents
    """,
)
def m1_image_meta(spark, sf_dir):
    """Arrow-batched mapInPandas over a binary image column: header fields
    (magic/width/height) + payload byte stats. The per-blob body is where a
    real decoder plugs in (decode_image stub); the Spark contract — schema,
    batch iteration, no row-at-a-time crossing — is what's under test."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = docs.select(
        "doc_id", synthesize_image_blob(F.col("doc_id")).alias("blob")
    )
    return extract_image_meta(blobs)


# ---------------------------------------------------------------------------
# M2 — frame sampling (native byte slicing, no Python)
# ---------------------------------------------------------------------------
@register(
    "m2_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(2 AS INT) AS n_frames_sampled,
           substr({_MD5}, 1, 8) || ',' || substr({_MD5}, 17, 8) AS frames_hex
    FROM documents
    """,
)
def m2_frame_sample(spark, sf_dir):
    """Every-Nth fixed-size frame extraction over the blob payload — array
    expressions only; the video analog keeps this plan shape with a
    container-aware keyframe index."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = docs.select(
        "doc_id", synthesize_image_blob(F.col("doc_id")).alias("blob")
    )
    sampled = sample_frames(blobs, frame_bytes=4, every_nth=2)
    return sampled.select(
        "doc_id",
        "n_frames_sampled",
        F.concat_ws(
            ",", F.transform("frames", lambda b: F.lower(F.hex(b)))
        ).alias("frames_hex"),
    )


# ---------------------------------------------------------------------------
# T21 — FieldToDocling (document → markdown) stub contract
# ---------------------------------------------------------------------------
@register(
    "t21_docling_markdown",
    oracle="""
    SELECT doc_id,
           '# Document ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10)
               || text AS markdown
    FROM documents
    """,
)
def t21_docling_markdown(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docling_markdown(docs).select("doc_id", "markdown")


# ---------------------------------------------------------------------------
# M3 — audio segmentation (sliding-window energy over binary payload)
# ---------------------------------------------------------------------------
_AUD_HEX = (
    "md5('aud-a:' || CAST(doc_id AS VARCHAR))"
    " || md5('aud-b:' || CAST(doc_id AS VARCHAR))"
)
# byte i (1-based) of the 32-byte payload
_AUD_BYTE = f"CAST(('0x' || substr({_AUD_HEX}, 2 * i - 1, 2)) AS INT)"


@register(
    "m3_audio_segments",
    oracle=f"""
    WITH seg AS (
        SELECT doc_id,
               CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
               list_transform(
                   generate_series(0, 24, 4),
                   s -> list_aggregate(
                       list_transform(generate_series(s + 1, s + 8),
                                      i -> {_AUD_BYTE}),
                       'sum')
               ) AS es
        FROM documents
    )
    SELECT doc_id, sample_rate,
           CAST(len(es) AS INT) AS n_segments,
           array_to_string(es, ',') AS energies
    FROM seg
    """,
)
def m3_audio_segments(spark, sf_dir):
    """Audio as opaque binary + typed metadata: synthesize a deterministic
    blob, then sliding-window (8-byte window, 4-byte hop) energy via
    Arrow-batched mapInPandas — the resample/DSP plumbing contract."""
    from debezium_spark.analytics.multimodal import (
        segment_audio,
        synthesize_audio_blob,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = docs.select(
        "doc_id", synthesize_audio_blob(F.col("doc_id")).alias("blob")
    )
    return segment_audio(blobs, window=8, hop=4)


# ---------------------------------------------------------------------------
# M4 — aspect-preserving resize (thumbnail/normalize step), byte-exact
# ---------------------------------------------------------------------------
@register(
    "m4_image_resize",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               16 + doc_id % 64 AS w,
               16 + (doc_id * 7) % 48 AS h
        FROM documents
    ),
    scaled AS (
        SELECT doc_id, w, h,
               (w * 32) // greatest(w, h) AS nw,
               (h * 32) // greatest(w, h) AS nh
        FROM dims
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(nw AS INT) AS new_width, CAST(nh AS INT) AS new_height,
           upper('494d4731'
                 || printf('%04x', nw) || printf('%04x', nh)
                 || substr({_MD5}, 1,
                           2 * greatest(1, (16 * nw * nh) // (w * h))))
             AS resized_hex
    FROM scaled
    """,
)
def m4_image_resize(spark, sf_dir):
    """Resize leg of the image pipeline (decode -> RESIZE -> embed): dims
    scale so max(w,h)=32 and the payload cut follows the area ratio —
    byte-exact against the oracle's closed-form reconstruction, proving the
    mapInPandas plumbing end-to-end (analytics/multimodal.py:
    resize_image_blob; a real deployment swaps only the per-blob body)."""
    from debezium_spark.analytics.multimodal import (
        resize_image_blob,
        synthesize_image_blob,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = docs.select(
        "doc_id", synthesize_image_blob(F.col("doc_id")).alias("blob")
    )
    rs = resize_image_blob(blobs, target=32)
    return rs.select(
        "doc_id", "width", "height", "new_width", "new_height",
        F.hex(F.col("resized")).alias("resized_hex"),
    )


# ---------------------------------------------------------------------------
# M5 — exact dedup of binary payloads (content-hash grouping, no Python)
# Fixture: blob content derives from doc_id % 300, so ids >= 300 repeat an
# earlier payload — real duplicate groups without any codec.
# ---------------------------------------------------------------------------
_DUP = "(doc_id % 300)"
_M5_HEX = (
    "'494d4731'"
    f" || lpad(lower(hex(16 + {_DUP} % 64)), 4, '0')"
    f" || lpad(lower(hex(16 + ({_DUP} * 7) % 48)), 4, '0')"
    f" || md5('img:' || CAST({_DUP} AS VARCHAR))"
)


@register(
    "m5_binary_exact_dedup",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, unhex({_M5_HEX}) AS blob FROM documents
    ),
    keyed AS (
        SELECT doc_id,
               md5(lower(hex(blob))) AS content_key,
               CAST(octet_length(blob) AS INT) AS n_bytes
        FROM b
    )
    SELECT min(doc_id) AS doc_id, content_key, n_bytes,
           CAST(count(*) AS INT) AS n_copies
    FROM keyed
    GROUP BY content_key, n_bytes
    """,
)
def m5_binary_exact_dedup(spark, sf_dir):
    """Image/audio exact dedup by content: group on (md5 of the bytes,
    length) entirely in whole-stage codegen — the binary-column twin of
    x4. One map-side-combinable aggregation; the canonical copy is the
    smallest doc_id."""
    from debezium_spark.analytics.multimodal import (
        binary_exact_dedup,
        synthesize_image_blob,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = docs.select(
        "doc_id",
        synthesize_image_blob(F.col("doc_id") % 300).alias("blob"),
    )
    return binary_exact_dedup(blobs)


# ---------------------------------------------------------------------------
# M6 — manifest-driven shard packing (WebDataset tar-shard layout planning)
# ---------------------------------------------------------------------------
_M6_BUDGET = 65536
_M6_STREAMS = 4


@register(
    "m6_shard_packing",
    oracle=f"""
    WITH man AS (
        SELECT doc_id,
               CAST(1000 + (doc_id * 37) % 9000 AS BIGINT) AS n_bytes
        FROM documents
    ),
    routed AS (
        SELECT doc_id, n_bytes,
               CAST({oracle_hash64("CAST(doc_id AS VARCHAR)", seed="shard:")}
                    % {_M6_STREAMS} AS INT) AS stream,
               {oracle_hash64("CAST(doc_id AS VARCHAR)", seed="order:")} AS ok
        FROM man
    ),
    placed AS (
        SELECT doc_id, n_bytes, stream,
               coalesce(sum(n_bytes) OVER (
                   PARTITION BY stream ORDER BY ok, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cb
        FROM routed
    )
    SELECT doc_id, n_bytes, stream,
           CAST(floor(cb / {_M6_BUDGET}) AS INT) AS shard,
           CAST(cb % {_M6_BUDGET} AS BIGINT) AS offset
    FROM placed
    """,
)
def m6_shard_packing(spark, sf_dir):
    """Training-shard layout for multimodal payloads, planned from the
    MANIFEST (id, n_bytes) — payload bytes never shuffle to decide where
    they go. Synthetic but realistic sizes (1-10 KB, id-derived so both
    engines rebuild them); hash-routed to 4 independent streams so the
    running byte sum never serializes into one ordered partition;
    placement md5-deterministic, so reruns emit identical shard
    manifests. Records atomic: shard overshoot bounded by one payload."""
    from debezium_spark.analytics.multimodal import shard_payloads

    man = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            (F.lit(1000) + (F.col("doc_id") * 37) % 9000)
            .cast("long")
            .alias("n_bytes"),
        )
    )
    return shard_payloads(
        man, budget=_M6_BUDGET, streams=_M6_STREAMS
    )


# ---------------------------------------------------------------------------
# M7 — perceptual near-duplicate images (aHash + banded Hamming join)
# ---------------------------------------------------------------------------
_M7_BYTES = ",\n           ".join(
    f"{_BYTE(_MD5, i + 1)} AS b{i}" for i in range(16)
)
_M7_TOTAL = " + ".join(f"b{i}" for i in range(16))
_M7_PH = " + ".join(
    f"CASE WHEN b{i} * 16 >= total THEN {1 << i} ELSE 0 END"
    for i in range(16)
)
_M7_ANY_BAND = " OR ".join(
    f"((x.p >> {4 * b}) & 15) = ((y.p >> {4 * b}) & 15)" for b in range(4)
)


@register(
    "m7_image_near_dups",
    oracle=f"""
    WITH bytes AS (
        SELECT doc_id,
           {_M7_BYTES}
        FROM documents
    ),
    tot AS (SELECT *, {_M7_TOTAL} AS total FROM bytes),
    ph AS (SELECT doc_id, CAST({_M7_PH} AS BIGINT) AS p FROM tot)
    SELECT x.doc_id AS a, y.doc_id AS b,
           CAST(bit_count(xor(x.p, y.p)) AS INT) AS hamming
    FROM ph x JOIN ph y ON x.doc_id < y.doc_id
    WHERE ({_M7_ANY_BAND})
      AND bit_count(xor(x.p, y.p)) <= 3
    """,
)
def m7_image_near_dups(spark, sf_dir):
    """Perceptual image near-dup candidates — the image modality's
    SimHash: average-hash over the (stubbed, deterministic) decoded
    thumbnail, then a banded Hamming bucket join (pigeonhole: hashes
    within Hamming 3 share one of 4 disjoint bands) with exact
    ``bit_count(xor)`` verification and first-matching-band duplicate
    suppression. All hash arithmetic is JVM-side codegen on the blob hex
    — the oracle's O(n²) self-join is the proof the banded plan never
    runs at scale."""
    from debezium_spark.analytics.multimodal import (
        image_near_dups,
        synthesize_image_blob,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .withColumn("blob", synthesize_image_blob(F.col("doc_id")))
    )
    return image_near_dups(docs)
