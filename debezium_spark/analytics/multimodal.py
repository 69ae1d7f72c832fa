"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Bridges the reference's AI SMTs — ``FieldToDocling``
(debezium-ai/debezium-ai-docling/src/main/java/io/debezium/ai/docling/
FieldToDocling.java: document bytes → markdown through an external service)
and ``FieldToEmbedding`` (debezium-ai/debezium-ai-embeddings/.../
FieldToEmbedding.java:51) — to the training-data-pipeline shape: blobs ride
along as ``BinaryType`` columns with metadata structs; per-blob compute runs
in Arrow-batched ``mapInPandas`` so bytes never cross the JVM↔Python
boundary row-at-a-time.

The actual codecs (PIL/ffmpeg/docling) are NOT in this container, so the
decode step is stubbed: ``decode_image`` raises ``NotImplementedError``
while everything Spark-side — schema, batch iteration, partitioning, output
contract — is real and exercised by deterministic header/byte analysis that
an oracle can reproduce.

Synthetic blob layout (``synthesize_image_blob``):
  bytes [0:4)  magic 'IMG1'
  bytes [4:6)  width  (big-endian u16)
  bytes [6:8)  height (big-endian u16)
  bytes [8:24) payload: md5 digest of the id (the "pixel data")
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"IMG1"
MAGIC_HEX = MAGIC.hex()


def synthesize_image_blob(id_col: Column) -> Column:
    """Deterministic fake image blob (both engines can rebuild it from hex)."""
    width = 16 + F.pmod(id_col, F.lit(64))  # 16..79
    height = 16 + F.pmod(id_col * 7, F.lit(48))  # 16..63
    hex_str = F.concat(
        F.lit(MAGIC_HEX),
        F.lpad(F.conv(width.cast("string"), 10, 16), 4, "0"),
        F.lpad(F.conv(height.cast("string"), 10, 16), 4, "0"),
        F.md5(F.concat(F.lit("img:"), id_col.cast("string"))),
    )
    return F.unhex(hex_str)


def decode_image(blob: bytes):  # pragma: no cover - stub by design
    """Real image decode (PIL/libvips). Not available in this container."""
    raise NotImplementedError(
        "image codecs are not installed; production deployments plug a "
        "decoder in here — the Spark plumbing around it is already real"
    )


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("is_valid", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def extract_image_meta(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Header parse + byte stats per blob via Arrow-batched ``mapInPandas``
    — the exact shape a real feature extractor (decode → resize → embed)
    uses; only the per-blob function body would change."""

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            valid, widths, heights, plens, sums = [], [], [], [], []
            for b in blobs:
                b = bytes(b) if b is not None else b""
                ok = len(b) >= 8 and b[:4] == MAGIC
                valid.append(ok)
                widths.append(int.from_bytes(b[4:6], "big") if ok else None)
                heights.append(int.from_bytes(b[6:8], "big") if ok else None)
                payload = b[8:] if ok else b""
                plens.append(len(payload))
                sums.append(sum(payload))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "is_valid": valid,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "payload_bytes": pd.array(plens, dtype="Int32"),
                    "byte_sum": sums,
                }
            )

    return df.mapInPandas(analyze, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_image_blob(
    df: DataFrame,
    target: int = 32,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Aspect-preserving resize over the opaque blob column — the thumbnail
    / normalize step of an image pipeline, as Arrow-batched ``mapInPandas``
    (bytes never travel row-at-a-time). With no codecs in the container the
    "pixels" are the synthetic payload: dims scale so max(w,h)==target and
    the payload is cut proportionally to the area ratio — every byte of the
    output is a pure function of the input, so the whole operator is
    oracle-checkable end-to-end. A real deployment swaps ONLY the per-blob
    body for PIL/libvips; schema, batching, and partitioning stay as-is.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "new_width", "new_height",
                    "resized")}
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(b) if b is not None else b""
                if len(b) < 8 or b[:4] != MAGIC:
                    row = (i, None, None, None, None, None)
                else:
                    w = int.from_bytes(b[4:6], "big")
                    h = int.from_bytes(b[6:8], "big")
                    m = max(w, h)
                    nw, nh = w * target // m, h * target // m
                    payload = b[8:]
                    k = max(1, len(payload) * nw * nh // (w * h))
                    nb = (
                        MAGIC
                        + nw.to_bytes(2, "big")
                        + nh.to_bytes(2, "big")
                        + payload[:k]
                    )
                    row = (i, w, h, nw, nh, nb)
                for key, v in zip(out, row):
                    out[key].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "new_width": pd.array(out["new_width"], dtype="Int32"),
                    "new_height": pd.array(out["new_height"], dtype="Int32"),
                    "resized": out["resized"],
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    *,
    frame_bytes: int = 4,
    every_nth: int = 2,
) -> DataFrame:
    """Video-style frame sampling over the payload, natively: split the
    payload into fixed-size "frames" and keep every Nth — array expressions
    only, no Python. A real implementation swaps the byte-slice for a
    container-format keyframe index; the plan shape is identical."""
    payload = F.expr(f"substring({blob_col}, 9, 2147483647)")
    n_frames = F.floor(F.length(payload) / F.lit(frame_bytes)).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1)
    frames = F.transform(
        F.filter(idx, lambda i: i % every_nth == 0),
        lambda i: F.expr(
            f"substring({blob_col}, 9, 2147483647)"
        ).substr(i * frame_bytes + 1, F.lit(frame_bytes)),
    )
    return df.withColumn("frames", frames).withColumn(
        "n_frames_sampled", F.size("frames")
    )


def docling_markdown(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """T21 FieldToDocling stand-in: document → markdown. The reference calls
    a docling service (FieldToDocling.java); the deterministic stub renders
    a markdown skeleton so the conversion contract (schema, batching) is
    testable without the service."""

    @F.pandas_udf(T.StringType())
    def to_md(ids: pd.Series, texts: pd.Series) -> pd.Series:
        return "# Document " + ids.astype(str) + "\n\n" + texts.fillna("")

    return df.withColumn("markdown", to_md(F.col(id_col), F.col(text_col)))


AUDIO_MAGIC = b"AUD1"


def synthesize_audio_blob(id_col: Column) -> Column:
    """Deterministic fake audio blob: magic 'AUD1', sample-rate u16,
    32 bytes of "PCM" payload (two md5 digests) — both engines can rebuild
    it from hex, like :func:`synthesize_image_blob`."""
    rate = 8000 + F.pmod(id_col, F.lit(8)) * 1000
    hex_str = F.concat(
        F.lit(AUDIO_MAGIC.hex()),
        F.lpad(F.conv(rate.cast("string"), 10, 16), 4, "0"),
        F.md5(F.concat(F.lit("aud-a:"), id_col.cast("string"))),
        F.md5(F.concat(F.lit("aud-b:"), id_col.cast("string"))),
    )
    return F.unhex(hex_str)


AUDIO_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_segments", T.IntegerType()),
        T.StructField("energies", T.StringType()),
    ]
)


def segment_audio(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    *,
    window: int = 8,
    hop: int = 4,
) -> DataFrame:
    """Sliding-window segmentation with per-segment energy (byte sum) via
    Arrow-batched ``mapInPandas`` — the librosa/ffmpeg-resample shape; a
    real deployment swaps the byte-sum for an actual DSP kernel, the
    Spark plumbing (schema, batching, partitioning) stays identical."""

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, energies = [], [], []
            for b in pdf[blob_col]:
                b = bytes(b) if b is not None else b""
                ok = len(b) >= 6 and b[:4] == AUDIO_MAGIC
                rate = int.from_bytes(b[4:6], "big") if ok else None
                payload = b[6:] if ok else b""
                segs = [
                    sum(payload[i : i + window])
                    for i in range(0, max(len(payload) - window, 0) + 1, hop)
                ]
                rates.append(rate)
                counts.append(len(segs))
                energies.append(",".join(str(e) for e in segs))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_segments": pd.array(counts, dtype="Int32"),
                    "energies": energies,
                }
            )

    return df.mapInPandas(analyze, AUDIO_SEGMENT_SCHEMA)


def binary_exact_dedup(
    df: DataFrame,
    bin_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup of opaque binary payloads (the image/audio twin of the
    text pipeline's ``x4``): group by a content key — ``(md5(hex(bytes)),
    byte length)``, hashing computed inside whole-stage codegen, no Python
    — keep the smallest id as the canonical copy and report the copy
    count. The hex-md5 key keeps the grouping replayable by any engine;
    the extra length column guards the (already negligible) md5-collision
    case. One map-side-combinable hash aggregation; NULL payloads group
    together under a NULL key and never match real content.

    Output: ``(id, content_key, n_bytes, n_copies)`` — one row per
    distinct payload."""
    key = F.md5(F.lower(F.hex(F.col(bin_col))))
    return (
        df.select(
            F.col(id_col),
            key.alias("content_key"),
            F.length(F.col(bin_col)).cast("int").alias("n_bytes"),
        )
        .groupBy("content_key", "n_bytes")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").cast("int").alias("n_copies"),
        )
        .select(id_col, "content_key", "n_bytes", "n_copies")
    )


def shard_payloads(
    manifest: DataFrame,
    *,
    id_col: str = "doc_id",
    bytes_col: str = "n_bytes",
    budget: int = 8192,
    streams: int = 4,
) -> DataFrame:
    """Plan WebDataset-style training shards from a payload MANIFEST —
    ``(id, n_bytes)`` rows, never the payload bytes themselves (at 100 TB
    the plan must come from metadata; shuffling blobs to decide where
    they go would move the corpus twice). Records are atomic: each is
    assigned to the shard where its first byte lands in its stream's
    concatenated layout, so a shard's actual size overshoots ``budget``
    by at most one payload — the standard tar-shard contract.

    Output per record: ``(id, n_bytes, stream, shard, offset)`` where
    ``shard`` numbers locally within the stream and ``offset`` is the
    record's byte position inside its shard's target window.

    Plan shape: records hash-route to ``streams`` independent streams
    (set ≈ cores at scale — same two-level trick as x27's token
    packing), the running byte sum windows PER STREAM (never one global
    ordered partition), and placement is md5-deterministic: reruns emit
    identical shard layouts, which is what makes shard manifests
    resumable/cacheable artifacts. Rows with NULL byte counts are
    excluded — a manifest row without a size cannot be placed honestly
    (validate the manifest upstream; silently treating NULL as 0 would
    corrupt every offset after it)."""
    from debezium_spark.analytics.text import portable_hash64
    from pyspark.sql import Window

    stream = F.pmod(
        portable_hash64(F.col(id_col).cast("string"), seed="shard:"),
        F.lit(streams),
    ).cast("int")
    okey = portable_hash64(F.col(id_col).cast("string"), seed="order:")
    base = manifest.filter(F.col(bytes_col).isNotNull()).select(
        F.col(id_col),
        F.col(bytes_col).cast("long").alias("n_bytes"),
        stream.alias("stream"),
        okey.alias("__ok"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy("__ok", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
    return (
        base.withColumn("__cb", cum_before)
        .select(
            id_col,
            "n_bytes",
            "stream",
            F.floor(F.col("__cb") / budget).cast("int").alias("shard"),
            (F.col("__cb") % budget).cast("long").alias("offset"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual near-duplicate detection (the image modality's SimHash):
# average-hash over the decoded thumbnail, banded Hamming bucket join.
# ---------------------------------------------------------------------------
def perceptual_hash(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Average-hash (aHash) per image: bit i = pixel_i ≥ mean(pixels),
    computed as the division-free integer comparison
    ``pixel_i · n_pixels ≥ sum(pixels)``. The "thumbnail" here is the
    synthetic blob's 16 payload bytes (the deterministic decode stub —
    production swaps in a real decode + 8×8 grayscale resize and the hash
    widens to the standard 64 bits); everything else — hex slicing, bit
    packing, the downstream join — is real and entirely JVM-side
    codegen, no UDF.

    Output: ``(id, phash)`` with a 16-bit hash. Near-duplicate images
    (re-encodes, slight crops/brightness shifts on real decodes) differ
    in a few bits; exact duplicates are m5's content-hash job, not this.
    """
    hexs = F.hex(F.col(blob_col))
    nbytes = 16
    payload = [
        F.conv(F.substring(hexs, 17 + 2 * i, 2), 16, 10).cast("long")
        for i in range(nbytes)
    ]
    total = payload[0]
    for b in payload[1:]:
        total = total + b
    ph = F.lit(0).cast("long")
    for i, b in enumerate(payload):
        ph = ph + F.when(b * nbytes >= total, F.lit(1 << i)).otherwise(0)
    return df.select(F.col(id_col), ph.alias("phash"))


def image_near_dups(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """Candidate pairs of perceptually-similar images: ``(a, b, hamming)``
    with ``hamming(phash_a, phash_b) <= max_hamming``, ``a < b``.

    Plan shape (100 TB): by pigeonhole, two hashes within Hamming
    ``bands - 1`` agree on at least one of ``bands`` disjoint bit-bands,
    so candidates come from ``bands`` bucket joins on the band value —
    never an all-pairs comparison. Pairs are emitted once, from their
    FIRST matching band (computed from the two hashes directly — x6's
    duplicate-suppression trick, no global distinct shuffle), then the
    exact Hamming filter (``bit_count(a XOR b)``) verifies. At the
    production 64-bit hash, 8-bit bands give 256-way bucketing per band;
    in-bucket pair expansion is the same bounded shape as SimHash's.

    With the 16-bit stub hash, 4-bit bands give only 16 bucket values per
    band, so a large corpus would collapse into a few unbounded arrays —
    ``max_bucket_size`` guards that: any bucket above it fails the job
    with an explicit message (raise-early beats an executor OOM), telling
    the caller to widen the hash or the bands before running at scale.
    """
    band_bits = 16 // bands
    mask = (1 << band_bits) - 1
    ph = perceptual_hash(df, blob_col=blob_col, id_col=id_col)

    def nib(col: Column, b: int) -> Column:
        return F.shiftright(col, b * band_bits).bitwiseAND(F.lit(mask))

    banded = ph.select(
        F.col(id_col).alias("__id"),
        F.col("phash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    nib(F.col("phash"), b).alias("bkey"),
                )
                for b in range(bands)
            ])
        ).alias("__bb"),
    ).select("__id", "phash", "__bb.band", "__bb.bkey")
    grouped = (
        banded.groupBy("band", "bkey")
        .agg(F.collect_list(F.struct("__id", "phash")).alias("__members"))
        .filter(F.size("__members") >= 2)
        .withColumn(
            "__members",
            F.when(
                F.size("__members") <= max_bucket_size, F.col("__members")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "image_near_dups: band bucket exceeds "
                            f"max_bucket_size={max_bucket_size} "
                            "(size "
                        ),
                        F.size("__members").cast("string"),
                        F.lit(
                            ") — widen the perceptual hash / band width "
                            "before running at this scale"
                        ),
                    )
                )
            ),
        )
    )
    pairs = (
        grouped.select(
            "band",
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("__members"),
                            lambda x: F.transform(
                                F.col("__members"),
                                lambda y: F.struct(
                                    x["__id"].alias("a"),
                                    y["__id"].alias("b"),
                                    x["phash"].alias("pa"),
                                    y["phash"].alias("pb"),
                                ),
                            ),
                        )
                    ),
                    lambda p: p["a"] < p["b"],
                )
            ).alias("__p"),
        )
        .select("band", "__p.a", "__p.b", "__p.pa", "__p.pb")
    )
    first_match = F.lit(bands - 1)
    for b in range(bands - 1, -1, -1):
        first_match = F.when(
            nib(F.col("pa"), b) == nib(F.col("pb"), b), F.lit(b)
        ).otherwise(first_match)
    ham = F.bit_count(
        F.col("pa").bitwiseXOR(F.col("pb"))
    ).cast("int")
    return (
        pairs.filter(F.col("band") == first_match)
        .filter(ham <= max_hamming)
        .select("a", "b", ham.alias("hamming"))
    )
