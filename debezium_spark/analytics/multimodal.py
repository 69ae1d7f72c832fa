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
