"""Perceptual image near-dup (analytics/multimodal.py: perceptual_hash /
image_near_dups) — hand-crafted blobs with known Hamming relationships."""

from __future__ import annotations

from pyspark.sql import functions as F


def _blob(payload: bytes, w: int = 16, h: int = 16) -> bytes:
    assert len(payload) == 16
    return b"IMG1" + w.to_bytes(2, "big") + h.to_bytes(2, "big") + payload


def test_perceptual_hash_bits(spark):
    """bit i = payload[i]*16 >= sum(payload): a half-low/half-high payload
    hashes to exactly the high bits; a uniform payload (all equal) sets
    EVERY bit (>=, not >)."""
    from debezium_spark.analytics.multimodal import perceptual_hash

    split = bytes([0] * 8 + [200] * 8)
    flat = bytes([7] * 16)
    df = spark.createDataFrame(
        [(1, _blob(split)), (2, _blob(flat))], "doc_id long, blob binary"
    )
    got = {r["doc_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert got[1] == sum(1 << i for i in range(8, 16))
    assert got[2] == (1 << 16) - 1


def test_image_near_dups_planted(spark):
    """Two visually-near blobs (1 payload byte nudged -> Hamming 1) pair;
    an identical pair reports Hamming 0; a scrambled blob pairs with
    nobody. Canonical a < b, each pair exactly once."""
    from debezium_spark.analytics.multimodal import image_near_dups

    base = bytes([10, 240, 10, 240, 10, 240, 10, 240] * 2)
    near = bytearray(base)
    near[0] = 240  # flips exactly one ahash bit
    far = bytes([10] * 8 + [240] * 8)  # different bit layout entirely
    df = spark.createDataFrame(
        [
            (1, _blob(base)),
            (2, _blob(bytes(near))),
            (3, _blob(base)),
            (4, _blob(far)),
        ],
        "doc_id long, blob binary",
    )
    got = {(r["a"], r["b"]): r["hamming"] for r in image_near_dups(df).collect()}
    assert got[(1, 3)] == 0
    assert got[(1, 2)] == 1
    assert got[(2, 3)] == 1
    assert all(a < b for a, b in got)
    assert not any(4 in p for p in got), got
