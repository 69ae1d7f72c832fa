"""Sparse-vector similarity invariants (analytics/sparse.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _sv(dims, pairs):
    """Build a SparseDoubleVector struct literal from (idx, val) pairs."""
    pairs = sorted(pairs)
    return (
        dims,
        [i for i, _ in pairs],
        [float(v) for _, v in pairs],
    )


def _dense(dims, sv):
    out = np.zeros(dims)
    for i, v in zip(sv[1], sv[2]):
        out[i - 1] = v
    return out


def test_sparse_dot_matches_dense(spark):
    """sparse_dot over the struct == numpy dense dot, including disjoint
    supports (0) and integer values (exact at any order)."""
    from debezium_spark.analytics.sparse import sparse_dot

    rng = np.random.default_rng(7)
    dims = 50
    rows = []

    def rand_sv():
        # dict keyed by index: the SparseDoubleVector contract is UNIQUE
        # ascending indices (sparse_dot's map build relies on it)
        entries = {
            int(rng.integers(1, dims + 1)): int(rng.integers(-5, 6))
            for _ in range(rng.integers(0, 12))
        }
        return _sv(dims, entries.items())

    for _ in range(25):
        a, b = rand_sv(), rand_sv()
        rows.append((a, b, float(_dense(dims, a) @ _dense(dims, b))))
    schema = (
        "a struct<dimensions:int,indices:array<int>,values:array<double>>, "
        "b struct<dimensions:int,indices:array<int>,values:array<double>>, "
        "want double"
    )
    df = spark.createDataFrame(rows, schema)
    got = df.select(
        sparse_dot(F.col("a"), F.col("b")).alias("dot"), "want"
    ).collect()
    for r in got:
        assert r["dot"] == r["want"]


def test_sparse_cosine_null_and_zero_norm(spark):
    from debezium_spark.analytics.sparse import sparse_cosine

    schema = (
        "a struct<dimensions:int,indices:array<int>,values:array<double>>, "
        "b struct<dimensions:int,indices:array<int>,values:array<double>>"
    )
    df = spark.createDataFrame(
        [
            (_sv(10, [(1, 2)]), _sv(10, [(1, 2)])),   # identical → 1.0
            (_sv(10, [(1, 2)]), _sv(10, [])),          # zero norm → NULL
            (None, _sv(10, [(1, 2)])),                 # NULL in → NULL out
        ],
        schema,
    )
    got = [r[0] for r in df.select(sparse_cosine(F.col("a"), F.col("b"))).collect()]
    assert got[0] == 1.0
    assert got[1] is None
    assert got[2] is None


def test_knn_sparse_self_is_rank_one(spark):
    """Every query doc's nearest neighbor is itself at cosine 1 — the
    retrieval sanity invariant."""
    from debezium_spark.analytics.sparse import knn_sparse, sparse_tf

    docs = spark.createDataFrame(
        [
            (1, "red apples and green apples"),
            (2, "green pears and yellow pears"),
            (3, "completely different words here altogether"),
        ],
        "doc_id long, text string",
    )
    sv = sparse_tf(docs, dims=64)
    out = knn_sparse(sv, sv, k=2).collect()
    top = {r["qid"]: (r["doc_id"], r["cos_q"]) for r in out if r["rank"] == 1}
    assert set(top) == {1, 2, 3}
    for qid, (doc, cos_q) in top.items():
        assert doc == qid
        # self-cosine = s / sqrt(s)² — floats may land a hair under 1,
        # so the floor-quantized value is 1e6 or 1e6-1
        assert cos_q in (999999, 1000000)


def test_bm25_rare_term_outranks(spark):
    """A document sharing the query's RARE term must outrank one sharing
    only a corpus-common term (the idf property BM25 exists for)."""
    from debezium_spark.analytics.sparse import bm25_rank, sparse_tf

    docs = spark.createDataFrame(
        [
            (0, "zyzzyva common"),        # the query
            (1, "zyzzyva common"),        # shares rare + common term
            (2, "common common common"),  # shares only the common term
            (3, "common filler words"),
            (4, "common other padding"),
        ],
        "doc_id long, text string",
    )
    sv = sparse_tf(docs, dims=256)
    q = sv.filter(F.col("doc_id") == 0)
    got = {r["doc_id"]: r["rank"] for r in bm25_rank(sv, q, k=5).collect()}
    assert got[1] < got[2]  # rare-term doc ranks strictly better


def test_rrf_fuse_rank_semantics(spark):
    """RRF invariants: a doc ranked in BOTH legs beats a doc at the same
    rank in one leg; contributions are the exact integer quotients
    scale div (k0+rank); a doc absent from a leg simply gets no
    contribution (no NULL poisoning)."""
    from debezium_spark.analytics.sparse import rrf_fuse

    leg = "qid long, doc_id long, rank int"
    cos = spark.createDataFrame([(1, 10, 1), (1, 11, 2), (1, 12, 3)], leg)
    bm = spark.createDataFrame([(1, 11, 1), (1, 13, 2)], leg)
    out = rrf_fuse([cos, bm], k=10, k0=60, scale=1_000_000_000)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 11: rank 2 + rank 1 -> 10**9//62 + 10**9//61
    assert rows[11]["rrf_q"] == 10**9 // 62 + 10**9 // 61
    assert rows[10]["rrf_q"] == 10**9 // 61
    assert rows[13]["rrf_q"] == 10**9 // 62
    assert rows[12]["rrf_q"] == 10**9 // 63
    # two-leg doc 11 outranks every single-leg doc
    assert rows[11]["rank"] == 1
    # deterministic tie-break: equal rrf_q -> smaller doc_id first
    tie = rrf_fuse(
        [cos, cos.withColumn("doc_id", F.col("doc_id") + 100)], k=10
    ).collect()
    by_rank = sorted(tie, key=lambda r: r["rank"])
    assert by_rank[0]["doc_id"] == 10 and by_rank[1]["doc_id"] == 110


def test_hybrid_search_leg_order_invariant(spark):
    """hybrid_search == rrf_fuse of its two legs, and RRF is invariant to
    leg permutation (sum is commutative over integer contributions)."""
    from debezium_spark.analytics.sparse import (
        bm25_rank,
        hybrid_search,
        knn_sparse,
        rrf_fuse,
        sparse_tf,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta beta gamma"),
            (3, "epsilon zeta eta theta"),
            (4, "alpha delta delta delta"),
        ],
        "doc_id long, text string",
    )
    sv = sparse_tf(docs, dims=64)
    q = sv.filter(F.col("doc_id") == 1)
    combined = hybrid_search(sv, q, k=3)
    legs = [knn_sparse(sv, q, k=3), bm25_rank(sv, q, k=3)]
    manual = rrf_fuse(legs, k=3)
    swapped = rrf_fuse(list(reversed(legs)), k=3)
    key = lambda r: (r["qid"], r["rank"], r["doc_id"], r["rrf_q"])
    c, m, s = (sorted(map(key, df.collect())) for df in (combined, manual, swapped))
    assert c == m == s and len(c) == 3
