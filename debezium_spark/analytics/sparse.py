"""Sparse-vector similarity — the sparse-retrieval half of a training-data
pipeline.

The type system carries the reference's SparseDoubleVector end-to-end
(``operators/handling.py:sparse_double_vector`` — struct ``{dimensions,
indices[], values[]}``, 1-based ascending indices, the shape
``io.debezium.data.vector.SparseDoubleVector`` models per
debezium-core/src/main/java/io/debezium/data/vector/SparseDoubleVector.java:26);
this module makes the struct COMPUTABLE without ever densifying:

* :func:`sparse_dot` / :func:`sparse_norm` / :func:`sparse_cosine` — pure
  column expressions over the struct (map lookup + ordered fold; the fold
  runs in ascending-index order so float results are deterministic, and
  for integer-valued vectors — TF vectors — every product and partial sum
  is exact, so any evaluation order agrees bit-for-bit).
* :func:`sparse_tf` — documents → sparse TF vectors over a hashed
  vocabulary (portable md5 hash, so an external engine reproduces the
  indices exactly; hash collisions simply add counts on both sides).
* :func:`explode_postings` / :func:`knn_sparse` — inverted-index retrieval:
  both sides explode to (id, idx, val) postings, an equi-join on the index
  computes dot products only where coordinates overlap (never all-pairs,
  never dense), norms come from per-struct folds, and a per-query top-k
  window ranks by cosine. At 100 TB the posting join shuffles
  O(nnz) small rows on the index key — the standard sparse-retrieval
  scale shape (x18's posting lists are this join's corpus side) — and the
  query side broadcasts when small.

No densification anywhere: nothing materializes a length-``dimensions``
array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import ORACLE_TOKENIZE, oracle_hash64, portable_hash64, tokenize


def sparse_dot(a: Column, b: Column) -> Column:
    """Dot product of two SparseDoubleVector structs: fold over ``a``'s
    entries (ascending index order — deterministic), looking each index up
    in a map built from ``b``; missing coordinates contribute 0. NULL in →
    NULL out (either side).

    Relies on the SparseDoubleVector contract of UNIQUE indices (the
    reference stores one value per dimension —
    debezium-core/src/main/java/io/debezium/data/vector/SparseDoubleVector.java);
    a struct violating it fails loudly (Spark's DUPLICATED_MAP_KEY) rather
    than silently summing a coordinate twice."""
    m = F.map_from_arrays(b["indices"], b["values"])
    entries = F.zip_with(
        a["indices"],
        a["values"],
        lambda i, v: F.struct(i.alias("i"), v.alias("v")),
    )
    dot = F.aggregate(
        entries,
        F.lit(0.0),
        lambda acc, e: acc
        + e["v"] * F.coalesce(F.element_at(m, e["i"]), F.lit(0.0)),
    )
    return F.when(a.isNotNull() & b.isNotNull(), dot)


def sparse_norm(a: Column) -> Column:
    """L2 norm of a SparseDoubleVector struct (ordered fold; NULL-in/NULL-out)."""
    return F.when(
        a.isNotNull(),
        F.sqrt(
            F.aggregate(a["values"], F.lit(0.0), lambda acc, v: acc + v * v)
        ),
    )


def sparse_cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two sparse structs; NULL when either is NULL
    or either norm is zero (no silent 0-for-undefined)."""
    denom = sparse_norm(a) * sparse_norm(b)
    return F.when(denom > 0, sparse_dot(a, b) / denom)


def sparse_tf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dims: int = 1024,
    seed: str = "stf:",
) -> DataFrame:
    """(id, sv) sparse term-frequency vectors over a hashed vocabulary.

    index = portable md5 hash of the token mod ``dims`` (1-based), value =
    term count (exact integer, so downstream dots/norms are order-exact).
    Two shuffles: (id, idx) count, then per-id array assembly sorted by
    index — the ascending-index invariant every struct consumer relies on.
    Rows with NULL text produce no vector (their tokens are NULL)."""
    idx = (
        portable_hash64(F.col("token"), seed=seed) % dims + 1
    ).cast("int")
    tf = (
        df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token"))
        .select(F.col(id_col), idx.alias("idx"))
        .groupBy(id_col, "idx")
        .agg(F.count("*").cast("double").alias("val"))
    )
    entries = F.array_sort(
        F.collect_list(F.struct(F.col("idx"), F.col("val")))
    )
    return tf.groupBy(id_col).agg(
        F.struct(
            F.lit(dims).cast("int").alias("dimensions"),
            F.transform(entries, lambda e: e["idx"]).alias("indices"),
            F.transform(entries, lambda e: e["val"]).alias("values"),
        ).alias("sv")
    )


def oracle_sparse_tf_cte(*, dims: int = 1024, seed: str = "stf:") -> str:
    """DuckDB replay of :func:`sparse_tf`'s (doc_id, idx, val) postings —
    callers build dots/norms relationally from this CTE body (exact for
    integer TF values, so relational aggregation order is irrelevant)."""
    toks = ORACLE_TOKENIZE.format(c="text")
    h = oracle_hash64("token", seed=seed)
    return f"""
    tok AS (
        SELECT doc_id, unnest({toks}) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id,
               CAST({h} % {dims} + 1 AS INT) AS idx,
               CAST(count(*) AS DOUBLE) AS val
        FROM tok GROUP BY 1, 2
    )"""


def explode_postings(
    sv_df: DataFrame, id_col: str, *, id_alias: str | None = None
) -> DataFrame:
    """(id, sv) → (id, idx, val) posting rows — the inverted-index shape
    (one row per stored non-zero coordinate)."""
    out_id = id_alias or id_col
    return sv_df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.zip_with(
                F.col("sv.indices"),
                F.col("sv.values"),
                lambda i, v: F.struct(i.alias("idx"), v.alias("val")),
            )
        ).alias("e"),
    ).select(out_id, F.col("e.idx").alias("idx"), F.col("e.val").alias("val"))


def knn_sparse(
    corpus_sv: DataFrame,
    queries_sv: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-k cosine neighbors per query over sparse vectors via an
    inverted-index join — the sparse analog of knn_bruteforce, without a
    dense detour.

    Dot products exist only for (query, doc) pairs sharing ≥1 coordinate;
    everything else is cosine 0 and can never enter the top-k while ≥k
    overlapping docs exist (TF vectors share stopword buckets, so overlap
    is dense in practice). The query side is small by contract —
    broadcast — and norms are per-struct folds, not a second posting
    aggregation. Output: (qid, {id_col}, rank, cos_q) with cosine
    floor-quantized to 1e-6 (integer — engine-portable, no round()
    half-way hazard)."""
    q_post = explode_postings(queries_sv, id_col, id_alias="qid").withColumnRenamed(
        "val", "qval"
    )
    d_post = explode_postings(corpus_sv, id_col).withColumnRenamed("val", "dval")
    dots = (
        F.broadcast(q_post)
        .join(d_post, "idx")
        .groupBy("qid", id_col)
        .agg(F.sum(F.col("qval") * F.col("dval")).alias("dot"))
    )
    d_norm = corpus_sv.select(
        F.col(id_col), sparse_norm(F.col("sv")).alias("dn")
    )
    q_norm = queries_sv.select(
        F.col(id_col).alias("qid"), sparse_norm(F.col("sv")).alias("qn")
    )
    scored = (
        dots.join(d_norm, id_col)
        .join(F.broadcast(q_norm), "qid")
        .withColumn("cos", F.col("dot") / (F.col("dn") * F.col("qn")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            id_col,
            "rank",
            F.floor(F.col("cos") * 1e6).cast("long").alias("cos_q"),
        )
    )


def rrf_fuse(
    legs: list[DataFrame],
    *,
    id_col: str = "doc_id",
    k: int = 10,
    k0: int = 60,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval legs — how production hybrid
    search combines lexical (BM25) and vector (cosine) rankings without
    commensurable scores (Cormack, Clarke & Buettcher, SIGIR 2009:
    ``RRF(d) = Σ_legs 1/(k0 + rank_leg(d))``, k0=60).

    Each leg is a (qid, {id_col}, rank) DataFrame (ranks 1-based; extra
    columns ignored). Fusing is rank-only by design — BM25 scores and
    cosines live on unrelated scales, so RRF beats score interpolation
    without per-corpus weight tuning.

    Engine-portable exactness: each leg's contribution is the INTEGER
    quotient ``scale div (k0 + rank)`` summed as BIGINTs — no float
    anywhere, so any engine replays bit-identically (mirror with
    ``scale // (k0 + rank)`` relationally). A document absent from a leg
    contributes 0 (the union simply has no row), matching the paper.

    Scale shape: unioned legs are already top-k-per-query (tiny relative
    to the corpora that produced them); one hash aggregation on
    (qid, id) + a per-query top-k window. No join back to the corpus."""
    if not legs:
        raise ValueError("rrf_fuse needs at least one ranked leg")
    contrib = F.expr(f"{int(scale)} div ({int(k0)} + rank)")
    parts = [
        leg.select(F.col("qid"), F.col(id_col), contrib.alias("c"))
        for leg in legs
    ]
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionAll(p)
    scored = fused.groupBy("qid", id_col).agg(
        F.sum("c").cast("long").alias("rrf_q")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("rrf_q").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "rrf_q")
    )


def bm25_rank(
    corpus_sv: DataFrame,
    queries_sv: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking over the inverted index — the other half of sparse
    retrieval (cosine ranks by angle; BM25 is what lexical search engines
    actually score with: Robertson-Spärck Jones term saturation +
    length normalization).

    Same join shape as :func:`knn_sparse`: postings equi-join on the
    hashed-vocabulary index, O(nnz) shuffle, never all-pairs. The
    corpus-level statistics are tiny and broadcast: ``df`` (document
    frequency per index) is bounded by the vocabulary dims, ``N``/``avgdl``
    are one row.

    Engine-portable exactness: the per-term score
    ``idf_r * (tf*(k1+1)) / (tf + k1*((1-b) + b*(dl/avgdl)))`` is pure
    IEEE +,-,*,/ over identically-parenthesized operands (deterministic
    across engines, unlike libm log), floor-quantized to an integer
    PER TERM, then summed as BIGINTs — so aggregation order can't change
    the result and a relational replay hashes bit-identically.
    ``idf_r = (N - df + 0.5)/(df + 0.5)`` is the rational core of the
    standard BM25 idf (its log is a monotone transform — drop
    ``F.log1p`` around it for classic scores when cross-engine
    bit-parity isn't needed). Query terms contribute binarily (distinct
    indices), the standard short-query form.

    Output: (qid, {id_col}, rank, score_q) — score_q the summed quantized
    term scores."""
    k1 = float(k1)
    b = float(b)
    post = explode_postings(corpus_sv, id_col)
    dl = post.groupBy(id_col).agg(F.sum("val").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"),
    )
    df_tbl = post.groupBy("idx").agg(F.count("*").alias("df"))
    q_terms = (
        explode_postings(queries_sv, id_col, id_alias="qid")
        .select("qid", "idx")
        .distinct()
    )
    joined = (
        F.broadcast(q_terms)
        .join(post, "idx")
        .join(F.broadcast(df_tbl), "idx")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf_r = (F.col("n") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    sat = (F.col("val") * F.lit(k1 + 1.0)) / (
        F.col("val")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl")))
    )
    term_q = F.floor((idf_r * sat) * F.lit(1000000.0)).cast("long")
    scored = (
        joined.select("qid", id_col, term_q.alias("s"))
        .groupBy("qid", id_col)
        .agg(F.sum("s").alias("score_q"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score_q").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "score_q")
    )


def hybrid_search(
    corpus_sv: DataFrame,
    queries_sv: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = 10,
    leg_k: int | None = None,
    k0: int = 60,
) -> DataFrame:
    """Production hybrid retrieval in one call: the lexical leg
    (:func:`bm25_rank`) and the vector leg (:func:`knn_sparse`) each
    retrieve their ``leg_k`` (default ``k``) candidates over the SAME
    inverted index, fused by :func:`rrf_fuse`. Returns
    (qid, {id_col}, rank, rrf_q) top-``k`` per query."""
    lk = leg_k or k
    return rrf_fuse(
        [
            knn_sparse(corpus_sv, queries_sv, id_col=id_col, k=lk),
            bm25_rank(corpus_sv, queries_sv, id_col=id_col, k=lk),
        ],
        id_col=id_col,
        k=k,
        k0=k0,
    )
