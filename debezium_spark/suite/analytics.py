"""Vector/similarity correctness queries over embeddings.parquet + documents.

Pairs each analytics.vectors operator with a DuckDB oracle. Float discipline:
both engines fold doubles in element order (Spark ``F.aggregate`` ≡ DuckDB
``list_reduce`` over a 0.0-prepended list), so cosine values are bit-identical
before the final display round.

Reference anchors: vector logical types
(debezium-connector-common/src/main/java/io/debezium/data/vector/DoubleVector.java:22-33)
and the T20 embedding SMT
(debezium-ai/debezium-ai-embeddings/src/main/java/io/debezium/ai/embeddings/FieldToEmbedding.java:51,57-75).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.analytics.vectors import (
    EMBED_DIM,
    cosine_similarity,
    field_to_embedding,
    knn_bruteforce,
    knn_lsh,
    sign_lsh_bucket,
)
from debezium_spark.suite import register

# ---------------------------------------------------------------------------
# DuckDB fragments mirroring analytics/vectors.py
# ---------------------------------------------------------------------------

# In-order left fold with double init — the twin of F.aggregate(.., 0.0, +).
def _fold_sum(list_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {list_expr}),"
        f" (a, b) -> a + b)"
    )


def _dot(a: str, b: str) -> str:
    prods = (
        f"list_transform(list_zip({a}, {b}),"
        f" z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))"
    )
    return _fold_sum(prods)


def _norm(a: str) -> str:
    sq = f"list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return f"sqrt({_fold_sum(sq)})"


def _cosine(a: str, b: str) -> str:
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


def _bucket(vec: str, bits: int = 4) -> str:
    terms = " + ".join(
        f"(CASE WHEN {vec}[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


# Query-point selection shared by the knn queries: sparse deterministic subset
# so the broadcast side stays small at every scale factor.
_QFILTER = "vec_id % 100 = 0"


# ---------------------------------------------------------------------------
# A1 — vector norms (portable float fold sanity anchor)
# ---------------------------------------------------------------------------
@register(
    "a1_vector_norms",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round({_norm('embedding')}, 6) AS l2_norm
    FROM embeddings
    """,
)
def a1_vector_norms(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(
        F.transform(dvec, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    ))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(norm, 6).alias("l2_norm"),
    )


# ---------------------------------------------------------------------------
# A2 — exact top-k cosine neighbors (brute force, broadcast query set)
# ---------------------------------------------------------------------------
@register(
    "a2_knn_bruteforce",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE {_QFILTER}
    ),
    scored AS (
        SELECT q.qid, c.vec_id AS nid,
               {_cosine('q.qvec', 'c.embedding')} AS sim
        FROM embeddings c CROSS JOIN q
        WHERE c.vec_id <> q.qid
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        FROM scored
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 5
    """,
)
def a2_knn_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    return knn_bruteforce(emb, queries, k=5)


# ---------------------------------------------------------------------------
# A3 — approximate top-k via sign-LSH buckets (the scale path)
# ---------------------------------------------------------------------------
@register(
    "a3_knn_lsh",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qvec,
               {_bucket('embedding')} AS bucket
        FROM embeddings WHERE {_QFILTER}
    ),
    c AS (
        SELECT vec_id AS nid, embedding AS nvec,
               {_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT q.qid, c.nid, {_cosine('q.qvec', 'c.nvec')} AS sim
        FROM c JOIN q USING (bucket)
        WHERE c.nid <> q.qid
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        FROM scored
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 3
    """,
)
def a3_knn_lsh(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    return knn_lsh(emb, queries, k=3, bits=4)


# ---------------------------------------------------------------------------
# A4 — T20 FieldToEmbedding (pandas_udf) — integer-exact check
# ---------------------------------------------------------------------------
def _t20_dim_sql(d: int) -> str:
    h = "CAST(('0x' || substr(md5('t20:' || t), 1, 15)) AS BIGINT)"
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(toks, t -> "
        f"CASE WHEN {h} % {EMBED_DIM} = {d} THEN "
        f"(CASE WHEN ({h} >> 4) & 1 = 1 THEN CAST(-1 AS BIGINT) ELSE CAST(1 AS BIGINT) END) "
        "ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b)"
        f" AS e{d}"
    )


@register(
    "a4_field_to_embedding",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           """
    + ",\n           ".join(_t20_dim_sql(d) for d in range(EMBED_DIM))
    + "\n    FROM toks",
)
def a4_field_to_embedding(spark, sf_dir):
    """T20: hashed-projection embedding of `documents.text`; each dimension is
    a sum of ±1 votes, so the values are integer-exact across engines."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = field_to_embedding(docs)
    return emb.select(
        "doc_id",
        *[
            F.element_at("embedding", d + 1).cast("long").alias(f"e{d}")
            for d in range(EMBED_DIM)
        ],
    )


# ---------------------------------------------------------------------------
# A5 — embed-then-search: T20 embeddings fed into cosine similarity search
# ---------------------------------------------------------------------------
@register(
    "a5_embed_similarity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents
    ),
    emb AS (
        SELECT doc_id,
               [{", ".join("CAST(" + _t20_dim_sql(d).split(" AS e")[0] + " AS DOUBLE)" for d in range(EMBED_DIM))}] AS v
        FROM toks
    ),
    q AS (SELECT doc_id AS qid, v AS qv FROM emb WHERE qid % 50 = 0),
    scored AS (
        SELECT q.qid, e.doc_id AS nid, {_cosine('q.qv', 'e.v')} AS sim
        FROM emb e CROSS JOIN q
        WHERE e.doc_id <> q.qid AND {_norm('e.v')} > 0 AND {_norm('q.qv')} > 0
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        FROM scored
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 3
    """,
)
def a5_embed_similarity(spark, sf_dir):
    """End-to-end similarity search over *computed* embeddings: T20 hashed
    projection (pandas_udf) → brute-force cosine top-3 for a sparse query set.
    Zero-norm vectors are excluded (cosine undefined)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = field_to_embedding(docs).select(
        F.col("doc_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))
    nonzero = emb.filter(norm > 0)
    queries = nonzero.filter(F.col("vec_id") % 50 == 0)
    return knn_bruteforce(nonzero, queries, k=3)


# ---------------------------------------------------------------------------
# A6 — embedding-cosine near-duplicate pairs (LSH-bucketed)
# ---------------------------------------------------------------------------
@register(
    "a6_cosine_near_dup",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding, {_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               {_cosine('a.embedding', 'b.embedding')} AS sim
        FROM e a JOIN e b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT a, b, round(sim, 6) AS sim
    FROM scored WHERE sim >= 0.3
    """,
)
def a6_cosine_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup: candidate pairs restricted to sign-LSH
    buckets (never all-pairs), verified by exact cosine ≥ threshold — the
    embedding-space analog of x7's MinHash→Jaccard pipeline."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select(
        "vec_id", "embedding",
        sign_lsh_bucket(F.col("embedding"), 4).alias("bucket"),
    )
    from debezium_spark.analytics.text import ensure_parallelism
    from debezium_spark.analytics.vectors import dot_product, l2_norm

    # Materialize (bucket, norm) once: localCheckpoint is a hard barrier so
    # project-collapse cannot inline the norm fold back into the per-pair
    # expression, and the self-join reads the tiny cached relation twice.
    # Measured at sf0.1: 5.8s -> 0.7s.
    e = ensure_parallelism(e).withColumn(
        "norm", l2_norm(F.col("embedding"))
    ).localCheckpoint(eager=True)
    a, b = e.alias("ea"), e.alias("eb")
    pairs = a.join(
        b,
        (F.col("ea.bucket") == F.col("eb.bucket"))
        & (F.col("ea.vec_id") < F.col("eb.vec_id")),
    )
    # Norms hoisted to per-row projections; only the dot runs per pair.
    sim = dot_product(F.col("ea.embedding"), F.col("eb.embedding")) / (
        F.col("ea.norm") * F.col("eb.norm")
    )
    return (
        pairs.select(
            F.col("ea.vec_id").alias("a"),
            F.col("eb.vec_id").alias("b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= 0.3)
        .withColumn("sim", F.round("sim", 6))
    )


# ---------------------------------------------------------------------------
# A7/A8 — trained IVF: centroids (one Lloyd step) + inverted-file ANN search
# ---------------------------------------------------------------------------
from debezium_spark.analytics.text import oracle_hash64  # noqa: E402
from debezium_spark.analytics.vectors import ivf_train, knn_ivf  # noqa: E402

# Shared training CTEs: deterministic hash-sampled seeds, then
# ``_IVF_ITERS`` Lloyd iterations — max-cosine assignment against the
# previous round's centroids, floor-quantized (tie-rule-free)
# per-dimension means. Generated per iteration so the SQL mirrors the
# Spark loop exactly.
_IVF_ITERS = 2


def _ivf_cte(iters: int = _IVF_ITERS) -> str:
    parts = [f"""
    seeds0 AS (
        SELECT vec_id AS sid, embedding AS cvec,
               {oracle_hash64("CAST(vec_id AS VARCHAR)", "ivf:")} AS h
        FROM embeddings
        ORDER BY h, sid LIMIT 8
    ),
    seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY h, sid) AS INT) - 1 AS cell,
               cvec
        FROM seeds0
    )"""]
    prev = "seeds"
    for k in range(iters):
        parts.append(f"""
    massign{k} AS (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cosine('e.embedding', 's.cvec')} DESC, s.cell
               ) AS rn
        FROM embeddings e CROSS JOIN {prev} s
    ),
    member{k} AS (SELECT vec_id, embedding, cell FROM massign{k} WHERE rn = 1),
    dims{k} AS (
        SELECT cell,
               unnest(range(1, len(embedding) + 1)) AS pos,
               unnest(embedding) AS val
        FROM member{k}
    ),
    perdim{k} AS (
        SELECT cell, CAST(pos AS INT) AS pos,
               CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 1000000.0) AS BIGINT))
                    AS DOUBLE) / 1000000.0 / count(*) AS cmean,
               count(*) AS n_members
        FROM dims{k} GROUP BY 1, 2
    ),
    cents{k} AS (
        SELECT cell, list(cmean ORDER BY pos) AS cvec,
               any_value(n_members) AS n_members
        FROM perdim{k} GROUP BY 1
    )""")
        prev = f"cents{k}"
    parts.append(f"""
    perdim AS (SELECT * FROM perdim{iters - 1}),
    cents AS (SELECT * FROM cents{iters - 1})""")
    return ",".join(parts)


_IVF_CTE = _ivf_cte()


@register(
    "a7_ivf_centroids",
    oracle=f"""
    WITH {_IVF_CTE}
    SELECT cell, pos, round(cmean, 6) AS cmean, n_members
    FROM perdim
    """,
)
def a7_ivf_centroids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_train(emb, n_cells=8, iterations=_IVF_ITERS)
    return cents.select(
        "cell", "n_members", F.posexplode("cvec").alias("pos0", "cmean")
    ).select(
        "cell",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.round("cmean", 6).alias("cmean"),
        "n_members",
    )


@register(
    "a8_ivf_search",
    oracle=f"""
    WITH {_IVF_CTE},
    corp AS (
        SELECT e.vec_id AS nid, e.embedding AS nvec, s.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cosine('e.embedding', 's.cvec')} DESC, s.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cents s
    ),
    probes AS (
        SELECT e.vec_id AS qid, e.embedding AS qvec, s.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cosine('e.embedding', 's.cvec')} DESC, s.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cents s
        WHERE e.{_QFILTER}
    ),
    scored AS (
        SELECT p.qid, c.nid, {_cosine('p.qvec', 'c.nvec')} AS sim
        FROM corp c JOIN probes p USING (cell)
        WHERE c.rn = 1 AND p.rn <= 2 AND c.nid <> p.qid
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
        FROM scored
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 5
    """,
)
def a8_ivf_search(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    return knn_ivf(emb, queries, k=5, n_cells=8, nprobe=2,
                   iterations=_IVF_ITERS)


# ---------------------------------------------------------------------------
# A9/A10 — product quantization: per-subspace codebooks + asymmetric search
# (PQ is the 100 TB ANN memory story: IVF routes to cells, PQ shrinks the
# vectors living in them 100x+. Same engine-portable training discipline
# as IVF so DuckDB reproduces every codeword bit-for-bit.)
# ---------------------------------------------------------------------------
_PQ_M, _PQ_K, _PQ_S = 8, 16, 8  # 8 subspaces x 16 codewords = 32-bit codes
_PQ_RERANK = 50


def _sql_sq_l2(a: str, b: str) -> str:
    diffs = (
        f"list_transform(list_zip({a}, {b}),"
        f" z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))"
        f" * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))"
    )
    return _fold_sum(diffs)


def _pq_cte(m: int = _PQ_M, k: int = _PQ_K, s: int = _PQ_S) -> str:
    from debezium_spark.analytics.text import oracle_hash64

    parts = []
    for mi in range(m):
        lo, hi = mi * s + 1, (mi + 1) * s
        parts.append(f"""
    psub{mi} AS (SELECT vec_id, embedding[{lo}:{hi}] AS sv FROM embeddings),
    pseed{mi}0 AS (
        SELECT vec_id AS sid, sv AS cvec,
               {oracle_hash64("CAST(vec_id AS VARCHAR)", f"pq{mi}:")} AS h
        FROM psub{mi} ORDER BY h, sid LIMIT {k}
    ),
    pseed{mi} AS (
        SELECT CAST(row_number() OVER (ORDER BY h, sid) AS INT) - 1 AS code,
               cvec
        FROM pseed{mi}0
    ),
    passign{mi} AS (
        SELECT e.vec_id, e.sv, s.code,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_sql_sq_l2('e.sv', 's.cvec')} ASC, s.code
               ) AS rn
        FROM psub{mi} e CROSS JOIN pseed{mi} s
    ),
    pmember{mi} AS (SELECT vec_id, sv, code FROM passign{mi} WHERE rn = 1),
    pdims{mi} AS (
        SELECT code,
               unnest(range(1, len(sv) + 1)) AS pos,
               unnest(sv) AS val
        FROM pmember{mi}
    ),
    pperdim{mi} AS (
        SELECT code, CAST(pos AS INT) AS pos,
               CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 1000000.0) AS BIGINT))
                    AS DOUBLE) / 1000000.0 / count(*) AS cmean,
               count(*) AS n_members
        FROM pdims{mi} GROUP BY 1, 2
    ),
    pcents{mi} AS (
        SELECT code, list(cmean ORDER BY pos) AS cvec,
               any_value(n_members) AS n_members
        FROM pperdim{mi} GROUP BY 1
    )""")
    parts.append(
        "\n    pbookdims AS ("
        + "\n        UNION ALL ".join(
            f"SELECT {mi} AS m, code, pos, cmean, n_members FROM pperdim{mi}"
            for mi in range(m)
        )
        + ")"
    )
    return ",".join(parts)


_PQ_CTE = _pq_cte()


@register(
    "a9_pq_codebooks",
    oracle=f"""
    WITH {_PQ_CTE}
    SELECT m, code, pos,
           CAST(floor(cmean * 1000000.0) AS BIGINT) AS cmean_q6,
           n_members
    FROM pbookdims
    """,
)
def a9_pq_codebooks(spark, sf_dir):
    """PQ training parity: every codeword dimension of every subspace
    matches the SQL replay of the same deterministic pipeline (hash
    seeds, min-L2 assignment with code-ascending ties, floor-quantized
    integer means). Display is the floor-quantized integer mean, not
    round(x, 6): the underlying doubles are bit-identical across engines,
    but the engines' ROUND implementations disagree on exact half-way
    values (observed once in 1024 dims), while floor of an identical
    double is deterministic."""
    from debezium_spark.analytics.vectors import pq_train

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_train(emb, m=_PQ_M, k=_PQ_K, dim=_PQ_M * _PQ_S)
    return books.select(
        "m", "code", "n_members", F.posexplode("cvec").alias("pos0", "cmean")
    ).select(
        "m", "code",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.floor(F.col("cmean") * F.lit(1000000.0)).cast("long").alias("cmean_q6"),
        "n_members",
    )


def _pq_search_cte(m: int = _PQ_M) -> str:
    codes = []
    for mi in range(m):
        codes.append(f"""
    pcode{mi} AS (
        SELECT e.vec_id, s.code,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_sql_sq_l2('e.sv', 's.cvec')} ASC, s.code
               ) AS rn
        FROM psub{mi} e CROSS JOIN pcents{mi} s
    ),
    pc{mi} AS (SELECT vec_id, code FROM pcode{mi} WHERE rn = 1)""")
    joins = " ".join(
        f"JOIN pc{mi} c{mi} USING (vec_id)" for mi in range(1, m)
    )
    books = " ".join(
        f"JOIN pcents{mi} b{mi} ON b{mi}.code = c{mi}.code"
        for mi in range(m)
    )
    concat = " || ".join(f"b{mi}.cvec" for mi in range(m))
    return (
        ",".join(codes)
        + f""",
    precon AS (
        SELECT c0.vec_id, {concat} AS rvec
        FROM pc0 c0 {joins} {books}
    )"""
    )


@register(
    "a10_pq_search",
    oracle=f"""
    WITH {_PQ_CTE},{_pq_search_cte()},
    ascored AS (
        SELECT q.vec_id AS qid, q.embedding AS qvec, r.vec_id AS nid,
               {_cosine('q.embedding', 'r.rvec')} AS asim
        FROM embeddings q JOIN precon r ON r.vec_id <> q.vec_id
        WHERE q.{_QFILTER}
    ),
    cands AS (
        SELECT qid, qvec, nid,
               row_number() OVER (PARTITION BY qid ORDER BY asim DESC, nid)
                   AS r1
        FROM ascored
    ),
    rer AS (
        SELECT c.qid, c.nid, {_cosine('c.qvec', 'e.embedding')} AS sim
        FROM cands c JOIN embeddings e ON e.vec_id = c.nid
        WHERE c.r1 <= {_PQ_RERANK}
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                   AS rank
        FROM rer
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 5
    """,
)
def a10_pq_search(spark, sf_dir):
    """PQ candidate generation + exact rerank — the production ADC
    pipeline: the corpus-wide scan touches only 32-bit codes (the
    memory-shrunk pass a 100 TB ANN runs inside IVF cells), each query's
    top-50 by reconstruction score fetch their exact vectors, and the
    final top-5 ranks by exact cosine. Recall@5 vs brute force: 0.34
    ADC-only → ~0.78 with the rerank (quality floor locked in
    tests/test_ann_quality.py)."""
    from debezium_spark.analytics.vectors import knn_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    return knn_pq(emb, queries, k=5, m=_PQ_M, n_codes=_PQ_K,
                  dim=_PQ_M * _PQ_S, rerank=_PQ_RERANK)


# ---------------------------------------------------------------------------
# A11 — the composed production ANN: IVF routing + PQ codes + exact rerank
# ---------------------------------------------------------------------------
@register(
    "a11_ivfpq_search",
    oracle=f"""
    WITH {_IVF_CTE},{_PQ_CTE},{_pq_search_cte()},
    corp AS (
        SELECT e.vec_id AS nid, s.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cosine('e.embedding', 's.cvec')} DESC, s.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cents s
    ),
    probes AS (
        SELECT e.vec_id AS qid, e.embedding AS qvec, s.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cosine('e.embedding', 's.cvec')} DESC, s.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cents s
        WHERE e.{_QFILTER}
    ),
    ascored AS (
        SELECT p.qid, p.qvec, c.nid,
               {_cosine('p.qvec', 'r.rvec')} AS asim
        FROM corp c
        JOIN probes p USING (cell)
        JOIN precon r ON r.vec_id = c.nid
        WHERE c.rn = 1 AND p.rn <= 2 AND c.nid <> p.qid
    ),
    cands AS (
        SELECT qid, qvec, nid,
               row_number() OVER (PARTITION BY qid ORDER BY asim DESC, nid)
                   AS r1
        FROM ascored
    ),
    rer AS (
        SELECT c.qid, c.nid, {_cosine('c.qvec', 'e.embedding')} AS sim
        FROM cands c JOIN embeddings e ON e.vec_id = c.nid
        WHERE c.r1 <= {_PQ_RERANK}
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                   AS rank
        FROM rer
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 5
    """,
)
def a11_ivfpq_search(spark, sf_dir):
    """The composed production ANN — IVF routes each query to its 2 nearest
    of 8 cells (the candidate scan touches ~1/4 of the corpus), PQ scores
    those candidates through their 32-bit codes (the scan reads codes, not
    vectors), and the top-50 per query rerank by exact cosine. Both
    trainings are the deterministic portable pipelines, so this oracle
    replays the ENTIRE composed index — routing, quantization, rerank —
    bit-for-bit."""
    from debezium_spark.analytics.vectors import knn_ivfpq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    return knn_ivfpq(
        emb, queries, k=5, n_cells=8, nprobe=2, iterations=_IVF_ITERS,
        m=_PQ_M, n_codes=_PQ_K, dim=_PQ_M * _PQ_S, rerank=_PQ_RERANK,
    )


# ---------------------------------------------------------------------------
# A12/A13 — sparse-vector similarity (SparseDoubleVector made computable:
# struct-level cosine + inverted-index kNN, no densification anywhere)
# ---------------------------------------------------------------------------
_SPARSE_DIMS = 1024


def _sparse_prelude() -> str:
    from debezium_spark.analytics.sparse import oracle_sparse_tf_cte

    return "WITH " + oracle_sparse_tf_cte(dims=_SPARSE_DIMS)



def _sv_index(spark, sf_dir):
    """documents -> sparse TF index, materialized ONCE (eager
    localCheckpoint): every sparse query fans the sv relation into several
    plan branches (postings, norms, query postings, query norms — a15 uses
    eight), and without a barrier each branch re-runs the whole
    tokenize+aggregate lineage. Production persists this inverted index to
    parquet (the x18 posting shape); the checkpoint is the in-session
    equivalent. Measured at sf0.1: a13 2.9 s -> ~0.8 s."""
    from debezium_spark.analytics.sparse import sparse_tf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sparse_tf(docs, dims=_SPARSE_DIMS).localCheckpoint(eager=True)


@register(
    "a12_sparse_cosine",
    oracle=_sparse_prelude()
    + """,
    q AS (
        SELECT idx, val FROM tf
        WHERE doc_id = (SELECT min(doc_id) FROM documents)
    ),
    dots AS (
        SELECT d.doc_id, sum(d.val * q.val) AS dot
        FROM tf d JOIN q ON d.idx = q.idx
        GROUP BY 1
    ),
    norms AS (
        SELECT doc_id, sqrt(sum(val * val)) AS nrm FROM tf GROUP BY 1
    ),
    qn AS (SELECT sqrt(sum(val * val)) AS nrm FROM q)
    SELECT n.doc_id,
           CAST(floor(coalesce(d.dot, 0.0) / (n.nrm * qn.nrm) * 1e6)
                AS BIGINT) AS cos_q
    FROM norms n LEFT JOIN dots d USING (doc_id) CROSS JOIN qn
    """,
)
def a12_sparse_cosine(spark, sf_dir):
    """Struct-level sparse cosine: every document's TF vector (the
    SparseDoubleVector struct — {dimensions, indices[], values[]},
    1-based ascending indices) scored against one query vector via
    map-lookup dot + fold norms, never densified. TF values are integer
    counts, so dots and norms are EXACT (order-independent) and the
    floor-quantized cosine hashes bit-identically against the relational
    replay. The query vector (the min-doc_id document) broadcasts as one
    row."""
    from debezium_spark.analytics.sparse import sparse_cosine

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sv = _sv_index(spark, sf_dir)
    qid = docs.agg(F.min("doc_id")).collect()[0][0]
    q = sv.filter(F.col("doc_id") == qid).select(F.col("sv").alias("qv"))
    return (
        sv.crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            F.floor(sparse_cosine(F.col("sv"), F.col("qv")) * 1e6)
            .cast("long")
            .alias("cos_q"),
        )
    )


@register(
    "a13_knn_sparse",
    oracle=_sparse_prelude()
    + """,
    q AS (SELECT * FROM tf WHERE doc_id % 100 = 0),
    dots AS (
        SELECT q.doc_id AS qid, d.doc_id, sum(q.val * d.val) AS dot
        FROM q JOIN tf d ON q.idx = d.idx
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT doc_id, sqrt(sum(val * val)) AS nrm FROM tf GROUP BY 1
    ),
    scored AS (
        SELECT dots.qid, dots.doc_id,
               dots.dot / (dn.nrm * qn.nrm) AS cos
        FROM dots
        JOIN norms dn ON dn.doc_id = dots.doc_id
        JOIN norms qn ON qn.doc_id = dots.qid
    ),
    ranked AS (
        SELECT qid, doc_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id)
                   AS rank
        FROM scored
    )
    SELECT qid, doc_id, CAST(rank AS INT) AS rank,
           CAST(floor(cos * 1e6) AS BIGINT) AS cos_q
    FROM ranked WHERE rank <= 10
    """,
)
def a13_knn_sparse(spark, sf_dir):
    """Sparse retrieval over an inverted-index posting join (the x18
    posting shape doing actual search): both sides explode to (id, idx,
    val) rows, the equi-join on the hashed-vocabulary index computes dot
    products only where coordinates overlap — never all-pairs, never a
    dense detour — and a per-query window ranks cosine top-10. Exact
    integer TF arithmetic makes the DuckDB replay bit-identical."""
    from debezium_spark.analytics.sparse import knn_sparse

    sv = _sv_index(spark, sf_dir)
    queries = sv.filter(F.col("doc_id") % 100 == 0)
    out = knn_sparse(sv, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "a14_bm25_rank",
    oracle=_sparse_prelude()
    + """,
    dl AS (SELECT doc_id, sum(val) AS dl FROM tf GROUP BY 1),
    stats AS (
        SELECT count(*) AS n,
               sum(dl) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl
    ),
    dfreq AS (SELECT idx, count(*) AS df FROM tf GROUP BY 1),
    q AS (
        SELECT DISTINCT doc_id AS qid, idx FROM tf WHERE doc_id % 100 = 0
    ),
    terms AS (
        SELECT q.qid, d.doc_id,
               CAST(floor(
                   (((n - df + CAST(0.5 AS DOUBLE))
                     / (df + CAST(0.5 AS DOUBLE)))
                    * ((val * CAST(2.2 AS DOUBLE))
                       / (val + CAST(1.2 AS DOUBLE)
                          * (CAST(0.25 AS DOUBLE)
                             + CAST(0.75 AS DOUBLE) * (dl.dl / avgdl)))))
                   * CAST(1000000.0 AS DOUBLE)
               ) AS BIGINT) AS s
        FROM q
        JOIN tf d ON q.idx = d.idx
        JOIN dfreq ON dfreq.idx = d.idx
        JOIN dl ON dl.doc_id = d.doc_id
        CROSS JOIN stats
    ),
    scored AS (
        -- CAST: DuckDB sum(BIGINT) widens to HUGEINT, which pandas
        -- renders as float64 — the checked column must stay integral
        SELECT qid, doc_id, CAST(sum(s) AS BIGINT) AS score_q
        FROM terms GROUP BY 1, 2
    ),
    ranked AS (
        SELECT qid, doc_id, score_q,
               row_number() OVER (
                   PARTITION BY qid ORDER BY score_q DESC, doc_id
               ) AS rank
        FROM scored
    )
    SELECT qid, doc_id, CAST(rank AS INT) AS rank, score_q
    FROM ranked WHERE rank <= 10
    """,
)
def a14_bm25_rank(spark, sf_dir):
    """BM25 lexical retrieval over the inverted index (the scoring
    production search engines pair with the a13 cosine leg): rational-idf
    term scores floor-quantized PER TERM then summed as integers, so the
    result is aggregation-order-independent and the relational replay
    hashes bit-identically — the per-term arithmetic is identically
    parenthesized IEEE +,-,*,/ on both engines (no libm log in the
    checked output; log1p is a documented monotone drop-in). Corpus
    stats (df table ≤ vocab dims, N/avgdl one row) broadcast."""
    from debezium_spark.analytics.sparse import bm25_rank

    sv = _sv_index(spark, sf_dir)
    queries = sv.filter(F.col("doc_id") % 100 == 0)
    out = bm25_rank(sv, queries, k=10)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "a15_rrf_fusion",
    oracle=_sparse_prelude()
    + """,
    q AS (SELECT * FROM tf WHERE doc_id % 100 = 0),
    cdots AS (
        SELECT q.doc_id AS qid, d.doc_id, sum(q.val * d.val) AS dot
        FROM q JOIN tf d ON q.idx = d.idx
        GROUP BY 1, 2
    ),
    norms AS (
        SELECT doc_id, sqrt(sum(val * val)) AS nrm FROM tf GROUP BY 1
    ),
    cranked AS (
        SELECT cdots.qid, cdots.doc_id,
               row_number() OVER (
                   PARTITION BY cdots.qid
                   ORDER BY cdots.dot / (dn.nrm * qn.nrm) DESC, cdots.doc_id
               ) AS rank
        FROM cdots
        JOIN norms dn ON dn.doc_id = cdots.doc_id
        JOIN norms qn ON qn.doc_id = cdots.qid
    ),
    dl AS (SELECT doc_id, sum(val) AS dl FROM tf GROUP BY 1),
    stats AS (
        SELECT count(*) AS n,
               sum(dl) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl
    ),
    dfreq AS (SELECT idx, count(*) AS df FROM tf GROUP BY 1),
    qt AS (
        SELECT DISTINCT doc_id AS qid, idx FROM tf WHERE doc_id % 100 = 0
    ),
    terms AS (
        SELECT qt.qid, d.doc_id,
               CAST(floor(
                   (((n - df + CAST(0.5 AS DOUBLE))
                     / (df + CAST(0.5 AS DOUBLE)))
                    * ((val * CAST(2.2 AS DOUBLE))
                       / (val + CAST(1.2 AS DOUBLE)
                          * (CAST(0.25 AS DOUBLE)
                             + CAST(0.75 AS DOUBLE) * (dl.dl / avgdl)))))
                   * CAST(1000000.0 AS DOUBLE)
               ) AS BIGINT) AS s
        FROM qt
        JOIN tf d ON qt.idx = d.idx
        JOIN dfreq ON dfreq.idx = d.idx
        JOIN dl ON dl.doc_id = d.doc_id
        CROSS JOIN stats
    ),
    bscored AS (
        SELECT qid, doc_id, sum(s) AS score_q FROM terms GROUP BY 1, 2
    ),
    branked AS (
        SELECT qid, doc_id,
               row_number() OVER (
                   PARTITION BY qid ORDER BY score_q DESC, doc_id
               ) AS rank
        FROM bscored
    ),
    fused AS (
        SELECT qid, doc_id,
               CAST(sum(1000000000 // (60 + rank)) AS BIGINT) AS rrf_q
        FROM (
            SELECT qid, doc_id, rank FROM cranked WHERE rank <= 10
            UNION ALL
            SELECT qid, doc_id, rank FROM branked WHERE rank <= 10
        )
        GROUP BY 1, 2
    )
    SELECT qid, doc_id, CAST(rank AS INT) AS rank, rrf_q FROM (
        SELECT qid, doc_id, rrf_q,
               row_number() OVER (
                   PARTITION BY qid ORDER BY rrf_q DESC, doc_id
               ) AS rank
        FROM fused
    ) WHERE rank <= 10
    """,
)
def a15_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval: the a13 cosine leg and the a14 BM25 leg fused by
    reciprocal-rank fusion (Cormack et al. 2009) — rank-only combination,
    so the incommensurable score scales never meet. Contributions are
    integer quotients (scale div (k0+rank)) summed as BIGINTs: zero float
    arithmetic in the fusion, bit-identical relational replay by
    construction. Both legs reuse the inverted-index posting join; the
    fusion itself aggregates two already-top-k relations — tiny at any
    corpus scale."""
    from debezium_spark.analytics.sparse import (
        bm25_rank,
        knn_sparse,
        rrf_fuse,
    )

    sv = _sv_index(spark, sf_dir)
    queries = sv.filter(F.col("doc_id") % 100 == 0)
    cos_leg = knn_sparse(sv, queries, k=10)
    bm_leg = bm25_rank(sv, queries, k=10)
    return rrf_fuse([cos_leg, bm_leg], k=10)


@register(
    "a16_semdedup",
    oracle=f"""
    WITH {_IVF_CTE},
    massign AS (
        SELECT e.vec_id, e.embedding, s.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cosine('e.embedding', 's.cvec')} DESC, s.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cents s
    ),
    member AS (SELECT vec_id, embedding, cell FROM massign WHERE rn = 1),
    dups AS (
        SELECT DISTINCT b.vec_id
        FROM member a JOIN member b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE {_cosine('a.embedding', 'b.embedding')} >= 0.3
    )
    SELECT m.vec_id, m.cell, (d.vec_id IS NOT NULL) AS is_dup
    FROM member m LEFT JOIN dups d ON d.vec_id = m.vec_id
    """,
)
def a16_semdedup(spark, sf_dir):
    """SemDeDup (cluster-pruned semantic dedup, Abbas et al. 2023): the
    shared IVF k-means training (bit-identical to the a7 oracle CTEs),
    map-side nearest-cell assignment, then pairwise cosine WITHIN cells
    only — a vector is a duplicate when a smaller-id cell-mate sits at
    cosine ≥ τ. τ=0.3 here so the synthetic fixtures actually contain
    duplicate pairs; production default is the paper-like 0.95."""
    from debezium_spark.analytics.vectors import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup(
        emb, n_cells=8, iterations=_IVF_ITERS, threshold=0.3
    )


# ---------------------------------------------------------------------------
# A17 — cluster-balanced coreset sampling (diversity-aware selection)
# ---------------------------------------------------------------------------
from debezium_spark.analytics.text import oracle_hash64  # noqa: E402

_CBS_HASH = oracle_hash64("CAST(vec_id AS VARCHAR)", "cbs:")


@register(
    "a17_cluster_balanced_sample",
    oracle=f"""
    WITH {_IVF_CTE},
    assign AS (
        SELECT e.vec_id, s.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_cosine('e.embedding', 's.cvec')} DESC, s.cell
               ) AS rn
        FROM embeddings e CROSS JOIN cents s
    ),
    routed AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
    rk AS (
        SELECT vec_id, cell,
               row_number() OVER (
                   PARTITION BY cell ORDER BY {_CBS_HASH}, vec_id
               ) AS rk
        FROM routed
    )
    SELECT vec_id, CAST(cell AS INT) AS cell FROM rk WHERE rk <= 25
    """,
)
def a17_cluster_balanced_sample(spark, sf_dir):
    """Diversity-balanced coreset: nearest-centroid routing (map-side
    literal argmax, zero shuffle) + at most 25 vectors per cell in
    portable-hash order — one cell-key shuffle; a mega-cluster of
    near-identical content contributes exactly 25 no matter its size.
    SemDeDup (a16) prunes near-twins; this caps whole regions."""
    from debezium_spark.analytics.vectors import (
        cluster_balanced_sample,
        ivf_train,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_train(emb, n_cells=8, iterations=_IVF_ITERS)
    return cluster_balanced_sample(emb, cents, per_cell=25)


# ---------------------------------------------------------------------------
# A18 — MMR diversified rerank (greedy relevance/diversity selection)
# ---------------------------------------------------------------------------
def _mmr_oracle(n_cand: int = 10, k: int = 5) -> str:
    """Unrolled greedy MMR in ANSI SQL: stage t anti-joins the already-
    selected set, takes max pair-cosine to it, and argmaxes the MMR score.
    Mechanical unrolling keeps DuckDB exact — no recursion extension
    needed; every float op mirrors the engine bit-for-bit."""
    lam = "CAST(0.7 AS DOUBLE)"
    om = f"(CAST(1 AS DOUBLE) - {lam})"
    parts = [
        f"""q AS (
        SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE {_QFILTER}
    ),
    scored AS (
        SELECT q.qid, c.vec_id AS nid,
               {_cosine('q.qvec', 'c.embedding')} AS sim
        FROM embeddings c CROSS JOIN q
        WHERE c.vec_id <> q.qid
    ),
    cand AS (
        SELECT qid, nid, round(sim, 6) AS sim
        FROM (SELECT qid, nid, sim,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY sim DESC, nid) AS rank
              FROM scored)
        WHERE rank <= {n_cand}
    ),
    psim AS (
        SELECT a.qid, a.nid AS a, b.nid AS b,
               {_cosine('ea.embedding', 'eb.embedding')} AS ps
        FROM cand a
        JOIN cand b ON a.qid = b.qid AND a.nid < b.nid
        JOIN embeddings ea ON ea.vec_id = a.nid
        JOIN embeddings eb ON eb.vec_id = b.nid
    ),
    sel1 AS (
        SELECT qid, nid, 1 AS rank, {lam} * sim AS score
        FROM cand
        QUALIFY row_number() OVER (PARTITION BY qid
                                   ORDER BY {lam} * sim DESC, nid) = 1
    ),
    selall1 AS (SELECT * FROM sel1)"""
    ]
    for t in range(2, k + 1):
        parts.append(f"""rem{t} AS (
        SELECT c.* FROM cand c
        ANTI JOIN selall{t - 1} s ON c.qid = s.qid AND c.nid = s.nid
    ),
    ms{t} AS (
        SELECT r.qid, r.nid, r.sim, max(p.ps) AS maxsim
        FROM rem{t} r
        JOIN selall{t - 1} s ON s.qid = r.qid
        JOIN psim p ON p.qid = r.qid
                   AND p.a = least(r.nid, s.nid)
                   AND p.b = greatest(r.nid, s.nid)
        GROUP BY r.qid, r.nid, r.sim
    ),
    sel{t} AS (
        SELECT qid, nid, {t} AS rank,
               {lam} * sim - {om} * maxsim AS score
        FROM ms{t}
        QUALIFY row_number() OVER (
            PARTITION BY qid
            ORDER BY {lam} * sim - {om} * maxsim DESC, nid) = 1
    ),
    selall{t} AS (SELECT * FROM selall{t - 1} UNION ALL SELECT * FROM sel{t})""")
    body = ",\n    ".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT qid, nid, CAST(rank AS INT) AS rank,"
        f" round(score, 6) AS mmr FROM selall{k}"
    )


@register("a18_mmr_rerank", oracle=_mmr_oracle())
def a18_mmr_rerank(spark, sf_dir):
    """Diversity-aware retrieval: exact top-10 kNN, then greedy MMR keeps 5
    per query (λ=0.7). Pairwise candidate cosines come from the same
    expression fold as every cosine here (bit-identical to the oracle);
    the greedy loop is pure control flow in one cogrouped applyInPandas —
    per-query cost N², never corpus-sized, queries rerank in parallel."""
    from debezium_spark.analytics.vectors import knn_bruteforce, mmr_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    cands = knn_bruteforce(emb, queries, k=10).join(
        emb.select(
            F.col("vec_id").alias("nid"), F.col("embedding").alias("nvec")
        ),
        "nid",
    )
    return mmr_rerank(cands, k=5, lam=0.7)


# ---------------------------------------------------------------------------
# A19 — scalar quantization (SQ8): uniform 8-bit codec + asymmetric search
# ---------------------------------------------------------------------------
_SQ8_RERANK = 30


@register(
    "a19_sq8_search",
    oracle=f"""
    WITH sdims0 AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
               unnest(embedding) AS v0
        FROM embeddings
    ),
    sdims AS (SELECT vec_id, pos, CAST(v0 AS DOUBLE) AS v FROM sdims0),
    sbounds AS (
        SELECT pos, min(v) AS mn, (max(v) - min(v)) / 256.0 AS delta
        FROM sdims GROUP BY pos
    ),
    srecon_e AS (
        SELECT d.vec_id, d.pos,
               CASE WHEN b.delta = 0 THEN b.mn
                    ELSE b.mn + (least(255.0, greatest(0.0,
                             floor((d.v - b.mn) / b.delta))) + 0.5) * b.delta
               END AS rv
        FROM sdims d JOIN sbounds b USING (pos)
    ),
    srecon AS (
        SELECT vec_id, list(rv ORDER BY pos) AS rvec
        FROM srecon_e GROUP BY vec_id
    ),
    ascored AS (
        SELECT q.vec_id AS qid, q.embedding AS qvec, r.vec_id AS nid,
               {_cosine('q.embedding', 'r.rvec')} AS asim
        FROM embeddings q JOIN srecon r ON r.vec_id <> q.vec_id
        WHERE q.{_QFILTER}
    ),
    cands AS (
        SELECT qid, qvec, nid,
               row_number() OVER (PARTITION BY qid ORDER BY asim DESC, nid)
                   AS r1
        FROM ascored
    ),
    rer AS (
        SELECT c.qid, c.nid, {_cosine('c.qvec', 'e.embedding')} AS sim
        FROM cands c JOIN embeddings e ON e.vec_id = c.nid
        WHERE c.r1 <= {_SQ8_RERANK}
    ),
    ranked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                   AS rank
        FROM rer
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 5
    """,
)
def a19_sq8_search(spark, sf_dir):
    """Scalar-quantized ANN — the 8-bit point on the compression curve:
    per-dim uniform bounds from one dim-keyed agg (64 rows however big
    the corpus), codes at 1 byte/dim (8x vs float64, decode is an FMA
    not a codebook gather), asymmetric cosine against bucket-midpoint
    reconstructions generates top-30 candidates, exact rerank keeps 5.
    The whole index (2*dim doubles) rides the plan as literals — no
    codebook join at all. Recall floor vs brute force locked in
    tests/test_ann_quality.py."""
    from debezium_spark.analytics.vectors import knn_sq8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    return knn_sq8(emb, queries, k=5, rerank=_SQ8_RERANK)


# ---------------------------------------------------------------------------
# A20 — binary (1-bit) quantization ANN: Hamming candidates + exact rerank
# ---------------------------------------------------------------------------
_BINQ_RERANK = 30


@register(
    "a20_binary_quant_search",
    oracle=f"""
    WITH bdims0 AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
               unnest(embedding) AS v0
        FROM embeddings
    ),
    bdims AS (SELECT vec_id, pos, CAST(v0 AS DOUBLE) AS v FROM bdims0),
    bthr AS (
        SELECT pos, (min(v) + max(v)) / 2.0 AS thr FROM bdims GROUP BY pos
    ),
    bsign AS (
        SELECT d.vec_id, d.pos,
               CASE WHEN d.v > t.thr THEN 1 ELSE 0 END AS s
        FROM bdims d JOIN bthr t USING (pos)
    ),
    bham AS (
        SELECT q.vec_id AS qid, n.vec_id AS nid,
               SUM(CASE WHEN q.s <> n.s THEN 1 ELSE 0 END) AS ham
        FROM bsign q
        JOIN bsign n ON n.pos = q.pos AND n.vec_id <> q.vec_id
        WHERE q.{_QFILTER}
        GROUP BY 1, 2
    ),
    bcands AS (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY ham, nid) AS r1
        FROM bham
    ),
    brer AS (
        SELECT c.qid, c.nid,
               {_cosine('qe.embedding', 'e.embedding')} AS sim
        FROM bcands c
        JOIN embeddings qe ON qe.vec_id = c.qid
        JOIN embeddings e ON e.vec_id = c.nid
        WHERE c.r1 <= {_BINQ_RERANK}
    ),
    branked AS (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid)
                   AS rank
        FROM brer
    )
    SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim
    FROM branked WHERE rank <= 5
    """,
)
def a20_binary_quant_search(spark, sf_dir):
    """1-bit ANN — the far end of the compression curve: per-dim midrange
    thresholds (midrange, not mean: extrema replay exactly in any
    engine), sign bits packed 64-per-long (a 64-dim float64 vector
    becomes ONE 8-byte word — 64x), symmetric Hamming scoring via
    XOR+popcount, exact cosine rerank of the top-30. At a billion
    vectors the index is 8 GB and candidate generation is one popcount
    per comparison — this is the tier that makes exhaustive first-pass
    scans affordable when even SQ8 codes don't fit memory. Recall floor
    vs brute force locked in tests/test_ann_quality.py."""
    from debezium_spark.analytics.vectors import knn_binary

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.expr(_QFILTER))
    return knn_binary(emb, queries, k=5, rerank=_BINQ_RERANK)
