"""Text-pipeline correctness queries over documents.parquet.

Each query pairs an analytics.text operator with a DuckDB oracle that
recomputes the same md5-portable hashes / fold reductions, so the value-hash
compare is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.analytics.text import (
    LANG_MARKERS,
    exact_dedup,
    language_id,
    lsh_candidate_pairs,
    minhash_signature,
    near_dup_pairs,
    simhash,
    text_stats,
    tokenize,
    word_ngrams,
)
from debezium_spark.suite import register

# ---------------------------------------------------------------------------
# Shared oracle fragments (DuckDB SQL twins of analytics/text.py helpers)
# ---------------------------------------------------------------------------
_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _ohash(expr: str, seed: str = "") -> str:
    payload = f"'{seed}' || {expr}" if seed else expr
    return f"CAST(('0x' || substr(md5({payload}), 1, 15)) AS BIGINT)"


_SHINGLES = (
    f"list_transform(generate_series(1, greatest(1, length({_NORM}) - 4)),"
    f" i -> substr({_NORM}, i, 5))"
)

# Per-doc minhash signature CTE: doc_id, mh0..mh7. Generated from the SAME
# constants as analytics.text.minhash_signature (single source of truth):
# polynomial base hash over char codes, then 2-universal affine maps — pure
# BIGINT arithmetic, bit-identical across engines.
from debezium_spark.analytics.text import (  # noqa: E402
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME as _P,
    SHINGLE_POLY_BASE as _PB,
)

_POWS = [_PB ** (5 - 1 - i) % _P for i in range(5)]
_BASE_EXPR = (
    "("
    + " + ".join(
        f"CAST(ord(substr(norm, p + {i}, 1)) AS BIGINT) * {_POWS[i]}"
        for i in range(5)
    )
    + f") % {_P}"
)
_MH_COLS = ",\n           ".join(
    f"list_aggregate(list_transform(bases, b -> ({MINHASH_A[j]} * b + {MINHASH_B[j]}) % {_P}), 'min') AS mh{j}"
    for j in range(8)
)
_SIG_CTE = f"""
sig AS (
    SELECT doc_id,
           {_MH_COLS}
    FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(1, length(norm) - 4)),
                   p -> {_BASE_EXPR})) AS bases
        FROM (SELECT doc_id, {_NORM} AS norm FROM documents)
    )
)"""

# Band keys (4 bands × 2 rows): md5('mh_lo-mh_hi').
_BANDS_CTE = (
    "bands AS (\n"
    + "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band,"
        f" md5(CAST(mh{2 * b} AS VARCHAR) || '-' || CAST(mh{2 * b + 1} AS VARCHAR)) AS bkey"
        f" FROM sig"
        for b in range(4)
    )
    + "\n)"
)

_PAIRS_SQL = """
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM bands l JOIN bands r
  ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
"""


# ---------------------------------------------------------------------------
# X1 — per-document text statistics (quality-filter features)
# ---------------------------------------------------------------------------
@register(
    "x1_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           list_aggregate(list_transform({_TOKS}, t -> length(t)), 'sum')::BIGINT AS sum_token_chars,
           length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))::BIGINT AS n_punct,
           list_aggregate(list_transform({_TOKS},
               t -> CASE WHEN t IN ('the','a','and','of','to','is','in','that')
                    THEN 1 ELSE 0 END), 'sum')::BIGINT AS n_stopwords
    FROM documents
    """,
)
def x1_text_stats(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_stats(docs)


# ---------------------------------------------------------------------------
# X2 — language identification (stopword-marker heuristic)
# ---------------------------------------------------------------------------
def _score_sql(markers: tuple[str, ...]) -> str:
    inlist = ",".join(f"'{m}'" for m in markers)
    return (
        f"list_aggregate(list_transform({_TOKS},"
        f" t -> CASE WHEN t IN ({inlist}) THEN 1 ELSE 0 END), 'sum')"
    )


_LANG_SCORES = ",\n           ".join(
    f"{_score_sql(m)}::BIGINT AS score_{l}" for l, m in LANG_MARKERS
)
_BEST = "greatest(" + ", ".join(f"score_{l}" for l, _ in LANG_MARKERS) + ")"
_PRED = (
    "CASE WHEN " + _BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{l} = {_BEST} THEN '{l}'" for l, _ in LANG_MARKERS
    )
    + " END"
)


@register(
    "x2_language_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
           {_LANG_SCORES}
        FROM documents
    )
    SELECT doc_id, score_en, score_de, score_fr, score_es, score_zh,
           {_PRED} AS lang_pred
    FROM scored
    """,
)
def x2_language_id(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(docs)


# ---------------------------------------------------------------------------
# X3 — BPE-ish token counting
# ---------------------------------------------------------------------------
@register(
    "x3_token_count",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS n_bpe_tokens
    FROM documents
    """,
)
def x3_token_count(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# X4 — exact dedup via content fingerprint
# ---------------------------------------------------------------------------
@register(
    "x4_exact_dedup",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, {_ohash(_NORM, "fp:")} AS fp FROM documents
    )
    SELECT min(doc_id) AS doc_id, fp, count(*) AS n_copies
    FROM fp GROUP BY fp
    """,
)
def x4_exact_dedup(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(docs)


# ---------------------------------------------------------------------------
# X5 — MinHash signatures (the no-shuffle per-doc computation)
# ---------------------------------------------------------------------------
@register(
    "x5_minhash_signature",
    oracle=f"WITH {_SIG_CTE}\nSELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7 FROM sig",
)
def x5_minhash_signature(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = minhash_signature(docs)
    return sig.select("doc_id", *[f"mh{j}" for j in range(8)])


# ---------------------------------------------------------------------------
# X6 — banded-LSH near-dup candidate pairs (bucket join, no all-pairs)
# ---------------------------------------------------------------------------
@register(
    "x6_lsh_candidates",
    oracle=f"WITH {_SIG_CTE}, {_BANDS_CTE}\n{_PAIRS_SQL}",
)
def x6_lsh_candidates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lsh_candidate_pairs(docs)


# ---------------------------------------------------------------------------
# X7 — near-dup pairs verified by true shingle Jaccard
# ---------------------------------------------------------------------------
@register(
    "x7_near_dup_jaccard",
    oracle=f"""
    WITH {_SIG_CTE}, {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    sets AS (SELECT doc_id, list_distinct({_SHINGLES}) AS sset FROM documents)
    SELECT p.a, p.b,
           round(CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE),
                 4) AS jaccard
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.a
    JOIN sets sb ON sb.doc_id = p.b
    WHERE round(CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE),
                4) >= 0.5
    """,
)
def x7_near_dup_jaccard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return near_dup_pairs(docs, threshold=0.5)


# ---------------------------------------------------------------------------
# X8 — SimHash document fingerprints
# ---------------------------------------------------------------------------
_SIMHASH_VOTES = " + ".join(
    f"""(CASE WHEN list_aggregate(list_transform(th,
        h -> CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
        THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)"""
    for j in range(16)
)


_TOKEN_HASH = (
    "(list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(generate_series(1, length(t)), "
    "i -> CAST(ord(substr(t, i, 1)) AS BIGINT))), "
    f"(acc, c) -> (acc * {_PB} + c) % {_P}) * 961748927 + 15485863) % {_P}"
)


@register(
    "x8_simhash",
    oracle=f"""
    WITH th AS (
        SELECT doc_id,
               list_transform({_TOKS}, t -> {_TOKEN_HASH}) AS th
        FROM documents
    )
    SELECT doc_id, {_SIMHASH_VOTES} AS simhash FROM th
    """,
)
def x8_simhash(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash(docs).select("doc_id", "simhash")


# ---------------------------------------------------------------------------
# X9 — composite quality filter (pre-training document gating)
# ---------------------------------------------------------------------------
@register(
    "x9_quality_filter",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(length(text) AS BIGINT) AS n_chars,
               list_aggregate(list_transform({_TOKS},
                   t -> CASE WHEN t IN ('the','a','and','of','to','is','in','that')
                        THEN 1 ELSE 0 END), 'sum')::BIGINT AS n_stop
        FROM documents
    )
    SELECT doc_id, n_tokens,
           round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS punct_ratio,
           round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio
    FROM s
    WHERE n_tokens >= 5 AND n_tokens <= 1000
      AND CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) < 0.2
    """,
)
def x9_quality_filter(spark, sf_dir):
    """Composite pre-training quality gate: token-count band + punctuation
    ceiling, emitting the gating features — the standard shape of a corpus
    filter stage (all codegen; the filter runs in the same scan pass)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = text_stats(docs)
    out = (
        s.withColumn(
            "punct_ratio",
            F.round(F.col("n_punct").cast("double")
                    / F.col("n_chars_calc").cast("double"), 6),
        )
        .withColumn(
            "stop_ratio",
            F.round(F.col("n_stopwords").cast("double")
                    / F.col("n_tokens").cast("double"), 6),
        )
        .filter(
            (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 1000)
            & (F.col("n_punct").cast("double")
               / F.col("n_chars_calc").cast("double") < 0.2)
        )
    )
    return out.select("doc_id", "n_tokens", "punct_ratio", "stop_ratio")


# ---------------------------------------------------------------------------
# X10 — word-n-gram Jaccard verification of LSH candidates
# ---------------------------------------------------------------------------
_WG = (
    f"list_transform(generate_series(1, greatest(1, len({_TOKS}) - 1)),"
    f" i -> {_TOKS}[i] || ' ' || {_TOKS}[i + 1])"
)


@register(
    "x10_word_ngram_jaccard",
    oracle=f"""
    WITH {_SIG_CTE}, {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    sets AS (SELECT doc_id, list_distinct({_WG}) AS wset FROM documents)
    SELECT p.a, p.b,
           round(CAST(len(list_intersect(sa.wset, sb.wset)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(sa.wset, sb.wset))) AS DOUBLE),
                 4) AS jaccard
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.a
    JOIN sets sb ON sb.doc_id = p.b
    WHERE round(CAST(len(list_intersect(sa.wset, sb.wset)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(sa.wset, sb.wset))) AS DOUBLE),
                4) >= 0.2
    """,
)
def x10_word_ngram_jaccard(spark, sf_dir):
    """n-gram-Jaccard near-dup at the WORD level: LSH candidates verified
    against distinct word-bigram sets (same bucket-join scale shape as x7,
    different dedup unit)."""
    from debezium_spark.analytics.text import word_ngrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = lsh_candidate_pairs(docs)
    sets_df = docs.select(
        "doc_id", F.array_distinct(word_ngrams(F.col("text"), 2)).alias("wset")
    )
    a, b = sets_df.alias("sa"), sets_df.alias("sb")
    joined = (
        cands.join(a, cands["a"] == F.col("sa.doc_id"))
        .join(b, cands["b"] == F.col("sb.doc_id"))
    )
    inter = F.size(F.array_intersect(F.col("sa.wset"), F.col("sb.wset")))
    union = F.size(F.array_union(F.col("sa.wset"), F.col("sb.wset")))
    jac = F.round(inter.cast("double") / union.cast("double"), 4)
    return joined.select("a", "b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.2
    )


# ---------------------------------------------------------------------------
# X11 — end-to-end corpus curation: quality gate → exact dedup → near-dedup
# ---------------------------------------------------------------------------
@register(
    "x11_corpus_pipeline",
    oracle=f"""
    WITH {_SIG_CTE}, {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    sets AS (SELECT doc_id, list_distinct({_SHINGLES}) AS sset FROM documents),
    near AS (
        SELECT p.b AS drop_id
        FROM pairs p
        JOIN sets sa ON sa.doc_id = p.a
        JOIN sets sb ON sb.doc_id = p.b
        WHERE CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)
              / CAST(len(list_distinct(list_concat(sa.sset, sb.sset))) AS DOUBLE)
              >= 0.5
    ),
    quality AS (
        SELECT doc_id FROM documents
        WHERE len({_TOKS}) BETWEEN 5 AND 1000
    ),
    exact AS (
        SELECT min(doc_id) AS doc_id
        FROM (SELECT doc_id, {_ohash(_NORM, "fp:")} AS fp FROM documents)
        WHERE doc_id IN (SELECT doc_id FROM quality)
        GROUP BY fp
    )
    SELECT doc_id FROM exact
    WHERE doc_id NOT IN (SELECT drop_id FROM near)
    """,
)
def x11_corpus_pipeline(spark, sf_dir):
    """The full training-corpus curation DAG in one plan: quality gate →
    exact dedup (keep lowest id per fingerprint) → near-dup removal (drop
    the higher id of each verified pair). Each stage is one of the already-
    verified operators; this query checks their COMPOSITION — the shape a
    real 100 TB curation job runs nightly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    quality = text_stats(docs).filter(
        (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 1000)
    ).select("doc_id")
    gated = docs.join(quality, "doc_id", "left_semi")

    kept_exact = exact_dedup(gated).select("doc_id")

    near = near_dup_pairs(docs, threshold=0.5).select(
        F.col("b").alias("doc_id")
    ).distinct()
    return kept_exact.join(near, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# X11 — token-window chunking (training-sample construction)
# ---------------------------------------------------------------------------
_CHUNK = 32


@register(
    "x11_chunk_documents",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks, CAST(len({_TOKS}) AS BIGINT) AS n
        FROM documents
    ),
    e AS (
        SELECT doc_id, toks, n,
               unnest(generate_series(1, CAST(ceil(n / {_CHUNK}.0) AS BIGINT))) AS i
        FROM t
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           array_to_string(list_slice(toks, (i - 1) * {_CHUNK} + 1,
                                      least(i * {_CHUNK}, n)), ' ') AS chunk_text,
           CAST(least(i * {_CHUNK}, n) - (i - 1) * {_CHUNK} AS BIGINT)
               AS n_chunk_tokens
    FROM e
    """,
)
def x11_chunk_documents(spark, sf_dir):
    """Fixed-token-window chunker: one narrow projection + an in-row
    sequence explode — no shuffle; chunk rows land in the same partition
    as their document, which is exactly what a downstream tokenize/pack
    stage wants."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokenize(F.col("text"))
    t = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    t = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.ceil(F.col("n") / F.lit(float(_CHUNK))).cast("int"))
        ).alias("chunk_id"),
    )
    chunk = F.slice(F.col("toks"), (F.col("chunk_id") - 1) * _CHUNK + 1, _CHUNK)
    return t.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        (
            F.least(F.col("chunk_id") * _CHUNK, F.col("n"))
            - (F.col("chunk_id") - 1) * _CHUNK
        )
        .cast("long")
        .alias("n_chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# X12 — deterministic train/val split (stratified audit by language)
# ---------------------------------------------------------------------------
@register(
    "x12_train_val_split",
    oracle=f"""
    WITH s AS (
        SELECT lang,
               CASE WHEN {_ohash("CAST(doc_id AS VARCHAR)", "split:")} % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    )
    SELECT lang, split, count(*) AS n_docs
    FROM s GROUP BY 1, 2
    """,
)
def x12_train_val_split(spark, sf_dir):
    """Hash-mod split: assignment is a pure per-row function of the stable
    id (reproducible across runs/engines, no sampling state), audited per
    language stratum. The 90/10 gate is the portable 60-bit hash, so the
    DuckDB oracle lands every doc in the same split."""
    from debezium_spark.analytics.text import portable_hash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split = F.when(
        portable_hash64(F.col("doc_id").cast("string"), seed="split:") % 100 < 90,
        "train",
    ).otherwise("val")
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# X13 — repetition ratio (Gopher-style duplicate-n-gram quality signal)
# ---------------------------------------------------------------------------
_WG2 = (
    f"list_transform(generate_series(1, greatest(1, len({_TOKS}) - 1)),"
    f" i -> {_TOKS}[i] || ' ' || {_TOKS}[i + 1])"
)


@register(
    "x13_repetition_ratio",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_WG2}) AS BIGINT) AS n_bigrams,
           round(1.0 - CAST(len(list_distinct({_WG2})) AS DOUBLE)
                     / CAST(len({_WG2}) AS DOUBLE), 6) AS rep_ratio
    FROM documents
    """,
)
def x13_repetition_ratio(spark, sf_dir):
    """Duplicate-bigram fraction per document (the Gopher repetition
    filters' core signal) — entirely in-row array ops, no explode, no
    shuffle: at 100 TB this runs at scan speed."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = word_ngrams(F.col("text"), 2)
    n = F.size(grams)
    nd = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_bigrams"),
        F.round(
            F.lit(1.0) - nd.cast("double") / n.cast("double"), 6
        ).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# X14 — priority dedup: keep the highest-quality copy per fingerprint
# ---------------------------------------------------------------------------
@register(
    "x14_priority_dedup",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, {_ohash(_NORM, "fp:")} AS fp,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, fp, n_tokens,
               row_number() OVER (PARTITION BY fp
                                  ORDER BY n_tokens DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY fp) AS n_copies
        FROM fp
    )
    SELECT doc_id, fp, n_tokens, n_copies FROM ranked WHERE rn = 1
    """,
)
def x14_priority_dedup(spark, sf_dir):
    """Exact dedup that keeps the *best* copy (here: most tokens, id as
    tie-break) instead of the lowest id — the shape real corpus curation
    uses when copies differ in truncation. Same single hash-shuffle as
    x4."""
    from debezium_spark.analytics.text import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(tokenize(F.col("text"))).cast("long")
    fp = fingerprint(docs).withColumn("n_tokens", toks)
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("fp")))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "fp", "n_tokens", "n_copies")
    )


# ---------------------------------------------------------------------------
# X15 — vocabulary builder: global top-k token counts (tokenizer training)
# ---------------------------------------------------------------------------
@register(
    "x15_vocabulary_topk",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    ranked AS (
        SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS rank
        FROM cnt
    )
    SELECT token, cnt, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 50
    """,
)
def x15_vocabulary_topk(spark, sf_dir):
    """The 100 TB word count: explode tokens, partial-aggregate map-side
    (Spark's hash agg combines before the shuffle, so the exchange carries
    one row per distinct token per partition, not one per token
    occurrence), then a top-k."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
    cnt = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    # orderBy+limit is a distributed TakeOrdered (each partition keeps its
    # local 50, the driver merges) — a global rank window here would drag
    # the whole vocabulary into ONE partition. The rank is then assigned
    # on the 50 survivors.
    top = cnt.orderBy(F.col("cnt").desc(), F.col("token")).limit(50)
    from debezium_spark.suite.warehouse import ranked_after_limit

    return ranked_after_limit(
        top, F.col("cnt").desc(), F.col("token"), name="rank"
    ).select("token", "cnt", "rank")


# ---------------------------------------------------------------------------
# X16 — portable HyperLogLog distinct count (the sketch operator class)
# ---------------------------------------------------------------------------
from debezium_spark.analytics.text import hll_sketch, oracle_hll_sql  # noqa: E402


@register(
    "x16_hll_distinct_users",
    oracle=f"""
    WITH __SRC__ AS (SELECT event_type, user_id FROM events),
    {oracle_hll_sql("user_id", p=9, group_keys="event_type")},
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT e.event_type, h.n_est, e.n_exact
    FROM hest h JOIN exact e USING (event_type)
    """,
)
def x16_hll_distinct_users(spark, sf_dir):
    """Approximate distinct users per event type via the portable HLL
    (map-side-combinable MAX registers — the sketch shape that replaces
    count(DISTINCT) at 100 TB), alongside the exact count so the estimate
    error is visible in the result."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    est = hll_sketch(ev, "user_id", p=9, group_by=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return est.join(exact, "event_type")


# ---------------------------------------------------------------------------
# X17 — count-min sketch heavy hitters (frequency estimation)
# ---------------------------------------------------------------------------
from debezium_spark.analytics.text import cm_estimate, cm_sketch_counts  # noqa: E402

_CM_W, _CM_D = 1024, 4
_CM_HASH = _ohash("CAST(j AS VARCHAR) || ':' || token", "cm:")


@register(
    "x17_cm_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents),
    exact AS (SELECT token, count(*) AS cnt_exact FROM tok GROUP BY 1),
    probes AS (
        SELECT token, unnest(generate_series(0, {_CM_D - 1})) AS j FROM exact
    ),
    cells AS (
        SELECT t.token AS item, p.j, {_CM_HASH.replace('token', 't.token')} % {_CM_W} AS bucket
        FROM tok t CROSS JOIN (SELECT unnest(generate_series(0, {_CM_D - 1})) AS j) p
    ),
    sketch AS (
        SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
    ),
    est AS (
        SELECT p.token, min(coalesce(s.cnt, 0)) AS cnt_est
        FROM (SELECT token, j, {_CM_HASH} % {_CM_W} AS bucket FROM probes) p
        LEFT JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
        GROUP BY 1
    )
    SELECT e.token, e.cnt_exact, CAST(est.cnt_est AS BIGINT) AS cnt_est
    FROM exact e JOIN est USING (token)
    WHERE e.cnt_exact >= 100
    """,
)
def x17_cm_heavy_hitters(spark, sf_dir):
    """Count-min register table + point queries for every token that is a
    true heavy hitter (exact >= 100) — estimates always >= exact (the CM
    one-sided error), bit-identical to the oracle's sketch."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
    sketch = cm_sketch_counts(tok, "token", w=_CM_W, d=_CM_D)
    exact = tok.groupBy("token").agg(F.count("*").alias("cnt_exact"))
    hh = exact.filter(F.col("cnt_exact") >= 100)
    est = cm_estimate(sketch, hh.select("token"), "token", w=_CM_W, d=_CM_D)
    return hh.join(est, "token").select(
        "token", "cnt_exact", F.col("cnt_est").cast("long").alias("cnt_est")
    )


# ---------------------------------------------------------------------------
# X18 — inverted-index posting lists (search-index build shape)
# ---------------------------------------------------------------------------
@register(
    "x18_posting_lists",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest({_TOKS}) AS token FROM documents
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS doc_freq,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM tok
    GROUP BY 1
    HAVING count(*) >= 200
    """,
)
def x18_posting_lists(spark, sf_dir):
    """Inverted-index construction: explode distinct (doc, token) pairs,
    one shuffle on the token, sorted posting arrays per term. The HAVING
    keeps only frequent terms so output stays bounded; at 100 TB the
    posting arrays shard by (token, bucket) instead of one array per
    term."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("token")
    ).distinct()
    return (
        pairs.groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
            ).alias("postings"),
        )
        .filter(F.col("doc_freq") >= 200)
    )


# ---------------------------------------------------------------------------
# X19 — character entropy (compression-proxy quality signal)
# ---------------------------------------------------------------------------
@register(
    "x19_char_entropy",
    oracle=f"""
    WITH chars AS (
        SELECT doc_id,
               list_transform(generate_series(1, length({_NORM})),
                              i -> substr({_NORM}, i, 1)) AS cs
        FROM documents
    ),
    dist AS (
        SELECT doc_id, cs, list_distinct(cs) AS ds,
               CAST(len(cs) AS DOUBLE) AS n
        FROM chars
    )
    SELECT doc_id,
           CAST(len(ds) AS BIGINT) AS n_distinct_chars,
           round(-list_aggregate(
               list_transform(ds,
                   d -> (CAST(len(list_filter(cs, c -> c = d)) AS DOUBLE) / n)
                        * log2(CAST(len(list_filter(cs, c -> c = d)) AS DOUBLE) / n)),
               'sum'), 6) AS char_entropy
    FROM dist
    """,
)
def x19_char_entropy(spark, sf_dir):
    """Shannon entropy of the normalized character distribution — the
    compressibility proxy quality filters use (low entropy = repetitive /
    boilerplate). All in-row array expressions: distinct chars, per-char
    frequency, -sum p*log2 p. No shuffle, runs at scan speed."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from debezium_spark.analytics.text import normalize_text

    norm = normalize_text(F.col("text"))
    cs = F.transform(
        F.sequence(F.lit(1), F.length(norm)), lambda i: norm.substr(i, F.lit(1))
    )
    t = docs.select("doc_id", cs.alias("cs")).select(
        "doc_id", "cs", F.array_distinct("cs").alias("ds"),
        F.size("cs").cast("double").alias("n"),
    )
    p_of = lambda d: (  # noqa: E731
        F.size(F.filter(F.col("cs"), lambda c: c == d)).cast("double")
        / F.col("n")
    )
    ent = -F.aggregate(
        F.col("ds"),
        F.lit(0.0),
        lambda acc, d: acc + p_of(d) * F.log2(p_of(d)),
    )
    return t.select(
        "doc_id",
        F.size("ds").cast("long").alias("n_distinct_chars"),
        F.round(ent, 6).alias("char_entropy"),
    )


# ---------------------------------------------------------------------------
# X20 — duplicate clusters: connected components over the LSH pair graph
# ---------------------------------------------------------------------------
@register(
    "x20_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE}, {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b AS src, a AS dst FROM pairs
    ),
    walk(node, root) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, w.root FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id, min(root) AS cluster
    FROM walk GROUP BY node
    """,
)
def x20_dup_clusters(spark, sf_dir):
    """Near-dup clustering for canonical-document selection: min-label
    propagation over the banded-LSH candidate graph (one shuffle per
    iteration, converges in O(component diameter) rounds — dedup components
    are near-cliques, so 2-4). The oracle walks the same graph with a
    recursive CTE. Cluster id = min doc_id of the component; keeping
    doc_id == cluster picks one representative per duplicate group."""
    from debezium_spark.analytics.text import duplicate_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicate_clusters(docs)


# ---------------------------------------------------------------------------
# X22 — dup clustering, star-contraction variant (diameter-independent)
# ---------------------------------------------------------------------------
@register(
    "x22_dup_clusters_star",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE}, {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b AS src, a AS dst FROM pairs
    ),
    walk(node, root) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, w.root FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id, min(root) AS cluster
    FROM walk GROUP BY node
    """,
)
def x22_dup_clusters_star(spark, sf_dir):
    """x20's labeling computed by large-star/small-star contraction
    (Kiveris et al., SoCC'14) instead of min-label propagation: O(log² n)
    rounds regardless of component diameter — the variant a 100 TB run
    uses when the candidate graph may contain long chains. Same oracle as
    x20: both methods must produce the identical clustering."""
    from debezium_spark.analytics.text import duplicate_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicate_clusters(docs, method="star")


# ---------------------------------------------------------------------------
# X21 — benchmark decontamination (train/test n-gram overlap)
# ---------------------------------------------------------------------------
_WG3 = (
    f"list_transform(generate_series(1, greatest(1, len({_TOKS}) - 2)),"
    f" i -> {_TOKS}[i] || ' ' || {_TOKS}[i + 1] || ' ' || {_TOKS}[i + 2])"
)


@register(
    "x21_decontamination",
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, unnest(list_distinct({_WG3})) AS g FROM documents
    ),
    b AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    t AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM t JOIN b ON t.g = b.g
    GROUP BY t.doc_id
    """,
)
def x21_decontamination(spark, sf_dir):
    """Train/benchmark overlap audit: every 50th document stands in as the
    held-out benchmark; corpus docs report how many distinct word trigrams
    they share with it (the n-gram decontamination pass training pipelines
    run before evaluation). Benchmark gram set semi-joined — broadcastable,
    never all-pairs."""
    from debezium_spark.analytics.text import contamination_hits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_hits(corpus, bench)


# ---------------------------------------------------------------------------
# X23 — deterministic stratified sampling (language rebalancing)
# ---------------------------------------------------------------------------
@register(
    "x23_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ({_ohash("CAST(doc_id AS VARCHAR)", "strat:")}) % 10000
          < (CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500 ELSE 1000 END)
    """,
)
def x23_stratified_sample(spark, sf_dir):
    """Language rebalancing: keep 50% of English, 25% of Chinese, 10% of
    the rest — decided by a portable md5 hash of the doc id, NOT a seeded
    RNG, so re-running the pipeline keeps the SAME documents (stable
    downstream caches/dedup) and the oracle reproduces the draw exactly.
    Pure map-side filter: zero shuffle, rides the scan."""
    from debezium_spark.analytics.text import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(
        docs, {"en": 0.5, "zh": 0.25}, default_rate=0.1
    )
    return out.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# X46 — temperature-based mixture sampling (mT5/GPT-3 data mixing, α=0.5)
# ---------------------------------------------------------------------------
@register(
    "x46_temperature_mixture",
    oracle=f"""
    WITH stats AS (
        -- mirror temperature_sample's masses filter exactly: a NULL
        -- source or a zero/NULL mass samples at rate 0 on the engine
        -- side; without this filter DuckDB's thr division would go
        -- 0/NULL -> NULL and LEAST(1000000, NULL) would keep EVERY doc
        -- of such a source (r12 ADVICE)
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
        FROM documents WHERE source IS NOT NULL GROUP BY source
        HAVING SUM(n_chars) > 0
    ),
    q AS (
        SELECT source, mass,
               CAST(floor(sqrt(CAST(mass AS DOUBLE)) * 1000000) AS BIGINT)
                   AS sq
        FROM stats
    ),
    g AS (
        SELECT CAST(SUM(mass) AS BIGINT) // 2 AS budget,
               CAST(SUM(sq) AS BIGINT) AS ssum
        FROM q
    ),
    thr AS (
        -- HUGEINT for the denominator product: BIGINT*BIGINT overflows
        -- at ~1e9-char sources (ssum*mass > 2^63); the exact 128-bit
        -- product then rounds ONCE to double, matching Python's
        -- arbitrary-precision int -> float conversion bit-for-bit
        SELECT source,
               LEAST(1000000, CAST(floor(
                   (1000000.0 * (SELECT budget FROM g)) * sq
                   / (CAST((SELECT ssum FROM g) AS HUGEINT) * mass))
                   AS BIGINT)) AS thr
        FROM q
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr t ON d.source = t.source
    WHERE ({_ohash("CAST(d.doc_id AS VARCHAR)", "temp:")}) % 1000000 < t.thr
    """,
)
def x46_temperature_mixture(spark, sf_dir):
    """Temperature mixing at alpha = 0.5: per-source budgets proportional
    to sqrt(mass) — small sources upweighted relative to their share,
    dominant ones capped — targeting half the corpus mass. The draw is
    the portable md5 hash (re-runs keep the SAME documents); sqrt is
    integer-quantized BEFORE the cross-source sum so the thresholds are
    aggregation-order-independent, and the oracle replays the identical
    arithmetic. One bounded agg + a zero-shuffle scan filter."""
    from debezium_spark.analytics.text import temperature_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_sample(docs).select("doc_id", "source")


# ---------------------------------------------------------------------------
# X24 — per-group quota cap (anti-spam domain capping)
# ---------------------------------------------------------------------------
@register(
    "x24_source_quota",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_ohash("CAST(doc_id AS VARCHAR)", "quota:")}, doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rk <= 10
    """,
)
def x24_source_quota(spark, sf_dir):
    """Per-source quota: at most 10 documents per source, chosen by a
    stable hash-ranked draw (one shuffle on the group key; a skewed
    mega-domain still yields exactly K rows). The dominant-domain capping
    pass of a corpus build."""
    from debezium_spark.analytics.text import quota_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quota_per_group(docs, quota=10).select("doc_id", "source")


# ---------------------------------------------------------------------------
# X25 — corpus-trained token typicality (self-supervised quality score)
# ---------------------------------------------------------------------------
@register(
    "x25_token_typicality",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(CAST(sum(v.cnt) AS DOUBLE) / count(*), 6) AS mean_tok_count,
           round(CAST(sum(CASE WHEN v.cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS rare_ratio
    FROM tok t JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def x25_token_typicality(spark, sf_dir):
    """Self-supervised quality scoring: train unigram counts on the corpus
    itself (one map-side-combined aggregation), join the vocabulary back,
    and score each document by the average corpus frequency of its tokens
    plus its rare-token ratio — the LM-style filter pass that catches
    gibberish and wrong-language docs without an external model. Exact
    arithmetic (see token_typicality) so the oracle hashes bit-identically."""
    from debezium_spark.analytics.text import token_typicality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_typicality(docs)


# ---------------------------------------------------------------------------
# X26 — corpus-level boilerplate n-gram detection
# ---------------------------------------------------------------------------
_WG5 = (
    f"list_transform(generate_series(1, greatest(1, len({_TOKS}) - 4)),"
    f" i -> {_TOKS}[i] || ' ' || {_TOKS}[i + 1] || ' ' || {_TOKS}[i + 2]"
    f" || ' ' || {_TOKS}[i + 3] || ' ' || {_TOKS}[i + 4])"
)


@register(
    "x26_boilerplate_ngrams",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, unnest(list_distinct({_WG5})) AS g FROM documents
    ),
    dfreq AS (SELECT g, count(*) AS df_ FROM g GROUP BY 1),
    bank AS (SELECT g FROM dfreq ORDER BY df_ DESC, g LIMIT 20),
    per_doc AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
    hits AS (
        SELECT doc_id, count(*) AS n_boiler
        FROM g JOIN bank USING (g) GROUP BY doc_id
    )
    SELECT p.doc_id, COALESCE(h.n_boiler, 0) AS n_boiler, p.n_grams,
           round(CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / p.n_grams, 6)
             AS boiler_ratio
    FROM per_doc p LEFT JOIN hits h USING (doc_id)
    """,
)
def x26_boilerplate_ngrams(spark, sf_dir):
    """Corpus-level boilerplate detection (the C4/RefinedWeb "most common
    lines" cleaning signal): the 20 highest-document-frequency word
    5-grams form the boilerplate bank; each doc reports its distinct-gram
    hits against the bank and the ratio. One doc-frequency aggregation, a
    TakeOrdered for the tiny bank (broadcast back), one per-doc count."""
    from debezium_spark.analytics.text import boilerplate_ngrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return boilerplate_ngrams(docs)


# ---------------------------------------------------------------------------
# X27 — concat-and-chunk sequence packing
# ---------------------------------------------------------------------------
@register(
    "x27_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {_ohash("CAST(doc_id AS VARCHAR)", "pack:")} % 8 AS shard,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, shard, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
               ) AS BIGINT) AS end_tok
        FROM t
    )
    SELECT doc_id, shard, n_tokens,
           end_tok - n_tokens AS begin_tok, end_tok,
           (end_tok - n_tokens) // 512 AS first_seq,
           (end_tok - 1) // 512 AS last_seq,
           (end_tok - 1) // 512 - (end_tok - n_tokens) // 512 + 1 AS n_seqs
    FROM c
    """,
)
def x27_pack_sequences(spark, sf_dir):
    """Sequence packing for pretraining (concat-and-chunk): documents are
    routed to 8 independent token streams by portable hash, laid end-to-end
    in id order, and mapped to the 512-token training sequences they span.
    One window-sum shuffle partitioned by shard — parallelism is the shard
    count, never a global order."""
    from debezium_spark.analytics.text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, seq_len=512, shards=8)


# ---------------------------------------------------------------------------
# X28 — token-budget mixture sampling (data mixing by token mass)
# ---------------------------------------------------------------------------
@register(
    "x28_token_budget_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(coalesce(len({_TOKS}), 0) AS BIGINT) AS n_tokens,
               {_ohash("CAST(doc_id AS VARCHAR)", "tbs:")} AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY h % 16, h, doc_id
               ) AS BIGINT) AS end_tok
        FROM t
    )
    SELECT doc_id, source, n_tokens, end_tok
    FROM c
    WHERE end_tok <= CASE source
                         WHEN 'src0' THEN 800
                         WHEN 'src1' THEN 500
                         ELSE 300
                     END
    """,
)
def x28_token_budget_sample(spark, sf_dir):
    """Data mixing by token mass: per-source TOKEN budgets (800 for src0,
    500 for src1, 300 elsewhere) filled in a stable hash order — the
    mixture-composition pass of pretraining prep (x24 caps rows; this caps
    the quantity training actually measures). The per-source prefix sum
    runs in two levels — window-sum inside (source, sub_shard), tiny
    totals prefix-offset and broadcast back — so a mega-source never
    serializes one window partition; integer counts make the two-level
    sum exactly the oracle's single global window."""
    from debezium_spark.analytics.text import token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_budget_sample(
        docs, {"src0": 800, "src1": 500}, default_budget=300
    )


# ---------------------------------------------------------------------------
# X29 — PII redaction (content-level scrub + per-category counts)
# ---------------------------------------------------------------------------
from debezium_spark.analytics.text import oracle_redact_pii_sql  # noqa: E402

# The synthetic corpus carries no real PII, so the gate query injects
# deterministic patterns derived from doc columns — the regexes under test
# are the production ones; only the fixture text is synthesized (on BOTH
# engines, identically).
_PII_AUG_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'"
    " || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' ip 10.0.' ||"
    " CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END"
)


@register(
    "x29_pii_redaction",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents
    )
    SELECT doc_id, {oracle_redact_pii_sql("text")} FROM aug
    """,
)
def x29_pii_redaction(spark, sf_dir):
    """Pre-release PII scrub: emails/SSNs/phones/IPv4s → typed placeholders
    plus per-category counts, sequential-rewrite semantics (counts = number
    of placeholders actually inserted). Pure regexp expressions inside the
    scan — zero shuffle at any corpus size."""
    from debezium_spark.analytics.text import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com call 415-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" ssn 123-45-6789")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" ip 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(aug)


# ---------------------------------------------------------------------------
# X30 — boilerplate span removal (x26's detector as a rewriter)
# ---------------------------------------------------------------------------
_SLICE_G = "array_to_string(list_slice(toks, i, i + 4), ' ')"


@register(
    "x30_remove_boilerplate",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    gr AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            generate_series(1, greatest(1, len(toks) - 4)),
            i -> {_SLICE_G}))) AS g
        FROM t
    ),
    dfreq AS (SELECT g, count(*) AS df_ FROM gr GROUP BY 1),
    bank AS (SELECT g FROM dfreq ORDER BY df_ DESC, g LIMIT 20),
    starts AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(1, len(toks) - 4))) AS i
        FROM t
    ),
    occ AS (
        SELECT s.doc_id, s.i, least(s.i + 4, len(s.toks)) AS j
        FROM starts s JOIN bank b
          ON b.g = array_to_string(list_slice(s.toks, s.i,
                                              least(s.i + 4, len(s.toks))), ' ')
    ),
    covered AS (
        SELECT DISTINCT doc_id, p
        FROM (SELECT doc_id, unnest(generate_series(i, j)) AS p FROM occ)
    ),
    tokpos AS (
        SELECT doc_id, p, list_extract(toks, p) AS tok
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks))) AS p
              FROM t)
    ),
    kept AS (
        SELECT tp.doc_id, tp.p, tp.tok
        FROM tokpos tp ANTI JOIN covered c USING (doc_id, p)
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS INT) AS n_tokens,
           CAST(len(t.toks) - count(k.p) AS INT) AS n_removed,
           coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS clean_text
    FROM t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, len(t.toks)
    """,
)
def x30_remove_boilerplate(spark, sf_dir):
    """Boilerplate REMOVAL: tokens covered by any occurrence of a bank
    n-gram (x26's top-20 document-frequency bank) are dropped and the
    document is re-joined in token order. The bank is a bounded literal
    (like the PQ codebooks), so the rewrite is a pure map-side expression
    — one corpus aggregation, then zero additional shuffle."""
    from debezium_spark.analytics.text import remove_boilerplate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return remove_boilerplate_spans(docs)


# ---------------------------------------------------------------------------
# X31/X32 — line-level dedup. The synthetic corpus is single-line, so (like
# x29's PII fixtures) both gates synthesize a deterministic multi-line
# rendering — 6-token lines — identically on BOTH engines; the operators
# under test are the production ones.
# ---------------------------------------------------------------------------
_LINES_SQL = (
    "list_transform(generate_series(1, CAST(ceil(len(toks) / 6.0) AS INT)),"
    " i -> array_to_string(list_slice(toks, (i - 1) * 6 + 1, i * 6), ' '))"
)


def _six_token_lines(col):
    toks = F.split(F.trim(col), r"\s+")
    return F.transform(
        F.sequence(
            F.lit(1), F.ceil(F.size(toks) / F.lit(6.0)).cast("int")
        ),
        lambda i: F.concat_ws(" ", F.slice(toks, (i - F.lit(1)) * 6 + 1, 6)),
    )


_X31_KEPT = "list_filter(l2, (x, i) -> list_position(l2, x) = i)"


@register(
    "x31_dedupe_lines",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ls AS (SELECT doc_id, {_LINES_SQL} AS lines FROM t),
    aug AS (
        SELECT doc_id,
               array_to_string(
                   lines || list_slice(lines, 1, 1) || list_slice(lines, 3, 3),
                   chr(10)) AS text
        FROM ls
    ),
    sp AS (SELECT doc_id, string_split(text, chr(10)) AS l2 FROM aug)
    SELECT doc_id,
           CAST(len(l2) AS INT) AS n_lines,
           CAST(len(l2) - len({_X31_KEPT}) AS INT) AS n_dupes,
           array_to_string({_X31_KEPT}, chr(10)) AS clean_text
    FROM sp
    """,
)
def x31_dedupe_lines(spark, sf_dir):
    """Within-document duplicate-line removal (C4/CCNet page cleaning):
    first occurrence of each exact line survives, order preserved. The
    fixture re-renders each doc as 6-token lines and appends copies of
    lines 1 and 3, so every doc carries real duplicates. Pure indexed
    higher-order filter inside the scan projection — zero shuffle."""
    from debezium_spark.analytics.text import dedupe_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lines = _six_token_lines(F.col("text"))
    aug = docs.select(
        "doc_id",
        F.array_join(
            F.concat(lines, F.slice(lines, 1, 1), F.slice(lines, 3, 1)),
            "\n",
        ).alias("text"),
    )
    return dedupe_lines(aug)


@register(
    "x32_dedupe_corpus_lines",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    ls AS (SELECT doc_id, source, {_LINES_SQL} AS lines FROM t),
    aug AS (
        SELECT doc_id,
               array_to_string(
                   lines || ['subscribe to our newsletter today',
                             'footer ' || source],
                   chr(10)) AS text
        FROM ls
    ),
    sp AS (SELECT doc_id, string_split(text, chr(10)) AS l2 FROM aug),
    lines2 AS (
        SELECT doc_id, l2,
               unnest(generate_series(1, len(l2))) AS pos
        FROM sp
    ),
    lx AS (SELECT doc_id, pos, l2[pos] AS line FROM lines2),
    keeper AS (SELECT line, min(doc_id) AS keep_id FROM lx GROUP BY 1),
    flagged AS (
        SELECT l.doc_id, l.pos, l.line,
               (l.doc_id = k.keep_id) AS keep
        FROM lx l JOIN keeper k USING (line)
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_lines,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS INT) AS n_removed,
           coalesce(string_agg(CASE WHEN keep THEN line END,
                               chr(10) ORDER BY pos), '') AS clean_text
    FROM flagged
    GROUP BY doc_id
    """,
)
def x32_dedupe_corpus_lines(spark, sf_dir):
    """CROSS-document line dedup (the CCNet corpus pass): a line shared by
    many documents survives only in the smallest doc_id containing it. The
    fixture appends a corpus-wide footer line plus a per-source footer to
    every document — after dedup exactly one doc keeps the global footer
    and one doc per source keeps its source footer. One line-key hash agg
    (exchange reused by the join) + one doc-key reassembly agg."""
    from debezium_spark.analytics.text import (
        dedupe_corpus_lines,
        ensure_parallelism,
    )

    # The heavy part here is the fixture's line-rendering expression
    # (interpreted transform/slice lambdas) evaluated in BOTH Generate
    # branches; spread the one-split scan first so it parallelizes
    # (measured 1.99s -> 0.84s at sf0.1, r13 optimization round).
    docs = ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), 16
    )
    lines = _six_token_lines(F.col("text"))
    aug = docs.select(
        "doc_id",
        F.array_join(
            F.concat(
                lines,
                F.array(
                    F.lit("subscribe to our newsletter today"),
                    F.concat(F.lit("footer "), F.col("source")),
                ),
            ),
            "\n",
        ).alias("text"),
    )
    return dedupe_corpus_lines(aug)


# ---------------------------------------------------------------------------
# X33 — Gopher repetition-rule quality metrics
# ---------------------------------------------------------------------------
_G2 = (
    "list_transform(generate_series(1, greatest(1, len(toks) - 1)),"
    " i -> array_to_string(list_slice(toks, i, i + 1), ' '))"
)
_G3 = (
    "list_transform(generate_series(1, greatest(1, len(toks) - 2)),"
    " i -> array_to_string(list_slice(toks, i, i + 2), ' '))"
)


@register(
    "x33_repetition_metrics",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id, len(toks) AS n_tokens, {_G2} AS g2, {_G3} AS g3
        FROM t
    ),
    m AS (
        SELECT doc_id, n_tokens,
               CAST(1 AS DOUBLE)
                 - CAST(len(list_distinct(g2)) AS DOUBLE)
                   / CAST(len(g2) AS DOUBLE) AS dup_2gram_frac,
               CAST(1 AS DOUBLE)
                 - CAST(len(list_distinct(g3)) AS DOUBLE)
                   / CAST(len(g3) AS DOUBLE) AS dup_3gram_frac,
               list_aggregate(
                   list_transform(list_distinct(g2),
                                  x -> len(list_filter(g2, y -> y = x))),
                   'max') AS topc
        FROM g
    ),
    m2 AS (
        SELECT doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac, topc,
               CAST(topc * 2 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                   AS top_2gram_cov
        FROM m
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           dup_2gram_frac, dup_3gram_frac,
           CAST(topc AS INT) AS top_2gram_count,
           top_2gram_cov,
           (dup_2gram_frac <= CAST(0.20 AS DOUBLE)
            AND dup_3gram_frac <= CAST(0.18 AS DOUBLE)
            AND top_2gram_cov <= CAST(0.20 AS DOUBLE)) AS keep
    FROM m2
    """,
)
def x33_repetition_metrics(spark, sf_dir):
    """Gopher repetition rules (duplicate 2/3-gram fractions, top-2-gram
    coverage, combined keep flag) — the quality filter family applied
    before every pretraining run. x13 is the single duplicate-bigram
    signal; this is the full rule set plus the keep DECISION. Entirely
    expression-level inside the scan: zero shuffle; per-doc cost bounded
    by document length."""
    from debezium_spark.analytics.text import repetition_metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_metrics(docs)


# ---------------------------------------------------------------------------
# X34 — incremental dedup: new batch screened against the persisted index.
# Fixture split: doc_id % 5 == 0 is the incoming batch, the rest is the
# already-indexed corpus (signatures precomputed, as if loaded from parquet
# — the save/load round-trip itself is unit-tested in test_components.py).
# ---------------------------------------------------------------------------
_EST_SQL = (
    "CAST("
    + " + ".join(
        f"(CASE WHEN sn.mh{j} = si.mh{j} THEN 1 ELSE 0 END)" for j in range(8)
    )
    + " AS DOUBLE) / CAST(8 AS DOUBLE)"
)


@register(
    "x34_incremental_dedup",
    oracle=f"""
    WITH {_SIG_CTE}, {_BANDS_CTE},
    cand AS (
        SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS index_id
        FROM bands n JOIN bands i
          ON n.band = i.band AND n.bkey = i.bkey
        WHERE n.doc_id % 5 = 0 AND i.doc_id % 5 <> 0
    ),
    est AS (
        SELECT c.new_id, c.index_id, {_EST_SQL} AS est_jaccard
        FROM cand c
        JOIN sig sn ON sn.doc_id = c.new_id
        JOIN sig si ON si.doc_id = c.index_id
    )
    SELECT new_id, index_id, est_jaccard,
           est_jaccard >= CAST(0.5 AS DOUBLE) AS is_dup
    FROM est
    """,
)
def x34_incremental_dedup(spark, sf_dir):
    """Sign-once/ingest-many dedup: the accepted corpus's MinHash
    signatures are persisted; each incoming batch is screened against them
    via a banded equi-join (batch × index never materialized) and scored
    with the MinHash agreement estimate — no corpus re-signing, no index
    text needed. The production path for continuous crawl ingestion."""
    from debezium_spark.analytics.text import (
        lsh_candidates_vs_index,
        minhash_signature,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index_sigs = minhash_signature(docs.filter(F.col("doc_id") % 5 != 0))
    new_docs = docs.filter(F.col("doc_id") % 5 == 0)
    return lsh_candidates_vs_index(index_sigs, new_docs)


# ---------------------------------------------------------------------------
# X35 — leakage-safe split assignment (cluster-hash routed)
# ---------------------------------------------------------------------------
_SPLIT_HASH = _ohash("CAST(cluster AS VARCHAR)", "split:")


@register(
    "x35_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_SIG_CTE}, {_BANDS_CTE},
    pairs AS ({_PAIRS_SQL}),
    edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b AS src, a AS dst FROM pairs
    ),
    walk(node, root) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.dst, w.root FROM walk w JOIN edges e ON e.src = w.node
    ),
    labels AS (SELECT node AS doc_id, min(root) AS cluster
               FROM walk GROUP BY node),
    assigned AS (
        SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN labels l USING (doc_id)
    ),
    bucketed AS (
        SELECT doc_id, cluster, {_SPLIT_HASH} % 10 AS b FROM assigned
    )
    SELECT doc_id, cluster,
           CASE WHEN b < 8 THEN 'train'
                WHEN b < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed
    """,
)
def x35_leakage_safe_split(spark, sf_dir):
    """Train/val/test routing by the hash of the NEAR-DUP CLUSTER id —
    a duplicate component can never straddle splits (the self-inflicted
    eval-contamination x21 would otherwise detect after the fact).
    Singletons are their own cluster; the draw is portable-hash
    reproducible."""
    from debezium_spark.analytics.text import leakage_safe_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return leakage_safe_split(docs)


# ---------------------------------------------------------------------------
# X36 — interleaved training order (closed-form round-robin, no global sort)
# ---------------------------------------------------------------------------
_ORD_HASH = _ohash("CAST(doc_id AS VARCHAR)", "ord:")


@register(
    "x36_interleaved_order",
    oracle=f"""
    WITH sidx AS (
        SELECT source,
               CAST(row_number() OVER (ORDER BY source) - 1 AS INT) AS si
        FROM (SELECT DISTINCT source FROM documents)
    ),
    n AS (SELECT count(*) AS ns FROM sidx),
    rn AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY {_ORD_HASH}, doc_id
               ) AS INT) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.source, r.rn,
           CAST((r.rn - 1) * n.ns + s.si AS BIGINT) AS order_idx
    FROM rn r JOIN sidx s USING (source) CROSS JOIN n
    """,
)
def x36_interleaved_order(spark, sf_dir):
    """Global epoch ordering that interleaves domains WITHOUT a global
    sort: per-source hash-ordered row numbers (window parallel across
    sources) + the closed form (rn-1)·n_sources + source_index. Two docs
    of one domain are always n_sources apart — the curriculum-shuffle
    layout at scan cost."""
    from debezium_spark.analytics.text import interleaved_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return interleaved_order(docs)


# ---------------------------------------------------------------------------
# X37 — corpus-level duplicated-substring spans (exact-substring dedup)
# ---------------------------------------------------------------------------
_X37_N = 20


@register(
    "x37_duplicated_spans",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    pos AS (
        SELECT doc_id, text, unnest(range(1, L - {_X37_N} + 2)) AS p
        FROM d WHERE text IS NOT NULL AND L >= {_X37_N}
    ),
    grams AS (SELECT doc_id, p, substr(text, p, {_X37_N}) AS g FROM pos),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    fl AS (
        SELECT doc_id, p, p + {_X37_N} - 1 AS e
        FROM grams JOIN dupg USING (g)
    ),
    isl AS (
        SELECT doc_id, p, e,
               CASE WHEN max(e) OVER (
                        PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR p > max(e) OVER (
                        PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
               THEN 1 ELSE 0 END AS newf
        FROM fl
    ),
    isl2 AS (
        SELECT doc_id, p, e,
               sum(newf) OVER (PARTITION BY doc_id ORDER BY p
                               ROWS UNBOUNDED PRECEDING) AS gid
        FROM isl
    ),
    spans AS (
        SELECT doc_id, gid, max(e) - min(p) + 1 AS chars, count(*) AS npos
        FROM isl2 GROUP BY doc_id, gid
    ),
    perdoc AS (
        SELECT doc_id, CAST(sum(npos) AS INT) AS dup_positions,
               CAST(sum(chars) AS INT) AS dup_chars
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(CASE WHEN d.text IS NOT NULL AND d.L >= {_X37_N}
                     THEN d.L - {_X37_N} + 1 ELSE 0 END AS INT) AS n_grams,
           coalesce(pd.dup_positions, 0) AS dup_positions,
           coalesce(pd.dup_chars, 0) AS dup_chars,
           CASE WHEN d.L >= {_X37_N} AND d.text IS NOT NULL THEN
                round(coalesce(pd.dup_positions, 0) /
                      CAST(d.L - {_X37_N} + 1 AS DOUBLE), 6)
           END AS dup_frac
    FROM d LEFT JOIN perdoc pd USING (doc_id)
    """,
)
def x37_duplicated_spans(spark, sf_dir):
    """Exact-substring dedup report (Lee et al. 2021, the window-hash
    formulation): every 20-char window occurring twice anywhere in the
    corpus flags its position; overlapping flags merge into maximal
    spans; each document reports flagged windows, span chars, and the
    duplicated fraction. ~7.5% of this corpus's windows duplicate
    naturally — real removal candidates, not a synthetic plant. One
    window-key hash agg + a flagged-only per-doc merge window; the
    registered query keys by window TEXT for engine parity — key='hash'
    (8-byte shuffle keys) is the production setting, equality-tested in
    tests/test_components.py."""
    from debezium_spark.analytics.text import duplicated_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicated_spans(docs, n=_X37_N, key="text")


# ---------------------------------------------------------------------------
# X38 — character-LM quality score (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------
@register(
    "x38_charlm_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_NORM} AS s FROM documents),
    bi AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(s) - 1),
                                     i -> substr(s, i, 2))) AS bg
        FROM t WHERE s IS NOT NULL AND length(s) >= 2
    ),
    db AS (SELECT doc_id, bg, count(*) AS cnt FROM bi GROUP BY 1, 2),
    model AS (SELECT bg, sum(cnt) AS c FROM db GROUP BY 1),
    ctx AS (SELECT substr(bg, 1, 1) AS c1, sum(c) AS n FROM model GROUP BY 1),
    vocab AS (
        SELECT count(DISTINCT ch) AS v FROM (
            SELECT unnest(list_transform(
                       generate_series(1, greatest(length(s), 1)),
                       i -> substr(s, i, 1))) AS ch
            FROM t WHERE s IS NOT NULL
        ) WHERE ch <> ''
    ),
    terms AS (
        SELECT d.doc_id, d.cnt,
               CAST(floor(log2(CAST(m.c + 1 AS DOUBLE)
                               / CAST(x.n + vv.v AS DOUBLE))
                          * 1000000000.0) AS BIGINT) AS tq
        FROM db d
        JOIN model m USING (bg)
        JOIN ctx x ON x.c1 = substr(d.bg, 1, 1)
        CROSS JOIN vocab vv
    ),
    pd AS (
        SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
               sum(cnt * tq) AS sq
        FROM terms GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN pd.n_bigrams > 0 THEN
                round(-CAST(pd.sq AS DOUBLE) / 1000000000.0
                      / CAST(pd.n_bigrams AS DOUBLE), 6)
           END AS bits_per_char
    FROM t LEFT JOIN pd USING (doc_id)
    """,
)
def x38_charlm_quality(spark, sf_dir):
    """CCNet-style LM quality filter in its distributable char-bigram
    form: corpus-trained add-one-smoothed bigram model, per-doc
    bits-per-char cross-entropy (gibberish scores high, fluent text
    low). The model's key space is bounded by |charset|² — it
    BROADCASTS by construction at any corpus size; per-term fixed-point
    quantization (floor(log2 p * 1e9) as int64) makes the per-doc sum
    order-independent, so both engines agree bit-for-bit without
    constraining aggregation order."""
    from debezium_spark.analytics.text import charlm_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return charlm_quality(docs)


# ---------------------------------------------------------------------------
# X39 — sampled duplicated-substring spans (the 100 TB exact-substring path)
# ---------------------------------------------------------------------------
_X39_STRIDE = 4
_X39_P = 1_000_000_007


def _x39_poly_sql(base: int) -> str:
    pows = [pow(base, _X37_N - 1 - i, _X39_P) for i in range(_X37_N)]
    terms = " + ".join(
        f"CAST(ord(substr(text, p + {i}, 1)) AS BIGINT) * {pows[i]}"
        for i in range(_X37_N)
    )
    return f"(({terms}) % {_X39_P})"


@register(
    "x39_duplicated_spans_sampled",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    pos AS (
        SELECT doc_id, text, unnest(range(1, L - {_X37_N} + 2)) AS p
        FROM d WHERE text IS NOT NULL AND L >= {_X37_N}
    ),
    grams AS (
        SELECT doc_id, p,
               {_x39_poly_sql(131)} * {_X39_P} + {_x39_poly_sql(137)} AS k
        FROM pos
    ),
    sel AS (SELECT doc_id, p, k FROM grams WHERE k % {_X39_STRIDE} = 0),
    dupg AS (SELECT k FROM sel GROUP BY k HAVING count(*) >= 2),
    fl AS (
        SELECT doc_id, p, p + {_X37_N} - 1 AS e
        FROM sel JOIN dupg USING (k)
    ),
    isl AS (
        SELECT doc_id, p, e,
               CASE WHEN max(e) OVER (
                        PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR p > max(e) OVER (
                        PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
               THEN 1 ELSE 0 END AS newf
        FROM fl
    ),
    isl2 AS (
        SELECT doc_id, p, e,
               sum(newf) OVER (PARTITION BY doc_id ORDER BY p
                               ROWS UNBOUNDED PRECEDING) AS gid
        FROM isl
    ),
    spans AS (
        SELECT doc_id, gid, max(e) - min(p) + 1 AS chars, count(*) AS npos
        FROM isl2 GROUP BY doc_id, gid
    ),
    perdoc AS (
        SELECT doc_id, CAST(sum(npos) AS INT) AS dup_positions,
               CAST(sum(chars) AS INT) AS dup_chars
        FROM spans GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams
            FROM sel GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(t.n_grams, 0) AS n_grams,
           coalesce(pd.dup_positions, 0) AS dup_positions,
           coalesce(pd.dup_chars, 0) AS dup_chars,
           CASE WHEN coalesce(t.n_grams, 0) > 0 THEN
                round(coalesce(pd.dup_positions, 0) /
                      CAST(t.n_grams AS DOUBLE), 6)
           END AS dup_frac
    FROM d LEFT JOIN tot t USING (doc_id) LEFT JOIN perdoc pd USING (doc_id)
    """,
)
def x39_duplicated_spans_sampled(spark, sf_dir):
    """x37's production formulation for 100 TB corpora: 0-mod-p
    fingerprint sampling (MOSS/winnowing family) — only windows whose
    64-bit polynomial key ≡ 0 (mod 4) enter the count/join, a 4× cut of
    the exact plan's scale killer (one shuffled row per character of
    corpus), with CONTENT-defined selection so unaligned cross-document
    copies still collide. One Arrow-batched numpy kernel slides both
    polynomial hashes per document (two int64 matmuls — no explode, no
    per-window md5) and emits only selected windows; the DuckDB oracle
    replays the identical integer arithmetic, so selection, counts and
    span merges match bit-for-bit. dup_frac is the duplicated-window
    density over the SAME sample space (unbiased vs x37's exact density:
    33.3% vs 33.4% on this corpus at sf0.1); dup_chars under-reports
    only unselected span edges. Measured sf0.1: 1.8 s steady vs 7.5 s
    exact."""
    from debezium_spark.analytics.text import duplicated_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicated_spans(docs, n=_X37_N, key="poly", stride=_X39_STRIDE)


# ---------------------------------------------------------------------------
# X40 — incremental exact-substring dedup vs a persisted fingerprint index
# ---------------------------------------------------------------------------
@register(
    "x40_incremental_spans",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
    pos AS (
        SELECT doc_id, text, unnest(range(1, L - {_X37_N} + 2)) AS p
        FROM d WHERE text IS NOT NULL AND L >= {_X37_N}
    ),
    grams AS (
        SELECT doc_id, p,
               {_x39_poly_sql(131)} * {_X39_P} + {_x39_poly_sql(137)} AS k
        FROM pos
    ),
    sel AS (SELECT doc_id, p, k FROM grams WHERE k % {_X39_STRIDE} = 0),
    idx AS (SELECT DISTINCT k FROM sel WHERE doc_id % 5 <> 0),
    batch AS (SELECT doc_id, p, k FROM sel WHERE doc_id % 5 = 0),
    bdup AS (SELECT k FROM batch GROUP BY k HAVING count(*) >= 2),
    fl AS (
        SELECT doc_id, p, p + {_X37_N} - 1 AS e
        FROM batch b
        WHERE EXISTS (SELECT 1 FROM idx i WHERE i.k = b.k)
           OR EXISTS (SELECT 1 FROM bdup x WHERE x.k = b.k)
    ),
    isl AS (
        SELECT doc_id, p, e,
               CASE WHEN max(e) OVER (
                        PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR p > max(e) OVER (
                        PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
               THEN 1 ELSE 0 END AS newf
        FROM fl
    ),
    isl2 AS (
        SELECT doc_id, p, e,
               sum(newf) OVER (PARTITION BY doc_id ORDER BY p
                               ROWS UNBOUNDED PRECEDING) AS gid
        FROM isl
    ),
    spans AS (
        SELECT doc_id, gid, max(e) - min(p) + 1 AS chars, count(*) AS npos
        FROM isl2 GROUP BY doc_id, gid
    ),
    perdoc AS (
        SELECT doc_id, CAST(sum(npos) AS INT) AS dup_positions,
               CAST(sum(chars) AS INT) AS dup_chars
        FROM spans GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams
            FROM batch GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(t.n_grams, 0) AS n_grams,
           coalesce(pd.dup_positions, 0) AS dup_positions,
           coalesce(pd.dup_chars, 0) AS dup_chars,
           CASE WHEN coalesce(t.n_grams, 0) > 0 THEN
                round(coalesce(pd.dup_positions, 0) /
                      CAST(t.n_grams AS DOUBLE), 6)
           END AS dup_frac
    FROM d LEFT JOIN tot t USING (doc_id) LEFT JOIN perdoc pd USING (doc_id)
    WHERE d.doc_id % 5 = 0
    """,
)
def x40_incremental_spans(spark, sf_dir):
    """Fingerprint-once/ingest-many exact-substring dedup: the accepted
    corpus's selected window keys persist as an 8-byte-key index
    (span_fingerprint_index); each incoming batch flags its windows
    against that index plus within-batch repeats — the corpus text is
    never re-read, never re-hashed (the x34 contract applied to the
    x39 sampled-spans path). Corpus = doc_id % 5 != 0, batch = the
    rest; the oracle replays both sides with the identical polynomial
    arithmetic."""
    from debezium_spark.analytics.text import (
        duplicated_spans_vs_index,
        span_fingerprint_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index_keys = span_fingerprint_index(docs.filter(F.col("doc_id") % 5 != 0))
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return duplicated_spans_vs_index(batch, index_keys)


# ---------------------------------------------------------------------------
# X41 — BPE tokenizer training (analytics/bpe.py)
# ---------------------------------------------------------------------------
def _bpe_oracle(n_merges: int = 8, vocab: int = 200) -> str:
    """The DuckDB replay of BPE training, UNROLLED: one
    (tokenize → pair-count → deterministic argmax → replace-merge) CTE
    block per round. Possible only because the Spark path's tie-breaks
    (count DESC, left ASC, right ASC; vocab truncation by freq DESC,
    word ASC) are total orders — the two engines walk identical merge
    sequences."""
    sql = f"""
    WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents
        ) GROUP BY w ORDER BY freq DESC, w LIMIT {vocab}
    ),
    st0 AS MATERIALIZED (
        SELECT freq, regexp_replace(w, '(.)', '|\\1|', 'g') AS W FROM words
    )"""
    for k in range(n_merges):
        sql += f""",
    tk{k} AS MATERIALIZED (
        SELECT freq,
               list_filter(string_split(W, '|'), t -> t <> '') AS toks
        FROM st{k}
    ),
    p{k} AS (
        SELECT toks[i] AS a, toks[i + 1] AS b,
               CAST(sum(freq) AS BIGINT) AS cnt
        FROM (SELECT freq, toks, unnest(range(1, len(toks))) AS i
              FROM tk{k})
        GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
    st{k + 1} AS MATERIALIZED (
        SELECT freq,
               replace(W,
                       '|' || (SELECT a FROM b{k}) || '||'
                           || (SELECT b FROM b{k}) || '|',
                       '|' || (SELECT a FROM b{k})
                           || (SELECT b FROM b{k}) || '|') AS W
        FROM st{k}
    )"""
    sql += "\n    " + "\n    UNION ALL ".join(
        f"SELECT {k} AS step, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, cnt FROM b{k}"
        for k in range(n_merges)
    )
    return sql


@register("x41_bpe_tokenizer", oracle=_bpe_oracle())
def x41_bpe_tokenizer(spark, sf_dir):
    """BPE tokenizer training (Sennrich 2016) — the LLM-pipeline stage
    with no prior analog here (x15's vocabulary top-k is its corpus
    pass). One corpus-wide shuffle builds the word-frequency table; 8
    merge rounds then each cost one JVM-side pair-count aggregation over
    the bounded vocab plus a one-row argmax collect. Fully deterministic
    tie-breaks let the DuckDB oracle replay the exact merge sequence
    round by round — training is value-checked, not just shape-checked."""
    from debezium_spark.analytics.bpe import bpe_train, word_frequencies

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = word_frequencies(docs, text_col="text", vocab_size=200)
    merges = bpe_train(words, n_merges=8)
    return spark.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string,"
        " cnt bigint",
    )


# ---------------------------------------------------------------------------
# X42 — DSIR importance resampling (hashed n-gram log-ratio weights +
# deterministic Gumbel top-k)
# ---------------------------------------------------------------------------
_X42_B = 4096
_X42_Q = 1_000_000_000
_X42_K = 200


@register(
    "x42_dsir_resample",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKS}) AS token
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    ),
    bk AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
                   % {_X42_B} AS b
        FROM tok
    ),
    dc AS (SELECT doc_id, b, count(*) AS cnt FROM bk GROUP BY 1, 2),
    raw AS (SELECT b, sum(cnt) AS cr FROM dc GROUP BY 1),
    tgt AS (
        SELECT b, sum(cnt) AS ct FROM dc WHERE doc_id % 19 = 0 GROUP BY 1
    ),
    tot AS (
        SELECT sum(cnt) AS nr,
               coalesce(sum(cnt) FILTER (WHERE doc_id % 19 = 0), 0) AS nt
        FROM dc
    ),
    model AS (
        SELECT raw.b,
               CAST(floor(log2(CAST(coalesce(ct, 0) + 1 AS DOUBLE))
                          * {_X42_Q}) AS BIGINT)
             - CAST(floor(log2(CAST(cr + 1 AS DOUBLE))
                          * {_X42_Q}) AS BIGINT)
             + (SELECT CAST(floor(log2(CAST(nr + {_X42_B} AS DOUBLE))
                                  * {_X42_Q}) AS BIGINT)
                     - CAST(floor(log2(CAST(nt + {_X42_B} AS DOUBLE))
                                  * {_X42_Q}) AS BIGINT) FROM tot) AS tq
        FROM raw LEFT JOIN tgt USING (b)
    ),
    wt AS (
        SELECT dc.doc_id, sum(dc.cnt * m.tq) AS weight_q,
               CAST(sum(dc.cnt) AS BIGINT) AS n_tokens
        FROM dc JOIN model m USING (b) GROUP BY 1
    ),
    pri AS (
        SELECT doc_id, weight_q, n_tokens,
               weight_q + CAST(floor(-log2(-log2(
                   (CAST(('0x' || substr(md5('dsir' ||
                        CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 1000000 + 0.5) / 1000000.0)) * {_X42_Q}) AS BIGINT)
                   AS priority_q
        FROM wt
    )
    SELECT doc_id,
           CAST(weight_q AS BIGINT) AS weight_q,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(priority_q AS BIGINT) AS priority_q
    FROM pri ORDER BY priority_q DESC, doc_id LIMIT {_X42_K}
    """,
)
def x42_dsir_resample(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): hashed-unigram bag models
    for a target subset (here the doc_id%19 seed sample standing in for
    "quality domain docs") vs the raw corpus; per-doc importance weight
    = sum of count-weighted smoothed log-probability ratios; selection
    by Gumbel top-k with hash-derived deterministic draws. All log2
    terms fixed-point quantized (the x38 pattern) so both engines agree
    bit-for-bit; the model broadcasts (<= 4096 rows) and the top-k is a
    TakeOrdered — scan-shaped at any corpus size."""
    from debezium_spark.analytics.text import dsir_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_topk(
        docs,
        target=F.col("doc_id") % 19 == 0,
        k=_X42_K,
        n_buckets=_X42_B,
    )


# ---------------------------------------------------------------------------
# X43 — model-based quality filtering: Naive Bayes trained on seed labels
# ---------------------------------------------------------------------------
@register(
    "x43_nb_quality",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_NORM} AS s FROM documents),
    tk AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(coalesce(s, ''), ' '),
                           t -> t <> '') AS ts
        FROM d
    ),
    lab AS (
        SELECT doc_id, ts,
               CASE WHEN len(ts) > 0 AND 16 * len(list_filter(ts,
                        t -> list_contains(
                            ['the','a','and','of','to','is','in','that'],
                            t))) >= len(ts)
                    THEN 1 ELSE 0 END AS seed_label
        FROM tk
    ),
    dbc AS (
        SELECT doc_id, seed_label, unnest(ts) AS tok, 1 AS one
        FROM lab
    ),
    dbg AS (
        SELECT doc_id, seed_label, tok, count(*) AS cnt
        FROM dbc GROUP BY 1, 2, 3
    ),
    model AS (
        SELECT tok,
               sum(CASE WHEN seed_label = 1 THEN cnt ELSE 0 END) AS c1,
               sum(CASE WHEN seed_label = 0 THEN cnt ELSE 0 END) AS c0
        FROM dbg GROUP BY 1
    ),
    tot AS (
        SELECT sum(c1) AS n1t, sum(c0) AS n0t, count(*) AS v FROM model
    ),
    tq AS (
        SELECT m.tok,
               CAST(floor(log2(CAST(m.c1 + 1 AS DOUBLE)
                               / CAST(t.n1t + t.v AS DOUBLE))
                          * 1000000000.0) AS BIGINT) AS tq1,
               CAST(floor(log2(CAST(m.c0 + 1 AS DOUBLE)
                               / CAST(t.n0t + t.v AS DOUBLE))
                          * 1000000000.0) AS BIGINT) AS tq0
        FROM model m CROSS JOIN tot t
    ),
    pd AS (
        SELECT g.doc_id, sum(g.cnt * q.tq1) AS s1, sum(g.cnt * q.tq0) AS s0
        FROM dbg g JOIN tq q USING (tok) GROUP BY 1
    ),
    pri AS (
        SELECT sum(CASE WHEN seed_label = 1 THEN 1 ELSE 0 END) AS nd1,
               sum(CASE WHEN seed_label = 0 THEN 1 ELSE 0 END) AS nd0
        FROM lab
    ),
    sc AS (
        SELECT l.doc_id, l.seed_label,
               coalesce(pd.s1, 0)
                 + CAST(floor(log2(CAST(p.nd1 AS DOUBLE)
                                   / CAST(p.nd1 + p.nd0 AS DOUBLE))
                              * 1000000000.0) AS BIGINT) AS q1,
               coalesce(pd.s0, 0)
                 + CAST(floor(log2(CAST(p.nd0 AS DOUBLE)
                                   / CAST(p.nd1 + p.nd0 AS DOUBLE))
                              * 1000000000.0) AS BIGINT) AS q0
        FROM lab l LEFT JOIN pd USING (doc_id) CROSS JOIN pri p
    )
    SELECT doc_id, seed_label,
           CASE WHEN q1 > q0 THEN 1 ELSE 0 END AS pred_label,
           round(CAST(q1 - q0 AS DOUBLE) / 1000000000.0, 6) AS log_odds
    FROM sc
    """,
)
def x43_nb_quality(spark, sf_dir):
    """Model-based quality filtering, the CCNet/fastText bootstrap:
    integer-exact stopword-ratio seed labels, multinomial Naive Bayes
    trained in one token-keyed agg (model bounded by vocabulary, never
    corpus), every document rescored by the learned log-likelihood
    ratio. Per-token log-probs fixed-point quantized (x38's pattern) so
    the per-doc sums replay bit-for-bit in the oracle."""
    from debezium_spark.analytics.text import nb_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return nb_quality(docs)


# ---------------------------------------------------------------------------
# X44 — Bloom-filter decontamination screen (the mergeable-bitset shape of
# x21: benchmark n-grams -> fixed 4 KiB filter, corpus screened join-free)
# ---------------------------------------------------------------------------
_WG3 = (
    f"list_transform(generate_series(1, greatest(1, len({_TOKS}) - 2)),"
    f" i -> array_to_string({_TOKS}[i : i + 2], ' '))"
)
_BLOOM_BITS = 64 * 63


def _bloom_probe_sql(j: int) -> str:
    return f"{_ohash('g', f'bloom{j}:')} % {_BLOOM_BITS}"


@register(
    "x44_bloom_decontaminate",
    oracle=f"""
    WITH bench AS (
        SELECT text FROM documents WHERE doc_id % 97 = 0
    ),
    bg AS (
        SELECT DISTINCT unnest(list_distinct({_WG3})) AS g FROM bench
    ),
    probes AS (
        SELECT {_bloom_probe_sql(0)} AS pos FROM bg
        UNION ALL
        SELECT {_bloom_probe_sql(1)} FROM bg
    ),
    bloom AS (
        SELECT pos // 63 AS w,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
        FROM probes GROUP BY 1
    ),
    cg AS (
        SELECT doc_id, unnest({_WG3}) AS g
        FROM documents WHERE doc_id % 97 <> 0
    ),
    cgp AS (
        SELECT doc_id,
               {_bloom_probe_sql(0)} AS p0,
               {_bloom_probe_sql(1)} AS p1
        FROM cg
    ),
    chk AS (
        SELECT doc_id,
               COALESCE(
                   (b0.bits & (CAST(1 AS BIGINT)
                               << CAST(p0 % 63 AS INT))) <> 0
                   AND (b1.bits & (CAST(1 AS BIGINT)
                                   << CAST(p1 % 63 AS INT))) <> 0,
                   FALSE) AS hit
        FROM cgp
        LEFT JOIN bloom b0 ON b0.w = p0 // 63
        LEFT JOIN bloom b1 ON b1.w = p1 // 63
    )
    SELECT doc_id,
           CAST(count(*) AS INT) AS n_grams,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS INT) AS n_hits,
           round(CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hit_frac,
           round(CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) >= 0.8 AS contaminated
    FROM chk GROUP BY doc_id
    """,
)
def x44_bloom_decontaminate(spark, sf_dir):
    """Dolma-style Bloom decontamination: every 97th document plays the
    benchmark set; its distinct word 3-grams fold into a 4 KiB filter
    (64 int64 words, 2 md5 probes — mergeable by OR across benchmark
    shards), and the rest of the corpus screens against the filter as a
    PLAN-LITERAL array — element_at + bitwise AND inside the scan
    projection, zero joins, zero shuffle. Where x21's exact join
    shuffles corpus-vs-benchmark n-grams, this shape screens 100 TB at
    scan speed and hands only the flagged slice to the exact pass.
    Bloom false positives are deterministic (same hashes both engines),
    so the oracle reproduces them bit-for-bit."""
    from debezium_spark.analytics.text import (
        bloom_decontaminate,
        bloom_ngram_build,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bloom = bloom_ngram_build(
        docs.filter(F.col("doc_id") % 97 == 0), n=3, m_words=64, k=2
    )
    return bloom_decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0), bloom, n=3, k=2,
        threshold=0.8,
    )


# ---------------------------------------------------------------------------
# X45 — the two-stage decontamination funnel: Bloom screen (x44's shape)
# feeding the exact n-gram verify (x21's shape) on the FLAGGED slice only
# ---------------------------------------------------------------------------
@register(
    "x45_bloom_then_exact",
    # Bloom filters have NO false negatives, and the exact stage verifies
    # every flagged doc — so the funnel's output is PROVABLY identical to
    # x21's single-stage exact join. Same oracle, different (100 TB) plan.
    oracle=f"""
    WITH grams AS (
        SELECT doc_id, unnest(list_distinct({_WG3})) AS g FROM documents
    ),
    b AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    t AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0)
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM t JOIN b ON t.g = b.g
    GROUP BY t.doc_id
    """,
)
def x45_bloom_then_exact(spark, sf_dir):
    """The production decontamination funnel: stage 1 screens the whole
    corpus against the benchmark's 4 KiB Bloom filter (plan-literal,
    join-free, scan speed); stage 2 runs the exact distinct-n-gram join
    ONLY on documents the filter flagged. At 100 TB the exact join's
    left side shrinks from the corpus to the flagged slice; false
    positives are verified away, false negatives cannot exist, so the
    result equals x21's single-stage answer bit-for-bit — which is
    exactly what the shared oracle asserts."""
    from debezium_spark.analytics.text import (
        bloom_decontaminate,
        bloom_ngram_build,
        contamination_hits,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bloom = bloom_ngram_build(bench, n=3, m_words=64, k=2)
    flagged_ids = (
        bloom_decontaminate(corpus, bloom, n=3, k=2)
        .filter(F.col("n_hits") > 0)
        .select("doc_id")
        # materialize the screen ONCE: without this the whole md5-probe
        # subtree re-evaluates inside the exact stage's plan
        .localCheckpoint(eager=True)
    )
    # No broadcast hint: the flagged set is data-dependent and unbounded
    # (heavy contamination at 100 TB = tens of millions of ids, where a
    # forced broadcast OOMs). AQE broadcasts when the runtime size fits
    # and degrades to a shuffled semi-join when it doesn't.
    flagged = corpus.join(flagged_ids, "doc_id", "left_semi")
    return contamination_hits(flagged, bench)
