"""LLM-training-data pipeline operators (first-class, per the build brief).

Everything here is deterministic and engine-portable: hashes are md5-based
(not Spark's murmur / DuckDB's wyhash, which differ), float reductions are
explicit left-folds in element order so Spark and the DuckDB oracle produce
bit-identical doubles.

Reference anchors: the vector logical types the reference ships
(debezium-connector-common/src/main/java/io/debezium/data/vector/DoubleVector.java:22-33,
FloatVector.java) and the embedding SMT
(debezium-ai/debezium-ai-embeddings/src/main/java/io/debezium/ai/embeddings/FieldToEmbedding.java:51,57-75)
are the bridge: change events carry text/vector columns, and these operators
are what a 100 TB training-data pipeline runs on the materialized tables.
"""

from debezium_spark.analytics.text import (  # noqa: F401
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signature,
    near_dup_pairs,
    normalize_text,
    portable_hash64,
    shingles,
    simhash,
    text_stats,
    tokenize,
)
from debezium_spark.analytics.vectors import (  # noqa: F401
    cosine_similarity,
    field_to_embedding,
    knn_bruteforce,
    knn_lsh,
    sign_lsh_bucket,
)
