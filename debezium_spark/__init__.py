"""debezium_spark — a PySpark-native change-data-capture and analytics engine.

Re-implements the *capabilities* of debezium/debezium (the reference CDC
platform) on Apache Spark: the change-event envelope data model, snapshot +
streaming sources, the SMT transform algebra, merge/upsert sinks, transaction
metadata, signals — plus the large-scale training-data operators (dedup,
similarity search, text analysis) that a 100 TB pipeline needs.

Architecture is Spark-first: every operator is a declarative DataFrame
program so Catalyst/Tungsten/AQE handle optimization; Python UDFs appear only
where DataFrame ops genuinely cannot express the semantics (and then always
Arrow-vectorized).
"""

__version__ = "0.1.0"

from debezium_spark.session import get_spark  # noqa: F401
