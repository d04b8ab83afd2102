"""quick_and_easy_vectordb_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system (Abdullah-Kazi/Quick-and-Easy-Vectordb — a brute-force,
exact, in-memory vector similarity search over text chunks;
see /root/reference/app.py:1-193), extended into a complete
large-scale data-pipeline engine:

- parity vector search (raw dot product, top-k, CSV vector ingest,
  append/union, count — reference app.py:40-48, 51-58, 105-118, 189-190)
- similarity-search family (cosine, L2, batch kNN, threshold filter,
  LSH bucketing, IVF-style coarse quantization)
- LLM-data-pipeline operators (exact + near dedup, MinHash/LSH, SimHash,
  n-gram Jaccard, text quality/language/token analysis, fingerprinting)
- relational surface over a star schema (joins, aggregations, windows,
  rollups, set ops, scalar functions)
- event-time windowing (batch + Structured Streaming)
- multimodal binary-column plumbing (mapInPandas, Arrow-batched)

Everything is declared through the DataFrame API so Catalyst handles
predicate pushdown, column pruning, join strategy, and whole-stage
codegen; Python UDFs appear only where JVM expressions cannot express
the semantics, and then always as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from quick_and_easy_vectordb_spark.session import get_spark  # noqa: F401
