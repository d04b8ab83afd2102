"""Sources & sinks: parquet star-schema catalog, reference-format CSV
vector ingest, and partitioned parquet writers."""

from quick_and_easy_vectordb_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from quick_and_easy_vectordb_spark.sources.csv_vectors import (  # noqa: F401
    CHUNKS_SCHEMA,
    empty_chunks,
    read_chunks_csv,
    write_chunks_csv,
)
