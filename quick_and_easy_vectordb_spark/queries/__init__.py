"""The engine's declared query surface.

Every operator from SURVEY.md §2/§2b is exposed here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible) an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
The driver's correctness gate hash-compares the two result sets, so
each pair is written for *bit-identical* values: decimal-exact
aggregation (functions/numeric.py), deterministic fold order for vector
math, and explicit tiebreaks on every top-k/window.

Modules register themselves on import via the ``@query`` decorator in
``registry.py``; importing this package populates the full registry.
"""

from quick_and_easy_vectordb_spark.queries.registry import (  # noqa: F401
    QUERIES,
    QueryDef,
    oracle_sql,
    queries,
    query,
)

# Import for registration side effects — order defines registry order.
from quick_and_easy_vectordb_spark.queries import vector  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import dedup  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import text  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import relational  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import relational_advanced  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import relational_tpch_rest  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import curation  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import events  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import ann  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import multimodal  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import udf_surface  # noqa: F401,E402
