"""Every oracle SQL string must PARSE and PLAN in DuckDB.

The fixture smoke suite executes only the Spark side of each query; an
oracle with a syntax error (e.g. the doubled comma a CTE refactor once
introduced) surfaces only in the slow full tools/check.py sweep — or
worse, in the driver's gate. EXPLAIN is parse+bind+plan without
execution, so this covers all registered oracles in seconds.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from quick_and_easy_vectordb_spark.queries import QUERIES
from quick_and_easy_vectordb_spark.sources.catalog import TABLES

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver fixtures not present"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return c


_WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parses_and_plans(con, name):
    con.execute("EXPLAIN " + QUERIES[name].oracle)
