"""Driver-fixture smoke: execute EVERY registered query against the
actual `/root/testdata/sf0.001` parquet fixtures.

Round 3 shipped 109 green unit tests while 8 fixture-facing queries were
broken, because every test built its own synthetic DataFrames — a
regenerated fixture silently changed `events.ts` from TIMESTAMP(NANOS)
to timestamp[us] NTZ and nothing in `tests/` ever touched the real
files. This module closes that gap: any future fixture/schema drift
that breaks plan analysis or execution fails here, locally, before the
driver's gate sees it.

Each query is planned AND executed (`.limit(5).collect()`): analysis
exceptions (the round-3 failure mode) surface at `.limit`, and the tiny
collect forces at least one job through the real file scan. This is a
drift tripwire, not a correctness check — value correctness is
tools/check.py's DuckDB oracle gate.
"""

from __future__ import annotations

import os

import pytest

from quick_and_easy_vectordb_spark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver fixtures not present"
)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_on_driver_fixture(spark, name):
    df = QUERIES[name].fn(spark, SF_SMOKE)
    rows = df.limit(5).collect()
    assert rows is not None  # empty is legal; throwing is the failure
