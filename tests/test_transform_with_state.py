"""transformWithStateInPandas (Spark 4 arbitrary-stateful API) — the
env-gated twin of the applyInPandasWithState per-user accumulator.

The API's Python state-server protocol is protobuf-encoded; this
container ships no ``protobuf`` package, so the test SKIPS on the
ImportError (naming the exact missing package, per the torch-backend
gate discipline). On a cluster with protobuf installed it runs the new
API end-to-end against the batch ground truth and the old-API twin.
"""

from __future__ import annotations

import pytest

protobuf = pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas needs the protobuf package "
    "(not shipped in this container)",
)


def test_tws_matches_batch_ground_truth(spark, sf_dir):
    from pyspark.sql import functions as F

    from quick_and_easy_vectordb_spark.queries.events import (
        run_stream_transform_with_state,
    )
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    got = {
        r.user_id: (r.n_events, r.first_us, r.last_us)
        for r in run_stream_transform_with_state(spark, sf_dir).collect()
    }
    want = {
        r.user_id: (r.n_events, r.first_us, r.last_us)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    }
    assert got == want
