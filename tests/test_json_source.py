"""JSON source round-trip: the engine reads line-delimited JSON with
an explicit schema (schema inference is a full extra pass at scale —
never rely on it) and lands on the same rows as the parquet scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.sources.catalog import load_table


def test_json_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "events_json")
    ev.write.mode("overwrite").json(out)

    back = spark.read.schema(
        "event_id long, user_id long, event_type string, value double"
    ).json(out)
    assert back.count() == ev.count()
    a = ev.agg(
        F.sum("event_id").alias("s"), F.count_distinct("event_type").alias("d")
    ).first()
    b = back.agg(
        F.sum("event_id").alias("s"), F.count_distinct("event_type").alias("d")
    ).first()
    assert (a.s, a.d) == (b.s, b.d)


def test_json_props_column_parses_with_from_json(spark, sf_dir):
    """The events.props JSON strings parse via from_json into typed
    structs — JVM-side, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k long").alias("p")
    ).filter(F.col("p.k").isNotNull())
    assert parsed.count() > 0
