"""CSV vector ingest tests — the reference's working wire format
(quoted vector field, SURVEY.md §1.4.4) and its edge cases."""

from __future__ import annotations

import os

from quick_and_easy_vectordb_spark.sources.csv_vectors import (
    CHUNKS_SCHEMA,
    empty_chunks,
    read_chunks_csv,
    write_chunks_csv,
)


def test_read_reference_wire_format(spark, tmp_path):
    p = tmp_path / "chunks.csv"
    p.write_text(
        "chunk_id,document_id,chunk_text,vector_embedding\n"
        '1,doc1,"This is a sample, text.","0.1,0.2,0.3,0.4"\n'
        '2,doc1,"quoted ""inner"" text","0.2,0.3,0.4,0.5"\n'
        '1,doc2,"duplicate chunk_id is permitted","1,2,3,4"\n'
    )
    df = read_chunks_csv(spark, str(p))
    rows = {(r.chunk_id, r.document_id): r for r in df.collect()}
    assert rows[(1, "doc1")].chunk_text == "This is a sample, text."
    assert rows[(1, "doc1")].vector_embedding == [0.1, 0.2, 0.3, 0.4]
    assert rows[(2, "doc1")].chunk_text == 'quoted "inner" text'
    # duplicate chunk_ids representable (reference never enforces
    # uniqueness, app.py:102-118)
    assert (1, "doc2") in rows


def test_roundtrip_write_read(spark, chunks, tmp_path):
    out = os.path.join(str(tmp_path), "out")
    write_chunks_csv(chunks, out)
    back = read_chunks_csv(spark, out)
    a = {r.chunk_id: r.vector_embedding for r in chunks.collect()}
    b = {r.chunk_id: r.vector_embedding for r in back.collect()}
    assert a == b


def test_empty_bootstrap(spark):
    df = empty_chunks(spark)
    assert df.schema == CHUNKS_SCHEMA
    assert df.isEmpty()


def test_malformed_vector_elements_surface_as_nulls(spark, tmp_path):
    """ANSI-mode-safe parse (SURVEY.md §1.4.5 deliberate fix): a
    garbage element becomes NULL inside the array instead of crashing
    the job or silently truncating like np.fromstring."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "chunk_id,document_id,chunk_text,vector_embedding\n"
        '1,doc1,"ok","0.1,0.2,0.3"\n'
        '2,doc1,"bad middle element","0.1,abc,0.3"\n'
        '3,doc1,"empty vector",""\n'
    )
    df = read_chunks_csv(spark, str(p))
    rows = {r.chunk_id: r.vector_embedding for r in df.collect()}
    assert rows[1] == [0.1, 0.2, 0.3]
    assert rows[2][0] == 0.1 and rows[2][1] is None and rows[2][2] == 0.3
    assert rows[3] is None or rows[3] == []
