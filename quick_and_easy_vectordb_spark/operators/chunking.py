"""Document chunking: split texts into overlapping windows — the
pipeline stage the reference implies but never built (its
requirements.txt pins PyPDF2 for PDF→text chunking that app.py never
implements; chunks arrive pre-made via CSV, reference app.py:51-58).

``chunk_documents`` produces the reference's chunks-table shape
(chunk_id, document_id, chunk_text) from whole documents:

- fixed-size character windows with configurable overlap (the
  simplest robust chunker; token- or sentence-aware chunkers swap in
  at the same seam),
- chunk ids are (doc_id, chunk index) pairs packed deterministically,
- implemented as sequence() + explode + substring — pure JVM
  expressions, parallel over documents, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chunks_per_doc: int = 10_000,
) -> DataFrame:
    """Explode each document into overlapping character windows.

    Output: ``document_id``, ``chunk_idx`` (0-based), ``chunk_id``
    (= document_id * max_chunks_per_doc + chunk_idx — unique while
    docs stay under ``max_chunks_per_doc`` chunks), ``chunk_text``.
    Empty documents yield no chunks. The final (short) tail window is
    kept — dropping it would lose text.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    txt = F.col(text_col)
    # starts: 1, 1+step, 1+2*step, ... while start <= length
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(txt), F.lit(1)), F.lit(step)
    )
    out = (
        df.filter(F.length(txt) > 0)
        .select(
            F.col(id_col).alias("document_id"),
            F.posexplode(starts).alias("chunk_idx", "start"),
            txt.alias("__t"),
        )
        .select(
            "document_id",
            "chunk_idx",
            (
                F.col("document_id") * max_chunks_per_doc + F.col("chunk_idx")
            ).alias("chunk_id"),
            F.expr(f"substring(__t, start, {chunk_size})").alias("chunk_text"),
        )
    )
    return out
