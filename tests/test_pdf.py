"""PDF subset extractor (operators/pdf.py) — the reference-implied
capability (PyPDF2 pinned in reference requirements.txt:7, never
imported in app.py). Same discipline as the image codecs: round-trips
against this repo's own writer PLUS a hand-written fixture the writer
did not produce, so a mutual writer/parser spec deviation can't hide.
"""

from __future__ import annotations

import hashlib
import zlib

import pytest

from quick_and_easy_vectordb_spark.operators.pdf import (
    extract_content_text,
    pdf_encode,
    pdf_extract_text,
)


def test_roundtrip_multipage_multiline_escapes():
    pages = [
        "hello world\nsecond line",
        "page two with (parens) and \\backslash\\",
        "BI analyst text",  # 'BI' in TEXT must not trip the image guard
        "",
    ]
    assert pdf_extract_text(pdf_encode(pages)) == pages
    assert pdf_extract_text(pdf_encode(pages, compress=False)) == pages


def test_roundtrip_survives_eol_ending_compressed_payloads():
    """zlib output is arbitrary bytes — payloads ending in 0x0A/0x0D
    truncated by one byte under delimiter-and-strip parsing (the bug
    the direct-/Length path exists for). Sweep enough inputs that the
    compressed tail hits EOL bytes."""
    for did in range(300):
        text = (f"word{did} ") * (10 + did % 37)
        pages = [text[i : i + 180] for i in range(0, len(text), 180)]
        assert pdf_extract_text(pdf_encode(pages)) == pages, did


def test_content_stream_operators():
    """TJ arrays, ' and \" line-advance shows, hex strings, octal
    escapes, T* — on a crafted stream the writer never emits."""
    cs = (
        b"BT /F1 9 Tf 10 700 Td\n"
        b"[(Hel) -20 (lo)] TJ\n"
        b"(next via quote)'\n"
        b'0.5 0.1 (and dquote)"\n'
        b"<2048692068657821> Tj\n"
        b"T*\n"
        b"(octal: \\101\\102) Tj\n"
        b"ET"
    )
    assert extract_content_text(cs) == (
        "Hello\nnext via quote\nand dquote Hi hex!\noctal: AB"
    )


def test_td_with_zero_dy_stays_on_line():
    cs = b"BT (a) Tj 5 0 Td (b) Tj 0 -14 Td (c) Tj ET"
    assert extract_content_text(cs) == "ab\nc"


def test_handwritten_fixture_not_from_our_writer():
    """A complete PDF written BY HAND (uncompressed stream, different
    object numbering and layout than pdf_encode's) — parser-only
    evidence, mirroring the external codec goldens."""
    content = b"BT /Fa 11 Tf 50 700 Td (Spark) Tj 0 -14 Td (graft!) Tj ET"
    fixture = (
        b"%PDF-1.4\n"
        b"5 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        b"4 0 obj << /Type /Page /Parent 3 0 R /Contents 5 0 R >> endobj\n"
        b"3 0 obj << /Type /Pages /Kids [4 0 R] /Count 1 >> endobj\n"
        b"1 0 obj << /Type /Catalog /Pages 3 0 R >> endobj\n"
        b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_extract_text(fixture) == ["Spark\ngraft!"]


def test_fake_obj_marker_inside_compressed_stream_is_skipped():
    """Stream payloads are arbitrary bytes: plant a literal 'N 0 obj'
    marker inside a Flate stream and require the parser to not split
    on it (direct /Length bounds the stream; markers inside are
    phantoms)."""
    payload = zlib.compress(b"BT (real text) Tj ET", 0)  # stored: bytes survive
    assert b"obj" not in payload  # the marker comes from the wrapper below
    inner = b"BT (x 7 0 obj y) Tj ET"  # marker-looking TEXT too
    data = zlib.compress(inner, 6)
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + data + b"\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    assert pdf_extract_text(doc) == ["x 7 0 obj y"]


def test_guards_raise_named_errors():
    with pytest.raises(ValueError):
        pdf_extract_text(b"not a pdf")
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf_extract_text(b"%PDF-1.4\ntrailer << /Encrypt 9 0 R >>\n%%EOF")
    with pytest.raises(NotImplementedError, match="inline images"):
        extract_content_text(b"BT BI /W 2 ID xx EI ET")
    # unsupported filter chain (LZW) on a referenced content stream
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 2 /Filter /LZWDecode >>\nstream\nxx\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        pdf_extract_text(doc)


def test_encode_golden_pinned():
    """Writer drift detector: pdf_encode output is deterministic
    (fixed object layout, zlib level 6). If this pin moves, page
    goldens and the oracle-checked lossless contract need re-review."""
    b = pdf_encode(["abc", "def"])
    assert b.startswith(b"%PDF-1.4\n")
    assert hashlib.md5(b).hexdigest() == "bff2d21958caf9508c80f99a5007fe5d"
