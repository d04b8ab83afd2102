"""Protobuf wire-format unit tests — hand-written byte fixtures the
encoder never produced (the codec-golden discipline: the decoder must
parse SPEC bytes, not just its own encoder's output)."""

from __future__ import annotations

import pytest

from quick_and_easy_vectordb_spark.operators.protowire import (
    decode_doc,
    decode_varint,
    encode_doc,
    encode_varint,
    varint_size,
)


def test_varint_spec_examples():
    # protobuf.dev encoding guide: 150 -> 0x96 0x01
    assert encode_varint(150) == b"\x96\x01"
    assert decode_varint(b"\x96\x01", 0) == (150, 2)
    assert encode_varint(0) == b"\x00"
    assert encode_varint(127) == b"\x7f"
    assert encode_varint(128) == b"\x80\x01"
    for v in (0, 1, 127, 128, 300, 2**21 - 1, 2**21, 2**63 - 1):
        got, pos = decode_varint(encode_varint(v), 0)
        assert got == v
        assert pos == varint_size(v)


def test_varint_errors():
    with pytest.raises(ValueError):
        decode_varint(b"\x80", 0)  # truncated continuation
    with pytest.raises(ValueError):
        decode_varint(b"\x80" * 11, 0)  # > 10 bytes
    with pytest.raises(ValueError):
        encode_varint(-1)
    # 10 bytes whose shifts are legal but whose VALUE exceeds 2^64-1:
    # nine continuation groups then 0x7F at shift 63 → ~2^70. The spec
    # caps varints at 64 bits; the decoder must reject, not return an
    # unbounded int that would overflow an int64 Arrow column.
    with pytest.raises(ValueError):
        decode_varint(b"\xff" * 9 + b"\x7f", 0)
    # ...but exactly 2^64-1 (the max uint64) still decodes.
    assert decode_varint(b"\xff" * 9 + b"\x01", 0)[0] == 2**64 - 1


def test_decode_hand_written_message():
    """Bytes assembled by hand from the spec, fields OUT of order
    (the wire format permits any field order)."""
    msg = (
        b"\x20\x2a"          # field 4 (n_chars), varint 42
        + b"\x12\x02en"      # field 2 (lang), len 2, "en"
        + b"\x08\x96\x01"    # field 1 (doc_id), varint 150
        + b"\x1a\x03web"     # field 3 (source), len 3, "web"
    )
    assert decode_doc(msg) == {
        "doc_id": 150, "lang": "en", "source": "web", "n_chars": 42
    }


def test_decode_skips_unknown_fields():
    """Spec forward-compatibility: unknown field numbers are skipped,
    known fields around them still parse."""
    msg = (
        b"\x08\x07"            # field 1, varint 7
        + b"\x28\x63"          # field 5 (UNKNOWN), varint 99
        + b"\x32\x04junk"      # field 6 (UNKNOWN), len 4
        + b"\x20\x05"          # field 4, varint 5
    )
    assert decode_doc(msg) == {
        "doc_id": 7, "lang": "", "source": "", "n_chars": 5
    }


def test_decode_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_doc(b"\x12\x05ab")  # length prefix past buffer end
    with pytest.raises(ValueError):
        decode_doc(b"\x0d\x00\x00\x00\x00")  # wire type 5 (I32) unsupported


def test_roundtrip_and_size_formula():
    wire = encode_doc(1234567, "de", "news-crawl", 98765)
    assert decode_doc(wire) == {
        "doc_id": 1234567, "lang": "de", "source": "news-crawl",
        "n_chars": 98765,
    }
    expect = (
        1 + varint_size(1234567)
        + 1 + 1 + 2
        + 1 + 1 + 10
        + 1 + varint_size(98765)
    )
    assert len(wire) == expect
