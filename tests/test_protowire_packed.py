"""Packed-repeated and nested-message wire conformance
(operators/protowire.py round-12 extension): the spec behaviors the
closed-form oracle can't see — expanded-form acceptance, mixed
packed/expanded streams, message merge, unknown-field tolerance
inside nested payloads — plus a hypothesis roundtrip sweep."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from quick_and_easy_vectordb_spark.operators.protowire import (
    decode_event,
    decode_varint,
    encode_event,
    encode_varint,
    varint_size,
)


def _tag(field: int, wtype: int) -> bytes:
    return bytes([(field << 3) | wtype])


@settings(max_examples=200, deadline=None)
@given(
    user_id=st.integers(min_value=0, max_value=2**63 - 1),
    ids=st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                 max_size=50),
    top=st.text(max_size=30),
    n=st.integers(min_value=0, max_value=2**31),
)
def test_event_roundtrip_property(user_id, ids, top, n):
    d = decode_event(encode_event(user_id, ids, top, n))
    assert d["user_id"] == user_id
    assert d["event_ids"] == ids
    assert d["top_type"] == top
    assert d["n_events"] == n


def test_wire_size_matches_closed_form():
    """len(encode_event(...)) must equal the oracle's closed form."""
    ids = [1, 127, 128, 16383, 16384, 2**40]
    top = "click"
    payload = sum(varint_size(v) for v in ids)
    meta = 1 + varint_size(len(top)) + len(top) + 1 + varint_size(6)
    expected = (
        1 + varint_size(300)
        + 1 + varint_size(payload) + payload
        + 1 + varint_size(meta) + meta
    )
    assert len(encode_event(300, ids, top, 6)) == expected


def test_expanded_repeated_form_accepted():
    """Spec: decoders must accept repeated scalars in EXPANDED form
    (one varint record per element) as well as packed."""
    buf = _tag(1, 0) + encode_varint(7)
    for v in (5, 200, 70000):
        buf += _tag(2, 0) + encode_varint(v)
    d = decode_event(buf)
    assert d["user_id"] == 7
    assert d["event_ids"] == [5, 200, 70000]


def test_mixed_packed_and_expanded_concatenate():
    packed = encode_varint(1) + encode_varint(2)
    buf = (
        _tag(2, 2) + encode_varint(len(packed)) + packed
        + _tag(2, 0) + encode_varint(99)
        + _tag(2, 2) + encode_varint(1) + encode_varint(3)
    )
    assert decode_event(buf)["event_ids"] == [1, 2, 99, 3]


def test_nested_message_merge_last_scalar_wins():
    """Two occurrences of the message field merge; the later scalar
    value overwrites (spec message-merge rule)."""
    def meta(top, n):
        tb = top.encode()
        return (
            _tag(1, 2) + encode_varint(len(tb)) + tb
            + _tag(2, 0) + encode_varint(n)
        )

    m1, m2 = meta("view", 3), meta("click", 8)
    buf = (
        _tag(3, 2) + encode_varint(len(m1)) + m1
        + _tag(3, 2) + encode_varint(len(m2)) + m2
    )
    d = decode_event(buf)
    assert d["top_type"] == "click" and d["n_events"] == 8
    # Presence, not truthiness: a later occurrence carrying an
    # EXPLICIT zero / empty string must still overwrite (the falsy
    # merge was a spec deviation caught in review).
    m3 = meta("", 0)  # both fields explicitly on the wire
    buf0 = (
        _tag(3, 2) + encode_varint(len(m1)) + m1
        + _tag(3, 2) + encode_varint(len(m3)) + m3
    )
    d0 = decode_event(buf0)
    assert d0["top_type"] == "" and d0["n_events"] == 0
    # ...while a later occurrence NOT carrying a field leaves the
    # earlier value in place.
    m_partial = _tag(2, 0) + encode_varint(0)  # only n_events=0
    bufp = (
        _tag(3, 2) + encode_varint(len(m1)) + m1
        + _tag(3, 2) + encode_varint(len(m_partial)) + m_partial
    )
    dp = decode_event(bufp)
    assert dp["top_type"] == "view" and dp["n_events"] == 0


def test_unknown_fields_inside_nested_are_skipped():
    tb = b"ok"
    inner = (
        _tag(9, 0) + encode_varint(12345)       # unknown varint
        + _tag(1, 2) + encode_varint(len(tb)) + tb
        + _tag(15, 2) + encode_varint(3) + b"xyz"  # unknown LEN
        + _tag(2, 0) + encode_varint(4)
    )
    buf = _tag(3, 2) + encode_varint(len(inner)) + inner
    d = decode_event(buf)
    assert d["top_type"] == "ok" and d["n_events"] == 4


def test_truncated_packed_payload_raises():
    import pytest

    bad = _tag(2, 2) + encode_varint(5) + b"\x80\x80"  # LEN says 5, 2 left
    with pytest.raises(ValueError):
        decode_event(bad)
    # A packed payload whose last varint is cut mid-group also fails.
    cut = _tag(2, 2) + encode_varint(1) + b"\x80"
    with pytest.raises(ValueError):
        decode_event(cut)


def test_decode_varint_is_the_shared_primitive():
    for v in (0, 1, 127, 128, 300, 2**35, 2**63 - 1):
        enc = encode_varint(v)
        assert len(enc) == varint_size(v)
        assert decode_varint(enc, 0) == (v, len(enc))
