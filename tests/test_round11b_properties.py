"""Property-based tests for the round-11 second-session algorithmic
cores. All three properties are pure python (no Spark session), so
they run at full hypothesis example counts:

1. protobuf wire format — roundtrip identity for arbitrary values
   (including unicode strings), size formula correctness, and the
   spec's unknown-field tolerance under arbitrary injected fields.
2. hex binning — the two-candidate nearest-center rule equals a
   brute-force search over a 5x5 center neighborhood (the claim that
   justifies evaluating only the rows below/above).
3. grouped EWMA — the a=0.5 recursion equals the dyadic closed form
   bitwise for ANY integer series within the documented bounds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from quick_and_easy_vectordb_spark.operators.protowire import (
    decode_doc,
    decode_varint,
    encode_doc,
    encode_varint,
    varint_size,
)

SETTINGS = settings(max_examples=200, deadline=None)

uint64 = st.integers(min_value=0, max_value=2**63 - 1)
text = st.text(max_size=40)


@given(uint64)
@SETTINGS
def test_varint_roundtrip_and_size(v):
    enc = encode_varint(v)
    assert len(enc) == varint_size(v)
    got, pos = decode_varint(enc, 0)
    assert (got, pos) == (v, len(enc))


@given(uint64, text, text, uint64)
@SETTINGS
def test_doc_roundtrip(doc_id, lang, source, n_chars):
    wire = encode_doc(doc_id, lang, source, n_chars)
    assert decode_doc(wire) == {
        "doc_id": doc_id, "lang": lang, "source": source,
        "n_chars": n_chars,
    }


@given(
    uint64, text, uint64,
    st.integers(min_value=5, max_value=15),  # unknown field number
    st.one_of(uint64, st.binary(max_size=20)),  # unknown payload
)
@SETTINGS
def test_decoder_skips_arbitrary_unknown_fields(doc_id, lang, n_chars,
                                                field, payload):
    """Spec forward-compatibility for ANY unknown field inserted
    between known fields."""
    if isinstance(payload, int):
        unknown = bytes([(field << 3) | 0]) + encode_varint(payload)
    else:
        unknown = (
            bytes([(field << 3) | 2])
            + encode_varint(len(payload))
            + payload
        )
    lb = lang.encode("utf-8")
    wire = (
        bytes([(1 << 3) | 0]) + encode_varint(doc_id)
        + unknown
        + bytes([(2 << 3) | 2]) + encode_varint(len(lb)) + lb
        + bytes([(4 << 3) | 0]) + encode_varint(n_chars)
    )
    got = decode_doc(wire)
    assert got["doc_id"] == doc_id
    assert got["lang"] == lang
    assert got["n_chars"] == n_chars


# --- hex binning: mirror of the query's integer assignment rule ----

_HS, _VS, _H2 = 2000, 1732, 1000


def _assign(x2, y2):
    """The query's two-candidate rule (queries/geo.py:geo_hex_binning),
    in pure python."""
    best = None
    j1 = y2 // _VS
    for j in (j1, j1 + 1):
        ox = (j % 2) * _H2
        i = (x2 - ox + _H2) // _HS
        cx, cy = i * _HS + ox, j * _VS
        d = (x2 - cx) ** 2 + (y2 - cy) ** 2
        if best is None or d < best[0]:
            best = (d, i, j)
    return best


@given(
    st.integers(min_value=0, max_value=2 * 36000 - 1),
    st.integers(min_value=2 * _VS, max_value=2 * 18000 - 1),
)
@SETTINGS
def test_hex_two_candidates_equal_brute_force(x2, y2):
    """The chosen center must be a GLOBAL nearest center: brute-force
    over the 5x5 neighborhood of candidate rows/columns never finds a
    strictly closer one."""
    d_got = _assign(x2, y2)[0]
    j0 = y2 // _VS
    best = None
    for j in range(j0 - 2, j0 + 3):
        ox = (j % 2) * _H2
        i0 = (x2 - ox + _H2) // _HS
        for i in range(i0 - 2, i0 + 3):
            cx, cy = i * _HS + ox, j * _VS
            d = (x2 - cx) ** 2 + (y2 - cy) ** 2
            if best is None or d < best:
                best = d
    assert d_got == best


# --- EWMA dyadic exactness ----------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=96), min_size=1,
                max_size=60))
@SETTINGS
def test_ewma_recursion_equals_closed_form(xs):
    """For any integer series in [0, 96], the a=0.5 recursion with
    24-row block resets equals 0.5^j * (v_0 + .. + v_j) BITWISE at
    every step (the udf_grouped_ewma oracle identity)."""
    s = 0.0
    for i, x in enumerate(xs):
        j = i % 24
        s = float(x) if j == 0 else 0.5 * x + 0.5 * s
        block = xs[i - j : i + 1]
        acc = block[0]
        for m in range(1, j + 1):
            acc += block[m] * (1 << (m - 1))
        assert s == 0.5**j * acc
