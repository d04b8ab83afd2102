"""Property-based laws for the round-5-continuation operators —
numpy-level checks of the per-row math (fast, no Spark job per
example), mirroring the invariants the oracle-checked queries rely on.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=50, deadline=None)

finite = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
)


def _sq8_dequant(xs: list[float]) -> list[float]:
    """Reference SQ8 per-dimension dequantization over one 'corpus' of
    values sharing a dimension: [min,max] train, 256-bin floor code,
    bin-midpoint reconstruction — the formula both engines evaluate."""
    mn, mx = min(xs), max(xs)
    span = mx - mn
    out = []
    for x in xs:
        if span > 0:
            code = min(255.0, np.floor((x - mn) * 256.0 / span))
            out.append(mn + (code + 0.5) * span / 256.0)
        else:
            out.append(mn)
    return out


@given(st.lists(finite, min_size=2, max_size=20))
@SETTINGS
def test_sq8_dequant_stays_inside_trained_range(xs):
    """Reconstruction never leaves [mn, mx]: codes clamp at 255 and the
    top bin's midpoint is mn + 255.5/256·span < mx + ulp slack."""
    mn, mx = min(xs), max(xs)
    span = mx - mn
    for v in _sq8_dequant(xs):
        assert mn <= v <= mx + 1e-9 * max(1.0, abs(mx))
        if span > 0:
            # midpoint reconstruction error is at most half a bin
            # (+ float slack)
            pass


@given(st.lists(finite, min_size=2, max_size=20))
@SETTINGS
def test_sq8_quantization_error_bounded_by_half_bin(xs):
    """|x − dequant(x)| ≤ span/512 (half a bin) + float slack — the
    contract that makes SQ8 scores a usable ranking proxy."""
    mn, mx = min(xs), max(xs)
    span = mx - mn
    dq = _sq8_dequant(xs)
    bound = span / 512.0 + 1e-9 * max(1.0, abs(mx), abs(mn))
    for x, v in zip(xs, dq):
        assert abs(x - v) <= bound


def _ahash_bits(g3: np.ndarray, w: int, h: int) -> str:
    ts, tn = int(g3.sum()), 3 * w * h
    bits = []
    for by in range(8):
        y0, y1 = by * h // 8, (by + 1) * h // 8
        for bx in range(8):
            x0, x1 = bx * w // 8, (bx + 1) * w // 8
            s = int(g3[y0:y1, x0:x1].sum())
            npx = 3 * (y1 - y0) * (x1 - x0)
            bits.append("1" if s * tn > ts * npx else "0")
    return "".join(bits)


@given(
    st.integers(min_value=8, max_value=16),
    st.integers(min_value=8, max_value=16),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=1, max_value=3),
)
@SETTINGS
def test_ahash_invariant_under_brightness_gain(w, h, seed, gain):
    """aHash compares each block to the image mean, so a positive
    multiplicative brightness gain (no clipping) leaves every bit
    unchanged — the property that makes it a perceptual (not exact)
    fingerprint. Integer gains keep all sums exact."""
    rng = np.random.default_rng(seed)
    g3 = rng.integers(0, 200, size=(h, w)).astype(np.int64)
    assert _ahash_bits(g3, w, h) == _ahash_bits(g3 * gain, w, h)


@given(st.integers(min_value=0, max_value=1499))
@SETTINGS
def test_fuzzy_match_blocking_never_loses_the_true_match(custkey):
    """The entity-resolution blocking key (last 2 chars) survives the
    typo model (deletion at position 10..15 of an 18-char name), so
    the true match is ALWAYS inside the probed block — blocking
    recall is exactly 1.0 by construction, never approximate."""
    name = f"Customer#{custkey:09d}"
    pos = 10 + custkey % 6  # 1-based deletion position, ≤ 15
    dirty = name[: pos - 1] + name[pos:]
    assert dirty[-2:] == name[-2:]
    # and the corruption is exactly one deletion
    assert len(dirty) == len(name) - 1


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40))
@SETTINGS
def test_simpson_diversity_bounds_and_extremes(counts):
    """0 ≤ Simpson < 1; 0 iff a single type; increases toward
    (k−1)/k for k equal types — the lexical-diversity contract
    text_token_diversity filters on."""
    n = sum(counts)
    if n == 0:
        return
    sumsq = sum(c * c for c in counts)
    simpson = 1.0 - sumsq / (n * n)
    assert 0.0 <= simpson < 1.0
    nz = [c for c in counts if c > 0]
    if len(nz) == 1:
        assert simpson == 0.0
