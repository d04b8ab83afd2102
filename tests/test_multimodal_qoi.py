"""QOI codec (round 10): decoder correctness on an image crafted to
exercise EVERY chunk op, plus encode/decode round trips."""

from __future__ import annotations

import numpy as np
import pytest

from quick_and_easy_vectordb_spark.operators.multimodal import (
    _decode_qoi,
    decode_image,
    qoi_encode,
)


def test_all_ops_roundtrip():
    """Pixels chosen so the greedy encoder must emit every op:
    repeats (RUN), ±1 steps (DIFF), +5 steps (LUMA), big jumps (RGB),
    and a return to an earlier value (INDEX)."""
    px = []
    px += [(10, 20, 30)] * 5            # RUN (after initial RGB)
    px += [(11, 21, 31)]                # DIFF (+1,+1,+1)
    px += [(16, 26, 36)]                # LUMA (+5,+5,+5)
    px += [(200, 7, 90)]                # RGB (big jump)
    px += [(10, 20, 30)]                # INDEX (seen before)
    px += [(9, 19, 28)]                 # DIFF (-1,-1,-2)
    px += [(9, 19, 28)] * 70            # RUN > 62 → two run chunks
    px += [(130, 140, 150)]             # RGB
    raster = np.array(px, dtype=np.uint8).reshape(1, len(px), 3)
    payload = qoi_encode(raster)
    # op-coverage: scan the chunk stream
    body = payload[14:-8]
    tags = set()
    pos = 0
    while pos < len(body):
        b1 = body[pos]
        if b1 == 0xFE:
            tags.add("rgb"); pos += 4
        elif b1 == 0xFF:
            tags.add("rgba"); pos += 5
        else:
            t = b1 >> 6
            tags.add(("index", "diff", "luma", "run")[t])
            pos += 2 if t == 2 else 1
    assert {"rgb", "index", "diff", "luma", "run"} <= tags, tags
    img = _decode_qoi(payload)
    assert np.array_equal(img, raster)


def test_magic_dispatch_and_wrap_deltas():
    """decode_image routes qoif payloads; mod-256 channel wraps decode
    correctly through DIFF/LUMA's biased arithmetic."""
    vals = [(254, 254, 254), (255, 255, 255), (0, 0, 0), (1, 1, 1),
            (250, 3, 250)]
    raster = np.array(vals, dtype=np.uint8).reshape(1, 5, 3)
    img = decode_image(qoi_encode(raster))
    assert np.array_equal(img, raster)


def test_random_roundtrip():
    rng = np.random.RandomState(7)
    raster = rng.randint(0, 256, size=(13, 17, 3)).astype(np.uint8)
    img = _decode_qoi(qoi_encode(raster))
    assert np.array_equal(img, raster)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        _decode_qoi(b"nope")


def test_rgba_roundtrip_with_alpha_changes():
    """Round-11 (ADVICE r10): channels=4 is a real path — alpha
    changes emit QOI_OP_RGBA (DIFF/LUMA/RGB all carry the previous
    alpha), and the header's channel count matches the payload."""
    rng = np.random.RandomState(11)
    raster = rng.randint(0, 256, size=(9, 7, 4)).astype(np.uint8)
    payload = qoi_encode(raster, channels=4)
    assert payload[12] == 4
    img = _decode_qoi(payload)
    assert img.shape == (9, 7, 4)
    assert np.array_equal(img, raster)
    # constant-alpha RGBA also round-trips (no RGBA ops needed)
    flat = raster.copy()
    flat[:, :, 3] = 200
    assert np.array_equal(_decode_qoi(qoi_encode(flat, channels=4)), flat)


def test_channels_raster_mismatch_raises():
    """Round-11 (ADVICE r10): a header/payload mismatch is now
    impossible — channels must match the raster's last dimension."""
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    with pytest.raises(ValueError):
        qoi_encode(rgb, channels=4)
    with pytest.raises(ValueError):
        qoi_encode(rgba, channels=3)
    with pytest.raises(ValueError):
        qoi_encode(rgb, channels=2)
