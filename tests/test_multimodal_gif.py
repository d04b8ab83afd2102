"""GIF/LZW codec unit tests (operators/multimodal.py:_decode_gif,
queries/multimodal.py:gif_encode). The oracle query exercises small
images; these push the LZW state machine through every regime the
spec defines: width growth 5->12 bits, dictionary overflow CLEAR at
4096 entries, the code==next ("KwKwK") case, extension skipping, and
the documented interlace boundary."""

import base64

import numpy as np
import pytest

from quick_and_easy_vectordb_spark.operators.multimodal import (
    _gif_lzw_decode,
    decode_image,
)
from quick_and_easy_vectordb_spark.queries.multimodal import gif_encode

PALETTE = [((j * 17) % 256, (j * 29) % 256, (j * 47) % 256) for j in range(16)]
PAL = np.array(PALETTE, dtype=np.uint8)


def roundtrip(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    payload = gif_encode(idx.tobytes(), w, h, PALETTE)
    img = decode_image(payload)
    assert img.shape == (h, w, 3)
    return img


def test_small_image_bit_exact():
    w, h = 11, 9
    idx = ((np.arange(w * h) * 7 + 3) % 16).astype(np.uint8)
    img = roundtrip(idx, w, h)
    assert np.array_equal(img, PAL[idx].reshape(h, w, 3))


def test_kwkwk_pattern():
    # 'aaaa...' forces the code == next-entry case immediately.
    w, h = 16, 4
    idx = np.zeros(w * h, dtype=np.uint8)
    img = roundtrip(idx, w, h)
    assert np.array_equal(img, PAL[idx].reshape(h, w, 3))


def test_dictionary_overflow_clear():
    # Random symbols add ~1 dict entry per 1-2 pixels: 40000 pixels
    # crosses the 4096-entry ceiling several times, so the encoder
    # emits mid-stream CLEARs and the decoder must resynchronize.
    rng = np.random.RandomState(42)
    w, h = 200, 200
    idx = rng.randint(0, 16, size=w * h).astype(np.uint8)
    img = roundtrip(idx, w, h)
    assert np.array_equal(img, PAL[idx].reshape(h, w, 3))


def test_width_growth_regimes():
    # Structured-but-varied data grows the dictionary slowly through
    # each code width 5..12 without overflowing.
    w, h = 128, 64
    i = np.arange(w * h)
    idx = ((i // 3 + i % 5) % 16).astype(np.uint8)
    img = roundtrip(idx, w, h)
    assert np.array_equal(img, PAL[idx].reshape(h, w, 3))


def test_interlace_raises():
    idx = np.zeros(16, dtype=np.uint8)
    payload = bytearray(gif_encode(idx.tobytes(), 4, 4, PALETTE))
    # image descriptor starts after 6+7 header + 48 GCT + 8 GCE bytes;
    # set the interlace bit in its packed field (offset 9 within the
    # 10-byte descriptor).
    desc = 6 + 7 + 48 + 8
    assert payload[desc] == 0x2C
    payload[desc + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_image(bytes(payload))


def test_truncated_stream_raises():
    with pytest.raises(ValueError):
        _gif_lzw_decode(b"\x00", 4, 100)


# ---------------------------------------------------------------------------
# Golden fixtures NOT produced by this repo's encoder. Every other test
# round-trips through gif_encode, so a mutual encoder/decoder deviation
# from the GIF89a spec would pass undetected; these two byte streams are
# the canonical publicly-published 1x1 tracking-pixel GIFs (emitted by
# real third-party encoders, bytes reproduced verbatim in countless spec
# discussions), decoded here against hand-checked expected pixels.
# ---------------------------------------------------------------------------

# GIF89a, 1x1, 2-entry GCT (white, black), GCE, LZW min code size 2,
# data block 44 01 -> single pixel index 0 -> white.
GOLDEN_WHITE_1X1 = base64.b64decode(
    "R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
)
# Same structure, GCT (black, white), transparency flag on index 0;
# the decoder composites without alpha -> pixel is GCT[0] = black.
GOLDEN_TRANSPARENT_1X1 = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def test_golden_external_white_pixel():
    img = decode_image(GOLDEN_WHITE_1X1)
    assert img.shape == (1, 1, 3)
    assert img.tolist() == [[[255, 255, 255]]]


def test_golden_external_transparent_pixel():
    img = decode_image(GOLDEN_TRANSPARENT_1X1)
    assert img.shape == (1, 1, 3)
    assert img.tolist() == [[[0, 0, 0]]]
