"""Baseline-JPEG decoder coverage beyond the DC-only oracle query:
full-FDCT round trips (AC coefficients, ZRL runs, byte stuffing),
4:4:4 color with BT.601 conversion, restart markers, and the
documented NotImplementedError boundaries (progressive, subsampling).

The encoder here is test-only: forward DCT via the same orthogonal
basis the decoder inverts, so a round trip isolates the entropy-coding
and indexing layers (zigzag, Huffman, DC prediction, run-lengths) —
any bug there shifts whole coefficients and fails the ±1 tolerance by
a mile; the ±1 itself is the expected quantization-free float-IDCT
rounding bound."""

from __future__ import annotations

import numpy as np
import pytest

from quick_and_easy_vectordb_spark.operators.multimodal import (
    _JPEG_ZIGZAG,
    _jpeg_idct_matrix,
    decode_image,
)
from quick_and_easy_vectordb_spark.queries.multimodal import (
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    _jpeg_canonical_codes,
    _jpeg_seg,
    _JpegBitWriter,
    jpeg_encode_gray_dc,
)

_DC = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
_AC = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
_A = _jpeg_idct_matrix()


def _encode_block(bwr: _JpegBitWriter, fblock: np.ndarray, pred: int) -> int:
    """FDCT + quant(1) + zigzag + Huffman for one 8x8 block."""
    coef = _A @ (fblock - 128.0) @ _A.T
    zz = np.rint(coef.flatten()[_JPEG_ZIGZAG]).astype(int)
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    ln, code = _DC[s]
    bwr.put(code, ln)
    if s:
        bwr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    k, run = 1, 0
    while k < 64:
        v = int(zz[k])
        if v == 0:
            run += 1
        else:
            while run >= 16:
                ln, code = _AC[0xF0]
                bwr.put(code, ln)
                run -= 16
            s2 = abs(v).bit_length()
            ln, code = _AC[(run << 4) | s2]
            bwr.put(code, ln)
            bwr.put(v if v >= 0 else v + (1 << s2) - 1, s2)
            run = 0
        k += 1
    if run:
        ln, code = _AC[0x00]
        bwr.put(code, ln)
    return dc


def _headers(w: int, h: int, ncomp: int) -> bytearray:
    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])
    out += _jpeg_seg(0xC0, sof)
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS)
    return out


def _encode_planes(planes: list, restart_interval: int = 0) -> bytes:
    """Interleaved baseline scan over 4:4:4 planes of equal shape."""
    h, w = planes[0].shape
    out = _headers(w, h, len(planes))
    if restart_interval:
        out += _jpeg_seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for cid in range(1, len(planes) + 1):
        sos += bytes([cid, 0x00])
    out += _jpeg_seg(0xDA, sos + bytes([0, 63, 0]))
    bwr = _JpegBitWriter()
    pred = [0] * len(planes)
    mcu, rst = 0, 0
    entropy = bytearray()
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                entropy += bwr.flush()
                bwr = _JpegBitWriter()
                entropy += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = [0] * len(planes)
            for ci, p in enumerate(planes):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
                pred[ci] = _encode_block(bwr, blk, pred[ci])
            mcu += 1
    entropy += bwr.flush()
    return bytes(out) + bytes(entropy) + b"\xff\xd9"


def test_dc_only_blocks_decode_exactly():
    vals = [[(11 * bx + 7 * by + 30) % 256 for bx in range(3)] for by in range(2)]
    img = decode_image(jpeg_encode_gray_dc(vals, 24, 16))
    assert img.shape == (16, 24, 1)
    for by in range(2):
        for bx in range(3):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
            assert (blk == vals[by][bx]).all()


def test_full_fdct_gray_roundtrip_within_one():
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 256, size=(32, 40)).astype(float) * 0.3 + 90).astype(
        np.uint8
    )
    dec = decode_image(_encode_planes([img]))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_color_444_neutral_chroma_is_gray():
    """Y varying, Cb=Cr=128 → the BT.601 conversion must return
    R=G=B=Y exactly (the chroma terms are exactly zero)."""
    y = np.tile(np.arange(16, dtype=np.uint8).reshape(1, 16) * 12 + 20, (8, 1))
    flat = np.full_like(y, 128)
    dec = decode_image(_encode_planes([y, flat, flat]))
    assert dec.shape == (8, 16, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    assert (dec[:, :, 1] == dec[:, :, 2]).all()
    assert np.abs(dec[:, :, 0].astype(int) - y.astype(int)).max() <= 1


def test_restart_markers_reset_dc_prediction():
    rng = np.random.default_rng(21)
    img = (rng.integers(0, 256, size=(16, 48)).astype(float) * 0.3 + 80).astype(
        np.uint8
    )
    with_rst = decode_image(_encode_planes([img], restart_interval=2))[:, :, 0]
    without = decode_image(_encode_planes([img]))[:, :, 0]
    assert (with_rst == without).all()
    assert np.abs(with_rst.astype(int) - img.astype(int)).max() <= 1


def test_progressive_supported_relabeled_baseline_is_malformed():
    """Round 13: SOF2 now dispatches to the real progressive decoder.
    A baseline stream merely RELABELED as SOF2 is malformed
    progressive data (its single scan spans Ss=0..Se=63, which Annex
    G forbids — DC and AC must come in separate scans) and must fail
    with a format diagnostic, not decode garbage."""
    vals = [[100]]
    b = bytearray(jpeg_encode_gray_dc(vals, 8, 8))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_image(bytes(b))


def test_progressive_four_scan_roundtrip():
    """The 4-scan progressive encoder (DC first Al=1, AC-first
    EOBRUN, DC refine, AC-refine EOBRUN) decodes bit-exact for flat
    blocks — every Annex G scan kind on one file. Odd DC parities
    exercise the point-transform refinement bit both ways."""
    import numpy as np

    from quick_and_easy_vectordb_spark.queries.multimodal import (
        jpeg_encode_gray_dc_progressive,
    )

    vals = [[7, 128, 255], [100, 101, 0]]
    b = jpeg_encode_gray_dc_progressive(vals, 24, 16)
    assert b[2:4] != b"\xff\xc0" and b"\xff\xc2" in b
    img = decode_image(b)
    assert img.shape == (16, 24, 1)
    for by in range(2):
        for bx in range(3):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
            assert (blk == vals[by][bx]).all(), (bx, by)


def test_progressive_many_blocks_eobrun_classes():
    """37 blocks forces the EOBRUN split across length classes
    (32 + 5) in both the first and refinement AC scans."""
    import numpy as np

    from quick_and_easy_vectordb_spark.queries.multimodal import (
        jpeg_encode_gray_dc_progressive,
    )

    vals = [[(bx * 31 + 57) % 256 for bx in range(37)]]
    b = jpeg_encode_gray_dc_progressive(vals, 37 * 8, 8)
    img = decode_image(b)
    for bx in range(37):
        assert (img[:, bx * 8 : bx * 8 + 8, 0] == vals[0][bx]).all()


def test_single_component_sampling_factors_ignored():
    """Round-9: sampling factors are now supported. For a
    single-component (non-interleaved) scan the factors don't change
    the block raster (JPEG A.2.2), so a grayscale stream claiming 2x2
    sampling must decode identically to the 1x1 original. Subsampled
    COLOR decode is pinned by the external JDK 4:2:0 goldens in
    test_codec_goldens.py."""
    ref = decode_image(jpeg_encode_gray_dc([[100]], 8, 8))
    b = bytearray(jpeg_encode_gray_dc([[100]], 8, 8))
    i = b.index(b"\xff\xc0")
    # component sampling byte sits at SOF payload offset 7
    b[i + 4 + 7] = 0x22  # claim 2x2 sampling
    assert decode_image(bytes(b)).tolist() == ref.tolist()


def test_byte_stuffing_survives():
    """A DC diff pattern that forces 0xFF bytes into the entropy
    stream must round-trip through the unstuffing path."""
    vals = [[255, 0, 255, 0, 255, 0, 255, 0]]
    img = decode_image(jpeg_encode_gray_dc(vals, 64, 8))
    for bx, v in enumerate(vals[0]):
        assert (img[:, bx * 8 : bx * 8 + 8, 0] == v).all()
