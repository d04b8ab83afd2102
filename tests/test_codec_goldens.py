"""External golden fixtures for the PNG / JPEG / WAV decoders.

Every other codec test round-trips bytes this repo's own encoders
produced, so a mutual encoder/decoder deviation from the spec would
pass undetected (the round-8 GIF goldens closed this for GIF with
canonical public tracking-pixel bytes). These fixtures were emitted by
a real third-party codec suite — the JDK (javax.imageio,
javax.sound.sampled), driven once by tools/gen_codec_goldens.py — and
committed to tests/fixtures/codec_goldens.json together with, for the
lossy JPEGs, the JDK's own decode of the same bytes.

Notable: the JDK writes 4:2:0 chroma-subsampled JPEG (the layout
real-world JPEGs actually use), which is exactly what forced the
round-9 decoder generalization from 4:4:4-only to arbitrary sampling
factors.
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np

from quick_and_easy_vectordb_spark.operators.multimodal import (
    decode_audio,
    decode_image,
)

_FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                    "codec_goldens.json")


def _golden(key: str) -> dict:
    with open(_FIX) as f:
        return json.load(f)[key]


def test_png_golden_external_bit_exact():
    g = _golden("png")
    img = decode_image(base64.b64decode(g["b64"]))
    assert img.shape == (g["h"], g["w"], 3)
    assert img.tolist() == g["pixels"]


def test_jpeg_golden_external_flat_matches_jdk_decode_exactly():
    """Flat color → constant chroma → the JDK's triangle-filter
    upsample and this repo's nearest-neighbor upsample agree, so the
    comparison pins Huffman/dequant/IDCT/YCbCr bit-for-bit against a
    third-party decoder (measured diff at generation time: 0)."""
    g = _golden("jpeg_flat")
    img = decode_image(base64.b64decode(g["b64"]))
    jdk = np.array(g["jdk_pixels"])
    assert img.shape == jdk.shape
    assert int(np.abs(img.astype(int) - jdk).max()) == 0


def test_jpeg_golden_external_gradient_within_upsample_tolerance():
    """Smooth gradient: the two decoders see identical coefficients;
    the only divergence is chroma upsample filtering (triangle vs
    nearest), bounded by the local chroma slope. Measured max diff at
    generation time: 7 — pinned at <= 8 so any entropy-decode or IDCT
    regression (which shifts whole blocks, not edge pixels) fails."""
    g = _golden("jpeg_gradient")
    img = decode_image(base64.b64decode(g["b64"]))
    jdk = np.array(g["jdk_pixels"])
    d = np.abs(img.astype(int) - jdk)
    assert int(d.max()) <= 8
    assert float(d.mean()) < 3.0


def test_tiff_golden_external_packbits_bit_exact():
    """The JDK's TIFFImageWriter emits big-endian ('MM') strip-layout
    PackBits — a third-party encoder pinning the byte-order handling
    AND the RLE decode path independently of this repo's own writer."""
    g = _golden("tiff_packbits")
    raw = base64.b64decode(g["b64"])
    assert raw[:4] == b"MM\x00*"
    img = decode_image(raw)
    assert img.shape == (g["h"], g["w"], 3)
    assert img.tolist() == g["pixels"]


def test_tiff_golden_external_lzw_bit_exact():
    """JDK LZW-compressed TIFF, 32x32 — ~2000 table entries crossing
    the 511 and 1023 early-change width boundaries, the exact timing
    the TIFF-variant LZW decoder must match. (The reverse direction —
    the JDK reading THIS repo's LZW output bit-exact, both byte
    orders — was verified via Py4J at golden-generation time; see
    CHECKLOCAL_r12.md.)"""
    g = _golden("tiff_lzw")
    img = decode_image(base64.b64decode(g["b64"]))
    assert img.shape == (g["h"], g["w"], 3)
    assert img.tolist() == g["pixels"]


def test_wav_golden_external_pcm_exact():
    g = _golden("wav")
    samples, rate = decode_audio(base64.b64decode(g["b64"]))
    assert rate == g["rate"]
    assert samples.shape[1] == g["channels"]
    assert samples.reshape(-1).tolist() == g["samples"]


def test_jpeg_progressive_golden_gray_within_idct_ulp():
    """Full 6-scan grayscale progression (DC first/refine, AC bands
    with successive approximation, EOBRUN): no chroma path in the
    comparison, so the only permitted divergence from the JDK's own
    decode is the float-IDCT rounding ulp."""
    g = _golden("jpeg_progressive_gray")
    img = decode_image(base64.b64decode(g["b64"]))
    jdk = np.array(g["jdk_pixels"], dtype=np.int64)
    assert img.shape == (g["h"], g["w"], 1)
    diff = np.abs(img.astype(np.int64) - jdk)
    assert diff.max() <= 1, diff.max()


def test_jpeg_progressive_golden_flat_matches_jdk_exactly():
    g = _golden("jpeg_progressive_flat")
    img = decode_image(base64.b64decode(g["b64"]))
    jdk = np.array(g["jdk_pixels"], dtype=np.uint8)
    assert np.array_equal(img, jdk)


def test_jpeg_progressive_golden_gradient_within_upsample_tolerance():
    """Color gradient: bounded divergence from the JDK's triangle
    chroma upsample (ours is the spec-conformant nearest neighbor) —
    same class as the baseline jpeg_gradient golden."""
    g = _golden("jpeg_progressive_gradient")
    img = decode_image(base64.b64decode(g["b64"]))
    jdk = np.array(g["jdk_pixels"], dtype=np.int64)
    diff = np.abs(img.astype(np.int64) - jdk)
    assert diff.max() <= 12, diff.max()
    assert diff.mean() <= 3.0, diff.mean()
