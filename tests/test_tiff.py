"""Baseline TIFF codec (operators/tiff.py): roundtrips, PackBits
crafted cases, encoder golden pin, and out-of-subset guards.

The guards matter as much as the happy path: the decoder must REFUSE
(not silently mis-decode) every TIFF structure outside the supported
subset — Deflate/JPEG compression, tiles, planar=2, 16-bit, palette —
because a wrong-but-plausible raster would flow straight into the
oracle-checked statistics queries.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from quick_and_easy_vectordb_spark.operators.multimodal import decode_image
from quick_and_easy_vectordb_spark.operators.tiff import (
    lzw_decode_tiff,
    lzw_encode_tiff,
    packbits_decode,
    packbits_encode,
    tiff_decode_pages,
    tiff_encode,
)


def _raster_rgb(w, h, seed):
    i = np.arange(w * h, dtype=np.int64)
    return np.stack(
        [(seed * (17 + 10 * c) + i) % 256 for c in range(3)], axis=1
    ).astype(np.uint8).reshape(h, w, 3)


def _raster_gray(w, h, seed):
    i = np.arange(w * h, dtype=np.int64)
    return ((seed * 13 + (i // 4) * 5) % 256).astype(np.uint8).reshape(h, w)


# ---------------------------------------------------------------------------
# PackBits
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"A",
        b"AB",
        b"AAA",  # minimum run
        b"A" * 128,  # exactly one max repeat packet
        b"A" * 129,  # run splits across packets
        b"A" * 300,
        bytes(range(129)),  # literal splits across packets
        b"AB" + b"C" * 3 + b"DE",  # literal-run-literal
        b"AAABBBCCCD" * 50,
        bytes([1, 1, 2, 2, 3, 3]),  # 2-runs stay literal (spec greedy)
    ],
)
def test_packbits_roundtrip(data):
    assert packbits_decode(packbits_encode(data), len(data)) == data


def test_packbits_decode_noop_and_short():
    # -128 (0x80) is a spec noop and must be skipped.
    assert packbits_decode(b"\x80\x02ABC", 3) == b"ABC"
    # A stream ending short of the expected byte count is an error,
    # never a silently truncated raster.
    with pytest.raises(ValueError, match="short"):
        packbits_decode(b"\x01AB", 5)


def test_packbits_run_encoding_is_spec_shaped():
    # 5-byte run -> control 257-5=252, then the byte.
    assert packbits_encode(b"Z" * 5) == bytes([252]) + b"Z"
    # 3 literals -> control 2 (n+1 bytes follow).
    assert packbits_encode(b"XYZ") == bytes([2]) + b"XYZ"


# ---------------------------------------------------------------------------
# Encode/decode roundtrips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_tiff_roundtrip_multipage(bo, comp):
    rgb = _raster_rgb(13, 7, 5)
    gray = _raster_gray(9, 11, 5)
    b = tiff_encode([rgb, gray], byteorder=bo, compression=comp,
                    rows_per_strip=3)
    pages = tiff_decode_pages(b)
    assert len(pages) == 2
    assert np.array_equal(pages[0], rgb)
    assert np.array_equal(pages[1], gray[:, :, None])


def test_lzw_roundtrip_crossing_width_boundaries():
    """20k low-entropy bytes force > 1023 table entries plus a table
    reset — both early-change bumps and the Clear path in one
    stream; KwKwK (ABABAB...) separately."""
    import random

    rng = random.Random(3)
    data = bytes(rng.randrange(5) for _ in range(20000))
    assert lzw_decode_tiff(lzw_encode_tiff(data), len(data)) == data
    kwk = b"AB" * 500  # immediate reuse of the just-added entry
    assert lzw_decode_tiff(lzw_encode_tiff(kwk), len(kwk)) == kwk


def test_lzw_stream_shape_and_errors():
    # Stream opens with Clear (code 256 in 9 bits: 1000_0000 0...).
    enc = lzw_encode_tiff(b"A")
    assert enc[0] == 0x80
    with pytest.raises(ValueError, match="short"):
        lzw_decode_tiff(enc, 5)  # demand more than encoded
    # A non-literal code right after Clear is malformed.
    first = (256 << 9) | 300  # Clear, then code 300
    first_bits = first << 6  # pad 18 -> 24 bits
    with pytest.raises(ValueError, match="literal after Clear"):
        lzw_decode_tiff(first_bits.to_bytes(3, "big"), 4)
    # Clear, literal 'A', then a code beyond the table (300 > 258).
    acc = (((256 << 9) | 65) << 9) | 300  # 27 bits
    bits = acc << 5  # pad to 32
    with pytest.raises(ValueError, match="out of range"):
        lzw_decode_tiff(bits.to_bytes(4, "big"), 4)


def test_tiff_single_strip_and_uneven_last_strip():
    # h=5 with rows_per_strip=4: last strip is 1 row; also h < rps.
    g = _raster_gray(6, 5, 3)
    for rps in (4, 64):
        pages = tiff_decode_pages(
            tiff_encode([g], compression=32773, rows_per_strip=rps)
        )
        assert np.array_equal(pages[0], g[:, :, None])


def test_decode_image_dispatches_tiff_page0():
    rgb = _raster_rgb(8, 6, 9)
    for bo in ("<", ">"):
        b = tiff_encode([rgb, _raster_gray(4, 4, 9)], byteorder=bo)
        assert b[:2] == (b"II" if bo == "<" else b"MM")
        img = decode_image(b)
        assert np.array_equal(img, rgb)


def test_encoder_golden_md5_pinned():
    """Byte-for-byte pin of the encoder output for a fixed input, both
    endiannesses x all three compressions — any layout drift (IFD order,
    overflow placement, strip math) fails here even if the decoder
    drifts with it."""
    rgb = _raster_rgb(10, 6, 42)
    gray = _raster_gray(7, 9, 42)
    digests = {
        (bo, comp): hashlib.md5(
            tiff_encode([rgb, gray], byteorder=bo, compression=comp,
                        rows_per_strip=3)
        ).hexdigest()
        for bo in ("<", ">")
        for comp in (1, 5, 32773)
    }
    assert digests == {
        ("<", 1): "6bfa4c41a19d414f3452826d8d9841c0",
        ("<", 5): "f0f7b53640e5143767a56f6e0880c8d3",
        ("<", 32773): "ecea790f3222d399415706950f831396",
        (">", 1): "aab895543c2b1294bbb22955bf4dd392",
        (">", 5): "2b208a9bcc7f3af935b7090537d1eea9",
        (">", 32773): "a235887de47b3a9d83c15c4a3814e342",
    }


# ---------------------------------------------------------------------------
# Out-of-subset guards
# ---------------------------------------------------------------------------

def _patch_tag(b: bytes, tag: int, *, new_tag: int | None = None,
               new_value: int | None = None) -> bytes:
    """Patch the first IFD: rewrite a tag's id or its inline value."""
    bo = "<" if b[:2] == b"II" else ">"
    (ifd,) = struct.unpack(bo + "I", b[4:8])
    (n,) = struct.unpack(bo + "H", b[ifd : ifd + 2])
    buf = bytearray(b)
    for k in range(n):
        pos = ifd + 2 + 12 * k
        t, typ, cnt = struct.unpack(bo + "HHI", b[pos : pos + 8])
        if t == tag:
            if new_tag is not None:
                buf[pos : pos + 2] = struct.pack(bo + "H", new_tag)
            if new_value is not None:
                fmt = "H" if typ == 3 else "I"
                width = 2 if typ == 3 else 4
                buf[pos + 8 : pos + 8 + width] = struct.pack(
                    bo + fmt, new_value
                )
            return bytes(buf)
    raise AssertionError(f"tag {tag} not found")


def test_rejects_unsupported_compression():
    b = tiff_encode([_raster_gray(4, 4, 1)])
    deflate = _patch_tag(b, 259, new_value=8)  # Deflate: out of subset
    with pytest.raises(NotImplementedError, match="compression 8"):
        tiff_decode_pages(deflate)


def test_tiled_layout_validation():
    """Round 13: tiled layout is now SUPPORTED (roundtrips in
    test_tiled_and_palette below); malformed tile geometry fails with
    format-level diagnostics."""
    with pytest.raises(ValueError, match="multiples of 16"):
        tiff_encode([_raster_gray(40, 40, 1)], tile=(10, 16))
    b = tiff_encode([_raster_gray(40, 40, 1)], tile=(16, 16))
    bad = _patch_tag(b, 322, new_value=48)  # TileWidth lies: 2x3 -> grid mismatch
    with pytest.raises(ValueError, match="tile count"):
        tiff_decode_pages(bad)


def test_rejects_16_bit():
    b = tiff_encode([_raster_gray(4, 4, 1)])
    deep = _patch_tag(b, 258, new_value=16)
    with pytest.raises(NotImplementedError, match="8 bits"):
        tiff_decode_pages(deep)


def test_rejects_planar_separate():
    b = tiff_encode([_raster_gray(4, 4, 1)])
    planar2 = _patch_tag(b, 284, new_value=2)
    with pytest.raises(NotImplementedError, match="planar"):
        tiff_decode_pages(planar2)


def test_palette_requires_colormap():
    """Round 13: palette photometric is now SUPPORTED; a palette
    image without its ColorMap tag is malformed, not out-of-subset."""
    b = tiff_encode([_raster_gray(4, 4, 1)])
    pal = _patch_tag(b, 262, new_value=3)
    with pytest.raises(ValueError, match="missing ColorMap"):
        tiff_decode_pages(pal)


def test_rejects_bad_magic_and_cycle():
    with pytest.raises(ValueError, match="byte-order"):
        tiff_decode_pages(b"XX\x2a\x00" + b"\x00" * 8)
    b = tiff_encode([_raster_gray(4, 4, 1)])
    bo = "<"
    (ifd,) = struct.unpack(bo + "I", b[4:8])
    (n,) = struct.unpack(bo + "H", b[ifd : ifd + 2])
    buf = bytearray(b)
    nxt = ifd + 2 + 12 * n
    buf[nxt : nxt + 4] = struct.pack(bo + "I", ifd)  # self-loop
    with pytest.raises(ValueError, match="cyclic"):
        tiff_decode_pages(bytes(buf))


def test_truncated_strip_is_an_error():
    b = tiff_encode([_raster_gray(8, 8, 2)], compression=1,
                    rows_per_strip=64)
    # Shrink the single strip's byte count below the raster size.
    short = _patch_tag(b, 279, new_value=10)
    with pytest.raises(ValueError, match="strip"):
        tiff_decode_pages(short)


# ---------------------------------------------------------------------------
# Predictor 2 (horizontal differencing, TIFF 6.0 section 14)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_predictor2_roundtrip_all_compressions(comp):
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (7, 13, 3)).astype(np.uint8)
    grad = (np.arange(20 * 30 * 3).reshape(20, 30, 3) // 7 % 256).astype(
        np.uint8)
    b = tiff_encode([rgb, grad], compression=comp, rows_per_strip=3,
                    predictor=2)
    pages = tiff_decode_pages(b)
    assert np.array_equal(pages[0], rgb)
    assert np.array_equal(pages[1], grad)


def test_predictor2_actually_helps_lzw_on_gradients():
    """The reason real writers pair predictor 2 with LZW: gradients
    become near-constant difference streams. (JDK cross-check: the
    JDK reads this encoder's predictor-2 LZW output bit-exact —
    recorded in CHECKLOCAL_r12.md.)"""
    grad = (np.arange(20 * 30 * 3).reshape(20, 30, 3) // 7 % 256).astype(
        np.uint8)
    p1 = len(tiff_encode([grad], compression=5, predictor=1))
    p2 = len(tiff_encode([grad], compression=5, predictor=2))
    assert p2 < p1


def test_predictor3_refused():
    b = tiff_encode([_raster_gray(4, 4, 1)], predictor=2)
    fp = _patch_tag(b, 317, new_value=3)
    with pytest.raises(NotImplementedError, match="predictor 3"):
        tiff_decode_pages(fp)
    with pytest.raises(ValueError, match="predictor"):
        tiff_encode([_raster_gray(4, 4, 1)], predictor=3)


def _strict_lzw_decode(data: bytes, expected: int) -> bytes:
    """CONFORMANT early-change decoder that reads EOI at the correct
    width — unlike lzw_decode_tiff it never exits early on byte
    count, so it catches encoder width bugs at the EOI position
    (found by review fuzzing: the final data code's phantom table add
    can land the decoder on its width boundary, and the encoder must
    bump before writing EOI)."""
    acc = nbits = pos = 0

    def get(width):
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated before EOI")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        return code

    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, None
    while True:
        code = get(width)
        if code == 257:
            break
        if code == 256:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, prev = 9, None
            continue
        if prev is None:
            entry = bytes([code])
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(
                f"code {code} out of range (table {len(table)}, w {width})"
            )
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    assert len(out) == expected
    return bytes(out)


def test_lzw_eoi_width_against_strict_decoder():
    """400 low-entropy fuzz cases (the family where the final data
    code lands on the early-change boundary ~1/512 of the time) must
    all be accepted by a decoder that reads EOI at the conformant
    width — pre-fix, several of these seeds produced streams real
    readers would misparse."""
    import random

    for seed in range(400):
        rng = random.Random(seed)
        n = rng.randrange(1, 5000)
        data = bytes(rng.randrange(3) for _ in range(n))
        enc = lzw_encode_tiff(data)
        assert _strict_lzw_decode(enc, n) == data, f"seed {seed}"


def test_rows_per_strip_validation():
    """Malformed strip geometry fails with a format-level diagnostic,
    not a numpy frombuffer error (ADVICE r12)."""
    import struct

    import numpy as np
    import pytest

    from quick_and_easy_vectordb_spark.operators.tiff import (
        tiff_decode_pages,
        tiff_encode,
    )

    img = (np.arange(48, dtype=np.uint8)).reshape(6, 8, 1)
    buf = bytearray(tiff_encode([img], rows_per_strip=3))
    # RowsPerStrip tag is 278; find its value slot and zero it.
    # IFD entries: tag(2) type(2) count(4) value(4), little-endian
    # fixture. Walk the first IFD.
    (ifd_off,) = struct.unpack("<I", buf[4:8])
    (n_entries,) = struct.unpack("<H", buf[ifd_off : ifd_off + 2])
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack("<H", buf[at : at + 2])
        if tag == 278:
            buf[at + 8 : at + 12] = struct.pack("<I", 0)
    with pytest.raises(ValueError, match="RowsPerStrip"):
        tiff_decode_pages(bytes(buf))
    # Strip-count mismatch: claim rps=6 (1 strip) while 2 strips exist.
    buf2 = bytearray(tiff_encode([img], rows_per_strip=3))
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack("<H", buf2[at : at + 2])
        if tag == 278:
            buf2[at + 8 : at + 12] = struct.pack("<I", 6)
    with pytest.raises(ValueError, match="strip count"):
        tiff_decode_pages(bytes(buf2))


def test_tiled_and_palette_roundtrips():
    """Round 13 subset extension: palette-color (photometric 3 +
    ColorMap) and the tiled layout (TIFF 6.0 section 15), in every
    compression, both byte orders, edge tiles clipped."""
    import numpy as np

    idx = (np.arange(7 * 9, dtype=np.uint8).reshape(7, 9, 1) * 5) % 256
    pal = np.stack(
        [(np.arange(256) * (3 + c) % 256) * 257 for c in range(3)]
    )
    expect = np.stack(
        [(idx[:, :, 0].astype(np.uint32) * (3 + c) % 256)
         for c in range(3)],
        axis=2,
    ).astype(np.uint8)
    for comp in (1, 32773, 5):
        (page,) = tiff_decode_pages(
            tiff_encode([idx], compression=comp, palette=pal,
                        rows_per_strip=3)
        )
        assert np.array_equal(page, expect), comp

    img = ((np.arange(37 * 50 * 3, dtype=np.uint32) * 7) % 256)         .astype(np.uint8).reshape(37, 50, 3)
    for bo in ("<", ">"):
        for comp in (1, 32773, 5):
            (page,) = tiff_decode_pages(
                tiff_encode([img], byteorder=bo, compression=comp,
                            tile=(16, 16))
            )
            assert np.array_equal(page, img), (bo, comp)

    # both at once: tiled palette, LZW
    (page,) = tiff_decode_pages(
        tiff_encode([idx], palette=pal, tile=(16, 16), compression=5)
    )
    assert np.array_equal(page, expect)


# ---------------------------------------------------------------------------
# Predictor 2 x tiled layout (TIFF 6.0 sections 14 + 15 combined)
# ---------------------------------------------------------------------------

def test_tiled_predictor2_roundtrip_all_compressions():
    rng = np.random.RandomState(14)
    rgb = rng.randint(0, 256, (23, 40, 3)).astype(np.uint8)
    gray = (np.arange(20 * 35, dtype=np.uint32).reshape(20, 35, 1)
            * 11 % 256).astype(np.uint8)
    for comp in (1, 32773, 5):
        for bo in ("<", ">"):
            pages = tiff_decode_pages(
                tiff_encode([rgb, gray], byteorder=bo, compression=comp,
                            tile=(16, 16), predictor=2)
            )
            assert np.array_equal(pages[0], rgb), (comp, bo)
            assert np.array_equal(pages[1], gray), (comp, bo)


def test_tiled_predictor2_differences_per_tile_not_per_raster():
    """Conformance pin: with tiles, column 0 of EVERY tile is stored
    raw (each tile decompresses standalone), not differenced against
    the previous tile's last column. libtiff/TIFF 6.0 behavior."""
    img = (np.arange(16 * 32, dtype=np.uint32).reshape(16, 32, 1)
           * 37 % 256).astype(np.uint8)
    b = tiff_encode([img], compression=1, tile=(16, 16), predictor=2)
    # Encoder layout: 8-byte header, then tiles sequentially.
    tile1 = np.frombuffer(b[8 + 256 : 8 + 512], dtype=np.uint8)
    tile1 = tile1.reshape(16, 16)
    raw_col = img[:, 16, 0]
    full_raster_diff = (img[:, 16, 0].astype(int)
                        - img[:, 15, 0].astype(int)) % 256
    assert np.array_equal(tile1[:, 0], raw_col)
    assert not np.array_equal(tile1[:, 0], full_raster_diff)


def test_palette_with_rgb_page_raises():
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    pal = np.stack([np.arange(256) * 257] * 3)
    with pytest.raises(ValueError, match="palette requires 1 sample"):
        tiff_encode([rgb], palette=pal)
