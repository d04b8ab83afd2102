"""Baseline TIFF 6.0 codec — pure Python, dependency-free.

The one mainstream still-image container the codec family lacked
(VERDICT r11 item 3). Subset implemented from the public TIFF 6.0
specification (Adobe, 1992) — the same discipline as the other real
decoders in operators/multimodal.py:

* both byte orders (``II`` little-endian, ``MM`` big-endian)
* multi-IFD files (multi-page): the IFD chain is walked to the end
* strip layout: any RowsPerStrip, StripOffsets/StripByteCounts as
  SHORT or LONG arrays, inline or offset-stored
* 8-bit grayscale (SamplesPerPixel=1) and RGB (SamplesPerPixel=3),
  chunky planar configuration
* Compression 1 (none), 32773 (PackBits — the spec's byte-oriented
  run-length scheme), and 5 (TIFF-variant LZW: MSB-first code
  packing with the "early change" width bump — the two documented
  deltas from the GIF LZW variant already implemented in
  operators/multimodal.py)

Round 13 added the TILED layout (TIFF 6.0 section 15 — full
16-multiple tiles, edge padding clipped) and PALETTE-COLOR
(photometric 3 + 16-bit ColorMap, >>8 narrowing), both directions.
Out-of-subset structures raise ``NotImplementedError`` with the
reason (Deflate/JPEG-in-TIFF compression, planar=2, bits != 8,
bilevel photometric) — tested in tests/test_tiff.py, unreachable
from the fixture corpora. The LZW
path is cross-validated against the JDK in BOTH directions (decode
of JDK output bit-exact via the committed golden; JDK reads this
encoder's output bit-exact, both byte orders — Py4J check recorded
in CHECKLOCAL_r12.md).

Reference parity note: the reference app (``/root/reference/app.py``)
has no image path at all; the multimodal column family is part of the
mandated 100 TB training-data-pipeline extension, and TIFF joins
PNM/BMP/PNG/GIF/JPEG/QOI behind the same ``decode_image`` magic
dispatch so the mapInPandas pipelines need no per-format branches.
"""

from __future__ import annotations

import struct

__all__ = ["packbits_encode", "packbits_decode", "lzw_encode_tiff",
           "lzw_decode_tiff", "tiff_encode", "tiff_decode_pages"]

# Tag numbers from the TIFF 6.0 spec, section 8.
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_COLORMAP = 320
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 section 9): control byte n in [0,127] copies the
# next n+1 literal bytes; n in [-127,-1] repeats the next byte 1-n
# times; -128 is a noop.
# ---------------------------------------------------------------------------

def packbits_encode(data: bytes) -> bytes:
    """Greedy spec encoder: runs of >= 3 identical bytes become repeat
    packets (max 128 per packet); everything between becomes literal
    packets (max 128 per packet). Never emits the -128 noop."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)  # two's-complement of 1-run
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode exactly ``expected`` bytes; trailing pad input past the
    expected count is ignored (the spec allows per-row padding)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        else:
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) < expected:
        raise ValueError("PackBits stream ended short of expected bytes")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# TIFF-variant LZW (TIFF 6.0 section 13). Differs from the GIF
# variant (operators/multimodal.py:_gif_lzw_decode) in exactly two
# spec'd ways: codes pack MSB-FIRST, and the code width increments
# ONE CODE EARLY (the "early change": at table size (1<<w)-1, not
# (1<<w)). Clear=256, EOI=257, entries from 258, max 12 bits.
# ---------------------------------------------------------------------------

_LZW_CLEAR = 256
_LZW_EOI = 257


def lzw_encode_tiff(data: bytes) -> bytes:
    """Greedy spec encoder; resets the table (Clear) when the next
    entry would exceed the 12-bit space under early change."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1  # drop emitted bits: keep acc bounded

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(_LZW_CLEAR, width)
    omega = b""
    for byte in data:
        k = bytes([byte])
        if omega + k in table:
            omega += k
            continue
        put(table[omega], width)
        table[omega + k] = next_code
        next_code += 1
        # Width timing: the decoder's table lags the encoder's by one
        # entry (it adds for code k while reading code k+1), and the
        # spec's early change is defined on the DECODER's count
        # ((1<<w)-1, verified bit-exact against JDK LZW output in
        # tests/test_tiff.py). The encoder therefore bumps at 1<<w in
        # its own count — the same wire position.
        if next_code == (1 << width) and width < 12:
            width += 1
        omega = k
        if next_code >= 4094:  # table nearly full: reset
            put(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
    if omega:
        put(table[omega], width)
        # The decoder adds a table entry for EVERY data code after the
        # first — including this final one, which the encoder's
        # mismatch loop never counted. If that phantom add lands the
        # decoder exactly on its early-change boundary, it reads EOI
        # at width+1, so the encoder must bump too (found by fuzzing:
        # without this, ~1/512 strips end with an EOI that conformant
        # readers misparse; tests/test_tiff.py pins the exact case).
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    put(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """Decode exactly ``expected`` bytes (strip byte count bounds the
    input; the raster byte count bounds the output)."""
    out = bytearray()
    # MSB-first bit reader.
    acc = 0
    nbits = 0
    pos = 0

    def get(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return _LZW_EOI  # truncated: treat as end
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1  # drop consumed bits: keep acc bounded
        return code

    # Pre-initialized to the post-Clear state (TIFF streams open with
    # Clear, but a conforming decoder needn't require it).
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = get(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("LZW stream must start with a literal"
                                 " after Clear")
            entry = bytes([code])
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
    if len(out) < expected:
        raise ValueError("LZW stream ended short of expected bytes")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def tiff_encode(pages, byteorder: str = "<", compression: int = 1,
                rows_per_strip: int = 4, predictor: int = 1,
                palette=None, tile=None) -> bytes:
    """Write a (possibly multi-page) baseline TIFF.

    ``pages``: list of numpy uint8 arrays shaped (h, w) or (h, w, 1)
    for grayscale, (h, w, 3) for RGB. ``byteorder``: "<" or ">".
    ``compression``: 1 (none) or 32773 (PackBits), applied per strip
    as the spec requires. ``predictor=2`` applies horizontal
    differencing per row/channel before compression (TIFF 6.0 section
    14 — the standard companion of LZW in real files: gradients
    become near-constant byte streams the dictionary loves). Strips
    of ``rows_per_strip`` rows exercise the multi-strip layout that
    real scanners/writers emit.

    ``palette``: 3x256 16-bit values (sequence or ndarray, R/G/B
    planes) — 1-channel pages are then written photometric 3
    (palette-color) with a ColorMap tag; the raster stays the index
    plane. ``tile=(tw, th)`` (multiples of 16 per TIFF 6.0 section
    15) writes the TILED layout instead of strips: every tile is a
    full tw x th block, edge tiles zero-padded. With both ``tile``
    and ``predictor=2``, differencing is applied independently per
    tile (column 0 of each tile stored raw), the conformant layout
    libtiff reads/writes."""
    if byteorder not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    if compression not in (1, 5, 32773):
        raise ValueError("encoder supports compression 1, 5 (LZW) or "
                         "32773 (PackBits) only")
    if predictor not in (1, 2):
        raise ValueError("predictor 1 (none) or 2 (horizontal) only")
    if palette is not None:
        import numpy as _np

        palette = _np.asarray(palette, dtype=_np.uint32).reshape(3, 256)
        if (palette > 0xFFFF).any():
            raise ValueError("ColorMap entries are 16-bit")
    if tile is not None:
        tw_, th_ = tile
        if tw_ % 16 or th_ % 16 or tw_ <= 0 or th_ <= 0:
            raise ValueError(
                "tile dims must be positive multiples of 16"
            )
    bo = byteorder
    out = bytearray()
    out += b"II" if bo == "<" else b"MM"
    out += struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", 8)  # first IFD offset, patched never: 8
    # Layout: header(8) | page0 strips | page0 IFD+overflow | page1 ...
    # Simpler: header | for each page: IFD placeholder chain built last.
    # We build sequentially: strips first, then the IFD, patching the
    # previous IFD's next-pointer (or the header) as we go.
    next_ptr_at = 4  # where to write the offset of the next IFD
    out[4:8] = b"\x00\x00\x00\x00"

    for raster in pages:
        import numpy as np

        arr = np.asarray(raster, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, spp = arr.shape
        if spp not in (1, 3):
            raise ValueError("1 (gray) or 3 (RGB) samples per pixel")
        if palette is not None and spp != 1:
            raise ValueError(
                "palette requires 1 sample/pixel pages (got spp="
                f"{spp}); a ColorMap cannot apply to an RGB raster"
            )
        row_bytes = w * spp
        if predictor == 2 and tile is None:
            # Horizontal differencing, per row and channel, uint8 wrap.
            # Tiled pages are differenced PER TILE below: TIFF 6.0
            # applies the predictor to each tile's rows independently
            # (each tile decompresses standalone), not across the
            # assembled raster.
            d = arr.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            arr = (d % 256).astype(np.uint8)
        flat = arr.tobytes()

        # Strips (or tiles).
        strip_offsets: list[int] = []
        strip_counts: list[int] = []
        if tile is not None:
            tw_, th_ = tile
            ntx, nty = -(-w // tw_), -(-h // th_)
            padded = np.zeros((nty * th_, ntx * tw_, spp), dtype=np.uint8)
            padded[:h, :w] = arr
            for ty in range(nty):
                for tx in range(ntx):
                    block = padded[ty * th_ : (ty + 1) * th_,
                                   tx * tw_ : (tx + 1) * tw_]
                    if predictor == 2:
                        # Per-tile horizontal differencing: column 0 of
                        # every tile is stored raw, matching libtiff.
                        d = block.astype(np.int16)
                        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
                        block = (d % 256).astype(np.uint8)
                    chunk = block.tobytes()
                    if compression == 32773:
                        chunk = packbits_encode(chunk)
                    elif compression == 5:
                        chunk = lzw_encode_tiff(chunk)
                    strip_offsets.append(len(out))
                    strip_counts.append(len(chunk))
                    out += chunk
        else:
            for y0 in range(0, h, rows_per_strip):
                rows = min(rows_per_strip, h - y0)
                chunk = flat[y0 * row_bytes : (y0 + rows) * row_bytes]
                if compression == 32773:
                    chunk = packbits_encode(chunk)
                elif compression == 5:
                    chunk = lzw_encode_tiff(chunk)
                strip_offsets.append(len(out))
                strip_counts.append(len(chunk))
                out += chunk
        if len(out) % 2:  # IFDs must be word-aligned
            out += b"\x00"

        # IFD entries (tag, type, count, values).
        paletted = palette is not None and spp == 1
        photo = 3 if paletted else (1 if spp == 1 else 2)
        entries = [
            (_IMAGE_WIDTH, _TYPE_LONG, 1, [w]),
            (_IMAGE_LENGTH, _TYPE_LONG, 1, [h]),
            (_BITS_PER_SAMPLE, _TYPE_SHORT, spp, [8] * spp),
            (_COMPRESSION, _TYPE_SHORT, 1, [compression]),
            (_PHOTOMETRIC, _TYPE_SHORT, 1, [photo]),
            (_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, [spp]),
            (_PLANAR_CONFIG, _TYPE_SHORT, 1, [1]),
        ]
        if tile is not None:
            entries += [
                (_TILE_WIDTH, _TYPE_LONG, 1, [tile[0]]),
                (_TILE_LENGTH, _TYPE_LONG, 1, [tile[1]]),
                (_TILE_OFFSETS, _TYPE_LONG, len(strip_offsets),
                 strip_offsets),
                (_TILE_BYTE_COUNTS, _TYPE_LONG, len(strip_counts),
                 strip_counts),
            ]
        else:
            entries += [
                (_STRIP_OFFSETS, _TYPE_LONG, len(strip_offsets),
                 strip_offsets),
                (_ROWS_PER_STRIP, _TYPE_LONG, 1, [rows_per_strip]),
                (_STRIP_BYTE_COUNTS, _TYPE_LONG, len(strip_counts),
                 strip_counts),
            ]
        if paletted:
            entries.append((_COLORMAP, _TYPE_SHORT, 3 * 256,
                            [int(v) for v in palette.ravel()]))
        if predictor == 2:
            entries.append((_PREDICTOR, _TYPE_SHORT, 1, [2]))
        entries.sort(key=lambda e: e[0])  # spec: tags ascending
        ifd_offset = len(out)
        # Patch the previous next-IFD pointer (or header offset).
        out[next_ptr_at : next_ptr_at + 4] = struct.pack(
            bo + "I", ifd_offset
        )
        # Entry values wider than 4 bytes go to an overflow area that
        # starts right after this IFD.
        overflow_at = ifd_offset + 2 + 12 * len(entries) + 4
        overflow = bytearray()
        out += struct.pack(bo + "H", len(entries))
        fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I"}
        for tag, typ, count, vals in entries:
            out += struct.pack(bo + "HHI", tag, typ, count)
            packed = struct.pack(bo + fmt[typ] * count, *vals)
            if len(packed) <= 4:
                out += packed.ljust(4, b"\x00")
            else:
                out += struct.pack(bo + "I", overflow_at + len(overflow))
                overflow += packed
                if len(overflow) % 2:
                    overflow += b"\x00"
        next_ptr_at = len(out)
        out += b"\x00\x00\x00\x00"  # next IFD (patched by next page)
        out += overflow
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _read_values(b: bytes, bo: str, typ: int, count: int,
                 raw: bytes) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF field type {typ} not supported")
    fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I"}.get(typ)
    if fmt is None:
        raise NotImplementedError(
            f"TIFF field type {typ} unsupported for required tags"
        )
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        data = b[off : off + total]
        if len(data) < total:
            raise ValueError("TIFF value array out of bounds")
    return list(struct.unpack(bo + fmt * count, data))


def tiff_decode_pages(b: bytes):
    """Decode every IFD in the chain; returns a list of numpy uint8
    arrays shaped (h, w, spp)."""
    import numpy as np

    b = bytes(b)
    if b[:2] == b"II":
        bo = "<"
    elif b[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(bo + "H", b[2:4])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (ifd_off,) = struct.unpack(bo + "I", b[4:8])

    pages = []
    seen = set()
    while ifd_off:
        if ifd_off in seen:
            raise ValueError("cyclic IFD chain")
        seen.add(ifd_off)
        (n_entries,) = struct.unpack(bo + "H", b[ifd_off : ifd_off + 2])
        tags: dict[int, list[int]] = {}
        pos = ifd_off + 2
        for _ in range(n_entries):
            tag, typ, count = struct.unpack(bo + "HHI", b[pos : pos + 8])
            if tag in (_IMAGE_WIDTH, _IMAGE_LENGTH, _BITS_PER_SAMPLE,
                       _COMPRESSION, _PHOTOMETRIC, _STRIP_OFFSETS,
                       _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP,
                       _STRIP_BYTE_COUNTS, _PLANAR_CONFIG, _PREDICTOR,
                       _COLORMAP, _TILE_WIDTH, _TILE_LENGTH,
                       _TILE_OFFSETS, _TILE_BYTE_COUNTS):
                tags[tag] = _read_values(b, bo, typ, count,
                                         b[pos + 8 : pos + 12])
            pos += 12
        (ifd_off,) = struct.unpack(bo + "I", b[pos : pos + 4])

        w = tags[_IMAGE_WIDTH][0]
        h = tags[_IMAGE_LENGTH][0]
        spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
        bits = tags.get(_BITS_PER_SAMPLE, [1])
        comp = tags.get(_COMPRESSION, [1])[0]
        photo = tags.get(_PHOTOMETRIC, [1])[0]
        planar = tags.get(_PLANAR_CONFIG, [1])[0]
        if any(x != 8 for x in bits):
            raise NotImplementedError(
                f"only 8 bits per sample supported, got {bits}"
            )
        if comp not in (1, 5, 32773):
            raise NotImplementedError(
                f"TIFF compression {comp} not supported (none/LZW/"
                "PackBits only; JPEG-in-TIFF and Deflate variants are "
                "out of subset)"
            )
        if photo not in (1, 2, 3):
            raise NotImplementedError(
                f"photometric {photo} not supported (gray/RGB/palette "
                "only; no bilevel or YCbCr)"
            )
        if photo == 3:
            if spp != 1:
                raise ValueError("palette TIFF requires 1 sample/pixel")
            if _COLORMAP not in tags:
                raise ValueError("palette TIFF missing ColorMap tag")
            cmap = tags[_COLORMAP]
            if len(cmap) != 3 * 256:
                raise NotImplementedError(
                    "only 8-bit palette (3*256 ColorMap) supported"
                )
        if planar != 1:
            raise NotImplementedError("planar configuration 2 (separate "
                                      "channel planes) not supported")
        if spp not in (1, 3):
            raise NotImplementedError(f"{spp} samples per pixel")
        pred = tags.get(_PREDICTOR, [1])[0]
        if pred not in (1, 2):
            raise NotImplementedError(
                f"predictor {pred} not supported (none/horizontal only;"
                " 3 is floating-point differencing)"
            )

        row_bytes = w * spp
        if _TILE_OFFSETS in tags:
            # Tiled layout (TIFF 6.0 section 15): tiles are ALWAYS
            # full tw x th blocks; edge tiles carry padding that is
            # clipped on placement.
            tw = tags.get(_TILE_WIDTH, [0])[0]
            th = tags.get(_TILE_LENGTH, [0])[0]
            if tw <= 0 or th <= 0:
                raise ValueError("tiled TIFF missing TileWidth/Length")
            if tw % 16 or th % 16:
                raise ValueError(
                    f"TIFF tile dims must be multiples of 16, got "
                    f"{tw}x{th}"
                )
            offsets = tags[_TILE_OFFSETS]
            counts = tags.get(_TILE_BYTE_COUNTS, [])
            ntx, nty = -(-w // tw), -(-h // th)
            if len(offsets) != ntx * nty or len(counts) != ntx * nty:
                raise ValueError(
                    f"TIFF tile count {len(offsets)}/{len(counts)} != "
                    f"grid {ntx}x{nty}"
                )
            tile_bytes = tw * th * spp
            arr = np.zeros((h, w, spp), dtype=np.uint8)
            for t, (off, cnt) in enumerate(zip(offsets, counts)):
                ty, tx = divmod(t, ntx)
                raw = b[off : off + cnt]
                if comp == 32773:
                    raw = packbits_decode(raw, tile_bytes)
                elif comp == 5:
                    raw = lzw_decode_tiff(raw, tile_bytes)
                if len(raw) < tile_bytes:
                    raise ValueError("TIFF tile shorter than expected")
                tile = np.frombuffer(raw, dtype=np.uint8,
                                     count=tile_bytes).reshape(th, tw,
                                                               spp)
                if pred == 2:
                    # Predictor is per tile (each tile decodes
                    # standalone): cumsum within the tile's own rows,
                    # BEFORE edge clipping/placement.
                    tile = (np.cumsum(tile.astype(np.int64), axis=1)
                            % 256).astype(np.uint8)
                y0, x0 = ty * th, tx * tw
                ys, xs = min(th, h - y0), min(tw, w - x0)
                arr[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
        else:
            offsets = tags[_STRIP_OFFSETS]
            counts = tags[_STRIP_BYTE_COUNTS]
            rps = tags.get(_ROWS_PER_STRIP, [h])[0]
            if rps <= 0:
                raise ValueError(
                    f"TIFF RowsPerStrip must be > 0, got {rps}"
                )
            expected_strips = -(-h // rps)  # ceil(h / rps)
            if len(offsets) != expected_strips:
                raise ValueError(
                    f"TIFF strip count {len(offsets)} != ceil(height/"
                    f"rows_per_strip) = {expected_strips} "
                    f"(h={h}, rps={rps})"
                )
            raster = bytearray()
            for i, (off, cnt) in enumerate(zip(offsets, counts)):
                rows = min(rps, h - i * rps)
                raw = b[off : off + cnt]
                if comp == 32773:
                    raw = packbits_decode(raw, rows * row_bytes)
                elif comp == 5:
                    raw = lzw_decode_tiff(raw, rows * row_bytes)
                if len(raw) < rows * row_bytes:
                    raise ValueError("TIFF strip shorter than expected")
                raster += raw[: rows * row_bytes]
            arr = np.frombuffer(bytes(raster), dtype=np.uint8,
                                count=h * row_bytes).reshape(h, w, spp)
        if pred == 2 and _TILE_OFFSETS not in tags:
            # Undo horizontal differencing: cumulative sum per row and
            # channel, uint8 wraparound. (Tiled pages were undone per
            # tile above — full-raster cumsum there would be wrong for
            # every tile column but the first.)
            arr = np.cumsum(arr.astype(np.int64), axis=1) % 256
            arr = arr.astype(np.uint8)
        if photo == 3:
            # Palette expansion: ColorMap holds 3 planes of 256
            # 16-bit values (R block, G block, B block); emit 8-bit
            # RGB via the spec's >>8 narrowing.
            cm = np.asarray(cmap, dtype=np.uint32).reshape(3, 256)
            idx = arr[:, :, 0]
            arr = np.stack(
                [(cm[c, idx] >> 8).astype(np.uint8) for c in range(3)],
                axis=2,
            )
        pages.append(arr)
    if not pages:
        raise ValueError("TIFF with no IFDs")
    return pages
