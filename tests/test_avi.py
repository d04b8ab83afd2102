"""MJPEG-in-AVI container codec (operators/avi.py, round 13).

Covers: multi-frame roundtrip through the REAL RIFF walk + JPEG
decode, word-align padding (odd-length frame payloads), nested
``LIST 'rec '`` frame groups and ``00db`` chunk ids (real-world MJPEG
writer variants), container byte-layout golden (md5-pinned so the
writer can't silently drift), idx1/header cross-checks, the handler
gate, truncation diagnostics, and the ``sample_frames`` RIFF dispatch
(real raster digests for AVI payloads, md5 stub untouched for
non-AVI).
"""

from __future__ import annotations

import hashlib
import struct


import pytest

from quick_and_easy_vectordb_spark.operators.avi import (
    avi_decode_frames,
    avi_encode_mjpeg,
    avi_parse,
)
from quick_and_easy_vectordb_spark.queries.multimodal import (
    jpeg_encode_gray_dc,
)


def _gray_frames(n: int, bw: int = 2, bh: int = 1, seed: int = 0):
    frames, vals_all = [], []
    for f in range(n):
        vals = [
            [(seed * 13 + f * 29 + bx * 5 + by * 11) % 256
             for bx in range(bw)]
            for by in range(bh)
        ]
        frames.append(jpeg_encode_gray_dc(vals, bw * 8, bh * 8))
        vals_all.append(vals)
    return frames, vals_all


def test_roundtrip_multiframe():
    frames, vals_all = _gray_frames(4, bw=2, bh=2, seed=7)
    buf = avi_encode_mjpeg(frames, 16, 16, rate=12)
    meta, rasters = avi_decode_frames(buf)
    assert meta["n_frames"] == 4
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["usec_per_frame"] == 1_000_000 // 12
    assert (meta["rate"], meta["scale"]) == (12, 1)
    for img, vals in zip(rasters, vals_all):
        assert img.shape == (16, 16, 1)
        for by in range(2):
            for bx in range(2):
                blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
                assert (blk == vals[by][bx]).all()


def test_odd_length_frame_padding():
    """Word-align pad bytes must be skipped and excluded from sizes."""
    frames, _ = _gray_frames(3, bw=2, bh=1)
    assert any(len(f) % 2 for f in frames), "fixture must exercise pad"
    buf = avi_encode_mjpeg(frames, 16, 8)
    meta = avi_parse(buf)
    assert [len(f) for f in meta["frames"]] == [len(f) for f in frames]
    assert meta["frames"] == frames


def test_container_golden():
    """Byte-layout pin: the writer's output for a fixed input is
    frozen. A layout change (field order, padding, index offsets) is a
    deliberate format decision and must update this hash knowingly."""
    frames, _ = _gray_frames(2, bw=1, bh=1, seed=3)
    buf = avi_encode_mjpeg(frames, 8, 8, rate=10)
    assert hashlib.md5(buf).hexdigest() == (
        "10b0eee032bdc9de1f34047ae30e8e8d"
    )
    _, rasters = avi_decode_frames(buf)
    assert hashlib.md5(
        b"".join(r.tobytes() for r in rasters)
    ).hexdigest() == "97c9f5a203829f51eb0c9ded0b53a553"


def test_rec_list_and_00db_chunks():
    """Frames nested in LIST 'rec ' groups and tagged 00db are still
    found (the chunk-id/nesting variants real MJPEG writers emit)."""
    frames, _ = _gray_frames(2, bw=1, bh=1)
    buf = bytearray(avi_encode_mjpeg(frames, 8, 8))
    # Rewrite chunk ids 00dc -> 00db inside movi only (idx1 rewritten
    # to match), then wrap each frame chunk in a rec list.
    meta = avi_parse(bytes(buf))
    assert meta["n_frames"] == 2
    body = bytes(buf).replace(b"00dc", b"00db")
    meta2 = avi_parse(body)
    assert meta2["frames"] == frames

    # Build a movi list with rec-grouped frames by hand.
    def chunk(cc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cc + struct.pack("<I", len(payload)) + payload + pad

    rec_payload = b"".join(
        chunk(b"LIST", b"rec " + chunk(b"00dc", f)) for f in frames
    )
    src = bytes(buf)
    movi_at = src.index(b"LIST", 12)
    while src[movi_at + 8 : movi_at + 12] != b"movi":
        movi_at = src.index(b"LIST", movi_at + 1)
    new_movi = chunk(b"LIST", b"movi" + rec_payload)
    out = bytearray(src[:movi_at] + new_movi)  # drop old movi + idx1
    out[4:8] = struct.pack("<I", len(out) - 8)
    meta3 = avi_parse(bytes(out))
    assert meta3["frames"] == frames


def test_header_and_index_cross_checks():
    frames, _ = _gray_frames(2, bw=1, bh=1)
    buf = bytearray(avi_encode_mjpeg(frames, 8, 8))
    # Corrupt strh dwLength (frame count) -> loud mismatch.
    strh_at = bytes(buf).index(b"vids")  # dwLength at +32 from 'vids'
    bad = bytearray(buf)
    bad[strh_at + 32 : strh_at + 36] = struct.pack("<I", 9)
    with pytest.raises(ValueError, match="declares 9 frames"):
        avi_parse(bytes(bad))
    # Drop one idx1 entry -> count mismatch.
    idx_at = bytes(buf).index(b"idx1")
    bad2 = bytearray(buf)
    (ln,) = struct.unpack("<I", bad2[idx_at + 4 : idx_at + 8])
    bad2[idx_at + 4 : idx_at + 8] = struct.pack("<I", ln - 16)
    del bad2[idx_at + 8 + ln - 16 : idx_at + 8 + ln]
    bad2[4:8] = struct.pack("<I", len(bad2) - 8)
    with pytest.raises(ValueError, match="idx1 lists 1"):
        avi_parse(bytes(bad2))


def test_error_gates():
    frames, _ = _gray_frames(1, bw=1, bh=1)
    buf = avi_encode_mjpeg(frames, 8, 8)
    with pytest.raises(ValueError, match="RIFF/AVI magic"):
        avi_parse(b"JUNK" + buf[4:])
    bad = buf.replace(b"MJPG", b"XVID", 1)  # strh handler
    with pytest.raises(NotImplementedError, match="XVID"):
        avi_parse(bad)
    # Truncated mid-chunk: overrun diagnostic, not a numpy error.
    with pytest.raises(ValueError, match="overruns"):
        avi_parse(buf[: len(buf) - 7])
    with pytest.raises(ValueError, match="at least one frame"):
        avi_encode_mjpeg([], 8, 8)
    with pytest.raises(ValueError, match="not JPEG"):
        avi_encode_mjpeg([b"notajpeg"], 8, 8)
    # Header dims that contradict the frames fail at decode.
    lying = avi_encode_mjpeg(frames, 16, 8)
    with pytest.raises(ValueError, match="header declares 16x8"):
        avi_decode_frames(lying)


def test_sample_frames_real_avi_dispatch(spark):
    """sample_frames: AVI payloads take the REAL decode path (raster
    digests, even sampling), non-AVI payloads keep the md5 stub."""
    from quick_and_easy_vectordb_spark.operators.multimodal import (
        sample_frames,
    )

    frames, _ = _gray_frames(6, bw=1, bh=1, seed=5)
    buf = avi_encode_mjpeg(frames, 8, 8)
    _, rasters = avi_decode_frames(buf)
    stub_payload = b"not a riff container"
    df = spark.createDataFrame(
        [(1, bytearray(buf)), (2, bytearray(stub_payload))],
        "doc_id long, payload binary",
    )
    rows = {
        (r.doc_id, r.frame_idx): r.frame_md5
        for r in sample_frames(df, n_frames=3).collect()
    }
    # Real path: 3 frames sampled evenly from 6 -> indices 0, 2, 4.
    for i, src_idx in enumerate([0, 2, 4]):
        assert rows[(1, i)] == hashlib.md5(
            rasters[src_idx].tobytes()
        ).hexdigest()
    # Stub path unchanged.
    for i in range(3):
        assert rows[(2, i)] == hashlib.md5(
            stub_payload + b":" + str(i).encode()
        ).hexdigest()


def test_sample_frames_fewer_frames_than_requested(spark):
    from quick_and_easy_vectordb_spark.operators.multimodal import (
        sample_frames,
    )

    frames, _ = _gray_frames(2, bw=1, bh=1)
    buf = avi_encode_mjpeg(frames, 8, 8)
    _, rasters = avi_decode_frames(buf)
    df = spark.createDataFrame(
        [(1, bytearray(buf))], "doc_id long, payload binary"
    )
    rows = sorted(
        (r.frame_idx, r.frame_md5)
        for r in sample_frames(df, n_frames=4).collect()
    )
    assert [i for i, _ in rows] == [0, 1]
    assert rows[0][1] == hashlib.md5(rasters[0].tobytes()).hexdigest()
    assert rows[1][1] == hashlib.md5(rasters[1].tobytes()).hexdigest()


def test_audio_demux_roundtrip_and_gates():
    import numpy as np

    from quick_and_easy_vectordb_spark.operators.avi import (
        avi_encode_mjpeg_pcm,
        avi_parse_audio,
    )

    frames, _ = _gray_frames(3, bw=1, bh=1)
    samples = np.array(
        [((7 * i * 13) % 4096) - 2048 for i in range(101)],
        dtype=np.int16,
    )
    buf = avi_encode_mjpeg_pcm(frames, samples.tobytes(), 8, 8,
                               audio_rate=16000)
    a = avi_parse_audio(buf)
    assert np.array_equal(np.frombuffer(a["pcm"], "<i2"), samples)
    assert (a["sample_rate"], a["n_channels"], a["bits"]) == (16000, 1, 16)
    assert a["n_samples"] == 101
    # video stream untouched by interleaved audio chunks
    _, rasters = avi_decode_frames(buf)
    assert len(rasters) == 3

    # pure-video file has no audio stream
    with pytest.raises(ValueError, match="no audio stream"):
        avi_parse_audio(avi_encode_mjpeg(frames, 8, 8))
    # non-PCM format tag refuses loudly
    bad = bytearray(buf)
    at = bytes(buf).index(b"auds")
    # strf follows strh: 'auds' starts the 56-byte strh payload, then
    # the 8-byte strf chunk header precedes the WAVEFORMATEX tag
    strf_payload = at + 56 + 8
    bad[strf_payload : strf_payload + 2] = (85).to_bytes(2, "little")  # MP3
    with pytest.raises(NotImplementedError, match="tag 85"):
        avi_parse_audio(bytes(bad))
    # odd PCM payload refused at encode
    with pytest.raises(ValueError, match="16-bit samples"):
        avi_encode_mjpeg_pcm(frames, b"\x01", 8, 8)


def test_multi_video_stream_selection():
    """A non-MJPEG 'vids' stream is SKIPPED (not fatal) when an MJPEG
    stream exists; with two MJPEG streams the FIRST wins; with only
    unsupported video streams the parse fails loudly."""
    from quick_and_easy_vectordb_spark.operators.avi import (
        _chunk, _list, AVIF_HASINDEX, AVIIF_KEYFRAME,
    )

    frames, _ = _gray_frames(2, bw=1, bh=1)

    def strl(fcc_type, handler, n, w=8, h=8):
        strh = fcc_type + handler + struct.pack(
            "<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 10, 0, n, 0, 0, 0,
            0, 0, w, h)
        strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24,
                           handler, w * h * 3, 0, 0, 0, 0)
        return _list(b"strl",
                     _chunk(b"strh", strh) + _chunk(b"strf", strf))

    def build(streams, frame_chunks):
        avih = struct.pack("<14I", 100_000, 0, 0, AVIF_HASINDEX,
                           len(frames), 0, len(streams), 0, 8, 8,
                           0, 0, 0, 0)
        hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                     + b"".join(streams))
        movi_payload = bytearray()
        idx = bytearray()
        for cid, payload in frame_chunks:
            off = 4 + len(movi_payload)
            movi_payload += _chunk(cid, payload)
            idx += cid + struct.pack("<III", AVIIF_KEYFRAME, off,
                                     len(payload))
        return _chunk(b"RIFF", b"AVI " + hdrl
                      + _list(b"movi", bytes(movi_payload))
                      + _chunk(b"idx1", bytes(idx)))

    # Stream 0 = XVID (skipped), stream 1 = MJPEG: frames from 01dc.
    buf = build(
        [strl(b"vids", b"XVID", len(frames)),
         strl(b"vids", b"MJPG", len(frames))],
        [(b"01dc", f) for f in frames],
    )
    meta = avi_parse(buf)
    assert meta["n_frames"] == 2 and meta["frames"] == frames

    # Two MJPEG streams: the FIRST keeps the slot (00dc collected).
    buf2 = build(
        [strl(b"vids", b"MJPG", len(frames)),
         strl(b"vids", b"MJPA", 7)],  # lying length: must be ignored
        [(b"00dc", f) for f in frames],
    )
    meta2 = avi_parse(buf2)
    assert meta2["n_frames"] == 2 and meta2["frames"] == frames

    # Only unsupported video streams: loud refusal naming handlers.
    buf3 = build([strl(b"vids", b"XVID", 2)],
                 [(b"00dc", f) for f in frames])
    with pytest.raises(NotImplementedError, match="XVID"):
        avi_parse(buf3)


def test_sample_frames_corrupt_avi_degrades_to_stub(spark):
    """One corrupt RIFF container must not kill the Spark task: the
    bad row degrades to the deterministic stub digests while good AVI
    rows keep the real decode path."""
    from quick_and_easy_vectordb_spark.operators.multimodal import (
        sample_frames,
    )

    frames, _ = _gray_frames(2, bw=1, bh=1)
    good = avi_encode_mjpeg(frames, 8, 8)
    corrupt = good[: len(good) - 7]  # truncated mid-chunk: overrun
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(corrupt))],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, n_frames=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_md5))
    assert sorted(i for i, _ in by_doc[1]) == [0, 1]  # short clip: 2
    assert sorted(i for i, _ in by_doc[2]) == [0, 1, 2]  # stub: fixed 3
    expect_stub = [
        hashlib.md5(bytes(corrupt) + b":" + str(i).encode()).hexdigest()
        for i in range(3)
    ]
    assert [d for _, d in sorted(by_doc[2])] == expect_stub
