"""Multimodal binary-column plumbing.

Design (north-star "multimodal columns"): image/audio/video payloads
live as opaque ``binary`` columns beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes stream through the Python workers in
columnar batches (never row-at-a-time py4j).

The actual codec step is STUBBED in this container (no PIL/ffmpeg):
``decode_image`` raises NotImplementedError by design, and the
pipeline runs with a deterministic md5-derived fake featureizer whose
Spark-side plumbing (schema, batching, partitioning) is identical to
what a real decoder would use — swap ``_fake_features`` for a real
decode and nothing else changes.

Scale note: payload columns dominate row width, so every operator here
selects the minimal column set (Parquet column pruning keeps payloads
out of metadata-only queries), and feature extraction is a pure map —
no shuffle; partition sizing is governed by files.maxPartitionBytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "with_binary_payload",
    "decode_image",
    "extract_binary_features",
    "sample_frames",
    "resize_images",
]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a ``payload: binary`` column (UTF-8 bytes of the text —
    the stand-in for real image/audio bytes ingested from object
    storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes):
    """Image decode to an ndarray (H, W, C). REAL for every format the
    stdlib + numpy can handle — binary PPM (P6), PGM (P5), 24-bit
    uncompressed BMP, and non-interlaced 8-bit PNG (gray / gray+alpha /
    RGB / RGBA; zlib inflate + all five scanline filters); JPEG and
    video codecs require PIL/opencv/ffmpeg, which this container
    lacks, and raise NotImplementedError. The mapInPandas pipeline
    around this call is identical either way — on a cluster with codec
    libraries, extend the magic-number dispatch and nothing else
    changes. ``mm_decode_ppm_stats`` / ``mm_decode_png_stats`` run
    this decoder end-to-end under the DuckDB oracle (pixel statistics
    of synthesized payloads)."""
    import numpy as np

    b = bytes(payload)
    if b[:2] in (b"P6", b"P5"):
        # <magic>\n<w> <h>\n<maxval>\n<raster>; no comment support —
        # the synth path never emits comments
        parts = b.split(b"\n", 3)
        if len(parts) < 4:
            raise ValueError("truncated PNM header")
        w, h = (int(x) for x in parts[1].split())
        if int(parts[2]) > 255:
            raise NotImplementedError("16-bit PNM not supported")
        ch = 3 if b[:2] == b"P6" else 1
        raster = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * ch)
        return raster.reshape(h, w, ch)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(b)
    if b[:2] == b"BM":
        off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError("only 24-bit uncompressed BMP")
        row_bytes = (w * 3 + 3) & ~3
        rows = []
        for y in range(abs(h)):
            rb = np.frombuffer(b, dtype=np.uint8, count=w * 3,
                               offset=off + y * row_bytes)
            rows.append(rb.reshape(w, 3)[:, ::-1])  # BGR → RGB
        img = np.stack(rows)
        return img[::-1] if h > 0 else img  # bottom-up unless negative
    raise NotImplementedError(
        "image decoding beyond PNM/BMP/PNG (JPEG, video codecs, ...) "
        "requires PIL/opencv/ffmpeg, not available in this container; "
        "extract_binary_features uses the deterministic md5-based fake "
        "featureizer for such payloads"
    )


def _decode_png(b: bytes):
    """Non-interlaced 8-bit PNG via stdlib zlib + numpy: parse chunks,
    inflate the concatenated IDAT stream, reverse the per-scanline
    filter (types 0-4 — None/Sub/Up/Average/Paeth, reconstructing
    against the already-reconstructed neighbors per the spec), and
    reshape to (H, W, C). Palette, 16-bit depth, and Adam7 interlace
    raise NotImplementedError — extend here if a corpus needs them."""
    import zlib

    import numpy as np

    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        if typ == b"IHDR":
            ihdr = b[pos + 8 : pos + 8 + ln]
        elif typ == b"IDAT":
            idat.append(b[pos + 8 : pos + 8 + ln])
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, _comp, _filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or interlace != 0 or channels is None:
        raise NotImplementedError(
            f"only non-interlaced 8-bit gray/RGB(A) PNG supported "
            f"(depth={depth}, color type={ctype}, interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    zero = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else zero
        if f == 0:
            rec = line
        elif f == 2:  # Up — vectorizable: predictor is the prior row
            rec = (line + prev) % 256
        elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + up) // 2
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, channels)


def _fake_features(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for decode+measure: md5-derived pseudo
    width/height (16 + nibble·8). Engine-independent, so the whole
    mapInPandas path is oracle-checkable."""
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[0], 16) * 8
    height = 16 + int(h[1], 16) * 8
    return len(payload), h, width, height


def extract_binary_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over payload batches: byte size,
    content digest, (fake-)decoded dimensions. One Arrow round-trip,
    zero shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "content_md5": [f[1] for f in feats],
                    "fake_width": [f[2] for f in feats],
                    "fake_height": [f[3] for f in feats],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling plumbing: ONE input row fans out to
    ``n_frames`` output rows (the UDTF/flatMap shape) inside a single
    mapInPandas pass — a real sampler would seek+decode n timestamps
    per payload; the stub derives each frame's digest as
    md5(payload || ':' || idx), keeping the whole fan-out
    deterministic and oracle-checkable. No shuffle: row expansion
    happens inside the map stage, and downstream per-frame operators
    see an ordinary (doc_id, frame_idx)-keyed relation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(bytes(payload) + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return df.select(id_col, "payload").mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize plumbing (decode → scale → re-encode in a real cluster):
    per-row map emitting the target dims and a digest binding payload
    to the resize parameters — md5(payload || 'WxH'). Pure map stage,
    Arrow-batched, no shuffle."""
    tag = f":{width}x{height}".encode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "out_w": width,
                    "out_h": height,
                    "resized_md5": [
                        hashlib.md5(bytes(p) + tag).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(run, RESIZE_SCHEMA)


def decode_audio(payload: bytes):
    """Audio decode to (samples: int16 ndarray [n, channels], rate).
    REAL for 16-bit PCM WAV (RIFF/WAVE parsed with numpy alone);
    compressed codecs (MP3/AAC/OGG) need ffmpeg-class libraries and
    raise NotImplementedError. Same contract as decode_image: the
    mapInPandas plumbing is codec-agnostic — extend the dispatch on a
    cluster with codec libs and nothing else changes.
    ``mm_decode_wav_stats`` runs this parser end-to-end under the
    DuckDB oracle."""
    import numpy as np

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio decoding (MP3/AAC/...) requires ffmpeg-class "
            "libraries, not available in this container"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV supported")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels), rate
