"""Avro BINARY encoding + object container file, dependency-free.

Implemented from the public Apache Avro 1.11 specification (binary
encoding + object container files). This is the OTHER major record
wire format next to protobuf (operators/protowire.py), and it pins
different rules:

- longs/ints are ZIGZAG-mapped before the base-128 varint
  (n -> (n << 1) ^ (n >> 63)), so small negatives stay small — unlike
  protobuf's plain varint, where -1 costs 10 bytes;
- records carry NO field tags — values are concatenated in schema
  order, so the decoder is driven entirely by the (shared) schema;
- doubles are 8 little-endian IEEE-754 bytes;
- the container file is magic ``Obj\\x01`` + a metadata map
  (avro.schema / avro.codec) + a random-free 16-byte sync marker,
  then blocks of (count, byte-size, payload, sync); ``null`` and
  ``deflate`` (raw zlib, no header) codecs.

Spark's own Avro support lives in the external spark-avro jar, absent
offline — same situation as torch/delta (CHECKLOCAL_r12.md); this
codec keeps the FORMAT surface testable and the mapInPandas plumbing
real, exactly like the PDF/TIFF/protobuf paths.

Reference context: the reference app (app.py:1-193) has no binary
serialization; pipeline-extension surface (SURVEY.md §2b).
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "zigzag_encode", "zigzag_decode", "encode_long", "decode_long",
    "long_size", "encode_event_record", "decode_event_record",
    "container_write", "container_read",
]

_EVENT_SCHEMA_JSON = (
    '{"type":"record","name":"Event","fields":['
    '{"name":"event_id","type":"long"},'
    '{"name":"user_id","type":"long"},'
    '{"name":"event_type","type":"string"},'
    '{"name":"value","type":"double"}]}'
)

# Deterministic sync marker (the spec only requires 16 bytes unique
# per file; a fixed marker keeps fixtures reproducible).
_SYNC = bytes(range(16))


def zigzag_encode(n: int) -> int:
    """Map signed to unsigned: 0,-1,1,-2,2 -> 0,1,2,3,4."""
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_long(n: int) -> bytes:
    """Zigzag + base-128 varint (LSB groups, MSB = continue)."""
    if not -(2**63) <= n < 2**63:
        # Out-of-domain ints would zigzag to >10-byte varints that no
        # conformant Avro reader accepts; fail at encode time.
        raise ValueError(f"avro long out of int64 range: {n}")
    u = zigzag_encode(n)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated avro long")
        if shift > 63:
            raise ValueError("avro long exceeds 10 bytes")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(u), pos
        shift += 7


def long_size(n: int) -> int:
    """Encoded byte length (closed form the DuckDB oracle mirrors as
    a CASE ladder over the ZIGZAG value)."""
    u = zigzag_encode(n)
    size = 1
    while u >= 0x80:
        u >>= 7
        size += 1
    return size


def encode_event_record(event_id: int, user_id: int, event_type: str,
                        value: float) -> bytes:
    """One Event record: schema-ordered concatenation, NO tags."""
    tb = event_type.encode("utf-8")
    return (
        encode_long(event_id)
        + encode_long(user_id)
        + encode_long(len(tb)) + tb
        + struct.pack("<d", value)
    )


def decode_event_record(buf: bytes, pos: int = 0) -> tuple[dict, int]:
    """Independent decoder: schema-driven (no tags to dispatch on —
    misaligned reads corrupt every later field, which is exactly what
    the roundtrip assert would catch)."""
    event_id, pos = decode_long(buf, pos)
    user_id, pos = decode_long(buf, pos)
    ln, pos = decode_long(buf, pos)
    if ln < 0 or pos + ln > len(buf):
        raise ValueError("truncated avro string")
    event_type = buf[pos : pos + ln].decode("utf-8")
    pos += ln
    if pos + 8 > len(buf):
        raise ValueError("truncated avro double")
    (value,) = struct.unpack("<d", buf[pos : pos + 8])
    pos += 8
    return {
        "event_id": event_id, "user_id": user_id,
        "event_type": event_type, "value": value,
    }, pos


def _encode_meta_map(meta: dict[str, bytes]) -> bytes:
    out = bytearray()
    if meta:
        out += encode_long(len(meta))
        for k, v in meta.items():
            kb = k.encode("utf-8")
            out += encode_long(len(kb)) + kb
            out += encode_long(len(v)) + v
    out += encode_long(0)  # end of map blocks
    return bytes(out)


def _decode_meta_map(buf: bytes, pos: int) -> tuple[dict, int]:
    meta: dict[str, bytes] = {}
    while True:
        n, pos = decode_long(buf, pos)
        if n == 0:
            return meta, pos
        if n < 0:  # negative count: followed by byte size (spec)
            n = -n
            _, pos = decode_long(buf, pos)
        for _ in range(n):
            kl, pos = decode_long(buf, pos)
            k = buf[pos : pos + kl].decode("utf-8")
            pos += kl
            vl, pos = decode_long(buf, pos)
            meta[k] = buf[pos : pos + vl]
            pos += vl


def container_write(records: list[tuple], codec: str = "null",
                    block_size: int = 1000) -> bytes:
    """Object container file: header + (count, size, payload, sync)
    blocks. ``records`` are (event_id, user_id, event_type, value)."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be null or deflate")
    out = bytearray(b"Obj\x01")
    out += _encode_meta_map({
        "avro.schema": _EVENT_SCHEMA_JSON.encode(),
        "avro.codec": codec.encode(),
    })
    out += _SYNC
    for i in range(0, len(records), block_size):
        chunk = records[i : i + block_size]
        payload = b"".join(encode_event_record(*r) for r in chunk)
        if codec == "deflate":
            # Spec: raw deflate, no zlib header/checksum. wbits=-15
            # produces headerless output directly (no slicing of the
            # zlib wrapper, which would break if flags ever change).
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        out += encode_long(len(chunk))
        out += encode_long(len(payload))
        out += payload
        out += _SYNC
    return bytes(out)


def container_read(buf: bytes) -> list[dict]:
    if buf[:4] != b"Obj\x01":
        raise ValueError("not an avro object container (bad magic)")
    meta, pos = _decode_meta_map(buf, 4)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} (snappy etc. "
                                  "need external libraries)")
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        count, pos = decode_long(buf, pos)
        size, pos = decode_long(buf, pos)
        payload = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        p = 0
        for _ in range(count):
            rec, p = decode_event_record(payload, p)
            records.append(rec)
        if p != len(payload):
            raise ValueError("block payload has trailing bytes")
    return records
