"""Protobuf WIRE FORMAT encode/decode, dependency-free.

The protobuf wire format (public spec: protobuf.dev/programming-guides/
encoding) is the de-facto record serialization for training-data
pipelines (TFRecord payloads, RPC logs, feature stores). This module
implements the two wire types the record schema below needs, in pure
python, executor-side:

- wire type 0 (VARINT): base-128 little-endian groups, MSB = continue
- wire type 2 (LEN): varint length prefix + raw bytes

Schema used by the roundtrip query (field numbers < 16, so every tag
is exactly one byte ``(field << 3) | wire_type``):

    message Doc {
      int64  doc_id  = 1;  // varint
      string lang    = 2;  // len-delimited, utf-8
      string source  = 3;  // len-delimited, utf-8
      int64  n_chars = 4;  // varint
    }

The encoder and decoder are written INDEPENDENTLY (the decoder never
reuses encoder state) so a roundtrip genuinely exercises the parse:
the decoder walks tag bytes, dispatches on wire type, and tolerates
unknown fields by skipping them — the forward-compatibility behavior
the spec mandates.

Reference context: the reference app (app.py:1-193) has no binary
serialization; this is pipeline-extension surface (SURVEY.md §2b).
No reference code is used; the wire format is the public spec.
"""

from __future__ import annotations


def encode_varint(value: int) -> bytes:
    """Base-128 varint (non-negative; int64 values in this schema are
    always >= 0 here — negative would need 10-byte two's-complement)."""
    if value < 0:
        raise ValueError("negative varint needs zigzag/10-byte form")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Return (value, new_pos); raises on truncation, on encodings
    longer than 10 bytes, and on values outside the spec's 64-bit
    range (a 10-byte group CAN encode up to 2^70-1 — real decoders
    must reject or truncate the excess; this one rejects, so a
    corrupt stream can never smuggle an out-of-range int into an
    int64 column)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift > 63:
            raise ValueError("varint exceeds 10 bytes")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if result >= 1 << 64:
                raise ValueError("varint exceeds 64 bits")
            return result, pos
        shift += 7


def varint_size(value: int) -> int:
    """Encoded byte length of a non-negative varint (the closed form
    the DuckDB oracle mirrors as a CASE over powers of 128)."""
    n = 1
    while value >= 0x80:
        value >>= 7
        n += 1
    return n


def encode_doc(doc_id: int, lang: str, source: str, n_chars: int) -> bytes:
    """Encode one Doc message (fields in ascending field-number order,
    the canonical serialization)."""
    lb = lang.encode("utf-8")
    sb = source.encode("utf-8")
    out = bytearray()
    out.append((1 << 3) | 0)            # doc_id, varint
    out += encode_varint(doc_id)
    out.append((2 << 3) | 2)            # lang, len-delimited
    out += encode_varint(len(lb))
    out += lb
    out.append((3 << 3) | 2)            # source, len-delimited
    out += encode_varint(len(sb))
    out += sb
    out.append((4 << 3) | 0)            # n_chars, varint
    out += encode_varint(n_chars)
    return bytes(out)


def decode_doc(buf: bytes) -> dict:
    """Parse one Doc message. Unknown fields are SKIPPED (spec
    forward-compatibility); unknown wire types raise. Returns a dict
    with doc_id/lang/source/n_chars (missing fields keep proto3
    defaults: 0 / '')."""
    out = {"doc_id": 0, "lang": "", "source": "", "n_chars": 0}
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wtype = key >> 3, key & 0x07
        if wtype == 0:
            val, pos = decode_varint(buf, pos)
            if field == 1:
                out["doc_id"] = val
            elif field == 4:
                out["n_chars"] = val
            # unknown varint field: value already consumed
        elif wtype == 2:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated length-delimited field")
            raw = buf[pos : pos + ln]
            pos += ln
            if field == 2:
                out["lang"] = raw.decode("utf-8")
            elif field == 3:
                out["source"] = raw.decode("utf-8")
            # unknown LEN field: bytes already skipped
        else:
            raise ValueError(f"unsupported wire type {wtype}")
    return out


# ---------------------------------------------------------------------------
# Round 12 (VERDICT r11 item 6): packed repeated fields and nested
# messages — the other two wire shapes real feeds use.
#
#     message Event {
#       int64          user_id   = 1;  // varint
#       repeated int64 event_ids = 2;  // PACKED varints (proto3 default)
#       Meta           meta      = 3;  // nested message, LEN
#     }
#     message Meta {
#       string top_type = 1;  // len-delimited, utf-8
#       int64  n_events = 2;  // varint
#     }
# ---------------------------------------------------------------------------


def encode_event(user_id: int, event_ids, top_type: str,
                 n_events: int) -> bytes:
    """Encode one Event. The repeated field uses the PACKED encoding
    (one LEN record whose payload is the concatenated varints) —
    proto3's default for repeated scalars; the nested message is a
    LEN record whose payload is an independently encoded Meta."""
    out = bytearray()
    out.append((1 << 3) | 0)
    out += encode_varint(user_id)
    packed = bytearray()
    for v in event_ids:
        packed += encode_varint(int(v))
    out.append((2 << 3) | 2)
    out += encode_varint(len(packed))
    out += packed
    meta = bytearray()
    tb = top_type.encode("utf-8")
    meta.append((1 << 3) | 2)
    meta += encode_varint(len(tb))
    meta += tb
    meta.append((2 << 3) | 0)
    meta += encode_varint(n_events)
    out.append((3 << 3) | 2)
    out += encode_varint(len(meta))
    out += meta
    return bytes(out)


def _decode_meta(buf: bytes) -> dict:
    """Returns the Meta fields plus a ``_seen`` set of field numbers
    that occurred ON THE WIRE — the merge rule is last-OCCURRENCE
    wins, so an explicit zero / empty string in a later occurrence
    must overwrite (presence, not truthiness, drives the merge)."""
    out = {"top_type": "", "n_events": 0, "_seen": set()}
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wtype = key >> 3, key & 0x07
        if wtype == 0:
            val, pos = decode_varint(buf, pos)
            if field == 2:
                out["n_events"] = val
                out["_seen"].add(2)
        elif wtype == 2:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated nested field")
            raw = buf[pos : pos + ln]
            pos += ln
            if field == 1:
                out["top_type"] = raw.decode("utf-8")
                out["_seen"].add(1)
        else:
            raise ValueError(f"unsupported wire type {wtype}")
    return out


def decode_event(buf: bytes) -> dict:
    """Parse one Event, written independently of the encoder. Spec
    conformance points exercised by tests/the oracle query:

    - the packed repeated field is a LEN record parsed as
      back-to-back varints;
    - per the spec, a conformant decoder must ALSO accept the
      EXPANDED encoding (each element its own field-2 varint record)
      and concatenate: repeated fields may arrive in either form, or
      a mix, across serializations;
    - the nested message is recursively parsed from its LEN payload;
      repeated occurrences of a message field MERGE (last scalar
      wins) per the spec's message-merge rule;
    - unknown fields skip; unknown wire types raise."""
    out = {"user_id": 0, "event_ids": [], "top_type": "", "n_events": 0}
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wtype = key >> 3, key & 0x07
        if wtype == 0:
            val, pos = decode_varint(buf, pos)
            if field == 1:
                out["user_id"] = val
            elif field == 2:  # expanded repeated element
                out["event_ids"].append(val)
        elif wtype == 2:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated length-delimited field")
            raw = buf[pos : pos + ln]
            pos += ln
            if field == 2:  # packed repeated payload
                p = 0
                while p < ln:
                    v, p = decode_varint(raw, p)
                    out["event_ids"].append(v)
            elif field == 3:
                m = _decode_meta(raw)
                # Message merge: a field PRESENT in the later
                # occurrence overwrites, even with an explicit zero /
                # empty value (presence, not truthiness — the falsy
                # check was a spec deviation caught in review).
                if 1 in m["_seen"]:
                    out["top_type"] = m["top_type"]
                if 2 in m["_seen"]:
                    out["n_events"] = m["n_events"]
        else:
            raise ValueError(f"unsupported wire type {wtype}")
    return out
