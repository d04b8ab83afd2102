"""Pure-python PDF text extraction (and the writer that feeds it) —
the one capability the reference IMPLIES but never built: its
requirements.txt pins PyPDF2 (reference requirements.txt:7) yet app.py
never imports it; chunks arrive pre-made via CSV (app.py:51-58). A
real data-pipeline user ingesting documents hits PDF first, so this
module supplies the extractor feeding operators/chunking.py, with the
same discipline as the image/audio codecs in operators/multimodal.py:
a spec-subset parser that is REAL on its default path, with
NotImplementedError guards only on documented out-of-subset variants
(encryption, non-Flate filters, inline images).

Supported subset (PDF 1.4 core, the overwhelming share of
text-extractable PDFs):

- classic cross-reference PDFs; object streams (/Type /ObjStm,
  PDF 1.5 compressed xref) are out of subset,
- content streams stored raw or /FlateDecode (zlib — stdlib),
- text shown with Tj / TJ / ' / " inside BT..ET, line motion via
  Td / TD / T*, literal strings with the full escape table
  (\\n \\r \\t \\b \\f \\( \\) \\\\ \\ooo, line continuations, nested
  parens) and hex strings,
- byte-to-text mapping assumes a latin-1-compatible simple font
  (StandardEncoding/WinAnsi ASCII range); CID/Type0 composite fonts
  are out of subset (their 2-byte codes need /ToUnicode CMaps).

Scale shape: extraction is per-document pure Python over an opaque
binary column — it runs inside mapInPandas (one Arrow pass, zero
shuffles), and everything downstream (chunking, dedup, embedding)
stays in Catalyst. See queries/multimodal.py:mm_pdf_extract_chunks.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["pdf_encode", "pdf_extract_text", "extract_content_text"]


# ---------------------------------------------------------------------------
# Writer (fixture/synthesis side — same role as qoi_encode/png_encode)
# ---------------------------------------------------------------------------


def _escape_literal(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1"):
        if ch in (0x28, 0x29, 0x5C):  # ( ) backslash
            out += b"\\" + bytes([ch])
        elif ch == 0x0A:
            out += b"\\n"
        elif ch == 0x0D:
            out += b"\\r"
        else:
            out.append(ch)
    return bytes(out)


def pdf_encode(pages: list[str], compress: bool = True) -> bytes:
    """Write a minimal-but-valid PDF 1.4: catalog → page tree → one
    page + one content stream per entry of ``pages``, Helvetica,
    correct xref offsets and trailer. Each page's text is split on
    '\\n' into lines shown with Tj + T* (14pt leading), so
    ``pdf_extract_text(pdf_encode(pages)) == pages`` exactly for any
    latin-1 text — the lossless contract the oracle-checked query
    asserts per document. ``compress`` Flate-encodes the content
    streams (the layout real PDFs use); False writes them raw."""
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font,
    # then per page i: 4+2i page, 5+2i content
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        ),
    }
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    streams: dict[int, bytes] = {}
    for i, page in enumerate(pages):
        pg, ct = 4 + 2 * i, 5 + 2 * i
        objs[pg] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % ct
        )
        body = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for j, line in enumerate(page.split("\n")):
            if j:
                body += b"T*\n"
            body += b"(" + _escape_literal(line) + b") Tj\n"
        body += b"ET"
        data = bytes(body)
        if compress:
            data = zlib.compress(data, 6)
            objs[ct] = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            objs[ct] = b"<< /Length %d >>" % len(data)
        streams[ct] = data

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num]
        if num in streams:
            out += b"\nstream\n" + streams[num] + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += b"xref\n0 %d\n" % n_obj
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_obj, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\x08", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_objects(b: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """objnum -> (header bytes up to stream/endobj, stream bytes|None).
    A linear scan over 'N G obj' markers — deliberately xref-free:
    real-world PDFs routinely carry stale xref tables, and every
    object this subset needs is locatable by its marker."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    marks = [(m.start(), int(m.group(1))) for m in _OBJ_RE.finditer(b)]
    # Compressed stream payloads are arbitrary bytes: they can contain
    # fake 'N G obj' markers. skip_until tracks the absolute end of the
    # current object's stream (known exactly via direct /Length), and
    # markers inside it are ignored so phantom objects never shadow
    # real ones.
    skip_until = 0
    for i, (pos, num) in enumerate(marks):
        if pos < skip_until:
            continue
        end = len(b)
        for npos, _ in marks[i + 1 :]:
            if npos >= max(pos + 1, skip_until):
                end = npos
                break
        chunk = b[pos:end]
        # (?<![a-z]) so 'endstream' never matches as a stream start
        sm = re.search(rb"(?<![a-z])stream\r?\n", chunk)
        if sm:
            header = chunk[: sm.start()]
            # /Length as a direct integer (what real writers and
            # pdf_encode emit) bounds the stream exactly — essential
            # because compressed payloads may themselves END in EOL
            # bytes, which a delimiter-and-strip scan would wrongly
            # eat (found the hard way: zlib output ending in 0x0D
            # truncated by one byte).
            lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", header)
            abs_data = pos + sm.end()
            if lm:
                length = int(lm.group(1))
                data = b[abs_data : abs_data + length]
                skip_until = abs_data + length
            else:  # indirect /Length: fall back to the delimiter
                se = b.find(b"endstream", abs_data)
                if se < 0:
                    raise ValueError(f"object {num}: unterminated stream")
                data = b[abs_data:se]
                if data.endswith(b"\r\n"):
                    data = data[:-2]
                elif data.endswith(b"\n") or data.endswith(b"\r"):
                    data = data[:-1]
                skip_until = se
            objs[num] = (header, data)
        else:
            eo = chunk.find(b"endobj")
            objs[num] = (chunk[: eo if eo >= 0 else len(chunk)], None)
    return objs


def _decode_stream(header: bytes, data: bytes, num: int) -> bytes:
    fm = re.search(rb"/Filter\s*(\[[^\]]*\]|/\w+)", header)
    if not fm:
        return data
    filters = re.findall(rb"/(\w+)", fm.group(1))
    if filters == [b"FlateDecode"]:
        return zlib.decompress(data)
    raise NotImplementedError(  # variant guard, mirrors the codecs
        f"object {num}: unsupported stream filter chain "
        f"{[f.decode() for f in filters]} (only FlateDecode or raw "
        f"is in subset)"
    )


def _tokenize_content(data: bytes):
    """Yield ('str', bytes) | ('num', float) | ('op', name) |
    ('arr', '[' or ']') tokens from a decoded content stream."""
    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b" \t\r\n\x00\x0c":
            i += 1
        elif c == b"%":  # comment to EOL
            j = i
            while j < n and data[j : j + 1] not in b"\r\n":
                j += 1
            i = j
        elif c == b"(":
            out = bytearray()
            depth, j = 1, i + 1
            while j < n and depth:
                ch = data[j]
                if ch == 0x5C:  # backslash
                    nxt = data[j + 1] if j + 1 < n else 0
                    if nxt in _ESCAPES:
                        out += _ESCAPES[nxt]
                        j += 2
                    elif 0x30 <= nxt <= 0x37:  # octal, 1-3 digits
                        k, val = j + 1, 0
                        while k < n and k < j + 4 and 0x30 <= data[k] <= 0x37:
                            val = val * 8 + (data[k] - 0x30)
                            k += 1
                        out.append(val & 0xFF)
                        j = k
                    elif nxt in (0x0A, 0x0D):  # line continuation
                        j += 2
                        if nxt == 0x0D and j < n and data[j] == 0x0A:
                            j += 1
                    else:  # lone backslash: drop it, keep the char
                        out.append(nxt)
                        j += 2
                else:
                    if ch == 0x28:
                        depth += 1
                    elif ch == 0x29:
                        depth -= 1
                        if not depth:
                            j += 1
                            break
                    out.append(ch)
                    j += 1
            yield ("str", bytes(out))
            i = j
        elif c == b"<":
            if data[i : i + 2] == b"<<":  # dict (ExtGState etc.): skip
                depth, j = 1, i + 2
                while j < n and depth:
                    if data[j : j + 2] == b"<<":
                        depth += 1
                        j += 2
                    elif data[j : j + 2] == b">>":
                        depth -= 1
                        j += 2
                    else:
                        j += 1
                i = j
            else:  # hex string
                j = data.find(b">", i)
                if j < 0:
                    raise ValueError("unterminated hex string")
                hx = re.sub(rb"\s", b"", data[i + 1 : j])
                if len(hx) % 2:
                    hx += b"0"
                yield ("str", bytes.fromhex(hx.decode("ascii")))
                i = j + 1
        elif c in b"[]":
            yield ("arr", c.decode())
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and data[j : j + 1] not in b" \t\r\n()<>[]{}/%":
                j += 1
            i = j  # names (font selections etc.) carry no text
        elif re.match(rb"[-+.0-9]", c):
            j = i
            while j < n and re.match(rb"[-+.0-9eE]", data[j : j + 1]):
                j += 1
            yield ("num", float(data[i:j]))
            i = j
        else:
            j = i
            while j < n and re.match(rb"[A-Za-z'\"*01]", data[j : j + 1]):
                j += 1
            if j == i:
                raise ValueError(f"bad content byte {data[i:i+1]!r} at {i}")
            yield ("op", data[i:j].decode("ascii"))
            i = j


def extract_content_text(data: bytes) -> str:
    """Text of ONE decoded content stream: Tj/TJ/'/\" show operators
    accumulate onto the current line; Td/TD with a vertical component,
    T*, ' and \" start a new line. Lines join with '\\n'."""
    lines: list[bytearray] = [bytearray()]
    stack: list = []
    in_array: list = []

    def show(s: bytes) -> None:
        lines[-1] += s

    for kind, val in _tokenize_content(data):
        if kind == "arr":
            if val == "[":
                in_array = []
                stack.append(in_array)
            else:
                pass  # array stays on stack until its operator pops it
        elif kind in ("str", "num"):
            if stack and isinstance(stack[-1], list):
                stack[-1].append((kind, val))
            else:
                stack.append((kind, val))
        else:  # operator
            op = val
            if op == "Tj":
                if stack and isinstance(stack[-1], tuple):
                    k, s = stack.pop()
                    if k == "str":
                        show(s)
            elif op == "TJ":
                if stack and isinstance(stack[-1], list):
                    for k, s in stack.pop():
                        if k == "str":
                            show(s)
            elif op == "'":
                lines.append(bytearray())
                if stack and isinstance(stack[-1], tuple):
                    k, s = stack.pop()
                    if k == "str":
                        show(s)
            elif op == '"':
                lines.append(bytearray())
                if stack and isinstance(stack[-1], tuple):
                    k, s = stack.pop()
                    if k == "str":
                        show(s)
                stack = []
            elif op in ("Td", "TD"):
                ty = stack.pop() if stack else ("num", 0.0)
                stack and stack.pop()  # tx
                if ty[0] == "num" and ty[1] != 0:
                    lines.append(bytearray())
            elif op == "T*":
                lines.append(bytearray())
            elif op == "BI":
                raise NotImplementedError(  # variant guard: the BI
                    # OPERATOR (inline image) — tokenized outside
                    # strings, so text containing 'BI' never trips it
                    "inline images (BI..EI) are out of subset"
                )
            else:
                stack = []  # any other operator clears its operands
    text = "\n".join(ln.decode("latin-1") for ln in lines)
    return text.strip("\n")


def pdf_extract_text(b: bytes) -> list[str]:
    """Per-page extracted text of a subset PDF (see module docstring).
    Pages come back in /Kids order (document order fallback)."""
    if not b.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if re.search(rb"/Encrypt\b", b[-2048:]) or re.search(
        rb"trailer[^>]*?/Encrypt\b", b, re.S
    ):
        raise NotImplementedError(  # variant guard
            "encrypted PDFs are out of subset"
        )
    objs = _parse_objects(b)
    # page order: the /Pages node's /Kids array if present
    page_nums: list[int] = []
    for num, (header, _) in objs.items():
        if re.search(rb"/Type\s*/Pages\b", header):
            km = re.search(rb"/Kids\s*\[([^\]]*)\]", header)
            if km:
                page_nums = [int(m.group(1)) for m in _REF_RE.finditer(km.group(1))]
            break
    if not page_nums:
        page_nums = [
            num
            for num, (header, _) in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", header)
        ]
    out: list[str] = []
    for pnum in page_nums:
        header, _ = objs[pnum]
        cm = re.search(
            rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", header
        )
        if not cm:
            out.append("")
            continue
        parts: list[str] = []
        for m in _REF_RE.finditer(cm.group(1)):
            cnum = int(m.group(1))
            chead, cdata = objs[cnum]
            if cdata is None:
                raise ValueError(f"/Contents {cnum} is not a stream")
            parts.append(
                extract_content_text(_decode_stream(chead, cdata, cnum))
            )
        out.append("\n".join(p for p in parts if p))
    return out
