"""Minimal PDF text/layout extraction, stdlib-only.

The north rule scopes "HTML boilerplate strip, PDF/layout parse, DOM
heuristics". This module is the PDF leg: a deliberately small extractor for
the common machine-generated shape —

* content streams located via ``stream…endstream``, FlateDecode handled
  with stdlib zlib (raw fallback for uncompressed streams);
* text runs pulled from ``BT…ET`` blocks: each ``(…) Tj`` show-text is one
  line; a ``[…] TJ`` array concatenates its string elements into one line
  (kerning numbers ignored);
* PDF literal-string escapes (\\( \\) \\\\ \\n \\r \\t \\b \\f and octal
  \\ddd) are unescaped; bytes decode as UTF-8 with Latin-1 fallback.

Out of scope, by design (documented limits, not silent wrongness): font
CMap/ToUnicode remapping (CJK-embedded-font PDFs), encrypted PDFs, and
object streams — a payload we cannot extract any text from yields the same
``status='error'`` row as an unreadable image (certificate_ocr.py:100-105);
a real cluster swaps in a pdfium/poppler backend behind the same function.

Payload routing lives in htmltext.extract_page: ``%PDF-`` magic → here,
anything else → the HTML segmenter. The rest of the pipeline (batching,
lineage, streaming, field extraction) is format-agnostic.
"""

from __future__ import annotations

import re
import zlib

PDF_MAGIC = b"%PDF-"

# '(?<!end)': the bare keyword also occurs inside 'endstream\n'
_STREAM_OPEN = re.compile(rb"(?<!end)stream\r?\n")
_STREAM_TAIL = re.compile(rb"(.*?)\r?\nendstream", re.DOTALL)
# Direct /Length in the stream's own dict: binary stream bytes may
# legitimately END in 0x0D, which the \r?\n in _STREAM_TAIL would swallow
# (truncating e.g. a Flate stream by one byte) — the declared length slices
# exactly. `(?!\s*\d+\s+R)` rejects indirect references ('/Length 5 0 R'),
# whose object number must NOT be read as a byte count.
_STREAM_LEN = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
# Literal string incl. ONE level of spec-legal balanced nested parens
# (PDF 7.3.4.2); deeper nesting is handled by the block SCANNER below
# (arbitrary depth) but not by the show-text extraction regexes.
_PDF_STRING = rb"\((?:\\.|[^\\()]|\((?:\\.|[^\\()])*\))*\)"
_SHOW_TJ = re.compile(_PDF_STRING + rb"\s*Tj")


_PDF_WS = b"\x00\t\n\x0c\r "


def _skip_inline_image(content: bytes, i: int) -> int:
    """``i`` at a ``BI`` token: return the index just past the inline
    image's closing ``EI`` — the ID…EI binary data may contain parens,
    "BT", or "ET" bytes that must never reach the block scanner. BOTH
    markers are accepted only at a whitespace-delimited token boundary
    (binary or a name like /IDTree that merely CONTAINS the two letters
    scans on — ADVICE r6 closed the bare ``find(b"ID")``, which let a
    stray BI plus an embedded "ID" byte pair start binary-skip mode and
    a later token-boundary EI swallow real BT…ET blocks), and the BI→ID
    search is capped like _skip_string so corrupt content can't rescan
    to EOF. No token-boundary ID/EI found ⇒ resume just after BI
    (scan-on, don't eat the tail)."""
    n = len(content)
    limit = min(n, i + 2 + _STRING_SCAN_CAP)
    idp = content.find(b"ID", i + 2)
    while 0 <= idp < limit:
        before = content[idp - 1:idp]
        after = content[idp + 2:idp + 3]
        if ((not before or before in _PDF_WS)
                and (not after or after in _PDF_WS)):
            break
        idp = content.find(b"ID", idp + 1)
    else:
        return i + 2
    k = idp + 2
    if k < n and content[k:k + 1] in _PDF_WS:    # one ws byte after ID
        k += 1
    while True:
        e = content.find(b"EI", k)
        if e < 0:
            return i + 2
        before = content[e - 1:e]
        after = content[e + 2:e + 3]
        if ((not before or before in _PDF_WS)
                and (not after or after in _PDF_WS)):
            return e + 2
        k = e + 1


_STRING_SCAN_CAP = 1 << 16


def _skip_string(content: bytes, i: int) -> int:
    """``i`` at an opening ``(``: index just past the matching ``)``
    (escape-aware, arbitrary nesting — PDF 7.3.4.2 allows unescaped
    balanced parens), or ``-1`` when no match exists within
    ``_STRING_SCAN_CAP`` bytes. The cap bounds the damage of an
    unbalanced ``(`` in corrupt/binary content: without it each bogus
    open would rescan to EOF (quadratic on hostile streams) and a bogus
    ')' megabytes later could swallow real text blocks as "string"."""
    n = min(len(content), i + 1 + _STRING_SCAN_CAP)
    depth, k = 1, i + 1
    while k < n and depth:
        ch = content[k:k + 1]
        if ch == b"\\":
            k += 2
            continue
        if ch == b"(":
            depth += 1
        elif ch == b")":
            depth -= 1
        k += 1
    return k if depth == 0 else -1


def _find_text_blocks(content: bytes) -> list[bytes]:
    """Bodies of the BT…ET text objects, via a STRING-AWARE linear scan:
    parenthesized literals (arbitrary nesting depth, escape-aware) are
    skipped atomically BOTH inside and outside text objects, and BT/ET
    only count at letter boundaries — so a show-text line that contains
    (or IS) "ET"/"BT", or a name like /FNET, can never open or close a
    block (the previous lazy ``BT(.*?)ET`` regex terminated at an ET
    inside a literal — found by hypothesis — and the string-alternation
    regex that replaced it dropped whole blocks on spec-legal nested
    parens).

    Outside text objects the legal string carriers are BDC/DP
    marked-content property lists (e.g. ``/ActualText (50% off)``) — a
    ``%`` inside one must not comment out the rest of the line and a
    ``BT`` inside one must not open a phantom block, so those strings
    are skipped like any other. The ADVICE-r5 hazard (an unbalanced
    ``(`` in corrupt content flipping the scanner into string mode and
    eating every later block) is bounded instead of special-cased: a
    paren with no match within ``_STRING_SCAN_CAP`` bytes is treated as
    not-a-string and scanning resumes just after it. ``%`` comments run
    to end-of-line and ``BI…ID…EI`` inline-image binary is skipped at
    token granularity."""
    blocks: list[bytes] = []
    i, n = 0, len(content)
    start = None

    def is_tok(j: int, word: bytes) -> bool:
        end = j + len(word)
        if content[j:end] != word:
            return False
        before = content[j - 1:j]
        after = content[end:end + 1]
        return not before.isalpha() and not after.isalpha()

    while i < n:
        c = content[i:i + 1]
        if c == b"%":                       # comment: to end of line
            eols = [p for p in (content.find(b"\r", i),
                                content.find(b"\n", i)) if p >= 0]
            i = min(eols) if eols else n
            continue
        if c == b"(":
            k = _skip_string(content, i)
            # no match in range: resume after the opening paren — the
            # remaining operators (and any BT/ET) must still scan
            i = k if k >= 0 else i + 1
            continue
        if start is None:
            if c == b"B" and is_tok(i, b"BT"):
                i += 2
                start = i
                continue
            if c == b"B" and is_tok(i, b"BI"):
                i = _skip_inline_image(content, i)
                continue
            i += 1
            continue
        if c == b"E" and is_tok(i, b"ET"):
            blocks.append(content[start:i])
            start = None
            i += 2
            continue
        i += 1
    return blocks
_SHOW_ARRAY = re.compile(rb"\[((?:" + _PDF_STRING + rb"|[^\]])*)\]\s*TJ")
_LITERAL = re.compile(_PDF_STRING)
_OCTAL = re.compile(rb"\\([0-7]{1,3})")

_SIMPLE_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        ch = raw[i:i + 1]
        if ch != b"\\":
            out += ch
            i += 1
            continue
        nxt = raw[i + 1:i + 2]
        if nxt and nxt in _SIMPLE_ESCAPES:
            out += _SIMPLE_ESCAPES[nxt]
            i += 2
        elif nxt and nxt.isdigit():
            m = _OCTAL.match(raw, i)
            out += bytes([int(m.group(1), 8) & 0xFF])
            i = m.end()
        else:
            i += 1   # lone backslash: line continuation / unknown → dropped
    return bytes(out)


def _decode_text(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _string_content(literal: bytes) -> str:
    return _decode_text(_unescape(literal[1:-1]))


def _iter_streams(data: bytes):
    """Content-stream payloads in document order. PER STREAM (not
    all-or-nothing): a direct /Length in the stream's own dict slices the
    exact byte count (the correct way — stream bytes are arbitrary binary,
    and the slice is accepted only if 'endstream' really follows it);
    otherwise — indirect /Length ('5 0 R'), nested dicts the header scan
    can't see through, or no length at all — fall back to the tolerant
    stream…endstream scan for THAT stream."""
    prev_end = 0
    for m in _STREAM_OPEN.finditer(data):
        start = m.end()
        # guard on match START: a keyword STRADDLING a payload's end
        # boundary (payload ends in b'stream', its EOL supplies the \n)
        # would pass an end-based check and spawn a phantom stream that
        # swallows the next real one
        if m.start() < prev_end:
            continue
        # the stream's own dict is the bytes since the previous stream
        lm = None
        for lm in _STREAM_LEN.finditer(data, prev_end, m.start()):
            pass                  # keep the LAST /Length before this stream
        payload = None
        if lm is not None:
            n = int(lm.group(1))
            tail = data[start + n:start + n + 16]
            if tail.lstrip(b"\r\n").startswith(b"endstream"):
                payload = data[start:start + n]
        if payload is None:       # fallback: scan to the next endstream
            tm = _STREAM_TAIL.match(data, start)
            if tm is None:
                break
            payload = tm.group(1)
        prev_end = start + len(payload)
        yield payload


def extract_pdf_lines(data: bytes) -> list[str]:
    """All text lines of a simple PDF, in content-stream order. Empty list
    when nothing extractable (caller turns that into an error row)."""
    lines: list[str] = []
    for payload in _iter_streams(data):
        try:
            content = zlib.decompress(payload)
        except zlib.error:
            content = payload
        for body in _find_text_blocks(content):
            events: list[tuple[int, str]] = []
            for sm in _SHOW_TJ.finditer(body):
                lit = _LITERAL.match(sm.group(0))
                events.append((sm.start(), _string_content(lit.group(0))))
            for am in _SHOW_ARRAY.finditer(body):
                parts = [_string_content(x.group(0))
                         for x in _LITERAL.finditer(am.group(1))]
                events.append((am.start(), "".join(parts)))
            for _, text in sorted(events, key=lambda e: e[0]):
                stripped = text.strip()
                if stripped:
                    lines.append(stripped)
    return lines


def extract_pdf_page(data: bytes) -> dict:
    """Same result shape as htmltext.extract_page (status/message/lines/
    confs/strategy) so the pipeline is format-agnostic."""
    lines = extract_pdf_lines(data)
    if not lines:
        return {"status": "error", "message": "no text extracted",
                "lines": [], "confs": [], "strategy": ""}
    confs = [min(1.0, 0.5 + len(ln) / 80.0) for ln in lines]
    return {"status": "success", "message": "",
            "lines": lines, "confs": confs, "strategy": "pdf"}


# ------------------------------------------------------------ test fixture
def make_simple_pdf(lines: list[str], compress: bool = False) -> bytes:
    """A minimal single-page PDF whose content stream shows each line with
    a Tj operator (escaping applied). Valid enough for any PDF text
    extractor that reads content streams."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "72 760 Td"]
    for i, ln in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc(ln)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("utf-8")
    flags = b""
    if compress:
        content = zlib.compress(content)
        flags = b" /Filter /FlateDecode"
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + flags + b" >>\n"
        b"stream\n" + content + b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )
