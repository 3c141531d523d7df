"""HTML → main-content text lines (boilerplate strip), pure Python.

This is the web-text analog of the reference's image→text stage
(certificate_ocr.py:85-149): decode the raw document payload, run TWO
recognition strategies, pick the one that recovers more text (first wins on
ties — certificate_ocr.py:131), and emit kept lines + per-line confidences.

Strategy analog map (reference → here):

* ``cv2.imread`` returning None → undecodable/empty payload ⇒ caller emits a
  ``status='error'`` row, never an exception (certificate_ocr.py:100-105).
* raw-image OCR (strategy 1) → STRICT pass: strict UTF-8 decode + segment
  extraction with tight link-density thresholds.
* ``enhance_image`` + OCR (strategy 2, certificate_ocr.py:59-83,:116-117)
  → REPAIR pass: tolerant decode (errors='replace'), control-char strip,
  same segmenter. It only beats the strict pass when strict recovery fails
  or is partial — mirroring "enhancement helps only when raw OCR fails".
* pick-best ``max(results, key=total text)`` with first-wins ties
  (certificate_ocr.py:131) → :func:`extract_page` scores by summed kept-line
  length; the strict pass is listed first so it wins ties.
* per-word OCR confidence (certificate_ocr.py:139-143) → deterministic
  per-line confidence from block link-density + length (formula below).

Boilerplate strip is Readability/trafilatura-style but written from
scratch: the document is cut into text *segments* at block-tag boundaries
(document order preserved), each segment tracks total vs anchor-text
characters, and a segment is kept iff it is not inside a killed container
(script/style/nav/footer/… tags, or class/id matching a boilerplate
pattern, or display:none) and its link density is below threshold.

Scale note: this runs inside mapInPandas Arrow batches on executors —
stdlib-only by design (the container has no lxml/selectolax); the parser
backend is a single function (:func:`segment_html`) so a faster native
backend is a drop-in swap on a real cluster.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ocr_award_extractor_spark.functions.ocr_slot import (
    ocr_image_page, sniff_image,
)
from ocr_award_extractor_spark.functions.pdftext import (
    PDF_MAGIC, extract_pdf_page,
)

# Containers whose entire subtree is never content.
KILL_TAGS = frozenset(
    "script style noscript template head title svg math iframe object embed "
    "form button select option textarea nav footer header aside menu dialog".split()
)
# Tags that delimit text segments (line boundaries).
BLOCK_TAGS = frozenset(
    "p div article section main li ul ol h1 h2 h3 h4 h5 h6 td th tr table "
    "thead tbody blockquote pre figcaption dd dt dl br hr body".split()
)
# void elements that never produce endtags we need to balance
_BOILER_ATTR = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|footer|header|sidebar|sitemap|comment|comments|"
    r"ad|ads|advert|banner|breadcrumb|breadcrumbs|related|share|social|promo|"
    r"widget|cookie|copyright|disclaimer)(?:$|[\s_-])",
    re.IGNORECASE,
)
_DISPLAY_NONE = re.compile(r"display\s*:\s*none", re.IGNORECASE)
_WS_RUN = re.compile(r"\s+")
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f�]")

STRICT_LINK_DENSITY = 0.35
MIN_SEGMENT_CHARS = 2


@dataclass
class Segment:
    """One contiguous text run between block boundaries."""

    parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    killed: bool = False

    def text(self) -> str:
        return _WS_RUN.sub(" ", "".join(self.parts)).strip()


class _Segmenter(HTMLParser):
    """Event-driven segment collector; tolerant of unbalanced markup."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list[Segment] = []
        self._cur = Segment()
        self._kill_depth = 0          # inside KILL_TAGS subtree
        self._boiler_depth = 0        # inside class/id-flagged boilerplate
        self._a_depth = 0
        self._kill_stack: list[str] = []
        self._boiler_stack: list[str] = []

    # -- segment plumbing ---------------------------------------------------
    def _flush(self) -> None:
        cur = self._cur
        suppressed = self._suppressed()
        if not cur.parts:
            # nothing to emit: reuse the segment, just refresh its killed
            # flag (identical semantics, ~half the allocations — block tags
            # flush ~90×/doc and most flushes are empty)
            cur.killed = suppressed
            return
        self.segments.append(cur)
        self._cur = Segment(killed=suppressed)

    def _suppressed(self) -> bool:
        return self._kill_depth > 0 or self._boiler_depth > 0

    @staticmethod
    def _is_boiler_attrs(attrs) -> bool:
        for name, value in attrs:
            if value is None:
                continue
            if name in ("class", "id") and _BOILER_ATTR.search(value):
                return True
            if name == "style" and _DISPLAY_NONE.search(value):
                return True
        return False

    # -- parser events ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in KILL_TAGS:
            self._flush()
            if tag != "br" and tag != "hr":
                self._kill_depth += 1
                self._kill_stack.append(tag)
            return
        boiler = self._is_boiler_attrs(attrs)
        if tag in BLOCK_TAGS or boiler:
            self._flush()
        if boiler:
            self._boiler_depth += 1
            self._boiler_stack.append(tag)
        if tag == "a":
            self._a_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag in BLOCK_TAGS:  # <br/>, <hr/>
            self._flush()

    def handle_endtag(self, tag):
        if tag in KILL_TAGS:
            self._flush()
            if self._kill_stack and tag in self._kill_stack:
                # pop up to and including the matching open (tolerates nesting)
                while self._kill_stack:
                    popped = self._kill_stack.pop()
                    self._kill_depth -= 1
                    if popped == tag:
                        break
            return
        if self._boiler_stack and tag == self._boiler_stack[-1]:
            self._flush()
            self._boiler_stack.pop()
            self._boiler_depth -= 1
        elif tag in BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._a_depth > 0:
            self._a_depth -= 1

    def handle_data(self, data):
        if not data:
            return
        if self._suppressed():
            self._cur.killed = True
            return
        self._cur.parts.append(data)
        if self._a_depth > 0:
            self._cur.link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def segment_html_stdlib(html_str: str) -> list[Segment]:
    """Reference tokenizer: stdlib HTMLParser driving the segmenter.
    Never raises on malformed markup (HTMLParser is tolerant by
    construction). The fast scanner below must be event-equal to this on
    every document it accepts — pinned by tests/test_fast_segmenter.py."""
    seg = _Segmenter()
    try:
        seg.feed(html_str)
        seg.close()
    except Exception:  # pragma: no cover — stdlib parser is non-raising
        pass
    return [s for s in seg.segments if not s.killed]


# --------------------------------------------------------------------------
# Fast tokenizer: a flat regex scanner emitting the SAME event stream into
# the SAME _Segmenter handlers, ~2× the stdlib parser (which spends its
# time in goahead/updatepos/per-event dispatch). Fidelity strategy:
# faithful-or-bail — any construct whose stdlib treatment is subtle
# (quoted '>' in attribute values, stray '<' in text, bogus end tags,
# marked sections, unterminated markup) raises _FastBail and the document
# reruns on the stdlib path, so output can differ ONLY if the scanner
# mis-handles a construct it claims to handle, which the dual-run equality
# tests + golden suite pin. Attribute lists are parsed with html.parser's
# OWN attrfind_tolerant (values entity-unescaped identically) and are
# skipped entirely when the tag carries no class/id/style — the only
# attributes the segmenter reads.

from html import unescape as _unescape  # noqa: E402  (html.parser's own)
from html.parser import attrfind_tolerant as _attrfind  # noqa: E402


class _FastBail(Exception):
    pass


_FAST_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# start tag with optionally-quoted attr blob; quotes may not contain <>
# (html.parser allows a quoted '>' — that shape bails to stdlib)
_FAST_START = re.compile(
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)((?:\"[^\"<>]*\"|'[^'<>]*'|[^<>'\"])*)>"
)
_FAST_BOILER_HINT = re.compile(r"(?i)(?:^|[\s/'\"])(?:class|id|style)\s*=")
_FAST_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
# stdlib closes a comment at '--' + optional whitespace + '>' (markupbase
# parse_comment), NOT only at the literal '-->'
_FAST_COMMENT_CLOSE = re.compile(r"--\s*>")


def _stdlib_fast_compatible() -> bool:
    """The fast scanner mirrors CPython 3.11 html.parser tokenization
    details. Those are PRIVATE stdlib behavior — 3.13 changed
    set_cdata_mode to end CDATA at '</script' + space/slash, which would
    silently diverge from _FAST_CDATA_CLOSE. Probe the live interpreter's
    actual patterns at import; on any mismatch the fast path is disabled
    and every document takes the stdlib parser (slower, never wrong)."""
    try:
        import _markupbase as _mb
        from html.parser import HTMLParser as _HP

        probe = _HP()
        probe.set_cdata_mode("script")
        return (
            probe.interesting.pattern == _FAST_CDATA_CLOSE["script"].pattern
            and _mb._commentclose.pattern == _FAST_COMMENT_CLOSE.pattern
            and _HP.CDATA_CONTENT_ELEMENTS == ("script", "style")
        )
    except Exception:
        return False


_FAST_ENABLED = _stdlib_fast_compatible()


def _fast_attrs(blob: str):
    """attrfind_tolerant loop over the attr blob. The leading space
    supplies the regex's lookbehind (mirroring the whitespace tagfind
    consumed); the trailing '>' sentinel restores the context attrfind's
    `/(?!>)` tail sees in rawdata — without it a self-closing slash at
    blob end is swallowed as inter-attr junk (<p class="x"/> would turn
    into an unclosed suppressor; caught by the attr-shape fuzz).
    Returns (attrs, unconsumed-remainder) — caller bails unless the
    remainder is '' (normal tag) or '/' (self-closing)."""
    attrs = []
    blob2 = " " + blob.strip() + ">"
    end = len(blob2) - 1
    k = 1
    while k < end:
        am = _attrfind.match(blob2, k)
        if not am or am.end() == k:
            break
        name, rest, val = am.group(1, 2, 3)
        if not rest:
            val = None
        elif val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
            val = val[1:-1]
        if val and "&" in val:
            val = _unescape(val)
        attrs.append((name.lower(), val))
        k = am.end()
    return attrs, blob2[k:end].strip()


_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _fast_scan(rd: str, seg: _Segmenter) -> None:
    n = len(rd)
    i = 0
    find = rd.find
    hd = seg.handle_data
    hs = seg.handle_starttag
    he = seg.handle_endtag
    start_match = _FAST_START.match
    end_match = _FAST_END.match
    boiler_search = _FAST_BOILER_HINT.search
    while i < n:
        j = find("<", i)
        if j < 0:
            chunk = rd[i:n]
            if chunk:
                hd(_unescape(chunk) if "&" in chunk else chunk)
            break
        if j > i:
            chunk = rd[i:j]
            hd(_unescape(chunk) if "&" in chunk else chunk)
        c = rd[j + 1:j + 2]
        # ASCII letters only, like starttagopen — a non-ASCII alpha would
        # fail _FAST_START anyway and bail; this skips both regex calls
        if c in _ASCII_LETTERS:
            m = start_match(rd, j)
            if not m:
                raise _FastBail
            tag = m.group(1).lower()
            blob = m.group(2)
            endpos = m.end()
            if blob and boiler_search(blob):
                attrs, rem = _fast_attrs(blob)
            elif blob.endswith("/"):
                # trailing slash: self-closing, unless it is the tail of an
                # unquoted attr value (html.parser keeps it in the value)
                attrs = []
                rem = _fast_attrs(blob)[1] if "=" in blob else "/"
            else:
                attrs, rem = [], ""
            if rem == "":
                hs(tag, attrs)
                if tag in _FAST_CDATA_CLOSE:   # script/style: raw till close
                    cm = _FAST_CDATA_CLOSE[tag].search(rd, endpos)
                    if not cm:
                        raise _FastBail
                    if cm.start() > endpos:
                        hd(rd[endpos:cm.start()])
                    he(tag)
                    endpos = cm.end()
            elif rem == "/":
                seg.handle_startendtag(tag, attrs)
            else:
                raise _FastBail   # junk in tag: stdlib demotes it to data
            i = endpos
        elif c == "/":
            m = end_match(rd, j)
            if not m:
                raise _FastBail
            he(m.group(1).lower())
            i = m.end()
        elif c == "!":
            if rd.startswith("<!--", j):
                cm = _FAST_COMMENT_CLOSE.search(rd, j + 4)
                if not cm:
                    raise _FastBail
                i = cm.end()
            else:   # doctype/decl — ignored; '[' would mean a marked section
                e = find(">", j)
                if e < 0 or "[" in rd[j:e]:
                    raise _FastBail
                i = e + 1
        elif c == "?":
            e = find(">", j)
            if e < 0:
                raise _FastBail
            i = e + 1
        else:       # stray '<' in text — stdlib has bespoke recovery
            raise _FastBail
    return None


def segment_html(html_str: str) -> list[Segment]:
    """Parse HTML into document-order text segments: fast scanner first,
    stdlib HTMLParser whenever the scanner declines the document (or the
    interpreter's html.parser internals drifted — see _FAST_ENABLED)."""
    if not _FAST_ENABLED:
        return segment_html_stdlib(html_str)
    seg = _Segmenter()
    try:
        _fast_scan(html_str, seg)
        seg._flush()
    except _FastBail:
        return segment_html_stdlib(html_str)
    return [s for s in seg.segments if not s.killed]


def line_confidence(text_len: int, link_density: float, repaired: bool) -> float:
    """Deterministic per-line confidence in [0, 1]:
    (1 - link_density) * min(1, 0.5 + len/80), ×0.9 on the repair pass."""
    conf = (1.0 - link_density) * min(1.0, 0.5 + text_len / 80.0)
    if repaired:
        conf *= 0.9
    return max(0.0, min(1.0, conf))


def _segments_to_lines(segments: list[Segment], repaired: bool):
    lines: list[str] = []
    confs: list[float] = []
    for seg in segments:
        text = seg.text()
        if len(text) < MIN_SEGMENT_CHARS:
            continue
        total = sum(len(p) for p in seg.parts)
        density = (seg.link_chars / total) if total else 1.0
        if density > STRICT_LINK_DENSITY:
            continue
        lines.append(text)
        confs.append(line_confidence(len(text), density, repaired))
    return lines, confs


def strict_pass(html_bytes: bytes):
    """Strategy 1: strict UTF-8 decode; None if the payload is not valid
    UTF-8 (the repair pass then gets its chance)."""
    try:
        html_str = html_bytes.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None
    return _segments_to_lines(segment_html(html_str), repaired=False)


def repair_pass(html_bytes: bytes):
    """Strategy 2 (the ``enhance_image`` analog): tolerant decode + control
    character strip, then the same segmenter."""
    html_str = html_bytes.decode("utf-8", errors="replace")
    html_str = _CTRL.sub("", html_str)
    return _segments_to_lines(segment_html(html_str), repaired=True)


def extract_page(html_bytes) -> dict:
    """Full page→lines stage with the reference's error contract.

    Returns a dict with keys: status, message, lines, confs, strategy.
    ``status='error'`` rows carry a message and empty lines — never raises
    (certificate_ocr.py:100-105,:122-128 contract).
    """
    if html_bytes is None or len(html_bytes) == 0:
        return {"status": "error", "message": "unreadable document",
                "lines": [], "confs": [], "strategy": ""}
    if isinstance(html_bytes, str):
        html_bytes = html_bytes.encode("utf-8")

    # content-type routing: PDF payloads take the PDF/layout leg; raster
    # images take the pluggable OCR slot (the reference's true input type,
    # certificate_ocr.py:98 — clean error row without a backend, never
    # garbage-parsed as markup); the rest is format-agnostic
    if html_bytes[:5] == PDF_MAGIC:
        return extract_pdf_page(html_bytes)
    fmt = sniff_image(html_bytes)
    if fmt is not None:
        return ocr_image_page(html_bytes, fmt)

    results = []
    strict_str: str | None
    try:
        strict_str = html_bytes.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        strict_str = None

    if strict_str is not None:
        strict = _segments_to_lines(segment_html(strict_str), repaired=False)
        if strict[0]:
            results.append(("strict", strict))
        # The repair pass differs from strict ONLY via tolerant decode +
        # control-char strip. If the strict-decoded text has no control /
        # replacement chars, repair's input string is IDENTICAL, so its
        # result is identical and the first-wins tie-break would pick
        # strict anyway — skip the second parse (≈2× throughput).
        run_repair = bool(_CTRL.search(strict_str))
    else:
        run_repair = True

    if run_repair:
        repaired = repair_pass(html_bytes)
        if repaired[0]:
            results.append(("repair", repaired))

    if not results:
        return {"status": "error", "message": "no text extracted",
                "lines": [], "confs": [], "strategy": ""}

    # pick-best: most recovered text wins, FIRST result wins ties
    # (max is first-wins, matching certificate_ocr.py:131)
    name, (lines, confs) = max(results, key=lambda r: sum(len(ln) for ln in r[1][0]))
    return {"status": "success", "message": "",
            "lines": lines, "confs": confs, "strategy": name}
