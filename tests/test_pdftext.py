"""PDF leg: roundtrip through compressed/uncompressed streams, escape
handling, magic-byte routing through the FULL pipeline, error contract."""

from __future__ import annotations

from ocr_award_extractor_spark.functions.htmltext import extract_page
from ocr_award_extractor_spark.functions.pdftext import (
    extract_pdf_lines, make_simple_pdf,
)

LINES = ["Award Certificate 2024", "Grand Prize (first) \\ winner",
         "Team: Alice, Bob"]


def test_roundtrip_uncompressed():
    assert extract_pdf_lines(make_simple_pdf(LINES)) == LINES


def test_roundtrip_flate_compressed():
    assert extract_pdf_lines(make_simple_pdf(LINES, compress=True)) == LINES


def test_tj_array_concatenation():
    pdf = (b"%PDF-1.4\nstream\nBT [(Hel) -20 (lo ) 5 (world)] TJ ET\nendstream\n")
    assert extract_pdf_lines(pdf) == ["Hello world"]


def test_octal_and_escapes():
    pdf = b"%PDF-1.4\nstream\nBT (A\\051B\\na) Tj ET\nendstream\n"
    # \051 = ')', \n escape stays inside the string then strip keeps it
    assert extract_pdf_lines(pdf) == ["A)B\na"]


def test_magic_routing_through_pipeline():
    page = extract_page(make_simple_pdf(LINES, compress=True))
    assert page["status"] == "success" and page["strategy"] == "pdf"
    assert page["lines"] == LINES


def test_garbage_pdf_is_error_row():
    page = extract_page(b"%PDF-1.4\ntotal garbage no streams")
    assert page["status"] == "error"
    assert page["message"] == "no text extracted"


def test_pdf_through_spark_pipeline(spark):
    import datetime

    from ocr_award_extractor_spark.operators.extract_pipeline import extract_documents

    ts = datetime.datetime(2024, 3, 1)
    rows = [
        ("pdf1", ts, "zh", make_simple_pdf(["证书", "荣获一等奖", "获奖学生：张三"], compress=True)),
        ("html1", ts, "zh", "<html><body><p>荣获二等奖</p></body></html>".encode()),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, lang string, html binary")
    got = {r["url"]: r for r in extract_documents(df).collect()}
    assert got["pdf1"]["strategy"] == "pdf"
    assert got["pdf1"]["award_level"] == "一等奖"
    assert got["pdf1"]["winner"] == ["张三"]
    assert got["html1"]["strategy"] == "strict"
    assert got["html1"]["award_level"] == "二等奖"


def test_flate_stream_ending_in_carriage_return():
    """Regression: compressed stream bytes ending in 0x0D were truncated by
    the \\r?\\n in the endstream regex; /Length-aware slicing must win."""
    from ocr_award_extractor_spark.functions.pdftext import (
        _STREAM_LEN, _STREAM_OPEN, extract_pdf_lines, make_simple_pdf,
    )

    lines = ["probe 189999"]   # found by search: flate stream ends in 0x0D
    pdf = make_simple_pdf(lines, compress=True)
    m = _STREAM_OPEN.search(pdf)
    n = int(_STREAM_LEN.search(pdf).group(1))
    body = pdf[m.end():m.end() + n]
    assert body.endswith(b"\r"), "fixture no longer triggers the edge case"
    assert extract_pdf_lines(pdf) == lines


def test_indirect_length_and_mixed_streams():
    """Indirect /Length ('N 0 R') must NOT be read as a byte count, and the
    endstream-scan fallback is per-stream: a parseable direct-Length stream
    must not suppress recovery of a sibling whose dict defeats the header
    scan."""
    import zlib

    from ocr_award_extractor_spark.functions.pdftext import extract_pdf_lines

    content_a = b"BT (indirect stream line) Tj ET"
    content_b = b"BT (direct stream line) Tj ET"
    content_c = zlib.compress(b"BT (nested dict line) Tj ET")
    pdf = (
        b"%PDF-1.4\n"
        b"4 0 obj << /Length 12 0 R >>\nstream\n" + content_a + b"\nendstream\nendobj\n"
        b"12 0 obj " + str(len(content_a)).encode() + b" endobj\n"
        b"5 0 obj << /Length " + str(len(content_b)).encode() + b" >>\nstream\n"
        + content_b + b"\nendstream\nendobj\n"
        b"6 0 obj << /Length " + str(len(content_c)).encode()
        + b" /Filter /FlateDecode /DecodeParms << /Predictor 1 >> >>\nstream\n"
        + content_c + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_lines(pdf) == [
        "indirect stream line", "direct stream line", "nested dict line",
    ]


def test_stream_iterator_edge_cases():
    """Per-stream iterator vs hostile payloads: keyword bytes inside
    binary payloads, lengths past EOF, missing endstream."""
    from ocr_award_extractor_spark.functions.pdftext import _iter_streams

    # payload CONTAINS 'stream\n' and 'endstream' as binary bytes — the
    # /Length slice must carry them through intact
    evil = b"xx stream\n yy endstream zz"
    pdf = (b"1 0 obj << /Length " + str(len(evil)).encode() + b" >>\n"
           b"stream\n" + evil + b"\nendstream\nendobj\n"
           b"2 0 obj << /Length 4 >>\nstream\nABCD\nendstream\n")
    got = list(_iter_streams(pdf))
    assert got == [evil, b"ABCD"]

    # declared length runs past EOF -> fall back to the endstream scan
    pdf2 = b"<< /Length 9999 >>\nstream\nSHORT\nendstream\n"
    assert list(_iter_streams(pdf2)) == [b"SHORT"]

    # stream never closed -> no payload, no exception
    pdf3 = b"<< /Length 9999 >>\nstream\nNO CLOSE EVER"
    assert list(_iter_streams(pdf3)) == []


def test_pdf_roundtrip_fuzz():
    """Round-trip property: any printable line set survives make_simple_pdf
    -> extract_pdf_lines byte-identically, compressed or not; random junk
    never raises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_award_extractor_spark.functions.pdftext import (
        extract_pdf_lines, make_simple_pdf,
    )

    lines_st = st.lists(
        st.text(st.characters(min_codepoint=32, max_codepoint=0x2FFF),
                min_size=1, max_size=40).map(str.strip).filter(bool),
        min_size=1, max_size=8,
    )

    @settings(max_examples=150, deadline=None)
    @given(lines_st, st.booleans())
    def roundtrip(lines, compress):
        pdf = make_simple_pdf(lines, compress=compress)
        assert extract_pdf_lines(pdf) == lines

    roundtrip()

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=400))
    def junk(data):
        extract_pdf_lines(b"%PDF-1.4\n" + data)   # must not raise

    junk()


def test_payload_ending_in_stream_keyword():
    """Regression: a /Length payload ENDING in b'stream' (its EOL supplies
    the \\n) must not spawn a phantom stream that swallows the next one."""
    import zlib

    from ocr_award_extractor_spark.functions.pdftext import (
        _iter_streams, extract_pdf_lines,
    )

    evil = b"BINARY DATA ending in stream"
    nxt = zlib.compress(b"BT (second stream text) Tj ET")
    pdf = (b"1 0 obj << /Length " + str(len(evil)).encode() + b" >>\n"
           b"stream\n" + evil + b"\nendstream\nendobj\n"
           b"2 0 obj << /Length " + str(len(nxt)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + nxt + b"\nendstream\n")
    assert list(_iter_streams(pdf)) == [evil, nxt]
    assert extract_pdf_lines(pdf) == ["second stream text"]


def test_et_inside_string_literal_does_not_truncate_block():
    """Regression (hypothesis, round 5): a show-text literal containing
    'ET' — or a line that IS 'ET' — must not terminate the BT…ET block
    mid-string; token-boundary names like /FNET must not either."""
    assert extract_pdf_lines(make_simple_pdf(["ET"])) == ["ET"]
    assert extract_pdf_lines(make_simple_pdf(["NET gains BT losses"])) == \
        ["NET gains BT losses"]
    pdf = (b"%PDF-1.4\nstream\n"
           b"BT /FNET 12 Tf (kept) Tj ET\nendstream\n")
    assert extract_pdf_lines(pdf) == ["kept"]


def test_nested_balanced_parens_do_not_drop_the_block():
    """Regression (round-5 review): spec-legal nested balanced parens in
    a literal (PDF 7.3.4.2) must not drop the whole BT..ET block — and a
    one-depth nested literal extracts with its parens intact."""
    pdf = (b"%PDF-1.4\nstream\n"
           b"BT /F1 12 Tf (a (nested) b) Tj 0 -14 Td (other line) Tj ET\n"
           b"endstream\n")
    assert extract_pdf_lines(pdf) == ["a (nested) b", "other line"]
    # two-deep nesting: the literal itself is beyond the show-text regex
    # (documented limit) but the BLOCK must survive and later lines show
    pdf2 = (b"%PDF-1.4\nstream\n"
            b"BT ((two (deep)) x) Tj (still here) Tj ET\nendstream\n")
    assert "still here" in extract_pdf_lines(pdf2)


def test_stray_paren_outside_blocks_does_not_eat_later_blocks():
    """Regression (ADVICE r5): an unbalanced '(' in non-string content
    OUTSIDE a text object (comment, inline-image binary, corruption)
    must not flip the scanner into string-skip mode and drop every
    subsequent BT..ET block."""
    pdf = (b"%PDF-1.4\nstream\n"
           b"q ( W n\n"                       # stray unbalanced paren
           b"BT (survives) Tj ET\nendstream\n")
    assert extract_pdf_lines(pdf) == ["survives"]
    # %-comment carrying parens AND a fake BT marker: runs to EOL only
    pdf2 = (b"%PDF-1.4\nstream\n"
            b"% setup ( BT (not text) Tj\n"
            b"BT (real) Tj ET\nendstream\n")
    assert extract_pdf_lines(pdf2) == ["real"]


def test_inline_image_binary_is_skipped_at_token_granularity():
    """BI..ID..EI binary may contain '(', 'BT', 'ET', and even the two
    letters 'EI' mid-binary — only a whitespace-delimited EI token ends
    the image, and the blocks around it must all survive."""
    binary = b"\x00( BT \xffEIx\x01 ET ("      # contains non-token 'EI'
    pdf = (b"%PDF-1.4\nstream\n"
           b"BT (before) Tj ET\n"
           b"BI /W 2 /H 2 ID " + binary + b" EI\n"
           b"BT (after) Tj ET\nendstream\n")
    assert extract_pdf_lines(pdf) == ["before", "after"]


def test_unterminated_string_resumes_after_open_paren():
    """A literal that never closes (truncated stream) must not consume
    the tail: the block's remaining operators — including its ET and any
    LATER blocks — still scan."""
    pdf = (b"%PDF-1.4\nstream\n"
           b"BT (good) Tj (never closes \\) still open ET\n"
           b"BT (later block) Tj ET\nendstream\n")
    lines = extract_pdf_lines(pdf)
    assert "good" in lines and "later block" in lines


def test_property_list_string_outside_bt_is_skipped_atomically():
    """Regression (round-6 review): BDC/DP marked-content property lists
    are a LEGAL carrier of literal strings outside any text object. A
    '%' inside one must not comment out the rest of the line (dropping a
    real block), and a 'BT' inside one must not open a phantom block
    extracting never-shown text."""
    pdf = (b"%PDF-1.4\nstream\n"
           b"/Span <</ActualText (50% off)>> BDC BT (deal) Tj ET EMC\n"
           b"BT (next) Tj ET\nendstream\n")
    assert extract_pdf_lines(pdf) == ["deal", "next"]

    pdf2 = (b"%PDF-1.4\nstream\n"
            b"/Span <</ActualText (BT \\(phantom\\) Tj ET)>> BDC\n"
            b"BT (real) Tj ET EMC\nendstream\n")
    assert extract_pdf_lines(pdf2) == ["real"]

    # unescaped balanced variant (PDF 7.3.4.2 allows nested parens)
    pdf3 = (b"%PDF-1.4\nstream\n"
            b"/Span <</ActualText (BT (phantom) Tj ET)>> BDC\n"
            b"BT (real) Tj ET EMC\nendstream\n")
    assert extract_pdf_lines(pdf3) == ["real"]


def test_structured_stream_fuzz():
    """Property (round 6, amped to 8500 examples offline): content
    streams interleaving BT blocks, %-comments, BDC/DP property-list
    strings (with %/BT/ET/parens inside), inline images with hostile
    binary, and stray tokens — extracted lines must equal exactly the
    shown strings of the real blocks, in order."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_award_extractor_spark.functions.pdftext import _find_text_blocks

    shown_st = st.text(
        st.characters(min_codepoint=32, max_codepoint=126,
                      exclude_characters="\\"),
        min_size=1, max_size=30).map(str.strip).filter(bool)

    def esc(s):
        return s.replace("(", r"\(").replace(")", r"\)").encode()

    def block_seg(lines):
        body = b" ".join(b"(" + esc(t) + b") Tj" for t in lines)
        return (b"BT " + body + b" ET", list(lines))

    hostile_st = st.lists(
        st.sampled_from(["BT ", "ET ", "Tj ", "% ", "q Q ", "deal ",
                         "50% ", "\x00\xff ", "EIx ", "ID "]),
        max_size=6).map("".join)

    def clean(j):
        return j.replace("\n", " ").replace("\r", " ")

    seg_st = st.one_of(
        st.lists(shown_st, min_size=1, max_size=3).map(block_seg),
        hostile_st.map(lambda j: (b"% " + clean(j).encode("latin-1")
                                  + b"\n", [])),
        st.tuples(hostile_st, st.booleans()).map(
            lambda t: (b"/Span <</ActualText ("
                       + (esc(clean(t[0])) if t[1]
                          else b"(" + clean(t[0]).encode("latin-1") + b")")
                       + b")>> BDC EMC", [])),
        hostile_st.map(lambda j: (b"BI /W 2 /H 2 ID "
                                  + j.encode("latin-1").replace(b" EI ",
                                                                b" xI ")
                                  + b" EI", [])),
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(seg_st, min_size=1, max_size=8))
    def prop(segs):
        content = b"\n".join(s for s, _ in segs)
        want = [line for _, lines in segs for line in lines]
        got = []
        for body in _find_text_blocks(content):
            for m in re.finditer(rb"\((?:\\.|[^\\()])*\)", body):
                raw = m.group(0)[1:-1]
                got.append(raw.replace(rb"\(", b"(")
                           .replace(rb"\)", b")").decode("latin-1"))
        assert got == want, (content, got, want)

    prop()


def test_inline_image_id_token_boundary_advice_r6():
    """ADVICE r6: after a stray BI, an "ID" byte pair inside a NAME
    (/IDTree) must not start binary-skip mode — the old bare find() did,
    and a later token-boundary EI then swallowed real BT…ET blocks. With
    the boundary check the scanner resumes right after BI and the text
    block survives."""
    from ocr_award_extractor_spark.functions.pdftext import (
        _find_text_blocks, _skip_inline_image,
    )

    content = b"BI /IDTree foo nothing BT (real text) Tj ET x EI y"
    # no token-boundary ID ⇒ resume just past BI, nothing swallowed
    assert _skip_inline_image(content, 0) == 2
    blocks = _find_text_blocks(content)
    assert any(b"real text" in b for b in blocks)
