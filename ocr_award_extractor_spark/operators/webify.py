"""Deterministically re-shape the driver's plain-text ``documents`` table
(doc_id, text, lang, source, n_chars) into the engine's canonical web-page
input shape (url, warc_ts, html, text, lang).

The driver's table has no HTML column; the flagship pipeline's input per
BASELINE.json is raw HTML bytes. This stage wraps each document's text in
the same boilerplate shell the fixture generator uses (seeded per doc_id ⇒
byte-stable at any scale/parallelism), so the FULL pipeline — decode,
boilerplate strip, field extraction — runs against driver-provided data.
The emitted ``text`` column is the expected extraction (ground truth),
which downstream checks compare byte-for-byte.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from ocr_award_extractor_spark.sources.fixture_gen import _build_html

PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

_EPOCH = datetime(2024, 3, 1)
_WORDS_PER_LINE = 12


def text_to_lines(text: str) -> list[str]:
    """Chunk whitespace tokens into fixed-width lines; a trailing runt chunk
    merges into its predecessor so every line survives the segmenter's
    2-char minimum and the round trip stays exact."""
    words = [w for w in (text or "").split(" ") if w]
    lines = [" ".join(words[i:i + _WORDS_PER_LINE])
             for i in range(0, len(words), _WORDS_PER_LINE)]
    if len(lines) >= 2 and len(lines[-1]) < 2:
        lines[-2:] = [lines[-2] + " " + lines[-1]]
    return [ln for ln in lines if len(ln) >= 2]


def wrap_row(doc_id: int, text: str, lang: str, source: str) -> dict:
    rng = random.Random(f"wrap:{doc_id}")
    lines = text_to_lines(text)
    html = _build_html(rng, lines, lines[0] if lines else "untitled")
    return {
        "url": f"https://{source}.example/{lang}/doc{doc_id:08d}.html",
        "warc_ts": _EPOCH + timedelta(seconds=(doc_id * 9973) % (30 * 86400)),
        "html": html.encode("utf-8"),
        "text": "\n".join(lines),
        "lang": lang,
    }


def _wrap_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = [wrap_row(int(r.doc_id), r.text, r.lang, r.source)
               for r in pdf.itertuples(index=False)]
        yield pd.DataFrame(out, columns=[f.name for f in PAGE_SCHEMA.fields])


def webify_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, …) → pages(url, warc_ts, html,
    text, lang), deterministic per doc_id."""
    from ocr_award_extractor_spark.config import ensure_package_on_workers

    ensure_package_on_workers(docs.sparkSession)
    return (
        docs.select("doc_id", "text", "lang", "source")
        .mapInPandas(_wrap_batch, PAGE_SCHEMA)
    )


def pdf_wrap_row(doc_id: int, text: str, lang: str, source: str) -> dict:
    """Same document as a machine-generated PDF: one Tj show-text per
    12-word line, FlateDecode for every even doc (both decode paths).
    Extraction must return the lines byte-identically, so the DuckDB
    oracle for the PDF leg is the SAME text reconstruction as the HTML
    one — only the url suffix and strategy differ."""
    from ocr_award_extractor_spark.functions.pdftext import make_simple_pdf

    lines = text_to_lines(text)
    return {
        "url": f"https://{source}.example/{lang}/doc{doc_id:08d}.pdf",
        "warc_ts": _EPOCH + timedelta(seconds=(doc_id * 9973) % (30 * 86400)),
        "html": make_simple_pdf(lines, compress=doc_id % 2 == 0),
        "text": "\n".join(lines),
        "lang": lang,
    }


def _pdf_wrap_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = [pdf_wrap_row(int(r.doc_id), r.text, r.lang, r.source)
               for r in pdf.itertuples(index=False)]
        yield pd.DataFrame(out, columns=[f.name for f in PAGE_SCHEMA.fields])


def pdfify_documents(docs: DataFrame) -> DataFrame:
    """documents → PDF-payload pages (url, warc_ts, html=pdf bytes, text,
    lang); the pipeline routes on the %PDF- magic, nothing else changes."""
    from ocr_award_extractor_spark.config import ensure_package_on_workers

    ensure_package_on_workers(docs.sparkSession)
    return (
        docs.select("doc_id", "text", "lang", "source")
        .mapInPandas(_pdf_wrap_batch, PAGE_SCHEMA)
    )
