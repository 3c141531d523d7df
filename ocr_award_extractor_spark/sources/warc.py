"""WARC ingestion source: raw Common-Crawl-style WARC files → the
engine's page schema (url, warc_ts, html, text, lang).

The reference ingests a directory of image files
(certificate_ocr.py:419-430, one os.listdir sweep); the web-scale analog
of "the raw input format crawlers actually produce" is WARC/1.0 — this
module reads it Spark-first with NO external WARC library:

* ``spark.read.format("binaryFile")`` lists and splits per FILE (WARC
  members are not arbitrarily splittable: each record is its own gzip
  member in Common Crawl, so file granularity is the natural unit — at
  100 TB a crawl ships ~1 GB WARC files in the tens of thousands, which
  parallelizes on file count, the same strategy Spark's own
  binary/whole-file sources use);
* an Arrow-batched ``mapInPandas`` kernel parses each file's records —
  header block, Content-Length-delimited body, HTTP header/body split —
  and emits one page row per ``response`` record. Parsing is pure
  per-file Python over bytes the executor already holds: no shuffle, no
  driver involvement, and downstream operators see exactly the
  ``webify.PAGE_SCHEMA`` shape the rest of the engine speaks.

Error contract (mirrors the extraction pipeline's error-row contract):
a record that cannot be parsed becomes a row with ``url =
"warc-error://<file>#<record_index>"``, empty html, and the error
message in ``text`` — corrupt records are COUNTED AND VISIBLE, never
silently dropped, and never kill the file.

Kernel memory bound: binaryFile packs WHOLE files into partitions of
~``spark.sql.files.maxPartitionBytes`` (a larger file gets a partition
to itself), so an Arrow batch holds at most one partition's files —
peak kernel memory is ~max(maxPartitionBytes, largest file) plus its
decompressed form, NOT batch-row-count × file-size. Size
maxPartitionBytes against executor memory when shards are large.

Format notes (public WARC/1.0 spec, ISO 28500): records are
``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + Content-Length bytes of
block + ``\\r\\n\\r\\n``. Common Crawl compresses one record per gzip
member; ``gzip.decompress`` handles multi-member streams, so the same
parser serves .warc and .warc.gz.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


def parse_warc_bytes(data: bytes):
    """Yield (record_index, warc_type, headers_dict, block_bytes) for
    every record in a (decompressed) WARC byte stream. Raises ValueError
    with a positioned message on structural corruption; the Spark kernel
    converts per-record failures into error rows."""
    pos = 0
    idx = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"record {idx}: expected WARC/ marker at "
                             f"byte {pos}")
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"record {idx}: unterminated header block")
        header_lines = data[pos:hdr_end].split(_CRLF)
        headers = {}
        for line in header_lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = \
                v.strip().decode("utf-8", "replace")
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"record {idx}: missing/bad Content-Length")
        body_start = hdr_end + len(_HDR_END)
        block = data[body_start:body_start + length]
        if len(block) != length:
            raise ValueError(f"record {idx}: truncated block "
                             f"({len(block)} of {length} bytes)")
        yield idx, headers.get("warc-type", ""), headers, block
        pos = body_start + length
        idx += 1


def _http_body(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a response record's block
    (status line + headers end at the first CRLFCRLF); a block without
    an HTTP envelope is returned whole (resource records, lenient)."""
    if block.startswith(b"HTTP/"):
        split = block.find(_HDR_END)
        if split >= 0:
            return block[split + len(_HDR_END):]
    return block


def _parse_ts(s: str):
    """WARC-Date (ISO-8601 Zulu) → naive UTC datetime, None if absent."""
    import datetime

    try:
        return datetime.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def read_warc(spark: SparkSession, path: str,
              glob: str = "*.warc*") -> DataFrame:
    """WARC files under ``path`` → a PAGE_SCHEMA DataFrame (url, warc_ts,
    html, text, lang): one row per ``response`` record, error rows per
    the module contract. ``lang`` is left empty (language-ID is a
    downstream operator — textstats.lang_guess); ``text`` is empty for
    good rows (extraction fills it) and carries the error message on
    error rows."""
    from ocr_award_extractor_spark.operators.webify import PAGE_SCHEMA

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def kernel(batches):
        import gzip
        import os

        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}

            def emit(url, ts, html, text):
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["html"].append(html)
                rows["text"].append(text)
                rows["lang"].append("")

            for path_str, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path_str)
                data = bytes(content)
                try:
                    if data[:2] == b"\x1f\x8b":
                        data = gzip.decompress(data)   # multi-member OK
                    records = parse_warc_bytes(data)
                    while True:
                        try:
                            idx, wtype, headers, block = next(records)
                        except StopIteration:
                            break
                        if wtype != "response":
                            continue      # warcinfo/request/metadata
                        url = headers.get("warc-target-uri", "")
                        if not url:
                            emit(f"warc-error://{name}#{idx}", None, b"",
                                 "missing WARC-Target-URI")
                            continue
                        emit(url, _parse_ts(headers.get("warc-date", "")),
                             _http_body(block), "")
                except Exception as e:  # noqa: BLE001 — error-row contract
                    emit(f"warc-error://{name}#stream", None, b"",
                         f"{type(e).__name__}: {e}")
            yield pd.DataFrame(rows)

    return files.mapInPandas(kernel, PAGE_SCHEMA)


# --------------------------------------------------------------- WET out
def write_wet(extracted: DataFrame, out_dir: str,
              text_col: str = "ocr_text") -> int:
    """Write extraction output as WET shards (WARC/1.0 ``conversion``
    records, gzip member per record — the format crawl consumers already
    read) under ``out_dir``: one ``part-NNNNN.warc.wet.gz`` per
    non-empty partition, each task writing tmp + os.rename so a killed
    job leaves no half-visible shard (same commit idiom as
    plans/lineage.py). Returns the number of records written.

    Scale shape: pure ``foreachPartition`` — every task serializes its
    own rows and writes its own shard to the shared filesystem; no
    shuffle, no driver data path, shard count = partition count (control
    it upstream with repartition/coalesce). Only ``status == 'success'``
    rows are written when a status column exists; the text column is
    UTF-8 encoded and byte-identical on read-back
    (tests/test_warc_source.py::test_wet_roundtrip_byte_identical)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = ["url", text_col] + (
        ["warc_ts"] if "warc_ts" in extracted.columns else [])
    if "status" in extracted.columns:
        from pyspark.sql import functions as F

        extracted = extracted.where(F.col("status") == "success")
    rows = extracted.select(*cols)
    spark = rows.sparkSession
    acc = spark.sparkContext.accumulator(0)

    def writer(it):
        import gzip
        import os
        import uuid

        from pyspark import TaskContext

        members = []
        for row in it:
            text = (row[text_col] or "").encode("utf-8")
            ts = row["warc_ts"] if "warc_ts" in cols else None
            date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None
                    else "1970-01-01T00:00:00Z")
            rec = (b"WARC/1.0\r\n"
                   b"WARC-Type: conversion\r\n"
                   b"WARC-Target-URI: " + row["url"].encode("utf-8")
                   + b"\r\nWARC-Date: " + date.encode("ascii")
                   + b"\r\nContent-Type: text/plain\r\n"
                   b"Content-Length: " + str(len(text)).encode("ascii")
                   + b"\r\n\r\n" + text + b"\r\n\r\n")
            members.append(gzip.compress(rec))
            acc.add(1)
        if not members:
            return
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz")
        tmp = path + "." + uuid.uuid4().hex[:8] + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(members))
        os.rename(tmp, path)

    rows.foreachPartition(writer)
    return acc.value


def read_wet(spark: SparkSession, path: str,
             glob: str = "*.wet*") -> DataFrame:
    """WET shards → (url, warc_ts, text): one row per ``conversion``
    record, the read-back side of :func:`write_wet` (same
    parse_warc_bytes core as read_warc; same error-row contract with
    the message in ``text`` and a ``warc-error://`` url)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def kernel(batches):
        import gzip
        import os

        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("url", "warc_ts", "text")}
            for path_str, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path_str)
                data = bytes(content)
                try:
                    if data[:2] == b"\x1f\x8b":
                        data = gzip.decompress(data)
                    for idx, wtype, headers, block in parse_warc_bytes(data):
                        if wtype != "conversion":
                            continue
                        rows["url"].append(
                            headers.get("warc-target-uri", ""))
                        rows["warc_ts"].append(
                            _parse_ts(headers.get("warc-date", "")))
                        rows["text"].append(block.decode("utf-8", "replace"))
                except Exception as e:  # noqa: BLE001 — error-row contract
                    rows["url"].append(f"warc-error://{name}#stream")
                    rows["warc_ts"].append(None)
                    rows["text"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(rows)

    return files.mapInPandas(kernel,
                             "url string, warc_ts timestamp, text string")
