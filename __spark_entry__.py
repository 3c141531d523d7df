"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship: driver documents → deterministic web-page
wrap → full mapInPandas extraction pipeline → status/lang summary.

``queries()``     — one entry per implemented operator (SURVEY.md §2 plus
the training-data-pipeline operators); each callable (spark, sf_dir) →
DataFrame with column names matching the paired oracle exactly.

``oracle_sql()``  — DuckDB-runnable ANSI SQL equivalents. Queries without
an entry here are genuinely non-SQL-expressible (driver records the weaker
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_award_extractor_spark.operators.extract_pipeline import extract_documents
    from ocr_award_extractor_spark.operators.webify import webify_documents
    from ocr_award_extractor_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return extract_documents(webify_documents(docs))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: full pipeline then the summary aggregate
    (certificate_ocr.py:461-463 analog widened per SURVEY.md §7.3)."""
    extracted = _flagship(spark, SF0001)
    return (
        extracted.groupBy("status", "lang")
        .agg(F.count(F.lit(1)).alias("docs"),
             F.round(F.avg("ocr_confidence"), 4).alias("avg_conf"))
    )


# ------------------------------------------------------------------ queries
def _extract_pipeline_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked FULL pipeline: the DuckDB side reproduces the
    deterministic 12-word line chunking with a regex, so md5(ocr_text) is a
    true byte-identity check of html-wrap → parse → boilerplate strip →
    line join, per url."""
    return _flagship(spark, sf_dir).select(
        "url", "status", F.md5("ocr_text").alias("text_md5"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def _extract_pipeline_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full field extraction over the driver corpus. The driver's documents
    contain no CJK award content, so the oracle pins the kernel's
    NO-FALSE-POSITIVE property (every field empty, one success row per doc,
    exact url); positive-path byte-identity is pinned by the pytest golden
    suite on the CJK fixture corpus (ocr_confidence included there)."""
    return _flagship(spark, sf_dir).select(
        "url", "status", "competition_name", "award_level", "project_name",
        F.concat_ws("|", "winner").alias("winners"),
        F.concat_ws("|", "teacher").alias("teachers"),
    )


def _extract_pipeline_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jumbo-routed (two-tier) spelling of the flagship pipeline. Shares
    the extract_pipeline_text oracle: routing is a physical-layout choice,
    so the result set must be identical — DuckDB proves it independently
    of the plain-pipeline test."""
    from ocr_award_extractor_spark.operators.extract_pipeline import (
        extract_documents_tiered,
    )
    from ocr_award_extractor_spark.operators.webify import webify_documents
    from ocr_award_extractor_spark.sources.tables import load_table

    pages = webify_documents(load_table(spark, sf_dir, "documents"))
    out = extract_documents_tiered(pages, salt_partitions=16, jumbo_quantile=0.97)
    return out.select(
        "url", "status", F.md5("ocr_text").alias("text_md5"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def _pdf_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF leg end-to-end byte-identity: documents re-emitted as real PDFs
    (Tj show-texts, FlateDecode on even docs) → %PDF- magic routing →
    content-stream text extraction. The oracle reconstructs the identical
    12-word chunking, so md5(ocr_text) pins the whole PDF path."""
    from ocr_award_extractor_spark.operators.extract_pipeline import extract_documents
    from ocr_award_extractor_spark.operators.webify import pdfify_documents
    from ocr_award_extractor_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = extract_documents(pdfify_documents(docs))
    return out.select(
        "url", "status", "strategy", F.md5("ocr_text").alias("text_md5"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def _model_slot_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: the pluggable batch-inference slot (O20/O21/O19) over the
    flagship pipeline output with the deterministic fake model."""
    from pyspark.sql import functions as F

    from ocr_award_extractor_spark.operators.llm_slot import extract_with_model

    out = extract_with_model(_flagship(spark, sf_dir))
    return out.select("url", "path", "competition_name", "award_level",
                      F.concat_ws("|", "winner").alias("winners"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_award_extractor_spark.operators import relational

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(relational.QUERIES)
    q["extract_pipeline_text"] = _extract_pipeline_text
    q["extract_pipeline_tiered"] = _extract_pipeline_tiered
    q["extract_pipeline_fields"] = _extract_pipeline_fields
    q["pdf_extract_text"] = _pdf_extract_text
    q["model_slot_extract"] = _model_slot_extract
    try:
        from ocr_award_extractor_spark.operators import (
            dedup, multimodal, similarity, textstats,
        )

        q.update(dedup.QUERIES)
        q.update(similarity.QUERIES)
        q.update(textstats.QUERIES)
        q.update(multimodal.QUERIES)
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    from ocr_award_extractor_spark.operators import relational

    o: dict[str, str] = {}
    o.update(relational.ORACLES)
    # full-pipeline text byte-identity: regex-chunk text into 12-word lines
    # (trailing 1-char runt merges into the previous line), construct the
    # same url, compare md5 of the newline-joined result.
    # PRECONDITION (holds for the driver generator, pinned by
    # tests/test_pipeline_spark.py::test_driver_corpus_text_invariants):
    # text is single-space separated, stripped, with ≥2 total chars —
    # the regex reconstruction and webify.text_to_lines diverge outside it.
    o["extract_pipeline_text"] = r"""
        SELECT 'https://' || source || '.example/' || lang || '/doc'
                 || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.html' AS url,
               'success' AS status,
               md5(regexp_replace(
                     regexp_replace(text, '((?:\S+ ){11}\S+) ', '\1' || chr(10), 'g'),
                     chr(10) || '(.)$', ' \1')) AS text_md5,
               CAST(ceil(len(string_split(text, ' ')) / 12.0) AS BIGINT)
                 - CAST(len(string_split(text, ' ')) % 12 = 1
                        AND len(string_split(text, ' ')[-1]) < 2 AS BIGINT) AS n_lines
        FROM documents
    """
    # tiered (jumbo-routed) spelling must produce the identical result set
    o["extract_pipeline_tiered"] = o["extract_pipeline_text"]
    # PDF leg: same reconstruction, '.pdf' url + 'pdf' strategy
    o["pdf_extract_text"] = r"""
        SELECT 'https://' || source || '.example/' || lang || '/doc'
                 || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.pdf' AS url,
               'success' AS status, 'pdf' AS strategy,
               md5(regexp_replace(
                     regexp_replace(text, '((?:\S+ ){11}\S+) ', '\1' || chr(10), 'g'),
                     chr(10) || '(.)$', ' \1')) AS text_md5,
               CAST(ceil(len(string_split(text, ' ')) / 12.0) AS BIGINT)
                 - CAST(len(string_split(text, ' ')) % 12 = 1
                        AND len(string_split(text, ' ')[-1]) < 2 AS BIGINT) AS n_lines
        FROM documents
    """
    # no-false-positive guard: driver corpus has no CJK award content, so
    # every extractor field must come back empty on every success row
    o["extract_pipeline_fields"] = """
        SELECT 'https://' || source || '.example/' || lang || '/doc'
                 || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.html' AS url,
               'success' AS status,
               '' AS competition_name, '' AS award_level, '' AS project_name,
               '' AS winners, '' AS teachers
        FROM documents
    """
    try:
        from ocr_award_extractor_spark.operators import (
            dedup, multimodal, similarity, textstats,
        )

        o.update(dedup.ORACLES)
        o.update(similarity.ORACLES)
        o.update(textstats.ORACLES)
        o.update(multimodal.ORACLES)
    except ImportError:
        pass
    return o
