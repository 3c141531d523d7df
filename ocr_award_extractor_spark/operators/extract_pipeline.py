"""The flagship extraction pipeline: documents(html) → structured fields.

Spark plan (SURVEY.md §3.4):

    scan documents                        (columns pruned to url/warc_ts/lang/html;
                                           warc_ts predicates push into the scan)
      → repartition(P, xxhash64(url, salt))  explicit salted repartition — input
                                           splits are host-correlated and AQE does
                                           NOT split skewed MapInPandas tasks, so
                                           this is a deliberate shuffle (§4)
      → mapInPandas(extract_batch)        ONE vectorized stage fusing the whole
                                           reference dataflow: decode → two-strategy
                                           parse → pick-best → blank filter → join
                                           → field extraction (certificate_ocr.py
                                           :85-167 and :314-407), no per-row Python
                                           at the DataFrame level
      → (write + lineage, plans/lineage.py)

Error rows carry status='error' + message with NULL payload fields — the
reference's error-record-not-exception contract (certificate_ocr.py:100-105,
:122-128). ocr_confidence is the 4-dp-rounded mean per-line confidence
(certificate_ocr.py:146,:162).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType, TimestampType,
)

from ocr_award_extractor_spark.config import SALT_SEED
from ocr_award_extractor_spark.functions.extract import extract_fields
from ocr_award_extractor_spark.functions.htmltext import extract_page

OUT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("lang", StringType()),
    StructField("status", StringType()),
    StructField("message", StringType()),
    StructField("strategy", StringType()),
    StructField("competition_name", StringType()),
    StructField("award_level", StringType()),
    StructField("project_name", StringType()),
    StructField("winner", ArrayType(StringType())),
    StructField("teacher", ArrayType(StringType())),
    StructField("ocr_text", StringType()),
    StructField("ocr_confidence", DoubleType()),
    StructField("n_lines", IntegerType()),
    StructField("n_html_bytes", LongType()),
])

_IN_COLS = ("url", "warc_ts", "lang", "html")


def extract_record(url, warc_ts, lang, html) -> dict:
    """One document through the full reference dataflow. Pure function —
    also used by the streaming demo and unit tests."""
    page = extract_page(html)
    n_bytes = len(html) if html is not None else 0
    if page["status"] == "error":
        return {
            "url": url, "warc_ts": warc_ts, "lang": lang,
            "status": "error", "message": page["message"], "strategy": None,
            "competition_name": None, "award_level": None, "project_name": None,
            "winner": None, "teacher": None,
            "ocr_text": None, "ocr_confidence": None,
            "n_lines": 0, "n_html_bytes": n_bytes,
        }
    lines, confs = page["lines"], page["confs"]
    full_text = "\n".join(lines)
    avg_conf = sum(confs) / len(confs) if confs else 0.0
    fields = extract_fields(lines, full_text)
    return {
        "url": url, "warc_ts": warc_ts, "lang": lang,
        "status": "success", "message": None, "strategy": page["strategy"],
        "competition_name": fields["competition_name"],
        "award_level": fields["award_level"],
        "project_name": fields["project_name"],
        "winner": fields["winner"], "teacher": fields["teacher"],
        "ocr_text": full_text, "ocr_confidence": round(avg_conf, 4),
        "n_lines": len(lines), "n_html_bytes": n_bytes,
    }


_OUT_COLS = tuple(f.name for f in OUT_SCHEMA.fields)


def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in → Arrow batch out. The Python loop
    lives INSIDE the batch (the mapInPandas norm for parser-shaped work);
    all patterns are compiled once per worker at module import. Output
    batches are built COLUMNAR via the shared records_to_frame (per-cell
    type inference was ~2× of the whole stage cost at 32 cores)."""
    from ocr_award_extractor_spark.functions.batching import records_to_frame

    for pdf in batches:
        it = zip(pdf["url"].to_numpy(), pdf["warc_ts"].to_numpy(),
                 pdf["lang"].to_numpy(), pdf["html"].to_numpy())
        out = [extract_record(u, t, lg, h) for u, t, lg, h in it]
        yield records_to_frame(out, _OUT_COLS)


def extract_documents(
    df: DataFrame,
    *,
    salt_partitions: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Attach the extraction stage to a documents DataFrame.

    ``salt_partitions``: explicit shuffle width for the skew-defusing
    repartition; None keeps the scan partitioning (cheapest — use when the
    input is already well-balanced, e.g. the small fixture). At cluster
    scale pass ~2-4× total cores so jumbo-doc stragglers stay short.

    ``metrics``: optional dict to receive live Spark accumulators
    ('docs', 'errors') — the O25 stage-metrics analog of the reference's
    per-file logging (certificate_ocr.py:436,:461-464). Accumulators
    update as tasks finish, so a monitoring thread sees progress DURING
    the stage, not after (lineage rows carry the committed truth).
    """
    from ocr_award_extractor_spark.config import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    cols = df.select(*_IN_COLS)   # column pruning: html never flows past this stage
    if salt_partitions:
        cols = cols.repartition(salt_partitions, F.xxhash64("url", F.lit(SALT_SEED)))
    if metrics is None:
        return cols.mapInPandas(extract_batch, OUT_SCHEMA)

    sc = df.sparkSession.sparkContext
    docs_acc = sc.accumulator(0)
    err_acc = sc.accumulator(0)
    metrics["docs"] = docs_acc
    metrics["errors"] = err_acc

    def counted(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for out in extract_batch(batches):
            docs_acc.add(len(out))
            err_acc.add(int((out["status"] == "error").sum()))
            yield out

    return cols.mapInPandas(counted, OUT_SCHEMA)


def extract_documents_tiered(
    df: DataFrame,
    *,
    salt_partitions: int,
    jumbo_partitions: int | None = None,
    threshold_bytes: int | None = None,
    jumbo_quantile: float = 0.99,
) -> DataFrame:
    """Two-tier skew routing (SURVEY.md §4): salting equalizes EXPECTED
    per-partition load, but one 500 MB page still pins a single task at the
    stage tail. Documents above the html-size threshold are routed to their
    own round-robin partitions (~1 jumbo per task, scheduled alongside the
    salted stage), so the straggler tail is bounded by ONE jumbo, not a
    partition's worth.

    ``threshold_bytes=None`` derives the ``jumbo_quantile`` cut with
    percentile_approx, evaluated EXACTLY ONCE as a small driver-side job
    over ``length(html)`` only. (A lazy cross-joined aggregate scalar was
    evaluated once per union branch, and percentile_approx merges its GK
    summaries in shuffle-fetch order — two evaluations could disagree, and
    a row whose length fell between the two cuts would be emitted by both
    branches or neither.) On a real table store an ``n_bytes`` column (or
    use Iceberg column stats) and pass the cut in explicitly so the
    pre-pass doesn't scan html twice. Results are identical to
    :func:`extract_documents` (row-wise op; routing only changes physical
    layout).
    """
    from ocr_award_extractor_spark.config import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    cols = df.select(*_IN_COLS)
    if threshold_bytes is None:
        thr = cols.agg(
            F.percentile_approx(F.length("html"), jumbo_quantile)
        ).first()[0]
        # NULL percentile (empty / all-NULL input) ⇒ nothing is jumbo
        threshold_bytes = int(thr) if thr is not None else (1 << 62)
    thr_col = F.lit(int(threshold_bytes)).cast("long")
    # coalesce: NULL html must take the normal branch (→ error row there),
    # not vanish — both where() sides would drop a NULL predicate row
    is_jumbo = F.coalesce(F.length("html"), F.lit(0)) > thr_col
    normal = (
        cols.where(~is_jumbo)
        .repartition(salt_partitions, F.xxhash64("url", F.lit(SALT_SEED)))
        .mapInPandas(extract_batch, OUT_SCHEMA)
    )
    jumbo = (
        cols.where(is_jumbo)
        .repartition(jumbo_partitions or salt_partitions)   # round-robin spread
        .mapInPandas(extract_batch, OUT_SCHEMA)
    )
    return normal.unionByName(jumbo)


def award_summary(extracted: DataFrame) -> DataFrame:
    """Flagship reporting query: award-level distribution of successful
    extractions (the groupBy-status summary of certificate_ocr.py:461-463,
    widened per SURVEY.md §7.3)."""
    return (
        extracted
        .where((F.col("status") == "success") & (F.col("award_level") != ""))
        .groupBy("award_level")
        .agg(F.count(F.lit(1)).alias("docs"),
             F.round(F.avg("ocr_confidence"), 4).alias("avg_conf"))
    )


def to_reference_json(extracted: DataFrame) -> DataFrame:
    """Per-document JSON blobs shaped exactly like the reference's output
    records (certificate_ocr.py:159-165, ensure_ascii=False analog: Spark
    to_json emits UTF-8 unescaped) for golden-file comparison."""
    info = F.struct(
        F.col("competition_name"), F.col("award_level"), F.col("project_name"),
        F.struct(F.col("winner"), F.col("teacher")).alias("people"),
    ).alias("certificate_info")
    return extracted.select(
        "url",
        F.to_json(F.struct(
            F.col("status"), info, F.col("ocr_confidence"),
            F.col("url").alias("image_path"), F.col("ocr_text"), F.col("message"),
        )).alias("doc_json"),
    )
