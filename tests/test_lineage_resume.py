"""Resume test (SURVEY.md §5.2.5): kill after k batch commits, restart,
assert no duplicate and no missing urls, checksums consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_award_extractor_spark.plans.lineage import (
    pending_documents, read_committed, run_resumable_extraction, verify_lineage,
)
from ocr_award_extractor_spark.sources.tables import load_fixture

N_DOCS = 200


def test_kill_and_resume(spark, tmp_path):
    out = str(tmp_path / "run")
    docs = load_fixture(spark, n_docs=N_DOCS)

    # first run "dies" after 2 of 4 batch commits
    r1 = run_resumable_extraction(spark, docs, out, "run-1",
                                  n_splits=8, n_batches=4, max_batches=2)
    assert r1["batches_committed"] == 2
    partial = read_committed(spark, out)
    n_partial = partial.count()
    assert 0 < n_partial < N_DOCS

    # the resume filter must exclude exactly the committed splits
    pend = pending_documents(spark, docs, out, n_splits=8)
    assert pend.count() == N_DOCS - n_partial

    # restart commits only the remaining batches
    r2 = run_resumable_extraction(spark, docs, out, "run-2",
                                  n_splits=8, n_batches=4)
    assert r2["splits_previously_committed"] > 0

    final = read_committed(spark, out)
    urls = [r["url"] for r in final.select("url").collect()]
    assert len(urls) == N_DOCS
    assert len(set(urls)) == N_DOCS          # no duplicates, no gaps

    # checksum audit finds nothing wrong
    assert verify_lineage(spark, out).count() == 0

    # extracted text matches ground truth end-to-end through the write path
    truth = docs.select("url", "text")
    bad = (
        final.where(F.col("status") == "success")
        .join(truth, "url")
        .where(F.col("ocr_text") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_rerun_after_complete_is_noop(spark, tmp_path):
    out = str(tmp_path / "run2")
    docs = load_fixture(spark, n_docs=50)
    run_resumable_extraction(spark, docs, out, "a", n_splits=4, n_batches=2)
    r = run_resumable_extraction(spark, docs, out, "b", n_splits=4, n_batches=2)
    assert r["batches_committed"] == 0
    assert r["splits_previously_committed"] == 4
    assert read_committed(spark, out).count() == 50
