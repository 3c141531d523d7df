"""Golden-file comparison (SURVEY.md §5.2.4): the committed canonical JSON
records must be reproduced byte-for-byte, both by the pure-Python path and
by the Spark pipeline."""

from __future__ import annotations

import os

from scripts.make_golden import GOLDEN, build_lines, canonical_record

N = 300


def _golden_lines():
    with open(GOLDEN, encoding="utf-8") as f:
        return f.read().splitlines()


def test_golden_exists_and_matches_python_path():
    assert os.path.exists(GOLDEN), "run scripts/make_golden.py once and commit"
    assert _golden_lines() == build_lines(N)


def test_golden_matches_spark_pipeline(spark):
    from ocr_award_extractor_spark.operators.extract_pipeline import extract_documents
    from ocr_award_extractor_spark.sources.tables import load_fixture

    rows = extract_documents(load_fixture(spark, n_docs=N), salt_partitions=4).collect()
    got = {}
    for r in rows:
        rec = r.asDict()
        rec["winner"] = list(rec["winner"]) if rec["winner"] is not None else None
        rec["teacher"] = list(rec["teacher"]) if rec["teacher"] is not None else None
        got[rec["url"]] = canonical_record(rec)
    want = {}
    import json

    for line in _golden_lines():
        want[json.loads(line)["image_path"]] = line
    assert got == want
