"""Produce the committed golden file: one canonical reference-shaped JSON
record per url of the seeded fixture (mirrors all_results.json,
certificate_ocr.py:439-441, ensure_ascii=False).

Run once; the output is committed. tests/test_golden.py recomputes the same
records on every run (and via Spark) and compares BYTES — any drift in the
generator, the HTML extractor, or the field kernel fails the suite.

Usage: python scripts/make_golden.py [n_docs]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_award_extractor_spark.operators.extract_pipeline import extract_record  # noqa: E402
from ocr_award_extractor_spark.sources.fixture_gen import generate_rows  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden", "extraction_golden_n300.jsonl")


def canonical_record(rec: dict) -> str:
    """Reference output-record shape (certificate_ocr.py:159-165), canonical
    key order, ensure_ascii=False, compact separators."""
    doc = {
        "status": rec["status"],
        "certificate_info": None if rec["status"] == "error" else {
            "competition_name": rec["competition_name"],
            "award_level": rec["award_level"],
            "project_name": rec["project_name"],
            "people": {"winner": rec["winner"], "teacher": rec["teacher"]},
        },
        "ocr_confidence": rec["ocr_confidence"],
        "image_path": rec["url"],
        "ocr_text": rec["ocr_text"],
        "message": rec["message"],
    }
    return json.dumps(doc, ensure_ascii=False, separators=(",", ":"))


def build_lines(n_docs: int = 300) -> list[str]:
    lines = []
    for row in generate_rows(n_docs):
        rec = extract_record(row["url"], None, row["lang"], row["html"])
        lines.append(canonical_record(rec))
    return lines


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    lines = build_lines(n)
    with open(GOLDEN, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} golden records -> {GOLDEN}")
