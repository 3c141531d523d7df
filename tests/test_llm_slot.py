"""Model-inference slot: 3-tier JSON location, schema repair with pinned
dedupe, fallback-on-failure, and plan-build-time dispatch."""

from __future__ import annotations

from ocr_award_extractor_spark.operators.llm_slot import (
    extract_with_model, locate_json, parse_model_reply, repair_result,
)


def test_locate_json_tiers():
    assert locate_json('noise ```json\n{"a": 1}\n``` more') == '{"a": 1}'
    assert locate_json('reply: {"a": 1} trailing') == '{"a": 1}'
    assert locate_json('not json at all') == 'not json at all'
    # fenced wins over bare braces (tier order, cert:239-248)
    assert locate_json('{"x":0} ```json\n{"a":1}\n```') == '{"a":1}'


def test_repair_result_defaults_and_coercion():
    r = repair_result({})
    assert r == {"competition_name": "", "award_level": "", "project_name": "",
                 "winner": [], "teacher": []}
    r = repair_result({"competition_name": 42, "people": {"winner": "张三"}})
    assert r["competition_name"] == "42"
    assert r["winner"] == ["张三"]


def test_repair_dedupe_first_occurrence_order():
    r = repair_result({"people": {"winner": ["b", "a", "b", "c", "a"], "teacher": []}})
    assert r["winner"] == ["b", "a", "c"]   # pinned order (reference diverges)


def test_parse_model_reply_fallback():
    fields, path = parse_model_reply("garbage not json", "荣获一等奖\n获奖学生：张三")
    assert path == "fallback"
    assert fields["award_level"] == "一等奖"
    assert fields["winner"] == ["张三"]


def test_extract_with_model_on_spark(spark):
    rows = [("u1", "第五届机器人大赛\n荣获金奖\n获奖学生：张三、李四"),
            ("u2", "plain english text with no fields")]
    df = spark.createDataFrame(rows, "url string, ocr_text string")

    got = {r["url"]: r for r in extract_with_model(df).collect()}
    assert got["u1"]["path"] == "model"
    assert got["u1"]["award_level"] == "金奖"
    assert got["u1"]["winner"] == ["张三", "李四"]
    assert got["u2"]["award_level"] == ""

    # broken model → every row falls back to the rule path, same fields
    broken = extract_with_model(df, infer_fn=lambda ts: ["%%%" for _ in ts])
    got2 = {r["url"]: r for r in broken.collect()}
    assert got2["u1"]["path"] == "fallback"
    assert got2["u1"]["award_level"] == "金奖"

    # plan-build-time dispatch: no model stage at all
    rule = extract_with_model(df, use_model=False)
    got3 = {r["url"]: r for r in rule.collect()}
    assert got3["u1"]["path"] == "rule"
    assert got3["u1"]["winner"] == ["张三", "李四"]
