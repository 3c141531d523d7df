"""Independent re-statement of the reference's deterministic extraction rules
(certificate_ocr.py:314-407), used ONLY as a parity oracle in tests.

Deliberately written in a different style from both the reference and the
engine kernel (straight-line imperative, nested output dict shaped like the
reference's ``certificate_info``) so the pytest parity suite compares two
independently authored implementations of the same published rules.
"""

import re


def oracle_extract(full_text, text_lines):
    out = {
        "competition_name": "",
        "award_level": "",
        "project_name": "",
        "people": {"winner": [], "teacher": []},
    }

    comp_kw = ["大赛", "比赛", "竞赛", "挑战赛"]
    candidates = []
    for line in text_lines:
        for kw in comp_kw:
            if kw in line:
                candidates.append(line)
                break
    if candidates:
        best = candidates[0]
        for c in candidates[1:]:
            if len(c) > len(best):
                best = c
        out["competition_name"] = best

    levels = ["一等奖", "二等奖", "三等奖", "特等奖", "金奖", "银奖", "铜奖", "优秀奖"]
    done = False
    for line in text_lines:
        if done:
            break
        for kw in levels:
            if kw in line:
                out["award_level"] = kw
                done = True
                break

    m = re.findall(r'[《""](.+?)[》""]', full_text)
    if m:
        out["project_name"] = m[0]

    for line in text_lines:
        if ("获奖学生" in line) or ("负责人" in line) or ("队员" in line) or ("获奖者" in line):
            pieces = line.split("：")
            if len(pieces) > 1 and pieces[1].strip():
                for name in re.split(r"[、，,；;]", pieces[1]):
                    if name.strip():
                        out["people"]["winner"].append(name.strip())
        if ("指导教师" in line) or ("导师" in line):
            pieces = line.split("：")
            if len(pieces) > 1 and pieces[1].strip():
                for name in re.split(r"[、，,；;]", pieces[1]):
                    if name.strip():
                        out["people"]["teacher"].append(name.strip())

    for key in ("competition_name", "award_level", "project_name"):
        out[key] = _clean(out[key])
    return out


def _clean(s):
    if not s:
        return ""
    s = re.sub(r"\s+", " ", s).strip()
    s = re.sub(r"^(?:关于|获得|授予)(.+)$", r"\1", s)
    s = re.sub(r"^[\"\'《](.+?)[\"\'》]$", r"\1", s).strip()
    return s
