"""Deterministic Common-Crawl-style web-page fixture generator.

Produces the engine's canonical input table (BASELINE.json input_hint shape):

    url:string  warc_ts:timestamp  html:binary  text:string  lang:string

per FIXTURES.md §1: Zipf-skewed hosts (real host-level skew so the salted
repartition path is exercised), a 30-day deterministic warc_ts walk,
boilerplate HTML shells (nav/sidebar/related link farms, header/footer)
wrapping a certificate-style zh main-content block that exercises every
extraction rule of the reference (certificate_ocr.py:314-407): length ties
in competition lines, multi-keyword award lines, multiple/absent quoted
project spans, every name separator in ``[、，,；;]``, duplicate names,
trailing separators, and 关于/获得/授予 noise prefixes. ~40% of docs are
en/fr/de/es distractors with no extractable fields; ~5% are jumbo bodies
(size skew); ~2% are malformed (truncated mid-multibyte / empty) and must
come back as ``status='error'`` rows, never exceptions.

Everything is keyed off ``random.Random(f"{seed}:{doc_id}")`` — no
wall-clock, no global RNG — so the same (seed, doc_id) yields identical
bytes at every scale and parallelism level.

The ``text`` column is the ground-truth extraction: for well-formed docs the
generator ASSERTS that :func:`extract_page` recovers exactly the intended
main-content lines (this is what makes the byte-identity test meaningful);
for malformed docs it records whatever the repair pass deterministically
recovers.
"""

from __future__ import annotations

import html as html_mod
import random
from datetime import datetime, timedelta

from ocr_award_extractor_spark.functions.htmltext import extract_page

SEED = 42
N_HOSTS = 20
_EPOCH = datetime(2024, 3, 1)
_TS_WINDOW_S = 30 * 86400

_REGIONS = ["全国", "国际", "省级", "华东地区", "市级", "华南地区"]
_DOMAINS = ["大学生数学建模", "青少年科技创新", "机器人", "程序设计", "电子设计", "创新创业", "智能汽车"]
_COMP_MARKERS = ["大赛", "比赛", "竞赛", "挑战赛"]
_LEVELS = ["一等奖", "二等奖", "三等奖", "特等奖", "金奖", "银奖", "铜奖", "优秀奖"]
_NAMES = ["张伟", "王芳", "李娜", "刘强", "陈杰", "杨静", "赵磊", "黄敏", "周涛", "吴霞", "徐明", "孙丽"]
_TEACHERS = ["王老师", "李教授", "赵老师", "钱教授", "孙老师"]
_ORGS = ["中国科学技术协会", "教育部高等教育司", "省教育厅", "大赛组织委员会"]
_PROJECTS = ["智能灌溉系统", "桥梁健康监测平台", "无人机巡检方案", "校园垃圾分类助手", "低功耗传感网络", "盲文识别装置"]
_WINNER_MARKERS = ["获奖学生", "负责人", "队员", "获奖者"]
_TEACHER_MARKERS = ["指导教师", "导师"]
_SEPS = ["、", "，", ",", "；", ";"]

_WORDS = {
    "en": "the quick brown fox jumps over a lazy dog and runs with great speed across of fields".split(),
    "fr": "le la et les des une avec pour dans grand petit chien renard court vite champ".split(),
    "de": "der die das und mit für ein große kleine hund fuchs läuft schnell über feld".split(),
    "es": "el la los y con para una grande pequeño perro zorro corre rápido sobre campo".split(),
}

_NAV_WORDS = ["首页", "新闻", "通知", "公告", "关于我们", "联系方式", "Home", "News", "About", "Archive"]


def _certificate_lines(rng: random.Random) -> list[str]:
    """Main-content lines for one zh certificate document."""
    lines = [rng.choice(["荣誉证书", "获奖证书", "证书"])]

    # competition: 1-3 marker lines, sometimes an exact-length tie
    base = (f"第{rng.randint(1, 20)}届{rng.choice(_REGIONS)}"
            f"{rng.choice(_DOMAINS)}{rng.choice(_COMP_MARKERS)}")
    comp_lines = [base]
    roll = rng.random()
    if roll < 0.2:
        comp_lines.append(base + "决赛")                       # strictly longer later line
    elif roll < 0.35:
        comp_lines.append(f"{rng.choice(_REGIONS)}{rng.choice(_DOMAINS)}{rng.choice(_COMP_MARKERS)}")
    if rng.random() < 0.15 and len(comp_lines[0]) >= 4:
        # exact-length tie: same length, different trailing char
        tie = comp_lines[0][:-1] + ("赛" if comp_lines[0][-1] != "赛" else "会")
        comp_lines.append(tie)
    lines.extend(comp_lines)

    # project: quoted span(s) or none
    proj_roll = rng.random()
    if proj_roll < 0.55:
        lines.append(f"项目《{rng.choice(_PROJECTS)}》荣誉佳绩")
    elif proj_roll < 0.75:
        lines.append(f'作品"{rng.choice(_PROJECTS)}"表现突出')
    if rng.random() < 0.2:
        lines.append(f"另有《{rng.choice(_PROJECTS)}》入围")

    # award: one line, occasionally several keywords across lines
    level = rng.choice(_LEVELS)
    lines.append(rng.choice([f"荣获{level}", f"获得{level}", f"授予{level}称号", f"特发{level}证书"]))
    if rng.random() < 0.2:
        lines.append(f"同期{rng.choice(_LEVELS)}名单另行公布")

    # winners: marker：names with mixed separators / duplicates / trailing sep
    for _ in range(1 + (rng.random() < 0.3)):
        names = rng.sample(_NAMES, rng.randint(1, 4))
        if rng.random() < 0.2:
            names.append(names[0])                             # duplicate kept by rules
        sep = rng.choice(_SEPS)
        tail = rng.choice(_SEPS) if rng.random() < 0.2 else ""
        lines.append(f"{rng.choice(_WINNER_MARKERS)}：{sep.join(names)}{tail}")
    if rng.random() < 0.15:
        lines.append(f"{rng.choice(_WINNER_MARKERS)}名单见附件")   # marker, no colon

    # teachers
    if rng.random() < 0.9:
        t = rng.sample(_TEACHERS, rng.randint(1, 2))
        lines.append(f"{rng.choice(_TEACHER_MARKERS)}：{rng.choice(_SEPS).join(t)}")

    # noise / trailer
    if rng.random() < 0.4:
        lines.append(f"关于表彰{rng.choice(_DOMAINS)}先进集体的决定")
    lines.append(rng.choice(_ORGS))
    lines.append(f"2024年{rng.randint(1, 12)}月{rng.randint(1, 28)}日")
    lines.append("特此证明")
    return lines


def _distractor_lines(rng: random.Random, lang: str) -> list[str]:
    words = _WORDS[lang]
    lines = []
    for _ in range(rng.randint(3, 8)):
        n = rng.randint(5, 14)
        lines.append(" ".join(rng.choice(words) for _ in range(n)))
    return lines


def _link_farm(rng: random.Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/{rng.randint(1, 999)}">{rng.choice(_NAV_WORDS)}{rng.randint(1, 99)}</a></li>'
        for _ in range(n)
    )
    return f"<ul>{items}</ul>"


def _wrap_main(rng: random.Random, content_lines: list[str]) -> str:
    esc = [html_mod.escape(ln) for ln in content_lines]
    style = rng.randrange(4)
    if style == 0:
        body = "".join(f"<p>{ln}</p>" for ln in esc)
        return f"<article>{body}</article>"
    if style == 1:
        body = "".join(f"<p>{ln}</p>" for ln in esc)
        return f'<div id="main">{body}</div>'
    if style == 2:
        return f"<article><p>{'<br>'.join(esc)}</p></article>"
    body = "".join(f"<p>  {ln}\n</p>" for ln in esc)      # stray whitespace collapses
    return f"<section>{body}</section>"


# Deterministic external-link injection (round 6): K = doc_id % 4 absolute
# links to closed-form hosts, appended as a link-dense boilerplate block
# just before </body> — the corpus substrate for the link-graph operators
# (operators/linkgraph.py). Closed-form from doc_id so the page_outlinks
# oracle can predict the exact extraction output; boilerplate-shaped so
# the strip drops it and extracted text is unchanged (synth_document's
# generator/extractor drift assert below enforces that on every doc).
# MUST stay in lockstep with webify.outlink_oracle_sql().
OUTLINK_MOD = 4
N_LINK_HOSTS = N_HOSTS


def outlink_urls(doc_id: int) -> list[str]:
    """The absolute outlink targets of a page, closed-form from doc_id.
    13 is invertible mod 20, so the K ≤ 3 hosts are always distinct."""
    return [
        f"https://src{(doc_id * 7 + i * 13) % N_LINK_HOSTS}.example"
        f"/ref/doc{doc_id:08d}-{i}.html"
        for i in range(doc_id % OUTLINK_MOD)
    ]


def outlink_block(doc_id: int) -> str:
    links = outlink_urls(doc_id)
    if not links:
        return ""
    items = "".join(
        f'<li><a href="{u}">ref{i}</a></li>' for i, u in enumerate(links)
    )
    return f'<div class="extlinks"><ul>{items}</ul></div>'


def _build_html(rng: random.Random, content_lines: list[str], title: str) -> str:
    nav = f"<nav>{_link_farm(rng, rng.randint(4, 8))}</nav>"
    sidebar = f'<div class="sidebar">{_link_farm(rng, rng.randint(8, 16))}</div>'
    related = f'<div class="related"><h3>相关链接</h3>{_link_farm(rng, rng.randint(3, 6))}</div>'
    promo = f"<aside>限时活动第{rng.randint(1, 99)}期，点击了解更多优惠信息。</aside>"
    footer = f"<footer>© 2024 src{rng.randint(0, 9)}.example 版权所有 | 备案号 {rng.randint(10000, 99999)}</footer>"
    header = f"<header><h1>站点{rng.randint(1, 50)}</h1></header>"
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{html_mod.escape(title)}</title>"
        "<style>body{margin:0}</style><script>var x=1;</script>"
        f"</head><body>{header}{nav}{sidebar}"
        f"{_wrap_main(rng, content_lines)}"
        f"{related}{promo}{footer}</body></html>"
    )


def _truncate_mid_multibyte(data: bytes, rng: random.Random) -> bytes:
    """Cut inside a multi-byte UTF-8 sequence in the second half of the doc
    so the strict pass fails and the repair pass recovers a partial page."""
    start = len(data) // 2
    for i in range(start, len(data)):
        if data[i] & 0xC0 == 0x80:      # continuation byte → cut here
            return data[:i]
    return data[: start + rng.randint(0, 10)]


def synth_document(doc_id: int, seed: int = SEED) -> dict:
    """One deterministic document row (+ test metadata under '_meta')."""
    rng = random.Random(f"{seed}:{doc_id}")

    host = rng.choices(range(N_HOSTS), weights=[1.0 / (k + 1) for k in range(N_HOSTS)])[0]
    is_zh = rng.random() < 0.6
    lang = "zh" if is_zh else rng.choice(["en", "fr", "de", "es"])
    url = f"https://src{host}.example/{lang}/doc{doc_id:08d}.html"
    warc_ts = _EPOCH + timedelta(seconds=(doc_id * 9973) % _TS_WINDOW_S)

    content = _certificate_lines(rng) if is_zh else _distractor_lines(rng, lang)

    kind = "normal"
    if rng.random() < 0.05:             # jumbo body: size skew
        kind = "jumbo"
        if is_zh:
            filler = [f"附录材料{i}归档编号{rng.randint(10**6, 10**7)}" for i in range(120)]
        else:
            filler = [f"appendix item {i} archive ref {rng.randint(10**6, 10**7)}" for i in range(120)]
        content = content + filler

    title = content[0] if content else "untitled"
    html = _build_html(rng, content, title)
    html_bytes = html.replace(
        "</body>", outlink_block(doc_id) + "</body>").encode("utf-8")

    mal = rng.random()
    if mal < 0.015:
        kind = "truncated"
        html_bytes = _truncate_mid_multibyte(html_bytes, rng)
    elif mal < 0.02:
        kind = "empty"
        html_bytes = b""

    page = extract_page(html_bytes)
    text = "\n".join(page["lines"])
    if kind in ("normal", "jumbo"):
        assert page["status"] == "success" and page["lines"] == content, (
            f"generator/extractor drift at doc {doc_id}: {page['lines']!r} != {content!r}"
        )

    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html_bytes,
        "text": text,
        "lang": lang,
        "_meta": {"kind": kind, "intended": content, "status": page["status"]},
    }


def generate_rows(n_docs: int, seed: int = SEED, with_meta: bool = False) -> list[dict]:
    rows = [synth_document(i, seed) for i in range(n_docs)]
    if not with_meta:
        for r in rows:
            r.pop("_meta")
    return rows


def write_fixture(out_path: str, n_docs: int, seed: int = SEED) -> int:
    """Write the fixture table as a single deterministic parquet file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_rows(n_docs, seed)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, out_path)
    return len(rows)
