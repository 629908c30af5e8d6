"""Frozen HTML -> text extractor spec (engine spec v1) — pure Python.

The reference used boilerpipe (JVM) for HTML extraction
(/root/reference/knowledge4ir/prepare/bow/parse_html.py:23-30) plus two
behaviors we reproduce:
  - strip any junk BEFORE the first '<html' (parse_html.py:39-44)
  - squash all whitespace runs to single spaces (parse_html.py:55;
    fetch_raw_html.py:31-40)

boilerpipe is non-deterministic across versions and unavailable here, so the
engine OWNS the extraction spec: a deterministic tag-stripper.  The per-url
"byte-identical extracted text" invariant (BASELINE.json input_hint) is
defined against THIS function: the Spark pandas UDF
(knowledgeir_spark/functions/html.py) calls this exact code, so engine output
== oracle output byte-for-byte.

Spec (applied in order):
 1. decode bytes as utf-8 (errors='replace'); 2. cut everything before the
 first case-insensitive '<html' if present; 3. drop <script>/<style>/<nav>/
 <footer>/<header>/<aside> elements with their content; 4. capture <title>
 content as the title; 5. strip all remaining tags; 6. unescape the five
 basic entities; 7. squash whitespace.  Returns (title, body).
"""

from __future__ import annotations

import re

_PRE_HTML = re.compile(rb"<html", re.IGNORECASE)
_DROP_ELEMS = re.compile(
    r"<(script|style|nav|footer|header|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TITLE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so '&amp;lt;' -> '&lt;' (single pass, frozen)
]


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def _squash(s: str) -> str:
    return _WS.sub(" ", s).strip()


def extract_html(html: bytes | str) -> tuple[str, str]:
    """(title, body) per the frozen spec above. Deterministic, total."""
    if html is None:
        return "", ""
    if isinstance(html, str):
        html = html.encode("utf-8", errors="replace")
    m = _PRE_HTML.search(html)
    if m:
        html = html[m.start() :]
    text = html.decode("utf-8", errors="replace")
    text = _DROP_ELEMS.sub(" ", text)
    tm = _TITLE.search(text)
    title = _squash(_unescape(_TAG.sub(" ", tm.group(1)))) if tm else ""
    if tm:
        text = text[: tm.start()] + " " + text[tm.end() :]
    body = _squash(_unescape(_TAG.sub(" ", text)))
    return title, body
