"""Deterministic HTML wrap / boilerplate-strip / unescape.

The reference pipeline's first stage unescapes HTML entities and
guards on text length (AnnotationPipeline.java:1053-1063,
config-pikes.prop:11 ``max_text_len``). Our input is a Common-Crawl
style ``pages`` table whose ``html`` column wraps the article text in
boilerplate; ``extract_text`` must recover the article text
byte-identically (driver input_hint invariant).

``wrap_html`` is the deterministic page synthesizer used by the
fixtures/bench generator (FIXTURES.md §1); ``extract_text`` is its
exact inverse for wrapped pages and a best-effort boilerplate
stripper for arbitrary HTML. Pure Python (regex + html stdlib), no
external parser dependencies; executed vectorized inside Arrow UDFs.
"""

from __future__ import annotations

import html as _html
import re

MAX_TEXT_LEN = 1_000_000  # config-pikes.prop:11 max_text_len

_NAV = (
    "<nav><ul><li><a href=\"/\">Home</a></li>"
    "<li><a href=\"/about\">About</a></li></ul></nav>"
)
_FOOTER = "<footer>&copy; 2026 Example Corp. All rights reserved.</footer>"


def escape_text(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def wrap_html(text: str, title: str = "") -> bytes:
    """Wrap article text in deterministic boilerplate HTML (UTF-8 bytes).

    Paragraphs are double-newline separated; ``extract_text`` inverts
    this exactly: extract_text(wrap_html(t)) == t for any t.
    """
    paragraphs = escape_text(text).split("\n\n")
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    doc = (
        "<!DOCTYPE html><html><head><title>"
        + escape_text(title)
        + "</title><style>body{margin:0}</style></head><body>"
        + _NAV
        + "<main><article>"
        + body
        + "</article></main>"
        + _FOOTER
        + "<script>var x=1;</script></body></html>"
    )
    return doc.encode("utf-8", "surrogatepass")


_DROP_BLOCK = re.compile(
    r"<(script|style|nav|header|footer|aside|head)\b[^>]*>.*?</\1>",
    re.IGNORECASE | re.DOTALL,
)
_MAIN = re.compile(r"<(?:main|article)\b[^>]*>(.*)</(?:main|article)>", re.IGNORECASE | re.DOTALL)
_P_SPLIT = re.compile(r"</p\s*>\s*<p\b[^>]*>", re.IGNORECASE)
_TAG = re.compile(r"<[^>]+>")
_BLOCK_BREAK = re.compile(r"</?(?:p|div|br|h[1-6]|li|tr|table)\b[^>]*>", re.IGNORECASE)


def extract_text(html_bytes: bytes) -> str:
    """Boilerplate-strip + entity-unescape (exact inverse of wrap_html).

    1. drop script/style/nav/header/footer/aside/head blocks;
    2. locate the innermost main/article content if present;
    3. paragraph boundaries (`</p><p>`) -> "\\n\\n";
    4. strip residual tags, unescape entities.
    """
    if html_bytes is None:
        return ""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _DROP_BLOCK.sub("", raw)
    m = _MAIN.search(raw)
    content = m.group(1) if m else raw
    # innermost article if nested
    m2 = _MAIN.search(content)
    if m2:
        content = m2.group(1)
    content = _P_SPLIT.sub("\n\n", content)
    content = _BLOCK_BREAK.sub(lambda mm: "" if mm.group(0)[1] in "pP/" else "\n", content)
    content = _TAG.sub("", content)
    return _html.unescape(content)


def valid_page(text: str, max_len: int = MAX_TEXT_LEN) -> bool:
    """Length/emptiness guard (AnnotationPipeline.java:1059-1063,
    FolderOrchestrator.java:185-213)."""
    return bool(text) and len(text) <= max_len
