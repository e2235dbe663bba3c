"""Deterministic HTML → text extraction (and its inverse renderer).

This is the web-page analogue of the reference's per-format text extraction
(``app/services/file_service.py:353-422``): our input table carries raw page
bytes in ``html:binary``; the pipeline extracts the main text before
scanning. The extraction is a fixed, documented spec so that the per-url
invariant *extract(html) is byte-identical to the expected text* can be
tested exactly (BASELINE.md "scrubbed text fidelity" row).

Extraction spec (applied in order):

1. UTF-8 decode (``errors='replace'``).
2. Remove ``<script>``/``<style>`` elements and their content.
3. Remove non-content chrome: ``<head>``, ``<nav>``, ``<header>``,
   ``<footer>``, ``<aside>`` elements and their content.
4. ``<br>`` → newline.
5. Closing block tags (p, div, h1-h6, li, ul, ol, tr, table, section,
   article, blockquote, pre, main, body, html) → paragraph break.
6. Strip every remaining tag.
7. HTML-entity unescape.
8. Whitespace normalization: per-line ``[ \t]+`` → single space, strip each
   line, collapse runs of blank lines to one, strip the document.

``normalize_text`` applies step 8 alone; the synthetic generator feeds its
ground-truth text through it so the round-trip invariant holds by
construction: ``extract_text_from_html(render_html(t)) == normalize_text(t)``.
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT_STYLE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_CHROME = re.compile(r"(?is)<(head|nav|header|footer|aside)\b.*?</\1\s*>")
_BR = re.compile(r"(?i)<br\s*/?>")
_BLOCK_CLOSE = re.compile(
    r"(?i)</(p|div|h[1-6]|li|ul|ol|tr|table|section|article|blockquote|pre|main|body|html)\s*>"
)
_TAG = re.compile(r"(?s)<[^>]*>")
_SPACES = re.compile(r"[ \t\r\f\v]+")


def normalize_text(text: str) -> str:
    """Whitespace-normalize text to the canonical extracted form.

    The horizontal-whitespace class cannot match ``\\n``, so one sub over
    the whole document is equivalent to a sub per line and avoids ~30
    Python-level ``re.sub`` calls per document in the fused hot path.
    """
    lines = [ln.strip() for ln in _SPACES.sub(" ", text).split("\n")]
    out: list[str] = []
    blank = False
    for ln in lines:
        if ln:
            out.append(ln)
            blank = False
        else:
            if out and not blank:
                out.append("")
            blank = True
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


def extract_text_from_html(raw: bytes | str | None) -> str:
    """Extract main text from raw page bytes per the fixed spec above."""
    if raw is None:
        return ""
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _SCRIPT_STYLE.sub(" ", s)
    s = _CHROME.sub(" ", s)
    s = _BR.sub("\n", s)
    s = _BLOCK_CLOSE.sub("\n\n", s)
    s = _TAG.sub(" ", s)
    s = _html.unescape(s)
    return normalize_text(s)


def render_html(text: str, title: str = "", host: str = "example.com") -> bytes:
    """Render text into a minimal Common-Crawl-ish page (generator side).

    Boilerplate chrome (head/nav/footer) is deliberately included so the
    extractor's chrome-removal is exercised on every document.
    """
    paras = normalize_text(text).split("\n\n")
    body = "\n".join(
        "<p>" + _html.escape(p).replace("\n", "<br/>") + "</p>" for p in paras
    )
    page = (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"<title>{_html.escape(title)}</title>\n"
        "<style>body{font:14px sans-serif}</style>\n"
        "<script>var t=1;</script>\n"
        "</head>\n<body>\n"
        f"<nav><a href='https://{host}/'>home</a> | <a href='https://{host}/about'>about</a></nav>\n"
        f"<header><h1>{_html.escape(title)}</h1></header>\n"
        f"<main>\n{body}\n</main>\n"
        f"<footer>&copy; 2024 {_html.escape(host)}</footer>\n"
        "</body>\n</html>\n"
    )
    return page.encode("utf-8")
