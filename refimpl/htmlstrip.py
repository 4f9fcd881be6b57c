"""Deterministic HTML boilerplate stripper (trafilatura-style, from scratch).

This single implementation is imported by BOTH the refimpl oracle and the Ray
``strip_html`` stage, so the north rule's "byte-identical extracted text per
url" invariant (BASELINE.json:15) holds by construction and is additionally
verified against golden fixtures (tests/test_strip.py).

Policy (fixed, documented so it can never drift):
- input is raw page bytes; decoded as UTF-8 with errors="replace"
- <script>, <style>, <head>, <nav>, <aside>, <footer>, <template> elements are
  removed including their content (case-insensitive)
- HTML comments are removed
- every other tag is deleted; block-level closing tags (</p>, </div>, </li>,
  </h1..6>, </tr>, <br>) emit a newline before deletion
- the 5 standard entities &amp; &lt; &gt; &quot; &#39; plus &nbsp; and numeric
  character references are decoded
- whitespace is normalized: runs of spaces/tabs collapse to one space, each
  line is stripped, empty lines dropped, lines joined with "\n"; output has no
  leading/trailing whitespace

No external HTML library exists in this sandbox (SURVEY.md §0), which is what
makes the byte policy fully specifiable.
"""

from __future__ import annotations

import re

_REMOVE_RE = re.compile(
    r"<(script|style|head|nav|aside|footer|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_CLOSE_RE = re.compile(
    r"</(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote|section|article)\s*>"
    r"|<br\s*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]*>")
_NUMERIC_ENT_RE = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_WS_RE = re.compile(r"[ \t\r\f\v]+")

_NAMED_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'",
    "&nbsp;": " ",
}


def _decode_entities(text: str) -> str:
    for ent, ch in _NAMED_ENTITIES.items():
        text = text.replace(ent, ch)

    def _num(m: re.Match) -> str:
        body = m.group(1)
        try:
            cp = int(body[1:], 16) if body[0] in "xX" else int(body)
            return chr(cp) if 0 < cp <= 0x10FFFF else ""
        except (ValueError, OverflowError):
            return ""

    return _NUMERIC_ENT_RE.sub(_num, text)


def strip_html_str(html: str) -> str:
    """Stripped visible text of an HTML string (policy above)."""
    t = _COMMENT_RE.sub(" ", html)
    t = _REMOVE_RE.sub(" ", t)
    t = _BLOCK_CLOSE_RE.sub("\n", t)
    t = _TAG_RE.sub(" ", t)
    t = _decode_entities(t)
    t = _WS_RE.sub(" ", t)
    lines = [ln.strip() for ln in t.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def strip_html(html: bytes) -> str:
    """Raw page bytes → stripped text (the per-url byte-equality unit)."""
    return strip_html_str(html.decode("utf-8", errors="replace"))
