"""Offset-preserving tokenizer (shared by refimpl oracle and Ray stages).

Reference-equivalent role: the reference's NLTK-style tokenizer feeding the
CRF feature template (SURVEY.md §2 M2, reconstructed — reference mount empty,
SURVEY.md §0). Deterministic: a token is a maximal [A-Za-z0-9]+ run or a
single non-space, non-alphanumeric character. Offsets are Python-string
(code-point) offsets into the input text; ``text[start:end] == token`` always
(property-tested in tests/test_tokenizer.py).

No sentence splitting: the CRF tags one page as one sequence, so abbreviation
periods ("A. Lovelace") cannot desynchronize spans.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")


def tokenize(text: str) -> tuple[list[str], list[tuple[int, int]]]:
    """Return (tokens, offsets) where offsets[i] = (start, end), end exclusive."""
    tokens: list[str] = []
    offsets: list[tuple[int, int]] = []
    for m in _TOKEN_RE.finditer(text):
        tokens.append(m.group())
        offsets.append((m.start(), m.end()))
    return tokens, offsets
