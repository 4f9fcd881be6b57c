from hypothesis import given, strategies as st

from refimpl.tokenizer import tokenize


@given(st.text(max_size=400))
def test_offsets_roundtrip(text):
    tokens, offsets = tokenize(text)
    assert len(tokens) == len(offsets)
    for tok, (s, e) in zip(tokens, offsets):
        assert text[s:e] == tok
    # offsets strictly increasing, non-overlapping
    for (s1, e1), (s2, e2) in zip(offsets, offsets[1:]):
        assert e1 <= s2 and s1 < e1


def test_no_whitespace_tokens():
    tokens, _ = tokenize("a  b\t\nc d.e")
    assert tokens == ["a", "b", "c", "d", ".", "e"]
