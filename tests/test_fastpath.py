"""Vectorized fast-path kernels must be BIT-IDENTICAL to the refimpl
primitives they replace (spans, triples, link scores, feature hashes)."""

import numpy as np
import pytest

from refimpl.vocab import BIO_LABELS


def _page_fixture(n=120, seed=77):
    from refimpl.htmlstrip import strip_html
    from refimpl.pagegen import gen_page
    from refimpl.tokenizer import tokenize

    pages = []
    for i in range(n):
        p = gen_page(i, seed)
        text = p.text if p.text_provided else strip_html(p.html)
        toks, offs = tokenize(text)
        pages.append((text, toks, offs))
    return pages


def _tags_for(pages):
    from refimpl.crf import hash_features, viterbi_batch
    from refimpl.oracle import get_model

    W, T = get_model()
    feats = [hash_features(tk) for _, tk, _ in pages]
    return viterbi_batch(feats, W, T)


def test_spans_fast_equals_refimpl_on_real_tags():
    from information_extraction_system_ray.stages.fastpath import \
        spans_from_tags_fast
    from refimpl.triples import spans_from_tags

    pages = _page_fixture()
    for (text, toks, offs), tags in zip(pages, _tags_for(pages)):
        assert spans_from_tags_fast(offs, tags) == \
            spans_from_tags(toks, offs, tags)


def test_spans_fast_equals_refimpl_on_adversarial_tags():
    """Random tag sequences: dangling I-X, I after mismatched B, runs at
    sequence edges — every branch of the sequential scan."""
    from information_extraction_system_ray.stages.fastpath import \
        spans_from_tags_fast
    from refimpl.triples import spans_from_tags

    rng = np.random.default_rng(3)
    L = len(BIO_LABELS)
    for trial in range(300):
        n = int(rng.integers(0, 12))
        tags = rng.integers(0, L, n)
        toks = [f"t{i}" for i in range(n)]
        offs = [(2 * i, 2 * i + 1) for i in range(n)]
        assert spans_from_tags_fast(offs, tags) == \
            spans_from_tags(toks, offs, tags), tags


def test_triples_and_links_bit_identical():
    from information_extraction_system_ray.stages.fastpath import (
        BatchLinker, spans_from_tags_fast, triples_from_spans)
    from refimpl.linker import Linker, context_words
    from refimpl.triples import extract_triples

    pages = _page_fixture()
    tags_all = _tags_for(pages)
    slow = Linker()
    fast = BatchLinker()
    for (text, toks, offs), tags in zip(pages, tags_all):
        spans = spans_from_tags_fast(offs, tags)
        assert triples_from_spans(text, toks, spans) == \
            extract_triples(text, toks, offs, tags)
        got = fast.link_page(text, toks, spans)
        want = [slow.link(text[cs:ce], context_words(toks, ts, te))
                for (ts, te, cs, ce, _ty) in spans]
        assert got == want          # scores bit-identical, not approx


def test_fast_hasher_equals_feature_hasher():
    from information_extraction_system_ray.stages.fastpath import FastHasher
    from refimpl.crf import FeatureHasher

    pages = _page_fixture(60)
    slow = FeatureHasher()
    fast = FastHasher()
    for _, toks, _ in pages:
        np.testing.assert_array_equal(fast.hash_tokens(toks),
                                      slow.hash_tokens(toks))
    # empty sequence
    assert fast.hash_tokens([]).shape == slow.hash_tokens([]).shape
