"""Composed k-fold train/evaluate cycle vs a driver refimpl reference."""

import numpy as np
import pytest


N_PAGES, K, SEED_ = 60, 3, 99


@pytest.fixture(scope="module")
def kfold_result(ray_session):
    from information_extraction_system_ray.pipelines.kfold import \
        kfold_evaluate

    return kfold_evaluate(N_PAGES, K, seed=SEED_, epochs=2, num_blocks=4)


def test_fold_gold_counts_match_corpus(kfold_result):
    """Every page is held out exactly once, so per-label tp+fn summed over
    folds == the corpus's gold token-label counts computed directly."""
    from refimpl.oracle import gold_tag_ids
    from refimpl.pagegen import gen_page
    from refimpl.tokenizer import tokenize
    from refimpl.vocab import BIO_LABELS

    want = np.zeros(len(BIO_LABELS), dtype=np.int64)
    for i in range(N_PAGES):
        page = gen_page(i, SEED_)
        toks, offs = tokenize(page.text)
        if not toks:
            continue
        gold = gold_tag_ids(page, toks, offs)
        for lab in range(len(BIO_LABELS)):
            want[lab] += int(np.count_nonzero(gold == lab))

    per_fold = kfold_result[kfold_result["fold"] >= 0]
    got = (per_fold["tp"] + per_fold["fn"]).groupby(
        per_fold["label_id"]).sum()
    assert [int(got.get(i, 0)) for i in range(len(BIO_LABELS))] == \
        want.tolist()


def test_distributed_counts_match_driver_reference(kfold_result):
    """Fold 1's distributed counts == a sequential driver recomputation
    with the same fold model (training is deterministic)."""
    from information_extraction_system_ray.pipelines.kfold import (
        fold_of, train_fold_models)
    from refimpl.crf import hash_features, viterbi_batch
    from refimpl.oracle import gold_tag_ids
    from refimpl.pagegen import gen_page
    from refimpl.tokenizer import tokenize
    from refimpl.vocab import BIO_LABELS

    f = 1
    W, T = train_fold_models(N_PAGES, K, seed=SEED_, epochs=2)[f]
    L = len(BIO_LABELS)
    want = np.zeros((L, 3), dtype=np.int64)
    for i in range(N_PAGES):
        if fold_of(i, K) != f:
            continue
        page = gen_page(i, SEED_)
        toks, offs = tokenize(page.text)
        if not toks:
            continue
        pred = viterbi_batch([hash_features(toks)], W, T)[0]
        gold = gold_tag_ids(page, toks, offs)
        for lab in range(L):
            p, g = pred == lab, gold == lab
            want[lab] += [int(np.count_nonzero(p & g)),
                          int(np.count_nonzero(p & ~g)),
                          int(np.count_nonzero(~p & g))]

    got = kfold_result[kfold_result["fold"] == f] \
        .sort_values("label_id")[["tp", "fp", "fn"]].to_numpy()
    assert got.tolist() == want.tolist()


def test_micro_average_row_and_sane_quality(kfold_result):
    agg = kfold_result[kfold_result["fold"] == -1]
    per = kfold_result[kfold_result["fold"] >= 0]
    assert len(agg) == kfold_result["label_id"].nunique()
    # aggregate row is the exact column sum of the fold rows
    assert agg["tp"].sum() == per["tp"].sum()
    # held-out tagging should be decent on the fixture corpus ('O' label
    # dominates; entity labels vary) — sanity floor, not a parity gate
    o_row = agg[agg["label"] == "O"].iloc[0]
    assert o_row["f1"] > 0.9
