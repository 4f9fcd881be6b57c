"""Semi/anti join, term counting, exact quantiles, sessionize — unit
correctness on constructed corpora (the driver checks the SQL-oracle face;
these cover edge cases the fixed tables don't hit)."""

import collections
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rd(df):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(5)


def test_semi_and_anti_join(ray_session):
    from information_extraction_system_ray.functions.joins import (anti_join,
                                                      semi_join)

    left = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                         "payload": [f"p{i}" for i in range(50)]})
    # probe side with duplicates and keys outside the left range
    right = pd.DataFrame({"rk": np.array(
        [3, 3, 3, 7, 11, 11, 49, 60, 70], dtype=np.int64)})

    semi = semi_join(_rd(left), _rd(right), left_key="k",
                     right_key="rk").to_pandas()
    assert sorted(semi["k"]) == [3, 7, 11, 49]
    assert list(semi.columns) == ["k", "payload"]
    assert semi["k"].dtype == np.int64          # no float drift from nulls

    anti = anti_join(_rd(left), _rd(right), left_key="k",
                     right_key="rk").to_pandas()
    assert sorted(anti["k"]) == sorted(set(range(50)) - {3, 7, 11, 49})


def test_semi_join_empty_probe(ray_session):
    from information_extraction_system_ray.functions.joins import semi_join

    left = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([], dtype=np.int64)})
    out = semi_join(_rd(left), _rd(right), left_key="k",
                    right_key="rk").to_pandas()
    assert len(out) == 0


def test_term_counts_matches_counter(ray_session):
    from information_extraction_system_ray.functions.terms import (term_counts,
                                                      top_terms)

    texts = ["The cat SAT on the mat", "a cat and a dog", "", None,
             "dog dog dog!  mat?"]
    df = pd.DataFrame({"text": pd.array(texts, dtype="string")})
    want = collections.Counter()
    import re
    for t in texts:
        if t:
            want.update(re.findall(r"[a-z0-9]+", t.lower()))

    got = term_counts(_rd(df)).to_pandas()
    assert dict(zip(got["term"], got["n"])) == dict(want)

    top = top_terms(_rd(df), 3).to_pandas()
    # order: n desc, term asc
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(top["term"], top["n"])) == ranked


def test_exact_quantiles_matches_numpy_disc(ray_session):
    from information_extraction_system_ray.functions.quantiles import \
        exact_quantiles

    rng = np.random.default_rng(9)
    vals = rng.integers(-50, 50, 777).astype(np.int64)
    df = pd.DataFrame({"v": vals})
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = exact_quantiles(_rd(df), "v", qs)
    sv = np.sort(vals)
    for q, v in zip(got["q"], got["value"]):
        rank = max(1, math.ceil(q * len(sv)))
        assert v == sv[rank - 1], q


def test_sessionize_matches_pandas(ray_session):
    from information_extraction_system_ray.functions.window import sessionize

    rng = np.random.default_rng(4)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 100, n) * 3600, unit="s")
        .astype("datetime64[us]"),
    })
    gap = pd.Timedelta(hours=5)
    got = sessionize(_rd(df), keys=["user_id"], ts_col="ts",
                     order_by=["ts", "event_id"], gap=gap).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    want = df.sort_values(["ts", "event_id"], kind="mergesort")
    prev = want.groupby("user_id", sort=False)["ts"].shift(1)
    new = prev.isna() | ((want["ts"] - prev) > gap)
    want = want.assign(session_id=new.astype("int64")
                       .groupby(want["user_id"], sort=False).cumsum()) \
        .sort_values("event_id").reset_index(drop=True)
    assert list(got["session_id"]) == list(want["session_id"])


def test_hll_approx_distinct_within_error(ray_session):
    from information_extraction_system_ray.functions.sketches import \
        approx_distinct_by_key

    rng = np.random.default_rng(11)
    n = 30_000
    df = pd.DataFrame({
        "k": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.integers(0, 5000, n).astype(np.int64),
    })
    # force the DENSE regime (promote_threshold=0) — the error bound is
    # the dense path's contract; the sparse regime is exact by design
    got = approx_distinct_by_key(_rd(df), "k", "v",
                                 promote_threshold=0).to_pandas() \
        .set_index("k")["approx_distinct"]
    exact = df.groupby("k")["v"].nunique()
    for k in exact.index:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel < 0.05, (k, got[k], exact[k])   # ~3σ of 1.6% error

    # determinism: same input → same estimates
    again = approx_distinct_by_key(_rd(df), "k", "v",
                                   promote_threshold=0).to_pandas() \
        .set_index("k")["approx_distinct"]
    assert got.to_dict() == again.to_dict()


def test_hll_sparse_regime_is_exact(ray_session):
    """Sparse→dense hybrid (round 3): below the promote threshold the
    sketch is the exact hash set — estimates EQUAL pandas nunique on any
    block layout, including a mixed merge where one batch promotes."""
    from information_extraction_system_ray.functions.sketches import \
        approx_distinct_by_key

    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n).astype(np.int64),
        "v": rng.integers(0, 3000, n).astype(np.int64),
    })
    exact = df.groupby("k")["v"].nunique()
    for nblocks in (1, 7):
        ds = _rd(df).repartition(nblocks)
        got = approx_distinct_by_key(ds, "k", "v").to_pandas() \
            .set_index("k")["approx_distinct"]
        assert got.astype(int).to_dict() == exact.astype(int).to_dict()


def test_tfidf_knn_matches_numpy(ray_session):
    import re
    import zlib

    from information_extraction_system_ray.functions.tfidf import tfidf_knn

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "compilers translate source code into machine code",
        "a quick dog runs past the brown fox",
        "machine learning models compile training data",
        "harbors and festivals in coastal towns",
    ]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": texts})
    dim = 64
    got = tfidf_knn(_rd(df), [texts[0]], 3, dim=dim)

    # dense numpy reference with the same hashing + smoothing
    def vec(t):
        v = np.zeros(dim)
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            v[zlib.crc32(w.encode()) % dim] += 1
        return v
    tf = np.stack([vec(t) for t in texts])
    dfreq = (tf > 0).sum(axis=0)
    idf = np.where(dfreq > 0, np.log(6.0 / (dfreq + 1.0)) + 1.0, 1.0)
    m = tf * idf
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    q = vec(texts[0]) * idf
    sims = m.astype(np.float32) @ (q / np.linalg.norm(q)).astype(np.float32)
    order = np.lexsort((np.arange(5), -sims))[:3]

    assert list(got["doc_id"]) == list(order)
    for got_c, want_c in zip(got["cosine"], sims[order]):
        assert abs(got_c - want_c) < 1e-4
    # doc 0 is its own best match; doc 2 (fox/dog overlap) beats compilers
    assert got["doc_id"].iloc[0] == 0
    assert 2 in set(got["doc_id"])


def test_bloom_prefilter_join_identical_results(ray_session):
    """Bloom-prefiltered semi/anti joins must be BIT-IDENTICAL to the
    unfiltered joins (no false negatives), for both sparse and dense
    match rates."""
    from information_extraction_system_ray.functions.joins import (anti_join,
                                                      semi_join)

    rng = np.random.default_rng(21)
    left = pd.DataFrame({"k": np.arange(2000, dtype=np.int64),
                         "w": rng.integers(0, 9, 2000).astype(np.int64)})
    right = pd.DataFrame({"rk": rng.choice(
        np.arange(0, 6000, dtype=np.int64), 300, replace=False)})

    for anti in (False, True):
        plain = semi_join(_rd(left), _rd(right), left_key="k",
                          right_key="rk", anti=anti).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        bloom = semi_join(_rd(left), _rd(right), left_key="k",
                          right_key="rk", anti=anti,
                          bloom_bits=1 << 14).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert plain.equals(bloom), f"anti={anti}"


def test_bloom_no_false_negatives_small_m(ray_session):
    """Even a saturated (tiny) bloom must keep every true match."""
    from information_extraction_system_ray.functions.bloom import (
        bloom_contains, build_bloom)

    keys = pd.DataFrame({"rk": np.arange(5000, dtype=np.int64)})
    bits = build_bloom(_rd(keys), "rk", num_bits=256)   # hopelessly full
    mask = bloom_contains(bits, list(range(5000)))
    assert mask.all()


def test_heavy_hitters_bounds_and_exact(ray_session):
    """SpaceSaving: (a) capacity >= #distinct -> exact counts; (b) under
    trimming, count_lo <= true <= count_hi for every reported item and
    every item with true > N/capacity is reported (k=capacity)."""
    import numpy as np
    import ray.data as rd

    from information_extraction_system_ray.functions.sketches import \
        heavy_hitters

    rng = np.random.default_rng(17)
    # zipf-ish: few heavy items + long tail
    vals = (["heavy_a"] * 600 + ["heavy_b"] * 400 + ["mid_c"] * 120
            + [f"tail{i}" for i in rng.integers(0, 500, 900)])
    rng.shuffle(vals)
    import collections
    true = collections.Counter(vals)
    n = len(vals)

    ds = rd.from_items([{"v": v} for v in vals]).repartition(8)

    # (a) exact when capacity covers all distincts
    exact = heavy_hitters(ds, "v", k=5, capacity=2000).to_pandas()
    for _, r in exact.iterrows():
        assert r["count_lo"] == r["count_hi"] == true[r["item"]]
    assert list(exact["item"][:2]) == ["heavy_a", "heavy_b"]

    # (b) bounds + guarantee under trimming
    cap = 32
    out = heavy_hitters(ds, "v", k=cap, capacity=cap).to_pandas()
    got = dict(zip(out["item"], zip(out["count_lo"], out["count_hi"])))
    for item, (lo, hi) in got.items():
        assert lo <= true[item] <= hi, (item, lo, true[item], hi)
    for item, c in true.items():
        if c > n / cap:
            assert item in got, (item, c)


def test_approx_quantiles_rank_error(ray_session):
    """MRL sketch: every reported quantile's TRUE rank is within ~2N/k of
    the target rank; exact regime (k >= N) returns exact quantiles."""
    import numpy as np
    import ray.data as rd

    from information_extraction_system_ray.functions.sketches import \
        approx_quantiles

    rng = np.random.default_rng(23)
    vals = np.concatenate([rng.normal(0, 1, 30000),
                           rng.exponential(5, 20000)])  # skewed mix
    n = len(vals)
    ds = rd.from_items([{"v": float(x)} for x in vals]).repartition(16)

    k = 512
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = approx_quantiles(ds, "v", qs, k=k)
    svals = np.sort(vals)
    for _, r in got.iterrows():
        true_rank = np.searchsorted(svals, r["value"], side="left")
        assert abs(true_rank - r["q"] * n) <= 2.5 * n / k + 2, \
            (r["q"], true_rank, r["q"] * n)

    small = rd.from_items([{"v": float(x)} for x in range(100)])
    exact = approx_quantiles(small, "v", [0.5], k=4096)
    assert abs(exact["value"].iloc[0] - 50) <= 1


def test_auto_join_paths_agree(ray_session):
    """Broadcast and shuffle paths of auto_join return identical rows,
    including 1:N duplicate build keys and dropped non-matches."""
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_system_ray.functions.joins import auto_join

    left = rd.from_arrow(pa.table({
        "lk": pa.array([1, 2, 2, 3, 5], pa.int64()),
        "lv": pa.array(list("abcde"), pa.string())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 3, 4], pa.int64()),
        "rv": pa.array(list("wxyz"), pa.string())}))

    def run(limit):
        out = auto_join(left, right, left_key="lk", right_key="rk",
                        broadcast_limit=limit).to_pandas()
        return out.sort_values(["lk", "lv", "rv"]).reset_index(drop=True)[
            ["lk", "lv", "rv"]]

    bcast, shuf = run(10), run(0)
    assert bcast.equals(shuf), (bcast, shuf)
    # 2 left rows x 2 right dups + one 1:1 match = 5 rows
    assert len(bcast) == 5
    assert set(bcast["lk"]) == {2, 3}


def test_auto_join_schema_invariant_across_paths(ray_session):
    """ADVICE r2 (joins.py:153): the physical chooser flips on data
    size, so the two paths must emit the SAME schema — left columns then
    right_cols, right key dropped when names differ — and non-key name
    collisions must be rejected instead of silently suffixed."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from information_extraction_system_ray.functions.joins import auto_join

    left = rd.from_arrow(pa.table({
        "lk": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array(list("abc"), pa.string())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array(list("xyz"), pa.string())}))

    cols_b = auto_join(left, right, left_key="lk", right_key="rk",
                       broadcast_limit=10).schema().names
    cols_s = auto_join(left, right, left_key="lk", right_key="rk",
                       broadcast_limit=0).schema().names
    assert cols_b == cols_s == ["lk", "lv", "rv"]

    clash = rd.from_arrow(pa.table({
        "rk": pa.array([2], pa.int64()),
        "lv": pa.array(["boom"], pa.string())}))
    with pytest.raises(ValueError, match="collide"):
        auto_join(left, clash, left_key="lk", right_key="rk")


def test_setops_vs_python_sets(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_system_ray.functions.setops import (
        except_distinct, intersect_distinct)

    la = [("a", 1), ("a", 1), ("b", 2), ("c", 3), ("d", 4)]
    rb = [("b", 2), ("c", 3), ("c", 3), ("e", 5)]

    def mk(rows):
        return rd.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array([r[1] for r in rows], pa.int64())}))

    inter = intersect_distinct(mk(la), mk(rb)).to_pandas()
    exc = except_distinct(mk(la), mk(rb)).to_pandas()
    assert set(zip(inter["k"], inter["v"])) == set(la) & set(rb)
    assert len(inter) == len(set(la) & set(rb))      # distinct, no dups
    assert set(zip(exc["k"], exc["v"])) == set(la) - set(rb)
    assert len(exc) == len(set(la) - set(rb))


def test_unigram_nll_capped_vocab_planted_oov(ray_session, tmp_path):
    """VERDICT r3 item #2: the top-K-vocab + OOV path. A corpus whose
    vocabulary exceeds vocab_limit must score OOV tokens at
    log(oov_mass/total) with the model dict capped at K entries — the
    expected micro-nat scores are recomputed here by hand."""
    import pyarrow.parquet as pq

    from information_extraction_system_ray.queries import docs_unigram_nll

    # vocab: 'aa' ×6, 'bb' ×4, 'cc' ×2, 'dd' ×1 → total 13.
    # vocab_limit=2 keeps {aa, bb}; oov_mass = 3.
    texts = ["aa aa aa bb bb cc",      # doc 1: 3×aa 2×bb 1×OOV(cc)
             "aa aa aa bb bb cc dd"]   # doc 2: 3×aa 2×bb 2×OOV
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")

    got = docs_unigram_nll(str(tmp_path), vocab_limit=2).to_pandas() \
        .set_index("doc_id")

    total = 13.0
    lp = {"aa": math.log(6 / total), "bb": math.log(4 / total)}
    oov = math.log(3 / total)
    exp1 = -(3 * lp["aa"] + 2 * lp["bb"] + 1 * oov) / 6
    exp2 = -(3 * lp["aa"] + 2 * lp["bb"] + 2 * oov) / 7
    assert got.loc[1, "nll_u"] == round(exp1 * 1e6)
    assert got.loc[2, "nll_u"] == round(exp2 * 1e6)
    assert got.loc[1, "dl"] == 6 and got.loc[2, "dl"] == 7

    # and the exact path (limit above vocab) must differ: cc/dd scored
    # by their own counts, not the pooled OOV bucket
    exact = docs_unigram_nll(str(tmp_path), vocab_limit=100).to_pandas() \
        .set_index("doc_id")
    e1 = -(3 * lp["aa"] + 2 * lp["bb"] + math.log(2 / total)) / 6
    assert exact.loc[1, "nll_u"] == round(e1 * 1e6)


def test_auto_semi_join_paths_agree(ray_session):
    """VERDICT r3 item #5: the broadcast-is_in and co-partitioned
    semi_join physical plans must return identical rows for both semi
    and anti, so the size chooser is purely physical."""
    import ray.data as rd

    from information_extraction_system_ray.functions.joins import (
        auto_semi_join)

    rng = np.random.default_rng(7)
    left = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 50, 400), pa.int64()),
        "v": pa.array(np.arange(400), pa.int64())})).repartition(7)
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rng.integers(25, 60, 120), pa.int64())}
    )).repartition(3)

    for anti in (False, True):
        a = auto_semi_join(left, right, left_key="k", right_key="rk",
                           anti=anti, broadcast_limit=1_000_000) \
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        b = auto_semi_join(left, right, left_key="k", right_key="rk",
                           anti=anti, broadcast_limit=0) \
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        rset = set(right.to_pandas()["rk"])
        expect = [(k, v) for k, v in zip(
            left.to_pandas()["k"], left.to_pandas()["v"])
            if (k in rset) != anti]
        assert set(zip(a["k"], a["v"])) == set(expect)
        assert len(a) == len(expect)


def test_join_choosers_handle_empty_inputs(ray_session):
    """J13 (SURVEY §2.14): a zero-block left (schema None — the shape a
    groupby over a filtered-to-nothing input produces) must pass through
    every join chooser as the correct empty result; an empty probe side
    must short-circuit semi (nothing, schema kept) and anti (everything)."""
    import ray.data as rd

    from information_extraction_system_ray.functions.joins import (
        anti_join, auto_join, auto_semi_join, semi_join)

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array(["a", "b", "c"], pa.string())}))
    # a filter-to-nothing then groupby yields a zero-block, schema-None ds
    none_left = (left.map_batches(lambda t: t.slice(0, 0),
                                  batch_format="pyarrow")
                 .groupby("k").count())
    assert none_left.schema() is None   # the shape under test
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3], pa.int64()),
        "w": pa.array([20, 30], pa.int64())}))

    assert auto_join(none_left, right, left_key="k",
                     right_key="rk").count() == 0
    assert semi_join(none_left, right, left_key="k",
                     right_key="rk").count() == 0
    assert auto_semi_join(none_left, right, left_key="k",
                          right_key="rk").count() == 0

    # empty probe side (WITH schema): semi → zero rows, left schema kept;
    # anti → all left rows
    empty_right = right.map_batches(lambda t: t.slice(0, 0),
                                    batch_format="pyarrow")
    s = auto_semi_join(left, empty_right, left_key="k", right_key="rk")
    assert s.count() == 0 and set(s.schema().names) == {"k", "v"}
    a = auto_semi_join(left, empty_right, left_key="k", right_key="rk",
                       anti=True)
    assert a.count() == 3
    assert anti_join(left, right, left_key="k",
                     right_key="rk").to_pandas()["k"].tolist() == [1]


# ---------------------------------------------------------------------------
# distributed BPE merge training (functions/bpe.py) vs refimpl/bpe.py
# ---------------------------------------------------------------------------

def _bpe_tuple(t):
    return list(zip(t["left"].to_pylist(), t["right"].to_pylist(),
                    t["pair_count"].to_pylist()))


def test_bpe_matches_refimpl_on_corpus(ray_session):
    import pyarrow.parquet as pq

    from information_extraction_system_ray.functions.bpe import (
        bpe_train, word_count_table)
    from refimpl.bpe import bpe_merges

    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    wc = {}
    for tx in texts:
        for w in tx.lower().split():
            wc[w] = wc.get(w, 0) + 1
    want = bpe_merges(wc, 6)

    import ray.data as rd
    docs = rd.from_items([{"text": tx} for tx in texts]).repartition(4)
    got = _bpe_tuple(bpe_train(word_count_table(docs), k=6))
    assert got == want


def test_bpe_overlapping_runs_merge_pairwise(ray_session):
    # "aaaa" must merge (aa)(aa), not (aa)(a)(a) twice — the left-to-
    # right pairwise contract both implementations share
    import ray.data as rd

    from information_extraction_system_ray.functions.bpe import bpe_train
    from refimpl.bpe import bpe_merges

    wc = {"aaaa": 5, "aab": 3, "ba": 2}
    vocab = rd.from_items([{"word": w, "n": n} for w, n in wc.items()])
    got = _bpe_tuple(bpe_train(vocab, k=4))
    want = bpe_merges(wc, 4)
    assert got == want
    # first merge is (a,a) with count 5*3 (three adjacent pairs in
    # aaaa) + 3 (one in aab) = 18
    assert got[0] == ("a", "a", 18)


def test_bpe_layout_invariance(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.bpe import bpe_train

    items = [{"word": w, "n": n} for w, n in
             [("lower", 4), ("lowest", 2), ("newer", 6), ("wider", 3),
              ("new", 5), ("widest", 1)]]
    one = _bpe_tuple(bpe_train(rd.from_items(items).repartition(1), k=5))
    many = _bpe_tuple(bpe_train(rd.from_items(items).repartition(6), k=5))
    assert one == many and len(one) == 5


def test_bpe_encode_matches_refimpl(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.bpe import (
        bpe_apply, bpe_train)
    from refimpl.bpe import bpe_merges, encode_counts

    wc = {"lower": 4, "lowest": 2, "newer": 6, "wider": 3, "new": 5}
    vocab = rd.from_items(
        [{"word": w, "n": n} for w, n in wc.items()]).repartition(3)
    merges_t = bpe_train(vocab, k=4)
    pairs = list(zip(merges_t["left"].to_pylist(),
                     merges_t["right"].to_pylist()))
    got = {r["sym"]: r["n"]
           for r in bpe_apply(vocab, pairs).take_all()}
    want = encode_counts(wc, bpe_merges(wc, 4))
    assert got == want


def test_ppl_buckets_capped_vocab_planted_oov(ray_session, tmp_path):
    """docs_ppl_buckets carries the same vocab_limit + OOV contract as
    docs_unigram_nll: with the cap at 2, OOV tokens pool at
    log(oov_mass/total) and the bucket assignment follows the same
    hand-computed micro-nat scores."""
    import pyarrow.parquet as pq

    from information_extraction_system_ray.queries import docs_ppl_buckets

    texts = ["aa aa aa bb bb cc",      # 3×aa 2×bb 1×OOV(cc), dl=6
             "aa aa aa bb bb cc dd"]   # 3×aa 2×bb 2×OOV,     dl=7
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")

    total = 13.0
    lp = {"aa": math.log(6 / total), "bb": math.log(4 / total)}
    oov = math.log(3 / total)
    nll1 = round(-(3 * lp["aa"] + 2 * lp["bb"] + 1 * oov) / 6 * 1e6)
    nll2 = round(-(3 * lp["aa"] + 2 * lp["bb"] + 2 * oov) / 7 * 1e6)

    def bucket(u):
        return ("head" if u < 3_400_000
                else "middle" if u < 3_404_000 else "tail")

    want = {}
    for u, dl in ((nll1, 6), (nll2, 7)):
        b = bucket(u)
        d, t = want.get(b, (0, 0))
        want[b] = (d + 1, t + dl)

    got = docs_ppl_buckets(str(tmp_path), vocab_limit=2).to_pandas()
    got_map = {r.bucket: (r.n_docs, r.n_tokens)
               for r in got.itertuples()}
    assert got_map == want


def test_keyspace_gaps_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from information_extraction_system_ray.queries import orders_keyspace_gaps

    # keys 0..9 with {3, 4, 5, 8} removed: two gaps of sizes 3 and 1
    keys = [0, 1, 2, 6, 7, 9]
    pq.write_table(pa.table({"o_orderkey": pa.array(keys, pa.int64())}),
                   tmp_path / "orders.parquet")
    got = orders_keyspace_gaps(str(tmp_path)).to_pandas().iloc[0]
    assert got.n_keys == 6 and got.min_key == 0 and got.max_key == 9
    assert got.n_missing == 4 and got.largest_gap == 3


def test_phrase_search_two_plans_agree(ray_session, tmp_path):
    """The positional-index serving plan (docs_phrase_search) must count
    exactly what a text-local scan counts, including adjacent
    occurrences ("hash join hash join") that string-replace tricks
    undercount, and reversed/partial bigrams it must not count."""
    import pyarrow.parquet as pq

    from information_extraction_system_ray.queries import docs_phrase_search

    texts = ["hash join hash join x",        # 2 adjacent occurrences
             "join hash",                    # reversed — 0
             "hash hash join join",          # 1 (positions 1-2)
             "a hash join b hash join c",    # 2 separated
             "hash",                         # partial — 0
             ""]                             # empty — 0
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")

    got = docs_phrase_search(str(tmp_path)).to_pandas()
    got_map = dict(zip(got.doc_id, got.n_phrase))

    def local_count(t):
        toks = t.split(" ")
        return sum(1 for i in range(len(toks) - 1)
                   if toks[i] == "hash" and toks[i + 1] == "join")

    want = {i + 1: local_count(t) for i, t in enumerate(texts)
            if local_count(t) > 0}
    assert got_map == want


def test_trailing_window_count_ties(ray_session, tmp_path):
    """RANGE-frame peer semantics: ts ties within a user all count each
    other (unlike a ROWS frame), and the 1h bound is inclusive."""
    import pyarrow.parquet as pq

    from information_extraction_system_ray.queries import (
        events_trailing_window_count)

    hour_us = 3_600_000_000
    ts = [0, 0, hour_us, hour_us + 1, 10 * hour_us]
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([7] * 5, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), tmp_path / "events.parquet")

    got = events_trailing_window_count(str(tmp_path)).to_pandas()
    got_map = dict(zip(got.event_id, got.n_trail_1h))
    # events 0,1 tie at t=0 → each sees both peers; event 2 at exactly
    # +1h still includes them (inclusive bound); event 3 at +1h+1us
    # drops the t=0 pair; event 4 is alone
    assert got_map == {0: 2, 1: 2, 2: 3, 3: 2, 4: 1}


def test_watermark_late_planted(ray_session, tmp_path):
    """Out-of-order arrivals: the exclusive running-max watermark must
    mark exactly the events that sit >15min behind the max PRIOR event
    time — driver tables are near-monotone and never exercise this."""
    import pyarrow.parquet as pq

    from information_extraction_system_ray.queries import (
        events_watermark_late)

    MIN = 60_000_000
    ts = [0, 120 * MIN, 60 * MIN, 110 * MIN, 30 * MIN]
    # arrival order = event_id; wm(i) = max prior ts - 15min:
    #  id0 no prior -> on time (window 0)
    #  id1 t=2h, wm=0-15m -> on time (window 2h)
    #  id2 t=1h  < 2h-15m -> LATE   (window 1h)
    #  id3 t=110m >= 105m -> on time (window 1h)
    #  id4 t=30m < 105m   -> LATE   (window 0)
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), tmp_path / "events.parquet")

    got = events_watermark_late(str(tmp_path)).to_pandas()
    rows = {int(r.window_start_us): (int(r.n_on_time), int(r.n_late))
            for r in got.itertuples()}
    assert rows == {0: (1, 1), 60 * MIN: (1, 1), 120 * MIN: (1, 0)}


def test_union_by_name(ray_session):
    """Typed-null padding on both sides; loud failure on type drift."""
    import ray.data as rd

    from information_extraction_system_ray.functions.reshape import (
        union_by_name)

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                "x": pa.array(["a", "b"], pa.string())}))
    b = rd.from_arrow(pa.table({"k": pa.array([3], pa.int64()),
                                "y": pa.array([9.5], pa.float64())}))
    got = union_by_name(a, b).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert list(got.columns) == ["k", "x", "y"]
    assert got["x"].tolist()[:2] == ["a", "b"] and pd.isna(got["x"][2])
    assert pd.isna(got["y"][0]) and got["y"][2] == 9.5

    c = rd.from_arrow(pa.table({"k": pa.array(["s"], pa.string())}))
    with pytest.raises(ValueError, match="type conflict"):
        union_by_name(a, c)


def test_merge_into_semantics(ray_session):
    """MERGE legs: untouched base survives, matched rows update or
    delete, unmatched source inserts (or is ignored entirely when
    when_not_matched=None)."""
    import ray.data as rd

    from information_extraction_system_ray.functions.merge import merge_into

    base = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64())})).repartition(2)
    src = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "v": pa.array([0, 0, 40], pa.int64())})).repartition(2)

    def matched(t):
        keep = t.filter(pa.compute.not_equal(t["k"], 3))   # delete k=3
        return pa.table({"k": keep["k"],
                         "v": pa.compute.add(keep["v"], 1)})

    def insert(t):
        return t

    got = merge_into(base, src, on="k", when_matched=matched,
                     when_not_matched=insert).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got.values.tolist() == [[1, 10], [2, 21], [4, 40]]

    got2 = merge_into(base, src, on="k", when_matched=matched,
                      when_not_matched=None).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got2.values.tolist() == [[1, 10], [2, 21]]


def test_zorder_audit_beats_single_key_layouts(ray_session):
    """orders_zorder_audit: the Z-order layout's total zone span must
    beat BOTH the single-key and the insertion layouts (that is the
    point of the operator), and all layouts cut 64 blocks; plus an
    exact golden vs a single-process numpy recompute."""
    import duckdb
    import numpy as np

    from information_extraction_system_ray.queries import orders_zorder_audit

    sf = "/root/testdata/sf0.001"
    got = orders_zorder_audit(sf).to_pandas().set_index("layout")
    assert (got["n_blocks"] == 64).all()
    assert (got.loc["zorder", "total_zone_span"]
            < got.loc["custkey", "total_zone_span"])
    assert (got.loc["zorder", "total_zone_span"]
            < got.loc["insertion", "total_zone_span"])

    df = duckdb.connect().execute(
        f"SELECT o_orderkey, o_custkey, "
        f"CAST(round(o_totalprice*100) AS BIGINT) cents "
        f"FROM '{sf}/orders.parquet'").df()
    mx, my = df["o_custkey"].max() + 1, df["cents"].max() + 1
    x = (df["o_custkey"].to_numpy() * 256 // mx).astype(np.int64)
    y = (df["cents"].to_numpy() * 256 // my).astype(np.int64)
    z = np.zeros(len(x), np.int64)
    for bit in range(8):
        z |= ((x >> bit) & 1) << (2 * bit + 1)
        z |= ((y >> bit) & 1) << (2 * bit)
    okey = df["o_orderkey"].to_numpy()
    n = len(x)

    def span(order):
        idx = np.lexsort(order)
        blocks = np.arange(n) * 64 // n
        tot = 0
        for b in range(64):
            m = blocks == b
            tot += int(x[idx][m].max() - x[idx][m].min()
                       + y[idx][m].max() - y[idx][m].min() + 2)
        return tot

    assert got.loc["zorder", "total_zone_span"] == span((okey, z))
    assert got.loc["custkey", "total_zone_span"] == span((okey, x))
    assert got.loc["insertion", "total_zone_span"] == span((okey,))


def test_compaction_plan_ffd_parity(ray_session):
    """compaction_plan == a pure-Python first-fit-decreasing reference
    (bin-for-bin), plus the packing invariants: bytes preserved, no bin
    over target unless it holds a single oversized file, deterministic
    under any input layout."""
    import random

    from information_extraction_system_ray.functions.partitions import \
        compaction_plan

    def ffd_ref(items, target):
        order = sorted(items, key=lambda x: (-x[1], x[0]))
        bins, rem = {}, []
        for fid, s in order:
            for b, cap in enumerate(rem):
                if s <= cap:
                    rem[b] -= s
                    bins[fid] = b
                    break
            else:
                bins[fid] = len(rem)
                rem.append(max(target - s, 0))
        return bins

    rng = random.Random(11)
    items = [(i, rng.randrange(1, 400)) for i in range(300)]
    items += [(1000, 900), (1001, 2500)]      # oversized file
    target = 1000

    def run(nparts):
        df = pd.DataFrame({"file_id": [f for f, _ in items],
                           "bytes": [s for _, s in items]})
        ds = _rd(df.sample(frac=1, random_state=nparts))  # shuffled layout
        out = compaction_plan(ds.repartition(nparts),
                              target_bytes=target).to_pandas()
        return dict(zip(out["file_id"], out["bin_id"])), out

    want = ffd_ref(items, target)
    got, out = run(4)
    assert got == want
    got1, _ = run(1)
    assert got1 == want

    sizes = dict(items)
    per_bin = out.groupby("bin_id").agg(n=("file_id", "size"),
                                        total=("bytes", "sum"))
    assert int(out["bytes"].sum()) == sum(sizes.values())
    over = per_bin[per_bin["total"] > target]
    assert (over["n"] == 1).all()             # only oversized singletons


def test_pava_isotonic_properties():
    """pava_isotonic == brute-force O(n²) PAVA reference; fitted means
    are non-decreasing; pooled sums preserve the total; already-monotone
    input is a fixpoint; a decreasing sequence pools to one block."""
    import random
    from fractions import Fraction

    from information_extraction_system_ray.functions.stats import pava_isotonic

    def brute(sums, counts):
        # repeatedly scan for any adjacent violation and pool
        blocks = [[int(s), int(c), 1] for s, c in zip(sums, counts)]
        changed = True
        while changed:
            changed = False
            for i in range(len(blocks) - 1):
                s1, c1, k1 = blocks[i]
                s2, c2, k2 = blocks[i + 1]
                if s1 * c2 > s2 * c1:
                    blocks[i:i + 2] = [[s1 + s2, c1 + c2, k1 + k2]]
                    changed = True
                    break
        out = []
        for s, c, k in blocks:
            out.extend([(s, c)] * k)
        return out

    rng = random.Random(7)
    for trial in range(30):
        n = rng.randrange(1, 40)
        sums = [rng.randrange(0, 1000) for _ in range(n)]
        counts = [rng.randrange(1, 5) for _ in range(n)]
        got_s, got_c = pava_isotonic(np.array(sums, dtype=object),
                                     np.array(counts, dtype=object))
        got = list(zip([int(x) for x in got_s], [int(x) for x in got_c]))
        assert got == brute(sums, counts), (sums, counts)
        means = [Fraction(s, c) for s, c in got]
        assert all(a <= b for a, b in zip(means, means[1:]))
        # each pooled block preserves its members' total
        tot = sum(Fraction(s, c) * 1 for s, c in got if False) or 0
        # weighted sum of fitted means == raw sum
        fitted_total = sum(Fraction(s, c) * c0
                           for (s, c), c0 in zip(got, counts))
        assert fitted_total == sum(sums)

    # monotone input is untouched
    mono_s, mono_c = pava_isotonic(np.array([1, 2, 3, 10], dtype=object),
                                   np.array([1, 1, 1, 1], dtype=object))
    assert [int(x) for x in mono_s] == [1, 2, 3, 10]
    # strictly decreasing input pools to the global mean
    dec_s, dec_c = pava_isotonic(np.array([9, 6, 3], dtype=object),
                                 np.array([1, 1, 1], dtype=object))
    assert [int(x) for x in dec_s] == [18, 18, 18]
    assert [int(x) for x in dec_c] == [3, 3, 3]


def test_xmlio_roundtrip_types_and_nulls():
    """write_xml/read_xml roundtrip exactness: int64/float64/string/
    date32/timestamp/bool columns, NULLs in every column, empty table,
    markup-hostile strings, and the unsupported-type rejection."""
    import datetime

    import pytest as _pytest

    from information_extraction_system_ray.sources.xmlio import read_xml, write_xml

    t = pa.table({
        "i": pa.array([1, None, -7], pa.int64()),
        "f": pa.array([1.5, float("inf"), None], pa.float64()),
        "s": pa.array(["<a&b>", None, "x\"y'z"], pa.string()),
        "d": pa.array([datetime.date(1996, 2, 29), None,
                       datetime.date(2000, 1, 1)], pa.date32()),
        "ts": pa.array([datetime.datetime(1997, 6, 1, 12, 30, 45, 123456),
                        None, datetime.datetime(1970, 1, 1)],
                       pa.timestamp("us")),
        "b": pa.array([True, False, None], pa.bool_()),
    })
    import io
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".xml", delete=False) as fh:
        path = fh.name
    write_xml(t, path)
    back = read_xml(path)
    assert back.equals(t), (back, t)
    # bytes input path too
    assert read_xml(open(path, "rb").read()).equals(t)

    empty = t.slice(0, 0)
    write_xml(empty, path)
    assert read_xml(path).equals(empty)

    bad = pa.table({"x": pa.array([[1]], pa.list_(pa.int64()))})
    with _pytest.raises(ValueError):
        write_xml(bad, path)

    # column names become element tags: XML-invalid names rejected
    # up front (ADVICE r4), not discovered at read time
    for bad_name in ("has space", "1leading", "a<b", "a:b"):
        with _pytest.raises(ValueError):
            write_xml(pa.table({bad_name: pa.array([1], pa.int64())}),
                      path)

    # timestamp serialization is timezone-INDEPENDENT (ADVICE r4):
    # the epoch-micros rendering must not consult the host TZ
    import os as _os
    import time as _time
    old_tz = _os.environ.get("TZ")
    _os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        tt = t.select(["ts"])
        write_xml(tt, path)
        assert read_xml(path).equals(tt)
    finally:
        if old_tz is None:
            _os.environ.pop("TZ", None)
        else:
            _os.environ["TZ"] = old_tz
        _time.tzset()


def test_storage_audit_matches_duckdb_parquet_metadata(ray_session):
    """orders_storage_audit (pyarrow footer walk) == DuckDB's own
    parquet_metadata() over the same file — two independent footer
    parsers agreeing byte-for-byte, per column."""
    import duckdb
    import pandas as pd

    from information_extraction_system_ray.queries import orders_storage_audit

    sf = "/root/testdata/sf0.001"
    got = orders_storage_audit(sf).to_pandas()
    want = duckdb.sql(f"""
        SELECT path_in_schema AS column,
               CAST(SUM(num_values) AS BIGINT) AS n_values,
               CAST(SUM(total_compressed_size) AS BIGINT)
                   AS compressed_bytes,
               CAST(SUM(total_uncompressed_size) AS BIGINT)
                   AS uncompressed_bytes,
               CAST(SUM(CAST(total_compressed_size AS HUGEINT)) * 1000000
                    // SUM(CAST(total_uncompressed_size AS HUGEINT))
                    AS BIGINT) AS ratio_ppm
        FROM parquet_metadata('{sf}/orders.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_changelog_lateness_contract(ray_session):
    """events_tumbling_changelog: with effectively infinite allowed
    lateness NOTHING is late (changelog == final everywhere), and with
    the default 1 h lateness the late totals match the oracle-checked
    run; n_changelog == n_final + n_late always."""
    from information_extraction_system_ray.queries import events_tumbling_changelog

    sf = "/root/testdata/sf0.001"
    inf = events_tumbling_changelog(
        sf, lateness_us=10**18).to_pandas()
    assert (inf["n_late"] == 0).all()
    assert (inf["n_changelog"] == inf["n_final"]).all()

    dflt = events_tumbling_changelog(sf).to_pandas()
    assert (dflt["n_changelog"] ==
            dflt["n_final"] + dflt["n_late"]).all()
    # same windows/groups and identical final counts in both runs
    assert inf[["window_start_us", "event_type", "n_final"]] \
        .equals(dflt[["window_start_us", "event_type", "n_final"]])
