"""Property tests (hypothesis) for the round-2 operators: structural
invariants that hold for ANY input, complementing the fixed-corpus oracle
checks."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st


def _rd(df, parts=3):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(parts)


_keys = st.lists(st.integers(0, 5), min_size=1, max_size=40)


@settings(max_examples=12, deadline=None)
@given(keys=_keys)
def test_row_number_is_permutation_per_key(ray_session, keys):
    from information_extraction_system_ray.functions.window import row_number

    df = pd.DataFrame({
        "k": np.array(keys, dtype=np.int64),
        "o": np.arange(len(keys), dtype=np.int64),
    })
    got = row_number(_rd(df), keys=["k"], order_by=["o"],
                     num_partitions=3).to_pandas()
    assert len(got) == len(df)
    for k, g in got.groupby("k"):
        # per key: rn is exactly {1..n} and increases with the order col
        assert sorted(g["rn"]) == list(range(1, len(g) + 1))
        assert list(g.sort_values("o")["rn"]) == \
            sorted(g["rn"])


@settings(max_examples=12, deadline=None)
@given(left=st.lists(st.integers(0, 9), min_size=0, max_size=30,
                     unique=True),
       right=st.lists(st.integers(0, 9), min_size=0, max_size=30))
def test_semi_anti_partition_left(ray_session, left, right):
    """semi(L,R) ∪ anti(L,R) == L exactly, disjointly — for any key sets
    including empty sides and duplicate probe keys."""
    from information_extraction_system_ray.functions.joins import (anti_join,
                                                      semi_join)

    ldf = pd.DataFrame({"k": np.array(left, dtype=np.int64)})
    rdf = pd.DataFrame({"rk": np.array(right, dtype=np.int64)})
    if len(ldf) == 0:
        return

    def keyset(ds):
        # Ray's to_pandas on an all-empty result drops columns (the
        # Dataset-level schema is still correct) — treat as empty set
        df = ds.to_pandas()
        return set(df["k"]) if "k" in df.columns else set()

    semi = keyset(semi_join(_rd(ldf), _rd(rdf), left_key="k",
                            right_key="rk"))
    anti = keyset(anti_join(_rd(ldf), _rd(rdf), left_key="k",
                            right_key="rk"))
    assert semi | anti == set(left)
    assert semi & anti == set()
    assert semi == set(left) & set(right)


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.integers(-100, 100), min_size=1, max_size=200))
def test_exact_quantiles_rank_semantics(ray_session, vals):
    import math

    from information_extraction_system_ray.functions.quantiles import \
        exact_quantiles

    df = pd.DataFrame({"v": np.array(vals, dtype=np.int64)})
    got = exact_quantiles(_rd(df), "v", [0.0, 0.37, 0.5, 1.0])
    sv = np.sort(np.array(vals))
    for q, v in zip(got["q"], got["value"]):
        assert v == sv[max(1, math.ceil(q * len(sv))) - 1]


@settings(max_examples=8, deadline=None)
@given(keys=_keys)
def test_rolling_sum_matches_pandas(ray_session, keys):
    """rolling_sum == pandas groupby().rolling() reference, for any input
    and any partition count (results are partition-invariant)."""
    from information_extraction_system_ray.functions.window import \
        rolling_sum

    n = len(keys)
    df = pd.DataFrame({
        "k": np.array(keys, dtype=np.int64),
        "i": np.arange(n, dtype=np.int64),
        "v": (np.arange(n, dtype=np.int64) * 7919) % 1000,
    })
    want = df.sort_values(["k", "i"]).copy()
    want["roll"] = (want.groupby("k")["v"]
                    .rolling(3, min_periods=1).sum()
                    .reset_index(drop=True).to_numpy().astype(np.int64))
    want = want.sort_values(["k", "i"]).reset_index(drop=True)

    for parts in (1, 7):
        got = rolling_sum(_rd(df), "v", keys=["k"], order_by=["i"],
                          window=3, out_col="roll",
                          num_partitions=parts).to_pandas() \
            .sort_values(["k", "i"]).reset_index(drop=True)
        assert list(got["roll"]) == list(want["roll"])


@settings(max_examples=8, deadline=None)
@given(keys=_keys)
def test_dense_rank_value_law(ray_session, keys):
    """dense_rank: rank of a row == 1 + #distinct smaller values within
    its key — for any input, any partitioning."""
    from information_extraction_system_ray.functions.window import \
        dense_rank

    n = len(keys)
    df = pd.DataFrame({
        "k": np.array(keys, dtype=np.int64),
        "v": (np.array(keys, dtype=np.int64) * 31 + np.arange(n)) % 4,
    })
    got = dense_rank(_rd(df), keys=["k"], order_by=["v"],
                     out_col="dr", num_partitions=5).to_pandas()
    for _, r in got.iterrows():
        smaller = df[(df["k"] == r["k"]) & (df["v"] < r["v"])]["v"].nunique()
        assert r["dr"] == smaller + 1


@settings(max_examples=8, deadline=None)
@given(keys=_keys)
def test_upsert_latest_wins(ray_session, keys):
    from information_extraction_system_ray.functions.upsert import upsert

    n = len(keys)
    base = pd.DataFrame({
        "k": np.array(keys, dtype=np.int64),
        "ver": np.arange(n, dtype=np.int64),
        "val": np.arange(n, dtype=np.int64) * 10,
    }).drop_duplicates("k", keep="last")
    upd = base[base["k"] % 2 == 0].copy()
    upd["ver"] = upd["ver"] + 5
    upd["val"] = -1

    got = upsert(_rd(base), _rd(upd), key_cols=["k"],
                 version_col="ver").to_pandas()
    assert len(got) == base["k"].nunique()
    for _, r in got.iterrows():
        if r["k"] % 2 == 0:
            assert r["val"] == -1          # update won
        else:
            b = base[base["k"] == r["k"]].iloc[0]
            assert r["val"] == b["val"]


# ---- winnowing (pure kernel, no Ray) --------------------------------------

_texts = st.text(alphabet="abcdef gh", min_size=0, max_size=80)


@settings(max_examples=40, deadline=None)
@given(pre=_texts, post=_texts, pre2=_texts, post2=_texts)
def test_winnow_guarantee_property(pre, post, pre2, post2):
    """Any two texts sharing a >= w+k-1 (=11) char substring share at
    least one winnowed fingerprint — for ARBITRARY surroundings. The
    shared block is padded with spaces so normalization can't fuse it
    with the random context."""
    from information_extraction_system_ray.functions.dedup import (
        winnow_fingerprints)

    shared = "qzjqxkvwpzy"          # 11 chars, outside the text alphabet
    a = winnow_fingerprints(pre + " " + shared + " " + post)
    b = winnow_fingerprints(pre2 + " " + shared + " " + post2)
    assert len(np.intersect1d(a, b)) >= 1


@settings(max_examples=40, deadline=None)
@given(t=_texts)
def test_winnow_whitespace_case_invariance(t):
    from information_extraction_system_ray.functions.dedup import (
        winnow_fingerprints)

    a = winnow_fingerprints(t)
    b = winnow_fingerprints("  " + t.upper().replace(" ", "   ") + " ")
    assert np.array_equal(a, b)


# ---- pHash (pure kernel, no Ray) -------------------------------------------

@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000), shift=st.integers(1, 40))
def test_phash_brightness_invariance(seed, shift):
    """A uniform brightness shift only moves the DCT DC coefficient,
    which pHash excludes — the hash must be bit-identical (no clipping:
    base range keeps headroom)."""
    from information_extraction_system_ray.stages.multimodal import phash64

    rng = np.random.default_rng(seed)
    img = rng.integers(40, 200, size=(24, 24, 3)).astype(np.uint8)
    shifted = (img.astype(np.int64) + shift).astype(np.uint8)
    assert phash64(img) == phash64(shifted)


# ---- RAKE phrase rule (pure kernel, no Ray) --------------------------------

_words = st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta",
                                   "the", "of", "and"]),
                  min_size=0, max_size=30)


@settings(max_examples=40, deadline=None)
@given(words=_words)
def test_rake_phrase_rule_properties(words):
    """Every emitted phrase is stopword-free, <= 4 tokens, and the
    emitted token multiset equals the input's non-stopword multiset."""
    from collections import Counter

    from information_extraction_system_ray.queries import _rake_phrases

    stop = {"the", "of", "and"}
    phrases = _rake_phrases([" ".join(words)], stop)
    for ph in phrases:
        assert 1 <= len(ph) <= 4
        assert not (set(ph) & stop)
    got = Counter(w for ph in phrases for w in ph)
    want = Counter(w for w in words if w not in stop)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abcdef #", min_size=0, max_size=12),
                min_size=2, max_size=2))
def test_jaro_winkler_matches_duckdb(pair):
    """_jaro_winkler (queries.py) must reproduce DuckDB's
    jaro_winkler_similarity double-for-double — the exactness the
    part_jw_name_pairs oracle depends on. Alphabet includes repeats,
    spaces and '#' to hit transposition/window/prefix edge cases."""
    import duckdb

    from information_extraction_system_ray.queries import _jaro_winkler

    a, b = pair
    want = duckdb.connect().execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    got = _jaro_winkler(a, b)
    assert abs(got - want) < 1e-12, (a, b, got, want)


@settings(max_examples=6, deadline=None)
@given(edges=st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12),
              st.integers(1, 9)),
    min_size=1, max_size=30))
def test_boruvka_msf_census_matches_kruskal(ray_session, edges):
    """For ANY small weighted multigraph (self loops, parallels, ties),
    the distributed Borůvka census equals a pure-Python Kruskal's —
    total weight and component structure are tie-invariant."""
    import ray.data as rd
    from information_extraction_system_ray.functions.graphops import \
        boruvka_msf

    def kruskal(es):
        nodes = sorted({n for e in es for n in e[:2]})
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        total = picked = 0
        for w, a, b in sorted((w, a, b) for a, b, w in es if a != b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                total += w
                picked += 1
        return {"n_nodes": len(nodes),
                "n_components": len({find(n) for n in nodes}),
                "n_msf_edges": picked, "total_weight": total}

    t = pa.table({"u": pa.array([a for a, _, _ in edges], pa.int64()),
                  "v": pa.array([b for _, b, _ in edges], pa.int64()),
                  "w": pa.array([w for _, _, w in edges], pa.int64())})
    got = boruvka_msf(rd.from_arrow(t).repartition(3), num_partitions=2)
    assert got == kruskal(edges)
