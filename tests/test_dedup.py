"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine — correctness on constructed corpora with known duplicates."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_with_dups(ray_session):
    import ray.data as rd

    base = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "completely different text about compilers and type systems here",
        "a third document discussing harbors festivals and museums today",
    ]
    rows = []
    did = 0
    for b in base:
        for variant in range(3):
            words = b.split()
            if variant == 1:
                words[2] = words[2] + "x"        # near-dup: 1 word changed
            elif variant == 2:
                words = words                     # exact dup of variant 0
            rows.append({"doc_id": did, "text": " ".join(words)})
            did += 1
    rows.append({"doc_id": did, "text": "unrelated singleton entry"})
    return rd.from_items(rows)


def test_exact_dedup(ray_session):
    from information_extraction_system_ray.functions.dedup import exact_dedup

    docs = _docs_with_dups(ray_session)
    kept = exact_dedup(docs).to_pandas()
    # 3 bases × 2 distinct variants (v0==v2 exact) + singleton = 7 survivors
    assert len(kept) == 7
    # survivor is always the min doc_id of its group
    assert set(kept["doc_id"]) == {0, 1, 3, 4, 6, 7, 9}


def test_minhash_lsh_finds_near_dups(ray_session):
    from information_extraction_system_ray.functions.dedup import \
        minhash_lsh_duplicates

    docs = _docs_with_dups(ray_session)
    # 32 bands × 2 rows: collision prob for J≈0.4 pairs ≈ 1-(1-0.16)^32 ≈ 1;
    # signature-agreement threshold below the smallest true J (0.4) minus
    # estimator noise (64 perms ⇒ ±0.06)
    pairs = minhash_lsh_duplicates(
        docs, num_perm=64, bands=32, shingle_k=3,
        jaccard_threshold=0.3).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # exact dups must be found; near-dups (1 word off) should be too
    for a, b in [(0, 2), (3, 5), (6, 8)]:
        assert (a, b) in got
    for a, b in [(0, 1), (3, 4), (6, 7)]:
        assert (a, b) in got
    # no cross-base pairs
    assert all(a // 3 == b // 3 for a, b in got if a <= 8 and b <= 8)


def test_simhash_duplicates(ray_session):
    from information_extraction_system_ray.functions.dedup import \
        simhash_duplicates

    docs = _docs_with_dups(ray_session)
    pairs = simhash_duplicates(docs, max_hamming=8).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    for a, b in [(0, 2), (3, 5), (6, 8)]:   # exact dups: hamming 0
        assert (a, b) in got


def test_ngram_jaccard_pairs(ray_session):
    from information_extraction_system_ray.functions.dedup import \
        ngram_jaccard_pairs

    docs = _docs_with_dups(ray_session)
    pairs = ngram_jaccard_pairs(docs, shingle_k=3,
                                threshold=0.4).to_pandas()
    got = {(a, b): j for a, b, j in
           zip(pairs["id_a"], pairs["id_b"], pairs["jaccard"])}
    assert got.get((0, 2)) == 1.0          # exact dup → Jaccard exactly 1
    assert (0, 1) in got and got[(0, 1)] < 1.0


def test_embedding_cosine_duplicates(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.dedup import \
        embedding_cosine_duplicates

    rng = np.random.default_rng(3)
    base = rng.normal(size=(5, 16)).astype(np.float32)
    rows = []
    vid = 0
    for i in range(5):
        for _ in range(2):  # two near-identical copies of each base vector
            v = base[i] + rng.normal(scale=0.01, size=16).astype(np.float32)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    ds = rd.from_items(rows)
    pairs = embedding_cosine_duplicates(
        ds, threshold=0.99, num_buckets=4).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    for i in range(5):
        assert (2 * i, 2 * i + 1) in got
    # pairs only within a base (cosine of independent gaussians ≪ 0.99)
    assert all(a // 2 == b // 2 for a, b in got)


def test_pages_url_dedup_exact_vs_duckdb_window(ray_session, tmp_path):
    """D4 exact check (VERDICT r1 #10): the url-dedup winner per url equals
    a DuckDB ROW_NUMBER() window oracle over the same corpus written to
    Parquet (the driver can't see synthetic tables; this test can)."""
    import hashlib
    import os

    import duckdb

    from information_extraction_system_ray.functions.dedup import \
        dedup_pages_by_url
    from information_extraction_system_ray.sources.pages import synth_pages

    base = synth_pages(120)
    dup = synth_pages(30, seed=43)     # shares urls where langs coincide
    merged = base.union(dup).materialize()

    pq_path = str(tmp_path / "pages.parquet")
    pdf = merged.to_pandas()
    # duckdb's sha256() is VARCHAR-only; precompute the BLOB hash as a column
    pdf["sha"] = [hashlib.sha256(bytes(h)).hexdigest() for h in pdf["html"]]
    pdf.to_parquet(pq_path)

    got = dedup_pages_by_url(merged).to_pandas()
    got["sha"] = [hashlib.sha256(bytes(h)).hexdigest()
                  for h in got["html"]]
    got = got[["url", "warc_ts", "sha"]] \
        .sort_values("url").reset_index(drop=True)

    con = duckdb.connect()
    want = con.execute(f"""
        SELECT url, warc_ts, sha FROM (
          SELECT url, warc_ts, sha,
                 ROW_NUMBER() OVER (
                   PARTITION BY url
                   ORDER BY warc_ts DESC, sha DESC) AS rn
          FROM read_parquet('{pq_path}')) t
        WHERE rn = 1 ORDER BY url
    """).fetchdf()
    assert len(got) == len(want)
    assert list(got["url"]) == list(want["url"])
    assert list(got["sha"]) == list(want["sha"])
    assert list(got["warc_ts"]) == list(want["warc_ts"])


def test_simhash_block_recall_exact(ray_session):
    """Manku block-table guarantee: with 4 tables of 16 bits, the operator's
    output is EXACTLY the brute-force pair set at max_hamming <= 3 —
    recall 1.0 (pigeonhole: <=3 flipped bits leave >=1 block intact) and
    precision 1.0 (every candidate is hamming-verified), no duplicate rows
    from the multi-table union."""
    import ray.data as rd

    from information_extraction_system_ray.functions.dedup import (
        simhash_batch, simhash_duplicates)
    from information_extraction_system_ray.functions.hashing import hamming64

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(30):
        words = list(rng.choice(vocab, size=40))
        rows.append({"doc_id": 2 * i, "text": " ".join(words)})
        mut = list(words)
        mut[int(rng.integers(len(mut)))] = str(rng.choice(vocab))
        rows.append({"doc_id": 2 * i + 1, "text": " ".join(mut)})

    # brute-force truth over the same simhash values
    tbl = simhash_batch(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
    }))
    hs = {int(i): int(h) & ((1 << 64) - 1)
          for i, h in zip(tbl["doc_id"].to_pylist(),
                          tbl["simhash"].to_pylist())}
    ids = sorted(hs)
    want = {(a, b) for xi, a in enumerate(ids) for b in ids[xi + 1:]
            if hamming64(hs[a], hs[b]) <= 3}

    pairs = simhash_duplicates(rd.from_items(rows), max_hamming=3).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert got == want
    assert len(pairs) == len(got)  # cross-table dedup: no duplicate rows


def test_embedding_multitable_no_dup_rows(ray_session):
    import ray.data as rd

    from information_extraction_system_ray.functions.dedup import \
        embedding_cosine_duplicates

    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        v = rng.normal(size=16).astype(np.float32)
        rows.append({"vec_id": 2 * i, "embedding": v.tolist()})
        rows.append({"vec_id": 2 * i + 1,
                     "embedding": (v + 0.01 * rng.normal(size=16)
                                   .astype(np.float32)).tolist()})
    pairs = embedding_cosine_duplicates(
        rd.from_items(rows), threshold=0.98, num_tables=3).to_pandas()
    # multi-table union must not emit the same pair twice
    assert not pairs.duplicated(["id_a", "id_b"]).any()
    # every planted pair that any single table could find is present
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    found_planted = sum((2 * i, 2 * i + 1) in got for i in range(20))
    assert found_planted >= 18  # 3 tables x 8 buckets: near-total recall


def test_contamination_flags_planted_overlap(ray_session):
    """Docs sharing an 8-gram with the reference set are flagged; docs
    with only shorter overlaps are not. Exact oracle: brute-force shingle
    intersection on the driver."""
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_system_ray.functions.dedup import (
        contamination_flags)
    from information_extraction_system_ray.functions.text import (
        shingle_hashes)

    bench = ("the quick brown fox jumps over the lazy dog while "
             "seven wise wizards brew quality tonics at dawn")
    ref_rows = {"doc_id": [1000, 1001],
                "text": [bench, "completely unrelated reference text "
                                "about maritime navigation charts"]}
    docs_rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            # verbatim 8-gram lift from bench -> contaminated
            "intro words then the quick brown fox jumps over the lazy "
            "dog closing remark",
            # only a 4-gram in common -> clean at k=8
            "the quick brown fox went elsewhere entirely after that "
            "moment of fame and never returned home again",
            "nothing in common with any reference document here at all "
            "just filler tokens stretching past the shingle width",
            # verbatim lift from the second ref doc
            "students study completely unrelated reference text about "
            "maritime navigation charts in the library",
        ],
    }
    docs = rd.from_arrow(pa.table(docs_rows)).repartition(3)
    ref = rd.from_arrow(pa.table(ref_rows)).repartition(2)

    got = sorted(r["doc_id"] for r in
                 contamination_flags(docs, ref, shingle_k=8).take_all())

    ref_sh = set()
    for t in ref_rows["text"]:
        ref_sh.update(shingle_hashes(t, 8).tolist())
    want = sorted(i for i, t in zip(docs_rows["doc_id"],
                                    docs_rows["text"])
                  if set(shingle_hashes(t, 8).tolist()) & ref_sh)
    assert got == want
    assert 1 in got and 4 in got and 2 not in got and 3 not in got


@pytest.mark.parametrize("nparts", [1, 4])
def test_semantic_dedup_planted_groups(ray_session, nparts):
    """Three tight duplicate groups in separated regions + unique noise:
    survivors are exactly (lowest id per group) + all uniques, on any
    block layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_system_ray.functions.dedup import (
        semantic_dedup)

    rng = np.random.default_rng(5)
    d = 8
    anchors = rng.normal(size=(3, d)) * 10
    ids, vecs = [], []
    # duplicate groups: 4 members each, tiny jitter -> cosine ~ 1
    for g, a in enumerate(anchors):
        for m in range(4):
            ids.append(100 * g + m)
            vecs.append(a + rng.normal(size=d) * 1e-3)
    # far-apart uniques
    for u in range(20):
        ids.append(1000 + u)
        v = rng.normal(size=d) * 10
        vecs.append(v)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(
                      [np.asarray(v, np.float32) for v in vecs],
                      pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(nparts)
    got = sorted(r["vec_id"] for r in
                 semantic_dedup(ds, k=6, iters=4,
                                threshold=0.95).take_all())
    # every duplicate group collapsed to its lowest id
    assert 0 in got and 100 in got and 200 in got
    for g in range(3):
        survivors = [i for i in got if 100 * g <= i < 100 * g + 4]
        assert survivors == [100 * g]
    # uniques: pairwise cosine below threshold -> all kept unless two
    # random vectors happen to align; verify against brute force
    vn = np.stack([np.asarray(v, np.float32) for v in vecs])
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    sim = vn @ vn.T
    order = np.argsort(ids, kind="stable")
    kept = []
    for i in order:
        if all(sim[i, j] < 0.95 for j in kept):
            kept.append(i)
    want_upper = sorted(np.asarray(ids)[kept].tolist())
    # distributed result may keep MORE than global-greedy (cross-cluster
    # pairs are not compared) but never fewer, and never drops a group
    # representative
    assert set(want_upper) <= set(got)


def test_neardup_survivors_transitive_closure(ray_session):
    """MinHash pairs → distributed CC → min-id survivor equals a driver
    union-find over the SAME pair set (transitive closure included):
    the composed flow behind docs_neardup_survivors."""
    from information_extraction_system_ray.functions.dedup import \
        minhash_lsh_duplicates
    from information_extraction_system_ray.stages.canonicalize import \
        connected_components_distributed
    import pandas as pd
    import pyarrow.compute as pc

    docs = _docs_with_dups(ray_session)
    pairs = minhash_lsh_duplicates(docs, num_perm=64, bands=32,
                                   shingle_k=3, jaccard_threshold=0.3)
    pdf = pairs.to_pandas()

    # driver union-find over the identical pair set
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pdf["id_a"], pdf["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for x in list(parent):
        want.setdefault(find(x), set()).add(x)
    want = sorted((min(m), len(m)) for m in want.values())

    labels = connected_components_distributed(
        pairs.map_batches(
            lambda t: pa.table({"src": pc.cast(t["id_a"], pa.string()),
                                "dst": pc.cast(t["id_b"], pa.string())}),
            batch_format="pyarrow"))
    lab = labels.to_pandas()
    lab["node"] = lab["node"].astype("int64")
    got = sorted((int(g["node"].min()), len(g))
                 for _, g in lab.groupby("label"))
    assert got == want
    # each planted base collapses to one cluster of 3 led by its min id
    assert got == [(0, 3), (3, 3), (6, 3)]


def test_leakfree_folds_no_cluster_straddle(ray_session):
    """docs_leakfree_folds invariant on a constructed corpus: every
    near-dup cluster's members land in ONE fold, every doc folds exactly
    once, and fold totals cover the corpus."""
    import hashlib

    import pandas as pd
    import pyarrow.compute as pc
    from information_extraction_system_ray.functions.dedup import \
        minhash_lsh_duplicates
    from information_extraction_system_ray.stages.canonicalize import \
        connected_components_distributed

    docs = _docs_with_dups(ray_session)
    K = 5
    pairs = minhash_lsh_duplicates(docs, num_perm=64, bands=32,
                                   shingle_k=3, jaccard_threshold=0.3)
    labels = connected_components_distributed(pairs.map_batches(
        lambda t: pa.table({"src": pc.cast(t["id_a"], pa.string()),
                            "dst": pc.cast(t["id_b"], pa.string())}),
        batch_format="pyarrow")).to_pandas()
    labels["node"] = labels["node"].astype("int64")

    # replicate the query's fold rule and check the straddle invariant
    all_ids = set(docs.to_pandas()["doc_id"])
    rep_of = {}
    for _, g in labels.groupby("label"):
        m = int(g["node"].min())
        for n in g["node"]:
            rep_of[int(n)] = m
    fold_of = {d: int(hashlib.md5(str(rep_of.get(d, d)).encode())
                      .hexdigest(), 16) % K for d in all_ids}
    # every cluster in exactly one fold
    for _, g in labels.groupby("label"):
        fs = {fold_of[int(n)] for n in g["node"]}
        assert len(fs) == 1
    # totals cover the corpus exactly once
    assert sum(1 for _ in fold_of) == len(all_ids)


def test_leakfree_folds_query_covers_corpus(ray_session):
    """END-TO-END run of docs_leakfree_folds (round-3 distributed path:
    anti_join singletons + distributed cluster-count groupby — no
    corpus-sized take_all on the driver): fold doc totals must cover the
    corpus exactly once and cluster counts must be non-negative with at
    least one multi-doc cluster (sf0.001 plants near-dups)."""
    import pyarrow.parquet as pq
    from information_extraction_system_ray.queries import docs_leakfree_folds

    sf = "/root/testdata/sf0.001"
    r = docs_leakfree_folds(sf).to_pandas()
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert int(r["n_docs"].sum()) == n_docs
    assert (r["fold"].sort_values().to_numpy() == range(len(r))).all()
    assert (r["n_clusters"] >= 0).all()
    assert int(r["n_clusters"].sum()) > 0


def test_winnow_shared_substring_guarantee():
    """Winnowing's core guarantee: any shared substring of length
    >= w + k - 1 (11 chars here) shares at least one fingerprint."""
    import numpy as np

    from information_extraction_system_ray.functions.dedup import winnow_fingerprints

    shared = "a very distinctive shared passage of text"
    a = winnow_fingerprints("prefix one " + shared + " suffix alpha")
    b = winnow_fingerprints("other start " + shared + " other end")
    assert len(np.intersect1d(a, b)) >= 1
    # disjoint texts share nothing
    c = winnow_fingerprints("zzz qqq xxx jjj vvv www kkk yyy")
    assert len(np.intersect1d(a, c)) == 0
    # edge cases: shorter than k -> empty; k..k+w-2 -> one fingerprint
    assert len(winnow_fingerprints("tiny")) == 0
    assert len(winnow_fingerprints("exactly12ch")) == 1


def test_winnow_pairs_match_single_process(ray_session):
    """docs_winnow_pairs golden: the distributed pair counts equal a
    single-process recompute with the same df<=50 boilerplate cap."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq2

    from information_extraction_system_ray.functions.dedup import winnow_fingerprints
    from information_extraction_system_ray.queries import docs_winnow_pairs

    sf = "/root/testdata/sf0.001"
    got = docs_winnow_pairs(sf).to_pandas()
    t = pq2.read_table(f"{sf}/documents.parquet",
                       columns=["doc_id", "text"])
    by_fp = defaultdict(list)
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for fp in winnow_fingerprints(txt):
            by_fp[int(fp)].append(did)
    pairs = Counter()
    for fp, docs in by_fp.items():
        if len(docs) < 2 or len(docs) > 50:
            continue
        docs = sorted(docs)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                pairs[(docs[i], docs[j])] += 1
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [((r["a"], r["b"]), int(r["n_shared"]))
            for _, r in got.iterrows()] == want
