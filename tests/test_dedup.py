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
