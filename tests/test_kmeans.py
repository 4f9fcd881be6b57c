"""Distributed k-means (functions/vectors.py kmeans) — exact oracle is a
driver-side numpy reference running the SAME deterministic algorithm
(md5 bottom-k init, int64 micro-unit sums, lowest-id tie-break), so the
distributed result must match it bit-for-bit on any block layout."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from information_extraction_system_ray.functions.vectors import kmeans

_SCALE = 1_000_000.0


def _make(n=120, d=6, seed=3):
    rng = np.random.default_rng(seed)
    # three well-separated blobs + noise so clustering is non-trivial
    centers = rng.normal(size=(3, d)) * 10
    pts = np.concatenate([
        centers[i % 3] + rng.normal(size=d) * 0.5 for i in range(n)
    ]).reshape(n, d).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    return ids, pts


def _reference(ids, pts, k, iters):
    q = np.round(pts.astype(np.float64) * _SCALE).astype(np.int64)
    hs = np.array([hashlib.md5(str(i).encode()).hexdigest() for i in ids])
    order = np.argsort(hs, kind="stable")[:k]
    cents = q[order].astype(np.float64)
    for _ in range(iters):
        d2 = -2.0 * q.astype(np.float64) @ cents.T \
            + (cents * cents).sum(axis=1)[None, :]
        codes = np.argmin(d2, axis=1)
        new = cents.copy()
        for c in range(k):
            m = codes == c
            if m.any():
                new[c] = q[m].sum(axis=0) / m.sum()
        cents = new
    d2 = -2.0 * q.astype(np.float64) @ cents.T \
        + (cents * cents).sum(axis=1)[None, :]
    return cents, np.argmin(d2, axis=1)


def _ds(ids, pts, nparts):
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(pts),
                                        pa.list_(pa.float32()))})
    return rd.from_arrow(t).repartition(nparts)


@pytest.mark.parametrize("nparts", [1, 5])
def test_kmeans_matches_reference_any_layout(ray_session, nparts):
    ids, pts = _make()
    k, iters = 4, 4
    want_c, want_a = _reference(ids, pts, k, iters)
    got_c, assign = kmeans(_ds(ids, pts, nparts), k=k, iters=iters)
    assert np.array_equal(got_c, want_c)
    got = {r["vec_id"]: r["cluster"] for r in assign.take_all()}
    assert [got[i] for i in ids] == list(want_a)


def test_kmeans_recovers_separated_blobs(ray_session):
    ids, pts = _make(n=90, d=4, seed=11)
    _, assign = kmeans(_ds(ids, pts, 3), k=3, iters=6)
    rows = assign.take_all()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] % 3)
    # every recovered cluster is pure: one blob per cluster
    assert all(len(v) == 1 for v in by_cluster.values())
    assert len(rows) == 90


def test_pq_layout_invariance_and_distortion(ray_session):
    """pq_train_encode is bit-deterministic under repartitioning, and
    its reported distortion equals a numpy recompute from the returned
    codebooks + codes."""
    import numpy as np
    import ray.data

    from information_extraction_system_ray.functions.vectors import (
        _SCALE, pq_train_encode)
    from information_extraction_system_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    emb = read_table(sf, "embeddings", columns=["vec_id", "embedding"])
    books, codes = pq_train_encode(emb, m=4, k=16, iters=2)
    a = codes.to_pandas().sort_values(["vec_id", "subspace"]) \
        .reset_index(drop=True)
    books2, codes2 = pq_train_encode(emb.repartition(7), m=4, k=16,
                                     iters=2)
    b = codes2.to_pandas().sort_values(["vec_id", "subspace"]) \
        .reset_index(drop=True)
    assert np.array_equal(books, books2)
    assert a.equals(b)

    # distortion recompute from the returned artifacts
    import pyarrow.parquet as pq2
    t = pq2.read_table(f"{sf}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    vecs = {i: np.asarray(v, np.float64) for i, v in
            zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())}
    d = len(next(iter(vecs.values())))
    sub = d // 4
    cb = np.round(books).astype(np.int64)
    for _, r in a.iterrows():
        s = int(r["subspace"])
        v = np.round(vecs[int(r["vec_id"])][s * sub:(s + 1) * sub]
                     * _SCALE).astype(np.int64)
        want = int(((v - cb[s, int(r["code"])]) ** 2).sum())
        assert int(r["distortion_micro2"]) == want
    assert sorted(a["vec_id"].unique()) == sorted(vecs)


def test_cluster_quality_matches_numpy_recompute(ray_session):
    """emb_cluster_quality == a numpy same-formula recomputation from
    the same (deterministic) kmeans centroids over the raw parquet."""
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd
    from information_extraction_system_ray.functions.vectors import kmeans
    from information_extraction_system_ray.queries import emb_cluster_quality

    sf = "/root/testdata/sf0.001"
    res = emb_cluster_quality(sf).to_pandas()
    got = {r["cluster"]: (int(r["n_points"]),
                          int(r["mean_silhouette_micro"]))
           for _, r in res.iterrows()}

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    cents, _ = kmeans(rd.from_arrow(t).repartition(3), k=8, iters=5)
    c = np.asarray(cents, np.float64)
    flat = t["embedding"].combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False)
    n = t.num_rows
    v = np.round(flat.astype(np.float64).reshape(n, -1) * 1_000_000.0)
    d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    own = d2.argmin(axis=1)
    a = np.sqrt(d2[np.arange(n), own])
    d2[np.arange(n), own] = np.inf
    b = np.sqrt(d2.min(axis=1))
    denom = np.maximum(a, b)
    s = np.where(denom > 0, (b - a) / denom, 0.0)
    sm = np.floor(s * 1_000_000.0 + 0.5).astype(np.int64)
    want = {}
    tot_s = tot_n = 0
    for k in sorted(set(own.tolist())):
        m = own == k
        ssum, cnt = int(sm[m].sum()), int(m.sum())
        want[str(k)] = (cnt, (2 * ssum + cnt) // (2 * cnt))
        tot_s += ssum
        tot_n += cnt
    want["overall"] = (tot_n, (2 * tot_s + tot_n) // (2 * tot_n))
    assert got == want
