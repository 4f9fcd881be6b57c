"""Vector-column aggregates over ``list<float>`` embedding columns.

Per-label centroids reduce each batch to (label, dim, int64 partial sum,
count) rows BEFORE the shuffle — shuffle width is |labels| x dim, never the
row count — then one bounded groupby merges partials. Cross-engine
exactness: float32 values are scaled to int64 micro-units with one
``round(double(x) * 1e6)`` (IEEE-identical in any engine), summed in exact
integer arithmetic (order-free), and divided once in float64. Overflow
budget: |x| <= 1e3 → 1e9 per element → int64 safely holds ~9e9 such
elements per (label, dim)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

_SCALE = 1_000_000.0


def label_centroids(ds: ray.data.Dataset, *, vec_col: str = "embedding",
                    label_col: str = "label") -> ray.data.Dataset:
    """Per-label mean vector, exploded to one row per (label, dim):
    columns (label int64, dim int64 1-based, centroid_micro float64 — micro-unit scale)."""

    def partial(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        n, total = len(t), len(flat)
        if n == 0 or total == 0:
            return pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                              ("s", pa.int64()),
                              ("c", pa.int64())]).empty_table()
        d = total // n
        mat = np.round(flat.astype(np.float64) * _SCALE) \
            .astype(np.int64).reshape(n, d)
        labels = t[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, codes, mat)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64()),
            "c": pa.array(np.repeat(counts, d), pa.int64()),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["label", "dim"])
              .aggregate(Sum("s", alias_name="s"),
                         Sum("c", alias_name="c")))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "dim": pc.cast(t["dim"], pa.int64()),
            "centroid_micro": pc.divide(pc.cast(t["s"], pa.float64()),
                                  pc.cast(t["c"], pa.float64())),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def kmeans(ds: ray.data.Dataset, *, vec_col: str = "embedding",
           id_col: str = "vec_id", k: int = 8,
           iters: int = 5) -> "tuple[np.ndarray, ray.data.Dataset]":
    """Distributed Lloyd's k-means, deterministic on any partitioning.

    Returns ``(centroids[k, d] float64 in micro-units, Dataset(id,
    cluster))``. Three determinism levers: (1) init picks the k vectors
    with the lowest ``md5(id)`` — a distributed bottom-k, no RNG; (2)
    vectors are quantized ONCE to int64 micro-units and per-cluster sums
    accumulate in exact integer arithmetic (order-free), so an iteration's
    centroids are identical on 1 block or 1000; (3) assignment breaks
    distance ties by lowest cluster id (argmin). Per iteration the shuffle
    carries only k x d partial-sum rows; vectors never re-shuffle. Empty
    clusters keep their previous centroid."""
    import hashlib

    from ray.data.aggregate import Count

    def quantize(t: pa.Table) -> np.ndarray:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        n = len(t)
        d = len(flat) // n if n else 0
        return np.round(flat.astype(np.float64) * _SCALE) \
            .astype(np.int64).reshape(n, d)

    # ---- init: distributed bottom-k by md5(id) ----------------------
    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        if not ids:
            return pa.schema([("h", pa.string()), (id_col, pa.int64()),
                              ("vec", pa.list_(pa.int64()))]).empty_table()
        hs = np.array([hashlib.md5(str(i).encode()).hexdigest()
                       for i in ids])
        order = np.argsort(hs, kind="stable")[:k]
        mat = quantize(t)
        return pa.table({
            "h": pa.array(hs[order], pa.string()),
            id_col: pa.array(np.asarray(ids, np.int64)[order], pa.int64()),
            "vec": pa.array(list(mat[order]), pa.list_(pa.int64())),
        })

    seeds = ds.map_batches(seed_partial, batch_format="pyarrow") \
        .sort("h").limit(k).take_all()
    cents = np.array([r["vec"] for r in seeds], np.float64)
    d = cents.shape[1]

    # ---- Lloyd iterations ------------------------------------------
    for _ in range(iters):
        cref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            mat = quantize(t).astype(np.float64)
            if mat.size == 0:
                return pa.schema([("cluster", pa.int64()),
                                  ("dim", pa.int64()), ("s", pa.int64()),
                                  ("c", pa.int64())]).empty_table()
            c = ray.get(cref)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
            d2 = -2.0 * mat @ c.T + (c * c).sum(axis=1)[None, :]
            codes = np.argmin(d2, axis=1)          # ties -> lowest cluster
            sums = np.zeros((len(c), mat.shape[1]), np.int64)
            np.add.at(sums, codes, mat.astype(np.int64))
            counts = np.bincount(codes, minlength=len(c)).astype(np.int64)
            nz = np.flatnonzero(counts)
            dd = mat.shape[1]
            return pa.table({
                "cluster": pa.array(np.repeat(nz, dd), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dd, dtype=np.int64),
                                        len(nz)), pa.int64()),
                "s": pa.array(sums[nz].ravel(), pa.int64()),
                "c": pa.array(np.repeat(counts[nz], dd), pa.int64()),
            })

        merged = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby(["cluster", "dim"])
                  .aggregate(Sum("s", alias_name="s"),
                             Sum("c", alias_name="c"))).take_all()
        new = cents.copy()
        for row in merged:
            cl, dim = int(row["cluster"]), int(row["dim"])
            new[cl, dim] = float(row["s"]) / float(row["c"])
        cents = new

    # ---- final assignment ------------------------------------------
    cref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        mat = quantize(t).astype(np.float64)
        out_schema = pa.schema([(id_col, pa.int64()),
                                ("cluster", pa.int64())])
        if mat.size == 0:
            return out_schema.empty_table()
        c = ray.get(cref)
        d2 = -2.0 * mat @ c.T + (c * c).sum(axis=1)[None, :]
        codes = np.argmin(d2, axis=1).astype(np.int64)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(codes, pa.int64())}
                        ).cast(out_schema)

    return cents, ds.map_batches(assign, batch_format="pyarrow")


def pca_top_component(ds: ray.data.Dataset, *, vec_col: str = "embedding",
                      iters: int = 60) -> "tuple[np.ndarray, float, int]":
    """First principal component of an embedding column by DISTRIBUTED
    covariance accumulation + driver power iteration → ``(component[d]
    float64 unit vector, explained variance, n)``.

    Scale shape: each batch reduces to ONE (d, d+1) int64 partial — the
    Gram matrix XᵀX and the column sums, both in exact micro-unit integer
    arithmetic (order-free, so the result is bit-identical on any block
    layout; overflow budget: |x|≤1e3 → 1e9 scaled² per element-product →
    int64 holds ~9e6 such products per cell per partial, merged in
    Python ints with no bound). Vectors never leave their block; the
    shuffle is d×(d+1) numbers per batch. Power iteration on the d×d
    driver matrix starts from a fixed deterministic vector, so no RNG.
    Sign convention: the component's largest-|coordinate| entry is made
    positive (eigenvectors are sign-ambiguous)."""
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.schema([("gram", pa.list_(pa.int64())),
                              ("sums", pa.list_(pa.int64())),
                              ("n", pa.int64())]).empty_table()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // n
        x = np.round(flat.astype(np.float64) * _SCALE) \
            .astype(np.int64).reshape(n, d)
        amax = int(np.abs(x).max()) if x.size else 0
        if amax * amax * n > (1 << 62):        # per-cell overflow guard
            raise OverflowError(
                "pca_top_component: batch too large for exact int64 Gram "
                f"accumulation (|x|max={amax}, rows={n}); lower batch_size")
        gram = x.T @ x                         # exact C-speed int64 matmul
        return pa.table({
            "gram": pa.array([gram.ravel().tolist()], pa.list_(pa.int64())),
            "sums": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.int64())),
            "n": pa.array([n], pa.int64()),
        })

    # ≤ one row per block lands on the driver — d×d ints, not vectors
    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("pca_top_component: empty input")
    d = int(round(len(rows[0]["gram"]) ** 0.5))
    gram = np.zeros((d, d), dtype=object)
    sums = np.zeros(d, dtype=object)
    n = 0
    for r in rows:
        gram += np.array(r["gram"], dtype=object).reshape(d, d)
        sums += np.array(r["sums"], dtype=object)
        n += int(r["n"])
    gram_f = gram.astype(np.float64) / (_SCALE * _SCALE)
    mean = sums.astype(np.float64) / (_SCALE * n)
    cov = gram_f / n - np.outer(mean, mean)

    v = np.ones(d, np.float64) / np.sqrt(d)       # deterministic start
    for _ in range(iters):
        w = cov @ v
        nw = np.linalg.norm(w)
        if nw == 0:
            break
        v = w / nw
    lam = float(v @ cov @ v)
    i = int(np.argmax(np.abs(v)))
    if v[i] < 0:
        v = -v
    return v, lam, n


def pq_train_encode(ds: ray.data.Dataset, *, vec_col: str = "embedding",
                    id_col: str = "vec_id", m: int = 4, k: int = 16,
                    iters: int = 3
                    ) -> "tuple[np.ndarray, ray.data.Dataset]":
    """Product quantization (Jégou et al. 2011) — the memory-compressed
    ANN code path that complements the IVF index: the d-dim space splits
    into ``m`` contiguous subspaces, each trained with the repo's
    deterministic integer-exact :func:`kmeans` (bottom-k md5 seeds, int64
    micro-unit partial sums, lowest-id tie-break), and every vector is
    encoded as ``m`` one-byte-ish codes.

    Returns ``(codebooks[m, k, d/m] float64 micro-units, Dataset(id_col,
    subspace, code, distortion_micro2))``. The per-row distortion is the
    exact int64 squared distance between the micro-quantized subvector
    and its (rounded-to-int) centroid, so the whole output is
    bit-deterministic under any partitioning. Codebooks are m·k·(d/m)
    floats — a broadcast-safe constant; every pass over the data is a
    streaming map_batches. Micro-unit squares bound the per-subvector
    distortion at ~(2e6)²·(d/m); switch _SCALE to milli past ~1e9 rows
    (documented contract, same as kmeans)."""
    first = ds.take(1)[0]
    d = len(first[vec_col])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m

    def project(s: int):
        def fn(t: pa.Table) -> pa.Table:
            vecs = t[vec_col].combine_chunks()
            flat = vecs.flatten().to_numpy(zero_copy_only=False)
            mat = flat.reshape(len(t), d)[:, s * sub:(s + 1) * sub]
            return pa.table({id_col: t[id_col],
                             vec_col: pa.array(list(mat.astype(np.float64)),
                                               pa.list_(pa.float64()))})
        return fn

    books = []
    parts = []
    for s in range(m):
        proj = ds.map_batches(project(s), batch_format="pyarrow")
        cents, _ = kmeans(proj, vec_col=vec_col, id_col=id_col,
                          k=k, iters=iters)
        books.append(cents)
        cref = ray.put(np.round(cents).astype(np.int64))

        def encode(t: pa.Table, _s=s, _cref=cref) -> pa.Table:
            vecs = t[vec_col].combine_chunks()
            flat = vecs.flatten().to_numpy(zero_copy_only=False)
            mat = np.round(flat.reshape(len(t), d)[:, _s * sub:(_s + 1)
                           * sub].astype(np.float64)
                           * _SCALE).astype(np.int64)
            c = ray.get(_cref)
            d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d2, axis=1)
            dist = d2[np.arange(len(mat)), codes]
            return pa.table({
                id_col: t[id_col],
                "subspace": pa.array(np.full(len(mat), _s, np.int64)),
                "code": pa.array(codes.astype(np.int64), pa.int64()),
                "distortion_micro2": pa.array(dist, pa.int64())})

        parts.append(ds.map_batches(encode, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return np.stack(books), out
