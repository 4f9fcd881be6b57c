"""Hashed TF-IDF document vectors + similarity search — the classic
sparse-retrieval composition (aggregate → broadcast → vectorize → kNN).

Scale design: the HASHING TRICK fixes the vector space at ``dim`` buckets,
so no global term vocabulary is ever built or shipped — the only global
state is the per-bucket document-frequency table, which is ≤ ``dim`` rows
regardless of corpus size (a combiner collapses each batch to its distinct
(doc, bucket) pairs first). The idf array (dim × float64, e.g. 8 KB at
dim=1024) broadcasts via ``ray.put`` once; vectorization is then a pure
per-batch map. idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style,
public); vectors are L2-normalized so cosine == dot."""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

_TERM_RE = re.compile(r"[a-z0-9]+")


def _buckets(text: str, dim: int) -> np.ndarray:
    return np.array([zlib.crc32(w.encode()) % dim
                     for w in _TERM_RE.findall((text or "").lower())],
                    dtype=np.int64)


def bucket_df(docs: ray.data.Dataset, *, text_col: str = "text",
              dim: int = 1024) -> ray.data.Dataset:
    """Dataset(bucket, df) — number of docs containing each hash bucket."""
    def partial(t: pa.Table) -> pa.Table:
        out = []
        for x in t[text_col].to_pylist():
            out.append(np.unique(_buckets(x, dim)))
        b = (np.concatenate(out) if out
             else np.array([], dtype=np.int64))
        return pa.table({"bucket": pa.array(b, pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Count(alias_name="df")))


def _idf(docs: ray.data.Dataset, text_col: str, dim: int) -> np.ndarray:
    n_docs = docs.count()
    df_tbl = bucket_df(docs, text_col=text_col, dim=dim).to_pandas()
    idf = np.ones(dim, dtype=np.float64)
    idf[df_tbl["bucket"].to_numpy()] = (
        np.log((n_docs + 1.0) / (df_tbl["df"].to_numpy() + 1.0)) + 1.0)
    return idf


def tfidf_vectors(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                  text_col: str = "text", dim: int = 1024,
                  idf: "np.ndarray | None" = None) -> ray.data.Dataset:
    """Dataset(id_col, vector:list<float32>) — L2-normalized hashed TF-IDF."""
    if idf is None:
        idf = _idf(docs, text_col, dim)
    idf_ref = ray.put(idf.astype(np.float32))

    def vectorize(t: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        vecs = []
        for x in t[text_col].to_pylist():
            v = np.zeros(dim, dtype=np.float32)
            b = _buckets(x, dim)
            if b.size:
                np.add.at(v, b, 1.0)       # tf
                v *= w
                n = float(np.linalg.norm(v))
                if n > 0:
                    v /= n
            vecs.append(v.tolist())
        return pa.table({
            id_col: t[id_col],
            "vector": pa.array(vecs, pa.list_(pa.float32())),
        })

    return docs.map_batches(vectorize, batch_format="pyarrow")


def tfidf_knn(docs: ray.data.Dataset, query_texts: list, k: int = 5, *,
              id_col: str = "doc_id", text_col: str = "text",
              dim: int = 1024) -> pd.DataFrame:
    """Top-k most similar docs per query text by TF-IDF cosine — reuses
    the brute-force kNN operator (broadcast query matrix, per-batch
    partial top-k)."""
    from .similarity import knn_bruteforce

    idf = _idf(docs, text_col, dim)
    vecs = tfidf_vectors(docs, id_col=id_col, text_col=text_col, dim=dim,
                         idf=idf).materialize()
    q = np.zeros((len(query_texts), dim), dtype=np.float32)
    for i, text in enumerate(query_texts):
        b = _buckets(text, dim)
        if b.size:
            np.add.at(q[i], b, 1.0)
            q[i] *= idf.astype(np.float32)
    return knn_bruteforce(vecs, q, k, id_col=id_col, vec_col="vector")
