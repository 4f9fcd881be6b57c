"""Deduplication operators over a document Dataset (system-prompt scope):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale pattern shared by all: per-batch vectorized signature computation
(map_batches) → hash-partitioned groupby on the signature/bucket key →
per-group survivors / candidate pairs. Survivor choice is always min(doc_id)
so results are deterministic and block-order independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from .hashing import (hamming64, minhash_permutations, minhash_signature,
                      simhash64, stable_hash64)
from .text import _WORD_RE, fingerprint_batch, shingle_hashes


def exact_dedup(docs: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """Keep the min-id row per exact (normalized) content fingerprint.

    hash-partition + per-group-first (SURVEY.md §2.7 D1): fingerprint in a
    vectorized map_batches, then ONE groupby(fingerprint) keeping min id —
    the groupby moves only (fingerprint, id) pairs, not the text."""
    fp = docs.map_batches(
        lambda b: fingerprint_batch(b, text_col).select(
            [id_col, "fingerprint"]),
        batch_format="pyarrow")
    keep = (fp.groupby("fingerprint")
            .aggregate(Min(id_col, alias_name="keep_id")))
    return keep.select_columns(["keep_id", "fingerprint"]) \
        .rename_columns({"keep_id": id_col})


_PAIR_PARTS = 16  # hash partitions for bucket co-location; raise with cluster


def minhash_lsh_duplicates(docs: ray.data.Dataset, *,
                           id_col: str = "doc_id", text_col: str = "text",
                           num_perm: int = 64, bands: int = 16,
                           shingle_k: int = 5,
                           jaccard_threshold: float = 0.8
                           ) -> ray.data.Dataset:
    """Near-duplicate PAIRS via MinHash+LSH (shingle → minhash → band →
    bucket groupby → verified candidates), the standard web-dedup scheme
    (Broder; used by C4/RefinedWeb — public).

    Returns Dataset(id_a, id_b, jaccard_sig) with id_a < id_b, deduplicated,
    where jaccard_sig (signature agreement rate) ≥ threshold. Candidate
    verification uses the signatures (unbiased Jaccard estimator).

    Signature transport: one signature is 8·num_perm bytes but appears in
    ``bands`` buckets, so shipping it on every band row multiplies shuffle
    volume ×bands. The signature TABLE (id → sig) is instead broadcast once
    via ``ray.put`` — it is the small side (512 B/doc vs multi-KB docs) —
    and only (id, band, bucket) rows go through the shuffle. At corpus
    sizes where even signatures outgrow one node (≳10^8 docs), shard the
    broadcast or revert to sig-on-row; the LSH math is unchanged."""
    import ray as _ray

    rows_per_band = num_perm // bands
    a, b = minhash_permutations(num_perm)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = [minhash_signature(shingle_hashes(t, shingle_k), a, b)
                .astype(np.int64)
                for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.int64())),
        })

    sig_ds = docs.map_batches(sig_batch,
                              batch_format="pyarrow").materialize()
    sig_pdf = sig_ds.to_pandas()
    sig_ref = _ray.put({int(i): np.asarray(s, dtype=np.int64)
                        for i, s in zip(sig_pdf[id_col], sig_pdf["sig"])})

    def band_batch(batch: pa.Table) -> pa.Table:
        out_id, out_band, out_bucket = [], [], []
        for i, sig in zip(batch[id_col].to_pylist(),
                          batch["sig"].to_pylist()):
            for band in range(bands):
                chunk = sig[band * rows_per_band:(band + 1) * rows_per_band]
                bucket = stable_hash64(
                    str(band) + ":" + ",".join(map(str, chunk)))
                out_id.append(i)
                out_band.append(band)
                out_bucket.append(bucket)
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "bucket": pa.array(out_bucket, pa.int64()),
            # partition key: same bucket → same partition; grouping by
            # PARTITION (not per bucket) avoids one Ray group-task per
            # bucket — thousands of tiny groups otherwise
            "part": pa.array([b % _PAIR_PARTS for b in out_bucket],
                             pa.int64()),
        })

    banded = sig_ds.map_batches(band_batch, batch_format="pyarrow")

    def pairs_in_part(part: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets are the overwhelming majority — drop them with
        # one vectorized mask instead of iterating every group in Python
        part = part[part.duplicated(["band", "bucket"], keep=False)]
        if not len(part):
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "jaccard_sig": pd.Series([],
                                                          dtype="float64")})
        sigmap = _ray.get(sig_ref)
        out_a, out_b, out_j = [], [], []
        for _, g in part.groupby(["band", "bucket"], sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(g[id_col].unique())
            sigs = np.stack([sigmap[int(i)] for i in ids])
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    jac = float((sigs[x] == sigs[y]).mean())
                    if jac >= jaccard_threshold:
                        out_a.append(int(ids[x]))
                        out_b.append(int(ids[y]))
                        out_j.append(jac)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b,
                             "jaccard_sig": out_j})

    pairs = banded.groupby("part").map_groups(
        pairs_in_part, batch_format="pandas")
    # same pair can surface from several bands → dedup; coalesce first so
    # the tiny pair set doesn't pay a _PAIR_PARTS-wide shuffle
    return (pairs.repartition(4).groupby(["id_a", "id_b"])
            .aggregate(Min("jaccard_sig", alias_name="jaccard_sig")))


def simhash_batch(batch: pa.Table, *, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Adds simhash:int64 and a 16-bit prefix bucket for near-dup grouping."""
    out_h, out_b = [], []
    for t in batch[text_col].to_pylist():
        th = np.array([stable_hash64(w.lower())
                       for w in _WORD_RE.findall(t or "")], dtype=np.int64)
        h = simhash64(th)
        out_h.append(h - (1 << 64) if h >= (1 << 63) else h)  # to int64
        out_b.append(h >> 48)
    return pa.table({
        id_col: batch[id_col],
        "simhash": pa.array(out_h, pa.int64()),
        "sim_bucket": pa.array(out_b, pa.int64()),
    })


def simhash_duplicates(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs whose SimHash Hamming distance ≤ max_hamming, candidate
    generation by 16-bit prefix bucket (documented partitioning assumption:
    near-dups share the prefix; rotate the hash for higher recall)."""
    sh = docs.map_batches(simhash_batch,
                          fn_kwargs={"id_col": id_col, "text_col": text_col},
                          batch_format="pyarrow")
    sh = sh.map_batches(
        lambda t: t.append_column(
            "part", pa.array((t["sim_bucket"].to_numpy(zero_copy_only=False)
                              % _PAIR_PARTS).astype(np.int64))),
        batch_format="pyarrow")

    def pairs_in_part(part: pd.DataFrame) -> pd.DataFrame:
        oa, ob, oh = [], [], []
        for _, g in part.groupby("sim_bucket", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            hs = [int(h) & ((1 << 64) - 1) for h in g["simhash"]]
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    d = hamming64(hs[x], hs[y])
                    if d <= max_hamming and ids[x] != ids[y]:
                        oa.append(int(ids[x])); ob.append(int(ids[y]))
                        oh.append(d)
        return pd.DataFrame({"id_a": oa, "id_b": ob, "hamming": oh})

    return sh.groupby("part").map_groups(pairs_in_part,
                                         batch_format="pandas")


def ngram_jaccard_pairs(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                        text_col: str = "text", shingle_k: int = 3,
                        threshold: float = 0.5,
                        num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT n-gram Jaccard over candidate pairs co-bucketed by their
    smallest shingle hash (documents sharing no shingle can't have J>0, and
    near-dups almost surely share the global min shingle — the partitioning
    assumption this operator relies on)."""
    def keyed(batch: pa.Table) -> pa.Table:
        ids, keys, shs = [], [], []
        id_list = batch[id_col].to_pylist()
        for i, t in zip(id_list, batch[text_col].to_pylist()):
            sh = shingle_hashes(t, shingle_k)
            ids.append(i)
            keys.append(int(sh[0]) % num_buckets if sh.size else -1)
            shs.append(sh.tolist())
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "bucket": pa.array(keys, pa.int64()),
            "shingles": pa.array(shs, pa.list_(pa.int64())),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        oa, ob, oj = [], [], []
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sets = [set(s) for s in g["shingles"]]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                inter = len(sets[x] & sets[y])
                if not inter:
                    continue
                j = inter / len(sets[x] | sets[y])
                if j >= threshold and ids[x] != ids[y]:
                    oa.append(int(ids[x])); ob.append(int(ids[y]))
                    oj.append(j)
        return pd.DataFrame({"id_a": oa, "id_b": ob, "jaccard": oj})

    return (docs.map_batches(keyed, batch_format="pyarrow")
            .groupby("bucket").map_groups(pairs, batch_format="pandas"))


def dedup_pages_by_url(pages: ray.data.Dataset, *,
                       num_partitions: int = 16) -> ray.data.Dataset:
    """D4 (SURVEY.md §2.7): keep ONE row per url — the max ``warc_ts``
    capture, ties broken by sha256(html) — so the byte-identity invariant is
    keyed on a unique url.

    Scale pattern: ONE hash-partitioned shuffle of the full rows (any
    re-keying of the table pays this), then a vectorized winner pick per
    partition — grouping by partition id, not per url, so no per-key Python
    task overhead. Rows per url are few (re-captures), so no salt needed."""
    import hashlib

    def keyed(t: pa.Table) -> pa.Table:
        ts = t["warc_ts"].cast(pa.int64()).to_pylist()
        rk = [f"{x:020d}|{hashlib.sha256(h.as_py()).hexdigest()}"
              for x, h in zip(ts, t["html"])]
        part = pd.util.hash_pandas_object(
            pd.Series(t["url"].to_pandas()), index=False) % num_partitions
        return (t.append_column("rank_key", pa.array(rk, pa.string()))
                .append_column("part", pa.array(part.to_numpy(), pa.int64())))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "rank_key"], ascending=[True, False],
                          kind="mergesort")
        out = g.groupby("url", sort=False).head(1)
        return out.drop(columns=["rank_key", "part"])

    return (pages.map_batches(keyed, batch_format="pyarrow")
            .groupby("part").map_groups(pick, batch_format="pandas"))


def embedding_cosine_duplicates(emb: ray.data.Dataset, *,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.95,
                                num_buckets: int = 8,
                                lsh_seed: int = 7) -> ray.data.Dataset:
    """Near-dup pairs by embedding cosine ≥ threshold; candidates co-bucketed
    by a random-hyperplane LSH sign bucket (log2(num_buckets) hyperplanes —
    Charikar SimHash for angles, public). Exact cosine verified per pair
    inside each bucket with one numpy matmul."""
    n_planes = max(1, int(np.log2(num_buckets)))

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float32)
        rng = np.random.default_rng(lsh_seed)
        planes = rng.normal(size=(vecs.shape[1], n_planes)).astype(np.float32)
        signs = (vecs @ planes) > 0
        bucket = signs @ (1 << np.arange(n_planes))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "bucket": pa.array(bucket.astype(np.int64)),
            "vec": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        v = np.stack([np.asarray(x, dtype=np.float32) for x in g["vec"]])
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sim = v @ v.T
        oa, ob, oc = [], [], []
        xs, ys = np.where(np.triu(sim >= threshold, k=1))
        for x, y in zip(xs, ys):
            if ids[x] != ids[y]:
                oa.append(int(ids[x])); ob.append(int(ids[y]))
                oc.append(float(sim[x, y]))
        return pd.DataFrame({"id_a": oa, "id_b": ob, "cosine": oc})

    return (emb.map_batches(keyed, batch_format="pyarrow")
            .groupby("bucket").map_groups(pairs, batch_format="pandas"))
