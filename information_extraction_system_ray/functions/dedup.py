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
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

from .arrowutil import to_arrow
from .hashing import (hamming64, minhash_permutations, minhash_signature,
                      simhash64, stable_hash64)
from .partitions import default_parts
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


# pair-bucket co-location width is cluster-derived (functions/partitions.py),
# resolved once at operator build time on the driver


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

    Signature transport (fully streaming — nothing ever lands on the
    driver): only skinny (id, band, bucket) rows pay the wide LSH shuffle;
    candidate PAIRS come out of that shuffle sig-free and are deduplicated
    across bands. Full signatures are then attached to the (tiny) candidate
    set by a co-partitioned union+groupby on member id — each signature
    ships once per candidate membership, never ×bands and never as a
    whole-corpus broadcast — and a final pair-keyed pass computes the
    estimator. Scales to corpora where the signature table alone exceeds
    any single node."""
    rows_per_band = num_perm // bands
    pair_parts = default_parts()
    a, b = minhash_permutations(num_perm)
    sig_ty = pa.list_(pa.int64())

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = [minhash_signature(shingle_hashes(t, shingle_k), a, b)
                .astype(np.int64)
                for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], sig_ty),
        })

    # materialized in the OBJECT STORE (spillable), not the driver — it is
    # consumed twice (banding + signature attach) and shingling is the
    # expensive part
    sig_ds = docs.map_batches(sig_batch,
                              batch_format="pyarrow").materialize()

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
            "part": pa.array([b % pair_parts for b in out_bucket],
                             pa.int64()),
        })

    banded = sig_ds.select_columns([id_col, "sig"]).map_batches(
        band_batch, batch_format="pyarrow")

    cand_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def cands_in_part(part: pd.DataFrame) -> pa.Table:
        # singleton buckets are the overwhelming majority — drop them with
        # one vectorized mask instead of iterating every group in Python
        part = part[part.duplicated(["band", "bucket"], keep=False)]
        oa, ob = [], []
        for _, g in part.groupby(["band", "bucket"], sort=False):
            ids = np.sort(g[id_col].unique())
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    oa.append(int(ids[x]))
                    ob.append(int(ids[y]))
        return to_arrow(pd.DataFrame({"id_a": oa, "id_b": ob}), cand_schema)

    # dedup candidates ACROSS bands before any signature moves; coalesce
    # first so the tiny pair set doesn't pay a pair_parts-wide shuffle
    cand = (banded.groupby("part")
            .map_groups(cands_in_part, batch_format="pandas")
            .repartition(4)
            .groupby(["id_a", "id_b"]).aggregate(Count(alias_name="_nb"))
            .select_columns(["id_a", "id_b"]))

    # ---- signature attach: union(members, sigs) co-partitioned on the
    # member id — the join Ray Data can't express without aggregator actors
    mem_schema = pa.schema([("mid", pa.int64()), ("id_a", pa.int64()),
                            ("id_b", pa.int64()), ("sig", sig_ty),
                            ("part", pa.int64())])

    def explode_members(t: pa.Table) -> pa.Table:
        ia = t["id_a"].to_numpy(zero_copy_only=False)
        ib = t["id_b"].to_numpy(zero_copy_only=False)
        mids = np.concatenate([ia, ib])
        return pa.table({
            "mid": pa.array(mids, pa.int64()),
            "id_a": pa.array(np.concatenate([ia, ia]), pa.int64()),
            "id_b": pa.array(np.concatenate([ib, ib]), pa.int64()),
            "sig": pa.nulls(2 * len(t), sig_ty),
            "part": pa.array(mids % pair_parts, pa.int64()),
        }).cast(mem_schema)

    def tag_sigs(t: pa.Table) -> pa.Table:
        n = len(t)
        mids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "mid": pa.array(mids, pa.int64()),
            "id_a": pa.nulls(n, pa.int64()),
            "id_b": pa.nulls(n, pa.int64()),
            "sig": t["sig"],
            "part": pa.array(mids % pair_parts, pa.int64()),
        }).cast(mem_schema)

    att_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("mid", pa.int64()), ("sig", sig_ty),
                            ("part", pa.int64())])

    def attach(part: pa.Table) -> pa.Table:
        is_sig = pc.is_null(part["id_a"])
        sigs = part.filter(is_sig)
        mems = part.filter(pc.invert(is_sig))
        if mems.num_rows == 0:
            return att_schema.empty_table()
        # only this partition's own signatures — never the whole corpus
        lut = dict(zip(sigs["mid"].to_pylist(), sigs["sig"].to_pylist()))
        mid = mems["mid"].to_pylist()
        ia = mems["id_a"].to_numpy(zero_copy_only=False)
        ib = mems["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "mid": mems["mid"],
            "sig": pa.array([lut.get(m) for m in mid], sig_ty),
            "part": pa.array((ia ^ ib) % pair_parts, pa.int64()),
        }).cast(att_schema)

    attached = (cand.map_batches(explode_members, batch_format="pyarrow")
                .union(sig_ds.map_batches(tag_sigs, batch_format="pyarrow"))
                .groupby("part")
                .map_groups(attach, batch_format="pyarrow"))

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                             ("jaccard_sig", pa.float64())])

    def verify(part: pd.DataFrame) -> pa.Table:
        oa, ob, oj = [], [], []
        for (pa_id, pb_id), g in part.groupby(["id_a", "id_b"], sort=False):
            by_mid = {int(m): np.asarray(s, dtype=np.int64)
                      for m, s in zip(g["mid"], g["sig"]) if s is not None}
            sa, sb = by_mid.get(int(pa_id)), by_mid.get(int(pb_id))
            if sa is None or sb is None:
                continue
            jac = float((sa == sb).mean())
            if jac >= jaccard_threshold:
                oa.append(int(pa_id)); ob.append(int(pb_id)); oj.append(jac)
        return to_arrow(pd.DataFrame({"id_a": oa, "id_b": ob,
                                      "jaccard_sig": oj}), pair_schema)

    return (attached.groupby("part")
            .map_groups(verify, batch_format="pandas"))


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


_SIMHASH_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                  ("hamming", pa.int64())])


def simhash_duplicates(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_hamming: int = 3,
                       num_tables: int = 4) -> ray.data.Dataset:
    """Near-dup pairs whose SimHash Hamming distance ≤ max_hamming.

    Candidate generation uses ``num_tables`` block tables (Manku et al.,
    WWW'07 block-permutation scheme, public): the 64-bit hash is split into
    ``num_tables`` contiguous blocks and a pair is a candidate if ANY block
    matches. By pigeonhole, a pair at Hamming distance d < num_tables has
    ≥1 untouched block — so recall is EXACT (100%) for
    max_hamming ≤ num_tables − 1 with the default 4 tables.

    Cross-table dedup is local (no extra shuffle): a pair found in table t
    is emitted only if no earlier table s < t also matched — decidable from
    the two hashes carried on the rows. Shuffle cost is num_tables skinny
    (id, hash, block) rows per doc."""
    bits_per = 64 // num_tables
    mask = (1 << bits_per) - 1
    pair_parts = default_parts()

    sh = docs.map_batches(simhash_batch,
                          fn_kwargs={"id_col": id_col, "text_col": text_col},
                          batch_format="pyarrow")

    def banded(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hs = t["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        out_id, out_h, out_tbl, out_blk = [], [], [], []
        for tbl in range(num_tables):
            blk = (hs >> np.uint64(bits_per * tbl)) & np.uint64(mask)
            out_id.append(ids)
            out_h.append(hs.view(np.int64))
            out_tbl.append(np.full(len(ids), tbl, dtype=np.int64))
            out_blk.append(blk.view(np.int64))
        tbl_a = np.concatenate(out_tbl)
        blk_a = np.concatenate(out_blk)
        # same (table, block) → same partition
        part = ((tbl_a << bits_per) | blk_a) % pair_parts
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "simhash": pa.array(np.concatenate(out_h), pa.int64()),
            "tbl": pa.array(tbl_a, pa.int64()),
            "blk": pa.array(blk_a, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def pairs_in_part(part: pd.DataFrame) -> pa.Table:
        oa, ob, oh = [], [], []
        part = part[part.duplicated(["tbl", "blk"], keep=False)]
        for (tbl, _), g in part.groupby(["tbl", "blk"], sort=False):
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            hs = [int(h) & ((1 << 64) - 1) for h in g["simhash"]]
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    if ids[x] == ids[y]:
                        continue
                    d = hamming64(hs[x], hs[y])
                    if d > max_hamming:
                        continue
                    # cross-table dedup: an earlier table already emitted it
                    if any(((hs[x] >> (bits_per * s)) & mask) ==
                           ((hs[y] >> (bits_per * s)) & mask)
                           for s in range(tbl)):
                        continue
                    oa.append(int(ids[x])); ob.append(int(ids[y]))
                    oh.append(d)
        return to_arrow(pd.DataFrame({"id_a": oa, "id_b": ob,
                                      "hamming": oh}), _SIMHASH_PAIR_SCHEMA)

    return (sh.map_batches(banded, batch_format="pyarrow")
            .groupby("part")
            .map_groups(pairs_in_part, batch_format="pandas"))


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

    jac_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("jaccard", pa.float64())])

    def pairs(g: pd.DataFrame) -> pa.Table:
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
        return to_arrow(pd.DataFrame({"id_a": oa, "id_b": ob, "jaccard": oj}),
                        jac_schema)

    return (docs.map_batches(keyed, batch_format="pyarrow")
            .groupby("bucket").map_groups(pairs, batch_format="pandas"))


def dedup_pages_by_url(pages: ray.data.Dataset, *,
                       num_partitions: "int | None" = None
                       ) -> ray.data.Dataset:
    """D4 (SURVEY.md §2.7): keep ONE row per url — the max ``warc_ts``
    capture, ties broken by sha256(html) — so the byte-identity invariant is
    keyed on a unique url.

    Scale pattern: ONE hash-partitioned shuffle of the full rows (any
    re-keying of the table pays this), then a vectorized winner pick per
    partition — grouping by partition id, not per url, so no per-key Python
    task overhead. Rows per url are few (re-captures), so no salt needed."""
    import hashlib

    num_partitions = num_partitions or default_parts()

    def keyed(t: pa.Table) -> pa.Table:
        ts = t["warc_ts"].cast(pa.int64()).to_pylist()
        rk = [f"{x:020d}|{hashlib.sha256(h.as_py()).hexdigest()}"
              for x, h in zip(ts, t["html"])]
        part = pd.util.hash_pandas_object(
            pd.Series(t["url"].to_pandas()), index=False) % num_partitions
        return (t.append_column("rank_key", pa.array(rk, pa.string()))
                .append_column("part", pa.array(part.to_numpy(), pa.int64())))

    # output re-emits ARROW with the INPUT schema pinned — the pandas
    # round-trip would otherwise widen warc_ts us→ns and hand pandas
    # blocks to every downstream stage (the r4 AllToAll poisoning)
    base = pa.schema([f for f in pages.schema().base_schema])

    def pick(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["url", "rank_key"], ascending=[True, False],
                          kind="mergesort")
        out = g.groupby("url", sort=False).head(1) \
            .drop(columns=["rank_key", "part"])
        return to_arrow(out, base)

    return (pages.map_batches(keyed, batch_format="pyarrow")
            .groupby("part").map_groups(pick, batch_format="pandas"))


_COS_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                              ("cosine", pa.float64())])


def _lsh_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return (np.random.default_rng(seed)
            .normal(size=(dim, n_planes)).astype(np.float32))


def embedding_cosine_duplicates(emb: ray.data.Dataset, *,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                threshold: float = 0.95,
                                num_buckets: int = 8,
                                lsh_seed: int = 7,
                                num_tables: int = 2) -> ray.data.Dataset:
    """Near-dup pairs by embedding cosine ≥ threshold; candidates co-bucketed
    by random-hyperplane LSH sign buckets (log2(num_buckets) hyperplanes —
    Charikar SimHash for angles, public). Exact cosine verified per pair
    inside each bucket with one numpy matmul.

    Multi-probe via ``num_tables`` independent hyperplane tables (different
    seeds): a pair missed by one table's sign split (miss prob per plane ≈
    θ/π) is caught by another — recall 1−(miss)^num_tables. Cross-table
    dedup is local: table t emits a pair only if no earlier table s < t
    co-bucketed it (recomputed from the vectors carried on the rows; no
    extra shuffle). Shuffle cost is num_tables copies of each vector —
    bound num_tables by vector width at scale."""
    n_planes = max(1, int(np.log2(num_buckets)))

    def keyed(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float32)
        weights = (1 << np.arange(n_planes))
        out_id, out_tbl, out_bkt, out_vec = [], [], [], []
        for tbl in range(num_tables):
            planes = _lsh_planes(vecs.shape[1], n_planes, lsh_seed + tbl)
            bucket = ((vecs @ planes) > 0) @ weights
            out_id.append(ids)
            out_tbl.append(np.full(len(ids), tbl, dtype=np.int64))
            out_bkt.append(bucket.astype(np.int64))
            out_vec.append(vecs)
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "tbl": pa.array(np.concatenate(out_tbl), pa.int64()),
            "bucket": pa.array(np.concatenate(out_bkt), pa.int64()),
            "vec": pa.array(np.concatenate(out_vec).tolist(),
                            pa.list_(pa.float32())),
        })

    def pairs(g: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        if len(g) < 2:
            return to_arrow(empty, _COS_PAIR_SCHEMA)
        tbl = int(g["tbl"].iloc[0])
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        v = np.stack([np.asarray(x, dtype=np.float32) for x in g["vec"]])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sim = vn @ vn.T
        # earlier tables' buckets for cross-table dedup (local recompute)
        prev = [(((v @ _lsh_planes(v.shape[1], n_planes, lsh_seed + s)) > 0)
                 @ (1 << np.arange(n_planes))) for s in range(tbl)]
        oa, ob, oc = [], [], []
        xs, ys = np.where(np.triu(sim >= threshold, k=1))
        for x, y in zip(xs, ys):
            if ids[x] == ids[y]:
                continue
            if any(p[x] == p[y] for p in prev):
                continue
            oa.append(int(ids[x])); ob.append(int(ids[y]))
            oc.append(float(sim[x, y]))
        return to_arrow(pd.DataFrame({"id_a": oa, "id_b": ob, "cosine": oc}),
                        _COS_PAIR_SCHEMA)

    return (emb.map_batches(keyed, batch_format="pyarrow")
            .groupby(["tbl", "bucket"])
            .map_groups(pairs, batch_format="pandas"))


def contamination_flags(docs: ray.data.Dataset, ref: ray.data.Dataset, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        shingle_k: int = 8,
                        num_partitions: "int | None" = None
                        ) -> ray.data.Dataset:
    """Benchmark decontamination: Dataset(id_col) of docs sharing >= 1
    word ``shingle_k``-gram with the reference corpus — the standard
    n-gram-overlap contamination check run before training on web text.

    Scale shape: both sides explode to (shingle-hash[, id]) rows — the
    honest cost of any n-gram index — then co-partition by hash(shingle)
    so membership is a per-partition set probe against ONLY that
    partition's slice of the reference index; no side is ever broadcast
    or driver-materialized. A doc appears once per matching partition;
    a final distinct-by-id groupby dedups. Matched-side volume is pruned
    per batch by emitting each (shingle, doc) pair once."""
    nparts = num_partitions or default_parts()

    ref_schema = pa.schema([("h", pa.int64()), (id_col, pa.int64()),
                            ("part", pa.int64()), ("side", pa.int8())])

    def _explode(t: pa.Table, side: int) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        hs, out_ids = [], []
        for i, tx in zip(ids, texts):
            sh = shingle_hashes(tx, shingle_k)   # already distinct
            hs.append(sh)
            out_ids.append(np.full(len(sh), i, np.int64))
        h = (np.concatenate(hs) if hs else np.empty(0, np.int64))
        d = (np.concatenate(out_ids) if out_ids
             else np.empty(0, np.int64))
        part = (h % nparts + nparts) % nparts
        return pa.table({
            "h": pa.array(h, pa.int64()),
            id_col: pa.array(d, pa.int64()),
            "part": pa.array(part, pa.int64()),
            "side": pa.array(np.full(len(h), side, np.int8), pa.int8()),
        }).cast(ref_schema)

    tagged = (docs.map_batches(lambda t: _explode(t, 0),
                               batch_format="pyarrow")
              .union(ref.map_batches(lambda t: _explode(t, 1),
                                     batch_format="pyarrow")))

    hit_schema = pa.schema([(id_col, pa.int64())])

    def probe(part: pa.Table) -> pa.Table:
        d = part.filter(pc.equal(part["side"], 0))
        r = part.filter(pc.equal(part["side"], 1))
        if d.num_rows == 0 or r.num_rows == 0:
            return hit_schema.empty_table()
        rset = set(r["h"].to_pylist())
        mask = np.fromiter((h in rset for h in d["h"].to_pylist()),
                           bool, d.num_rows)
        hit = np.unique(d[id_col].to_numpy(zero_copy_only=False)[mask])
        return pa.table({id_col: pa.array(hit, pa.int64())}) \
            .cast(hit_schema)

    hits = tagged.groupby("part").map_groups(probe,
                                             batch_format="pyarrow")
    return (hits.groupby(id_col)
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow"))


def semantic_dedup(emb: ray.data.Dataset, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", k: int = 8,
                   iters: int = 3, threshold: float = 0.95
                   ) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): k-means-bucket the embedding space, then inside each cluster
    greedily keep the lowest-id member of every cosine>=threshold
    neighborhood. Returns Dataset(id_col) of survivors.

    Scale shape: the O(n^2) cosine step runs per CLUSTER (n/k rows), so k
    is the knob that caps partition-local work; the kmeans stage shuffles
    only k x dim partial rows per iteration (functions/vectors.kmeans).
    Known recall caveat (shared with IVF): a near-dup pair split across a
    cluster boundary is missed — mitigate with larger k + multi-probe
    assignment, not a global pair scan."""
    from .vectors import kmeans

    cents, _ = kmeans(emb, vec_col=vec_col, id_col=id_col, k=k,
                      iters=iters)
    cref = ray.put(cents)

    mem_schema = pa.schema([(id_col, pa.int64()), ("cluster", pa.int64()),
                            ("vec", pa.list_(pa.float32()))])

    def assign(t: pa.Table) -> pa.Table:
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        n = len(t)
        if n == 0 or len(flat) == 0:
            return mem_schema.empty_table()
        d = len(flat) // n
        mat = np.round(flat.astype(np.float64) * 1e6).reshape(n, d)
        c = ray.get(cref)
        d2 = -2.0 * mat @ c.T + (c * c).sum(axis=1)[None, :]
        codes = np.argmin(d2, axis=1).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(codes, pa.int64()),
            "vec": vecs.cast(pa.list_(pa.float32())),
        }).cast(mem_schema)

    out_schema = pa.schema([(id_col, pa.int64())])

    def dedup_cluster(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        v = np.stack([np.asarray(x, dtype=np.float32) for x in g["vec"]])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True),
                            1e-12)
        sim = vn @ vn.T
        kept: "list[int]" = []
        for i in range(len(ids)):
            if all(sim[i, j] < threshold for j in kept):
                kept.append(i)
        return pa.table({id_col: pa.array(ids[kept], pa.int64())}) \
            .cast(out_schema)

    return (emb.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(dedup_cluster, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
# MOSS algorithm): guaranteed detection of shared substrings ≥ w+k−1 chars
# ---------------------------------------------------------------------------

_WINNOW_BASE = np.uint64(1_000_003)
_WINNOW_K = 8          # k-gram length (chars)
_WINNOW_W = 4          # winnowing window (hashes)


def winnow_fingerprints(text: str, *, k: int = _WINNOW_K,
                        w: int = _WINNOW_W) -> np.ndarray:
    """Sorted unique winnowed fingerprints of ``text``: polynomial
    rolling hashes (base 1000003, mod 2^64 wraparound — deterministic
    everywhere) over lowercase whitespace-collapsed chars, then the
    RIGHTMOST minimal hash per w-window. Fully vectorized: the k-gram
    hash matrix and the window minimum are both sliding_window_view
    kernels; no per-char Python. Winnowing's guarantee: any substring
    match of length ≥ w+k−1 shares at least one fingerprint."""
    norm = " ".join(text.lower().split())
    b = np.frombuffer(norm.encode(), dtype=np.uint8)
    if len(b) < k:
        return np.empty(0, np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    grams = sliding_window_view(b, k).astype(np.uint64)
    powers = _WINNOW_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    h = (grams * powers).sum(axis=1, dtype=np.uint64)
    if len(h) < w:
        return np.unique(h[[int(np.flatnonzero(
            h == h.min())[-1])]])
    wins = sliding_window_view(h, w)
    # rightmost minimum: argmin over the REVERSED window
    right_argmin = w - 1 - np.argmin(wins[:, ::-1], axis=1)
    picked = right_argmin + np.arange(len(wins))
    return np.unique(h[np.unique(picked)])


_HAMMING_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()),
                                  ("id_b", pa.int64()),
                                  ("hamming", pa.int64())])


def hamming_pairs_banded(ds: ray.data.Dataset, *, id_col: str,
                         hash_col: str, max_hamming: int = 3,
                         num_tables: int = 4) -> ray.data.Dataset:
    """Generic near-dup pairs over ANY precomputed int64 hash column at
    Hamming distance ≤ ``max_hamming`` — the Manku block-permutation
    candidate scheme simhash_duplicates uses, factored out so other
    64-bit fingerprints (image pHash, audio chromaprints) get the same
    EXACT-recall guarantee (pigeonhole: d < num_tables ⇒ ≥1 untouched
    block). Shuffle cost: num_tables skinny rows per item; cross-table
    dedup is local (decidable from the two hashes on the rows)."""
    from .hashing import hamming64

    bits_per = 64 // num_tables
    mask = (1 << bits_per) - 1
    pair_parts = default_parts()

    def banded(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hs = t[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        out_id, out_h, out_tbl, out_blk = [], [], [], []
        for tbl in range(num_tables):
            blk = (hs >> np.uint64(bits_per * tbl)) & np.uint64(mask)
            out_id.append(ids)
            out_h.append(hs.view(np.int64))
            out_tbl.append(np.full(len(ids), tbl, dtype=np.int64))
            out_blk.append(blk.view(np.int64))
        tbl_a = np.concatenate(out_tbl)
        blk_a = np.concatenate(out_blk)
        part = ((tbl_a << bits_per) | blk_a) % pair_parts
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "h": pa.array(np.concatenate(out_h), pa.int64()),
            "tbl": pa.array(tbl_a, pa.int64()),
            "blk": pa.array(blk_a, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    def pairs_in_part(part: pd.DataFrame) -> pa.Table:
        oa, ob, oh = [], [], []
        part = part[part.duplicated(["tbl", "blk"], keep=False)]
        for (tbl, _), g in part.groupby(["tbl", "blk"], sort=False):
            g = g.sort_values(id_col)
            ids = g[id_col].to_numpy()
            hs = [int(h) & ((1 << 64) - 1) for h in g["h"]]
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    if ids[x] == ids[y]:
                        continue
                    d = hamming64(hs[x], hs[y])
                    if d > max_hamming:
                        continue
                    if any(((hs[x] >> (bits_per * s)) & mask) ==
                           ((hs[y] >> (bits_per * s)) & mask)
                           for s in range(tbl)):
                        continue
                    oa.append(int(ids[x])); ob.append(int(ids[y]))
                    oh.append(d)
        return to_arrow(pd.DataFrame({"id_a": oa, "id_b": ob,
                                      "hamming": oh}),
                        _HAMMING_PAIR_SCHEMA)

    return (ds.map_batches(banded, batch_format="pyarrow")
            .groupby("part")
            .map_groups(pairs_in_part, batch_format="pandas"))
