"""Approximate aggregates (SURVEY.md §2.5 G6): mergeable HyperLogLog
distinct-count sketches (Flajolet et al. 2007, public) and mergeable
SpaceSaving heavy-hitter summaries (Metwally et al. 2005; merge rule from
Agarwal et al., "Mergeable Summaries", 2012 — all public).

Scale pattern: one sketch per (group, batch) built vectorized in numpy
(COMBINER — a batch contributes one 2^p-byte register row per group, never
its row volume), merged associatively through a groupby; the final
registers→estimate step is a tiny map. Deterministic: hashing is
blake2b-seeded, no RNG. Standard error ≈ 1.04/√(2^p) (~1.6% at p=12)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .arrowutil import to_arrow

_P = 12                       # 4096 registers, ~1.6% standard error
_M = 1 << _P


def _hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of a value list (stringified)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out


def _registers(h: np.ndarray) -> np.ndarray:
    """(M,) uint8 register array from 64-bit hashes."""
    reg = np.zeros(_M, dtype=np.uint8)
    if h.size == 0:
        return reg
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = (h << np.uint64(_P)) | np.uint64((1 << _P) - 1)  # sentinel tail
    # rank = leading zeros of the remaining 64-P bits, +1 — exact
    # vectorized scan with an active mask (a value stops counting at its
    # first 1 bit; the sentinel tail bounds the loop)
    lz = np.zeros(h.size, dtype=np.uint8)
    active = np.ones(h.size, dtype=bool)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    for _ in range(64 - _P + 1):
        top_zero = (cur & mask) == 0
        active &= top_zero
        if not active.any():
            break
        lz[active] += 1
        cur = cur << np.uint64(1)
    rank = lz + 1
    np.maximum.at(reg, idx, rank)
    return reg


def _estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction."""
    m = float(_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def approx_distinct_by_key(ds: ray.data.Dataset, key: str, value: str, *,
                           promote_threshold: int = 50_000
                           ) -> ray.data.Dataset:
    """Dataset(key, approx_distinct:int64) — COUNT(DISTINCT value) per key
    via a mergeable SPARSE→DENSE sketch (the same two-regime design as
    production HLLs, e.g. Heule et al. "HyperLogLog in Practice", 2013):

    - **sparse** (≤ ``promote_threshold`` distinct hashes): the sketch IS
      the sorted unique 64-bit hash set, and the answer is EXACT
      (``len(set)``; a 64-bit collision inside one group is the only
      error source — p ≈ n²/2⁶⁵, negligible at the threshold). This is
      the regime every small-scale-factor oracle run lands in, so the
      query compares exactly against SQL ``COUNT(DISTINCT ...)``.
    - **dense** (beyond the threshold): hashes fold into 2^p HLL
      registers (~1.6 % standard error at p=12) and merges stay
      register-wise max — bounded memory at any scale.

    A merge promotes to dense as soon as ANY input is dense or the union
    exceeds the threshold; both representations travel as one tagged
    binary column, so the shuffle is sketch-sized either way."""
    reg_ty = pa.binary()

    def _sketch(h: np.ndarray) -> bytes:
        uniq = np.unique(h)
        if len(uniq) <= promote_threshold:
            return b"S" + uniq.tobytes()
        return b"D" + _registers(uniq).tobytes()

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({key: t[key], value: t[value]}).to_pandas()
        ks, regs = [], []
        for k, g in df.groupby(key, sort=False):
            ks.append(k)
            regs.append(_sketch(_hash64(g[value].tolist())))
        return pa.table({key: pa.array(ks),
                         "reg": pa.array(regs, reg_ty)})

    def merge(g: pd.DataFrame) -> pa.Table:
        ks, est = [], []
        for k, rows in g.groupby(key, sort=False):
            reg = None
            sparse: "list[np.ndarray]" = []
            for b in rows["reg"]:
                b = bytes(b)
                if b[:1] == b"D":
                    r = np.frombuffer(b[1:], dtype=np.uint8)
                    reg = r.copy() if reg is None else np.maximum(reg, r)
                else:
                    sparse.append(np.frombuffer(b[1:], dtype=np.uint64))
            if sparse:
                uniq = np.unique(np.concatenate(sparse))
                if reg is None and len(uniq) <= promote_threshold:
                    ks.append(k)
                    est.append(int(len(uniq)))
                    continue
                r = _registers(uniq)
                reg = r if reg is None else np.maximum(reg, r)
            ks.append(k)
            est.append(int(round(_estimate(reg))))
        out = pd.DataFrame({key: ks, "approx_distinct": est})
        schema = pa.schema([(key, pa.Array.from_pandas(out[key]).type),
                            ("approx_distinct", pa.int64())])
        return to_arrow(out, schema)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(merge, batch_format="pandas"))

# ---------------------------------------------------------------------------
# SpaceSaving heavy hitters
# ---------------------------------------------------------------------------

_SS_MERGE_FAN = 32  # level-1 merge groups; final merge sees <= FAN summaries


def _ss_trim(items: "dict[str, tuple[int, int]]", cap: int,
             floor: int) -> "tuple[dict[str, tuple[int, int]], int]":
    """Keep the top-``cap`` items by (over)count; the largest trimmed count
    becomes the new floor (missing-mass bound future merges must assume)."""
    if len(items) <= cap:
        return items, floor
    ranked = sorted(items.items(), key=lambda kv: (-kv[1][0], kv[0]))
    new_floor = max(floor, ranked[cap][1][0])
    return dict(ranked[:cap]), new_floor


def _ss_merge(summaries, cap: int):
    """Agarwal-style merge. Each input summary guarantees, over the stream
    slice it covers:  count - err <= true <= count  for items it contains,
    and  true <= floor  for items it lacks. The merge pads every item by
    the floors of the summaries that did NOT contain it (count += pad,
    err += pad), preserving both invariants over the union slice; trimming
    raises the output floor to the largest trimmed (padded) count."""
    acc: "dict[str, list[int]]" = {}  # k -> [csum, esum, floor_in]
    floor_total = 0
    for items, floor in summaries:
        floor_total += floor
        for k, (c, e) in items.items():
            a = acc.setdefault(k, [0, 0, 0])
            a[0] += c
            a[1] += e
            a[2] += floor
    merged = {}
    for k, (csum, esum, floor_in) in acc.items():
        pad = floor_total - floor_in
        merged[k] = (csum + pad, esum + pad)
    items, floor = _ss_trim(merged, cap, floor_total)
    return items, floor


def heavy_hitters(ds: ray.data.Dataset, value: str, *, k: int = 10,
                  capacity: int = 256) -> ray.data.Dataset:
    """Approximate top-k most frequent ``value`` items —
    Dataset(item, count_hi:int64, count_lo:int64) sorted by count_hi desc.

    ``count_lo <= true_count <= count_hi`` for every retained item, and any
    item with true frequency > N/capacity is guaranteed retained (the
    SpaceSaving guarantee; per-batch partials are EXACT, so error is
    introduced only by merge trims, bounded by the carried floor).

    Scale: per-batch exact counts truncated to ``capacity`` rows each, a
    fan-in merge tree (``_SS_MERGE_FAN`` level-1 groups), final merge over
    ≤ FAN summaries — the raw stream never shuffles."""
    import json

    cap = capacity

    def partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(t[value].to_pandas()).astype(str).value_counts()
        items = {str(i): (int(c), 0) for i, c in vc.items()}
        items, floor = _ss_trim(items, cap, 0)
        blob = json.dumps({"items": items, "floor": floor})
        g = int(hashlib.blake2b(blob.encode(),
                                digest_size=4).hexdigest(), 16) \
            % _SS_MERGE_FAN
        return pa.table({"g": pa.array([g], pa.int64()),
                         "blob": pa.array([blob], pa.string())})

    def merge_level(g: pd.DataFrame) -> pa.Table:
        summaries = []
        for b in g["blob"]:
            d = json.loads(b)
            summaries.append(
                ({k_: tuple(v) for k_, v in d["items"].items()},
                 d["floor"]))
        items, floor = _ss_merge(summaries, cap)
        blob = json.dumps({"items": items, "floor": floor})
        return pa.table({"g": pa.array([0], pa.int64()),
                         "blob": pa.array([blob], pa.string())})

    def finalize(g: pd.DataFrame) -> pa.Table:
        summaries = []
        for b in g["blob"]:
            d = json.loads(b)
            summaries.append(
                ({k_: tuple(v) for k_, v in d["items"].items()},
                 d["floor"]))
        items, _ = _ss_merge(summaries, cap)
        rows = sorted(((kk, c, max(c - e, 0))
                       for kk, (c, e) in items.items()),
                      key=lambda r: (-r[1], r[0]))[:k]
        return pa.table({
            "item": pa.array([r[0] for r in rows], pa.string()),
            "count_hi": pa.array([r[1] for r in rows], pa.int64()),
            "count_lo": pa.array([r[2] for r in rows], pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("g").map_groups(merge_level, batch_format="pandas")
            .groupby("g").map_groups(finalize, batch_format="pandas"))

# ---------------------------------------------------------------------------
# Approximate quantiles (mergeable weighted-sample summary, MRL-style)
# ---------------------------------------------------------------------------


def _wq_compress(values: np.ndarray, weights: np.ndarray,
                 k: int) -> "tuple[np.ndarray, np.ndarray]":
    """Collapse a weighted multiset to ≤k points at evenly spaced weighted
    ranks (Manku-Rajagopalan-Lindsay collapse, public). Deterministic; each
    collapse adds ≤ W/(2k) rank error."""
    order = np.argsort(values, kind="mergesort")
    values, weights = values[order], weights[order]
    w_total = float(weights.sum())
    if len(values) <= k:
        return values, weights
    cum = np.cumsum(weights) - weights / 2.0  # midpoint ranks
    targets = (np.arange(k) + 0.5) * w_total / k
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(values) - 1)
    out_w = np.full(k, w_total / k)
    return values[idx], out_w


def approx_quantiles(ds: ray.data.Dataset, col: str, qs: "list[float]", *,
                     k: int = 1024) -> pd.DataFrame:
    """DataFrame(q, value) — approximate quantiles of an UNBOUNDED-domain
    numeric column (complement of quantiles.exact_quantiles, which needs
    bounded distinct values). Rank error ≤ ~2N/k over the two collapse
    levels (property-tested).

    Scale: each batch contributes ≤k weighted points; a fan-in merge tree
    (``_SS_MERGE_FAN`` groups) collapses level-1, the driver collapses the
    ≤ FAN×k final points — raw values never shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "value": pa.array([], pa.float64()),
                             "weight": pa.array([], pa.float64())})
        cv, cw = _wq_compress(v, np.ones(v.size), k)
        g = int(hashlib.blake2b(cv.tobytes(),
                                digest_size=4).hexdigest(), 16) \
            % _SS_MERGE_FAN
        return pa.table({"g": pa.array([g] * len(cv), pa.int64()),
                         "value": pa.array(cv, pa.float64()),
                         "weight": pa.array(cw, pa.float64())})

    def merge_level(grp: pd.DataFrame) -> pa.Table:
        cv, cw = _wq_compress(grp["value"].to_numpy(),
                              grp["weight"].to_numpy(), k)
        return pa.table({"value": pa.array(cv, pa.float64()),
                         "weight": pa.array(cw, pa.float64())})

    pts = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("g").map_groups(merge_level, batch_format="pandas")
           .to_pandas())                      # ≤ FAN×k rows on the driver
    values = pts["value"].to_numpy()
    weights = pts["weight"].to_numpy()
    order = np.argsort(values, kind="mergesort")
    values, weights = values[order], weights[order]
    if len(values) == 0:
        return pd.DataFrame([{"q": q, "value": None} for q in qs])
    cum = np.cumsum(weights)
    w_total = cum[-1]
    out = []
    for q in qs:
        i = int(np.searchsorted(cum, q * w_total, side="left"))
        out.append({"q": q, "value": float(values[min(i, len(values) - 1)])})
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, public): mergeable
# frequency estimation. Each batch builds ONE (d x w) counter matrix per
# group (combiner — batch contributes d*w int64 cells, never its row
# volume); matrices merge by elementwise addition (associative, order-free);
# a point query returns min over d rows — an overestimate by at most
# eps * N with probability 1 - delta, where w = ceil(e / eps),
# d = ceil(ln(1 / delta)). Deterministic: row hashes are blake2b-seeded.
# ---------------------------------------------------------------------------

_CM_D = 4                     # delta ≈ e^-4 ≈ 1.8%
_CM_W = 1024                  # eps ≈ e / 1024 ≈ 0.27%


def _cm_hash(values, row: int) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.blake2b(str(v).encode(), digest_size=8,
                            salt=b"cm%05d" % row).digest()
        out[i] = int.from_bytes(h, "little")
    return out % _CM_W


def _cm_build(values) -> np.ndarray:
    """One (d*w,) int64 counter vector for a value list."""
    mat = np.zeros((_CM_D, _CM_W), np.int64)
    for r in range(_CM_D):
        np.add.at(mat[r], _cm_hash(values, r), 1)
    return mat.ravel()


def cm_sketch(ds: ray.data.Dataset, value: str) -> np.ndarray:
    """Global Count-Min counter matrix (d, w) for ``value`` — built as one
    partial vector per batch, merged by a Sum aggregate (shuffle volume =
    d*w ints per batch, never rows)."""

    def partial(t: pa.Table) -> pa.Table:
        vec = _cm_build(t[value].to_pylist())
        n = len(vec)
        return pa.table({
            "cell": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "cnt": pa.array(vec, pa.int64()),
        })

    from ray.data.aggregate import Sum
    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("cnt", alias_name="cnt")))
    df = merged.to_pandas().sort_values("cell")
    full = np.zeros(_CM_D * _CM_W, np.int64)
    full[df["cell"].to_numpy()] = df["cnt"].to_numpy()
    return full.reshape(_CM_D, _CM_W)


def cm_query(mat: np.ndarray, value) -> int:
    """Point-frequency estimate: min over the d hashed cells."""
    return int(min(mat[r, int(_cm_hash([value], r)[0])]
                   for r in range(_CM_D)))
