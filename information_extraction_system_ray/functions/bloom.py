"""Mergeable Bloom filter — the join pre-filter that cuts shuffle volume
(Bloom 1970, public): build a bit array over the PROBE side's keys with a
per-batch combiner (bit arrays OR-merge associatively), broadcast the final
array once via ``ray.put`` (m/8 bytes regardless of key count), and drop
non-matching build-side rows BEFORE they pay the membership shuffle. No
false negatives ⇒ composing with an exact filter preserves semantics
exactly; false positives only cost wasted shuffle rows (rate ≈
(1 − e^{−kn/m})^k)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_K = 4                      # hash functions


def _positions(values, m: int) -> np.ndarray:
    """(n, _K) bit positions; two blake2b-derived 64-bit hashes combined as
    h1 + i·h2 (Kirsch–Mitzenmacher, public)."""
    out = np.empty((len(values), _K), dtype=np.int64)
    for r, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode(), digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        for i in range(_K):
            out[r, i] = (h1 + i * h2) % m
    return out


def build_bloom(keys: ray.data.Dataset, col: str, *,
                num_bits: int = 1 << 20) -> np.ndarray:
    """uint8 bit array over keys[col]; built with per-batch partial arrays
    OR-merged on the driver (each partial is num_bits/8 bytes — constant,
    never key-count-sized)."""
    m = num_bits

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m // 8, dtype=np.uint8)
        vals = pd.unique(pd.Series(t[col].to_pandas()))
        if len(vals):
            pos = _positions(list(vals), m).ravel()
            np.bitwise_or.at(bits, pos // 8,
                             (1 << (pos % 8)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    acc = np.zeros(m // 8, dtype=np.uint8)
    for b in keys.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for payload in b["bits"].to_pylist():
            acc |= np.frombuffer(payload, dtype=np.uint8)
    return acc


def bloom_contains(bits: np.ndarray, values) -> np.ndarray:
    """Vectorized membership mask (True may be a false positive; False is
    definite)."""
    m = bits.size * 8
    pos = _positions(list(values), m)
    byte = bits[pos // 8]
    hit = (byte >> (pos % 8).astype(np.uint8)) & 1
    return hit.all(axis=1).astype(bool)


def bloom_prefilter(ds: ray.data.Dataset, bits_ref, col: str
                    ) -> ray.data.Dataset:
    """Drop rows whose key is DEFINITELY absent from the bloom (broadcast
    once via ``ray.put``; read zero-copy per batch)."""
    def filt(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref) if isinstance(bits_ref, ray.ObjectRef) \
            else bits_ref
        vals = t[col].to_pylist()
        if not vals:
            return t
        return t.filter(pa.array(bloom_contains(bits, vals)))

    return ds.map_batches(filt, batch_format="pyarrow")
