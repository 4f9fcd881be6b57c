"""Stable hashing kernels (no xxhash/mmh3 in-sandbox — SURVEY.md §0).

Everything is deterministic and process-independent (no PYTHONHASHSEED
dependence): crc32/md5/sha256 from the stdlib, vectorized where the input is
a numpy int array. Used for partition keys, salted groupbys, fingerprints,
MinHash and SimHash.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

MERSENNE = (1 << 61) - 1


def crc32_str(s: str) -> int:
    return zlib.crc32(s.encode())


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def sha256_bytes(s: str) -> bytes:
    return hashlib.sha256(s.encode()).digest()


def stable_hash64(s: str) -> int:
    """64-bit stable hash (first 8 bytes of md5, big-endian, masked to 63
    bits so it fits signed int64)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") \
        & ((1 << 63) - 1)


def minhash_permutations(num_perm: int, seed: int = 1) -> tuple[np.ndarray,
                                                                np.ndarray]:
    """(a, b) coefficient vectors for h_i(x) = (a_i*x + b_i) mod p —
    the standard universal-hash MinHash family (Broder 1997, public)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """MinHash signature of a set of 64-bit shingle hashes; (num_perm,)
    uint64. Empty input → all MERSENNE (matches nothing)."""
    if shingle_hashes.size == 0:
        return np.full(a.shape[0], MERSENNE, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[:, None]
    hv = (x * a.astype(np.uint64) + b.astype(np.uint64)) % np.uint64(MERSENNE)
    return hv.min(axis=0)


def simhash64(token_hashes: np.ndarray,
              weights: np.ndarray | None = None) -> int:
    """64-bit SimHash (Charikar 2002, public) of token hash multiset."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes.astype(np.uint64)[:, None] >>
             np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    w = weights if weights is not None else np.ones(len(token_hashes))
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    v = (score > 0).astype(np.uint64)
    return int((v << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
