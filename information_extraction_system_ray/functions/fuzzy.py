"""Fuzzy (edit-distance) self-join via deletion neighborhoods — the
FastSS / SymSpell blocking scheme (Bocek et al. 2007, public algorithm):
two strings with edit distance <= 1 MUST share a key in
{s} ∪ {s minus one character}, so candidate generation is an exact-recall
hash-partition groupby, never an all-pairs scan.

Distributed plan: each distinct string of length L emits L+1 (key, string)
rows → groupby key (bucket sizes are bounded by how many strings collide
on one deletion variant — vocabulary-shaped, not corpus-shaped) → in-bucket
ordered pairs → global distinct → one vectorized verify pass. Everything
streams; the only shuffles are the key groupby and the pair distinct.

At higher k this generalizes to k-deletion neighborhoods (|keys| ~ L^k);
for k >= 2 prefer the segment-pigeonhole (PassJoin) scheme — documented
here as the scale path, not implemented."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .partitions import default_parts

_PAIR_SCHEMA = pa.schema([("name_a", pa.string()),
                          ("name_b", pa.string())])


def _ed_le_1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check (O(len) two-pointer scan)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # la <= lb; walk to first mismatch, then skip one char
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if i == la:                      # prefix: <=1 trailing insert
        return True
    if la == lb:                     # substitution
        return a[i + 1:] == b[i + 1:]
    return a[i:] == b[i + 1:]        # deletion in the longer string


def fuzzy_pairs_ed1(ds: ray.data.Dataset, col: str, *,
                    num_partitions: "int | None" = None
                    ) -> ray.data.Dataset:
    """All ordered pairs (a < b) of DISTINCT values of ``col`` with edit
    distance <= 1. Output columns: name_a, name_b."""
    num_partitions = num_partitions or default_parts()
    # Dataset-native distinct (no driver materialization): one row per value
    uniq = (ds.select_columns([col]).groupby(col)
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow"))

    def emit(t: pa.Table) -> pa.Table:
        keys, names = [], []
        for s in t[col].to_pylist():
            if s is None:
                continue
            keys.append(s)
            names.append(s)
            for i in range(len(s)):
                keys.append(s[:i] + s[i + 1:])
                names.append(s)
        return pa.table({"k": pa.array(keys, pa.string()),
                         "s": pa.array(names, pa.string())})

    def bucket_pairs(t: pa.Table) -> pa.Table:
        ss = sorted(set(t["s"].to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                a_out.append(ss[i])
                b_out.append(ss[j])
        if not a_out:
            return _PAIR_SCHEMA.empty_table()
        return pa.table({"name_a": pa.array(a_out, pa.string()),
                         "name_b": pa.array(b_out, pa.string())})

    def verify(t: pa.Table) -> pa.Table:
        keep = pa.array([_ed_le_1(a, b) for a, b in
                         zip(t["name_a"].to_pylist(),
                             t["name_b"].to_pylist())], pa.bool_())
        return t.filter(keep)

    cand = (uniq.map_batches(emit, batch_format="pyarrow")
            .groupby("k")
            .map_groups(bucket_pairs, batch_format="pyarrow")
            .groupby(["name_a", "name_b"])
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow"))
    return cand.map_batches(verify, batch_format="pyarrow")
