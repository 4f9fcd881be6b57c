"""Salted two-phase aggregation — head-key skew defusal (SURVEY.md §4).

A hot key ("wikipedia.org"-scale hub) lands on ONE reducer in a plain
groupby. Salting splits each key into S sub-keys for phase 1 (bounding any
reducer's input to ~1/S of the hot key), then a second groupby over the ≤S
partial rows per key restores exact semantics — valid for any associative,
commutative aggregate. tests/test_dedup.py proves salted == unsalted.

The flagship's canonicalization defuses the same skew earlier (per-batch
partial dedup collapses hot pairs before any shuffle); this utility is the
general-purpose form for aggregates that cannot pre-collapse.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def salted_group_sum(ds: ray.data.Dataset, key: str, *,
                     value: str | None = None,
                     num_salts: int = 16) -> ray.data.Dataset:
    """groupby(key) → (n, sum_<value>) computed via salted two-phase
    shuffle. Output columns: key, n[, sum_<value>] — identical to the
    unsalted groupby."""
    aggs1 = [Count(alias_name="n")]
    aggs2 = [Sum("n", alias_name="n")]
    if value is not None:
        aggs1.append(Sum(value, alias_name=f"sum_{value}"))
        aggs2.append(Sum(f"sum_{value}", alias_name=f"sum_{value}"))

    def add_salt(t: pa.Table) -> pa.Table:
        # deterministic positional salt (never RNG: reruns must agree); the
        # RESULT is salt-layout-independent because phase 2 merges all salts
        salt = pa.array(np.arange(len(t)) % num_salts, pa.int64())
        return t.append_column("salt", salt)

    phase1 = (ds.map_batches(add_salt, batch_format="pyarrow")
              .groupby([key, "salt"]).aggregate(*aggs1))
    return (phase1.groupby(key).aggregate(*aggs2))


def salted_join(probe: ray.data.Dataset, build: ray.data.Dataset, *,
                probe_key: str, build_key: str,
                build_cols: "list[str] | None" = None,
                num_salts: int = 16,
                num_partitions: "int | None" = None) -> ray.data.Dataset:
    """Inner equi-join immune to PROBE-side hot keys: a plain hash join
    sends every row of a hot key ("wikipedia.org") to one reducer; here
    each probe row gets a deterministic positional salt and each build
    row is replicated across all ``num_salts`` sub-keys, so a hot key's
    probe rows spread over ``num_salts`` reducers while the (small)
    build side pays ×S duplication — the classic skew-join trade. The
    result is salt-layout-independent (every probe row meets its build
    rows exactly once). Co-partitioned union+groupby, no aggregator
    actors; build rows carry only ``build_cols``."""
    import pandas as pd

    from .partitions import default_parts

    nparts = num_partitions or default_parts()
    pschema = probe.schema().base_schema
    pnames = list(pschema.names)
    bschema = build.schema().base_schema
    bcols = build_cols if build_cols is not None \
        else [c for c in bschema.names if c != build_key]

    mem = pa.schema(
        [(n, pschema.field(n).type) for n in pnames]
        + [(f"_b_{c}", bschema.field(c).type) for c in bcols]
        + [("_bkey", bschema.field(build_key).type),
           ("_salt", pa.int64()),
           ("_side", pa.int8()), ("_part", pa.int64())])
    out_schema = pa.schema(
        [(n, pschema.field(n).type) for n in pnames]
        + [(c, bschema.field(c).type) for c in bcols])

    def _part_of(keys: pd.Series, salts: np.ndarray) -> np.ndarray:
        import pandas as _pd
        h = _pd.util.hash_pandas_object(keys, index=False).to_numpy()
        return ((h ^ (salts.astype(np.uint64) * 0x9E3779B97F4A7C15))
                % np.uint64(nparts)).astype(np.int64)

    def tag_probe(t: pa.Table) -> pa.Table:
        n = len(t)
        salt = np.arange(n) % num_salts  # deterministic, never RNG
        cols = {c: t[c] for c in pnames}
        for c in bcols:
            cols[f"_b_{c}"] = pa.nulls(n, bschema.field(c).type)
        cols["_bkey"] = pa.nulls(n, bschema.field(build_key).type)
        cols["_salt"] = pa.array(salt.astype(np.int64), pa.int64())
        cols["_side"] = pa.array(np.zeros(n, np.int8), pa.int8())
        cols["_part"] = pa.array(
            _part_of(pd.Series(t[probe_key].to_pandas()), salt), pa.int64())
        return pa.table(cols).cast(mem)

    def tag_build(t: pa.Table) -> pa.Table:
        n = len(t)
        idx = np.repeat(np.arange(n), num_salts)
        salt = np.tile(np.arange(num_salts), n)
        keys = pd.Series(t[build_key].to_pandas()).iloc[idx]
        cols = {}
        for c in pnames:
            cols[c] = pa.nulls(len(idx), pschema.field(c).type)
        for c in bcols:
            cols[f"_b_{c}"] = pa.array(
                pd.Series(t[c].to_pandas()).iloc[idx].to_numpy())
        cols["_bkey"] = pa.array(keys.to_numpy())
        cols["_salt"] = pa.array(salt.astype(np.int64), pa.int64())
        cols["_side"] = pa.array(np.ones(len(idx), np.int8), pa.int8())
        cols["_part"] = pa.array(_part_of(keys, salt), pa.int64())
        return pa.table(cols).cast(mem)

    def merge(g: pd.DataFrame) -> pa.Table:
        from .arrowutil import to_arrow

        pr = g[g["_side"] == 0]
        bd = g[g["_side"] == 1]
        if not len(pr) or not len(bd):
            return out_schema.empty_table()
        # join on (key, salt): two salts of one key can hash to the same
        # partition, and key-only matching would then double-join them
        right = bd[["_bkey", "_salt"] + [f"_b_{c}" for c in bcols]].rename(
            columns={f"_b_{c}": c for c in bcols})
        out = pr[pnames + ["_salt"]].merge(
            right, how="inner",
            left_on=[probe_key, "_salt"], right_on=["_bkey", "_salt"])
        return to_arrow(out[pnames + bcols], out_schema)

    return (probe.map_batches(tag_probe, batch_format="pyarrow")
            .union(build.map_batches(tag_build, batch_format="pyarrow"))
            .groupby("_part").map_groups(merge, batch_format="pandas"))
