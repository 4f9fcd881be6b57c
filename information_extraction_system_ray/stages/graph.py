"""D1/G3/O1 — graph materialization: deduplicated nodes + edges tables.

Both tables follow the same scale pattern (SURVEY.md §2.5, §2.7):
explode (vectorized ``list_flatten``) → broadcast cluster-map lookup (the
map is the SMALL output of canonicalization: ≤ #entities rows; shipped via
``ray.put`` once, never per batch) → per-batch PARTIAL aggregation (the
combiner that bounds reducer input under head-entity skew) → one global
``groupby().map_groups`` merge (shuffle) → ``sort`` (sort-based final
shuffle, north star O1) → partitioned Parquet.

Merge functions are associative and order-insensitive (sum, set-union,
sorted-min-k for sample_urls), so results are block-order independent —
verified against refimpl goldens in tests/test_flagship.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from refimpl.vocab import scaled_universe

from ..functions.arrowutil import to_arrow
from ..functions.partitions import default_parts
from .canonicalize import attach_labels

_SAMPLE_URLS = 5
# Merge-shuffle width is cluster-derived (functions/partitions.py): ~1 hash
# partition per CPU, floor 16 — resolved ONCE at pipeline build time on the
# driver so every task agrees on the modulus.


def _part_of(key: pd.Series, num_parts: int) -> pd.Series:
    """Deterministic hash partition id for the merge groupby. Grouping by
    partition (not by key) lets the merge run ONE vectorized pandas groupby
    per partition instead of one Python call per key — same semantics, since
    every row of a key lands in the same partition."""
    return pd.util.hash_pandas_object(key, index=False) % num_parts


def explode_list_struct(batch: pa.Table, col: str,
                        keep: list[str]) -> pa.Table:
    """Vectorized explode of a list<struct> column: one output row per list
    element, parent columns repeated via take(list_parent_indices)."""
    lst = batch[col]
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    idx = pc.list_parent_indices(lst)
    cols = {k: batch[k].take(idx) for k in keep}
    for field in flat.type:
        cols[field.name] = pc.struct_field(flat, field.name)
    return pa.table(cols)


def _cluster_lookup(arr: pa.Array, cmap: dict[str, str]) -> pa.Array:
    s = pd.Series(arr.to_pandas())
    return pa.array(s.map(cmap).fillna(s), pa.string())


_NODES_SCHEMA = pa.schema([
    ("entity_id", pa.string()), ("canonical_surface", pa.string()),
    ("aliases", pa.list_(pa.string())), ("n_mentions", pa.int64()),
])


def build_nodes(annotated: ray.data.Dataset, cluster_ref,
                n_entities: int | None = None) -> ray.data.Dataset:
    """annotated → nodes(entity_id, canonical_surface, aliases, n_mentions),
    sorted by entity_id.

    ``cluster_ref`` is either an ObjectRef/dict (small-map fast path:
    broadcast once, looked up per batch) or a ``Dataset(node, label)`` —
    the scale path, where cluster ids are attached to the PARTIALLY
    AGGREGATED rows (≤ one row per raw entity per block, not the raw
    mention stream) by a co-partitioned shuffle and the merge re-groups by
    cluster id. Merge semantics are associative, so partial-on-raw-id then
    merge-on-cluster-id == partial-on-cluster-id then merge."""
    cmap_ref = cluster_ref
    ds_mode = isinstance(cluster_ref, ray.data.Dataset)
    merge_parts = default_parts(per_cpu=0.5)

    def partial(batch: pa.Table) -> pa.Table:
        flat = explode_list_struct(batch, "mentions", [])
        if ds_mode:
            cl = pc.cast(flat["entity_id"], pa.string())
        else:
            cmap = ray.get(cmap_ref) if isinstance(cmap_ref, ray.ObjectRef) \
                else cmap_ref
            cl = _cluster_lookup(flat["entity_id"], cmap)
        df = pa.table({"entity_id": cl, "surface": flat["surface"]}) \
            .to_pandas()
        g = df.groupby("entity_id", sort=False).agg(
            n_mentions=("surface", "size"),
            aliases=("surface", lambda s: sorted(set(s))))
        g = g.reset_index()
        return pa.table({
            "entity_id": pa.array(g["entity_id"], pa.string()),
            "part": pa.array(_part_of(g["entity_id"], merge_parts),
                             pa.int64()),
            "n_partial": pa.array(g["n_mentions"], pa.int64()),
            "aliases_partial": pa.array(list(g["aliases"]),
                                        pa.list_(pa.string())),
        })

    def merge_part(g: pd.DataFrame) -> pa.Table:
        # by_id reconstructed from the scalar inside the remote task
        # (scaled_universe is lru-cached per worker process — no broadcast)
        by_id = scaled_universe(n_entities).by_id
        out = (g.groupby("entity_id", sort=False)
               .agg(n_mentions=("n_partial", "sum"),
                    aliases=("aliases_partial",
                             lambda s: sorted({a for lst in s for a in lst})))
               .reset_index())
        canon = [(by_id[e].canonical if e in by_id
                  else e.removeprefix("NIL:")) for e in out["entity_id"]]
        return to_arrow(pd.DataFrame({
            "entity_id": out["entity_id"],
            "canonical_surface": canon,
            "aliases": out["aliases"],
            "n_mentions": out["n_mentions"].astype("int64"),
        }), _NODES_SCHEMA)

    # coalesce before the shuffle: the partial output is tiny (one row per
    # key per block), but sort-shuffle width follows input block count — a
    # 200-block scan would pay a 200-wide shuffle for kilobytes of data
    parts = annotated.map_batches(partial, batch_format="pyarrow")
    if ds_mode:
        parts = attach_labels(parts, cluster_ref, "entity_id",
                              num_partitions=merge_parts)
        # part is stale after key rewrite — recompute from the cluster id
        parts = parts.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("part"), "part",
                pa.array(_part_of(pd.Series(t["entity_id"].to_pandas()),
                                  merge_parts), pa.int64())),
            batch_format="pyarrow")
    else:
        parts = parts.repartition(merge_parts)
    return (parts.groupby("part")
            .map_groups(merge_part, batch_format="pandas")
            .sort("entity_id"))


_KEYS = ["subj_id", "pred", "obj_id"]
_URL_COLS = [f"u{i}" for i in range(_SAMPLE_URLS)]


def _min_k_wide(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """Per key: the ≤_SAMPLE_URLS lexicographically-smallest distinct urls,
    as WIDE nullable columns u0..u4 — all vectorized pandas (the per-batch
    combiner must not run one Python lambda per key). sorted-min-k is
    associative, so partial min-k then merged min-k == global min-k."""
    d = (df[keys + ["url"]].drop_duplicates()
         .sort_values(keys + ["url"], kind="mergesort"))
    d = d.groupby(keys, sort=False).head(_SAMPLE_URLS).copy()
    d["rank"] = d.groupby(keys, sort=False).cumcount()
    wide = d.set_index(keys + ["rank"])["url"].unstack("rank")
    wide.columns = [f"u{int(c)}" for c in wide.columns]
    for c in _URL_COLS:
        if c not in wide.columns:
            wide[c] = None
    return wide[_URL_COLS].reset_index()


_EDGES_SCHEMA = pa.schema([
    ("subj_id", pa.string()), ("pred", pa.string()),
    ("obj_id", pa.string()), ("n_support", pa.int64()),
    ("sample_urls", pa.list_(pa.string())),
])


def build_edges(annotated: ray.data.Dataset, cluster_ref) -> ray.data.Dataset:
    """annotated → edges(subj_id, pred, obj_id, n_support, sample_urls),
    sorted by (subj_id, pred, obj_id). ``cluster_ref`` semantics as in
    :func:`build_nodes`; the Dataset path attaches cluster ids to the
    partials with TWO co-partitioned passes (subj then obj)."""
    cmap_ref = cluster_ref
    ds_mode = isinstance(cluster_ref, ray.data.Dataset)
    merge_parts = default_parts(per_cpu=0.5)

    def partial(batch: pa.Table) -> pa.Table:
        flat = explode_list_struct(batch, "triples", ["url"])
        if ds_mode:
            subj = pc.cast(flat["subj_entity_id"], pa.string())
            obj = pc.cast(flat["obj_entity_id"], pa.string())
        else:
            cmap = ray.get(cmap_ref) if isinstance(cmap_ref, ray.ObjectRef) \
                else cmap_ref
            subj = _cluster_lookup(flat["subj_entity_id"], cmap)
            obj = _cluster_lookup(flat["obj_entity_id"], cmap)
        df = pa.table({
            "subj_id": subj,
            "pred": flat["pred"],
            "obj_id": obj,
            "url": flat["url"],
        }).to_pandas()
        counts = (df.groupby(_KEYS, sort=False).size()
                  .rename("n_partial").reset_index())
        g = counts.merge(_min_k_wide(df, _KEYS), on=_KEYS, how="left")
        key = g["subj_id"] + "\x00" + g["pred"] + "\x00" + g["obj_id"]
        cols = {k: pa.array(g[k], pa.string()) for k in _KEYS}
        cols["part"] = pa.array(_part_of(key, merge_parts), pa.int64())
        cols["n_partial"] = pa.array(g["n_partial"], pa.int64())
        for c in _URL_COLS:
            cols[c] = pa.array(g[c], pa.string())
        return pa.table(cols)

    def merge_part(g: pd.DataFrame) -> pa.Table:
        n = (g.groupby(_KEYS, sort=False)
             .agg(n_support=("n_partial", "sum")))
        melted = g.melt(id_vars=_KEYS, value_vars=_URL_COLS,
                        value_name="url").dropna(subset=["url"])
        wide = _min_k_wide(melted, _KEYS).set_index(_KEYS)
        out = n.join(wide)  # every key has ≥1 url ⇒ inner == left
        # sample_urls assembled as ONE ListArray from the left-packed
        # u0..u4 matrix (r5: the old per-key Python lambda was 1.5M
        # calls at sf1 — the graph phase's dominant cost at real scale)
        vals = out[_URL_COLS].to_numpy()
        mask = pd.notna(vals)
        counts = mask.sum(axis=1).astype(np.int32)
        offsets = np.zeros(len(out) + 1, np.int32)
        np.cumsum(counts, out=offsets[1:])
        sample = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(vals[mask].tolist(), pa.string()))
        idx = out.index.to_frame(index=False)
        return pa.table({
            "subj_id": pa.array(idx["subj_id"], pa.string()),
            "pred": pa.array(idx["pred"], pa.string()),
            "obj_id": pa.array(idx["obj_id"], pa.string()),
            "n_support": pa.array(out["n_support"].to_numpy(np.int64)),
            "sample_urls": sample}).cast(_EDGES_SCHEMA)

    parts = annotated.map_batches(partial, batch_format="pyarrow")
    if ds_mode:
        parts = attach_labels(parts, cluster_ref, "subj_id",
                              num_partitions=merge_parts)
        parts = attach_labels(parts, cluster_ref, "obj_id",
                              num_partitions=merge_parts)

        def repart(t: pa.Table) -> pa.Table:
            key = (pd.Series(t["subj_id"].to_pandas()) + "\x00"
                   + pd.Series(t["pred"].to_pandas()) + "\x00"
                   + pd.Series(t["obj_id"].to_pandas()))
            return t.set_column(t.schema.get_field_index("part"), "part",
                                pa.array(_part_of(key, merge_parts),
                                         pa.int64()))

        parts = parts.map_batches(repart, batch_format="pyarrow")
    else:
        parts = parts.repartition(merge_parts)  # narrow the shuffle
    return (parts.groupby("part")
            .map_groups(merge_part, batch_format="pandas")
            .sort(["subj_id", "pred", "obj_id"]))
