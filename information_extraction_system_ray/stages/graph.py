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

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from refimpl.vocab import BY_ID

_SAMPLE_URLS = 5


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
    return pa.array([cmap.get(e, e) for e in arr.to_pylist()], pa.string())


def build_nodes(annotated: ray.data.Dataset, cluster_ref) -> ray.data.Dataset:
    """annotated → nodes(entity_id, canonical_surface, aliases, n_mentions),
    sorted by entity_id."""
    cmap_ref = cluster_ref

    def partial(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cmap_ref) if isinstance(cmap_ref, ray.ObjectRef) \
            else cmap_ref
        flat = explode_list_struct(batch, "mentions", [])
        cl = _cluster_lookup(flat["entity_id"], cmap)
        df = pa.table({"entity_id": cl, "surface": flat["surface"]}) \
            .to_pandas()
        g = df.groupby("entity_id", sort=False).agg(
            n_mentions=("surface", "size"),
            aliases=("surface", lambda s: sorted(set(s))))
        g = g.reset_index()
        return pa.table({
            "entity_id": pa.array(g["entity_id"], pa.string()),
            "n_partial": pa.array(g["n_mentions"], pa.int64()),
            "aliases_partial": pa.array(list(g["aliases"]),
                                        pa.list_(pa.string())),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["entity_id"].iloc[0]
        aliases = sorted({a for lst in g["aliases_partial"] for a in lst})
        e = BY_ID.get(eid)
        canonical = e.canonical if e else eid.removeprefix("NIL:")
        return pd.DataFrame({
            "entity_id": [eid], "canonical_surface": [canonical],
            "aliases": [aliases],
            "n_mentions": [int(g["n_partial"].sum())],
        })

    return (annotated
            .map_batches(partial, batch_format="pyarrow")
            .groupby("entity_id")
            .map_groups(merge, batch_format="pandas")
            .sort("entity_id"))


def build_edges(annotated: ray.data.Dataset, cluster_ref) -> ray.data.Dataset:
    """annotated → edges(subj_id, pred, obj_id, n_support, sample_urls),
    sorted by (subj_id, pred, obj_id)."""
    cmap_ref = cluster_ref

    def partial(batch: pa.Table) -> pa.Table:
        cmap = ray.get(cmap_ref) if isinstance(cmap_ref, ray.ObjectRef) \
            else cmap_ref
        flat = explode_list_struct(batch, "triples", ["url"])
        df = pa.table({
            "subj_id": _cluster_lookup(flat["subj_entity_id"], cmap),
            "pred": flat["pred"],
            "obj_id": _cluster_lookup(flat["obj_entity_id"], cmap),
            "url": flat["url"],
        }).to_pandas()
        g = df.groupby(["subj_id", "pred", "obj_id"], sort=False).agg(
            n_partial=("url", "size"),
            urls_partial=("url", lambda s: sorted(set(s))[:_SAMPLE_URLS]))
        g = g.reset_index()
        return pa.table({
            "subj_id": pa.array(g["subj_id"], pa.string()),
            "pred": pa.array(g["pred"], pa.string()),
            "obj_id": pa.array(g["obj_id"], pa.string()),
            "n_partial": pa.array(g["n_partial"], pa.int64()),
            "urls_partial": pa.array(list(g["urls_partial"]),
                                     pa.list_(pa.string())),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # sorted-min-k is associative: min-5 of unions == global min-5
        urls = sorted({u for lst in g["urls_partial"] for u in lst})
        return pd.DataFrame({
            "subj_id": [g["subj_id"].iloc[0]], "pred": [g["pred"].iloc[0]],
            "obj_id": [g["obj_id"].iloc[0]],
            "n_support": [int(g["n_partial"].sum())],
            "sample_urls": [urls[:_SAMPLE_URLS]],
        })

    return (annotated
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["subj_id", "pred", "obj_id"])
            .map_groups(merge, batch_format="pandas")
            .sort(["subj_id", "pred", "obj_id"]))
