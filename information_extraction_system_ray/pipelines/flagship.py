"""The flagship KG-construction DAG (SURVEY.md §3.2, north star):

    read pages → strip_html (tasks) → [lang filter] → CRF tagger (actors)
    → entity linker (actors) → triple extract (tasks)
    → canonicalize (distinct-edge groupby + connected components)
    → nodes/edges (partial-agg → groupby merge → sort) → Parquet + manifest

Two modes:
- in-memory (``out_dir=None``): returns lazy Datasets; used by ``entry()``
  smoke and unit tests.
- checkpointed (``out_dir`` set): three committed stages (``extracted``,
  ``annotated``, ``graph``) written as hive-partitioned Parquet keyed by
  ``part_id = crc32(url) % num_parts`` with per-partition lineage manifests;
  a rerun recomputes only uncommitted partitions (state/manifest.py).

Ray is never initialized here (driver contract, __ray_entry__.py:11-13).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from refimpl.oracle import get_model

from ..state.broadcast import put_once
from ..state.manifest import Manifest, commit_partitions_from_dir
from ..stages.strip import extract_text
from ..stages.tagger import tag_pages
from ..stages.linker import link_pages
from ..stages.triple_extract import extract_triples_stage
from ..stages.canonicalize import cluster_labels, partial_mention_edges
from ..stages.graph import build_edges, build_nodes

DEFAULT_LANGS = ("en",)


def _filter_langs(ds: ray.data.Dataset, langs) -> ray.data.Dataset:
    langs = list(langs)
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["lang"], pa.array(langs))),
        batch_format="pyarrow")


def _normalize_part_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Hive-partitioned read-back yields part_id as string; restore int32."""
    def fix(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("part_id")
        return t.set_column(i, "part_id", pc.cast(t["part_id"], pa.int32()))
    return ds.map_batches(fix, batch_format="pyarrow")


def _filter_parts(ds: ray.data.Dataset, parts: set[int]) -> ray.data.Dataset:
    wanted = pa.array(sorted(parts), pa.int32())
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(
            pc.cast(t["part_id"], pa.int32()), wanted)),
        batch_format="pyarrow")


class FusedAnnotator:
    """tag → link → triples in ONE actor pool and ONE Python pass per page.

    The three per-page stages are each Python-loop-bound, so separate pools
    would pay two extra block handoffs and 3× the actor processes for zero
    pipelining benefit. Fusing in one loop also kills the dominant glue
    cost: mentions never round-trip through Arrow structs between stages
    (list-of-dicts → pa.array was ~half the unfused stage time), and the
    output columns are built flat (StructArray/ListArray.from_arrays).
    Semantics == unfused tag_pages→link_pages→extract_triples_stage chain
    (same refimpl primitives; verified against goldens in
    tests/test_flagship.py)."""

    def __init__(self, model_ref, alias_ref=None,
                 n_entities: int | None = None) -> None:
        import ray as _ray
        import numpy as _np

        from refimpl.vocab import scaled_universe

        from ..stages.fastpath import BatchLinker, FastHasher

        W, T = _ray.get(model_ref) \
            if isinstance(model_ref, _ray.ObjectRef) else model_ref
        self.W = _np.ascontiguousarray(W, dtype=_np.float32)
        self.T = _np.ascontiguousarray(T, dtype=_np.float32)
        # the universe is a pure function of n_entities (lru-cached), so
        # each actor reconstructs it from the scalar — nothing
        # entity-count-sized ships through the object store
        uni = scaled_universe(n_entities)
        self.hasher = FastHasher(None if uni.is_base else uni.gazetteer())
        self.linker = BatchLinker(uni)
        if alias_ref is not None:
            alias, profiles = _ray.get(alias_ref)
            self.linker.alias = alias
            self.linker.profiles = profiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        from refimpl.crf import viterbi_batch
        from refimpl.tokenizer import tokenize

        from ..stages.fastpath import (spans_from_tags_fast,
                                       triples_from_spans)
        from ..stages.linker import MENTION_TYPE
        from ..stages.triple_extract import TRIPLE_TYPE

        texts = batch["text"].to_pylist()
        toks = [tokenize(t) for t in texts]
        feats = [self.hasher.hash_tokens(tk) for tk, _ in toks]
        paths = viterbi_batch(feats, self.W, self.T)

        m_cnt, m_flat = [], {k: [] for k in
                             ("start", "end", "surface", "label",
                              "entity_id", "link_score")}
        t_cnt, t_flat = [], {f.name: [] for f in TRIPLE_TYPE}
        for (tk, offs), text, tags in zip(toks, texts, paths):
            spans = spans_from_tags_fast(offs, tags)
            links = self.linker.link_page(text, tk, spans)
            eid_by_span = {}
            m_cnt.append(len(spans))
            for (ts, te, cs, ce, ty), (eid, score) in zip(spans, links):
                surface = text[cs:ce]
                eid_by_span[(cs, ce)] = eid
                m_flat["start"].append(cs)
                m_flat["end"].append(ce)
                m_flat["surface"].append(surface)
                m_flat["label"].append(ty)
                m_flat["entity_id"].append(eid)
                m_flat["link_score"].append(score)
            trs = triples_from_spans(text, tk, spans)
            t_cnt.append(len(trs))
            for t in trs:
                t["subj_entity_id"] = eid_by_span.get(
                    (t["subj_start"], t["subj_end"]),
                    "NIL:" + t["subj"].lower())
                t["obj_entity_id"] = eid_by_span.get(
                    (t["obj_start"], t["obj_end"]),
                    "NIL:" + t["obj"].lower())
                for f in TRIPLE_TYPE:
                    t_flat[f.name].append(t[f.name])

        def list_struct(counts, flat, stype):
            struct = pa.StructArray.from_arrays(
                [pa.array(flat[f.name], f.type) for f in stype],
                fields=list(stype))
            offsets = np.zeros(len(counts) + 1, dtype=np.int32)
            np.cumsum(counts, out=offsets[1:])
            return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                            struct)

        return pa.table({
            "url": batch["url"],
            "part_id": batch["part_id"],
            "lang": batch["lang"],
            "mentions": list_struct(m_cnt, m_flat, MENTION_TYPE),
            "triples": list_struct(t_cnt, t_flat, TRIPLE_TYPE),
        })


def annotate(pages: ray.data.Dataset, *, langs=DEFAULT_LANGS,
             num_parts: int = 32, concurrency=(1, 8),
             batch_size: int = 256, fused: bool = True,
             n_entities: int | None = None) -> ray.data.Dataset:
    """pages → annotated(url, part_id, lang, mentions, triples): the
    per-page half of the DAG (no shuffles; pure streaming)."""
    model_ref = put_once("crf_model", get_model)
    extracted = extract_text(pages, num_parts=num_parts, with_sha=False)
    en = _filter_langs(extracted, langs)
    if fused:
        return en.map_batches(
            FusedAnnotator, fn_constructor_args=(model_ref, None,
                                                 n_entities),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1.0)
    tagged = tag_pages(en, model_ref, concurrency=concurrency,
                       batch_size=batch_size)
    linked = link_pages(tagged, concurrency=concurrency,
                        batch_size=batch_size)
    return extract_triples_stage(linked)


def build_graph(annotated: ray.data.Dataset, *,
                driver_threshold: int = 2_000_000,
                n_entities: int | None = None) -> dict:
    """annotated → {cluster map, nodes Dataset, edges Dataset}.

    Under ``driver_threshold`` distinct edges the cluster map is a driver
    dict broadcast once via ``ray.put`` (fast path); above it — or with
    ``driver_threshold=0`` — it stays a ``Dataset(node, label)`` end to
    end and nodes/edges attach cluster ids by co-partitioned shuffle
    (stages/canonicalize.py attach_labels), so nothing entity-sized ever
    lands on the driver."""
    import ray as _ray

    edges_bi = partial_mention_edges(annotated)
    cm = cluster_labels(edges_bi, driver_threshold=driver_threshold,
                        distinct=False)
    if isinstance(cm, dict):
        cref = _ray.put(cm)
    else:
        cref = cm.materialize()  # consumed by nodes + 2× edges attach
    return {
        "cluster": cm,
        "nodes": build_nodes(annotated, cref, n_entities=n_entities),
        "edges": build_edges(annotated, cref),
    }


def run_flagship(pages: ray.data.Dataset, out_dir: str | None = None, *,
                 langs=DEFAULT_LANGS, num_parts: int = 32,
                 concurrency=(1, 8), batch_size: int = 256,
                 driver_threshold: int = 2_000_000,
                 input_fingerprint: str = "",
                 n_entities: int | None = None) -> dict:
    if out_dir is None:
        annotated = annotate(pages, langs=langs, num_parts=num_parts,
                             concurrency=concurrency, batch_size=batch_size,
                             n_entities=n_entities)
        annotated = annotated.materialize()  # consumed 3× below (small rows)
        g = build_graph(annotated, driver_threshold=driver_threshold,
                        n_entities=n_entities)
        return {"annotated": annotated, **g}

    man = Manifest(out_dir)
    metrics: dict[str, dict] = {}

    # ---- stage 1: extracted (all langs; the byte-identity deliverable) ----
    ext_dir = os.path.join(out_dir, "extracted")
    pend = set(man.clean_uncommitted("extracted", num_parts, ext_dir,
                                     input_fingerprint))
    if pend:
        t0 = time.time()
        ext = extract_text(pages, num_parts=num_parts, with_sha=True)
        if len(pend) < num_parts:
            ext = _filter_parts(ext, pend)
        ext.write_parquet(ext_dir, partition_cols=["part_id"])
        commit_partitions_from_dir(
            man, "extracted", ext_dir, wall_s=time.time() - t0,
            input_fingerprint=input_fingerprint, part_ids=sorted(pend))
    metrics["extracted"] = man.stage_stats("extracted")

    # ---- stage 2: annotated (en-only; tagger→linker→triples) ----
    ann_dir = os.path.join(out_dir, "annotated")
    pend = set(man.clean_uncommitted("annotated", num_parts, ann_dir,
                                     input_fingerprint))
    if pend:
        t0 = time.time()
        model_ref = put_once("crf_model", get_model)
        ext_ds = _normalize_part_id(ray.data.read_parquet(
            ext_dir, columns=["url", "part_id", "lang", "text"]))
        src = _filter_langs(ext_ds, langs)
        if len(pend) < num_parts:
            src = _filter_parts(src, pend)
        ann = src.map_batches(
            FusedAnnotator, fn_constructor_args=(model_ref, None,
                                                 n_entities),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1.0)
        ann.write_parquet(ann_dir, partition_cols=["part_id"])
        commit_partitions_from_dir(
            man, "annotated", ann_dir, wall_s=time.time() - t0,
            input_fingerprint=input_fingerprint, part_ids=sorted(pend))
    metrics["annotated"] = man.stage_stats("annotated")

    # ---- stage 3: graph (wide shuffles; committed as one unit) ----
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    if man.pending("graph", 1, input_fingerprint):
        # write-then-commit: a crash after write_parquet but before
        # commit('graph') leaves uncommitted files — appending to them on
        # resume would duplicate every node/edge row, so clear first
        import shutil
        for d in (nodes_dir, edges_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
        t0 = time.time()
        annotated = _normalize_part_id(ray.data.read_parquet(ann_dir))
        g = build_graph(annotated, driver_threshold=driver_threshold,
                        n_entities=n_entities)
        g["nodes"].write_parquet(nodes_dir)
        g["edges"].write_parquet(edges_dir)
        import pyarrow.parquet as pq
        n_rows = sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for d in (nodes_dir, edges_dir) for f in os.listdir(d)
            if f.endswith(".parquet"))
        man.commit("graph", 0, n_rows=n_rows, wall_s=time.time() - t0,
                   output_path=out_dir, input_fingerprint=input_fingerprint)
    metrics["graph"] = man.stage_stats("graph")

    return {"out_dir": out_dir, "extracted_dir": ext_dir,
            "annotated_dir": ann_dir, "nodes_dir": nodes_dir,
            "edges_dir": edges_dir, "metrics": metrics}


def update_flagship(new_pages: ray.data.Dataset, out_dir: str, *,
                    langs=DEFAULT_LANGS, num_parts_new: int = 16,
                    concurrency=(1, 8), batch_size: int = 256,
                    driver_threshold: int = 2_000_000,
                    input_fingerprint: str = "",
                    n_entities: int | None = None) -> dict:
    """Incremental KG update (round 3): append a NEW batch of pages to an
    existing checkpointed flagship output, re-running the per-page stages
    for the delta only.

    - **Delta partition namespace**: new pages land in part ids
      ``[base, base + num_parts_new)`` where ``base`` = max committed
      part + 1. Old extracted/annotated partitions are never rewritten
      or re-annotated — the per-page ~80% of the pipeline is paid only
      for the delta — and the delta itself is resumable with the same
      per-partition manifest rules as a fresh run.
    - **The graph stage is REBUILT over all annotated partitions**
      (old ∪ delta): canonicalization is global — a single new co-link
      can merge two previously separate clusters, so merging node/edge
      rows without re-clustering would be semantically wrong. Distinct
      mention edges ≪ pages keeps the rebuild cheap (graph ≈ 15 % of
      e2e wall at bench scale).
    - **Equivalence contract** (tests/test_resume.py): a batch run over
      A∪B and a run over A followed by ``update_flagship(B)`` produce
      identical nodes/edges tables row for row.
    """
    import json
    import shutil

    man = Manifest(out_dir)
    done = man.completed("extracted")
    if not done:
        raise ValueError("update_flagship requires an existing "
                         "checkpointed run (run_flagship first)")
    # Delta-namespace registry: the base part id is allocated ONCE per
    # delta fingerprint and persisted, so a crashed/retried update
    # RESUMES its own namespace instead of allocating a fresh one
    # (which would duplicate the delta's pages), and re-applying an
    # already-applied delta is a committed no-op.
    reg_path = os.path.join(out_dir, "_manifest", "deltas.json")
    registry: dict = {"next": max(done) + 1, "deltas": {}}
    if os.path.exists(reg_path):
        with open(reg_path) as fh:
            registry = json.load(fh)
    key = input_fingerprint or "<unnamed-delta>"
    if key in registry["deltas"]:
        rec = registry["deltas"][key]
        if rec["num_parts"] != num_parts_new:
            raise ValueError(
                f"delta {key!r} was registered with num_parts="
                f"{rec['num_parts']}; retry with the same value")
        base = rec["base"]
    else:
        base = max(registry["next"], max(done) + 1)
        registry["deltas"][key] = {"base": base,
                                   "num_parts": num_parts_new}
        registry["next"] = base + num_parts_new
        os.makedirs(os.path.dirname(reg_path), exist_ok=True)
        tmp = reg_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(registry, fh)
        os.replace(tmp, reg_path)
    fp = f"{input_fingerprint}@delta{base}"
    metrics: dict[str, dict] = {}

    ext_dir = os.path.join(out_dir, "extracted")
    ann_dir = os.path.join(out_dir, "annotated")
    delta = list(range(base, base + num_parts_new))

    def _delta_pending(stage: str, data_dir: str) -> list[int]:
        rec = man.completed(stage)
        pend = [p for p in delta
                if p not in rec
                or rec[p].get("input_fingerprint", "") != fp]
        for p in pend:          # crash safety: clear uncommitted dirs
            d = os.path.join(data_dir, f"part_id={p}")
            if os.path.isdir(d):
                shutil.rmtree(d)
        return pend

    def _shift(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("part_id")
        shifted = pc.cast(pc.add(t["part_id"],
                                 pa.scalar(base, pa.int32())), pa.int32())
        return t.set_column(i, "part_id", shifted)

    # ---- stage 1: extract the delta ---------------------------------
    pend = _delta_pending("extracted", ext_dir)
    if pend:
        t0 = time.time()
        ext = extract_text(new_pages, num_parts=num_parts_new,
                           with_sha=True) \
            .map_batches(_shift, batch_format="pyarrow")
        if len(pend) < num_parts_new:
            ext = _filter_parts(ext, set(pend))
        ext.write_parquet(ext_dir, partition_cols=["part_id"])
        commit_partitions_from_dir(
            man, "extracted", ext_dir, wall_s=time.time() - t0,
            input_fingerprint=fp, part_ids=sorted(pend))
    metrics["extracted"] = man.stage_stats("extracted")

    # ---- stage 2: annotate the delta --------------------------------
    pend = _delta_pending("annotated", ann_dir)
    if pend:
        t0 = time.time()
        model_ref = put_once("crf_model", get_model)
        ext_ds = _normalize_part_id(ray.data.read_parquet(
            ext_dir, columns=["url", "part_id", "lang", "text"]))
        src = _filter_parts(_filter_langs(ext_ds, langs), set(pend))
        ann = src.map_batches(
            FusedAnnotator, fn_constructor_args=(model_ref, None,
                                                 n_entities),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1.0)
        ann.write_parquet(ann_dir, partition_cols=["part_id"])
        commit_partitions_from_dir(
            man, "annotated", ann_dir, wall_s=time.time() - t0,
            input_fingerprint=fp, part_ids=sorted(pend))
    metrics["annotated"] = man.stage_stats("annotated")

    # ---- stage 3: rebuild the graph over ALL annotated parts --------
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    if man.pending("graph", 1, fp):
        for d in (nodes_dir, edges_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)
        t0 = time.time()
        annotated = _normalize_part_id(ray.data.read_parquet(ann_dir))
        g = build_graph(annotated, driver_threshold=driver_threshold,
                        n_entities=n_entities)
        g["nodes"].write_parquet(nodes_dir)
        g["edges"].write_parquet(edges_dir)
        import pyarrow.parquet as pq
        n_rows = sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for d in (nodes_dir, edges_dir) for f in os.listdir(d)
            if f.endswith(".parquet"))
        man.commit("graph", 0, n_rows=n_rows, wall_s=time.time() - t0,
                   output_path=out_dir, input_fingerprint=fp)
    metrics["graph"] = man.stage_stats("graph")

    return {"out_dir": out_dir, "extracted_dir": ext_dir,
            "annotated_dir": ann_dir, "nodes_dir": nodes_dir,
            "edges_dir": edges_dir, "base_part": base,
            "metrics": metrics}
