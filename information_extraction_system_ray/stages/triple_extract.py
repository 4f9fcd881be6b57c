"""M6 — pattern triple extraction, stateless tasks (SURVEY.md §2.2 M6).

Applies the shared rule extractor (refimpl.triples: adjacent tagged spans
with a predicate-lexicon gap) per row and attaches subject/object entity ids
by a ROW-LOCAL char-span match against the already-linked ``mentions`` column
— no shuffle join is needed to produce linked triples (SURVEY.md §2.4 J2).

Output adds ``triples: list<struct<subj, pred, obj, subj_start, subj_end,
obj_start, obj_end, subj_entity_id, obj_entity_id, conf>>``; the fat
``text``/``tags`` columns are dropped after this stage — the result is the
compact ``annotated`` table that all graph building reads.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from refimpl.triples import extract_triples

TRIPLE_TYPE = pa.struct([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("subj_start", pa.int32()), ("subj_end", pa.int32()),
    ("obj_start", pa.int32()), ("obj_end", pa.int32()),
    ("subj_entity_id", pa.string()), ("obj_entity_id", pa.string()),
    ("conf", pa.float64()),
])


def _triples_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    tags_col = batch["tags"].to_pylist()
    mentions_col = batch["mentions"].to_pylist()
    ss_col = batch["tok_start"].to_pylist()
    ee_col = batch["tok_end"].to_pylist()
    out = []
    for text, tags, mentions, ss, ee in zip(texts, tags_col, mentions_col,
                                            ss_col, ee_col):
        offsets = list(zip(ss, ee))
        tokens = [text[s:e] for s, e in offsets]
        eid_by_span = {(m["start"], m["end"]): m["entity_id"]
                       for m in mentions}
        rows = []
        for t in extract_triples(text, tokens, offsets, tags):
            t["subj_entity_id"] = eid_by_span.get(
                (t["subj_start"], t["subj_end"]), "NIL:" + t["subj"].lower())
            t["obj_entity_id"] = eid_by_span.get(
                (t["obj_start"], t["obj_end"]), "NIL:" + t["obj"].lower())
            rows.append(t)
        out.append(rows)
    result = batch.append_column(
        "triples", pa.array(out, pa.list_(TRIPLE_TYPE)))
    return result.drop_columns(["text", "tags", "tok_start", "tok_end"])


def extract_triples_stage(linked: ray.data.Dataset, *,
                          batch_size: int = 512) -> ray.data.Dataset:
    """linked(url, part_id, lang, text, tags, mentions) →
    annotated(url, part_id, lang, mentions, triples)."""
    return linked.map_batches(
        _triples_batch, batch_format="pyarrow", batch_size=batch_size)
