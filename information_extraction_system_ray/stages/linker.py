"""A3/A4 + J1/J2 — entity linking as an actor-pool stage (SURVEY.md §2.3-2.4).

The alias dictionary and entity profile embeddings are the small side of a
lookup join: built once (refimpl.linker.Linker) in each actor's ``__init__``
— the broadcast-join pattern (``ray.put`` once / read per actor) instead of a
shuffle join, because dictionary ≪ pages. Unmatched surfaces link to NIL
(left-outer semantics, SURVEY.md §2.4 J2).

Output adds ``mentions: list<struct<start, end, surface, label, entity_id,
link_score>>`` per page; char spans index into ``text``.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from refimpl.linker import Linker, context_words
from refimpl.triples import spans_from_tags

MENTION_TYPE = pa.struct([
    ("start", pa.int32()), ("end", pa.int32()),
    ("surface", pa.string()), ("label", pa.string()),
    ("entity_id", pa.string()), ("link_score", pa.float64()),
])


class LinkMentions:
    def __init__(self, alias_ref=None) -> None:
        # alias_ref: optional ray.put ref of prebuilt (alias_index, profiles);
        # default builds from the closed vocab (small, deterministic)
        self.linker = Linker()
        if alias_ref is not None:
            alias, profiles = ray.get(alias_ref)
            self.linker.alias = alias
            self.linker.profiles = profiles

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tags_col = batch["tags"].to_pylist()
        ss_col = batch["tok_start"].to_pylist()
        ee_col = batch["tok_end"].to_pylist()
        out = []
        for text, tags, ss, ee in zip(texts, tags_col, ss_col, ee_col):
            # tokens restored by slicing: cheaper than re-running the regex
            offsets = list(zip(ss, ee))
            tokens = [text[s:e] for s, e in offsets]
            spans = spans_from_tags(tokens, offsets, tags)
            ments = []
            for (ts, te, cs, ce, ty) in spans:
                surface = text[cs:ce]
                eid, score = self.linker.link(
                    surface, context_words(tokens, ts, te))
                ments.append({"start": cs, "end": ce, "surface": surface,
                              "label": ty, "entity_id": eid,
                              "link_score": score})
            out.append(ments)
        return batch.append_column(
            "mentions", pa.array(out, pa.list_(MENTION_TYPE)))


def link_pages(tagged: ray.data.Dataset, alias_ref=None, *,
               concurrency=(1, 8), batch_size: int = 256,
               num_cpus: float = 1.0) -> ray.data.Dataset:
    """tagged(..., text, tags) → + mentions list<struct> (actor pool)."""
    return tagged.map_batches(
        LinkMentions, fn_constructor_args=(alias_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
    )
