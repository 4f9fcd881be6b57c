"""A1 — batched CRF mention tagger as an actor-pool stage (SURVEY.md §2.3).

Reference-equivalent: the reference loads its trained CRF once per process
and Viterbi-decodes each document (refimpl.crf defines those semantics).
Here the model weights (W: [2^18, 7], T: [7, 7] float32, ~7 MiB) are put in
the object store ONCE by the pipeline builder and read in each actor's
``__init__`` — never shipped per batch. Decoding is one batched numpy
Viterbi call per Arrow batch; feature hashing is memoized per actor
(refimpl.crf.FeatureHasher).

Output keeps ``text`` (needed by downstream span logic) and adds
``tags: list<int8>`` — a compact encoding (≤7 labels) so the shuffle-bound
stages downstream move small rows — plus ``tok_start``/``tok_end``
(list<int32> char offsets) so the linker and triple stages slice tokens out
of ``text`` instead of re-running the regex tokenizer (it would otherwise
run 3× per page).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from refimpl.crf import FeatureHasher, viterbi_batch
from refimpl.tokenizer import tokenize


class CrfTagger:
    """Callable-class stage: state in __init__ (once per actor), work in
    __call__ (per batch)."""

    def __init__(self, model_ref) -> None:
        W, T = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        self.W = np.ascontiguousarray(W, dtype=np.float32)
        self.T = np.ascontiguousarray(T, dtype=np.float32)
        self.hasher = FeatureHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks = [tokenize(t) for t in texts]
        feats = [self.hasher.hash_tokens(tk) for tk, _ in toks]
        paths = viterbi_batch(feats, self.W, self.T)
        tags = pa.array([p.astype(np.int8) for p in paths],
                        pa.list_(pa.int8()))
        starts = pa.array([[s for s, _ in offs] for _, offs in toks],
                          pa.list_(pa.int32()))
        ends = pa.array([[e for _, e in offs] for _, offs in toks],
                        pa.list_(pa.int32()))
        return (batch.append_column("tags", tags)
                .append_column("tok_start", starts)
                .append_column("tok_end", ends))


def tag_pages(extracted: ray.data.Dataset, model_ref, *,
              concurrency=(1, 8), batch_size: int = 256,
              num_cpus: float = 1.0) -> ray.data.Dataset:
    """extracted(url, part_id, lang, text) → + tags per row (actor pool)."""
    return extracted.map_batches(
        CrfTagger, fn_constructor_args=(model_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
    )
