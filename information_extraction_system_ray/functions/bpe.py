"""Distributed BPE merge training (Sennrich et al. 2016, public) — the
tokenizer-training primitive of every LLM data pipeline, expressed
Ray-Data-first.

Must match refimpl/bpe.py MERGE-FOR-MERGE under any partitioning (the
golden + layout-invariance tests in tests/test_new_ops.py). Two-level
shape:

1. the corpus collapses ONCE to the word-frequency table — per-batch
   pandas ``value_counts`` combiners mean only (word, partial_count)
   rows ever shuffle, never raw tokens; the vocab table is then the
   training input, corpus-size-independent from here on (the classic
   BPE formulation — at web scale the vocab is millions of rows while
   the corpus is trillions);
2. each of the K merge steps is one streaming pass over the vocab
   table: per-batch pair-count combiners → a skinny (left, right, n)
   groupby → a distributed sort picks the (count DESC, left, right)
   winner — a total order, so ties cannot depend on layout — and the
   two winning strings (driver state: exactly one pair per step)
   broadcast into a rewrite pass that merges the pair in every word's
   symbol string. ``snapshot`` truncates lineage so K steps cannot
   compound the plan.

The per-word rewrite walks symbols in Python — bounded by the VOCAB
table (distinct words), not the corpus, and spread across blocks; the
same budget argument as refimpl's loop, but distributed.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from .lineage import snapshot

SEP = "\x1f"        # unit separator: never appears in whitespace words


def word_count_table(docs: ray.data.Dataset,
                     text_col: str = "text") -> ray.data.Dataset:
    """Dataset(word, n): lowercased whitespace-token counts with
    per-batch combiners (only distinct-word partials shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        words = pc.split_pattern_regex(
            pc.utf8_lower(t[text_col]), r"\s+").combine_chunks()
        flat = pd.Series(words.flatten().to_pandas())
        flat = flat[flat != ""]
        vc = flat.value_counts()
        return pa.table({"word": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def bpe_train(vocab: ray.data.Dataset, k: int) -> pa.Table:
    """Train ``k`` merges over Dataset(word, n); returns an Arrow table
    (step, left, right, pair_count) — the merge sequence, identical to
    refimpl.bpe.bpe_merges on the same word counts."""
    sym_schema = pa.schema([("syms", pa.string()), ("n", pa.int64())])

    def init(t: pa.Table) -> pa.Table:
        syms = [SEP.join(w) for w in t["word"].to_pylist()]
        return pa.table({"syms": pa.array(syms, pa.string()),
                         "n": t["n"]}).cast(sym_schema)

    state = snapshot(vocab.map_batches(init, batch_format="pyarrow"))

    merges = {"step": [], "left": [], "right": [], "pair_count": []}
    for step in range(k):

        def pair_partials(t: pa.Table) -> pa.Table:
            rows: "dict[tuple[str, str], int]" = {}
            for syms, n in zip(t["syms"].to_pylist(),
                               t["n"].to_pylist()):
                parts = syms.split(SEP)
                for a, b in zip(parts, parts[1:]):
                    key = (a, b)
                    rows[key] = rows.get(key, 0) + n
            if not rows:
                return pa.table({"left": pa.array([], pa.string()),
                                 "right": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            ks = list(rows)
            return pa.table({
                "left": pa.array([a for a, _ in ks], pa.string()),
                "right": pa.array([b for _, b in ks], pa.string()),
                "n": pa.array([rows[x] for x in ks], pa.int64())})

        pairs = (state.map_batches(pair_partials, batch_format="pyarrow")
                 .groupby(["left", "right"])
                 .aggregate(Sum("n", alias_name="cnt")))
        top = (pairs.sort(["cnt", "left", "right"],
                          descending=[True, False, False])
               .limit(1).take_all())
        if not top:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges["step"].append(step)
        merges["left"].append(left)
        merges["right"].append(right)
        merges["pair_count"].append(int(top[0]["cnt"]))

        pat = SEP.join((left, right))
        merged = left + right

        def rewrite(t: pa.Table, _l=left, _r=right, _m=merged) -> pa.Table:
            out = []
            for syms in t["syms"].to_pylist():
                # left-to-right greedy pairwise merge: overlapping runs
                # (a,a,a) must merge (aa),(a) — a blind string replace
                # would get that right here too, but walking symbols
                # keeps the contract explicit and SEP-safe
                parts = syms.split(SEP)
                res = []
                i = 0
                while i < len(parts):
                    if (i + 1 < len(parts) and parts[i] == _l
                            and parts[i + 1] == _r):
                        res.append(_m)
                        i += 2
                    else:
                        res.append(parts[i])
                        i += 1
                out.append(SEP.join(res))
            return pa.table({"syms": pa.array(out, pa.string()),
                             "n": t["n"]}).cast(sym_schema)

        state = snapshot(state.map_batches(rewrite,
                                           batch_format="pyarrow"))

    return pa.table({
        "step": pa.array(merges["step"], pa.int64()),
        "left": pa.array(merges["left"], pa.string()),
        "right": pa.array(merges["right"], pa.string()),
        "pair_count": pa.array(merges["pair_count"], pa.int64())})


def bpe_apply(vocab: ray.data.Dataset,
              merges: "list[tuple[str, str]]") -> ray.data.Dataset:
    """Apply a learned merge sequence to Dataset(word, n) and return
    Dataset(sym, n) — corpus-wide symbol occurrence counts (the encode
    side of the tokenizer). Same per-word greedy contract as training;
    one streaming pass applies ALL merges, then a skinny (sym, n)
    groupby — again vocab-sized, never corpus-sized."""
    from ray.data.aggregate import Sum as _Sum

    def encode(t: pa.Table) -> pa.Table:
        counts: "dict[str, int]" = {}
        for word, n in zip(t["word"].to_pylist(), t["n"].to_pylist()):
            parts = list(word)
            for left, right in merges:
                res = []
                i = 0
                while i < len(parts):
                    if (i + 1 < len(parts) and parts[i] == left
                            and parts[i + 1] == right):
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(parts[i])
                        i += 1
                parts = res
            for s in parts:
                counts[s] = counts.get(s, 0) + n
        ks = list(counts)
        return pa.table({"sym": pa.array(ks, pa.string()),
                         "n": pa.array([counts[x] for x in ks],
                                       pa.int64())})

    return (vocab.map_batches(encode, batch_format="pyarrow")
            .groupby("sym").aggregate(_Sum("n", alias_name="n")))
