"""Single-process BPE merge-training oracle (Sennrich et al. 2016,
public — the byte-pair-encoding tokenizer-training algorithm every LLM
data pipeline runs over its corpus).

The distributed trainer (information_extraction_system_ray/functions/
bpe.py) must produce the IDENTICAL merge sequence under any partitioning.
The shared determinism contract:

- training operates on the WORD-FREQUENCY table (distinct lowercased
  whitespace words with counts), the classic formulation — pair counts
  are integer sums weighted by word count, so partial sums are order-
  and partition-independent;
- the winning pair each step is the (count, left, right) maximum with
  count DESC, then left ASC, then right ASC — a total order, so ties
  cannot depend on layout;
- merged symbols concatenate left+right; merging rewrites each word's
  symbol sequence left-to-right (the standard greedy in-word pass).
"""

from __future__ import annotations

from collections import Counter


def merge_word(syms: "tuple[str, ...]",
               pair: "tuple[str, str]") -> "tuple[str, ...]":
    """One left-to-right merge pass of ``pair`` over a symbol tuple."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_merges(word_counts: "dict[str, int]",
               k: int) -> "list[tuple[str, str, int]]":
    """Train ``k`` BPE merges over a word→count table; returns the merge
    sequence [(left, right, pair_count), ...] (may be shorter than k if
    pairs run out)."""
    vocab = {tuple(w): n for w, n in word_counts.items() if w}
    merges: "list[tuple[str, str, int]]" = []
    for _ in range(k):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # max by count desc, then (left, right) asc — total order
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((left, right, cnt))
        vocab = {merge_word(s, (left, right)): n
                 for s, n in vocab.items()}
    return merges


def encode_counts(word_counts: "dict[str, int]",
                  merges: "list[tuple[str, str, int]]"
                  ) -> "dict[str, int]":
    """Apply a learned merge sequence to the word table and return the
    corpus-wide symbol → occurrence-count map (the encode side)."""
    vocab = {tuple(w): n for w, n in word_counts.items() if w}
    for left, right, _ in merges:
        vocab = {merge_word(s, (left, right)): n
                 for s, n in vocab.items()}
    out: "dict[str, int]" = {}
    for syms, n in vocab.items():
        for s in syms:
            out[s] = out.get(s, 0) + n
    return out
