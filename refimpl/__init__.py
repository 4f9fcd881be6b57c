"""refimpl — deterministic single-process oracle for the KG-construction engine.

The reference mount /root/reference is empty (SURVEY.md §0), so this package
plays the role the reference repo (adamkhazi/information-extraction-system, a
linear-chain-CRF résumé information extractor) would have played: it defines
the exact semantics — tokenization, HTML boilerplate stripping, feature-window
CRF tagging with Viterbi decode, pattern triple extraction, alias-dictionary +
context-embedding entity linking, union-find canonicalization — as small,
pure, single-process Python/numpy code with NO Ray imports.

The Ray Data engine (package ``information_extraction_system_ray``) imports
the per-row/per-sentence kernels from here (shared implementation ⇒ the
"byte-identical extracted text per url" invariant holds by construction,
BASELINE.json:15) and is tested against end-to-end golden outputs produced by
``refimpl.oracle`` (P/R ≥ 0.95 gate on triples, BASELINE.json:14).

Everything is deterministic: fixed seed 42, no wall clock, no external data.
"""

SEED = 42
