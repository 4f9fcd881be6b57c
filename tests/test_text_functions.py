import pyarrow as pa

from information_extraction_system_ray.functions.text import (
    fingerprint_batch, langid_batch, quality_batch, token_count_batch)


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_count():
    t = token_count_batch(_batch(["a b  c", "", "hello, world!"]))
    assert t["n_tokens"].to_pylist() == [3, 0, 2]
    assert t["n_subwords"].to_pylist() == [3, 0, 4]  # hello , world !


def test_quality_monotone():
    t = quality_batch(_batch([
        "the quick brown fox jumps over the lazy dog " * 10,
        "!!! ??? ### $$$ %%%",
    ]))
    q = t["quality"].to_pylist()
    assert q[0] > q[1]
    assert 0.0 <= min(q) and max(q) <= 1.0


def test_langid():
    t = langid_batch(_batch([
        "the report and survey of the market",
        "der bericht und die übersicht für das",
        "el informe de la ciudad con los datos para",
        "le rapport et les données avec pour",
        "xyzzy plugh",
    ]))
    assert t["lang_pred"].to_pylist() == ["en", "de", "es", "fr", "und"]


def test_fingerprint_normalizes_whitespace_and_case():
    t = fingerprint_batch(_batch(["Hello  World", "hello world",
                                  "different"]))
    fps = t["fingerprint"].to_pylist()
    assert fps[0] == fps[1] != fps[2]


def test_compress_ratio_matches_single_process(ray_session):
    """docs_compress_ratio golden: the distributed histogram equals a
    single-process zlib recomputation over the same parquet (rows-only
    query — this IS its oracle)."""
    import zlib
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from information_extraction_system_ray.queries import docs_compress_ratio

    sf = "/root/testdata/sf0.001"
    got = docs_compress_ratio(sf).to_pandas()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["text", "source"])
    want = Counter()
    for s, src in zip(t["text"].to_pylist(), t["source"].to_pylist()):
        raw = s.encode()
        ratio = len(zlib.compress(raw, 6)) * 100 // max(len(raw), 1)
        want[(src, min(ratio // 10, 10))] += 1
    got_map = {(r["source"], int(r["bucket"])): int(r["n_docs"])
               for _, r in got.iterrows()}
    assert got_map == dict(want)


def test_rake_matches_single_process(ray_session):
    """docs_rake_keyphrases golden: corpus-level RAKE recomputed
    single-process with the same phrase rule (stopword-free runs capped
    at 4) and the same exact micro-int word scores."""
    from collections import Counter

    import pyarrow.parquet as pq2

    from information_extraction_system_ray.functions.text import STOPWORDS
    from information_extraction_system_ray.queries import (
        _rake_phrases, docs_rake_keyphrases)

    sf = "/root/testdata/sf0.001"
    got = docs_rake_keyphrases(sf).to_pandas()
    texts = pq2.read_table(f"{sf}/documents.parquet",
                           columns=["text"])["text"].to_pylist()
    phrases = _rake_phrases(texts, STOPWORDS)
    deg, freq = Counter(), Counter()
    for ph in phrases:
        for w in ph:
            deg[w] += len(ph)
            freq[w] += 1
    w_score = {w: deg[w] * 1_000_000 // freq[w] for w in deg}
    ph_score = Counter()
    for ph in phrases:
        ph_score[" ".join(ph)] += sum(w_score[w] for w in ph)
    want = sorted(ph_score.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["phrase"], int(r["score_micro"]))
            for _, r in got.iterrows()] == want


def test_rake_phrase_rule():
    from information_extraction_system_ray.queries import _rake_phrases

    # stopwords break runs; caps split long runs into consecutive chunks
    ph = _rake_phrases(["alpha beta of gamma delta epsilon zeta eta "
                        "theta"], {"of"})
    assert ph == [("alpha", "beta"),
                  ("gamma", "delta", "epsilon", "zeta"),
                  ("eta", "theta")]
    assert _rake_phrases(["the of and"], {"the", "of", "and"}) == []
