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
