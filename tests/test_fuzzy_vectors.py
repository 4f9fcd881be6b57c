"""Unit tests for the deletion-neighborhood fuzzy join (functions/fuzzy.py)
and per-label vector centroids (functions/vectors.py): recall vs
brute-force Levenshtein on a constructed typo corpus, the _ed_le_1 scalar
against DuckDB's levenshtein, and centroid parity with numpy."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _rd(df, parts=4):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(parts)


def test_ed_le_1_matches_duckdb():
    import duckdb

    from information_extraction_system_ray.functions.fuzzy import _ed_le_1

    words = ["cat", "cart", "car", "bat", "ct", "cat", "xyz", "", "a",
             "ab", "ba", "abc", "acb"]
    con = duckdb.connect()
    for a in words:
        for b in words:
            want = con.execute(
                "SELECT levenshtein(?, ?) <= 1", [a, b]).fetchone()[0]
            assert _ed_le_1(a, b) == want, (a, b)


def test_fuzzy_pairs_recall_equals_bruteforce(ray_session):
    import duckdb

    from information_extraction_system_ray.functions.fuzzy import fuzzy_pairs_ed1

    words = ["widget", "widgat", "widget ", "gadget", "gadgets", "bolt",
             "bolts", "bolt", "jolt", "colt", "plate", "plat", "slate",
             "zzz", "unrelated"]
    df = pd.DataFrame({"w": words})
    got = fuzzy_pairs_ed1(_rd(df), "w").to_pandas() \
        .sort_values(["name_a", "name_b"]).reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT a.w AS name_a, b.w AS name_b
        FROM (SELECT DISTINCT w FROM df) a, (SELECT DISTINCT w FROM df) b
        WHERE a.w < b.w AND levenshtein(a.w, b.w) <= 1
        ORDER BY 1, 2""").df()
    assert got.equals(want)


def test_label_centroids_match_numpy(ray_session):
    from information_extraction_system_ray.functions.vectors import label_centroids

    rng = np.random.default_rng(13)
    n, d = 40, 6
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 3, n).astype(np.int64)
    df = pd.DataFrame({"embedding": [v for v in vecs], "label": labels})
    tbl = pa.table({
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int64()),
    })
    import ray.data as rd
    out = label_centroids(rd.from_arrow(tbl).repartition(5)) \
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    scaled = np.round(vecs.astype(np.float64) * 1e6)
    for lab in np.unique(labels):
        sub = scaled[labels == lab]
        want = sub.sum(axis=0) / len(sub)
        got = out[out.label == lab].sort_values("dim")["centroid_micro"] \
            .to_numpy()
        assert np.array_equal(got, want), lab
