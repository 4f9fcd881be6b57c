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


def test_pca_top_component_matches_numpy(ray_session):
    """V5 (round 3): distributed integer-Gram PCA == numpy eigh on the
    same micro-quantized data, across block layouts (exact int partials
    make it layout-invariant by construction)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from information_extraction_system_ray.functions.vectors import \
        pca_top_component

    rng = np.random.default_rng(5)
    n, d = 3000, 8
    base = rng.normal(size=(n, d))
    base[:, 0] += 3 * base[:, 1]          # a clearly dominant direction
    x = np.round(base * 1e6) / 1e6        # match the micro quantization

    tbl = pa.table({"embedding": pa.array(
        [row.tolist() for row in x], pa.list_(pa.float64()))})

    xq = np.round(x * 1e6) / 1e6
    mean = xq.mean(axis=0)
    cov = (xq - mean).T @ (xq - mean) / n
    w, v = np.linalg.eigh(cov)
    ref = v[:, -1]
    i = int(np.argmax(np.abs(ref)))
    if ref[i] < 0:
        ref = -ref

    prev = None
    for nblocks in (1, 7):
        got_v, got_lam, got_n = pca_top_component(
            rd.from_arrow(tbl).repartition(nblocks))
        assert got_n == n
        assert abs(got_lam - w[-1]) < 1e-6 * max(1.0, w[-1])
        assert np.abs(got_v - ref).max() < 1e-6
        key = (tuple(np.round(got_v * 1e9).astype(np.int64)),
               round(got_lam, 9))
        if prev is not None:
            assert key == prev          # layout invariance, bit-level
        prev = key


def test_melt_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from information_extraction_system_ray.functions.reshape import melt

    df = pd.DataFrame({"id": [1, 2, 3], "a": [1.5, 2.5, 3.5],
                       "b": [10, 20, 30]})
    want = df.melt(id_vars=["id"], value_vars=["a", "b"]) \
        .astype({"value": "float64"}) \
        .sort_values(["variable", "id"]).reset_index(drop=True)
    got = melt(rd.from_arrow(pa.Table.from_pandas(df,
                                                  preserve_index=False)),
               id_cols=["id"], value_cols=["a", "b"]) \
        .to_pandas().sort_values(["variable", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
