"""Count-Min sketch guarantees (functions/sketches.py cm_sketch/cm_query):
never underestimates, overestimate bounded by eps*N, exact in the
low-collision regime, and merge-order invariance via different partition
counts."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _rd(df, parts):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(parts)


def test_cm_sketch_bounds_and_determinism(ray_session):
    from information_extraction_system_ray.functions.sketches import (
        cm_query, cm_sketch)

    rng = np.random.default_rng(21)
    # zipf-ish: few heavy values, long tail
    vals = np.concatenate([
        np.repeat(["hot_a", "hot_b", "hot_c"], [500, 300, 200]),
        rng.integers(0, 400, 1000).astype(str),
    ])
    df = pd.DataFrame({"v": vals})
    true = df["v"].value_counts()
    n = len(df)

    mat3 = cm_sketch(_rd(df, 3), "v")
    mat7 = cm_sketch(_rd(df, 7), "v")
    # merge is elementwise int addition → partitioning-invariant
    assert np.array_equal(mat3, mat7)

    eps_n = int(np.e / 1024 * n) + 1
    for v in ["hot_a", "hot_b", "hot_c", "0", "150"]:
        est = cm_query(mat3, v)
        tv = int(true.get(v, 0))
        assert est >= tv, v                     # never underestimates
        assert est <= tv + 3 * eps_n, v         # loose eps*N bound
    # heavy hitters are far above any collision noise → exact ordering
    assert cm_query(mat3, "hot_a") > cm_query(mat3, "hot_b") \
        > cm_query(mat3, "hot_c")
    # absent value stays within collision noise
    assert cm_query(mat3, "never_seen_xyz") <= 3 * eps_n
