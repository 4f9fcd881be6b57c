"""Edge cases for the second-moment stats (functions/stats.py) and
percent_rank (functions/window.py) the fixed driver tables don't hit:
n==1 groups (SQL null semantics), constant columns (zero variance → null
corr), mode ties (smallest-value rule), single-row percent_rank keys, and
all-ties percent_rank partitions."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _rd(df, parts=5):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(parts)


def test_grouped_variance_matches_numpy_and_nulls(ray_session):
    from information_extraction_system_ray.functions.stats import grouped_variance

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], [40, 17, 1]),
        "x": rng.integers(0, 1000, 58).astype(np.int64),
    })
    out = grouped_variance(_rd(df), "x", keys=["g"]).to_pandas() \
        .set_index("g").sort_index()
    for g in ["a", "b"]:
        xs = df.loc[df.g == g, "x"].to_numpy(dtype=np.float64)
        assert out.loc[g, "n"] == len(xs)
        assert out.loc[g, "var_samp"] == round(
            float(np.var(xs, ddof=1)), 4)
        assert abs(out.loc[g, "stddev_samp"]
                   - round(np.sqrt(round(float(np.var(xs, ddof=1)), 4)), 4)
                   ) < 1e-12
    # n == 1 group → SQL VAR_SAMP null
    assert pd.isna(out.loc["c", "var_samp"])
    assert pd.isna(out.loc["c", "stddev_samp"])


def test_grouped_corr_constant_and_exact(ray_session):
    from information_extraction_system_ray.functions.stats import grouped_corr

    rng = np.random.default_rng(11)
    x = rng.integers(0, 500, 60).astype(np.int64)
    noise = rng.integers(-20, 20, 60).astype(np.int64)
    df = pd.DataFrame({
        "g": ["pos"] * 60 + ["const"] * 5 + ["tiny"] * 1,
        "x": np.concatenate([x, np.arange(5, dtype=np.int64),
                             np.array([3], np.int64)]),
        "y": np.concatenate([2 * x + noise,
                             np.full(5, 9, np.int64),
                             np.array([4], np.int64)]),
    })
    out = grouped_corr(_rd(df), "x", "y", keys=["g"]).to_pandas() \
        .set_index("g")
    expect = round(float(np.corrcoef(
        x.astype(np.float64), (2 * x + noise).astype(np.float64))[0, 1]), 4)
    assert abs(out.loc["pos", "corr"] - expect) < 2e-4
    assert pd.isna(out.loc["const", "corr"])   # zero variance in y
    assert pd.isna(out.loc["tiny", "corr"])    # n < 2


def test_grouped_mode_tie_breaks_smallest(ray_session):
    from information_extraction_system_ray.functions.stats import grouped_mode

    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 3,
        # group a: 'x' and 'm' tie at 3 each → smallest value 'm' wins
        "v": ["x", "x", "x", "m", "m", "m", "z", "z", "q"],
    })
    out = grouped_mode(_rd(df), "v", keys=["g"]).to_pandas() \
        .set_index("g")
    assert out.loc["a", "mode"] == "m" and out.loc["a", "mode_n"] == 3
    assert out.loc["b", "mode"] == "z" and out.loc["b", "mode_n"] == 2


def test_percent_rank_edges(ray_session):
    from information_extraction_system_ray.functions.window import percent_rank

    df = pd.DataFrame({
        "k": ["solo"] + ["ties"] * 4 + ["mix"] * 4,
        "v": np.array([9, 5, 5, 5, 5, 10, 20, 20, 30], np.float64),
        "id": np.arange(9, dtype=np.int64),
    })
    out = percent_rank(_rd(df), keys=["k"], order_by=["v"],
                       out_col="pr").to_pandas()
    assert out.loc[out.k == "solo", "pr"].tolist() == [0.0]
    # all-ties partition: every row has rank 1 → pr 0.0
    assert out.loc[out.k == "ties", "pr"].tolist() == [0.0] * 4
    mix = out[out.k == "mix"].sort_values("id")["pr"].tolist()
    # ranks 1,2,2,4 over n=4 → (r-1)/3
    assert mix == [0.0, 1 / 3, 1 / 3, 1.0]


def test_percent_rank_composite_order_matches_duckdb(ray_session):
    import duckdb

    from information_extraction_system_ray.functions.window import percent_rank

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 80).astype(np.int64),
        "a": rng.integers(0, 5, 80).astype(np.int64),   # heavy ties
        "b": rng.integers(0, 3, 80).astype(np.int64),
        "id": np.arange(80, dtype=np.int64),
    })
    got = percent_rank(_rd(df), keys=["k"], order_by=["a", "b"],
                       descending=[False, True], out_col="pr") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT *, PERCENT_RANK() OVER
                  (PARTITION BY k ORDER BY a, b DESC) AS pr
        FROM df ORDER BY id""").df()
    assert np.allclose(got["pr"].to_numpy(), want["pr"].to_numpy(),
                       atol=0, rtol=0)


def test_cume_dist_composite_matches_duckdb(ray_session):
    import duckdb

    from information_extraction_system_ray.functions.window import cume_dist

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 80).astype(np.int64),
        "a": rng.integers(0, 5, 80).astype(np.int64),   # heavy ties
        "b": rng.integers(0, 3, 80).astype(np.int64),
        "id": np.arange(80, dtype=np.int64),
    })
    got = cume_dist(_rd(df), keys=["k"], order_by=["a", "b"],
                    descending=[True, False], out_col="cd") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT *, CUME_DIST() OVER
                  (PARTITION BY k ORDER BY a DESC, b) AS cd
        FROM df ORDER BY id""").df()
    assert np.allclose(got["cd"].to_numpy(), want["cd"].to_numpy(),
                       atol=0, rtol=0)


def test_fill_forward_locf(ray_session):
    from information_extraction_system_ray.functions.window import fill_forward

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 3,
        "t": np.array([1, 2, 3, 4, 5, 1, 2, 3], np.int64),
        # group a: leading null stays null; later nulls carry forward
        "v": pd.array([None, 10, None, None, 7, None, None, 4],
                      dtype="Int64"),
    })
    out = fill_forward(_rd(df, parts=3), "v", keys=["k"],
                       order_by=["t"], out_col="f") \
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    want = pd.Series([None, 10, 10, 10, 7, None, None, 4], dtype="float64")
    assert out["f"].astype("float64").reset_index(drop=True).equals(want)
    # original column untouched when out_col differs
    assert out["v"].isna().sum() == 5


def test_rolling_sum_count_col(ray_session):
    from information_extraction_system_ray.functions.window import rolling_sum

    df = pd.DataFrame({
        "k": ["a"] * 5,
        "t": np.arange(5, dtype=np.int64),
        "v": np.array([1, 2, 3, 4, 5], np.int64),
    })
    out = rolling_sum(_rd(df, parts=2), "v", keys=["k"], order_by=["t"],
                      window=3, out_col="s", count_col="c") \
        .to_pandas().sort_values("t")
    assert out["s"].tolist() == [1, 3, 6, 9, 12]
    assert out["c"].tolist() == [1, 2, 3, 3, 3]


def test_ntile_per_key_matches_duckdb_uneven(ray_session):
    import duckdb

    from information_extraction_system_ray.functions.window import ntile_per_key

    rng = np.random.default_rng(9)
    # uneven group sizes incl. n < q and n == 1
    sizes = [1, 2, 3, 4, 5, 7, 11, 30]
    df = pd.DataFrame({
        "k": np.repeat(np.arange(len(sizes), dtype=np.int64), sizes),
        "v": rng.integers(0, 50, sum(sizes)).astype(np.int64),
        "id": np.arange(sum(sizes), dtype=np.int64),
    })
    got = ntile_per_key(_rd(df), 4, keys=["k"], order_by=["v", "id"],
                        out_col="t").to_pandas() \
        .sort_values("id").reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT *, NTILE(4) OVER (PARTITION BY k ORDER BY v, id) AS t
        FROM df ORDER BY id""").df()
    assert got["t"].tolist() == want["t"].astype("int64").tolist()


def test_rank_per_key_ties_match_duckdb(ray_session):
    import duckdb

    from information_extraction_system_ray.functions.window import rank_per_key

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 60).astype(np.int64),
        "a": rng.integers(0, 4, 60).astype(np.int64),   # heavy ties
        "b": rng.integers(0, 3, 60).astype(np.int64),
        "id": np.arange(60, dtype=np.int64),
    })
    got = rank_per_key(_rd(df), keys=["k"], order_by=["a", "b"],
                       descending=[False, True], out_col="r") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT *, RANK() OVER (PARTITION BY k ORDER BY a, b DESC) AS r
        FROM df ORDER BY id""").df()
    assert got["r"].tolist() == want["r"].astype("int64").tolist()


def test_densify_time_fills_gaps(ray_session):
    from information_extraction_system_ray.functions.window import densify_time

    df = pd.DataFrame({
        "k": np.array([1, 1, 1, 2], np.int64),
        "h": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 03:00",
                             "2024-01-01 05:00", "2024-01-02 10:00"]),
        "n": np.array([5, 2, 1, 9], np.int64),
    })
    tbl = pa.table({
        "k": pa.array(df["k"], pa.int64()),
        "h": pa.array(df["h"], pa.timestamp("us")),
        "n": pa.array(df["n"], pa.int64()),
    })
    import ray.data as rd
    out = densify_time(rd.from_arrow(tbl).repartition(2), keys=["k"],
                       bucket_col="h", value_cols={"n": 0}, freq="h") \
        .to_pandas().sort_values(["k", "h"]).reset_index(drop=True)
    # key 1 spans 6 hourly buckets (0,1,2,3,4,5), key 2 exactly 1
    assert len(out) == 7
    k1 = out[out.k == 1]
    assert k1["n"].tolist() == [5, 0, 0, 2, 0, 1]
    assert out[out.k == 2]["n"].tolist() == [9]
    assert str(out["h"].dtype).startswith("datetime64")
