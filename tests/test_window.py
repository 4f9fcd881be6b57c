"""Window operators (row_number / topk_per_key / running_sum) vs a pandas
oracle on a constructed corpus, including tie-breaks, single-row keys, and
schema stability for timestamp columns."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def events_df():
    rng = np.random.default_rng(5)
    n = 500
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 23, n).astype(np.int64),
        # coarse timestamps force plenty of ties → event_id tie-break matters
        "ts": pd.to_datetime(
            rng.integers(0, 50, n) * 3600, unit="s").astype("datetime64[us]"),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })


def _ds(ray_session, df):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df,
                                              preserve_index=False)) \
        .repartition(6)


def test_row_number_matches_pandas(ray_session, events_df):
    from information_extraction_system_ray.functions.window import row_number

    ds = _ds(ray_session, events_df)
    got = row_number(ds, keys=["user_id"], order_by=["ts", "event_id"],
                     descending=[True, False], num_partitions=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)

    want = events_df.sort_values(["ts", "event_id"],
                                 ascending=[False, True], kind="mergesort")
    want = want.assign(rn=want.groupby("user_id", sort=False).cumcount() + 1)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert list(got["rn"]) == list(want["rn"])
    # timestamp precision must survive the pandas pass
    assert got["ts"].dtype == events_df["ts"].dtype


def test_topk_per_key(ray_session, events_df):
    from information_extraction_system_ray.functions.window import \
        topk_per_key

    ds = _ds(ray_session, events_df)
    got = topk_per_key(ds, 2, keys=["user_id"],
                       order_by=["ts", "event_id"],
                       descending=[True, False]).to_pandas()
    assert got["rn"].max() <= 2
    # every user with ≥2 events contributes exactly 2 rows
    sizes = events_df.groupby("user_id").size()
    want_rows = int(np.minimum(sizes, 2).sum())
    assert len(got) == want_rows


def test_running_sum_matches_pandas(ray_session, events_df):
    from information_extraction_system_ray.functions.window import \
        running_sum

    ds = _ds(ray_session, events_df)
    got = running_sum(ds, "v", keys=["user_id"],
                      order_by=["ts", "event_id"], out_col="cum") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)

    want = events_df.sort_values(["ts", "event_id"], kind="mergesort")
    want = want.assign(cum=want.groupby("user_id", sort=False)["v"].cumsum())
    want = want.sort_values("event_id").reset_index(drop=True)
    assert list(got["cum"]) == list(want["cum"])
    assert got["cum"].dtype == np.int64


def test_window_single_and_empty_key_partitions(ray_session):
    """1-row dataset and num_partitions ≫ keys (most partitions empty):
    block schemas must stay stable and the row number must be 1."""
    import ray.data as rd

    from information_extraction_system_ray.functions.window import row_number

    df = pd.DataFrame({"k": pd.array([7], dtype="int64"),
                       "o": pd.array([3], dtype="int64")})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = row_number(ds, keys=["k"], order_by=["o"],
                     num_partitions=8).to_pandas()
    assert got.to_dict("records") == [{"k": 7, "o": 3, "rn": 1}]


def test_global_running_sum_matches_pandas(ray_session):
    """global_running_sum == pandas sorted cumsum on random int data,
    with duplicate sort keys broken by a unique column, across block
    layouts and partition counts (incl. more partitions than rows)."""
    import random

    import pyarrow as pa
    import ray.data as rd
    from information_extraction_system_ray.functions.rank import \
        global_running_sum

    rng = random.Random(11)
    n = 500
    df = pd.DataFrame({
        "id": range(n),
        "k": [rng.randrange(40) for _ in range(n)],   # heavy duplicates
        "v": [rng.randrange(-50, 100) for _ in range(n)],
    })
    want = df.sort_values(["k", "id"]).reset_index(drop=True)
    want["cum"] = want["v"].cumsum()

    for nblocks, nparts in [(6, 8), (1, 4), (13, 3), (4, 1000)]:
        ds = rd.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False)).repartition(nblocks)
        got = global_running_sum(ds, "v", order_by=["k", "id"],
                                 num_partitions=nparts).to_pandas()
        got = got.sort_values(["k", "id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "id", "v", "cum"]],
                                      want[["k", "id", "v", "cum"]],
                                      check_dtype=False)


def test_global_running_sum_rejects_float_values(ray_session):
    """ADVICE r2 (rank.py:207): value_col must be integer — floats were
    silently truncated by the int64 partial sums; now a ValueError."""
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from information_extraction_system_ray.functions.rank import \
        global_running_sum

    ds = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()),
                                 "v": pa.array([1.5, 2.5], pa.float64())}))
    with pytest.raises(ValueError, match="integer value_col"):
        global_running_sum(ds, "v", order_by=["id"])


def test_global_row_number_skewed_first_key(ray_session):
    """ADVICE r2 (rank.py:63): one dominant first-key value used to map
    ~all rows into a single range partition. The composite-split
    fallback must keep the result identical to pandas while the skew is
    divided by the secondary key."""
    import pyarrow as pa
    import ray.data as rd
    from information_extraction_system_ray.functions.rank import (
        global_row_number, global_running_sum)

    n = 2000
    df = pd.DataFrame({
        "id": range(n),
        "k": [5] * (n - 20) + list(range(100, 120)),  # 99% one hot value
        "v": [(i * 7) % 23 for i in range(n)],
    })
    want = df.sort_values(["k", "id"]).reset_index(drop=True)
    want["rn"] = range(1, n + 1)
    want["cum"] = want["v"].cumsum()

    for nblocks in (3, 11):
        ds = rd.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False)).repartition(nblocks)
        got = global_row_number(ds, order_by=["k", "id"],
                                num_partitions=8).to_pandas()
        got = got.sort_values(["k", "id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "id", "rn"]],
                                      want[["k", "id", "rn"]],
                                      check_dtype=False)
        got2 = global_running_sum(ds, "v", order_by=["k", "id"],
                                  num_partitions=8).to_pandas()
        got2 = got2.sort_values(["k", "id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got2[["k", "id", "v", "cum"]],
                                      want[["k", "id", "v", "cum"]],
                                      check_dtype=False)


def test_dense_rank_null_order_values_are_peers(ray_session):
    """ADVICE r2 (window.py:269): tied NULL order values must share a
    rank (SQL nulls-are-peers). Composite ORDER BY path vs DuckDB."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd
    from information_extraction_system_ray.functions.window import (
        dense_rank, rank_per_key)

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 1, 2, 2, 2], pa.int64()),
        "a": pa.array([5, 5, None, None, 7, None, None, 1], pa.int64()),
        "b": pa.array([1, 1, 2, 2, 3, 4, 4, 5], pa.int64()),
        "id": pa.array(range(8), pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT id,
               DENSE_RANK() OVER (PARTITION BY k ORDER BY a, b) AS dr,
               RANK() OVER (PARTITION BY k ORDER BY a, b) AS rk
        FROM t ORDER BY id""").df()

    ds = rd.from_arrow(t).repartition(3)
    got_dr = (dense_rank(ds, keys=["k"], order_by=["a", "b"],
                         out_col="dr", num_partitions=4)
              .to_pandas().sort_values("id").reset_index(drop=True))
    got_rk = (rank_per_key(ds, keys=["k"], order_by=["a", "b"],
                           out_col="rk", num_partitions=4)
              .to_pandas().sort_values("id").reset_index(drop=True))
    assert got_dr["dr"].astype(int).tolist() == want["dr"].astype(int).tolist()
    assert got_rk["rk"].astype(int).tolist() == want["rk"].astype(int).tolist()
