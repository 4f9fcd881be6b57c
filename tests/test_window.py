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
