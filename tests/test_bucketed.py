"""functions/bucketed.py — the institutionalized near-unique-key idiom
(r4 VERDICT #3): helpers must be exact vs plain pandas recomputation and
must emit Arrow blocks with the INPUT column types pinned (the r4
pandas-block / timestamp-widening hazards)."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from information_extraction_system_ray.functions.bucketed import (
    add_bucket, bucketed_count, bucketed_distinct, bucketed_groups)


def test_add_bucket_deterministic_and_colocating():
    t = pa.table({
        "a": pa.array([1, 2, 1, 2, 3], pa.int64()),
        "b": pa.array(["x", "y", "x", "y", "z"], pa.string())})
    out1 = add_bucket(t, ["a", "b"], 8)
    out2 = add_bucket(t, ["a", "b"], 8)
    assert out1.equals(out2)
    bk = out1["_bk"].to_pylist()
    # identical keys land in identical buckets (rows 0/2 and 1/3)
    assert bk[0] == bk[2] and bk[1] == bk[3]
    assert out1.schema.field("_bk").type == pa.int64()
    assert all(0 <= x < 8 for x in bk)


@pytest.mark.usefixtures("ray_session")
def test_bucketed_distinct_and_count_exact():
    import ray.data as rd

    rng = np.random.RandomState(7)
    n = 5000
    df = pd.DataFrame({
        "k1": rng.randint(0, 900, n).astype(np.int64),
        "k2": rng.choice(list("abcdef"), n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10, n), unit="D"),
    })
    t = pa.Table.from_pandas(df, preserve_index=False) \
        .set_column(2, "ts", pa.Table.from_pandas(df[["ts"]])["ts"]
                    .cast(pa.timestamp("us")))
    ds = rd.from_arrow(t).repartition(6)

    got = bucketed_distinct(ds, ["k1", "k2"]).to_pandas() \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    want = df[["k1", "k2"]].drop_duplicates() \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    gotc = bucketed_count(ds, ["k1", "k2"], alias="n").to_pandas() \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    wantc = df.groupby(["k1", "k2"]).size().rename("n").reset_index() \
        .sort_values(["k1", "k2"]).reset_index(drop=True)
    wantc["n"] = wantc["n"].astype("int64")
    pd.testing.assert_frame_equal(gotc, wantc)

    # timestamp keys survive with µs precision (no pandas ns widening)
    gts = bucketed_distinct(ds, ["ts"])
    assert gts.schema().base_schema.field("ts").type \
        == pa.timestamp("us")
    assert gts.count() == df["ts"].nunique()


@pytest.mark.usefixtures("ray_session")
def test_bucketed_groups_schema_pinned():
    import ray.data as rd

    t = pa.table({"k": pa.array([1, 1, 2, 2, 3], pa.int64()),
                  "v": pa.array([10, 20, 30, 40, 50], pa.int64())})
    out_schema = pa.schema([("k", pa.int64()), ("v_sum", pa.int64())])

    def fn(g: pd.DataFrame) -> pa.Table:
        vc = g.groupby("k", sort=False)["v"].sum().reset_index(
            name="v_sum")
        return pa.Table.from_pandas(vc, preserve_index=False)

    got = bucketed_groups(rd.from_arrow(t).repartition(3), ["k"], fn,
                          out_schema=out_schema).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(got["v_sum"]) == [30, 70, 50]
