"""Driver-facing operator registry: ``queries()`` + ``oracle_sql()``.

One entry per implemented operator family from SURVEY.md §2, each exercised
over the driver's Parquet tables (TESTDATA.md) with a matching ANSI-SQL
oracle for DuckDB. Column names match EXACTLY between the Ray result and the
SQL (driver hashes values after sorting columns by name).

Determinism rules (the driver compares order-insensitive value hashes):
- monetary aggregates are computed in integer CENTS (``*_cents``: int64) so
  floating summation order cannot flip a rounding boundary;
- averages are written as exact-integer-sum / count in BOTH engines;
- float outputs (cosine) are rounded to 4 dp with float64 math on both sides;
- top-k sorts break ties on a unique key.

Non-SQL-expressible operators (flagship KG stages over synthesized pages,
MinHash/SimHash dedup, IVF ANN, language-ID heuristic, multimodal stubs)
register a query WITHOUT an oracle entry → the driver records the weaker
rows-only check, and tests/ hold their real oracles (refimpl goldens).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .functions.bucketed import add_bucket
from .sources.tables import read_table


def _join_parts(sf_dir: str, table: str = "lineitem") -> int:
    """Hash-join partition count sized from the probe side: ~250k rows per
    partition, clamped to [2, 64]. Each partition is a shuffle-aggregator
    actor (~0.5 s spawn), so small inputs must not pay 16 spawns; at 100 TB
    the same rule yields the 64-partition ceiling and should be raised with
    cluster size."""
    rows = pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows
    return max(2, min(64, rows // 250_000))


def _cents(col):
    # half_towards_infinity == round-half-away-from-zero == DuckDB round();
    # pyarrow's default is banker's rounding, which diverges on .5 boundaries
    return pc.cast(pc.round(pc.multiply(col, 100.0),
                            round_mode="half_towards_infinity"),
                   pa.int64())


# --------------------------------------------------------------------------
# TPC-H-ish generic operators (SURVEY.md §2.2, §2.4-2.7)
# --------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """G: grouped aggregate with per-batch vectorized derived columns."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(
            t["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us"))))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": pc.cast(t["l_quantity"], pa.int64()),
            "base_cents": _cents(t["l_extendedprice"]),
            "disc_cents": _cents(disc),
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty", alias_name="sum_qty"),
                      Sum("base_cents", alias_name="sum_base_cents"),
                      Sum("disc_cents", alias_name="sum_disc_cents"),
                      Count(alias_name="count_order")))
    return out.sort(["l_returnflag", "l_linestatus"])


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
           AS sum_base_cents,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
           AS BIGINT) AS sum_disc_cents,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q6_revenue_filter(sf_dir: str):
    """M/G: vectorized predicate + global aggregate (no groupby shuffle)."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_quantity", "l_extendedprice", "l_discount",
                             "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07))),
            pc.less(t["l_quantity"], pa.scalar(24.0)))
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"rev_cents": _cents(rev)})

    total = ds.map_batches(prep, batch_format="pyarrow").sum("rev_cents")
    return pa.table({"revenue_cents": pa.array([int(total)], pa.int64())})


_Q6_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice*l_discount*100) AS BIGINT))
       AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q3_top_orders(sf_dir: str):
    """J3 + G + O2: broadcast semi-join (small side) → hash join (large) →
    grouped aggregate → top-k."""
    from .functions.joins import auto_semi_join

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    building = cust.map_batches(
        lambda t: t.filter(
            pc.equal(t["c_mktsegment"], pa.scalar("BUILDING")))
        .select(["c_custkey"]), batch_format="pyarrow")

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders_d = orders.map_batches(
        lambda t: t.filter(pc.less(
            t["o_orderdate"],
            pa.scalar(np.datetime64("1995-03-15", "us")))),
        batch_format="pyarrow")
    # segment-customer filter: broadcast is_in below the key threshold,
    # co-partitioned semi join above it (the key set grows with sf —
    # VERDICT r3 item #5)
    orders_f = auto_semi_join(orders_d, building, left_key="o_custkey",
                              right_key="c_custkey").map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])

    def prep_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(
            t["l_shipdate"], pa.scalar(np.datetime64("1995-03-15", "us"))))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_cents": _cents(rev)})

    li_f = li.map_batches(prep_li, batch_format="pyarrow")
    joined = li_f.join(orders_f, join_type="inner",
                       num_partitions=_join_parts(sf_dir),
                       on=("l_orderkey",), right_on=("o_orderkey",))
    agg = (joined.groupby("l_orderkey")
           .aggregate(Sum("rev_cents", alias_name="revenue_cents")))
    return agg.sort(["revenue_cents", "l_orderkey"],
                    descending=[True, False]).limit(10)


_Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
           AS BIGINT) AS revenue_cents
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
"""


def join_customer_nation_region(sf_dir: str):
    """J1: two-level broadcast dimension join (region→nation→customer)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    n2r = dict(zip(nation["n_nationkey"],
                   nation["n_regionkey"].map(
                       dict(zip(region["r_regionkey"], region["r_name"])))))
    ref = ray.put(n2r)

    cust = read_table(sf_dir, "customer",
                      columns=["c_nationkey", "c_acctbal"])

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        rn = [m[k] for k in t["c_nationkey"].to_pylist()]
        return pa.table({
            "r_name": pa.array(rn, pa.string()),
            "bal_cents": _cents(t["c_acctbal"]),
        })

    return (cust.map_batches(attach, batch_format="pyarrow")
            .groupby("r_name")
            .aggregate(Count(alias_name="n_customers"),
                       Sum("bal_cents", alias_name="sum_bal_cents"))
            .sort("r_name"))


_JOIN_CNR_SQL = """
SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
           AS sum_bal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q5_local_supplier(sf_dir: str):
    """J1+J3+G composition (TPC-H Q5 shape): 6-table join — dims
    (region, nation, supplier, customer) broadcast once via ray.put, the
    single LARGE⋈LARGE (lineitem ⋈ orders) as a hash join, grouped revenue
    where supplier and customer share the nation. At real scale customer
    stops being broadcastable and becomes a second hash join — same plan
    shape, swap J1 for J3 (documented trade-off, SURVEY.md §2.4)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    asia = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
    asia_nations = nation[nation["n_regionkey"].isin(asia)]
    nat_name = dict(zip(asia_nations["n_nationkey"],
                        asia_nations["n_name"]))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    c_nat = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    s_nat = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))
    nn_ref = ray.put(nat_name)

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(t: pa.Table) -> pa.Table:
        m = ray.get(c_nat)
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"],
                                              pa.scalar(lo)),
                             pc.less(t["o_orderdate"], pa.scalar(hi))))
        cn = pd.Series(t["o_custkey"].to_pandas()).map(m)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "c_nat": pa.array(cn, pa.int32())})

    orders_f = orders.map_batches(prep_orders, batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"])

    def prep_li(t: pa.Table) -> pa.Table:
        m = ray.get(s_nat)
        names = ray.get(nn_ref)
        sn = pd.Series(t["l_suppkey"].to_pandas()).map(m)
        keep = sn.isin(names).to_numpy()
        t = t.filter(pa.array(keep))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "s_nat": pa.array(sn[keep], pa.int32()),
                         "rev_cents": _cents(rev)})

    li_f = li.map_batches(prep_li, batch_format="pyarrow")
    joined = li_f.join(orders_f, join_type="inner",
                       num_partitions=_join_parts(sf_dir),
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def local(t: pa.Table) -> pa.Table:
        names = ray.get(nn_ref)
        t = t.filter(pc.equal(t["s_nat"], t["c_nat"]))
        nm = [names[x] for x in t["s_nat"].to_pylist()]
        return pa.table({"n_name": pa.array(nm, pa.string()),
                         "rev_cents": t["rev_cents"]})

    return (joined.map_batches(local, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("rev_cents", alias_name="revenue_cents"))
            .sort("n_name"))


_Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
           AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY n_name
"""


def sort_topk_orders(sf_dir: str):
    """O1/O2/O4: sort-based top-k with unique tie-break key."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(20)


_SORT_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def distinct_segments(sf_dir: str):
    """G5: distinct values of one column."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


_DISTINCT_SQL = \
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


def group_nation_balance(sf_dir: str):
    """G1-style grouped aggregate with min/max/count."""
    ds = read_table(sf_dir, "customer",
                    columns=["c_nationkey", "c_acctbal", "c_custkey"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"c_nationkey": t["c_nationkey"],
                         "bal_cents": _cents(t["c_acctbal"]),
                         "c_custkey": t["c_custkey"]})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("c_nationkey")
            .aggregate(Count(alias_name="n"),
                       Sum("bal_cents", alias_name="sum_bal_cents"),
                       Min("c_custkey", alias_name="min_custkey"),
                       Max("c_custkey", alias_name="max_custkey"))
            .sort("c_nationkey"))


_GROUP_NATION_SQL = """
SELECT c_nationkey, COUNT(*) AS n,
       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
           AS sum_bal_cents,
       MIN(c_custkey) AS min_custkey, MAX(c_custkey) AS max_custkey
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


def dedup_orders_per_customer(sf_dir: str):
    """D1-pattern: keep min(o_orderkey) row per o_custkey (hash-partition +
    per-group first)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return (ds.groupby("o_custkey")
            .aggregate(Min("o_orderkey", alias_name="first_orderkey"))
            .sort("o_custkey"))


_DEDUP_ORDERS_SQL = """
SELECT o_custkey, MIN(o_orderkey) AS first_orderkey
FROM orders GROUP BY o_custkey ORDER BY o_custkey
"""


def union_key_sources(sf_dir: str):
    """D3: union of two sources + grouped count."""
    c = read_table(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: pa.table({"src": pa.array(["customer"] * len(t)),
                            "key": t["c_custkey"]}),
        batch_format="pyarrow")
    s = read_table(sf_dir, "supplier", columns=["s_suppkey"]).map_batches(
        lambda t: pa.table({"src": pa.array(["supplier"] * len(t)),
                            "key": t["s_suppkey"]}),
        batch_format="pyarrow")
    return (c.union(s).groupby("src")
            .aggregate(Count(alias_name="n"),
                       Sum("key", alias_name="key_sum"))
            .sort("src"))


_UNION_SQL = """
SELECT src, COUNT(*) AS n, CAST(SUM(key) AS BIGINT) AS key_sum FROM (
  SELECT 'customer' AS src, c_custkey AS key FROM customer
  UNION ALL
  SELECT 'supplier' AS src, s_suppkey AS key FROM supplier
) GROUP BY src ORDER BY src
"""


def part_type_stats(sf_dir: str):
    ds = read_table(sf_dir, "part",
                    columns=["p_type", "p_size", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"p_type": t["p_type"], "p_size": t["p_size"],
                         "price_cents": _cents(t["p_retailprice"])})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("p_type")
            .aggregate(Count(alias_name="n"),
                       Max("p_size", alias_name="max_size"),
                       Sum("price_cents", alias_name="sum_price_cents"))
            .sort("p_type"))


_PART_TYPE_SQL = """
SELECT p_type, COUNT(*) AS n, MAX(p_size) AS max_size,
       CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM part GROUP BY p_type ORDER BY p_type
"""


def segment_order_revenue(sf_dir: str):
    """J3: generic large-large hash equi-join (ds.join, no broadcast) —
    orders ⋈ customer on custkey → grouped revenue per market segment."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({"o_custkey": t["o_custkey"],
                            "price_cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner",
                         num_partitions=_join_parts(sf_dir, "orders"),
                         on=("o_custkey",), right_on=("c_custkey",))
    return (joined.groupby("c_mktsegment")
            .aggregate(Count(alias_name="n_orders"),
                       Sum("price_cents", alias_name="sum_price_cents"))
            .sort("c_mktsegment"))


_SEGMENT_REV_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# events: timestamp bucketing + JSON scalar functions (SURVEY.md §2.8)
# --------------------------------------------------------------------------

def events_hourly(sf_dir: str):
    ds = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "event_type": t["event_type"],
            "value_cents": _cents(t["value"]),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(["hour", "event_type"])
            .aggregate(Count(alias_name="n"),
                       Sum("value_cents", alias_name="sum_value_cents"))
            .sort(["hour", "event_type"]))


_EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM events GROUP BY hour, event_type ORDER BY hour, event_type
"""


def events_json_extract(sf_dir: str):
    """M8: per-row JSON parse + grouped count over the extracted value."""
    ds = read_table(sf_dir, "events", columns=["event_id", "props"],
                    rows_per_block=25_000)

    def prep(t: pa.Table) -> pa.Table:
        ks = [str(json.loads(p)["k"]) for p in t["props"].to_pylist()]
        return pa.table({"k_str": pa.array(ks, pa.string())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("k_str").aggregate(Count(alias_name="n"))
            .sort("k_str"))


_EVENTS_JSON_SQL = """
SELECT json_extract_string(props, '$.k') AS k_str, COUNT(*) AS n
FROM events GROUP BY k_str ORDER BY k_str
"""


def events_user_topk(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "value_cents": _cents(t["value"])})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Sum("value_cents", alias_name="sum_value_cents"))
            .sort(["sum_value_cents", "user_id"], descending=[True, False])
            .limit(10))


_EVENTS_TOPK_SQL = """
SELECT user_id,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM events GROUP BY user_id
ORDER BY sum_value_cents DESC, user_id LIMIT 10
"""


def events_type_skew(sf_dir: str):
    """O3 skew probe: heaviest group keys (groupby count → top-k)."""
    ds = read_table(sf_dir, "events", columns=["event_type"])
    return (ds.groupby("event_type").aggregate(Count(alias_name="n"))
            .sort(["n", "event_type"], descending=[True, False]).limit(5))


_EVENTS_SKEW_SQL = """
SELECT event_type, COUNT(*) AS n FROM events
GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5
"""


def events_asof_orders(sf_dir: str):
    """Custom operator (as-of join, absent from Ray Data): for each event,
    the latest order of the same user at or before the event time. Output is
    the matched ORDER DATE (tie-deterministic), grouped per user for a
    compact, hash-stable result."""
    from .functions.asof import asof_join_backward

    events = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "ts"],
                        rows_per_block=50_000)
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"])
    m = asof_join_backward(events, orders,
                           left_by="user_id", right_by="o_custkey",
                           left_ts="ts", right_ts="o_orderdate",
                           out_col="last_order_date")

    def prep(t: pa.Table) -> pa.Table:
        # Group on an INT64 epoch-µs key: Ray's hash aggregate roundtrips
        # keys through numpy, degrading day-floored timestamp[us] to [s].
        day = pc.cast(pc.floor_temporal(t["last_order_date"], unit="day"),
                      pa.timestamp("us"))
        return pa.table({"user_id": t["user_id"],
                         "day_us": pc.cast(day, pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "last_order_day": pc.cast(t["day_us"],
                                                   pa.timestamp("us")),
                         "n_events": t["n_events"]})

    return (m.map_batches(prep, batch_format="pyarrow")
            .groupby(["user_id", "day_us"])
            .aggregate(Count(alias_name="n_events"))
            .map_batches(finish, batch_format="pyarrow")
            .sort(["user_id", "last_order_day"]))


_EVENTS_ASOF_SQL = """
SELECT user_id, CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)
           AS last_order_day,
       COUNT(*) AS n_events
FROM events e ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY user_id, last_order_day ORDER BY user_id, last_order_day
"""


def events_salted_type_count(sf_dir: str):
    """G + §4 skew defusal: SALTED two-phase grouped aggregate — result is
    identical to the plain groupby (the SQL oracle), which is the point."""
    from .functions.salted import salted_group_sum

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return (salted_group_sum(ds, "event_type", value="user_id",
                             num_salts=16)
            .rename_columns({"sum_user_id": "sum_uid"})
            .sort("event_type"))


_EVENTS_SALTED_SQL = """
SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS sum_uid
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_latest_per_user(sf_dir: str):
    """Window operator (row_number per key, absent from Ray Data): the 3
    most recent events per user with their rank — one hash-partitioned
    shuffle, one vectorized sort+cumcount pass per partition."""
    from .functions.window import topk_per_key

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    out = topk_per_key(ds, 3, keys=["user_id"],
                       order_by=["ts", "event_id"],
                       descending=[True, False])
    return out.sort(["user_id", "rn"])


_EVENTS_LATEST_SQL = """
SELECT event_id, user_id, ts, event_type, rn FROM (
  SELECT event_id, user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id) AS rn
  FROM events) t WHERE rn <= 3 ORDER BY user_id, rn
"""


def events_user_cumspend(sf_dir: str):
    """Window operator (running aggregate): per-user cumulative spend in
    (ts, event_id) order, in integer cents so the result is bit-exact
    across engines."""
    from .functions.window import running_sum

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                        pa.int64())
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "ts": t["ts"], "cents": cents})

    out = running_sum(ds.map_batches(prep, batch_format="pyarrow"),
                      "cents", keys=["user_id"],
                      order_by=["ts", "event_id"], out_col="cum_cents")
    return (out.select_columns(["user_id", "event_id", "cum_cents"])
            .sort(["user_id", "event_id"]))


_EVENTS_CUMSPEND_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM events ORDER BY user_id, event_id
"""


def pages_url_dedup(sf_dir: str):
    """D4: url-level dedup of a pages table with injected re-captures —
    rows-only (synthetic pages corpus; exact semantics in tests)."""
    from .functions.dedup import dedup_pages_by_url
    from .sources.pages import synth_pages

    n = max(64, _n_pages(sf_dir) // 20)
    base = synth_pages(n)
    # seed-43 corpus shares urls where langs coincide → genuine re-captures
    dup = synth_pages(n // 4, seed=43)
    out = dedup_pages_by_url(base.union(dup))
    return out.map_batches(
        lambda t: pa.table({"url": t["url"]}),
        batch_format="pyarrow").sort("url")


def events_sessionize(sf_dir: str):
    """Windowed streaming-style operator: per-user session ids with a
    7-day inactivity gap — LAG + conditional cumulative sum, partition-local
    after one hash shuffle."""
    from .functions.window import sessionize

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"])
    out = sessionize(ds, keys=["user_id"], ts_col="ts",
                     order_by=["ts", "event_id"],
                     gap=pd.Timedelta(days=7))
    return (out.select_columns(["user_id", "event_id", "session_id"])
            .sort(["user_id", "event_id"]))


_EVENTS_SESSION_SQL = """
SELECT user_id, event_id, CAST(session_id AS BIGINT) AS session_id FROM (
  SELECT user_id, event_id,
         SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 7 DAY
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM (SELECT user_id, event_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events) a) b
ORDER BY user_id, event_id
"""


def events_value_quantiles(sf_dir: str):
    """Exact distributed quantiles (combiner histogram → groupby → driver
    rank selection over the SMALL distinct-value table), quantile_disc
    semantics, integer cents."""
    from .functions.quantiles import exact_quantiles

    ds = read_table(sf_dir, "events", columns=["value"])
    cents = ds.map_batches(
        lambda t: pa.table({"cents": pc.cast(
            pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())}),
        batch_format="pyarrow")
    df = exact_quantiles(cents, "cents", [0.25, 0.5, 0.75, 0.9, 0.99])
    df["cents"] = df["value"].astype("int64")
    return df[["q", "cents"]]


_EVENTS_QUANTILES_SQL = """
WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events)
SELECT 0.25 AS q, quantile_disc(cents, 0.25) AS cents FROM c
UNION ALL SELECT 0.5, quantile_disc(cents, 0.5) FROM c
UNION ALL SELECT 0.75, quantile_disc(cents, 0.75) FROM c
UNION ALL SELECT 0.9, quantile_disc(cents, 0.9) FROM c
UNION ALL SELECT 0.99, quantile_disc(cents, 0.99) FROM c
ORDER BY q
"""


def events_type_approx_users(sf_dir: str):
    """G6 approximate aggregate: COUNT(DISTINCT user_id) per event_type
    via the mergeable sparse→dense HLL sketch (sketches.py). In the
    sparse regime (≤50k distinct hashes per group — every oracle-run
    scale factor) the sketch is the exact hash set and the answer equals
    SQL ``COUNT(DISTINCT ...)``, so this query now carries a full DuckDB
    oracle (closes the one r2 driver `no_oracle` row); past the
    threshold it degrades gracefully to ~1.6%-error HLL registers with
    bounded memory (error-bound tested in tests/test_new_ops.py)."""
    from .functions.sketches import approx_distinct_by_key

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct_by_key(ds, "event_type", "user_id") \
        .sort("event_type")


_EVENTS_APPROX_USERS_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS approx_distinct
FROM events GROUP BY event_type ORDER BY event_type
"""


def custs_without_events(sf_dir: str):
    """ANTI join (NOT EXISTS): customers with no event activity, counted
    per segment — co-partitioned union+groupby membership filter, probe
    side collapsed to distinct keys per batch before the shuffle."""
    from .functions.joins import anti_join

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    events = read_table(sf_dir, "events", columns=["user_id"])
    left = anti_join(cust, events,
                     left_key="c_custkey", right_key="user_id")
    return (left.groupby("c_mktsegment")
            .aggregate(Count(alias_name="n")).sort("c_mktsegment"))


_CUSTS_NO_EVENTS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def parts_with_lineitems(sf_dir: str):
    """SEMI join (EXISTS) against the BIG side: parts that appear in any
    lineitem, counted per type — same membership-join plan, probe side is
    the large table."""
    from .functions.joins import semi_join

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])
    li = read_table(sf_dir, "lineitem", columns=["l_partkey"])
    kept = semi_join(part, li, left_key="p_partkey", right_key="l_partkey")
    return (kept.groupby("p_type")
            .aggregate(Count(alias_name="n")).sort("p_type"))


_PARTS_SEMI_SQL = """
SELECT p_type, COUNT(*) AS n FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
GROUP BY p_type ORDER BY p_type
"""


def orders_hash_sample(sf_dir: str):
    """Deterministic content-hash sampling (the reproducible train/eval
    subset primitive): keep orders whose md5(o_orderkey) ends in '0'
    (1/16 sample), aggregated per status. Key-derived — identical sample
    on any engine, any row order."""
    import hashlib

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def samp(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_pylist()
        keep = pa.array([hashlib.md5(str(k).encode()).hexdigest()[-1] == "0"
                         for k in keys], pa.bool_())
        t = t.filter(keep)
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "cents": _cents(t["o_totalprice"])})

    return (ds.map_batches(samp, batch_format="pyarrow")
            .groupby("o_orderstatus")
            .aggregate(Count(alias_name="n"),
                       Sum("cents", alias_name="sum_cents"))
            .sort("o_orderstatus"))


_ORDERS_SAMPLE_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 32, 1) = '0'
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def part_brand_number(sf_dir: str):
    """§2.8 scalar-function face: regex extraction (brand number out of
    'Brand#NN') + arithmetic + grouped aggregate, all pyarrow.compute."""
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        num = pc.cast(pc.struct_field(pc.extract_regex(
            t["p_brand"], r"Brand#(?P<bn>\d+)"), "bn"), pa.int64())
        return pa.table({"brand_num": num,
                         "price_cents": _cents(t["p_retailprice"])})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("brand_num")
            .aggregate(Count(alias_name="n"),
                       Sum("price_cents", alias_name="sum_price_cents"))
            .sort("brand_num"))


_PART_BRAND_SQL = r"""
SELECT CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT)
           AS brand_num,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM part GROUP BY brand_num ORDER BY brand_num
"""


def events_type_median_value(sf_dir: str):
    """Grouped exact quantiles: median + p90 spend per event type in
    integer cents — per-key rank selection over a per-partition value
    histogram (hash-partitioned by key; one vectorized pass per
    partition)."""
    from .functions.arrowutil import to_arrow

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        part_ids = pd.util.hash_pandas_object(
            pd.Series(t["event_type"].to_pandas()), index=False) % 8
        return pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                             pa.int64()),
            "part": pa.array(part_ids.to_numpy(), pa.int64()),
        })

    out_schema = pa.schema([("event_type", pa.string()),
                            ("median_cents", pa.int64()),
                            ("p90_cents", pa.int64())])

    def quants(g: pd.DataFrame) -> pa.Table:
        import math
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            v = np.sort(grp["cents"].to_numpy())
            med = v[max(1, math.ceil(0.5 * len(v))) - 1]
            p90 = v[max(1, math.ceil(0.9 * len(v))) - 1]
            rows.append({"event_type": et, "median_cents": int(med),
                         "p90_cents": int(p90)})
        return to_arrow(pd.DataFrame(rows), out_schema)

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(quants, batch_format="pandas")
            .sort("event_type"))


_EVENTS_MEDIAN_SQL = """
SELECT event_type,
       quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.5)
           AS median_cents,
       quantile_disc(CAST(FLOOR(value * 100) AS BIGINT), 0.9)
           AS p90_cents
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_rollup(sf_dir: str):
    """ROLLUP-style aggregate: per-type counts plus a grand-total row
    (event_type NULL), built as groupby + a union'd global aggregate —
    the partial-counts pattern means the total costs one extra tiny
    reduce, not a second scan."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    per = (ds.groupby("event_type")
           .aggregate(Count(alias_name="n")).materialize())
    total = int(per.sum("n") or 0)
    total_t = pa.table({"event_type": pa.array([None], pa.string()),
                        "n": pa.array([total], pa.int64())})
    # no final sort: Ray's sort can't order a null-bearing key column, and
    # the driver's value hash is row-order-insensitive
    return per.union(ray.data.from_arrow(total_t))


_EVENTS_ROLLUP_SQL = """
SELECT event_type, COUNT(*) AS n FROM events
GROUP BY ROLLUP (event_type) ORDER BY event_type
"""


def docs_top_terms(sf_dir: str):
    """Distributed vocabulary build: global term frequencies with a
    per-batch value_counts combiner (head terms cost one row per batch),
    top 50 by (n desc, term asc)."""
    from .functions.terms import top_terms

    ds = read_table(sf_dir, "documents", columns=["text"],
                    rows_per_block=500)
    return top_terms(ds, 50)


_DOCS_TOP_TERMS_SQL = """
SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents) t
GROUP BY term ORDER BY n DESC, term LIMIT 50
"""


def docs_training_prep(sf_dir: str):
    """The composed LLM-training-data-prep flow in one oracle-checked
    pipeline: exact dedup (min-id survivor per content fingerprint) →
    bloom-prefiltered SEMI JOIN back to the full rows → quality gate
    (≥5 tokens, punct ≤ 10% of chars, ASCII semantics) → per-lang corpus
    stats."""
    from .functions.dedup import exact_dedup
    from .functions.joins import semi_join

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "text"],
                      rows_per_block=500)
    survivors = exact_dedup(docs).select_columns(["doc_id"])
    kept = semi_join(docs, survivors, left_key="doc_id",
                     right_key="doc_id", bloom_bits=1 << 16)

    def gate(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(pc.count_substring_regex(t["text"], r"\S+"),
                           pa.int64())
        n_punct = pc.count_substring_regex(t["text"], r"[^A-Za-z0-9\s]")
        n_chars = pc.utf8_length(t["text"])
        keep = pc.and_(pc.greater_equal(n_tokens, 5),
                       pc.less_equal(pc.multiply(n_punct, 10), n_chars))
        return pa.table({"lang": t["lang"],
                         "n_tokens": n_tokens}).filter(keep)

    return (kept.map_batches(gate, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="sum_tokens"))
            .sort("lang"))


_DOCS_PREP_SQL = r"""
WITH survivors AS (
  SELECT MIN(doc_id) AS doc_id FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
), scored AS (
  SELECT d.lang,
         CAST(len(regexp_extract_all(d.text, '\S+')) AS BIGINT)
             AS n_tokens,
         len(regexp_extract_all(d.text, '[^A-Za-z0-9\s]')) AS n_punct,
         length(d.text) AS n_chars
  FROM documents d
  WHERE EXISTS (SELECT 1 FROM survivors s WHERE s.doc_id = d.doc_id)
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM scored WHERE n_tokens >= 5 AND n_punct * 10 <= n_chars
GROUP BY lang ORDER BY lang
"""


def docs_tfidf_knn(sf_dir: str):
    """Composed retrieval pipeline: hashed TF-IDF document vectors
    (df aggregate → broadcast idf → per-batch vectorize) + brute-force
    cosine kNN. Rows-only; numerics gated vs a numpy reference in
    tests/test_new_ops.py."""
    from .functions.tfidf import tfidf_knn

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)
    qdocs = (ds.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 3)),
        batch_format="pyarrow").to_pandas().sort_values("doc_id"))
    out = tfidf_knn(ds, list(qdocs["text"]), 5)
    out["cosine"] = out["cosine"].round(4)
    return out


def raw_docs_ingest(sf_dir: str):
    """S1 second half: raw on-disk documents (.txt/.html/.pdf) →
    read_binary_files → actor-pool decode → pages schema → the flagship
    text stripper. Rows-only (no SQL over a file tree); byte-level
    semantics are golden-tested in tests/test_rawdocs.py."""
    import os

    from .sources.rawdocs import ingest_documents
    from .stages.strip import extract_text
    from refimpl import SEED
    from refimpl.pagegen import gen_page

    n = max(60, _n_pages(sf_dir) // 200)
    root = f"/tmp/information_extraction_system_ray_rawdocs_{SEED}_{n}"
    if not os.path.exists(os.path.join(root, "_complete")):
        os.makedirs(root, exist_ok=True)
        for i in range(n):
            p = gen_page(i, SEED)
            if i % 3 == 0:
                path, data = f"doc{i:04d}.txt", p.text.encode()
            elif i % 3 == 1:
                path, data = f"doc{i:04d}.html", p.html
            else:
                path, data = f"doc{i:04d}.pdf", p.html  # opaque stub bytes
            with open(os.path.join(root, path), "wb") as fh:
                fh.write(data)
        open(os.path.join(root, "_complete"), "w").close()

    pages = ingest_documents(root, concurrency=(1, 2))
    ext = extract_text(pages, num_parts=8, with_sha=False)
    return ext.map_batches(
        lambda t: pa.table({
            "url": t["url"],
            "lang": t["lang"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        }), batch_format="pyarrow").sort("url")


def orders_kfold(sf_dir: str):
    """S2/O3: deterministic k-fold assignment by key hash-bucket (the
    train/test-split primitive; fold must be key-derived, never row-order)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        fold = pc.cast(
            pc.subtract(t["o_orderkey"],
                        pc.multiply(pc.divide(t["o_orderkey"], pa.scalar(5)),
                                    pa.scalar(5))), pa.int32())
        return pa.table({"fold": fold,
                         "price_cents": _cents(t["o_totalprice"])})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("fold")
            .aggregate(Count(alias_name="n"),
                       Sum("price_cents", alias_name="sum_price_cents"))
            .sort("fold"))


_ORDERS_KFOLD_SQL = """
SELECT CAST(o_orderkey % 5 AS INTEGER) AS fold, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders GROUP BY fold ORDER BY fold
"""


# --------------------------------------------------------------------------
# documents: text analysis + dedup (system-prompt training-data operators)
# --------------------------------------------------------------------------

def docs_lang_count(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n")).sort("lang")


_DOCS_LANG_SQL = \
    "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY lang"


def docs_token_counts(sf_dir: str):
    """Per-doc whitespace + BPE-ish subword token counts (integers)."""
    from .functions.text import token_count_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)
    return ds.map_batches(
        lambda t: token_count_batch(t).select(
            ["doc_id", "n_tokens", "n_subwords"]),
        batch_format="pyarrow").sort("doc_id")


_DOCS_TOKENS_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))
            AS BIGINT) AS n_subwords
FROM documents ORDER BY doc_id
"""


def docs_quality_counts(sf_dir: str):
    """Integer quality signals per lang (exact, SQL-checkable face of the
    quality scorer; the float composite is tested in tests/)."""
    from .functions.text import STOPWORDS, _WORD_RE

    ds = read_table(sf_dir, "documents", columns=["lang", "text"],
                    rows_per_block=500)

    def prep(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        # punct counted with the SAME ASCII class as the oracle SQL
        # ([^A-Za-z0-9\s]) — Unicode-aware isalnum() diverges on any
        # non-ASCII letter (e.g. 'für') — and vectorized in Arrow
        n_punct = pc.cast(pc.count_substring_regex(
            t["text"], r"[^A-Za-z0-9\s]"), pa.int64())
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        n_stop = [sum(w.lower() in STOPWORDS
                      for w in _WORD_RE.findall(x or "")) for x in texts]
        return pa.table({
            "lang": t["lang"],
            "n_chars": n_chars,
            "n_punct": n_punct,
            "n_stop": pa.array(n_stop, pa.int64()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_chars", alias_name="sum_chars"),
                       Sum("n_punct", alias_name="sum_punct"),
                       Sum("n_stop", alias_name="sum_stop"))
            .sort("lang"))


_DOCS_QUALITY_SQL = r"""
SELECT lang,
  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
  CAST(SUM(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))) AS BIGINT)
      AS sum_punct,
  CAST(SUM(len(list_filter(regexp_extract_all(lower(text), '\S+'),
      w -> w IN ('the','a','an','and','or','of','in','on','for','with',
                 'to','is','was','at','by','it','as','be','are'))))
      AS BIGINT) AS sum_stop
FROM documents GROUP BY lang ORDER BY lang
"""


def docs_fingerprint(sf_dir: str):
    """Per-doc md5 content fingerprint (SQL-identical normalization)."""
    from .functions.text import fingerprint_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)
    return ds.map_batches(
        lambda t: fingerprint_batch(t).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow").sort("doc_id")


_DOCS_FP_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           AS fingerprint
FROM documents ORDER BY doc_id
"""


def docs_exact_dedup(sf_dir: str):
    """D1: exact dedup — min doc_id survivor per content fingerprint."""
    from .functions.dedup import exact_dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)
    return exact_dedup(ds).sort("doc_id")


_DOCS_DEDUP_SQL = r"""
SELECT MIN(doc_id) AS doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           AS fingerprint
FROM documents GROUP BY fingerprint ORDER BY doc_id
"""


def docs_minhash_pairs(sf_dir: str):
    """Near-dup pairs (MinHash+LSH) — rows-only (hash family not SQL)."""
    from .functions.dedup import minhash_lsh_duplicates

    # smallest blocks: per-doc signature cost dominates (64 perms x shingles)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=100)
    return minhash_lsh_duplicates(ds, num_perm=64, bands=32,
                                  jaccard_threshold=0.5)


def docs_simhash(sf_dir: str):
    """Per-doc 64-bit SimHash — rows-only."""
    from .functions.dedup import simhash_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)
    return ds.map_batches(simhash_batch, batch_format="pyarrow") \
        .sort("doc_id")


def docs_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs, min-shingle co-bucketed —
    rows-only (shingle hash family not SQL)."""
    from .functions.dedup import ngram_jaccard_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)
    return ngram_jaccard_pairs(ds, shingle_k=3, threshold=0.5)


def docs_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (Hamming ≤ 3, prefix-bucketed) — rows-only."""
    from .functions.dedup import simhash_duplicates

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)
    return simhash_duplicates(ds, max_hamming=3)


def docs_langid(sf_dir: str):
    """Heuristic language-ID agreement counts — rows-only."""
    from .functions.text import langid_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"],
                    rows_per_block=500)
    return (ds.map_batches(langid_batch, batch_format="pyarrow")
            .groupby(["lang", "lang_pred"])
            .aggregate(Count(alias_name="n"))
            .sort(["lang", "lang_pred"]))


# --------------------------------------------------------------------------
# embeddings: similarity search (system-prompt operators)
# --------------------------------------------------------------------------

def emb_label_count(sf_dir: str):
    ds = read_table(sf_dir, "embeddings", columns=["label"])
    return ds.groupby("label").aggregate(Count(alias_name="n")).sort("label")


_EMB_LABEL_SQL = \
    "SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label ORDER BY label"


def emb_knn_bruteforce(sf_dir: str):
    """Exact cosine top-5 to the vec_id=0 vector (float64, round 4dp).
    The query vector comes from ``fetch_value`` (row-group-pruned point
    read; VERDICT r3 item #6), not a full-table scan."""
    from .functions.similarity import knn_bruteforce
    from .sources.tables import fetch_value

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                    rows_per_block=2_000)
    q = np.array(fetch_value(sf_dir, "embeddings", key_col="vec_id",
                             key=0, value_col="embedding"),
                 dtype=np.float64)
    res = knn_bruteforce(
        ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["vec_id"], pa.scalar(0))),
            batch_format="pyarrow"),
        q[None, :], k=5)
    res = res.drop(columns=["query_id", "rank"])
    # integer basis points, float64 math + half-away-from-zero on BOTH
    # engines → hash-stable (raw float round-trips differ in the last ulp)
    c = res.pop("cosine").to_numpy(dtype=np.float64)
    res["cosine_bp"] = (np.sign(c)
                        * np.floor(np.abs(c) * 10000 + 0.5)).astype(np.int64)
    return res.sort_values("vec_id").reset_index(drop=True)


_EMB_KNN_SQL = """
SELECT vec_id, cosine_bp FROM (
  SELECT e.vec_id AS vec_id,
         CAST(round(list_cosine_similarity(
             CAST(e.embedding AS DOUBLE[]),
             CAST(q.embedding AS DOUBLE[])) * 10000) AS BIGINT)
             AS cosine_bp
  FROM embeddings e,
       (SELECT embedding FROM embeddings WHERE vec_id = 0) q
  WHERE e.vec_id <> 0
  ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(q.embedding AS DOUBLE[])) DESC,
           e.vec_id
  LIMIT 5
) ORDER BY vec_id
"""


def emb_knn_ivf(sf_dir: str):
    """Approximate ANN (IVF buckets) — rows-only (recall tested in
    tests/). Query vector via ``fetch_value`` point read (VERDICT r3
    item #6), not a full-table scan."""
    from .functions.similarity import knn_ivf
    from .sources.tables import fetch_value

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                    rows_per_block=2_000)
    q = np.array(fetch_value(sf_dir, "embeddings", key_col="vec_id",
                             key=0, value_col="embedding"),
                 dtype=np.float32)
    return knn_ivf(ds, q[None, :], k=10, num_centroids=8, nprobe=4)


def emb_cosine_dup_pairs(sf_dir: str):
    """Embedding near-dup pairs — rows-only."""
    from .functions.dedup import embedding_cosine_duplicates

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                    rows_per_block=2_000)
    return embedding_cosine_duplicates(ds, threshold=0.95, num_buckets=8)


# --------------------------------------------------------------------------
# multimodal (binary payload columns) — rows-only. media_* run the
# deterministic fake codec over opaque payloads (plumbing oracle:
# tests/test_multimodal.py); media_real_image_features runs the REAL
# pure-stdlib PPM codec end-to-end (pixel-level oracle:
# tests/test_mediacodec.py)
# --------------------------------------------------------------------------

def _n_media(sf_dir: str) -> int:
    return max(64, pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
               // 100)


def media_image_features(sf_dir: str):
    """Actor-pool image decode → 64-d feature column (fake codec)."""
    from .stages.multimodal import decode_images, synth_media

    out = decode_images(synth_media(_n_media(sf_dir)), size=32).to_pandas()
    # scalar encoding for the driver's value hash
    out["feature"] = out["feature"].map(
        lambda f: "|".join(f"{x:.6f}" for x in f))
    return out.sort_values("media_id").reset_index(drop=True)


def media_audio_features(sf_dir: str):
    """Actor-pool audio decode → mel-like feature rows (fake codec)."""
    from .stages.multimodal import decode_audio, synth_media

    out = decode_audio(synth_media(_n_media(sf_dir))).to_pandas()
    out["mel"] = out["mel"].map(
        lambda f: "|".join(f"{x:.6f}" for x in f))
    return out.sort_values("media_id").reset_index(drop=True)


def media_frame_sample(sf_dir: str):
    """Actor-pool video frame sampling (explode: one row per frame)."""
    from .stages.multimodal import sample_frames, synth_media

    out = sample_frames(synth_media(_n_media(sf_dir)),
                        every_ms=1000).to_pandas()
    out["frame_key"] = out["frame_key"].map(bytes.hex)
    return out.sort_values(["media_id", "frame_ms"]).reset_index(drop=True)


def events_props_redact(sf_dir: str):
    """M10 (round 3): PII-style redaction — the standard pre-training
    scrub step (emails/phones/ids → placeholder tokens), exercised on
    the digit runs in the events.props JSON column. Fully vectorized
    Arrow kernels per batch (``replace_substring_regex`` +
    ``count_substring_regex``; no Python over rows), with per-batch
    partial sums before one bounded groupby. Output per event_type:
    events, redaction count, digit chars removed."""
    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        props = t["props"]
        n_red = pc.count_substring_regex(props, r"[0-9]+")
        removed = pc.subtract(
            pc.utf8_length(props),
            pc.utf8_length(pc.replace_substring_regex(
                props, r"[0-9]+", "")))
        g = pa.table({
            "event_type": t["event_type"],
            "n_red": pc.cast(n_red, pa.int64()),
            "removed": pc.cast(removed, pa.int64()),
        }).group_by("event_type").aggregate(
            [("n_red", "sum"), ("removed", "sum"),
             ("event_type", "count")])
        return pa.table({
            "event_type": g["event_type"],
            "n_events": pc.cast(g["event_type_count"], pa.int64()),
            "n_redactions": pc.cast(g["n_red_sum"], pa.int64()),
            "digits_removed": pc.cast(g["removed_sum"], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_redactions", alias_name="n_redactions"),
                       Sum("digits_removed", alias_name="digits_removed"))
            .sort("event_type"))


_EVENTS_REDACT_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
           AS n_redactions,
       CAST(SUM(length(props)
                - length(regexp_replace(props, '[0-9]+', '', 'g')))
            AS BIGINT) AS digits_removed
FROM events GROUP BY 1 ORDER BY 1
"""


def media_real_image_features(sf_dir: str):
    """Actor-pool image decode with the REAL pure-stdlib codecs
    (sources/mediacodec.py): a deterministic mixed-format corpus — PPM,
    BMP, PNG (Paeth-filtered) and baseline JPEG round-robin, so every
    real image decoder runs at the driver surface — →
    DecodeImage(decoder="real") → 64-d features from ACTUAL pixels,
    emitted as integer micro-unit sums for a stable value hash.
    Rows-only (pixel-exactness golden-tested in
    tests/test_mediacodec.py)."""
    from .sources.mediacodec import (encode_bmp, encode_jpeg, encode_png,
                                     encode_ppm)
    from .stages.multimodal import MEDIA_SCHEMA, decode_images

    n = _n_media(sf_dir)
    rng = np.random.default_rng(17)
    encoders = [encode_ppm, encode_bmp,
                lambda a: encode_png(a, filter_type=4),
                lambda a: encode_jpeg(a, q=1)]
    mimes = ["image/x-portable-pixmap", "image/bmp", "image/png",
             "image/jpeg"]
    payloads, mime_col = [], []
    for i in range(n):
        img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        payloads.append(encoders[i % 4](img))
        mime_col.append(mimes[i % 4])
    t = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(mime_col, pa.string()),
        "width": pa.array([24] * n, pa.int32()),
        "height": pa.array([24] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    }).cast(MEDIA_SCHEMA)
    out = decode_images(ray.data.from_arrow(t), size=24,
                        decoder="real").to_pandas()
    out["feat_sum_micro"] = out.pop("feature").map(
        lambda f: int(round(sum(f) * 1e6)))
    return out.sort_values("media_id").reset_index(drop=True)


def media_scene_cuts(sf_dir: str):
    """Shot-boundary detection over real demuxed video (the keyframe
    selection step of a video-corpus pipeline): a deterministic
    concatenated-P6 corpus with PLANTED scene changes (each video is
    2–4 constant-base segments with small per-frame jitter; the base
    jump at each segment boundary is the planted cut) → SceneCuts actor
    pool (stages/multimodal.py) → per-video n_frames / n_cuts /
    cut-index list. Detection is exact-integer, so the output is
    bit-stable; tests/test_multimodal.py asserts detected == planted.
    Rows-only (no SQL analogue for pixel demux)."""
    from .stages.multimodal import MEDIA_SCHEMA, scene_cuts

    n = max(16, _n_media(sf_dir) // 4)
    payloads, durs = [], []
    from .sources.mediacodec import encode_ppm_stream
    for mid in range(n):
        rng = np.random.default_rng(1000 + mid)
        n_seg = 2 + mid % 3
        frames = []
        for seg in range(n_seg):
            # palette bases 100+ levels apart guarantee every planted
            # boundary clears the 20-level threshold after the ±10
            # tweak and ±4 jitter (min boundary delta ≈ 40 levels),
            # while within-segment jitter stays ≈ 2 levels — so
            # detected == planted is a deterministic invariant
            base = (np.array([20, 120, 220], np.int64)[seg % 3]
                    + rng.integers(0, 10, size=3)).astype(np.uint8)
            for _ in range(3 + (mid + seg) % 3):
                jitter = rng.integers(0, 5, size=(12, 16, 3),
                                      dtype=np.uint8)
                frames.append((base[None, None, :] // 2
                               + jitter).astype(np.uint8))
        payloads.append(encode_ppm_stream(frames))
        durs.append(len(frames) * 40)
    t = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["video"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["video/x-ppm-stream"] * n, pa.string()),
        "width": pa.array([16] * n, pa.int32()),
        "height": pa.array([12] * n, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    }).cast(MEDIA_SCHEMA)
    out = scene_cuts(ray.data.from_arrow(t)).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def media_vad_segments(sf_dir: str):
    """Energy-gate voice-activity detection over real PCM WAV clips
    (the silence-trim / speech-segmentation step of an audio-corpus
    pipeline): a deterministic synthesized corpus — each clip is
    1 + (mid % 3) planted 300 ms 440 Hz tone bursts separated by 200 ms
    true silences at 8 kHz — → VadSegments actor pool
    (stages/multimodal.py; exact-integer peak-relative energy gate) →
    per-clip segment count, voiced ms, first-start / last-end ms.
    Detection is bit-deterministic; tests/test_multimodal.py asserts
    detected == planted within one hop. Rows-only (no SQL analogue for
    PCM decode)."""
    from .sources.mediacodec import encode_wav
    from .stages.multimodal import MEDIA_SCHEMA, vad_segments

    n = max(16, _n_media(sf_dir) // 4)
    rate = 8000
    payloads, durs = [], []
    for mid in range(n):
        k = 1 + mid % 3
        pieces = [np.zeros(rate * 200 // 1000, np.float32)]
        tlen = rate * 300 // 1000
        tone = 0.5 * np.sin(2 * np.pi * 440.0
                            * np.arange(tlen) / rate).astype(np.float32)
        for _ in range(k):
            pieces.append(tone)
            pieces.append(np.zeros(rate * 200 // 1000, np.float32))
        x = np.concatenate(pieces)
        payloads.append(encode_wav(x, rate))
        durs.append(int(len(x) * 1000 // rate))
    t = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["audio"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["audio/wav"] * n, pa.string()),
        "width": pa.array([0] * n, pa.int32()),
        "height": pa.array([0] * n, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    }).cast(MEDIA_SCHEMA)
    segs = vad_segments(ray.data.from_arrow(t))

    def summarize(g: pd.DataFrame) -> pa.Table:
        return pa.table({
            "media_id": pa.array([int(g["media_id"].iloc[0])], pa.int64()),
            "n_segments": pa.array([len(g)], pa.int64()),
            "voiced_ms": pa.array(
                [int((g["end_ms"] - g["start_ms"]).sum())], pa.int64()),
            "first_start_ms": pa.array([int(g["start_ms"].min())],
                                       pa.int64()),
            "last_end_ms": pa.array([int(g["end_ms"].max())],
                                    pa.int64())})

    return (segs.groupby("media_id")
            .map_groups(summarize, batch_format="pandas")
            .sort("media_id"))


def docs_compress_ratio(sf_dir: str):
    """Compressibility quality signal (the zlib-ratio heuristic web
    curation uses next to the Gopher rules — near-random text doesn't
    compress, boilerplate compresses too well): per (source, ratio
    decile), document count, where ratio_pct = compressed*100 // raw at
    zlib level 6. The per-doc zlib call is C-speed; the groupby carries
    ≤ |sources|×11 rows. Rows-only (DuckDB has no zlib scalar); the
    exact oracle is a single-process recomputation in
    tests/test_text_functions.py."""
    import zlib

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text",
                                                    "source"])

    def partial(t: pa.Table) -> pa.Table:
        ratios = np.fromiter(
            (len(zlib.compress(s.encode(), 6)) * 100
             // max(len(s.encode()), 1)
             for s in t["text"].to_pylist()),
            dtype=np.int64, count=t.num_rows)
        bucket = np.minimum(ratios // 10, 10)
        g = pa.table({"source": t["source"],
                      "bucket": pa.array(bucket, pa.int64())}) \
            .group_by(["source", "bucket"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "bucket": g["bucket"],
                         "n_docs": pc.cast(g["count_all"], pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(["source", "bucket"])
            .aggregate(Sum("n_docs", alias_name="n_docs"))
            .sort(["source", "bucket"]))


# --------------------------------------------------------------------------
# flagship KG pipeline over synthesized pages — rows-only (real oracle =
# refimpl goldens, tests/test_flagship.py)
# --------------------------------------------------------------------------

def _pairs_within_groups(keys: np.ndarray, vals: np.ndarray
                         ) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Vectorized i<j pair enumeration per group (round-3 hot-loop fix:
    the wedge/market-basket emitters ran a PYTHON double loop per group
    — O(deg²) interpreted steps on every hub). Sorts by (key, val), then
    per group uses ``np.triu_indices`` + fancy indexing, so the O(deg²)
    inner work is C-speed; only the per-GROUP step remains Python.
    Returns (group_key_repeated, a, b) with a ≤ b by value order."""
    order = np.lexsort((vals, keys))
    k, v = keys[order], vals[order]
    bounds = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    sizes = np.diff(np.r_[bounds, len(k)])
    out_k, out_a, out_b = [], [], []
    for start, sz in zip(bounds, sizes):
        if sz < 2:
            continue
        iu, jv = np.triu_indices(sz, 1)
        seg = v[start:start + sz]
        out_k.append(np.full(len(iu), k[start], dtype=keys.dtype))
        out_a.append(seg[iu])
        out_b.append(seg[jv])
    if not out_a:
        z = np.array([], dtype=np.int64)
        return z, z, z
    return (np.concatenate(out_k), np.concatenate(out_a),
            np.concatenate(out_b))


def _n_pages(sf_dir: str) -> int:
    # scale the synthetic corpus with the driver's sf; lineitem rows track sf
    # linearly (TESTDATA.md: 6k/60k/600k) → 4k/40k/400k pages
    return max(64, pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
               * 2 // 3)


# kg_triples / kg_nodes / kg_graph all consume the same annotate→graph run;
# memoize per (sf_dir, n_pages) so the driver's per-query calls don't re-run
# the whole pipeline three times in one process
_KG_MEMO: dict = {}


def _kg_run(sf_dir: str):
    from .pipelines.flagship import run_flagship
    from .sources.pages import synth_pages

    key = (sf_dir, _n_pages(sf_dir))
    if key not in _KG_MEMO:
        res = run_flagship(synth_pages(key[1]), num_parts=16)
        res["nodes"] = res["nodes"].materialize()
        res["edges"] = res["edges"].materialize()
        _KG_MEMO[key] = res
    return _KG_MEMO[key]


def kg_extracted(sf_dir: str):
    from .sources.pages import synth_pages
    from .stages.strip import extract_text

    pages = synth_pages(_n_pages(sf_dir))
    ext = extract_text(pages, num_parts=16)
    return ext.map_batches(
        lambda t: pa.table({
            "url": t["url"],
            "sha_hex": pa.array([bytes(x).hex() if x is not None else ""
                                 for x in t["text_sha256"].to_pylist()],
                                pa.string())}),
        batch_format="pyarrow").sort("url")


def kg_triples(sf_dir: str):
    from .stages.graph import explode_list_struct

    ann = _kg_run(sf_dir)["annotated"]
    return ann.map_batches(
        lambda t: explode_list_struct(t, "triples", ["url"]).select(
            ["url", "subj", "pred", "obj", "subj_entity_id",
             "obj_entity_id"]),
        batch_format="pyarrow").sort(["url", "subj", "pred", "obj"])


def kg_mentions(sf_dir: str):
    """A1+A3 stage output: linked mentions exploded to one row each —
    rows-only (golden oracle: tests/test_flagship.py mentions test)."""
    from .stages.graph import explode_list_struct

    ann = _kg_run(sf_dir)["annotated"]
    return ann.map_batches(
        lambda t: explode_list_struct(t, "mentions", ["url"]).select(
            ["url", "start", "end", "surface", "label", "entity_id"]),
        batch_format="pyarrow").sort(["url", "start", "end"])


def kg_graph(sf_dir: str):
    return _kg_run(sf_dir)["edges"]


def kg_nodes(sf_dir: str):
    nodes = _kg_run(sf_dir)["nodes"].to_pandas()
    nodes["aliases"] = nodes["aliases"].map(
        lambda xs: "|".join(xs))  # stable scalar encoding for hashing
    return nodes


def kg_pagerank(sf_dir: str):
    """Graph analytics over the materialized KG: distributed PageRank on
    the (subj_id → obj_id) edge table (join-free co-partitioned rounds,
    stages/pagerank.py). Rows-only; numerics gated vs a dense numpy
    reference in tests/test_pagerank.py."""
    from .stages.pagerank import pagerank

    edges = _kg_run(sf_dir)["edges"].map_batches(
        lambda t: pa.table({"src": t["subj_id"], "dst": t["obj_id"]}),
        batch_format="pyarrow")
    pr = pagerank(edges, max_iters=10, tol=1e-9, num_partitions=8)

    def r6(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "rank6": pc.round(pc.multiply(
                             t["rank"], 1e6), ndigits=2)})

    return (pr.map_batches(r6, batch_format="pyarrow")
            .sort(["rank6", "node"], descending=[True, False]).limit(25))


def events_user_gap(sf_dir: str):
    """LAG window (W4): per-user inter-event gap totals — lag_column
    (one hash shuffle, partition-local shift) then an integer-exact
    groupby; gaps summed in microseconds so no float crosses the oracle."""
    from .functions.window import lag_column

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    lagged = lag_column(ds, "ts", keys=["user_id"],
                        order_by=["ts", "event_id"], out_col="prev_ts")

    def gaps(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["prev_ts"]))
        return pa.table({
            "user_id": t["user_id"],
            "gap_us": pc.subtract(t["ts"].cast(pa.int64()),
                                  t["prev_ts"].cast(pa.int64())),
        })

    return (lagged.map_batches(gaps, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Sum("gap_us", alias_name="sum_gap_us"),
                       Count(alias_name="n_gaps"))
            .sort("user_id"))


_EVENTS_GAP_SQL = """
SELECT user_id,
       CAST(SUM(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT) AS sum_gap_us,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM (SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events) t
WHERE prev_ts IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def orders_repeat_30d(sf_dir: str):
    """Range (interval) join — custom operator Ray Data lacks
    (functions/rangejoin.py): per order, how many orders the same customer
    placed within the next 30 days (self range join, includes itself so
    every count ≥ 1). The right side ships only (key, ts) through the
    shuffle; counts come from per-key searchsorted, never materialized
    pairs."""
    from .functions.rangejoin import range_join_count

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    right = read_table(sf_dir, "orders",
                       columns=["o_custkey", "o_orderdate"]) \
        .rename_columns({"o_custkey": "p_custkey",
                         "o_orderdate": "p_orderdate"})
    out = range_join_count(orders, right,
                           left_by="o_custkey", right_by="p_custkey",
                           left_ts="o_orderdate", right_ts="p_orderdate",
                           lo=pd.Timedelta(0), hi=pd.Timedelta(days=30),
                           count_col="n_orders")
    return out.select_columns(["o_orderkey", "n_orders"]).sort("o_orderkey")


_ORDERS_REPEAT_SQL = """
SELECT o.o_orderkey, CAST(COUNT(p.o_orderdate) AS BIGINT) AS n_orders
FROM orders o LEFT JOIN orders p
  ON p.o_custkey = o.o_custkey
 AND p.o_orderdate >= o.o_orderdate
 AND p.o_orderdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderkey ORDER BY o.o_orderkey
"""


def events_hour_pivot(sf_dir: str):
    """Pivot (wide conditional aggregate): event counts per type ×
    6-hour-of-day quarter as four columns. Partial crosstab per batch
    (the combiner), then one tiny groupby-sum over (types × batches)
    rows — the full table never shuffles."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["event_type"], df["ts"].dt.hour // 6)
        ct = ct.reindex(columns=range(4), fill_value=0)
        ct.columns = [f"n_q{i}" for i in range(4)]
        return ct.reset_index().astype(
            {f"n_q{i}": "int64" for i in range(4)})

    qcols = [f"n_q{i}" for i in range(4)]
    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .aggregate(*[Sum(c, alias_name=c) for c in qcols])
            .sort("event_type"))


_EVENTS_PIVOT_SQL = """
SELECT event_type,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) // 6 = 0)
            AS BIGINT) AS n_q0,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) // 6 = 1)
            AS BIGINT) AS n_q1,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) // 6 = 2)
            AS BIGINT) AS n_q2,
       CAST(COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) // 6 = 3)
            AS BIGINT) AS n_q3
FROM events GROUP BY event_type ORDER BY event_type
"""


def docs_chunks(sf_dir: str):
    """Token-window document chunking (training-data prep; shuffle-free
    flat map, functions/chunk.py) — 100-token windows, 20-token overlap.
    The oracle checks the full (doc_id, chunk_id, n_tokens) layout; chunk
    TEXT slicing is offset-exact and tested in tests/test_chunk.py."""
    from .functions.chunk import chunk_documents

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=500)
    out = chunk_documents(docs, size=100, overlap=20, with_text=False)
    return out.sort(["doc_id", "chunk_id"])


_DOCS_CHUNKS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n
  FROM documents),
 a AS (SELECT doc_id, n,
              CASE WHEN n <= 100 THEN 1
                   ELSE CAST(CEIL((n - 100) / 80.0) AS BIGINT) + 1
              END AS nch
       FROM toks WHERE n > 0),
 e AS (SELECT doc_id, n, UNNEST(range(0, nch)) AS i FROM a)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(LEAST(100, n - 80 * i) AS BIGINT) AS n_tokens
FROM e ORDER BY doc_id, chunk_id
"""


def events_user_range7d(sf_dir: str):
    """TIME-RANGE window (window.rolling_sum_time): per user, the cents
    sum over the trailing 7 days INCLUDING equal-timestamp peers — SQL
    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW."""
    from .functions.window import rolling_sum_time

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    cents = ds.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"], "cents": _cents(t["value"])}),
        batch_format="pyarrow")
    out = rolling_sum_time(cents, "cents", keys=["user_id"], ts_col="ts",
                           window=pd.Timedelta(days=7), out_col="range7")
    return (out.select_columns(["user_id", "event_id", "range7"])
            .sort(["user_id", "event_id"]))


_EVENTS_RANGE7_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
            AS BIGINT) AS range7
FROM events ORDER BY user_id, event_id
"""


def orders_priority_dense_rank(sf_dir: str):
    """DENSE_RANK per customer over order priority (heavy ties — rank is
    value-deterministic, no tie-break column needed)."""
    from .functions.window import dense_rank

    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_orderpriority"])
    out = dense_rank(ds, keys=["o_custkey"], order_by=["o_orderpriority"],
                     out_col="dr")
    return out.select_columns(["o_orderkey", "dr"]).sort("o_orderkey")


_ORDERS_DENSE_RANK_SQL = """
SELECT o_orderkey,
       CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderpriority) AS BIGINT) AS dr
FROM orders ORDER BY o_orderkey
"""


def nation_region_cross(sf_dir: str):
    """Cross join (tiny×tiny cartesian, broadcast side guarded by an
    explicit limit — functions/joins.py cross_join)."""
    from .functions.joins import cross_join

    nation = read_table(sf_dir, "nation", columns=["n_name"])
    region = read_table(sf_dir, "region", columns=["r_name"])
    return cross_join(nation, region).sort(["n_name", "r_name"])


_NATION_CROSS_SQL = """
SELECT n_name, r_name FROM nation CROSS JOIN region
ORDER BY n_name, r_name
"""


def events_user_rolling3(sf_dir: str):
    """Sliding-window aggregate (window.rolling_sum): per user, the sum of
    the last 3 events' integer cents in time order — SQL ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW."""
    from .functions.window import rolling_sum

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    cents = ds.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"], "cents": _cents(t["value"])}),
        batch_format="pyarrow")
    out = rolling_sum(cents, "cents", keys=["user_id"],
                      order_by=["ts", "event_id"], window=3,
                      out_col="roll3")
    return (out.select_columns(["user_id", "event_id", "roll3"])
            .sort(["user_id", "event_id"]))


_EVENTS_ROLLING_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll3
FROM events ORDER BY user_id, event_id
"""


def orders_upsert(sf_dir: str):
    """Upsert / latest-wins CDC compaction (functions/upsert.py): a
    deterministic synthetic correction stream (every 10th order, +1 day
    version, +100 cents) merged over the base snapshot — updates win; the
    oracle replays the same merge with ROW_NUMBER."""
    from .functions.upsert import upsert

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_cents": _cents(t["o_totalprice"]),
            "version": t["o_orderdate"].cast(pa.int64()),
        })

    base = read_table(sf_dir, "orders",
                      columns=["o_orderkey", "o_totalprice",
                               "o_orderdate"]) \
        .map_batches(prep, batch_format="pyarrow")
    day_us = 86_400_000_000

    def make_updates(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(keys % 10 == 0))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "price_cents": pc.add(t["price_cents"], 100),
            "version": pc.add(t["version"], day_us),
        })

    updates = base.map_batches(make_updates, batch_format="pyarrow")
    out = upsert(base, updates, key_cols=["o_orderkey"],
                 version_col="version")
    return out.sort("o_orderkey")


_ORDERS_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         epoch_us(o_orderdate) AS version, 0 AS side
  FROM orders),
 upd AS (
  SELECT o_orderkey, price_cents + 100, version + 86400000000, 1
  FROM base WHERE o_orderkey % 10 = 0),
 u AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
 r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                    ORDER BY version DESC, side DESC) AS rn
       FROM u)
SELECT o_orderkey, price_cents, CAST(version AS BIGINT) AS version
FROM r WHERE rn = 1 ORDER BY o_orderkey
"""


def events_cube(sf_dir: str):
    """CUBE aggregate over (event_type, 6-hour quarter): all four grouping
    sets derived from ONE shuffled base aggregate — the rollups re-reduce
    the (a,b) AGGREGATE, never the raw stream (base cardinality =
    |types|×4, bounded at any scale)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "q": pc.cast(pc.floor(pc.divide(
                pc.cast(pc.hour(t["ts"]), pa.float64()), 6.0)), pa.int64()),
        })

    base = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(["event_type", "q"])
            .aggregate(Count(alias_name="n")).materialize())

    def with_null(t: pa.Table, null_col: str) -> pa.Table:
        cols = {}
        for name, ty in (("event_type", pa.string()), ("q", pa.int64())):
            cols[name] = pa.nulls(len(t), ty) if name == null_col \
                else pc.cast(t[name], ty)
        cols["n"] = pc.cast(t["n"], pa.int64())
        return pa.table(cols)

    by_type = base.groupby("event_type") \
        .aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda t: with_null(t, "q"), batch_format="pyarrow")
    by_q = base.groupby("q") \
        .aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda t: with_null(t, "event_type"),
                     batch_format="pyarrow")
    total = pa.table({"event_type": pa.array([None], pa.string()),
                      "q": pa.array([None], pa.int64()),
                      "n": pa.array([int(base.sum("n") or 0)], pa.int64())})
    return (base.map_batches(lambda t: with_null(t, ""),
                             batch_format="pyarrow")
            .union(by_type, by_q, ray.data.from_arrow(total)))


_EVENTS_CUBE_SQL = """
SELECT event_type, q, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT event_type, EXTRACT(hour FROM ts) // 6 AS q FROM events) t
GROUP BY CUBE (event_type, q)
"""


def orders_next_order(sf_dir: str):
    """FORWARD as-of join with tolerance + strict inequality
    (functions/asof.py direction/tolerance/allow_exact knobs): each
    order's NEXT same-customer order date within 90 days; inner semantics
    drop last orders."""
    from .functions.asof import asof_join_backward

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    right = read_table(sf_dir, "orders",
                       columns=["o_custkey", "o_orderdate"]) \
        .rename_columns({"o_custkey": "p_custkey",
                         "o_orderdate": "p_orderdate"})
    out = asof_join_backward(
        orders, right, left_by="o_custkey", right_by="p_custkey",
        left_ts="o_orderdate", right_ts="p_orderdate",
        out_col="next_order", direction="forward",
        tolerance=pd.Timedelta(days=90), allow_exact_matches=False)
    return out.select_columns(["o_orderkey", "next_order"]) \
        .sort("o_orderkey")


_ORDERS_NEXT_SQL = """
SELECT o.o_orderkey, MIN(p.o_orderdate) AS next_order
FROM orders o JOIN orders p
  ON p.o_custkey = o.o_custkey
 AND p.o_orderdate > o.o_orderdate
 AND p.o_orderdate <= o.o_orderdate + INTERVAL 90 DAY
GROUP BY o.o_orderkey ORDER BY o.o_orderkey
"""


def _orders_year_pairs(sf_dir: str, year: int):
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderstatus", "o_orderpriority",
                             "o_orderdate"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(pc.year(t["o_orderdate"]), year))
        .select(["o_orderstatus", "o_orderpriority"]),
        batch_format="pyarrow")


def orders_pairs_intersect(sf_dir: str):
    """SQL INTERSECT (functions/setops.py): (status, priority) pairs seen
    in both 1995 and 1996 — per-batch distinct combiner, one row-keyed
    shuffle, per-partition membership merge."""
    from .functions.setops import intersect_distinct

    out = intersect_distinct(_orders_year_pairs(sf_dir, 1995),
                             _orders_year_pairs(sf_dir, 1996))
    return out.sort(["o_orderstatus", "o_orderpriority"])


_ORDERS_INTERSECT_SQL = """
SELECT o_orderstatus, o_orderpriority FROM orders
WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_orderstatus, o_orderpriority FROM orders
WHERE year(o_orderdate) = 1996
ORDER BY o_orderstatus, o_orderpriority
"""


def orders_pairs_except(sf_dir: str):
    """SQL EXCEPT: priorities minus the urgent tier — exercises both the
    drop path (shared values) and the keep path (left-only values) with a
    deterministic non-empty result at every sf."""
    from .functions.setops import except_distinct

    left = read_table(sf_dir, "orders", columns=["o_orderpriority"])
    right = left.map_batches(
        lambda t: t.filter(pc.match_substring_regex(
            t["o_orderpriority"], r"^[12]-")),
        batch_format="pyarrow")
    out = except_distinct(left, right)
    return out.sort("o_orderpriority")


_ORDERS_EXCEPT_SQL = """
SELECT o_orderpriority FROM orders
EXCEPT
SELECT o_orderpriority FROM orders WHERE o_orderpriority SIMILAR TO '[12]-.*'
ORDER BY o_orderpriority
"""


def events_user_twohop(sf_dir: str):
    """Two-hop path counts (functions/graphops.py) over the bipartite
    user→event_type graph: Σ_{type ∈ types(user)} (#users of that type) —
    an edges⋈edges query computed as a degree aggregate attached back by
    co-partitioned union, never as a pair explosion."""
    from .functions.graphops import two_hop_counts

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def both_dirs(t: pa.Table) -> pa.Table:
        u = pc.binary_join_element_wise(
            "u:", pc.cast(t["user_id"], pa.string()), "")
        ty = pc.binary_join_element_wise("t:", t["event_type"], "")
        return pa.table({
            "src": pa.concat_arrays([u.combine_chunks(),
                                     ty.combine_chunks()]),
            "dst": pa.concat_arrays([ty.combine_chunks(),
                                     u.combine_chunks()]),
        })

    edges = (ds.groupby(["user_id", "event_type"])
             .aggregate(Count(alias_name="_n"))
             .map_batches(both_dirs, batch_format="pyarrow"))
    out = two_hop_counts(edges, src="src", dst="dst")

    def users_only(t: pa.Table) -> pa.Table:
        m = pc.starts_with(t["src"], "u:")
        t = t.filter(m)
        return pa.table({
            "user_id": pc.cast(pc.utf8_slice_codeunits(
                t["src"], 2, 32767), pa.int64()),
            "n_two_hop": t["n_two_hop"],
        })

    return (out.map_batches(users_only, batch_format="pyarrow")
            .sort("user_id"))


_EVENTS_TWOHOP_SQL = """
WITH e AS (SELECT DISTINCT user_id AS src, event_type AS mid FROM events),
 d AS (SELECT mid, COUNT(*) AS deg FROM e GROUP BY mid)
SELECT src AS user_id, CAST(SUM(deg) AS BIGINT) AS n_two_hop
FROM e JOIN d USING (mid) GROUP BY src ORDER BY user_id
"""


def docs_jsonl_roundtrip(sf_dir: str):
    """NDJSON source/sink (SURVEY §2.1 source breadth): documents →
    ``write_json`` (one shard per block under /tmp) → ``read_json`` →
    aggregate. The oracle runs on the ORIGINAL parquet view, so the
    count+checksum equality proves the round-trip lossless."""
    import os
    import shutil

    out_dir = f"/tmp/ies_jsonl_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    read_table(sf_dir, "documents",
               columns=["doc_id", "lang"]).write_json(out_dir)
    back = ray.data.read_json(out_dir)
    return (back.groupby("lang")
            .aggregate(Count(alias_name="n"),
                       Sum("doc_id", alias_name="sum_doc_id"))
            .sort("lang"))


_DOCS_JSONL_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents GROUP BY lang ORDER BY lang
"""


def customer_csv_roundtrip(sf_dir: str):
    """CSV source/sink: integer/string columns only (floats don't survive
    text round-trips bit-exact — documented contract), aggregate checked
    against the original parquet."""
    import os
    import shutil

    out_dir = f"/tmp/ies_csv_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    read_table(sf_dir, "customer",
               columns=["c_custkey", "c_nationkey",
                        "c_mktsegment"]).write_csv(out_dir)
    back = ray.data.read_csv(out_dir)
    return (back.groupby("c_mktsegment")
            .aggregate(Count(alias_name="n"),
                       Sum("c_custkey", alias_name="sum_custkey"),
                       Sum("c_nationkey", alias_name="sum_nationkey"))
            .sort("c_mktsegment"))


_CUSTOMER_CSV_SQL = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c_custkey) AS BIGINT) AS sum_custkey,
       CAST(SUM(c_nationkey) AS BIGINT) AS sum_nationkey
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def events_value_quantiles_cont(sf_dir: str):
    """Interpolated (quantile_cont) exact quantiles; values reported ×4 so
    the quarter-fraction interpolation at q∈{.25,.5,.75} stays integer —
    no float crosses the oracle hash."""
    from .functions.quantiles import exact_quantiles_cont

    ds = read_table(sf_dir, "events", columns=["value"])
    cents = ds.map_batches(
        lambda t: pa.table({"cents": pc.cast(
            pc.floor(pc.multiply(t["value"], 100.0)), pa.int64())}),
        batch_format="pyarrow")
    df = exact_quantiles_cont(cents, "cents", [0.25, 0.5, 0.75])
    df["cents_x4"] = (df["value"] * 4).round().astype("int64")
    return df[["q", "cents_x4"]]


_EVENTS_QUANTILES_CONT_SQL = """
WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events)
SELECT 0.25 AS q,
       CAST(ROUND(quantile_cont(cents, 0.25) * 4) AS BIGINT) AS cents_x4
FROM c
UNION ALL SELECT 0.5,
       CAST(ROUND(quantile_cont(cents, 0.5) * 4) AS BIGINT) FROM c
UNION ALL SELECT 0.75,
       CAST(ROUND(quantile_cont(cents, 0.75) * 4) AS BIGINT) FROM c
ORDER BY q
"""


def events_user_heavy_hitters(sf_dir: str):
    """SpaceSaving heavy hitters (functions/sketches.py) over event
    user_ids — run in the EXACT regime (capacity ≥ distinct users at test
    scale) so the DuckDB count oracle applies bit-for-bit; at web scale
    the same call with capacity ≪ distincts degrades gracefully to the
    ±floor bounds (property-tested in tests/test_new_ops.py)."""
    from .functions.sketches import heavy_hitters

    ds = read_table(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(ds, "user_id", k=20, capacity=65536)


_EVENTS_HH_SQL = """
SELECT CAST(user_id AS VARCHAR) AS item,
       CAST(COUNT(*) AS BIGINT) AS count_hi,
       CAST(COUNT(*) AS BIGINT) AS count_lo
FROM events GROUP BY user_id
ORDER BY count_hi DESC, item LIMIT 20
"""


def nation_cust_segments(sf_dir: str):
    """collect_set / string_agg (functions/collect.py): per nation, the
    sorted distinct market segments of its customers as one '|'-joined
    cell. Per-batch distinct combiner → pair-level dedup shuffle →
    per-key sorted assembly; nation names attached from a broadcast dim."""
    from .functions.collect import collect_set_sorted

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put(nmap)

    cust = read_table(sf_dir, "customer",
                      columns=["c_nationkey", "c_mktsegment"])
    out = collect_set_sorted(cust, key="c_nationkey",
                             value="c_mktsegment", sep="|")

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        return pa.table({
            "n_name": pa.array([m[k] for k in
                                t["c_nationkey"].to_pylist()], pa.string()),
            "segments": t["values"],
        })

    return (out.map_batches(attach, batch_format="pyarrow").sort("n_name"))


_NATION_SEGMENTS_SQL = """
SELECT n_name, string_agg(seg, '|' ORDER BY seg) AS segments
FROM (SELECT DISTINCT c_nationkey, c_mktsegment AS seg FROM customer) d
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name
"""


def orders_global_rank(sf_dir: str):
    """Global ROW_NUMBER (no PARTITION BY) — functions/rank.py: adaptive
    range-sample splits, per-partition counts → offsets, local sort +
    offset. Two streaming passes, driver holds only samples/counts."""
    from .functions.rank import global_row_number

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])
    out = global_row_number(orders,
                            order_by=["o_totalprice", "o_orderkey"],
                            descending=[True, False], out_col="rn")
    return out.select_columns(["o_orderkey", "rn"]).sort("o_orderkey")


_ORDERS_RANK_SQL = """
SELECT o_orderkey,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders ORDER BY o_orderkey
"""


def orders_price_quartile(sf_dir: str):
    """NTILE(4) over the global price order (functions/rank.py ntile)."""
    from .functions.rank import ntile

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])
    out = ntile(orders, 4, order_by=["o_totalprice", "o_orderkey"],
                out_col="tile")
    return out.select_columns(["o_orderkey", "tile"]).sort("o_orderkey")


_ORDERS_NTILE_SQL = """
SELECT o_orderkey,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey)
            AS BIGINT) AS tile
FROM orders ORDER BY o_orderkey
"""


def lineitem_flag_variance(sf_dir: str):
    """Grouped VAR_SAMP / STDDEV_SAMP via exact integer second moments
    (functions/stats.py): both engines reduce the same int64 (Σx, Σx²) —
    integer addition commutes so merge order is irrelevant — then apply one
    identical float64 closed form, rounded to 4 dp."""
    from .functions.stats import grouped_variance

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity"])
    out = grouped_variance(li, "l_quantity", keys=["l_returnflag"],
                           out_prefix="qty_")
    return out.sort("l_returnflag")


_LINEITEM_VAR_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       round((SUM(q*q) - CAST(SUM(q) AS DOUBLE)*SUM(q)/COUNT(*))
             / (COUNT(*) - 1), 4) AS qty_var_samp,
       round(sqrt(round((SUM(q*q)
             - CAST(SUM(q) AS DOUBLE)*SUM(q)/COUNT(*))
             / (COUNT(*) - 1), 4)), 4) AS qty_stddev_samp
FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def lineitem_qty_price_corr(sf_dir: str):
    """Grouped Pearson CORR via exact integer cross-moments
    (functions/stats.py). Price is pre-scaled to whole dollars so Σy² stays
    inside int64 at any test scale (module docstring has the overflow
    budget)."""
    from .functions.stats import grouped_corr

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "qty": pc.cast(t["l_quantity"], pa.int64()),
            "price_usd": pc.cast(
                pc.round(t["l_extendedprice"],
                         round_mode="half_towards_infinity"),
                pa.int64()),
        })

    out = grouped_corr(li.map_batches(prep, batch_format="pyarrow"),
                       "qty", "price_usd", keys=["l_returnflag"],
                       out_col="qty_price_corr")
    return out.sort("l_returnflag")


_LINEITEM_CORR_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       round((COUNT(*)*SUM(x*y) - CAST(SUM(x) AS DOUBLE)*SUM(y))
             / sqrt((COUNT(*)*SUM(x*x) - CAST(SUM(x) AS DOUBLE)*SUM(x))
                  * (COUNT(*)*SUM(y*y) - CAST(SUM(y) AS DOUBLE)*SUM(y))),
             4) AS qty_price_corr
FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice) AS BIGINT) AS y FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def orders_price_histogram(sf_dir: str):
    """Fixed-width histogram (SQL width_bucket-style): bucket =
    floor(price / 50000) computed with the same float64 division in both
    engines, then a plain count groupby — shuffle width is the bucket
    count, not the row count."""
    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t["o_totalprice"],
                                       pa.scalar(50_000.0))), pa.int64())
        return pa.table({"bucket": b})

    out = (orders.map_batches(bucketize, batch_format="pyarrow")
           .groupby("bucket").aggregate(Count(alias_name="n_orders")))
    return out.sort("bucket")


_ORDERS_HIST_SQL = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY bucket
"""


def orders_percent_rank(sf_dir: str):
    """PERCENT_RANK() OVER (PARTITION BY priority ORDER BY price) —
    functions/window.py percent_rank: min-of-ties rank, (r−1)/(n−1) from
    exact integers so the float64 quotient is bit-identical to SQL's."""
    from .functions.window import percent_rank

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])
    out = percent_rank(orders, keys=["o_orderpriority"],
                       order_by=["o_totalprice"], out_col="pr")
    return out.select_columns(["o_orderkey", "pr"]).sort("o_orderkey")


_ORDERS_PCTRANK_SQL = """
SELECT o_orderkey,
       PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS pr
FROM orders ORDER BY o_orderkey
"""


def orders_status_mode_priority(sf_dir: str):
    """Grouped MODE with a deterministic smallest-value tie-break
    (functions/stats.py grouped_mode): one (status, priority) count shuffle
    — width = distinct combinations — then a tiny per-status argmax."""
    from .functions.stats import grouped_mode

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderstatus", "o_orderpriority"])
    out = grouped_mode(orders, "o_orderpriority", keys=["o_orderstatus"],
                       out_col="mode_priority", count_col="mode_n")
    return out.sort("o_orderstatus")


_ORDERS_MODE_SQL = """
SELECT o_orderstatus, mode_priority, mode_n FROM (
  SELECT o_orderstatus, o_orderpriority AS mode_priority,
         COUNT(*) AS mode_n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
  FROM orders GROUP BY o_orderstatus, o_orderpriority)
WHERE rn = 1 ORDER BY o_orderstatus
"""


def events_user_first_last(sf_dir: str):
    """Per-user FIRST / LAST event type by (ts, event_id) — the arg_min /
    arg_max aggregate, expressed as mergeable Min/Max over a sortable
    packed key (zero-padded epoch-micros ‖ zero-padded event_id ‖ etype),
    so ties are deterministic and the reduction stays a plain groupby
    Min/Max (no window, no per-key sort)."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def pack(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        key = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(micros, pa.string()), 20, padding="0"),
            pc.utf8_lpad(pc.cast(t["event_id"], pa.string()), 20,
                         padding="0"),
            t["event_type"], "|")
        return pa.table({"user_id": t["user_id"], "k": key})

    agg = (ev.map_batches(pack, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Min("k", alias_name="_first"),
                      Max("k", alias_name="_last")))

    def unpack(t: pa.Table) -> pa.Table:
        first = pc.utf8_slice_codeunits(t["_first"], 42)
        last = pc.utf8_slice_codeunits(t["_last"], 42)
        return pa.table({"user_id": t["user_id"],
                         "first_type": first, "last_type": last})

    return agg.map_batches(unpack, batch_format="pyarrow").sort("user_id")


_EVENTS_FIRST_LAST_SQL = """
SELECT user_id,
       substr(MIN(k), 43) AS first_type,
       substr(MAX(k), 43) AS last_type
FROM (SELECT user_id,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
             lpad(CAST(event_id AS VARCHAR), 20, '0') || '|' ||
             event_type AS k
      FROM events)
GROUP BY user_id ORDER BY user_id
"""


def customer_order_counts_outer(sf_dir: str):
    """LEFT OUTER equi-join (Ray's native hash join, join_type=
    'left_outer'): pre-aggregated per-customer order counts joined back
    onto customer so zero-order customers survive with n_orders = 0. The
    big side is reduced to one row per key BEFORE the join shuffle."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    counts = orders.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"))
    joined = cust.join(counts, join_type="left_outer",
                       num_partitions=_join_parts(sf_dir, "customer"),
                       on=("c_custkey",), right_on=("o_custkey",))

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "n_orders": pc.coalesce(t["n_orders"],
                                    pa.scalar(0, pa.int64())),
        })

    return joined.map_batches(fill, batch_format="pyarrow") \
                 .sort("c_custkey")


_CUST_OUTER_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey ORDER BY c_custkey
"""


def orders_cume_dist(sf_dir: str):
    """CUME_DIST() OVER (PARTITION BY priority ORDER BY price) —
    functions/window.py cume_dist: max-of-ties rank / n from exact
    integers, so the float64 quotient is bit-identical to SQL's."""
    from .functions.window import cume_dist

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])
    out = cume_dist(orders, keys=["o_orderpriority"],
                    order_by=["o_totalprice"], out_col="cd")
    return out.select_columns(["o_orderkey", "cd"]).sort("o_orderkey")


_ORDERS_CUMEDIST_SQL = """
SELECT o_orderkey,
       CUME_DIST() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice) AS cd
FROM orders ORDER BY o_orderkey
"""


def events_value_locf(sf_dir: str):
    """LOCF gap-fill (functions/window.py fill_forward): a deterministic
    synthetic gap stream (cents nulled where event_id % 7 == 0) filled
    per user in (ts, event_id) order — SQL LAST_VALUE(... IGNORE NULLS).
    Values pass through untouched, so the int64 cents round-trip exactly;
    rows before a user's first observation stay null."""
    from .functions.window import fill_forward

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def gap(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        is_gap = pc.equal(
            pc.subtract(t["event_id"],
                        pc.multiply(pc.divide(t["event_id"],
                                              pa.scalar(7, pa.int64())),
                                    pa.scalar(7, pa.int64()))),
            pa.scalar(0, pa.int64()))
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"],
            "cents": pc.if_else(is_gap, pa.scalar(None, pa.int64()),
                                cents),
        })

    gapped = ds.map_batches(gap, batch_format="pyarrow")
    out = fill_forward(gapped, "cents", keys=["user_id"],
                       order_by=["ts", "event_id"], out_col="cents_locf")
    return (out.select_columns(["event_id", "cents_locf"])
            .sort("event_id"))


_EVENTS_LOCF_SQL = """
SELECT event_id,
       LAST_VALUE(c IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS cents_locf
FROM (SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE CAST(ROUND(value * 100) AS BIGINT) END AS c
      FROM events)
ORDER BY event_id
"""


def events_user_rolling_avg(sf_dir: str):
    """Rolling AVG over ROWS 2 PRECEDING (window.rolling_sum with
    count_col): ONE window pass emits the exact int64 window sum and row
    count; avg is the same float64 division in both engines."""
    from .functions.window import rolling_sum

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    cents = ds.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"], "cents": _cents(t["value"])}),
        batch_format="pyarrow")
    out = rolling_sum(cents, "cents", keys=["user_id"],
                      order_by=["ts", "event_id"], window=3,
                      out_col="s3", count_col="c3")

    def div(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "event_id": t["event_id"],
            "avg3": pc.divide(pc.cast(t["s3"], pa.float64()),
                              pc.cast(t["c3"], pa.float64())),
        })

    return (out.map_batches(div, batch_format="pyarrow")
            .sort(["user_id", "event_id"]))


_EVENTS_ROLLAVG_SQL = """
SELECT user_id, event_id,
       CAST(SUM(c) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg3
FROM (SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS c FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def events_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((event_type), (q)) — neither a rollup nor a
    cube; both sets re-reduce ONE shuffled base (event_type, q) aggregate
    whose cardinality is bounded at any scale."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "q": pc.cast(pc.floor(pc.divide(
                pc.cast(pc.hour(t["ts"]), pa.float64()), 6.0)), pa.int64()),
        })

    base = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(["event_type", "q"])
            .aggregate(Count(alias_name="n")).materialize())

    def with_null(t: pa.Table, null_col: str) -> pa.Table:
        cols = {}
        for name, ty in (("event_type", pa.string()), ("q", pa.int64())):
            cols[name] = pa.nulls(len(t), ty) if name == null_col \
                else pc.cast(t[name], ty)
        cols["n"] = pc.cast(t["n"], pa.int64())
        return pa.table(cols)

    by_type = base.groupby("event_type") \
        .aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda t: with_null(t, "q"), batch_format="pyarrow")
    by_q = base.groupby("q") \
        .aggregate(Sum("n", alias_name="n")) \
        .map_batches(lambda t: with_null(t, "event_type"),
                     batch_format="pyarrow")
    return by_type.union(by_q)


_EVENTS_GSETS_SQL = """
SELECT event_type, q, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT event_type, EXTRACT(hour FROM ts) // 6 AS q FROM events) t
GROUP BY GROUPING SETS ((event_type), (q))
"""


def users_customers_full_outer(sf_dir: str):
    """FULL OUTER equi-join (Ray native hash join, join_type=
    'full_outer'): per-user event counts vs even-keyed customers — rows
    survive from BOTH unmatched sides (odd event users left-only, even
    customers with no events right-only). Big side pre-aggregated to one
    row per key before the join shuffle."""
    ev = read_table(sf_dir, "events", columns=["user_id"])
    counts = ev.groupby("user_id").aggregate(Count(alias_name="n_events"))
    def even_marked(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(
            pc.bit_wise_and(t["c_custkey"], pa.scalar(1, pa.int64())),
            pa.scalar(0, pa.int64())))
        # Ray coalesces the two join keys into ONE output column, so a
        # constant right-side payload is the only way to tell matched /
        # right-only rows from left-only ones after a full outer join.
        return t.append_column("cmark",
                               pa.array([1] * len(t), pa.int64()))

    cust = read_table(sf_dir, "customer", columns=["c_custkey"]) \
        .map_batches(even_marked, batch_format="pyarrow")
    joined = counts.join(cust, join_type="full_outer",
                         num_partitions=_join_parts(sf_dir, "customer"),
                         on=("user_id",), right_on=("c_custkey",))

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["user_id"],
            "n_events": pc.coalesce(t["n_events"],
                                    pa.scalar(0, pa.int64())),
            "has_cust": pc.cast(
                pc.coalesce(t["cmark"], pa.scalar(0, pa.int64())),
                pa.int64()),
        })

    return joined.map_batches(fill, batch_format="pyarrow").sort("key")


_FULL_OUTER_SQL = """
SELECT COALESCE(e.user_id, c.c_custkey) AS key,
       COALESCE(e.n_events, 0) AS n_events,
       CAST(CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END
            AS BIGINT) AS has_cust
FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) e
FULL JOIN (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0) c
  ON e.user_id = c.c_custkey
ORDER BY key
"""


def customer_stratified_sample(sf_dir: str):
    """Stratified fixed-size sampling (the balanced-subset training-data
    primitive): per market segment, the 5 customers with the smallest
    md5(custkey) — key-derived, so the sample is identical on any engine
    at any parallelism. Composed from window.topk_per_key over the hash
    order; only (segment, key, hash) enters the shuffle."""
    import hashlib

    from .functions.window import topk_per_key

    ds = read_table(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment"])

    def h(t: pa.Table) -> pa.Table:
        hs = pa.array([hashlib.md5(str(k).encode()).hexdigest()
                       for k in t["c_custkey"].to_pylist()], pa.string())
        return t.append_column("h", hs)

    out = topk_per_key(ds.map_batches(h, batch_format="pyarrow"), 5,
                       keys=["c_mktsegment"],
                       order_by=["h", "c_custkey"], descending=False,
                       out_col="rn")
    return (out.select_columns(["c_mktsegment", "c_custkey", "rn"])
            .sort(["c_mktsegment", "rn"]))


_CUST_STRAT_SQL = """
SELECT c_mktsegment, c_custkey, rn FROM (
  SELECT c_mktsegment, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5(CAST(c_custkey AS VARCHAR)),
                                     c_custkey) AS rn
  FROM customer)
WHERE rn <= 5 ORDER BY c_mktsegment, rn
"""


def events_type_share(sf_dir: str):
    """Share-of-total (fraction of all events per type): one bounded
    groupby → a scalar total via a driver aggregate over the TINY result
    (never the raw stream) → one exact float64 division. The classic
    two-pass normalize pattern."""
    ev = read_table(sf_dir, "events", columns=["event_type"])
    counts = (ev.groupby("event_type")
              .aggregate(Count(alias_name="n")).materialize())
    total = int(counts.sum("n") or 0)

    def share(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "share": pc.divide(pc.cast(t["n"], pa.float64()),
                               pa.scalar(float(total), pa.float64())),
        })

    return counts.map_batches(share, batch_format="pyarrow") \
        .sort("event_type")


_EVENTS_SHARE_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS DOUBLE)
         / (SELECT COUNT(*) FROM events) AS share
FROM events GROUP BY event_type ORDER BY event_type
"""


def orders_priority_quartiles(sf_dir: str):
    """NTILE(4) OVER (PARTITION BY priority ORDER BY price, key) —
    functions/window.py ntile_per_key with SQL's exact uneven-split rule
    (first n%q tiles get the extra row); pure integer arithmetic, so both
    engines agree bit-for-bit."""
    from .functions.window import ntile_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])
    out = ntile_per_key(orders, 4, keys=["o_orderpriority"],
                        order_by=["o_totalprice", "o_orderkey"],
                        out_col="quartile")
    return (out.select_columns(["o_orderkey", "quartile"])
            .sort("o_orderkey"))


_ORDERS_NTILE_KEY_SQL = """
SELECT o_orderkey,
       CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey)
            AS BIGINT) AS quartile
FROM orders ORDER BY o_orderkey
"""


def part_name_fuzzy_pairs(sf_dir: str):
    """Fuzzy self-join at edit distance <= 1 (functions/fuzzy.py): FastSS
    deletion-neighborhood blocking — exact recall, no all-pairs scan; the
    only shuffles are the deletion-key groupby and the pair distinct."""
    from .functions.fuzzy import fuzzy_pairs_ed1

    parts = read_table(sf_dir, "part", columns=["p_name"])
    return fuzzy_pairs_ed1(parts, "p_name").sort(["name_a", "name_b"])


_PART_FUZZY_SQL = """
SELECT a.n AS name_a, b.n AS name_b
FROM (SELECT DISTINCT p_name AS n FROM part) a,
     (SELECT DISTINCT p_name AS n FROM part) b
WHERE a.n < b.n AND levenshtein(a.n, b.n) <= 1
ORDER BY name_a, name_b
"""


def emb_label_centroids(sf_dir: str):
    """Per-label embedding centroid (functions/vectors.py): batches reduce
    to (label, dim, int64 micro-unit sum, count) partials before the
    shuffle — shuffle width is |labels| x dim — then one bounded groupby
    and a single exact float64 division."""
    from .functions.vectors import label_centroids

    emb = read_table(sf_dir, "embeddings", columns=["embedding", "label"])
    return label_centroids(emb).sort(["label", "dim"])


_EMB_CENTROID_SQL = """
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS centroid_micro
FROM (SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS v
      FROM embeddings)
GROUP BY label, dim ORDER BY label, dim
"""


def orders_rank_with_ties(sf_dir: str):
    """RANK() min-of-ties (functions/window.py rank_per_key), filtered to
    rank <= 3 — top-k WITH ties, which can return more than k rows per key
    (unlike row_number top-k). Value-deterministic, no tie-break column."""
    from .functions.window import rank_per_key

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_orderdate"])
    ranked = rank_per_key(orders, keys=["o_orderpriority"],
                          order_by=["o_orderdate"], descending=False,
                          out_col="rk")
    return (ranked.map_batches(
                lambda t: t.filter(pc.less_equal(t["rk"], 3)),
                batch_format="pyarrow")
            .select_columns(["o_orderkey", "o_orderpriority", "rk"])
            .sort(["o_orderpriority", "rk", "o_orderkey"]))


_ORDERS_RANK_TIES_SQL = """
SELECT o_orderkey, o_orderpriority, rk FROM (
  SELECT o_orderkey, o_orderpriority,
         RANK() OVER (PARTITION BY o_orderpriority
                      ORDER BY o_orderdate) AS rk
  FROM orders)
WHERE rk <= 3 ORDER BY o_orderpriority, rk, o_orderkey
"""


def events_user_hourly_dense(sf_dir: str):
    """Time-series densify / gap fill (functions/window.py densify_time):
    per-user hourly event counts with every hour of the user's own span
    present, absent hours filled with 0. Aggregate first (bounded rows),
    then densify inside the hash partition — output is keys x own span,
    never the global span."""
    from .functions.window import densify_time

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def to_hour(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "h": pc.floor_temporal(t["ts"], unit="hour"),
        })

    counts = (ev.map_batches(to_hour, batch_format="pyarrow")
              .groupby(["user_id", "h"])
              .aggregate(Count(alias_name="n")))

    def pin(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "h": pc.cast(t["h"], pa.timestamp("us")),
            "n": pc.cast(t["n"], pa.int64()),
        })

    dense = densify_time(counts.map_batches(pin, batch_format="pyarrow"),
                         keys=["user_id"], bucket_col="h",
                         value_cols={"n": 0}, freq="h")
    return dense.sort(["user_id", "h"])


_EVENTS_DENSE_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT user_id, unnest(generate_series(MIN(h), MAX(h),
                                         INTERVAL 1 HOUR)) AS h
  FROM hourly GROUP BY user_id)
SELECT s.user_id, s.h, CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n
FROM spans s LEFT JOIN hourly USING (user_id, h)
ORDER BY user_id, h
"""


def lineitem_latest_shipped(sf_dir: str):
    """Multi-key distributed sort + limit: the 25 most recently shipped
    line items, ties broken by (orderkey, linenumber) — exercises Ray's
    range-partitioned sort over a composite key with mixed directions,
    then a streaming limit (only the head block materializes)."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    return (li.sort(["l_shipdate", "l_orderkey", "l_linenumber"],
                    descending=[True, False, False])
            .limit(25))


_LINEITEM_LATEST_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
ORDER BY l_shipdate DESC, l_orderkey, l_linenumber
LIMIT 25
"""


def orders_above_cust_avg(sf_dir: str):
    """Decorrelated correlated subquery ("orders above their customer's
    average price"): per-customer (sum, count) aggregate → joined back on
    the big side → exact-integer boundary test. avg is the same float64
    division in both engines, and cents are exact ints, so the > boundary
    is bit-deterministic."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": t["o_custkey"],
                         "cents": _cents(t["o_totalprice"])})

    cents = orders.map_batches(prep, batch_format="pyarrow")
    stats = (cents.groupby("o_custkey")
             .aggregate(Sum("cents", alias_name="s"),
                        Count(alias_name="c"))
             .rename_columns({"o_custkey": "k"}))
    joined = cents.join(stats, join_type="inner",
                        num_partitions=_join_parts(sf_dir, "orders"),
                        on=("o_custkey",), right_on=("k",))

    def above(t: pa.Table) -> pa.Table:
        avg = pc.divide(pc.cast(t["s"], pa.float64()),
                        pc.cast(t["c"], pa.float64()))
        keep = pc.greater(pc.cast(t["cents"], pa.float64()), avg)
        return pa.table({"o_custkey": t["o_custkey"]}).filter(keep)

    return (joined.map_batches(above, batch_format="pyarrow")
            .groupby("o_custkey").aggregate(Count(alias_name="n_above"))
            .sort("o_custkey"))


_ORDERS_ABOVE_AVG_SQL = """
WITH c AS (SELECT o_custkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
s AS (SELECT o_custkey AS k, CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS avg
      FROM c GROUP BY o_custkey)
SELECT o_custkey, COUNT(*) AS n_above
FROM c JOIN s ON c.o_custkey = s.k
WHERE CAST(cents AS DOUBLE) > avg
GROUP BY o_custkey ORDER BY o_custkey
"""


def events_type_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event type — the two-level
    aggregate: dedup on the (type, user) PAIR first (combiner-friendly,
    shuffle width = distinct pairs, not rows), then a bounded per-type
    count. The exact counterpart of the HLL query
    `events_type_approx_users`."""
    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = (ev.groupby(["event_type", "user_id"])
             .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow"))
    return (pairs.groupby("event_type")
            .aggregate(Count(alias_name="n_users"))
            .sort("event_type"))


_EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def lineitem_weighted_avg_price(sf_dir: str):
    """Grouped weighted average (SUM(w*x) / SUM(w)) per return flag —
    quantity-weighted unit price in exact integer cents (both moments are
    int64 sums, order-free), one identical float64 division at the end."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        qty = pc.cast(t["l_quantity"], pa.int64())
        cents = _cents(t["l_extendedprice"])
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "wx": pc.multiply(qty, cents),
            "w": qty,
        })

    agg = (li.map_batches(prep, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(Sum("wx", alias_name="swx"),
                      Sum("w", alias_name="sw")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "wavg_cents": pc.divide(pc.cast(t["swx"], pa.float64()),
                                    pc.cast(t["sw"], pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("l_returnflag")


_LINEITEM_WAVG_SQL = """
SELECT l_returnflag,
       CAST(SUM(q * cents) AS DOUBLE) / SUM(q) AS wavg_cents
FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def events_type_transitions(sf_dir: str):
    """Event-sequence transition counts (the Markov-chain / session-flow
    mining primitive): per user in (ts, event_id) order, each consecutive
    (prev_type -> type) pair, counted globally. One window pass
    (window.lag_column) + one bounded groupby (width = |types|^2)."""
    from .functions.window import lag_column

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    lagged = lag_column(ev, "event_type", keys=["user_id"],
                        order_by=["ts", "event_id"], out_col="prev_type")
    return (lagged.map_batches(
                lambda t: t.filter(pc.is_valid(t["prev_type"])),
                batch_format="pyarrow")
            .groupby(["prev_type", "event_type"])
            .aggregate(Count(alias_name="n"))
            .sort(["prev_type", "event_type"]))


_EVENTS_TRANSITIONS_SQL = """
SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type
      FROM events)
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type ORDER BY prev_type, event_type
"""


def events_funnel(sf_dir: str):
    """Ordered funnel (signup -> purchase): per user, did the first signup
    precede the first purchase? One bounded per-(user, type) min-ts
    aggregate, pivoted to two columns, then an exact timestamp compare.
    Counts users at each funnel stage."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"],
                                 value_set=pa.array(["signup",
                                                     "purchase"])))

    def split(t: pa.Table) -> pa.Table:
        is_s = pc.equal(t["event_type"], pa.scalar("signup"))
        return pa.table({
            "user_id": t["user_id"],
            "s_ts": pc.if_else(is_s, t["ts"],
                               pa.scalar(None, pa.timestamp("us"))),
            "p_ts": pc.if_else(is_s, pa.scalar(None, pa.timestamp("us")),
                               t["ts"]),
        })

    # conditional-Min pivot per user (nulls ignored by Ray's Min), then
    # per-batch partial flag sums + one global scalar reduce — no stage
    # ever holds more than a batch
    firsts = (ev.map_batches(keep, batch_format="pyarrow")
              .map_batches(split, batch_format="pyarrow")
              .groupby("user_id")
              .aggregate(Min("s_ts", alias_name="s"),
                         Min("p_ts", alias_name="p")))

    def flags(t: pa.Table) -> pa.Table:
        s_ok = pc.is_valid(t["s"])
        both = pc.and_(s_ok, pc.is_valid(t["p"]))
        conv = pc.and_kleene(both, pc.less(t["s"], t["p"]))
        return pa.table({
            "signup_users": pa.array(
                [pc.sum(pc.cast(s_ok, pa.int64())).as_py() or 0],
                pa.int64()),
            "funnel_users": pa.array(
                [pc.sum(pc.cast(pc.coalesce(conv, pa.scalar(False)),
                                pa.int64())).as_py() or 0], pa.int64()),
        })

    partials = firsts.map_batches(flags, batch_format="pyarrow")
    total = pa.table({
        "signup_users": pa.array([int(partials.sum("signup_users") or 0)],
                                 pa.int64()),
        "funnel_users": pa.array([int(partials.sum("funnel_users") or 0)],
                                 pa.int64()),
    })
    return ray.data.from_arrow(total)


_EVENTS_FUNNEL_SQL = """
WITH f AS (SELECT user_id,
                  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s,
                  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p
           FROM events GROUP BY user_id)
SELECT CAST(COUNT(s) AS BIGINT) AS signup_users,
       CAST(SUM(CASE WHEN s IS NOT NULL AND p IS NOT NULL AND s < p
                     THEN 1 ELSE 0 END) AS BIGINT) AS funnel_users
FROM f
"""


def events_user_streaks(sf_dir: str):
    """Gaps-and-islands (longest consecutive-day activity streak per
    user): the classic date − row_number() trick — distinct (user, day)
    rows get a per-user row number in day order; day − rn is constant
    within an island; one bounded groupby counts island lengths, a max
    picks the streak. Composes the existing row_number window operator."""
    from .functions.window import row_number

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def to_day(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        return pa.table({"user_id": t["user_id"],
                         "epoch_day": pc.divide(
                             pc.cast(day, pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64()))})

    days = (ev.map_batches(to_day, batch_format="pyarrow")
            .groupby(["user_id", "epoch_day"])
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow"))
    numbered = row_number(days, keys=["user_id"],
                          order_by=["epoch_day"], out_col="rn")

    def island(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "island": pc.subtract(t["epoch_day"],
                                  pc.cast(t["rn"], pa.int64())),
        })

    lengths = (numbered.map_batches(island, batch_format="pyarrow")
               .groupby(["user_id", "island"])
               .aggregate(Count(alias_name="len")))
    return (lengths.groupby("user_id")
            .aggregate(Max("len", alias_name="max_streak"))
            .sort("user_id"))


_EVENTS_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS d
  FROM events),
isl AS (
  SELECT user_id,
         d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days)
SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS max_streak
FROM (SELECT user_id, island, COUNT(*) AS cnt
      FROM isl GROUP BY user_id, island)
GROUP BY user_id ORDER BY user_id
"""


def docs_incremental_dedup(sf_dir: str):
    """Incremental / cross-corpus dedup (the 'new data vs frozen
    reference' training-pipeline primitive): documents with even doc_id
    play the frozen reference corpus; the odd-id batch keeps only docs
    whose text fingerprint does NOT appear in the reference — an anti
    semi-join on the content hash (functions/joins.py anti_join), shipping
    only (fingerprint, id) through the shuffle. Returns per-source
    counts of surviving new docs."""
    import hashlib

    from .functions.joins import anti_join

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source"])

    def fp(t: pa.Table) -> pa.Table:
        hs = pa.array([hashlib.md5(s.encode()).hexdigest()
                       for s in t["text"].to_pylist()], pa.string())
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "fp": hs,
            "is_ref": pc.equal(
                pc.bit_wise_and(t["doc_id"], pa.scalar(1, pa.int64())),
                pa.scalar(0, pa.int64())),
        })

    with_fp = docs.map_batches(fp, batch_format="pyarrow")
    ref = with_fp.map_batches(lambda t: t.filter(t["is_ref"]),
                              batch_format="pyarrow") \
        .select_columns(["fp"])
    new = with_fp.map_batches(
        lambda t: t.filter(pc.invert(t["is_ref"])),
        batch_format="pyarrow").select_columns(["doc_id", "source", "fp"])
    kept = anti_join(new, ref, left_key="fp", right_key="fp")
    return (kept.groupby("source").aggregate(Count(alias_name="n_new"))
            .sort("source"))


_DOCS_INCR_DEDUP_SQL = """
WITH fp AS (SELECT doc_id, source, md5(text) AS fp FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_new
FROM fp n
WHERE n.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM fp r
                  WHERE r.doc_id % 2 = 0 AND r.fp = n.fp)
GROUP BY source ORDER BY source
"""


_COOCCUR_MEMO: dict = {}


def _part_cooccur_counts(sf_dir: str):
    """Dataset(pa, pb, n): distinct part pairs co-ordered in one basket
    (pa < pb), with global co-occurrence counts. Pair explosion is bounded
    by the per-basket item count (TPC-H: <= 7 items per order → <= 21
    pairs), the quadratic step runs inside the order's hash partition, and
    only (pa, pb) pairs enter the count shuffle. Memoized materialized per
    sf_dir (round 3): every part_graph_* query starts from these counts,
    and rebuilding them dominated the graph-query family's wall time."""
    if sf_dir in _COOCCUR_MEMO:
        return _COOCCUR_MEMO[sf_dir]
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])

    def pairs(part: pd.DataFrame) -> pa.Table:
        # distinct (order, part) inside the order's hash partition — every
        # row of an order is co-located, so partition-local drop_duplicates
        # IS the global distinct (no separate 60k-tiny-group shuffle)
        part = part.drop_duplicates(["l_orderkey", "l_partkey"])
        _, a_out, b_out = _pairs_within_groups(
            part["l_orderkey"].to_numpy(np.int64),
            part["l_partkey"].to_numpy(np.int64))
        return pa.table({"pa": pa.array(a_out, pa.int64()),
                         "pb": pa.array(b_out, pa.int64())})

    from .functions.partitions import default_parts

    nparts = default_parts()

    def tag(t: pa.Table) -> pa.Table:
        part = pd.util.hash_pandas_object(
            pd.Series(t["l_orderkey"].to_pandas()), index=False) % nparts
        return t.append_column("_p",
                               pa.array(part.to_numpy(), pa.int64()))

    def tag_pair(t: pa.Table) -> pa.Table:
        part = pd.util.hash_pandas_object(
            pd.DataFrame({"a": t["pa"].to_pandas(),
                          "b": t["pb"].to_pandas()}), index=False) % nparts
        return t.append_column("_pp",
                               pa.array(part.to_numpy(), pa.int64()))

    def count_pairs(g: pd.DataFrame) -> pa.Table:
        # vectorized per-bucket count: nearly every basket pair is
        # unique (sf0.1: 1.196M distinct of 1.199M instances), and
        # Ray's sort-groupby aggregate walks those 1.2M one-row groups
        # in Python — 78 s where this hash-bucketed pandas size() takes
        # ~3 s. Buckets hash on the full (pa, pb) key, so bucket-local
        # counts ARE global counts.
        cnt = g.groupby(["pa", "pb"], sort=False).size() \
            .reset_index(name="n")
        return pa.table({"pa": pa.array(cnt["pa"].to_numpy(np.int64)),
                         "pb": pa.array(cnt["pb"].to_numpy(np.int64)),
                         "n": pa.array(cnt["n"].to_numpy(np.int64))})

    _COOCCUR_MEMO[sf_dir] = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("_p").map_groups(pairs, batch_format="pandas")
        .map_batches(tag_pair, batch_format="pyarrow")
        .groupby("_pp").map_groups(count_pairs, batch_format="pandas")
    ).materialize()
    return _COOCCUR_MEMO[sf_dir]


def lineitem_part_pairs(sf_dir: str):
    """Market-basket co-occurrence (parts ordered together): top 20 part
    pairs by basket count — the standard co-occurrence mining shape."""
    counted = _part_cooccur_counts(sf_dir)
    return counted.sort(["n", "pa", "pb"],
                        descending=[True, False, False]).limit(20)


_LINEITEM_PAIRS_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS pa, b.l_partkey AS pb,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 ORDER BY n DESC, pa, pb LIMIT 20
"""


def q10_returned_customers(sf_dir: str):
    """TPC-H Q10 shape: revenue lost to returned items per customer in a
    quarter, joined to customer + nation, top 20. The lineitem side is
    reduced to one row per order BEFORE any join; customer/nation attach
    via Ray's hash join with the pre-aggregated side as build."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_o(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1996-10-01", "us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"))
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders_f = orders.map_batches(filt_o, batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag",
                             "l_extendedprice", "l_discount"])

    def prep_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        cents = _cents(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_cents": cents})

    li_agg = (li.map_batches(prep_li, batch_format="pyarrow")
              .groupby("l_orderkey")
              .aggregate(Sum("rev_cents", alias_name="rev_cents")))

    # aggregate side as LEFT: a groupby output always carries its schema,
    # while a filtered map_batches side can yield schema-less empty blocks
    # that break Ray's hash-join key resolution.
    j1 = li_agg.join(orders_f, join_type="inner",
                     num_partitions=_join_parts(sf_dir, "orders"),
                     on=("l_orderkey",), right_on=("o_orderkey",))
    per_cust = (j1.groupby("o_custkey")
                .aggregate(Sum("rev_cents", alias_name="rev_cents")))

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_nationkey"])
    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_name"])
    nmap = ray.put({r["n_nationkey"]: r["n_name"]
                    for r in nation.take_all()})

    j2 = per_cust.join(cust, join_type="inner",
                       num_partitions=_join_parts(sf_dir, "customer"),
                       on=("o_custkey",), right_on=("c_custkey",))

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(nmap)
        names = [m[k] for k in t["c_nationkey"].to_pylist()]
        return pa.table({
            "c_custkey": t["o_custkey"],
            "c_name": t["c_name"],
            "n_name": pa.array(names, pa.string()),
            "rev_cents": t["rev_cents"],
        })

    return (j2.map_batches(attach, batch_format="pyarrow")
            .sort(["rev_cents", "c_custkey"], descending=[True, False])
            .limit(20))


_Q10_SQL = """
SELECT c_custkey, c_name, n_name, rev_cents FROM (
  SELECT c.c_custkey, c.c_name, n.n_name,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= DATE '1996-10-01'
    AND o.o_orderdate < DATE '1997-01-01'
    AND l.l_returnflag = 'R'
  GROUP BY 1, 2, 3)
ORDER BY rev_cents DESC, c_custkey LIMIT 20
"""


def q18_large_volume_cust(sf_dir: str):
    """TPC-H Q18 shape (HAVING join-back): orders whose total quantity
    exceeds a threshold, re-joined to orders + customer for attributes.
    The aggregate-then-filter side is tiny after HAVING, so it drives both
    joins as the build side; the raw lineitem stream never joins anything."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_quantity"])
    qty = (li.groupby("l_orderkey")
           .aggregate(Sum("l_quantity", alias_name="total_qty")))

    def having(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["total_qty"], pa.scalar(250.0)))
        # quantities are integral-valued doubles; the sum is exact
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "total_qty": pc.cast(t["total_qty"], pa.int64())})

    big = qty.map_batches(having, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    j1 = big.join(orders, join_type="inner",
                  num_partitions=_join_parts(sf_dir, "orders"),
                  on=("l_orderkey",), right_on=("o_orderkey",))

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name"])
    j2 = j1.join(cust, join_type="inner",
                 num_partitions=_join_parts(sf_dir, "customer"),
                 on=("o_custkey",), right_on=("c_custkey",))

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["o_custkey"],
            "c_name": t["c_name"],
            "o_orderkey": t["l_orderkey"],
            "total_qty": t["total_qty"],
            "price_cents": _cents(t["o_totalprice"]),
        })

    return (j2.map_batches(shape, batch_format="pyarrow")
            .sort(["total_qty", "o_orderkey"], descending=[True, False])
            .limit(50))


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250)
SELECT c_custkey, c_name, o_orderkey, total_qty,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM big JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT 50
"""


def q14_promo_share(sf_dir: str):
    """TPC-H Q14 shape (conditional share of revenue): fraction of revenue
    from promo-class parts in one month. Round-3 de-broadcast (r2 VERDICT
    weak item #2): lineitem cents are pre-aggregated per partkey (per-batch
    combiner, then a skinny groupby bounded by |part| cardinality), and the
    promo slice comes from the co-partitioned ``semi_join`` against the
    promo partkeys — no driver-side partkey set, no per-row Python ``in``
    probe, nothing that grows with scale factor on the driver."""
    from .functions.joins import semi_join

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])
    promo_parts = part.map_batches(
        lambda t: t.filter(pc.starts_with(t["p_type"], "PROMO"))
        .select(["p_partkey"]),
        batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1996-01-01", "us"))
        hi = pa.scalar(np.datetime64("1996-07-01", "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        cents = _cents(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])))
        g = pa.table({"l_partkey": t["l_partkey"], "cents": cents}) \
            .group_by("l_partkey").aggregate([("cents", "sum")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "cents": pc.cast(g["cents_sum"], pa.int64())})

    # materialize: ≤|part| rows after the aggregate, consumed twice below
    by_part = (li.map_batches(partial, batch_format="pyarrow")
               .groupby("l_partkey")
               .aggregate(Sum("cents", alias_name="cents"))).materialize()
    total_c = int(by_part.sum("cents") or 0)
    promo_c = int(semi_join(by_part, promo_parts, left_key="l_partkey",
                            right_key="p_partkey").sum("cents") or 0)
    share = round(100.0 * promo_c / total_c, 4) if total_c else 0.0
    return ray.data.from_arrow(pa.table({
        "promo_cents": pa.array([promo_c], pa.int64()),
        "total_cents": pa.array([total_c], pa.int64()),
        "promo_share_pct": pa.array([share], pa.float64()),
    }))


_Q14_SQL = """
WITH c AS (
  SELECT CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS cents,
         p_type LIKE 'PROMO%' AS is_promo
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-07-01')
SELECT CAST(COALESCE(SUM(cents) FILTER (WHERE is_promo), 0) AS BIGINT)
           AS promo_cents,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents,
       round(100.0 * COALESCE(SUM(cents) FILTER (WHERE is_promo), 0)
             / SUM(cents), 4) AS promo_share_pct
FROM c
"""


def q22_rich_inactive_custs(sf_dir: str):
    """TPC-H Q22 shape (global-average subquery + anti-join): customers
    whose balance exceeds the positive-balance average AND who placed no
    order since 2000, counted per nation. The average is carried as an
    exact integer
    rational (sum_cents, count) and the comparison is done in integer
    cross-multiplication — no float boundary can flip a row on either
    engine. Anti-join is the co-partitioned membership filter."""
    from .functions.joins import anti_join

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def cents_tbl(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "c_nationkey": t["c_nationkey"],
            "bal_cents": _cents(t["c_acctbal"]),
        })

    cc = cust.map_batches(cents_tbl, batch_format="pyarrow").materialize()

    def pos_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["bal_cents"], pa.scalar(0, pa.int64())))
        return pa.table({
            "s": pa.array([pc.sum(pos["bal_cents"]).as_py() or 0],
                          pa.int64()),
            "n": pa.array([pos.num_rows], pa.int64()),
        })

    p = cc.map_batches(pos_partial, batch_format="pyarrow")
    s_tot = int(p.sum("s") or 0)
    n_tot = int(p.sum("n") or 0)

    def rich(t: pa.Table) -> pa.Table:
        # bal > s/n  <=>  bal * n > s   (exact int64 math)
        keep = pc.greater(pc.multiply(t["bal_cents"],
                                      pa.scalar(n_tot, pa.int64())),
                          pa.scalar(s_tot, pa.int64()))
        return t.filter(keep)

    rich_c = cc.map_batches(rich, batch_format="pyarrow")
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate"])
    recent = orders.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["o_orderdate"],
            pa.scalar(np.datetime64("2000-01-01", "us"))))
        .select(["o_custkey"]),
        batch_format="pyarrow")
    inactive = anti_join(rich_c, recent,
                         left_key="c_custkey", right_key="o_custkey")
    return (inactive.groupby("c_nationkey")
            .aggregate(Count(alias_name="numcust"),
                       Sum("bal_cents", alias_name="totbal_cents"))
            .sort("c_nationkey"))


_Q22_SQL = """
WITH avgpos AS (
  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE round(c_acctbal * 100) > 0)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS totbal_cents
FROM customer, avgpos
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def part_graph_triangles(sf_dir: str):
    """Distributed triangle counting (functions/graphops.py
    ``triangle_count``) over the part co-occurrence graph: an edge joins
    two parts ordered together in >= 2 baskets. Degree-oriented wedge
    counting — each triangle counted once at its minimum-(degree, id)
    vertex, out-degree bounded O(sqrt(|E|)) so hub parts cannot explode
    the wedge set; degrees attach via co-partitioned union+groupby, never
    a driver dict."""
    from .functions.graphops import triangle_count

    return triangle_count(_part_strong_edges(sf_dir), u="u", v="v")


_PART_TRIANGLES_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM e e1 JOIN e e2 ON e1.v = e2.u
          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""


def part_graph_kcore(sf_dir: str):
    """k-core extraction (functions/graphops.py ``kcore``): the 3-core of
    the part co-occurrence graph — iterative peeling, one degree
    aggregate per round plus a membership filter (small low-degree sets
    broadcast as bare id arrays; past the documented threshold the
    filter runs as two co-partitioned passes with no broadcast). Output:
    one row {core_nodes, core_edges}. Rows-only for the driver
    (subtractive fixpoint is not recursive-CTE friendly); the exact
    oracle is the brute-force peeling test in
    tests/test_graph_properties.py."""
    from .functions.graphops import kcore

    core = kcore(_part_strong_edges(sf_dir), u="u", v="v",
                 k=3, num_partitions=_join_parts(sf_dir)).materialize()
    n_edges = core.count()
    if n_edges == 0:
        n_nodes = 0
    else:
        nodes = core.map_batches(
            lambda t: pa.concat_tables([pa.table({"x": t["u"]}),
                                        pa.table({"x": t["v"]})]),
            batch_format="pyarrow")
        n_nodes = (nodes.groupby("x")
                   .map_groups(lambda t: t.slice(0, 1),
                               batch_format="pyarrow").count())
    return ray.data.from_arrow(pa.table({
        "core_nodes": pa.array([n_nodes], pa.int64()),
        "core_edges": pa.array([n_edges], pa.int64()),
    }))


# six graph queries share this edge table; memoize the MATERIALIZED
# blocks per sf_dir (same pattern as _KG_MEMO) so the driver's per-query
# calls don't re-run the basket-pair generation each time
_EDGE_MEMO: dict = {}


def _part_strong_edges(sf_dir: str):
    """Dataset(u, v) with u < v: part co-occurrence edges supported by
    >= 2 baskets — the shared graph for triangles / k-core / degree /
    link-prediction queries. Memoized materialized per sf_dir."""
    if sf_dir not in _EDGE_MEMO:
        counted = _part_cooccur_counts(sf_dir)

        def strong(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t["n"],
                                          pa.scalar(2, pa.int64())))
            return pa.table({"u": t["pa"], "v": t["pb"]})

        _EDGE_MEMO[sf_dir] = counted.map_batches(
            strong, batch_format="pyarrow").materialize()
    return _EDGE_MEMO[sf_dir]


def part_graph_degree_hist(sf_dir: str):
    """Degree distribution of the part co-occurrence graph: degree →
    node count, the first diagnostic run on any web-scale graph (power-law
    check). Two narrow aggregates — endpoints→degree, degree→count —
    nothing wider than (node, deg) ever shuffles."""
    edges = _part_strong_edges(sf_dir)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables([pa.table({"node": t["u"]}),
                                 pa.table({"node": t["v"]})])

    deg = (edges.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg")))
    return (deg.groupby("deg").aggregate(Count(alias_name="n_nodes"))
            .sort("deg"))


_PART_DEGREE_HIST_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1)
SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY deg ORDER BY deg
"""


def part_graph_jaccard(sf_dir: str):
    """Neighborhood-Jaccard link prediction: top 20 part pairs by
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| over the co-occurrence graph. Common
    neighbors count via wedge pairs co-partitioned by the SHARED
    neighbor (each wedge center emits its own adjacency pairs — O(deg²)
    per hub, the same frontier the SQL self-join pays; cap or sample hub
    adjacency at web scale), degrees attach via two hash joins. Jaccard
    is emitted as the exact int pair (common, union_sz) plus the double
    ratio — both engines divide identical int64s, so the doubles are
    bit-equal. Join partitions are sized from the probe side
    (_join_parts): each hash-shuffle partition is an aggregator actor,
    and over-provisioning actors past the CPU count stalls small runs."""
    edges = _part_strong_edges(sf_dir)
    nparts = _join_parts(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "mid": pa.concat_arrays([t["u"].combine_chunks(),
                                     t["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["v"].combine_chunks(),
                                     t["u"].combine_chunks()])})

    adj = edges.map_batches(sym, batch_format="pyarrow")

    deg = (adj.groupby("mid").aggregate(Count(alias_name="deg"))
           .rename_columns({"mid": "node"}))

    pair_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def wedge_pairs(g: pd.DataFrame) -> pa.Table:
        _, u_out, v_out = _pairs_within_groups(
            g["mid"].to_numpy(np.int64), g["nbr"].to_numpy(np.int64))
        return pa.table({"u": pa.array(u_out, pa.int64()),
                         "v": pa.array(v_out, pa.int64())}).cast(pair_schema)

    common = (adj.groupby("mid")
              .map_groups(wedge_pairs, batch_format="pandas")
              .groupby(["u", "v"]).aggregate(Count(alias_name="common")))

    j1 = common.join(deg.rename_columns({"deg": "deg_u"}),
                     join_type="inner", num_partitions=nparts,
                     on=("u",), right_on=("node",))
    j2 = j1.join(deg.rename_columns({"deg": "deg_v"}),
                 join_type="inner", num_partitions=nparts,
                 on=("v",), right_on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        union_sz = pc.subtract(pc.add(t["deg_u"], t["deg_v"]), t["common"])
        jac = pc.divide(pc.cast(t["common"], pa.float64()),
                        pc.cast(union_sz, pa.float64()))
        return pa.table({"u": t["u"], "v": t["v"], "common": t["common"],
                         "union_sz": union_sz, "jaccard": jac})

    return (j2.map_batches(finish, batch_format="pyarrow")
            .sort(["jaccard", "u", "v"], descending=[True, False, False])
            .limit(20))


_PART_JACCARD_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT u AS mid, v AS nbr FROM e
        UNION ALL SELECT v, u FROM e),
deg AS (SELECT mid AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1),
common AS (SELECT x.nbr u, y.nbr v, CAST(COUNT(*) AS BIGINT) AS common
           FROM sym x JOIN sym y ON x.mid = y.mid AND x.nbr < y.nbr
           GROUP BY 1, 2)
SELECT c.u, c.v, c.common,
       da.deg + db.deg - c.common AS union_sz,
       CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common) AS jaccard
FROM common c JOIN deg da ON da.node = c.u JOIN deg db ON db.node = c.v
ORDER BY jaccard DESC, u, v LIMIT 20
"""


def docs_inverted_index(sf_dir: str):
    """Inverted-index build (the IR/retrieval core): per term, document
    frequency plus the head of the posting list (first 10 doc_ids
    ascending, comma-joined), top 50 terms by (df desc, term). Each doc
    lives in exactly one row, so per-batch distinct (term, doc_id) pairs
    are already globally distinct — the shuffle carries one row per
    posting, and the per-term cell is bounded by the 10-id head (full
    posting lists at web scale go to a partitioned Parquet sink keyed by
    term instead)."""
    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=500)

    def pairs(t: pa.Table) -> pa.Table:
        ids, terms = [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            for term in set(_TERM_RE.findall((txt or "").lower())):
                ids.append(did)
                terms.append(term)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    out_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                            ("postings", pa.string())])

    def assemble(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("doc_id")
        agg = g.groupby("term", sort=False)["doc_id"].agg(
            [("df", "size"),
             ("postings", lambda s: ",".join(str(i) for i in s.iloc[:10]))]
        ).reset_index()
        return pa.table({"term": pa.array(agg["term"], pa.string()),
                         "df": pa.array(agg["df"], pa.int64()),
                         "postings": pa.array(agg["postings"],
                                              pa.string())}).cast(out_schema)

    return (docs.map_batches(pairs, batch_format="pyarrow")
            .groupby("term").map_groups(assemble, batch_format="pandas")
            .sort(["df", "term"], descending=[True, False]).limit(50))


_DOCS_INVERTED_SQL = """
WITH p AS (SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
    FROM documents)),
r AS (SELECT term, doc_id,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM p)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           FILTER (WHERE rn <= 10) AS postings
FROM r GROUP BY term ORDER BY df DESC, term LIMIT 50
"""


def part_graph_bfs(sf_dir: str):
    """Single-source BFS (functions/graphops.py ``bfs_distances``) from
    the minimum part id over the co-occurrence graph: (node, min hop
    distance) for every node within 20 hops. Level-synchronous frontier
    rounds — co-partitioned semi/anti joins, no broadcast, rounds =
    source eccentricity. The 20-hop cap is part of the operator's
    contract and mirrored exactly in the SQL oracle's recursion bound,
    so both engines agree even on graphs deeper than the cap."""
    from .functions.graphops import bfs_distances

    edges = _part_strong_edges(sf_dir)
    src = edges.min("u")  # u < v per edge ⇒ global min node appears as u
    # per-round cost scales with partition count; size it from the data
    # (_join_parts) — results are partition-count invariant (tested)
    return bfs_distances(edges, source=src, u="u", v="v",
                         num_partitions=_join_parts(sf_dir),
                         max_iters=20).sort(["dist", "node"])


_PART_BFS_SQL = """
WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT u AS mid, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
walk(node, dist) AS (
    SELECT (SELECT MIN(u) FROM e), 0
    UNION
    SELECT s.nbr, w.dist + 1
    FROM walk w JOIN sym s ON s.mid = w.node
    WHERE w.dist < 20
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY dist, node
"""


def part_graph_components(sf_dir: str):
    """Connected-component size histogram of the co-occurrence graph
    (component_size → n_components): the distributed min-label
    propagation from the flagship's canonicalize stage
    (stages/canonicalize.py ``connected_components_distributed`` —
    join-free co-partitioned rounds, no driver dict) applied to an
    int-keyed graph, proving the operator is generic beyond entity
    strings. Only sizes are compared, so the string-min vs numeric-min
    label representative difference between the engines is immaterial."""
    from .stages.canonicalize import connected_components_distributed

    edges = _part_strong_edges(sf_dir)

    def to_str(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t["u"], pa.string()),
                         "dst": pc.cast(t["v"], pa.string())})

    labels = connected_components_distributed(
        edges.map_batches(to_str, batch_format="pyarrow"))
    sizes = labels.groupby("label").aggregate(
        Count(alias_name="component_size"))
    return (sizes.groupby("component_size")
            .aggregate(Count(alias_name="n_components"))
            .sort("component_size"))


_PART_COMPONENTS_SQL = """
WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT u AS mid, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
reach(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT s.nbr, r.lbl
    FROM reach r JOIN sym s ON s.mid = r.node
    WHERE r.lbl < s.nbr
),
comp AS (SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node),
sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS component_size
          FROM comp GROUP BY lbl)
SELECT component_size, CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY component_size ORDER BY component_size
"""


def events_user_path(sf_dir: str):
    """Ordered sequence aggregation (session-flow path per user): the
    user's full event-type path, ts-ordered, joined with '>'. Unlike
    collect_set (value-sorted distinct), this keeps duplicates in event
    order — the path/clickstream-mining primitive. Groups are
    hash-partitioned per user; per-user row width is bounded by the user's
    own event count."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("path", pa.string())])

    def assemble(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        paths = g.groupby("user_id", sort=True)["event_type"] \
            .agg(">".join)
        return pa.table({"user_id": pa.array(paths.index.to_numpy(),
                                             pa.int64()),
                         "path": pa.array(paths.to_numpy(), pa.string())}
                        ).cast(out_schema)

    return (ev.groupby("user_id")
            .map_groups(assemble, batch_format="pandas")
            .sort("user_id"))


_EVENTS_PATH_SQL = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id ORDER BY user_id
"""


def docs_contamination(sf_dir: str):
    """Benchmark decontamination (functions/dedup.py
    ``contamination_flags``): docs sharing >= 1 word 8-gram with a
    held-out "benchmark" subset (doc_id % 7 == 0) — the n-gram-overlap
    contamination check run before training on web text. Co-partitioned
    by shingle hash; neither side is broadcast or driver-materialized.
    Rows-only for the driver (shingling is not SQL-expressible); the
    exact oracle is the planted-overlap test in tests/test_dedup.py."""
    from .functions.dedup import contamination_flags

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _mod7(t: pa.Table, want_ref: bool) -> pa.Table:
        m = t["doc_id"].to_numpy(zero_copy_only=False) % 7 == 0
        return t.filter(pa.array(m if want_ref else ~m))

    ref = docs.map_batches(lambda t: _mod7(t, True),
                           batch_format="pyarrow")
    check = docs.map_batches(lambda t: _mod7(t, False),
                             batch_format="pyarrow")
    return contamination_flags(check, ref, shingle_k=8).sort("doc_id")


def emb_semdedup(sf_dir: str):
    """SemDeDup-style semantic dedup (functions/dedup.py
    ``semantic_dedup``): k-means-bucket the embedding space, keep the
    lowest-id member of every within-cluster cosine>=0.9 neighborhood.
    The O(n^2) cosine step runs per cluster (n/k rows), so k caps the
    partition-local work. The synthetic embeddings have no cosine>=0.8
    pairs, so the corpus is augmented with an exact copy of every 20th
    vector (vec_id + 1_000_000) — survivors must be exactly the original
    ids. Rows-only for the driver (iterative kmeans is non-SQL); the
    exact oracle is the planted-duplicate test in tests/test_dedup.py."""
    from .functions.dedup import semantic_dedup

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def planted(t: pa.Table) -> pa.Table:
        m = t["vec_id"].to_numpy(zero_copy_only=False) % 20 == 0
        d = t.filter(pa.array(m))
        return pa.table({
            "vec_id": pc.add(d["vec_id"], pa.scalar(1_000_000, pa.int64())),
            "embedding": d["embedding"],
        })

    aug = ds.union(ds.map_batches(planted, batch_format="pyarrow"))
    return semantic_dedup(aug, k=8, iters=3, threshold=0.9).sort("vec_id")


def emb_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding column
    (functions/vectors.py ``kmeans``) — the semantic-clustering primitive
    behind cluster-balanced sampling and semantic dedup of training data.
    Deterministic on any partitioning (md5 bottom-k init, exact int64
    micro-unit centroid sums, lowest-id tie-break); per iteration only
    k x dim partial rows shuffle, vectors never move. Output: cluster
    sizes. Rows-only for the driver (iterative, non-SQL); the exact
    oracle is the driver-side reference loop in tests/test_kmeans.py."""
    from .functions.vectors import kmeans

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, assign = kmeans(ds, k=8, iters=5)
    return (assign.groupby("cluster").aggregate(Count(alias_name="n"))
            .sort("cluster"))


def q4_priority_late_ship(sf_dir: str):
    """TPC-H Q4 shape (EXISTS semi-join): orders placed in Q1-1997 with at
    least one lineitem shipped more than 60 days after the order date,
    counted per priority. The EXISTS probe is pre-aggregated BEFORE the
    join — lineitem collapses to per-order MAX(l_shipdate) (a combinable
    aggregate, so the shuffle carries one row per order, never per line),
    and existence of a late line ≡ max_ship > o_orderdate + 60 d. The
    join is the co-partitioned hash equi-join sized by _join_parts."""
    from .functions.joins import auto_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])
    lo = pa.scalar(np.datetime64("1997-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-04-01", "us"))
    owin = orders.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                                   pc.less(t["o_orderdate"], hi))),
        batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"])
    max_ship = (li.groupby("l_orderkey")
                .aggregate(Max("l_shipdate", alias_name="max_ship")))

    joined = auto_join(owin, max_ship, left_key="o_orderkey",
                       right_key="l_orderkey", right_cols=["max_ship"],
                       num_partitions=_join_parts(sf_dir, "orders"))

    def late(df: pd.DataFrame) -> pa.Table:
        keep = df["max_ship"] > df["o_orderdate"] + pd.Timedelta(days=60)
        return pa.table({"o_orderpriority": pa.array(
            df.loc[keep, "o_orderpriority"], pa.string())})

    return (joined.map_batches(late, batch_format="pandas")
            .groupby("o_orderpriority")
            .aggregate(Count(alias_name="order_count"))
            .sort("o_orderpriority"))


_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q13_custdist(sf_dir: str):
    """TPC-H Q13 shape (customer order-count distribution, zero bucket
    included): how many customers placed exactly N orders. NO join at
    all — the per-customer counts come from orders alone (one narrow
    groupby), and the 0-orders bucket is |customer| minus the number of
    distinct ordering customers, which the same aggregate already
    yields. Relies on o_custkey ⊆ c_custkey referential integrity (the
    LEFT JOIN oracle would count an orphan custkey differently); the
    generator guarantees it and the oracle run cross-checks it."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    per_cust = (orders.groupby("o_custkey")
                .aggregate(Count(alias_name="c_count")))
    dist = (per_cust.groupby("c_count")
            .aggregate(Count(alias_name="custdist")))

    n_customers = pq.read_metadata(
        f"{sf_dir}/customer.parquet").num_rows
    n_ordering = per_cust.count()
    zero = ray.data.from_arrow(pa.table({
        "c_count": pa.array([0], pa.int64()),
        "custdist": pa.array([n_customers - n_ordering], pa.int64())}))
    return (dist.union(zero)
            .map_batches(lambda t: t.filter(
                pc.greater(t["custdist"], pa.scalar(0, pa.int64()))),
                batch_format="pyarrow")
            .sort(["custdist", "c_count"], descending=[True, True]))


_Q13_SQL = """
WITH pc AS (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM pc GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape (per-group-average correlated subquery): total
    revenue of Brand#11 lineitems whose quantity is below 20% of that
    part's average quantity. The brand's partkey set is tiny (1/25 of
    parts) → broadcast once and lineitem is pre-filtered BEFORE any
    aggregate; the per-part average is carried as the exact integer
    rational (sum_qty, cnt) and compared by cross-multiplication
    (5·qty·cnt < sum_qty ⟺ qty < 0.2·avg — l_quantity is
    integer-valued), so no float boundary can flip a row vs the SQL.
    Both the brand-key filter and the (part → sum,cnt) attach route
    through the auto_semi_join / auto_join threshold choosers (VERDICT
    r3 item #5): broadcast below the key limit, co-partitioned shuffle
    above — the brand key set grows with sf."""
    from .functions.joins import auto_join, auto_semi_join

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])
    brand_keys = part.map_batches(
        lambda t: t.filter(pc.equal(t["p_brand"], pa.scalar("Brand#11")))
        .select(["p_partkey"]), batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "qty": pc.cast(t["l_quantity"], pa.int64()),
            "price_cents": _cents(t["l_extendedprice"]),
        })

    bl = auto_semi_join(
        li.map_batches(shape, batch_format="pyarrow"), brand_keys,
        left_key="l_partkey", right_key="p_partkey").materialize()
    stats = (bl.groupby("l_partkey")
             .aggregate(Sum("qty", alias_name="sum_qty"),
                        Count(alias_name="cnt")))
    stats = stats.map_batches(
        lambda t: pa.table({"st_partkey": t["l_partkey"],
                            "sum_qty": t["sum_qty"], "cnt": t["cnt"]}),
        batch_format="pyarrow")
    attached = auto_join(bl, stats, left_key="l_partkey",
                         right_key="st_partkey",
                         right_cols=["sum_qty", "cnt"])

    def small(t: pa.Table) -> pa.Table:
        qty = t["qty"].to_numpy(zero_copy_only=False)
        sums = t["sum_qty"].to_numpy(zero_copy_only=False)
        cnts = t["cnt"].to_numpy(zero_copy_only=False)
        keep = 5 * qty * cnts < sums
        s = int(t["price_cents"].to_numpy(
            zero_copy_only=False)[keep].sum())
        return pa.table({"rev_cents": pa.array([s], pa.int64())})

    total = attached.map_batches(small, batch_format="pyarrow")
    return ray.data.from_arrow(pa.table({
        "rev_cents": pa.array([int(total.sum("rev_cents") or 0)],
                              pa.int64())}))


_Q17_SQL = """
WITH b AS (SELECT l_partkey,
                  CAST(l_quantity AS BIGINT) AS qty,
                  CAST(round(l_extendedprice * 100) AS BIGINT)
                      AS price_cents
           FROM lineitem JOIN part ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#11'),
st AS (SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
              CAST(COUNT(*) AS BIGINT) AS cnt
       FROM b GROUP BY l_partkey)
SELECT CAST(COALESCE(SUM(price_cents), 0) AS BIGINT) AS rev_cents
FROM b JOIN st USING (l_partkey)
WHERE 5 * qty * cnt < sum_qty
"""


def part_graph_clustering(sf_dir: str):
    """Per-node local clustering coefficient over the part co-occurrence
    graph: cc(v) = closed wedges at v / all wedges at v = 2·T(v) /
    (deg·(deg−1)); top 20 nodes with ≥1 triangle by (cc desc, node).
    Wedges are emitted per center (O(deg²) per hub — the same frontier
    the SQL self-join pays; cap/sample hub adjacency at web scale) and
    closed by a co-partitioned membership pass against the edge set,
    both sides hashed on the (a, b) PAIR — no broadcast, no driver
    collection. The exact int pair (tri, deg) rides beside the double,
    so both engines divide identical int64s and the doubles are
    bit-equal."""
    edges = _part_strong_edges(sf_dir).materialize()
    nparts = _join_parts(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "mid": pa.concat_arrays([t["u"].combine_chunks(),
                                     t["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["v"].combine_chunks(),
                                     t["u"].combine_chunks()])})

    adj = edges.map_batches(sym, batch_format="pyarrow")
    deg = (adj.groupby("mid").aggregate(Count(alias_name="deg")))

    def _pair_part(df: pd.DataFrame) -> np.ndarray:
        h = pd.util.hash_pandas_object(
            df[["a", "b"]], index=False) % nparts
        return h.to_numpy()

    wedge_schema = pa.schema([("center", pa.int64()), ("a", pa.int64()),
                              ("b", pa.int64()), ("side", pa.int8()),
                              ("part", pa.int64())])

    def wedges(g: pd.DataFrame) -> pa.Table:
        cs, as_, bs = _pairs_within_groups(
            g["mid"].to_numpy(np.int64), g["nbr"].to_numpy(np.int64))
        df = pd.DataFrame({"center": cs, "a": as_, "b": bs})
        df["side"] = np.int8(0)
        df["part"] = _pair_part(df)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .cast(wedge_schema)

    def edge_rows(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"center": np.int64(0),
                           "a": t["u"].to_numpy(zero_copy_only=False),
                           "b": t["v"].to_numpy(zero_copy_only=False)})
        df["side"] = np.int8(1)
        df["part"] = _pair_part(df)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .cast(wedge_schema)

    closed_schema = pa.schema([("center", pa.int64())])

    def close(g: pd.DataFrame) -> pa.Table:
        w = g[g["side"] == 0]
        e = g[g["side"] == 1]
        if not len(w) or not len(e):
            return closed_schema.empty_table()
        hit = w.merge(e[["a", "b"]], on=["a", "b"], how="inner")
        return pa.table({"center": pa.array(hit["center"].to_numpy(),
                                            pa.int64())})

    tri = (adj.groupby("mid").map_groups(wedges, batch_format="pandas")
           .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
           .groupby("part").map_groups(close, batch_format="pandas")
           .groupby("center").aggregate(Count(alias_name="tri")))

    from .functions.joins import auto_join
    j = auto_join(tri, deg, left_key="center", right_key="mid",
                  right_cols=["deg"], num_partitions=nparts)

    def finish(t: pa.Table) -> pa.Table:
        cc = pc.divide(
            pc.cast(pc.multiply(t["tri"], pa.scalar(2, pa.int64())),
                    pa.float64()),
            pc.cast(pc.multiply(t["deg"],
                                pc.subtract(t["deg"],
                                            pa.scalar(1, pa.int64()))),
                    pa.float64()))
        return pa.table({"node": t["center"], "tri": t["tri"],
                         "deg": t["deg"], "cc": cc})

    return (j.map_batches(finish, batch_format="pyarrow")
            .sort(["cc", "node"], descending=[True, False]).limit(20))


_PART_CLUSTERING_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT u AS mid, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT mid AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1),
tri AS (SELECT x.mid AS node, CAST(COUNT(*) AS BIGINT) AS tri
        FROM sym x JOIN sym y ON x.mid = y.mid AND x.nbr < y.nbr
                   JOIN e ON e.u = x.nbr AND e.v = y.nbr
        GROUP BY 1)
SELECT t.node, t.tri, dg.deg,
       CAST(2 * t.tri AS DOUBLE) / (dg.deg * (dg.deg - 1)) AS cc
FROM tri t JOIN deg dg ON dg.node = t.node
ORDER BY cc DESC, t.node LIMIT 20
"""


def docs_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval (k1=1.2, b=0.75) for the fixed query
    {window, merge, scan}: top 10 docs by score. One streaming pass
    builds the compact per-doc feature row (len, tf per term — integers);
    the collection stats it needs (N, total length, per-term df) are
    three scalar aggregates over that same materialized table, broadcast
    back into a vectorized scoring pass. Scores are emitted as integer
    micro-units (round(score·1e4)) so the driver hash compares ints; the
    raw (len, tf) ints ride along as the exact anchor. idf =
    ln(1 + (N − df + .5)/(df + .5)) — Robertson/Sparck-Jones with the
    +1 floor, the Lucene form."""
    from .functions.terms import _TERM_RE

    TERMS = ["window", "merge", "scan"]
    K1, B = 1.2, 0.75

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)

    feat_schema = pa.schema([("doc_id", pa.int64()), ("dl", pa.int64())]
                            + [(f"tf_{t}", pa.int64()) for t in TERMS])

    def features(t: pa.Table) -> pa.Table:
        ids, dls = [], []
        tfs = {q: [] for q in TERMS}
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            toks = _TERM_RE.findall((txt or "").lower())
            ids.append(did)
            dls.append(len(toks))
            for q in TERMS:
                tfs[q].append(toks.count(q))
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dls, pa.int64())}
        for q in TERMS:
            cols[f"tf_{q}"] = pa.array(tfs[q], pa.int64())
        return pa.table(cols).cast(feat_schema)

    feats = docs.map_batches(features, batch_format="pyarrow") \
        .materialize()
    n_docs = feats.count()
    sums = feats.sum(["dl"] + [f"tf_{q}" for q in TERMS])
    avgdl = float(sums["sum(dl)"]) / n_docs
    # df per term: docs with tf > 0 (narrow per-batch partial sums)
    dfs = {}
    for q in TERMS:
        dfs[q] = int(feats.map_batches(
            lambda t, _q=q: pa.table({"n": pa.array(
                [int(pc.sum(pc.cast(pc.greater(
                    t[f"tf_{_q}"], pa.scalar(0, pa.int64())),
                    pa.int64())).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow").sum("n") or 0)
    idf = {q: float(np.log(1.0 + (n_docs - dfs[q] + 0.5)
                           / (dfs[q] + 0.5))) for q in TERMS}

    out_schema = pa.schema([("doc_id", pa.int64()), ("dl", pa.int64())]
                           + [(f"tf_{t}", pa.int64()) for t in TERMS]
                           + [("score_u", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = K1 * (1.0 - B + B * dl / avgdl)
        s = np.zeros(len(t), np.float64)
        for q in TERMS:
            tf = t[f"tf_{q}"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            s += idf[q] * (tf * (K1 + 1.0)) / (tf + norm)
        cols = {c: t[c] for c in t.column_names}
        cols["score_u"] = pa.array(
            np.round(s * 10_000.0).astype(np.int64), pa.int64())
        return pa.table(cols).cast(out_schema)

    return (feats.map_batches(score, batch_format="pyarrow")
            .sort(["score_u", "doc_id"], descending=[True, False])
            .limit(10))


_DOCS_BM25_SQL = """
WITH f AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS BIGINT) AS dl,
         CAST(len(list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> x = 'window')) AS BIGINT) AS tf_window,
         CAST(len(list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> x = 'merge')) AS BIGINT) AS tf_merge,
         CAST(len(list_filter(regexp_extract_all(lower(text),
              '[a-z0-9]+'), x -> x = 'scan')) AS BIGINT) AS tf_scan
  FROM documents),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             AVG(CAST(dl AS DOUBLE)) AS avgdl,
             CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS df_window,
             CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS df_merge,
             CAST(SUM(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS df_scan
      FROM f)
SELECT doc_id, dl, tf_window, tf_merge, tf_scan,
       CAST(round((
         ln(1 + (n - df_window + 0.5) / (df_window + 0.5))
           * (tf_window * 2.2)
           / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl))
       + ln(1 + (n - df_merge + 0.5) / (df_merge + 0.5))
           * (tf_merge * 2.2)
           / (tf_merge + 1.2 * (0.25 + 0.75 * dl / avgdl))
       + ln(1 + (n - df_scan + 0.5) / (df_scan + 0.5))
           * (tf_scan * 2.2)
           / (tf_scan + 1.2 * (0.25 + 0.75 * dl / avgdl))
       ) * 10000) AS BIGINT) AS score_u
FROM f, g
ORDER BY score_u DESC, doc_id LIMIT 10
"""


def docs_repetition(sf_dir: str):
    """Gopher-style repetition quality signal: per document, the number
    of word 3-grams and how many of them are duplicates (n3 − distinct);
    top 20 most repetitive docs by (dup ratio desc, doc_id). Pure
    per-batch map — each doc's trigram multiset is built and collapsed
    inside its own row, nothing but the 20 survivors leaves a worker
    after the sort. The exact int pair (n3, dup3) rides beside the
    double ratio so both engines divide identical int64s."""
    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)
    out_schema = pa.schema([("doc_id", pa.int64()), ("n3", pa.int64()),
                            ("dup3", pa.int64()), ("rep", pa.float64())])

    def rep(t: pa.Table) -> pa.Table:
        ids, n3s, d3s = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            toks = _TERM_RE.findall((txt or "").lower())
            tris = list(zip(toks, toks[1:], toks[2:]))
            if not tris:
                continue
            ids.append(did)
            n3s.append(len(tris))
            d3s.append(len(tris) - len(set(tris)))
        n3 = np.asarray(n3s, np.int64)
        d3 = np.asarray(d3s, np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n3": pa.array(n3, pa.int64()),
            "dup3": pa.array(d3, pa.int64()),
            "rep": pa.array(d3 / n3, pa.float64())}).cast(out_schema)

    return (docs.map_batches(rep, batch_format="pyarrow")
            .sort(["rep", "doc_id"], descending=[True, False]).limit(20))


_DOCS_REPETITION_SQL = """
WITH t AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
tri AS (SELECT doc_id,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
        FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0)))
                AS u(i)),
st AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n3,
              CAST(COUNT(*) - COUNT(DISTINCT g) AS BIGINT) AS dup3
       FROM tri GROUP BY doc_id)
SELECT doc_id, n3, dup3, CAST(dup3 AS DOUBLE) / n3 AS rep
FROM st ORDER BY rep DESC, doc_id LIMIT 20
"""


def docs_pack_blocks(sf_dir: str):
    """Sequential sequence packing (GPT-style training-batch prep):
    documents concatenated in doc_id order and cut into 2048-token
    blocks; a doc's pack is the block its FIRST token lands in
    (pack_id = exclusive-prefix-sum ÷ 2048). The global ordered prefix
    sum is functions/rank.py ``global_running_sum`` — range-sample
    splits, per-partition token SUMS → driver offsets, local sort +
    cumsum; two streaming passes, the driver holds only samples and the
    per-partition sum table. Output: per pack, doc count and token
    total."""
    from .functions.rank import global_running_sum
    from .functions.terms import _TERM_RE

    BLOCK = 2048
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)

    def toklen(t: pa.Table) -> pa.Table:
        ids, ns = [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            ids.append(did)
            ns.append(len(_TERM_RE.findall((txt or "").lower())))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "tokens": pa.array(ns, pa.int64())})

    lens = docs.map_batches(toklen, batch_format="pyarrow")
    cum = global_running_sum(lens, "tokens", order_by=["doc_id"],
                             out_col="cum")

    def pack(t: pa.Table) -> pa.Table:
        excl = (t["cum"].to_numpy(zero_copy_only=False)
                - t["tokens"].to_numpy(zero_copy_only=False))
        return pa.table({
            "pack_id": pa.array(excl // BLOCK, pa.int64()),
            "tokens": t["tokens"]})

    return (cum.map_batches(pack, batch_format="pyarrow")
            .groupby("pack_id")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("tokens", alias_name="tok_total"))
            .sort("pack_id"))


_DOCS_PACK_SQL = """
WITH lens AS (SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text),
                          '[a-z0-9]+')) AS BIGINT) AS tokens
              FROM documents),
c AS (SELECT doc_id, tokens,
             SUM(tokens) OVER (ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - tokens AS excl
      FROM lens)
SELECT CAST(excl // 2048 AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS tok_total
FROM c GROUP BY 1 ORDER BY pack_id
"""


def docs_neardup_survivors(sf_dir: str):
    """Composed near-dup canonicalization — the full training-corpus
    dedup flow: MinHash+LSH pairs (functions/dedup.py, fully streaming)
    → connected components over the pair graph (the flagship's join-free
    min-label propagation) → lowest-doc_id survivor per duplicate
    cluster. Output: one row per multi-doc cluster (survivor_id,
    cluster_size), sorted. Transitive closure is the point — A~B, B~C
    dedups {A,B,C} to A even when A,C never paired. Rows-only (hash
    family not SQL); the exact oracle is the planted-group golden in
    tests/test_dedup.py (driver union-find over the same pairs)."""
    from .functions.dedup import minhash_lsh_duplicates
    from .stages.canonicalize import connected_components_distributed

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=100)
    pairs = minhash_lsh_duplicates(ds, num_perm=64, bands=32,
                                   jaccard_threshold=0.5)

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": pc.cast(t["id_a"], pa.string()),
                         "dst": pc.cast(t["id_b"], pa.string())})

    labels = connected_components_distributed(
        pairs.map_batches(to_edges, batch_format="pyarrow"))

    out_schema = pa.schema([("survivor_id", pa.int64()),
                            ("cluster_size", pa.int64())])

    def survivor(g: pd.DataFrame) -> pa.Table:
        ids = g["node"].astype("int64")
        return pa.table({
            "survivor_id": pa.array([int(ids.min())], pa.int64()),
            "cluster_size": pa.array([len(ids)], pa.int64()),
        }).cast(out_schema)

    return (labels.groupby("label")
            .map_groups(survivor, batch_format="pandas")
            .sort("survivor_id"))


def q7_nation_trade(sf_dir: str):
    """TPC-H Q7 shape (cross-nation trade volume): revenue between
    customer-nation and supplier-nation pairs per order year, for two
    named nations in either direction (NATION_3 ↔ NATION_7). Five-table join where ONLY the
    big⋈big (lineitem ⋈ orders) pays a shuffle — nation, customer and
    supplier collapse to broadcast key→nation maps (ray.put once, read
    per batch), each side's nation is attached map-side, and revenue is
    pre-aggregated per (supp_nat, cust_nat, year) inside every batch
    before the final tiny groupby. Cents-exact."""
    from .functions.joins import auto_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    picks = nation[nation["n_name"].isin(["NATION_3", "NATION_7"])]
    nat_name = dict(zip(picks["n_nationkey"], picks["n_name"]))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nat_name)]
    c_nat = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nat_name)]
    s_nat = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))
    nn_ref = ray.put(nat_name)

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_orders(t: pa.Table) -> pa.Table:
        m = ray.get(c_nat)
        cn = pd.Series(t["o_custkey"].to_pandas()).map(m)
        keep = cn.notna().to_numpy()
        yr = pd.Series(t["o_orderdate"].to_pandas()).dt.year
        return pa.table({
            "o_orderkey": t["o_orderkey"].filter(pa.array(keep)),
            "c_nk": pa.array(cn[keep].astype("int64"), pa.int64()),
            "o_year": pa.array(yr[keep].astype("int64"), pa.int64())})

    orders_f = orders.map_batches(prep_orders, batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                             "l_discount"])

    def prep_li(t: pa.Table) -> pa.Table:
        m = ray.get(s_nat)
        sn = pd.Series(t["l_suppkey"].to_pandas()).map(m)
        keep = sn.notna().to_numpy()
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0),
                                             t["l_discount"])))
        return pa.table({
            "l_orderkey": t["l_orderkey"].filter(pa.array(keep)),
            "s_nk": pa.array(sn[keep].astype("int64"), pa.int64()),
            "rev_cents": rev.filter(pa.array(keep))})

    li_f = li.map_batches(prep_li, batch_format="pyarrow")

    joined = auto_join(li_f, orders_f, left_key="l_orderkey",
                       right_key="o_orderkey",
                       right_cols=["c_nk", "o_year"],
                       num_partitions=_join_parts(sf_dir))

    def name_pair(df: pd.DataFrame) -> pa.Table:
        names = ray.get(nn_ref)
        df = df[df["s_nk"] != df["c_nk"]]
        out = pd.DataFrame({
            "supp_nation": df["s_nk"].map(names),
            "cust_nation": df["c_nk"].map(names),
            "o_year": df["o_year"],
            "rev_cents": df["rev_cents"]})
        vc = (out.groupby(["supp_nation", "cust_nation", "o_year"],
                          as_index=False)["rev_cents"].sum())
        return pa.table({
            "supp_nation": pa.array(vc["supp_nation"], pa.string()),
            "cust_nation": pa.array(vc["cust_nation"], pa.string()),
            "o_year": pa.array(vc["o_year"].to_numpy(np.int64)),
            "rev_cents": pa.array(vc["rev_cents"].to_numpy(np.int64))})

    return (joined.map_batches(name_pair, batch_format="pandas")
            .groupby(["supp_nation", "cust_nation", "o_year"])
            .aggregate(Sum("rev_cents", alias_name="rev_cents"))
            .sort(["supp_nation", "cust_nation", "o_year"]))


_Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE sn.n_name IN ('NATION_3', 'NATION_7')
  AND cn.n_name IN ('NATION_3', 'NATION_7')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape (OR-of-ANDs predicate join): revenue of lineitems
    matching any of three brand×size×quantity clauses. The part
    attributes needed by the predicate collapse to one broadcast
    (partkey → brand, size) map over the pre-filtered part rows; the
    disjunction evaluates vectorized per batch and only a per-batch
    scalar leaves each worker. Cents-exact."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand",
                                  "p_size"]).to_pandas()
    part = part[part["p_brand"].isin(["Brand#12", "Brand#23", "Brand#34"])]
    pmap = ray.put({int(r.p_partkey): (r.p_brand, int(r.p_size))
                    for r in part.itertuples()})

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice",
                             "l_discount"])

    def clause_rev(t: pa.Table) -> pa.Table:
        m = ray.get(pmap)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        info = [m.get(int(k)) for k in pk]
        brand = np.array([i[0] if i else "" for i in info])
        size = np.array([i[1] if i else -1 for i in info], np.int64)
        keep = (((brand == "Brand#12") & (size <= 5)
                 & (qty >= 1) & (qty <= 11))
                | ((brand == "Brand#23") & (size <= 10)
                   & (qty >= 10) & (qty <= 20))
                | ((brand == "Brand#34") & (size <= 15)
                   & (qty >= 20) & (qty <= 30)))
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0),
                                             t["l_discount"])))
        s = int(rev.to_numpy(zero_copy_only=False)[keep].sum())
        return pa.table({"rev_cents": pa.array([s], pa.int64())})

    total = li.map_batches(clause_rev, batch_format="pyarrow")
    return ray.data.from_arrow(pa.table({
        "rev_cents": pa.array([int(total.sum("rev_cents") or 0)],
                              pa.int64())}))


_Q19_SQL = """
SELECT CAST(COALESCE(SUM(CAST(round(l_extendedprice * (1 - l_discount)
            * 100) AS BIGINT)), 0) AS BIGINT) AS rev_cents
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size <= 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size <= 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size <= 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def events_salted_type_join(sf_dir: str):
    """Salted hash join on a pathologically hot key
    (functions/salted.py ``salted_join``): event_type has only a handful
    of distinct values, so a plain hash join would send each type's
    entire event stream to ONE reducer — the 100-TB killer. Each probe
    row gets a deterministic positional salt and the (tiny) per-type dim
    is replicated across all salts, spreading every hot key over
    ``num_salts`` reducers; matching is on (key, salt) so the result is
    exactly the plain join. Dim = per-type global count, built from the
    same table; output re-aggregates per user so the attached dim value
    is actually exercised."""
    from .functions.salted import salted_join

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    dim = (ev.groupby("event_type").aggregate(Count(alias_name="type_n")))
    joined = salted_join(ev, dim, probe_key="event_type",
                         build_key="event_type", build_cols=["type_n"],
                         num_salts=8,
                         num_partitions=_join_parts(sf_dir, "events"))
    return (joined.groupby("user_id")
            .aggregate(Count(alias_name="n_events"),
                       Sum("type_n", alias_name="sum_type_n"))
            .sort("user_id"))


_EVENTS_SALTED_JOIN_SQL = """
WITH dim AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_n
             FROM events GROUP BY 1)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(type_n) AS BIGINT) AS sum_type_n
FROM events JOIN dim USING (event_type)
GROUP BY user_id ORDER BY user_id
"""


def events_merged_windows(sf_dir: str):
    """Overlapping-interval merge (the coverage/union-of-windows
    primitive): each event opens a 5-minute activity window; per user,
    merge overlapping windows and report how many merged windows remain
    and the total covered seconds. One co-partitioned pass — windows
    group by user, each group sorts locally and sweeps with a running
    max-end (vectorized cummax, no Python loop); exact epoch-second
    ints end to end. A hot user's windows all land on one reducer —
    same caveat/salting remedy as every per-key window operator here."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    WIN = 300

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_windows", pa.int64()),
                            ("covered_s", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.divide(pc.cast(t["ts"], pa.int64()),
                              pa.scalar(1_000_000, pa.int64())), pa.int64())
        return pa.table({"user_id": t["user_id"], "st": s,
                         "en": pc.add(s, pa.scalar(WIN, pa.int64()))})

    def merge_windows(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["st", "en"])
        st = g["st"].to_numpy(np.int64)
        en = g["en"].to_numpy(np.int64)
        run_max = np.maximum.accumulate(en)
        # a window starts a new island when it begins after every prior end
        brk = np.empty(len(st), np.bool_)
        brk[0] = True
        brk[1:] = st[1:] > run_max[:-1]
        grp = np.cumsum(brk)
        df = pd.DataFrame({"grp": grp, "st": st, "en": en})
        m = df.groupby("grp").agg(st=("st", "min"), en=("en", "max"))
        return pa.table({
            "user_id": pa.array([int(g["user_id"].iloc[0])], pa.int64()),
            "n_windows": pa.array([len(m)], pa.int64()),
            "covered_s": pa.array([int((m["en"] - m["st"]).sum())],
                                  pa.int64())}).cast(out_schema)

    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(merge_windows, batch_format="pandas")
            .sort("user_id"))


_EVENTS_MERGED_WINDOWS_SQL = """
WITH w AS (SELECT user_id,
                  CAST(epoch_us(ts) // 1000000 AS BIGINT) AS st,
                  CAST(epoch_us(ts) // 1000000 AS BIGINT) + 300 AS en
           FROM events),
o AS (SELECT user_id, st, en,
             CASE WHEN st > MAX(en) OVER (PARTITION BY user_id
                       ORDER BY st, en
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS brk
      FROM w),
g AS (SELECT user_id, st, en,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY st, en
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM o),
m AS (SELECT user_id, grp, MIN(st) AS st, MAX(en) AS en
      FROM g GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(en - st) AS BIGINT) AS covered_s
FROM m GROUP BY user_id ORDER BY user_id
"""


def docs_kwic(sf_dir: str):
    """KWIC concordance (keyword-in-context, the corpus-linguistics /
    gazetteer-mining primitive): for every doc containing the keyword
    'merge', the ±2-token window around its FIRST occurrence plus the
    1-based token position; first 50 hits by doc_id. Pure per-batch map
    — only (doc_id, pos, kwic) leaves a worker."""
    from .functions.terms import _TERM_RE

    KW = "merge"
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)
    out_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()),
                            ("kwic", pa.string())])

    def kwic(t: pa.Table) -> pa.Table:
        ids, poss, wins = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            toks = _TERM_RE.findall((txt or "").lower())
            try:
                i = toks.index(KW)
            except ValueError:
                continue
            ids.append(did)
            poss.append(i + 1)
            wins.append(" ".join(toks[max(i - 2, 0):i + 3]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "pos": pa.array(poss, pa.int64()),
                         "kwic": pa.array(wins, pa.string())}
                        ).cast(out_schema)

    return (docs.map_batches(kwic, batch_format="pyarrow")
            .sort("doc_id").limit(50))


_DOCS_KWIC_SQL = """
WITH t AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
h AS (SELECT doc_id, toks,
             CAST(list_position(toks, 'merge') AS BIGINT) AS pos
      FROM t WHERE list_position(toks, 'merge') > 0)
SELECT doc_id, pos,
       array_to_string(toks[greatest(pos - 2, 1):pos + 2], ' ') AS kwic
FROM h ORDER BY doc_id LIMIT 50
"""


def events_asof_nearest(sf_dir: str):
    """Nearest as-of join (functions/asof.py, direction='nearest'): each
    click event matched to the same user's CLOSEST purchase event within
    ±24 h — either direction, ties to the earlier purchase (pandas
    merge_asof nearest semantics, mirrored exactly in the oracle's
    tie-break). Output per user: matched-click count and total
    |click − purchase| seconds, exact ints. Same key-partitioned
    single-shuffle plan as the backward as-of."""
    from .functions.asof import asof_join_backward

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("click")))
        .select(["event_id", "user_id", "ts"]), batch_format="pyarrow")
    buys = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"],
                                    pa.scalar("purchase")))
        .select(["user_id", "ts"]), batch_format="pyarrow")
    m = asof_join_backward(clicks, buys,
                           left_by="user_id", right_by="user_id",
                           left_ts="ts", right_ts="ts",
                           out_col="near_buy",
                           direction="nearest",
                           tolerance=pd.Timedelta(hours=24))

    def prep(t: pa.Table) -> pa.Table:
        diff = pc.subtract(pc.cast(t["ts"], pa.int64()),
                           pc.cast(t["near_buy"], pa.int64()))
        adiff = pc.if_else(pc.less(diff, pa.scalar(0, pa.int64())),
                           pc.negate_checked(diff), diff)
        return pa.table({
            "user_id": t["user_id"],
            "absdiff_s": pc.divide(adiff, pa.scalar(1_000_000, pa.int64()))})

    return (m.map_batches(prep, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Count(alias_name="n_matched"),
                       Sum("absdiff_s", alias_name="sum_absdiff_s"))
            .sort("user_id"))


_EVENTS_ASOF_NEAREST_SQL = """
WITH cand AS (
  SELECT c.event_id, c.user_id,
         abs(epoch_us(c.ts) - epoch_us(b.ts)) AS ad,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY abs(epoch_us(c.ts) - epoch_us(b.ts)), b.ts) AS rn
  FROM events c JOIN events b ON b.user_id = c.user_id
  WHERE c.event_type = 'click' AND b.event_type = 'purchase'
    AND abs(epoch_us(c.ts) - epoch_us(b.ts))
        <= 24 * 3600 * 1000000::BIGINT)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST(SUM(ad // 1000000) AS BIGINT) AS sum_absdiff_s
FROM cand WHERE rn = 1
GROUP BY user_id ORDER BY user_id
"""


def emb_mmr_topk(sf_dir: str):
    """Maximal Marginal Relevance diversified selection (Carbonell &
    Goldstein 1998) — the data-curation pick: greedily select 10 vectors
    maximizing λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s), λ=0.7, query =
    the corpus' first vector. Each of the k rounds is one distributed
    scan: the ≤k selected vectors broadcast via ray.put, every batch
    emits only its local best (id, score), the driver reduces k
    candidates. Ties → lowest id. Rows-only (iterative, non-SQL); exact
    oracle is the driver-reference greedy loop in
    tests/test_similarity.py."""
    from .functions.similarity import mmr_select
    from .sources.tables import fetch_value

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = fetch_value(sf_dir, "embeddings", key_col="vec_id", key=0,
                    value_col="embedding")
    picked = mmr_select(ds, query=np.asarray(q, np.float64), k=10,
                        lam=0.7)
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(range(1, len(picked) + 1), pa.int64()),
        "vec_id": pa.array(picked, pa.int64())}))


def docs_rag_retrieve(sf_dir: str):
    """RAG retrieval composition: embed-side exact cosine top-10 for one
    query vector (vec_id 0), joined back to the document table for the
    text snippet — the retrieve step of every retrieval-augmented
    pipeline. The scan is one distributed pass (float64 cosine per
    batch, per-batch partial top-k, tiny driver merge); the 10 winning
    ids broadcast to a pruned documents pass for snippets, so no doc
    text ever shuffles. Scores emitted as integer micro-units
    (round(cos·1e6)) for hash-stable comparison; order is (cos desc,
    id) in both engines."""
    from .functions.similarity import _as_matrix, _ids_np
    from .sources.tables import fetch_value

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = np.asarray(fetch_value(sf_dir, "embeddings", key_col="vec_id",
                               key=0, value_col="embedding"), np.float64)
    q_ref = ray.put(q)
    K = 10

    def partial(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = _ids_np(t["vec_id"])
        v = _as_matrix(t["embedding"], np.float64)
        # dot/sqrt(na*nq) in float64 — mirrors the oracle's explicit
        # formula (DuckDB's list_cosine_similarity kernel is float32)
        na = (v * v).sum(axis=1)
        cos = (v @ qv) / np.sqrt(na * (qv @ qv))
        order = np.lexsort((ids, -cos))[:K]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "cos": pa.array(cos[order], pa.float64())})

    top = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    top = top.sort_values(["cos", "vec_id"],
                          ascending=[False, True]).head(K)
    top = top.reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["cos_u"] = np.round(top["cos"].to_numpy() * 1e6).astype(np.int64)
    ids_ref = ray.put(dict(zip(top["vec_id"].astype(int),
                               zip(top["rank"], top["cos_u"]))))

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out_schema = pa.schema([("rank", pa.int64()), ("doc_id", pa.int64()),
                            ("cos_u", pa.int64()),
                            ("snippet", pa.string())])

    def snip(t: pa.Table) -> pa.Table:
        m = ray.get(ids_ref)
        ids = t["doc_id"].to_pylist()
        keep = [i for i, d in enumerate(ids) if d in m]
        if not keep:
            return out_schema.empty_table()
        rows = t.take(keep)
        rk = [m[d][0] for d in rows["doc_id"].to_pylist()]
        cu = [m[d][1] for d in rows["doc_id"].to_pylist()]
        return pa.table({
            "rank": pa.array(rk, pa.int64()),
            "doc_id": rows["doc_id"],
            "cos_u": pa.array(cu, pa.int64()),
            "snippet": pc.utf8_slice_codeunits(rows["text"], 0, 40),
        }).cast(out_schema)

    return docs.map_batches(snip, batch_format="pyarrow").sort("rank")


_DOCS_RAG_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
d AS (SELECT e.vec_id,
             SUM(e.embedding[i] * q.qv[i]) AS dot,
             SUM(e.embedding[i] * e.embedding[i]) AS na,
             SUM(q.qv[i] * q.qv[i]) AS nq
      FROM embeddings e, q,
           UNNEST(generate_series(1, len(e.embedding))) AS u(i)
      GROUP BY e.vec_id),
s AS (SELECT vec_id, dot / sqrt(na * nq) AS cos FROM d),
t AS (SELECT vec_id, cos,
             ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rank
      FROM s QUALIFY rank <= 10)
SELECT t.rank, d.doc_id, CAST(round(t.cos * 1000000) AS BIGINT) AS cos_u,
       substr(d.text, 1, 40) AS snippet
FROM t JOIN documents d ON d.doc_id = t.vec_id
ORDER BY t.rank
"""


def docs_unigram_nll(sf_dir: str, vocab_limit: int = 500_000):
    """Perplexity-proxy quality score (KenLM-style filtering, unigram
    form): train a unigram LM on the corpus itself (term → count /
    total), then score every doc by its average negative log-likelihood;
    top 20 most surprising docs.

    Pass 1: per-batch Counter partials (combiner — one row per DISTINCT
    term per batch enters the shuffle, not one per token) → (term, n)
    groupby. Pass 2: broadcast model, vectorized per-batch scorer.

    Scale contract (VERDICT r3 item #2): the broadcast model is capped
    at ``vocab_limit`` entries. If the corpus vocabulary fits, the LM is
    exact (the DuckDB oracle regime — sf testdata vocab is ~10³). If it
    does not, only the top-``vocab_limit`` terms by count are kept (ties
    broken by term, deterministic) and ALL remaining mass becomes one
    OOV bucket scored at log(oov_mass/total) — so the driver dict is
    bounded by construction at any corpus size. The capped path is
    golden-tested with a planted OOV corpus in tests/test_new_ops.py."""
    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)

    def pairs(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: "Counter[str]" = Counter()
        for txt in t["text"].to_pylist():
            c.update(_TERM_RE.findall((txt or "").lower()))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    freq_ds = (docs.map_batches(pairs, batch_format="pyarrow")
               .groupby("term").aggregate(Sum("n", alias_name="n"))
               .materialize())
    vocab_size = freq_ds.count()
    total = int(freq_ds.sum("n"))
    if vocab_size <= vocab_limit:
        freqs = freq_ds.to_pandas()          # bounded by vocab_limit
        oov_lp = None                        # exact: every term in-vocab
    else:
        freqs = (freq_ds.sort(["n", "term"], descending=[True, False])
                 .limit(vocab_limit).to_pandas())
        oov_mass = total - int(freqs["n"].sum())
        oov_lp = float(np.log(oov_mass) - np.log(total))
    lp = {t: float(np.log(n) - np.log(total))
          for t, n in zip(freqs["term"], freqs["n"])}
    lp_ref = ray.put(lp)

    out_schema = pa.schema([("doc_id", pa.int64()), ("dl", pa.int64()),
                            ("nll_u", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(lp_ref)
        ids, dls, nlls = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            toks = _TERM_RE.findall((txt or "").lower())
            if not toks:
                continue
            if oov_lp is None:
                s = -sum(m[tok] for tok in toks) / len(toks)
            else:
                s = -sum(m.get(tok, oov_lp) for tok in toks) / len(toks)
            ids.append(did)
            dls.append(len(toks))
            nlls.append(round(s * 1e6))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dl": pa.array(dls, pa.int64()),
                         "nll_u": pa.array(nlls, pa.int64())}
                        ).cast(out_schema)

    return (docs.map_batches(score, batch_format="pyarrow")
            .sort(["nll_u", "doc_id"], descending=[True, False])
            .limit(20))


_DOCS_UNIGRAM_NLL_SQL = """
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                        AS term
             FROM documents),
f AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM f),
sc AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS dl,
              AVG(-(ln(f.n) - ln(tot.total))) AS nll
       FROM tok t JOIN f USING (term), tot
       GROUP BY t.doc_id)
SELECT doc_id, dl, CAST(round(nll * 1000000) AS BIGINT) AS nll_u
FROM sc ORDER BY nll_u DESC, doc_id LIMIT 20
"""


def docs_leakfree_folds(sf_dir: str):
    """Leakage-free evaluation split: assign every document to one of 5
    folds such that near-duplicate documents NEVER straddle a fold
    boundary (the train/test contamination that near-dup leakage causes
    is the whole reason dedup pipelines exist). Near-dup clusters come
    from the MinHash→connected-components flow; each cluster folds as a
    unit by md5(min-member id), singletons by their own id — both pure
    hashes, so the split is deterministic on any layout and new data
    folds consistently. Output: per fold, document count and multi-doc
    cluster count. Rows-only (hash family not SQL); the no-straddle
    invariant is golden-tested in tests/test_dedup.py.

    Scale invariant (round-3 fix of the r2 VERDICT weak item): NOTHING
    corpus-sized touches the driver. Singletons come from a distributed
    anti_join (functions/joins.py) instead of a broadcast matched-id
    set; per-fold cluster counts come from a distributed
    distinct-rep → groupby(fold) aggregate instead of a driver loop over
    one row per cluster. Only the two ≤K-row fold tables are collected."""
    import hashlib

    from .functions.dedup import minhash_lsh_duplicates
    from .functions.joins import anti_join, auto_join
    from .stages.canonicalize import connected_components_distributed

    K = 5
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=100)
    pairs = minhash_lsh_duplicates(ds, num_perm=64, bands=32,
                                   jaccard_threshold=0.5)
    labels = connected_components_distributed(pairs.map_batches(
        lambda t: pa.table({"src": pc.cast(t["id_a"], pa.string()),
                            "dst": pc.cast(t["id_b"], pa.string())}),
        batch_format="pyarrow"))

    rep_schema = pa.schema([("doc_id", pa.int64()), ("rep", pa.int64())])

    def reps(g: pd.DataFrame) -> pa.Table:
        ids = g["node"].astype("int64")
        return pa.table({"doc_id": pa.array(ids.to_numpy(), pa.int64()),
                         "rep": pa.array(np.full(len(ids), ids.min()),
                                         pa.int64())}).cast(rep_schema)

    rep = labels.groupby("label").map_groups(reps, batch_format="pandas")

    # attach cluster representative; docs with no near-dup keep doc_id.
    # Singletons = anti_join(all ids, clustered ids) — co-partitioned
    # membership shuffle, no driver set, no broadcast.
    j = auto_join(ds.select_columns(["doc_id"]), rep,
                  left_key="doc_id", right_key="doc_id",
                  right_cols=["rep"])
    singles = anti_join(ds.select_columns(["doc_id"]), rep,
                        left_key="doc_id", right_key="doc_id")

    allr = j.map_batches(
        lambda t: t.select(["doc_id", "rep"]).cast(rep_schema),
        batch_format="pyarrow").union(
        singles.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "rep": t["doc_id"]}).cast(rep_schema),
            batch_format="pyarrow"))

    def fold_of(t: pa.Table) -> pa.Table:
        f = [int(hashlib.md5(str(r).encode()).hexdigest(), 16) % K
             for r in t["rep"].to_pylist()]
        return pa.table({"fold": pa.array(f, pa.int64()),
                         "rep": t["rep"], "doc_id": t["doc_id"]})

    folded = allr.map_batches(fold_of, batch_format="pyarrow")

    def cl_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"fold": t["fold"].to_pylist(),
                           "rep": t["rep"].to_pylist(),
                           "doc_id": t["doc_id"].to_pylist()})
        g = df.groupby("fold").agg(
            n_docs=("doc_id", "size")).reset_index()
        return pa.table({"fold": pa.array(g["fold"], pa.int64()),
                         "n_docs": pa.array(g["n_docs"], pa.int64())})

    counts = (folded.map_batches(cl_partial, batch_format="pyarrow")
              .groupby("fold").aggregate(Sum("n_docs",
                                             alias_name="n_docs")))
    # multi-doc cluster count per fold: distinct rep (one row per
    # cluster, distributed) → fold_of(rep) → per-batch partial counts →
    # groupby(fold). Result is ≤ K rows; only THAT is collected.
    def rep_fold_partial(t: pa.Table) -> pa.Table:
        f = [int(hashlib.md5(str(r).encode()).hexdigest(), 16) % K
             for r in t["rep"].to_pylist()]
        df = pd.DataFrame({"fold": f})
        g = df.groupby("fold").size().reset_index(name="n")
        return pa.table({"fold": pa.array(g["fold"], pa.int64()),
                         "n_clusters": pa.array(g["n"], pa.int64())})

    cl_counts = (rep.map_batches(
        lambda t: pa.table({"rep": t["rep"]}), batch_format="pyarrow")
        .groupby("rep").map_groups(lambda t: t.slice(0, 1),
                                   batch_format="pyarrow")
        .map_batches(rep_fold_partial, batch_format="pyarrow")
        .groupby("fold").aggregate(Sum("n_clusters",
                                       alias_name="n_clusters")))
    ncl = {int(r["fold"]): int(r["n_clusters"])
           for r in cl_counts.take_all()}  # ≤ K rows by construction

    def attach(t: pa.Table) -> pa.Table:
        cl = [ncl.get(int(f), 0) for f in t["fold"].to_pylist()]
        return t.append_column("n_clusters", pa.array(cl, pa.int64()))

    return counts.map_batches(attach, batch_format="pyarrow").sort("fold")


def docs_collocations(sf_dir: str):
    """PMI collocation mining (Church & Hanks 1990) — the gazetteer/term
    induction primitive: top 20 adjacent-word bigrams with ≥5
    occurrences by pointwise mutual information ln(n_ab·N / (n_a·n_b)).
    Two narrow count aggregates (bigrams, unigrams) — per-batch Counter
    combiners collapse repeats before either shuffle; the unigram table
    broadcasts back for the PMI attach (tiny here; at web scale the
    attach becomes one co-partitioned join keyed twice, same plan as the
    degree attach in graphops). Exact int counts ride beside integer
    micro-nat PMI."""
    from collections import Counter

    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["text"],
                      rows_per_block=2000)

    def bigram_partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for txt in t["text"].to_pylist():
            toks = _TERM_RE.findall((txt or "").lower())
            c.update(zip(toks, toks[1:]))
        if not c:
            return pa.schema([("w1", pa.string()), ("w2", pa.string()),
                              ("n", pa.int64())]).empty_table()
        ks = list(c)
        return pa.table({
            "w1": pa.array([k[0] for k in ks], pa.string()),
            "w2": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([c[k] for k in ks], pa.int64())})

    def unigram_partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for txt in t["text"].to_pylist():
            c.update(_TERM_RE.findall((txt or "").lower()))
        ks = list(c)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "n": pa.array([c[k] for k in ks], pa.int64())})

    big = (docs.map_batches(bigram_partial, batch_format="pyarrow")
           .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n_ab")))
    uni = (docs.map_batches(unigram_partial, batch_format="pyarrow")
           .groupby("term").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    total = int(uni["n"].sum())
    uni_ref = ray.put(dict(zip(uni["term"], uni["n"].astype(int))))

    out_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("n_ab", pa.int64()), ("n_a", pa.int64()),
                            ("n_b", pa.int64()), ("pmi_u", pa.int64())])

    def pmi(t: pa.Table) -> pa.Table:
        m = ray.get(uni_ref)
        t = t.filter(pc.greater_equal(t["n_ab"], pa.scalar(5, pa.int64())))
        if not len(t):
            return out_schema.empty_table()
        na = np.array([m[w] for w in t["w1"].to_pylist()], np.int64)
        nb = np.array([m[w] for w in t["w2"].to_pylist()], np.int64)
        nab = t["n_ab"].to_numpy(zero_copy_only=False)
        val = (np.log(nab.astype(np.float64)) + np.log(float(total))
               - np.log(na.astype(np.float64))
               - np.log(nb.astype(np.float64)))
        return pa.table({"w1": t["w1"], "w2": t["w2"], "n_ab": t["n_ab"],
                         "n_a": pa.array(na, pa.int64()),
                         "n_b": pa.array(nb, pa.int64()),
                         "pmi_u": pa.array(np.round(val * 1e6)
                                           .astype(np.int64), pa.int64())}
                        ).cast(out_schema)

    return (big.map_batches(pmi, batch_format="pyarrow")
            .sort(["pmi_u", "w1", "w2"], descending=[True, False, False])
            .limit(20))


_DOCS_COLLOCATIONS_SQL = """
WITH t AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
       FROM t, UNNEST(generate_series(1, greatest(len(toks) - 1, 0)))
               AS u(i)),
b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
ug AS (SELECT toks[i] AS term
       FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)),
un AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM ug GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM un)
SELECT b.w1, b.w2, b.n_ab, ua.n AS n_a, ub.n AS n_b,
       CAST(round((ln(b.n_ab) + ln(tot.total) - ln(ua.n) - ln(ub.n))
            * 1000000) AS BIGINT) AS pmi_u
FROM b JOIN un ua ON ua.term = b.w1 JOIN un ub ON ub.term = b.w2, tot
ORDER BY pmi_u DESC, b.w1, b.w2 LIMIT 20
"""


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape (market share by year): of the revenue on
    Brand#11 parts, the share supplied by NATION_3 suppliers, per order
    year. Part keys and supplier→nation collapse to broadcast maps;
    lineitem pre-filters and pre-aggregates per (orderkey-hash batch) to
    (orderkey, rev, is_nation_rev) rows; ONE hash join against
    (orderkey, year) attaches the year; the share is emitted as the
    exact integer cent pair (nation_cents, total_cents) plus the double
    their division yields — bit-equal across engines."""
    from .functions.joins import auto_join, auto_semi_join

    # both growing dim sides route through the threshold choosers
    # (VERDICT r3 item #5): part keys as an auto_semi_join filter,
    # supplier nation as an auto_join attach — broadcast below the
    # limit, hash shuffle above
    brand_keys = read_table(sf_dir, "part",
                            columns=["p_partkey", "p_brand"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["p_brand"],
                                        pa.scalar("Brand#11")))
            .select(["p_partkey"]), batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])
    li_b = auto_semi_join(li, brand_keys, left_key="l_partkey",
                          right_key="p_partkey")

    supp = read_table(sf_dir, "supplier",
                      columns=["s_suppkey", "s_nationkey"])
    li_s = auto_join(li_b, supp, left_key="l_suppkey",
                     right_key="s_suppkey", right_cols=["s_nationkey"])

    def prep(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0),
                                             t["l_discount"])))
        is3 = pc.equal(pc.cast(t["s_nationkey"], pa.int64()),
                       pa.scalar(3, pa.int64()))
        nrev = pc.if_else(is3, rev, pa.scalar(0, pa.int64()))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev,
                         "nrev": nrev})

    li_f = li_s.map_batches(prep, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"])

    def oyear(t: pa.Table) -> pa.Table:
        yr = pd.Series(t["o_orderdate"].to_pandas()).dt.year
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pa.array(yr.astype("int64"),
                                            pa.int64())})

    j = auto_join(li_f, orders.map_batches(oyear, batch_format="pyarrow"),
                  left_key="l_orderkey", right_key="o_orderkey",
                  right_cols=["o_year"],
                  num_partitions=_join_parts(sf_dir))

    agg = (j.groupby("o_year")
           .aggregate(Sum("nrev", alias_name="nation_cents"),
                      Sum("rev", alias_name="total_cents")))

    def share(t: pa.Table) -> pa.Table:
        s = pc.divide(pc.cast(t["nation_cents"], pa.float64()),
                      pc.cast(t["total_cents"], pa.float64()))
        return pa.table({"o_year": t["o_year"],
                         "nation_cents": t["nation_cents"],
                         "total_cents": t["total_cents"],
                         "mkt_share": s})

    return agg.map_batches(share, batch_format="pyarrow").sort("o_year")


_Q8_SQL = """
WITH f AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS rev,
         CASE WHEN s_nationkey = 3 THEN
              CAST(round(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT) ELSE 0 END AS nrev
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  WHERE p_brand = 'Brand#11')
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(nrev) AS BIGINT) AS nation_cents,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       CAST(SUM(nrev) AS DOUBLE) / SUM(rev) AS mkt_share
FROM f JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1 ORDER BY 1
"""


def q12_priority_shipping(sf_dir: str):
    """TPC-H Q12 shape (CASE-bucketed join counts): per order YEAR of
    shipment, how many shipped lineitems belong to high-priority orders
    (1-URGENT / 2-HIGH) vs low. The order→priority-class map broadcasts
    once as an Arrow int64 array of high-priority orderkeys, probed
    per batch with vectorized ``pc.is_in`` (ADVICE r2: replaced the
    per-row Python ``in`` loop) — the join is map-side, the CASE
    evaluates vectorized, and only per-batch partial counts shuffle."""
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filters=[("o_orderpriority", "in", ["1-URGENT", "2-HIGH"])])
    hi = ray.put(pc.cast(orders["o_orderkey"].combine_chunks(),
                         pa.int64()))

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pd.Series(t["l_shipdate"].to_pandas()).dt.year.to_numpy()
        is_hi = pc.is_in(pc.cast(t["l_orderkey"], pa.int64()),
                         value_set=ray.get(hi)).to_numpy(
                             zero_copy_only=False)
        df = pd.DataFrame({"ship_year": yr.astype(np.int64),
                           "hi": is_hi.astype(np.int64),
                           "lo": (~is_hi).astype(np.int64)})
        g = df.groupby("ship_year", as_index=False).sum()
        return pa.table({
            "ship_year": pa.array(g["ship_year"], pa.int64()),
            "high_line_count": pa.array(g["hi"], pa.int64()),
            "low_line_count": pa.array(g["lo"], pa.int64())})

    return (li.map_batches(partial, batch_format="pyarrow")
            .groupby("ship_year")
            .aggregate(Sum("high_line_count",
                           alias_name="high_line_count"),
                       Sum("low_line_count", alias_name="low_line_count"))
            .sort("ship_year"))


_Q12_SQL = """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1 ORDER BY 1
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (scalar-subquery MAX attach): supplier(s) with the
    maximum lineitem revenue in 1996-Q1. Per-batch per-suppkey cents
    combiner → groupby bounded by |supplier| → the max is ONE scalar
    pulled from that small aggregate (the 'scalar subquery' broadcast) →
    vectorized equality filter → broadcast name join. Exact integer
    cents make the max tie-safe across engines."""
    from .functions.joins import auto_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        lo = pa.scalar(np.datetime64("1996-01-01", "us"))
        hi = pa.scalar(np.datetime64("1996-04-01", "us"))
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        cents = _cents(pc.multiply(
            t["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), t["l_discount"])))
        g = pa.table({"s_suppkey": t["l_suppkey"], "cents": cents}) \
            .group_by("s_suppkey").aggregate([("cents", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"],
                         "cents": pc.cast(g["cents_sum"], pa.int64())})

    rev = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("s_suppkey")
           .aggregate(Sum("cents", alias_name="total_cents"))).materialize()
    mx = rev.max("total_cents")
    if mx is None:          # window matched nothing at this scale factor
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="string"),
                             "total_cents": pd.Series([], dtype="int64")})
    best = int(mx)
    top = rev.map_batches(
        lambda t: t.filter(pc.equal(t["total_cents"],
                                    pa.scalar(best, pa.int64()))),
        batch_format="pyarrow")
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return auto_join(top, supp, left_key="s_suppkey",
                     right_key="s_suppkey", right_cols=["s_name"]) \
        .select_columns(["s_suppkey", "s_name", "total_cents"]) \
        .sort("s_suppkey")


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s_name, total_cents
FROM supplier s JOIN rev USING (s_suppkey)
WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
ORDER BY s.s_suppkey
"""


def q16_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape (COUNT DISTINCT per group over a join, lineitem as
    the partsupp stand-in): distinct supplier count per (p_brand, p_type)
    excluding Brand#11. Two-stage exact distinct: per-batch distinct
    (partkey, suppkey) pairs (combiner), part attrs attached via the
    auto_join threshold chooser (VERDICT r3 item #5 — broadcast below
    the limit, hash join above; the inner join drops Brand#11 because
    the build side is pre-filtered), global triple dedup by groupby,
    then a count per (brand, type) — the distinct shuffle carries
    triples, never raw lineitems."""
    from .functions.joins import auto_join

    part_f = read_table(sf_dir, "part",
                        columns=["p_partkey", "p_brand", "p_type"]) \
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["p_brand"],
                                            pa.scalar("Brand#11"))),
            batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_distinct(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
            "s_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.table({
            "l_partkey": pa.array(df["l_partkey"].to_numpy(), pa.int64()),
            "s_suppkey": pa.array(df["s_suppkey"].to_numpy(),
                                  pa.int64())})

    pairs = li.map_batches(pair_distinct, batch_format="pyarrow")
    attached = auto_join(pairs, part_f, left_key="l_partkey",
                         right_key="p_partkey",
                         right_cols=["p_brand", "p_type"])

    # global triple distinct via hash-bucketed drop_duplicates, NOT a
    # sort-groupby: the (brand, type, supplier) key is near-unique and
    # the aggregate walked ~375k one-row groups (39.8 s → ~3 s at
    # sf0.01 — the _part_cooccur_counts pathology, again). Bucketing by
    # the FULL triple co-locates duplicates, so partition-local
    # drop_duplicates IS the global distinct and the per-partition
    # (brand, type) sizes are exact partial counts.
    def tri_bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["p_brand", "p_type", "s_suppkey"], 16, "_p")

    def tri_count(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["p_brand", "p_type", "s_suppkey"])
        vc = (d.groupby(["p_brand", "p_type"], sort=False).size()
              .reset_index(name="n_part"))
        return pa.table({
            "p_brand": pa.array(vc["p_brand"], pa.string()),
            "p_type": pa.array(vc["p_type"], pa.string()),
            "n_part": pa.array(vc["n_part"].to_numpy(np.int64))})

    # top-k stays in the distributed plan (r4 VERDICT #8): a
    # distributed sort + limit over the dim-bounded aggregate — only
    # the 20 winners ever reach the driver
    out = (attached.map_batches(tri_bucket, batch_format="pyarrow")
           .groupby("_p").map_groups(tri_count, batch_format="pandas")
           .groupby(["p_brand", "p_type"])
           .aggregate(Sum("n_part", alias_name="supplier_cnt"))
           .sort(["supplier_cnt", "p_brand", "p_type"],
                 descending=[True, False, False])
           .limit(20).to_pandas())
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out[["p_brand", "p_type", "supplier_cnt"]]


_Q16_SQL = """
SELECT p_brand, p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
           AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#11'
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 20
"""


def q21_sole_late_supplier(sf_dir: str):
    """TPC-H Q21 shape (multi-EXISTS over per-order supplier sets; 'late'
    redefined as shipdate > orderdate + 90 days since this corpus has no
    commit/receipt dates): for multi-supplier orders where EXACTLY ONE
    supplier shipped late, count such orders per that supplier; top 10.
    Plan (VERDICT r3 item #3 — no fact-table broadcast): lineitem is
    first reduced to one row per (orderkey, suppkey) carrying MAX
    shipdate (per-batch pandas combiner, then the global groupby —
    late = [max_ship > orderdate + 90] since the flag is monotone in
    shipdate); order dates attach via ``auto_join``, whose size chooser
    broadcasts orders only below its row threshold and hash-joins above
    it. Then ONE hash-bucketed per-order pandas pass computes
    (n_suppliers, n_late, sole-late suppkey) and a final bounded groupby
    counts per supplier."""
    from .functions.joins import auto_join

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
            "o": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "s": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "ship": t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")})
            .groupby(["o", "s"], as_index=False)["ship"].max())
        return pa.table({
            "o_orderkey": pa.array(df["o"].to_numpy(), pa.int64()),
            "s_suppkey": pa.array(df["s"].to_numpy(), pa.int64()),
            "max_ship": pa.array(df["ship"].to_numpy(),
                                 pa.timestamp("us"))})

    # (orderkey, suppkey) is near-unique → the sort-groupby Max walked
    # one-row groups in Python (13.8 s → ~3 s at sf0.01). Bucket by
    # orderkey (co-locates every row of a pair), pandas max inside the
    # partition IS the exact global max.
    def os_bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["o_orderkey"], 16, "_p")

    def os_max(g: pd.DataFrame) -> pa.Table:
        vc = (g.groupby(["o_orderkey", "s_suppkey"],
                        as_index=False)["max_ship"].max())
        return pa.table({
            "o_orderkey": pa.array(vc["o_orderkey"].to_numpy(np.int64)),
            "s_suppkey": pa.array(vc["s_suppkey"].to_numpy(np.int64)),
            "max_ship": pa.array(vc["max_ship"].to_numpy()
                                 .astype("datetime64[us]"),
                                 pa.timestamp("us"))})

    pair_ship = (li.map_batches(pair_partial, batch_format="pyarrow")
                 .map_batches(os_bucket, batch_format="pyarrow")
                 .groupby("_p").map_groups(os_max,
                                           batch_format="pandas"))

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"])
    attached = auto_join(pair_ship, orders, left_key="o_orderkey",
                         right_key="o_orderkey",
                         right_cols=["o_orderdate"])

    def flag_late(t: pa.Table) -> pa.Table:
        ship = t["max_ship"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        odt = t["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        late = ((ship - odt) > np.timedelta64(90, "D")).astype(np.int64)
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"],
                                               pa.int64()),
                         "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                         "late": pa.array(late, pa.int64())})

    pair = attached.map_batches(flag_late, batch_format="pyarrow")

    nparts = _join_parts(sf_dir, "orders")

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["o_orderkey"], nparts, "_opart")

    def per_order(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("o_orderkey").agg(
            n_supp=("s_suppkey", "nunique"),
            n_late=("late", "sum"))
        sole = agg[(agg["n_supp"] > 1) & (agg["n_late"] == 1)].index
        win = g[g["o_orderkey"].isin(sole) & (g["late"] == 1)]
        c = win.groupby("s_suppkey").size()
        return pa.table({
            "s_suppkey": pa.array(c.index.to_numpy(), pa.int64()),
            "n_orders": pa.array(c.to_numpy(), pa.int64())})

    # distributed sort + limit (r4 VERDICT #8): only 10 rows land on
    # the driver
    out = (pair.map_batches(tag, batch_format="pyarrow")
           .groupby("_opart").map_groups(per_order, batch_format="pandas")
           .groupby("s_suppkey")
           .aggregate(Sum("n_orders", alias_name="n_orders"))
           .sort(["n_orders", "s_suppkey"], descending=[True, False])
           .limit(10).to_pandas())
    out = out.astype({"s_suppkey": "int64", "n_orders": "int64"})
    return out


_Q21_SQL = """
WITH pair AS (
  SELECT l_orderkey AS o, l_suppkey AS s,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1, 2),
ord AS (
  SELECT o, COUNT(*) AS n_supp, SUM(late) AS n_late FROM pair GROUP BY o)
SELECT s AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM pair JOIN ord USING (o)
WHERE n_supp > 1 AND n_late = 1 AND late = 1
GROUP BY 1 ORDER BY n_orders DESC, s_suppkey LIMIT 10
"""


def part_attrs_melt(sf_dir: str):
    """UNPIVOT/melt (the inverse of the G12 pivot family): part's
    (p_size, p_retailprice) wide columns become (variable, value) rows —
    pure per-batch Arrow reshaping, no shuffle — then the first 50 rows
    by (variable, p_partkey) for a stable comparable result."""
    from .functions.reshape import melt

    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_size", "p_retailprice"])
    m = melt(part, id_cols=["p_partkey"],
             value_cols=["p_size", "p_retailprice"])
    # no arithmetic on `value` anywhere → exact binary float equality
    # with the UNION ALL oracle
    return m.sort(["variable", "p_partkey"]).limit(50)


_PART_MELT_SQL = """
SELECT * FROM (
  SELECT p_partkey, 'p_size' AS variable,
         CAST(p_size AS DOUBLE) AS value FROM part
  UNION ALL
  SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
  FROM part)
ORDER BY variable, p_partkey LIMIT 50
"""


def docs_span_dedup(sf_dir: str):
    """C4-style repeated-span removal (Raffel et al. 2020 used
    three-sentence spans; this corpus has no sentence structure, so the
    span unit is a fixed 10-token chunk): delete every chunk whose exact
    text occurs MORE THAN ONCE corpus-wide, then reassemble each
    document from its surviving chunks in order. Output per doc:
    (n_chunks, n_kept, kept_len).

    Scale plan: explode → per-batch partial counts (combiner) → bounded
    (chunk, n) groupby; the repeated-chunk filter is the distributed
    ``anti_join`` on the chunk text (co-partitioned membership — no
    broadcast: at web scale the repeated-span set is itself huge);
    reassembly is one hash-bucketed per-doc ordered join. Every step is
    an existing registry operator — this query is the composition."""
    from .functions.joins import anti_join
    from .functions.terms import _TERM_RE

    K = 10
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, chunks = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            toks = _TERM_RE.findall((txt or "").lower())
            for i in range(0, len(toks), K):
                ids.append(did)
                idxs.append(i // K)
                chunks.append(" ".join(toks[i:i + K]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_idx": pa.array(idxs, pa.int64()),
                         "chunk": pa.array(chunks, pa.string())})

    chunks = docs.map_batches(explode,
                              batch_format="pyarrow").materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"chunk": t["chunk"]}).group_by("chunk") \
            .aggregate([([], "count_all")])
        return pa.table({"chunk": g["chunk"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    repeated = (chunks.map_batches(count_partial, batch_format="pyarrow")
                .groupby("chunk").aggregate(Sum("n", alias_name="n"))
                .map_batches(
                    lambda t: t.filter(pc.greater(
                        t["n"], pa.scalar(1, pa.int64())))
                    .select(["chunk"]),
                    batch_format="pyarrow"))

    kept = anti_join(chunks, repeated, left_key="chunk",
                     right_key="chunk")

    def kept_partial(t: pa.Table) -> pa.Table:
        # mergeable partials: (n_kept, sum of chunk lens); the joiner
        # spaces (n_kept − 1) are applied once, AFTER the global merge
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "clen": pc.utf8_length(t["chunk"]).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby("doc_id").agg(n_kept=("clen", "size"),
                                     csum=("clen", "sum")).reset_index()
        return pa.table({
            "doc_id": pa.array(g["doc_id"], pa.int64()),
            "n_kept": pa.array(g["n_kept"], pa.int64()),
            "csum": pa.array(g["csum"], pa.int64())})

    kept_stats = (kept.map_batches(kept_partial, batch_format="pyarrow")
                  .groupby("doc_id")
                  .aggregate(Sum("n_kept", alias_name="n_kept"),
                             Sum("csum", alias_name="csum")))

    totals = (chunks.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"]}), batch_format="pyarrow")
        .groupby("doc_id").aggregate(Count(alias_name="n_chunks")))

    # the final attach is a distributed LEFT OUTER hash join (both sides
    # are one-row-per-doc aggregates, but "per doc" is corpus-sized at
    # web scale — nothing may land on the driver; VERDICT r3 item #1)
    kept_stats = kept_stats.map_batches(
        lambda t: pa.table({"k_doc_id": t["doc_id"],
                            "n_kept": t["n_kept"], "csum": t["csum"]}),
        batch_format="pyarrow")
    joined = totals.join(kept_stats, join_type="left_outer",
                         num_partitions=_join_parts(sf_dir, "documents"),
                         on=("doc_id",), right_on=("k_doc_id",))

    def finalize(t: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        n_kept = pc.coalesce(pc.cast(t["n_kept"], pa.int64()), zero)
        csum = pc.coalesce(pc.cast(t["csum"], pa.int64()), zero)
        # (n_kept − 1) joiner spaces, floored at 0 for all-removed docs
        kept_len = pc.add(csum, pc.subtract(
            pc.max_element_wise(n_kept, pa.scalar(1, pa.int64())),
            pa.scalar(1, pa.int64())))
        return pa.table({"doc_id": t["doc_id"],
                         "n_chunks": pc.cast(t["n_chunks"], pa.int64()),
                         "n_kept": n_kept, "kept_len": kept_len})

    return (joined.map_batches(finalize, batch_format="pyarrow")
            .sort("doc_id"))


_DOCS_SPAN_DEDUP_SQL = """
WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
ch AS (SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
              array_to_string(list_slice(toks, u.i * 10 + 1,
                                         u.i * 10 + 10), ' ') AS chunk
       FROM tok, LATERAL (SELECT unnest(range(CAST(ceil(len(toks) / 10.0)
                                               AS BIGINT))) AS i) u),
rep AS (SELECT chunk FROM ch GROUP BY chunk HAVING COUNT(*) > 1),
kept AS (SELECT * FROM ch
         WHERE chunk NOT IN (SELECT chunk FROM rep)),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
        FROM ch GROUP BY doc_id),
ks AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
              CAST(SUM(length(chunk)) + COUNT(*) - 1 AS BIGINT)
                  AS kept_len
       FROM kept GROUP BY doc_id)
SELECT t.doc_id, t.n_chunks,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(k.kept_len, 0) AS BIGINT) AS kept_len
FROM tot t LEFT JOIN ks k USING (doc_id)
ORDER BY t.doc_id
"""


def emb_pca_top_component(sf_dir: str):
    """V5: first principal component of the embeddings table via
    distributed exact-integer covariance accumulation + driver power
    iteration (functions/vectors.py pca_top_component). Output: one row
    per dimension (dim, loading in micro-units) plus the explained
    variance — layout-invariant by construction (integer partials).
    Rows-only (iterative eigensolve, not SQL); numpy-parity golden in
    tests/test_fuzzy_vectors.py."""
    from .functions.vectors import pca_top_component

    ds = read_table(sf_dir, "embeddings", columns=["embedding"],
                    rows_per_block=2_000)
    v, lam, n = pca_top_component(ds)
    return ray.data.from_arrow(pa.table({
        "dim": pa.array(range(1, len(v) + 1), pa.int64()),
        "loading_micro": pa.array(
            np.round(v * 1e6).astype(np.int64), pa.int64()),
        "explained_var_micro": pa.array(
            [int(round(lam * 1e6))] * len(v), pa.int64()),
        "n": pa.array([n] * len(v), pa.int64()),
    }))


# --------------------------------------------------------------------------
# round-4 additions (SURVEY §2.13): event-time windows, TPC-H Q9/Q11
# shapes, bigram LM scoring
# --------------------------------------------------------------------------

def events_tumbling_6h(sf_dir: str):
    """W21 — event-time TUMBLING window aggregate (the batch face of the
    streaming windowed-aggregate family): 6-hour windows per event_type
    with count + exact distinct users. Window id is the integer
    floor(epoch/21600) so both engines group on identical int64s (no
    timezone/timestamp-rounding ambiguity). Distinct users is the
    two-stage exact pattern: per-batch distinct (win, type, user)
    triples (combiner) → global triple dedup → bounded count, beside a
    plain count/sum aggregate — the triple shuffle carries distinct
    triples, never raw events."""
    ds = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ep = pc.divide(pc.cast(t["ts"], pa.int64()),
                       pa.scalar(1_000_000, pa.int64()))
        win = pc.divide(ep, pa.scalar(21_600, pa.int64()))
        return pa.table({"win_id": win, "event_type": t["event_type"],
                         "user_id": t["user_id"],
                         "value_cents": _cents(t["value"])})

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    base = (prepped
            .map_batches(lambda t: t.select(["win_id", "event_type",
                                             "value_cents"]),
                         batch_format="pyarrow")
            .groupby(["win_id", "event_type"])
            .aggregate(Count(alias_name="n"),
                       Sum("value_cents", alias_name="sum_value_cents")))

    def triple_distinct(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "win_id": t["win_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_pandas(),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    users = (prepped.map_batches(triple_distinct, batch_format="pyarrow")
             .groupby(["win_id", "event_type", "user_id"])
             .aggregate(Count(alias_name="_n"))
             .map_batches(lambda t: t.select(["win_id", "event_type"]),
                          batch_format="pyarrow")
             .groupby(["win_id", "event_type"])
             .aggregate(Count(alias_name="n_users")))
    users = users.map_batches(
        lambda t: pa.table({"u_win": t["win_id"],
                            "u_type": t["event_type"],
                            "n_users": t["n_users"]}),
        batch_format="pyarrow")
    joined = base.join(users, join_type="inner",
                       num_partitions=_join_parts(sf_dir, "events"),
                       on=("win_id", "event_type"),
                       right_on=("u_win", "u_type"))
    return (joined.map_batches(
        lambda t: t.select(["win_id", "event_type", "n",
                            "sum_value_cents", "n_users"]),
        batch_format="pyarrow").sort(["win_id", "event_type"]))


_EVENTS_TUMBLING_SQL = """
SELECT CAST(floor(epoch(ts) / 21600) AS BIGINT) AS win_id, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2 ORDER BY win_id, event_type
"""


def events_hopping_3h_1h(sf_dir: str):
    """W22 — HOPPING (sliding) event-time windows, width 3 h / hop 1 h:
    every event lands in 3 windows, produced by a vectorized per-batch
    explode (np.repeat on the columns, tiled hop offsets — no Python
    row loop), then one bounded (window, type) groupby. The explode is
    the standard streaming-engine lowering of hopping windows onto a
    grouped aggregate; window id = floor(epoch/3600) − k identifies the
    window STARTING at that hour."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type",
                                               "value"])
    HOPS = 3

    def explode(t: pa.Table) -> pa.Table:
        ep = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[s]").astype(np.int64))
        hour = ep // 3600
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        n = len(hour)
        win = np.repeat(hour, HOPS) - np.tile(
            np.arange(HOPS, dtype=np.int64), n)
        return pa.table({
            "win_id": pa.array(win, pa.int64()),
            "event_type": pa.array(np.repeat(et, HOPS), pa.string()),
            "value_cents": pa.array(np.repeat(cents, HOPS), pa.int64())})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["win_id", "event_type"])
            .aggregate(Count(alias_name="n"),
                       Sum("value_cents", alias_name="sum_value_cents"))
            .sort(["win_id", "event_type"]))


_EVENTS_HOPPING_SQL = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) - k.k AS win_id,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
FROM events, (SELECT unnest([0, 1, 2]) AS k) k
GROUP BY 1, 2 ORDER BY win_id, event_type
"""


def q9_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9 shape (multi-dimension star join → two-key aggregate):
    revenue cents per (supplier nation name, order year). Supplier →
    nation collapses through two auto_join attaches (threshold-chosen
    broadcast/hash per VERDICT r3 item #5 discipline); the order-year
    attach reuses the q8 plan. Lineitem pre-aggregates per (orderkey,
    suppkey-nation) before the order join so the join input is the
    reduced pair table, not raw lineitems."""
    from .functions.joins import auto_join

    supp = read_table(sf_dir, "supplier",
                      columns=["s_suppkey", "s_nationkey"])
    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_name"])
    sn = auto_join(supp, nation, left_key="s_nationkey",
                   right_key="n_nationkey", right_cols=["n_name"])

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = _cents(pc.multiply(t["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0),
                                           t["l_discount"])))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"], "rev": r})

    li_n = auto_join(li.map_batches(rev, batch_format="pyarrow"),
                     sn.map_batches(
                         lambda t: t.select(["s_suppkey", "n_name"]),
                         batch_format="pyarrow"),
                     left_key="l_suppkey", right_key="s_suppkey",
                     right_cols=["n_name"])

    # combiner: reduce to (orderkey, nation) sums before the order-year
    # join — via hash-bucketed pandas groupby-sum, NOT a sort-groupby:
    # the (orderkey, nation) key is near-unique and the aggregate walked
    # ~300k one-row groups (the _part_cooccur_counts pathology; 24 s →
    # ~3 s at sf0.01). Bucketing by orderkey co-locates every row of a
    # (orderkey, nation) pair, so the partition-local sum IS global.
    def ok_bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t.select(["l_orderkey", "n_name", "rev"]),
                          ["l_orderkey"], 16, "_p")

    def ok_sum(g: pd.DataFrame) -> pa.Table:
        vc = (g.groupby(["l_orderkey", "n_name"], sort=False)["rev"]
              .sum().reset_index())
        return pa.table({
            "l_orderkey": pa.array(vc["l_orderkey"].to_numpy(np.int64)),
            "n_name": pa.array(vc["n_name"], pa.string()),
            "rev": pa.array(vc["rev"].to_numpy(np.int64))})

    pair = (li_n.map_batches(ok_bucket, batch_format="pyarrow")
            .groupby("_p").map_groups(ok_sum, batch_format="pandas"))

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"])

    def oyear(t: pa.Table) -> pa.Table:
        yr = pd.Series(t["o_orderdate"].to_pandas()).dt.year
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pa.array(yr.astype("int64"),
                                            pa.int64())})

    j = auto_join(pair, orders.map_batches(oyear, batch_format="pyarrow"),
                  left_key="l_orderkey", right_key="o_orderkey",
                  right_cols=["o_year"])

    # per-batch combiner BEFORE the global groupby: besides being the
    # right shuffle shape (≤ |nations·years| rows per batch move), it
    # sidesteps a measured ~12 s Aggregate-on-materialized-1-block
    # stall (54k rows, 175 groups — the combiner-first plan runs in
    # 0.1 s; see BASELINE.md round-4 closing notes)
    def comb(t: pa.Table) -> pa.Table:
        return (t.group_by(["n_name", "o_year"])
                .aggregate([("rev", "sum")])
                .rename_columns(["n_name", "o_year", "rev"]))

    return (j.map_batches(comb, batch_format="pyarrow")
            .groupby(["n_name", "o_year"])
            .aggregate(Sum("rev", alias_name="profit_cents"))
            .sort(["n_name", "o_year"]))


_Q9_SQL = """
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1, 2 ORDER BY n_name, o_year
"""


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape (HAVING vs a scalar subquery over the SAME
    aggregate): per-part total value (qty × price cents, exact int64),
    keeping parts whose total exceeds 1.25× the mean per-part total. The
    mean is a second tiny aggregate over the per-part sums — two
    scalars (global sum + part count) to the driver, broadcast into a
    vectorized filter; nothing part-sized leaves the cluster. Top 50 by
    (value desc, partkey) for a bounded comparable result."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity",
                             "l_extendedprice"])

    def val(t: pa.Table) -> pa.Table:
        v = pc.multiply(pc.cast(t["l_quantity"], pa.int64()),
                        _cents(t["l_extendedprice"]))
        return pa.table({"l_partkey": t["l_partkey"], "v": v})

    per_part = (li.map_batches(val, batch_format="pyarrow")
                .groupby("l_partkey").aggregate(Sum("v", alias_name="v"))
                .materialize())
    total = int(per_part.sum("v"))
    nparts = per_part.count()

    def keep(t: pa.Table) -> pa.Table:
        # v > 1.25·total/nparts ⟺ 4·v·nparts > 5·total (exact ints)
        lhs = pc.multiply(pc.cast(t["v"], pa.int64()),
                          pa.scalar(4 * nparts, pa.int64()))
        return t.filter(pc.greater(lhs,
                                   pa.scalar(5 * total, pa.int64())))

    return (per_part.map_batches(keep, batch_format="pyarrow")
            .map_batches(lambda t: pa.table({
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "value_cents": pc.cast(t["v"], pa.int64())}),
                batch_format="pyarrow")
            .sort(["value_cents", "l_partkey"], descending=[True, False])
            .limit(50))


_Q11_SQL = """
WITH pp AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)
              * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
  FROM lineitem GROUP BY 1)
SELECT l_partkey, value_cents FROM pp
WHERE value_cents * 4 * (SELECT COUNT(*) FROM pp)
      > 5 * (SELECT SUM(value_cents) FROM pp)
ORDER BY value_cents DESC, l_partkey LIMIT 50
"""


def docs_bigram_nll(sf_dir: str, vocab_limit: int = 2_000_000):
    """Bigram-LM perplexity proxy (the unigram scorer's order-2
    sibling): p(b|a) = c(a,b) / c(a,·) where c(a,·) counts token a in
    any non-final position; each doc scores the average negative
    log-likelihood over its bigrams; top 20 most surprising docs with
    ≥1 bigram. Same scale contract as docs_unigram_nll: per-batch
    Counter combiner → (a,b,n) groupby; the broadcast model is exact
    below ``vocab_limit`` bigram types (the oracle regime) and above it
    keeps the top-K bigrams by (count desc, key), scoring all remaining
    mass as one pooled OOV bucket at log(oov_mass/total_bigrams) —
    bounded driver memory at any corpus size."""
    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)

    def pairs(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: "Counter[tuple]" = Counter()
        for txt in t["text"].to_pylist():
            toks = _TERM_RE.findall((txt or "").lower())
            c.update(zip(toks, toks[1:]))
        ks = list(c.keys())
        return pa.table({
            "a": pa.array([k[0] for k in ks], pa.string()),
            "b": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([c[k] for k in ks], pa.int64())})

    freq_ds = (docs.map_batches(pairs, batch_format="pyarrow")
               .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
               .materialize())
    n_types = freq_ds.count()
    total = int(freq_ds.sum("n"))
    if n_types <= vocab_limit:
        freqs = freq_ds.to_pandas()
        oov_lp = None
    else:
        freqs = (freq_ds.sort(["n", "a", "b"],
                              descending=[True, False, False])
                 .limit(vocab_limit).to_pandas())
        oov_mass = total - int(freqs["n"].sum())
        oov_lp = float(np.log(oov_mass) - np.log(total))
    ca = freqs.groupby("a")["n"].sum().to_dict() if oov_lp is None else \
        None
    if oov_lp is None:
        lp = {(a, b): float(np.log(n) - np.log(ca[a]))
              for a, b, n in zip(freqs["a"], freqs["b"], freqs["n"])}
    else:
        # capped path: prefix totals from the KEPT bigrams only — the
        # documented approximation that keeps the dict bounded
        ca_k = freqs.groupby("a")["n"].sum().to_dict()
        lp = {(a, b): float(np.log(n) - np.log(ca_k[a]))
              for a, b, n in zip(freqs["a"], freqs["b"], freqs["n"])}
    lp_ref = ray.put(lp)

    out_schema = pa.schema([("doc_id", pa.int64()), ("nb", pa.int64()),
                            ("nll_u", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(lp_ref)
        ids, nbs, nlls = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            toks = _TERM_RE.findall((txt or "").lower())
            if len(toks) < 2:
                continue
            bgs = list(zip(toks, toks[1:]))
            if oov_lp is None:
                s = -sum(m[bg] for bg in bgs) / len(bgs)
            else:
                s = -sum(m.get(bg, oov_lp) for bg in bgs) / len(bgs)
            ids.append(did)
            nbs.append(len(bgs))
            nlls.append(round(s * 1e6))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "nb": pa.array(nbs, pa.int64()),
                         "nll_u": pa.array(nlls, pa.int64())}
                        ).cast(out_schema)

    return (docs.map_batches(score, batch_format="pyarrow")
            .sort(["nll_u", "doc_id"], descending=[True, False])
            .limit(20))


_DOCS_BIGRAM_NLL_SQL = """
WITH tok AS (SELECT doc_id,
                    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
bg AS (SELECT doc_id, toks[CAST(u.i AS BIGINT)] AS a,
              toks[CAST(u.i AS BIGINT) + 1] AS b
       FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u),
f AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
fa AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM f GROUP BY 1),
sc AS (SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS nb,
              AVG(-(ln(f.n) - ln(fa.na))) AS nll
       FROM bg JOIN f USING (a, b) JOIN fa USING (a)
       GROUP BY bg.doc_id)
SELECT doc_id, nb, CAST(round(nll * 1000000) AS BIGINT) AS nll_u
FROM sc ORDER BY nll_u DESC, doc_id LIMIT 20
"""


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape (correlated MIN subquery + multi-way dim attach):
    for every LARGE part sized 10–20, the supplier(s) achieving the
    minimum observed cost — cost here is MIN lineitem extendedprice in
    cents per (part, supplier), since this schema has no partsupp table
    (TESTDATA.md). Plan: semi-filter lineitem by the part predicate
    (auto_semi_join — broadcast key set below the threshold, shuffle
    semi join above), reduce to the (part, supplier) cost table, derive
    the per-part MIN with a second tiny groupby, and attach it back with
    ``auto_join`` — the correlated-subquery decorrelation every engine
    performs. Supplier name and nation attach through the same chooser.
    Ties (several suppliers at the min cost) keep every winner, exactly
    like the SQL."""
    from .functions.joins import auto_join, auto_semi_join

    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_type", "p_size"])
    pk = part.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["p_type"], "LARGE"),
                    pc.and_(pc.greater_equal(t["p_size"], 10),
                            pc.less_equal(t["p_size"], 20))))
        .select(["p_partkey"]),
        batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    li_f = auto_semi_join(li, pk, left_key="l_partkey",
                          right_key="p_partkey")

    pairs = (li_f.map_batches(
        lambda t: pa.table({"p_partkey": t["l_partkey"],
                            "s_suppkey": t["l_suppkey"],
                            "cost_cents": _cents(t["l_extendedprice"])}),
        batch_format="pyarrow")
        .groupby(["p_partkey", "s_suppkey"])
        .aggregate(Min("cost_cents", alias_name="cost_cents")))

    minc = (pairs.map_batches(
        lambda t: t.select(["p_partkey", "cost_cents"]),
        batch_format="pyarrow")
        .groupby("p_partkey").aggregate(Min("cost_cents",
                                            alias_name="min_cost")))
    with_min = auto_join(pairs, minc, left_key="p_partkey",
                         right_key="p_partkey", right_cols=["min_cost"])
    winners = with_min.map_batches(
        lambda t: t.filter(pc.equal(t["cost_cents"], t["min_cost"]))
        .select(["p_partkey", "s_suppkey", "cost_cents"]),
        batch_format="pyarrow")

    supp = read_table(sf_dir, "supplier",
                      columns=["s_suppkey", "s_name", "s_nationkey"])
    supp = supp.map_batches(
        lambda t: pa.table({"sk": t["s_suppkey"], "s_name": t["s_name"],
                            "s_nationkey": pc.cast(t["s_nationkey"],
                                                   pa.int64())}),
        batch_format="pyarrow")
    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_name"])
    nation = nation.map_batches(
        lambda t: pa.table({"nk": pc.cast(t["n_nationkey"], pa.int64()),
                            "n_name": t["n_name"]}),
        batch_format="pyarrow")
    out = auto_join(winners, supp, left_key="s_suppkey", right_key="sk",
                    right_cols=["s_name", "s_nationkey"])
    out = auto_join(out, nation, left_key="s_nationkey", right_key="nk",
                    right_cols=["n_name"])
    return (out.map_batches(
        lambda t: t.select(["p_partkey", "s_suppkey", "s_name", "n_name",
                            "cost_cents"]),
        batch_format="pyarrow").sort(["p_partkey", "s_suppkey"]))


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
  GROUP BY 1, 2),
m AS (SELECT p_partkey, MIN(cost_cents) AS mc FROM ps GROUP BY 1)
SELECT ps.p_partkey, ps.s_suppkey, s_name, n_name, cost_cents
FROM ps JOIN m USING (p_partkey)
JOIN supplier ON supplier.s_suppkey = ps.s_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE cost_cents = mc
ORDER BY ps.p_partkey, ps.s_suppkey
"""


def q20_dominant_suppliers(sf_dir: str):
    """TPC-H Q20 shape (nested aggregate subqueries feeding a semi
    join): suppliers who shipped MORE than 10% of the total shipped
    quantity of some 'large…' part — the availqty-vs-share-of-shipped
    predicate of real Q20 re-expressed over this schema's lineitem (no
    partsupp; TESTDATA.md). 10% because supplier share flattens with
    corpus size here (max share ≈ 0.19 at sf0.01): 10% selects a
    non-degenerate winner set at every test scale. Per-(part, supplier)
    quantity sums reduce lineitem once; the per-part total is a second
    groupby over that REDUCED table (not the fact table); the 10·supp >
    total comparison is exact int64 cross-multiplication. Survivors
    collapse to distinct suppliers before the name attach, so only
    winner keys shuffle."""
    from .functions.joins import auto_join, auto_semi_join

    part = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    pk = part.map_batches(
        lambda t: t.filter(pc.starts_with(t["p_name"], "large"))
        .select(["p_partkey"]),
        batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_suppkey", "l_quantity"])
    li_f = auto_semi_join(li, pk, left_key="l_partkey",
                          right_key="p_partkey")
    ps = (li_f.map_batches(
        lambda t: pa.table({
            "p_partkey": t["l_partkey"], "s_suppkey": t["l_suppkey"],
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64())}),
        batch_format="pyarrow")
        .groupby(["p_partkey", "s_suppkey"])
        .aggregate(Sum("qty", alias_name="qty")))
    tot = (ps.map_batches(lambda t: t.select(["p_partkey", "qty"]),
                          batch_format="pyarrow")
           .groupby("p_partkey").aggregate(Sum("qty", alias_name="tot")))
    dom = auto_join(ps, tot, left_key="p_partkey", right_key="p_partkey",
                    right_cols=["tot"])
    winners = (dom.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["qty"], pa.scalar(10, pa.int64())),
            pc.cast(t["tot"], pa.int64())))
        .select(["s_suppkey"]),
        batch_format="pyarrow")
        .groupby("s_suppkey").aggregate(Count(alias_name="_n")))

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    supp = supp.map_batches(
        lambda t: pa.table({"sk": t["s_suppkey"], "s_name": t["s_name"]}),
        batch_format="pyarrow")
    out = auto_join(winners, supp, left_key="s_suppkey", right_key="sk",
                    right_cols=["s_name"])
    return (out.map_batches(
        lambda t: t.select(["s_suppkey", "s_name"]),
        batch_format="pyarrow").sort("s_suppkey"))


_Q20_SQL = """
WITH ps AS (
  SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'large%'
  GROUP BY 1, 2),
tot AS (SELECT p_partkey, SUM(qty) AS tot FROM ps GROUP BY 1)
SELECT DISTINCT ps.s_suppkey, s_name
FROM ps JOIN tot USING (p_partkey)
JOIN supplier ON supplier.s_suppkey = ps.s_suppkey
WHERE ps.qty * 10 > tot
ORDER BY ps.s_suppkey
"""


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check for blocking-verified candidates."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def customers_fuzzy_name_pairs(sf_dir: str):
    """D15 — string-similarity self-join (edit distance ≤ 1) via exact
    deletion-neighborhood blocking (FastSS, Bocek et al. 2007): two
    strings are within edit distance 1 ONLY IF deleting ≤ 1 character
    from each yields a common variant, so every name emits len+1
    variant keys (itself + each single-character deletion), candidate
    pairs share a variant bucket, and a cheap exact verifier removes
    the false positives the necessary-but-not-sufficient filter admits
    (e.g. "ab"/"ba" share a variant at distance 2). Variants are built
    with vectorized pandas slicing — a loop over character POSITIONS,
    not rows; pair generation runs per hash-bucketed partition
    (bucketed on the variant string, the corpus never gathers) and is
    deduped by a global pair groupby, so only candidate pairs — output-
    sized, not corpus-sized — reach the Python verifier. Oracle: the
    naive O(n²) levenshtein cross join."""
    from .functions.partitions import default_parts

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    nparts = default_parts()

    def variants(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        s = df["c_name"].astype(str)
        lens = s.str.len()
        frames = [pd.DataFrame({"variant": s, "k": df["c_custkey"],
                                "name": s})]
        for i in range(int(lens.max()) if len(s) else 0):
            m = (lens > i).to_numpy()
            if not m.any():
                break
            sub = s[m]
            frames.append(pd.DataFrame({
                "variant": sub.str.slice(0, i) + sub.str.slice(i + 1),
                "k": df.loc[m, "c_custkey"].to_numpy(),
                "name": sub.to_numpy()}))
        out = pd.concat(frames, ignore_index=True)
        out["_p"] = (pd.util.hash_pandas_object(out["variant"],
                                                index=False)
                     % nparts).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_pairs(part: pd.DataFrame) -> pa.Table:
        ak, an, bk, bn = [], [], [], []
        for _, g in part.groupby("variant", sort=False):
            g = g.drop_duplicates("k")   # same key via two deletions
            if len(g) < 2:
                continue
            g = g.sort_values("k")
            k = g["k"].to_numpy()
            nm = g["name"].to_numpy()
            ii, jj = np.triu_indices(len(k), 1)
            ak.append(k[ii]); an.append(nm[ii])
            bk.append(k[jj]); bn.append(nm[jj])
        if not ak:
            return pa.table({"a_custkey": pa.array([], pa.int64()),
                             "a_name": pa.array([], pa.string()),
                             "b_custkey": pa.array([], pa.int64()),
                             "b_name": pa.array([], pa.string())})
        return pa.table({
            "a_custkey": pa.array(np.concatenate(ak), pa.int64()),
            "a_name": pa.array(np.concatenate(an), pa.string()),
            "b_custkey": pa.array(np.concatenate(bk), pa.int64()),
            "b_name": pa.array(np.concatenate(bn), pa.string())})

    def verify(t: pa.Table) -> pa.Table:
        keep = pa.array([_ed_le1(x, y) for x, y in
                         zip(t["a_name"].to_pylist(),
                             t["b_name"].to_pylist())], pa.bool_())
        return t.filter(keep).select(
            ["a_custkey", "a_name", "b_custkey", "b_name"])

    return (cust.map_batches(variants, batch_format="pyarrow")
            .groupby("_p").map_groups(bucket_pairs, batch_format="pandas")
            .groupby(["a_custkey", "b_custkey", "a_name", "b_name"])
            .aggregate(Count(alias_name="_n"))
            .map_batches(verify, batch_format="pyarrow")
            .sort(["a_custkey", "b_custkey"]))


_FUZZY_PAIRS_SQL = """
SELECT a.c_custkey AS a_custkey, a.c_name AS a_name,
       b.c_custkey AS b_custkey, b.c_name AS b_name
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a_custkey, b_custkey
"""


def docs_curation_funnel(sf_dir: str):
    """LLM1 — the composite LLM-corpus curation funnel (the standard
    C4/Gopher-style sequence) as ONE query: language filter → quality
    gate (length ≥ 100 chars, punctuation ≤ 5 % — exact-integer
    ``20·n_punct ≤ n_chars``) → leading-span exact dedup (md5 of the
    first 60 normalized chars, the C4 leading-span idiom; full-text
    fingerprints are distinct at test scales so the prefix face keeps
    the stage non-degenerate). Returns the funnel signature: one row
    per stage with its surviving-document count.

    Scale shape: stage counts come from ONE streaming pass (per-batch
    0/1 indicator columns → a single global sum — no shuffle); the
    dedup count is a second column-pruned pass whose only shuffle is
    the (fingerprint → count) groupby over already-filtered rows. No
    corpus-sized driver state: four scalar counts cross to the driver."""
    from .functions.hashing import md5_hex

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"],
                    rows_per_block=500)

    def gates(t: pa.Table) -> pa.Table:
        en = pc.equal(t["lang"], "en")
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(
            t["text"], r"[^A-Za-z0-9\s]"), pa.int64())
        q = pc.and_(en, pc.and_(
            pc.greater_equal(n_chars, 100),
            pc.less_equal(pc.multiply(n_punct, pa.scalar(20, pa.int64())),
                          n_chars)))
        return pa.table({
            "en": pc.cast(en, pa.int64()),
            "q": pc.cast(q, pa.int64()),
            "one": pa.array([1] * len(t), pa.int64())})

    counts = ds.map_batches(gates, batch_format="pyarrow").aggregate(
        Sum("one", alias_name="n_all"), Sum("en", alias_name="n_en"),
        Sum("q", alias_name="n_q"))

    def fp(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(
            t["text"], r"[^A-Za-z0-9\s]"), pa.int64())
        q = pc.and_(pc.equal(t["lang"], "en"), pc.and_(
            pc.greater_equal(n_chars, 100),
            pc.less_equal(pc.multiply(n_punct, pa.scalar(20, pa.int64())),
                          n_chars)))
        t = t.filter(q)
        fps = [md5_hex(" ".join((x or "").lower().split())[:60])
               for x in t["text"].to_pylist()]
        return pa.table({"fp": pa.array(fps, pa.string())})

    n_dedup = (ds.map_batches(fp, batch_format="pyarrow")
               .groupby("fp").aggregate(Count(alias_name="_n")).count())

    return pa.table({
        "stage_ord": pa.array([0, 1, 2, 3], pa.int64()),
        "stage": pa.array(["all", "lang", "quality", "dedup"], pa.string()),
        "n_docs": pa.array([int(counts["n_all"]), int(counts["n_en"]),
                            int(counts["n_q"]), int(n_dedup)], pa.int64())})


_CURATION_FUNNEL_SQL = r"""
WITH d AS (
  SELECT lang, length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    1, 60)) AS fp
  FROM documents),
q AS (SELECT * FROM d
      WHERE lang = 'en' AND n_chars >= 100 AND 20 * n_punct <= n_chars)
SELECT * FROM (
  SELECT 0 AS stage_ord, 'all' AS stage, COUNT(*) AS n_docs FROM d
  UNION ALL SELECT 1, 'lang', COUNT(*) FROM d WHERE lang = 'en'
  UNION ALL SELECT 2, 'quality', COUNT(*) FROM q
  UNION ALL SELECT 3, 'dedup', COUNT(DISTINCT fp) FROM q)
ORDER BY stage_ord
"""


def events_retention_cohorts(sf_dir: str):
    """W23 — retention-cohort analysis (the product-analytics window
    shape no prior query covered): users cohorted by FIRST-event day,
    counted as retained on each of the next 7 days they were active.
    Output one row per (cohort_day, k∈[0,7]) with the distinct-user
    count; day = epoch-microseconds // 86 400 000 000 in BOTH engines.

    Scale shape: raw events collapse to distinct (user, day) pairs with
    a per-batch Arrow group_by combiner BEFORE the global pair groupby
    (a user's daily event burst costs one shuffled row per batch, not
    per event); the cohort table (one row per user) attaches back via
    ``auto_join``'s size chooser; the final (cohort_day, k) groupby is
    calendar-bounded. n_users needs no DISTINCT — (user, day) pairs are
    unique by construction when counted."""
    from .functions.joins import auto_join

    ev = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def days(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return (pa.table({"user_id": t["user_id"], "day": d})
                .group_by(["user_id", "day"]).aggregate([]))

    pairs = (ev.map_batches(days, batch_format="pyarrow")
             .groupby(["user_id", "day"]).aggregate(Count(alias_name="_n")))
    cohort = (pairs.map_batches(
        lambda t: t.select(["user_id", "day"]), batch_format="pyarrow")
        .groupby("user_id").aggregate(Min("day", alias_name="cohort_day")))
    joined = auto_join(pairs, cohort, left_key="user_id",
                       right_key="user_id", right_cols=["cohort_day"])

    def offs(t: pa.Table) -> pa.Table:
        k = pc.subtract(t["day"], t["cohort_day"])
        t = t.append_column("k", k)
        return (t.filter(pc.less_equal(t["k"], 7))
                .select(["cohort_day", "k"]))

    return (joined.map_batches(offs, batch_format="pyarrow")
            .groupby(["cohort_day", "k"])
            .aggregate(Count(alias_name="n_users"))
            .sort(["cohort_day", "k"]))


_RETENTION_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM pairs GROUP BY 1)
SELECT cohort_day, day - cohort_day AS k,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM pairs JOIN cohort USING (user_id)
WHERE day - cohort_day <= 7
GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_temperature_sample(sf_dir: str):
    """O9 — temperature-balanced mixture sampling (the multi-source
    LLM-corpus mixing primitive, alpha = 0.5): each language group g is
    downsampled at rate (n_min/n_g)^0.5 so head languages shrink toward
    balance while the smallest keeps everything. Deterministic and
    engine-independent: doc d survives iff h(d)² · n_g < n_min · M²
    where h(d) = last-5-hex-digits of md5(doc_id) < M = 16⁵ — an
    EXACT integer inequality equivalent to u < √(n_min/n_g) for
    u = h/M (no float boundary can flip a row; int64-safe for group
    sizes below 2⁴⁰/M² ≈ 8.4M docs — beyond that widen M's type, the
    predicate shape is unchanged). Returns kept count + kept chars per
    lang.

    Scale shape: group sizes come from one tiny groupby (bounded by
    the language inventory) broadcast as a dict; the sample itself is
    one streaming filter pass — no shuffle touches the corpus."""
    import hashlib

    import ray as _ray

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"],
                    rows_per_block=500)
    sizes = {r["lang"]: int(r["n"]) for r in
             ds.groupby("lang").aggregate(Count(alias_name="n"))
             .take_all()}   # bounded: one row per language
    n_min = min(sizes.values())
    rhs = n_min * (16 ** 5) ** 2   # n_min·M², the SQL's right-hand side
    sizes_ref = _ray.put(sizes)

    def samp(t: pa.Table) -> pa.Table:
        szs = _ray.get(sizes_ref)
        hs = np.array([int(hashlib.md5(str(k).encode()).hexdigest()[-5:],
                           16) for k in t["doc_id"].to_pylist()],
                      dtype=np.int64)
        ng = np.array([szs[g] for g in t["lang"].to_pylist()],
                      dtype=np.int64)
        # the SQL's exact integer predicate, product form (no floor)
        keep = pa.array(hs * hs * ng < rhs, pa.bool_())
        t = t.filter(keep)
        return pa.table({
            "lang": t["lang"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())})

    return (ds.map_batches(samp, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(alias_name="n_kept"),
                       Sum("n_chars", alias_name="kept_chars"))
            .sort("lang"))


_TEMP_SAMPLE_SQL = r"""
WITH sizes AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY 1),
mn AS (SELECT MIN(n_g) AS n_min FROM sizes),
d AS (
  SELECT doc_id, lang, length(text) AS n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 28, 5))::BIGINT AS h
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM d JOIN sizes USING (lang) CROSS JOIN mn
WHERE h * h * n_g < n_min * 1099511627776
GROUP BY lang ORDER BY lang
"""


def docs_quality_logreg(sf_dir: str):
    """LLM2 — distributed quality-classifier TRAINING (the fastText-style
    filter-model step of the GPT-3 / LLaMA curation recipes): full-batch
    logistic regression over per-document text features against a
    weak-supervision label (document length ≥ 300 chars — learnable from
    the word-count/word-length features without being given the raw
    length, so convergence is observable), trained with
    ``functions/logreg.py``'s int64 micro-unit gradient partials — one
    streaming pass + k-integer aggregate per iteration, bit-identical to
    the single-process reference loop (refimpl/logreg.py) under ANY
    partitioning. Returns micro-unit weights + training-accuracy counts.
    Rows-only registry entry (iterative training is not SQL)."""
    from .functions.logreg import score_counts, train_logreg

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    rows_per_block=500)

    def featurize(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.float64())
        n_words = pc.cast(pc.count_substring_regex(t["text"], r"\S+"),
                          pa.float64())
        nw = pc.max_element_wise(n_words, pa.scalar(1.0, pa.float64()))
        # FIXED-constant centering/scaling (not data statistics, so the
        # result stays partition- and scale-deterministic): word count
        # centered near the label boundary, mean word length near its
        # corpus-typical value — plain GD then converges in ~30 steps
        x1 = pc.divide(pc.subtract(n_words, pa.scalar(55.0, pa.float64())),
                       pa.scalar(20.0, pa.float64()))
        x2 = pc.subtract(pc.divide(n_chars, nw),
                         pa.scalar(5.4, pa.float64()))
        return pa.table({
            "x0": pa.array([1.0] * len(t), pa.float64()),
            "x1": x1, "x2": x2,
            "y": pc.cast(pc.greater_equal(n_chars, 300.0), pa.int64())})

    feats = ds.map_batches(featurize, batch_format="pyarrow")
    w, _n = train_logreg(feats, 3, iters=30, lr=2.0)
    correct, total = score_counts(feats, w)
    params = [f"w{j}" for j in range(3)] + ["n_correct", "n_total"]
    vals = [int(round(x * 1_000_000)) for x in w] + \
        [correct * 1_000_000, total * 1_000_000]
    return pa.table({"param": pa.array(params, pa.string()),
                     "value_micro": pa.array(vals, pa.int64())})


def events_value_outliers(sf_dir: str):
    """Per-type 3-sigma outlier detection with an EXACT integer predicate
    (the data-quality gate shape: flag anomalous numeric rows per group).

    Pass 1 streams (n, S1=Σv, S2=Σv²) per event_type in integer cents —
    per-batch Arrow group_by combiner, so only a #types-row table ever
    shuffles. The 3σ test (v − S1/n)² > 9·varₚₒₚ multiplies out to
    (n·v − S1)² > 9·(n·S2 − S1²); the right side is computed per group in
    unbounded Python ints (#types scalars on the driver) and isqrt'd —
    for integers a ≥ 0, a² > T ⇔ a > isqrt(T) — so pass 2 is one
    streaming filter whose per-row arithmetic |n·v − S1| stays inside
    int64 (safe while n·v_max < 2⁶³, i.e. ~1.9e14 rows/group at the
    $490 test ceiling; widen to per-row Python ints beyond). DuckDB runs
    the identical algebra in HUGEINT, so equality is exact, no float
    boundary anywhere."""
    import math

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        v = _cents(t["value"])
        return pa.table({
            "event_id": t["event_id"], "event_type": t["event_type"],
            "value_cents": v})

    cents = ev.map_batches(to_cents, batch_format="pyarrow")

    def moments(t: pa.Table) -> pa.Table:
        v = t["value_cents"]
        return pa.table({
            "event_type": t["event_type"], "n1": pa.array([1] * len(t)),
            "s1": v, "s2": pc.multiply(v, v),
        }).group_by("event_type").aggregate(
            [("n1", "sum"), ("s1", "sum"), ("s2", "sum")]).rename_columns(
            ["event_type", "n", "s1", "s2"])

    stats = (cents.map_batches(moments, batch_format="pyarrow")
             .groupby("event_type")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("s1", alias_name="s1"),
                        Sum("s2", alias_name="s2"))
             .take_all())  # ≤ #event_types rows
    thr = {}
    for r in stats:
        n, s1, s2 = int(r["n"]), int(r["s1"]), int(r["s2"])
        t9 = 9 * (n * s2 - s1 * s1)  # exact Python int, ≥ 0
        thr[r["event_type"]] = (n, s1, math.isqrt(t9))
    thr_ref = ray.put(thr)

    def flag(t: pa.Table) -> pa.Table:
        lut = ray.get(thr_ref)
        types = t["event_type"].to_pandas()
        n = types.map({k: v[0] for k, v in lut.items()}).to_numpy(np.int64)
        s1 = types.map({k: v[1] for k, v in lut.items()}).to_numpy(np.int64)
        tt = types.map({k: v[2] for k, v in lut.items()}).to_numpy(np.int64)
        v = t["value_cents"].to_numpy()
        mask = np.abs(n * v - s1) > tt
        return t.filter(pa.array(mask))

    return (cents.map_batches(flag, batch_format="pyarrow")
            .sort("event_id"))


_EVENTS_OUTLIERS_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(value_cents) AS HUGEINT) AS s1,
         SUM(CAST(value_cents AS HUGEINT) * value_cents) AS s2
  FROM v GROUP BY event_type
)
SELECT v.event_id, v.event_type, v.value_cents
FROM v JOIN s USING (event_type)
WHERE (s.n * v.value_cents - s.s1) * (s.n * v.value_cents - s.s1)
      > 9 * (s.n * s.s2 - s.s1 * s.s1)
ORDER BY event_id
"""


def orders_yoy_growth(sf_dir: str):
    """Year-over-year revenue: per-order-year exact-cents sums with the
    previous year's total attached (the LAG-over-aggregate reporting
    shape). The fact table collapses through per-batch (year → cents)
    combiners into one ≤#years-row aggregate; only that calendar-bounded
    table reaches the driver for the shift (first year's prev coalesces
    to 0 so both engines emit non-null int64)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            "cents": _cents(t["o_totalprice"]),
        }).group_by("year").aggregate([("cents", "sum")]).rename_columns(
            ["year", "cents"])

    years = (orders.map_batches(prep, batch_format="pyarrow")
             .groupby("year")
             .aggregate(Sum("cents", alias_name="revenue_cents"))
             .take_all())  # calendar-bounded: one row per order-year
    df = pd.DataFrame(years).sort_values("year").reset_index(drop=True)
    df["prev_revenue_cents"] = (df["revenue_cents"].shift(1)
                                .fillna(0).astype("int64"))
    return pa.Table.from_pandas(df[["year", "revenue_cents",
                                    "prev_revenue_cents"]],
                                preserve_index=False)


_ORDERS_YOY_SQL = """
WITH y AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
  FROM orders GROUP BY 1
)
SELECT year, revenue_cents,
       COALESCE(LAG(revenue_cents) OVER (ORDER BY year), 0)
           AS prev_revenue_cents
FROM y ORDER BY year
"""


def part_graph_sssp(sf_dir: str):
    """Weighted single-source shortest paths over the part co-occurrence
    graph — the Pregel shard actors running the min-plus semiring
    (stages/pregel.py mode="sssp", round 4): edge cost
    max(1, 8 − support), so strongly co-purchased parts sit "closer";
    source = global min node id; returns (node, dist) for every
    reachable node, sorted (dist, node). Edges hash-partition into
    shard-actor memory ONCE; label-correcting rounds exchange only
    per-destination minima of the still-changing frontier. Rows-only:
    the oracle is a pure-Python heapq Dijkstra parity test
    (tests/test_graph_properties.py) — weighted shortest paths in
    recursive SQL enumerate every path length and blow up on cycles."""
    from .stages.pregel import run_propagation

    edges = _part_weighted_edges(sf_dir)
    src = edges.min("u")  # u < v per edge ⇒ global min node appears as u
    return (run_propagation(edges, mode="sssp", src_col="u", dst_col="v",
                            weight_col="w", source=src,
                            num_partitions=_join_parts(sf_dir),
                            max_rounds=500)
            .sort(["dist", "node"]))


_SSSP_EDGE_MEMO: "dict[str, ray.data.Dataset]" = {}


def _part_weighted_edges(sf_dir: str):
    """Dataset(u, v, w) with u < v: the weighted part co-occurrence
    graph shared by sssp / msf — cost max(1, 8 − support), support ≥ 2.
    Memoized materialized per sf_dir."""
    if sf_dir not in _SSSP_EDGE_MEMO:
        counted = _part_cooccur_counts(sf_dir)

        def weighted(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t["n"],
                                          pa.scalar(2, pa.int64())))
            w = pc.max_element_wise(
                pc.subtract(pa.scalar(8, pa.int64()),
                            pc.cast(t["n"], pa.int64())),
                pa.scalar(1, pa.int64()))
            return pa.table({"u": t["pa"], "v": t["pb"], "w": w})

        _SSSP_EDGE_MEMO[sf_dir] = counted.map_batches(
            weighted, batch_format="pyarrow").materialize()
    return _SSSP_EDGE_MEMO[sf_dir]


def part_graph_msf(sf_dir: str):
    """Minimum spanning FOREST census of the weighted part co-occurrence
    graph (same cost model as part_graph_sssp: w = max(1, 8 − support))
    via distributed Borůvka (functions/graphops.py boruvka_msf): per
    round, every component picks its min crossing edge under the strict
    (w, u, v) order, winners contract through connected components, and
    the component count at least halves. Returns one summary row
    (n_nodes, n_components, n_msf_edges, total_weight) — all four are
    tie-invariant (every MSF of a graph has the same total weight, the
    matroid exchange argument), so the row is deterministic even though
    tied weights admit many spanning forests. Rows-only: Kruskal needs
    an inherently sequential union-find over globally sorted edges, so
    the oracle is a pure-Python Kruskal parity test on known + random
    graphs (tests/test_graph_properties.py), not SQL.

    Scale shape: per-round relabels ride auto_join (size-chosen
    broadcast vs shuffle); settled intra-component edges are dropped so
    the working set shrinks monotonically; the contracted winner graph
    (≤ #components edges) runs union-find on the driver below the G2b
    threshold and Pregel min-label shards above it."""
    from .functions.graphops import boruvka_msf

    edges = _part_weighted_edges(sf_dir)
    res = boruvka_msf(edges, u="u", v="v", w="w",
                      num_partitions=_join_parts(sf_dir))
    return pa.table({
        "n_nodes": pa.array([res["n_nodes"]], pa.int64()),
        "n_components": pa.array([res["n_components"]], pa.int64()),
        "n_msf_edges": pa.array([res["n_msf_edges"]], pa.int64()),
        "total_weight": pa.array([res["total_weight"]], pa.int64())})


def kg_predicate_stats(sf_dir: str):
    """Ontology-level KG audit (the per-predicate cardinality report an
    extraction pipeline emits per crawl): for every predicate — edge
    count, total mention support, and exact distinct subject / object
    entity counts. Edge partials ride a per-batch combiner; the distinct
    endpoint counts reuse the two-level pattern on (pred, role, entity)
    triples so the wide shuffle carries distinct triples, never edges.
    Only #preds-row tables reach the driver for the final column
    assembly. Rows-only (golden: independent pandas recomputation over
    the byte-golden-tested edge table, tests/test_flagship.py)."""
    edges = _kg_run(sf_dir)["edges"]

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "pred": t["pred"],
            "e1": pa.array([1] * len(t), pa.int64()),
            "sup": pc.cast(t["n_support"], pa.int64()),
        }).group_by("pred").aggregate(
            [("e1", "sum"), ("sup", "sum")]).rename_columns(
            ["pred", "e", "sup"])

    counts = (edges.map_batches(base, batch_format="pyarrow")
              .groupby("pred")
              .aggregate(Sum("e", alias_name="n_edges"),
                         Sum("sup", alias_name="n_support"))
              .take_all())                    # ≤ #preds rows

    def role_triples(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"pred": t["pred"],
                      "role": pa.array(["s"] * len(t), pa.string()),
                      "ent": t["subj_id"]}),
            pa.table({"pred": t["pred"],
                      "role": pa.array(["o"] * len(t), pa.string()),
                      "ent": t["obj_id"]}),
        ]).group_by(["pred", "role", "ent"]).aggregate([])

    nd = (edges.map_batches(role_triples, batch_format="pyarrow")
          .groupby(["pred", "role", "ent"])
          .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
          .groupby(["pred", "role"])
          .aggregate(Count(alias_name="n"))
          .take_all())                        # ≤ 2·#preds rows
    nd_by = {(r["pred"], r["role"]): int(r["n"]) for r in nd}

    rows = sorted(counts, key=lambda r: r["pred"])
    return pa.table({
        "pred": pa.array([r["pred"] for r in rows], pa.string()),
        "n_edges": pa.array([int(r["n_edges"]) for r in rows], pa.int64()),
        "n_support": pa.array([int(r["n_support"]) for r in rows],
                              pa.int64()),
        "n_subjects": pa.array([nd_by.get((r["pred"], "s"), 0)
                                for r in rows], pa.int64()),
        "n_objects": pa.array([nd_by.get((r["pred"], "o"), 0)
                               for r in rows], pa.int64()),
    })


def media_container_probe(sf_dir: str):
    """Container-metadata extraction over opaque media payloads — the
    triage pass a multimodal corpus pipeline runs before deciding what
    to decode: REAL pure-stdlib ISO-BMFF (MP4) box-tree and MPEG-1
    Layer III frame-header demux (sources/mediacodec.py probe_mp4/
    probe_mp3, round 4; sample DECODE for these codecs stays
    library-blocked and is not claimed). Deterministic stub containers
    (valid box trees / header-valid frames, no payload) → one
    map_batches probe stage → (media_id, container, duration_ms,
    n_units, codec). Rows-only: golden-tested against the probe spec in
    tests/test_mediacodec.py."""
    from .sources.mediacodec import (encode_mp3_stub, encode_mp4_stub,
                                     probe_mp3, probe_mp4)

    n = _n_media(sf_dir)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            payload = encode_mp4_stub(
                [{"handler": "vide", "codec": "avc1", "width": 64 + i,
                  "height": 48, "sample_sizes": [100 + i, 200, 300]}],
                duration_ms=500 + 10 * i)
            rows.append((i, "mp4", payload))
        else:
            payload = encode_mp3_stub(10 + i % 7)
            rows.append((i, "mp3", payload))
    t = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "container": pa.array([r[1] for r in rows], pa.string()),
        "payload": pa.array([r[2] for r in rows], pa.binary()),
    })

    def probe(batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "container": [], "duration_ms": [],
               "n_units": [], "codec": []}
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["container"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind == "mp4":
                info = probe_mp4(payload)
                tr = info["tracks"][0]
                out["duration_ms"].append(info["duration_ms"])
                out["n_units"].append(tr["n_samples"])
                out["codec"].append(tr["codec"])
            else:
                info = probe_mp3(payload)
                out["duration_ms"].append(info["duration_ms"])
                out["n_units"].append(info["frames"])
                out["codec"].append("mp3")
            out["media_id"].append(mid)
            out["container"].append(kind)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "container": pa.array(out["container"], pa.string()),
            "duration_ms": pa.array(out["duration_ms"], pa.int64()),
            "n_units": pa.array(out["n_units"], pa.int64()),
            "codec": pa.array(out["codec"], pa.string()),
        })

    return (ray.data.from_arrow(t)
            .map_batches(probe, batch_format="pyarrow")
            .sort("media_id"))


def pages_domain_stats(sf_dir: str):
    """Per-domain hygiene stats over the Common-Crawl-shaped pages table
    — the FineWeb/CCNet-style per-domain aggregation a web pipeline runs
    before domain-level filtering: host extracted from the url with ONE
    vectorized RE2 kernel, then per-domain page count, English count,
    provided-text count, and total html/text bytes, all exact int64.
    Per-batch Arrow group_by combiners mean only #domains-row partials
    ever shuffle — at web scale the registrable-domain key space is
    millions of rows, never pages. Rows-only: the pages corpus is
    synthesized (not a driver parquet view); the oracle is an exact
    golden recomputed from refimpl.pagegen in
    tests/test_pages_io.py."""
    from .sources.pages import synth_pages

    pages = synth_pages(_n_pages(sf_dir))

    def partial(t: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            t["url"], pattern=r"^https?://([^/]+)/.*$", replacement=r"\1")
        return pa.table({
            "domain": host,
            "n1": pa.array([1] * len(t), pa.int64()),
            "en": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
            "with_text": pc.cast(pc.is_valid(t["text"]), pa.int64()),
            "html_bytes": pc.cast(pc.binary_length(t["html"]), pa.int64()),
            "text_chars": pc.coalesce(
                pc.cast(pc.utf8_length(t["text"]), pa.int64()),
                pa.scalar(0, pa.int64())),
        }).group_by("domain").aggregate(
            [("n1", "sum"), ("en", "sum"), ("with_text", "sum"),
             ("html_bytes", "sum"), ("text_chars", "sum")]
        ).rename_columns(["domain", "n_pages", "n_en", "n_with_text",
                          "html_bytes", "text_chars"])

    return (pages.map_batches(partial, batch_format="pyarrow")
            .groupby("domain")
            .aggregate(Sum("n_pages", alias_name="n_pages"),
                       Sum("n_en", alias_name="n_en"),
                       Sum("n_with_text", alias_name="n_with_text"),
                       Sum("html_bytes", alias_name="html_bytes"),
                       Sum("text_chars", alias_name="text_chars"))
            .sort("domain"))


def events_weekly_active_users(sf_dir: str):
    """ISO-week WAU (the engagement-reporting shape): exact distinct
    users and event totals per calendar week. Raw events collapse to
    (week, user, partial-count) with a per-batch Arrow group_by
    combiner BEFORE the global pair groupby, so the wide shuffle
    carries at most #weeks × #users rows; the per-week rollup then
    reuses the same combiner trick (distinct users = pair-row count,
    events = sum of partials), leaving a calendar-bounded result."""
    ev = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "week": pc.strftime(t["ts"], format="%G-W%V"),
            "user_id": t["user_id"],
            "n1": pa.array([1] * len(t), pa.int64()),
        }).group_by(["week", "user_id"]).aggregate(
            [("n1", "sum")]).rename_columns(["week", "user_id", "n"])

    pairs = (ev.map_batches(prep, batch_format="pyarrow")
             .groupby(["week", "user_id"])
             .aggregate(Sum("n", alias_name="n")))

    def week_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "week": t["week"],
            "u1": pa.array([1] * len(t), pa.int64()),
            "ne": t["n"],
        }).group_by("week").aggregate(
            [("u1", "sum"), ("ne", "sum")]).rename_columns(
            ["week", "au", "ne"])

    return (pairs.map_batches(week_partial, batch_format="pyarrow")
            .groupby("week")
            .aggregate(Sum("au", alias_name="active_users"),
                       Sum("ne", alias_name="n_events"))
            .sort("week"))


_EVENTS_WAU_SQL = """
SELECT strftime(ts, '%G-W%V') AS week,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


_PROFILE_COLS = ["o_custkey", "o_orderkey", "o_orderpriority",
                 "o_orderstatus"]


def orders_profile(sf_dir: str):
    """Per-column data-profiling operator (the schema-audit shape a data
    engine exposes as `df.describe()`/PROFILE): one output row per
    column with row/null/exact-distinct counts and min/max. Pass 1
    streams per-batch typed partials — int64 min/max for numeric
    columns, string min/max for text columns, in SEPARATE typed columns
    so the merge never compares numbers lexicographically — and reduces
    them in one #cols-row groupby. Pass 2 reuses the two-level distinct
    pattern on (column, value-rendered-as-string) pairs (decimal render
    is injective for int64, so pair-distinctness is exact). Only
    #cols-row tables reach the driver, where min/max render to one
    uniform string schema."""
    orders = read_table(sf_dir, "orders", columns=_PROFILE_COLS)
    int_cols = {"o_custkey", "o_orderkey"}

    def partials(t: pa.Table) -> pa.Table:
        rows = {"col_name": [], "n": [], "nulls": [],
                "min_i": [], "max_i": [], "min_s": [], "max_s": []}
        for c in _PROFILE_COLS:
            arr = t[c]
            mm = pc.min_max(arr)
            rows["col_name"].append(c)
            rows["n"].append(len(arr))
            rows["nulls"].append(arr.null_count)
            if c in int_cols:
                rows["min_i"].append(mm["min"].as_py())
                rows["max_i"].append(mm["max"].as_py())
                rows["min_s"].append(None)
                rows["max_s"].append(None)
            else:
                rows["min_i"].append(None)
                rows["max_i"].append(None)
                rows["min_s"].append(mm["min"].as_py())
                rows["max_s"].append(mm["max"].as_py())
        return pa.table({
            "col_name": pa.array(rows["col_name"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "min_i": pa.array(rows["min_i"], pa.int64()),
            "max_i": pa.array(rows["max_i"], pa.int64()),
            "min_s": pa.array(rows["min_s"], pa.string()),
            "max_s": pa.array(rows["max_s"], pa.string()),
        })

    stats = (orders.map_batches(partials, batch_format="pyarrow")
             .groupby("col_name")
             .aggregate(Sum("n", alias_name="n_rows"),
                        Sum("nulls", alias_name="n_null"),
                        Min("min_i", alias_name="min_i"),
                        Max("max_i", alias_name="max_i"),
                        Min("min_s", alias_name="min_s"),
                        Max("max_s", alias_name="max_s"))
             .take_all())                     # ≤ #cols rows

    def distinct_pairs(t: pa.Table) -> pa.Table:
        parts = []
        for c in _PROFILE_COLS:
            vals = pc.drop_null(t[c])
            if c in int_cols:
                vals = pc.cast(vals, pa.string())
            parts.append(pa.table({
                "col_name": pa.array([c] * len(vals), pa.string()),
                "val": pc.cast(vals, pa.string()),
            }).group_by(["col_name", "val"]).aggregate([]))
        return pa.concat_tables(parts)

    # global (column, value) distinct via hash-bucketed drop_duplicates
    # — the pair key is near-unique (every o_orderkey is its own group)
    # and the sort-groupby walked ~300k one-row groups in Python (7 s →
    # ~1 s at sf0.01; the _part_cooccur_counts pathology)
    def pv_bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["col_name", "val"], 16, "_p")

    def pv_count(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["col_name", "val"])
        vc = d.groupby("col_name", sort=False).size() \
            .reset_index(name="nd_part")
        return pa.table({
            "col_name": pa.array(vc["col_name"], pa.string()),
            "nd_part": pa.array(vc["nd_part"].to_numpy(np.int64))})

    nd = (orders.map_batches(distinct_pairs, batch_format="pyarrow")
          .map_batches(pv_bucket, batch_format="pyarrow")
          .groupby("_p").map_groups(pv_count, batch_format="pandas")
          .groupby("col_name")
          .aggregate(Sum("nd_part", alias_name="n_distinct"))
          .take_all())                        # ≤ #cols rows
    nd_by = {r["col_name"]: int(r["n_distinct"]) for r in nd}

    out = {"col_name": [], "n_rows": [], "n_null": [], "n_distinct": [],
           "min_val": [], "max_val": []}
    for r in sorted(stats, key=lambda r: r["col_name"]):
        c = r["col_name"]
        out["col_name"].append(c)
        out["n_rows"].append(int(r["n_rows"]))
        out["n_null"].append(int(r["n_null"]))
        out["n_distinct"].append(nd_by.get(c, 0))
        if c in int_cols:
            out["min_val"].append(str(int(r["min_i"])))
            out["max_val"].append(str(int(r["max_i"])))
        else:
            out["min_val"].append(r["min_s"])
            out["max_val"].append(r["max_s"])
    return pa.table({
        "col_name": pa.array(out["col_name"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_null": pa.array(out["n_null"], pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], pa.int64()),
        "min_val": pa.array(out["min_val"], pa.string()),
        "max_val": pa.array(out["max_val"], pa.string()),
    })


_ORDERS_PROFILE_SQL = """
SELECT * FROM (
  SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
         CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
         CAST(MAX(o_custkey) AS VARCHAR) AS max_val FROM orders
  UNION ALL
  SELECT 'o_orderkey', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
         CAST(MIN(o_orderkey) AS VARCHAR),
         CAST(MAX(o_orderkey) AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
         MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
         MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
) ORDER BY col_name
"""


def docs_bpe_merges(sf_dir: str):
    """LLM4 — distributed BPE tokenizer training (functions/bpe.py): the
    first 8 merge steps learned over the documents corpus. The corpus
    collapses once to the word-frequency table (per-batch value_counts
    combiners — only distinct-word partials shuffle); each merge step is
    one streaming pass over the VOCAB table, never the corpus. Rows-only
    (iterative); the exact oracle is merge-for-merge equality with
    refimpl/bpe.py plus layout invariance (tests/test_new_ops.py)."""
    from .functions.bpe import bpe_train, word_count_table

    docs = read_table(sf_dir, "documents", columns=["text"],
                      rows_per_block=2_000)
    return bpe_train(word_count_table(docs), k=8)


def kg_hits(sf_dir: str):
    """KG3 — HITS hubs/authorities over the materialized KG edge table
    (stages/hits.py — join-free co-partitioned scatter/gather, BOTH
    half-steps fused into one pipelined execution per round because the
    between-step normalization cancels analytically). Rows-only;
    numerics gated vs the dense numpy reference at 1e-9 in
    tests/test_pagerank.py."""
    from .stages.hits import hits

    edges = _kg_run(sf_dir)["edges"].map_batches(
        lambda t: pa.table({"src": t["subj_id"], "dst": t["obj_id"]}),
        batch_format="pyarrow")
    sc = hits(edges, iters=10, num_partitions=8)

    def r6(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "hub6": pc.round(pc.multiply(t["hub"], 1e6), ndigits=2),
            "auth6": pc.round(pc.multiply(t["auth"], 1e6), ndigits=2)})

    return (sc.map_batches(r6, batch_format="pyarrow")
            .sort(["auth6", "hub6", "node"],
                  descending=[True, True, False]).limit(20))


def docs_gopher_rules(sf_dir: str):
    """LLM3 — Gopher-style quality-rule audit (Rae et al. 2021, public):
    the per-rule kill-count report a corpus curator reads before turning
    filters on. Four rules, every predicate exact-integer so no float
    boundary can diverge between engines:

    - r1 word count in [50, 100 000];
    - r2 mean word length in [3, 5]  (``3·wc ≤ ch ≤ 5·wc``);
    - r3 type-token ratio ≥ 0.4     (``10·distinct_words ≥ 4·wc``);
    - r4 ≥ 2 distinct stopwords present (padded-substring membership
      over an 8-word list — identical LIKE predicates in the oracle).

    Output: one row per rule with its fail count, plus the pass-all row.

    Scale shape: ONE streaming pass emits per-batch 0/1 indicator
    columns -> a single global Sum — no shuffle at all; six scalars
    reach the driver. The distinct-word count is vectorized (flatten
    word lists with np.repeat doc indices -> drop_duplicates ->
    bincount), never a Python loop over rows."""
    ds = read_table(sf_dir, "documents", columns=["text"],
                    rows_per_block=2_000)
    stops = ["the", "and", "of", "to", "in", "a", "for", "is"]

    def gates(t: pa.Table) -> pa.Table:
        text = t["text"]
        wc = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        ch = pc.subtract(
            pc.cast(pc.utf8_length(text), pa.int64()),
            pc.cast(pc.count_substring_regex(text, r"\s"), pa.int64()))
        low = pc.utf8_lower(text)
        # distinct lowercased words per doc, vectorized
        words = pc.split_pattern_regex(low, r"\s+")
        lens = np.asarray(words.combine_chunks().value_lengths(),
                          dtype=np.int64)
        flat = words.combine_chunks().flatten().to_pandas()
        idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        pairs = pd.DataFrame({"i": idx, "w": flat})
        pairs = pairs[pairs["w"] != ""].drop_duplicates()
        dw = np.bincount(pairs["i"].to_numpy(), minlength=len(t)) \
            .astype(np.int64)
        dw = pa.array(dw, pa.int64())
        pad = pc.binary_join_element_wise(
            pa.array([" "] * len(t)), low, pa.array([" "] * len(t)), "")
        hits = None
        for w in stops:
            ind = pc.cast(pc.match_substring(pad, f" {w} "), pa.int64())
            hits = ind if hits is None else pc.add(hits, ind)
        wc_np = wc.to_numpy(zero_copy_only=False)
        ch_np = ch.to_numpy(zero_copy_only=False)
        dw_np = dw.to_numpy(zero_copy_only=False)
        h_np = hits.to_numpy(zero_copy_only=False)
        f1 = (wc_np < 50) | (wc_np > 100_000)
        f2 = ~((3 * wc_np <= ch_np) & (ch_np <= 5 * wc_np))
        f3 = 10 * dw_np < 4 * wc_np
        f4 = h_np < 2
        ok = ~(f1 | f2 | f3 | f4)
        return pa.table({
            "f1": pa.array(f1.astype(np.int64)),
            "f2": pa.array(f2.astype(np.int64)),
            "f3": pa.array(f3.astype(np.int64)),
            "f4": pa.array(f4.astype(np.int64)),
            "ok": pa.array(ok.astype(np.int64))})

    agg = ds.map_batches(gates, batch_format="pyarrow").aggregate(
        Sum("f1", alias_name="f1"), Sum("f2", alias_name="f2"),
        Sum("f3", alias_name="f3"), Sum("f4", alias_name="f4"),
        Sum("ok", alias_name="ok"))
    names = ["word_count", "mean_word_len", "type_token_ratio",
             "stopwords", "pass_all"]
    vals = [int(agg["f1"]), int(agg["f2"]), int(agg["f3"]),
            int(agg["f4"]), int(agg["ok"])]
    return pa.table({
        "rule_ord": pa.array(range(5), pa.int64()),
        "rule": pa.array(names, pa.string()),
        "n_docs": pa.array(vals, pa.int64())})


_DOCS_GOPHER_SQL = r"""
WITH d AS (
  SELECT len(regexp_extract_all(text, '\S+')) AS wc,
         length(regexp_replace(text, '\s', '', 'g')) AS ch,
         len(list_distinct(list_filter(
             regexp_extract_all(lower(text), '\S+'), x -> x <> ''))) AS dw,
         (( ' ' || lower(text) || ' ' LIKE '% the %')::INT
          + (' ' || lower(text) || ' ' LIKE '% and %')::INT
          + (' ' || lower(text) || ' ' LIKE '% of %')::INT
          + (' ' || lower(text) || ' ' LIKE '% to %')::INT
          + (' ' || lower(text) || ' ' LIKE '% in %')::INT
          + (' ' || lower(text) || ' ' LIKE '% a %')::INT
          + (' ' || lower(text) || ' ' LIKE '% for %')::INT
          + (' ' || lower(text) || ' ' LIKE '% is %')::INT) AS hits
  FROM documents),
f AS (
  SELECT (wc < 50 OR wc > 100000) AS f1,
         NOT (3 * wc <= ch AND ch <= 5 * wc) AS f2,
         10 * dw < 4 * wc AS f3,
         hits < 2 AS f4
  FROM d)
SELECT * FROM (
  SELECT 0 AS rule_ord, 'word_count' AS rule,
         CAST(SUM(f1::INT) AS BIGINT) AS n_docs FROM f
  UNION ALL SELECT 1, 'mean_word_len', CAST(SUM(f2::INT) AS BIGINT) FROM f
  UNION ALL SELECT 2, 'type_token_ratio',
         CAST(SUM(f3::INT) AS BIGINT) FROM f
  UNION ALL SELECT 3, 'stopwords', CAST(SUM(f4::INT) AS BIGINT) FROM f
  UNION ALL SELECT 4, 'pass_all',
         CAST(SUM((NOT (f1 OR f2 OR f3 OR f4))::INT) AS BIGINT) FROM f)
ORDER BY rule_ord
"""


def orders_overlap_pairs(sf_dir: str):
    """J14 — interval self-overlap join: per customer, pairs of orders
    whose 7-day activity spans [orderdate, orderdate+7d) overlap, i.e.
    |d1 − d2| < 7 days. The interval × interval shape (distinct from J7's
    point-in-range join); Ray Data has no native interval join, so it
    composes as hash-partition by customer + a per-group two-pointer
    sweep over date-sorted orders.

    Scale shape: only (custkey, orderkey, day) shuffles; per-group work
    is vectorized — sort once, np.searchsorted finds each order's
    overlap frontier, np.repeat/concatenate emit the pairs. Per-customer
    group size is naturally bounded (orders per customer), the same
    co-partitioning contract as the window family."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                                pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"], "day": day})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["day", "o_orderkey"], kind="mergesort")
        days = g["day"].to_numpy()
        keys = g["o_orderkey"].to_numpy()
        n = len(g)
        # for each i, js in (i, hi) overlap: days[j] - days[i] < 7
        hi = np.searchsorted(days, days + 7, side="left")
        cnt = hi - np.arange(n) - 1
        if cnt.sum() == 0:
            return pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                                 "k1": pd.Series([], dtype="int64"),
                                 "k2": pd.Series([], dtype="int64")})
        i_idx = np.repeat(np.arange(n), cnt)
        j_idx = np.concatenate(
            [np.arange(i + 1, h) for i, h in enumerate(hi) if h > i + 1])
        a, b = keys[i_idx], keys[j_idx]
        return pd.DataFrame({
            "o_custkey": np.full(len(a), g["o_custkey"].iat[0],
                                 dtype="int64"),
            "k1": np.minimum(a, b), "k2": np.maximum(a, b)})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("o_custkey")
            .map_groups(pairs, batch_format="pandas")
            .sort(["o_custkey", "k1", "k2"]))


_ORDERS_OVERLAP_SQL = """
SELECT a.o_custkey,
       LEAST(a.o_orderkey, b.o_orderkey) AS k1,
       GREATEST(a.o_orderkey, b.o_orderkey) AS k2
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND abs(datediff('day', a.o_orderdate, b.o_orderdate)) < 7
ORDER BY a.o_custkey, k1, k2
"""


def part_graph_assortativity(sf_dir: str):
    """G37 — degree assortativity of the part co-occurrence graph
    (Newman 2002, public): the Pearson correlation of endpoint degrees
    over all DIRECTED edge slots (each undirected edge counted both
    ways, so the marginals are symmetric and the correlation reduces to
    ``(n·Sxy − Sx²) / (n·Sxx − Sx²)`` — a single float division of two
    EXACT int64 sums, bit-equal in both engines).

    Scale shape: degrees via the endpoints groupby; each degree attaches
    to the edge table through ``auto_join``'s size chooser (broadcast at
    driver scale, hash join at web scale); the moments collapse through
    per-batch combiners to ONE row."""
    from .functions.joins import auto_join

    edges = _part_strong_edges(sf_dir)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables([pa.table({"node": t["u"]}),
                                 pa.table({"node": t["v"]})])

    deg = (edges.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg")))

    both = edges.map_batches(
        lambda t: pa.concat_tables([
            pa.table({"x": t["u"], "y": t["v"]}),
            pa.table({"x": t["v"], "y": t["u"]})]),
        batch_format="pyarrow")
    withx = auto_join(both, deg, left_key="x", right_key="node",
                      right_cols=["deg"]).map_batches(
        lambda t: pa.table({"dx": t["deg"], "y": t["y"]}),
        batch_format="pyarrow")
    withy = auto_join(withx, deg, left_key="y", right_key="node",
                      right_cols=["deg"])

    def moments(t: pa.Table) -> pa.Table:
        dx = t["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        dy = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "sx": pa.array([int(dx.sum())], pa.int64()),
            "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
            "sxy": pa.array([int((dx * dy).sum())], pa.int64())})

    m = withy.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sxx", alias_name="sxx"), Sum("sxy", alias_name="sxy"))
    n, sx = int(m["n"] or 0), int(m["sx"] or 0)
    sxx, sxy = int(m["sxx"] or 0), int(m["sxy"] or 0)
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = float(num) / float(den) if den else 0.0
    return pa.table({
        "n_ends": pa.array([n], pa.int64()),
        "sum_deg": pa.array([sx], pa.int64()),
        "sum_deg2": pa.array([sxx], pa.int64()),
        "sum_prod": pa.array([sxy], pa.int64()),
        "assort": pa.array([r], pa.float64())})


_PART_ASSORT_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1),
slots AS (SELECT du.deg AS dx, dv.deg AS dy
          FROM (SELECT u AS x, v AS y FROM e
                UNION ALL SELECT v, u FROM e) s
          JOIN deg du ON du.node = s.x JOIN deg dv ON dv.node = s.y),
m AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(dx) AS BIGINT) sx,
             CAST(SUM(dx * dx) AS BIGINT) sxx,
             CAST(SUM(dx * dy) AS BIGINT) sxy
      FROM slots)
SELECT n AS n_ends, sx AS sum_deg, sxx AS sum_deg2, sxy AS sum_prod,
       CAST(n * sxy - sx * sx AS DOUBLE)
       / CAST(n * sxx - sx * sx AS DOUBLE) AS assort
FROM m
"""


def nation_top3_customers(sf_dir: str):
    """G38 — ordered string aggregation (STRING_AGG ... ORDER BY): per
    nation, the comma-joined names of its top-3 customers by account
    balance (cents-exact ordering, custkey tiebreak). The list-valued
    reporting shape (collect_list with ordering) no prior query covered.

    Scale shape: only (nationkey, custkey, name, cents) shuffles; the
    per-nation top-3 is a hash-partitioned map_groups whose group size
    is bounded by the partial top-3 pre-combiner — each batch first
    keeps its local top-3 per nation, so no group ever exceeds
    3 × #blocks rows regardless of customer skew."""
    ds = read_table(sf_dir, "customer",
                    columns=["c_custkey", "c_name", "c_nationkey",
                             "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({
            "c_nationkey": t["c_nationkey"],
            "cents": _cents(t["c_acctbal"]),
            "c_custkey": t["c_custkey"],
            "c_name": t["c_name"]})
        # local top-3 per nation: bound the shuffle + group size
        df = out.to_pandas().sort_values(
            ["c_nationkey", "cents", "c_custkey"],
            ascending=[True, False, True], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("c_nationkey").head(3),
                                    preserve_index=False)

    def top3(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cents", "c_custkey"],
                          ascending=[False, True], kind="mergesort").head(3)
        return pa.table({
            "c_nationkey": pa.array([int(g["c_nationkey"].iat[0])],
                                    pa.int64()),
            "top_names": pa.array([",".join(g["c_name"].tolist())],
                                  pa.string()),
            "n_top": pa.array([len(g)], pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("c_nationkey")
            .map_groups(top3, batch_format="pandas")
            .sort("c_nationkey"))


_NATION_TOP3_SQL = """
WITH r AS (
  SELECT c_nationkey, c_name,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC,
                    c_custkey) AS rn,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents, c_custkey
  FROM customer)
SELECT c_nationkey,
       STRING_AGG(c_name, ',' ORDER BY cents DESC, c_custkey) AS top_names,
       CAST(COUNT(*) AS BIGINT) AS n_top
FROM r WHERE rn <= 3
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def kg_ppr(sf_dir: str):
    """KG4 — personalized PageRank (random walk with restart) from the
    lexicographically-first KG entity: the "related entities" query a
    KG serves per-entity at runtime. stages/pagerank.py with a seeded
    teleport vector — restart and dangling mass land only on the seed,
    mass stays in the seed's reachable component. Rows-only; numerics
    gated vs the dense numpy PPR reference in tests/test_pagerank.py."""
    from ray.data.aggregate import Min as _Min

    from .stages.pagerank import pagerank

    edges = _kg_run(sf_dir)["edges"].map_batches(
        lambda t: pa.table({"src": t["subj_id"], "dst": t["obj_id"]}),
        batch_format="pyarrow")
    seed = edges.aggregate(_Min("src"))["min(src)"]
    pr = pagerank(edges, max_iters=10, tol=1e-9, num_partitions=8,
                  seeds=[seed])

    def r6(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "rank6": pc.round(pc.multiply(
                             t["rank"], 1e6), ndigits=2)})

    return (pr.map_batches(r6, batch_format="pyarrow")
            .filter(lambda r: r["rank6"] > 0)
            .sort(["rank6", "node"], descending=[True, False]).limit(15))


def docs_source_mix_weights(sf_dir: str):
    """LLM5 — mixture-weight computation for multi-source training
    (the data-recipe step behind every "sampling weights" table in LLM
    papers): per source, doc and token counts plus the uniform-target
    resampling weight ``w = total_tokens / (n_sources · src_tokens)``
    that would equalize the token budget across sources. The weight is
    emitted in EXACT micro-units via integer floor division — no float
    crosses the oracle.

    Scale shape: one streaming pass of per-batch (source → docs,
    tokens) combiners, one ≤#sources-row groupby; the weight math runs
    on the driver over #sources rows."""
    ds = read_table(sf_dir, "documents", columns=["source", "text"],
                    rows_per_block=2_000)

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.count_substring_regex(
            pc.utf8_lower(t["text"]), r"[a-z0-9]+"), pa.int64())
        return (pa.table({"source": t["source"], "toks": toks})
                .group_by("source")
                .aggregate([("toks", "sum"), ("toks", "count")])
                .rename_columns(["source", "toks", "docs"]))

    per_src = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("source")
               .aggregate(Sum("docs", alias_name="n_docs"),
                          Sum("toks", alias_name="n_tokens"))
               .take_all())                        # ≤ #sources rows
    total = sum(int(r["n_tokens"]) for r in per_src)
    S = len(per_src)
    rows = sorted(per_src, key=lambda r: r["source"])
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_docs": pa.array([int(r["n_docs"]) for r in rows], pa.int64()),
        "n_tokens": pa.array([int(r["n_tokens"]) for r in rows],
                             pa.int64()),
        "weight_u": pa.array(
            [(1_000_000 * total) // (S * int(r["n_tokens"]))
             for r in rows], pa.int64())})


_DOCS_MIX_SQL = """
WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(len(regexp_extract_all(lower(text),
                                                  '[a-z0-9]+')))
                       AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS ns FROM s)
SELECT source, n_docs, n_tokens,
       (1000000 * t.total) // (t.ns * n_tokens) AS weight_u
FROM s, t ORDER BY source
"""


def docs_ppl_buckets(sf_dir: str, vocab_limit: int = 500_000):
    """LLM6 — CCNet-style perplexity bucketing (Wenzek et al. 2020,
    public): every doc scored by the SAME self-trained unigram NLL as
    ``docs_unigram_nll`` (micro-unit integer contract), then assigned
    head / middle / tail by fixed nll_u thresholds and aggregated to
    per-bucket doc and token counts — the triage table a curator uses
    to pick which perplexity band to keep.

    Scale shape: pass 1 builds the (term, n) LM with per-batch Counter
    combiners; pass 2 scores + buckets per batch and only ≤3 partial
    rows per batch enter the final groupby. Empty-token docs drop in
    both engines (no tok rows in the oracle join). The broadcast LM
    carries the SAME ``vocab_limit`` cap + OOV bucket as
    docs_unigram_nll — exact below the cap (the oracle regime),
    bounded driver memory above it (capped path golden-tested in
    tests/test_new_ops.py)."""
    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2_000)

    def pairs(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: "Counter[str]" = Counter()
        for txt in t["text"].to_pylist():
            c.update(_TERM_RE.findall((txt or "").lower()))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    freq_ds = (docs.map_batches(pairs, batch_format="pyarrow")
               .groupby("term").aggregate(Sum("n", alias_name="n"))
               .materialize())
    vocab_size = freq_ds.count()
    total = int(freq_ds.sum("n"))
    if vocab_size <= vocab_limit:
        freqs = freq_ds.to_pandas()          # bounded by vocab_limit
        oov_lp = None                        # exact: every term in-vocab
    else:
        freqs = (freq_ds.sort(["n", "term"], descending=[True, False])
                 .limit(vocab_limit).to_pandas())
        oov_mass = total - int(freqs["n"].sum())
        oov_lp = float(np.log(oov_mass) - np.log(total))
    lp = {t: float(np.log(n) - np.log(total))
          for t, n in zip(freqs["term"], freqs["n"])}
    lp_ref = ray.put(lp)

    HEAD, MID = 3_400_000, 3_404_000

    def bucketize(t: pa.Table) -> pa.Table:
        m = ray.get(lp_ref)
        counts = {"head": [0, 0], "middle": [0, 0], "tail": [0, 0]}
        for txt in t["text"].to_pylist():
            toks = _TERM_RE.findall((txt or "").lower())
            if not toks:
                continue
            if oov_lp is None:
                s = -sum(m[tok] for tok in toks) / len(toks)
            else:
                s = -sum(m.get(tok, oov_lp) for tok in toks) / len(toks)
            nll_u = round(s * 1e6)
            b = ("head" if nll_u < HEAD
                 else "middle" if nll_u < MID else "tail")
            counts[b][0] += 1
            counts[b][1] += len(toks)
        return pa.table({
            "bucket": pa.array(list(counts), pa.string()),
            "n_docs": pa.array([v[0] for v in counts.values()],
                               pa.int64()),
            "n_tokens": pa.array([v[1] for v in counts.values()],
                                 pa.int64())})

    return (docs.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"))
            # the oracle only emits non-empty buckets
            .filter(expr="n_docs > 0")
            .sort("bucket"))


_DOCS_PPL_BUCKETS_SQL = """
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                        AS term
             FROM documents),
f AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM f),
sc AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS dl,
              CAST(round(AVG(-(ln(f.n) - ln(tot.total))) * 1000000)
                   AS BIGINT) AS nll_u
       FROM tok t JOIN f USING (term), tot
       GROUP BY t.doc_id)
SELECT CASE WHEN nll_u < 3400000 THEN 'head'
            WHEN nll_u < 3404000 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dl) AS BIGINT) AS n_tokens
FROM sc GROUP BY bucket ORDER BY bucket
"""


def emb_knn_lsh(sf_dir: str):
    """V6 — approximate ANN via random-hyperplane LSH
    (functions/similarity.py ``knn_lsh``): the bucketed scale path next
    to IVF — seeded hyperplanes broadcast once, candidate filter is one
    vectorized signature matmul + np.isin per batch (streaming, no
    index build), exact cosine ranks the survivors. Rows-only; recall
    vs brute force + layout determinism in tests/test_similarity.py.
    Short codes / more tables here because the synthetic embeddings are
    weakly clustered (neighbor cosine ~0.35)."""
    from .functions.similarity import knn_lsh
    from .sources.tables import fetch_value

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                    rows_per_block=2_000)
    q = np.array(fetch_value(sf_dir, "embeddings", key_col="vec_id",
                             key=0, value_col="embedding"),
                 dtype=np.float32)
    return knn_lsh(ds, q[None, :], k=10, num_bits=4, num_tables=6)


def docs_bpe_tokens(sf_dir: str):
    """LLM4b — the ENCODE side of the BPE tokenizer: apply the 8 learned
    merges back to the corpus and report the top-20 resulting token
    types by occurrence count (count desc, token asc). Both passes run
    over the vocab table, never the corpus (functions/bpe.py
    ``bpe_apply``). Rows-only; exact oracle = refimpl.bpe.encode_counts
    equality in tests/test_new_ops.py."""
    from .functions.bpe import bpe_apply, bpe_train, word_count_table

    docs = read_table(sf_dir, "documents", columns=["text"],
                      rows_per_block=2_000)
    vocab = word_count_table(docs).materialize()
    merges = bpe_train(vocab, k=8)
    pairs = list(zip(merges["left"].to_pylist(),
                     merges["right"].to_pylist()))
    return (bpe_apply(vocab, pairs)
            .sort(["n", "sym"], descending=[True, False]).limit(20))


def events_user_rolling_median(sf_dir: str):
    """W26 — rolling MEDIAN over ROWS 2 PRECEDING per user: the
    order-statistic window (rolling sum/avg are linear; a median is
    not, so it exercises the per-partition sort path). Values go
    through the integer-cents contract; a 2-row window's half-sum is
    exact in float64, so both engines emit identical doubles.

    Scale shape: one hash shuffle on user_id, then a partition-local
    pandas rolling(3).median over each hash bucket (same partition-
    level map_groups contract as the rest of the window family —
    functions/window.py ``rolling_median``)."""
    from .functions.window import rolling_median

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    cents = ds.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "ts": t["ts"], "cents": _cents(t["value"])}),
        batch_format="pyarrow")
    out = rolling_median(cents, "cents", keys=["user_id"],
                         order_by=["ts", "event_id"], window=3,
                         out_col="med3")
    return (out.map_batches(
        lambda t: t.select(["user_id", "event_id", "med3"]),
        batch_format="pyarrow")
        .sort(["user_id", "event_id"]))


_EVENTS_ROLLMED_SQL = """
SELECT user_id, event_id,
       CAST(median(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS med3
FROM (SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS c FROM events)
ORDER BY user_id, event_id
"""


def docs_arrow_ipc_roundtrip(sf_dir: str):
    """S9 — Arrow IPC (Feather v2) source/sink: documents → one IPC
    stream file per block under /tmp → ``read_binary_files`` +
    per-batch ``pa.ipc.open_stream`` decode → aggregate. Arrow IPC is
    THE zero-copy interchange format between Ray Data stages and
    external Arrow tooling; the oracle runs on the original parquet
    view, so count+checksum equality proves the round-trip lossless."""
    import os
    import shutil
    import uuid

    out_dir = (f"/tmp/ies_ipc_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_ipc(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrows")
        with open(path, "wb") as f:
            with pa.ipc.new_stream(f, t.schema) as w:
                w.write_table(t)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    # consume the writer fully (side-effect sink), then read back
    read_table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]) \
        .map_batches(write_ipc, batch_format="pyarrow").sum("n")

    def read_ipc(t: pa.Table) -> pa.Table:
        tables = []
        for raw in t["bytes"].to_pylist():
            with pa.ipc.open_stream(pa.BufferReader(raw)) as r:
                tables.append(r.read_all())
        return pa.concat_tables(tables)

    back = (ray.data.read_binary_files(out_dir)
            .map_batches(read_ipc, batch_format="pyarrow"))
    return (back.groupby("lang")
            .aggregate(Count(alias_name="n"),
                       Sum("doc_id", alias_name="sum_doc_id"),
                       Sum("n_chars", alias_name="sum_chars"))
            .sort("lang"))


_DOCS_IPC_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def kg_ntriples(sf_dir: str):
    """KG5 — RDF N-Triples export formatting (W3C N-Triples, public):
    every KG edge rendered as its canonical
    ``<urn:g:SUBJ> <urn:g:p:PRED> <urn:g:OBJ> .`` line — the
    interchange serialization that makes the KG loadable by any triple
    store. Pure per-batch vectorized string concat (one
    binary_join_element_wise kernel); the top-50 lines by (line) order
    return as the sample. Rows-only; format golden + full-cover count
    in tests/test_flagship.py."""
    edges = _kg_run(sf_dir)["edges"]

    def fmt(t: pa.Table) -> pa.Table:
        n = len(t)
        line = pc.binary_join_element_wise(
            pa.array(["<urn:g:"] * n), t["subj_id"],
            pa.array(["> <urn:g:p:"] * n), t["pred"],
            pa.array(["> <urn:g:"] * n), t["obj_id"],
            pa.array(["> ."] * n), "")
        return pa.table({"line": line})

    return (edges.map_batches(fmt, batch_format="pyarrow")
            .sort("line").limit(50))


def kg_twohop_patterns(sf_dir: str):
    """KG6 — 2-hop path pattern census: counts of (pred₁ → pred₂) chains
    ``a --p1--> b --p2--> c`` over the KG — the ontology-path statistic
    that drives join-order and rule-mining decisions in KG systems.
    Self-join on the SHARED middle entity via ``auto_join``'s size
    chooser (broadcast at driver scale, co-partitioned hash join above
    — the same wedge frontier the SQL self-join pays), then a
    #pred²-bounded groupby. Rows-only (KG tables aren't DuckDB views);
    golden = independent pandas recomputation in tests/test_flagship.py."""
    from .functions.joins import auto_join

    edges = _kg_run(sf_dir)["edges"]
    left = edges.map_batches(
        lambda t: pa.table({"mid": t["obj_id"], "p1": t["pred"]}),
        batch_format="pyarrow")
    right = edges.map_batches(
        lambda t: pa.table({"mid2": t["subj_id"], "p2": t["pred"]}),
        batch_format="pyarrow")
    paths = auto_join(left, right, left_key="mid", right_key="mid2",
                      right_cols=["p2"])
    return (paths.groupby(["p1", "p2"])
            .aggregate(Count(alias_name="n_paths"))
            .sort(["n_paths", "p1", "p2"], descending=[True, False, False])
            .limit(25))


def events_active_7d(sf_dir: str):
    """W27 — trailing-7-day active users per day (the rolling DISTINCT
    the WAU/retention family didn't cover: a distinct count over a
    SLIDING window can't ride a running sum). For every day with ≥1
    event, the count of distinct users active in [d−6, d].

    Scale shape: raw events collapse to distinct (user, day) with a
    per-batch Arrow combiner; each pair explodes to its ≤7 covering
    window-days via np.repeat (skinny int rows); a semi join against
    the observed-days table prunes phantom windows (threshold chooser —
    broadcast at calendar scale, shuffle above); the two-level distinct
    on (window_day, user) then one Count per day. Nothing user- or
    event-sized reaches the driver."""
    from .functions.joins import auto_semi_join

    ev = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def days(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return (pa.table({"user_id": t["user_id"], "day": d})
                .group_by(["user_id", "day"]).aggregate([]))

    pairs = (ev.map_batches(days, batch_format="pyarrow")
             .groupby(["user_id", "day"]).aggregate(Count(alias_name="_n"))
             .select_columns(["user_id", "day"]).materialize())
    obs_days = (pairs.map_batches(
        lambda t: pa.table({"day": t["day"]}), batch_format="pyarrow")
        .groupby("day").aggregate(Count(alias_name="_n"))
        .select_columns(["day"]))

    def explode(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = t["day"].to_numpy(zero_copy_only=False)
        wd = (np.repeat(d, 7)
              + np.tile(np.arange(7, dtype=np.int64), len(d)))
        return pa.table({"user_id": pa.array(np.repeat(u, 7)),
                         "wd": pa.array(wd, pa.int64())})

    windows = pairs.map_batches(explode, batch_format="pyarrow")
    kept = auto_semi_join(windows, obs_days, left_key="wd",
                          right_key="day")
    return (kept.groupby(["wd", "user_id"])
            .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow")
            .groupby("wd").aggregate(Count(alias_name="n_users"))
            .rename_columns({"wd": "day"})
            .sort("day"))


_EVENTS_ACTIVE7_SQL = """
WITH du AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d FROM events),
days AS (SELECT DISTINCT d FROM du)
SELECT days.d AS day,
       CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_users
FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d ORDER BY day
"""


def orders_price_gini(sf_dir: str):
    """G39 — Gini coefficient of order values (the inequality /
    concentration measure a corpus- or revenue-audit reports): with
    cents ranked ascending by the unique (cents, orderkey) order,
    ``G = (2·Σ rᵢxᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)``. All three sums are
    EXACT int64 (per-batch partials); the final Gini is one float
    division of two exact ints — bit-equal across engines. int64 holds
    Σ r·x to ~sf100 for this table; beyond that the oracle's HUGEINT
    path marks where a 128-bit accumulator would be swapped in.

    Scale shape: the global rank reuses functions/rank.py's
    range-partitioned two-pass (driver holds samples/counts only);
    the moment sums collapse through per-batch combiners to ONE row."""
    from .functions.rank import global_row_number

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "cents": _cents(t["o_totalprice"])})

    ranked = global_row_number(
        orders.map_batches(prep, batch_format="pyarrow"),
        order_by=["cents", "o_orderkey"],
        descending=[False, False], out_col="r")

    def moments(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "srx": pa.array([int((r * x).sum())], pa.int64())})

    m = ranked.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("srx", alias_name="srx"))
    n, sx, srx = int(m["n"] or 0), int(m["sx"] or 0), int(m["srx"] or 0)
    num = 2 * srx - (n + 1) * sx
    den = n * sx
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "sum_cents": pa.array([sx], pa.int64()),
        "sum_rank_cents": pa.array([srx], pa.int64()),
        "gini": pa.array([float(num) / float(den) if den else 0.0],
                         pa.float64())})


_ORDERS_GINI_SQL = """
WITH r AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
                  ROW_NUMBER() OVER (
                    ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                             o_orderkey) AS rk
           FROM orders),
m AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(x) AS BIGINT) sx,
             CAST(SUM(rk * x) AS BIGINT) srx FROM r)
SELECT n AS n_orders, sx AS sum_cents, srx AS sum_rank_cents,
       CAST(2 * srx - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE)
         AS gini
FROM m
"""


def events_value_winsorized(sf_dir: str):
    """G40 — winsorized robust aggregate: per event type, the sum/count
    of values CLIPPED to the global [P05, P95] (discrete quantiles over
    cents — the robust-statistics gate that keeps a corrupt feed's
    outliers from dominating a revenue or metric rollup).

    Scale shape: pass 1 = the exact distributed quantile plan
    (functions/quantiles.py value-histogram — one row per DISTINCT cent
    value shuffles); the two clip bounds are driver scalars; pass 2 =
    one streaming clip + per-type combiner. Integer cents throughout —
    no float crosses the oracle."""
    from .functions.quantiles import exact_quantiles

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    cents = ev.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "cents": _cents(t["value"])}),
        batch_format="pyarrow")
    qdf = exact_quantiles(cents, "cents", [0.05, 0.95])
    lo, hi = int(qdf["value"].iloc[0]), int(qdf["value"].iloc[1])

    def clip(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "w": pa.array(np.clip(c, lo, hi), pa.int64()),
            "n_lo": pa.array((c < lo).astype(np.int64)),
            "n_hi": pa.array((c > hi).astype(np.int64))})

    return (cents.map_batches(clip, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("w", alias_name="winsorized_cents"),
                       Count(alias_name="n"),
                       Sum("n_lo", alias_name="n_clipped_lo"),
                       Sum("n_hi", alias_name="n_clipped_hi"))
            .sort("event_type"))


_EVENTS_WINSOR_SQL = """
WITH c AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
b AS (SELECT quantile_disc(cents, 0.05) AS lo,
             quantile_disc(cents, 0.95) AS hi FROM c)
SELECT event_type,
       CAST(SUM(LEAST(GREATEST(cents, b.lo), b.hi)) AS BIGINT)
         AS winsorized_cents,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM((cents < b.lo)::INT) AS BIGINT) AS n_clipped_lo,
       CAST(SUM((cents > b.hi)::INT) AS BIGINT) AS n_clipped_hi
FROM c, b GROUP BY event_type ORDER BY event_type
"""


def orders_autocorr_lag1(sf_dir: str):
    """TS1 — lag-1 autocorrelation of the daily order-count series (the
    time-series seasonality probe a metrics pipeline runs before picking
    forecast features): Pearson r between day t and day t+1 counts over
    consecutive calendar days. All five moments are EXACT int64 sums;
    r = num / sqrt(a·b) with the sqrt taken over the exact integer
    product once in both engines — bit-equal doubles.

    Scale shape: the fact table collapses through per-batch (day →
    count) combiners to a calendar-bounded series; only that reaches
    the driver for the lag pairing (≤ #days rows)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderdate"])

    def days(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(pc.cast(t["o_orderdate"],
                                      pa.timestamp("us")), pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return (pa.table({"day": d})
                .group_by("day").aggregate([([], "count_all")])
                .rename_columns(["day", "n"]))

    daily = (orders.map_batches(days, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n"))
             .take_all())                    # calendar-bounded
    s = sorted(daily, key=lambda r: r["day"])
    import math as _math
    xs, ys = [], []
    for a, b in zip(s, s[1:]):
        if b["day"] == a["day"] + 1:        # consecutive days only
            xs.append(int(a["n"]))
            ys.append(int(b["n"]))
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    num = n * sxy - sx * sy
    da, db = n * sxx - sx * sx, n * syy - sy * sy
    r = float(num) / _math.sqrt(float(da * db)) if da * db > 0 else 0.0
    return pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        "sum_x": pa.array([sx], pa.int64()),
        "sum_xy": pa.array([sxy], pa.int64()),
        "autocorr": pa.array([r], pa.float64())})


_ORDERS_AUTOCORR_SQL = """
WITH daily AS (SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP))
                        // 86400000000 AS day,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM orders GROUP BY 1),
pairs AS (SELECT a.n AS x, b.n AS y
          FROM daily a JOIN daily b ON b.day = a.day + 1),
m AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(x) AS BIGINT) sx,
             CAST(SUM(y) AS BIGINT) sy, CAST(SUM(x * x) AS BIGINT) sxx,
             CAST(SUM(y * y) AS BIGINT) syy,
             CAST(SUM(x * y) AS BIGINT) sxy
      FROM pairs)
SELECT n AS n_pairs, sx AS sum_x, sxy AS sum_xy,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
                     AS DOUBLE)) AS autocorr
FROM m
"""


def events_type_entropy(sf_dir: str):
    """G41 — Shannon entropy (bits) of the event-type distribution: the
    class-balance diagnostic a curation pipeline reports before
    stratified sampling. H = log2(N) − Σ nᵢ·log2(nᵢ) / N over EXACT
    int64 per-type counts; the only float work is k ≤ #types log terms
    summed driver-side in sorted-type order, rounded to 4 dp (the house
    precedent for order-dependent float sums).

    Scale shape: the fact table collapses through the per-type count
    combiner; only #types rows reach the driver."""
    import math as _math

    counts = (read_table(sf_dir, "events", columns=["event_type"])
              .groupby("event_type").aggregate(Count(alias_name="n"))
              .take_all())                    # ≤ #types rows
    counts.sort(key=lambda r: r["event_type"])
    ns = [int(r["n"]) for r in counts]
    total = sum(ns)
    ent = (_math.log2(total)
           - sum(n * _math.log2(n) for n in ns) / total) if total else 0.0
    return pa.table({
        "n_types": pa.array([len(ns)], pa.int64()),
        "n_total": pa.array([total], pa.int64()),
        "entropy_bits": pa.array([round(ent, 4)], pa.float64())})


_EVENTS_ENTROPY_SQL = """
WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(n) AS BIGINT) AS n_total,
       ROUND(log2(CAST(SUM(n) AS DOUBLE))
             - SUM(n * log2(CAST(n AS DOUBLE))) / SUM(n), 4)
         AS entropy_bits
FROM c
"""


def orders_price_theil(sf_dir: str):
    """G42 — Theil T inequality index of order values: the
    entropy-family concentration measure that (unlike [[orders_price_gini]])
    decomposes additively across subgroups. T = Σ x·ln(x) / Σx −
    ln(Σx / n) over integer cents; Σx and n are EXACT int64, the single
    float moment Σ x·ln(x) flows through per-batch partials and one
    float Sum, and the result is rounded to 4 dp to absorb summation
    order.

    Scale shape: three per-batch combiner rows per batch, one global
    reduce — nothing data-sized moves."""
    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def moments(t: pa.Table) -> pa.Table:
        x = _cents(t["o_totalprice"]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sxl": pa.array([float((x * np.log(x)).sum())], pa.float64())})

    m = orders.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sxl", alias_name="sxl"))
    import math as _math
    n, sx, sxl = int(m["n"] or 0), int(m["sx"] or 0), float(m["sxl"] or 0.0)
    theil = (sxl / sx - _math.log(sx / n)) if n and sx else 0.0
    return pa.table({
        "n_orders": pa.array([n], pa.int64()),
        "sum_cents": pa.array([sx], pa.int64()),
        "theil": pa.array([round(theil, 4)], pa.float64())})


_ORDERS_THEIL_SQL = """
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
           FROM orders),
m AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(x) AS BIGINT) sx,
             SUM(x * ln(CAST(x AS DOUBLE))) sxl
      FROM c)
SELECT n AS n_orders, sx AS sum_cents,
       ROUND(sxl / sx - ln(CAST(sx AS DOUBLE) / n), 4) AS theil
FROM m
"""


def _grouped_median_by_type(ds, col: str, out_col: str):
    """Exact grouped median over ``event_type`` (quantile_disc
    semantics, v[⌈0.5n⌉−1] on the sorted values): the hash-partitioned
    map_groups grouped-quantile plan — one vectorized sort per key
    partition, nothing event-sized on the driver. Shared by
    [[events_value_mad]] and [[events_robust_outliers]]."""
    import math as _math

    from .functions.arrowutil import to_arrow

    def prep(t: pa.Table) -> pa.Table:
        part_ids = pd.util.hash_pandas_object(
            pd.Series(t["event_type"].to_pandas()), index=False) % 8
        return t.append_column(
            "part", pa.array(part_ids.to_numpy(), pa.int64()))

    out_schema = pa.schema([("event_type", pa.string()),
                            (out_col, pa.int64())])

    def med(g: pd.DataFrame) -> pa.Table:
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            v = np.sort(grp[col].to_numpy())
            rows.append({"event_type": et, out_col: int(
                v[max(1, _math.ceil(0.5 * len(v))) - 1])})
        return to_arrow(pd.DataFrame(rows), out_schema)

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(med, batch_format="pandas"))


def events_value_mad(sf_dir: str):
    """G43 — median absolute deviation per event type: the robust
    dispersion partner to [[events_value_winsorized]]'s robust location.
    Two exact grouped-median passes over integer cents (quantile_disc
    semantics, v[⌈0.5n⌉−1] on the sorted values): pass 1 yields each
    type's median, pass 2 the median of |cents − median|. Integers
    end-to-end — no float crosses the oracle.

    Scale shape: both passes reuse the hash-partitioned map_groups
    grouped-quantile plan (one vectorized sort per key partition); the
    ≤ #types medians dict is the only driver hop between passes."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    cents = ev.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                             pa.int64())}),
        batch_format="pyarrow").materialize()

    med_rows = _grouped_median_by_type(cents, "cents",
                                       "median_cents").take_all()
    meds = {r["event_type"]: int(r["median_cents"]) for r in med_rows}
    meds_ref = ray.put(meds)                 # ≤ #types entries

    def absdev(t: pa.Table) -> pa.Table:
        m = ray.get(meds_ref)
        et = t["event_type"].to_pylist()
        c = t["cents"].to_numpy(zero_copy_only=False)
        med = np.fromiter((m[e] for e in et), dtype=np.int64, count=len(et))
        return pa.table({"event_type": t["event_type"],
                         "dev": pa.array(np.abs(c - med), pa.int64())})

    mad = _grouped_median_by_type(
        cents.map_batches(absdev, batch_format="pyarrow"),
        "dev", "mad_cents")

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(meds_ref)
        et = t["event_type"].to_pylist()
        return pa.table({
            "event_type": t["event_type"],
            "median_cents": pa.array([m[e] for e in et], pa.int64()),
            "mad_cents": t["mad_cents"]})

    return (mad.map_batches(attach, batch_format="pyarrow")
            .sort("event_type"))


_EVENTS_MAD_SQL = """
WITH c AS (SELECT event_type,
                  CAST(FLOOR(value * 100) AS BIGINT) AS cents
           FROM events),
m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med
      FROM c GROUP BY 1)
SELECT c.event_type, m.med AS median_cents,
       quantile_disc(abs(c.cents - m.med), 0.5) AS mad_cents
FROM c JOIN m USING (event_type)
GROUP BY c.event_type, m.med ORDER BY event_type
"""


def docs_hapax_stats(sf_dir: str):
    """T6 — vocabulary-richness profile: type count, hapax-legomenon
    count (terms occurring exactly once), token count, and hapax ratio —
    the lexical-diversity signal corpus-quality audits track (a shrinking
    hapax share flags template/boilerplate contamination). All counts
    EXACT int64; the ratio is one exact-int division rounded to 4 dp.

    Scale shape: rides [[docs_top_terms]]'s term_counts combiner (head
    terms cost one row per batch); the vocabulary never leaves the
    cluster — three scalar partials per batch reduce to ONE row."""
    from .functions.terms import term_counts

    ds = read_table(sf_dir, "documents", columns=["text"],
                    rows_per_block=500)
    tc = term_counts(ds)

    def partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "types": pa.array([len(n)], pa.int64()),
            "hapax": pa.array([int((n == 1).sum())], pa.int64()),
            "tokens": pa.array([int(n.sum())], pa.int64())})

    m = tc.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("types", alias_name="types"),
        Sum("hapax", alias_name="hapax"),
        Sum("tokens", alias_name="tokens"))
    k = int(m["types"] or 0)
    h = int(m["hapax"] or 0)
    tot = int(m["tokens"] or 0)
    return pa.table({
        "n_types": pa.array([k], pa.int64()),
        "n_hapax": pa.array([h], pa.int64()),
        "n_tokens": pa.array([tot], pa.int64()),
        "hapax_ratio": pa.array([round(h / k, 4) if k else 0.0],
                                pa.float64())})


_DOCS_HAPAX_SQL = """
WITH tc AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                     AS term
            FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tc GROUP BY term)
SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM((n = 1)::INT) AS BIGINT) AS n_hapax,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM((n = 1)::INT) AS DOUBLE) / COUNT(*), 4)
         AS hapax_ratio
FROM c
"""


def docs_zipf_slope(sf_dir: str):
    """T7 — Zipf-law slope: OLS slope of ln(frequency) on ln(rank) over
    the top-100 terms — the rank-frequency power-law fit (Zipf 1949)
    whose drift from ≈ −1 flags synthetic or deduplication-damaged text.
    Counts and ranks are exact; the regression runs driver-side over
    ≤ 100 (ln rank, ln n) pairs in rank order, rounded to 4 dp.

    Scale shape: term_counts combiner → distributed top-k sort; exactly
    k rows reach the driver."""
    from .functions.terms import top_terms

    ds = read_table(sf_dir, "documents", columns=["text"],
                    rows_per_block=500)
    import math as _math
    top = top_terms(ds, 100).take_all()      # ≤ 100 rows, rank order
    xs = [_math.log(i + 1) for i in range(len(top))]
    ys = [_math.log(int(r["n"])) for r in top]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den if den else 0.0
    return pa.table({
        "n_terms": pa.array([n], pa.int64()),
        "zipf_slope": pa.array([round(slope, 4)], pa.float64())})


_DOCS_ZIPF_SQL = """
WITH tc AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                     AS term
            FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tc GROUP BY term),
r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rk FROM c
      QUALIFY rk <= 100)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(regr_slope(ln(CAST(n AS DOUBLE)),
                        ln(CAST(rk AS DOUBLE))), 4) AS zipf_slope
FROM r
"""


def events_dow_chi2(sf_dir: str):
    """G44 — chi-square independence statistic for event_type ×
    day-of-week (epoch-day mod 7): the contingency test a pipeline runs
    to detect whether traffic mix shifts by weekday. Uses the
    zero-cell-free identity χ² = N·Σ Oᵢⱼ²/(Rᵢ·Cⱼ) − N so only OBSERVED
    cells contribute; all counts exact int64, the ≤ types×7-cell float
    sum runs driver-side in sorted (type, dow) order, rounded to 4 dp.

    Scale shape: per-batch (type, dow) count combiner → one tiny
    groupby; the contingency table (≤ types×7 rows) is the only thing
    the driver sees."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def cells(t: pa.Table) -> pa.Table:
        dow = pc.subtract(
            pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64())),
            pc.multiply(
                pc.divide(pc.divide(pc.cast(t["ts"], pa.int64()),
                                    pa.scalar(86_400_000_000, pa.int64())),
                          pa.scalar(7, pa.int64())),
                pa.scalar(7, pa.int64())))
        return (pa.table({"event_type": t["event_type"], "dow": dow})
                .group_by(["event_type", "dow"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "dow", "n"]))

    obs = (ev.map_batches(cells, batch_format="pyarrow")
           .groupby(["event_type", "dow"])
           .aggregate(Sum("n", alias_name="n"))
           .take_all())                       # ≤ types×7 cells
    obs.sort(key=lambda r: (r["event_type"], int(r["dow"])))
    row_tot: dict = {}
    col_tot: dict = {}
    total = 0
    for r in obs:
        row_tot[r["event_type"]] = row_tot.get(r["event_type"], 0) \
            + int(r["n"])
        col_tot[int(r["dow"])] = col_tot.get(int(r["dow"]), 0) \
            + int(r["n"])
        total += int(r["n"])
    s = sum((int(r["n"]) ** 2)
            / (row_tot[r["event_type"]] * col_tot[int(r["dow"])])
            for r in obs)
    chi2 = total * s - total if total else 0.0
    return pa.table({
        "n_cells": pa.array([len(obs)], pa.int64()),
        "n_total": pa.array([total], pa.int64()),
        "chi2": pa.array([round(chi2, 4)], pa.float64())})


_EVENTS_CHI2_SQL = """
WITH c AS (SELECT event_type,
                  (epoch_us(ts) // 86400000000) % 7 AS dow,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS r FROM c GROUP BY 1),
ct AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS col FROM c GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_cells,
       tot.t AS n_total,
       ROUND(tot.t * SUM(CAST(c.n AS DOUBLE) * c.n / (rt.r * ct.col))
             - tot.t, 4) AS chi2
FROM c JOIN rt USING (event_type) JOIN ct USING (dow), tot
GROUP BY tot.t
"""


def orders_benford(sf_dir: str):
    """G45 — Benford first-significant-digit distribution of order
    values: the fraud/synthetic-data audit (Benford 1938) a pipeline
    runs over monetary columns — heavy deviation from log10(1+1/d)
    flags fabricated records. Digit extraction is a pure string slice
    over integer cents (no float log10 near power-of-ten boundaries);
    counts exact, shares one exact division each, 4 dp.

    Scale shape: per-batch digit-count combiner (≤9 rows per batch) →
    one tiny groupby; the grand total is a second pass over the same
    collapsed rows, not the fact table."""
    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def digits(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(_cents(t["o_totalprice"]), pa.string()), 0, 1),
            pa.int64())
        return (pa.table({"digit": d})
                .group_by("digit").aggregate([([], "count_all")])
                .rename_columns(["digit", "n"]))

    per = (orders.map_batches(digits, batch_format="pyarrow")
           .groupby("digit").aggregate(Sum("n", alias_name="n"))
           .materialize())
    total = int(per.sum("n") or 0)

    def share(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "share", pa.array(np.round(n / total, 4), pa.float64()))

    return per.map_batches(share, batch_format="pyarrow").sort("digit")


_ORDERS_BENFORD_SQL = """
WITH c AS (SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100)
                                        AS BIGINT) AS VARCHAR), 1, 1)
                       AS BIGINT) AS digit
           FROM orders),
g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
SELECT digit, n, ROUND(CAST(n AS DOUBLE) / tot, 4) AS share
FROM g, t ORDER BY digit
"""


def events_type_value_trend(sf_dir: str):
    """G46 — per-type OLS trend: slope of spend (cents) on days since
    the first observed event, per event type — the drift detector a
    metrics pipeline fits before alerting on mix shifts. All five
    regression moments are EXACT int64 per-batch partials (x centered on
    the global min day to keep Σxy in range); the final slope combines
    them in arbitrary-precision Python ints per type, one float division
    rounded to 4 dp (oracle uses HUGEINT for the same products).

    Scale shape: one tiny Min pre-pass; five combiner rows per
    (batch, type); ≤ #types rows reach the driver."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    day0 = int(ev.map_batches(
        lambda t: pa.table({"d": pc.divide(
            pc.cast(t["ts"], pa.int64()),
            pa.scalar(86_400_000_000, pa.int64()))}),
        batch_format="pyarrow").min("d"))

    def moments(t: pa.Table) -> pa.Table:
        x = (pc.divide(pc.cast(t["ts"], pa.int64()),
                       pa.scalar(86_400_000_000, pa.int64()))
             .to_numpy(zero_copy_only=False) - day0)
        y = pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "n": 1, "sx": x, "sy": y, "sxx": x * x, "sxy": x * y})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = (ev.map_batches(moments, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sx", alias_name="sx"),
                       Sum("sy", alias_name="sy"),
                       Sum("sxx", alias_name="sxx"),
                       Sum("sxy", alias_name="sxy"))
            .take_all())                      # ≤ #types rows
    rows.sort(key=lambda r: r["event_type"])
    out = {"event_type": [], "n": [], "slope_cents_per_day": []}
    for r in rows:
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        num, den = n * sxy - sx * sy, n * sxx - sx * sx   # exact bigints
        out["event_type"].append(r["event_type"])
        out["n"].append(n)
        out["slope_cents_per_day"].append(
            round(float(num) / float(den), 4) if den else 0.0)
    return pa.table({"event_type": pa.array(out["event_type"], pa.string()),
                     "n": pa.array(out["n"], pa.int64()),
                     "slope_cents_per_day": pa.array(
                         out["slope_cents_per_day"], pa.float64())})


_EVENTS_TREND_SQL = """
WITH md AS (SELECT MIN(epoch_us(ts) // 86400000000) AS m FROM events),
c AS (SELECT event_type,
             epoch_us(ts) // 86400000000 - md.m AS x,
             CAST(FLOOR(value * 100) AS BIGINT) AS y
      FROM events, md),
a AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) n,
             CAST(SUM(x) AS HUGEINT) sx, CAST(SUM(y) AS HUGEINT) sy,
             CAST(SUM(x * x) AS HUGEINT) sxx,
             CAST(SUM(x * y) AS HUGEINT) sxy
      FROM c GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 4)
         AS slope_cents_per_day
FROM a ORDER BY event_type
"""


def docs_dup_cluster_hist(sf_dir: str):
    """D15 — duplicate-cluster size histogram: how many exact-content
    clusters exist at each multiplicity — the dedup-health report a
    corpus audit publishes (a fat tail of large clusters means template
    spam survived upstream filters). Rides [[docs_exact_dedup]]'s
    fingerprint contract so the histogram describes exactly what that
    operator would collapse.

    Scale shape: (fingerprint, id) pairs shuffle once for the cluster
    count; cluster sizes then collapse to ≤ max-multiplicity rows."""
    from .functions.text import fingerprint_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=500)
    sizes = (docs.map_batches(
        lambda b: fingerprint_batch(b, "text").select(["fingerprint"]),
        batch_format="pyarrow")
        .groupby("fingerprint").aggregate(Count(alias_name="sz")))
    return (sizes.map_batches(
        lambda t: pa.table({"cluster_size": t["sz"]}),
        batch_format="pyarrow")
        .groupby("cluster_size").aggregate(Count(alias_name="n_clusters"))
        .sort("cluster_size"))


_DOCS_DUP_HIST_SQL = r"""
WITH g AS (SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
             AS fp,
           CAST(COUNT(*) AS BIGINT) AS sz
           FROM documents GROUP BY 1)
SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM g GROUP BY 1 ORDER BY cluster_size
"""


def events_js_drift(sf_dir: str):
    """G47 — Jensen–Shannon divergence (bits) between the event-type mix
    of the first vs second half of the observed time range: the bounded,
    symmetric distribution-drift metric (Lin 1991) a feed monitor
    prefers over KL because absent types stay finite. The time split is
    pure integer arithmetic (ts·2 ≤ min+max); per-(half, type) counts
    are exact; the ≤ 2·#types JSD terms sum driver-side in sorted-type
    order, 4 dp.

    Scale shape: one Min/Max pre-pass; the fact table collapses through
    a (half, type) count combiner — nothing else moves."""
    import math as _math

    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])
    mm = ev.map_batches(
        lambda t: pa.table({"us": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("us"), Max("us"))
    lo, hi = int(mm["min(us)"]), int(mm["max(us)"])

    def halves(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        h = pc.cast(pc.greater(pc.multiply(us, pa.scalar(2, pa.int64())),
                               pa.scalar(lo + hi, pa.int64())), pa.int64())
        return (pa.table({"event_type": t["event_type"], "h": h})
                .group_by(["event_type", "h"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "h", "n"]))

    rows = (ev.map_batches(halves, batch_format="pyarrow")
            .groupby(["event_type", "h"]).aggregate(Sum("n", alias_name="n"))
            .take_all())                      # ≤ 2·#types rows
    a: dict = {}
    b: dict = {}
    for r in rows:
        (a if int(r["h"]) == 0 else b)[r["event_type"]] = int(r["n"])
    ta, tb = sum(a.values()), sum(b.values())
    jsd = 0.0
    for et in sorted(set(a) | set(b)):
        p = a.get(et, 0) / ta if ta else 0.0
        q = b.get(et, 0) / tb if tb else 0.0
        m = 0.5 * (p + q)
        if p > 0:
            jsd += 0.5 * p * _math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * _math.log2(q / m)
    return pa.table({
        "n_first": pa.array([ta], pa.int64()),
        "n_second": pa.array([tb], pa.int64()),
        "jsd_bits": pa.array([round(jsd, 4)], pa.float64())})


_EVENTS_JSD_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) mn, MAX(epoch_us(ts)) mx FROM events),
c AS (SELECT event_type,
             CASE WHEN epoch_us(ts) * 2 > b.mn + b.mx
                  THEN 1 ELSE 0 END AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events, b GROUP BY 1, 2),
piv AS (SELECT event_type,
               CAST(SUM(CASE WHEN h = 0 THEN n ELSE 0 END) AS BIGINT) AS na,
               CAST(SUM(CASE WHEN h = 1 THEN n ELSE 0 END) AS BIGINT) AS nb
        FROM c GROUP BY 1),
tt AS (SELECT CAST(SUM(na) AS BIGINT) ta, CAST(SUM(nb) AS BIGINT) tb
       FROM piv)
SELECT tt.ta AS n_first, tt.tb AS n_second,
       ROUND(SUM(
         CASE WHEN na > 0 THEN 0.5 * (CAST(na AS DOUBLE) / ta)
              * log2((CAST(na AS DOUBLE) / ta)
                     / (0.5 * (CAST(na AS DOUBLE) / ta
                               + CAST(nb AS DOUBLE) / tb)))
              ELSE 0 END
         + CASE WHEN nb > 0 THEN 0.5 * (CAST(nb AS DOUBLE) / tb)
                * log2((CAST(nb AS DOUBLE) / tb)
                       / (0.5 * (CAST(na AS DOUBLE) / ta
                                 + CAST(nb AS DOUBLE) / tb)))
                ELSE 0 END), 4) AS jsd_bits
FROM piv, tt GROUP BY tt.ta, tt.tb
"""


def orders_systematic_sample(sf_dir: str):
    """O9 — weighted SYSTEMATIC sampling (the deterministic alternative
    to weighted reservoir sampling for importance-weighted corpus
    subsampling): walk the cents-weighted cumulative line in o_orderkey
    order and keep every row whose interval crosses a multiple of
    total/k (k = 100). Entirely integer arithmetic — the cumulative sum
    is [[orders_global_rank]]'s exact range-partitioned prefix-sum plan,
    the crossing test is two int floor-divisions — so selection is
    bit-identical to SQL with no float boundary anywhere.

    Scale shape: two-pass global_running_sum (driver holds per-partition
    offsets only) + a streaming filter; ~k rows come back."""
    from .functions.rank import global_running_sum

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])
    cents = orders.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow").materialize()
    total = int(cents.sum("cents") or 0)
    step = max(1, total // 100)
    cum = global_running_sum(cents, "cents", order_by=["o_orderkey"],
                             out_col="cum")

    def crossing(t: pa.Table) -> pa.Table:
        c = t["cum"].to_numpy(zero_copy_only=False)
        x = t["cents"].to_numpy(zero_copy_only=False)
        keep = (c - x) // step < c // step
        return t.filter(pa.array(keep))

    return (cum.map_batches(crossing, batch_format="pyarrow")
            .sort("o_orderkey"))


_ORDERS_SYSSAMPLE_SQL = """
WITH c AS (SELECT o_orderkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
w AS (SELECT o_orderkey, cents,
             CAST(SUM(cents) OVER (ORDER BY o_orderkey
                                   ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM c),
t AS (SELECT GREATEST(CAST(SUM(cents) AS BIGINT) // 100, 1) AS step
      FROM c)
SELECT o_orderkey, cents, cum
FROM w, t
WHERE (cum - cents) // step < cum // step
ORDER BY o_orderkey
"""


def events_value_skewkurt(sf_dir: str):
    """G48 — grouped skewness + excess kurtosis of spend per event type:
    the distribution-shape moments an anomaly monitor tracks beyond
    variance (a kurtosis spike = heavy-tail corruption before the mean
    moves). Two-pass centered-moment plan: pass 1 exact int64 (n, Σx)
    per type → the mean is one exact-int division (identical double both
    engines); pass 2 streams float Σe², Σe³, Σe⁴ per (batch, type)
    through combiners. Both shape stats are scale-free O(1) ratios,
    rounded to 4 dp to absorb float summation order.

    Scale shape: ≤ #types rows per batch in each pass; only #types rows
    reach the driver."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    cents = ev.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "x": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                         pa.int64())}),
        batch_format="pyarrow").materialize()

    base = (cents.groupby("event_type")
            .aggregate(Count(alias_name="n"), Sum("x", alias_name="sx"))
            .take_all())
    mu = {r["event_type"]: float(r["sx"]) / int(r["n"]) for r in base}
    nn = {r["event_type"]: int(r["n"]) for r in base}
    mu_ref = ray.put(mu)

    def central(t: pa.Table) -> pa.Table:
        m = ray.get(mu_ref)
        et = t["event_type"].to_pandas()
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = x - et.map(m).to_numpy()
        df = pd.DataFrame({"event_type": et, "s2": e * e,
                           "s3": e * e * e, "s4": e * e * e * e})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = (cents.map_batches(central, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("s2", alias_name="s2"),
                       Sum("s3", alias_name="s3"),
                       Sum("s4", alias_name="s4"))
            .take_all())                      # ≤ #types rows
    rows.sort(key=lambda r: r["event_type"])
    out = {"event_type": [], "n": [], "skewness": [],
           "excess_kurtosis": []}
    for r in rows:
        n = nn[r["event_type"]]
        m2 = float(r["s2"]) / n
        m3 = float(r["s3"]) / n
        m4 = float(r["s4"]) / n
        out["event_type"].append(r["event_type"])
        out["n"].append(n)
        out["skewness"].append(round(m3 / m2 ** 1.5, 4) if m2 else 0.0)
        out["excess_kurtosis"].append(
            round(m4 / (m2 * m2) - 3.0, 4) if m2 else 0.0)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "skewness": pa.array(out["skewness"], pa.float64()),
        "excess_kurtosis": pa.array(out["excess_kurtosis"], pa.float64())})


_EVENTS_SKEWKURT_SQL = """
WITH c AS (SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS x
           FROM events),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) n,
             CAST(SUM(x) AS BIGINT) sx FROM c GROUP BY 1),
d AS (SELECT c.event_type, m.n,
             CAST(c.x AS DOUBLE) - CAST(m.sx AS DOUBLE) / m.n AS e
      FROM c JOIN m USING (event_type))
SELECT event_type, n,
       ROUND((SUM(e * e * e) / n) / POW(SUM(e * e) / n, 1.5), 4)
         AS skewness,
       ROUND((SUM(e * e * e * e) / n) / POW(SUM(e * e) / n, 2) - 3, 4)
         AS excess_kurtosis
FROM d GROUP BY event_type, n ORDER BY event_type
"""


def docs_ttr_hist(sf_dir: str):
    """T8 — type-token-ratio histogram: per-document lexical diversity
    (distinct terms / tokens) bucketed into deciles — the per-document
    counterpart of corpus-level [[docs_hapax_stats]] (a mass shift into
    low buckets flags boilerplate). Bucket = min(10·types // tokens, 9)
    is pure integer arithmetic — no float TTR crosses the oracle.

    Scale shape: tokenize + distinct-count are per-batch work (sets die
    with the batch — no vocabulary leaves the task); only ≤10 partial
    rows per batch shuffle."""
    from .functions.terms import _TERM_RE

    ds = read_table(sf_dir, "documents", columns=["text"],
                    rows_per_block=500)

    def buckets(t: pa.Table) -> pa.Table:
        bs = []
        for txt in t["text"].to_pylist():
            ws = _TERM_RE.findall((txt or "").lower())
            if not ws:
                continue
            bs.append(min(10 * len(set(ws)) // len(ws), 9))
        if not bs:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vc = pd.Series(bs).value_counts()
        return pa.table({"bucket": pa.array(vc.index.to_numpy(), pa.int64()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    return (ds.map_batches(buckets, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n", alias_name="n_docs"))
            .sort("bucket"))


_DOCS_TTR_SQL = """
WITH pd AS (SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+'))
              AS toks,
            len(list_distinct(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+'))) AS typs
            FROM documents),
b AS (SELECT LEAST((10 * typs) // toks, 9) AS bucket FROM pd
      WHERE toks > 0)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM b GROUP BY 1 ORDER BY bucket
"""


def docs_ngram_novelty(sf_dir: str):
    """T9 — cross-split n-gram novelty: the share of distinct word
    trigrams in odd-id documents that never appear in even-id documents —
    the memorization / contamination probe run between a training split
    and a held-out split (novelty ≈ 0 means the "new" split is recycled
    text). Per-trigram presence flags collapse through per-batch
    distinct combiners; one groupby(trigram) MAX-flags shuffle; two
    exact int totals and one exact division, 4 dp.

    Scale shape: the shuffle carries one row per DISTINCT (trigram seen
    in batch), never token volume; the driver sees two scalars."""
    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=500)

    def tris(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        rows: dict = {}
        for did, txt in zip(ids, t["text"].to_pylist()):
            ws = _TERM_RE.findall((txt or "").lower())
            h = int(did) % 2
            for i in range(len(ws) - 2):
                tri = " ".join(ws[i:i + 3])
                f = rows.get(tri)
                if f is None:
                    rows[tri] = [h == 0, h == 1]
                else:
                    f[0] |= (h == 0)
                    f[1] |= (h == 1)
        return pa.table({
            "tri": pa.array(list(rows), pa.string()),
            "he": pa.array([int(v[0]) for v in rows.values()], pa.int64()),
            "ho": pa.array([int(v[1]) for v in rows.values()], pa.int64())})

    flags = (docs.map_batches(tris, batch_format="pyarrow")
             .groupby("tri")
             .aggregate(Max("he", alias_name="he"),
                        Max("ho", alias_name="ho")))

    def totals(t: pa.Table) -> pa.Table:
        he = t["he"].to_numpy(zero_copy_only=False)
        ho = t["ho"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_odd": pa.array([int(ho.sum())], pa.int64()),
            "n_novel": pa.array([int((ho & (1 - he)).sum())], pa.int64())})

    m = flags.map_batches(totals, batch_format="pyarrow").aggregate(
        Sum("n_odd", alias_name="n_odd"),
        Sum("n_novel", alias_name="n_novel"))
    n_odd, n_novel = int(m["n_odd"] or 0), int(m["n_novel"] or 0)
    return pa.table({
        "n_odd_trigrams": pa.array([n_odd], pa.int64()),
        "n_novel": pa.array([n_novel], pa.int64()),
        "novelty_ratio": pa.array(
            [round(n_novel / n_odd, 4) if n_odd else 0.0], pa.float64())})


_DOCS_NOVELTY_SQL = """
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
tri AS (SELECT doc_id % 2 AS h,
               ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS tri
        FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
        WHERE len(ws) >= 3),
flags AS (SELECT tri,
                 MAX(CASE WHEN h = 0 THEN 1 ELSE 0 END) he,
                 MAX(CASE WHEN h = 1 THEN 1 ELSE 0 END) ho
          FROM tri GROUP BY tri)
SELECT CAST(SUM(ho) AS BIGINT) AS n_odd_trigrams,
       CAST(SUM(CASE WHEN ho = 1 AND he = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN ho = 1 AND he = 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / SUM(ho), 4) AS novelty_ratio
FROM flags
"""


def orders_pareto_80_20(sf_dir: str):
    """G49 — Pareto concentration: the revenue share captured by the
    top 20% of customers — the skew headline an account-concentration
    (or per-domain corpus-concentration) audit reports. Customer
    revenues are exact int64 cents; the global rank is the exact
    range-partitioned two-pass plan ordered by (revenue DESC, custkey);
    k = n//5 and both sums are exact ints — the share is ONE float
    division, 4 dp.

    Scale shape: fact → per-customer combiner sum; the rank pass holds
    only per-partition sample/count tables on the driver; two scalar
    partial sums come back."""
    from .functions.rank import global_row_number

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])
    rev = (orders.map_batches(
        lambda t: pa.table({"o_custkey": t["o_custkey"],
                            "rev": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("rev", alias_name="rev"))
        .materialize())
    n_cust = rev.count()
    k = n_cust // 5
    ranked = global_row_number(rev, order_by=["rev", "o_custkey"],
                               descending=[True, False], out_col="rn")

    def partial(t: pa.Table) -> pa.Table:
        r = t["rev"].to_numpy(zero_copy_only=False)
        rn = t["rn"].to_numpy(zero_copy_only=False)
        return pa.table({
            "top": pa.array([int(r[rn <= k].sum())], pa.int64()),
            "tot": pa.array([int(r.sum())], pa.int64())})

    m = ranked.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("top", alias_name="top"), Sum("tot", alias_name="tot"))
    top, tot = int(m["top"] or 0), int(m["tot"] or 0)
    return pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "top_cents": pa.array([top], pa.int64()),
        "total_cents": pa.array([tot], pa.int64()),
        "top_share": pa.array([round(top / tot, 4) if tot else 0.0],
                              pa.float64())})


_ORDERS_PARETO_SQL = """
WITH r AS (SELECT o_custkey,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
rk AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey)
              AS rn FROM r),
t AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(rev) AS BIGINT) tot
      FROM r)
SELECT t.n AS n_customers, t.n // 5 AS k,
       CAST(SUM(CASE WHEN rn <= t.n // 5 THEN rev ELSE 0 END)
            AS BIGINT) AS top_cents,
       t.tot AS total_cents,
       ROUND(CAST(SUM(CASE WHEN rn <= t.n // 5 THEN rev ELSE 0 END)
                  AS DOUBLE) / t.tot, 4) AS top_share
FROM rk, t GROUP BY t.n, t.tot
"""


def events_robust_outliers(sf_dir: str):
    """G50 — robust (median/MAD) outlier gate per event type: count of
    events with |cents − median| > 5·MAD — the non-parametric partner to
    the 3-sigma gate in [[events_value_outliers]] (a MAD gate survives
    the very outliers that inflate sigma). Both location and scale come
    from the exact grouped-median plan; the gate is a pure integer
    comparison — no float crosses the oracle.

    Scale shape: two grouped-median passes + one streaming counting
    pass; the ≤ #types (median, mad) dict is the only driver hop."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    cents = ev.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "cents": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                             pa.int64())}),
        batch_format="pyarrow").materialize()

    meds = {r["event_type"]: int(r["m"]) for r in
            _grouped_median_by_type(cents, "cents", "m").take_all()}
    meds_ref = ray.put(meds)

    def absdev(t: pa.Table) -> pa.Table:
        m = ray.get(meds_ref)
        et = t["event_type"].to_pylist()
        c = t["cents"].to_numpy(zero_copy_only=False)
        med = np.fromiter((m[e] for e in et), dtype=np.int64, count=len(et))
        return pa.table({"event_type": t["event_type"],
                         "dev": pa.array(np.abs(c - med), pa.int64())})

    devs = cents.map_batches(absdev, batch_format="pyarrow").materialize()
    mads = {r["event_type"]: int(r["m"]) for r in
            _grouped_median_by_type(devs, "dev", "m").take_all()}
    mads_ref = ray.put(mads)

    def gate(t: pa.Table) -> pa.Table:
        md = ray.get(mads_ref)
        et = t["event_type"].to_pylist()
        d = t["dev"].to_numpy(zero_copy_only=False)
        lim = np.fromiter((5 * md[e] for e in et), dtype=np.int64,
                          count=len(et))
        return pa.table({"event_type": t["event_type"],
                         "out": pa.array((d > lim).astype(np.int64))})

    counted = (devs.map_batches(gate, batch_format="pyarrow")
               .groupby("event_type")
               .aggregate(Count(alias_name="n"),
                          Sum("out", alias_name="n_outliers")))

    def attach(t: pa.Table) -> pa.Table:
        m, md = ray.get(meds_ref), ray.get(mads_ref)
        et = t["event_type"].to_pylist()
        return pa.table({
            "event_type": t["event_type"], "n": t["n"],
            "n_outliers": t["n_outliers"],
            "median_cents": pa.array([m[e] for e in et], pa.int64()),
            "mad_cents": pa.array([md[e] for e in et], pa.int64())})

    return (counted.map_batches(attach, batch_format="pyarrow")
            .sort("event_type"))


_EVENTS_ROBUST_SQL = """
WITH c AS (SELECT event_type,
                  CAST(FLOOR(value * 100) AS BIGINT) AS cents
           FROM events),
m AS (SELECT event_type, quantile_disc(cents, 0.5) AS med
      FROM c GROUP BY 1),
d AS (SELECT c.event_type, c.cents, m.med,
             abs(c.cents - m.med) AS dev
      FROM c JOIN m USING (event_type)),
md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
       FROM d GROUP BY 1)
SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN d.dev > 5 * md.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       MAX(d.med) AS median_cents, md.mad AS mad_cents
FROM d JOIN md USING (event_type)
GROUP BY d.event_type, md.mad ORDER BY event_type
"""


def events_user_scd2(sf_dir: str):
    """S10 — SCD2 (slowly-changing-dimension type 2) interval build:
    per user, each event becomes a state row with a validity interval
    [valid_from_us, valid_to_us) closed by the NEXT event's timestamp —
    the classic warehouse versioning transform (valid_to_us = −1 marks
    the currently-open row). LEAD is [[lag_column]] with periods = −1
    over hash-bucketed user partitions.

    Scale shape: one hash shuffle on user_id, one per-partition
    mergesort; output is fact-sized and streams — nothing on the
    driver."""
    from .functions.window import lag_column

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"])
    us = ev.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "event_type": t["event_type"],
                            "valid_from_us": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow")
    led = lag_column(us, "valid_from_us", keys=["user_id"],
                     order_by=["valid_from_us"], periods=-1,
                     out_col="valid_to_us")

    def close_open(t: pa.Table) -> pa.Table:
        v = t["valid_to_us"].to_pandas().fillna(-1).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "valid_from_us": t["valid_from_us"],
            "valid_to_us": pa.array(v.to_numpy(), pa.int64())})

    return (led.map_batches(close_open, batch_format="pyarrow")
            .sort(["user_id", "valid_from_us"]))


_EVENTS_SCD2_SQL = """
SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
       COALESCE(LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)), -1)
         AS valid_to_us
FROM events ORDER BY user_id, valid_from_us
"""


def supplier_balance_outliers(sf_dir: str):
    """G51 — per-nation z-score gate with EXACT integer arithmetic:
    suppliers whose account balance sits more than 2 population standard
    deviations from their nation's mean. The float-free trick: |z| > 2
    ⇔ (n·x − Σx)² > 4·(n·Σx² − (Σx)²), evaluated in arbitrary-precision
    Python ints per row (dim-table-sized loop; the oracle uses HUGEINT
    for the same products) — so the gate has NO float boundary at all,
    unlike a naive z = (x−μ)/σ comparison.

    Scale shape: per-nation (n, Σx, Σx²) combiner → ≤ #nations dict
    broadcast; the gate streams over the dim table."""
    sup = read_table(sf_dir, "supplier",
                     columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    cents = sup.map_batches(
        lambda t: pa.table({"s_suppkey": t["s_suppkey"],
                            "s_nationkey": t["s_nationkey"],
                            "balance_cents": _cents(t["s_acctbal"])}),
        batch_format="pyarrow").materialize()

    def moments(t: pa.Table) -> pa.Table:
        x = t["balance_cents"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"s_nationkey": t["s_nationkey"].to_pandas(),
                           "n": 1, "sx": x, "sxx": x * x})
        g = df.groupby("s_nationkey", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = {int(r["s_nationkey"]): (int(r["n"]), int(r["sx"]),
                                     int(r["sxx"]))
             for r in (cents.map_batches(moments, batch_format="pyarrow")
                       .groupby("s_nationkey")
                       .aggregate(Sum("n", alias_name="n"),
                                  Sum("sx", alias_name="sx"),
                                  Sum("sxx", alias_name="sxx"))
                       .take_all())}          # ≤ #nations rows
    stats_ref = ray.put(stats)

    def gate(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        keep = []
        for nk, x in zip(t["s_nationkey"].to_pylist(),
                         t["balance_cents"].to_pylist()):
            n, sx, sxx = st[int(nk)]
            d = n * int(x) - sx                # exact bigints
            keep.append(d * d > 4 * (n * sxx - sx * sx))
        return t.filter(pa.array(keep))

    out = cents.map_batches(gate, batch_format="pyarrow").materialize()
    if out.count() == 0:
        # all-inlier input: preserve the output schema (an empty Dataset
        # loses its columns through to_pandas)
        return cents.schema().base_schema.empty_table()
    return out.sort("s_suppkey")


_SUPPLIER_ZGATE_SQL = """
WITH c AS (SELECT s_suppkey, s_nationkey,
                  CAST(ROUND(s_acctbal * 100) AS BIGINT) AS balance_cents
           FROM supplier),
m AS (SELECT s_nationkey, CAST(COUNT(*) AS HUGEINT) n,
             CAST(SUM(balance_cents) AS HUGEINT) sx,
             CAST(SUM(balance_cents * balance_cents) AS HUGEINT) sxx
      FROM c GROUP BY 1)
SELECT c.s_suppkey, c.s_nationkey, c.balance_cents
FROM c JOIN m USING (s_nationkey)
WHERE (m.n * c.balance_cents - m.sx) * (m.n * c.balance_cents - m.sx)
      > 4 * (m.n * m.sxx - m.sx * m.sx)
ORDER BY s_suppkey
"""


def events_type_user_overlap(sf_dir: str):
    """G52 — audience-overlap matrix: Jaccard similarity between the
    USER SETS of every event-type pair — the cross-sell / cannibalization
    readout (and, on a corpus, the source-overlap audit). Intersections
    come from per-user type lists (each user contributes its ≤ #types²
    ordered pairs via a hash-bucketed per-partition pass); totals from
    the distinct (type, user) table; Jaccard = inter/(|A|+|B|−inter) is
    one exact-int division per pair, 4 dp.

    Scale shape: distinct (type, user) shuffles once; pair counts
    collapse through per-partition combiners to ≤ C(#types, 2) rows."""
    from .functions.arrowutil import to_arrow

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    du = (ev.groupby(["event_type", "user_id"])
          .aggregate(Count(alias_name="_n"))
          .select_columns(["event_type", "user_id"]).materialize())

    totals = {r["event_type"]: int(r["n"]) for r in
              (du.groupby("event_type").aggregate(Count(alias_name="n"))
               .take_all())}                  # ≤ #types rows

    def tag(t: pa.Table) -> pa.Table:
        part = pd.util.hash_pandas_object(
            t["user_id"].to_pandas(), index=False) % 16
        return t.append_column("part",
                               pa.array(part.to_numpy(), pa.int64()))

    pair_schema = pa.schema([("ta", pa.string()), ("tb", pa.string()),
                             ("inter", pa.int64())])

    def pairs(g: pd.DataFrame) -> pa.Table:
        acc: dict = {}
        for _, grp in g.groupby("user_id", sort=False):
            ts = sorted(grp["event_type"].unique())
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    k = (ts[i], ts[j])
                    acc[k] = acc.get(k, 0) + 1
        rows = [{"ta": a, "tb": b, "inter": v}
                for (a, b), v in acc.items()]
        return to_arrow(pd.DataFrame(rows), pair_schema)

    counted = (du.map_batches(tag, batch_format="pyarrow")
               .groupby("part").map_groups(pairs, batch_format="pandas")
               .groupby(["ta", "tb"])
               .aggregate(Sum("inter", alias_name="inter"))
               .take_all())                   # ≤ C(#types, 2) rows
    counted.sort(key=lambda r: (r["ta"], r["tb"]))
    out = {"ta": [], "tb": [], "inter": [], "jaccard": []}
    for r in counted:
        inter = int(r["inter"])
        union = totals[r["ta"]] + totals[r["tb"]] - inter
        out["ta"].append(r["ta"])
        out["tb"].append(r["tb"])
        out["inter"].append(inter)
        out["jaccard"].append(round(inter / union, 4) if union else 0.0)
    return pa.table({"ta": pa.array(out["ta"], pa.string()),
                     "tb": pa.array(out["tb"], pa.string()),
                     "inter": pa.array(out["inter"], pa.int64()),
                     "jaccard": pa.array(out["jaccard"], pa.float64())})


_EVENTS_OVERLAP_SQL = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
p AS (SELECT a.event_type ta, b.event_type tb,
             CAST(COUNT(*) AS BIGINT) inter
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) n FROM du GROUP BY 1)
SELECT p.ta, p.tb, p.inter,
       ROUND(CAST(p.inter AS DOUBLE) / (x.n + y.n - p.inter), 4)
         AS jaccard
FROM p JOIN tot x ON x.event_type = p.ta
       JOIN tot y ON y.event_type = p.tb
ORDER BY ta, tb
"""


def docs_simpson_index(sf_dir: str):
    """T10 — Simpson diversity index of the corpus term distribution:
    D = Σ n(n−1) / (N(N−1)), the probability two random tokens are the
    same type — the concentration partner to [[events_type_entropy]]'s
    entropy, and another boilerplate detector (D spikes when one
    template dominates). Both sums are EXACT int64 partials over the
    distributed (term, n) table; the final ratio is two exact bigints
    divided once, 6 dp (D is O(0.001–0.1) for natural text).

    Scale shape: vocabulary never leaves the cluster — two scalar
    partials per batch of the term table."""
    from .functions.terms import term_counts

    ds = read_table(sf_dir, "documents", columns=["text"],
                    rows_per_block=500)
    tc = term_counts(ds)

    def partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "tokens": pa.array([int(n.sum())], pa.int64()),
            "nn1": pa.array([int((n * (n - 1)).sum())], pa.int64())})

    m = tc.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("tokens", alias_name="tokens"), Sum("nn1", alias_name="nn1"))
    tot, nn1 = int(m["tokens"] or 0), int(m["nn1"] or 0)
    den = tot * (tot - 1)
    return pa.table({
        "n_tokens": pa.array([tot], pa.int64()),
        "sum_nn1": pa.array([nn1], pa.int64()),
        "simpson": pa.array([round(nn1 / den, 6) if den else 0.0],
                            pa.float64())})


_DOCS_SIMPSON_SQL = """
WITH tc AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                     AS term
            FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tc GROUP BY term)
SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(n * (n - 1)) AS BIGINT) AS sum_nn1,
       ROUND(CAST(SUM(n * (n - 1)) AS DOUBLE)
             / (SUM(n) * (SUM(n) - 1)), 6) AS simpson
FROM c
"""


def customer_rfm_segments(sf_dir: str):
    """X2 — RFM quartile segmentation: the classic marketing-warehouse
    composite — each customer scored by Recency (last order date),
    Frequency (order count) and Monetary (revenue cents), each as a
    global NTILE(4) (1 = best), concatenated into a 3-digit segment.
    All three tiles ride the exact range-partitioned NTILE plan with
    custkey tie-breaks, so segment assignment is bit-identical to SQL.

    Scale shape: fact → per-customer combiner aggregate; three
    two-pass global ntiles over the customer-sized table (driver holds
    per-partition boundary samples only); output ≤ 64 segment rows."""
    from .functions.rank import ntile

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "day": pc.divide(pc.cast(pc.cast(
                t["o_orderdate"], pa.timestamp("us")), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64())),
            "cents": _cents(t["o_totalprice"])})

    agg = (orders.map_batches(prep, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Max("day", alias_name="last_day"),
                      Count(alias_name="n_orders"),
                      Sum("cents", alias_name="rev"))
           .materialize())
    r = ntile(agg, 4, order_by=["last_day", "o_custkey"],
              descending=[True, False], out_col="r")
    f = ntile(r, 4, order_by=["n_orders", "o_custkey"],
              descending=[True, False], out_col="f")
    m = ntile(f, 4, order_by=["rev", "o_custkey"],
              descending=[True, False], out_col="m")

    def seg(t: pa.Table) -> pa.Table:
        s = (100 * t["r"].to_numpy(zero_copy_only=False)
             + 10 * t["f"].to_numpy(zero_copy_only=False)
             + t["m"].to_numpy(zero_copy_only=False))
        return (pa.table({"segment": pa.array(s, pa.int64())})
                .group_by("segment").aggregate([([], "count_all")])
                .rename_columns(["segment", "n"]))

    return (m.map_batches(seg, batch_format="pyarrow")
            .groupby("segment").aggregate(Sum("n", alias_name="n_customers"))
            .sort("segment"))


_CUSTOMER_RFM_SQL = """
WITH agg AS (SELECT o_custkey,
        MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000)
          AS last_day,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS rev
      FROM orders GROUP BY 1),
t AS (SELECT NTILE(4) OVER (ORDER BY last_day DESC, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY rev DESC, o_custkey) AS m
      FROM agg)
SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM t GROUP BY 1 ORDER BY segment
"""


def orders_cdc_diff(sf_dir: str):
    """S11 — CDC snapshot diff: classify every key across two table
    versions as inserted / deleted / updated / unchanged and report
    per-class row counts + the exact net price delta — the
    change-data-capture audit run before publishing an incremental
    feed. Snapshot B is derived deterministically from the base (every
    7th key deleted, every 10th surviving key +100 cents, every 13th
    key re-inserted under a shifted keyspace), and BOTH engines derive
    it identically, so the diff itself — Ray's native hash
    full-outer join on the key — is what's under test.

    Scale shape: only (key, cents) pairs move through the outer join;
    per-class combiner partials reduce to ≤ 4 rows."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "a_cents": _cents(t["o_totalprice"])})

    base = read_table(sf_dir, "orders",
                      columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(prep, batch_format="pyarrow").materialize()

    def make_b(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        c = t["a_cents"].to_numpy(zero_copy_only=False)
        keep = k % 7 != 3                      # deletions
        kk, cc = k[keep], c[keep]
        upd = kk % 10 == 0                     # updates
        cc = cc + np.where(upd, 100, 0)
        ins = k % 13 == 0                      # re-inserts, new keyspace
        return pa.table({
            "o_orderkey": pa.array(
                np.concatenate([kk, k[ins] + 1_000_000_000]), pa.int64()),
            "b_cents": pa.array(
                np.concatenate([cc, c[ins] + 5]), pa.int64())})

    snap_b = base.map_batches(make_b, batch_format="pyarrow") \
        .materialize()
    joined = base.join(snap_b, join_type="full_outer",
                       num_partitions=_join_parts(sf_dir, "orders"),
                       on=("o_orderkey",), right_on=("o_orderkey",))

    def classify(t: pa.Table) -> pa.Table:
        a = t["a_cents"].to_pandas()
        b = t["b_cents"].to_pandas()
        ct = np.where(a.isna(), "inserted",
                      np.where(b.isna(), "deleted",
                               np.where(a == b, "unchanged", "updated")))
        delta = b.fillna(0).astype(np.int64) \
            - a.fillna(0).astype(np.int64)
        df = pd.DataFrame({"change_type": ct, "n": 1, "delta": delta})
        g = df.groupby("change_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(classify, batch_format="pyarrow")
            .groupby("change_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("delta", alias_name="net_delta_cents"))
            .sort("change_type"))


_ORDERS_CDC_SQL = """
WITH a AS (SELECT o_orderkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS a_cents
           FROM orders),
surv AS (SELECT o_orderkey,
                a_cents + CASE WHEN o_orderkey % 10 = 0
                               THEN 100 ELSE 0 END AS b_cents
         FROM a WHERE o_orderkey % 7 != 3),
ins AS (SELECT o_orderkey + 1000000000 AS o_orderkey,
               a_cents + 5 AS b_cents
        FROM a WHERE o_orderkey % 13 = 0),
b AS (SELECT * FROM surv UNION ALL SELECT * FROM ins),
d AS (SELECT CASE WHEN a.o_orderkey IS NULL THEN 'inserted'
                  WHEN b.o_orderkey IS NULL THEN 'deleted'
                  WHEN a.a_cents = b.b_cents THEN 'unchanged'
                  ELSE 'updated' END AS change_type,
             COALESCE(b.b_cents, 0) - COALESCE(a.a_cents, 0) AS delta
      FROM a FULL OUTER JOIN b USING (o_orderkey))
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(delta) AS BIGINT) AS net_delta_cents
FROM d GROUP BY 1 ORDER BY change_type
"""


def docs_charclass_profile(sf_dir: str):
    """T11 — character-class census per language: total letters,
    digits, whitespace and other characters — the encoding / corruption
    profile a text-ingest monitor tracks (a digit or "other" spike
    flags binary bleed-through or markup). Four vectorized
    count_substring_regex kernels per batch; exact int64 partials.

    Scale shape: ≤ #langs rows per batch shuffle; nothing else."""
    ds = read_table(sf_dir, "documents", columns=["lang", "text"],
                    rows_per_block=500)

    def counts(t: pa.Table) -> pa.Table:
        txt = t["text"]
        df = pd.DataFrame({
            "lang": t["lang"].to_pandas(),
            "n_alpha": pc.count_substring_regex(txt, "[A-Za-z]")
            .to_pandas().astype(np.int64),
            "n_digit": pc.count_substring_regex(txt, "[0-9]")
            .to_pandas().astype(np.int64),
            "n_space": pc.count_substring_regex(txt, r"\s")
            .to_pandas().astype(np.int64),
            "n_chars": pc.utf8_length(txt).to_pandas().astype(np.int64)})
        g = df.groupby("lang", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(counts, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n_alpha", alias_name="n_alpha"),
                      Sum("n_digit", alias_name="n_digit"),
                      Sum("n_space", alias_name="n_space"),
                      Sum("n_chars", alias_name="n_chars")))

    def other(t: pa.Table) -> pa.Table:
        oth = (t["n_chars"].to_numpy(zero_copy_only=False)
               - t["n_alpha"].to_numpy(zero_copy_only=False)
               - t["n_digit"].to_numpy(zero_copy_only=False)
               - t["n_space"].to_numpy(zero_copy_only=False))
        return t.append_column("n_other", pa.array(oth, pa.int64()))

    return out.map_batches(other, batch_format="pyarrow").sort("lang")


_DOCS_CHARCLASS_SQL = r"""
SELECT lang,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]'))) AS BIGINT)
         AS n_alpha,
       CAST(SUM(len(regexp_extract_all(text, '[0-9]'))) AS BIGINT)
         AS n_digit,
       CAST(SUM(len(regexp_extract_all(text, '\s'))) AS BIGINT)
         AS n_space,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(length(text))
            - SUM(len(regexp_extract_all(text, '[A-Za-z]')))
            - SUM(len(regexp_extract_all(text, '[0-9]')))
            - SUM(len(regexp_extract_all(text, '\s'))) AS BIGINT)
         AS n_other
FROM documents GROUP BY lang ORDER BY lang
"""


def docs_parquet_roundtrip(sf_dir: str):
    """S12 — hive-partitioned Parquet sink + re-read (the resumable
    output layout the brief mandates — one directory per partition key):
    documents stream to /tmp partitioned by lang, are read BACK through
    `read_parquet` (partition values parsed from the path), and the
    re-read table must aggregate identically to the source view —
    a lossless-roundtrip proof for the primary sink, same contract as
    [[docs_arrow_ipc_roundtrip]] for the IPC sink.

    Scale shape: write and re-read both stream block-wise; the
    aggregate is the usual per-lang combiner."""
    import tempfile

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "text"],
                      rows_per_block=500)
    out_dir = tempfile.mkdtemp(prefix="ies_pq_roundtrip_")
    docs.write_parquet(out_dir, partition_cols=["lang"])

    back = ray.data.read_parquet(out_dir)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": pc.cast(t["lang"], pa.string()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
            "doc_id": t["doc_id"]})

    return (back.map_batches(prep, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="sum_tokens"),
                       Min("doc_id", alias_name="min_doc_id"),
                       Max("doc_id", alias_name="max_doc_id"))
            .sort("lang"))


_DOCS_PQ_ROUNDTRIP_SQL = r"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
         AS sum_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM documents GROUP BY lang ORDER BY lang
"""


def lineitem_ship_lag_quantiles(sf_dir: str):
    """G53 — order-to-ship lag quantiles per return flag: exact P50/P90
    of (l_shipdate − o_orderdate) in days — the fulfillment-SLA readout,
    and the registry's only grouped quantile computed ACROSS a fact-fact
    join (lineitem ⋈ orders on orderkey through [[auto_join]]'s chooser).
    Day lags are pure integer date arithmetic; the per-flag quantiles
    use the hash-partitioned map_groups plan (quantile_disc semantics).

    Scale shape: only (orderkey, day) pairs build the join side; lags
    collapse to 3 flag partitions for the quantile pass."""
    import math as _math

    from .functions.arrowutil import to_arrow
    from .functions.joins import auto_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda t: pa.table({
            "o_orderkey": t["o_orderkey"],
            "oday": pc.divide(pc.cast(pc.cast(
                t["o_orderdate"], pa.timestamp("us")), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()))}),
            batch_format="pyarrow")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_returnflag", "l_shipdate"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_returnflag": t["l_returnflag"],
            "sday": pc.divide(pc.cast(pc.cast(
                t["l_shipdate"], pa.timestamp("us")), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()))}),
            batch_format="pyarrow")
    joined = auto_join(li, orders, left_key="l_orderkey",
                       right_key="o_orderkey", right_cols=["oday"])

    lag = joined.map_batches(
        lambda t: pa.table({
            "l_returnflag": t["l_returnflag"],
            "lag_days": pc.subtract(t["sday"], t["oday"])}),
        batch_format="pyarrow")

    def prep(t: pa.Table) -> pa.Table:
        part_ids = pd.util.hash_pandas_object(
            pd.Series(t["l_returnflag"].to_pandas()), index=False) % 8
        return t.append_column("part",
                               pa.array(part_ids.to_numpy(), pa.int64()))

    out_schema = pa.schema([("l_returnflag", pa.string()),
                            ("p50_days", pa.int64()),
                            ("p90_days", pa.int64())])

    def quants(g: pd.DataFrame) -> pa.Table:
        rows = []
        for fl, grp in g.groupby("l_returnflag", sort=False):
            v = np.sort(grp["lag_days"].to_numpy())
            rows.append({
                "l_returnflag": fl,
                "p50_days": int(v[max(1, _math.ceil(0.5 * len(v))) - 1]),
                "p90_days": int(v[max(1, _math.ceil(0.9 * len(v))) - 1])})
        return to_arrow(pd.DataFrame(rows), out_schema)

    return (lag.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(quants, batch_format="pandas")
            .sort("l_returnflag"))


_LINEITEM_SHIPLAG_SQL = """
WITH d AS (SELECT l.l_returnflag,
                  epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
                    // 86400000000
                  - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                    // 86400000000 AS lag_days
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey)
SELECT l_returnflag,
       quantile_disc(lag_days, 0.5) AS p50_days,
       quantile_disc(lag_days, 0.9) AS p90_days
FROM d GROUP BY 1 ORDER BY l_returnflag
"""


def docs_word_len_hist(sf_dir: str):
    """T12 — word-length distribution: corpus-wide histogram of term
    lengths in characters — the cheap language/quality fingerprint
    (Gopher's mean-word-length gate generalized to the full
    distribution; a spike at extreme lengths flags minified or
    concatenated junk). Counts are exact int64.

    Scale shape: lengths histogram per batch (≤ max-word-length rows
    per batch — lengths, not words, shuffle)."""
    from .functions.terms import _TERM_RE

    ds = read_table(sf_dir, "documents", columns=["text"],
                    rows_per_block=500)

    def lens(t: pa.Table) -> pa.Table:
        ls: list = []
        for txt in t["text"].to_pylist():
            ls.extend(len(w) for w in _TERM_RE.findall((txt or "").lower()))
        if not ls:
            return pa.table({"word_len": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vc = pd.Series(ls).value_counts()
        return pa.table({
            "word_len": pa.array(vc.index.to_numpy(), pa.int64()),
            "n": pa.array(vc.to_numpy(), pa.int64())})

    return (ds.map_batches(lens, batch_format="pyarrow")
            .groupby("word_len").aggregate(Sum("n", alias_name="n"))
            .sort("word_len"))


_DOCS_WORDLEN_SQL = """
WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    AS term
           FROM documents)
SELECT CAST(length(term) AS BIGINT) AS word_len,
       CAST(COUNT(*) AS BIGINT) AS n
FROM w GROUP BY 1 ORDER BY word_len
"""


def events_peak_hour_per_type(sf_dir: str):
    """G54 — grouped ARGMAX: the peak hour-of-day per event type (count
    ties broken toward the earlier hour) — the "when does each segment
    fire" primitive dashboards need, and the registry's canonical
    per-group argmax (SQL arg_max has no tie contract, so both engines
    pin the order explicitly: n DESC, hour ASC via ROW_NUMBER = 1).

    Scale shape: fact → (type, hour) count combiner (≤ 24·#types rows);
    the argmax is [[topk_per_key]] k=1 over that tiny table."""
    from .functions.window import topk_per_key

    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def hours(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hod = pc.subtract(
            pc.divide(us, pa.scalar(3_600_000_000, pa.int64())),
            pc.multiply(pc.divide(us, pa.scalar(86_400_000_000,
                                                pa.int64())),
                        pa.scalar(24, pa.int64())))
        return (pa.table({"event_type": t["event_type"], "hour": hod})
                .group_by(["event_type", "hour"])
                .aggregate([([], "count_all")])
                .rename_columns(["event_type", "hour", "n"]))

    counts = (ev.map_batches(hours, batch_format="pyarrow")
              .groupby(["event_type", "hour"])
              .aggregate(Sum("n", alias_name="n")))
    top = topk_per_key(counts, 1, keys=["event_type"],
                       order_by=["n", "hour"], descending=[True, False])
    return (top.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "peak_hour": t["hour"], "n": t["n"]}),
        batch_format="pyarrow").sort("event_type"))


_EVENTS_PEAK_HOUR_SQL = """
WITH c AS (SELECT event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, hour, n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY n DESC, hour) AS rn
      FROM c)
SELECT event_type, hour AS peak_hour, n FROM r WHERE rn = 1
ORDER BY event_type
"""


def emb_centroid_drift(sf_dir: str):
    """V7 — embedding-centroid drift per label: the L2 distance between
    each label's centroid over even-id vs odd-id vectors — the
    embedding-space drift monitor run between two corpus snapshots (a
    large shift = the upstream encoder or data mix changed). All
    per-(label, half, dim) sums ride the exact int64 micro-unit
    contract shared with [[emb_label_centroids]]; the final
    sqrt(Σ(μₐ−μᵦ)²)/1e6 is driver math over ≤ labels×2×dim exact rows,
    4 dp.

    Scale shape: vectors collapse to (label, half, dim) partial sums
    per batch — dim-bounded rows shuffle, never vectors."""
    import math as _math

    from .functions.similarity import _as_matrix

    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = (t["vec_id"].to_numpy(zero_copy_only=False) % 2) \
            .astype(np.int64)
        m = np.round(_as_matrix(t["embedding"], dtype=np.float64)
                     * 1e6).astype(np.int64)
        dim = m.shape[1]
        df = pd.DataFrame({
            "label": np.repeat(lab, dim),
            "h": np.repeat(half, dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64),
                           len(lab)),
            "s": m.reshape(-1), "n": 1})
        g = df.groupby(["label", "h", "dim"], sort=False).sum() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["label", "h", "dim"])
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
            .take_all())                      # ≤ labels×2×dim rows
    acc: dict = {}
    for r in rows:
        acc.setdefault((int(r["label"]), int(r["dim"])), {})[int(r["h"])] \
            = (int(r["s"]), int(r["n"]))
    per_label: dict = {}
    for (lab, _dim), hs in acc.items():
        if 0 in hs and 1 in hs:
            (sa, na), (sb, nb) = hs[0], hs[1]
            d = sa / na - sb / nb
            per_label[lab] = per_label.get(lab, 0.0) + d * d
    labs = sorted(per_label)
    return pa.table({
        "label": pa.array(labs, pa.int64()),
        "centroid_shift": pa.array(
            [round(_math.sqrt(per_label[l]) / 1e6, 4) for l in labs],
            pa.float64())})


_EMB_DRIFT_SQL = """
WITH u AS (SELECT label, vec_id % 2 AS h,
                  generate_subscripts(embedding, 1) AS dim,
                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                       AS BIGINT) AS v
           FROM embeddings),
s AS (SELECT label, h, dim, CAST(SUM(v) AS BIGINT) s,
             CAST(COUNT(*) AS BIGINT) n
      FROM u GROUP BY 1, 2, 3),
p AS (SELECT a.label, a.dim,
             CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n AS d
      FROM s a JOIN s b
        ON a.label = b.label AND a.dim = b.dim AND a.h = 0 AND b.h = 1)
SELECT CAST(label AS BIGINT) AS label,
       ROUND(sqrt(SUM(d * d)) / 1000000, 4) AS centroid_shift
FROM p GROUP BY label ORDER BY label
"""


def part_size_price_spearman(sf_dir: str):
    """G55 — EXACT Spearman rank correlation between part size and
    retail price: the monotonic-association check run where Pearson
    (lineitem_qty_price_corr) misreads nonlinear scales. Tie-corrected
    average ranks come out exactly: ranks within a tie group are
    contiguous under the (value, unique key) global order, so
    2·avg_rank = min_rank + max_rank — an INTEGER. Pearson over those
    doubled ranks (the ×2 cancels) uses int64 per-batch moments with
    the final combine in arbitrary-precision Python (oracle: HUGEINT);
    int64 partials hold to ~20M parts — the headroom note mirrors
    [[orders_price_gini]].

    Scale shape: two exact global-rank passes + a tie-group min/max
    groupby each; five combiner scalars per batch; ONE row out."""
    import math as _math

    from .functions.joins import auto_join
    from .functions.rank import global_row_number

    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_size", "p_retailprice"])
    base = part.map_batches(
        lambda t: pa.table({"p_partkey": t["p_partkey"],
                            "size": pc.cast(t["p_size"], pa.int64()),
                            "cents": _cents(t["p_retailprice"])}),
        batch_format="pyarrow").materialize()

    def doubled_rank(col: str, out: str):
        rn = global_row_number(base, order_by=[col, "p_partkey"],
                               descending=[False, False], out_col="_rn")
        grp = (rn.groupby(col)
               .aggregate(Min("_rn", alias_name="_lo"),
                          Max("_rn", alias_name="_hi")))
        r2 = grp.map_batches(
            lambda t: pa.table({
                col: t[col],
                out: pc.add(t["_lo"], t["_hi"])}),
            batch_format="pyarrow")
        return auto_join(base.select_columns(["p_partkey", col]), r2,
                         left_key=col, right_key=col, right_cols=[out]) \
            .select_columns(["p_partkey", out])

    rx = doubled_rank("size", "r2x")
    ry = doubled_rank("cents", "r2y")
    both = auto_join(rx, ry, left_key="p_partkey", right_key="p_partkey",
                     right_cols=["r2y"])
    n_total = base.count()
    c0 = n_total + 1                           # E[2·rank] = n+1

    def moments(t: pa.Table) -> pa.Table:
        x = t["r2x"].to_numpy(zero_copy_only=False) - c0
        y = t["r2y"].to_numpy(zero_copy_only=False) - c0
        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    m = both.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"))
    n = int(m["n"] or 0)
    sx, sy = int(m["sx"] or 0), int(m["sy"] or 0)
    sxx, syy, sxy = int(m["sxx"] or 0), int(m["syy"] or 0), \
        int(m["sxy"] or 0)
    num = n * sxy - sx * sy                    # exact bigints
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    rho = float(num) / _math.sqrt(float(den)) if den > 0 else 0.0
    return pa.table({
        "n_parts": pa.array([n], pa.int64()),
        "spearman_rho": pa.array([round(rho, 4)], pa.float64())})


_PART_SPEARMAN_SQL = """
WITH b AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
                  CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
           FROM part),
rx AS (SELECT p_partkey,
              CAST(MIN(rn) OVER (PARTITION BY size)
                   + MAX(rn) OVER (PARTITION BY size) AS BIGINT) AS r2x
       FROM (SELECT p_partkey, size,
                    ROW_NUMBER() OVER (ORDER BY size, p_partkey) AS rn
             FROM b)),
ry AS (SELECT p_partkey,
              CAST(MIN(rn) OVER (PARTITION BY cents)
                   + MAX(rn) OVER (PARTITION BY cents) AS BIGINT) AS r2y
       FROM (SELECT p_partkey, cents,
                    ROW_NUMBER() OVER (ORDER BY cents, p_partkey) AS rn
             FROM b)),
j AS (SELECT CAST(rx.r2x - (SELECT COUNT(*) + 1 FROM b) AS HUGEINT) x,
             CAST(ry.r2y - (SELECT COUNT(*) + 1 FROM b) AS HUGEINT) y
      FROM rx JOIN ry USING (p_partkey)),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) n, SUM(x) sx, SUM(y) sy,
             SUM(x * x) sxx, SUM(y * y) syy, SUM(x * y) sxy
      FROM j)
SELECT CAST(n AS BIGINT) AS n_parts,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST((n * sxx - sx * sx) * (n * syy - sy * sy)
                         AS DOUBLE)), 4) AS spearman_rho
FROM m
"""


def orders_keyspace_gaps(sf_dir: str):
    """S13 — keyspace-continuity audit: count and largest run of MISSING
    keys in the o_orderkey sequence — the ingest-completeness check run
    before declaring a backfill done (the synthetic keyspace is dense,
    so zeros here; planted-gap path unit-tested). The global
    LEAD is the exact two-pass rank plan + a self-join of rank n onto
    rank n+1 through [[auto_join]]'s chooser — integer end-to-end.

    Scale shape: only (key, rank) pairs move; consecutive-pair gaps
    collapse through Max/Sum combiners to ONE row."""
    from .functions.joins import auto_join
    from .functions.rank import global_row_number

    keys = read_table(sf_dir, "orders", columns=["o_orderkey"]) \
        .map_batches(lambda t: pa.table({"k": t["o_orderkey"]}),
                     batch_format="pyarrow").materialize()
    n_keys = keys.count()
    mm = keys.aggregate(Min("k"), Max("k"))
    ranked = global_row_number(keys, order_by=["k"], out_col="rn") \
        .materialize()
    nxt = ranked.map_batches(
        lambda t: pa.table({"rnm1": pc.subtract(
            t["rn"], pa.scalar(1, pa.int64())), "k2": t["k"]}),
        batch_format="pyarrow")
    pairs = auto_join(ranked, nxt, left_key="rn", right_key="rnm1",
                      right_cols=["k2"])

    def gaps(t: pa.Table) -> pa.Table:
        g = (t["k2"].to_numpy(zero_copy_only=False)
             - t["k"].to_numpy(zero_copy_only=False) - 1)
        return pa.table({
            "miss": pa.array([int(g.sum())], pa.int64()),
            "big": pa.array([int(g.max()) if len(g) else 0], pa.int64())})

    m = pairs.map_batches(gaps, batch_format="pyarrow").aggregate(
        Sum("miss", alias_name="miss"), Max("big", alias_name="big"))
    return pa.table({
        "n_keys": pa.array([n_keys], pa.int64()),
        "min_key": pa.array([int(mm["min(k)"])], pa.int64()),
        "max_key": pa.array([int(mm["max(k)"])], pa.int64()),
        "n_missing": pa.array([int(m["miss"] or 0)], pa.int64()),
        "largest_gap": pa.array([int(m["big"] or 0)], pa.int64())})


def customer_tree_rollup(sf_dir: str):
    """KG7 — recursive hierarchy closure + subtree rollup (the taxonomy /
    ontology-class aggregate a KG needs: "total X under each node of the
    class tree"). A deterministic binary-heap hierarchy is derived from
    the customer table (parent of balance-rank r is rank r//2), the full
    ancestor closure is built by POINTER DOUBLING — O(log depth) rounds,
    each composing the known 1..2^k-distance ancestor set with the
    exact-2^k jump table, so every (node, ancestor) pair is produced
    exactly once and NO dedup shuffle is ever needed — then subtree size
    and balance are one groupby over the skinny closure. Top-10 subtrees.

    Scale shape: the closure is n·depth skinny int64 pairs (the inherent
    cost of hierarchy closure); each round shuffles only (rn, rn') pairs
    through [[auto_join]]'s size chooser, the rollup is a combiner-backed
    groupby, and the output is 10 rows. Depth-d hierarchies finish in
    ceil(log2(d)) join rounds, not d."""
    from .functions.joins import auto_join
    from .functions.rank import global_row_number

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_acctbal"])
    ranked = global_row_number(cust, order_by=["c_acctbal", "c_custkey"],
                               out_col="rn")
    nodes = ranked.map_batches(
        lambda t: pa.table({"rn": t["rn"], "bal": _cents(t["c_acctbal"]),
                            "custkey": t["c_custkey"]}),
        batch_format="pyarrow").materialize()

    two = pa.scalar(2, pa.int64())

    def mk_jump(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["rn"], two))
        return pa.table({"node": t["rn"], "top": pc.divide(t["rn"], two)})

    # J_0: the exact-2^0 ancestor (heap parent); C_0 = J_0 as (node, anc)
    jump = nodes.map_batches(mk_jump, batch_format="pyarrow").materialize()
    closure = jump.map_batches(
        lambda t: pa.table({"node": t["node"], "anc": t["top"]}),
        batch_format="pyarrow").materialize()
    while True:
        # distances 2^k+1 .. 2^{k+1}: hop to the 2^k ancestor, then take
        # ITS known 1..2^k ancestors — disjoint from closure by distance
        grown = auto_join(
            jump,
            closure.map_batches(
                lambda t: pa.table({"cnode": t["node"], "anc": t["anc"]}),
                batch_format="pyarrow"),
            left_key="top", right_key="cnode", right_cols=["anc"]
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "anc": t["anc"]}),
            batch_format="pyarrow").materialize()
        if grown.count() == 0:
            break
        closure = closure.union(grown).materialize()
        jump = auto_join(                       # J_{k+1}(n) = J_k(J_k(n))
            jump.map_batches(
                lambda t: pa.table({"node": t["node"], "mid": t["top"]}),
                batch_format="pyarrow"),
            jump.map_batches(
                lambda t: pa.table({"jnode": t["node"], "top": t["top"]}),
                batch_format="pyarrow"),
            left_key="mid", right_key="jnode", right_cols=["top"]
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "top": t["top"]}),
            batch_format="pyarrow").materialize()

    self_pairs = nodes.map_batches(
        lambda t: pa.table({"node": t["rn"], "anc": t["rn"]}),
        batch_format="pyarrow")
    contrib = auto_join(
        closure.union(self_pairs),
        nodes.map_batches(
            lambda t: pa.table({"bnode": t["rn"], "bal": t["bal"]}),
            batch_format="pyarrow"),
        left_key="node", right_key="bnode", right_cols=["bal"])
    agg = contrib.groupby("anc").aggregate(
        Sum("bal", alias_name="subtree_bal_cents"),
        Count(alias_name="subtree_size"))
    out = auto_join(agg, nodes, left_key="anc", right_key="rn",
                    right_cols=["custkey"])
    return (out.select_columns(["custkey", "subtree_size",
                                "subtree_bal_cents"])
            .sort(["subtree_size", "custkey"], descending=[True, False])
            .limit(10))


def docs_jaccard_prefix_join(sf_dir: str):
    """D16 — EXACT set-similarity self-join, Jaccard ≥ 0.9 over distinct
    word-token sets, via PPJoin-style PREFIX FILTERING (Xiao et al. 2008,
    public): under a global rare-first token order, two sets with
    J ≥ τ MUST share a token inside each one's first
    ``n - ceil(τ·n) + 1`` tokens — a NECESSARY condition, so unlike the
    min-shingle co-bucketing of [[docs_ngram_jaccard]] this path is exact
    by construction, not near-exact by heuristic.

    Plan (all shuffles key-partitioned, no vocabulary broadcast
    required): explode→distinct (doc, token); token df via per-batch
    combiner + groupby; df attaches back by a token join through
    ``auto_join``'s size chooser; per-doc prefix emission from
    hash-bucketed doc groups; candidates pair up inside PREFIX-token
    buckets (rare-first order ⇒ the bucketed tokens are each doc's
    rarest, the smallest df classes); exact verify runs only on
    OUTPUT-sized candidates with the integer predicate 10·|∩| ≥ 9·|∪|
    (no float threshold). The synthetic 40-word vocabulary makes
    blocking weak (dense sets overlap heavily) — exactness is what's
    under test; selectivity comes with real vocabularies."""
    from .functions.joins import auto_join
    from .functions.partitions import default_parts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=500)
    # data-sized buckets (metadata-only count): each bucket is a shuffle
    # group; tiny corpora must not pay 16+ aggregator spawns
    nparts = max(2, min(default_parts(),
                        docs.count() * 32 // 250_000 + 1))

    def explode(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        d["tk"] = d["text"].str.split(" ")
        d = d[["doc_id", "tk"]].explode("tk")
        d = d[d["tk"].astype(str).str.len() > 0].drop_duplicates()
        return pa.table({"doc_id": pa.array(d["doc_id"], pa.int64()),
                         "tk": pa.array(d["tk"], pa.string())})

    tok = docs.map_batches(explode, batch_format="pyarrow").materialize()

    def df_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("tk").aggregate([("doc_id", "count")])
        return pa.table({"tk": g["tk"],
                         "pdf": pc.cast(g["doc_id_count"], pa.int64())})

    df = tok.map_batches(df_combine, batch_format="pyarrow") \
        .groupby("tk").aggregate(Sum("pdf", alias_name="df"))
    tokdf = auto_join(tok, df, left_key="tk", right_key="tk",
                      right_cols=["df"])

    def bucket(t: pa.Table, col: str) -> pa.Table:
        return add_bucket(t, [col], nparts, "part")

    bucketed = tokdf.map_batches(lambda t: bucket(t, "doc_id"),
                                 batch_format="pyarrow").materialize()

    def prefixes(g: pd.DataFrame) -> pa.Table:
        ids, tks = [], []
        for did, grp in g.groupby("doc_id"):
            grp = grp.sort_values(["df", "tk"], kind="mergesort")
            n = len(grp)
            p = n - (9 * n + 9) // 10 + 1          # n - ceil(0.9 n) + 1
            ids.extend([did] * p)
            tks.extend(grp["tk"].iloc[:p])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "tk": pa.array(tks, pa.string())})

    prefix = bucketed.groupby("part") \
        .map_groups(prefixes, batch_format="pandas")

    def sets_of(g: pd.DataFrame) -> pa.Table:
        # the set travels as one sorted space-joined string: join-safe
        # (list columns don't survive the broadcast merge path) and the
        # tokens are whitespace-free by construction
        ids, toks, ns = [], [], []
        for did, grp in g.groupby("doc_id"):
            ids.append(did)
            toks.append(" ".join(sorted(grp["tk"])))
            ns.append(len(grp))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "toks": pa.array(toks, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    sets = bucketed.groupby("part") \
        .map_groups(sets_of, batch_format="pandas").materialize()

    def cand_pairs(g: pd.DataFrame) -> pa.Table:
        oa, ob = [], []
        for _, grp in g.groupby("tk"):
            ids = np.sort(grp["doc_id"].to_numpy())
            iu, il = np.triu_indices(len(ids), k=1)
            oa.append(ids[iu])
            ob.append(ids[il])
        a = np.concatenate(oa) if oa else np.empty(0, np.int64)
        b = np.concatenate(ob) if ob else np.empty(0, np.int64)
        # batch-local pair dedup (a pair repeats once per shared prefix
        # token) — combiner before the global distinct shuffle
        packed = np.unique(np.stack([a, b], axis=1), axis=0) \
            if len(a) else np.empty((0, 2), np.int64)
        return pa.table({"id_a": pa.array(packed[:, 0], pa.int64()),
                         "id_b": pa.array(packed[:, 1], pa.int64())})

    # global pair-dedup via hash-bucketed drop_duplicates: the (id_a,
    # id_b) key is near-unique, and a sort-groupby would walk every
    # 1-row group in Python (the _part_cooccur_counts pathology — this
    # single groupby was 90% of the query's wall)
    def pair_bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["id_a", "id_b"], nparts, "part")

    def pair_dedup(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["id_a", "id_b"])
        return pa.table({"id_a": pa.array(d["id_a"].to_numpy(np.int64)),
                         "id_b": pa.array(d["id_b"].to_numpy(np.int64))})

    cands = (prefix.map_batches(lambda t: bucket(t, "tk"),
                                batch_format="pyarrow")
             .groupby("part").map_groups(cand_pairs, batch_format="pandas")
             .map_batches(pair_bucket, batch_format="pyarrow")
             .groupby("part").map_groups(pair_dedup,
                                         batch_format="pandas"))

    with_a = auto_join(
        cands,
        sets.map_batches(lambda t: pa.table(
            {"sa": t["doc_id"], "ta": t["toks"], "na": t["n"]}),
            batch_format="pyarrow"),
        left_key="id_a", right_key="sa", right_cols=["ta", "na"])
    with_b = auto_join(
        with_a,
        sets.map_batches(lambda t: pa.table(
            {"sb": t["doc_id"], "tb": t["toks"], "nb": t["n"]}),
            batch_format="pyarrow"),
        left_key="id_b", right_key="sb", right_cols=["tb", "nb"])

    def verify(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        inter = np.fromiter(
            (len(set(a.split()) & set(b.split()))
             for a, b in zip(d["ta"], d["tb"])),
            dtype=np.int64, count=len(d))
        union = d["na"].to_numpy() + d["nb"].to_numpy() - inter
        keep = 10 * inter >= 9 * union
        jac = np.round(inter[keep] / union[keep], 4)
        return pa.table({
            "id_a": pa.array(d["id_a"].to_numpy()[keep], pa.int64()),
            "id_b": pa.array(d["id_b"].to_numpy()[keep], pa.int64()),
            "jaccard": pa.array(jac, pa.float64())})

    return with_b.map_batches(verify, batch_format="pyarrow") \
        .sort(["id_a", "id_b"])


_DOCS_JACCARD_PREFIX_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, tk FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents)
  WHERE tk <> ''
),
card AS (SELECT doc_id, COUNT(*) AS c FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS i
  FROM tok a JOIN tok b ON a.tk = b.tk AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       ROUND(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 4) AS jaccard
FROM inter
JOIN card ca ON ca.doc_id = ia
JOIN card cb ON cb.doc_id = ib
WHERE i * 10 >= (ca.c + cb.c - i) * 9
ORDER BY id_a, id_b
"""


_CUSTOMER_TREE_ROLLUP_SQL = """
WITH RECURSIVE ranked AS (
  SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal,
         ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS rn
  FROM customer
), chain AS (
  SELECT rn AS node, rn // 2 AS anc FROM ranked WHERE rn >= 2
  UNION ALL
  SELECT node, anc // 2 FROM chain WHERE anc >= 2
), rolled AS (
  SELECT p.anc, COUNT(*) AS cnt, SUM(d.bal) AS tot
  FROM chain p JOIN ranked d ON d.rn = p.node
  GROUP BY p.anc
)
SELECT r.c_custkey AS custkey,
       CAST(1 + COALESCE(rolled.cnt, 0) AS BIGINT) AS subtree_size,
       CAST(r.bal + COALESCE(rolled.tot, 0) AS BIGINT) AS subtree_bal_cents
FROM ranked r LEFT JOIN rolled ON rolled.anc = r.rn
ORDER BY subtree_size DESC, custkey
LIMIT 10
"""


_ORDERS_KEYGAPS_SQL = """
WITH k AS (SELECT o_orderkey AS k FROM orders),
l AS (SELECT k, LEAD(k) OVER (ORDER BY k) AS nk FROM k)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MIN(k) AS BIGINT) AS min_key,
       CAST(MAX(k) AS BIGINT) AS max_key,
       CAST(SUM(CASE WHEN nk IS NOT NULL THEN nk - k - 1 ELSE 0 END)
            AS BIGINT) AS n_missing,
       CAST(MAX(CASE WHEN nk IS NOT NULL THEN nk - k - 1 ELSE 0 END)
            AS BIGINT) AS largest_gap
FROM l
"""


def events_pattern_match(sf_dir: str):
    """W21 — MATCH_RECOGNIZE-style sequence pattern matching (the SQL:2016
    row-pattern primitive; also Flink CEP): per user, encode the
    (ts, event_id)-ordered event stream as one letter per event type and
    count NON-OVERLAPPING occurrences of the pattern ``s[cv]*p`` — an
    "uninterrupted conversion": a signup followed by a purchase with only
    clicks/views between. Because the repeat class ``[cv]`` excludes both
    anchor letters, every match necessarily ends at the FIRST purchase
    after its signup, so leftmost-first (Python re / RE2) and
    leftmost-longest (POSIX) engines agree and the count is
    engine-independent — that property is what makes this oracle-exact.

    Plan: user_id-bucketed groups (modulo parts — ids are dense ints, no
    hash needed), one in-group sort per bucket, per-user sequence strings
    built by a vectorized groupby-join, pattern counts via the compiled
    non-overlapping ``Series.str.count``. Shuffle width = |events| rows
    once; output = converting users only."""
    from .functions.partitions import default_parts

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    nparts = max(2, min(default_parts(),
                        ev.count() * 16 // 250_000 + 1))

    def add_part(t: pa.Table) -> pa.Table:
        part = t["user_id"].to_numpy(zero_copy_only=False) % nparts
        return t.append_column("part", pa.array(part, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        seq = g.groupby("user_id")["event_type"].agg(
            lambda s: "".join(x[0] for x in s))
        n = seq.str.count(r"s[cv]*p").astype(np.int64)
        keep = n > 0
        return pa.table({
            "user_id": pa.array(seq.index.to_numpy()[keep], pa.int64()),
            "n_conversions": pa.array(n.to_numpy()[keep], pa.int64()),
            "n_events": pa.array(seq.str.len().to_numpy()[keep],
                                 pa.int64()),
        })

    return (ev.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pandas")
            .sort("user_id"))


_EVENTS_PATTERN_SQL = """
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(regexp_split_to_array(seq, 's[cv]*p')) - 1 AS BIGINT)
         AS n_conversions,
       CAST(length(seq) AS BIGINT) AS n_events
FROM seqs
WHERE regexp_matches(seq, 's[cv]*p')
ORDER BY user_id
"""


def orders_weighted_sample(sf_dir: str):
    """O9 — weighted sampling without replacement (Efraimidis–Spirakis
    A-ES, public): each row draws priority u^(1/w); the global top-k by
    priority is an exact weighted sample. Here u is DETERMINISTIC — a
    Knuth multiplicative hash of the key, u = ((k·2654435761) mod 2^32
    + 1) / (2^32+1) ∈ (0,1] — so the sample is reproducible and
    SQL-oracle-checkable (both engines compute bit-identical u; priority
    compares via the monotone-equivalent ln(u)/w to avoid pow).

    Distributed shape: priorities are per-batch vectorized numpy; each
    batch emits only its LOCAL top-k (the combiner), so the final global
    sort sees ≤ k·n_batches skinny rows — no full-table shuffle. Weights
    are o_totalprice in integer cents."""
    K = 64
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        w = t["o_totalprice"].to_numpy(zero_copy_only=False)
        w_cents = np.round(w * 100.0).astype(np.int64)
        h = (key.astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(2 ** 32) + np.uint64(1)
        u = h.astype(np.float64) / 4294967297.0
        prio = np.log(u) / w_cents
        if len(prio) > K:
            idx = np.argpartition(-prio, K)[:K]
        else:
            idx = np.arange(len(prio))
        return pa.table({
            "o_orderkey": pa.array(key[idx], pa.int64()),
            "w_cents": pa.array(w_cents[idx], pa.int64()),
            "prio": pa.array(prio[idx], pa.float64()),
        })

    return (orders.map_batches(local_topk, batch_format="pyarrow")
            .sort(["prio", "o_orderkey"], descending=[True, False])
            .limit(K)
            .drop_columns(["prio"])
            .sort("o_orderkey"))


_ORDERS_WSAMPLE_SQL = """
SELECT o_orderkey, w_cents FROM (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents,
         ln(CAST((o_orderkey * 2654435761) % 4294967296 + 1 AS DOUBLE)
            / 4294967297.0)
           / CAST(round(o_totalprice * 100) AS BIGINT) AS prio
  FROM orders
  ORDER BY prio DESC, o_orderkey
  LIMIT 64
)
ORDER BY o_orderkey
"""


def events_trailing_window_count(sf_dir: str):
    """W22 — RANGE-frame time window (the value-based frame the ROWS-frame
    rolling family can't express): for every event, how many events the
    same user produced in the trailing hour INCLUDING ts-tie peers —
    SQL's ``RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW``. Peer
    semantics come for free from the two-searchsorted formulation
    (right bound at ts, left bound at ts − 1h), which is also what makes
    it vectorized: one sort + two ``np.searchsorted`` per user, no
    per-row loop.

    Scale shape: one modulo shuffle on user_id, per-bucket mergesort,
    output fact-sized and streaming."""
    from .functions.partitions import default_parts

    HOUR_US = 3_600_000_000
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"])
    nparts = max(2, min(default_parts(), ev.count() * 16 // 250_000 + 1))

    def add_part(t: pa.Table) -> pa.Table:
        part = t["user_id"].to_numpy(zero_copy_only=False) % nparts
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        out_id, out_n = [], []
        for _, grp in g.groupby("user_id", sort=False):
            ts = grp["ts_us"].to_numpy()
            hi = np.searchsorted(ts, ts, side="right")
            lo = np.searchsorted(ts, ts - HOUR_US, side="left")
            out_id.append(grp["event_id"].to_numpy())
            out_n.append(hi - lo)
        ids = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
        ns = np.concatenate(out_n) if out_n else np.empty(0, np.int64)
        return pa.table({"event_id": pa.array(ids, pa.int64()),
                         "n_trail_1h": pa.array(ns, pa.int64())})

    return (ev.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pandas")
            .sort("event_id"))


_EVENTS_TRAILWIN_SQL = """
SELECT event_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_trail_1h
FROM events ORDER BY event_id
"""


def lineitem_pk_fd_audit(sf_dir: str):
    """DQ1 — constraint audit (primary-key uniqueness + functional
    dependency), the data-contract gate a warehouse runs before
    publishing a table: (a) is (l_orderkey, l_linenumber) a real PK
    (duplicate count), (b) how many parts violate the FD
    l_partkey → l_suppkey (ship from >1 supplier — expected nonzero in
    TPC-H, the audit REPORTS rather than assumes). One row out.

    Scale shape: both checks are combiner-backed groupbys (per-batch
    pair-dedup before the shuffle); nothing driver-side but the
    single-row result."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_partkey",
                             "l_suppkey"])
    n_rows = li.count()

    # both distincts via hash-bucketed drop_duplicates: the PK pair is
    # near-unique BY DEFINITION (a sort-groupby walks every one-row
    # group in Python — 8.5 s → ~1 s at sf0.01, the
    # _part_cooccur_counts pathology)
    def _pair_distinct(ds, a: str, b: str):
        def tag(t: pa.Table) -> pa.Table:
            d = (t.select([a, b]).group_by([a, b]).aggregate([])
                 .rename_columns([a, b]))
            return add_bucket(d, [a, b], 16, "_p")

        def drop(g: pd.DataFrame) -> pa.Table:
            d = g.drop_duplicates([a, b])
            return pa.table({a: pa.array(d[a].to_numpy(np.int64)),
                             b: pa.array(d[b].to_numpy(np.int64))})

        return (ds.map_batches(tag, batch_format="pyarrow")
                .groupby("_p").map_groups(drop, batch_format="pandas"))

    n_pk = _pair_distinct(li, "l_orderkey", "l_linenumber").count()

    def supp_counts(g: pd.DataFrame) -> pa.Table:
        # bucketed by the full pair, but ALL pairs of one l_partkey can
        # span buckets — emit per-partition partial distinct-supp counts
        vc = (g.drop_duplicates(["l_partkey", "l_suppkey"])
              .groupby("l_partkey", sort=False).size()
              .reset_index(name="ns_part"))
        return pa.table({
            "l_partkey": pa.array(vc["l_partkey"].to_numpy(np.int64)),
            "ns_part": pa.array(vc["ns_part"].to_numpy(np.int64))})

    def ps_tag(t: pa.Table) -> pa.Table:
        d = (t.select(["l_partkey", "l_suppkey"])
             .group_by(["l_partkey", "l_suppkey"]).aggregate([])
             .rename_columns(["l_partkey", "l_suppkey"]))
        return add_bucket(d, ["l_partkey", "l_suppkey"], 16, "_p")

    fd_viol = (li.map_batches(ps_tag, batch_format="pyarrow")
               .groupby("_p").map_groups(supp_counts,
                                         batch_format="pandas")
               .groupby("l_partkey")
               .aggregate(Sum("ns_part", alias_name="n_supp"))
               .map_batches(
                   lambda t: t.filter(pc.greater(t["n_supp"], 1)),
                   batch_format="pyarrow").count())

    return pa.table({
        "n_rows": pa.array([n_rows], pa.int64()),
        "pk_dup_rows": pa.array([n_rows - n_pk], pa.int64()),
        "fd_violating_parts": pa.array([fd_viol], pa.int64()),
    })


_LINEITEM_PKFD_SQL = """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
         AS pk_dup_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT l_partkey FROM
             (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
           GROUP BY l_partkey HAVING COUNT(*) > 1))
         AS fd_violating_parts
"""


def docs_phrase_search(sf_dir: str):
    """I4 — positional-index phrase query: per-doc occurrence count of
    the exact bigram phrase "hash join" served the way a PRE-BUILT
    positional inverted index answers it — explode postings
    (doc, term, pos), keep only the two phrase terms' postings lists
    (the selective index lookup), co-partition by doc and intersect on
    pos+1. The no-index fast path (count within each text row locally,
    zero shuffle) is the degenerate plan when text and query arrive
    together; this query deliberately exercises the index-serving plan —
    tests assert the two plans agree.

    Scale shape: only the two terms' postings shuffle (index lookups are
    selective by construction); the match groupby is combiner-backed."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=2000)
    T1, T2 = "hash", "join"

    def postings(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        d["tk"] = d["text"].str.split(" ")
        d = d[["doc_id", "tk"]].explode("tk")
        d["pos"] = d.groupby("doc_id").cumcount()
        d = d[d["tk"].isin((T1, T2))]
        return pa.table({"doc_id": pa.array(d["doc_id"], pa.int64()),
                         "tk": pa.array(d["tk"], pa.string()),
                         "pos": pa.array(d["pos"], pa.int64())})

    post = docs.map_batches(postings, batch_format="pyarrow") \
        .materialize()

    def head_key(t: pa.Table) -> pa.Table:
        # postings of T1 keyed at pos, postings of T2 keyed at pos-1:
        # equal keys == adjacency, so the phrase match is ONE groupby
        is_t1 = pc.equal(t["tk"], T1)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        key = np.where(is_t1.to_numpy(zero_copy_only=False), pos, pos - 1)
        return pa.table({"doc_id": t["doc_id"], "tk": t["tk"],
                         "k": pa.array(key, pa.int64())})

    # one token per (doc, pos) ⇒ every (doc, k, tk) row is unique, so
    # rows-per-(doc, k) == 2 ⟺ T1@k AND T2@k+1 — no dedup pass needed
    matches = (post.map_batches(head_key, batch_format="pyarrow")
               .groupby(["doc_id", "k"])
               .aggregate(Count(alias_name="n_terms")))
    hits = matches.map_batches(
        lambda t: t.filter(pc.equal(t["n_terms"], 2)),
        batch_format="pyarrow")
    return (hits.groupby("doc_id")
            .aggregate(Count(alias_name="n_phrase"))
            .sort("doc_id"))


_DOCS_PHRASE_SQL = """
WITH arrs AS (SELECT doc_id, string_split(text, ' ') AS arr
              FROM documents),
pos AS (SELECT doc_id, arr,
               unnest(generate_series(1, len(arr) - 1)) AS i
        FROM arrs)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_phrase
FROM pos WHERE arr[i] = 'hash' AND arr[i + 1] = 'join'
GROUP BY doc_id ORDER BY doc_id
"""


def events_watermark_late(sf_dir: str):
    """ST1 — watermark late-data accounting (the Dataflow-model /
    Flink event-time primitive): events arrive in event_id order; the
    watermark at each arrival is the max event time of all PRIOR
    arrivals minus a 15-minute allowed delay; an event whose own time
    sits below that watermark is LATE. Per 1-hour tumbling event-time
    window, count on-time vs late arrivals — the audit that sizes the
    allowed-lateness knob before a streaming job drops data.

    The watermark is a GLOBAL exclusive running max in arrival order —
    [[global_running_max]]'s two-pass range-partition scan (per-partition
    maxes on the driver, everything else streams); window bucketing and
    the late gate are one vectorized map + a bounded groupby."""
    from .functions.rank import global_running_max

    DELAY_US = 900_000_000
    HOUR_US = 3_600_000_000
    ev = read_table(sf_dir, "events", columns=["event_id", "ts"])
    us = ev.map_batches(
        lambda t: pa.table({"event_id": t["event_id"],
                            "ts_us": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow")
    wm = global_running_max(us, "ts_us", order_by=["event_id"],
                            out_col="wm_us", exclusive=True)

    def gate(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        w = t["wm_us"].to_pandas()
        late = (w.notna().to_numpy()
                & (ts < w.fillna(np.iinfo(np.int64).min).to_numpy()
                   - DELAY_US))
        win = ts // HOUR_US * HOUR_US
        return pa.table({
            "window_start_us": pa.array(win, pa.int64()),
            "on_time": pa.array((~late).astype(np.int64), pa.int64()),
            "late": pa.array(late.astype(np.int64), pa.int64()),
        })

    return (wm.map_batches(gate, batch_format="pyarrow")
            .groupby("window_start_us")
            .aggregate(Sum("on_time", alias_name="n_on_time"),
                       Sum("late", alias_name="n_late"))
            .sort("window_start_us"))


_EVENTS_WATERMARK_SQL = """
WITH w AS (
  SELECT epoch_us(ts) AS t,
         MAX(epoch_us(ts)) OVER (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
)
SELECT (t // 3600000000) * 3600000000 AS window_start_us,
       CAST(SUM(CASE WHEN wm IS NULL OR t >= wm - 900000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
       CAST(SUM(CASE WHEN wm IS NOT NULL AND t < wm - 900000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY 1 ORDER BY 1
"""


def customer_k_anonymity(sf_dir: str):
    """DQ2 — k-anonymity audit (Sweeney, public; the governance gate
    before releasing a table keyed on quasi-identifiers): under the
    quasi-identifier (c_nationkey, c_mktsegment), how many equivalence
    classes have fewer than k=20 members, and how many ROWS sit in them
    (re-identifiable at that k). One bounded groupby (≤ |nations|×
    |segments| classes) behind a per-batch combiner; single row out."""
    K = 20
    cust = read_table(sf_dir, "customer",
                      columns=["c_nationkey", "c_mktsegment"])
    classes = (cust.map_batches(
        lambda t: t.group_by(["c_nationkey", "c_mktsegment"])
                   .aggregate([([], "count_all")])
                   .rename_columns(["c_nationkey", "c_mktsegment", "pn"]),
        batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("pn", alias_name="n")))

    def reduce_small(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        small = n < K
        return pa.table({
            "n_classes": pa.array([len(n)], pa.int64()),
            "small_classes": pa.array([int(small.sum())], pa.int64()),
            "rows_at_risk": pa.array([int(n[small].sum())], pa.int64()),
        })

    m = (classes.map_batches(reduce_small, batch_format="pyarrow")
         .aggregate(Sum("n_classes", alias_name="n_classes"),
                    Sum("small_classes", alias_name="small_classes"),
                    Sum("rows_at_risk", alias_name="rows_at_risk")))
    return pa.table({k: pa.array([int(m[k] or 0)], pa.int64())
                     for k in ("n_classes", "small_classes",
                               "rows_at_risk")})


_CUSTOMER_KANON_SQL = """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN n < 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS small_classes,
       CAST(COALESCE(SUM(CASE WHEN n < 20 THEN n END), 0) AS BIGINT)
         AS rows_at_risk
FROM cls
"""


def docs_gzip_ndjson_roundtrip(sf_dir: str):
    """S15 — compressed NDJSON source/sink (the wire format most web
    corpora actually arrive in — WET/WARC derivatives ship gzipped):
    documents → per-block ``.jsonl.gz`` shards written inside
    ``map_batches`` (stdlib gzip, shard name keyed by the block's min
    doc_id so concurrent writers never collide and a re-run overwrites
    rather than duplicates) → ``ray.data.read_json`` with an explicit
    gzip ``open_input_stream`` — then the same count+checksum aggregate
    as the plain-text round-trip, proving losslessness against the
    ORIGINAL parquet oracle."""
    import gzip
    import os
    import shutil

    out_dir = f"/tmp/ies_gzjsonl_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        if len(d) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        path = os.path.join(out_dir,
                            f"part-{int(d['doc_id'].min()):012d}.jsonl.gz")
        with gzip.open(path, "wt", encoding="utf-8") as f:
            d.to_json(f, orient="records", lines=True)
        return pa.table({"n": pa.array([len(d)], pa.int64())})

    # sink pass must complete before the read pass opens the directory
    read_table(sf_dir, "documents", columns=["doc_id", "lang"]) \
        .map_batches(write_shard, batch_format="pyarrow").materialize()

    back = ray.data.read_json(
        out_dir, file_extensions=["gz"],
        arrow_open_stream_args={"compression": "gzip"})
    return (back.groupby("lang")
            .aggregate(Count(alias_name="n"),
                       Sum("doc_id", alias_name="sum_doc_id"))
            .sort("lang"))


_DOCS_GZJSONL_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM documents GROUP BY lang ORDER BY lang
"""


def orders_mv_merge(sf_dir: str):
    """ETL2 — materialized-view maintenance by ALGEBRAIC partial-state
    merge: the base snapshot (even order keys) and a later delta batch
    (odd keys) each reduce to mergeable per-customer states
    (n, sum, min, max — a commutative monoid), and the refresh is a
    groupby-merge OF STATES, never a rescan of base facts. The oracle
    recomputes from all facts, so equality proves the merge operator is
    lossless — the property incremental view maintenance rests on.

    Scale shape: two combiner-backed state builds + one state-sized
    merge shuffle (|customers| rows, not |orders|)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def states(which: int):
        def prep(t: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(t["o_orderkey"], 1), which)
            t = t.filter(keep)
            cents = _cents(t["o_totalprice"])
            d = pd.DataFrame({"o_custkey": t["o_custkey"].to_pandas(),
                              "n": 1,
                              "s": cents.to_pandas(),
                              "mn": cents.to_pandas(),
                              "mx": cents.to_pandas()})
            g = d.groupby("o_custkey", sort=False).agg(
                n=("n", "sum"), s=("s", "sum"),
                mn=("mn", "min"), mx=("mx", "max")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return (orders.map_batches(prep, batch_format="pyarrow")
                .groupby("o_custkey")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("s", alias_name="s"),
                           Min("mn", alias_name="mn"),
                           Max("mx", alias_name="mx")))

    merged = (states(0).union(states(1))
              .groupby("o_custkey")
              .aggregate(Sum("n", alias_name="n_orders"),
                         Sum("s", alias_name="total_cents"),
                         Min("mn", alias_name="min_cents"),
                         Max("mx", alias_name="max_cents")))
    return merged.sort("o_custkey")


_ORDERS_MV_SQL = """
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM orders GROUP BY o_custkey ORDER BY o_custkey
"""


def events_union_by_name(sf_dir: str):
    """X2 — schema-evolution union (`UNION ALL BY NAME`): two event
    extracts with DIFFERENT schemas — an old pipeline version emitting
    (event_id, user_id) and a new one emitting (event_id, value_cents) —
    union by column NAME with typed-null padding via
    [[reshape.union_by_name]], then one combiner-backed summary proving
    null semantics survive (SUM ignores the padded side, the null count
    sees it). The drift a long-lived ingest pipeline always hits.

    Scale shape: pad is per-batch, union is metadata-only, the summary
    is a per-batch combiner + single-row reduce."""
    from .functions.reshape import union_by_name

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "value"])
    old = ev.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), 0))
                   .select(["event_id", "user_id"]),
        batch_format="pyarrow")
    new = ev.map_batches(
        lambda t: pa.table({
            "event_id": (f := t.filter(
                pc.equal(pc.bit_wise_and(t["event_id"], 1), 1)))["event_id"],
            "value_cents": _cents(f["value"])}),
        batch_format="pyarrow")
    u = union_by_name(old, new)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_rows": pa.array([len(t)], pa.int64()),
            "sum_user": pa.array([pc.sum(t["user_id"]).as_py() or 0],
                                 pa.int64()),
            "sum_value_cents": pa.array(
                [pc.sum(t["value_cents"]).as_py() or 0], pa.int64()),
            "n_null_user": pa.array([t["user_id"].null_count], pa.int64()),
        })

    m = (u.map_batches(partial, batch_format="pyarrow")
         .aggregate(Sum("n_rows", alias_name="n_rows"),
                    Sum("sum_user", alias_name="sum_user"),
                    Sum("sum_value_cents", alias_name="sum_value_cents"),
                    Sum("n_null_user", alias_name="n_null_user")))
    return pa.table({k: pa.array([int(m[k] or 0)], pa.int64())
                     for k in ("n_rows", "sum_user", "sum_value_cents",
                               "n_null_user")})


_EVENTS_UNION_BY_NAME_SQL = """
WITH a AS (SELECT event_id, user_id FROM events WHERE event_id % 2 = 0),
b AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS value_cents
      FROM events WHERE event_id % 2 = 1),
u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(user_id), 0) AS BIGINT) AS sum_user,
       CAST(COALESCE(SUM(value_cents), 0) AS BIGINT) AS sum_value_cents,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_user
FROM u
"""


def docs_topp_curation(sf_dir: str):
    """LLM2 — top-p (nucleus) corpus curation: per language, keep the
    LARGEST documents first until the kept set holds ≥ 90% of that
    language's character mass (the smallest prefix crossing p — the
    nucleus rule applied to corpus budgeting instead of token
    sampling). Keep gate is the integer predicate
    10·(cum − n_chars) < 9·total — no float boundary.

    Scale shape: per-lang totals via a combiner groupby (|langs|
    scalars); the ordered prefix is [[window.running_sum]]'s hash-
    partitioned per-key cumsum (descending order via a negated sort
    column); the verdict is a bounded groupby."""
    from .functions.window import running_sum

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "n_chars"])
    totals = {r["lang"]: int(r["total"])
              for r in (docs.groupby("lang")
                        .aggregate(Sum("n_chars", alias_name="total"))
                        .take_all())}          # ≤ |langs| rows
    totals_ref = ray.put(totals)

    prep = docs.map_batches(
        lambda t: t.append_column(
            "neg_chars", pc.negate_checked(t["n_chars"])),
        batch_format="pyarrow")
    cum = running_sum(prep, "n_chars", keys=["lang"],
                      order_by=["neg_chars", "doc_id"], out_col="cum")

    def gate(t: pa.Table) -> pa.Table:
        tot = ray.get(totals_ref)
        lang = t["lang"].to_pylist()
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        cumv = t["cum"].to_numpy(zero_copy_only=False)
        tv = np.fromiter((tot[x] for x in lang), dtype=np.int64,
                         count=len(lang))
        keep = 10 * (cumv - n) < 9 * tv
        return pa.table({"lang": pa.array(np.array(lang)[keep]),
                         "n_chars": pa.array(n[keep], pa.int64())})

    return (cum.map_batches(gate, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Count(alias_name="n_docs_kept"),
                       Sum("n_chars", alias_name="chars_kept"))
            .sort("lang"))


_DOCS_TOPP_SQL = """
WITH c AS (
  SELECT lang, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang
             ORDER BY n_chars DESC, doc_id
             ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n_chars) OVER (PARTITION BY lang) AS total
  FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
FROM c WHERE 10 * (cum - n_chars) < 9 * total
GROUP BY lang ORDER BY lang
"""


def orders_merge_upsert(sf_dir: str):
    """ETL3 — distributed MERGE INTO (the Delta/Iceberg upsert / CDC
    apply): base table = orders with key mod 3 ≠ 0; change batch =
    orders with even key. WHEN MATCHED: delete if key mod 7 = 0, else
    update (price + 100 cents); WHEN NOT MATCHED: insert unless the
    change is itself a delete. Built on [[merge.merge_into]]'s three
    join legs (anti / auto / anti) + union — nothing driver-side; the
    oracle replays the same actions declaratively, so equality proves
    MERGE semantics end-to-end. Output: per-priority row count + cents
    total of the merged table."""
    from .functions.merge import merge_into

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])

    def shape(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"],
                         "cents": _cents(t["o_totalprice"])})

    rows = orders.map_batches(shape, batch_format="pyarrow").materialize()
    base = rows.map_batches(
        lambda t: t.filter(pc.not_equal(
            pc.subtract(t["o_orderkey"],
                        pc.multiply(pc.divide(t["o_orderkey"], 3), 3)), 0)),
        batch_format="pyarrow")
    source = rows.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["o_orderkey"], 1),
                                    0)),
        batch_format="pyarrow")

    def _mod7_zero(keys: pa.ChunkedArray):
        k = keys.to_numpy(zero_copy_only=False)
        return k % 7 == 0

    def when_matched(t: pa.Table) -> pa.Table:
        keep = ~_mod7_zero(t["o_orderkey"])          # delete key%7==0
        t = t.filter(pa.array(keep))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_orderpriority": t["o_orderpriority"],
                         "cents": pc.add(t["cents"], 100)})

    def when_not_matched(t: pa.Table) -> pa.Table:
        keep = ~_mod7_zero(t["o_orderkey"])          # delete-op: no insert
        return t.filter(pa.array(keep))

    merged = merge_into(base, source, on="o_orderkey",
                        when_matched=when_matched,
                        when_not_matched=when_not_matched)
    return (merged.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n"),
                       Sum("cents", alias_name="total_cents"))
            .sort("o_orderpriority"))


_ORDERS_MERGE_SQL = """
WITH rows_ AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
base AS (SELECT * FROM rows_ WHERE o_orderkey % 3 <> 0),
src AS (SELECT * FROM rows_ WHERE o_orderkey % 2 = 0),
merged AS (
  SELECT b.* FROM base b
  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM src)
  UNION ALL
  SELECT b.o_orderkey, b.o_orderpriority, b.cents + 100
  FROM base b JOIN src s USING (o_orderkey)
  WHERE b.o_orderkey % 7 <> 0
  UNION ALL
  SELECT s.* FROM src s
  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM base)
    AND s.o_orderkey % 7 <> 0
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM merged GROUP BY 1 ORDER BY 1
"""


def events_graph_snapshot_diff(sf_dir: str):
    """KG8 — temporal graph snapshot diff (the KG-maintenance report:
    what did the last crawl ADD, REMOVE, RETAIN?): the bipartite
    user→event_type edge set in the first half of the time range vs the
    second half (midpoint = integer (min+max)/2 of event time); per
    edge label, counts of added / removed / retained edges.

    Scale shape: 2-scalar min/max aggregate; per-(user, type) presence
    bits via a combiner-backed groupby(Max); the diff is a bounded
    per-type groupby — no edge list ever leaves the cluster."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type",
                                               "ts"])
    us = ev.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "event_type": t["event_type"],
                            "ts_us": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow").materialize()
    mm = us.aggregate(Min("ts_us"), Max("ts_us"))
    mid = (int(mm["min(ts_us)"]) + int(mm["max(ts_us)"])) // 2

    def flags(t: pa.Table) -> pa.Table:
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "in_a": pa.array((ts < mid).astype(np.int64), pa.int64()),
            "in_b": pa.array((ts >= mid).astype(np.int64), pa.int64())})

    presence = (us.map_batches(flags, batch_format="pyarrow")
                .groupby(["user_id", "event_type"])
                .aggregate(Max("in_a", alias_name="in_a"),
                           Max("in_b", alias_name="in_b")))

    def classify(t: pa.Table) -> pa.Table:
        a = t["in_a"].to_numpy(zero_copy_only=False)
        b = t["in_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "added": pa.array(((a == 0) & (b == 1)).astype(np.int64),
                              pa.int64()),
            "removed": pa.array(((a == 1) & (b == 0)).astype(np.int64),
                                pa.int64()),
            "retained": pa.array(((a == 1) & (b == 1)).astype(np.int64),
                                 pa.int64())})

    return (presence.map_batches(classify, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("added", alias_name="n_added"),
                       Sum("removed", alias_name="n_removed"),
                       Sum("retained", alias_name="n_retained"))
            .sort("event_type"))


_EVENTS_SNAPDIFF_SQL = """
WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
           FROM events),
p AS (
  SELECT user_id, event_type,
         MAX(CASE WHEN epoch_us(ts) < (SELECT mid FROM b)
             THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN epoch_us(ts) >= (SELECT mid FROM b)
             THEN 1 ELSE 0 END) AS in_b
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(SUM(CASE WHEN in_a = 0 AND in_b = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN in_a = 1 AND in_b = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retained
FROM p GROUP BY event_type ORDER BY event_type
"""


def docs_rrf_fusion(sf_dir: str):
    """R3 — reciprocal rank fusion (Cormack et al. 2009, public; the
    standard hybrid-retrieval merge): fuse a length ranking (n_chars
    DESC) with a term-frequency ranking (count of the exact token
    'hash' DESC), score = Σ 1/(60 + rank), top 10. Each global rank is
    [[rank.global_row_number]]'s two-pass range-partitioned plan; the
    two rank tables join through ``auto_join``; both engines compute
    the identical two-term double sum (reported ×10⁶ as int).

    Scale shape: two rank passes + one key join; only local top-k
    reaches the final sort."""
    from .functions.joins import auto_join
    from .functions.rank import global_row_number

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "n_chars"],
                      rows_per_block=2000).materialize()

    def tf(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        cnt = d["text"].str.split(" ").map(
            lambda toks: sum(1 for x in toks if x == "hash"))
        return pa.table({
            "doc_id": pa.array(d["doc_id"], pa.int64()),
            "neg_tf": pa.array(-cnt.to_numpy(np.int64), pa.int64())})

    by_len = docs.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "neg_chars": pc.negate_checked(t["n_chars"])}),
        batch_format="pyarrow")
    r1 = global_row_number(by_len, order_by=["neg_chars", "doc_id"],
                           out_col="r1").drop_columns(["neg_chars"])
    r2 = global_row_number(docs.map_batches(tf, batch_format="pyarrow"),
                           order_by=["neg_tf", "doc_id"],
                           out_col="r2").drop_columns(["neg_tf"])
    both = auto_join(r1, r2, left_key="doc_id", right_key="doc_id",
                     right_cols=["r2"])

    def score(t: pa.Table) -> pa.Table:
        a = t["r1"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = t["r2"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = 1.0 / (60.0 + a) + 1.0 / (60.0 + b)
        e6 = np.round(s * 1e6).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "rrf_e6": pa.array(e6, pa.int64())})

    return (both.map_batches(score, batch_format="pyarrow")
            .sort(["rrf_e6", "doc_id"], descending=[True, False])
            .limit(10))


_DOCS_RRF_SQL = """
WITH tf AS (
  SELECT doc_id, n_chars,
         len(list_filter(string_split(text, ' '), x -> x = 'hash')) AS c
  FROM documents),
ranked AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r1,
         ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r2
  FROM tf)
SELECT doc_id,
       CAST(round((1.0/(60 + r1) + 1.0/(60 + r2)) * 1000000) AS BIGINT)
         AS rrf_e6
FROM ranked
ORDER BY rrf_e6 DESC, doc_id
LIMIT 10
"""


def _first_ts_after(ev, etype: str, prev, prev_col: str, out_col: str):
    """Per user, MIN event time of ``etype`` at or after that user's
    ``prev_col`` time (``prev`` = Dataset(user_id, prev_col); None for
    the base stage). The ordered-funnel stage kernel: one selective
    filter, one key join through auto_join's chooser, one combiner-backed
    Min groupby — each stage's state is |users| rows, never fact-sized."""
    from .functions.joins import auto_join

    f = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], etype)),
        batch_format="pyarrow")
    if prev is not None:
        f = auto_join(f, prev, left_key="user_id", right_key="user_id",
                      right_cols=[prev_col])
        f = f.map_batches(
            lambda t: t.filter(pc.greater_equal(t["ts_us"], t[prev_col])),
            batch_format="pyarrow")
    return (f.groupby("user_id")
            .aggregate(Min("ts_us", alias_name=out_col)))


def events_funnel_steps(sf_dir: str):
    """PA1 — N-stage ORDERED funnel (signup → click → purchase, each
    stage's first hit at-or-after the previous stage's first hit): the
    product-analytics generalization of the 2-stage [[events_funnel]].
    Stage k is one [[_first_ts_after]] kernel over the stage-(k−1)
    state table — |users|-sized states, fact table scanned once per
    stage with a selective type filter. One row out: users surviving
    each stage."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"]) \
        .map_batches(
            lambda t: pa.table({"user_id": t["user_id"],
                                "event_type": t["event_type"],
                                "ts_us": pc.cast(t["ts"], pa.int64())}),
            batch_format="pyarrow").materialize()

    counts = []
    prev, prev_col = None, None
    for i, etype in enumerate(("signup", "click", "purchase")):
        col = f"t{i}"
        stage = _first_ts_after(ev, etype, prev, prev_col, col) \
            .materialize()
        counts.append(stage.count())
        prev, prev_col = stage, col

    return pa.table({
        "n_signup": pa.array([counts[0]], pa.int64()),
        "n_click_after": pa.array([counts[1]], pa.int64()),
        "n_purchase_after": pa.array([counts[2]], pa.int64()),
    })


_EVENTS_FUNNEL_STEPS_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS st FROM events
           WHERE event_type = 'signup' GROUP BY 1),
c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS ct
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= s.st
      GROUP BY 1),
p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS pt
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.ct
      GROUP BY 1)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_after,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_after
"""


def events_conversion_latency(sf_dir: str):
    """PA2 — conversion-latency quantiles: seconds from each user's
    first signup to their first purchase at-or-after it, exact
    p25/p50/p75 (rank = ⌈q·n⌉ over the distinct-value histogram —
    [[quantiles.exact_quantiles]], same contract the repo's other
    quantile oracles validate) + converted-user count. The funnel-stage
    kernel supplies both state tables; the latency column is exact
    integer µs//10⁶."""
    from .functions.joins import auto_join
    from .functions.quantiles import exact_quantiles

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"]) \
        .map_batches(
            lambda t: pa.table({"user_id": t["user_id"],
                                "event_type": t["event_type"],
                                "ts_us": pc.cast(t["ts"], pa.int64())}),
            batch_format="pyarrow").materialize()

    s = _first_ts_after(ev, "signup", None, None, "st").materialize()
    p = _first_ts_after(ev, "purchase", s, "st", "pt")
    lat = auto_join(p, s, left_key="user_id", right_key="user_id",
                    right_cols=["st"]) \
        .map_batches(
            lambda t: pa.table({"sec": pc.divide(
                pc.subtract(t["pt"], t["st"]), 1_000_000)}),
            batch_format="pyarrow").materialize()

    q = exact_quantiles(lat, "sec", [0.25, 0.5, 0.75])
    vals = {f"p{int(r.q * 100)}_s": int(r.value)
            for r in q.itertuples()}
    return pa.table({
        "n_converted": pa.array([lat.count()], pa.int64()),
        **{k: pa.array([v], pa.int64()) for k, v in vals.items()},
    })


_EVENTS_CONVLAT_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS st FROM events
           WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS pt
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.st
      GROUP BY 1),
lat AS (SELECT (pt - st) // 1000000 AS sec
        FROM p JOIN s USING (user_id))
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(quantile_disc(sec, 0.25) AS BIGINT) AS p25_s,
       CAST(quantile_disc(sec, 0.50) AS BIGINT) AS p50_s,
       CAST(quantile_disc(sec, 0.75) AS BIGINT) AS p75_s
FROM lat
"""


def orders_price_log2_hist(sf_dir: str):
    """G56 — log2 (power-of-two bucket) histogram of order totals in
    cents: the size-distribution / power-law diagnostic ops teams run on
    object sizes and payment values alike. Bucket = ⌊log2(cents)⌋
    computed as bit_length−1 in EXACT integer arithmetic (no float log
    near bucket boundaries); per-batch bincount combiner, ≤64-row
    shuffle."""
    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def buckets(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        # ⌊log2⌋ == bit_length − 1, by binary-search shifts (vectorized,
        # exact at every power-of-two boundary where float log2 is not)
        out = np.zeros(len(cents), dtype=np.int64)
        v = cents.astype(np.uint64)
        for shift in (32, 16, 8, 4, 2, 1):
            m = v >= (np.uint64(1) << np.uint64(shift))
            out[m] += shift
            v = np.where(m, v >> np.uint64(shift), v)
        d = pd.DataFrame({"bucket": out, "n": 1})
        g = d.groupby("bucket", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (orders.map_batches(buckets, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n", alias_name="n"))
            .sort("bucket"))


_ORDERS_LOG2_SQL = """
SELECT CAST(floor(log2(CAST(round(o_totalprice*100) AS BIGINT)))
            AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY 1
"""


def nation_share_of_region(sf_dir: str):
    """G57 — hierarchical share-of-parent (the 2-level drill-down
    report): each nation's share of its REGION's order revenue, in
    exact integer parts-per-million (nation_cents·10⁶ // region_cents —
    no float ratio crosses the oracle hash). Revenue rolls up
    orders→customer→nation via one broadcast dim join; region totals
    are a second ≤|regions| groupby of the nation table itself."""
    from .functions.joins import auto_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey"])
    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_name", "n_regionkey"])

    cents = orders.map_batches(
        lambda t: pa.table({"o_custkey": t["o_custkey"],
                            "cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
    with_nat = auto_join(cents, cust, left_key="o_custkey",
                         right_key="c_custkey",
                         right_cols=["c_nationkey"])
    per_nation = (with_nat.groupby("c_nationkey")
                  .aggregate(Sum("cents", alias_name="nation_cents")))
    named = auto_join(per_nation, nation, left_key="c_nationkey",
                      right_key="n_nationkey",
                      right_cols=["n_name", "n_regionkey"]).materialize()
    per_region = {int(r["n_regionkey"]): int(r["region_cents"])
                  for r in (named.groupby("n_regionkey")
                            .aggregate(Sum("nation_cents",
                                           alias_name="region_cents"))
                            .take_all())}        # ≤ |regions| rows
    reg_ref = ray.put(per_region)

    def share(t: pa.Table) -> pa.Table:
        reg = ray.get(reg_ref)
        rk = t["n_regionkey"].to_pylist()
        nc = t["nation_cents"].to_numpy(zero_copy_only=False)
        tot = np.fromiter((reg[k] for k in rk), dtype=np.int64,
                          count=len(rk))
        return pa.table({
            "n_name": t["n_name"],
            "n_regionkey": t["n_regionkey"],
            "share_ppm": pa.array(nc * 1_000_000 // tot, pa.int64())})

    return named.map_batches(share, batch_format="pyarrow") \
        .sort(["n_regionkey", "n_name"])


_NATION_SHARE_SQL = """
WITH nat AS (
  SELECT c.c_nationkey,
         SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) AS nation_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1),
j AS (
  SELECT n.n_name, n.n_regionkey, nat.nation_cents
  FROM nat JOIN nation n ON n.n_nationkey = nat.c_nationkey),
reg AS (
  SELECT n_regionkey, SUM(nation_cents) AS region_cents
  FROM j GROUP BY 1)
SELECT j.n_name, j.n_regionkey,
       CAST(j.nation_cents * 1000000 // r.region_cents AS BIGINT)
         AS share_ppm
FROM j JOIN reg r USING (n_regionkey)
ORDER BY j.n_regionkey, j.n_name
"""


def custs_all_priorities(sf_dir: str):
    """Relational division — the FOR ALL quantifier (Codd's ÷, the one
    relational operator SQL can only spell as double-NOT-EXISTS or
    COUNT(DISTINCT)==total): customers whose orders span EVERY order
    priority present in the table. Per-batch distinct (custkey, priority)
    combiner collapses the fact stream before the shuffle (a hot customer
    costs ≤|priorities| rows per batch); the divisor cardinality is a
    single scalar pulled from a narrow distinct aggregate.

    Scale shape: the wide shuffle carries at most |customers| ×
    |priorities| rows; nothing reaches the driver but one integer."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderpriority"])

    def pair_dedup(t: pa.Table) -> pa.Table:
        return t.group_by(["o_custkey", "o_orderpriority"]).aggregate([])

    pairs = (orders.map_batches(pair_dedup, batch_format="pyarrow")
             .groupby(["o_custkey", "o_orderpriority"])
             .aggregate(Count(alias_name="_n")))

    n_prio = (orders.map_batches(
        lambda t: t.select(["o_orderpriority"])
                   .group_by(["o_orderpriority"]).aggregate([]),
        batch_format="pyarrow")
        .groupby("o_orderpriority").aggregate(Count(alias_name="_n"))
        .count())

    per_cust = (pairs.groupby("o_custkey")
                .aggregate(Count(alias_name="n_prio")))

    def keep_full(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["n_prio"], pa.scalar(n_prio, pa.int64())))
        return t.select(["o_custkey", "n_prio"])

    return (per_cust.map_batches(keep_full, batch_format="pyarrow")
            .sort("o_custkey"))


_CUSTS_ALL_PRIO_SQL = """
SELECT o_custkey, CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
FROM orders GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) =
       (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
ORDER BY o_custkey
"""


def part_graph_adamic_adar(sf_dir: str):
    """Adamic–Adar link prediction (Adamic & Adar 2003) over the part
    co-occurrence graph: score(u,v) = Σ_{m ∈ N(u)∩N(v)} 1/ln(deg(m)),
    the degree-discounted cousin of part_graph_jaccard — hub-mediated
    wedges count for less. Each wedge center's weight is the exact int
    round(1e6/ln(deg)) computed INSIDE the map_groups (the group IS the
    center's adjacency list, so deg == len(group) — no degree join on
    this path at all), then one int-sum shuffle on the (u, v) pair.
    Both engines evaluate floor(1e6/ln(deg)+0.5) on the same int64 in
    float64, so the micro-units are bit-equal and the comparison exact.

    Scale shape: identical wedge frontier to the SQL self-join (O(deg²)
    per hub — cap or sample hub adjacency at web scale); the shuffle
    carries one int per wedge."""
    edges = _part_strong_edges(sf_dir)

    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "mid": pa.concat_arrays([t["u"].combine_chunks(),
                                     t["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["v"].combine_chunks(),
                                     t["u"].combine_chunks()])})

    adj = edges.map_batches(sym, batch_format="pyarrow")

    out_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                            ("w", pa.int64())])

    def wedge_weights(g: pd.DataFrame) -> pa.Table:
        if len(g) < 2:   # degree-1 center: no wedges, and ln(1)==0
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        _, u_out, v_out = _pairs_within_groups(
            g["mid"].to_numpy(np.int64), g["nbr"].to_numpy(np.int64))
        w = int(np.floor(1_000_000.0 / np.log(float(len(g))) + 0.5))
        return pa.table({"u": pa.array(u_out, pa.int64()),
                         "v": pa.array(v_out, pa.int64()),
                         "w": pa.array(np.full(len(u_out), w, np.int64))}
                        ).cast(out_schema)

    return (adj.groupby("mid")
            .map_groups(wedge_weights, batch_format="pandas")
            .groupby(["u", "v"]).aggregate(Sum("w", alias_name="aa_micro"))
            .sort(["aa_micro", "u", "v"], descending=[True, False, False])
            .limit(20))


_PART_ADAMIC_ADAR_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT u AS mid, v AS nbr FROM e
        UNION ALL SELECT v, u FROM e),
deg AS (SELECT mid AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1)
SELECT x.nbr u, y.nbr v,
       CAST(SUM(CAST(FLOOR(1000000.0 / LN(dm.deg) + 0.5) AS BIGINT))
            AS BIGINT) AS aa_micro
FROM sym x JOIN sym y ON x.mid = y.mid AND x.nbr < y.nbr
JOIN deg dm ON dm.node = x.mid
GROUP BY 1, 2
ORDER BY aa_micro DESC, u, v LIMIT 20
"""


def lineitem_star_flatten(sf_dir: str):
    """Star-schema denormalization — the wide-table ETL that feeds a
    feature store / training-data export: December-1997 lineitems joined
    out to orders, customer, supplier and part, nation names resolved,
    one flat row per line item. Orders/customer/supplier/part attach via
    hash joins (they are fact- or growing-dim-sized); only nation (25
    rows, fixed) is a ray.put broadcast — the J1-vs-J3 boundary SURVEY
    §2.4 documents.

    Scale shape: the date filter prunes at the read; every join is a
    co-partitioned hash join sized by _join_parts; output streams."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nat_name = ray.put(dict(zip(nation["n_nationkey"].astype(int),
                                nation["n_name"])))
    nparts = _join_parts(sf_dir)

    lo = np.datetime64("1997-12-01", "us")
    hi = np.datetime64("1998-01-01", "us")
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_partkey",
                             "l_suppkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"],
                                              pa.scalar(lo)),
                             pc.less(t["l_shipdate"], pa.scalar(hi))))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": pc.cast(t["l_linenumber"],
                                                 pa.int64()),
                         "l_partkey": t["l_partkey"],
                         "l_suppkey": t["l_suppkey"],
                         "revenue_cents": _cents(rev)})

    fact = li.map_batches(prep, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderpriority"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey"])
    supp = read_table(sf_dir, "supplier",
                      columns=["s_suppkey", "s_nationkey"])
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"])

    j = fact.join(orders, join_type="inner", num_partitions=nparts,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.join(cust, join_type="inner", num_partitions=nparts,
               on=("o_custkey",), right_on=("c_custkey",))
    j = j.join(supp, join_type="inner", num_partitions=nparts,
               on=("l_suppkey",), right_on=("s_suppkey",))
    j = j.join(part, join_type="inner", num_partitions=nparts,
               on=("l_partkey",), right_on=("p_partkey",))

    def resolve(t: pa.Table) -> pa.Table:
        names = ray.get(nat_name)
        cn = pd.Series(t["c_nationkey"].to_pandas()).map(names)
        sn = pd.Series(t["s_nationkey"].to_pandas()).map(names)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": t["l_linenumber"],
                         "revenue_cents": t["revenue_cents"],
                         "cust_nation": pa.array(cn, pa.string()),
                         "supp_nation": pa.array(sn, pa.string()),
                         "p_brand": t["p_brand"],
                         "o_orderpriority": t["o_orderpriority"]})

    return (j.map_batches(resolve, batch_format="pyarrow")
            .sort(["l_orderkey", "l_linenumber"]))


_LINEITEM_STAR_SQL = """
SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
       CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
         AS revenue_cents,
       nc.n_name AS cust_nation, ns.n_name AS supp_nation,
       p.p_brand, o.o_orderpriority
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
WHERE l.l_shipdate >= DATE '1997-12-01'
  AND l.l_shipdate <  DATE '1998-01-01'
ORDER BY l.l_orderkey, l.l_linenumber
"""


def events_user_trailing_distinct(sf_dir: str):
    """W23 — DISTINCT count over a RANGE time frame, the window SQL
    cannot express at all (``COUNT(DISTINCT …) OVER (RANGE …)`` is
    illegal in every dialect; the oracle needs a self-join): for every
    event, how many DISTINCT event types the same user produced in the
    trailing hour (ts-inclusive both ends, tie peers included).

    Kernel: per user, an event j is counted for query i iff j lies in
    i's window AND j is the FIRST occurrence of its type inside that
    window (prev_same[j] < lo_i). With lo/hi monotone in i, each j's
    query set is a contiguous range [max(a_j, c_j), b_j] found by three
    searchsorteds, so the whole per-user computation is a difference
    array + cumsum — O(n log n), zero per-row Python.

    Scale shape: one modulo shuffle on user_id, per-bucket mergesort,
    output fact-sized and streaming."""
    from .functions.partitions import default_parts

    HOUR_US = 3_600_000_000
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    nparts = max(2, min(default_parts(), ev.count() * 16 // 250_000 + 1))

    def add_part(t: pa.Table) -> pa.Table:
        part = t["user_id"].to_numpy(zero_copy_only=False) % nparts
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        out_id, out_n = [], []
        for _, grp in g.groupby("user_id", sort=False):
            ts = grp["ts_us"].to_numpy()
            n = len(ts)
            lo = np.searchsorted(ts, ts - HOUR_US, side="left")
            hi = np.searchsorted(ts, ts, side="right") - 1
            codes = pd.factorize(grp["event_type"].to_numpy())[0]
            pos = np.arange(n)
            prev_same = (pd.Series(pos).groupby(codes).shift(1)
                         .fillna(-1).to_numpy(np.int64))
            a = np.searchsorted(lo, prev_same, side="right")
            b = np.searchsorted(lo, pos, side="right") - 1
            c = np.searchsorted(hi, pos, side="left")
            start = np.maximum(a, c)
            ok = start <= b
            diff = np.zeros(n + 1, np.int64)
            np.add.at(diff, start[ok], 1)
            np.add.at(diff, b[ok] + 1, -1)
            out_id.append(grp["event_id"].to_numpy())
            out_n.append(np.cumsum(diff[:-1]))
        ids = (np.concatenate(out_id) if out_id
               else np.empty(0, np.int64))
        ns = np.concatenate(out_n) if out_n else np.empty(0, np.int64)
        return pa.table({"event_id": pa.array(ids, pa.int64()),
                         "n_types_1h": pa.array(ns, pa.int64())})

    return (ev.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pandas")
            .sort("event_id"))


_EVENTS_TRAILDISTINCT_SQL = """
SELECT e.event_id,
       CAST(COUNT(DISTINCT e2.event_type) AS BIGINT) AS n_types_1h
FROM events e JOIN events e2
  ON e2.user_id = e.user_id
 AND e2.ts >= e.ts - INTERVAL 1 HOUR AND e2.ts <= e.ts
GROUP BY e.event_id ORDER BY e.event_id
"""


def docs_readability(sf_dir: str):
    """Flesch-reading-ease corpus profile (Flesch 1948; a standard
    web-corpus quality signal next to the Gopher rules): per source,
    document count, total words / vowel-group syllables / sentences,
    and the sum of per-doc Flesch scores in exact milli-units. All
    three counts are RE2 ``count_substring_regex`` kernels (words =
    ``[a-z]+`` on lowercased text, syllables = vowel-group runs
    ``[aeiouy]+``, sentences = terminator runs ``[.!?]+`` floored at
    1); both engines evaluate the same float64 expression per doc and
    round once to milli-ints, so the grouped sums compare exactly.

    Scale shape: three vectorized regex counts per batch, one
    |sources|-row shuffle."""
    docs = read_table(sf_dir, "documents", columns=["text", "source"])

    def score(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        w = pc.count_substring_regex(low, "[a-z]+")
        sy = pc.count_substring_regex(low, "[aeiouy]+")
        s = pc.max_element_wise(
            pc.count_substring_regex(t["text"], r"[.!?]+"),
            pa.scalar(1, pa.int32()))
        wf = pc.cast(w, pa.float64()).to_numpy(zero_copy_only=False)
        syf = pc.cast(sy, pa.float64()).to_numpy(zero_copy_only=False)
        sf = pc.cast(s, pa.float64()).to_numpy(zero_copy_only=False)
        keep = wf >= 1
        flesch = (206.835 - 1.015 * (wf[keep] / sf[keep])
                  - 84.6 * (syf[keep] / wf[keep]))
        milli = np.floor(flesch * 1000 + 0.5).astype(np.int64)
        src = t["source"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "source": pa.array(src, pa.string()),
            "n_docs": pa.array(np.ones(keep.sum(), np.int64)),
            "w": pa.array(wf[keep].astype(np.int64)),
            "sy": pa.array(syf[keep].astype(np.int64)),
            "s": pa.array(sf[keep].astype(np.int64)),
            "fm": pa.array(milli)})

    return (docs.map_batches(score, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("w", alias_name="sum_words"),
                       Sum("sy", alias_name="sum_sylls"),
                       Sum("s", alias_name="sum_sents"),
                       Sum("fm", alias_name="sum_flesch_milli"))
            .sort("source"))


_DOCS_READABILITY_SQL = """
WITH per AS (
  SELECT source,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS w,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s
  FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS sum_words,
       CAST(SUM(sy) AS BIGINT) AS sum_sylls,
       CAST(SUM(s) AS BIGINT) AS sum_sents,
       CAST(SUM(CAST(FLOOR((206.835
             - 1.015 * (CAST(w AS DOUBLE) / s)
             - 84.6 * (CAST(sy AS DOUBLE) / w)) * 1000 + 0.5)
           AS BIGINT)) AS BIGINT) AS sum_flesch_milli
FROM per WHERE w >= 1
GROUP BY source ORDER BY source
"""


def events_user_median_gap(sf_dir: str):
    """Grouped exact MEDIAN of a WINDOW-derived column (LAG → per-key
    order statistic — the composition events_user_gap's mean can't
    see): per user, the median inter-event gap in microseconds, emitted
    as 2×median so the even-count midpoint stays an exact int64 in both
    engines (DuckDB quantile_cont interpolates to .5 doubles; doubling
    makes them integral).

    Scale shape: one lag shuffle on user_id, then a per-user
    np.partition inside map_groups — gaps never leave their partition
    unsorted-globally."""
    from .functions.window import lag_column

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    lagged = lag_column(ev, "ts", keys=["user_id"],
                        order_by=["ts", "event_id"], out_col="prev_ts")

    def gaps(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["prev_ts"]))
        return pa.table({
            "user_id": t["user_id"],
            "gap_us": pc.subtract(t["ts"].cast(pa.int64()),
                                  t["prev_ts"].cast(pa.int64()))})

    def med2(g: pd.DataFrame) -> pa.Table:
        v = np.sort(g["gap_us"].to_numpy(np.int64))
        n = len(v)
        m2 = int(v[n // 2] * 2) if n % 2 else int(v[n // 2 - 1] + v[n // 2])
        return pa.table({
            "user_id": pa.array([int(g["user_id"].iloc[0])], pa.int64()),
            "median2_gap_us": pa.array([m2], pa.int64()),
            "n_gaps": pa.array([n], pa.int64())})

    return (lagged.map_batches(gaps, batch_format="pyarrow")
            .groupby("user_id").map_groups(med2, batch_format="pandas")
            .sort("user_id"))


_EVENTS_MEDIAN_GAP_SQL = """
SELECT user_id,
       CAST(FLOOR(2 * quantile_cont(gap_us, 0.5) + 0.5) AS BIGINT)
         AS median2_gap_us,
       CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM (SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events) t
WHERE gap_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def events_purchase_attribution(sf_dir: str):
    """Last-touch attribution (the marketing/conversion analytics core):
    for every purchase, the event type of the same user's most recent
    non-purchase event in the strictly-preceding 2-hour lookback —
    purchases with no touch attribute to 'direct'. The backward as-of
    join (functions/asof.py, J9) does the heavy lift; the tie at equal
    prior ts breaks on the larger event_id via a composite sort inside
    the per-partition merge_asof kernel, mirrored by the oracle's
    ORDER BY ts DESC, event_id DESC LIMIT 1.

    Scale shape: one hash co-partition on user_id, per-partition
    merge_asof; the aggregate is |event_types|+1 rows."""
    from .functions.asof import asof_join_backward
    from .functions.joins import semi_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    pur = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
        batch_format="pyarrow")
    touch = ev.map_batches(
        lambda t: t.filter(pc.not_equal(t["event_type"], "purchase")),
        batch_format="pyarrow")

    # rebase ts to small ints (µs since 2024-01-01) so the as-of keys
    # survive the merge kernel's float64 roundtrip exactly (< 2^53);
    # SQL's ts-tie break (largest event_id wins) is applied BEFORE the
    # as-of by collapsing each (user, ts) touch group to its max
    # event_id's type — then a single backward match IS the oracle's
    # ORDER BY ts DESC, event_id DESC LIMIT 1
    BASE_US = 1_704_067_200_000_000   # 2024-01-01 00:00:00 UTC

    def key_left(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "k": pc.subtract(pc.cast(t["ts"], pa.int64()),
                             pa.scalar(BASE_US, pa.int64()))})

    def key_right(t: pa.Table) -> pa.Table:
        rts = pc.subtract(pc.cast(t["ts"], pa.int64()),
                          pa.scalar(BASE_US, pa.int64()))
        part = pc.bit_wise_and(t["user_id"], pa.scalar(7, pa.int64()))
        return pa.table({"r_user": t["user_id"], "rts": rts,
                         "r_eid": t["event_id"],
                         "touch": t["event_type"], "part": part})

    def dedup_ties(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["r_user", "rts", "r_eid"], kind="mergesort")
        last = np.r_[(g["r_user"].to_numpy()[1:]
                      != g["r_user"].to_numpy()[:-1])
                     | (g["rts"].to_numpy()[1:]
                        != g["rts"].to_numpy()[:-1]), True]
        d = g.loc[last, ["r_user", "rts", "touch"]]
        return pa.table({
            "r_user": pa.array(d["r_user"].to_numpy(np.int64)),
            "rts": pa.array(d["rts"].to_numpy(np.int64)),
            "touch": pa.array(d["touch"], pa.string())})

    left = pur.map_batches(key_left, batch_format="pyarrow")
    # the trailing identity map rewraps the pandas group blocks as Arrow
    # (asof_join_backward reads .base_schema off its inputs)
    right = (touch.map_batches(key_right, batch_format="pyarrow")
             .groupby("part").map_groups(dedup_ties,
                                         batch_format="pandas")
             .map_batches(lambda t: t.select(["r_user", "rts", "touch"]),
                          batch_format="pyarrow"))
    HOUR2_US = 2 * 3_600_000_000
    joined = asof_join_backward(
        left, right.select_columns(["r_user", "rts"]),
        left_by="user_id", right_by="r_user",
        left_ts="k", right_ts="rts", out_col="rts_matched",
        direction="backward", tolerance=HOUR2_US,
        allow_exact_matches=False)

    nparts = max(2, min(16, ev.count() // 250_000 + 2))
    matched = (joined.join(right, join_type="inner",
                           num_partitions=nparts,
                           on=("user_id", "rts_matched"),
                           right_on=("r_user", "rts"))
               .select_columns(["event_id", "touch"]))

    unmatched = semi_join(pur, matched, left_key="event_id",
                          right_key="event_id", anti=True)
    direct = unmatched.map_batches(
        lambda t: pa.table({
            "event_id": t["event_id"],
            "touch": pa.array(["direct"] * t.num_rows, pa.string())}),
        batch_format="pyarrow")
    return (matched.union(direct)
            .groupby("touch").aggregate(Count(alias_name="n_purchases"))
            .sort("touch"))


_EVENTS_ATTRIBUTION_SQL = """
WITH pur AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'purchase'),
att AS (
  SELECT p.event_id,
         (SELECT e.event_type FROM events e
          WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
            AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 2 HOUR
          ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS touch
  FROM pur p)
SELECT COALESCE(touch, 'direct') AS touch,
       CAST(COUNT(*) AS BIGINT) AS n_purchases
FROM att GROUP BY 1 ORDER BY 1
"""


def events_decayed_counts(sf_dir: str):
    """Time-decayed engagement score (the recency weighting every
    feed-ranking / freshness pipeline applies): per event type, events
    are weighted by how many 3-day half-lives separate them from the
    anchor (2024-02-01) — weight_micro = 1e6 >> k with
    k = elapsed // half_life, a STEPWISE exponential decay chosen
    because integer shifts are bit-equal across engines (a continuous
    pow(2, −x/hl) would differ in the last ulp between libm builds and
    flip floor boundaries). Partial per-batch sums, |types| rows out.

    Scale shape: pure combiner-before-shuffle; one narrow aggregate."""
    ANCHOR_US = 1_706_745_600_000_000   # 2024-02-01 00:00:00 UTC
    HALF_US = 3 * 86_400_000_000
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        k = np.minimum(
            (ANCHOR_US - t["ts"].cast(pa.int64())
             .to_numpy(zero_copy_only=False)) // HALF_US, 62)
        w = (1_000_000 >> k.astype(np.int64))
        g = pa.table({"event_type": t["event_type"],
                      "w": pa.array(w, pa.int64())}) \
            .group_by("event_type").aggregate([("w", "sum"),
                                               ([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "decayed_micro": g["w_sum"],
                         "n_events": pc.cast(g["count_all"], pa.int64())})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("decayed_micro", alias_name="decayed_micro"),
                       Sum("n_events", alias_name="n_events"))
            .sort("event_type"))


_EVENTS_DECAYED_SQL = """
SELECT event_type,
       CAST(SUM(1000000 >> LEAST(
            (epoch_us(TIMESTAMP '2024-02-01') - epoch_us(ts))
              // 259200000000, 62)) AS BIGINT) AS decayed_micro,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


def nation_supplier_hhi(sf_dir: str):
    """Herfindahl–Hirschman market-concentration index per nation: each
    supplier's revenue share of its nation in exact ppm, HHI = Σ share²
    (ppm² int64) — the antitrust-style concentration readout, and a
    second-moment-of-shares aggregate the share-of-total family doesn't
    cover. Supplier revenue pre-aggregates per batch; the supplier →
    nation attach is a hash join (supplier is a GROWING dim — VERDICT r3
    item #5's rule); only the ≤25-row nation totals broadcast.

    Scale shape: one combiner groupby on suppkey, one hash join, one
    25-row reduce."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nat_name = ray.put(dict(zip(nation["n_nationkey"].astype(int),
                                nation["n_name"])))
    nparts = _join_parts(sf_dir)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"l_suppkey": t["l_suppkey"],
                      "cents": _cents(rev)}) \
            .group_by("l_suppkey").aggregate([("cents", "sum")])
        return pa.table({"l_suppkey": g["l_suppkey"],
                         "cents": g["cents_sum"]})

    srev = (li.map_batches(partial, batch_format="pyarrow")
            .groupby("l_suppkey").aggregate(Sum("cents",
                                                alias_name="cents")))
    supp = read_table(sf_dir, "supplier",
                      columns=["s_suppkey", "s_nationkey"])
    j = srev.join(supp, join_type="inner", num_partitions=nparts,
                  on=("l_suppkey",), right_on=("s_suppkey",))

    totals = (j.map_batches(
        lambda t: pa.table({"s_nationkey": t["s_nationkey"],
                            "cents": t["cents"]}),
        batch_format="pyarrow")
        .groupby("s_nationkey").aggregate(Sum("cents",
                                              alias_name="nat_cents"))
        .to_pandas())   # ≤ |nations| rows — fixed-size broadcast
    tot_ref = ray.put(dict(zip(totals["s_nationkey"].astype(int),
                               totals["nat_cents"].astype(int))))

    def shares(t: pa.Table) -> pa.Table:
        tot = ray.get(tot_ref)
        names = ray.get(nat_name)
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        nat_tot = np.array([tot[int(x)] for x in nk], np.int64)
        share_ppm = cents * 1_000_000 // nat_tot
        return pa.table({
            "n_name": pa.array([names[int(x)] for x in nk], pa.string()),
            "hhi_ppm2": pa.array(share_ppm * share_ppm, pa.int64()),
            "n_suppliers": pa.array(np.ones(len(nk), np.int64))})

    return (j.map_batches(shares, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("hhi_ppm2", alias_name="hhi_ppm2"),
                       Sum("n_suppliers", alias_name="n_suppliers"))
            .sort("n_name"))


_NATION_HHI_SQL = """
WITH srev AS (
  SELECT l_suppkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
             AS BIGINT)) AS cents
  FROM lineitem GROUP BY 1),
j AS (SELECT s.s_nationkey, srev.cents FROM srev
      JOIN supplier s ON s.s_suppkey = srev.l_suppkey),
tot AS (SELECT s_nationkey, SUM(cents) AS nat_cents FROM j GROUP BY 1)
SELECT n.n_name,
       CAST(SUM((j.cents * 1000000 // t.nat_cents)
                * (j.cents * 1000000 // t.nat_cents)) AS BIGINT)
         AS hhi_ppm2,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM j JOIN tot t USING (s_nationkey)
JOIN nation n ON n.n_nationkey = j.s_nationkey
GROUP BY 1 ORDER BY 1
"""


def docs_sentence_len_quantiles(sf_dir: str):
    """Sentence-length profile (the readability/segmentation diagnostic
    a curation pipeline runs before chunking): split each document on
    terminator runs ``[.!?]+``, measure each sentence in ``[a-z]+``
    words, and emit exact per-source P25/P50/P90 (quantile_disc
    semantics) plus sentence counts. The explode happens inside the
    batch (one row per sentence, short strings never leave as text —
    only their integer lengths shuffle).

    Scale shape: fact-sized (source, len) pairs into a hash-partitioned
    grouped-quantile map_groups; output |sources| rows."""
    import math as _math

    from .functions.arrowutil import to_arrow

    docs = read_table(sf_dir, "documents", columns=["text", "source"])

    def explode(t: pa.Table) -> pa.Table:
        sents = pc.split_pattern_regex(t["text"].combine_chunks(),
                                       pattern="[.!?]+")
        flat = pc.list_flatten(sents)
        parent = pc.list_parent_indices(sents)
        src = t["source"].combine_chunks().take(parent)
        w = pc.cast(pc.count_substring_regex(pc.utf8_lower(flat),
                                             "[a-z]+"), pa.int64())
        keep = pc.greater(w, 0)
        return pa.table({"source": src.filter(keep),
                         "n_words": w.filter(keep)})

    ex = docs.map_batches(explode, batch_format="pyarrow")

    def prep(t: pa.Table) -> pa.Table:
        part_ids = pd.util.hash_pandas_object(
            pd.Series(t["source"].to_pandas()), index=False) % 8
        return t.append_column("part",
                               pa.array(part_ids.to_numpy(), pa.int64()))

    out_schema = pa.schema([("source", pa.string()),
                            ("n_sents", pa.int64()),
                            ("p25_words", pa.int64()),
                            ("p50_words", pa.int64()),
                            ("p90_words", pa.int64())])

    def quants(g: pd.DataFrame) -> pa.Table:
        rows = []
        for src, grp in g.groupby("source", sort=False):
            v = np.sort(grp["n_words"].to_numpy())
            n = len(v)
            pick = lambda q: int(v[max(1, _math.ceil(q * n)) - 1])
            rows.append({"source": src, "n_sents": n,
                         "p25_words": pick(0.25), "p50_words": pick(0.5),
                         "p90_words": pick(0.9)})
        return to_arrow(pd.DataFrame(rows), out_schema)

    return (ex.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(quants, batch_format="pandas")
            .sort("source"))


_DOCS_SENTLEN_SQL = """
WITH s AS (
  SELECT source,
         len(regexp_extract_all(lower(sent), '[a-z]+')) AS n_words
  FROM (SELECT source, unnest(regexp_split_to_array(text, '[.!?]+'))
          AS sent FROM documents)
  WHERE len(regexp_extract_all(lower(sent), '[a-z]+')) > 0)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sents,
       quantile_disc(n_words, 0.25) AS p25_words,
       quantile_disc(n_words, 0.5) AS p50_words,
       quantile_disc(n_words, 0.9) AS p90_words
FROM s GROUP BY 1 ORDER BY 1
"""


def events_type_trigrams(sf_dir: str):
    """Ordered 3-step behavior paths (sequence mining one step past the
    Markov transition matrix): per user, consecutive event-type
    trigrams by (ts, event_id), global top 20 by count. Trigrams are
    built with two vectorized shifts inside the per-user-bucket kernel;
    only (t1, t2, t3) triples shuffle.

    Scale shape: one modulo shuffle on user_id, per-bucket mergesort +
    shifts, bounded |types|³ aggregate."""
    from .functions.partitions import default_parts

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    nparts = max(2, min(default_parts(), ev.count() * 16 // 250_000 + 1))

    def add_part(t: pa.Table) -> pa.Table:
        part = t["user_id"].to_numpy(zero_copy_only=False) % nparts
        return pa.table({"user_id": t["user_id"],
                         "event_id": t["event_id"],
                         "ts": t["ts"], "event_type": t["event_type"],
                         "part": pa.array(part, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ty = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy()
        same = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        t1, t2, t3 = ty[:-2][same], ty[1:-1][same], ty[2:][same]
        g = (pa.table({"t1": pa.array(t1, pa.string()),
                       "t2": pa.array(t2, pa.string()),
                       "t3": pa.array(t3, pa.string())})
             .group_by(["t1", "t2", "t3"])
             .aggregate([([], "count_all")]))
        return pa.table({"t1": g["t1"], "t2": g["t2"], "t3": g["t3"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    return (ev.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pandas")
            .groupby(["t1", "t2", "t3"]).aggregate(Sum("n",
                                                       alias_name="n"))
            .sort(["n", "t1", "t2", "t3"],
                  descending=[True, False, False, False])
            .limit(20))


_EVENTS_TRIGRAMS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER w AS t2,
         LEAD(event_type, 2) OVER w AS t3,
         LEAD(user_id) OVER w AS u2,
         LEAD(user_id, 2) OVER w AS u3
  FROM events
  WINDOW w AS (ORDER BY user_id, ts, event_id))
SELECT event_type AS t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE u2 = user_id AND u3 = user_id
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3 LIMIT 20
"""


def events_user_cumdistinct(sf_dir: str):
    """Running DISTINCT count per user (the growing-window sibling of
    W27's trailing-range distinct): after each event, how many distinct
    event types the user has produced so far. Vectorized identity:
    running distinct = cumsum of the first-occurrence flag — one
    ``duplicated`` + ``cumsum`` per user inside the hash-bucket kernel.
    SQL spells the same trick as ROW_NUMBER()==1 → SUM() OVER.

    Scale shape: one modulo shuffle on user_id, per-bucket mergesort,
    fact-sized streaming output."""
    from .functions.partitions import default_parts

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    nparts = max(2, min(default_parts(), ev.count() * 16 // 250_000 + 1))

    def add_part(t: pa.Table) -> pa.Table:
        part = t["user_id"].to_numpy(zero_copy_only=False) % nparts
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "ts": t["ts"], "event_type": t["event_type"],
                         "part": pa.array(part, pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = ~g.duplicated(["user_id", "event_type"])
        run = first.groupby(g["user_id"].to_numpy()).cumsum()
        return pa.table({
            "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
            "n_distinct_types": pa.array(run.to_numpy(np.int64))})

    return (ev.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pandas")
            .sort("event_id"))


_EVENTS_CUMDISTINCT_SQL = """
SELECT event_id,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS n_distinct_types
FROM (SELECT event_id, user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) t
ORDER BY event_id
"""


_RAKE_MAX_PHRASE = 4


def _rake_phrases(texts, stopwords) -> "tuple[list, list]":
    """(phrase, words) candidate pairs for RAKE: lowercase ``[a-z]+``
    tokens, phrases are maximal stopword-free runs capped at
    _RAKE_MAX_PHRASE tokens (longer runs emit consecutive chunks —
    documented rule, mirrored by the test's recompute)."""
    import re

    tok_re = re.compile(r"[a-z]+")
    phrases = []
    for txt in texts:
        run = []
        for w in tok_re.findall(txt.lower()):
            if w in stopwords:
                if run:
                    phrases.extend(
                        (tuple(run[i:i + _RAKE_MAX_PHRASE]))
                        for i in range(0, len(run), _RAKE_MAX_PHRASE))
                    run = []
            else:
                run.append(w)
        if run:
            phrases.extend(tuple(run[i:i + _RAKE_MAX_PHRASE])
                           for i in range(0, len(run), _RAKE_MAX_PHRASE))
    return phrases


def docs_rake_keyphrases(sf_dir: str):
    """RAKE keyphrase extraction (Rose et al. 2010 — the unsupervised
    keyword step that seeds entity/term candidates for KG construction):
    candidate phrases are maximal stopword-free token runs; each word
    scores degree/freq where freq counts occurrences and degree sums the
    containing phrase's length; a phrase scores the sum of its words'
    scores. Corpus-level top 20 by (score, phrase). Fully distributed:
    phrase explode per batch → word-stat partial sums → one groupby →
    word scores rejoin the exploded (phrase, word) rows via a hash join
    (no vocabulary broadcast — the unigram-NLL lesson) → per-phrase sum.
    Word scores are exact micro-ints (floor(degree·1e6/freq)), so the
    result is bit-stable. Rows-only; the oracle is a single-process
    recompute in tests/test_text_functions.py."""
    from .functions.text import STOPWORDS

    docs = read_table(sf_dir, "documents", columns=["text"])
    nparts = max(2, min(16, pq.read_metadata(
        f"{sf_dir}/documents.parquet").num_rows // 100_000 + 2))

    def explode(t: pa.Table) -> pa.Table:
        phrases = _rake_phrases(t["text"].to_pylist(), STOPWORDS)
        ptxt, word, plen = [], [], []
        for ph in phrases:
            for w in ph:
                ptxt.append(" ".join(ph))
                word.append(w)
                plen.append(len(ph))
        return pa.table({"phrase": pa.array(ptxt, pa.string()),
                         "word": pa.array(word, pa.string()),
                         "plen": pa.array(plen, pa.int64())})

    pw = docs.map_batches(explode, batch_format="pyarrow")

    def word_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"word": t["word"], "deg": t["plen"]})
             .group_by("word").aggregate([("deg", "sum"),
                                          ([], "count_all")]))
        return pa.table({"word": g["word"], "deg": g["deg_sum"],
                         "freq": pc.cast(g["count_all"], pa.int64())})

    wstats = (pw.map_batches(word_partial, batch_format="pyarrow")
              .groupby("word")
              .aggregate(Sum("deg", alias_name="deg"),
                         Sum("freq", alias_name="freq")))

    scored = pw.join(wstats, join_type="inner", num_partitions=nparts,
                     on=("word",), right_on=("word",))

    def score(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False)
        freq = t["freq"].to_numpy(zero_copy_only=False)
        return pa.table({"phrase": t["phrase"],
                         "w_score": pa.array(deg * 1_000_000 // freq,
                                             pa.int64())})

    return (scored.map_batches(score, batch_format="pyarrow")
            .groupby("phrase")
            .aggregate(Sum("w_score", alias_name="score_micro"))
            .sort(["score_micro", "phrase"], descending=[True, False])
            .limit(20))


def emb_pq_codes(sf_dir: str):
    """Product-quantization codebook train + encode (functions/
    vectors.py `pq_train_encode`) — the PQ compression leg of the ANN
    suite (V2 IVF handles routing; PQ handles memory): 4 subspaces × 16
    centroids over the 64-d embeddings, each subspace trained by the
    deterministic integer-exact k-means. Output: per (subspace, code)
    cell count + exact int64 distortion total — the codebook-balance
    diagnostic. Bit-deterministic; rows-only (iterative training), with
    layout-invariance + distortion-recompute tests in
    tests/test_kmeans.py."""
    from .functions.vectors import pq_train_encode

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    _, codes = pq_train_encode(emb, m=4, k=16, iters=3)
    return (codes.groupby(["subspace", "code"])
            .aggregate(Count(alias_name="n_vecs"),
                       Sum("distortion_micro2",
                           alias_name="distortion_micro2"))
            .sort(["subspace", "code"]))


def docs_winnow_pairs(sf_dir: str):
    """Winnowing / MOSS document-overlap detection (Schleimer et al.
    2003 — the guaranteed-recall cousin of MinHash: any shared substring
    of ≥ w+k−1 chars shares a fingerprint): per doc the winnowed
    fingerprint set (vectorized rolling-hash + window-min kernels,
    functions/dedup.py), cross-doc pairs bucketed BY FINGERPRINT
    (co-partitioned wedge enumeration — never all-pairs), top 20 pairs
    by shared-fingerprint count. Fingerprints with df > 50 are dropped
    as boilerplate before pairing (caps the wedge frontier; documented
    — MOSS does the same). Rows-only; oracle = single-process recompute
    in tests/test_dedup.py."""
    from .functions.dedup import winnow_fingerprints

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fps(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            f = winnow_fingerprints(txt)
            ids.append(np.full(len(f), did, np.int64))
            hs.append(f.astype(np.int64))   # same bits, arrow-friendly
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids) if ids
                               else np.empty(0, np.int64)),
            "fp": pa.array(np.concatenate(hs) if hs
                           else np.empty(0, np.int64))})

    pairs_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("pn", pa.int64())])

    def bucket_fp(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["fp"], 32, "_p")

    def doc_pairs(g: pd.DataFrame) -> pa.Table:
        # ONE vectorized pass per fp-hash BUCKET (millions of per-fp
        # map_groups calls was the P5 pathology — 94 s at sf0.1):
        # boilerplate/singleton fps drop via value_counts, then
        # _pairs_within_groups enumerates every surviving fp's pairs in
        # one kernel, with a local (a, b) count combine before the
        # shuffle
        vc = g["fp"].value_counts()
        keep = vc[(vc >= 2) & (vc <= 50)].index
        g = g[g["fp"].isin(keep)].sort_values(["fp", "doc_id"])
        if len(g) == 0:
            return pairs_schema.empty_table()
        _, a, b = _pairs_within_groups(
            g["fp"].to_numpy(np.int64), g["doc_id"].to_numpy(np.int64))
        cnt = pd.DataFrame({"a": a, "b": b}) \
            .groupby(["a", "b"], sort=False).size().reset_index(name="pn")
        return pa.table({"a": pa.array(cnt["a"].to_numpy(np.int64)),
                         "b": pa.array(cnt["b"].to_numpy(np.int64)),
                         "pn": pa.array(cnt["pn"].to_numpy(np.int64))}
                        ).cast(pairs_schema)

    def tag_pair(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["a", "b"], 32, "_pp")

    def sum_pairs(g: pd.DataFrame) -> pa.Table:
        # global per-(a, b) sums via hash-bucketed pandas — the (a, b)
        # key is near-unique (sf0.1: 683k distinct of 759k instances)
        # and Ray's sort-groupby aggregate walks those one-row groups
        # in Python (the _part_cooccur_counts pathology: 100 s where
        # this takes ~1 s). Buckets hash on the FULL key, so
        # bucket-local sums ARE global sums.
        cnt = g.groupby(["a", "b"], sort=False)["pn"].sum() \
            .reset_index(name="n_shared")
        return pa.table({"a": pa.array(cnt["a"].to_numpy(np.int64)),
                         "b": pa.array(cnt["b"].to_numpy(np.int64)),
                         "n_shared": pa.array(
                             cnt["n_shared"].to_numpy(np.int64))})

    return (docs.map_batches(fps, batch_format="pyarrow")
            .map_batches(bucket_fp, batch_format="pyarrow")
            .groupby("_p").map_groups(doc_pairs, batch_format="pandas")
            .map_batches(tag_pair, batch_format="pyarrow")
            .groupby("_pp").map_groups(sum_pairs, batch_format="pandas")
            .sort(["n_shared", "a", "b"], descending=[True, False, False])
            .limit(20))


def orders_zorder_audit(sf_dir: str):
    """Z-order (Morton) layout audit — the data-skipping diagnostic a
    lakehouse runs before choosing a table's clustering keys: orders are
    bucketed to 8-bit ranks on (o_custkey, price-cents), laid out by
    Z-value (bit-interleaved), by single-key o_custkey, or by insertion
    order (o_orderkey — the no-clustering baseline), cut into 64 equal
    row blocks (global_row_number → block = (rn−1)·64/n), and each
    layout reports Σ per-block zone SPAN ((x_range+1)+(y_range+1)) —
    proportional to the expected zone-map scan fraction under point
    predicates on either dim. Lower = better skipping; Z-order bounds
    BOTH dims per block where each single-key layout leaves the other
    dim unclustered. (Additive span is the scale-robust metric: the
    multiplicative volume flips at sparse occupancy because Morton
    ranges crossing high-bit boundaries inflate bounding boxes.)
    Exact ints end-to-end. Rows-only; recompute golden +
    z-beats-both-baselines property in tests/test_new_ops.py."""
    from .functions.rank import global_row_number

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice"])
    stats = orders.map_batches(
        lambda t: pa.table({"xv": t["o_custkey"],
                            "yv": _cents(t["o_totalprice"])}),
        batch_format="pyarrow") \
        .aggregate(Max("xv", alias_name="mx"), Max("yv", alias_name="my"))
    mx, my = int(stats["mx"]) + 1, int(stats["my"]) + 1

    def add_keys(t: pa.Table) -> pa.Table:
        x = (t["o_custkey"].to_numpy(zero_copy_only=False)
             * 256 // mx).astype(np.int64)
        y = (_cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
             * 256 // my).astype(np.int64)
        z = np.zeros(len(x), np.int64)
        for bit in range(8):
            z |= ((x >> bit) & 1) << (2 * bit + 1)
            z |= ((y >> bit) & 1) << (2 * bit)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "x": pa.array(x), "y": pa.array(y),
                         "z": pa.array(z)})

    keyed = orders.map_batches(add_keys, batch_format="pyarrow")
    n = keyed.count()

    def layout_span(order_cols: "list[str]", name: str) -> pa.Table:
        rn = global_row_number(keyed, order_by=order_cols + ["o_orderkey"],
                               out_col="rn")
        blk = rn.map_batches(
            lambda t: pa.table({
                "block": pa.array(
                    (t["rn"].to_numpy(zero_copy_only=False) - 1)
                    * 64 // n, pa.int64()),
                "x": t["x"], "y": t["y"]}),
            batch_format="pyarrow")
        spans = (blk.groupby("block")
                 .aggregate(Min("x", alias_name="x0"),
                            Max("x", alias_name="x1"),
                            Min("y", alias_name="y0"),
                            Max("y", alias_name="y1"))
                 .map_batches(lambda t: pa.table({
                     "layout": pa.array([name] * t.num_rows, pa.string()),
                     "span": pc.add(
                         pc.add(pc.subtract(t["x1"], t["x0"]),
                                pc.subtract(t["y1"], t["y0"])),
                         pa.scalar(2, pa.int64()))}),
                     batch_format="pyarrow"))
        return spans

    z_spans = layout_span(["z"], "zorder")
    k_spans = layout_span(["x"], "custkey")
    i_spans = layout_span(["o_orderkey"], "insertion")
    return (z_spans.union(k_spans).union(i_spans)
            .groupby("layout")
            .aggregate(Sum("span", alias_name="total_zone_span"),
                       Count(alias_name="n_blocks"))
            .sort("layout"))


def part_graph_label_prop(sf_dir: str):
    """Synchronous label propagation communities (Raghavan et al. 2007,
    deterministic variant): labels start as node ids; each round every
    node adopts the most frequent label among its neighbors (ties → the
    smallest label), 5 fixed rounds. Each round is one hash join
    (labels onto the adjacency's nbr side) + a (node, label) count
    groupby + a per-node argmax map_groups — nothing denser than the
    edge list ever shuffles, and the fixed-round synchronous schedule
    makes the result bit-deterministic (async LPA is run-order
    dependent; documented choice). Output: top 20 communities by (size
    desc, label). Rows-only; single-process parity on planted-clique
    graphs + determinism on this table in
    tests/test_graph_properties.py."""
    from .functions.graphops import label_propagation

    labels = label_propagation(_part_strong_edges(sf_dir), rounds=5,
                               num_partitions=_join_parts(sf_dir))
    return (labels.groupby("label").aggregate(Count(alias_name="size"))
            .sort(["size", "label"], descending=[True, False])
            .limit(20))


def orders_max_concurrency(sf_dir: str):
    """Interval max-concurrency sweep (the classic +1/−1 event-sweep
    every scheduler/capacity planner runs): treating each order as open
    for 7 days, the maximum number of simultaneously-open orders and the
    first microsecond timestamp at which that maximum is reached. Each
    order emits a (+1 at start, −1 at end) point; a GLOBAL ordered
    running sum (functions/rank.py two-pass range-partitioned cumsum —
    ends sort before starts at equal ts, matching half-open intervals)
    yields the concurrency curve; its max and argmin-ts reduce in one
    aggregate each. Within an equal-(ts, delta) tie group the running
    values are a permutation of the same set, so MAX and its first ts
    are tie-order invariant in both engines (the unique pid tiebreak
    only satisfies the running-sum contract).

    Scale shape: 2 rows per order through one range shuffle; two scalar
    reduces."""
    from .functions.rank import global_running_sum

    DAY7_US = 7 * 86_400_000_000
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate"])

    def points(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "ts": pa.array(np.concatenate([ts, ts + DAY7_US])),
            "delta": pa.array(np.concatenate([
                np.ones(len(ts), np.int64),
                np.full(len(ts), -1, np.int64)])),
            "pid": pa.array(np.concatenate([key * 2, key * 2 + 1]))})

    pts = orders.map_batches(points, batch_format="pyarrow")
    run = global_running_sum(pts, "delta",
                             order_by=["ts", "delta", "pid"],
                             out_col="conc")
    peak = run.aggregate(Max("conc", alias_name="mx"))
    mx = int(peak["mx"])
    first = run.map_batches(
        lambda t: t.filter(pc.equal(t["conc"],
                                    pa.scalar(mx, pa.int64()))),
        batch_format="pyarrow").aggregate(Min("ts",
                                              alias_name="first_ts_us"))
    return pd.DataFrame({"max_concurrency": [mx],
                         "first_ts_us": [int(first["first_ts_us"])]})


_ORDERS_MAXCONC_SQL = """
WITH pts AS (
  SELECT epoch_us(o_orderdate) AS ts, 1 AS delta FROM orders
  UNION ALL
  SELECT epoch_us(o_orderdate + INTERVAL 7 DAY), -1 FROM orders),
run AS (SELECT ts, SUM(delta) OVER (ORDER BY ts, delta
          ROWS UNBOUNDED PRECEDING) AS conc FROM pts)
SELECT CAST(MAX(conc) AS BIGINT) AS max_concurrency,
       CAST(MIN(CASE WHEN conc = (SELECT MAX(conc) FROM run)
                THEN ts END) AS BIGINT) AS first_ts_us
FROM run
"""


def docs_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve (the tokenizer-sizing diagnostic: what
    share of corpus token OCCURRENCES do the top-K types cover?): for
    K ∈ {10, 100, 1000}, the covered occurrence count and its exact ppm
    share. Term counts collapse through per-batch combiners; the global
    rank is the two-pass range-partitioned row number over the (count
    desc, term) order — vocabulary-sized, never corpus-sized; three
    conditional sums finish it.

    Scale shape: corpus → vocab in one combiner groupby; everything
    after is vocab-sized."""
    from .functions.rank import global_row_number

    docs = read_table(sf_dir, "documents", columns=["text"])

    def term_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), pattern="[^a-z]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        g = pa.table({"term": flat}).group_by("term") \
            .aggregate([([], "count_all")])
        return pa.table({"term": g["term"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    vocab = (docs.map_batches(term_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("n", alias_name="n")))
    ranked = global_row_number(vocab, order_by=["n", "term"],
                               descending=[True, False], out_col="rank")

    def partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        r = t["rank"].to_numpy(zero_copy_only=False)
        rows = {"k": [], "covered": [], "total": []}
        for k in (10, 100, 1000):
            rows["k"].append(k)
            rows["covered"].append(int(n[r <= k].sum()))
            rows["total"].append(int(n.sum()))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    agg = (ranked.map_batches(partial, batch_format="pyarrow")
           .groupby("k").aggregate(Sum("covered", alias_name="covered"),
                                   Sum("total", alias_name="total")))

    def finish(t: pa.Table) -> pa.Table:
        cov = t["covered"].to_numpy(zero_copy_only=False)
        tot = t["total"].to_numpy(zero_copy_only=False)
        return pa.table({"k": t["k"], "covered": t["covered"],
                         "total": t["total"],
                         "share_ppm": pa.array(cov * 1_000_000 // tot,
                                               pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("k")


_DOCS_VOCABCOV_SQL = """
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
  FROM documents),
vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok
          WHERE term <> '' GROUP BY 1),
ranked AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank
           FROM vocab),
ks AS (SELECT unnest([10, 100, 1000]) AS k)
SELECT k.k AS k,
       CAST(SUM(CASE WHEN r.rank <= k.k THEN r.n ELSE 0 END) AS BIGINT)
         AS covered,
       CAST(SUM(r.n) AS BIGINT) AS total,
       CAST(SUM(CASE WHEN r.rank <= k.k THEN r.n ELSE 0 END) * 1000000
            // SUM(r.n) AS BIGINT) AS share_ppm
FROM ks k CROSS JOIN ranked r
GROUP BY 1 ORDER BY 1
"""


def kg_reciprocity(sf_dir: str):
    """Directed-graph reciprocity over the materialized KG (the
    ontology-symmetry diagnostic: how often does s→o come with o→s?):
    distinct directed entity pairs, the count whose reverse also exists,
    and the exact ppm ratio. The reverse check is a semi join of the
    pair table against its own swap — co-partitioned membership, no
    driver sets.

    Scale shape: edges → distinct pairs (combiner), one semi join, two
    scalars out. Rows-only (KG tables aren't DuckDB views); golden =
    pandas recomputation in tests/test_flagship.py."""
    from .functions.joins import semi_join

    edges = _kg_run(sf_dir)["edges"]
    pairs = (edges.map_batches(
        lambda t: pa.table({"src": t["subj_id"], "dst": t["obj_id"]})
                    .group_by(["src", "dst"]).aggregate([]),
        batch_format="pyarrow")
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["src", "dst"]),
                     batch_format="pyarrow").materialize())
    swapped = pairs.map_batches(
        lambda t: pa.table({"key": pc.binary_join_element_wise(
            pc.cast(t["dst"], pa.string()), pc.cast(t["src"], pa.string()),
            "|")}), batch_format="pyarrow")
    keyed = pairs.map_batches(
        lambda t: t.append_column("key", pc.binary_join_element_wise(
            pc.cast(t["src"], pa.string()), pc.cast(t["dst"], pa.string()),
            "|")), batch_format="pyarrow")
    recip = semi_join(keyed, swapped, left_key="key", right_key="key")
    n_pairs, n_recip = pairs.count(), recip.count()
    return pd.DataFrame({
        "n_pairs": [n_pairs], "n_reciprocal": [n_recip],
        "reciprocity_ppm": [n_recip * 1_000_000 // max(n_pairs, 1)]})


def media_phash_pairs(sf_dir: str):
    """Image near-duplicate detection by DCT perceptual hash — the
    multimodal leg of the dedup suite (exact/simhash/minhash cover text;
    THIS covers re-encoded / lightly-edited images): a deterministic
    mixed-format corpus (PPM/BMP/PNG round-robin) with PLANTED near-dup
    pairs (odd ids are ±3-noise copies of their predecessor) →
    PHashImages actor pool (stages/multimodal.py: real decode →
    grayscale → block-mean 32×32 → DCT-II → 64-bit sign hash) →
    hamming_pairs_banded (functions/dedup.py — the Manku block scheme,
    EXACT recall ≤ hamming 3). Output: (id_a, id_b, hamming) pairs.
    Rows-only; planted-pair equality golden in tests/test_multimodal.py."""
    from .functions.dedup import hamming_pairs_banded
    from .sources.mediacodec import encode_bmp, encode_png, encode_ppm
    from .stages.multimodal import MEDIA_SCHEMA, phash_images

    n = max(24, _n_media(sf_dir) // 8) // 2 * 2
    encs = [encode_ppm, encode_bmp, lambda a: encode_png(a)]
    payloads = []
    base = None
    for i in range(n):
        rng = np.random.default_rng(4000 + i)
        if i % 2 == 0:
            base = np.zeros((24, 24, 3), np.uint8)
            for _ in range(3):   # structured content, far-apart hashes
                y, x = rng.integers(0, 16, 2)
                hh, ww = rng.integers(4, 9, 2)
                base[y:y + hh, x:x + ww] = rng.integers(40, 256, 3)
            img = base
        else:
            img = np.clip(base.astype(np.int64)
                          + rng.integers(-3, 4, base.shape),
                          0, 255).astype(np.uint8)
        payloads.append(encs[i % 3](img))
    t = pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n, pa.string()),
        "width": pa.array([24] * n, pa.int32()),
        "height": pa.array([24] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    }).cast(MEDIA_SCHEMA)
    hashed = phash_images(ray.data.from_arrow(t))
    return (hamming_pairs_banded(hashed, id_col="media_id",
                                 hash_col="phash", max_hamming=3)
            .rename_columns({"id_a": "media_a", "id_b": "media_b"})
            .sort(["media_a", "media_b"]))


def orders_orc_roundtrip(sf_dir: str):
    """ORC source/sink (widens the format matrix past parquet / CSV /
    NDJSON / gzip-NDJSON / Arrow IPC): every input block writes one ORC
    file via pyarrow.orc inside map_batches (the per-shard sink layout —
    resumable, never one giant file), the read back is file-parallel
    (one task per file), and the aggregate is checked against the
    ORIGINAL parquet through the oracle. Ray Data ships no ORC reader —
    this is the from_items(paths) → map_batches(orc.read_table) source
    pattern any missing format gets."""
    import os
    import shutil

    import pyarrow.orc as _orc

    out_dir = f"/tmp/ies_orc_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows:
            # content-addressed name: deterministic, collision-free,
            # resumable (same block → same file on retry)
            import hashlib as _h
            name = _h.md5(t["o_orderkey"].to_string().encode()) \
                .hexdigest()[:16]
            _orc.write_table(t, f"{out_dir}/{name}.orc")
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    read_table(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderpriority"]) \
        .map_batches(write_block, batch_format="pyarrow") \
        .aggregate(Sum("rows", alias_name="rows"))   # drives the write

    files = sorted(os.path.join(out_dir, f) for f in os.listdir(out_dir))

    def read_file(batch: pd.DataFrame) -> pa.Table:
        tabs = [_orc.read_table(p) for p in batch["path"]]
        return pa.concat_tables(tabs)

    back = ray.data.from_items(
        [{"path": p} for p in files]).map_batches(
        read_file, batch_size=1, batch_format="pandas")
    return (back.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n"),
                       Sum("o_orderkey", alias_name="sum_orderkey"),
                       Sum("o_custkey", alias_name="sum_custkey"))
            .sort("o_orderpriority"))


_ORDERS_ORC_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_orderkey,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
FROM orders GROUP BY 1 ORDER BY 1
"""


def customer_cohort_revenue(sf_dir: str):
    """Cohort revenue matrix (the LTV readout marketing runs after the
    retention table): customers cohorted by FIRST-order year, exact
    cents revenue per (cohort_year, order_year) cell. First-order year
    via a per-customer Min aggregate (combiner-backed), attached to the
    order stream through auto_join's size chooser; the cell groupby is
    calendar-bounded (#years² rows).

    Scale shape: fact → per-customer min (skinny) → one chooser join →
    bounded groupby."""
    from .functions.joins import auto_join

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        return pa.table({"o_custkey": t["o_custkey"],
                         "order_year": pc.cast(yr, pa.int64()),
                         "cents": _cents(t["o_totalprice"])})

    fact = orders.map_batches(prep, batch_format="pyarrow")
    first = (fact.groupby("o_custkey")
             .aggregate(Min("order_year", alias_name="cohort_year"))
             .rename_columns({"o_custkey": "fc"}))
    j = auto_join(fact, first, left_key="o_custkey", right_key="fc",
                  right_cols=["cohort_year"])
    return (j.groupby(["cohort_year", "order_year"])
            .aggregate(Count(alias_name="n_orders"),
                       Sum("cents", alias_name="revenue_cents"))
            .sort(["cohort_year", "order_year"]))


_CUSTOMER_COHORT_SQL = """
WITH f AS (SELECT o_custkey,
                  MIN(EXTRACT(year FROM o_orderdate)) AS cohort_year
           FROM orders GROUP BY 1)
SELECT CAST(f.cohort_year AS BIGINT) AS cohort_year,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN f ON f.o_custkey = o.o_custkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_type_burst(sf_dir: str):
    """Burst detection (Kleinberg-lite): per event type, the maximum
    number of events of that type inside any trailing-10-minute window —
    the rate-spike statistic an abuse/incident monitor tracks. Per-type
    buckets sort once; the window count is the two-searchsorted kernel
    (W22's formulation), the max reduces in-bucket so only |types| rows
    shuffle out.

    Scale shape: one modulo shuffle on event_type, per-bucket sort +
    vectorized window counts, |types| rows out."""
    TEN_MIN_US = 600_000_000
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def add_part(t: pa.Table) -> pa.Table:
        part_ids = pd.util.hash_pandas_object(
            pd.Series(t["event_type"].to_pandas()), index=False) % 8
        return pa.table({"event_type": t["event_type"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "part": pa.array(part_ids.to_numpy(), pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        rows_t, rows_m = [], []
        for ty, grp in g.groupby("event_type", sort=False):
            ts = np.sort(grp["ts_us"].to_numpy())
            hi = np.searchsorted(ts, ts, side="right")
            lo = np.searchsorted(ts, ts - TEN_MIN_US, side="left")
            rows_t.append(ty)
            rows_m.append(int((hi - lo).max()) if len(ts) else 0)
        return pa.table({"event_type": pa.array(rows_t, pa.string()),
                         "max_burst_10m": pa.array(rows_m, pa.int64())})

    return (ev.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pandas")
            .sort("event_type"))


_EVENTS_BURST_SQL = """
SELECT event_type,
       CAST(MAX(w) AS BIGINT) AS max_burst_10m
FROM (SELECT event_type,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS w
      FROM events) t
GROUP BY 1 ORDER BY 1
"""


def emb_knn_pq_rerank(sf_dir: str):
    """PQ-ADC approximate nearest neighbors with exact rerank — the
    memory-compressed ANN search path that completes the triad (V1
    brute force, V2 IVF routing, V6 LSH; THIS is how a billion-vector
    index actually answers queries): train m=8 × k=16 codebooks
    (pq_train_encode), build the query's asymmetric-distance tables
    (4×16 ints — a broadcast-safe constant), scan codes per batch
    summing table lookups (no full vectors touched), take the top-50
    approximate candidates, then exactly rerank ONLY those 50 in full
    precision to the final top 10 by (L2², vec_id). Query vector via
    the row-group-pruned fetch_value point read. Rows-only (iterative
    training); recall-vs-brute-force + determinism tests in
    tests/test_similarity.py."""
    from .functions.vectors import _SCALE, pq_train_encode
    from .sources.tables import fetch_value

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"])
    books, _ = pq_train_encode(emb, m=8, k=16, iters=3)
    m, k, sub = books.shape
    q = np.round(np.asarray(
        fetch_value(sf_dir, "embeddings", key_col="vec_id", key=0,
                    value_col="embedding"), np.float64) * _SCALE) \
        .astype(np.int64)
    cb = np.round(books).astype(np.int64)
    adc = np.stack([((q[s * sub:(s + 1) * sub][None, :] - cb[s]) ** 2)
                    .sum(axis=1) for s in range(m)])   # (m, k) int64
    adc_ref = ray.put(adc)
    cb_ref = ray.put(cb)
    d = m * sub

    def approx(t: pa.Table) -> pa.Table:
        vecs = t["embedding"].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        mat = np.round(flat.reshape(len(t), d).astype(np.float64)
                       * _SCALE).astype(np.int64)
        c = ray.get(cb_ref)
        table = ray.get(adc_ref)
        dist = np.zeros(len(mat), np.int64)
        for s in range(m):
            seg = mat[:, s * sub:(s + 1) * sub]
            d2 = ((seg[:, None, :] - c[s][None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d2, axis=1)
            dist += table[s][codes]
        # per-batch partial top-100 before the global sort
        order = np.argsort(dist, kind="stable")[:100]
        return pa.table({
            "vec_id": t["vec_id"].take(pa.array(order)),
            "approx_d2": pa.array(dist[order], pa.int64())})

    cands = (emb.map_batches(approx, batch_format="pyarrow")
             .sort(["approx_d2", "vec_id"]).limit(100).to_pandas())
    cand_ids = set(cands["vec_id"].astype(int))

    def exact(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["vec_id"],
                        value_set=pa.array(sorted(cand_ids), pa.int64()))
        t = t.filter(mask)
        if t.num_rows == 0:
            return pa.schema([("vec_id", pa.int64()),
                              ("d2", pa.int64())]).empty_table()
        vecs = t["embedding"].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        mat = np.round(flat.reshape(t.num_rows, d).astype(np.float64)
                       * _SCALE).astype(np.int64)
        d2 = ((mat - q[None, :]) ** 2).sum(axis=1)
        return pa.table({"vec_id": t["vec_id"],
                         "d2": pa.array(d2, pa.int64())})

    return (emb.map_batches(exact, batch_format="pyarrow")
            .sort(["d2", "vec_id"]).limit(10).to_pandas())


def events_session_duration_quantiles(sf_dir: str):
    """Session-duration distribution (the engagement readout sessionize
    feeds): 30-minute-gap sessions (functions/window.py sessionize, W5),
    per-session duration = max−min ts in exact µs (single-event sessions
    count as 0), then global session count + exact P50/P90 via the
    combiner-histogram quantile plan.

    Scale shape: one hash shuffle for sessionize, one (user, session)
    groupby, a distinct-value-sized histogram to the driver."""
    from .functions.quantiles import exact_quantiles
    from .functions.window import sessionize

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts"])
    sess = sessionize(ds, keys=["user_id"], ts_col="ts",
                      order_by=["ts", "event_id"],
                      gap=pd.Timedelta(minutes=30))

    durs = (sess.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "session_id": pc.cast(t["session_id"],
                                                  pa.int64()),
                            "ts_us": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow")
        .groupby(["user_id", "session_id"])
        .aggregate(Min("ts_us", alias_name="t0"),
                   Max("ts_us", alias_name="t1"))
        .map_batches(lambda t: pa.table({
            "dur_us": pc.subtract(t["t1"], t["t0"])}),
            batch_format="pyarrow"))

    n_sessions = durs.count()
    q = exact_quantiles(durs, "dur_us", [0.5, 0.9])
    return pd.DataFrame({
        "n_sessions": [n_sessions],
        "p50_us": [int(q["value"].iloc[0])],
        "p90_us": [int(q["value"].iloc[1])]})


_EVENTS_SESSDUR_SQL = """
WITH g AS (SELECT user_id, event_id, ts,
                  epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
           FROM events),
s AS (SELECT user_id, epoch_us(ts) AS ts_us,
             SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sess
      FROM g),
d AS (SELECT user_id, sess, MAX(ts_us) - MIN(ts_us) AS dur_us
      FROM s GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       quantile_disc(dur_us, 0.5) AS p50_us,
       quantile_disc(dur_us, 0.9) AS p90_us
FROM d
"""


def kg_complete_entities(sf_dir: str):
    """Relational division ON THE KG (the SPARQL star-pattern
    completeness query: which entities carry EVERY predicate in the
    ontology's required set?): subjects having all of the KG's 3 most
    frequent predicates. The required set derives from a bounded
    predicate-frequency aggregate; coverage is the distinct (subj, pred)
    combiner + per-subject count == |required| filter — the R3 division
    plan applied to graph data. Output: n_complete + the 10 smallest
    qualifying entity ids (bounded cell). Rows-only; pandas golden in
    tests/test_flagship.py."""
    edges = _kg_run(sf_dir)["edges"]

    preds = (edges.groupby("pred").aggregate(Count(alias_name="n"))
             .sort(["n", "pred"], descending=[True, False])
             .limit(3).to_pandas())
    req = sorted(preds["pred"])
    req_ref = ray.put(set(req))

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["pred"], value_set=pa.array(req, pa.string()))
        t = t.filter(keep)
        return pa.table({"subj_id": t["subj_id"], "pred": t["pred"]}) \
            .group_by(["subj_id", "pred"]).aggregate([])

    per_subj = (edges.map_batches(pairs, batch_format="pyarrow")
                .groupby(["subj_id", "pred"])
                .aggregate(Count(alias_name="_n"))
                .groupby("subj_id")
                .aggregate(Count(alias_name="n_preds")))

    full = per_subj.map_batches(
        lambda t: t.filter(pc.equal(t["n_preds"],
                                    pa.scalar(len(req), pa.int64()))),
        batch_format="pyarrow")
    n_complete = full.count()
    head = full.sort("subj_id").limit(10).to_pandas()
    return pd.DataFrame({
        "n_complete": [n_complete],
        "required_preds": [",".join(req)],
        "first_entities": [",".join(map(str, head["subj_id"]))]})


_HREF_RE = None


def pages_link_stats(sf_dir: str):
    """Outlink extraction + per-domain link stats — the crawl-frontier /
    web-graph step between fetching and ranking: every ``<a href>`` is
    pulled from the raw html (compiled regex bound once per process),
    relative targets resolve against the page url, and the per-domain
    aggregate reports pages, total links, distinct internal targets, and
    external-link count. The distinct-target set collapses through a
    per-batch (domain, target) dedup combiner, so the shuffle carries
    distinct pairs, never raw link occurrences.

    Scale shape: regex scan per batch (C-speed over html bytes), two
    bounded groupbys. Rows-only (pages are synthesized); the oracle is
    the refimpl recompute in tests/test_pages_io.py."""
    import re

    from .sources.pages import synth_pages

    global _HREF_RE
    if _HREF_RE is None:
        _HREF_RE = re.compile(rb'<a\s+href="([^"]*)"')
    href_re = _HREF_RE

    pages = synth_pages(_n_pages(sf_dir))

    def links(t: pa.Table) -> pa.Table:
        doms, tgts = [], []
        n_links = np.zeros(t.num_rows, np.int64)
        n_ext = np.zeros(t.num_rows, np.int64)
        urls = t["url"].to_pylist()
        htmls = t["html"].to_pylist()
        for i, (url, html) in enumerate(zip(urls, htmls)):
            host = url.split("://", 1)[1].split("/", 1)[0]
            for m in href_re.findall(html):
                href = m.decode()
                n_links[i] += 1
                if href.startswith("http://") or href.startswith(
                        "https://"):
                    thost = href.split("://", 1)[1].split("/", 1)[0]
                    if thost != host:
                        n_ext[i] += 1
                        continue
                    tgt = href
                else:
                    tgt = f"https://{host}{href}" if href.startswith("/") \
                        else f"https://{host}/{href}"
                doms.append(host)
                tgts.append(tgt)
        hosts = pa.array([u.split("://", 1)[1].split("/", 1)[0]
                          for u in urls], pa.string())
        per_page = pa.table({
            "domain": hosts,
            "n_pages": pa.array(np.ones(t.num_rows, np.int64)),
            "n_links": pa.array(n_links),
            "n_external": pa.array(n_ext),
        }).group_by("domain").aggregate(
            [("n_pages", "sum"), ("n_links", "sum"),
             ("n_external", "sum")])
        pairs = pa.table({"domain": pa.array(doms, pa.string()),
                          "target": pa.array(tgts, pa.string())}) \
            .group_by(["domain", "target"]).aggregate([])
        return pa.table({
            "domain": pa.concat_arrays([
                per_page["domain"].combine_chunks(),
                pairs["domain"].combine_chunks()]),
            "n_pages": pa.concat_arrays([
                per_page["n_pages_sum"].combine_chunks(),
                pa.nulls(pairs.num_rows, pa.int64())]),
            "n_links": pa.concat_arrays([
                per_page["n_links_sum"].combine_chunks(),
                pa.nulls(pairs.num_rows, pa.int64())]),
            "n_external": pa.concat_arrays([
                per_page["n_external_sum"].combine_chunks(),
                pa.nulls(pairs.num_rows, pa.int64())]),
            "target": pa.concat_arrays([
                pa.nulls(per_page.num_rows, pa.string()),
                pairs["target"].combine_chunks()])})

    mixed = pages.map_batches(links, batch_format="pyarrow").materialize()

    counts = (mixed.map_batches(
        lambda t: t.filter(pc.is_valid(t["n_pages"]))
                   .select(["domain", "n_pages", "n_links", "n_external"]),
        batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Sum("n_pages", alias_name="n_pages"),
                   Sum("n_links", alias_name="n_links"),
                   Sum("n_external", alias_name="n_external")))
    uniq = (mixed.map_batches(
        lambda t: t.filter(pc.is_valid(t["target"]))
                   .select(["domain", "target"]),
        batch_format="pyarrow")
        .groupby(["domain", "target"]).aggregate(Count(alias_name="_n"))
        .groupby("domain").aggregate(Count(alias_name="n_unique_targets")))

    from .functions.joins import auto_join
    out = auto_join(counts, uniq.rename_columns({"domain": "d2"}),
                    left_key="domain", right_key="d2",
                    right_cols=["n_unique_targets"])
    return out.sort("domain")


def orders_price_eqdepth_hist(sf_dir: str):
    """Equi-depth (equal-frequency) histogram — the third histogram
    flavor (equi-width G-family, log2 power-law, now NTILE-based
    equi-depth, the one query optimizers actually keep): 8 buckets over
    price cents via the two-pass global NTILE, per-bucket min/max/count.
    Deterministic: ties broken by o_orderkey in BOTH engines.

    Scale shape: the range-partitioned ntile plan (sample split points +
    offsets), then a bounded 8-row groupby."""
    from .functions.rank import ntile

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])
    cents = orders.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
    tiled = ntile(cents, 8, order_by=["cents", "o_orderkey"],
                  out_col="bucket")
    return (tiled.groupby("bucket")
            .aggregate(Count(alias_name="n"),
                       Min("cents", alias_name="lo_cents"),
                       Max("cents", alias_name="hi_cents"))
            .sort("bucket"))


_ORDERS_EQDEPTH_SQL = """
WITH c AS (SELECT o_orderkey,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
t AS (SELECT cents,
             CAST(NTILE(8) OVER (ORDER BY cents, o_orderkey) AS BIGINT)
               AS bucket
      FROM c)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
FROM t GROUP BY 1 ORDER BY 1
"""


def part_skyline(sf_dir: str):
    """Pareto-skyline operator (multi-objective NOT-EXISTS dominance —
    the 'cheapest part for its size' catalog audit): a part survives iff
    no other part has retailprice <= AND size >= with at least one
    strict. Duplicates of a frontier point are all kept (neither
    dominates the other).

    Scale shape: a vectorized per-batch local prune first — any row
    dominated inside its batch is dominated globally, so each batch
    emits only its local frontier (expected O(log n) rows for
    independent dims) — then one exact pass over the tiny candidate
    union in a single small block. The fact table itself never
    re-shuffles."""
    part = read_table(sf_dir, "part",
                      columns=["p_partkey", "p_size", "p_retailprice"])

    def local_skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "p_size": pa.array([], pa.int64()),
                             "price_cents": pa.array([], pa.int64())})
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        o = np.lexsort((-size, cents))          # price asc, size desc
        c, s = cents[o], size[o]
        newg = np.empty(len(c), bool)
        newg[0] = True
        newg[1:] = c[1:] != c[:-1]
        gid = np.cumsum(newg) - 1
        gmax = s[newg]                          # max size per price group
        run = np.maximum.accumulate(gmax)
        pref = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))
        keep = (s == gmax[gid]) & (s > pref[gid])
        sel = o[keep]
        return pa.table({"p_partkey": pa.array(key[sel], pa.int64()),
                         "p_size": pa.array(size[sel], pa.int64()),
                         "price_cents": pa.array(cents[sel], pa.int64())})

    def final_skyline(t: pa.Table) -> pa.Table:
        return local_skyline(pa.table({
            "p_partkey": t["p_partkey"],
            "p_size": pc.cast(t["p_size"], pa.int32()),
            "p_retailprice": pc.divide(pc.cast(t["price_cents"],
                                               pa.float64()), 100.0)}))

    cands = part.map_batches(local_skyline, batch_format="pyarrow")
    return (cands.repartition(1)
            .map_batches(final_skyline, batch_format="pyarrow")
            .sort("p_partkey"))


_PART_SKYLINE_SQL = """
WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
           FROM part)
SELECT p_partkey, p_size, price_cents
FROM p x
WHERE NOT EXISTS (
  SELECT 1 FROM p y
  WHERE y.price_cents <= x.price_cents AND y.p_size >= x.p_size
    AND (y.price_cents < x.price_cents OR y.p_size > x.p_size))
ORDER BY p_partkey
"""


def events_cusum_drift(sf_dir: str):
    """CUSUM change-point screen over daily event volume (the drift
    detector a pipeline runs on its own telemetry): per event type, the
    cumulative sum of deviations from the type's mean daily count,
    reported at its maximum absolute excursion plus the day it peaks.
    All math is exact-integer: with n days and total T, the scaled
    statistic n*cumsum_i - i*T never touches a float, so both engines
    agree bit-for-bit; peak ties break to the earliest day.

    Scale shape: one (type, day) count groupby (bounded |types|x|days|
    rows), then a per-type vectorized scan inside map_groups."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def days(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return (pa.table({"event_type": t["event_type"], "epoch_day": d,
                          "c": pa.array(np.ones(t.num_rows, np.int64))})
                .group_by(["event_type", "epoch_day"])
                .aggregate([("c", "sum")])
                .rename_columns(["event_type", "epoch_day", "c"]))

    daily = (ev.map_batches(days, batch_format="pyarrow")
             .groupby(["event_type", "epoch_day"])
             .aggregate(Sum("c", alias_name="c")))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("epoch_day", kind="mergesort")
        c = g["c"].to_numpy(np.int64)
        n, total = len(c), int(c.sum())
        i = np.arange(1, n + 1, dtype=np.int64)
        dev = np.abs(n * np.cumsum(c) - i * total)
        peak = int(np.argmax(dev))          # first max = earliest day
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_days": [n], "total_events": [total],
            "max_cusum_n": [int(dev[peak])],
            "peak_day": [int(g["epoch_day"].to_numpy(np.int64)[peak])]})

    return (daily.groupby("event_type")
            .map_groups(scan, batch_format="pandas")
            .sort("event_type"))


_EVENTS_CUSUM_SQL = """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS epoch_day,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
s AS (SELECT event_type, epoch_day,
             SUM(c) OVER w AS cum,
             ROW_NUMBER() OVER w AS i,
             SUM(c) OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day)),
a AS (SELECT event_type, epoch_day, n, total,
             ABS(n * cum - i * total) AS dev,
             MAX(ABS(n * cum - i * total))
               OVER (PARTITION BY event_type) AS maxdev
      FROM s)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(total AS BIGINT) AS total_events,
       CAST(maxdev AS BIGINT) AS max_cusum_n,
       MIN(epoch_day) FILTER (WHERE dev = maxdev) AS peak_day
FROM a GROUP BY event_type, n, total, maxdev ORDER BY event_type
"""


def orders_retention_curve(sf_dir: str):
    """Discrete retention / survival curve over inter-order gaps (the
    repeat-purchase health report): among all consecutive same-customer
    order pairs, the share whose gap is within each horizon of
    {7,14,30,60,90} days, as exact parts-per-million (integer floor
    division — no float share crosses an engine boundary).

    Scale shape: one LEAD shuffle on o_custkey (periods=-1 lag), then
    per-batch partial flag sums folded into a 5-row table; nothing but
    six counters leaves any worker."""
    from .functions.window import lag_column

    horizons = [7, 14, 30, 60, 90]
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    led = lag_column(orders, "o_orderdate", keys=["o_custkey"],
                     order_by=["o_orderdate", "o_orderkey"], periods=-1,
                     out_col="next_date")

    def flags(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["next_date"]))
        gap = pc.subtract(t["next_date"].cast(pa.int64()),
                          t["o_orderdate"].cast(pa.int64()))
        cols = {"n_pairs": pa.array([t.num_rows], pa.int64())}
        for h in horizons:
            within = pc.sum(pc.cast(pc.less_equal(
                gap, pa.scalar(h * 86_400_000_000, pa.int64())), pa.int64()))
            cols[f"w{h}"] = pa.array(
                [int(within.as_py() or 0)], pa.int64())
        return pa.table(cols)

    parts = led.map_batches(flags, batch_format="pyarrow")
    agg = parts.sum(["n_pairs"] + [f"w{h}" for h in horizons])
    n_pairs = int(agg["sum(n_pairs)"])
    rows = {"horizon_days": [], "n_pairs": [], "n_within": [],
            "within_ppm": []}
    for h in horizons:
        w = int(agg[f"sum(w{h})"])
        rows["horizon_days"].append(h)
        rows["n_pairs"].append(n_pairs)
        rows["n_within"].append(w)
        rows["within_ppm"].append((1_000_000 * w) // n_pairs
                                  if n_pairs else 0)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


_ORDERS_RETENTION_SQL = """
WITH g AS (
  SELECT epoch_us(LEAD(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
         - epoch_us(o_orderdate) AS gap_us
  FROM orders),
u AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
h AS (SELECT CAST(unnest([7, 14, 30, 60, 90]) AS BIGINT) AS horizon_days)
SELECT h.horizon_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) FILTER (
         WHERE u.gap_us <= h.horizon_days * 86400000000) AS BIGINT)
         AS n_within,
       CAST((1000000 * COUNT(*) FILTER (
         WHERE u.gap_us <= h.horizon_days * 86400000000)) // COUNT(*)
         AS BIGINT) AS within_ppm
FROM h CROSS JOIN u
GROUP BY 1 ORDER BY 1
"""


def events_seasonal_naive_error(sf_dir: str):
    """Seasonal-naive forecast backtest (the sanity floor every demand
    model is judged against): predict each day's per-type event count
    with the count from exactly 7 days earlier, score only days where
    both sides exist, and report exact-integer SAE plus WAPE in ppm.

    Scale shape: the fact table collapses to bounded (type, day) counts
    in one groupby; the 7-day self-alignment happens per type inside
    map_groups with a dict probe — no second fact shuffle."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def days(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return (pa.table({"event_type": t["event_type"], "epoch_day": d,
                          "c": pa.array(np.ones(t.num_rows, np.int64))})
                .group_by(["event_type", "epoch_day"])
                .aggregate([("c", "sum")])
                .rename_columns(["event_type", "epoch_day", "c"]))

    daily = (ev.map_batches(days, batch_format="pyarrow")
             .groupby(["event_type", "epoch_day"])
             .aggregate(Sum("c", alias_name="c")))

    def score(g: pd.DataFrame) -> pd.DataFrame:
        day = g["epoch_day"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        lut = dict(zip(day.tolist(), c.tolist()))
        pred = np.array([lut.get(d - 7, -1) for d in day.tolist()],
                        np.int64)
        m = pred >= 0
        n, sae = int(m.sum()), int(np.abs(c[m] - pred[m]).sum())
        tot = int(c[m].sum())
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_scored": [n], "sae": [sae], "total_actual": [tot],
            "wape_ppm": [(1_000_000 * sae) // tot if tot else 0]})

    return (daily.groupby("event_type")
            .map_groups(score, batch_format="pandas")
            .sort("event_type"))


_EVENTS_SNAIVE_SQL = """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS epoch_day,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
SELECT a.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(ABS(a.c - b.c)) AS BIGINT) AS sae,
       CAST(SUM(a.c) AS BIGINT) AS total_actual,
       CAST((1000000 * SUM(ABS(a.c - b.c))) // SUM(a.c) AS BIGINT)
         AS wape_ppm
FROM d a JOIN d b
  ON a.event_type = b.event_type AND b.epoch_day = a.epoch_day - 7
GROUP BY 1 ORDER BY 1
"""


def orders_table_digest(sf_dir: str):
    """Order-invariant table checksum audit (the replication/migration
    integrity check: do two copies of a table hold exactly the same
    rows?): per priority class, row count + two commutative digests of
    the canonical row string ``orderkey|status|cents`` — a SUM of the
    28-bit md5 prefix and a BIT_XOR of the 60-bit md5 prefix. Both
    reductions are associative+commutative, so any partitioning and any
    reduce order yields the identical digest; 28-bit values summed over
    2^33 rows stay inside int64.

    Scale shape: per-batch partial (sum, xor, n) rows per group; only
    |groups| x |batches| tiny partials shuffle."""
    import hashlib

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderstatus",
                                 "o_totalprice", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        stat = t["o_orderstatus"].to_pylist()
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        prio = t["o_orderpriority"].to_pylist()
        hexes = [hashlib.md5(f"{k}|{s}|{c}".encode()).hexdigest()
                 for k, s, c in zip(keys.tolist(), stat, cents.tolist())]
        s28 = np.array([int(h[:7], 16) for h in hexes], np.int64)
        x60 = np.array([int(h[:15], 16) for h in hexes], np.int64)
        df = pd.DataFrame({"o_orderpriority": prio, "s28": s28, "x60": x60})
        g = df.groupby("o_orderpriority", sort=False)
        out = pd.DataFrame({
            "o_orderpriority": list(g.groups),
            "n_rows": g.size().to_numpy(np.int64),
            "checksum_sum": g["s28"].sum().to_numpy(np.int64),
            "checksum_xor": [int(np.bitwise_xor.reduce(
                v.to_numpy(np.int64))) for _, v in g["x60"]]})
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "n_rows": [int(g["n_rows"].sum())],
            "checksum_sum": [int(g["checksum_sum"].sum())],
            "checksum_xor": [int(np.bitwise_xor.reduce(
                g["checksum_xor"].to_numpy(np.int64)))]})

    return (orders.map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .map_groups(combine, batch_format="pandas")
            .sort("o_orderpriority"))


_ORDERS_DIGEST_SQL = """
WITH r AS (
  SELECT o_orderpriority,
         md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))
           AS h
  FROM orders)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST('0x' || substr(h, 1, 7) AS BIGINT)) AS BIGINT)
         AS checksum_sum,
       bit_xor(CAST('0x' || substr(h, 1, 15) AS BIGINT)) AS checksum_xor
FROM r GROUP BY 1 ORDER BY 1
"""


def docs_sentence_dedup(sf_dir: str):
    """Cross-document repeated-SENTENCE audit (finer-grained than the
    C4 span pass: boilerplate sentences that recur across documents are
    the classic web-corpus contamination signal): split on terminator
    runs ``[.!?]+``, trim whitespace, and per source report how many
    sentence instances belong to a sentence seen in >= 2 distinct
    documents, as exact ppm.

    Scale shape: one shuffle keyed by the sentence string; inside each
    sentence group a tiny kernel counts distinct docs and per-source
    instances, then a bounded |sources| groupby folds the partials."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source"])

    def explode(t: pa.Table) -> pa.Table:
        sents = pc.split_pattern_regex(t["text"].combine_chunks(),
                                       pattern="[.!?]+")
        flat = pc.utf8_trim(pc.list_flatten(sents), " \t\n\r")
        parent = pc.list_parent_indices(sents)
        keep = pc.greater(pc.utf8_length(flat), 0)
        return pa.table({
            "sent": flat.filter(keep),
            "doc_id": t["doc_id"].combine_chunks().take(parent)
                       .filter(keep),
            "source": t["source"].combine_chunks().take(parent)
                       .filter(keep)})

    def per_sentence(g: pd.DataFrame) -> pa.Table:
        shared = g["doc_id"].nunique() >= 2
        counts = g.groupby("source", sort=False).size()
        return pa.table({
            "source": pa.array(list(counts.index), pa.string()),
            "n_inst": pa.array(counts.to_numpy(np.int64)),
            "n_shared": pa.array(counts.to_numpy(np.int64) if shared
                                 else np.zeros(len(counts), np.int64))})

    def ppm(t: pa.Table) -> pa.Table:
        inst = t["n_instances"].to_numpy(zero_copy_only=False)
        sh = t["n_shared"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "shared_ppm",
            pa.array((1_000_000 * sh) // np.maximum(inst, 1), pa.int64()))

    return (docs.map_batches(explode, batch_format="pyarrow")
            .groupby("sent").map_groups(per_sentence, batch_format="pandas")
            .groupby("source")
            .aggregate(Sum("n_inst", alias_name="n_instances"),
                       Sum("n_shared", alias_name="n_shared"))
            .map_batches(ppm, batch_format="pyarrow")
            .sort("source"))


_DOCS_SENT_DEDUP_SQL = """
WITH s AS (
  SELECT doc_id, source,
         trim(sent, ' ' || chr(9) || chr(10) || chr(13)) AS sent
  FROM (SELECT doc_id, source,
               unnest(regexp_split_to_array(text, '[.!?]+')) AS sent
        FROM documents)
  WHERE length(trim(sent, ' ' || chr(9) || chr(10) || chr(13))) > 0),
d AS (SELECT sent, COUNT(DISTINCT doc_id) AS n_docs FROM s GROUP BY 1)
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_instances,
       CAST(COUNT(*) FILTER (WHERE d.n_docs >= 2) AS BIGINT) AS n_shared,
       CAST((1000000 * COUNT(*) FILTER (WHERE d.n_docs >= 2))
            // GREATEST(COUNT(*), 1) AS BIGINT) AS shared_ppm
FROM s JOIN d USING (sent)
GROUP BY 1 ORDER BY 1
"""


def customer_supplier_percentile(sf_dir: str):
    """Distribution-transfer percentile join (score one table's rows
    against ANOTHER table's empirical distribution — the calibration
    shape behind 'where does this account sit among its nation's
    suppliers?'): each customer's balance is ranked, in exact integer
    counts, against the sorted supplier balances of its nation.

    Scale shape: suppliers collapse to one sorted-list row per nation
    (a distributed groupby; only 25 aggregated rows reach the driver),
    broadcast once via ray.put, then a per-batch np.searchsorted over
    customers. At reference-distribution sizes past broadcast range the
    same plan quantizes the per-nation distribution to a fixed-width
    histogram (exact bucket counts) before broadcasting."""
    sup = read_table(sf_dir, "supplier",
                     columns=["s_nationkey", "s_acctbal"])

    def scents(t: pa.Table) -> pa.Table:
        return pa.table({"nation": pc.cast(t["s_nationkey"], pa.int64()),
                         "cents": _cents(t["s_acctbal"])})

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({  # arrow-ok: final driver-bound (take_all)
            "nation": [int(g["nation"].iloc[0])],
            "sorted_cents": [np.sort(g["cents"].to_numpy(np.int64))]})

    packed = (sup.map_batches(scents, batch_format="pyarrow")
              .groupby("nation").map_groups(pack, batch_format="pandas")
              .take_all())
    dist_ref = ray.put({int(r["nation"]): np.asarray(r["sorted_cents"],
                                                     np.int64)
                        for r in packed})

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def rank(t: pa.Table) -> pa.Table:
        dist = ray.get(dist_ref)
        key = t["c_custkey"].to_numpy(zero_copy_only=False)
        nat = t["c_nationkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["c_acctbal"]).to_numpy(zero_copy_only=False)
        n_leq = np.zeros(len(key), np.int64)
        n_sup = np.zeros(len(key), np.int64)
        for nk in np.unique(nat):
            arr = dist.get(int(nk))
            m = nat == nk
            if arr is None or len(arr) == 0:
                n_sup[m] = 0
                continue
            n_leq[m] = np.searchsorted(arr, cents[m], side="right")
            n_sup[m] = len(arr)
        keep = n_sup > 0
        return pa.table({
            "c_custkey": pa.array(key[keep], pa.int64()),
            "n_leq": pa.array(n_leq[keep], pa.int64()),
            "n_sup": pa.array(n_sup[keep], pa.int64()),
            "pct_ppm": pa.array(
                (1_000_000 * n_leq[keep]) // n_sup[keep], pa.int64())})

    return cust.map_batches(rank, batch_format="pyarrow").sort("c_custkey")


_CUSTOMER_SUP_PCT_SQL = """
WITH s AS (SELECT s_nationkey,
                  CAST(round(s_acctbal * 100) AS BIGINT) AS s_cents
           FROM supplier),
c AS (SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS c_cents
      FROM customer)
SELECT c.c_custkey,
       CAST(COUNT(*) FILTER (WHERE s.s_cents <= c.c_cents) AS BIGINT)
         AS n_leq,
       CAST(COUNT(*) AS BIGINT) AS n_sup,
       CAST((1000000 * COUNT(*) FILTER (WHERE s.s_cents <= c.c_cents))
            // COUNT(*) AS BIGINT) AS pct_ppm
FROM c JOIN s ON s.s_nationkey = c.c_nationkey
GROUP BY 1 ORDER BY 1
"""


def events_ohlc_daily(sf_dir: str):
    """OHLC candlestick bars (the time-bucketed open/high/low/close
    reduction every metrics store runs): per (day, event_type), the
    value at the earliest (ts, event_id), the latest, and the min/max —
    exact integer micro-units, ties broken by the unique event_id.

    Scale shape: each batch collapses to one partial row per (day,
    type) carrying (open key+value, close key+value, lo, hi, n); the
    groupby folds |groups| x |batches| tiny partials — row volume never
    shuffles."""
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "day": pc.strftime(t["ts"], format="%Y-%m-%d").to_pylist(),
            "event_type": t["event_type"].to_pylist(),
            "ts": pc.cast(t["ts"], pa.int64()).to_numpy(
                zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "vm": pc.cast(pc.round(pc.multiply(t["value"], 1e6),
                                   round_mode="half_towards_infinity"),
                          pa.int64()).to_numpy(zero_copy_only=False)})
        df = df.iloc[np.lexsort((df["eid"].to_numpy(),
                                 df["ts"].to_numpy()))]
        g = df.groupby(["day", "event_type"], sort=False)
        out = g.agg(o_ts=("ts", "first"), o_eid=("eid", "first"),
                    o_vm=("vm", "first"), c_ts=("ts", "last"),
                    c_eid=("eid", "last"), c_vm=("vm", "last"),
                    lo=("vm", "min"), hi=("vm", "max"),
                    n=("vm", "size")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: pd.DataFrame) -> pa.Table:
        o = np.lexsort((g["o_eid"].to_numpy(), g["o_ts"].to_numpy()))[0]
        c = np.lexsort((g["c_eid"].to_numpy(), g["c_ts"].to_numpy()))[-1]
        return pa.table({
            "day": pa.array([g["day"].iloc[0]], pa.string()),
            "event_type": pa.array([g["event_type"].iloc[0]], pa.string()),
            "n_events": pa.array([int(g["n"].sum())], pa.int64()),
            "open_micro": pa.array([int(g["o_vm"].iloc[o])], pa.int64()),
            "high_micro": pa.array([int(g["hi"].max())], pa.int64()),
            "low_micro": pa.array([int(g["lo"].min())], pa.int64()),
            "close_micro": pa.array([int(g["c_vm"].iloc[c])],
                                    pa.int64())})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby(["day", "event_type"])
            .map_groups(combine, batch_format="pandas")
            .sort(["day", "event_type"]))


_EVENTS_OHLC_SQL = """
WITH r AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
         CAST(round(value * 1000000) AS BIGINT) AS vm,
         printf('%020d|%020d', epoch_us(ts), event_id) AS k
  FROM events)
SELECT day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       arg_min(vm, k) AS open_micro,
       CAST(MAX(vm) AS BIGINT) AS high_micro,
       CAST(MIN(vm) AS BIGINT) AS low_micro,
       arg_max(vm, k) AS close_micro
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_user_twap(sf_dir: str):
    """Time-weighted average value per user (the TWAP shape for
    irregularly-sampled series — a plain AVG over-weights bursts): each
    observation is held until the next one, weighted by its holding
    duration in whole seconds; exact integer cents x seconds.

    Scale shape: one groupby(user_id) shuffle; inside each group a
    vectorized lexsort + diff — no cross-group state, no driver data."""
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "eid": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "vc": _cents(t["value"])})

    def twap(g: pd.DataFrame) -> pa.Table:
        ts = g["ts_us"].to_numpy(np.int64)
        order = np.lexsort((g["eid"].to_numpy(np.int64), ts))
        ts, vc = ts[order], g["vc"].to_numpy(np.int64)[order]
        dur = (ts[1:] - ts[:-1]) // 1_000_000
        tot = int(dur.sum())
        if tot <= 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "twap_cents": pa.array([], pa.int64()),
                             "dur_s": pa.array([], pa.int64())})
        return pa.table({
            "user_id": pa.array([int(g["user_id"].iloc[0])], pa.int64()),
            "twap_cents": pa.array([int((vc[:-1] * dur).sum()) // tot],
                                   pa.int64()),
            "dur_s": pa.array([tot], pa.int64())})

    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("user_id").map_groups(twap, batch_format="pandas")
            .sort("user_id"))


_EVENTS_TWAP_SQL = """
WITH o AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS vc,
         epoch_us(ts) AS es,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nes
  FROM events)
SELECT user_id,
       CAST(SUM((nes - es) // 1000000 * vc)
            // SUM((nes - es) // 1000000) AS BIGINT) AS twap_cents,
       CAST(SUM((nes - es) // 1000000) AS BIGINT) AS dur_s
FROM o WHERE nes IS NOT NULL
GROUP BY 1 HAVING SUM((nes - es) // 1000000) > 0
ORDER BY 1
"""


def docs_shingle_containment(sf_dir: str, n: int = 5,
                             min_ppm: int = 500_000,
                             max_df: int = 50):
    """Asymmetric near-duplicate CONTAINMENT detection (Broder's other
    resemblance measure: |S(a) ∩ S(b)| / |S(a)| — catches a short doc
    embedded inside a longer one, which symmetric Jaccard misses):
    ordered pairs (a, b) where at least half of a's distinct 5-word
    shingles also occur in b, as exact ppm.

    Scale shape: distinct shingles explode per batch carrying a hash
    partition id; ONE groupby(part) shuffle (P groups, not millions of
    per-shingle group tasks) emits the pair matrix per shingle run
    inside each partition (stop-shingles in > ``max_df`` docs are
    dropped on BOTH sides — the PPJoin-style frequency cap that keeps
    hub shingles from quadratic blowup); pair counts fold in a second
    skinny groupby and join against per-doc shingle totals."""
    from .functions.hashing import stable_hash64
    from .functions.partitions import default_parts
    from .functions.terms import _TERM_RE
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      rows_per_block=500)
    nparts = default_parts()

    def shingles(t: pa.Table) -> pa.Table:
        out_d, out_s = [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            ws = _TERM_RE.findall((txt or "").lower())
            seen = {" ".join(ws[i:i + n])
                    for i in range(len(ws) - n + 1)}
            out_d.extend([did] * len(seen))
            out_s.extend(seen)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "sh": pa.array(out_s, pa.string()),
                         "part": pa.array(
                             [stable_hash64(s) % nparts for s in out_s],
                             pa.int64())})

    sh = docs.map_batches(shingles, batch_format="pyarrow")

    totals = (sh.select_columns(["doc_id"])
              .groupby("doc_id").aggregate(Count(alias_name="n_sh")))

    def pairs_in_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part[part.duplicated("sh", keep=False)]
        oa, ob = [], []
        for _, g in part.groupby("sh", sort=False):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2 or len(ids) > max_df:
                continue
            x, y = np.meshgrid(ids, ids, indexing="ij")
            keep = x.ravel() != y.ravel()
            oa.append(x.ravel()[keep])
            ob.append(y.ravel()[keep])
        if not oa:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(oa),
                             "b": np.concatenate(ob)})

    inter = (sh.groupby("part")
             .map_groups(pairs_in_part, batch_format="pandas")
             .groupby(["a", "b"]).aggregate(Count(alias_name="n_inter")))

    from .functions.joins import auto_join
    att = auto_join(inter, totals, left_key="a", right_key="doc_id",
                    right_cols=["n_sh"])

    def score(t: pa.Table) -> pa.Table:
        ppm = (1_000_000 * t["n_inter"].to_numpy(zero_copy_only=False)
               // t["n_sh"].to_numpy(zero_copy_only=False))
        out = pa.table({"a": t["a"], "b": t["b"],
                        "n_inter": t["n_inter"], "n_sh_a": t["n_sh"],
                        "containment_ppm": pa.array(ppm, pa.int64())})
        return out.filter(pc.greater_equal(out["containment_ppm"],
                                           pa.scalar(min_ppm)))

    return (att.map_batches(score, batch_format="pyarrow")
            .sort(["a", "b"]))


_DOCS_CONTAINMENT_SQL = """
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
sh AS (SELECT DISTINCT doc_id,
              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
              ws[i+3] || ' ' || ws[i+4] AS sh
       FROM w, UNNEST(generate_series(1, len(ws) - 4)) AS t(i)
       WHERE len(ws) >= 5),
ok AS (SELECT sh FROM sh GROUP BY sh
       HAVING COUNT(*) BETWEEN 2 AND 50),
tot AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(COUNT(*) AS BIGINT) AS n_inter
          FROM sh x JOIN ok USING (sh) JOIN sh y USING (sh)
          WHERE x.doc_id <> y.doc_id
          GROUP BY 1, 2)
SELECT a, b, n_inter, CAST(t.n_sh AS BIGINT) AS n_sh_a,
       CAST(1000000 * n_inter // t.n_sh AS BIGINT) AS containment_ppm
FROM inter JOIN tot t ON t.doc_id = a
WHERE 1000000 * n_inter // t.n_sh >= 500000
ORDER BY 1, 2
"""


def orders_prefix_dominance(sf_dir: str):
    """Per-customer inversion count (the "was each order bigger than
    what came before?" sequential-dominance audit — inversions == 0
    means monotone growth, the spend-trajectory signal churn models
    bin on): pairs of orders by the same customer where the earlier
    order, by (o_orderdate, o_orderkey), had the strictly larger price.

    Scale shape: one groupby(custkey) shuffle; groups are customer-
    sized (tens of rows), so the per-group O(k²) comparison matrix is
    a few kilobytes — nothing quadratic in the corpus."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderkey", "o_orderdate",
                                 "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "okey": t["o_orderkey"],
            "d": pc.cast(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                         pa.int64()),
            "cents": _cents(t["o_totalprice"])})

    def inv(g: pd.DataFrame) -> pa.Table:
        order = np.lexsort((g["okey"].to_numpy(np.int64),
                            g["d"].to_numpy(np.int64)))
        c = g["cents"].to_numpy(np.int64)[order]
        n_inv = int(np.sum(np.triu(c[:, None] > c[None, :], k=1)))
        return pa.table({
            "o_custkey": pa.array([int(g["o_custkey"].iloc[0])],
                                  pa.int64()),
            "n_orders": pa.array([len(c)], pa.int64()),
            "n_inversions": pa.array([n_inv], pa.int64())})

    return (orders.map_batches(prep, batch_format="pyarrow")
            .groupby("o_custkey").map_groups(inv, batch_format="pandas")
            .sort("o_custkey"))


_ORDERS_DOMINANCE_SQL = """
WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
p AS (SELECT a.o_custkey AS k, COUNT(*) AS inv
      FROM o a JOIN o b ON a.o_custkey = b.o_custkey
       AND (a.o_orderdate < b.o_orderdate OR
            (a.o_orderdate = b.o_orderdate AND
             a.o_orderkey < b.o_orderkey))
       AND a.cents > b.cents
      GROUP BY 1)
SELECT o.o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COALESCE(MAX(p.inv), 0) AS BIGINT) AS n_inversions
FROM o LEFT JOIN p ON p.k = o.o_custkey
GROUP BY 1 ORDER BY 1
"""


def events_ab_precedence(sf_dir: str):
    """Sequential-pattern support counts (the PrefixSpan level-2 shape:
    "how many users did A strictly before B?" — non-contiguous, unlike
    the trigram query): for every ordered type pair (a, b), the number
    of users with some a-event at a strictly earlier timestamp than
    some b-event, i.e. min_ts(a) < max_ts(b).

    Scale shape: events collapse to one (user, type, min_ts, max_ts)
    row per pair in a distributed aggregate; the per-user cross product
    is |types|² ≤ 25 rows, then a skinny pair-count groupby."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"],
                         "ts_us": pc.cast(t["ts"], pa.int64())})

    spans = (ev.map_batches(prep, batch_format="pyarrow")
             .groupby(["user_id", "event_type"])
             .aggregate(Min("ts_us", alias_name="mn"),
                        Max("ts_us", alias_name="mx")))

    def cross(g: pd.DataFrame) -> pd.DataFrame:
        ty = g["event_type"].to_numpy()
        mn = g["mn"].to_numpy(np.int64)
        mx = g["mx"].to_numpy(np.int64)
        i, j = np.meshgrid(np.arange(len(ty)), np.arange(len(ty)),
                           indexing="ij")
        keep = (i.ravel() != j.ravel()) & \
            (mn[i.ravel()] < mx[j.ravel()])
        return pa.table({
            "type_a": pa.array(ty[i.ravel()[keep]], pa.string()),
            "type_b": pa.array(ty[j.ravel()[keep]], pa.string())})

    return (spans.groupby("user_id")
            .map_groups(cross, batch_format="pandas")
            .groupby(["type_a", "type_b"])
            .aggregate(Count(alias_name="n_users"))
            .sort(["type_a", "type_b"]))


_EVENTS_AB_PRECEDENCE_SQL = """
WITH s AS (SELECT user_id, event_type,
                  MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
           FROM events GROUP BY 1, 2)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM s a JOIN s b
  ON a.user_id = b.user_id AND a.event_type <> b.event_type
WHERE a.mn < b.mx
GROUP BY 1, 2 ORDER BY 1, 2
"""


def lineitem_weighted_median(sf_dir: str):
    """Grouped WEIGHTED median (quantity-weighted price — the "median
    dollar" question a plain median gets wrong when cheap lines carry
    huge volumes): per returnflag, the smallest price whose cumulative
    quantity reaches half the group's total quantity (discrete lower
    weighted median, exact integer cents).

    Scale shape: per-batch combiner collapses to (flag, cents)→Σqty
    distinct rows before the shuffle; the per-flag sorted cumsum runs
    over the distinct-PRICE table, not row volume."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice",
                             "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "flag": t["l_returnflag"].to_pylist(),
            "cents": _cents(t["l_extendedprice"]).to_numpy(
                zero_copy_only=False),
            "q": t["l_quantity"].to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = (df.groupby(["flag", "cents"], sort=False)["q"].sum()
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    # (flag, cents) is near-unique (prices are ~all distinct) — bucket
    # by the pair and sum inside the partition instead of the
    # sort-groupby that walked ~60k one-row groups (5.8 s → ~1 s at
    # sf0.01, the _part_cooccur_counts pathology)
    def fc_bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["flag", "cents"], 16, "_p")

    def fc_sum(g: pd.DataFrame) -> pa.Table:
        vc = (g.groupby(["flag", "cents"], sort=False)["q"].sum()
              .reset_index())
        return pa.table({"flag": pa.array(vc["flag"], pa.string()),
                         "cents": pa.array(vc["cents"]
                                           .to_numpy(np.int64)),
                         "q": pa.array(vc["q"].to_numpy(np.int64))})

    dist = (li.map_batches(prep, batch_format="pyarrow")
            .map_batches(fc_bucket, batch_format="pyarrow")
            .groupby("_p").map_groups(fc_sum, batch_format="pandas"))

    def wmedian(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("cents")
        cum = g["q"].to_numpy(np.int64).cumsum()
        tot = int(cum[-1])
        idx = int(np.searchsorted(2 * cum, tot, side="left"))
        return pa.table({
            "flag": pa.array([g["flag"].iloc[0]], pa.string()),
            "wmedian_cents": pa.array([int(g["cents"].iloc[idx])],
                                      pa.int64()),
            "total_qty": pa.array([tot], pa.int64())})

    return (dist.groupby("flag").map_groups(wmedian, batch_format="pandas")
            .sort("flag"))


_LINEITEM_WMEDIAN_SQL = """
WITH r AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                  CAST(l_quantity AS BIGINT) AS q
           FROM lineitem),
w AS (SELECT flag, cents, SUM(q) AS q FROM r GROUP BY 1, 2),
c AS (SELECT flag, cents,
             SUM(q) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             SUM(q) OVER (PARTITION BY flag) AS tot
      FROM w)
SELECT flag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
       CAST(MIN(tot) AS BIGINT) AS total_qty
FROM c WHERE 2 * cum >= tot GROUP BY 1 ORDER BY 1
"""


def part_item_cosine(sf_dir: str, min_co: int = 3):
    """Item-item collaborative-filtering similarity (the co-occurrence
    cosine behind "customers who bought X also bought": cos(a,b) =
    co(a,b) / sqrt(n(a)·n(b)) over order baskets): unordered part pairs
    co-purchased in ≥ ``min_co`` orders, cosine at 4 dp.

    Scale shape: distinct (order, part) rows hash-partition by order id
    — ONE groupby(part-id) shuffle emits per-basket pairs (baskets are
    order-sized, single digits) already COUNTED within the bucket, so a
    second hash-bucketed map_groups sums ≤ |pairs| skinny partial rows.
    Both Ray-level groupbys have exactly ``nparts`` groups — the naive
    groupby([part_a, part_b]).aggregate(Count) is ~116k groups at
    sf0.01 and Ray's sort-aggregate handles each group in Python
    (measured 45 s / effectively hung single-block); the pandas
    value_counts inside the bucket is the vectorized path."""
    from .functions.joins import auto_join
    from .functions.partitions import default_parts
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])
    nparts = default_parts()

    def dedup(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "p": t["l_partkey"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        df["part"] = df["o"] % nparts
        return pa.Table.from_pandas(df, preserve_index=False)

    # blocks are written order-clustered, so the per-batch drop_duplicates
    # removes nearly all repeats; the groupby(part) pass below re-dedups
    # exactly within each hash partition
    op = li.map_batches(dedup, batch_format="pyarrow")

    _pairs_schema = pa.schema(
        [("part_a", pa.int64()), ("part_b", pa.int64()),
         ("n_co", pa.int64()), ("bucket", pa.int64())])

    def pairs_in_part(part: pd.DataFrame) -> pa.Table:
        part = part.drop_duplicates(["o", "p"])
        oa, ob = [], []
        for _, g in part.groupby("o", sort=False):
            ids = np.sort(g["p"].unique())
            if len(ids) < 2:
                continue
            x, y = np.triu_indices(len(ids), k=1)
            oa.append(ids[x])
            ob.append(ids[y])
        if not oa:
            return _pairs_schema.empty_table()
        # partial pair counts within this order-bucket (vectorized);
        # exact across buckets after the bucket-sum pass below
        cnt = (pd.DataFrame({"part_a": np.concatenate(oa),
                             "part_b": np.concatenate(ob)})
               .groupby(["part_a", "part_b"], sort=False)
               .size().rename("n_co").reset_index())
        cnt["bucket"] = (cnt["part_a"] * 1_000_003 + cnt["part_b"]) % nparts
        return pa.Table.from_pandas(cnt, preserve_index=False) \
            .cast(_pairs_schema)

    def sum_bucket(g: pd.DataFrame) -> pa.Table:
        tot = (g.groupby(["part_a", "part_b"], sort=False)["n_co"]
               .sum().reset_index())
        tot = tot[tot["n_co"] >= min_co]
        return pa.table({
            "part_a": pa.array(tot["part_a"].to_numpy(np.int64)),
            "part_b": pa.array(tot["part_b"].to_numpy(np.int64)),
            "n_co": pa.array(tot["n_co"].to_numpy(np.int64))})

    co = (op.groupby("part").map_groups(pairs_in_part,
                                        batch_format="pandas")
          .groupby("bucket").map_groups(sum_bucket, batch_format="pandas")
          .select_columns(["part_a", "part_b", "n_co"]))

    def parts_in_bucket(g: pd.DataFrame) -> pa.Table:
        vc = g.drop_duplicates(["o", "p"])["p"].value_counts()
        p = vc.index.to_numpy(np.int64)
        return pa.table({"p": pa.array(p),
                         "n_part": pa.array(vc.to_numpy(np.int64)),
                         "bucket": pa.array(p % nparts)})

    def sum_parts(g: pd.DataFrame) -> pa.Table:
        tot = g.groupby("p", sort=False)["n_part"].sum()
        return pa.table({"p": pa.array(tot.index.to_numpy(np.int64)),
                         "n": pa.array(tot.to_numpy(np.int64))})

    # per-part DISTINCT-basket counts, exact: an (o, p) pair lives in
    # exactly one order-bucket, so the in-bucket dedup is global; the
    # partial sums then fold in a second nparts-group pass
    n_per = (op.groupby("part").map_groups(parts_in_bucket,
                                           batch_format="pandas")
             .groupby("bucket").map_groups(sum_parts,
                                           batch_format="pandas")
             .select_columns(["p", "n"]))

    att = auto_join(co, n_per, left_key="part_a", right_key="p",
                    right_cols=["n"])
    att = att.map_batches(lambda t: t.rename_columns(
        [c if c != "n" else "n_a" for c in t.column_names]),
        batch_format="pyarrow")
    att = auto_join(att, n_per, left_key="part_b", right_key="p",
                    right_cols=["n"])

    def cosine(t: pa.Table) -> pa.Table:
        nco = t["n_co"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "part_a": t["part_a"], "part_b": t["part_b"],
            "n_co": t["n_co"], "n_a": t["n_a"],
            "n_b": t["n"],
            "cosine": pa.array(np.round(nco / np.sqrt(na * nb), 4),
                               pa.float64())})

    return (att.map_batches(cosine, batch_format="pyarrow")
            .sort(["part_a", "part_b"]))


_PART_ITEM_COSINE_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT p, COUNT(*) AS n FROM op GROUP BY 1),
co AS (SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS n_co
       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
       GROUP BY 1, 2)
SELECT part_a, part_b, CAST(n_co AS BIGINT) AS n_co,
       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
       ROUND(n_co / sqrt(na.n * nb.n), 4) AS cosine
FROM co JOIN n na ON na.p = part_a JOIN n nb ON nb.p = part_b
WHERE n_co >= 3
ORDER BY 1, 2
"""


def events_value_psi(sf_dir: str):
    """Population-stability-index drift monitor (the scorecard-industry
    standard the JS-divergence query complements): the event stream is
    split at its midpoint timestamp; the reference half's value deciles
    define 10 bins; PSI = Σ (p̂ᵢ−q̂ᵢ)·ln(p̂ᵢ/q̂ᵢ) with add-one smoothing,
    4 dp, reported alongside the exact per-bin counts.

    Scale shape: three streaming passes (global min/max ts; a distinct-
    value histogram for the reference deciles; per-batch searchsorted
    bin-count partials) — only 9 edges and 20 bin counts ever leave the
    workers."""
    from .functions.quantiles import exact_quantiles
    ev = read_table(sf_dir, "events", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "us": pc.cast(t["ts"], pa.int64()),
            "cents": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                             pa.int64())})

    c = ev.map_batches(prep, batch_format="pyarrow")
    mm = c.aggregate(Min("us", alias_name="mn"), Max("us", alias_name="mx"))
    mid = (int(mm["mn"]) + int(mm["mx"])) // 2

    ref = c.filter(expr=f"us < {mid}")
    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    edges = exact_quantiles(ref, "cents", qs)["value"] \
        .to_numpy().astype(np.int64)

    def bin_counts(t: pa.Table) -> pa.Table:
        us = t["us"].to_numpy(zero_copy_only=False)
        v = t["cents"].to_numpy(zero_copy_only=False)
        # sorted edges + side="left" == count of edges strictly < v,
        # exactly the SQL's COUNT(*) WHERE v > edge (dup edges included)
        b = np.searchsorted(edges, v, side="left")
        rows = []
        for half, mask in (("ref", us < mid), ("cur", us >= mid)):
            cnt = np.bincount(b[mask], minlength=10)
            rows.append(cnt)
        return pa.table({
            "bin": pa.array(np.arange(10, dtype=np.int64), pa.int64()),
            "n_ref": pa.array(rows[0].astype(np.int64), pa.int64()),
            "n_cur": pa.array(rows[1].astype(np.int64), pa.int64())})

    agg = (c.map_batches(bin_counts, batch_format="pyarrow")
           .groupby("bin")
           .aggregate(Sum("n_ref", alias_name="n_ref"),
                      Sum("n_cur", alias_name="n_cur"))
           .sort("bin").to_pandas())
    nr = agg["n_ref"].to_numpy(np.int64)
    nc = agg["n_cur"].to_numpy(np.int64)
    p = (nr + 1.0) / (nr.sum() + 10.0)
    q = (nc + 1.0) / (nc.sum() + 10.0)
    psi = round(float(np.sum((p - q) * np.log(p / q))), 4)
    return pa.table({
        "bin": pa.array(np.arange(10, dtype=np.int64), pa.int64()),
        "n_ref": pa.array(nr, pa.int64()),
        "n_cur": pa.array(nc, pa.int64()),
        "psi": pa.array(np.full(10, psi), pa.float64())})


_EVENTS_PSI_SQL = """
WITH e AS (SELECT epoch_us(ts) AS us,
                  CAST(FLOOR(value * 100) AS BIGINT) AS cents
           FROM events),
m AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM e),
ref AS (SELECT cents FROM e, m WHERE us < mid),
ed AS (SELECT unnest([quantile_disc(cents, 0.1), quantile_disc(cents, 0.2),
                      quantile_disc(cents, 0.3), quantile_disc(cents, 0.4),
                      quantile_disc(cents, 0.5), quantile_disc(cents, 0.6),
                      quantile_disc(cents, 0.7), quantile_disc(cents, 0.8),
                      quantile_disc(cents, 0.9)]) AS edge
      FROM ref),
b AS (SELECT (SELECT COUNT(*) FROM ed WHERE e.cents > ed.edge) AS bin,
             CASE WHEN us < (SELECT mid FROM m) THEN 1 ELSE 0 END AS is_ref
      FROM e),
bins AS (SELECT unnest(generate_series(0, 9)) AS bin),
j AS (SELECT bins.bin,
             COALESCE(SUM(is_ref), 0) AS n_ref,
             COALESCE(SUM(1 - is_ref), 0) AS n_cur
      FROM bins LEFT JOIN b ON b.bin = bins.bin
      GROUP BY 1),
t AS (SELECT SUM(n_ref) AS cr, SUM(n_cur) AS cc FROM j),
s AS (SELECT ROUND(SUM(((n_ref + 1.0) / (cr + 10) - (n_cur + 1.0) / (cc + 10))
                       * ln(((n_ref + 1.0) / (cr + 10))
                            / ((n_cur + 1.0) / (cc + 10)))), 4) AS psi
      FROM j, t)
SELECT j.bin, CAST(j.n_ref AS BIGINT) AS n_ref,
       CAST(j.n_cur AS BIGINT) AS n_cur, s.psi
FROM j, s ORDER BY j.bin
"""


def _levenshtein(a: str, b: str, maxd: int) -> int:
    """Plain DP edit distance with a length-difference early exit;
    returns maxd+1 when the true distance exceeds maxd."""
    la, lb = len(a), len(b)
    if abs(la - lb) > maxd:
        return maxd + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def part_fuzzy_name_pairs(sf_dir: str, max_d: int = 2):
    """Edit-distance fuzzy self-join (the entity-resolution blocking +
    verify step a KG build runs on surface forms): unordered distinct
    part-name pairs with Levenshtein distance ≤ ``max_d``, each with
    its exact distance and both names' row counts.

    Scale shape: Garbe's SymSpell deletion-neighborhood blocking —
    lev(a,b) ≤ d guarantees the ≤d-deletion sets intersect, so names
    explode to hashed deletion keys (O(len^d) per name, names are
    short), candidate pairs emit inside ONE key-hash-bucketed
    map_groups, dedup + DP verification run inside a second pair-hash
    bucket pass. Row counts ride the same two-level bucket-sum idiom;
    no driver materialization and every Ray-level groupby stays at
    ``nparts`` groups."""
    from .functions.hashing import stable_hash64
    from .functions.joins import auto_join
    from .functions.partitions import default_parts
    part = read_table(sf_dir, "part", columns=["p_name"])
    nparts = default_parts()

    def name_counts(t: pa.Table) -> pa.Table:
        vc = pd.Series(t["p_name"].to_pylist()).value_counts()
        names = vc.index.to_numpy(object)
        return pa.table({
            "name": pa.array(names, pa.string()),
            "n_rows": pa.array(vc.to_numpy(np.int64)),
            "bucket": pa.array(
                np.array([stable_hash64(s) % nparts for s in names],
                         np.int64))})

    def sum_names(g: pd.DataFrame) -> pa.Table:
        tot = g.groupby("name", sort=False)["n_rows"].sum()
        return pa.table({
            "name": pa.array(tot.index.to_numpy(object), pa.string()),
            "n_rows": pa.array(tot.to_numpy(np.int64))})

    names = (part.map_batches(name_counts, batch_format="pyarrow")
             .groupby("bucket").map_groups(sum_names,
                                           batch_format="pandas"))

    def _deletions(s: str, d: int) -> set:
        seen, frontier = {s}, {s}
        for _ in range(d):
            nxt = set()
            for w in frontier:
                for i in range(len(w)):
                    c = w[:i] + w[i + 1:]
                    if c not in seen:
                        seen.add(c)
                        nxt.add(c)
            frontier = nxt
        return seen

    def expand(t: pa.Table) -> pa.Table:
        out_n, out_k = [], []
        for nm in t["name"].to_pylist():
            for k in _deletions(nm, max_d):
                out_n.append(nm)
                out_k.append(stable_hash64(k))
        keys = np.array(out_k, np.int64)
        return pa.table({"name": pa.array(out_n, pa.string()),
                         "key": pa.array(keys),
                         "kb": pa.array(keys % nparts)})

    def candidates(g: pd.DataFrame) -> pa.Table:
        pa_, pb_ = [], []
        for _, kg in g.groupby("key", sort=False):
            nm = np.sort(kg["name"].unique())
            if len(nm) < 2:
                continue
            x, y = np.triu_indices(len(nm), k=1)
            pa_.append(nm[x])
            pb_.append(nm[y])
        if not pa_:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string()),
                             "pb": pa.array([], pa.int64())})
        cand = (pd.DataFrame({"name_a": np.concatenate(pa_),
                              "name_b": np.concatenate(pb_)})
                .drop_duplicates())
        cand["pb"] = [(stable_hash64(a + "\x00" + b)) % nparts
                      for a, b in zip(cand["name_a"], cand["name_b"])]
        return pa.table({
            "name_a": pa.array(cand["name_a"], pa.string()),
            "name_b": pa.array(cand["name_b"], pa.string()),
            "pb": pa.array(cand["pb"].to_numpy(np.int64))})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["name_a", "name_b"])
        dist = np.array([_levenshtein(a, b, max_d) for a, b in
                         zip(g["name_a"], g["name_b"])], np.int64)
        keep = dist <= max_d
        return pd.DataFrame({"name_a": g["name_a"].to_numpy(object)[keep],
                             "name_b": g["name_b"].to_numpy(object)[keep],
                             "dist": dist[keep]})

    pairs = (names.map_batches(expand, batch_format="pyarrow")
             .groupby("kb").map_groups(candidates, batch_format="pandas")
             .groupby("pb").map_groups(verify, batch_format="pandas")
             .select_columns(["name_a", "name_b", "dist"]))

    counts = names.select_columns(["name", "n_rows"])
    att = auto_join(pairs, counts, left_key="name_a", right_key="name",
                    right_cols=["n_rows"])
    att = att.map_batches(lambda t: t.rename_columns(
        [c if c != "n_rows" else "n_a" for c in t.column_names]),
        batch_format="pyarrow")
    att = auto_join(att, counts, left_key="name_b", right_key="name",
                    right_cols=["n_rows"])
    att = att.map_batches(lambda t: t.rename_columns(
        [c if c != "n_rows" else "n_b" for c in t.column_names]),
        batch_format="pyarrow")
    return att.sort(["name_a", "name_b"])


_PART_SYMSPELL_FUZZY_SQL = """
WITH n AS (SELECT p_name AS name, COUNT(*) AS n_rows FROM part GROUP BY 1)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       CAST(a.n_rows AS BIGINT) AS n_a, CAST(b.n_rows AS BIGINT) AS n_b
FROM n a JOIN n b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
ORDER BY 1, 2
"""


def events_value_ranksum(sf_dir: str):
    """Mann–Whitney rank-sum statistic per event type (the
    nonparametric two-sample drift test: does this type's value
    distribution sit above the rest of the stream?): for each type,
    n₁, n₂ and U₁ of that type vs all other events, with average ranks
    for ties. Everything is doubled once (U₁×2) so tie midpoints stay
    exact integers end to end.

    Scale shape: values collapse to a distinct-cents histogram with
    per-type counts (value-hash bucket sums — never a per-value Ray
    aggregate); the global below-count comes from the range-partitioned
    ``global_running_sum`` over one flagged row per distinct value; the
    final reduction is |types| partial sums."""
    from .functions.joins import auto_join
    from .functions.partitions import default_parts
    from .functions.rank import global_running_sum
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    nparts = default_parts()

    def prep(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ty": t["event_type"].to_pylist(),
            "v": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                         pa.int64()).to_numpy(zero_copy_only=False)})
        g = df.groupby(["v", "ty"], sort=False).size().rename(
            "cnt").reset_index()
        g["bucket"] = g["v"] % nparts
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        vt = (g.groupby(["v", "ty"], sort=False)["cnt"].sum()
              .reset_index())
        tot = vt.groupby("v", sort=False)["cnt"].sum().rename("cnt_all")
        vt = vt.merge(tot, left_on="v", right_index=True)
        # exactly one flagged row per distinct value feeds the global
        # cumulative below-count
        vt = vt.sort_values(["v", "ty"], kind="mergesort")
        vt["is_first"] = ~vt["v"].duplicated()
        return vt

    hist = (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket").map_groups(fold, batch_format="pandas"))

    firsts = (hist.filter(expr="is_first == True")
              .select_columns(["v", "cnt_all"])
              .map_batches(lambda t: t.rename_columns(["v", "cnt_v"]),
                           batch_format="pyarrow"))
    cum = global_running_sum(firsts, "cnt_v", order_by=["v"],
                             out_col="cum")
    below = cum.map_batches(
        lambda t: pa.table({
            "v": t["v"],
            "below": pc.subtract(t["cum"], t["cnt_v"])}),
        batch_format="pyarrow")

    att = auto_join(hist.select_columns(["v", "ty", "cnt", "cnt_all"]),
                    below, left_key="v", right_key="v",
                    right_cols=["below"])

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ty": t["ty"].to_pylist(),
            "cnt": t["cnt"].to_numpy(zero_copy_only=False),
            "r": (t["cnt"].to_numpy(zero_copy_only=False)
                  * (2 * t["below"].to_numpy(zero_copy_only=False)
                     + t["cnt_all"].to_numpy(zero_copy_only=False) + 1))})
        g = df.groupby("ty", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (att.map_batches(partials, batch_format="pyarrow")
           .groupby("ty")
           .aggregate(Sum("cnt", alias_name="n1"),
                      Sum("r", alias_name="r1x2"))
           .sort("ty").to_pandas())
    n = int(agg["n1"].sum())
    n1 = agg["n1"].to_numpy(np.int64)
    r1x2 = agg["r1x2"].to_numpy(np.int64)
    return pa.table({
        "event_type": pa.array(agg["ty"].tolist(), pa.string()),
        "n1": pa.array(n1),
        "n2": pa.array(n - n1),
        "u1_x2": pa.array(r1x2 - n1 * (n1 + 1))})


_EVENTS_RANKSUM_SQL = """
WITH c AS (SELECT event_type AS ty,
                  CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events),
h AS (SELECT v, COUNT(*) AS cnt_all FROM c GROUP BY 1),
r AS (SELECT v, cnt_all,
             SUM(cnt_all) OVER (ORDER BY v) - cnt_all AS below FROM h),
ht AS (SELECT ty, v, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
j AS (SELECT ty, SUM(cnt) AS n1,
             SUM(cnt * (2 * below + cnt_all + 1)) AS r1x2
      FROM ht JOIN r USING (v) GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM c)
SELECT ty AS event_type, CAST(n1 AS BIGINT) AS n1,
       CAST(n - n1 AS BIGINT) AS n2,
       CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2
FROM j, tot ORDER BY 1
"""


def orders_kendall_tau(sf_dir: str):
    """Kendall τ-b rank correlation between daily order volume and
    daily revenue (the monotone-association complement to the exact
    Spearman query — tie-aware, all-integer concordance counts): over
    all day pairs, concordant / discordant / tied-in-x / tied-in-y
    counts plus τ-b at 6 dp.

    Scale shape: the fact table collapses to one (day, n, cents) row
    per calendar day through per-batch combiners + one bounded groupby;
    the O(days²) sign matrix (a few thousand days even at 100 TB —
    calendar-bounded, not data-bounded) runs vectorized in a single
    worker task, never on the driver."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "day": (pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
                zero_copy_only=False) // 86_400_000_000),
            "cents": _cents(t["o_totalprice"]).to_numpy(
                zero_copy_only=False)})
        g = (df.groupby("day", sort=False)
             .agg(n=("cents", "size"), cents=("cents", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (orders.map_batches(prep, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n"),
                                       Sum("cents", alias_name="cents")))

    def kernel(t: pa.Table) -> pa.Table:
        x = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(x)
        i, j = np.triu_indices(k, k=1)
        dx = np.sign(x[j] - x[i])
        dy = np.sign(y[j] - y[i])
        prod = dx * dy
        nc = int((prod > 0).sum())
        nd = int((prod < 0).sum())
        tx = int((dx == 0).sum())
        ty = int((dy == 0).sum())
        n0 = k * (k - 1) // 2
        tau = round((nc - nd) / np.sqrt(float(n0 - tx) * (n0 - ty)), 6)
        return pa.table({
            "n_days": pa.array([k], pa.int64()),
            "concordant": pa.array([nc], pa.int64()),
            "discordant": pa.array([nd], pa.int64()),
            "tied_x": pa.array([tx], pa.int64()),
            "tied_y": pa.array([ty], pa.int64()),
            "tau_b": pa.array([tau], pa.float64())})

    return (daily.repartition(1)
            .map_batches(kernel, batch_format="pyarrow",
                         batch_size=None))


_ORDERS_KENDALL_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  COUNT(*) AS n,
                  SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
           FROM orders GROUP BY 1),
p AS (SELECT a.n AS xa, a.cents AS ya, b.n AS xb, b.cents AS yb
      FROM d a JOIN d b ON a.day < b.day),
s AS (SELECT COUNT(*) AS n0,
             SUM(CASE WHEN (xb - xa) * (yb - ya) > 0 THEN 1 ELSE 0 END)
                 AS nc,
             SUM(CASE WHEN (xb - xa) * (yb - ya) < 0 THEN 1 ELSE 0 END)
                 AS nd,
             SUM(CASE WHEN xb = xa THEN 1 ELSE 0 END) AS tx,
             SUM(CASE WHEN yb = ya THEN 1 ELSE 0 END) AS ty
      FROM p),
k AS (SELECT COUNT(*) AS n_days FROM d)
SELECT CAST(n_days AS BIGINT) AS n_days, CAST(nc AS BIGINT) AS concordant,
       CAST(nd AS BIGINT) AS discordant, CAST(tx AS BIGINT) AS tied_x,
       CAST(ty AS BIGINT) AS tied_y,
       ROUND((nc - nd) / sqrt((n0 - tx) * (n0 - ty)), 6) AS tau_b
FROM s, k
"""


_BOILERPLATE_PATTERNS = [
    "batch batch batch",
    "window window",
    "sort table scan",
    "hash scan join",
    "key order",
    "spark window",
]


def docs_boilerplate_scan(sf_dir: str):
    """Multi-pattern literal contamination scan (the benchmark-string /
    boilerplate screen a curation pipeline runs before training): for
    each needle in a fixed pattern list, how many documents contain it
    and how many non-overlapping occurrences exist corpus-wide, plus
    the containment rate in exact ppm.

    Scale shape: one streaming pass; each batch emits K-row partial
    (pattern, docs, occurrences) counts from vectorized pandas
    ``str.count`` (left-to-right non-overlapping, identical to the
    SQL replace-length count), folded by a K-group sum. Nothing but
    K×|batches| tiny rows ever shuffles."""
    import re as _re
    docs = read_table(sf_dir, "documents", columns=["text"])
    pats = list(_BOILERPLATE_PATTERNS)

    def scan(t: pa.Table) -> pa.Table:
        s = pd.Series(t["text"].to_pylist())
        rows_p, rows_d, rows_o, rows_n = [], [], [], []
        for p in pats:
            c = s.str.count(_re.escape(p))
            rows_p.append(p)
            rows_d.append(int((c > 0).sum()))
            rows_o.append(int(c.sum()))
            rows_n.append(len(s))
        return pa.table({"pattern": pa.array(rows_p, pa.string()),
                         "n_docs": pa.array(rows_d, pa.int64()),
                         "occurrences": pa.array(rows_o, pa.int64()),
                         "n_total": pa.array(rows_n, pa.int64())})

    agg = (docs.map_batches(scan, batch_format="pyarrow")
           .groupby("pattern")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("occurrences", alias_name="occurrences"),
                      Sum("n_total", alias_name="n_total")))

    def finish(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False)
        nt = t["n_total"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pattern": t["pattern"],
            "n_docs": t["n_docs"],
            "occurrences": t["occurrences"],
            "doc_ppm": pa.array(nd * 1_000_000 // nt, pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow").sort("pattern")


_DOCS_BOILERPLATE_SQL = """
WITH p(pattern) AS (VALUES ('batch batch batch'), ('window window'),
                           ('sort table scan'), ('hash scan join'),
                           ('key order'), ('spark window')),
s AS (SELECT pattern,
             SUM(CASE WHEN POSITION(pattern IN text) > 0
                      THEN 1 ELSE 0 END) AS n_docs,
             SUM((LENGTH(text) - LENGTH(REPLACE(text, pattern, '')))
                 // LENGTH(pattern)) AS occurrences,
             COUNT(*) AS n_total
      FROM documents, p GROUP BY 1)
SELECT pattern, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(occurrences AS BIGINT) AS occurrences,
       CAST(n_docs * 1000000 // n_total AS BIGINT) AS doc_ppm
FROM s ORDER BY 1
"""


def events_type_profile_cosine(sf_dir: str):
    """Behavioral-profile similarity matrix (the 'which metrics move
    together over the day' diagnostic): each event type's 24-bin
    hour-of-day activity histogram, pairwise cosine between types —
    exact integer dot products, cosine at 6 dp.

    Scale shape: the stream collapses to ≤ |types|×24 rows through
    per-batch combiners + one bounded groupby; the pair matrix is
    |types|² and computes vectorized in a single worker task."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "ty": t["event_type"].to_pylist(),
            "hr": pc.hour(t["ts"]).to_numpy(zero_copy_only=False)
            .astype(np.int64)})
        g = df.groupby(["ty", "hr"], sort=False).size().rename(
            "n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    prof = (ev.map_batches(prep, batch_format="pyarrow")
            .groupby(["ty", "hr"]).aggregate(Sum("n", alias_name="n")))

    def kernel(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"ty": t["ty"].to_pylist(),
                           "hr": t["hr"].to_numpy(zero_copy_only=False),
                           "n": t["n"].to_numpy(zero_copy_only=False)})
        mat = (df.pivot_table(index="ty", columns="hr", values="n",
                              aggfunc="sum", fill_value=0)
               .sort_index())
        types = mat.index.to_numpy(object)
        m = mat.to_numpy(np.int64)
        dot = m @ m.T                          # exact int64
        ss = np.diag(dot).astype(np.float64)
        i, j = np.triu_indices(len(types), k=1)
        cos = np.round(dot[i, j] / np.sqrt(ss[i] * ss[j]), 6)
        return pa.table({
            "type_a": pa.array(types[i], pa.string()),
            "type_b": pa.array(types[j], pa.string()),
            "dot": pa.array(dot[i, j].astype(np.int64)),
            "cosine": pa.array(cos, pa.float64())})

    return (prof.repartition(1)
            .map_batches(kernel, batch_format="pyarrow", batch_size=None)
            .sort(["type_a", "type_b"]))


_EVENTS_PROFILE_COSINE_SQL = """
WITH h AS (SELECT event_type AS ty, EXTRACT(hour FROM ts) AS hr,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2),
p AS (SELECT a.ty AS type_a, b.ty AS type_b, SUM(a.n * b.n) AS dot
      FROM h a JOIN h b ON a.hr = b.hr AND a.ty < b.ty GROUP BY 1, 2),
s AS (SELECT ty, SUM(n * n) AS ss FROM h GROUP BY 1)
SELECT type_a, type_b, CAST(dot AS BIGINT) AS dot,
       ROUND(dot / sqrt(sa.ss * sb.ss), 6) AS cosine
FROM p JOIN s sa ON sa.ty = type_a JOIN s sb ON sb.ty = type_b
ORDER BY 1, 2
"""


def schema_fk_orphan_scan(sf_dir: str):
    """Referential-integrity orphan scan over every declared FK edge of
    the star schema (the nightly warehouse audit: child rows whose
    parent key is missing): per edge, total child rows and orphan rows.

    Scale shape: each edge is one distributed ``anti_join`` (distinct-
    key combiner on the parent side, hash-partitioned membership probe
    — no driver key sets); only seven (edge, count, count) rows are
    ever collected."""
    from .functions.joins import anti_join
    edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    rows = []
    for name, child, ck, parent, pk in edges:
        c = read_table(sf_dir, child, columns=[ck])
        p = read_table(sf_dir, parent, columns=[pk])
        rows.append((name, c.count(),
                     anti_join(c, p, left_key=ck, right_key=pk).count()))
    return pa.table({
        "edge": pa.array([r[0] for r in rows], pa.string()),
        "n_child": pa.array([r[1] for r in rows], pa.int64()),
        "n_orphans": pa.array([r[2] for r in rows], pa.int64())})


_FK_ORPHAN_SQL = """
SELECT * FROM (
SELECT 'lineitem.l_orderkey->orders' AS edge,
       (SELECT COUNT(*) FROM lineitem) AS n_child,
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
       AS n_orphans
UNION ALL
SELECT 'lineitem.l_partkey->part', (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.l_suppkey->supplier', (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders.o_custkey->customer', (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer.c_nationkey->nation', (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier.s_nationkey->nation', (SELECT COUNT(*) FROM supplier),
       (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
        (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
UNION ALL
SELECT 'nation.n_regionkey->region', (SELECT COUNT(*) FROM nation),
       (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
        (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
) ORDER BY edge
"""


def customer_erasure_cascade(sf_dir: str):
    """Right-to-be-forgotten cascade audit (the GDPR Article-17 blast
    radius report: if these customers are erased, how many rows in
    each downstream table are touched?): targets are AUTOMOBILE-segment
    customers with negative balance; affected counts cascade customer →
    orders → lineitem, each as rows and table-ppm.

    Scale shape: two chained distributed semi-joins (distinct-key
    combiners, hash-partitioned probes — the target key set never
    lands on the driver); three counters collected."""
    from .functions.joins import semi_join
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    targets = cust.map_batches(
        lambda t: t.filter(pc.and_(
            pc.equal(t["c_mktsegment"], pa.scalar("AUTOMOBILE")),
            pc.less(t["c_acctbal"], pa.scalar(0.0))))
        .select(["c_custkey"]), batch_format="pyarrow")

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"])
    hit_orders = semi_join(orders, targets, left_key="o_custkey",
                           right_key="c_custkey")
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    hit_li = semi_join(li, hit_orders, left_key="l_orderkey",
                       right_key="o_orderkey")

    n_c, n_o, n_l = cust.count(), orders.count(), li.count()
    a_c = targets.count()
    a_o = hit_orders.count()
    a_l = hit_li.count()
    return pa.table({
        "table_name": pa.array(["customer", "lineitem", "orders"],
                               pa.string()),
        "n_affected": pa.array([a_c, a_l, a_o], pa.int64()),
        "n_total": pa.array([n_c, n_l, n_o], pa.int64()),
        "affected_ppm": pa.array(
            [a_c * 1_000_000 // n_c, a_l * 1_000_000 // n_l,
             a_o * 1_000_000 // n_o], pa.int64())})


_ERASURE_CASCADE_SQL = """
WITH t AS (SELECT c_custkey FROM customer
           WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0),
o AS (SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM t)),
l AS (SELECT 1 FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM o))
SELECT * FROM (
SELECT 'customer' AS table_name,
       CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_affected,
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_total,
       CAST((SELECT COUNT(*) FROM t) * 1000000
            // (SELECT COUNT(*) FROM customer) AS BIGINT) AS affected_ppm
UNION ALL
SELECT 'orders', (SELECT COUNT(*) FROM o),
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM o) * 1000000
       // (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'lineitem', (SELECT COUNT(*) FROM l),
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM l) * 1000000
       // (SELECT COUNT(*) FROM lineitem)
) ORDER BY table_name
"""


def part_dag_levels(sf_dir: str):
    """DAG layering / critical-path depth (round 4): orient the strong
    co-occurrence edges small→large partkey (acyclic by construction)
    and compute every node's LONGEST-path level — topological depth,
    the scheduling primitive behind build planners and dataflow DAG
    visualizers. Runs on the Pregel shard ring in directed max-plus
    mode (stages/pregel.py mode="longest"): edges partition once into
    shard memory, rounds = depth(DAG), each round exchanges only
    improved (level+1) candidates. The SQL oracle walks the same DAG
    with a recursive CTE and takes MAX(dist) per node."""
    from .functions.graphops import dag_longest_paths

    edges = _part_strong_edges(sf_dir)
    return dag_longest_paths(edges, num_partitions=_join_parts(sf_dir),
                             max_iters=400).sort(["level", "node"])


_PART_DAG_LEVELS_SQL = """
WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey u, b.l_partkey v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
base AS (SELECT u AS node FROM e UNION SELECT v FROM e),
walk(node, dist) AS (
    SELECT node, 0 FROM base
    UNION
    SELECT e.v, w.dist + 1 FROM walk w JOIN e ON e.u = w.node
)
SELECT node, CAST(MAX(dist) AS BIGINT) AS level
FROM walk GROUP BY node ORDER BY level, node
"""


def orders_kaplan_meier(sf_dir: str):
    """Kaplan–Meier survival estimator (Kaplan & Meier 1958) over
    customer lifetime: duration = days between a customer's first and
    last order; the "death" event is churn (last order > 90 days before
    the corpus end date), otherwise the customer is right-censored.
    Output one row per event time: (t_days, n_risk, n_event, survival).

    Distribution shape: per-customer min/max is one narrow groupby;
    the per-duration event/censor counts are a second groupby over a
    domain bounded by the CALENDAR (≤ a few thousand distinct day
    durations, independent of corpus size), so the final risk-set scan
    + cumulative product runs in a single map_groups task. survival is
    exp(Σ ln(1 − d/r)) in t-order with float64 on both engines,
    rounded to 6 dp."""
    ords = read_table(sf_dir, "orders", columns=["o_custkey",
                                                 "o_orderdate"])
    end = ords.max("o_orderdate")
    cutoff = pd.Timestamp(end) - pd.Timedelta(days=90)
    per = ords.groupby("o_custkey").aggregate(
        Min("o_orderdate", alias_name="first_dt"),
        Max("o_orderdate", alias_name="last_dt"))

    def obs(t: pa.Table) -> pa.Table:
        # the Min/Max aggregate can narrow timestamp precision; pin µs
        # so the day divisor below is unit-correct
        first = pc.cast(t["first_dt"], pa.timestamp("us"))
        last = pc.cast(t["last_dt"], pa.timestamp("us"))
        dur = pc.subtract(last, first)
        t_days = pc.divide(pc.cast(dur, pa.int64()),
                           pa.scalar(86_400_000_000, pa.int64()))
        ev = pc.cast(pc.less(last,
                             pa.scalar(cutoff, type=pa.timestamp("us"))),
                     pa.int64())
        return pa.table({"t_days": t_days, "ev": ev})

    agg = (per.map_batches(obs, batch_format="pyarrow")
           .groupby("t_days")
           .aggregate(Sum("ev", alias_name="d"), Count(alias_name="c")))

    out_schema = pa.schema([("t_days", pa.int64()), ("n_risk", pa.int64()),
                            ("n_event", pa.int64()),
                            ("survival", pa.float64())])

    def km(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("t_days")
        c = g["c"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        r = c[::-1].cumsum()[::-1]            # at risk: duration >= t
        surv = np.exp(np.cumsum(np.log(1.0 - d / r)))
        keep = d > 0                          # KM curve steps at events
        return pa.table({
            "t_days": pa.array(g["t_days"].to_numpy(np.int64)[keep]),
            "n_risk": pa.array(r[keep]),
            "n_event": pa.array(d[keep]),
            "survival": pa.array(np.round(surv[keep], 6)),
        }).cast(out_schema)

    def const_key(t: pa.Table) -> pa.Table:
        return t.append_column("_k", pa.array([0] * t.num_rows, pa.int8()))

    return (agg.map_batches(const_key, batch_format="pyarrow")
            .groupby("_k").map_groups(km, batch_format="pandas")
            .sort("t_days"))


_ORDERS_KM_SQL = """
WITH per AS (SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
             FROM orders GROUP BY 1),
mx AS (SELECT MAX(o_orderdate) AS fin FROM orders),
obs AS (SELECT CAST(floor((epoch(l) - epoch(f)) / 86400) AS BIGINT) AS t,
               CASE WHEN l < fin - INTERVAL 90 DAY THEN 1 ELSE 0 END AS ev
        FROM per, mx),
agg AS (SELECT t, SUM(ev) AS d, COUNT(*) AS c FROM obs GROUP BY t),
risk AS (SELECT t, d, SUM(c) OVER (ORDER BY t DESC) AS r FROM agg),
km AS (SELECT t, d, r,
              EXP(SUM(LN(1 - CAST(d AS DOUBLE) / r)) OVER (ORDER BY t)) AS s
       FROM risk)
SELECT t AS t_days, CAST(r AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_event,
       ROUND(s, 6) AS survival
FROM km WHERE d > 0 ORDER BY t
"""


def events_ab_ztest(sf_dir: str):
    """Two-proportion z-test (pooled) for an A/B split: unit = EVENT,
    variant = event_id % 2, conversion = the event is a 'purchase'.
    Output a single row (n_a, n_b, conv_a, conv_b, z) with z rounded to
    6 dp — the online-experimentation readout primitive. (Event-level
    bucketing keeps the proportion interior at every test scale; a
    per-USER split degenerates to p=1 here — every sf0.01 user
    purchases — and 0/0 NaN is not a stable driver hash.) Per-batch
    (variant, n, conv) combiners mean only 2·#blocks partial rows ever
    shuffle."""
    ev = read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def flag(t: pa.Table) -> pa.Table:
        conv = pc.cast(pc.equal(t["event_type"], pa.scalar("purchase")),
                       pa.int64())
        var = pc.cast(pc.bit_wise_and(t["event_id"], pa.scalar(1)),
                      pa.int64())
        one = pa.array(np.ones(t.num_rows, np.int64))
        # per-batch combiner: collapse to ≤2 rows before the shuffle
        return pa.table({"variant": var, "one": one, "conv": conv}) \
            .group_by("variant").aggregate([("one", "sum"),
                                            ("conv", "sum")]) \
            .rename_columns(["variant", "n_part", "conv_part"])

    agg = (ev.map_batches(flag, batch_format="pyarrow")
           .groupby("variant")
           .aggregate(Sum("n_part", alias_name="n"),
                      Sum("conv_part", alias_name="conv")))

    out_schema = pa.schema([("n_a", pa.int64()), ("n_b", pa.int64()),
                            ("conv_a", pa.int64()), ("conv_b", pa.int64()),
                            ("z", pa.float64())])

    def ztest(t: pa.Table) -> pa.Table:
        df = t.to_pandas().set_index("variant")   # exactly 2 rows
        n0, c0 = int(df.loc[0, "n"]), int(df.loc[0, "conv"])
        n1, c1 = int(df.loc[1, "n"]), int(df.loc[1, "conv"])
        p0, p1 = c0 / n0, c1 / n1
        p = (c0 + c1) / (n0 + n1)
        z = (p1 - p0) / np.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
        return pa.table({"n_a": [n0], "n_b": [n1], "conv_a": [c0],
                         "conv_b": [c1], "z": [round(float(z), 6)]}
                        ).cast(out_schema)

    two = pa.Table.from_pandas(agg.to_pandas())   # 2 rows by construction
    return ray.data.from_arrow(ztest(two))


_EVENTS_AB_ZTEST_SQL = """
WITH v AS (SELECT event_id % 2 AS variant,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                      AS converted
           FROM events),
agg AS (SELECT variant, COUNT(*) AS n, SUM(converted) AS conv
        FROM v GROUP BY 1),
w AS (SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
        MAX(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM agg)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
       CAST(c0 AS BIGINT) AS conv_a, CAST(c1 AS BIGINT) AS conv_b,
       ROUND((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0)
             / SQRT((CAST(c0+c1 AS DOUBLE)/(n0+n1))
                    * (1 - CAST(c0+c1 AS DOUBLE)/(n0+n1))
                    * (1.0/n0 + 1.0/n1)), 6) AS z
FROM w
"""


def lineitem_cov_matrix(sf_dir: str):
    """Pairwise covariance MATRIX over (l_quantity, l_discount, l_tax)
    — the multi-column-statistics primitive behind feature analysis and
    CBO column-group stats — kept FULLY EXACT: values enter as small
    integers (quantity as-is, discount/tax in cents ≤ 10), every batch
    emits one row of (n, Σx, Σy, Σxy) int64 partials per column pair,
    and the covariance is reported as the exact integer NUMERATOR
    cov_num = n·Σxy − Σx·Σy with n alongside (cov = cov_num/n²) so no
    float ever crosses the engine boundary. Headroom: Σxy ≤ 500·rows
    and n·Σxy ≤ 500·rows² — int64-safe past sf100; swap to HUGEINT
    partials beyond."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_quantity", "l_discount", "l_tax"])
    cols = ["l_quantity", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]

    out_schema = pa.schema([("col_a", pa.string()), ("col_b", pa.string()),
                            ("n", pa.int64()), ("sx", pa.int64()),
                            ("sy", pa.int64()), ("sxy", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy().astype(np.int64)
        d = np.round(t["l_discount"].to_numpy() * 100).astype(np.int64)
        x = np.round(t["l_tax"].to_numpy() * 100).astype(np.int64)
        vals = {"l_quantity": q, "l_discount": d, "l_tax": x}
        rows = {"col_a": [], "col_b": [], "n": [], "sx": [], "sy": [],
                "sxy": []}
        for a, b in pairs:
            rows["col_a"].append(a)
            rows["col_b"].append(b)
            rows["n"].append(len(q))
            rows["sx"].append(int(vals[a].sum()))
            rows["sy"].append(int(vals[b].sum()))
            rows["sxy"].append(int((vals[a] * vals[b]).sum()))
        return pa.table(rows).cast(out_schema)

    agg = (li.map_batches(partials, batch_format="pyarrow")
           .groupby(["col_a", "col_b"])
           .aggregate(Sum("n", alias_name="n_total"),
                      Sum("sx", alias_name="sx_t"),
                      Sum("sy", alias_name="sy_t"),
                      Sum("sxy", alias_name="sxy_t")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_total"].to_numpy().astype(np.int64)
        sx = t["sx_t"].to_numpy().astype(np.int64)
        sy = t["sy_t"].to_numpy().astype(np.int64)
        sxy = t["sxy_t"].to_numpy().astype(np.int64)
        return pa.table({"col_a": t["col_a"], "col_b": t["col_b"],
                         "n": pa.array(n),
                         "cov_num": pa.array(n * sxy - sx * sy)})

    return (agg.map_batches(finish, batch_format="pyarrow")
            .sort(["col_a", "col_b"]))


_LINEITEM_COV_SQL = """
WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS l_quantity,
                  CAST(round(l_discount * 100) AS BIGINT) AS l_discount,
                  CAST(round(l_tax * 100) AS BIGINT) AS l_tax
           FROM lineitem),
m AS (SELECT COUNT(*) AS n,
             SUM(l_quantity) AS s_q, SUM(l_discount) AS s_d,
             SUM(l_tax) AS s_t,
             SUM(l_quantity*l_quantity) AS s_qq,
             SUM(l_quantity*l_discount) AS s_qd,
             SUM(l_quantity*l_tax) AS s_qt,
             SUM(l_discount*l_discount) AS s_dd,
             SUM(l_discount*l_tax) AS s_dt,
             SUM(l_tax*l_tax) AS s_tt
      FROM v)
SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num
FROM (
  SELECT 'l_quantity' col_a, 'l_quantity' col_b, n, s_q sx, s_q sy, s_qq sxy FROM m
  UNION ALL SELECT 'l_quantity', 'l_discount', n, s_q, s_d, s_qd FROM m
  UNION ALL SELECT 'l_quantity', 'l_tax', n, s_q, s_t, s_qt FROM m
  UNION ALL SELECT 'l_discount', 'l_discount', n, s_d, s_d, s_dd FROM m
  UNION ALL SELECT 'l_discount', 'l_tax', n, s_d, s_t, s_dt FROM m
  UNION ALL SELECT 'l_tax', 'l_tax', n, s_t, s_t, s_tt FROM m
)
ORDER BY col_a, col_b
"""


def _jaro_winkler(s1: str, s2: str) -> float:
    """Textbook Jaro–Winkler (Winkler 1990): prefix ≤ 4, scale 0.1,
    boost only above 0.7 — the parameterization DuckDB's
    jaro_winkler_similarity uses (probed: boost NOT applied at
    jaro ≤ 0.7; 'martha'/'marhta' = 0.9611); property-tested against
    DuckDB on random strings in tests/test_properties_ops.py."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    a = [c for i, c in enumerate(s1) if m1[i]]
    b = [c for j, c in enumerate(s2) if m2[j]]
    t = sum(x != y for x, y in zip(a, b)) // 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    p = 0
    for x, y in zip(s1[:4], s2[:4]):
        if x != y:
            break
        p += 1
    return jaro + 0.1 * p * (1.0 - jaro)


def part_jw_name_pairs(sf_dir: str, theta: float = 0.85):
    """Jaro–Winkler record-linkage join with an EXPLICIT blocking key
    (Fellegi–Sunter blocking: candidates must share the first
    whitespace token) over distinct part names — the probabilistic
    surface-form matcher complementing the edit-distance (FastSS /
    SymSpell) joins. Contract: recall is bounded by the blocking key
    (pairs in different blocks are out of scope BY DEFINITION, mirrored
    in the SQL oracle), which is what makes the operator scale — work
    is Σ(block size²) over a vocab-sized DISTINCT-name table, never
    corpus-sized, and blocks hash-partition independently."""
    part = read_table(sf_dir, "part", columns=["p_name"])
    names = part.groupby("p_name").aggregate(Count(alias_name="_n"))

    out_schema = pa.schema([("name_a", pa.string()),
                            ("name_b", pa.string()),
                            ("jw", pa.float64())])

    def blocked(t: pa.Table) -> pa.Table:
        if "p_name" not in t.column_names:
            return pa.table({"block": pa.array([], pa.string()),
                             "name": pa.array([], pa.string())})
        name = t["p_name"]
        block = pc.list_element(pc.split_pattern(name, " "), 0)
        return pa.table({"block": block, "name": name})

    def pairs(g: pd.DataFrame) -> pa.Table:
        ns = sorted(g["name"].tolist())
        ra, rb, rj = [], [], []
        for i, a in enumerate(ns):
            for b in ns[i + 1:]:
                jw = _jaro_winkler(a, b)
                if jw >= theta:
                    ra.append(a)
                    rb.append(b)
                    rj.append(round(jw, 6))
        return pa.table({"name_a": ra, "name_b": rb,
                         "jw": pa.array(rj, pa.float64())}).cast(out_schema)

    return (names.map_batches(blocked, batch_format="pyarrow")
            .groupby("block").map_groups(pairs, batch_format="pandas")
            .sort(["name_a", "name_b"]))


_PART_JW_PAIRS_SQL = """
WITH n AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
FROM n a JOIN n b
  ON a.p_name < b.p_name
 AND split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
ORDER BY name_a, name_b
"""


def part_graph_ktruss(sf_dir: str, k: int = 3):
    """k-truss of the part co-occurrence graph
    (functions/graphops.py ``ktruss``): the maximal subgraph where
    every surviving edge closes ≥ k−2 triangles with other survivors
    — the community-core extraction step (strictly stronger cohesion
    than k-core). Default k=3 (every edge in ≥1 triangle): this sparse
    graph's 4-truss is empty at every test scale, so k=3 keeps the
    registry entry non-degenerate; brute-parity tests cover k=3..5.
    Iterative peeling, per-round support via the
    degree-oriented wedge enumeration; rows-only registry entry (the
    fixpoint is not SQL-expressible) — its real oracle is the
    brute-force peeling parity in tests/test_graph_properties.py."""
    from .functions.graphops import ktruss

    edges = _part_strong_edges(sf_dir)
    return ktruss(edges, k=k,
                  num_partitions=_join_parts(sf_dir)).sort(["u", "v"])


def emb_dim_stats(sf_dir: str):
    """Per-DIMENSION statistics of the embedding list column — the
    list-column (UNNEST WITH ORDINALITY) shape: n / sum / min / max of
    each coordinate in exact micro-units (pc.round
    half_towards_infinity == DuckDB round(); float32→float64 widening
    identical on both engines). Each batch reshapes its fixed-width
    lists to an (n, d) matrix and emits ONE d-row partial — only
    d × #blocks rows ever shuffle, never element rows (the SQL oracle's
    UNNEST explodes n·d rows; the Ray plan never does)."""
    emb = read_table(sf_dir, "embeddings", columns=["embedding"])

    out_schema = pa.schema([("dim", pa.int64()), ("n", pa.int64()),
                            ("s", pa.int64()), ("mn", pa.int64()),
                            ("mx", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        lens = pc.list_value_length(col).to_numpy()
        if len(lens) == 0:
            return out_schema.empty_table()
        d = int(lens[0])
        assert (lens == d).all(), "ragged embedding widths"
        vals = pc.cast(col.flatten(), pa.float64())
        micro = pc.cast(pc.round(pc.multiply(vals, 1e6),
                                 round_mode="half_towards_infinity"),
                        pa.int64()).to_numpy().reshape(-1, d)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "n": pa.array(np.full(d, micro.shape[0], np.int64)),
            "s": pa.array(micro.sum(axis=0)),
            "mn": pa.array(micro.min(axis=0)),
            "mx": pa.array(micro.max(axis=0))}).cast(out_schema)

    return (emb.map_batches(partial, batch_format="pyarrow")
            .groupby("dim")
            .aggregate(Sum("n", alias_name="n_vecs"),
                       Sum("s", alias_name="sum_micro"),
                       Min("mn", alias_name="min_micro"),
                       Max("mx", alias_name="max_micro"))
            .sort("dim"))


_EMB_DIM_STATS_SQL = """
WITH x AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                       AS BIGINT) AS m
           FROM embeddings)
SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(m) AS BIGINT) AS sum_micro,
       CAST(MIN(m) AS BIGINT) AS min_micro,
       CAST(MAX(m) AS BIGINT) AS max_micro
FROM x GROUP BY dim ORDER BY dim
"""


def part_name_resolution(sf_dir: str):
    """END-TO-END entity resolution over surface forms: the blocked
    Jaro–Winkler match join (part_jw_name_pairs, θ=0.85) supplies the
    match edges, connected-components min-label propagation
    (stages/canonicalize.py — the flagship's Pregel CC) canonicalizes
    transitively (A≈B, B≈C ⇒ {A,B,C} one entity even when A≉C), and
    every distinct name maps to its component's lexicographic-min name
    (singletons map to themselves). The full record-linkage pipeline —
    block → score → cluster → canonicalize — as one composable query;
    work is vocab-sized at every stage. SQL oracle: the identical JW
    edge predicate fed to a recursive min-label CTE."""
    from .stages.canonicalize import connected_components_distributed

    pairs = part_jw_name_pairs(sf_dir)
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t["name_a"], "dst": t["name_b"]}),
        batch_format="pyarrow")
    labels = connected_components_distributed(edges)

    part = read_table(sf_dir, "part", columns=["p_name"])
    names = part.groupby("p_name").aggregate(Count(alias_name="_n"))

    mem = pa.schema([("name", pa.string()), ("canon", pa.string()),
                     ("part", pa.int64()), ("side", pa.int8())])

    def _npart(t: pa.Table, col: str) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.Series(t[col].to_pandas()), index=False) % 16
        return pa.array(h.to_numpy(), pa.int64())

    def tag_name(t: pa.Table) -> pa.Table:
        if "p_name" not in t.column_names:
            return mem.empty_table()
        n = len(t)
        return pa.table({"name": t["p_name"],
                         "canon": pa.nulls(n, pa.string()),
                         "part": _npart(t, "p_name"),
                         "side": pa.array(np.zeros(n, np.int8), pa.int8())}
                        ).cast(mem)

    def tag_label(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({"name": t["node"], "canon": t["label"],
                         "part": _npart(t, "node"),
                         "side": pa.array(np.ones(n, np.int8), pa.int8())}
                        ).cast(mem)

    out_schema = pa.schema([("name", pa.string()), ("canon", pa.string())])

    def merge(part_t: pa.Table) -> pa.Table:
        base = part_t.filter(pc.equal(part_t["side"], 0))
        lab = part_t.filter(pc.equal(part_t["side"], 1))
        if base.num_rows == 0:
            return out_schema.empty_table()
        lmap = dict(zip(lab["name"].to_pylist(), lab["canon"].to_pylist()))
        nm = base["name"].to_pylist()
        return pa.table({"name": nm,
                         "canon": [lmap.get(x, x) for x in nm]}
                        ).cast(out_schema)

    return (names.map_batches(tag_name, batch_format="pyarrow")
            .union(labels.map_batches(tag_label, batch_format="pyarrow"))
            .groupby("part").map_groups(merge, batch_format="pyarrow")
            .sort("name"))


_PART_NAME_RESOLUTION_SQL = """
WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
e AS (SELECT a.p_name u, b.p_name v
      FROM n a JOIN n b
        ON a.p_name < b.p_name
       AND split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
       AND jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85),
sym AS (SELECT u AS mid, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
reach(node, lbl) AS (
    SELECT p_name, p_name FROM n
    UNION
    SELECT s.nbr, r.lbl FROM reach r JOIN sym s ON s.mid = r.node
    WHERE r.lbl < s.nbr
)
SELECT node AS name, MIN(lbl) AS canon FROM reach GROUP BY node
ORDER BY name
"""


def events_trimmed_mean(sf_dir: str, trim_pct: int = 5):
    """Grouped 5 %-TRIMMED mean components per event type — the robust
    location estimator between mean and median: drop the lowest and
    highest ⌊n·5/100⌋ values by count, report the kept count and exact
    integer cents sum (mean = sum_cents / n_kept / 100, no float
    crosses the engines). Scale shape: the shuffle carries only the
    per-(type, cents) DISTINCT-VALUE histogram (domain-bounded, not
    corpus-bounded); each type's trim is interval arithmetic over its
    histogram in one map_groups task — boundary ties need no
    tie-break because trimming by COUNT keeps the same multiset
    whichever equal copies are dropped."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def to_hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0),
                                 round_mode="half_towards_infinity"),
                        pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "cents": cents}) \
            .group_by(["event_type", "cents"]).aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "cents", "c"])

    hist = (ev.map_batches(to_hist, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("c", alias_name="cnt")))

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n_kept", pa.int64()),
                            ("sum_cents", pa.int64())])

    def trim(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("cents")
        c = g["cnt"].to_numpy(np.int64)
        vals = g["cents"].to_numpy(np.int64)
        n = int(c.sum())
        k = n * trim_pct // 100
        starts = np.concatenate([[0], np.cumsum(c)[:-1]])
        kept = np.minimum(starts + c, n - k) - np.maximum(starts, k)
        kept = np.maximum(kept, 0)
        return pa.table({
            "event_type": [str(g["event_type"].iloc[0])],
            "n_kept": [int(kept.sum())],
            "sum_cents": [int((vals * kept).sum())]}).cast(out_schema)

    return (hist.groupby("event_type")
            .map_groups(trim, batch_format="pandas")
            .sort("event_type"))


_EVENTS_TRIMMED_MEAN_SQL = """
WITH v AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
r AS (SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM r
WHERE rn > (n * 5) // 100 AND rn <= n - (n * 5) // 100
GROUP BY event_type ORDER BY event_type
"""


def cust_supp_balance_band(sf_dir: str, band_cents: int = 1000):
    """BAND JOIN (the |x − y| ≤ ε non-equi join Ray Data lacks):
    customers × suppliers whose account balances agree within $10
    (a $1 band is empty at sf0.001 — the width keeps every test scale
    non-degenerate).
    Physical plan: bucket both sides by ⌊cents/ε⌋ — a row can only
    match rows in its own or adjacent buckets, so the SMALL side
    replicates to 3 buckets and the large side ships once; each bucket
    hash-partitions independently and verifies |diff| ≤ ε exactly with
    one vectorized two-pointer sweep (sort + searchsorted), never a
    per-bucket cross product. Output pairs are emitted only from the
    large side's home bucket ⇒ no dedup pass needed."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey",
                                                   "c_acctbal"])
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey",
                                                   "s_acctbal"])
    eps = band_cents

    def c_rows(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"]).to_numpy()
        b = np.floor_divide(cents, eps)
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "key": t["c_custkey"],
                         "cents": pa.array(cents, pa.int64())})

    def s_rows(t: pa.Table) -> pa.Table:
        cents = _cents(t["s_acctbal"]).to_numpy()
        b = np.floor_divide(cents, eps)
        return pa.table({
            "bucket": pa.array(np.concatenate([b - 1, b, b + 1]),
                               pa.int64()),
            "key": pa.array(np.tile(
                t["s_suppkey"].to_numpy(zero_copy_only=False), 3),
                pa.int64()),
            "cents": pa.array(np.tile(cents, 3), pa.int64())})

    mem = pa.schema([("bucket", pa.int64()), ("key", pa.int64()),
                     ("cents", pa.int64()), ("side", pa.int8())])

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            return t.append_column(
                "side", pa.array(np.full(n, side, np.int8), pa.int8())) \
                .cast(mem)
        return fn

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("s_suppkey", pa.int64()),
                            ("diff_cents", pa.int64())])

    def sweep(g: pd.DataFrame) -> pa.Table:
        c = g[g["side"] == 0].sort_values(["cents", "key"])
        s = g[g["side"] == 1].sort_values(["cents", "key"])
        if len(c) == 0 or len(s) == 0:
            return out_schema.empty_table()
        cv = c["cents"].to_numpy()
        sv = s["cents"].to_numpy()
        lo = np.searchsorted(sv, cv - eps, side="left")
        hi = np.searchsorted(sv, cv + eps, side="right")
        cnt = hi - lo
        if cnt.sum() == 0:
            return out_schema.empty_table()
        ci = np.repeat(np.arange(len(c)), cnt)
        si = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)
                             if b > a])
        ck = c["key"].to_numpy()[ci]
        sk = s["key"].to_numpy()[si]
        dd = cv[ci] - sv[si]
        return pa.table({"c_custkey": pa.array(ck, pa.int64()),
                         "s_suppkey": pa.array(sk, pa.int64()),
                         "diff_cents": pa.array(dd, pa.int64())}
                        ).cast(out_schema)

    both = (cust.map_batches(c_rows, batch_format="pyarrow")
            .map_batches(tag(0), batch_format="pyarrow")
            .union(supp.map_batches(s_rows, batch_format="pyarrow")
                   .map_batches(tag(1), batch_format="pyarrow")))
    # schema seed: a fully-empty match set must still carry the output
    # columns (an all-empty map_groups yields a schemaless Dataset)
    seed = ray.data.from_arrow(out_schema.empty_table())
    return (both.groupby("bucket")
            .map_groups(sweep, batch_format="pandas")
            .union(seed)
            .sort(["c_custkey", "s_suppkey"]))


_CUST_SUPP_BAND_SQL = """
WITH c AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) cc
           FROM customer),
s AS (SELECT s_suppkey, CAST(round(s_acctbal * 100) AS BIGINT) sc
      FROM supplier)
SELECT c_custkey, s_suppkey, CAST(cc - sc AS BIGINT) AS diff_cents
FROM c JOIN s ON ABS(cc - sc) <= 1000
ORDER BY c_custkey, s_suppkey
"""


def orders_revenue_drawdown(sf_dir: str):
    """Maximum DRAWDOWN of the daily order-revenue series (the
    peak-to-trough risk statistic): dd(t) = max_{s≤t} v(s) − v(t),
    reported as (trough_day, max_drawdown_cents) with the EARLIEST day
    achieving the max (deterministic). Fact rows collapse through
    per-batch (day → cents) combiners to a calendar-bounded series;
    the running-max scan is one map_groups task over ≤ #days rows."""
    ords = read_table(sf_dir, "orders", columns=["o_orderdate",
                                                 "o_totalprice"])

    def daily(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["o_orderdate"], unit="day"),
                      pa.timestamp("us"))
        cents = _cents(t["o_totalprice"])
        return pa.table({"day": day, "cents": cents}) \
            .group_by("day").aggregate([("cents", "sum")]) \
            .rename_columns(["day", "cents"])

    series = (ords.map_batches(daily, batch_format="pyarrow")
              .groupby("day").aggregate(Sum("cents", alias_name="rev")))

    out_schema = pa.schema([("trough_day", pa.timestamp("us")),
                            ("max_drawdown_cents", pa.int64())])

    def scan(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("day")
        v = g["rev"].to_numpy(np.int64)
        dd = np.maximum.accumulate(v) - v
        best = int(dd.max())
        i = int(np.argmax(dd))              # first occurrence = earliest
        return pa.table({"trough_day": pa.array([g["day"].iloc[i]],
                                                pa.timestamp("us")),
                         "max_drawdown_cents": [best]}).cast(out_schema)

    def const_key(t: pa.Table) -> pa.Table:
        return t.append_column("_k", pa.array([0] * t.num_rows, pa.int8()))

    return (series.map_batches(const_key, batch_format="pyarrow")
            .groupby("_k").map_groups(scan, batch_format="pandas"))


_ORDERS_DRAWDOWN_SQL = """
WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
                      SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
               FROM orders GROUP BY 1),
dd AS (SELECT day,
              MAX(rev) OVER (ORDER BY day) - rev AS d
       FROM daily)
SELECT MIN(day) AS trough_day,
       CAST(MAX(d) AS BIGINT) AS max_drawdown_cents
FROM dd WHERE d = (SELECT MAX(d) FROM dd)
"""


def docs_compaction_plan(sf_dir: str, target_bytes: int = 1 << 14):
    """Small-file compaction plan over the documents corpus treated as
    a file manifest (file = doc, size = utf8 byte length):
    first-fit-decreasing packing into 16 KiB bins (sized so every
    test scale produces a multi-bin plan; a real table-maintenance run
    passes its format's target, e.g. 512 MiB)
    (functions/partitions.py ``compaction_plan``), reported per bin as
    (bin_id, n_files, total_bytes). The manifest — one row per FILE —
    is the only thing that ever reaches the sequential FFD task;
    rows-only registry entry (FFD is not SQL-expressible), its real
    oracle is the pure-Python FFD parity + packing invariants in
    tests/test_new_ops.py."""
    from .functions.partitions import compaction_plan

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def manifest(t: pa.Table) -> pa.Table:
        nbytes = pc.binary_length(
            pc.cast(t["text"], pa.binary())) if t.num_rows else \
            pa.array([], pa.int32())
        return pa.table({"file_id": t["doc_id"],
                         "bytes": pc.cast(nbytes, pa.int64())})

    plan = compaction_plan(docs.map_batches(manifest,
                                            batch_format="pyarrow"),
                           target_bytes=target_bytes)
    return (plan.groupby("bin_id")
            .aggregate(Count(alias_name="n_files"),
                       Sum("bytes", alias_name="total_bytes"))
            .sort("bin_id"))


def events_user_scc(sf_dir: str):
    """Strongly-connected-component size histogram of the DIRECTED
    user-influence graph — edge u→v when some user u fired an event
    type in hour h and v fired the SAME type in hour h+1 (the
    "possibly-influenced" lattice): scc_size → n_sccs. SCC via
    functions/graphops.py ``scc_labels`` (FW–BW label intersection on
    the directed Pregel ring; Tarjan-parity-tested). Edge construction
    is one self-join of the distinct (type, hour, user) table on
    (type, hour+1), co-partitioned by (type, hour) — only distinct
    triples shuffle, never raw events. SQL oracle: recursive
    transitive closure + mutual-reachability min-label (exact — the
    user universe is corpus-bounded, fine at oracle scales)."""
    from .functions.graphops import scc_labels

    ev = read_table(sf_dir, "events", columns=["user_id", "ts",
                                               "event_type"])

    def thu(t: pa.Table) -> pa.Table:
        hour = pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                       pa.timestamp("us"))
        return pa.table({"t": t["event_type"], "h": hour,
                         "user": t["user_id"]}) \
            .group_by(["t", "h", "user"]).aggregate([]) \
            .rename_columns(["t", "h", "user"])

    # materialized: consumed by BOTH the cur and next tag branches —
    # lazily the union would re-execute the distinct pipeline twice.
    # Distinct via hash-bucketed drop_duplicates, NOT groupby(...).
    # aggregate(Count): the triple key is near-unique, and Ray's
    # sort-groupby walks each one-row group in Python (the
    # _part_cooccur_counts pathology — 8× there). Measured r5: keeping
    # this global distinct BEATS skipping it (6.6 s vs 5.3 s at sf0.1)
    # because the raw triple stream is ~3× the distinct set and the
    # make_edges shuffle pays for every duplicate row.
    def _thu_bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["t", "h", "user"], 16, "_p")

    def _thu_distinct(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["t", "h", "user"])
        return pa.table({"t": pa.array(d["t"].astype(str)),
                         "h": pa.array(d["h"]),
                         "user": pa.array(d["user"].to_numpy(np.int64))})

    thu_ds = (ev.map_batches(thu, batch_format="pyarrow")
              .map_batches(_thu_bucket, batch_format="pyarrow")
              .groupby("_p").map_groups(_thu_distinct,
                                        batch_format="pandas")
              ).materialize()

    mem = pa.schema([("t", pa.string()), ("h", pa.timestamp("us")),
                     ("user", pa.int64()), ("side", pa.int8()),
                     ("part", pa.int64())])

    def _th_part(t: pa.Table) -> pa.Array:
        h = pd.util.hash_pandas_object(
            pd.DataFrame({"a": t["t"].to_pandas(),
                          "b": t["h"].to_pandas()}), index=False) % 16
        return pa.array(h.to_numpy(), pa.int64())

    def tag_cur(t: pa.Table) -> pa.Table:
        # pin µs BEFORE hashing: the upstream aggregate narrows h to
        # timestamp[s], and pd.util.hash_pandas_object hashes the raw
        # int64 repr — a [s] row and its [us] successor twin would
        # land in different partitions (seen: 16 of 161 edges built)
        n = len(t)
        out = pa.table({"t": t["t"],
                        "h": pc.cast(t["h"], pa.timestamp("us")),
                        "user": t["user"],
                        "side": pa.array(np.zeros(n, np.int8), pa.int8())})
        return out.append_column("part", _th_part(out)).cast(mem)

    def tag_next(t: pa.Table) -> pa.Table:
        # shift h back one hour: a (t, h+1, v) row must land in the
        # (t, h) partition to meet its predecessors
        n = len(t)
        h_prev = pc.subtract(
            t["h"], pa.scalar(np.timedelta64(3600, "s")))
        out = pa.table({"t": t["t"],
                        "h": pc.cast(h_prev, pa.timestamp("us")),
                        "user": t["user"],
                        "side": pa.array(np.ones(n, np.int8), pa.int8())})
        return out.append_column("part", _th_part(out)).cast(mem)

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def make_edges(g: pd.DataFrame) -> pa.Table:
        us, vs = [], []
        for _, grp in g.groupby(["t", "h"], sort=False):
            a = np.unique(grp.loc[grp["side"] == 0, "user"].to_numpy())
            b = np.unique(grp.loc[grp["side"] == 1, "user"].to_numpy())
            if len(a) == 0 or len(b) == 0:
                continue
            ia, ib = np.meshgrid(a, b, indexing="ij")
            us.append(ia.ravel())
            vs.append(ib.ravel())
        if not us:
            return edge_schema.empty_table()
        uu = np.concatenate(us)
        vv = np.concatenate(vs)
        keep = uu != vv
        # partition-local dedup cuts the distinct shuffle's volume
        pairs_arr = np.unique(np.stack([uu[keep], vv[keep]], axis=1),
                              axis=0)
        return pa.table({"u": pa.array(pairs_arr[:, 0], pa.int64()),
                         "v": pa.array(pairs_arr[:, 1], pa.int64())}
                        ).cast(edge_schema)

    # NO global (u,v)-distinct shuffle here (r5): make_edges already
    # dedupes partition-locally (~10× collapse at sf0.1), and the fused
    # SCCShard.build() drop_duplicates the remainder per shard — the r4
    # version needed global distinct edges for its per-round anti-joins,
    # which the in-actor settle/drop loop replaced.
    edges = (thu_ds.map_batches(tag_cur, batch_format="pyarrow")
             .union(thu_ds.map_batches(tag_next, batch_format="pyarrow"))
             .groupby("part").map_groups(make_edges,
                                         batch_format="pandas"))

    labels = scc_labels(edges, num_partitions=_join_parts(sf_dir,
                                                          "events"))
    sizes = labels.groupby("scc").aggregate(Count(alias_name="scc_size"))
    return (sizes.groupby("scc_size")
            .aggregate(Count(alias_name="n_sccs")).sort("scc_size"))


_EVENTS_USER_SCC_SQL = """
WITH RECURSIVE thu AS (SELECT DISTINCT event_type t,
                                       date_trunc('hour', ts) h,
                                       user_id u
                       FROM events),
e AS (SELECT DISTINCT a.u AS u, b.u AS v
      FROM thu a JOIN thu b
        ON a.t = b.t AND b.h = a.h + INTERVAL 1 HOUR AND a.u <> b.u),
nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
reach(s, d) AS (
    SELECT u, v FROM e
    UNION
    SELECT r.s, e.v FROM reach r JOIN e ON e.u = r.d
),
mutual AS (SELECT r1.s AS node, r1.d AS partner
           FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s),
lab AS (SELECT node, MIN(p) AS scc FROM (
            SELECT n AS node, n AS p FROM nodes
            UNION ALL SELECT node, partner FROM mutual)
        GROUP BY node),
sizes AS (SELECT scc, COUNT(*) AS sz FROM lab GROUP BY scc)
SELECT CAST(sz AS BIGINT) AS scc_size, CAST(COUNT(*) AS BIGINT) AS n_sccs
FROM sizes GROUP BY sz ORDER BY scc_size
"""


def events_user_ewma(sf_dir: str, alpha: float = 0.3):
    """Exponentially weighted moving average per user (α = 0.3,
    adjust=False: y_t = α·x_t + (1−α)·y_{t−1}, y_0 = x_0) — the
    streaming-smoother window no cumsum shortcut exists for; reported
    as the LAST smoothed value per user, 6 dp. Float contract: both
    engines run the identical recurrence in float64 in (ts, event_id)
    order — Ray via pandas ewm (C loop) inside hash-partitioned
    per-user groups, the oracle via a DuckDB recursive CTE walking
    rn → rn+1 — so the doubles agree bit-for-bit before rounding."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts",
                                               "event_id", "value"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_events", pa.int64()),
                            ("ewma_last", pa.float64())])

    def smooth(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        last = g.groupby("user_id", sort=True)["value"] \
            .apply(lambda s: s.ewm(alpha=alpha, adjust=False)
                   .mean().iloc[-1])
        n = g.groupby("user_id", sort=True)["value"].size()
        return pa.table({"user_id": pa.array(last.index.to_numpy(),
                                             pa.int64()),
                         "n_events": pa.array(n.to_numpy(), pa.int64()),
                         "ewma_last": pa.array(np.round(last.to_numpy(),
                                                        6))}
                        ).cast(out_schema)

    return (ev.groupby("user_id")
            .map_groups(smooth, batch_format="pandas")
            .sort("user_id"))


_EVENTS_EWMA_SQL = """
WITH RECURSIVE r AS (SELECT user_id, value,
                            ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS rn,
                            COUNT(*) OVER (PARTITION BY user_id) AS n
                     FROM events),
walk(user_id, rn, n, y) AS (
    SELECT user_id, rn, n, value FROM r WHERE rn = 1
    UNION ALL
    SELECT r.user_id, r.rn, r.n, 0.3 * r.value + 0.7 * w.y
    FROM walk w JOIN r ON r.user_id = w.user_id AND r.rn = w.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       ROUND(y, 6) AS ewma_last
FROM walk WHERE rn = n ORDER BY user_id
"""


def docs_trigram_search(sf_dir: str, pattern: str = "batch stream"):
    """Trigram-INDEX-accelerated substring search (the pg_trgm /
    code-search-engine plan for %LIKE% over a corpus): build character
    -trigram postings once, keep only docs whose trigram set contains
    ALL pattern trigrams (a necessary condition ⇒ lossless filter),
    verify survivors with one vectorized substring count. Output
    (doc_id, n_hits) for matching docs. Scale shape: postings are
    built per batch and pre-filtered against the ≤len(pattern) pattern
    trigrams BEFORE any shuffle (the full index never materializes for
    a single probe — only candidate (doc, trigram) rows move), the
    ALL-trigrams check is one count groupby, and verification touches
    candidates only."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pat = pattern.lower()
    pat_tris = sorted({pat[i:i + 3] for i in range(len(pat) - 2)})
    n_tris = len(pat_tris)

    def cand_rows(t: pa.Table) -> pa.Table:
        ids, tris = [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            s = (txt or "").lower()
            seen = {s[i:i + 3] for i in range(len(s) - 2)}
            for tri in pat_tris:              # pre-filter: probe trigrams only
                if tri in seen:
                    ids.append(did)
                    tris.append(tri)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "tri": pa.array(tris, pa.string())})

    cands = (docs.map_batches(cand_rows, batch_format="pyarrow")
             .groupby("doc_id").aggregate(Count(alias_name="n_tri"))
             .map_batches(lambda t: (t.filter(pc.equal(
                 t["n_tri"], pa.scalar(n_tris, pa.int64())))
                 .select(["doc_id"]) if "doc_id" in t.column_names
                 else pa.schema([("doc_id", pa.int64())]).empty_table()),
                 batch_format="pyarrow"))

    from .functions.joins import semi_join
    hits = semi_join(docs, cands, left_key="doc_id", right_key="doc_id")

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_hits", pa.int64())])

    def verify(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        n = [(txt or "").lower().count(pat) for txt in texts]
        keep = [i for i, c in enumerate(n) if c > 0]
        return pa.table({"doc_id": pa.array([ids[i] for i in keep],
                                            pa.int64()),
                         "n_hits": pa.array([n[i] for i in keep],
                                            pa.int64())}).cast(out_schema)

    seed = ray.data.from_arrow(out_schema.empty_table())
    return (hits.map_batches(verify, batch_format="pyarrow")
            .union(seed).sort("doc_id"))


_DOCS_TRIGRAM_SQL = """
SELECT doc_id,
       CAST((length(lower(text))
             - length(replace(lower(text), 'batch stream', '')))
            // length('batch stream') AS BIGINT) AS n_hits
FROM documents
WHERE contains(lower(text), 'batch stream')
ORDER BY doc_id
"""


def orders_avro_roundtrip(sf_dir: str):
    """Avro Object Container File source/sink
    (sources/avrofile.py — pure-stdlib spec-1.11 codec, zigzag-varint
    longs, deterministic sync marker): orders → one .avro file per
    block under /tmp → ``read_binary_files`` + per-file decode →
    per-status count + exact cents sum. The oracle runs on the
    original parquet view, so equality proves the round-trip lossless
    — the same contract the ORC/IPC/gzip-NDJSON roundtrips carry."""
    import os
    import shutil
    import uuid

    from .sources.avrofile import read_avro, write_avro

    out_dir = f"/tmp/ies_avro_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.avro")
        write_avro(t, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    read_table(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_totalprice"]) \
        .map_batches(write_block, batch_format="pyarrow").sum("n")

    def read_block(t: pa.Table) -> pa.Table:
        return pa.concat_tables([read_avro(raw)
                                 for raw in t["bytes"].to_pylist()])

    back = (ray.data.read_binary_files(out_dir)
            .map_batches(read_block, batch_format="pyarrow"))

    def agg_rows(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "key": t["o_orderkey"],
                         "cents": _cents(t["o_totalprice"])})

    return (back.map_batches(agg_rows, batch_format="pyarrow")
            .groupby("o_orderstatus")
            .aggregate(Count(alias_name="n"),
                       Sum("key", alias_name="sum_key"),
                       Sum("cents", alias_name="sum_cents"))
            .sort("o_orderstatus"))


_ORDERS_AVRO_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def customer_l_diversity(sf_dir: str, l_req: int = 3):
    """l-diversity audit (Machanavajjhala et al. 2007 — the
    k-anonymity follow-up: an equivalence class is safe only if its
    SENSITIVE attribute takes ≥ l distinct values): under
    quasi-identifier (c_nationkey, c_mktsegment) with sensitive
    attribute = account-balance sign+magnitude bucket, report per
    distinct-diversity level how many classes and rows sit there,
    flagging the < l=3 ones. Two bounded groupbys behind per-batch
    distinct combiners — only (class, sensitive-bucket) distinct pairs
    ever shuffle."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_nationkey", "c_mktsegment", "c_acctbal"])

    def pairs(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"]).to_numpy()
        bucket = np.where(cents < 0, -1, cents // 250_000)  # $2 500 bands
        out = pa.table({"nk": t["c_nationkey"], "seg": t["c_mktsegment"],
                        "sens": pa.array(bucket, pa.int64())})
        return out.group_by(["nk", "seg", "sens"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["nk", "seg", "sens", "pn"])

    per_pair = (cust.map_batches(pairs, batch_format="pyarrow")
                .groupby(["nk", "seg", "sens"])
                .aggregate(Sum("pn", alias_name="n")))

    def to_class(t: pa.Table) -> pa.Table:
        return pa.table({"nk": t["nk"], "seg": t["seg"],
                         "one": pa.array(np.ones(len(t), np.int64)),
                         "n": t["n"]})

    per_class = (per_pair.map_batches(to_class, batch_format="pyarrow")
                 .groupby(["nk", "seg"])
                 .aggregate(Sum("one", alias_name="diversity"),
                            Sum("n", alias_name="rows")))

    def hist(t: pa.Table) -> pa.Table:
        d = t["diversity"].to_numpy(zero_copy_only=False)
        r = t["rows"].to_numpy(zero_copy_only=False)
        return pa.table({"diversity": pa.array(d, pa.int64()),
                         "one": pa.array(np.ones(len(d), np.int64)),
                         "rows": pa.array(r, pa.int64()),
                         "below_l": pa.array(
                             (d < l_req).astype(np.int64))})

    return (per_class.map_batches(hist, batch_format="pyarrow")
            .groupby("diversity")
            .aggregate(Sum("one", alias_name="n_classes"),
                       Sum("rows", alias_name="n_rows"),
                       Max("below_l", alias_name="below_l"))
            .sort("diversity"))


_CUSTOMER_LDIV_SQL = """
WITH s AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
                  CASE WHEN round(c_acctbal * 100) < 0 THEN -1
                       ELSE CAST(round(c_acctbal * 100) AS BIGINT)
                            // 250000 END AS sens
           FROM customer),
pair AS (SELECT nk, seg, sens, COUNT(*) AS n FROM s GROUP BY 1, 2, 3),
cls AS (SELECT nk, seg, COUNT(*) AS diversity, SUM(n) AS rows_
        FROM pair GROUP BY 1, 2)
SELECT CAST(diversity AS BIGINT) AS diversity,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(rows_) AS BIGINT) AS n_rows,
       CAST(MAX(CASE WHEN diversity < 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS below_l
FROM cls GROUP BY diversity ORDER BY diversity
"""


def events_cdc_apply(sf_dir: str):
    """Changelog COMPACTION with DELETE tombstones (the log-compaction
    / CDC-apply primitive behind every table-format MERGE; the
    tombstone-aware upgrade of events_latest_per_user): the event
    stream is a per-user upsert log where an 'error' event is a DELETE
    tombstone — apply in (ts, event_id) order and emit the final state
    of LIVE keys only (users whose last op is a tombstone vanish, the
    log-compaction semantics plain latest-per-key cannot express).
    Per-key resolution inside hash-partitioned map_groups; output is
    bounded by live keys, not log length."""
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_type", "ts", "event_id",
                             "value"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("last_type", pa.string()),
                            ("last_cents", pa.int64())])

    def apply_log(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        last = g.groupby("user_id", sort=True).tail(1)
        live = last[last["event_type"] != "error"]   # tombstoned keys die
        cents = np.round(live["value"].to_numpy() * 100)
        return pa.table({
            "user_id": pa.array(live["user_id"].to_numpy(np.int64)),
            "last_type": pa.array(live["event_type"].astype(str)),
            "last_cents": pa.array(cents.astype(np.int64))}
        ).cast(out_schema)

    seed = ray.data.from_arrow(out_schema.empty_table())
    return (ev.groupby("user_id")
            .map_groups(apply_log, batch_format="pandas")
            .union(seed).sort("user_id"))


_EVENTS_CDC_APPLY_SQL = """
WITH r AS (SELECT user_id, event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
           FROM events)
SELECT user_id, event_type AS last_type,
       CAST(round(value * 100) AS BIGINT) AS last_cents
FROM r WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id
"""


def part_graph_walks(sf_dir: str, walk_len: int = 4):
    """Deterministic random-walk corpus over the part co-occurrence
    graph (functions/graphops.py ``random_walks`` — the DeepWalk /
    node2vec sequence-generation step): one 4-step hash-driven walk
    per node, reproducible under any layout without shared RNG state.
    Rows-only registry entry; its real oracle is the pure-pandas walk
    replay parity in tests/test_graph_properties.py."""
    from .functions.graphops import random_walks

    edges = _part_strong_edges(sf_dir)
    return random_walks(edges, walk_len=walk_len,
                        num_partitions=_join_parts(sf_dir)).sort("start")


def kg_scc(sf_dir: str):
    """Strongly-connected-component size histogram of the DIRECTED
    knowledge graph (subj_id → obj_id entity edges): the ontology-cycle
    census — reciprocal predicates (see kg_reciprocity) create real
    2-cycles, so the KG is NOT a DAG and SCC is the right notion of
    mutually-entailed entity clusters. Runs functions/graphops.py
    ``scc_labels`` (FW–BW label intersection; string-keyed here —
    min label = lexicographic min entity id). Rows-only (KG tables
    aren't DuckDB views); golden = pure-Python Tarjan over the same
    edge table in tests/test_flagship.py."""
    from .functions.graphops import scc_labels

    edges = _kg_run(sf_dir)["edges"]
    pairs = (edges.map_batches(
        lambda t: pa.table({"u": t["subj_id"], "v": t["obj_id"]})
                    .group_by(["u", "v"]).aggregate([]),
        batch_format="pyarrow")
        .groupby(["u", "v"]).aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["u", "v"]),
                     batch_format="pyarrow"))
    labels = scc_labels(pairs, num_partitions=4)
    sizes = labels.groupby("scc").aggregate(Count(alias_name="scc_size"))
    return (sizes.groupby("scc_size")
            .aggregate(Count(alias_name="n_sccs")).sort("scc_size"))


def docs_feature_hashing(sf_dir: str, n_buckets: int = 64):
    """Hashing-trick featurization (Weinberger et al. 2009 — the
    fixed-dimension bag-of-words every large-scale text classifier
    uses so the feature space never needs a vocabulary broadcast):
    every term maps to bucket = md5(term)[:8] mod 64; output per
    bucket the total term occurrences and exact distinct-term count.
    Per-batch (bucket, term) combiners collapse before the two-level
    distinct shuffle — only (bucket, term) distinct pairs move, never
    term instances."""
    import hashlib

    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["text"])

    def pairs(t: pa.Table) -> pa.Table:
        from collections import Counter
        cnt = Counter()
        for txt in t["text"].to_pylist():
            for term in _TERM_RE.findall((txt or "").lower()):
                cnt[term] += 1
        buckets, terms, counts = [], [], []
        for term, c in cnt.items():
            h = int(hashlib.md5(term.encode()).hexdigest()[:8], 16)
            buckets.append(h % n_buckets)
            terms.append(term)
            counts.append(c)
        return pa.table({"bucket": pa.array(buckets, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "n": pa.array(counts, pa.int64())})

    per_term = (docs.map_batches(pairs, batch_format="pyarrow")
                .groupby(["bucket", "term"])
                .aggregate(Sum("n", alias_name="occ")))

    def to_bucket(t: pa.Table) -> pa.Table:
        return pa.table({"bucket": t["bucket"],
                         "one": pa.array(np.ones(len(t), np.int64)),
                         "occ": t["occ"]})

    return (per_term.map_batches(to_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("one", alias_name="n_terms"),
                       Sum("occ", alias_name="n_occurrences"))
            .sort("bucket"))


_DOCS_FEATURE_HASH_SQL = """
WITH terms AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS term
               FROM documents),
b AS (SELECT ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS bucket,
             term
      FROM terms)
SELECT bucket, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM b GROUP BY bucket ORDER BY bucket
"""


def events_daily_autocorr(sf_dir: str):
    """TS11 — sample autocorrelation of the daily event-count series at
    lags 1–3 (the seasonality screen before picking a forecast model),
    over the DENSIFIED calendar (missing days count 0 — an absent day is
    a real zero, not a gap). The ratio is exact-integer algebra cleared
    of the rational mean: with n days, S = Σx, numerator
    A_k = n²·Σ x_t·x_{t+k} − n·S·(P_k + Q_k) + (n−k)·S² and denominator
    D = n²·Σx² − n·S², acf_k = A_k/D — both engines round the SAME two
    exact ints' quotient to 6 dp, so float summation order can't flip a
    boundary.

    Scale shape: the fact table collapses through a (day → count)
    combiner; the calendar-bounded series (n days) computes on the
    driver — same contract as every daily-series op here."""
    ev = read_table(sf_dir, "events", columns=["ts"])

    def daily(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                    pa.timestamp("us"))
        return (pa.table({"d": d}).group_by("d")
                .aggregate([([], "count_all")])
                .rename_columns(["d", "n"]))

    rows = (ev.map_batches(daily, batch_format="pyarrow")
            .groupby("d").aggregate(Sum("n", alias_name="n")).take_all())
    counts = {r["d"]: int(r["n"]) for r in rows}
    lo, hi = min(counts), max(counts)
    n_days = (hi - lo).days + 1
    x = np.zeros(n_days, dtype=np.int64)
    for d, n in counts.items():
        x[(d - lo).days] = n
    n = int(n_days)
    s = int(x.sum())
    ss = int((x.astype(object) * x).sum())       # bigint-safe
    d_den = n * n * ss - n * s * s
    out_lag, out_acf = [], []
    for k in (1, 2, 3):
        sxy = int((x[:-k].astype(object) * x[k:]).sum())
        pk, qk = int(x[:-k].sum()), int(x[k:].sum())
        a_num = n * n * sxy - n * s * (pk + qk) + (n - k) * s * s
        out_lag.append(k)
        out_acf.append(round(float(a_num) / float(d_den), 6))
    return pa.table({"lag": pa.array(out_lag, pa.int64()),
                     "acf": pa.array(out_acf, pa.float64())})


_EVENTS_AUTOCORR_SQL = """
WITH c AS (SELECT date_trunc('day', ts) AS d,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
b AS (SELECT MIN(d) mn, MAX(d) mx FROM c),
cal AS (SELECT unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY)) AS d
        FROM b),
x AS (SELECT ROW_NUMBER() OVER (ORDER BY cal.d) AS t,
             CAST(COALESCE(c.n, 0) AS HUGEINT) AS v
      FROM cal LEFT JOIN c USING (d)),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(v) AS s,
               SUM(v * v) AS ss
        FROM x),
lags AS (SELECT CAST(k AS HUGEINT) AS k
         FROM (VALUES (1), (2), (3)) t(k)),
pairs AS (SELECT lags.k, SUM(a.v * bb.v) AS sxy,
                 SUM(a.v) AS pk, SUM(bb.v) AS qk
          FROM lags JOIN x a ON TRUE
                    JOIN x bb ON bb.t = a.t + lags.k
          GROUP BY 1)
SELECT CAST(k AS BIGINT) AS lag,
       ROUND(CAST(n * n * sxy - n * s * (pk + qk) + (n - k) * s * s
                  AS DOUBLE)
             / CAST(n * n * ss - n * s * s AS DOUBLE), 6) AS acf
FROM pairs, tot ORDER BY lag
"""


def basket_lift_rules(sf_dir: str):
    """G64 — association-rule mining over order baskets (Agrawal
    et al. 1993 support/confidence/lift, the classic co-occurrence
    recommender readout): for part pairs co-ordered in ≥ 2 baskets,
    lift = N·n_uv/(n_u·n_v) and confidence u→v = n_uv/n_u, both as
    EXACT floor-ppm integers (no float boundary crosses engines);
    top 20 by (lift_ppm desc, pa, pb).

    Scale shape: pair counts come from the memoized co-occurrence
    combiner ([[_part_cooccur_counts]] — the quadratic step is bounded
    per basket and partition-local); per-part basket counts are one
    narrow groupby; the two attaches ride auto_join's chooser; only the
    k winners reach the driver."""
    from .functions.joins import auto_join

    counted = _part_cooccur_counts(sf_dir)
    pairs = counted.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["n"], pa.scalar(2, pa.int64()))),
        batch_format="pyarrow")

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_partkey"])

    # distinct (part, basket) via hash-bucketed drop_duplicates — the
    # (pk, ok) key is near-unique, and a sort-groupby would walk every
    # 1-row group in Python (the _part_cooccur_counts pathology)
    def dist(t: pa.Table) -> pa.Table:
        d = (pa.table({"pk": t["l_partkey"], "ok": t["l_orderkey"]})
             .group_by(["pk", "ok"]).aggregate([])
             .rename_columns(["pk", "ok"]))
        h = pd.util.hash_pandas_object(
            pd.DataFrame({"a": d["pk"].to_pandas(),
                          "b": d["ok"].to_pandas()}), index=False) % 16
        return d.append_column("_p", pa.array(h.to_numpy(), pa.int64()))

    def drop_dup(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["pk", "ok"])
        return pa.table({"pk": pa.array(d["pk"].to_numpy(np.int64)),
                         "ok": pa.array(d["ok"].to_numpy(np.int64))})

    po = (li.map_batches(dist, batch_format="pyarrow")
          .groupby("_p").map_groups(drop_dup, batch_format="pandas")
          ).materialize()
    part_n = po.groupby("pk").aggregate(Count(alias_name="nb"))

    def ok_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t["ok"].to_pandas()), index=False) % 16
        return pa.table({"ok": t["ok"],
                         "_p": pa.array(h.to_numpy(), pa.int64())})

    n_baskets = int(po.map_batches(ok_bucket, batch_format="pyarrow")
                    .groupby("_p")
                    .map_groups(lambda g: pa.table(
                        {"ok": pa.array(g["ok"].unique())}),
                        batch_format="pandas").count())

    na = part_n.map_batches(
        lambda t: pa.table({"ka": t["pk"], "n_a": t["nb"]}),
        batch_format="pyarrow")
    nb = part_n.map_batches(
        lambda t: pa.table({"kb": t["pk"], "n_b": t["nb"]}),
        batch_format="pyarrow")
    j = auto_join(pairs, na, left_key="pa", right_key="ka",
                  right_cols=["n_a"])
    j = auto_join(j, nb, left_key="pb", right_key="kb",
                  right_cols=["n_b"])

    def score(t: pa.Table) -> pa.Table:
        nuv = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nu = t["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = t["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lift = (n_baskets * nuv * 1_000_000) // (nu * nv)
        conf = (nuv * 1_000_000) // nu
        return pa.table({"pa": t["pa"], "pb": t["pb"],
                         "n_uv": pa.array(nuv, pa.int64()),
                         "lift_ppm": pa.array(lift, pa.int64()),
                         "conf_ppm": pa.array(conf, pa.int64())})

    return (j.map_batches(score, batch_format="pyarrow")
            .sort(["lift_ppm", "pa", "pb"],
                  descending=[True, False, False])
            .limit(20))


_BASKET_LIFT_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS HUGEINT) AS nbsk FROM d),
pn AS (SELECT l_partkey, CAST(COUNT(*) AS HUGEINT) AS np
       FROM d GROUP BY 1),
e AS (SELECT a.l_partkey u, b.l_partkey v,
             CAST(COUNT(*) AS HUGEINT) AS nuv
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT u AS pa, v AS pb, CAST(nuv AS BIGINT) AS n_uv,
       CAST(nb.nbsk * nuv * 1000000 // (pu.np * pv.np) AS BIGINT)
           AS lift_ppm,
       CAST(nuv * 1000000 // pu.np AS BIGINT) AS conf_ppm
FROM e JOIN pn pu ON pu.l_partkey = e.u
       JOIN pn pv ON pv.l_partkey = e.v, nb
ORDER BY lift_ppm DESC, pa, pb LIMIT 20
"""


def orders_isotonic_daily(sf_dir: str):
    """TS12 — isotonic (non-decreasing) regression of daily order
    revenue by calendar day via Pool-Adjacent-Violators
    (functions/stats.py ``pava_isotonic``): the monotone-trend
    projection used for calibration curves and trend tests. EXACT
    integer end-to-end — daily cents from a combiner groupby, PAVA
    pools compared by bigint cross-multiplication, fitted block means
    rendered as round-half-up micro-cents. Rows-only: PAVA's pooling
    recursion has no SQL form; oracles are a brute-force O(n²)
    reference parity + monotonicity/sum-preservation/projection
    properties (tests/test_new_ops.py).

    Scale shape: the fact table collapses through a (day → Σcents)
    combiner; the calendar-bounded series fits on the driver — the
    distributed work IS the reduce."""
    from .functions.stats import pava_isotonic

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def daily(t: pa.Table) -> pa.Table:
        return (pa.table({"d": t["o_orderdate"],
                          "cents": _cents(t["o_totalprice"])})
                .group_by("d").aggregate([("cents", "sum")])
                .rename_columns(["d", "cents"]))

    rows = (orders.map_batches(daily, batch_format="pyarrow")
            .groupby("d").aggregate(Sum("cents", alias_name="cents"))
            .take_all())
    rows.sort(key=lambda r: r["d"])
    days = [r["d"] for r in rows]
    sums = np.array([int(r["cents"]) for r in rows], dtype=object)
    ones = np.ones(len(rows), dtype=object)
    bs, bc = pava_isotonic(sums, ones)
    fitted = [(2 * 1_000_000 * s + c) // (2 * c)
              for s, c in zip(bs, bc)]
    return pa.table({
        "d": pa.array(days),
        "fitted_micro": pa.array([int(f) for f in fitted], pa.int64())})


def events_value_ks(sf_dir: str):
    """G67 — two-sample Kolmogorov–Smirnov statistic between the value
    distributions of the two most frequent event types (the
    distribution-shift test that needs no binning choice): D =
    max_v |F_a(v) − F_b(v)| over the pooled support. EXACT integer
    end-to-end — D's numerator is max |cum_a·n_b − cum_b·n_a| over
    per-cents cumulative counts from the two-pass distributed prefix
    sum ([[orders_global_rank]]'s plan), reported as floor-ppm.

    Scale shape: events collapse through a (cents, type) count
    combiner to the distinct-value table; two skinny prefix-sum passes;
    one Max aggregate. Nothing value-domain-sized reaches the driver."""
    from .functions.rank import global_running_sum

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    top2 = sorted(ev.groupby("event_type")
                  .aggregate(Count(alias_name="n")).take_all(),
                  key=lambda r: (-int(r["n"]), r["event_type"]))[:2]
    ta, tb = top2[0]["event_type"], top2[1]["event_type"]
    na, nb = int(top2[0]["n"]), int(top2[1]["n"])

    def cells(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"],
                     value_set=pa.array([ta, tb], pa.string()))
        t = t.filter(m)
        isa = pc.cast(pc.equal(t["event_type"], pa.scalar(ta)),
                      pa.int64())
        return (pa.table({"cents": _cents(t["value"]), "ca": isa,
                          "cb": pc.subtract(pa.scalar(1, pa.int64()),
                                            isa)})
                .group_by("cents")
                .aggregate([("ca", "sum"), ("cb", "sum")])
                .rename_columns(["cents", "ca", "cb"]))

    counts = (ev.map_batches(cells, batch_format="pyarrow")
              .groupby("cents")
              .aggregate(Sum("ca", alias_name="ca"),
                         Sum("cb", alias_name="cb")).materialize())
    cum = global_running_sum(counts, "ca", order_by=["cents"],
                             out_col="cum_a")
    cum = global_running_sum(cum, "cb", order_by=["cents"],
                             out_col="cum_b")

    def diff(t: pa.Table) -> pa.Table:
        a = t["cum_a"].to_numpy(zero_copy_only=False)
        b = t["cum_b"].to_numpy(zero_copy_only=False)
        return pa.table({"num": pa.array(np.abs(a * nb - b * na),
                                         pa.int64())})

    ks_num = int(cum.map_batches(diff, batch_format="pyarrow")
                 .max("num") or 0)
    return pa.table({
        "type_a": pa.array([ta], pa.string()),
        "type_b": pa.array([tb], pa.string()),
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "ks_ppm": pa.array([ks_num * 1_000_000 // (na * nb)],
                           pa.int64())})


_EVENTS_KS_SQL = """
WITH ranked AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                                          event_type) AS rk
                FROM events GROUP BY 1),
ab AS (SELECT MAX(CASE WHEN rk = 1 THEN event_type END) AS ta,
              MAX(CASE WHEN rk = 2 THEN event_type END) AS tb,
              CAST(MAX(CASE WHEN rk = 1 THEN n END) AS HUGEINT) AS na,
              CAST(MAX(CASE WHEN rk = 2 THEN n END) AS HUGEINT) AS nb
       FROM ranked WHERE rk <= 2),
c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN event_type = ab.ta THEN 1 ELSE 0 END)
                  AS HUGEINT) AS ca,
             CAST(SUM(CASE WHEN event_type = ab.tb THEN 1 ELSE 0 END)
                  AS HUGEINT) AS cb
      FROM events, ab WHERE event_type IN (ab.ta, ab.tb)
      GROUP BY 1),
cum AS (SELECT SUM(ca) OVER (ORDER BY cents) AS cum_a,
               SUM(cb) OVER (ORDER BY cents) AS cum_b
        FROM c)
SELECT ab.ta AS type_a, ab.tb AS type_b,
       CAST(ab.na AS BIGINT) AS n_a, CAST(ab.nb AS BIGINT) AS n_b,
       CAST(MAX(ABS(cum_a * ab.nb - cum_b * ab.na)) * 1000000
            // (ab.na * ab.nb) AS BIGINT) AS ks_ppm
FROM cum, ab GROUP BY ab.ta, ab.tb, ab.na, ab.nb
"""


def orders_theilsen_trend(sf_dir: str):
    """TS13 — Theil–Sen robust trend of daily order revenue: the median
    of all pairwise slopes (y_j−y_i)/(d_j−d_i), the breakdown-resistant
    alternative to OLS (Theil 1950, Sen 1968). Slopes are IEEE-identical
    doubles in both engines (same integer cents / integer day deltas),
    so the sorted multiset matches element-for-element and the median is
    picked by the SAME fixed index (m−1)//2 — no float-summation-order
    hazard anywhere; 6 dp.

    Scale shape: the fact table collapses through a (day → Σcents)
    combiner; the O(n²)-pairs step runs on the calendar-bounded series
    driver-side (n days → n(n−1)/2 slopes, ~600k at a 3-year span) —
    the same contract as every daily-series op here."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def daily(t: pa.Table) -> pa.Table:
        return (pa.table({"d": t["o_orderdate"],
                          "cents": _cents(t["o_totalprice"])})
                .group_by("d").aggregate([("cents", "sum")])
                .rename_columns(["d", "cents"]))

    rows = (orders.map_batches(daily, batch_format="pyarrow")
            .groupby("d").aggregate(Sum("cents", alias_name="cents"))
            .take_all())
    rows.sort(key=lambda r: r["d"])
    d = np.array([r["d"].toordinal() for r in rows], dtype=np.int64)
    y = np.array([int(r["cents"]) for r in rows], dtype=np.int64)
    i, j = np.triu_indices(len(d), k=1)
    slopes = (y[j] - y[i]).astype(np.float64) \
        / (d[j] - d[i]).astype(np.float64)
    slopes.sort()
    med = float(slopes[(len(slopes) - 1) // 2])
    return pa.table({
        "n_days": pa.array([len(d)], pa.int64()),
        "n_pairs": pa.array([len(slopes)], pa.int64()),
        "ts_slope": pa.array([round(med, 6)], pa.float64())})


_ORDERS_THEILSEN_SQL = """
WITH s AS (SELECT o_orderdate AS d,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS y
           FROM orders GROUP BY 1),
p AS (SELECT CAST(b.y - a.y AS DOUBLE)
             / CAST(date_diff('day', a.d, b.d) AS DOUBLE) AS sl
      FROM s a JOIN s b ON b.d > a.d),
q AS (SELECT sl, ROW_NUMBER() OVER (ORDER BY sl) AS rn,
             COUNT(*) OVER () AS m
      FROM p)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_days,
       CAST(MAX(m) AS BIGINT) AS n_pairs,
       ROUND(MAX(CASE WHEN rn = (m - 1) // 2 + 1 THEN sl END), 6)
           AS ts_slope
FROM q
"""


def customer_t_closeness(sf_dir: str):
    """P3 — t-closeness privacy audit (Li et al. 2007, the successor to
    [[customer_k_anonymity]]/[[customer_l_diversity]]): per
    quasi-identifier group (mktsegment), the total-variation distance
    between the group's sensitive-attribute distribution (account
    balance in $1000 bands) and the global distribution — a group
    whose balances skew far from the corpus leaks membership signal.
    EXACT integers: TV_g = Σ_band |c_gb·N − C_b·n_g| / (2·n_g·N)
    reported as floor-ppm; bands from offset integer division (no
    float boundary, and the offset keeps `//` == floor on negative
    balances in both engines).

    Scale shape: one (segment, band) count combiner; the band×segment
    contingency (≤ bands·segments rows) computes driver-side."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_mktsegment", "c_acctbal"])

    def cells(t: pa.Table) -> pa.Table:
        cents = _cents(t["c_acctbal"])
        band = pc.divide(pc.add(cents, pa.scalar(100_000, pa.int64())),
                         pa.scalar(100_000, pa.int64()))
        return (pa.table({"seg": t["c_mktsegment"], "band": band})
                .group_by(["seg", "band"])
                .aggregate([([], "count_all")])
                .rename_columns(["seg", "band", "n"]))

    rows = (cust.map_batches(cells, batch_format="pyarrow")
            .groupby(["seg", "band"])
            .aggregate(Sum("n", alias_name="n")).take_all())
    seg_tot: dict = {}
    band_tot: dict = {}
    cell: dict = {}
    for r in rows:
        s, b, n = r["seg"], int(r["band"]), int(r["n"])
        cell[(s, b)] = n
        seg_tot[s] = seg_tot.get(s, 0) + n
        band_tot[b] = band_tot.get(b, 0) + n
    n_tot = sum(seg_tot.values())
    segs, tvs, sizes = [], [], []
    for s in sorted(seg_tot):
        ng = seg_tot[s]
        num = sum(abs(cell.get((s, b), 0) * n_tot - band_tot[b] * ng)
                  for b in sorted(band_tot))
        segs.append(s)
        sizes.append(ng)
        tvs.append(num * 1_000_000 // (2 * ng * n_tot))
    return pa.table({"c_mktsegment": pa.array(segs, pa.string()),
                     "n_customers": pa.array(sizes, pa.int64()),
                     "tv_ppm": pa.array(tvs, pa.int64())})


_CUSTOMER_TCLOSE_SQL = """
WITH c AS (SELECT c_mktsegment AS seg,
                  (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)
                  // 100000 AS band,
                  CAST(COUNT(*) AS HUGEINT) AS n
           FROM customer GROUP BY 1, 2),
st AS (SELECT seg, SUM(n) AS ng FROM c GROUP BY 1),
bt AS (SELECT band, SUM(n) AS cb FROM c GROUP BY 1),
tot AS (SELECT SUM(n) AS nn FROM c),
grid AS (SELECT st.seg, st.ng, bt.band, bt.cb,
                COALESCE(c.n, 0) AS n
         FROM st CROSS JOIN bt
         LEFT JOIN c ON c.seg = st.seg AND c.band = bt.band)
SELECT seg AS c_mktsegment, CAST(MAX(ng) AS BIGINT) AS n_customers,
       CAST(SUM(ABS(n * tot.nn - cb * ng)) * 1000000
            // (2 * MAX(ng) * MAX(tot.nn)) AS BIGINT) AS tv_ppm
FROM grid, tot GROUP BY seg ORDER BY seg
"""


def orders_xml_roundtrip(sf_dir: str):
    """S9 — XML source/sink roundtrip (sources/xmlio.py — pure-stdlib
    row-oriented table codec with an embedded typed schema element):
    orders → one .xml file per block under /tmp → ``read_binary_files``
    + per-file parse → per-status count + exact cents sum. The oracle
    runs on the original parquet view, so equality proves the roundtrip
    lossless — the contract the Avro/ORC/IPC/gzip-NDJSON roundtrips
    carry, extended to the one interchange format legacy enterprise
    feeds still speak."""
    import os
    import shutil
    import uuid

    from .sources.xmlio import read_xml, write_xml

    out_dir = f"/tmp/ies_xml_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.xml")
        write_xml(t, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    read_table(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_totalprice"]) \
        .map_batches(write_block, batch_format="pyarrow").sum("n")

    def read_block(t: pa.Table) -> pa.Table:
        return pa.concat_tables([read_xml(raw)
                                 for raw in t["bytes"].to_pylist()])

    back = (ray.data.read_binary_files(out_dir)
            .map_batches(read_block, batch_format="pyarrow"))

    def agg_rows(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "key": t["o_orderkey"],
                         "cents": _cents(t["o_totalprice"])})

    return (back.map_batches(agg_rows, batch_format="pyarrow")
            .groupby("o_orderstatus")
            .aggregate(Count(alias_name="n_orders"),
                       Sum("key", alias_name="key_sum"),
                       Sum("cents", alias_name="sum_cents"))
            .sort("o_orderstatus"))


_ORDERS_XML_SQL = """
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders GROUP BY 1 ORDER BY 1
"""


def docs_nb_source_model(sf_dir: str):
    """LLM15 — multinomial Naive Bayes source classifier trained and
    self-evaluated over the corpus (the counts-based sibling of the
    logreg quality filter — the classifier family the fastText curation
    recipes start from): classes = ``source``, features = top-K
    bag-of-words (K = 500, the bounded-vocab contract from
    [[docs_unigram_nll]]), Laplace-1 smoothing. EVERYTHING integer at
    the boundaries: log-probs are pre-quantized to micro-nats with
    floor(1e6·ln(r) + 0.5) on IEEE-identical ratios in both engines, so
    per-doc scores are exact int64 sums (no float summation order) and
    argmax (score desc, class asc) is deterministic. Returns the
    self-prediction confusion matrix (source, predicted, n_docs).

    Scale shape: pass A = the distributed vocab combiner (top-K only);
    pass B = (term, class) tf sums over vocab terms (K×C rows to the
    driver — bounded); pass C = ONE streaming score-and-predict pass
    (each doc's tf lives inside its batch; the K×C log-prob matrix is
    a ray.put broadcast); only the C×C confusion shuffles."""
    import math as _math

    from .functions.terms import _TERM_RE, top_terms

    K = 500
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text"],
                      rows_per_block=500)
    vocab_rows = top_terms(docs, K).take_all()
    vocab = [r["term"] for r in vocab_rows]
    vidx = {t: i for i, t in enumerate(vocab)}

    cls_rows = sorted(docs.groupby("source")
                      .aggregate(Count(alias_name="nd")).take_all(),
                      key=lambda r: r["source"])
    classes = [r["source"] for r in cls_rows]
    ndocs_c = np.array([int(r["nd"]) for r in cls_rows], np.int64)
    n_total = int(ndocs_c.sum())
    cidx = {c: j for j, c in enumerate(classes)}

    vref = ray.put(vidx)

    def tf_cells(t: pa.Table) -> pa.Table:
        vd = ray.get(vref)
        terms, srcs, tfs = [], [], []
        for txt, src in zip(t["text"].to_pylist(),
                            t["source"].to_pylist()):
            cnt: dict = {}
            for w in _TERM_RE.findall((txt or "").lower()):
                if w in vd:
                    cnt[w] = cnt.get(w, 0) + 1
            for w, n in cnt.items():
                terms.append(w)
                srcs.append(src)
                tfs.append(n)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "source": pa.array(srcs, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    nwc_rows = (docs.map_batches(tf_cells, batch_format="pyarrow")
                .groupby(["term", "source"])
                .aggregate(Sum("tf", alias_name="n")).take_all())
    nwc = np.zeros((K, len(classes)), dtype=np.int64)
    for r in nwc_rows:
        nwc[vidx[r["term"]], cidx[r["source"]]] = int(r["n"])
    nct = nwc.sum(axis=0)
    lp = np.empty((K, len(classes)), dtype=np.int64)
    for j in range(len(classes)):
        for i in range(K):
            r = (int(nwc[i, j]) + 1) / float(int(nct[j]) + K)
            lp[i, j] = _math.floor(1_000_000 * _math.log(r) + 0.5)
    prior = np.array([_math.floor(1_000_000 * _math.log(
        int(ndocs_c[j]) / float(n_total)) + 0.5)
        for j in range(len(classes))], np.int64)

    lref = ray.put((lp, prior, classes))

    def predict(t: pa.Table) -> pa.Table:
        vd = ray.get(vref)
        lpm, pri, cls = ray.get(lref)
        srcs, preds = [], []
        for txt, src in zip(t["text"].to_pylist(),
                            t["source"].to_pylist()):
            score = pri.copy()
            for w in _TERM_RE.findall((txt or "").lower()):
                i = vd.get(w)
                if i is not None:
                    score = score + lpm[i]
            best = int(np.argmax(score))   # ties → first == class asc
            srcs.append(src)
            preds.append(cls[best])
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "predicted": pa.array(preds, pa.string())})

    return (docs.map_batches(predict, batch_format="pyarrow")
            .groupby(["source", "predicted"])
            .aggregate(Count(alias_name="n_docs"))
            .sort(["source", "predicted"]))


_DOCS_NB_SQL = """
WITH tok AS (SELECT doc_id, source,
                    unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                        AS term
             FROM documents),
vocab AS (SELECT term FROM tok GROUP BY term
          ORDER BY COUNT(*) DESC, term LIMIT 500),
tf AS (SELECT doc_id, source, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM tok JOIN vocab USING (term) GROUP BY 1, 2, 3),
cls AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ndocs
        FROM documents GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
nwc AS (SELECT c.source AS cls, v.term,
               CAST(COALESCE(SUM(t.tf), 0) AS BIGINT) AS n
        FROM cls c CROSS JOIN vocab v
        LEFT JOIN tf t ON t.source = c.source AND t.term = v.term
        GROUP BY 1, 2),
nc AS (SELECT cls, CAST(SUM(n) AS BIGINT) AS nct FROM nwc GROUP BY 1),
lp AS (SELECT nwc.cls, nwc.term,
              CAST(FLOOR(1000000 * ln(CAST(nwc.n + 1 AS DOUBLE)
                                      / (nc.nct + 500)) + 0.5)
                   AS BIGINT) AS lp
       FROM nwc JOIN nc USING (cls)),
pri AS (SELECT c.source AS cls,
               CAST(FLOOR(1000000 * ln(CAST(c.ndocs AS DOUBLE) / tot.n)
                          + 0.5) AS BIGINT) AS pr
        FROM cls c, tot),
ds AS (SELECT d.doc_id, d.source, pri.cls,
              pri.pr + CAST(COALESCE(SUM(t.tf * lp.lp), 0) AS BIGINT)
                  AS score
       FROM documents d CROSS JOIN pri
       LEFT JOIN tf t ON t.doc_id = d.doc_id
       LEFT JOIN lp ON lp.cls = pri.cls AND lp.term = t.term
       GROUP BY 1, 2, 3, pri.pr),
pick AS (SELECT source, cls,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, cls) AS rk
         FROM ds)
SELECT source, cls AS predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pick WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_dsir_weights(sf_dir: str):
    """LLM16 — DSIR importance weights (Xie et al. 2023, Data Selection
    with Importance Resampling): score every document by how much more
    likely its hashed-n-gram profile is under the TARGET domain (lang
    == 'en') than under the raw corpus — log w(d) = Σ_b f_db·(ln p̂_b −
    ln q̂_b) with Laplace-smoothed 64-bucket hashed-unigram models (the
    [[docs_feature_hashing]] bucket map, so no vocabulary broadcast
    ever). Log-ratios are pre-quantized to micro-nats with
    floor(1e6·ln(r)+0.5) on IEEE-identical ratios, so per-doc weights
    are EXACT int64 sums in both engines. Top 20 by (weight desc,
    doc_id).

    Scale shape: two streaming passes — pass 1 folds per-batch bucket
    counts to the ≤64-row two-model table; pass 2 scores each doc
    inside its own batch against the 64-int log-ratio vector (driver
    closure) and only (doc_id, weight) enters the top-k sort."""
    import hashlib
    import math as _math

    from .functions.terms import _TERM_RE

    B = 64
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "text"],
                      rows_per_block=500)

    def _buckets(txt: str) -> "dict[int, int]":
        cnt: dict = {}
        for w in _TERM_RE.findall((txt or "").lower()):
            b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % B
            cnt[b] = cnt.get(b, 0) + 1
        return cnt

    def totals(t: pa.Table) -> pa.Table:
        nt = np.zeros(B, np.int64)
        nr = np.zeros(B, np.int64)
        for txt, lang in zip(t["text"].to_pylist(),
                             t["lang"].to_pylist()):
            for b, c in _buckets(txt).items():
                nr[b] += c
                if lang == "en":
                    nt[b] += c
        return pa.table({"bucket": pa.array(np.arange(B), pa.int64()),
                         "nt": pa.array(nt, pa.int64()),
                         "nr": pa.array(nr, pa.int64())})

    rows = (docs.map_batches(totals, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("nt", alias_name="nt"),
                       Sum("nr", alias_name="nr")).take_all())
    nt = np.zeros(B, np.int64)
    nr = np.zeros(B, np.int64)
    for r in rows:
        nt[int(r["bucket"])] = int(r["nt"])
        nr[int(r["bucket"])] = int(r["nr"])
    st, sr = int(nt.sum()), int(nr.sum())
    lw = np.array([_math.floor(1_000_000 * _math.log(
        ((int(nt[b]) + 1) / float(st + B))
        / ((int(nr[b]) + 1) / float(sr + B))) + 0.5)
        for b in range(B)], np.int64)

    def score(t: pa.Table) -> pa.Table:
        ids, ws = [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            w = 0
            for b, c in _buckets(txt).items():
                w += c * int(lw[b])
            ids.append(did)
            ws.append(w)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dsir_weight": pa.array(ws, pa.int64())})

    return (docs.map_batches(score, batch_format="pyarrow")
            .sort(["dsir_weight", "doc_id"], descending=[True, False])
            .limit(20))


_DOCS_DSIR_SQL = """
WITH tok AS (SELECT doc_id, lang,
                    ('0x' || substr(md5(term), 1, 8))::BIGINT % 64
                        AS bucket
             FROM (SELECT doc_id, lang,
                          unnest(regexp_extract_all(lower(text),
                                                    '[a-z0-9]+')) AS term
                   FROM documents)),
tt AS (SELECT bucket,
              CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS nt,
              CAST(COUNT(*) AS BIGINT) AS nr
       FROM tok GROUP BY 1),
tots AS (SELECT CAST(SUM(nt) AS BIGINT) AS st,
                CAST(SUM(nr) AS BIGINT) AS sr
         FROM tt),
lw AS (SELECT bucket,
              CAST(FLOOR(1000000 * ln((CAST(nt + 1 AS DOUBLE)
                                       / (st + 64))
                                      / (CAST(nr + 1 AS DOUBLE)
                                         / (sr + 64))) + 0.5)
                   AS BIGINT) AS lw
       FROM tt, tots),
f AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS f
      FROM tok GROUP BY 1, 2)
SELECT f.doc_id, CAST(SUM(f.f * lw.lw) AS BIGINT) AS dsir_weight
FROM f JOIN lw USING (bucket)
GROUP BY 1 ORDER BY dsir_weight DESC, doc_id LIMIT 20
"""


def part_graph_diameter(sf_dir: str):
    """G68 — double-sweep BFS diameter bound (Magnien/Latapy/Habib
    2009, the iFUB building block): BFS from the min node, re-BFS from
    the farthest node found (ties → min id); the second eccentricity is
    a LOWER bound on the graph diameter that is exact on trees and
    empirically tight on web-ish graphs — the O(2·BFS) answer to a
    question whose exact form is all-pairs. Returns (start, far_node,
    ecc1, diameter_lb, n_reached). Rows-only: the two-BFS recursion has
    no SQL form; the oracle is a brute all-pairs-BFS property test
    (exact on trees; lower bound ≤ true diameter, ≥ max eccentricity
    seen) in tests/test_graph_properties.py.

    Scale shape: two Pregel BFS runs (edges shard once per run, rounds
    == eccentricity); the only driver data is two (dist, node) argmax
    reductions."""
    from .functions.graphops import double_sweep_diameter

    res = double_sweep_diameter(_part_strong_edges(sf_dir),
                                num_partitions=_join_parts(sf_dir))
    return pa.table({k: pa.array([res[k]], pa.int64())
                     for k in ("start", "far_node", "ecc_start",
                               "diameter_lb", "n_reached")})


def part_graph_modularity(sf_dir: str):
    """G69 — Newman modularity of the [[part_graph_label_prop]]
    communities: Q = Σ_c (m_c/m − (d_c/2m)²), the standard "did the
    community detector find structure?" readout. EXACT integer algebra
    — Q·(4m²) = 4m·Σm_c − Σd_c² over int64 partials (intra-community
    edge counts m_c via a two-label attach, community degree sums d_c
    from one endpoint groupby), one driver division, reported as
    round-half-up ppm. Rows-only: the fixed-round LPA labels are
    iterative; correctness is pinned by the LPA parity tests plus an
    exact-Q recomputation golden in tests/test_graph_properties.py.

    Scale shape: two auto_join label attaches on the edge list; the
    per-community reductions are narrow; |C| rows reach the driver."""
    from .functions.graphops import label_propagation
    from .functions.joins import auto_join

    edges = _part_strong_edges(sf_dir).materialize()
    labels = label_propagation(edges, rounds=5,
                               num_partitions=_join_parts(sf_dir))
    lab_u = labels.map_batches(
        lambda t: pa.table({"nu": t["lnode"], "cu": t["label"]}),
        batch_format="pyarrow")
    lab_v = labels.map_batches(
        lambda t: pa.table({"nv": t["lnode"], "cv": t["label"]}),
        batch_format="pyarrow")
    tagged = auto_join(edges, lab_u, left_key="u", right_key="nu",
                       right_cols=["cu"])
    tagged = auto_join(tagged, lab_v, left_key="v", right_key="nv",
                       right_cols=["cv"])

    m = int(edges.count())

    def intra(t: pa.Table) -> pa.Table:
        eq = pc.cast(pc.equal(t["cu"], t["cv"]), pa.int64())
        return pa.table({"mc_part": pa.array([int(pc.sum(eq).as_py()
                                                  or 0)], pa.int64())})

    m_intra = int(tagged.map_batches(intra, batch_format="pyarrow")
                  .sum("mc_part") or 0)

    def degs(t: pa.Table) -> pa.Table:
        return pa.table({"c": pa.concat_arrays(
            [t["cu"].combine_chunks(), t["cv"].combine_chunks()])})

    dc = (tagged.map_batches(degs, batch_format="pyarrow")
          .groupby("c").aggregate(Count(alias_name="dc")))
    sum_dc2 = int(dc.map_batches(
        lambda t: pa.table({"sq": pc.multiply(t["dc"], t["dc"])}),
        batch_format="pyarrow").sum("sq") or 0)
    n_comm = int(dc.count())
    num = 4 * m * m_intra - sum_dc2          # Q·4m²  (exact)
    den = 4 * m * m
    q_ppm = (2 * 1_000_000 * num + den) // (2 * den)
    return pa.table({
        "n_edges": pa.array([m], pa.int64()),
        "n_communities": pa.array([n_comm], pa.int64()),
        "intra_edges": pa.array([m_intra], pa.int64()),
        "modularity_ppm": pa.array([q_ppm], pa.int64())})


def emb_mutual_nn(sf_dir: str):
    """V6 — mutual nearest-neighbor pairs over the embedding table
    (functions/similarity.py ``mutual_top1``): the anchor-pair primitive
    of bitext mining / cross-corpus alignment — a pair survives iff each
    vector is the other's cosine top-1 inside its IVF coarse bucket
    (SemDeDup-style k-means blocking; exact within buckets). Ties break
    on smaller id; cosine reported as round-half-up micro units.
    Rows-only: argmax-per-row has no tractable SQL form at scale; the
    oracle is a single-bucket numpy brute-force parity + planted-pair
    recall test (tests/test_similarity.py)."""
    from .functions.similarity import mutual_top1

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"],
                     rows_per_block=2_000)
    return mutual_top1(emb, num_centroids=8).sort(["id_a", "id_b"])


def events_daily_interp(sf_dir: str):
    """TS14 — linear gap interpolation of the per-type daily spend
    series (the fill step between [[events_value_locf]]'s
    step-function fill and a model-based imputation): for every
    calendar day between a type's first and last active day, missing
    days get pv + (nv−pv)·(d−pd)/(nd−pd) between the nearest present
    neighbors. Present-day sums are exact int cents; the interpolated
    value is the SAME double expression from the same ints in both
    engines (IEEE-identical), 4 dp; `interp` flags fills.

    Scale shape: the fact table collapses through a (type, day) sum
    combiner; the types×days calendar-bounded grid computes on the
    driver — the standing daily-series contract."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts",
                                               "value"])

    def daily(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                    pa.timestamp("us"))
        return (pa.table({"et": t["event_type"], "d": d,
                          "cents": _cents(t["value"])})
                .group_by(["et", "d"]).aggregate([("cents", "sum")])
                .rename_columns(["et", "d", "cents"]))

    rows = (ev.map_batches(daily, batch_format="pyarrow")
            .groupby(["et", "d"])
            .aggregate(Sum("cents", alias_name="cents")).take_all())
    series: dict = {}
    for r in rows:
        series.setdefault(r["et"], {})[r["d"]] = int(r["cents"])
    import datetime as _dt

    out_et, out_d, out_v, out_f = [], [], [], []
    for et in sorted(series):
        s = series[et]
        days = sorted(s)
        lo, hi = days[0], days[-1]
        present = np.array([(d - lo).days for d in days], np.int64)
        vals = np.array([s[d] for d in days], np.int64)
        n = (hi - lo).days + 1
        for off in range(n):
            d = lo + _dt.timedelta(days=off)
            if d in s:
                out_v.append(round(float(s[d]), 4))
                out_f.append(False)
            else:
                j = int(np.searchsorted(present, off))
                pd_, nd_ = int(present[j - 1]), int(present[j])
                pv, nv = float(vals[j - 1]), float(vals[j])
                v = pv + (nv - pv) * float(off - pd_) / float(nd_ - pd_)
                out_v.append(round(v, 4))
                out_f.append(True)
            out_et.append(et)
            out_d.append(d)
    return pa.table({"event_type": pa.array(out_et, pa.string()),
                     "d": pa.array(out_d, pa.timestamp("us")),
                     "cents_filled": pa.array(out_v, pa.float64()),
                     "interp": pa.array(out_f, pa.bool_())})


_EVENTS_INTERP_SQL = """
WITH c AS (SELECT event_type AS et, date_trunc('day', ts) AS d,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM events GROUP BY 1, 2),
b AS (SELECT et, MIN(d) mn, MAX(d) mx FROM c GROUP BY 1),
cal AS (SELECT b.et, unnest(generate_series(b.mn, b.mx, INTERVAL 1 DAY))
                   AS d
        FROM b),
g AS (SELECT cal.et, cal.d, c.cents,
             MAX(CASE WHEN c.cents IS NOT NULL THEN cal.d END)
                 OVER (PARTITION BY cal.et ORDER BY cal.d) AS pd,
             last_value(c.cents IGNORE NULLS)
                 OVER (PARTITION BY cal.et ORDER BY cal.d) AS pv,
             MIN(CASE WHEN c.cents IS NOT NULL THEN cal.d END)
                 OVER (PARTITION BY cal.et ORDER BY cal.d
                       ROWS BETWEEN CURRENT ROW
                       AND UNBOUNDED FOLLOWING) AS nd,
             first_value(c.cents IGNORE NULLS)
                 OVER (PARTITION BY cal.et ORDER BY cal.d
                       ROWS BETWEEN CURRENT ROW
                       AND UNBOUNDED FOLLOWING) AS nv
      FROM cal LEFT JOIN c ON c.et = cal.et AND c.d = cal.d)
SELECT et AS event_type, d,
       ROUND(CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
             ELSE CAST(pv AS DOUBLE)
                  + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                  * CAST(date_diff('day', pd, d) AS DOUBLE)
                  / CAST(date_diff('day', pd, nd) AS DOUBLE)
             END, 4) AS cents_filled,
       cents IS NULL AS interp
FROM g ORDER BY event_type, d
"""


def orders_seasonal_decomp(sf_dir: str):
    """TS15 — classical additive seasonal decomposition of daily order
    revenue into day-of-week indices (trend = centered 7-day moving
    average, seasonal index = mean of detrended values per weekday):
    the pre-model seasonality readout. EVERYTHING integer: the 7-day MA
    is rendered as round-half-up micro-cents of an exact 7-int sum,
    detrended values are exact micro ints, and each weekday index is
    one HUGEINT floor division mirrored in both engines. Weekday =
    epoch-day mod 7 (no locale).

    Scale shape: one (day → Σcents) combiner; the calendar-bounded MA /
    seasonal folds run on the driver."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def daily(t: pa.Table) -> pa.Table:
        return (pa.table({"d": t["o_orderdate"],
                          "cents": _cents(t["o_totalprice"])})
                .group_by("d").aggregate([("cents", "sum")])
                .rename_columns(["d", "cents"]))

    rows = (orders.map_batches(daily, batch_format="pyarrow")
            .groupby("d").aggregate(Sum("cents", alias_name="cents"))
            .take_all())
    rows.sort(key=lambda r: r["d"])
    days = [r["d"] for r in rows]
    y = [int(r["cents"]) for r in rows]
    epoch = [d.toordinal() - 719163 for d in days]   # 1970-01-01
    # centered 7-day MA over CONSECUTIVE series positions (the series is
    # near-dense; SQL mirrors positions, not calendar, so both agree)
    agg: dict = {}
    for i in range(3, len(y) - 3):
        s7 = sum(y[i - 3:i + 4])
        trend_micro = (2 * 1_000_000 * s7 + 7) // 14
        det = 1_000_000 * y[i] - trend_micro
        dow = epoch[i] % 7
        s, c = agg.get(dow, (0, 0))
        agg[dow] = (s + det, c + 1)
    dows, seas, ns = [], [], []
    for dow in sorted(agg):
        s, c = agg[dow]
        dows.append(dow)
        # OFF keeps the numerator positive: Python // floors while
        # DuckDB // truncates, and detrended sums CAN be negative
        off = 2 * 10 ** 15
        seas.append((2 * s + c + 2 * c * off) // (2 * c) - off)
        ns.append(c)
    return pa.table({"dow": pa.array(dows, pa.int64()),
                     "seasonal_micro": pa.array(seas, pa.int64()),
                     "n_days": pa.array(ns, pa.int64())})


_ORDERS_SEASONAL_SQL = """
WITH s AS (SELECT o_orderdate AS d,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS y
           FROM orders GROUP BY 1),
x AS (SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS t,
             COUNT(*) OVER () AS n,
             CAST(date_diff('day', DATE '1970-01-01',
                            CAST(d AS DATE)) AS BIGINT) AS ep
      FROM s),
ma AS (SELECT t, ep, y,
              CAST(SUM(y) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING
                                AND 3 FOLLOWING) AS HUGEINT) AS s7,
              n
       FROM x),
det AS (SELECT ep % 7 AS dow,
               CAST(1000000 AS HUGEINT) * y
               - (2 * 1000000 * s7 + 7) // 14 AS det
        FROM ma WHERE t > 3 AND t <= n - 3)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST((2 * SUM(det) + COUNT(*)
             + 2 * COUNT(*) * CAST(2000000000000000 AS HUGEINT))
            // (2 * COUNT(*)) - 2000000000000000 AS BIGINT)
           AS seasonal_micro,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM det GROUP BY 1 ORDER BY 1
"""


def customer_revenue_lorenz(sf_dir: str):
    """G70 — Lorenz curve of per-customer revenue in deciles (the curve
    behind [[orders_gini]]-style scalars — what a marketplace actually
    plots): customers ranked ascending by revenue, decile =
    (rank−1)·10 // n, each decile's customer count and cumulative
    revenue share as EXACT floor-ppm. Ranks from the range-partitioned
    global row number (tie-invariant: equal revenues commute inside the
    cumulative sum).

    Scale shape: orders → per-customer combiner groupby → the two-pass
    prefix-sum rank; 10 decile partials reach the driver."""
    from .functions.rank import global_row_number

    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])
    rev = (orders.map_batches(
        lambda t: pa.table({"o_custkey": t["o_custkey"],
                            "cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("cents", alias_name="cents"))
        .materialize())
    n = int(rev.count())
    ranked = global_row_number(rev, order_by=["cents", "o_custkey"],
                               out_col="rn",
                               num_partitions=_join_parts(sf_dir,
                                                          "orders"))

    def tag(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        dec = (rn - 1) * 10 // n
        return (pa.table({"decile": pa.array(dec, pa.int64()),
                          "cents": t["cents"]})
                .group_by("decile")
                .aggregate([("cents", "sum"), ([], "count_all")])
                .rename_columns(["decile", "cents", "nc"]))

    rows = (ranked.map_batches(tag, batch_format="pyarrow")
            .groupby("decile")
            .aggregate(Sum("cents", alias_name="cents"),
                       Sum("nc", alias_name="n_customers")).take_all())
    rows.sort(key=lambda r: int(r["decile"]))
    total = sum(int(r["cents"]) for r in rows)
    cum = 0
    decs, ncs, shares = [], [], []
    for r in rows:
        cum += int(r["cents"])
        decs.append(int(r["decile"]))
        ncs.append(int(r["n_customers"]))
        shares.append(cum * 1_000_000 // total)
    return pa.table({"decile": pa.array(decs, pa.int64()),
                     "n_customers": pa.array(ncs, pa.int64()),
                     "cum_share_ppm": pa.array(shares, pa.int64())})


_CUSTOMER_LORENZ_SQL = """
WITH r AS (SELECT o_custkey,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
w AS (SELECT cents,
             (ROW_NUMBER() OVER (ORDER BY cents, o_custkey) - 1) * 10
             // (SELECT COUNT(*) FROM r) AS decile
      FROM r),
d AS (SELECT decile, CAST(SUM(cents) AS HUGEINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM w GROUP BY 1)
SELECT CAST(decile AS BIGINT) AS decile, n_customers,
       CAST(SUM(cents) OVER (ORDER BY decile) * 1000000
            // (SELECT SUM(CAST(cents AS HUGEINT)) FROM d) AS BIGINT)
           AS cum_share_ppm
FROM d ORDER BY decile
"""


def media_video_neardup(sf_dir: str):
    """MM8 — cross-video near-duplicate detection (the multimodal leg
    of the dedup suite one level up from [[media_phash_pairs]]'s still
    images): each demuxed video collapses to a 64-bit signature — the
    DCT pHash of its exact-integer temporal MEAN frame — and pairs come
    from the factored-out banded-Hamming scheme (exact recall ≤ hamming
    3 by the Manku pigeonhole). The corpus plants near-copies (same
    frames, ±1 jitter): planted pairs MUST surface, disjoint-palette
    videos must not. Rows-only: pixel demux has no SQL; the oracle is
    the planted-recall + brute-Hamming parity test
    (tests/test_multimodal.py).

    Scale shape: one streaming decode→signature pass (payload dropped
    immediately — only (id, int64) survives); num_tables skinny rows
    per video enter the banded shuffle."""
    from .functions.dedup import hamming_pairs_banded
    from .sources.mediacodec import encode_ppm_stream, iter_ppm_stream
    from .stages.multimodal import phash64

    n = max(16, _n_media(sf_dir) // 4)

    def make_frames(mid: int, jitter_seed: int) -> "list[np.ndarray]":
        # spatially STRUCTURED content (random low-freq cosine mix), so
        # the pHash sign bits are content-dominated and survive the ±1
        # jitter — a flat frame's DCT is all-noise and hashes randomly
        rng = np.random.default_rng(4000 + mid)
        jrng = np.random.default_rng(9000 + jitter_seed)
        yy = np.arange(12)[:, None] / 12.0
        xx = np.arange(16)[None, :] / 16.0
        img = np.zeros((12, 16))
        for _ in range(4):
            fy, fx = rng.integers(1, 4, size=2)
            img += float(rng.integers(1, 5)) * \
                np.cos(np.pi * fy * yy) * np.cos(np.pi * fx * xx)
        img = ((img - img.min()) / (img.max() - img.min() + 1e-9)
               * 180 + 20).astype(np.int64)
        frames = []
        for _ in range(6):
            jitter = jrng.integers(0, 2, size=(12, 16, 3), dtype=np.uint8)
            frames.append((img[:, :, None] + jitter).astype(np.uint8))
        return frames

    payloads = []
    for mid in range(n):
        if mid % 4 == 3:      # near-copy of mid-1's content, new jitter
            payloads.append(encode_ppm_stream(
                make_frames(mid - 1, jitter_seed=mid)))
        else:
            payloads.append(encode_ppm_stream(
                make_frames(mid, jitter_seed=mid)))
    t = pa.table({"media_id": pa.array(range(n), pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})

    def sig(batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            frames = [f.astype(np.int64) for _, f in
                      iter_ppm_stream(payload)]
            mean = (np.sum(frames, axis=0) // len(frames)) \
                .astype(np.uint8)
            ids.append(mid)
            hs.append(np.int64(np.uint64(phash64(mean))))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "phash": pa.array(hs, pa.int64())})

    sigs = (ray.data.from_arrow(t).repartition(4)
            .map_batches(sig, batch_format="pyarrow"))
    return hamming_pairs_banded(sigs, id_col="media_id",
                                hash_col="phash",
                                max_hamming=3).sort(["id_a", "id_b"])


# SHACL-lite ontology for the extracted KG: predicate → (domain types,
# range types) over the entity-id type prefixes (PER/ORG/LOC). NIL:
# ids are unresolved mentions, audited separately — they are linking
# failures, not schema violations.
KG_ONTOLOGY: "dict[str, tuple[frozenset, frozenset]]" = {
    "acquired": (frozenset({"ORG"}), frozenset({"ORG"})),
    "born_in": (frozenset({"PER"}), frozenset({"LOC"})),
    "founded": (frozenset({"PER"}), frozenset({"ORG"})),
    "headquartered_in": (frozenset({"ORG"}), frozenset({"LOC"})),
    "invested_in": (frozenset({"ORG", "PER"}), frozenset({"ORG"})),
    "leads": (frozenset({"PER"}), frozenset({"ORG"})),
    "located_in": (frozenset({"ORG", "LOC"}), frozenset({"LOC"})),
    "moved_to": (frozenset({"PER"}), frozenset({"LOC"})),
    "partnered_with": (frozenset({"ORG"}), frozenset({"ORG"})),
    "studied_at": (frozenset({"PER"}), frozenset({"ORG"})),
    "visited": (frozenset({"PER"}), frozenset({"LOC"})),
    "works_at": (frozenset({"PER"}), frozenset({"ORG"})),
}


def _kg_type_of(col: pa.ChunkedArray) -> pa.Array:
    """Entity-type column from id prefixes: NIL: → 'NIL', else the
    substring before '_' (PER/ORG/LOC)."""
    s = pd.Series(col.to_pandas())
    out = np.where(s.str.startswith("NIL:"), "NIL",
                   s.str.split("_").str[0])
    return pa.array(out, pa.string())


def kg_ontology_audit(sf_dir: str):
    """KG6 — SHACL-lite domain/range validation of the extracted KG
    (the constraint audit every production KG build gates publication
    on): per predicate — edge count, conforming edges, domain
    violations, range violations, and unresolved-endpoint (NIL) edges,
    against the declared ``KG_ONTOLOGY``. A NIL endpoint is counted
    once as unresolved and excluded from the violation columns (it is
    a LINKING failure, not a schema one); an undeclared predicate
    counts all its edges as domain violations.

    Scale shape: one vectorized type-tagging map over the edge table +
    one |preds|-row groupby; nothing entity-sized leaves the workers.
    Rows-only (KG tables aren't DuckDB views); golden = pandas
    recomputation with the same ontology (tests/test_flagship.py)."""
    edges = _kg_run(sf_dir)["edges"]
    dom_items = sorted((p, t) for p, (d, _) in KG_ONTOLOGY.items()
                       for t in d)
    rng_items = sorted((p, t) for p, (_, r) in KG_ONTOLOGY.items()
                       for t in r)

    def audit(t: pa.Table) -> pa.Table:
        st = pd.Series(_kg_type_of(t["subj_id"]).to_pandas())
        ot = pd.Series(_kg_type_of(t["obj_id"]).to_pandas())
        preds = pd.Series(t["pred"].to_pandas())
        nil = (st == "NIL") | (ot == "NIL")
        dom_ok = pd.MultiIndex.from_arrays([preds, st]) \
            .isin(dom_items)
        rng_ok = pd.MultiIndex.from_arrays([preds, ot]) \
            .isin(rng_items)
        frame = pd.DataFrame({
            "pred": preds,
            "n_edges": 1,
            "n_conforming": (~nil & dom_ok & rng_ok).astype(np.int64),
            "n_domain_viol": (~nil & ~dom_ok).astype(np.int64),
            "n_range_viol": (~nil & ~rng_ok).astype(np.int64),
            "n_unresolved": nil.astype(np.int64)})
        g = frame.groupby("pred", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (edges.map_batches(audit, batch_format="pyarrow")
            .groupby("pred")
            .aggregate(Sum("n_edges", alias_name="n_edges"),
                       Sum("n_conforming", alias_name="n_conforming"),
                       Sum("n_domain_viol", alias_name="n_domain_viol"),
                       Sum("n_range_viol", alias_name="n_range_viol"),
                       Sum("n_unresolved", alias_name="n_unresolved"))
            .sort("pred"))


def kg_nil_clusters(sf_dir: str):
    """KG7 — NIL-mention clustering (the cross-document coreference
    step after entity linking: unlinked mentions sharing a normalized
    surface are one CANDIDATE NEW ENTITY — the standard TAC-KBP NIL
    clustering task): NIL nodes keyed by lowercase alphanumeric-only
    surface; every key is a promotion
    candidate reported with member count, total mentions, and the
    sorted member list (singletons included — they are the "new entity
    seen once" case). Top 20 by (n_mentions desc, surface_key).

    Scale shape: NIL nodes are a small filtered slice of the node
    table; one normalize map + one key groupby. Rows-only; golden =
    pandas recomputation (tests/test_flagship.py)."""
    nodes = _kg_run(sf_dir)["nodes"]

    def nils(t: pa.Table) -> pa.Table:
        s = pd.Series(t["entity_id"].to_pandas())
        keep = s.str.startswith("NIL:")
        surf = pd.Series(t["canonical_surface"].to_pandas())[keep]
        key = surf.str.lower().str.replace(r"[^a-z0-9]", "",
                                           regex=True)
        return pa.table({
            "key": pa.array(key, pa.string()),
            "entity_id": pa.array(s[keep], pa.string()),
            "n_mentions": pa.array(
                pd.Series(t["n_mentions"].to_pandas())[keep]
                .to_numpy(np.int64))})

    def fold(g: pd.DataFrame) -> pa.Table:
        return pa.table({
            "surface_key": pa.array([g["key"].iloc[0]], pa.string()),
            "n_members": pa.array([len(g)], pa.int64()),
            "n_mentions": pa.array([int(g["n_mentions"].sum())],
                                   pa.int64()),
            "members": pa.array(
                ["|".join(sorted(g["entity_id"]))], pa.string())})

    return (nodes.map_batches(nils, batch_format="pyarrow")
            .groupby("key").map_groups(fold, batch_format="pandas")
            .sort(["n_mentions", "surface_key"],
                  descending=[True, False]).limit(20))


def kg_functional_conflicts(sf_dir: str):
    """KG8 — functional-predicate conflict detection (KG consistency:
    born_in / headquartered_in should be single-valued per subject —
    multiple objects mean extraction noise or a genuine merge bug):
    for each declared-functional predicate, subjects with ≥ 2 distinct
    objects, ranked by how contested they are (distinct objects, then
    the support split between the top two). Reports
    (pred, subj_id, n_objects, top_support, second_support) for the
    top 20 by (n_objects desc, pred, subj).

    Scale shape: one filtered groupby on (pred, subj) — group = that
    subject's object list, already co-located; only conflicted rows
    leave. Rows-only; golden = pandas recomputation."""
    FUNCTIONAL = ["born_in", "headquartered_in"]
    edges = _kg_run(sf_dir)["edges"]

    filt = edges.map_batches(
        lambda t: t.filter(pc.is_in(
            t["pred"], value_set=pa.array(FUNCTIONAL, pa.string()))),
        batch_format="pyarrow")

    def conflicts(g: pd.DataFrame) -> pa.Table:
        by_obj = (g.groupby("obj_id")["n_support"].sum()
                  .sort_values(ascending=False))
        if len(by_obj) < 2:
            return pa.table({
                "pred": pa.array([], pa.string()),
                "subj_id": pa.array([], pa.string()),
                "n_objects": pa.array([], pa.int64()),
                "top_support": pa.array([], pa.int64()),
                "second_support": pa.array([], pa.int64())})
        return pa.table({
            "pred": pa.array([g["pred"].iloc[0]], pa.string()),
            "subj_id": pa.array([g["subj_id"].iloc[0]], pa.string()),
            "n_objects": pa.array([len(by_obj)], pa.int64()),
            "top_support": pa.array([int(by_obj.iloc[0])], pa.int64()),
            "second_support": pa.array([int(by_obj.iloc[1])],
                                       pa.int64())})

    return (filt.groupby(["pred", "subj_id"])
            .map_groups(conflicts, batch_format="pandas")
            .sort(["n_objects", "pred", "subj_id"],
                  descending=[True, False, False]).limit(20))


def orders_pushdown_scan(sf_dir: str):
    """S11 — predicate-pushdown scan ("prune at the read"): a selective
    date+status predicate handed to the Parquet READER as a
    ``pyarrow.dataset`` expression (sources/tables.py ``read_table``
    ``filter=``), so row-group statistics prune which groups are even
    decoded and non-matching rows never enter the object store — versus
    the anti-pattern of reading everything and filtering in a map stage.
    Per-priority counts + exact cents over 1995 'F'-status orders.

    Scale shape: this is the read-side discipline the whole repo's scan
    contract rests on; downstream is one narrow count/sum groupby."""
    import pyarrow.dataset as pds

    expr = ((pds.field("o_orderdate")
             >= pa.scalar(pd.Timestamp("1995-01-01")))
            & (pds.field("o_orderdate")
               < pa.scalar(pd.Timestamp("1996-01-01")))
            & (pds.field("o_orderstatus") == "F"))
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderpriority", "o_totalprice"],
                        filter=expr)
    return (orders.map_batches(
        lambda t: pa.table({"o_orderpriority": t["o_orderpriority"],
                            "cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"),
                   Sum("cents", alias_name="sum_cents"))
        .sort("o_orderpriority"))


_ORDERS_PUSHDOWN_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
  AND o_orderstatus = 'F'
GROUP BY 1 ORDER BY 1
"""


def docs_dedup_impact(sf_dir: str):
    """LLM17 — dedup impact report (the before/after accounting an
    LLM-data team publishes with every corpus release): per source —
    docs and chars in the raw corpus, docs and chars surviving exact
    dedup (min-doc_id survivor per content fingerprint), and the
    removed-chars ppm. Survivors via the exact-dedup operator + a
    bloom-prefiltered semi join back to full rows; both sides reduce
    through per-batch combiners.

    Scale shape: two streaming aggregates + one semi join keyed on
    doc_id; only |sources| rows reach the driver."""
    from .functions.dedup import exact_dedup
    from .functions.joins import semi_join

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars", "text"],
                      rows_per_block=500)

    def raw_stats(t: pa.Table) -> pa.Table:
        return (pa.table({"source": t["source"],
                          "chars": pc.cast(t["n_chars"], pa.int64())})
                .group_by("source")
                .aggregate([("chars", "sum"), ([], "count_all")])
                .rename_columns(["source", "chars", "docs"]))

    raw = (docs.map_batches(raw_stats, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("chars", alias_name="raw_chars"),
                      Sum("docs", alias_name="raw_docs")))

    survivors = exact_dedup(docs).select_columns(["doc_id"])
    kept = semi_join(docs, survivors, left_key="doc_id",
                     right_key="doc_id", bloom_bits=1 << 16)
    kept_agg = (kept.map_batches(raw_stats, batch_format="pyarrow")
                .groupby("source")
                .aggregate(Sum("chars", alias_name="kept_chars"),
                           Sum("docs", alias_name="kept_docs")))

    from .functions.joins import auto_join

    joined = auto_join(raw, kept_agg.map_batches(
        lambda t: pa.table({"src2": t["source"],
                            "kept_chars": t["kept_chars"],
                            "kept_docs": t["kept_docs"]}),
        batch_format="pyarrow"), left_key="source", right_key="src2",
        right_cols=["kept_chars", "kept_docs"])

    def ppm(t: pa.Table) -> pa.Table:
        rc = t["raw_chars"].to_numpy(zero_copy_only=False)
        kc = t["kept_chars"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "removed_ppm",
            pa.array((rc - kc) * 1_000_000 // rc, pa.int64()))

    return (joined.map_batches(ppm, batch_format="pyarrow")
            .sort("source"))


_DOCS_DEDUP_IMPACT_SQL = """
WITH fp AS (SELECT doc_id, source, n_chars,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ',
                                           'g'))) AS f
            FROM documents),
surv AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f),
raw AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS raw_chars,
               CAST(COUNT(*) AS BIGINT) AS raw_docs
        FROM fp GROUP BY 1),
kept AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
                CAST(COUNT(*) AS BIGINT) AS kept_docs
         FROM fp JOIN surv USING (doc_id) GROUP BY 1)
SELECT source, raw_chars, raw_docs, kept_chars, kept_docs,
       CAST((CAST(raw_chars AS HUGEINT) - kept_chars) * 1000000
            // raw_chars AS BIGINT) AS removed_ppm
FROM raw JOIN kept USING (source) ORDER BY source
"""


def emb_cluster_quality(sf_dir: str):
    """V7 — simplified-silhouette cluster quality for the k-means
    clustering (Hruschka 2004 variant the large-scale evaluators use —
    a(i) = distance to OWN centroid, b(i) = min distance to any other,
    s(i) = (b−a)/max(a,b) — O(n·k), not the O(n²) exact silhouette):
    per-cluster member counts and mean silhouette in micro units, plus
    an `overall` row. Per-point scores are quantized to int64 micro
    BEFORE summation (round-half-up), so cluster means are exact-int
    order-free math — deterministic under any layout, like the kmeans
    trainer itself. Rows-only (distance recursion over the trained
    centroids has no SQL form); the oracle is a numpy same-formula
    recomputation + layout invariance (tests/test_kmeans.py).

    Scale shape: centroids (k×d micro ints) ride the driver closure;
    one streaming score pass emits (cluster, n, Σs_micro) partials."""
    from .functions.vectors import kmeans

    emb = read_table(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"],
                     rows_per_block=2_000)
    cents, _assign = kmeans(emb, k=8, iters=5)
    c = np.asarray(cents, np.float64)             # micro-unit centroids

    def score(t: pa.Table) -> pa.Table:
        flat = t["embedding"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False)
        n = len(t)
        d = len(flat) // n if n else 0
        v = np.round(flat.astype(np.float64).reshape(n, d)
                     * 1_000_000.0)
        # squared L2 to every centroid; ties → lowest cluster id
        d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        own = d2.argmin(axis=1)
        a = np.sqrt(d2[np.arange(n), own])
        d2[np.arange(n), own] = np.inf
        b = np.sqrt(d2.min(axis=1))
        denom = np.maximum(a, b)
        s = np.where(denom > 0, (b - a) / denom, 0.0)
        s_micro = np.floor(s * 1_000_000.0 + 0.5).astype(np.int64)
        return (pa.table({"cluster": pa.array(own.astype(np.int64)),
                          "s_micro": pa.array(s_micro),
                          "one": pa.array(np.ones(n, np.int64))})
                .group_by("cluster")
                .aggregate([("s_micro", "sum"), ("one", "sum")])
                .rename_columns(["cluster", "s_sum", "n"]))

    rows = (emb.map_batches(score, batch_format="pyarrow")
            .groupby("cluster")
            .aggregate(Sum("s_sum", alias_name="s_sum"),
                       Sum("n", alias_name="n")).take_all())
    rows.sort(key=lambda r: int(r["cluster"]))
    cl, ns, means = [], [], []
    tot_s = tot_n = 0
    for r in rows:
        s_sum, n = int(r["s_sum"]), int(r["n"])
        cl.append(str(int(r["cluster"])))
        ns.append(n)
        means.append((2 * s_sum + n) // (2 * n))
        tot_s += s_sum
        tot_n += n
    cl.append("overall")
    ns.append(tot_n)
    means.append((2 * tot_s + tot_n) // (2 * tot_n))
    return pa.table({"cluster": pa.array(cl, pa.string()),
                     "n_points": pa.array(ns, pa.int64()),
                     "mean_silhouette_micro": pa.array(means, pa.int64())})


def orders_storage_audit(sf_dir: str):
    """X4 — Parquet storage audit (the table-maintenance readout next
    to [[docs_compaction_plan]] and the Z-order audit): per column of
    the orders table — value count, compressed and uncompressed bytes
    summed over all row groups, and the compression ratio in floor-ppm.
    METADATA-ONLY: the footer is the only thing read (the same
    metadata-not-data contract `read_table`'s row count uses), so the
    audit costs O(row groups · columns) regardless of table size.

    Rows-only (oracle SQL runs against registered VIEWS, not file
    paths); the oracle is DuckDB's own ``parquet_metadata()`` table
    function over the same file in tests/test_new_ops.py — two
    independent footer parsers agreeing byte-for-byte."""
    md = pq.read_metadata(f"{sf_dir}/orders.parquet")
    agg: "dict[str, list[int]]" = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            a = agg.setdefault(col.path_in_schema, [0, 0, 0])
            a[0] += col.num_values
            a[1] += col.total_compressed_size
            a[2] += col.total_uncompressed_size
    cols = sorted(agg)
    return pa.table({
        "column": pa.array(cols, pa.string()),
        "n_values": pa.array([agg[c][0] for c in cols], pa.int64()),
        "compressed_bytes": pa.array([agg[c][1] for c in cols],
                                     pa.int64()),
        "uncompressed_bytes": pa.array([agg[c][2] for c in cols],
                                       pa.int64()),
        "ratio_ppm": pa.array(
            [agg[c][1] * 1_000_000 // agg[c][2] for c in cols],
            pa.int64())})


def events_scd2_asof(sf_dir: str):
    """S12 — AS-OF point-in-time state query over the SCD2 versioning
    ([[events_user_scd2]] builds the intervals; this answers "what was
    every user's state at time T?" — the bitemporal read every
    warehouse versioning scheme exists to serve): T = the integer
    midpoint of the observed ts range; each user's state at T is their
    latest event with ts ≤ T; output = users per state event_type.

    Scale shape: one Min/Max pre-pass; a filtered latest-per-user
    groupby over hash-bucketed users (argmax inside the partition);
    |types| rows out."""
    ev = read_table(sf_dir, "events", columns=["user_id", "ts",
                                               "event_type"])
    mm = ev.map_batches(
        lambda t: pa.table({"us": pc.cast(t["ts"], pa.int64())}),
        batch_format="pyarrow").aggregate(Min("us"), Max("us"))
    t_mid = (int(mm["min(us)"]) + int(mm["max(us)"])) // 2

    def latest_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        t = (pa.table({"user_id": t["user_id"], "us": us,
                       "event_type": t["event_type"]})
             .filter(pc.less_equal(us, pa.scalar(t_mid, pa.int64()))))
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "us": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string())})
        d = t.to_pandas().sort_values(["user_id", "us", "event_type"])
        d = d.groupby("user_id", sort=False).tail(1)
        return pa.Table.from_pandas(d, preserve_index=False)

    def latest_final(g: pd.DataFrame) -> pa.Table:
        d = g.sort_values(["user_id", "us", "event_type"])
        d = d.groupby("user_id", sort=False).tail(1)
        return pa.table({"event_type": pa.array(d["event_type"],
                                                pa.string())})

    def bucket(t: pa.Table) -> pa.Table:
        return add_bucket(t, ["user_id"], 16, "_p")

    return (ev.map_batches(latest_partial, batch_format="pyarrow")
            .map_batches(bucket, batch_format="pyarrow")
            .groupby("_p").map_groups(latest_final,
                                      batch_format="pandas")
            .groupby("event_type").aggregate(Count(alias_name="n_users"))
            .sort("event_type"))


_EVENTS_SCD2_ASOF_SQL = """
WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS tm
           FROM events),
f AS (SELECT user_id, event_type, epoch_us(ts) AS us
      FROM events, b WHERE epoch_us(ts) <= b.tm),
pick AS (SELECT user_id, event_type,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY us DESC,
                                            event_type DESC) AS rk
         FROM f)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
FROM pick WHERE rk = 1 GROUP BY 1 ORDER BY 1
"""


def kg_domain_yield(sf_dir: str):
    """KG9 — per-domain extraction-yield audit (the crawl-ops report a
    KG build emits per source site: which domains actually produce
    knowledge, and where does entity linking fail?): pages, mentions,
    triples, mentions-per-page (round-half-up milli), and the
    NIL-mention rate in floor-ppm per url domain. Counting runs in ONE
    vectorized pass over the annotated corpus — the struct-list lengths
    ARE the per-page counts (no explode for the totals; NIL detection
    scans the flat entity_id child array once per batch), then a
    |domains|-row groupby.

    Scale shape: per-batch combiner partials only; nothing page-sized
    shuffles. Rows-only (KG tables aren't views); golden = pandas
    explode-recompute (tests/test_flagship.py)."""
    ann = _kg_run(sf_dir)["annotated"]

    def partials(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist())
        dom = urls.str.extract(r"https?://([^/]+)/", expand=False) \
            .fillna("?")
        ments = t["mentions"].combine_chunks()
        trips = t["triples"].combine_chunks()
        m_cnt = np.diff(ments.offsets.to_numpy(zero_copy_only=False))
        t_cnt = np.diff(trips.offsets.to_numpy(zero_copy_only=False))
        eid = ments.values.field("entity_id")
        nil_arr = pc.starts_with(eid, "NIL:")
        if isinstance(nil_arr, pa.ChunkedArray):
            nil_arr = nil_arr.combine_chunks()
        is_nil = nil_arr.to_numpy(zero_copy_only=False)
        # per-page NIL counts: segment-sum the flat flags by offsets
        nil_cum = np.concatenate([[0], np.cumsum(is_nil.astype(
            np.int64))])
        offs = ments.offsets.to_numpy(zero_copy_only=False)
        nil_cnt = nil_cum[offs[1:]] - nil_cum[offs[:-1]]
        g = (pd.DataFrame({"domain": dom,
                           "pages": 1,
                           "mentions": m_cnt.astype(np.int64),
                           "nil_mentions": nil_cnt,
                           "triples": t_cnt.astype(np.int64)})
             .groupby("domain", sort=False).sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = (ann.map_batches(partials, batch_format="pyarrow")
            .groupby("domain")
            .aggregate(Sum("pages", alias_name="n_pages"),
                       Sum("mentions", alias_name="n_mentions"),
                       Sum("nil_mentions", alias_name="n_nil"),
                       Sum("triples", alias_name="n_triples"))
            .take_all())
    rows.sort(key=lambda r: r["domain"])
    out = {"domain": [], "n_pages": [], "n_mentions": [],
           "n_triples": [], "mentions_per_page_milli": [],
           "nil_rate_ppm": []}
    for r in rows:
        p, m = int(r["n_pages"]), int(r["n_mentions"])
        out["domain"].append(r["domain"])
        out["n_pages"].append(p)
        out["n_mentions"].append(m)
        out["n_triples"].append(int(r["n_triples"]))
        out["mentions_per_page_milli"].append(
            (2000 * m + p) // (2 * p))
        out["nil_rate_ppm"].append(
            int(r["n_nil"]) * 1_000_000 // max(1, m))
    return pa.table({k: pa.array(v) for k, v in out.items()})


def events_tumbling_changelog(sf_dir: str, *,
                              lateness_us: int = 3_600_000_000):
    """ST1 — retraction-aware streaming windowed aggregate (the
    changelog/upsert semantics a Flink-style engine emits downstream,
    simulated EXACTLY in batch): events process in the deterministic
    arrival order (ts, event_id); the watermark before each event is
    the EXCLUSIVE global running max of event time
    ([[orders_max_concurrency]]'s two-pass plan with the 1-PRECEDING
    frame); an event landing in a 6 h (window, type) group whose window
    end + 1 h lateness is already BEHIND the watermark is LATE and
    forces a retract+upsert pair instead of a plain upsert. Per group:
    final count and total changelog rows (n + n_late) — the
    amplification factor a downstream consumer provisions for.

    Scale shape: one range-partitioned running max (driver holds
    |partitions| scalars), one vectorized late-flag map, one count/sum
    combiner groupby."""
    from .functions.rank import global_running_max

    SIX_H = 6 * 3_600_000_000
    LATE = lateness_us
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"], "us": us})

    wm = global_running_max(
        ev.map_batches(prep, batch_format="pyarrow"), "us",
        order_by=["us", "event_id"], out_col="wm", exclusive=True,
        num_partitions=_join_parts(sf_dir, "events"))

    NEG = np.iinfo(np.int64).min

    def flag(t: pa.Table) -> pa.Table:
        us = t["us"].to_numpy(zero_copy_only=False)
        w = t["wm"].to_numpy(zero_copy_only=False)
        win = us // SIX_H
        win_end = (win + 1) * SIX_H
        late = ((w != NEG) & (w > win_end + LATE)).astype(np.int64)
        return (pa.table({"window_start_us": pa.array(win * SIX_H),
                          "event_type": t["event_type"],
                          "late": pa.array(late),
                          "one": pa.array(np.ones(len(us), np.int64))})
                .group_by(["window_start_us", "event_type"])
                .aggregate([("one", "sum"), ("late", "sum")])
                .rename_columns(["window_start_us", "event_type",
                                 "n", "n_late"]))

    return (wm.map_batches(flag, batch_format="pyarrow")
            .groupby(["window_start_us", "event_type"])
            .aggregate(Sum("n", alias_name="n_final"),
                       Sum("n_late", alias_name="n_late"))
            .map_batches(
                lambda t: t.append_column(
                    "n_changelog",
                    pc.add(t["n_final"], t["n_late"])),
                batch_format="pyarrow")
            .sort(["window_start_us", "event_type"]))


_EVENTS_CHANGELOG_SQL = """
WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS us
           FROM events),
o AS (SELECT event_type,
             (us // 21600000000) * 21600000000 AS window_start_us,
             CASE WHEN MAX(us) OVER (ORDER BY us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                  > (us // 21600000000 + 1) * 21600000000 + 3600000000
                  THEN 1 ELSE 0 END AS late
      FROM e)
SELECT window_start_us, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_final,
       CAST(SUM(late) AS BIGINT) AS n_late,
       CAST(COUNT(*) + SUM(late) AS BIGINT) AS n_changelog
FROM o GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_runs_test(sf_dir: str):
    """G71 — Wald–Wolfowitz runs test on the daily revenue series (the
    "is this series random or trending/mean-reverting?" screen): days
    split above/below the discrete lower median of daily cents, R =
    number of sign runs in calendar order; z = (R − μ)/σ with the exact
    integer μ, σ² moments. Counts and runs are exact ints from the SAME
    series in both engines (ties: a day equal to the median counts as
    below); z at 4 dp.

    Scale shape: the fact table collapses through a (day → Σcents)
    combiner; the calendar-bounded series computes on the driver."""
    import math as _math

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def daily(t: pa.Table) -> pa.Table:
        return (pa.table({"d": t["o_orderdate"],
                          "cents": _cents(t["o_totalprice"])})
                .group_by("d").aggregate([("cents", "sum")])
                .rename_columns(["d", "cents"]))

    rows = (orders.map_batches(daily, batch_format="pyarrow")
            .groupby("d").aggregate(Sum("cents", alias_name="cents"))
            .take_all())
    rows.sort(key=lambda r: r["d"])
    y = np.array([int(r["cents"]) for r in rows], dtype=np.int64)
    med = int(np.sort(y)[(len(y) - 1) // 2])
    above = y > med
    n1 = int(above.sum())
    n2 = len(y) - n1
    runs = 1 + int((above[1:] != above[:-1]).sum())
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / ((n1 + n2) ** 2 * (n1 + n2 - 1.0)))
    z = round((runs - mu) / _math.sqrt(var), 4)
    return pa.table({"n_above": pa.array([n1], pa.int64()),
                     "n_below": pa.array([n2], pa.int64()),
                     "n_runs": pa.array([runs], pa.int64()),
                     "z": pa.array([z], pa.float64())})


_ORDERS_RUNS_SQL = """
WITH s AS (SELECT o_orderdate AS d,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS y
           FROM orders GROUP BY 1),
m AS (SELECT quantile_disc(y, 0.5) AS med FROM s),
x AS (SELECT d, CAST(y > m.med AS INT) AS ab FROM s, m),
r AS (SELECT ab, LAG(ab) OVER (ORDER BY d) AS pab FROM x),
agg AS (SELECT CAST(SUM(ab) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(ab) AS BIGINT) AS n2,
               CAST(1 + SUM(CASE WHEN pab IS NOT NULL
                                  AND ab <> pab THEN 1 ELSE 0 END)
                    AS BIGINT) AS runs
        FROM r)
SELECT n1 AS n_above, n2 AS n_below, runs AS n_runs,
       ROUND((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 4)
           AS z
FROM agg
"""


def lineitem_discount_tax_heatmap(sf_dir: str):
    """G72 — 2-D histogram / heatmap (the bivariate sibling of the 1-D
    price histograms): lineitems bucketed by (discount percent-point,
    tax percent-point) with row counts and exact revenue cents per
    cell — the interaction grid a pricing analysis plots. Bands are
    exact integer round-half-away percent points (no float bin
    boundary); one (band, band) combiner groupby, ≤ 11×9 cells out."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_discount", "l_tax", "l_extendedprice"])

    def cells(t: pa.Table) -> pa.Table:
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0),
                                round_mode="half_towards_infinity"),
                       pa.int64())
        tax = pc.cast(pc.round(pc.multiply(t["l_tax"], 100.0),
                               round_mode="half_towards_infinity"),
                      pa.int64())
        return (pa.table({"disc_pp": disc, "tax_pp": tax,
                          "cents": _cents(t["l_extendedprice"])})
                .group_by(["disc_pp", "tax_pp"])
                .aggregate([("cents", "sum"), ([], "count_all")])
                .rename_columns(["disc_pp", "tax_pp", "cents", "n"]))

    return (li.map_batches(cells, batch_format="pyarrow")
            .groupby(["disc_pp", "tax_pp"])
            .aggregate(Sum("n", alias_name="n_items"),
                       Sum("cents", alias_name="sum_cents"))
            .sort(["disc_pp", "tax_pp"]))


_LINEITEM_HEATMAP_SQL = """
SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pp,
       CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pp,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_char_entropy(sf_dir: str):
    """LLM18 — corpus character-level Shannon entropy (bits/char): the
    zero-parameter complement of [[docs_compress_ratio]]'s zlib proxy —
    natural English sits ~4.1 bits/char over raw characters; synthetic
    or template-heavy corpora collapse lower. Exact int64 per-character
    counts from per-batch combiners; the ≤ |alphabet| rows fold on the
    driver in sorted-character order, 4 dp (the events_js_drift float
    contract).

    Scale shape: text never shuffles — only (char, count) partials."""
    import math as _math

    docs = read_table(sf_dir, "documents", columns=["text"],
                      rows_per_block=500)

    def counts(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(txt or "")
        ks = sorted(c)
        return pa.table({"ch": pa.array(ks, pa.string()),
                         "n": pa.array([c[k] for k in ks], pa.int64())})

    rows = (docs.map_batches(counts, batch_format="pyarrow")
            .groupby("ch").aggregate(Sum("n", alias_name="n"))
            .take_all())
    total = sum(int(r["n"]) for r in rows)
    ent = 0.0
    for r in sorted(rows, key=lambda r: r["ch"]):
        p = int(r["n"]) / total
        ent -= p * _math.log2(p)
    return pa.table({
        "n_chars": pa.array([total], pa.int64()),
        "n_alphabet": pa.array([len(rows)], pa.int64()),
        "entropy_bits": pa.array([round(ent, 4)], pa.float64())})


_DOCS_CHAR_ENTROPY_SQL = """
WITH c AS (SELECT ch, CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT unnest(string_split(text, '')) AS ch
                 FROM documents)
           GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
SELECT tot.t AS n_chars,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_alphabet,
       ROUND(-SUM((CAST(n AS DOUBLE) / tot.t)
                  * log2(CAST(n AS DOUBLE) / tot.t)), 4) AS entropy_bits
FROM c, tot GROUP BY tot.t
"""


def events_hour_anova(sf_dir: str):
    """G73 — one-way ANOVA of event value by hour-of-day (the "does the
    hour explain spend?" seasonality-strength test; the k-group
    generalization of [[events_ab_ztest]]): F = (SSB/(k−1)) /
    (SSW/(N−k)) and effect size η² = SSB/SST, from the EXACT integer
    per-hour moments (n_h, Σcents, Σcents²).

    Every rational term is cleared by integer quotient+remainder:
    S_h²/n_h = q_h + r_h/n_h and S²/N = Q + R/N, so SSB =
    (Σq_h − Q) + (Σ r_h/n_h − R/N): the first bracket is an exact
    (huge)int both engines share bit-for-bit; the second is a sum of
    ≤24 doubles each in [0,1). The only order-dependent float fold
    left is that residual sum — cross-engine divergence ≤ ~24·ulp(24)
    ≈ 1e-13 ABSOLUTE on SS terms of magnitude ≫1, so the 4-dp F and
    floor-ppm η² cannot flip off a rounding boundary in practice (the
    prior formulation folded ~1e18-magnitude doubles under
    cancellation — ulp ~256).

    Scale shape: one (hour, n, Σ, Σ²) combiner groupby; 24 rows out."""
    import math as _math

    ev = read_table(sf_dir, "events", columns=["ts", "value"])

    def moments(t: pa.Table) -> pa.Table:
        hr = pc.cast(pc.hour(t["ts"]), pa.int64())
        cents = _cents(t["value"])
        sq = pc.multiply(cents, cents)
        return (pa.table({"hr": hr, "n": pa.array(
            np.ones(len(t), np.int64)), "s": cents, "ss": sq})
            .group_by("hr")
            .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
            .rename_columns(["hr", "n", "s", "ss"]))

    rows = (ev.map_batches(moments, batch_format="pyarrow")
            .groupby("hr")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("ss", alias_name="ss")).take_all())
    rows.sort(key=lambda r: int(r["hr"]))
    n_tot = sum(int(r["n"]) for r in rows)
    s_tot = sum(int(r["s"]) for r in rows)
    ss_tot = sum(int(r["ss"]) for r in rows)
    k = len(rows)
    # exact integer quotient parts (mirrored as HUGEINT // in the SQL)
    q_grand, r_grand = divmod(s_tot * s_tot, n_tot)
    qsum = sum(int(r["s"]) * int(r["s"]) // int(r["n"]) for r in rows)
    rsum = 0.0
    for r in rows:                          # sorted hour order
        rsum += (int(r["s"]) * int(r["s"]) % int(r["n"])) / int(r["n"])
    ssb = float(qsum - q_grand) + (rsum - r_grand / n_tot)
    sst = float(ss_tot - q_grand) - r_grand / n_tot
    ssw = sst - ssb
    f = round((ssb / (k - 1)) / (ssw / (n_tot - k)), 4)
    eta2_ppm = int(_math.floor(ssb / sst * 1_000_000))
    return pa.table({
        "n_events": pa.array([n_tot], pa.int64()),
        "k_groups": pa.array([k], pa.int64()),
        "f_stat": pa.array([f], pa.float64()),
        "eta2_ppm": pa.array([eta2_ppm], pa.int64())})


_EVENTS_ANOVA_SQL = """
WITH m AS (SELECT CAST(hour(ts) AS BIGINT) AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                           * CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS ss
           FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(s) AS HUGEINT) AS st,
               CAST(SUM(ss) AS HUGEINT) AS sst_raw,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM m),
parts AS (SELECT CAST(SUM(CAST(s AS HUGEINT) * s // n) AS HUGEINT)
                   AS qsum,
                 SUM(CAST(CAST(s AS HUGEINT) * s % n AS DOUBLE) / n)
                   AS rsum
          FROM m),
fin AS (SELECT tot.nt, tot.k,
               CAST(parts.qsum - (tot.st * tot.st // tot.nt) AS DOUBLE)
                 + (parts.rsum
                    - CAST(tot.st * tot.st % tot.nt AS DOUBLE) / tot.nt)
                 AS ssb,
               CAST(tot.sst_raw - (tot.st * tot.st // tot.nt) AS DOUBLE)
                 - CAST(tot.st * tot.st % tot.nt AS DOUBLE) / tot.nt
                 AS sst
        FROM tot, parts)
SELECT nt AS n_events, k AS k_groups,
       ROUND((ssb / (k - 1)) / ((sst - ssb) / (nt - k)), 4) AS f_stat,
       CAST(FLOOR(ssb / sst * 1000000) AS BIGINT) AS eta2_ppm
FROM fin
"""


def events_welch_ttest(sf_dir: str):
    """G74 — Welch's unequal-variance t-test of event value between the
    two event_id-parity variants (the A/B readout for a CONTINUOUS
    metric; the mean-difference sibling of [[events_ab_ztest]]):
    t = (m1−m0)/√(v1/n1 + v0/n0) with Welch–Satterthwaite df, from the
    EXACT per-variant integer moments (n, Σcents, Σcents²) — both
    engines evaluate the identical expression tree over the same six
    ints, so t at 6 dp and milli-df floor cannot diverge.

    Scale shape: per-batch (variant, n, Σ, Σ²) combiner → 2-row
    groupby; a single row out."""
    ev = read_table(sf_dir, "events", columns=["event_id", "value"])

    def moments(t: pa.Table) -> pa.Table:
        var = pc.cast(pc.bit_wise_and(t["event_id"], pa.scalar(1)),
                      pa.int64())
        cents = _cents(t["value"])
        return (pa.table({"variant": var,
                          "one": pa.array(np.ones(len(t), np.int64)),
                          "s": cents,
                          "ss": pc.multiply(cents, cents)})
                .group_by("variant")
                .aggregate([("one", "sum"), ("s", "sum"), ("ss", "sum")])
                .rename_columns(["variant", "n", "s", "ss"]))

    rows = (ev.map_batches(moments, batch_format="pyarrow")
            .groupby("variant")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("ss", alias_name="ss")).take_all())
    by = {int(r["variant"]): r for r in rows}
    n0, s0, ss0 = (int(by[0][k]) for k in ("n", "s", "ss"))
    n1, s1, ss1 = (int(by[1][k]) for k in ("n", "s", "ss"))
    m0, m1 = s0 / n0, s1 / n1
    v0 = (ss0 - s0 * (s0 / n0)) / (n0 - 1)
    v1 = (ss1 - s1 * (s1 / n1)) / (n1 - 1)
    se2 = v0 / n0 + v1 / n1
    t_stat = (m1 - m0) / np.sqrt(se2)
    df = se2 * se2 / ((v0 / n0) ** 2 / (n0 - 1)
                      + (v1 / n1) ** 2 / (n1 - 1))
    import math as _math
    return pa.table({
        "n_a": pa.array([n0], pa.int64()),
        "n_b": pa.array([n1], pa.int64()),
        "sum_cents_a": pa.array([s0], pa.int64()),
        "sum_cents_b": pa.array([s1], pa.int64()),
        "t_stat": pa.array([round(float(t_stat), 6)], pa.float64()),
        "df_milli": pa.array([int(_math.floor(df * 1000))], pa.int64())})


_EVENTS_WELCH_SQL = """
WITH m AS (SELECT event_id % 2 AS variant,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                           * CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS ss
           FROM events GROUP BY 1),
w AS (SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
             MAX(CASE WHEN variant = 1 THEN n END) AS n1,
             MAX(CASE WHEN variant = 0 THEN s END) AS s0,
             MAX(CASE WHEN variant = 1 THEN s END) AS s1,
             MAX(CASE WHEN variant = 0 THEN ss END) AS ss0,
             MAX(CASE WHEN variant = 1 THEN ss END) AS ss1
      FROM m),
c AS (SELECT n0, n1, s0, s1,
             (ss0 - s0 * (CAST(s0 AS DOUBLE) / n0)) / (n0 - 1) AS v0,
             (ss1 - s1 * (CAST(s1 AS DOUBLE) / n1)) / (n1 - 1) AS v1
      FROM w)
SELECT CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
       CAST(s0 AS BIGINT) AS sum_cents_a,
       CAST(s1 AS BIGINT) AS sum_cents_b,
       ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
             / SQRT(v0 / n0 + v1 / n1), 6) AS t_stat,
       CAST(FLOOR((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
                  / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                     + (v1 / n1) * (v1 / n1) / (n1 - 1))
                  * 1000) AS BIGINT) AS df_milli
FROM c
"""


def orders_changepoint(sf_dir: str):
    """TS16 — single change-point detection on the daily order-revenue
    series (binary-segmentation step 1 / CUSUM's offline cousin,
    [[events_cusum_drift]]): the split t maximizing the between-segment
    sum of squares ⇔ maximizing S_L²/n_L + S_R²/n_R, kept EXACT by
    clearing the rationals over the common denominator —
    score(t) = ((S_L²·n_R + S_R²·n_L) // (n_L·n_R)) // 1e9 in integer
    CENTS with a nano-scaling second division (int64-safe at any sf;
    all operands positive, so both engines truncate identically). Ties break toward the earlier day.

    Scale shape: per-batch (day, Σ) combiner → day-bounded groupby;
    the day series (≤ #days rows, never fact-sized) folds on the
    driver with Python ints."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def daily(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                          format="%Y-%m-%d")
        return (pa.table({"day": day, "c": _cents(t["o_totalprice"])})
                .group_by("day").aggregate([("c", "sum")])
                .rename_columns(["day", "c"]))

    rows = (orders.map_batches(daily, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("c", alias_name="c"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    vals = [int(r["c"]) for r in rows]
    days = [r["day"] for r in rows]
    total = sum(vals)
    n = len(vals)
    best = None
    ps = 0
    for t in range(1, n):
        ps += vals[t - 1]
        sl, sr = ps, total - ps
        nl, nr = t, n - t
        # two-step scaled division (mirrored verbatim in the SQL);
        # nano-scaling keeps the score int64 at any sf
        score = ((sl * sl * nr + sr * sr * nl) // (nl * nr)) \
            // 1_000_000_000
        if best is None or score > best[0]:
            best = (score, t)
    score, t = best
    # split_day = LAST day of the left segment (days[t-1]), matching
    # the SQL's inclusive running-sum row
    return pa.table({
        "split_day": pa.array([days[t - 1]], pa.string()),
        "n_left": pa.array([t], pa.int64()),
        "n_right": pa.array([n - t], pa.int64()),
        "score": pa.array([score], pa.int64())})


_ORDERS_CHANGEPOINT_SQL = """
WITH d AS (SELECT strftime(CAST(o_orderdate AS TIMESTAMP),
                           '%Y-%m-%d') AS day,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS HUGEINT) AS c
           FROM orders GROUP BY 1),
s AS (SELECT day,
             CAST(SUM(c) OVER (ORDER BY day) AS HUGEINT) AS ps,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS HUGEINT) AS rn,
             CAST(COUNT(*) OVER () AS HUGEINT) AS nt,
             CAST(SUM(c) OVER () AS HUGEINT) AS st
      FROM d),
sc AS (SELECT day, rn, nt - rn AS nr,
              ((ps * ps * (nt - rn) + (st - ps) * (st - ps) * rn)
                // (rn * (nt - rn))) // 1000000000 AS score
       FROM s WHERE rn < nt)
SELECT day AS split_day, CAST(rn AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right, CAST(score AS BIGINT) AS score
FROM sc ORDER BY score DESC, day LIMIT 1
"""


def docs_textrank_terms(sf_dir: str):
    """T31 — TextRank keyword scoring (Mihalcea & Tarau 2004; the
    PageRank-on-word-graph sibling of [[docs_rake_keyphrases]]): nodes
    are terms with corpus frequency ≥ 5, edges are DISTINCT adjacent
    bigrams between qualifying terms (both directions), and 10 damped
    power iterations run in EXACT integer micro-units — contrib(v) =
    s(v) // out_deg(v), s'(w) = 150000 + (85·Σ_in contrib) // 100 — so
    the fold is order-free and both engines match bit-for-bit. Top 20
    by (score, term).

    Scale shape: token/bigram count combiners collapse per batch; the
    word GRAPH is vocabulary-bounded (≪ corpus), so the iterations run
    on the driver over the collected edge list — same bounded-vocab
    contract as the unigram-NLL scorer. The SQL oracle unrolls the 10
    iterations as chained CTEs."""
    from collections import Counter

    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["text"],
                      rows_per_block=2000)

    def bigram_partial(t: pa.Table) -> pa.Table:
        c = Counter()
        u = Counter()
        for txt in t["text"].to_pylist():
            toks = _TERM_RE.findall((txt or "").lower())
            u.update(toks)
            c.update(zip(toks, toks[1:]))
        ks = list(c)
        uk = list(u)
        return pa.table({
            "w1": pa.array([k[0] for k in ks] + uk, pa.string()),
            "w2": pa.array([k[1] for k in ks] + [""] * len(uk),
                           pa.string()),
            "n": pa.array([c[k] for k in ks] + [u[k] for k in uk],
                          pa.int64())})

    agg = (docs.map_batches(bigram_partial, batch_format="pyarrow")
           .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    uni = agg[agg["w2"] == ""]
    vocab = set(uni.loc[uni["n"] >= 5, "w1"])
    big = agg[(agg["w2"] != "") & agg["w1"].isin(vocab)
              & agg["w2"].isin(vocab)]
    # undirected TextRank graph as two directed edge sets, DISTINCT
    pairs = set(zip(big["w1"], big["w2"]))
    edges: "dict[str, list[str]]" = {}
    for a, b in pairs:
        if a == b:
            continue
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    for k in edges:
        edges[k] = sorted(set(edges[k]))
    nodes = sorted(vocab)
    deg = {w: len(edges.get(w, ())) for w in nodes}
    s = {w: 1_000_000 for w in nodes}
    for _ in range(10):
        contrib = {w: s[w] // deg[w] for w in nodes if deg[w]}
        nxt = {}
        for w in nodes:
            inc = sum(contrib.get(v, 0) for v in edges.get(w, ()))
            nxt[w] = 150_000 + (85 * inc) // 100
        s = nxt
    top = sorted(nodes, key=lambda w: (-s[w], w))[:20]
    return pa.table({
        "term": pa.array(top, pa.string()),
        "score_micro": pa.array([s[w] for w in top], pa.int64()),
        "degree": pa.array([deg[w] for w in top], pa.int64())})


def _textrank_sql() -> str:
    head = """
WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
ug AS (SELECT toks[i] AS term
       FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)),
un AS (SELECT term, COUNT(*) AS n FROM ug GROUP BY 1),
nodes AS (SELECT term FROM un WHERE n >= 5),
bg AS (SELECT DISTINCT toks[i] AS a, toks[i + 1] AS b
       FROM t, UNNEST(generate_series(1, greatest(len(toks) - 1, 0)))
               AS u(i)
       WHERE toks[i] <> toks[i + 1]
         AND toks[i] IN (SELECT term FROM nodes)
         AND toks[i + 1] IN (SELECT term FROM nodes)),
eg AS (SELECT a AS w1, b AS w2 FROM bg
       UNION SELECT b, a FROM bg),
dg AS (SELECT w1 AS term, CAST(COUNT(*) AS BIGINT) AS deg
       FROM eg GROUP BY 1),
it0 AS (SELECT term, CAST(1000000 AS BIGINT) AS s FROM nodes)"""
    step = """,
it{i} AS (SELECT n.term,
        CAST(150000 + (85 * COALESCE(x.inc, 0)) // 100 AS BIGINT) AS s
        FROM nodes n LEFT JOIN
          (SELECT e.w2 AS term, SUM(p.s // d.deg) AS inc
           FROM it{prev} p JOIN eg e ON e.w1 = p.term
                JOIN dg d ON d.term = p.term
           GROUP BY 1) x ON x.term = n.term)"""
    tail = """
SELECT n.term, it10.s AS score_micro,
       CAST(COALESCE(dg.deg, 0) AS BIGINT) AS degree
FROM nodes n JOIN it10 ON it10.term = n.term
LEFT JOIN dg ON dg.term = n.term
ORDER BY it10.s DESC, n.term LIMIT 20
"""
    return head + "".join(step.format(i=i, prev=i - 1)
                          for i in range(1, 11)) + tail


_DOCS_TEXTRANK_SQL = _textrank_sql()


def events_holt_winters(sf_dir: str):
    """TS17 — additive Holt–Winters triple exponential smoothing over
    the daily event-revenue series (period m=7; α=β=γ=1/4), the
    level/trend/seasonal decomposition a forecasting pipeline keeps
    warm; the recursive sibling of [[events_seasonal_decomp]] /
    [[events_user_ewma]]. All three recurrences run in EXACT integer
    cents with one TRUNCATING division by 4 per update — mirroring
    DuckDB's `//` (which truncates toward zero on negatives, unlike
    Python's floor; the engine uses the same truncation) — so the
    final (level, trend, s1..s7) row matches bit-for-bit. Updates:
    l_t = trunc((v_t − c_{t−m} + 3·(l_{t−1}+b_{t−1})) / 4),
    b_t = trunc((l_t − l_{t−1} + 3·b_{t−1}) / 4),
    c_t = trunc((v_t − l_t + 3·c_{t−m}) / 4); init l_1=v_1, b_1=0,
    c_{≤0}=0. The SQL oracle carries the m seasonal states as a LIST
    column through a recursive CTE.

    Scale shape: per-batch (day, Σcents) combiner → day-bounded
    groupby; the ≤#days series folds on the driver."""
    ev = read_table(sf_dir, "events", columns=["ts", "value"])

    def daily(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        return (pa.table({"day": day, "c": _cents(t["value"])})
                .group_by("day").aggregate([("c", "sum")])
                .rename_columns(["day", "c"]))

    rows = (ev.map_batches(daily, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("c", alias_name="c"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    vals = [int(r["c"]) for r in rows]

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    level, trend = vals[0], 0
    seas = [0] * 7
    for t in range(1, len(vals)):
        v = vals[t]
        c_old = seas[0]
        l_new = tdiv(v - c_old + 3 * (level + trend), 4)
        b_new = tdiv(l_new - level + 3 * trend, 4)
        c_new = tdiv(v - l_new + 3 * c_old, 4)
        level, trend = l_new, b_new
        seas = seas[1:] + [c_new]
    cols = {"level_cents": pa.array([level], pa.int64()),
            "trend_cents": pa.array([trend], pa.int64())}
    for i in range(7):
        cols[f"s{i + 1}"] = pa.array([seas[i]], pa.int64())
    return pa.table(cols)


_EVENTS_HW_SQL = """
WITH RECURSIVE d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                            CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                                 AS BIGINT) AS v
                     FROM events GROUP BY 1),
o AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS nt
      FROM d),
hw AS (
  SELECT CAST(1 AS BIGINT) AS rn,
         (SELECT v FROM o WHERE rn = 1) AS l,
         CAST(0 AS BIGINT) AS b,
         [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS cs,
         (SELECT nt FROM o LIMIT 1) AS nt
  UNION ALL
  SELECT hw.rn + 1,
         ((SELECT v FROM o WHERE o.rn = hw.rn + 1) - cs[1]
          + 3 * (l + b)) // 4,
         (((SELECT v FROM o WHERE o.rn = hw.rn + 1) - cs[1]
           + 3 * (l + b)) // 4 - l + 3 * b) // 4,
         cs[2:7] ||
         [((SELECT v FROM o WHERE o.rn = hw.rn + 1)
           - ((SELECT v FROM o WHERE o.rn = hw.rn + 1) - cs[1]
              + 3 * (l + b)) // 4
           + 3 * cs[1]) // 4],
         nt
  FROM hw WHERE hw.rn < hw.nt)
SELECT l AS level_cents, b AS trend_cents,
       cs[1] AS s1, cs[2] AS s2, cs[3] AS s3, cs[4] AS s4,
       cs[5] AS s5, cs[6] AS s6, cs[7] AS s7
FROM hw WHERE rn = nt
"""


def events_levene_bf(sf_dir: str):
    """G75 — Brown–Forsythe test (Levene with group medians) for equal
    spread of event value across event types — the robust
    variance-homogeneity gate run before trusting [[events_hour_anova]]:
    F over absolute deviations from each group's lower median
    (quantile_disc semantics), all moments exact integers, rationals
    cleared by quotient+remainder exactly as in the ANOVA (residual
    float fold bounded by ~1e-13 absolute).

    Scale shape: pass 1 = per-type lower median (type-bounded groupby);
    medians broadcast as a dict; pass 2 = per-batch (type, n, Σd, Σd²)
    combiner; one row out."""
    import math as _math

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "v": _cents(t["value"])})

    cv = ev.map_batches(cents, batch_format="pyarrow").materialize()

    def med_part(g: pd.DataFrame) -> pa.Table:
        rows_t, rows_m = [], []
        for et, grp in g.groupby("event_type", sort=False):
            v = np.sort(grp["v"].to_numpy(np.int64))
            rows_t.append(et)
            rows_m.append(int(v[max(1, _math.ceil(0.5 * len(v))) - 1]))
        return pa.table({"event_type": pa.array(rows_t, pa.string()),
                         "m": pa.array(rows_m, pa.int64())})

    med_rows = (cv.map_batches(
        lambda t: add_bucket(t, ["event_type"], 8, "_p"),
        batch_format="pyarrow")
        .groupby("_p").map_groups(med_part, batch_format="pandas")
        .take_all())
    med_ref = ray.put({r["event_type"]: int(r["m"]) for r in med_rows})

    def moments(t: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        med = pa.array([m[e] for e in t["event_type"].to_pylist()],
                       pa.int64())
        d = pc.abs(pc.subtract(t["v"], med))
        return (pa.table({"event_type": t["event_type"],
                          "one": pa.array(np.ones(len(t), np.int64)),
                          "s": d, "ss": pc.multiply(d, d)})
                .group_by("event_type")
                .aggregate([("one", "sum"), ("s", "sum"), ("ss", "sum")])
                .rename_columns(["event_type", "n", "s", "ss"]))

    rows = (cv.map_batches(moments, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="s"),
                       Sum("ss", alias_name="ss")).take_all())
    rows.sort(key=lambda r: r["event_type"])
    n_tot = sum(int(r["n"]) for r in rows)
    s_tot = sum(int(r["s"]) for r in rows)
    ss_tot = sum(int(r["ss"]) for r in rows)
    k = len(rows)
    q_grand, r_grand = divmod(s_tot * s_tot, n_tot)
    qsum = sum(int(r["s"]) * int(r["s"]) // int(r["n"]) for r in rows)
    rsum = 0.0
    for r in rows:                          # sorted type order
        rsum += (int(r["s"]) * int(r["s"]) % int(r["n"])) / int(r["n"])
    ssb = float(qsum - q_grand) + (rsum - r_grand / n_tot)
    sst = float(ss_tot - q_grand) - r_grand / n_tot
    f = round((ssb / (k - 1)) / ((sst - ssb) / (n_tot - k)), 4)
    return pa.table({
        "n_events": pa.array([n_tot], pa.int64()),
        "k_groups": pa.array([k], pa.int64()),
        "f_stat": pa.array([f], pa.float64())})


_EVENTS_LEVENE_SQL = """
WITH c AS (SELECT event_type,
                  CAST(ROUND(value * 100) AS BIGINT) AS v
           FROM events),
med AS (SELECT event_type, quantile_disc(v, 0.5) AS m
        FROM c GROUP BY 1),
d AS (SELECT c.event_type, ABS(c.v - med.m) AS dv
      FROM c JOIN med USING (event_type)),
m2 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(dv) AS HUGEINT) AS s,
              CAST(SUM(CAST(dv AS HUGEINT) * dv) AS HUGEINT) AS ss
       FROM d GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(s) AS HUGEINT) AS st,
               CAST(SUM(ss) AS HUGEINT) AS sst_raw,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM m2),
parts AS (SELECT CAST(SUM(s * s // n) AS HUGEINT) AS qsum,
                 SUM(CAST(s * s % n AS DOUBLE) / n) AS rsum
          FROM m2),
fin AS (SELECT tot.nt, tot.k,
               CAST(parts.qsum - (tot.st * tot.st // tot.nt) AS DOUBLE)
                 + (parts.rsum
                    - CAST(tot.st * tot.st % tot.nt AS DOUBLE) / tot.nt)
                 AS ssb,
               CAST(tot.sst_raw - (tot.st * tot.st // tot.nt) AS DOUBLE)
                 - CAST(tot.st * tot.st % tot.nt AS DOUBLE) / tot.nt
                 AS sst
        FROM tot, parts)
SELECT nt AS n_events, k AS k_groups,
       ROUND((ssb / (k - 1)) / ((sst - ssb) / (nt - k)), 4) AS f_stat
FROM fin
"""


def orders_mann_kendall(sf_dir: str):
    """TS18 — Mann–Kendall monotone-trend test on the daily
    order-revenue series (the nonparametric sibling of
    [[orders_theil_sen]]): S = Σ_{i<j} sign(v_j − v_i), tie-corrected
    Var·18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5) as EXACT integers, z
    from the identical continuity-corrected expression in both engines
    (6 dp).

    Scale shape: per-batch (day, Σcents) combiner → day-bounded
    groupby; the ≤#days series folds on the driver (vectorized sign
    matrix)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderdate", "o_totalprice"])

    def daily(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.cast(t["o_orderdate"], pa.timestamp("us")),
                          format="%Y-%m-%d")
        return (pa.table({"day": day, "c": _cents(t["o_totalprice"])})
                .group_by("day").aggregate([("c", "sum")])
                .rename_columns(["day", "c"]))

    rows = (orders.map_batches(daily, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("c", alias_name="c"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    v = np.array([int(r["c"]) for r in rows], np.int64)
    n = len(v)
    sgn = np.sign(v[None, :] - v[:, None])
    s_stat = int(np.triu(sgn, k=1).sum())
    _vals, counts = np.unique(v, return_counts=True)
    tie_term = int(sum(int(t) * (int(t) - 1) * (2 * int(t) + 5)
                       for t in counts if t > 1))
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    if s_stat > 0:
        z = (s_stat - 1) / np.sqrt(var18 / 18.0)
    elif s_stat < 0:
        z = (s_stat + 1) / np.sqrt(var18 / 18.0)
    else:
        z = 0.0
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "s_stat": pa.array([s_stat], pa.int64()),
        "var18": pa.array([var18], pa.int64()),
        "z": pa.array([round(float(z), 6)], pa.float64())})


_ORDERS_MK_SQL = """
WITH d AS (SELECT strftime(CAST(o_orderdate AS TIMESTAMP),
                           '%Y-%m-%d') AS day,
                  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS v
           FROM orders GROUP BY 1),
st AS (SELECT CAST(SUM(CASE WHEN b.v > a.v THEN 1
                            WHEN b.v < a.v THEN -1 ELSE 0 END)
               AS BIGINT) AS s
       FROM d a JOIN d b ON a.day < b.day),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
ties AS (SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5))
                              AS BIGINT), 0) AS tt
         FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
               FROM d GROUP BY v HAVING COUNT(*) > 1)),
fin AS (SELECT nn.n, st.s,
               nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt AS var18
        FROM nn, st, ties)
SELECT n AS n_days, s AS s_stat, var18,
       ROUND(CASE WHEN s > 0 THEN (s - 1) / SQRT(var18 / 18.0)
                  WHEN s < 0 THEN (s + 1) / SQRT(var18 / 18.0)
                  ELSE 0.0 END, 6) AS z
FROM fin
"""


def docs_wordcount_auc(sf_dir: str):
    """LLM20 — ranking AUC of the word-count score against the
    length≥300 weak label (the threshold-free metric for quality
    models like [[docs_quality_logreg]]): AUC via the midrank /
    rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺·n⁻), kept EXACT in
    integers — 2·midrank = 2·rank_min + (ties−1), and the final value
    reported as auc_ppm = (R2⁺ − n⁺·(n⁺+1)) · 10⁶ // (2·n⁺·n⁻) in
    HUGEINT. Zero float anywhere.

    Scale shape: per-doc (score, label) rows; the rank attach is one
    bounded-score groupby (scores are small ints) — score counts fold
    to cumulative min-ranks on the driver (score-cardinality-bounded),
    then a per-batch Σ2·midrank combiner."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def feats(t: pa.Table) -> pa.Table:
        score = pc.cast(pc.count_substring_regex(t["text"], r"\S+"),
                        pa.int64())
        y = pc.cast(pc.greater_equal(pc.utf8_length(t["text"]),
                                     pa.scalar(300)), pa.int64())
        return (pa.table({"score": score, "y": y,
                          "one": pa.array(np.ones(len(t), np.int64))})
                .group_by(["score", "y"]).aggregate([("one", "sum")])
                .rename_columns(["score", "y", "n"]))

    rows = (docs.map_batches(feats, batch_format="pyarrow")
            .groupby(["score", "y"]).aggregate(Sum("n", alias_name="n"))
            .take_all())
    agg: "dict[int, list[int]]" = {}
    for r in rows:
        a = agg.setdefault(int(r["score"]), [0, 0])
        a[int(r["y"])] += int(r["n"])
    n_pos = sum(a[1] for a in agg.values())
    n_neg = sum(a[0] for a in agg.values())
    r2_pos = 0
    rank_min = 1
    for sc in sorted(agg):
        cnt = agg[sc][0] + agg[sc][1]
        r2_mid = 2 * rank_min + (cnt - 1)
        r2_pos += agg[sc][1] * r2_mid
        rank_min += cnt
    auc_ppm = (r2_pos - n_pos * (n_pos + 1)) * 1_000_000 \
        // (2 * n_pos * n_neg)
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc_ppm": pa.array([auc_ppm], pa.int64())})


_DOCS_AUC_SQL = """
WITH f AS (SELECT CAST(length(regexp_extract_all(text, '\\S+'))
                       AS BIGINT) AS score,
                  CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS y
           FROM documents),
r AS (SELECT score, y,
             CAST(RANK() OVER (ORDER BY score) AS HUGEINT) AS rmin,
             CAST(COUNT(*) OVER (PARTITION BY score) AS HUGEINT) AS cnt
      FROM f),
agg AS (SELECT CAST(SUM(CASE WHEN y = 1 THEN 2 * rmin + (cnt - 1)
                             ELSE 0 END) AS HUGEINT) AS r2_pos,
               CAST(SUM(y) AS HUGEINT) AS n_pos,
               CAST(SUM(1 - y) AS HUGEINT) AS n_neg
        FROM r)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST((r2_pos - n_pos * (n_pos + 1)) * 1000000
            // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
FROM agg
"""


def events_mase_naive7(sf_dir: str):
    """TS19 — MASE forecast backtest of the seasonal-naïve-7 model on
    the daily event-revenue series (Hyndman & Koehler 2006; the
    accuracy yardstick for [[events_holt_winters]]): scaled error =
    MAE(v_t vs v_{t−7}) / MAE(v_t vs v_{t−1}), reported exactly as
    mase_ppm = ΣAE₇·n₁·10⁶ // (n₇·ΣAE₁) over integer cents.

    Scale shape: day-bounded series on the driver after the (day, Σ)
    combiner groupby."""
    ev = read_table(sf_dir, "events", columns=["ts", "value"])

    def daily(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        return (pa.table({"day": day, "c": _cents(t["value"])})
                .group_by("day").aggregate([("c", "sum")])
                .rename_columns(["day", "c"]))

    rows = (ev.map_batches(daily, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("c", alias_name="c"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    v = [int(r["c"]) for r in rows]
    n = len(v)
    sae7 = sum(abs(v[t] - v[t - 7]) for t in range(7, n))
    sae1 = sum(abs(v[t] - v[t - 1]) for t in range(1, n))
    n7, n1 = n - 7, n - 1
    return pa.table({
        "n_days": pa.array([n], pa.int64()),
        "sae7_cents": pa.array([sae7], pa.int64()),
        "sae1_cents": pa.array([sae1], pa.int64()),
        "mase_ppm": pa.array([sae7 * n1 * 1_000_000 // (n7 * sae1)],
                             pa.int64())})


_EVENTS_MASE_SQL = """
WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                       AS BIGINT) AS v
           FROM events GROUP BY 1),
l AS (SELECT v,
             LAG(v, 1) OVER (ORDER BY day) AS v1,
             LAG(v, 7) OVER (ORDER BY day) AS v7
      FROM d),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN v7 IS NOT NULL
                             THEN ABS(v - v7) END) AS HUGEINT) AS sae7,
               CAST(SUM(CASE WHEN v1 IS NOT NULL
                             THEN ABS(v - v1) END) AS HUGEINT) AS sae1
        FROM l)
SELECT n AS n_days, CAST(sae7 AS BIGINT) AS sae7_cents,
       CAST(sae1 AS BIGINT) AS sae1_cents,
       CAST(sae7 * (n - 1) * 1000000 // ((n - 7) * sae1) AS BIGINT)
           AS mase_ppm
FROM agg
"""


def emb_mmr_select(sf_dir: str):
    """V12 — Maximal Marginal Relevance diverse top-5 (Carbonell &
    Goldstein 1998; the diversity-aware selection step a training-data
    curator runs after [[emb_knn_bruteforce]] retrieval): greedy picks
    maximizing 0.7·relevance − 0.3·max-similarity-to-selected, with
    BOTH terms pre-rounded to integer basis points so the greedy
    argmax compares exact ints in both engines — score_bp =
    7·rel_bp − 3·max_sim_bp, ties toward the smaller vec_id.

    Scale shape: the candidate cut is the distributed brute-force
    top-20 scan (float32 kernels, partial top-k per block); only the
    20 candidate vectors are point-read back and the 5-step greedy
    runs on the driver over a 20×20 int matrix. The SQL oracle unrolls
    the 5 selection stages as chained CTEs over
    list_cosine_similarity."""
    from .functions.similarity import knn_bruteforce
    from .sources.tables import fetch_value

    ds = read_table(sf_dir, "embeddings",
                    columns=["vec_id", "embedding"], rows_per_block=2_000)
    q = np.array(fetch_value(sf_dir, "embeddings", key_col="vec_id",
                             key=0, value_col="embedding"), np.float64)
    cand = knn_bruteforce(
        ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["vec_id"], pa.scalar(0))),
            batch_format="pyarrow"),
        q[None, :], k=20)
    ids = sorted(int(x) for x in cand["vec_id"])

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"],
                        filters=[("vec_id", "in", ids)])
    vid = tbl["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack([np.asarray(v, np.float64)
                    for v in tbl["embedding"].to_pylist()])

    def bp(x: np.ndarray) -> np.ndarray:
        return (np.sign(x) * np.floor(np.abs(x) * 10000 + 0.5)) \
            .astype(np.int64)

    nrm = np.linalg.norm(mat, axis=1)
    rel = bp((mat @ q) / (nrm * np.linalg.norm(q)))
    sim = bp((mat @ mat.T) / (nrm[:, None] * nrm[None, :]))

    order = np.argsort(vid)                 # deterministic id order
    vid, rel, sim, mat = vid[order], rel[order], \
        sim[order][:, order], mat[order]
    picked: "list[int]" = []
    out_rows = []
    remaining = list(range(len(vid)))
    for pick in range(1, 6):
        best = None
        for i in remaining:                 # ascending vec_id = tiebreak
            msim = max((int(sim[i, j]) for j in picked), default=0)
            score = 7 * int(rel[i]) - 3 * msim
            if best is None or score > best[0]:
                best = (score, i)
        score, i = best
        picked.append(i)
        remaining.remove(i)
        out_rows.append((pick, int(vid[i]), int(rel[i]), score))
    return pa.table({
        "pick": pa.array([r[0] for r in out_rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in out_rows], pa.int64()),
        "rel_bp": pa.array([r[2] for r in out_rows], pa.int64()),
        "score_bp": pa.array([r[3] for r in out_rows], pa.int64())})


def _mmr_sql() -> str:
    head = """
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
cand AS (SELECT e.vec_id, e.embedding,
                CAST(round(list_cosine_similarity(
                    CAST(e.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])) * 10000) AS BIGINT)
                    AS rel_bp
         FROM embeddings e, q WHERE e.vec_id <> 0
         ORDER BY list_cosine_similarity(
                    CAST(e.embedding AS DOUBLE[]),
                    CAST(q.embedding AS DOUBLE[])) DESC, e.vec_id
         LIMIT 20),
sim AS (SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) * 10000) AS BIGINT)
                   AS s
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
s1 AS (SELECT vec_id, rel_bp, 7 * rel_bp AS score_bp, 1 AS pick
       FROM cand ORDER BY score_bp DESC, vec_id LIMIT 1),
p1 AS (SELECT vec_id FROM s1)"""
    step = """,
s{i} AS (SELECT c.vec_id, c.rel_bp,
               7 * c.rel_bp - 3 * (SELECT MAX(s.s) FROM sim s
                                   WHERE s.va = c.vec_id
                                     AND s.vb IN (SELECT vec_id
                                                  FROM p{prev}))
                   AS score_bp, {i} AS pick
        FROM cand c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM p{prev})
        ORDER BY score_bp DESC, c.vec_id LIMIT 1),
p{i} AS (SELECT vec_id FROM p{prev}
         UNION ALL SELECT vec_id FROM s{i})"""
    tail = """
SELECT pick, vec_id, rel_bp, score_bp
FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
      UNION ALL SELECT * FROM s5)
ORDER BY pick
"""
    return head + "".join(step.format(i=i, prev=i - 1)
                          for i in range(2, 6)) + tail


_EMB_MMR_SQL = _mmr_sql()


def kg_wl_fingerprint(sf_dir: str):
    """KG21 — 2-round Weisfeiler–Lehman refinement over the flagship KG
    (Weisfeiler & Leman 1968; Shervashidze 2011 — the graph-isomorphism
    / GNN-expressivity fingerprint): label₀(v) = "out/in" degree pair;
    label_{i+1}(v) = md5-hex8 of label_i(v) plus the SORTED multisets of
    (pred, neighbor-label) over out- and in-edges. Returns the top-20
    (wl2_label, n_nodes) histogram — the structural signature two KG
    snapshots can be diffed by. Deterministic by construction (sorted
    multisets, fixed hash). Rows-only; golden = pure-pandas recompute
    (tests/test_flagship.py).

    Scale shape: 2 rounds of (edges ⋈ labels → per-node sorted fold) via
    hash-bucketed map_groups (functions/bucketed.py) — the label table
    shuffles by node, never the corpus."""
    import hashlib as _hl

    from .functions.bucketed import bucketed_groups

    edges = _kg_run(sf_dir)["edges"] \
        .map_batches(lambda t: t.select(["subj_id", "pred", "obj_id"]),
                     batch_format="pyarrow").materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"node": t["subj_id"], "pred": t["pred"],
                      "nbr": t["obj_id"],
                      "dir": pa.array(["o"] * len(t), pa.string())}),
            pa.table({"node": t["obj_id"], "pred": t["pred"],
                      "nbr": t["subj_id"],
                      "dir": pa.array(["i"] * len(t), pa.string())})])

    adj = edges.map_batches(endpoints, batch_format="pyarrow") \
        .materialize()

    deg_schema = pa.schema([("node", pa.string()), ("lbl", pa.string())])

    def deg_label(g: pd.DataFrame) -> pa.Table:
        pv = g.pivot_table(index="node", columns="dir", values="nbr",
                           aggfunc="count", fill_value=0)
        out_c = pv["o"] if "o" in pv.columns else 0
        in_c = pv["i"] if "i" in pv.columns else 0
        d = pd.DataFrame({"node": pv.index,
                          "lbl": (pd.Series(out_c, index=pv.index)
                                  .astype(int).astype(str)
                                  + "/" +
                                  pd.Series(in_c, index=pv.index)
                                  .astype(int).astype(str))})
        return pa.Table.from_pandas(d, preserve_index=False) \
            .cast(deg_schema)

    labels = bucketed_groups(adj, ["node"], deg_label,
                             out_schema=deg_schema).materialize()

    for _round in range(2):
        lbl_ref = ray.put({r["node"]: r["lbl"]
                           for r in labels.take_all()})

        def refine(g: pd.DataFrame, _ref=lbl_ref) -> pa.Table:
            m = ray.get(_ref)
            rows_n, rows_l = [], []
            for node, grp in g.groupby("node", sort=False):
                parts = sorted(
                    f"{d}:{p}:{m[v]}" for d, p, v in
                    zip(grp["dir"], grp["pred"], grp["nbr"]))
                sig = m[node] + "|" + ",".join(parts)
                rows_n.append(node)
                rows_l.append(_hl.md5(sig.encode()).hexdigest()[:8])
            return pa.table({"node": pa.array(rows_n, pa.string()),
                             "lbl": pa.array(rows_l, pa.string())})

        labels = bucketed_groups(adj, ["node"], refine,
                                 out_schema=deg_schema).materialize()

    hist = (labels.groupby("lbl").aggregate(Count(alias_name="n_nodes"))
            .rename_columns({"lbl": "wl2_label"}))
    return (hist.sort(["n_nodes", "wl2_label"], descending=[True, False])
            .limit(20))


def docs_bigram_cond_entropy(sf_dir: str):
    """T32 — conditional bigram entropy H(W₂|W₁) of the corpus in nats
    (the predictability / redundancy measure next to
    [[docs_char_entropy]] and [[docs_collocations]]): H = −Σ_{ab}
    (n_ab/N) ln(n_ab/n_a•) over adjacent-word bigrams, n_a• = Σ_b n_ab.
    Counts are exact ints; the final fold follows the char-entropy
    precedent — the Ray side sums in sorted (w1, w2) order, the oracle
    in SQL SUM order, and the 4-dp rounding absorbs the ~1e-12 relative
    float divergence over the vocabulary-bounded term count.

    Scale shape: per-batch Counter combiners; only (w1, w2, n) rows
    shuffle; the vocab-bounded bigram table folds on the driver."""
    import math as _math

    from collections import Counter

    from .functions.terms import _TERM_RE

    docs = read_table(sf_dir, "documents", columns=["text"],
                      rows_per_block=2000)

    def bigram_partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for txt in t["text"].to_pylist():
            toks = _TERM_RE.findall((txt or "").lower())
            c.update(zip(toks, toks[1:]))
        ks = list(c)
        return pa.table({
            "w1": pa.array([k[0] for k in ks], pa.string()),
            "w2": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([c[k] for k in ks], pa.int64())})

    rows = (docs.map_batches(bigram_partial, batch_format="pyarrow")
            .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
            .take_all())
    rows.sort(key=lambda r: (r["w1"], r["w2"]))
    first = Counter()
    for r in rows:
        first[r["w1"]] += int(r["n"])
    total = sum(first.values())
    h = 0.0
    for r in rows:                      # sorted (w1, w2) order
        nab = int(r["n"])
        h -= nab / total * _math.log(nab / first[r["w1"]])
    return pa.table({
        "n_bigrams": pa.array([total], pa.int64()),
        "n_bigram_types": pa.array([len(rows)], pa.int64()),
        "cond_entropy_nats": pa.array([round(h, 4)], pa.float64())})


_DOCS_CONDH_SQL = """
WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
           FROM documents),
bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
       FROM t, UNNEST(generate_series(1, greatest(len(toks) - 1, 0)))
               AS u(i)),
b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM bg GROUP BY 1, 2),
f AS (SELECT w1, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM b GROUP BY 1),
tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS nt,
               CAST(COUNT(*) AS BIGINT) AS nty
        FROM b)
SELECT tot.nt AS n_bigrams, tot.nty AS n_bigram_types,
       ROUND(-SUM((CAST(b.n_ab AS DOUBLE) / tot.nt)
                  * ln(CAST(b.n_ab AS DOUBLE) / f.n_a)), 4)
           AS cond_entropy_nats
FROM b JOIN f USING (w1), tot GROUP BY tot.nt, tot.nty
"""


def lineitem_simpson_flip(sf_dir: str):
    """G76 — Simpson's-paradox audit of the (quantity, price)
    association (the aggregation-bias gate next to
    [[lineitem_cov_matrix]]): the EXACT integer covariance numerator
    covN = n·Σxy − Σx·Σy overall and per l_returnflag; a group whose
    sign opposes the pooled sign is a paradox flip. All HUGEINT, no
    float anywhere.

    Scale shape: per-batch (flag, n, Σx, Σy, Σxy) combiners; a
    flag-bounded groupby; scalars out."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        c = _cents(t["l_extendedprice"])
        return (pa.table({"flag": t["l_returnflag"],
                          "one": pa.array(np.ones(len(t), np.int64)),
                          "sx": q, "sy": c,
                          "sxy": pc.multiply(q, c)})
                .group_by("flag")
                .aggregate([("one", "sum"), ("sx", "sum"),
                            ("sy", "sum"), ("sxy", "sum")])
                .rename_columns(["flag", "n", "sx", "sy", "sxy"]))

    rows = (li.map_batches(moments, batch_format="pyarrow")
            .groupby("flag")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sx", alias_name="sx"),
                       Sum("sy", alias_name="sy"),
                       Sum("sxy", alias_name="sxy")).take_all())
    rows.sort(key=lambda r: r["flag"])
    n_all = sum(int(r["n"]) for r in rows)
    sx_all = sum(int(r["sx"]) for r in rows)
    sy_all = sum(int(r["sy"]) for r in rows)
    sxy_all = sum(int(r["sxy"]) for r in rows)
    cov_all = n_all * sxy_all - sx_all * sy_all
    sign_all = (cov_all > 0) - (cov_all < 0)
    out = {"flag": [], "n": [], "sign_group": [], "sign_overall": [],
           "flipped": []}
    for r in rows:
        covg = int(r["n"]) * int(r["sxy"]) - int(r["sx"]) * int(r["sy"])
        sg = (covg > 0) - (covg < 0)
        out["flag"].append(r["flag"])
        out["n"].append(int(r["n"]))
        out["sign_group"].append(sg)
        out["sign_overall"].append(sign_all)
        out["flipped"].append(int(sg * sign_all < 0))
    return pa.table({
        "flag": pa.array(out["flag"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "sign_group": pa.array(out["sign_group"], pa.int64()),
        "sign_overall": pa.array(out["sign_overall"], pa.int64()),
        "flipped": pa.array(out["flipped"], pa.int64())})


_LINEITEM_SIMPSON_SQL = """
WITH m AS (SELECT l_returnflag AS flag,
                  CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT)
                      AS sx,
                  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       AS HUGEINT) AS sy,
                  CAST(SUM(CAST(l_quantity AS BIGINT)
                           * CAST(ROUND(l_extendedprice * 100)
                                  AS BIGINT)) AS HUGEINT) AS sxy
           FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
               SUM(sxy) AS sxy
        FROM m),
sa AS (SELECT CASE WHEN tot.n * tot.sxy - tot.sx * tot.sy > 0 THEN 1
                   WHEN tot.n * tot.sxy - tot.sx * tot.sy < 0 THEN -1
                   ELSE 0 END AS s
       FROM tot)
SELECT m.flag, CAST(m.n AS BIGINT) AS n,
       CAST(CASE WHEN m.n * m.sxy - m.sx * m.sy > 0 THEN 1
                 WHEN m.n * m.sxy - m.sx * m.sy < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS sign_group,
       CAST(sa.s AS BIGINT) AS sign_overall,
       CAST(CASE WHEN (CASE WHEN m.n * m.sxy - m.sx * m.sy > 0 THEN 1
                            WHEN m.n * m.sxy - m.sx * m.sy < 0 THEN -1
                            ELSE 0 END) * sa.s < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS flipped
FROM m, sa ORDER BY m.flag
"""


def part_abc_classes(sf_dir: str):
    """W24 — ABC / Pareto inventory classification of parts by revenue
    (the 80/95 cumulative-share cut every planner runs; the class-label
    sibling of the Lorenz/Pareto concentration audits): per-part exact
    cents revenue, globally ranked by (revenue desc, part), class A
    while 5·cum ≤ 4·total, B while 20·cum ≤ 19·total, else C — integer
    cross-multiplication, no float share anywhere.

    Scale shape: per-batch (part, Σcents) combiner → hash-bucketed
    vectorized sum (functions/bucketed.py — the part key is
    near-unique) → `global_running_sum`'s two-pass range-partitioned
    cumulative (driver holds only per-partition offsets) → 3-row
    class groupby."""
    from .functions.bucketed import bucketed_groups
    from .functions.rank import global_running_sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (pa.table({"p": t["l_partkey"],
                          "rev": _cents(t["l_extendedprice"])})
                .group_by("p").aggregate([("rev", "sum")])
                .rename_columns(["p", "rev"]))

    rev_schema = pa.schema([("p", pa.int64()), ("rev", pa.int64())])

    def sum_parts(g: pd.DataFrame) -> pa.Table:
        vc = g.groupby("p", sort=False)["rev"].sum()
        return pa.table({
            "p": pa.array(vc.index.to_numpy(np.int64)),
            "rev": pa.array(vc.to_numpy(np.int64))})

    rev = bucketed_groups(li.map_batches(partial,
                                         batch_format="pyarrow"),
                          ["p"], sum_parts,
                          out_schema=rev_schema).materialize()
    total = int(rev.sum("rev") or 0)
    cum = global_running_sum(rev, "rev", order_by=["rev", "p"],
                             descending=[True, False])

    def classify(t: pa.Table) -> pa.Table:
        c = t["cum"].to_numpy(zero_copy_only=False)
        cls = np.where(5 * c <= 4 * total, "A",
                       np.where(20 * c <= 19 * total, "B", "C"))
        return pa.table({"cls": pa.array(cls, pa.string()),
                         "one": pa.array(np.ones(len(t), np.int64)),
                         "rev": t["rev"]}) \
            .group_by("cls").aggregate([("one", "sum"), ("rev", "sum")]) \
            .rename_columns(["cls", "n_parts", "revenue_cents"])

    return (cum.map_batches(classify, batch_format="pyarrow")
            .groupby("cls")
            .aggregate(Sum("n_parts", alias_name="n_parts"),
                       Sum("revenue_cents", alias_name="revenue_cents"))
            .sort("cls"))


_PART_ABC_SQL = """
WITH r AS (SELECT l_partkey AS p,
                  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS rev
           FROM lineitem GROUP BY 1),
t AS (SELECT CAST(SUM(rev) AS HUGEINT) AS tot FROM r),
c AS (SELECT p, rev,
             CAST(SUM(rev) OVER (ORDER BY rev DESC, p) AS HUGEINT)
                 AS cum
      FROM r),
k AS (SELECT CASE WHEN 5 * c.cum <= 4 * t.tot THEN 'A'
                  WHEN 20 * c.cum <= 19 * t.tot THEN 'B'
                  ELSE 'C' END AS cls,
             rev
      FROM c, t)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents
FROM k GROUP BY 1 ORDER BY 1
"""


_POIS1_CUM = [385749, 771499, 964373, 1028665, 1044738, 1047952,
              1048488, 1048565, 1048574]   # floor(CDF_Poisson(1)·2^20)


def orders_poisson_bootstrap(sf_dir: str):
    """G77 — Poisson bootstrap of total order revenue (Chamandy et al.
    2012, the resampling scheme that actually works at scale: classic
    bootstrap needs random access to n rows per replicate; the Poisson
    approximation gives every row an independent Poisson(1) weight per
    replicate, so B=32 replicates are ONE streaming pass with per-batch
    partial sums — no shuffle of the data, no driver materialization).
    Weights are EXACT-integer deterministic: u = last-5-hex md5 of
    (o_orderkey·64 + b) ∈ [0, 2²⁰), w = inverse-CDF via the fixed
    integer thresholds ``_POIS1_CUM`` — both engines share the
    constants, so every replicate's (n_rows, sum_cents) matches
    bit-for-bit. Output: 32 rows (replicate, n_rows, sum_cents).

    Scale shape: one pass, 32·#blocks partial rows, a 32-row groupby."""
    import hashlib as _hl

    B = 32
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        cum = np.array(_POIS1_CUM, np.int64)
        reps, ns, sums = [], [], []
        for b in range(B):
            u = np.fromiter(
                (int(_hl.md5(str(int(k) * 64 + b).encode())
                     .hexdigest()[-5:], 16) for k in keys),
                np.int64, len(keys))
            w = np.searchsorted(cum, u, side="right")   # Poisson(1)
            reps.append(b)
            ns.append(int(w.sum()))
            sums.append(int((w * cents).sum()))
        return pa.table({"replicate": pa.array(reps, pa.int64()),
                         "n_part": pa.array(ns, pa.int64()),
                         "s_part": pa.array(sums, pa.int64())})

    return (orders.map_batches(partial, batch_format="pyarrow",
                               batch_size=8192)
            .groupby("replicate")
            .aggregate(Sum("n_part", alias_name="n_rows"),
                       Sum("s_part", alias_name="sum_cents"))
            .sort("replicate"))


_ORDERS_BOOTSTRAP_SQL = """
WITH b AS (SELECT UNNEST(generate_series(0, 31)) AS replicate),
u AS (SELECT b.replicate,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
             CAST(('0x' || substring(md5(CAST(o.o_orderkey * 64
                                              + b.replicate AS VARCHAR)),
                                     28, 5)) AS BIGINT) AS h
      FROM orders o, b),
w AS (SELECT replicate, cents,
             CASE WHEN h < 385749 THEN 0
                  WHEN h < 771499 THEN 1
                  WHEN h < 964373 THEN 2
                  WHEN h < 1028665 THEN 3
                  WHEN h < 1044738 THEN 4
                  WHEN h < 1047952 THEN 5
                  WHEN h < 1048488 THEN 6
                  WHEN h < 1048565 THEN 7
                  WHEN h < 1048574 THEN 8
                  ELSE 9 END AS wt
      FROM u)
SELECT replicate, CAST(SUM(wt) AS BIGINT) AS n_rows,
       CAST(SUM(wt * cents) AS BIGINT) AS sum_cents
FROM w GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def queries():
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q6_revenue_filter": q6_revenue_filter,
        "q3_top_orders": q3_top_orders,
        "q5_local_supplier": q5_local_supplier,
        "join_customer_nation_region": join_customer_nation_region,
        "sort_topk_orders": sort_topk_orders,
        "distinct_segments": distinct_segments,
        "group_nation_balance": group_nation_balance,
        "dedup_orders_per_customer": dedup_orders_per_customer,
        "union_key_sources": union_key_sources,
        "part_type_stats": part_type_stats,
        "segment_order_revenue": segment_order_revenue,
        "events_hourly": events_hourly,
        "events_json_extract": events_json_extract,
        "events_user_topk": events_user_topk,
        "events_type_skew": events_type_skew,
        "events_asof_orders": events_asof_orders,
        "events_salted_type_count": events_salted_type_count,
        "events_latest_per_user": events_latest_per_user,
        "events_user_cumspend": events_user_cumspend,
        "events_sessionize": events_sessionize,
        "events_value_quantiles": events_value_quantiles,
        "events_type_approx_users": events_type_approx_users,
        "events_user_gap": events_user_gap,
        "orders_repeat_30d": orders_repeat_30d,
        "events_hour_pivot": events_hour_pivot,
        "events_value_quantiles_cont": events_value_quantiles_cont,
        "events_user_range7d": events_user_range7d,
        "orders_priority_dense_rank": orders_priority_dense_rank,
        "nation_region_cross": nation_region_cross,
        "events_user_rolling3": events_user_rolling3,
        "orders_upsert": orders_upsert,
        "events_cube": events_cube,
        "orders_next_order": orders_next_order,
        "orders_pairs_intersect": orders_pairs_intersect,
        "orders_pairs_except": orders_pairs_except,
        "events_user_twohop": events_user_twohop,
        "docs_jsonl_roundtrip": docs_jsonl_roundtrip,
        "customer_csv_roundtrip": customer_csv_roundtrip,
        "events_user_heavy_hitters": events_user_heavy_hitters,
        "nation_cust_segments": nation_cust_segments,
        "orders_global_rank": orders_global_rank,
        "orders_price_quartile": orders_price_quartile,
        "custs_without_events": custs_without_events,
        "parts_with_lineitems": parts_with_lineitems,
        "orders_hash_sample": orders_hash_sample,
        "part_brand_number": part_brand_number,
        "events_type_median_value": events_type_median_value,
        "events_rollup": events_rollup,
        "docs_top_terms": docs_top_terms,
        "docs_chunks": docs_chunks,
        "docs_training_prep": docs_training_prep,
        "docs_tfidf_knn": docs_tfidf_knn,
        "pages_url_dedup": pages_url_dedup,
        "raw_docs_ingest": raw_docs_ingest,
        "orders_kfold": orders_kfold,
        "docs_lang_count": docs_lang_count,
        "docs_token_counts": docs_token_counts,
        "docs_quality_counts": docs_quality_counts,
        "docs_fingerprint": docs_fingerprint,
        "docs_exact_dedup": docs_exact_dedup,
        "docs_minhash_pairs": docs_minhash_pairs,
        "docs_simhash": docs_simhash,
        "docs_ngram_jaccard": docs_ngram_jaccard,
        "docs_simhash_pairs": docs_simhash_pairs,
        "docs_langid": docs_langid,
        "emb_label_count": emb_label_count,
        "emb_knn_bruteforce": emb_knn_bruteforce,
        "emb_knn_ivf": emb_knn_ivf,
        "emb_cosine_dup_pairs": emb_cosine_dup_pairs,
        "media_image_features": media_image_features,
        "media_audio_features": media_audio_features,
        "media_frame_sample": media_frame_sample,
        "media_real_image_features": media_real_image_features,
        "events_props_redact": events_props_redact,
        "kg_extracted": kg_extracted,
        "kg_triples": kg_triples,
        "kg_mentions": kg_mentions,
        "kg_nodes": kg_nodes,
        "kg_graph": kg_graph,
        "kg_pagerank": kg_pagerank,
        "lineitem_flag_variance": lineitem_flag_variance,
        "lineitem_qty_price_corr": lineitem_qty_price_corr,
        "orders_price_histogram": orders_price_histogram,
        "orders_percent_rank": orders_percent_rank,
        "orders_status_mode_priority": orders_status_mode_priority,
        "events_user_first_last": events_user_first_last,
        "customer_order_counts_outer": customer_order_counts_outer,
        "orders_cume_dist": orders_cume_dist,
        "events_value_locf": events_value_locf,
        "events_user_rolling_avg": events_user_rolling_avg,
        "events_grouping_sets": events_grouping_sets,
        "users_customers_full_outer": users_customers_full_outer,
        "customer_stratified_sample": customer_stratified_sample,
        "events_type_share": events_type_share,
        "orders_priority_quartiles": orders_priority_quartiles,
        "part_name_fuzzy_pairs": part_name_fuzzy_pairs,
        "emb_label_centroids": emb_label_centroids,
        "orders_rank_with_ties": orders_rank_with_ties,
        "events_user_hourly_dense": events_user_hourly_dense,
        "lineitem_latest_shipped": lineitem_latest_shipped,
        "orders_above_cust_avg": orders_above_cust_avg,
        "events_type_distinct_users": events_type_distinct_users,
        "lineitem_weighted_avg_price": lineitem_weighted_avg_price,
        "events_type_transitions": events_type_transitions,
        "events_funnel": events_funnel,
        "events_user_streaks": events_user_streaks,
        "docs_incremental_dedup": docs_incremental_dedup,
        "lineitem_part_pairs": lineitem_part_pairs,
        "q10_returned_customers": q10_returned_customers,
        "q18_large_volume_cust": q18_large_volume_cust,
        "q14_promo_share": q14_promo_share,
        "q22_rich_inactive_custs": q22_rich_inactive_custs,
        "part_graph_triangles": part_graph_triangles,
        "events_user_path": events_user_path,
        "emb_kmeans": emb_kmeans,
        "q4_priority_late_ship": q4_priority_late_ship,
        "q13_custdist": q13_custdist,
        "q17_small_qty_revenue": q17_small_qty_revenue,
        "part_graph_clustering": part_graph_clustering,
        "docs_bm25_topk": docs_bm25_topk,
        "docs_repetition": docs_repetition,
        "docs_pack_blocks": docs_pack_blocks,
        "docs_neardup_survivors": docs_neardup_survivors,
        "q7_nation_trade": q7_nation_trade,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "events_salted_type_join": events_salted_type_join,
        "events_merged_windows": events_merged_windows,
        "docs_kwic": docs_kwic,
        "events_asof_nearest": events_asof_nearest,
        "emb_mmr_topk": emb_mmr_topk,
        "docs_rag_retrieve": docs_rag_retrieve,
        "docs_unigram_nll": docs_unigram_nll,
        "docs_leakfree_folds": docs_leakfree_folds,
        "docs_collocations": docs_collocations,
        "q8_market_share": q8_market_share,
        "q12_priority_shipping": q12_priority_shipping,
        "q15_top_supplier": q15_top_supplier,
        "q16_supplier_counts": q16_supplier_counts,
        "q21_sole_late_supplier": q21_sole_late_supplier,
        "part_attrs_melt": part_attrs_melt,
        "docs_span_dedup": docs_span_dedup,
        "events_tumbling_6h": events_tumbling_6h,
        "events_hopping_3h_1h": events_hopping_3h_1h,
        "q9_profit_by_nation_year": q9_profit_by_nation_year,
        "q11_important_parts": q11_important_parts,
        "docs_bigram_nll": docs_bigram_nll,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q20_dominant_suppliers": q20_dominant_suppliers,
        "customers_fuzzy_name_pairs": customers_fuzzy_name_pairs,
        "docs_curation_funnel": docs_curation_funnel,
        "events_retention_cohorts": events_retention_cohorts,
        "docs_temperature_sample": docs_temperature_sample,
        "docs_quality_logreg": docs_quality_logreg,
        "emb_pca_top_component": emb_pca_top_component,
        "docs_contamination": docs_contamination,
        "emb_semdedup": emb_semdedup,
        "part_graph_kcore": part_graph_kcore,
        "part_graph_degree_hist": part_graph_degree_hist,
        "part_graph_jaccard": part_graph_jaccard,
        "docs_inverted_index": docs_inverted_index,
        "part_graph_bfs": part_graph_bfs,
        "part_graph_components": part_graph_components,
        "events_value_outliers": events_value_outliers,
        "orders_yoy_growth": orders_yoy_growth,
        "events_weekly_active_users": events_weekly_active_users,
        "orders_profile": orders_profile,
        "part_graph_sssp": part_graph_sssp,
        "part_graph_msf": part_graph_msf,
        "events_daily_autocorr": events_daily_autocorr,
        "basket_lift_rules": basket_lift_rules,
        "orders_isotonic_daily": orders_isotonic_daily,
        "events_value_ks": events_value_ks,
        "orders_theilsen_trend": orders_theilsen_trend,
        "customer_t_closeness": customer_t_closeness,
        "orders_xml_roundtrip": orders_xml_roundtrip,
        "docs_nb_source_model": docs_nb_source_model,
        "docs_dsir_weights": docs_dsir_weights,
        "part_graph_diameter": part_graph_diameter,
        "part_graph_modularity": part_graph_modularity,
        "emb_mutual_nn": emb_mutual_nn,
        "events_daily_interp": events_daily_interp,
        "orders_seasonal_decomp": orders_seasonal_decomp,
        "customer_revenue_lorenz": customer_revenue_lorenz,
        "media_video_neardup": media_video_neardup,
        "kg_ontology_audit": kg_ontology_audit,
        "kg_nil_clusters": kg_nil_clusters,
        "kg_functional_conflicts": kg_functional_conflicts,
        "orders_pushdown_scan": orders_pushdown_scan,
        "docs_dedup_impact": docs_dedup_impact,
        "emb_cluster_quality": emb_cluster_quality,
        "orders_storage_audit": orders_storage_audit,
        "events_scd2_asof": events_scd2_asof,
        "kg_domain_yield": kg_domain_yield,
        "events_tumbling_changelog": events_tumbling_changelog,
        "orders_runs_test": orders_runs_test,
        "lineitem_discount_tax_heatmap": lineitem_discount_tax_heatmap,
        "docs_char_entropy": docs_char_entropy,
        "events_hour_anova": events_hour_anova,
        "events_welch_ttest": events_welch_ttest,
        "orders_poisson_bootstrap": orders_poisson_bootstrap,
        "part_abc_classes": part_abc_classes,
        "kg_wl_fingerprint": kg_wl_fingerprint,
        "docs_bigram_cond_entropy": docs_bigram_cond_entropy,
        "lineitem_simpson_flip": lineitem_simpson_flip,
        "emb_mmr_select": emb_mmr_select,
        "events_levene_bf": events_levene_bf,
        "orders_mann_kendall": orders_mann_kendall,
        "docs_wordcount_auc": docs_wordcount_auc,
        "events_mase_naive7": events_mase_naive7,
        "orders_changepoint": orders_changepoint,
        "docs_textrank_terms": docs_textrank_terms,
        "events_holt_winters": events_holt_winters,
        "pages_domain_stats": pages_domain_stats,
        "media_container_probe": media_container_probe,
        "kg_predicate_stats": kg_predicate_stats,
        "docs_gopher_rules": docs_gopher_rules,
        "orders_overlap_pairs": orders_overlap_pairs,
        "part_graph_assortativity": part_graph_assortativity,
        "nation_top3_customers": nation_top3_customers,
        "docs_bpe_merges": docs_bpe_merges,
        "kg_hits": kg_hits,
        "kg_ppr": kg_ppr,
        "docs_source_mix_weights": docs_source_mix_weights,
        "docs_ppl_buckets": docs_ppl_buckets,
        "emb_knn_lsh": emb_knn_lsh,
        "docs_bpe_tokens": docs_bpe_tokens,
        "events_user_rolling_median": events_user_rolling_median,
        "docs_arrow_ipc_roundtrip": docs_arrow_ipc_roundtrip,
        "events_active_7d": events_active_7d,
        "orders_price_gini": orders_price_gini,
        "kg_ntriples": kg_ntriples,
        "kg_twohop_patterns": kg_twohop_patterns,
        "events_value_winsorized": events_value_winsorized,
        "orders_autocorr_lag1": orders_autocorr_lag1,
        "events_type_entropy": events_type_entropy,
        "orders_price_theil": orders_price_theil,
        "events_value_mad": events_value_mad,
        "docs_hapax_stats": docs_hapax_stats,
        "docs_zipf_slope": docs_zipf_slope,
        "events_dow_chi2": events_dow_chi2,
        "orders_benford": orders_benford,
        "events_type_value_trend": events_type_value_trend,
        "docs_dup_cluster_hist": docs_dup_cluster_hist,
        "events_js_drift": events_js_drift,
        "orders_systematic_sample": orders_systematic_sample,
        "events_value_skewkurt": events_value_skewkurt,
        "docs_ttr_hist": docs_ttr_hist,
        "docs_ngram_novelty": docs_ngram_novelty,
        "orders_pareto_80_20": orders_pareto_80_20,
        "events_robust_outliers": events_robust_outliers,
        "events_user_scd2": events_user_scd2,
        "supplier_balance_outliers": supplier_balance_outliers,
        "events_type_user_overlap": events_type_user_overlap,
        "docs_simpson_index": docs_simpson_index,
        "customer_rfm_segments": customer_rfm_segments,
        "orders_cdc_diff": orders_cdc_diff,
        "docs_charclass_profile": docs_charclass_profile,
        "docs_parquet_roundtrip": docs_parquet_roundtrip,
        "lineitem_ship_lag_quantiles": lineitem_ship_lag_quantiles,
        "docs_word_len_hist": docs_word_len_hist,
        "events_peak_hour_per_type": events_peak_hour_per_type,
        "emb_centroid_drift": emb_centroid_drift,
        "part_size_price_spearman": part_size_price_spearman,
        "orders_keyspace_gaps": orders_keyspace_gaps,
        "customer_tree_rollup": customer_tree_rollup,
        "docs_jaccard_prefix_join": docs_jaccard_prefix_join,
        "events_pattern_match": events_pattern_match,
        "orders_weighted_sample": orders_weighted_sample,
        "events_trailing_window_count": events_trailing_window_count,
        "lineitem_pk_fd_audit": lineitem_pk_fd_audit,
        "docs_phrase_search": docs_phrase_search,
        "events_watermark_late": events_watermark_late,
        "customer_k_anonymity": customer_k_anonymity,
        "docs_gzip_ndjson_roundtrip": docs_gzip_ndjson_roundtrip,
        "orders_mv_merge": orders_mv_merge,
        "events_union_by_name": events_union_by_name,
        "docs_topp_curation": docs_topp_curation,
        "orders_merge_upsert": orders_merge_upsert,
        "events_graph_snapshot_diff": events_graph_snapshot_diff,
        "docs_rrf_fusion": docs_rrf_fusion,
        "events_funnel_steps": events_funnel_steps,
        "events_conversion_latency": events_conversion_latency,
        "orders_price_log2_hist": orders_price_log2_hist,
        "nation_share_of_region": nation_share_of_region,
        "custs_all_priorities": custs_all_priorities,
        "part_graph_adamic_adar": part_graph_adamic_adar,
        "lineitem_star_flatten": lineitem_star_flatten,
        "events_user_trailing_distinct": events_user_trailing_distinct,
        "docs_readability": docs_readability,
        "events_user_median_gap": events_user_median_gap,
        "media_scene_cuts": media_scene_cuts,
        "docs_compress_ratio": docs_compress_ratio,
        "events_purchase_attribution": events_purchase_attribution,
        "events_decayed_counts": events_decayed_counts,
        "nation_supplier_hhi": nation_supplier_hhi,
        "docs_sentence_len_quantiles": docs_sentence_len_quantiles,
        "events_type_trigrams": events_type_trigrams,
        "events_user_cumdistinct": events_user_cumdistinct,
        "docs_rake_keyphrases": docs_rake_keyphrases,
        "emb_pq_codes": emb_pq_codes,
        "docs_winnow_pairs": docs_winnow_pairs,
        "orders_zorder_audit": orders_zorder_audit,
        "part_graph_label_prop": part_graph_label_prop,
        "orders_max_concurrency": orders_max_concurrency,
        "docs_vocab_coverage": docs_vocab_coverage,
        "kg_reciprocity": kg_reciprocity,
        "media_phash_pairs": media_phash_pairs,
        "orders_orc_roundtrip": orders_orc_roundtrip,
        "customer_cohort_revenue": customer_cohort_revenue,
        "events_type_burst": events_type_burst,
        "emb_knn_pq_rerank": emb_knn_pq_rerank,
        "events_session_duration_quantiles": events_session_duration_quantiles,
        "kg_complete_entities": kg_complete_entities,
        "pages_link_stats": pages_link_stats,
        "orders_price_eqdepth_hist": orders_price_eqdepth_hist,
        "part_skyline": part_skyline,
        "events_cusum_drift": events_cusum_drift,
        "orders_retention_curve": orders_retention_curve,
        "events_seasonal_naive_error": events_seasonal_naive_error,
        "orders_table_digest": orders_table_digest,
        "docs_sentence_dedup": docs_sentence_dedup,
        "customer_supplier_percentile": customer_supplier_percentile,
        "events_ohlc_daily": events_ohlc_daily,
        "events_user_twap": events_user_twap,
        "docs_shingle_containment": docs_shingle_containment,
        "orders_prefix_dominance": orders_prefix_dominance,
        "events_ab_precedence": events_ab_precedence,
        "lineitem_weighted_median": lineitem_weighted_median,
        "part_item_cosine": part_item_cosine,
        "events_value_psi": events_value_psi,
        "part_fuzzy_name_pairs": part_fuzzy_name_pairs,
        "events_value_ranksum": events_value_ranksum,
        "orders_kendall_tau": orders_kendall_tau,
        "docs_boilerplate_scan": docs_boilerplate_scan,
        "events_type_profile_cosine": events_type_profile_cosine,
        "schema_fk_orphan_scan": schema_fk_orphan_scan,
        "customer_erasure_cascade": customer_erasure_cascade,
        "media_vad_segments": media_vad_segments,
        "part_dag_levels": part_dag_levels,
        "orders_kaplan_meier": orders_kaplan_meier,
        "events_ab_ztest": events_ab_ztest,
        "lineitem_cov_matrix": lineitem_cov_matrix,
        "part_jw_name_pairs": part_jw_name_pairs,
        "part_graph_ktruss": part_graph_ktruss,
        "emb_dim_stats": emb_dim_stats,
        "part_name_resolution": part_name_resolution,
        "events_trimmed_mean": events_trimmed_mean,
        "cust_supp_balance_band": cust_supp_balance_band,
        "orders_revenue_drawdown": orders_revenue_drawdown,
        "docs_compaction_plan": docs_compaction_plan,
        "events_user_scc": events_user_scc,
        "events_user_ewma": events_user_ewma,
        "docs_trigram_search": docs_trigram_search,
        "orders_avro_roundtrip": orders_avro_roundtrip,
        "customer_l_diversity": customer_l_diversity,
        "events_cdc_apply": events_cdc_apply,
        "part_graph_walks": part_graph_walks,
        "kg_scc": kg_scc,
        "docs_feature_hashing": docs_feature_hashing,
    }


def oracle_sql():
    return {
        "q1_pricing_summary": _Q1_SQL,
        "q6_revenue_filter": _Q6_SQL,
        "q3_top_orders": _Q3_SQL,
        "q5_local_supplier": _Q5_SQL,
        "join_customer_nation_region": _JOIN_CNR_SQL,
        "sort_topk_orders": _SORT_TOPK_SQL,
        "distinct_segments": _DISTINCT_SQL,
        "group_nation_balance": _GROUP_NATION_SQL,
        "dedup_orders_per_customer": _DEDUP_ORDERS_SQL,
        "union_key_sources": _UNION_SQL,
        "part_type_stats": _PART_TYPE_SQL,
        "segment_order_revenue": _SEGMENT_REV_SQL,
        "events_hourly": _EVENTS_HOURLY_SQL,
        "events_json_extract": _EVENTS_JSON_SQL,
        "events_user_topk": _EVENTS_TOPK_SQL,
        "events_type_skew": _EVENTS_SKEW_SQL,
        "events_asof_orders": _EVENTS_ASOF_SQL,
        "events_salted_type_count": _EVENTS_SALTED_SQL,
        "events_latest_per_user": _EVENTS_LATEST_SQL,
        "events_user_cumspend": _EVENTS_CUMSPEND_SQL,
        "events_sessionize": _EVENTS_SESSION_SQL,
        "events_type_approx_users": _EVENTS_APPROX_USERS_SQL,
        "events_value_quantiles": _EVENTS_QUANTILES_SQL,
        "events_user_gap": _EVENTS_GAP_SQL,
        "orders_repeat_30d": _ORDERS_REPEAT_SQL,
        "events_hour_pivot": _EVENTS_PIVOT_SQL,
        "events_value_quantiles_cont": _EVENTS_QUANTILES_CONT_SQL,
        "events_user_range7d": _EVENTS_RANGE7_SQL,
        "orders_priority_dense_rank": _ORDERS_DENSE_RANK_SQL,
        "nation_region_cross": _NATION_CROSS_SQL,
        "events_user_rolling3": _EVENTS_ROLLING_SQL,
        "orders_upsert": _ORDERS_UPSERT_SQL,
        "events_cube": _EVENTS_CUBE_SQL,
        "orders_next_order": _ORDERS_NEXT_SQL,
        "orders_pairs_intersect": _ORDERS_INTERSECT_SQL,
        "orders_pairs_except": _ORDERS_EXCEPT_SQL,
        "events_user_twohop": _EVENTS_TWOHOP_SQL,
        "docs_jsonl_roundtrip": _DOCS_JSONL_SQL,
        "customer_csv_roundtrip": _CUSTOMER_CSV_SQL,
        "events_user_heavy_hitters": _EVENTS_HH_SQL,
        "nation_cust_segments": _NATION_SEGMENTS_SQL,
        "orders_global_rank": _ORDERS_RANK_SQL,
        "orders_price_quartile": _ORDERS_NTILE_SQL,
        "custs_without_events": _CUSTS_NO_EVENTS_SQL,
        "parts_with_lineitems": _PARTS_SEMI_SQL,
        "orders_hash_sample": _ORDERS_SAMPLE_SQL,
        "part_brand_number": _PART_BRAND_SQL,
        "events_type_median_value": _EVENTS_MEDIAN_SQL,
        "events_rollup": _EVENTS_ROLLUP_SQL,
        "docs_top_terms": _DOCS_TOP_TERMS_SQL,
        "docs_chunks": _DOCS_CHUNKS_SQL,
        "docs_training_prep": _DOCS_PREP_SQL,
        "orders_kfold": _ORDERS_KFOLD_SQL,
        "docs_lang_count": _DOCS_LANG_SQL,
        "docs_token_counts": _DOCS_TOKENS_SQL,
        "docs_quality_counts": _DOCS_QUALITY_SQL,
        "docs_fingerprint": _DOCS_FP_SQL,
        "docs_exact_dedup": _DOCS_DEDUP_SQL,
        "emb_label_count": _EMB_LABEL_SQL,
        "emb_knn_bruteforce": _EMB_KNN_SQL,
        "lineitem_flag_variance": _LINEITEM_VAR_SQL,
        "lineitem_qty_price_corr": _LINEITEM_CORR_SQL,
        "orders_price_histogram": _ORDERS_HIST_SQL,
        "orders_percent_rank": _ORDERS_PCTRANK_SQL,
        "orders_status_mode_priority": _ORDERS_MODE_SQL,
        "events_user_first_last": _EVENTS_FIRST_LAST_SQL,
        "customer_order_counts_outer": _CUST_OUTER_SQL,
        "orders_cume_dist": _ORDERS_CUMEDIST_SQL,
        "events_value_locf": _EVENTS_LOCF_SQL,
        "events_user_rolling_avg": _EVENTS_ROLLAVG_SQL,
        "events_grouping_sets": _EVENTS_GSETS_SQL,
        "users_customers_full_outer": _FULL_OUTER_SQL,
        "customer_stratified_sample": _CUST_STRAT_SQL,
        "events_type_share": _EVENTS_SHARE_SQL,
        "orders_priority_quartiles": _ORDERS_NTILE_KEY_SQL,
        "part_name_fuzzy_pairs": _PART_FUZZY_SQL,
        "emb_label_centroids": _EMB_CENTROID_SQL,
        "orders_rank_with_ties": _ORDERS_RANK_TIES_SQL,
        "events_user_hourly_dense": _EVENTS_DENSE_SQL,
        "lineitem_latest_shipped": _LINEITEM_LATEST_SQL,
        "orders_above_cust_avg": _ORDERS_ABOVE_AVG_SQL,
        "events_type_distinct_users": _EVENTS_DISTINCT_USERS_SQL,
        "lineitem_weighted_avg_price": _LINEITEM_WAVG_SQL,
        "events_type_transitions": _EVENTS_TRANSITIONS_SQL,
        "events_funnel": _EVENTS_FUNNEL_SQL,
        "events_user_streaks": _EVENTS_STREAKS_SQL,
        "docs_incremental_dedup": _DOCS_INCR_DEDUP_SQL,
        "lineitem_part_pairs": _LINEITEM_PAIRS_SQL,
        "q10_returned_customers": _Q10_SQL,
        "q18_large_volume_cust": _Q18_SQL,
        "q14_promo_share": _Q14_SQL,
        "q22_rich_inactive_custs": _Q22_SQL,
        "part_graph_triangles": _PART_TRIANGLES_SQL,
        "part_graph_degree_hist": _PART_DEGREE_HIST_SQL,
        "part_graph_jaccard": _PART_JACCARD_SQL,
        "docs_inverted_index": _DOCS_INVERTED_SQL,
        "part_graph_bfs": _PART_BFS_SQL,
        "part_graph_components": _PART_COMPONENTS_SQL,
        "q4_priority_late_ship": _Q4_SQL,
        "q13_custdist": _Q13_SQL,
        "q17_small_qty_revenue": _Q17_SQL,
        "part_graph_clustering": _PART_CLUSTERING_SQL,
        "docs_bm25_topk": _DOCS_BM25_SQL,
        "docs_repetition": _DOCS_REPETITION_SQL,
        "docs_pack_blocks": _DOCS_PACK_SQL,
        "q7_nation_trade": _Q7_SQL,
        "q19_disjunctive_revenue": _Q19_SQL,
        "events_salted_type_join": _EVENTS_SALTED_JOIN_SQL,
        "events_merged_windows": _EVENTS_MERGED_WINDOWS_SQL,
        "docs_kwic": _DOCS_KWIC_SQL,
        "events_asof_nearest": _EVENTS_ASOF_NEAREST_SQL,
        "docs_rag_retrieve": _DOCS_RAG_SQL,
        "docs_unigram_nll": _DOCS_UNIGRAM_NLL_SQL,
        "docs_collocations": _DOCS_COLLOCATIONS_SQL,
        "q8_market_share": _Q8_SQL,
        "q12_priority_shipping": _Q12_SQL,
        "q15_top_supplier": _Q15_SQL,
        "q16_supplier_counts": _Q16_SQL,
        "q21_sole_late_supplier": _Q21_SQL,
        "part_attrs_melt": _PART_MELT_SQL,
        "docs_span_dedup": _DOCS_SPAN_DEDUP_SQL,
        "events_tumbling_6h": _EVENTS_TUMBLING_SQL,
        "events_hopping_3h_1h": _EVENTS_HOPPING_SQL,
        "q9_profit_by_nation_year": _Q9_SQL,
        "q11_important_parts": _Q11_SQL,
        "docs_bigram_nll": _DOCS_BIGRAM_NLL_SQL,
        "q2_min_cost_supplier": _Q2_SQL,
        "q20_dominant_suppliers": _Q20_SQL,
        "customers_fuzzy_name_pairs": _FUZZY_PAIRS_SQL,
        "docs_curation_funnel": _CURATION_FUNNEL_SQL,
        "events_retention_cohorts": _RETENTION_SQL,
        "docs_temperature_sample": _TEMP_SAMPLE_SQL,
        "events_props_redact": _EVENTS_REDACT_SQL,
        "events_user_path": _EVENTS_PATH_SQL,
        "events_value_outliers": _EVENTS_OUTLIERS_SQL,
        "orders_yoy_growth": _ORDERS_YOY_SQL,
        "events_weekly_active_users": _EVENTS_WAU_SQL,
        "orders_profile": _ORDERS_PROFILE_SQL,
        "docs_gopher_rules": _DOCS_GOPHER_SQL,
        "orders_overlap_pairs": _ORDERS_OVERLAP_SQL,
        "nation_top3_customers": _NATION_TOP3_SQL,
        "docs_source_mix_weights": _DOCS_MIX_SQL,
        "docs_ppl_buckets": _DOCS_PPL_BUCKETS_SQL,
        "events_user_rolling_median": _EVENTS_ROLLMED_SQL,
        "docs_arrow_ipc_roundtrip": _DOCS_IPC_SQL,
        "events_active_7d": _EVENTS_ACTIVE7_SQL,
        "orders_price_gini": _ORDERS_GINI_SQL,
        "events_value_winsorized": _EVENTS_WINSOR_SQL,
        "orders_autocorr_lag1": _ORDERS_AUTOCORR_SQL,
        "events_type_entropy": _EVENTS_ENTROPY_SQL,
        "orders_price_theil": _ORDERS_THEIL_SQL,
        "events_value_mad": _EVENTS_MAD_SQL,
        "docs_hapax_stats": _DOCS_HAPAX_SQL,
        "events_dow_chi2": _EVENTS_CHI2_SQL,
        "orders_benford": _ORDERS_BENFORD_SQL,
        "events_type_value_trend": _EVENTS_TREND_SQL,
        "docs_dup_cluster_hist": _DOCS_DUP_HIST_SQL,
        "events_js_drift": _EVENTS_JSD_SQL,
        "orders_systematic_sample": _ORDERS_SYSSAMPLE_SQL,
        "events_value_skewkurt": _EVENTS_SKEWKURT_SQL,
        "docs_ttr_hist": _DOCS_TTR_SQL,
        "docs_ngram_novelty": _DOCS_NOVELTY_SQL,
        "orders_pareto_80_20": _ORDERS_PARETO_SQL,
        "events_robust_outliers": _EVENTS_ROBUST_SQL,
        "events_user_scd2": _EVENTS_SCD2_SQL,
        "supplier_balance_outliers": _SUPPLIER_ZGATE_SQL,
        "events_type_user_overlap": _EVENTS_OVERLAP_SQL,
        "docs_simpson_index": _DOCS_SIMPSON_SQL,
        "customer_rfm_segments": _CUSTOMER_RFM_SQL,
        "orders_cdc_diff": _ORDERS_CDC_SQL,
        "docs_charclass_profile": _DOCS_CHARCLASS_SQL,
        "docs_parquet_roundtrip": _DOCS_PQ_ROUNDTRIP_SQL,
        "lineitem_ship_lag_quantiles": _LINEITEM_SHIPLAG_SQL,
        "docs_word_len_hist": _DOCS_WORDLEN_SQL,
        "events_peak_hour_per_type": _EVENTS_PEAK_HOUR_SQL,
        "emb_centroid_drift": _EMB_DRIFT_SQL,
        "part_size_price_spearman": _PART_SPEARMAN_SQL,
        "orders_keyspace_gaps": _ORDERS_KEYGAPS_SQL,
        "customer_tree_rollup": _CUSTOMER_TREE_ROLLUP_SQL,
        "docs_jaccard_prefix_join": _DOCS_JACCARD_PREFIX_SQL,
        "events_pattern_match": _EVENTS_PATTERN_SQL,
        "orders_weighted_sample": _ORDERS_WSAMPLE_SQL,
        "events_trailing_window_count": _EVENTS_TRAILWIN_SQL,
        "lineitem_pk_fd_audit": _LINEITEM_PKFD_SQL,
        "docs_phrase_search": _DOCS_PHRASE_SQL,
        "events_watermark_late": _EVENTS_WATERMARK_SQL,
        "customer_k_anonymity": _CUSTOMER_KANON_SQL,
        "docs_gzip_ndjson_roundtrip": _DOCS_GZJSONL_SQL,
        "orders_mv_merge": _ORDERS_MV_SQL,
        "events_union_by_name": _EVENTS_UNION_BY_NAME_SQL,
        "docs_topp_curation": _DOCS_TOPP_SQL,
        "orders_merge_upsert": _ORDERS_MERGE_SQL,
        "events_graph_snapshot_diff": _EVENTS_SNAPDIFF_SQL,
        "docs_rrf_fusion": _DOCS_RRF_SQL,
        "events_funnel_steps": _EVENTS_FUNNEL_STEPS_SQL,
        "events_conversion_latency": _EVENTS_CONVLAT_SQL,
        "orders_price_log2_hist": _ORDERS_LOG2_SQL,
        "nation_share_of_region": _NATION_SHARE_SQL,
        "custs_all_priorities": _CUSTS_ALL_PRIO_SQL,
        "part_graph_adamic_adar": _PART_ADAMIC_ADAR_SQL,
        "lineitem_star_flatten": _LINEITEM_STAR_SQL,
        "events_user_trailing_distinct": _EVENTS_TRAILDISTINCT_SQL,
        "docs_readability": _DOCS_READABILITY_SQL,
        "events_user_median_gap": _EVENTS_MEDIAN_GAP_SQL,
        "events_purchase_attribution": _EVENTS_ATTRIBUTION_SQL,
        "events_decayed_counts": _EVENTS_DECAYED_SQL,
        "nation_supplier_hhi": _NATION_HHI_SQL,
        "docs_sentence_len_quantiles": _DOCS_SENTLEN_SQL,
        "events_type_trigrams": _EVENTS_TRIGRAMS_SQL,
        "events_user_cumdistinct": _EVENTS_CUMDISTINCT_SQL,
        "orders_max_concurrency": _ORDERS_MAXCONC_SQL,
        "docs_vocab_coverage": _DOCS_VOCABCOV_SQL,
        "orders_orc_roundtrip": _ORDERS_ORC_SQL,
        "customer_cohort_revenue": _CUSTOMER_COHORT_SQL,
        "events_type_burst": _EVENTS_BURST_SQL,
        "events_session_duration_quantiles": _EVENTS_SESSDUR_SQL,
        "orders_price_eqdepth_hist": _ORDERS_EQDEPTH_SQL,
        "part_skyline": _PART_SKYLINE_SQL,
        "events_cusum_drift": _EVENTS_CUSUM_SQL,
        "orders_retention_curve": _ORDERS_RETENTION_SQL,
        "events_seasonal_naive_error": _EVENTS_SNAIVE_SQL,
        "orders_table_digest": _ORDERS_DIGEST_SQL,
        "docs_sentence_dedup": _DOCS_SENT_DEDUP_SQL,
        "customer_supplier_percentile": _CUSTOMER_SUP_PCT_SQL,
        "events_ohlc_daily": _EVENTS_OHLC_SQL,
        "events_user_twap": _EVENTS_TWAP_SQL,
        "docs_shingle_containment": _DOCS_CONTAINMENT_SQL,
        "orders_prefix_dominance": _ORDERS_DOMINANCE_SQL,
        "events_ab_precedence": _EVENTS_AB_PRECEDENCE_SQL,
        "lineitem_weighted_median": _LINEITEM_WMEDIAN_SQL,
        "part_item_cosine": _PART_ITEM_COSINE_SQL,
        "events_value_psi": _EVENTS_PSI_SQL,
        "part_fuzzy_name_pairs": _PART_SYMSPELL_FUZZY_SQL,
        "events_value_ranksum": _EVENTS_RANKSUM_SQL,
        "orders_kendall_tau": _ORDERS_KENDALL_SQL,
        "docs_boilerplate_scan": _DOCS_BOILERPLATE_SQL,
        "events_type_profile_cosine": _EVENTS_PROFILE_COSINE_SQL,
        "schema_fk_orphan_scan": _FK_ORPHAN_SQL,
        "customer_erasure_cascade": _ERASURE_CASCADE_SQL,
        "part_dag_levels": _PART_DAG_LEVELS_SQL,
        "orders_kaplan_meier": _ORDERS_KM_SQL,
        "events_ab_ztest": _EVENTS_AB_ZTEST_SQL,
        "lineitem_cov_matrix": _LINEITEM_COV_SQL,
        "part_jw_name_pairs": _PART_JW_PAIRS_SQL,
        "emb_dim_stats": _EMB_DIM_STATS_SQL,
        "part_name_resolution": _PART_NAME_RESOLUTION_SQL,
        "events_trimmed_mean": _EVENTS_TRIMMED_MEAN_SQL,
        "cust_supp_balance_band": _CUST_SUPP_BAND_SQL,
        "orders_revenue_drawdown": _ORDERS_DRAWDOWN_SQL,
        "events_user_scc": _EVENTS_USER_SCC_SQL,
        "events_user_ewma": _EVENTS_EWMA_SQL,
        "docs_trigram_search": _DOCS_TRIGRAM_SQL,
        "orders_avro_roundtrip": _ORDERS_AVRO_SQL,
        "customer_l_diversity": _CUSTOMER_LDIV_SQL,
        "events_cdc_apply": _EVENTS_CDC_APPLY_SQL,
        "docs_feature_hashing": _DOCS_FEATURE_HASH_SQL,
        "part_graph_assortativity": _PART_ASSORT_SQL,
        "events_daily_autocorr": _EVENTS_AUTOCORR_SQL,
        "basket_lift_rules": _BASKET_LIFT_SQL,
        "events_value_ks": _EVENTS_KS_SQL,
        "orders_theilsen_trend": _ORDERS_THEILSEN_SQL,
        "customer_t_closeness": _CUSTOMER_TCLOSE_SQL,
        "orders_xml_roundtrip": _ORDERS_XML_SQL,
        "docs_nb_source_model": _DOCS_NB_SQL,
        "docs_dsir_weights": _DOCS_DSIR_SQL,
        "events_daily_interp": _EVENTS_INTERP_SQL,
        "orders_seasonal_decomp": _ORDERS_SEASONAL_SQL,
        "customer_revenue_lorenz": _CUSTOMER_LORENZ_SQL,
        "orders_pushdown_scan": _ORDERS_PUSHDOWN_SQL,
        "docs_dedup_impact": _DOCS_DEDUP_IMPACT_SQL,
        "events_scd2_asof": _EVENTS_SCD2_ASOF_SQL,
        "events_tumbling_changelog": _EVENTS_CHANGELOG_SQL,
        "orders_runs_test": _ORDERS_RUNS_SQL,
        "lineitem_discount_tax_heatmap": _LINEITEM_HEATMAP_SQL,
        "docs_char_entropy": _DOCS_CHAR_ENTROPY_SQL,
        "events_hour_anova": _EVENTS_ANOVA_SQL,
        "events_welch_ttest": _EVENTS_WELCH_SQL,
        "orders_poisson_bootstrap": _ORDERS_BOOTSTRAP_SQL,
        "part_abc_classes": _PART_ABC_SQL,
        "docs_bigram_cond_entropy": _DOCS_CONDH_SQL,
        "lineitem_simpson_flip": _LINEITEM_SIMPSON_SQL,
        "emb_mmr_select": _EMB_MMR_SQL,
        "events_levene_bf": _EVENTS_LEVENE_SQL,
        "orders_mann_kendall": _ORDERS_MK_SQL,
        "docs_wordcount_auc": _DOCS_AUC_SQL,
        "events_mase_naive7": _EVENTS_MASE_SQL,
        "orders_changepoint": _ORDERS_CHANGEPOINT_SQL,
        "docs_textrank_terms": _DOCS_TEXTRANK_SQL,
        "events_holt_winters": _EVENTS_HW_SQL,
        "docs_zipf_slope": _DOCS_ZIPF_SQL,
        # rows-only (non-SQL-expressible): docs_minhash_pairs, docs_simhash,
        # docs_langid, emb_knn_ivf, emb_cosine_dup_pairs, kg_* — their real
        # oracles are refimpl goldens / recall tests under tests/.
    }
