"""Oracle sweep: run registry queries against their DuckDB oracles at any SF.

Usage:
    python tools/sweep.py [--sf-dir /root/testdata/sf0.01] [--out out.json]
                          [name ...]

With no names, sweeps every oracle_sql() entry. Mirrors the driver's compare
(tests/test_queries.py): sorted column names, stringified object columns,
order-insensitive exact values. Owns its own Ray session (scripts may init;
__ray_entry__ must not).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            ignore_reinit_error=True)

    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    names = args.names or sorted(sql.keys())

    con = duckdb.connect()
    for p in glob.glob(os.path.join(args.sf_dir, "*.parquet")):
        con.execute(f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
                    f"SELECT * FROM '{p}'")

    per, fails = {}, []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        rec = {"cols": False, "rows": False, "vals": False, "n": 0,
               "wall_s": 0.0}
        try:
            got = _canon(_to_pandas(qs[name](args.sf_dir)))
            want = _canon(con.execute(sql[name]).df())
            rec["n"] = len(want)
            rec["cols"] = list(got.columns) == list(want.columns)
            rec["rows"] = len(got) == len(want)
            if rec["cols"] and rec["rows"]:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=True)
                    rec["vals"] = True
                except AssertionError as ex:
                    rec["err"] = str(ex)[:300]
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
        rec["wall_s"] = round(time.time() - t0, 2)
        per[name] = rec
        ok = rec["vals"]
        if not ok:
            fails.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"n={rec['n']} {rec['wall_s']}s", flush=True)

    out = {"summary": {"sf": args.sf_dir, "n_oracles": len(names),
                       "n_pass": len(names) - len(fails), "fails": fails,
                       "total_wall_s": round(time.time() - t_all, 1)},
           "per_query": per}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out["summary"]))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
