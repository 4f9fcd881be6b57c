"""Driver-conformance mirror (SURVEY.md §5 item 3): every queries() entry
with an oracle_sql() entry must match DuckDB on sf0.001 — same row count,
same column names, same values (order-insensitive)."""

import glob
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


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


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for p in glob.glob(os.path.join(SF_DIR, "*.parquet")):
        name = os.path.basename(p)[:-8]
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return c


def _oracle_pairs():
    import __ray_entry__ as e

    sql = e.oracle_sql()
    return sorted(sql.keys())


@pytest.mark.parametrize("name", _oracle_pairs())
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as e

    got = _canon(_to_pandas(e.queries()[name](SF_DIR)))
    want = _canon(con.execute(e.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), \
        (list(got.columns), list(want.columns))
    assert len(got) == len(want), (len(got), len(want))
    # exact: the driver compares value HASHES, so rtol would hide real
    # divergence (all oracle outputs are ints/strings by design)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    rows_only = [k for k in qs if k not in sql
                 and k not in ("kg_nodes", "kg_graph", "kg_triples",
                               "kg_extracted")]
    for name in rows_only:
        df = _to_pandas(qs[name](SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_no_duplicate_toplevel_sql_constants():
    """Regression guard (round 4): a second module-level assignment to the
    same ``_*_SQL`` constant silently clobbers the first (this bit
    ``part_name_fuzzy_pairs`` when the SymSpell query reused
    ``_PART_FUZZY_SQL``). AST-scan queries.py and fail on any repeat."""
    import ast
    import collections
    import information_extraction_system_ray.queries as qmod

    tree = ast.parse(open(qmod.__file__).read())
    seen = collections.Counter()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    seen[tgt.id] += 1
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            seen[node.name] += 1
    dups = sorted(n for n, c in seen.items() if c > 1)
    assert dups == [], f"duplicate top-level names in queries.py: {dups}"
