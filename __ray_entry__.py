"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline at sf0.001 scale: synthesize the mandated pages
    table (url, warc_ts, html, text, lang — BASELINE.json input_hint; scaled
    by the sf0.001 documents row count), run strip → CRF tag → link → triple
    extract → canonicalize → graph, return the edges table."""
    from information_extraction_system_ray.context import tune_context
    from information_extraction_system_ray.queries import kg_graph

    tune_context()
    return kg_graph("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """Operator registry (SURVEY.md §2): each callable takes ``sf_dir`` and
    returns a Dataset / pandas DataFrame / pyarrow Table."""
    from information_extraction_system_ray.context import tune_context
    from information_extraction_system_ray.queries import queries as _q

    tune_context()
    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (column names match the Ray results);
    rows-only operators are intentionally absent — their oracles are the
    refimpl goldens under tests/ (SURVEY.md §0)."""
    from information_extraction_system_ray.queries import oracle_sql as _o

    return _o()
