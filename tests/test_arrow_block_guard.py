"""Structural guard for the Arrow-block house rule (r4 VERDICT #4).

Round 4 found that ``map_batches``/``map_groups`` callbacks RETURNING
pandas DataFrames create pandas-format blocks that poison every
downstream sort/aggregate AllToAll (~20×: 12.6 s vs 0.66 s on a 54k-row
groupby — BASELINE.md). The fix was convention: mid-pipeline callbacks
must emit Arrow; DataFrame returns are only safe as FINAL driver-bound
stages. This test makes the convention structural: it walks the AST of
every engine module, resolves every function object passed to
``.map_batches(...)`` / ``.map_groups(...)`` (including lambdas and
local helper indirection), and asserts every ``return`` in those
callbacks produces an Arrow table (``pa.table``, ``.cast``,
``Table.from_pandas``, ``to_arrow``, a schema ``empty_table`` … or a
local name assigned from one). Returning the input batch unchanged is
allowed only under ``batch_format="pyarrow"``.

A FINAL driver-bound stage that deliberately emits pandas must carry an
``# arrow-ok`` comment on the return line (with the reason) — the waiver
is visible in the diff, so new code can't silently regress.

The checker is self-tested: a planted DataFrame-returning callback must
be caught (``test_guard_catches_planted_violation``).
"""

from __future__ import annotations

import ast
import os

_PKG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "information_extraction_system_ray")

# Outermost call (attribute or function name) that yields an Arrow table.
_ARROW_CALLS = {
    # constructors
    "table", "from_pandas", "from_arrays", "empty_table", "concat_tables",
    "record_batch",
    # pa.Table methods that return tables
    "cast", "select", "filter", "take", "slice", "append_column",
    "set_column", "rename_columns", "drop_columns", "combine_chunks",
    "drop_null", "sort_by", "group_by", "aggregate", "flatten",
    "replace_schema_metadata",
    # house helpers that return Arrow by contract
    "to_arrow", "add_bucket", "list_struct", "explode_list_struct",
}


class _ReturnCollector(ast.NodeVisitor):
    """Collects Return nodes of ONE function body, without descending
    into nested function/lambda definitions."""

    def __init__(self) -> None:
        self.returns: list[ast.Return] = []
        self._depth = 0

    def visit_FunctionDef(self, node):  # noqa: N802
        if self._depth == 0:
            self._depth += 1
            self.generic_visit(node)
            self._depth -= 1
        # nested def: do not descend

    visit_AsyncFunctionDef = visit_FunctionDef

    def visit_Lambda(self, node):  # noqa: N802
        pass  # nested lambda: skip

    def visit_Return(self, node):  # noqa: N802
        self.returns.append(node)


def _fn_returns(fn: ast.FunctionDef) -> "list[ast.Return]":
    c = _ReturnCollector()
    c.visit(fn)
    return c.returns


class _Checker:
    def __init__(self, tree: ast.Module, src_lines: "list[str]",
                 path: str) -> None:
        self.tree = tree
        self.lines = src_lines
        self.path = path
        self.defs: dict[str, ast.FunctionDef] = {
            n.name: n for n in ast.walk(tree)
            if isinstance(n, ast.FunctionDef)}
        self._fn_ok_cache: dict[int, bool] = {}

    def _waived(self, lineno: int) -> bool:
        return "arrow-ok" in self.lines[lineno - 1]

    def _expr_is_arrow(self, expr: ast.expr, assigned_ok: "set[str]",
                      params_ok: "set[str]", depth: int) -> bool:
        if isinstance(expr, ast.Name):
            return expr.id in assigned_ok or expr.id in params_ok
        if isinstance(expr, ast.IfExp):
            return (self._expr_is_arrow(expr.body, assigned_ok,
                                        params_ok, depth)
                    and self._expr_is_arrow(expr.orelse, assigned_ok,
                                            params_ok, depth))
        if isinstance(expr, ast.Call):
            f = expr.func
            if isinstance(f, ast.Attribute) and f.attr in _ARROW_CALLS:
                return True
            if isinstance(f, ast.Name):
                if f.id in _ARROW_CALLS:
                    return True
                # local helper indirection: check ITS returns
                helper = self.defs.get(f.id)
                if helper is not None and depth < 3:
                    return self._fn_all_arrow(helper, set(), depth + 1)
        return False

    def _arrow_assigned(self, fn: ast.FunctionDef,
                        params_ok: "set[str]", depth: int) -> "set[str]":
        ok: set[str] = set()
        for _ in range(3):  # tiny fixpoint for chained assignments
            for node in ast.walk(fn):
                if isinstance(node, ast.Assign) \
                        and len(node.targets) == 1 \
                        and isinstance(node.targets[0], ast.Name):
                    if self._expr_is_arrow(node.value, ok, params_ok,
                                           depth):
                        ok.add(node.targets[0].id)
        return ok

    def _fn_all_arrow(self, fn: ast.FunctionDef, params_ok: "set[str]",
                      depth: int) -> bool:
        key = (id(fn), tuple(sorted(params_ok)))
        hit = self._fn_ok_cache.get(key)
        if hit is not None:
            return hit
        self._fn_ok_cache[key] = True  # optimistic for recursion
        assigned = self._arrow_assigned(fn, params_ok, depth)
        ok = all(
            r.value is None or self._waived(r.lineno)
            or self._expr_is_arrow(r.value, assigned, params_ok, depth)
            for r in _fn_returns(fn))
        self._fn_ok_cache[key] = ok
        return ok

    def check_callback(self, cb, fmt: "str | None") -> "list[str]":
        """fmt is the call's batch_format ('pyarrow'/'pandas'/None)."""
        bad: list[str] = []
        if isinstance(cb, ast.Lambda):
            params = {a.arg for a in cb.args.args} \
                if fmt == "pyarrow" else set()
            if not (self._expr_is_arrow(cb.body, set(), params, 0)
                    or self._waived(cb.lineno)):
                bad.append(f"{self.path}:{cb.lineno} lambda returns "
                           f"non-Arrow: {ast.unparse(cb.body)[:60]}")
            return bad
        if not isinstance(cb, ast.FunctionDef):
            return bad
        params = {a.arg for a in cb.args.args} \
            if fmt == "pyarrow" else set()
        assigned = self._arrow_assigned(cb, params, 0)
        for r in _fn_returns(cb):
            if r.value is None or self._waived(r.lineno):
                continue
            if not self._expr_is_arrow(r.value, assigned, params, 0):
                bad.append(f"{self.path}:{r.lineno} `{cb.name}` returns "
                           f"non-Arrow: {ast.unparse(r.value)[:60]}")
        return bad

    def run(self) -> "list[str]":
        violations: list[str] = []
        seen: set[tuple] = set()
        for node in ast.walk(self.tree):
            if not (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr in ("map_batches", "map_groups")
                    and node.args):
                continue
            fmt = None
            for kw in node.keywords:
                if kw.arg == "batch_format" \
                        and isinstance(kw.value, ast.Constant):
                    fmt = kw.value.value
            cb = node.args[0]
            if isinstance(cb, ast.Name):
                cb = self.defs.get(cb.id)
                if cb is None:
                    continue  # class callback (actor pool) or import
            key = (id(cb), fmt)
            if key in seen:
                continue
            seen.add(key)
            violations += self.check_callback(cb, fmt)
        return violations


def _collect_violations(source: str, path: str) -> "list[str]":
    return _Checker(ast.parse(source), source.splitlines(), path).run()


def _engine_sources():
    for root, _dirs, files in os.walk(_PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def test_map_callbacks_return_arrow_blocks():
    all_bad: list[str] = []
    for path in _engine_sources():
        with open(path) as fh:
            src = fh.read()
        rel = os.path.relpath(path, os.path.dirname(_PKG))
        all_bad += _collect_violations(src, rel)
    assert not all_bad, \
        f"pandas-block house-rule violations ({len(all_bad)}):\n" + \
        "\n".join(sorted(all_bad))


def test_guard_catches_planted_violation():
    planted = (
        "def bad(g):\n"
        "    out = g.groupby('k').size().reset_index(name='n')\n"
        "    return out\n"
        "ds = ds.map_batches(tag, batch_format='pyarrow')\\\n"
        "    .groupby('_p').map_groups(bad, batch_format='pandas')\n")
    v = _collect_violations(planted, "<planted>")
    assert len(v) == 1 and "bad" in v[0], v

    # a pandas-format callback returning its input DataFrame is caught
    planted2 = (
        "def passthru(g):\n"
        "    return g\n"
        "ds = ds.map_groups(passthru, batch_format='pandas')\n")
    v = _collect_violations(planted2, "<planted>")
    assert len(v) == 1, v

    planted_lambda = "ds = ds.map_batches(lambda t: t.to_pandas())\n"
    v = _collect_violations(planted_lambda, "<planted>")
    assert len(v) == 1, v

    # good shapes pass: Arrow returns, helper indirection, pyarrow
    # passthrough, and an explicitly waived final stage
    good = (
        "def helper(t, col):\n"
        "    return pa.table({col: t[col]})\n"
        "def ok(g):\n"
        "    vc = g.groupby('k').size().reset_index(name='n')\n"
        "    return pa.Table.from_pandas(vc).cast(schema)\n"
        "def passthru(t):\n"
        "    return t\n"
        "def final(g):\n"
        "    return g[['a']]  # arrow-ok: final driver-bound stage\n"
        "ds = ds.map_groups(ok, batch_format='pandas')\n"
        "ds2 = ds.map_batches(lambda t: helper(t, 'a'),\n"
        "                     batch_format='pyarrow')\n"
        "ds3 = ds.map_batches(passthru, batch_format='pyarrow')\n"
        "ds4 = ds.map_groups(final, batch_format='pandas')\n")
    assert _collect_violations(good, "<good>") == []
