"""Structural integrity of the ``Babe`` fluent facade.

Round-9 shipped two facade methods whose bodies were just an import
(the intended ``return self._wrap(...)`` got stranded inside a
neighbouring method during an edit), so they silently returned
``None`` despite the ``-> "Babe"`` annotation.  These tests make that
whole class of paste error impossible to re-ship:

* every ``Babe`` method annotated ``-> "Babe"`` must contain a
  ``return`` statement of its own (not one belonging to a nested def);
* no method body may contain unreachable statements after a top-level
  ``return``/``raise`` (a stranded return from a neighbour shows up as
  exactly that);
* no method may contain a nested ``def`` (the facade is a thin
  delegation layer — a nested def is the paste-error symptom).

Plus runtime smoke tests for the three methods the round-9 bug hit
(``bootstrap_mean_ci``, ``km_survival``, ``logrank_test``).
"""

import ast
import inspect

from pybabe_spark.plans import facade as facade_mod
from pybabe_spark.plans.facade import Babe


def _babe_methods():
    src = inspect.getsource(facade_mod)
    tree = ast.parse(src)
    cls = next(
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name == "Babe"
    )
    for node in cls.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            yield node


def _returns_babe(fn: ast.FunctionDef) -> bool:
    r = fn.returns
    if isinstance(r, ast.Constant) and r.value == "Babe":
        return True
    if isinstance(r, ast.Name) and r.id == "Babe":
        return True
    return False


def _own_nodes(fn: ast.FunctionDef):
    """All AST nodes belonging to ``fn`` itself, not to nested defs."""
    stack = list(fn.body)
    while stack:
        node = stack.pop()
        yield node
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.Lambda)):
            continue
        stack.extend(ast.iter_child_nodes(node))


def test_every_babe_annotated_method_returns():
    missing = []
    for fn in _babe_methods():
        if not _returns_babe(fn):
            continue
        has_return = any(
            isinstance(n, ast.Return) and n.value is not None
            for n in _own_nodes(fn)
        )
        if not has_return:
            missing.append(fn.name)
    assert not missing, (
        f"Babe methods annotated -> Babe with no return of their own "
        f"(stranded-return paste bug): {missing}"
    )


def test_no_unreachable_code_after_return():
    def _check_block(body, where, bad):
        for i, stmt in enumerate(body):
            if isinstance(stmt, (ast.Return, ast.Raise)) and i < len(body) - 1:
                bad.append(where)
            for attr in ("body", "orelse", "finalbody"):
                sub = getattr(stmt, attr, None)
                if sub and not isinstance(
                    stmt, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    _check_block(sub, where, bad)

    bad = []
    for fn in _babe_methods():
        _check_block(fn.body, fn.name, bad)
    assert not bad, f"unreachable code after return/raise in: {sorted(set(bad))}"


def test_no_nested_defs_in_facade_methods():
    nested = []
    for fn in _babe_methods():
        for node in ast.walk(fn):
            if node is fn:
                continue
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                nested.append(f"{fn.name} contains def {node.name}")
    assert not nested, f"nested defs inside Babe methods: {nested}"


def test_bootstrap_mean_ci_facade_smoke(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8])],
        "k int, v double",
    )
    out = Babe(df).bootstrap_mean_ci("v", "k", n_resamples=8)
    assert isinstance(out, Babe)
    rows = out.df.collect()
    assert len(rows) == 1 and rows[0]["n"] == 8


def test_km_survival_facade_smoke(spark):
    df = spark.createDataFrame(
        [(5.0, 1), (8.0, 1), (8.0, 0), (12.0, 1)], "dur double, ev int"
    )
    out = Babe(df).km_survival("dur", "ev")
    assert isinstance(out, Babe)
    assert out.df.count() >= 2


def test_logrank_test_facade_smoke(spark):
    rows = [("a", float(d), 1) for d in (3, 5, 7, 9)] + [
        ("b", float(d), 1) for d in (4, 6, 8, 10)
    ]
    df = spark.createDataFrame(rows, "g string, dur double, ev int")
    out = Babe(df).logrank_test("dur", "ev", "g", "a", "b")
    assert isinstance(out, Babe)
    r = out.df.collect()
    assert len(r) == 1 and r[0]["n_a"] == 4 and r[0]["n_b"] == 4
