"""Spark Connect degradation-path tests (VERDICT r4 #6).

The engine documents that every query path works under Spark Connect
sessions, with plan introspection degrading to "unknown" instead of
raising (pybabe_spark/plans/introspect.py). Two gates:

- an end-to-end smoke under a real ``spark.remote`` local session,
  skipped when the Connect client deps (grpc) aren't installed — this
  sandbox lacks them, but the test runs anywhere ``pip install
  'pyspark[connect]'`` has run;
- an always-on AST gate pinning the classic-only surface (``.rdd``,
  ``sparkContext``) to the sanctioned allowlist, so a Connect-breaking
  call can't sneak into a query path unnoticed.
"""

from __future__ import annotations

import ast
import importlib.util
import os
import subprocess
import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent
_PKG = _REPO / "pybabe_spark"

_HAS_CONNECT_DEPS = importlib.util.find_spec("grpc") is not None

#: functions allowed to touch the classic-only surface:
#: - plans/introspect.py IS the degradation layer (every probe wrapped);
#: - sources/io.py::compact_files and operators/rollup.py::rollup_append
#:   are storage-maintenance tools needing the Hadoop FS JVM handle for
#:   the atomic rename swap, documented classic-only;
#: - streaming/ops.py::_batch is stream_rollup's foreachBatch body (FS
#:   existence probe for the build-vs-append decision — same contract).
_ALLOWED = {
    ("plans/introspect.py", "plan_size_bytes"),
    ("plans/introspect.py", "num_partitions"),
    ("plans/introspect.py", "default_parallelism"),
    ("sources/io.py", "compact_files"),
    ("operators/rollup.py", "rollup_append"),
    ("streaming/ops.py", "_batch"),
}


def _classic_surface_hits(path: Path) -> list[tuple[str, str, int]]:
    """(module, enclosing_function, line) for every ``.rdd`` /
    ``.sparkContext`` attribute access in ``path``."""
    tree = ast.parse(path.read_text())
    hits = []

    def walk(node, func_name):
        for child in ast.iter_child_nodes(node):
            name = func_name
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                name = child.name
            if (
                isinstance(child, ast.Attribute)
                and child.attr in ("rdd", "sparkContext")
            ):
                rel = str(path.relative_to(_PKG)).replace(os.sep, "/")
                hits.append((rel, func_name, child.lineno))
            walk(child, name)

    walk(tree, "<module>")
    return hits


def test_connect_unsafe_surface_is_pinned():
    """No query/source/facade path may grow a ``.rdd``/``sparkContext``
    call: those attributes don't exist on Connect sessions. The only
    sanctioned uses are the introspection degradation layer and the
    classic-only compact_files maintenance tool."""
    hits = []
    for py in sorted(_PKG.rglob("*.py")):
        hits.extend(_classic_surface_hits(py))
    offenders = [
        h for h in hits if (h[0], h[1]) not in _ALLOWED
    ]
    assert offenders == [], (
        f"Connect-unsafe attribute access outside the allowlist: {offenders};"
        " wrap it in plans/introspect.py-style degradation or redesign"
    )


_CONNECT_SCRIPT = r"""
import sys

from pyspark.sql import SparkSession

spark = SparkSession.builder.remote("local[4]").getOrCreate()
try:
    from pybabe_spark.plans.facade import Babe
    from pybabe_spark.plans.lint import plan_lint
    from pybabe_spark.queries import all_queries

    # facade chain: pull (inline string) -> filter -> group -> to_list
    csv = "k,v\na,1\nb,2\na,3\n"
    chain = (
        Babe.pull(spark, string=csv, format="csv")
        .filter("v > 1")
        .groupBy("k", {"n": ("count", "v")})
    )
    rows = chain.to_list()
    assert sorted((r["k"], r["n"]) for r in rows) == [("a", 1), ("b", 1)], rows

    # plan_lint degrades (documented: no findings raise-free on Connect)
    lint = chain.lint()
    assert isinstance(lint, list), lint

    # one relational + one window query from the registry
    qs = all_queries()
    sf = sys.argv[1]
    assert qs["filter_project"](spark, sf).count() > 0
    assert qs["rolling_value_per_user"](spark, sf).count() > 0
    print("CONNECT_SMOKE_OK")
finally:
    spark.stop()
"""


@pytest.mark.skipif(
    not _HAS_CONNECT_DEPS,
    reason="Spark Connect client deps (grpc) not installed in this env",
)
def test_connect_session_end_to_end():
    """pull -> filter -> group -> to_list, plan_lint, and registry
    queries under a real local Spark Connect session (subprocess: a
    Connect client must not share this process's classic JVM)."""
    sf = os.environ.get("PYBABE_TEST_SF_DIR", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "-c", _CONNECT_SCRIPT, sf],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(_REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CONNECT_SMOKE_OK" in proc.stdout
