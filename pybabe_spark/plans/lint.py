"""Plan linting: detect 100 TB scale-killers in a DataFrame's plan.

SCALE.md documents the discipline (broadcast the small side, partition
every window, keep Python out of the hot path); this module ENFORCES it
programmatically — run ``plan_lint(df)`` in a test or before launching a
big job and fail on findings. The checks walk the OPTIMIZED logical plan
as JSON (``toJSON`` — stable node classes, no string-format parsing of
the pretty printer):

- **cartesian-product** — a join with no usable equality that the
  planner executes as a physical ``CartesianProduct`` (neither side
  broadcastable): |left|×|right| rows shuffled; at any real scale this
  is the job that never finishes.
- **broadcast-nested-loop** — the same no-equality join shape, but one
  side is broadcast (hint or under the threshold): quadratic COMPUTE
  against a bounded build side. Legitimate for small-dim range lookups
  (geoip) and the quarantined all-pairs oracle definitions — advisory,
  so callers opt in per plan via ``allow``.
- **global-window** — a window function with an empty ``partitionSpec``:
  every row funnels through ONE task regardless of cluster size.
- **row-python-udf** — a ``BatchEvalPython`` stage (row-at-a-time
  Python UDF, one serialize/deserialize per row). Arrow-batched pandas
  UDFs (``ArrowEvalPython``/``MapInPandas``/``FlatMapGroupsInPandas``)
  are the sanctioned Python path and do NOT trip it.

Each finding is (code, detail). Lint is advisory inspection — it never
raises on its own, and on sessions without the classic plan surface
(Spark Connect) it returns [] rather than failing.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

#: findings: (code, human detail)
Finding = tuple[str, str]


def _plan_nodes(df: DataFrame) -> list[dict]:
    try:
        return json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    except Exception:
        return []


def plan_lint(df: DataFrame) -> list[Finding]:
    """Scale-smell findings for ``df``'s plan (logical shape checks +
    the physical join strategy).

    Join findings come straight from the PHYSICAL strategy Catalyst
    chose — one finding per CartesianProduct / BroadcastNestedLoopJoin
    node — not from scanning the logical condition for an EqualTo: a
    condition like ``(x == y) OR (x < y)`` or ``a.x == 5`` contains an
    equality yet still plans as a nested loop, which a syntactic check
    would wave through.
    """
    findings: list[Finding] = []
    try:
        phys = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        phys = ""  # no classic plan surface (Connect) — logical checks only
    for _ in range(phys.count("CartesianProduct")):
        findings.append(
            (
                "cartesian-product",
                "join planned as CartesianProduct (no usable equality, "
                "neither side broadcast) multiplies both sides; broadcast "
                "a bucketed/candidate form instead",
            )
        )
    for _ in range(phys.count("BroadcastNestedLoopJoin")):
        findings.append(
            (
                "broadcast-nested-loop",
                "join planned as BroadcastNestedLoopJoin: bounded memory "
                "but quadratic compute — fine only if the broadcast side "
                "stays small",
            )
        )
    for node in _plan_nodes(df):
        cls = node.get("class", "")
        kind = cls.rsplit(".", 1)[-1]
        if kind == "Window" and not node.get("partitionSpec"):
            findings.append(
                (
                    "global-window",
                    "window with empty partitionSpec funnels every row "
                    "through one task; add partition_by",
                )
            )
        elif kind == "BatchEvalPython":
            findings.append(
                (
                    "row-python-udf",
                    "row-at-a-time Python UDF in the plan; use a pandas_udf "
                    "(Arrow-batched) or built-in functions",
                )
            )
    return findings


def assert_scales(df: DataFrame, allow: set[str] = frozenset()) -> DataFrame:
    """Raise if ``plan_lint`` finds anything not in ``allow``; otherwise
    return ``df`` unchanged (chainable guard for pipeline code)."""
    bad = [f for f in plan_lint(df) if f[0] not in allow]
    if bad:
        raise ValueError(
            "plan does not scale: "
            + "; ".join(f"[{code}] {detail}" for code, detail in bad)
        )
    return df
