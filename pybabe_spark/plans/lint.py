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
raises on its own. On sessions without the classic plan surface (Spark
Connect) the join-strategy and row-UDF checks still run against the
server-rendered ``explain`` string; only the global-window check (which
needs the optimized-plan JSON) degrades to no-finding there.
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


def _physical_plan_string(df: DataFrame) -> str:
    """The executed-plan string; on sessions without the classic JVM
    handle (Spark Connect) fall back to capturing ``df.explain`` output,
    which the Connect server renders remotely — so the join-strategy
    checks still SEE the plan instead of silently passing everything."""
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return _explain_physical(df)


def _explain_physical(df: DataFrame) -> str:
    """Physical-plan section of the captured ``df.explain`` output — the
    plan surface that works on both classic and Connect sessions."""
    import contextlib
    import io as _io

    buf = _io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            df.explain(mode="extended")
    except Exception:
        return ""
    text = buf.getvalue()
    # only the physical section: logical nodes ('Join Cross, ...') must
    # not be miscounted as physical CartesianProduct strategies
    marker = "== Physical Plan =="
    return text[text.index(marker):] if marker in text else text


def _single_row_side_joins(df: DataFrame) -> int:
    """Number of logical Join nodes that will plan as a nested loop
    (no join condition — a cross join) AND have a PROVABLY ≤1-row side
    (``maxRows`` from Catalyst — e.g. a grouping-key-free aggregate, a
    ``LIMIT 1``). Such a join is linear in the other side, so the
    BroadcastNestedLoopJoin it plans to — the attach-a-global-scalar
    idiom (operators/_util.py::attach_scalars) — is not a scale smell.

    Both predicates are required: a 1-row-side join WITH a condition
    plans as a hash join and never produces the BNLJ node being
    discounted, so counting it would let one benign equi-join mask a
    genuine quadratic nested loop elsewhere in the same plan. Errors
    (and sessions without the classic JVM plan handle — Spark Connect)
    count 0: lint degrades toward flagging MORE, never less."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
    except Exception:
        return 0
    count = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        try:
            if (
                node.getClass().getSimpleName() == "Join"
                and not node.condition().isDefined()
            ):
                for side in (node.left(), node.right()):
                    mr = side.maxRows()
                    if mr.isDefined() and mr.get() <= 1:
                        count += 1
                        break
            it = node.children().iterator()
            while it.hasNext():
                stack.append(it.next())
        except Exception:
            continue
    return count


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
    phys = _physical_plan_string(df)
    for _ in range(phys.count("CartesianProduct")):
        findings.append(
            (
                "cartesian-product",
                "join planned as CartesianProduct (no usable equality, "
                "neither side broadcast) multiplies both sides; broadcast "
                "a bucketed/candidate form instead",
            )
        )
    bnlj = phys.count("BroadcastNestedLoopJoin") - _single_row_side_joins(df)
    for _ in range(max(bnlj, 0)):
        findings.append(
            (
                "broadcast-nested-loop",
                "join planned as BroadcastNestedLoopJoin: bounded memory "
                "but quadratic compute — fine only if the broadcast side "
                "stays small",
            )
        )
    nodes = _plan_nodes(df)
    if not nodes:
        # Connect fallback: the optimized-plan JSON needs the classic
        # handle, but BatchEvalPython stages are visible in the explain
        # string; global-window detection stays JSON-only (the rendered
        # window spec is not reliably parseable for an empty partition).
        for _ in range(phys.count("BatchEvalPython")):
            findings.append(
                (
                    "row-python-udf",
                    "row-at-a-time Python UDF in the plan; use a pandas_udf "
                    "(Arrow-batched) or built-in functions",
                )
            )
    for node in nodes:
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
