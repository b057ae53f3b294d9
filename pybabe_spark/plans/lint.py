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


def _build_side_max_rows(side) -> float:
    """``maxRows`` proof for a physical build side: the first node
    at-or-under ``side`` that carries a ``logicalLink``, descending only
    through single-child physical-only wrappers (Broadcast/Shuffle
    exchanges never get links of their own). ``inf`` when unprovable —
    the caller then does NOT discount."""
    for _ in range(64):
        try:
            ll = side.logicalLink()
            if ll.isDefined():
                mr = ll.get().maxRows()
                return float(mr.get()) if mr.isDefined() else float("inf")
            if side.children().size() == 1:
                side = side.children().head()
                continue
        except Exception:
            pass
        return float("inf")
    return float("inf")


def _bnlj_counts(df: DataFrame):
    """``(total, benign)`` PHYSICAL BroadcastNestedLoopJoin nodes from
    ONE tree walk — benign = build side provably ≤1 row (``maxRows``
    from the build subtree's logical link — e.g. a grouping-key-free
    aggregate, a ``LIMIT 1``). Such a join is linear in the probe side
    — the attach-a-global-scalar idiom (operators/_util.py::
    attach_scalars) — so it is not a scale smell, with or without a
    join condition (Catalyst folds downstream filters into the BNLJ
    condition, so requiring condition-less-ness would un-discount the
    idiom whenever a filter sits above it).

    Total comes from the SAME walk as the discount (not the plan
    STRING): an ``InMemoryRelation`` prints its whole cached plan
    inside every ``InMemoryTableScan`` reference, so a string count
    sees each cached-subtree BNLJ once per reference (observed: the
    r12 persist-pinned spearman showed 8 string hits for 2 real
    nodes). The walk instead descends into each cached plan once via
    ``relation().cachedPlan()``, so cache-hidden joins are still
    counted AND still eligible for the 1-row discount. Errors (and
    sessions without the classic JVM plan handle — Spark Connect)
    return ``None``: the caller falls back to the string count with
    zero discount — degrading toward flagging MORE, never less."""
    try:
        plan = df._jdf.queryExecution().executedPlan()
    except Exception:
        return None
    total = benign = 0
    seen_caches = set()
    stack = [plan]
    while stack:
        node = stack.pop()
        try:
            name = node.getClass().getSimpleName()
        except Exception:
            continue
        try:
            # AdaptiveSparkPlanExec holds the real tree out-of-children
            stack.append(node.initialPlan())
        except Exception:
            pass
        try:
            # descend into the cached plan ONCE per relation: real
            # compute on a cache miss, and where r12's pinned rank
            # grains hide their upstream joins
            rel = node.relation()
            rid = rel.toString()
            if rid not in seen_caches:
                seen_caches.add(rid)
                stack.append(rel.cachedPlan())
        except Exception:
            pass
        if "BroadcastNestedLoopJoin" in name:
            total += 1
            try:
                build_right = "BuildRight" in node.buildSide().toString()
                side = node.right() if build_right else node.left()
                if _build_side_max_rows(side) <= 1:
                    benign += 1
            except Exception:
                pass
        try:
            it = node.children().iterator()
            while it.hasNext():
                stack.append(it.next())
        except Exception:
            continue
    return total, benign


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
    counts = _bnlj_counts(df)
    if counts is None:  # no classic plan handle: string count, no discount
        bnlj = phys.count("BroadcastNestedLoopJoin")
    else:
        bnlj = counts[0] - counts[1]
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
