"""Small shared helpers for operator implementations."""

from __future__ import annotations

from collections.abc import Iterable


def gen_col(columns: Iterable[str], base: str) -> str:
    """A working-column name guaranteed absent from ``columns``.

    Operators that attach temporary columns (row numbers, flags, group
    keys) must not clobber a user column that legitimately carries the
    same name — suffix until unique instead of assuming ``__``-prefixed
    names are free.
    """
    taken = set(columns)
    name = base
    i = 0
    while name in taken:
        i += 1
        name = f"{base}_{i}"
    return name


def attach_scalars(df, scalars):
    """Attach the columns of a known-1-row DataFrame (global totals,
    vocabulary sizes) to every row of ``df`` — lazily, with no driver
    action: ``crossJoin(broadcast(one_row))``.

    This plans as a BroadcastNestedLoopJoin, which is linear (not
    quadratic) when the build side is one row; plan_lint proves exactly
    that case from the logical plan's ``maxRows`` and does not flag it
    (a grouping-key-free aggregate has ``maxRows = 1``).
    """
    from pyspark.sql import functions as F

    return df.crossJoin(F.broadcast(scalars))
