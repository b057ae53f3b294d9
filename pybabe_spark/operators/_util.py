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


#: DataFrames persisted by operators through lazy_persist — a release
#: path for long sessions. Entries are plan handles (tiny driver
#: objects); the cached BLOCKS only materialize when an action runs.
#: :func:`unpersist_tracked` frees the blocks AND drops the handles,
#: after which Spark's ContextCleaner (``spark.cleaner.
#: referenceTracking``, on by default) can reclaim anything the JVM
#: still holds.
_TRACKED_PERSISTS: list = []


def lazy_persist(df):
    """``df.persist()`` with lifecycle tracking.

    The operators' lazy-persist idiom (cache a stage consumed by two+
    downstream branches; no job is triggered at construction) has no
    natural unpersist point — the API is lazy, the caller owns the
    action. Registering the handle here gives sessions that build many
    plans an explicit release valve (:func:`unpersist_tracked`); a
    strong reference is required because the operator-local DataFrame
    dies at function return and a weakref would never survive to the
    cleanup call.
    """
    out = df.persist()
    _TRACKED_PERSISTS.append(out)
    return out


def unpersist_tracked() -> int:
    """Unpersist every DataFrame registered by :func:`lazy_persist`
    and drop the tracker's references; returns how many were released.
    Safe to call any time — a stopped session's entries are skipped.
    """
    n = 0
    while _TRACKED_PERSISTS:
        df = _TRACKED_PERSISTS.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
