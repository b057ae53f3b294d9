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
