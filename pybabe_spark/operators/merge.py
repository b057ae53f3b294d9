"""Keyed merge operators: upsert (last-wins), incremental anti-dedup.

Beyond-reference capability (the closest reference machinery is
``push_sql``'s partition replace, pybabe/sql.py:253-342, which swaps
whole partitions; these merge at ROW granularity). Both are single-join
plans: at 100 TB the update/seen side is typically a small fraction of
the base and broadcasts; otherwise AQE picks a shuffle join on the keys
and the plan is still one exchange per side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: str | Sequence[str],
) -> DataFrame:
    """SCD1 merge: rows from ``updates`` replace same-key rows in
    ``base``; unmatched base rows pass through, new update keys append.

    Plan: one left-anti join (base minus updated keys) + a narrow union —
    no window, no full-table rewrite logic. Schemas must align by name.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    missing = [k for k in keys if k not in base.columns or k not in updates.columns]
    if missing:
        raise ValueError(f"upsert: key columns {missing} absent from a side")
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            "upsert: schemas differ: "
            f"{sorted(set(base.columns) ^ set(updates.columns))}"
        )
    kept = base.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)


def dedup_against(
    df: DataFrame,
    seen: DataFrame,
    keys: str | Sequence[str],
) -> DataFrame:
    """Incremental dedup: drop rows whose key already appears in the
    ``seen`` set (e.g. this batch vs. the historical corpus keys). One
    left-anti join; with a small seen-side it broadcasts, and at lake
    scale the seen set is a key-only projection — read narrow, join on
    sorted/bucketed layout when available."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.join(seen.select(*keys).distinct(), keys, "left_anti")
