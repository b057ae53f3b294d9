"""Keyed merge operators: upsert (last-wins), incremental anti-dedup.

Beyond-reference capability (the closest reference machinery is
``push_sql``'s partition replace, pybabe/sql.py:253-342, which swaps
whole partitions; these merge at ROW granularity). Both are single-join
plans: at 100 TB the update/seen side is typically a small fraction of
the base and broadcasts; otherwise AQE picks a shuffle join on the keys
and the plan is still one exchange per side.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import gen_col
from pybabe_spark.sources.io import INGEST_ID


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: str | Sequence[str],
    order_by: str | None = None,
) -> DataFrame:
    """SCD1 merge: rows from ``updates`` replace same-key rows in
    ``base``; unmatched base rows pass through, new update keys append.

    Replace semantics are enforced, not assumed:

    - NULL keys match null-safely (a NULL-key update row replaces the
      NULL-key base row; SQL join equality would silently keep both).
    - Duplicate keys WITHIN ``updates`` resolve last-wins by
      ``order_by`` (default: the ingest-id column when present). With no
      order available the duplicates are detected (one count job on the
      update side, small by contract) and rejected — 'last' of a
      distributed unordered set is not a defined row.

    Plan: one left-anti join (base minus updated keys) + a narrow union —
    no window over the base, no full-table rewrite logic. Schemas must
    align by name.
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
    order = order_by or (INGEST_ID if INGEST_ID in updates.columns else None)
    if order is not None:
        rn = gen_col(updates.columns, "__rn")
        w = Window.partitionBy(*keys).orderBy(F.col(order).desc())
        updates = (
            updates.withColumn(rn, F.row_number().over(w))
            .filter(F.col(rn) == 1)
            .drop(rn)
        )
    else:
        cnt = gen_col(updates.columns, "__n")
        dup = (
            updates.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias(cnt))
            .filter(F.col(cnt) > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "upsert: duplicate keys in updates with no order to pick "
                "the winner; pass order_by= (or pull with ingest_id=True)"
            )
    upd_keys = updates.select(*keys).distinct()
    cond = reduce(
        lambda a, b: a & b,
        [base[k].eqNullSafe(upd_keys[k]) for k in keys],
    )
    kept = base.join(upd_keys, cond, "left_anti")
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
