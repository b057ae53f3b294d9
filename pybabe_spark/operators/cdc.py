"""CDC apply-changes: fold an insert/update/delete change feed into a
keyed snapshot (the lakehouse ``APPLY CHANGES INTO`` / Debezium-sink
primitive).

Beyond-reference capability: the reference's closest machinery is
whole-partition replace (``push_sql``, pybabe/sql.py:253-342) and the
engine's own SCD1 ``upsert`` (operators/merge.py:23) — neither handles
DELETE rows or picks a per-key winner from a multi-row feed. A CDC feed
interleaves I/U/D rows per key; applying it means: per key, the LATEST
change wins (by the feed's ordering columns), a latest-DELETE removes
the key, any other latest op writes its row, and untouched base keys
pass through unchanged.

Scale shape: one window over the CHANGE FEED only (row_number per key —
the feed is the small side by contract, never the base), one left-anti
equi-join of the base against the feed's distinct keys, and a narrow
union. The base is never windowed, never shuffled beyond the anti-join
(which AQE turns into a broadcast when the feed's key set is small —
the daily-batch case), and never rewritten row-by-row. Applying a
0.1%-of-keys feed to a 100 TB dimension moves the feed plus one
broadcast probe of the base.

Idempotence: applying the same feed twice yields the same snapshot
(last-wins is stable and delete-then-absent is absorbing). Feeds are
composable: apply(apply(base, f1), f2) == apply(base, f1 ∪ f2) when
every f2 ordering value exceeds every f1 value for shared keys — the
same append-only contract as ``scd2_upsert``, here without a guard
because a snapshot (unlike an interval history) carries no intra-key
structure an out-of-order row could corrupt: last-wins over the union
is computed identically either way.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import gen_col


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: str | Sequence[str],
    order_by: str | Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change feed to a keyed snapshot. ``changes`` carries the
    base's columns plus ``op_col`` and the ``order_by`` column(s); per
    key the row with the greatest ``order_by`` tuple decides: its op ==
    ``delete_op`` removes the key, anything else (insert and update are
    deliberately the same — upsert) replaces/creates the key's row.
    Returns the base schema. NULL keys match null-safely, as in
    ``upsert``. ``order_by`` must be unique per key within the feed
    (raised at action time otherwise — ties make 'latest' undefined), and a winning row's op must be
    non-NULL (raised at action time — a NULL op would otherwise act
    as a silent DELETE).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    missing = [c for c in keys if c not in base.columns]
    if missing:
        raise ValueError(f"apply_cdc: key columns {missing} not in base")
    need = keys + order + [op_col] + [c for c in base.columns]
    missing = [c for c in dict.fromkeys(need) if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_cdc: changes side lacks {missing}")

    rn = gen_col(changes.columns, "__rn")
    nx = gen_col(changes.columns + [rn], "__nx")
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order]
    )
    # in-plan tie guard: equal order tuples on the same key make the
    # winner engine-dependent; detect via the next row's order tuple
    # (lazy — the FAIL-join idiom, no construction-time job)
    tie = reduce(
        lambda a, b: a & b,
        [F.lead(c).over(w).eqNullSafe(F.col(c)) for c in order],
    )
    latest = (
        changes.withColumn(rn, F.row_number().over(w))
        .withColumn(nx, tie)
        .filter(
            F.when(
                F.col(nx) & (F.col(rn) == 1),
                F.raise_error(
                    F.lit(
                        "apply_cdc: duplicate order_by tuple for a key "
                        "in the change feed; 'latest' is undefined — "
                        "add a tie-break column (e.g. an ingest id)"
                    )
                ).cast("boolean"),
            )
            .when(
                # NULL op on a winning row: `op != delete_op` is NULL,
                # so the row would vanish from writes while its key is
                # still anti-joined away — a silent DELETE. Malformed
                # feeds must fail loudly instead (same lazy idiom).
                (F.col(rn) == 1) & F.col(op_col).isNull(),
                F.raise_error(
                    F.lit(
                        "apply_cdc: NULL op on the winning row of a "
                        "key — a NULL op would act as a silent DELETE;"
                        " fix the feed or map NULL to an upsert op"
                    )
                ).cast("boolean"),
            )
            .otherwise(F.col(rn) == 1)
        )
    )
    changed_keys = latest.select(*keys)
    cond = reduce(
        lambda a, b: a & b,
        [base[k].eqNullSafe(changed_keys[k]) for k in keys],
    )
    kept = base.join(changed_keys, cond, "left_anti")
    writes = latest.filter(F.col(op_col) != F.lit(delete_op)).select(
        *base.columns
    )
    return kept.unionByName(writes)


def apply_cdc_sql(
    base_select: str,
    changes_select: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> str:
    """DuckDB oracle of :func:`apply_cdc` — same last-wins window +
    anti-join + union, over arbitrary base/changes subqueries."""
    keys = list(keys)
    order = ", ".join(f"{c} DESC" for c in order_by)
    part = ", ".join(keys)
    cols = ", ".join(list(keys) + list(value_cols))
    on = " AND ".join(f"b.{k} IS NOT DISTINCT FROM c.{k}" for k in keys)
    return f"""
    WITH base AS ({base_select}),
    changes AS ({changes_select}),
    latest AS (
        SELECT *
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY {part} ORDER BY {order}) AS __rn
            FROM changes
        ) WHERE __rn = 1
    ),
    kept AS (
        SELECT {cols} FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM latest c WHERE {on})
    )
    SELECT {cols} FROM kept
    UNION ALL
    SELECT {cols} FROM latest WHERE {op_col} <> '{delete_op}'
    """
