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


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed dataset diff (the dataset-versioning primitive): one row
    per key whose presence or compared values changed between ``a``
    (old) and ``b`` (new) — ``change`` ∈ ``added`` (key only in b) /
    ``removed`` (only in a) / ``changed`` (both, any compared column
    differing null-safely), plus ``changed_cols`` (comma-joined in
    schema order; empty for added/removed). Identical rows are absent
    from the output. Duplicate keys are a caller bug (diff semantics
    need key uniqueness); pre-dedup with ``dedup``.

    Plan: one full-outer equi-join on the keys — one shuffle per side,
    AQE broadcasts whichever side is small — and pure-codegen flag
    columns. At 100 TB this is the minimal movement a keyed diff can
    do.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [c for c in a.columns if c not in keys]
    missing = [c for c in compare_cols if c not in b.columns]
    if missing:
        raise ValueError(f"table_diff: {missing} absent from new side")
    marker_a = gen_col(list(a.columns) + list(b.columns), "__in_a")
    marker_b = gen_col(list(a.columns) + list(b.columns) + [marker_a], "__in_b")
    left = a.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        F.lit(True).alias(marker_a),
    )
    right = b.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(True).alias(marker_b),
    )
    j = left.join(right, keys, "full_outer")
    diffs = [
        F.when(
            ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_cols = F.concat_ws(
        ",", F.filter(F.array(*diffs), lambda x: x.isNotNull())
    )
    change = (
        F.when(F.col(marker_a).isNull(), F.lit("added"))
        .when(F.col(marker_b).isNull(), F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .withColumn(
            "changed_cols",
            F.when(F.col("change") == "changed", changed_cols).otherwise(
                F.lit("")
            ),
        )
        .filter(F.col("change").isNotNull())
        .select(*keys, "change", "changed_cols")
    )


def table_diff_sql(
    table_a: str,
    table_b: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """DuckDB oracle of :func:`table_diff` (same null-safe compare,
    same schema-order changed_cols)."""
    keys = list(keys)
    # plain equality join: NULL keys never match, mirroring the Spark
    # join — a NULL-key row diffs as removed-from-a / added-in-b
    on = " AND ".join(f"aa.{k} = bb.{k}" for k in keys)
    key_out = ", ".join(f"COALESCE(aa.{k}, bb.{k}) AS {k}" for k in keys)
    diff_items = ", ".join(
        f"CASE WHEN aa.{c} IS DISTINCT FROM bb.{c} THEN '{c}' END"
        for c in compare_cols
    )
    changed = (
        f"array_to_string(list_filter([{diff_items}], "
        "x -> x IS NOT NULL), ',')"
    )
    return f"""
    WITH aa AS (SELECT *, TRUE AS __ina FROM {table_a}),
         bb AS (SELECT *, TRUE AS __inb FROM {table_b}),
    j AS (
        SELECT {key_out},
               CASE WHEN __ina IS NULL THEN 'added'
                    WHEN __inb IS NULL THEN 'removed'
                    WHEN {changed} <> '' THEN 'changed' END AS change,
               CASE WHEN __ina IS NOT NULL AND __inb IS NOT NULL
                    THEN {changed} ELSE '' END AS changed_cols
        FROM aa FULL OUTER JOIN bb ON {on}
    )
    SELECT * FROM j WHERE change IS NOT NULL
    """


def golden_record(
    df: DataFrame,
    cluster_col: str,
    order_by: str,
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Survivorship / golden-record merge: one row per cluster, each
    value column filled with its most-recent NON-NULL value by
    ``order_by`` (unique within a cluster — raise upstream otherwise;
    typically an updated_at or ingest id). The step after entity
    resolution: fuzzy_pairs → dup_clusters → golden_record turns a
    pile of partial duplicate records into one best composite. Output:
    ``(cluster, value_cols…, n_members)``.

    Per-column survivorship (not whole-row): a cluster whose newest
    row has a NULL phone but an older row knows it yields the
    composite with BOTH — the standard MDM merge rule.

    Plan: ONE hash aggregation — ``max_by(col, order) FILTER (col IS
    NOT NULL)`` per column (both engines share the FILTER-clause
    semantics exactly) — map-side combinable, no window, no join, one
    shuffle on the cluster key.
    """
    value_cols = [
        c
        for c in (value_cols or df.columns)
        if c not in (cluster_col, order_by)
    ]
    aggs = [
        F.expr(
            f"max_by({c}, {order_by}) FILTER (WHERE {c} IS NOT NULL)"
        ).alias(c)
        for c in value_cols
    ]
    return df.groupBy(cluster_col).agg(
        *aggs, F.count(F.lit(1)).alias("n_members")
    )


def golden_record_sql(
    table: str,
    cluster_col: str,
    order_by: str,
    value_cols: Sequence[str],
) -> str:
    """DuckDB oracle of :func:`golden_record` — identical FILTERed
    max_by aggregation."""
    aggs = ", ".join(
        f"max_by({c}, {order_by}) FILTER (WHERE {c} IS NOT NULL) AS {c}"
        for c in value_cols
    )
    return f"""
    SELECT {cluster_col}, {aggs}, COUNT(*) AS n_members
    FROM {table} GROUP BY {cluster_col}
    """
