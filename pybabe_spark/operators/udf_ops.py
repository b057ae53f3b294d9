"""Arbitrary-Python row-transform surface: mapTo / bulkMapTo / flatMap /
iterate / filter-by-function.

Reference: pybabe/transform.py:6-155 + pybabe/iterate.py — PyBabe's whole
API is a UDF surface (SURVEY §2.10). Spark-first ranking of escape
hatches, fastest first:

1. Column expressions (not in this module — just use ``withColumn``);
2. ``mapInPandas`` — Arrow-batched, the analogue of ``bulkMapTo``
   (pybabe/transform.py:66-95), which is exactly PyBabe's own
   "vectorize in bulk" idea;
3. per-row Python callables wrapped into the batched form below (the
   reference's ``mapTo``/``iterate``/``flatMap`` one-row protocol).

Schema modes mirror the reference (pybabe/transform.py:24-47):
``insert_fields`` appends columns; ``fields`` replaces the schema.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _base_schema(df: DataFrame) -> str:
    """The frame's own schema as a DDL string — the one rendering site."""
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )


def _out_schema(df: DataFrame, insert_fields: str | None, fields: str | None) -> str:
    if (insert_fields is None) == (fields is None):
        raise ValueError("pass exactly one of insert_fields / fields (DDL strings)")
    if fields is not None:
        return fields
    return f"{_base_schema(df)}, {insert_fields}"


def bulk_map_to(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    insert_fields: str | None = None,
    fields: str | None = None,
) -> DataFrame:
    """Batched map (pybabe/transform.py:66-95) → ``mapInPandas``.

    ``fn`` receives each Arrow batch as a pandas DataFrame and returns a
    DataFrame matching the output schema. This is the fast Python path:
    one interpreter crossing per batch, not per row.
    """
    schema = _out_schema(df, insert_fields, fields)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_run, schema=schema)


def map_to(
    df: DataFrame,
    fn: Callable[[dict], dict],
    insert_fields: str | None = None,
    fields: str | None = None,
) -> DataFrame:
    """Row map (pybabe/transform.py:6-63; iterate.py:5-30).

    ``fn(row_dict) -> row_dict``. Wrapped into the batched executor —
    rows cross into Python in Arrow batches and ``fn`` runs per row
    inside the batch loop (still ~10× faster than a row-at-a-time UDF).
    """
    schema = _out_schema(df, insert_fields, fields)

    def _batch(pdf: pd.DataFrame) -> pd.DataFrame:
        out = [fn(rec) for rec in pdf.to_dict("records")]
        return pd.DataFrame(out)

    return bulk_map_to(df, _batch, fields=schema)


def flat_map(
    df: DataFrame,
    fn: Callable[[dict], Iterable[dict]],
    insert_fields: str | None = None,
    fields: str | None = None,
) -> DataFrame:
    """1→N row map (pybabe/transform.py:112-155).

    ``fn(row_dict) -> iterable of row_dicts``. For array-shaped
    expansions prefer ``explode`` (see operators.relational.split_rows) —
    this is the arbitrary-Python form.
    """
    schema = _out_schema(df, insert_fields, fields)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                out.extend(fn(rec))
            if out:
                yield pd.DataFrame(out)
            # empty batches yield nothing; Spark fills the declared schema

    return df.mapInPandas(_run, schema=schema)


def map_filter(df: DataFrame, fn: Callable[[dict], bool]) -> DataFrame:
    """Arbitrary-Python predicate (pybabe/transform.py:294-302 general
    case). Prefer a Column expression — this exists for the opaque-fn
    parity case only and cannot push down to the scan."""

    def _batch(pdf: pd.DataFrame) -> pd.DataFrame:
        mask = [bool(fn(rec)) for rec in pdf.to_dict("records")]
        return pdf[pd.Series(mask, index=pdf.index)]

    return bulk_map_to(df, _batch, fields=_base_schema(df))
