"""JSON column operators: typed extraction and flattening.

Beyond-reference capability (the reference parses whole files of
formats, pybabe/format_*.py — it has no per-cell semi-structured
tooling; every modern event pipeline carries a JSON properties column).
Spark-first: extraction is ``get_json_object`` / ``from_json`` —
JVM-side Jackson, whole-stage codegen around it, zero Python.

Cross-engine note: the registry oracle extracts with DuckDB's
``json_extract_string``, which agrees with ``get_json_object`` on
scalar leaves (strings, integer/decimal literals, booleans rendered
``true``/``false``, missing → NULL). Two documented divergences: nested OBJECT
re-serialization is not canonicalized identically across engines —
extract scalars, or cast after extraction (``json_flatten``'s typed
casts are the recommended path) — and MALFORMED cells return NULL here
(Jackson lenient) while DuckDB's json_extract errors; oracle queries
therefore run over well-formed columns.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_get(col: Column | str, path: str) -> Column:
    """Scalar leaf at a dotted path (``a.b[0].c``) as a STRING (NULL
    when absent/mismatched) — ``get_json_object`` with the ``$.``
    prefix handled."""
    c = F.col(col) if isinstance(col, str) else col
    p = path if path.startswith("$") else "$." + path
    return F.get_json_object(c, p)


def json_flatten(
    df: DataFrame,
    col: str,
    fields: Mapping[str, str],
    prefix: str = "",
    keep: bool = False,
) -> DataFrame:
    """Promote JSON leaves to typed top-level columns: ``fields`` maps
    dotted path → Spark type DDL (``{"k": "int", "user.name":
    "string"}`` → columns ``k``, ``user_name`` via ``try``-semantics
    casts, so a malformed cell degrades to NULL instead of failing the
    job under ANSI mode). ``prefix`` namespaces the new columns;
    ``keep=False`` drops the raw JSON column after extraction.

    Pure codegen — a linear projection, no shuffle; at 100 TB this is
    scan-speed and column-pruned like any projection."""
    out = df
    for path, dtype in fields.items():
        name = prefix + path.replace(".", "_").replace("[", "_").replace(
            "]", ""
        )
        out = out.withColumn(
            name, json_get(F.col(col), path).try_cast(dtype)
        )
    return out if keep else out.drop(col)
