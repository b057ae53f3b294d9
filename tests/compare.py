"""Local analogue of the driver's DuckDB oracle compare.

Order-insensitive: columns sorted by name, rows sorted by stringified
values; values compared exactly (the query conventions in
pybabe_spark.queries guarantee bit-identical doubles).
"""

from __future__ import annotations

import math


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def normalize(pdf):
    """pandas DataFrame → sorted list of row tuples over name-sorted columns."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return cols, rows


def assert_frames_match(spark_df, duck_rel, name=""):
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    s_cols, s_rows = normalize(spdf)
    d_cols, d_rows = normalize(ddf)
    assert s_cols == [c.lower() for c in d_cols] or s_cols == d_cols, (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
