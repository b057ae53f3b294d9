"""Standalone oracle-equivalence check for registry keys.

Usage::

    python tools/verify_keys.py <sf_dir> key1 [key2 ...]
    python tools/verify_keys.py <sf_dir> --all

Runs each ``queries()[key]`` against the DuckDB ``oracle_sql()[key]``
with the driver's comparison semantics (order-insensitive, exact
values via tests/compare.normalize) and prints PASS/FAIL per key.
Exit code 0 iff every key passes. Used during optimization rounds to
prove a restructured query still computes the identical result before
committing (the driver re-hashes every key after the round).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    from compare import normalize
    from pybabe_spark.queries import all_oracles, all_queries
    from pybabe_spark.session import get_spark

    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    qs, os_ = all_queries(), all_oracles()
    if keys == ["--all"]:
        keys = list(qs)

    spark = get_spark("pybabe_spark-verify")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    failed = []
    for k in keys:
        try:
            sdf = qs[k](spark, sf_dir)
            s_cols, s_rows = normalize(sdf.toPandas())
            d_cols, d_rows = normalize(con.execute(os_[k]).df())
            ok_cols = s_cols == [c.lower() for c in d_cols] or s_cols == d_cols
            ok = ok_cols and s_rows == d_rows
            if not ok:
                diff = next(
                    (
                        (i, a, b)
                        for i, (a, b) in enumerate(zip(s_rows, d_rows))
                        if a != b
                    ),
                    None,
                )
                print(
                    f"FAIL {k}: cols_ok={ok_cols} "
                    f"rows spark={len(s_rows)} duck={len(d_rows)} "
                    f"first_diff={diff}"
                )
                failed.append(k)
            else:
                print(f"PASS {k} ({len(s_rows)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {k}: {type(e).__name__}: {e}")
            failed.append(k)
    spark.stop()
    con.close()
    if failed:
        print(f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
