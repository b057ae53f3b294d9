"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pybabe_spark.session import get_spark
    from pybabe_spark.queries import all_queries

    spark = get_spark("pybabe_spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    qs = all_queries()
    timings: dict[str, float] = {}

    # Warm pass at the smallest SF: triggers whole-stage codegen JIT and
    # file-index setup for every query's code path without touching the
    # timed dataset (standard JVM bench hygiene).
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name, fn in qs.items():
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass

    t_total = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(time.perf_counter() - t_total, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
