"""Capture .explain('formatted') for registry keys to plans/<tag>/.

Usage::

    python tools/capture_plans.py <tag> <suffix> key1 [key2 ...]

Writes ``plans/<tag>/<key>_<suffix>.txt`` (e.g. tag=r13,
suffix=before) with the formatted physical plan of each key at
$SPARK_GRAFT_SF_DIR (default sf0.1). Plans are captured WITHOUT
executing the query (AQE plans show isFinalPlan=false).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    from pybabe_spark.queries import all_queries
    from pybabe_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("pybabe_spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for k in keys:
        df = qs[k](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
