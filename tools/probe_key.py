"""Per-key cost breakdown: construction vs execution, job/stage counts.

Usage::

    python tools/probe_key.py key1 [key2 ...]    # at $SPARK_GRAFT_SF_DIR

For each key, after one warm run: min-of-3 of (a) plan construction
(`fn(spark, sf_dir)`), (b) the count() action; plus the number of Spark
jobs and stages the action launched (status-store delta) — the
orchestration-floor signal (each local job costs a fixed ~0.1-0.3 s).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _counts(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    arr = sc._gateway.new_array(sc._jvm.double, 0)
    stages = store.stageList(empty, False, False, arr, empty)
    n_stages = 0
    it = stages.iterator()
    while it.hasNext():
        it.next()
        n_stages += 1
    jobs = store.jobsList(empty)
    n_jobs = 0
    it = jobs.iterator()
    while it.hasNext():
        it.next()
        n_jobs += 1
    return n_jobs, n_stages


def main() -> int:
    from pybabe_spark.queries import all_queries
    from pybabe_spark.session import get_spark

    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "pybabe_spark-probe",
        extra_conf={"spark.ui.retainedStages": "100000",
                    "spark.ui.retainedJobs": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for k in keys:
        fn = qs[k]
        fn(spark, sf_dir).count()  # warm
        cons = run = 1e9
        jobs = stages = 0
        for i in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j0, s0 = _counts(spark)
            df.count()
            j1, s1 = _counts(spark)
            t2 = time.perf_counter()
            cons = min(cons, t1 - t0)
            run = min(run, t2 - t1)
            jobs, stages = j1 - j0, s1 - s0
        print(
            f"{k}: construct={cons:.3f}s action={run:.3f}s "
            f"jobs={jobs} stages={stages}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
