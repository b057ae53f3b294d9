"""Sharded test runner: the full suite in parallel worker processes.

809 tests single-process take ~28 minutes — almost all of it Spark
actions that leave 31 of the sandbox's 32 cores idle at any instant
(each test runs few concurrent tasks at sf0.001). pytest-xdist is not
available in this environment, so this runner does the same thing by
hand:

- test FILES are greedily bin-packed into N shards (largest first, by
  file size — a good-enough duration proxy; ``--list`` shows the plan);
- each shard runs ``python -m pytest <files>`` in its own process with
  its own CWD (tempdir), so the Derby metastore, ``spark-warehouse/``
  and ``derby.log`` never collide across workers;
- each worker gets ``SPARK_GRAFT_CPUS // workers`` Spark threads so the
  box is shared instead of oversubscribed;
- output is captured per shard and replayed on failure; the exit code
  is non-zero if ANY shard fails.

Usage::

    python run_tests_sharded.py            # 4 workers
    python run_tests_sharded.py -n 6       # 6 workers
    python run_tests_sharded.py -- -k cdc  # extra pytest args

This is a developer-loop tool; the driver's gate and CI-style runs can
keep using plain ``python -m pytest tests/ -q``.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))


#: duration correction for files whose cost the size proxy misses:
#: oracle-parity is a small file expanding to ~236 parametrized Spark+
#: DuckDB comparisons; streaming tests sit in availableNow waits.
_WEIGHT = {
    "test_oracle_parity.py": 12,
    "test_oracle_parity_sf01.py": 16,
    "test_streaming.py": 4,
}


def _cost(f: str) -> int:
    return os.path.getsize(f) * _WEIGHT.get(os.path.basename(f), 1)


def shard_files(n: int) -> list[list[str]]:
    """Greedy largest-first bin packing of test files by weighted size."""
    files = sorted(
        glob.glob(os.path.join(REPO, "tests", "test_*.py")),
        key=_cost,
        reverse=True,
    )
    bins: list[tuple[int, list[str]]] = [(0, []) for _ in range(n)]
    for f in files:
        size, members = min(bins, key=lambda b: b[0])
        i = bins.index((size, members))
        bins[i] = (size + _cost(f), members + [f])
    return [members for _, members in bins if members]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=4)
    ap.add_argument("--list", action="store_true", help="show shard plan")
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    shards = shard_files(args.workers)
    if args.list:
        for i, s in enumerate(shards):
            total = sum(os.path.getsize(f) for f in s)
            print(f"shard {i}: {total//1024} KiB, {len(s)} files")
            for f in s:
                print("   ", os.path.basename(f))
        return 0

    total_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    per_worker = max(2, total_cpus // max(len(shards), 1))
    t0 = time.time()
    procs = []
    for i, files in enumerate(shards):
        env = dict(os.environ)
        # workers run with CWD = tempdir (Derby/warehouse isolation), so
        # executor Python workers can no longer find the repo via cwd —
        # without this, any UDF whose closure references pybabe_spark or
        # a tests.* helper dies with ModuleNotFoundError on the executor
        env["PYTHONPATH"] = REPO + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        env["SPARK_GRAFT_CPUS"] = str(per_worker)
        env.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
        # the sharded run is the FULL suite: deep-marked tests (slow
        # equivalence/stress cases skipped in the budgeted
        # single-process run) are included here
        env.setdefault("PYBABE_DEEP_TESTS", "1")
        # keep per-worker JVMs inside the box's memory budget
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
        cwd = tempfile.mkdtemp(prefix=f"pytest_shard{i}_")
        out = open(os.path.join(cwd, "pytest.out"), "w")
        cmd = [
            sys.executable, "-m", "pytest", "-q",
            "-p", "no:cacheprovider",
            *args.pytest_args,
            *files,
        ]
        procs.append((i, subprocess.Popen(
            cmd, cwd=cwd, env=env, stdout=out, stderr=subprocess.STDOUT,
        ), cwd, out))
        print(f"shard {i}: {len(files)} files, local[{per_worker}] "
              f"(log: {cwd}/pytest.out)")

    failed = False
    for i, p, cwd, out in procs:
        rc = p.wait()
        out.close()
        tail = open(os.path.join(cwd, "pytest.out")).read()
        last = [ln for ln in tail.strip().splitlines() if ln.strip()]
        print(f"shard {i}: exit {rc} — {last[-1] if last else '(no output)'}")
        if rc != 0:
            failed = True
            print(f"--- shard {i} full output ---")
            print(tail[-8000:])
    print(f"total wall: {time.time() - t0:.0f}s")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
