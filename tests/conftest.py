import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "deep: slow equivalence/stress test; skipped unless "
        "PYBABE_DEEP_TESTS=1 (run_tests_sharded.py sets it) so the "
        "single-process run fits a CI time budget",
    )


#: nodeid substrings gated with the deep mark — the centralized list
#: for parametrized cases (oracle-parity entries) where a decorator
#: per instance is impossible. Measured on the r14 full single-process
#: run (57m49s total): every entry here was >=10s of wall.
_DEEP_NODEIDS: "list[str]" = [
    "test_oracle_parity[lm_trigram_perplexity_docs]",
    "test_oracle_parity[gopher_quality_rules]",
    "test_oracle_parity[lsh_calibration_docs]",
    "test_oracle_parity_sf01[lsh_calibration_docs]",
    "test_oracle_parity_sf01[spearman_lineitem]",
    "test_oracle_parity_sf01[bootstrap_ci_orders]",
]


def pytest_collection_modifyitems(config, items):
    if os.environ.get("PYBABE_DEEP_TESTS", "0") == "1":
        return
    skip = pytest.mark.skip(
        reason="deep test: set PYBABE_DEEP_TESTS=1 to run "
        "(run_tests_sharded.py does)"
    )
    for item in items:
        if "deep" in item.keywords or any(
            s in item.nodeid for s in _DEEP_NODEIDS
        ):
            item.add_marker(skip)

SF_DIR = os.environ.get("PYBABE_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from pybabe_spark.session import get_spark

    # r14 A/B note: AQE off (200.9 vs 200.5 s) and local[8] vs
    # local[32] (188 vs 200 s) were both measured on a 118-test subset
    # — session config does not move the suite's wall clock; the
    # per-action local scheduler floor does. The budget lever is the
    # deep-test gate below, not tuning.
    s = get_spark("pybabe_spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
