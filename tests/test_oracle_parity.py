"""Run every registered query against its DuckDB oracle — the local
mirror of the driver's CORRECTNESS gate (SURVEY §5 golden-output style,
with DuckDB as the oracle instead of inline strings)."""

import pytest

from pybabe_spark.queries import REGISTRY, all_queries
from tests.compare import assert_frames_match

all_queries()  # load extension query modules into REGISTRY
ORACLE_CASES = [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_parity(spark, duck, sf_dir, name, fn, sql):
    sdf = fn(spark, sf_dir)
    rel = duck.sql(sql)
    assert_frames_match(sdf, rel, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names
