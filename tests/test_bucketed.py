"""Bucketed-layout extras on top of test_scale_ops.py's co-located
join test: aggregation on the bucket key also skips the exchange, and
the unbucketed control proves the assertion bites."""

from pybabe_spark.sources.io import read_table_catalog, write_bucketed


def test_bucketed_agg_has_no_exchange(spark, tmp_path):
    df = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    spark.sql("DROP TABLE IF EXISTS t_bucket_agg")
    write_bucketed(
        df, "t_bucket_agg", ["k"], 8, sort_cols=["k"],
        path=str(tmp_path / "t"),
    )
    try:
        ta = read_table_catalog(spark, "t_bucket_agg")
        aplan = (
            ta.groupBy("k").count()
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange hashpartitioning" not in aplan, aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_agg")


def test_unbucketed_join_does_exchange(spark):
    # control: the same join without bucketing plans a shuffle, so the
    # bucketed no-exchange assertions are meaningful
    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    plan = (
        a.hint("merge").join(b, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" in plan
