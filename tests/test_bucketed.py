"""Bucketed-table layout: the join on the bucket key must plan with
ZERO Exchange operators — the pre-shuffled co-located join that makes
recurring 100 TB joins affordable."""

from pybabe_spark.sources.io import read_table_catalog, write_bucketed


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "t_bucket_a", ["k"], 8, sort_cols=["k"])
    write_bucketed(b, "t_bucket_b", ["k"], 8, sort_cols=["k"])
    try:
        ta = read_table_catalog(spark, "t_bucket_a")
        tb = read_table_catalog(spark, "t_bucket_b")
        # merge hint: tiny test tables would broadcast (also fine, but
        # the claim under test is the shuffle-free SORT-MERGE join the
        # bucket layout provides at fact-table sizes)
        joined = ta.hint("merge").join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 1000
        # aggregation on the bucket key also skips the exchange
        agg = ta.groupBy("k").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in aplan, aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_unbucketed_join_does_exchange(spark):
    # control: the same join without bucketing plans exchanges, so the
    # assertion above is meaningful
    a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
    import pyspark.sql.functions as F

    plan = (
        a.hint("merge").join(b, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" in plan
