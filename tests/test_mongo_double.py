"""pull_mongo / push_mongo executed against the in-memory contract
double (VERDICT r4 #8): the connector wiring — $match pushdown,
partitioned read, _id mapping, drop_collection overwrite — runs for
real instead of stopping at the jar-missing clear-error path."""

from __future__ import annotations

import pytest

from pybabe_spark.sources.connectors import pull_mongo, push_mongo
from pybabe_spark.testing import mongo_double
from pybabe_spark.testing.mongo_double import STORE, MongoDouble


@pytest.fixture
def mongo(spark):
    spark.dataSource.register(MongoDouble)
    STORE.clear()
    yield STORE
    STORE.clear()
    # restore "connector unavailable" behavior for any later test that
    # asserts the clear-error path: shadow the format with a source that
    # fails at plan time (pull_mongo wraps it into its RuntimeError)
    from pyspark.sql.datasource import DataSource

    class _Disabled(DataSource):
        @classmethod
        def name(cls):
            return "mongodb"

        def schema(self):
            raise RuntimeError("mongo double deregistered")

    spark.dataSource.register(_Disabled)


def test_pull_mongo_match_pushdown(spark, mongo):
    mongo[("shop", "users")] = [
        {"_id": 1, "name": "ann", "age": 34},
        {"_id": 2, "name": "bob", "age": 19},
        {"_id": 3, "name": "cat", "age": 27},
    ]
    df = pull_mongo(
        spark, "mongodb://fake", "shop", "users", spec={"age": {"$gte": 25}}
    )
    got = sorted((r["_id"], r["name"], r["age"]) for r in df.collect())
    assert got == [(1, "ann", 34), (3, "cat", 27)]
    # equality + $in forms of the reference's find() filter
    assert pull_mongo(
        spark, "mongodb://fake", "shop", "users", spec={"name": "bob"}
    ).count() == 1
    assert pull_mongo(
        spark, "mongodb://fake", "shop", "users", spec={"_id": {"$in": [1, 2]}}
    ).count() == 2


def test_pull_mongo_partitioned_read(spark, mongo):
    mongo[("shop", "events")] = [{"_id": i, "v": i * 10} for i in range(20)]
    df = pull_mongo(spark, "mongodb://fake", "shop", "events")
    assert df.count() == 20
    assert {r["v"] for r in df.collect()} == {i * 10 for i in range(20)}


def test_push_mongo_roundtrip_id_mapping_and_overwrite(spark, mongo):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id bigint, name string"
    )
    # id_col renames to _id (reference pybabe/mongo.py:26-29)
    push_mongo(df, "mongodb://fake", "shop", "out", id_col="user_id")
    assert sorted(
        (r["_id"], r["name"]) for r in STORE[("shop", "out")]
    ) == [(1, "a"), (2, "b")]

    # append mode extends
    push_mongo(
        spark.createDataFrame([(3, "c")], "user_id bigint, name string"),
        "mongodb://fake", "shop", "out", id_col="user_id",
    )
    assert len(STORE[("shop", "out")]) == 3

    # drop_collection=True overwrites (reference drops then reinserts)
    push_mongo(
        spark.createDataFrame([(9, "z")], "user_id bigint, name string"),
        "mongodb://fake", "shop", "out",
        drop_collection=True, id_col="user_id",
    )
    assert [(r["_id"], r["name"]) for r in STORE[("shop", "out")]] == [(9, "z")]

    # and a pull over what push wrote: the full roundtrip
    back = pull_mongo(spark, "mongodb://fake", "shop", "out")
    assert [(r["_id"], r["name"]) for r in back.collect()] == [(9, "z")]


def test_disabled_double_restores_clear_error(spark, mongo):
    """After the fixture teardown of ANOTHER test, pull_mongo must fail
    actionably again; simulate inline by registering the sabotage class
    now."""
    from pyspark.sql.datasource import DataSource

    class _Disabled(DataSource):
        @classmethod
        def name(cls):
            return "mongodb"

        def schema(self):
            raise RuntimeError("mongo double deregistered")

    spark.dataSource.register(_Disabled)
    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        pull_mongo(spark, "mongodb://fake", "shop", "nope", spec={"a": 1})
    # re-register the live double so this test's own teardown is a no-op
    spark.dataSource.register(MongoDouble)
    assert dict(mongo_double.STORE) == {}
