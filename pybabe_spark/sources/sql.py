"""JDBC source/sink: the Spark-native replacement for PyBabe's SQL-CLI
shelling (pybabe/sql.py:15-55 pull via DB shell; 253-342 push via
LOAD DATA/fifo bulk loaders).

Everything is the built-in JDBC data source — partitioned parallel reads
replace the single CLI pipe, and the writer's batched inserts replace
fifo bulk loads. No JDBC driver jars ship in this environment, so these
are exercised against an in-memory fallback in tests and documented for
cluster use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def pull_sql(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Run a query / read a table over JDBC (pybabe/sql.py:15-55).

    ``partition_column`` + bounds split the read into ``num_partitions``
    parallel range scans — the scale path the reference's single
    ``mysql -e`` pipe never had.
    """
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table / query")
    from pybabe_spark.sources.config import resolve_sql_credentials

    # missing credentials fall back to pybabe.cfg/~/.pybabe.cfg
    # ([<subprotocol>] then [sql]) — reference pybabe/base.py:142-158
    user, password = resolve_sql_credentials(url, user, password)
    reader = spark.read.format("jdbc").option("url", url)
    if table:
        reader = reader.option("dbtable", table)
    elif partition_column:
        # Spark's JDBC source forbids query= together with
        # partitionColumn; wrap the query as a derived table so the
        # partitioned parallel read the docstring promises actually runs
        reader = reader.option("dbtable", f"({query}) __pybabe_q")
    else:
        reader = reader.option("query", query)
    if user:
        reader = reader.option("user", user)
    if password:
        reader = reader.option("password", password)
    if partition_column:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def push_sql(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    drop_table: bool = False,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """Write a table over JDBC (pybabe/sql.py:253-342).

    ``drop_table`` maps the reference's DROP/CREATE to mode('overwrite');
    the reference's partition-delete (DELETE WHERE partition=v, then
    load) is the JDBC writer's truncate/overwrite per partitioned table —
    for real warehouses prefer a lakehouse sink with replaceWhere.
    """
    if drop_table:
        mode = "overwrite"
    from pybabe_spark.sources.config import resolve_sql_credentials

    user, password = resolve_sql_credentials(url, user, password)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if user:
        writer = writer.option("user", user)
    if password:
        writer = writer.option("password", password)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
