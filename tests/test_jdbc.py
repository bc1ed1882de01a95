"""Real JDBC round-trip against embedded Derby (ships in Spark's jars
for the Hive metastore, so it is always on the classpath): write, read
back, partitioned parallel read, append semantics, filter pushdown.

No network, no external DB — jdbc:derby:memory lives inside the local
JVM, which is exactly the multi-executor seam the reader/writer options
exercise (partitionColumn bounds generate one WHERE-range query per
partition, the same plan a 1000-executor cluster runs against a real
warehouse)."""

from __future__ import annotations

import pytest

from python_etl_spark.sinks.writers import write_jdbc
from python_etl_spark.sources.readers import read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark):
    url = "jdbc:derby:memory:etl_jdbc_test;create=true"
    df = spark.range(200).selectExpr(
        "id",
        "cast(id * 1.5 as double) as amount",
        "concat('cust_', cast(id % 7 as string)) as segment",
    )
    write_jdbc(df, url, "orders_rt", mode="overwrite", driver=DRIVER)
    return url


def test_jdbc_round_trip_values(spark, derby_url):
    back = read_jdbc(spark, derby_url, "orders_rt", driver=DRIVER)
    assert back.count() == 200
    assert dict(back.dtypes) == {
        "id": "bigint", "amount": "double", "segment": "string"
    }
    row = back.where("id = 42").collect()[0]
    assert row.amount == 63.0 and row.segment == "cust_0"


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    """partitionColumn bounds must fan out into numPartitions range
    queries — the parallel-extract path a real warehouse read uses."""
    part = read_jdbc(
        spark, derby_url, "orders_rt",
        partition_column="id", num_partitions=4,
        lower_bound=0, upper_bound=200, driver=DRIVER,
    )
    assert part.rdd.getNumPartitions() == 4
    # no rows lost or duplicated across the partition ranges
    assert part.count() == 200
    assert part.select("id").distinct().count() == 200


def test_jdbc_append_mode(spark, derby_url):
    extra = spark.range(200, 250).selectExpr(
        "id", "cast(0.0 as double) as amount", "'cust_x' as segment"
    )
    write_jdbc(extra, derby_url, "orders_rt", mode="append", driver=DRIVER)
    assert read_jdbc(spark, derby_url, "orders_rt", driver=DRIVER).count() == 250


def test_jdbc_filter_pushdown(spark, derby_url):
    """The filter must reach the JDBC source (PushedFilters on the
    scan), not run Spark-side over a full-table extract."""
    back = read_jdbc(spark, derby_url, "orders_rt", driver=DRIVER)
    q = back.where("id < 10").select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(ID,10)" in plan.replace(
        "id", "ID"
    ), plan
    assert q.count() == 10


def test_jdbc_gate_message_without_driver(spark):
    """A bogus URL with no matching driver must raise the descriptive
    gate error, not a bare py4j stack."""
    with pytest.raises(RuntimeError, match="JDBC read failed"):
        read_jdbc(spark, "jdbc:nosuchdb://nowhere/x", "t")
