"""Bucketed (co-located) joins: pre-shuffle both tables once at write time
so every later equi-join on the bucket key is exchange-free.

At 100 TB the biggest repeated cost is re-shuffling the same fact tables
for every join on the same key. Spark's bucketing (`.bucketBy(n, key)`)
persists the hash-partitioning in the table metadata: a join of two tables
bucketed by the same key into the same bucket count plans as a
SortMergeJoin with NO Exchange on either side — the shuffle was paid once,
at write. This is the parquet/warehouse analog of Iceberg's
`bucket(n, key)` partition transform (BASELINE.json north_star table).

Local note: bucketing requires `saveAsTable` (a warehouse catalog entry),
not a bare `.parquet(path)` write — spark-warehouse/ is gitignored.
tests/test_plan_quality.py pins the exchange-free plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """One-time bucketed materialization: pays the shuffle at write so
    joins on `key` never pay it again. sortBy makes the sort-merge join's
    per-bucket sort a no-op read."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an orphaned location (table dir without a catalog entry, e.g. from a
    # previous session) blocks managed-table creation — clear it
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key_eq: tuple[str, str]
) -> DataFrame:
    """Join two same-bucketed tables: with matching bucket specs Catalyst
    proves both sides already satisfy the join's required distribution and
    plans zero exchanges."""
    lk, rk = key_eq
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[lk] == right[rk])
