"""Bucketed-table sink: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of the entity-edge / case-propagation joins
is the shuffle of the event stream. Writing events BUCKETED BY the join
key (row_id, or url for lineage work) moves that shuffle to write time,
once: two tables bucketed the same way join with ZERO Exchange — the
plan's SortMergeJoin reads co-located buckets directly (asserted in
tests/test_bucketed.py). This is Spark's native bucketing (Iceberg's
bucket partition transform is the same idea at the table-format level).

Bucket count guidance: ~(total data size / 128-256 MB) rounded to a
power of two, fixed for the table's lifetime — both join sides MUST
agree on (key, count) to co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "row_id",
    n_buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """saveAsTable with bucketBy (+ optional in-bucket sortBy, which
    additionally removes the join's Sort nodes)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
