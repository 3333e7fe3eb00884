"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):  flagship — full parse → uniquify → schema-discovery stack
               over redo statements synthesized from sf0.001 orders.
queries():     one per implemented operator from SURVEY.md §2 plus the
               training-data operators; implementations in
               redo_log_parser_spark/contract.py.
oracle_sql():  DuckDB-equivalent ANSI SQL per query (omitted for the
               hash-based ops that are not SQL-expressible — the driver
               records rows-only checks for those, see docstrings).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from redo_log_parser_spark.contract import QUERIES, q_schema_discovery  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_schema_discovery(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
