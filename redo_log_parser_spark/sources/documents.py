"""S1 — documents-table source (BASELINE.json input_hint shape:
url string, warc_ts timestamp, html binary, text string, lang string).

Reads parquet paths or catalog tables (Iceberg in cluster deployments —
the API is identical: spark.read.table). Column pruning is left to
Catalyst: downstream never references `html`, so the scan's ReadSchema
excludes the heavy binary column (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """`source` is a parquet path (contains '/' or endswith .parquet) or
    a catalog table name (Iceberg at scale)."""
    if "/" in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.read.table(source)
