"""S1 — documents-table source (BASELINE.json input_hint shape:
url string, warc_ts timestamp, html binary, text string, lang string).

Reads parquet paths or catalog tables (Iceberg in cluster deployments —
the API is identical: spark.read.table). Column pruning is left to
Catalyst: downstream never references `html`, so the scan's ReadSchema
excludes the heavy binary column (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_COLUMNS = ("url", "warc_ts", "html", "text", "lang")

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """`source` is a parquet path (contains '/' or endswith .parquet) or
    a catalog table name (Iceberg at scale).

    Nanosecond-timestamp parquet (pyarrow's default when writing pandas
    frames) is illegal for Spark's reader ([PARQUET_TYPE_ILLEGAL]
    INT64 TIMESTAMP(NANOS)). Rather than making every producer remember
    `coerce_timestamps='us'`, fall back to the legacy nanos-as-long
    read and rebuild `warc_ts` via integer division to micros
    (`div 1000`, not float division — int64 epoch-nanos overflow a
    double's 53-bit mantissa). The legacy conf stays set for the
    session: it only affects NANOS columns, which are otherwise
    unreadable anyway."""
    if "/" in source or source.endswith(".parquet"):
        try:
            df = spark.read.parquet(source)
            df.schema  # force footer/schema resolution now
            return df
        except Exception as e:  # narrow retry: only the NANOS illegality
            msg = str(e)
            if "PARQUET_TYPE_ILLEGAL" not in msg or "NANOS" not in msg:
                raise
        spark.conf.set(_NANOS_CONF, "true")
        df = spark.read.parquet(source)
        if dict(df.dtypes).get("warc_ts") == "bigint":
            df = df.withColumn(
                "warc_ts", F.expr("timestamp_micros(warc_ts div 1000)")
            )
        return df
    return spark.read.table(source)
