"""Structured Streaming parse → route → aggregate.

The reference is strictly batch (SURVEY.md §2.7), and so is the north
rule; this module exists because a log pipeline's natural deployment is
continuous ingestion. The SAME parse kernel and routing expressions run
unchanged under readStream — the logical plan is identical, only the
source/sink bindings differ.

Components:
  * stream_documents: file-source stream over a documents directory
    (swap for Kafka/Iceberg CDC at deployment; API-identical).
  * streaming_route: fan-out by op via partitioned parquet append +
    checkpointed exactly-once file sink.
  * streaming_op_counts: watermarked sliding counts per op — the
    streaming analog of the routed-count aggregate; late records beyond
    the watermark are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions.parse import make_parse_udf


def stream_documents(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    schema = schema or (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    return spark.readStream.schema(schema).parquet(path)


def parse_stream(docs: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    parse = make_parse_udf(cfg)
    keep = [c for c in ("url", "warc_ts", "lang") if c in docs.columns]
    return docs.select(*keep, parse(F.col("text")).alias("p")).select(*keep, "p.*")


def streaming_route(
    events: DataFrame, out_dir: str, checkpoint_dir: str, trigger_once: bool = True
):
    """Fan-out by op as a checkpointed streaming file sink (exactly-once
    via the sink's transaction log + the source's offset log)."""
    clean = events.filter(F.col("parse_error").isNull())
    writer = (
        clean.writeStream.format("parquet")
        .option("path", f"{out_dir}/events_by_op")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("op")
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_op_counts(
    events: DataFrame, watermark: str = "10 minutes", window: str = "1 hour"
) -> DataFrame:
    """Per-op counts over event-time windows with late-data handling —
    returns an unstarted aggregation plan for writeStream binding."""
    return (
        events.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "op")
        .count()
    )


def streaming_exact_dedup(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: first sighting of a content fingerprint
    wins; re-crawls of the same bytes inside the watermark horizon are
    dropped. dropDuplicatesWithinWatermark keys state by fingerprint and
    EXPIRES it once event time passes the watermark — bounded state, the
    only sound way to dedup an unbounded crawl (an unwatermarked
    dropDuplicates would grow state forever). Batch twin:
    operators/dedup.exact_dedup (same fingerprint function)."""
    from ..functions.text import doc_fingerprint

    with_fp = docs.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )
