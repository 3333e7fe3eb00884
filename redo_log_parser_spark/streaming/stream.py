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


def streaming_lsh_near_dedup(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    bands: int = 8,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Streaming MinHash-LSH NEAR-dup dedup: returns the surviving
    band-key stream (id, ts, band, bucket, n_bands); bind it to a sink
    with foreachBatch + `lsh_survivors` for the per-doc keep/drop set.

    Semantics — the standard LSH candidate rule applied greedily in
    arrival order: a doc is a near-dup (dropped) iff ANY of its `bands`
    band keys was emitted by an earlier doc inside the watermark
    horizon. There is no exact-Jaccard verify stage (the earlier doc's
    shingles are gone — keeping them would be unbounded state), so this
    is deliberately more aggressive than the batch
    minhash_pairs-with-verify path; tune `bands`/`num_hashes` for the
    false-positive rate the stream can tolerate. Signature and banding
    are byte-identical to the batch operators (dedup.with_minhash_sig /
    dedup.banded_keys — parity-pinned), so a batch backfill and the
    stream agree on what collides.

    State = one row per seen band key, expired by the watermark —
    bounded, like streaming_exact_dedup. Docs with fewer than n tokens
    have no signature to judge; they carry one sentinel key (band -1,
    bucket = xxhash64 of (id, event time) — unique per ARRIVAL, so they
    flow through and are always kept; keying the sentinel by id alone
    would silently exact-dedup tiny docs by url).

    A dropped doc's non-colliding bands do enter state (they survived
    the key-level dedup), so a later doc colliding only with THOSE is
    also dropped — near-dup chains collapse transitively onto the first
    arrival, exactly like the batch connected-components pass.

    CAVEAT (within one micro-batch): dropDuplicatesWithinWatermark keeps
    an arbitrary row per key, so two colliding docs arriving in the SAME
    micro-batch can split a band-key group between them and BOTH fail
    the all-bands-kept test — the group loses every member instead of
    keeping one. Across micro-batches the earlier arrival wins
    deterministically via state. Ingestion of a crawl is time-sliced
    (file/Kafka batches), which bounds the window of this loss to one
    trigger; put streaming_exact_dedup (deterministic, keyed by full
    fingerprint) upstream so byte-identical re-crawls never reach this
    stage."""
    from ..operators.dedup import banded_keys, validate_bands, with_minhash_sig

    validate_bands(num_hashes, bands)
    sigd = with_minhash_sig(docs, num_hashes=num_hashes, n=n, text_col=text_col)
    # one scan, one signature evaluation: the sentinel key for
    # sub-n-token docs rides the same explode (a filtered+union second
    # branch would re-evaluate the whole sig tree — PLANS §10)
    keyed = banded_keys(
        sigd, bands, sig_col="sig", keep_cols=(id_col, ts_col),
        sentinel_for=(id_col, ts_col),
    ).withColumn(
        "n_bands", F.when(F.col("band") == -1, 1).otherwise(bands)
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["band", "bucket"])
    )


def lsh_survivors(
    band_batch: DataFrame, id_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Per-micro-batch decision for streaming_lsh_near_dedup (use inside
    foreachBatch): a doc is kept iff ALL of its band keys survived the
    key-level dedup — any missing band means that band collided with an
    earlier doc's. A doc's band rows always share one micro-batch (they
    explode from one input row). Doc identity is (id, event time): two
    versions of the same url inside one trigger are judged
    independently instead of merging their band counts (which would
    wrongly drop both); same-id same-ts arrivals remain one group —
    the one genuinely indistinguishable case."""
    return (
        band_batch.groupBy(id_col, ts_col, "n_bands")
        .agg(F.count("*").alias("n_kept"))
        .filter(F.col("n_kept") == F.col("n_bands"))
        .select(id_col, ts_col)
    )
