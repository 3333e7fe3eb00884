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


def parse_stream(
    docs: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    parser: str = "pandas",
) -> DataFrame:
    """Streaming parse. parser='pandas' (default, the byte-parity Arrow
    kernel as a pandas UDF) or 'sql' (the pure-expression JVM parser —
    projection-only, so it binds to a streaming frame unchanged; no
    Python workers in any micro-batch, and measured faster end-to-end
    at the batch pipeline level, PLANS §14). Output schema is identical
    (parity-pinned in tests/test_streaming_counts.py)."""
    keep = [c for c in ("url", "warc_ts", "lang") if c in docs.columns]
    if parser == "sql":
        from ..functions.parse_sql import parse_documents_sql

        return parse_documents_sql(docs, cfg, keep_cols=tuple(keep))
    parse = make_parse_udf(cfg)
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
    band-key stream (id, ts, band, bucket, keys) — `keys` is the
    manifest band-key array, non-null only on each doc's manifest row
    (band -1); bind it to a sink with foreachBatch + `lsh_survivors`
    for the per-doc keep/drop set.

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

    Within ONE micro-batch there is no arrival order, so the
    same-trigger semantics is the batch pipeline's: connected
    components over the within-batch key-sharing graph, one survivor
    per component (earliest (ts, id)), implemented in `lsh_survivors`.
    To make that decidable, EVERY doc emits a MANIFEST row alongside
    its real band keys (banded_keys manifest mode): band -1, bucket =
    xxhash64(id, ts) — unique per arrival, so it always survives the
    key-level dedup — carrying the doc's full band-key array. A doc
    whose every real key is swallowed by earlier-batch state thus stays
    visible downstream (the round-3 same-trigger group-loss fix: before
    this, two colliding docs in one trigger could split a band-key
    group and BOTH vanish). State grows by one sentinel row per doc
    (bands+1 rows/doc instead of bands), watermark-expired like the
    rest. Pathological corner: two arrivals with the same (id, ts) in
    different triggers inside the watermark collapse onto the first
    (the sentinel key is their identity) — same-identity re-crawls are
    exact-deduped by design."""
    from ..operators.dedup import banded_keys, validate_bands, with_minhash_sig

    validate_bands(num_hashes, bands)
    sigd = with_minhash_sig(docs, num_hashes=num_hashes, n=n, text_col=text_col)
    # one scan, one signature evaluation: real band keys and the per-doc
    # manifest row ride the same explode (a filtered+union second branch
    # would re-evaluate the whole sig tree — PLANS §10)
    keyed = banded_keys(
        sigd, bands, sig_col="sig", keep_cols=(id_col, ts_col),
        sentinel_for=(id_col, ts_col), manifest_col="keys",
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["band", "bucket"])
    )


def lsh_survivors(
    band_batch: DataFrame, id_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """Per-micro-batch survivor election for streaming_lsh_near_dedup
    (use inside foreachBatch). Doc identity is (id, event time); each
    doc's manifest row (band -1) carries its full band-key array, and a
    real key row's presence in the batch means that key was NEW to
    cross-batch state (key-level dedup let exactly one owner through).

    Rules, matching the batch candidates→components→representative
    pipeline (there is no arrival order inside one trigger):

      1. A doc any of whose keys is ABSENT from the batch's surviving
         key set collided with an earlier batch — its whole within-batch
         component is dropped (the family's survivor already exists in
         an earlier trigger; chains collapse transitively, like the
         cross-batch state rule).
      2. Otherwise one survivor per within-batch component: the
         smallest (ts, id) — deterministic, no
         dropDuplicatesWithinWatermark row arbitrariness involved.
      3. Docs sharing no key (including empty-signature docs, whose
         manifest carries an empty array) are singleton components and
         survive.

    Components come from operators/dedup.dedup_components over the
    exploded manifests self-joined on (band, bucket) — micro-batch
    sized, with an isEmpty fast path so collision-free batches (the
    common case) cost two joins and no CC rounds."""
    from ..operators.dedup import dedup_components

    dk = F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"))
    docs = band_batch.filter(F.col("band") == -1).select(
        dk.alias("dk"), F.col("keys")
    )
    kept = band_batch.filter(F.col("band") != -1).select("band", "bucket")
    ex = docs.select("dk", F.explode("keys").alias("kb")).select(
        "dk", F.col("kb.band").alias("band"), F.col("kb.bucket").alias("bucket")
    )
    touched = (
        ex.join(kept, ["band", "bucket"], "left_anti").select("dk").distinct()
    )
    keyed = docs.select("dk")
    a, b = ex.alias("a"), ex.alias("b")
    # cached: isEmpty() and (on colliding batches) dedup_components'
    # edge materialization both consume it — without the cache every
    # colliding micro-batch pays the manifest explode + band self-join +
    # distinct twice. Safe to drop right after dedup_components returns:
    # its result frame reads from the checkpointed label frame, not from
    # the pair lineage.
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.dk") < F.col("b.dk"))
        .select(F.col("a.dk").alias("id_a"), F.col("b.dk").alias("id_b"))
        .distinct()
        .cache()
    )
    if pairs.isEmpty():
        pairs.unpersist()
        surv = keyed.join(touched, "dk", "left_anti")
    else:
        comp = dedup_components(keyed, pairs, id_col="dk")
        pairs.unpersist()
        bad = (
            comp.join(touched, "dk", "left_semi")
            .select("component_id")
            .distinct()
        )
        # component_id IS the min-(ts, id) member — the elected survivor
        surv = (
            comp.select(F.col("component_id").alias("dk"))
            .distinct()
            .join(bad.select(F.col("component_id").alias("dk")), "dk", "left_anti")
        )
    return surv.select(
        F.col("dk.id").alias(id_col), F.col("dk.ts").alias(ts_col)
    )
