"""Watermarked streaming per-op window counts (streaming/stream.py)."""

from pyspark.sql import functions as F

from redo_log_parser_spark.streaming.stream import (
    parse_stream, stream_documents, streaming_op_counts)


def test_windowed_op_counts(spark, mini_docs, tmp_path):
    src = str(tmp_path / "src")
    mini_docs.write.mode("overwrite").parquet(src)
    events = parse_stream(stream_documents(spark, src))
    agg = streaming_op_counts(events, watermark="5 minutes", window="1 minute")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("op_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from op_counts").collect()
    total = {}
    for r in rows:
        total[r["op"]] = total.get(r["op"], 0) + r["count"]
    assert total == {"insert": 161, "update": 220, "delete": 52}
    # the mini-log spans ~62 seconds -> at least two 1-minute windows
    assert len({str(r["w"]) for r in rows}) >= 2


def test_streaming_exact_dedup(spark, mini_docs, tmp_path):
    """Duplicated content within the watermark horizon is emitted once;
    the survivor set matches the batch exact_dedup fingerprint set."""
    import pandas as pd
    from pyspark.sql import functions as F
    from redo_log_parser_spark.streaming.stream import (
        stream_documents, streaming_exact_dedup)
    from redo_log_parser_spark.functions.text import doc_fingerprint

    pdf = mini_docs.toPandas()
    dup = pdf.head(40).copy()
    dup["url"] = dup["url"] + "#recrawl"   # same text, different url
    src = str(tmp_path / "dsrc")
    spark.createDataFrame(pd.concat([pdf, dup])).write.mode("overwrite").parquet(src)

    out = streaming_exact_dedup(stream_documents(spark, src))
    sink = str(tmp_path / "dsink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(sink)
    n_fp_batch = (
        mini_docs.select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct().count()
    )
    assert got.count() == n_fp_batch            # one survivor per fingerprint
    assert got.select("fingerprint").distinct().count() == n_fp_batch
