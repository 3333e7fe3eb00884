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
