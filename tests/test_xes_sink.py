"""XES document sink + strict mode end-to-end + stateful streaming
incarnations."""

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from redo_log_parser_spark.config import PipelineConfig
from redo_log_parser_spark.functions.parse import parse_documents
from redo_log_parser_spark.functions.xes import with_xes_columns
from redo_log_parser_spark.operators.rowid import uniquify_row_ids
from redo_log_parser_spark.operators.schema_discovery import (
    discover_schema, summarize_schema)
from redo_log_parser_spark.pipeline import build_traces_df
from redo_log_parser_spark.sinks.xes import write_xes_document


def test_xes_document_is_valid_xml(spark, mini_docs, tmp_path):
    events = uniquify_row_ids(parse_documents(mini_docs)).cache()
    cols_df, ind_df = discover_schema(events)
    schema = summarize_schema(cols_df, ind_df)
    traces = build_traces_df(events, schema, '"SYSTEM"."ORDERS"')
    path = str(tmp_path / "out.xes")
    n = write_xes_document(traces, path, "ORDERS")
    assert n == 70
    root = ET.parse(path).getroot()
    assert root.tag.endswith("log")
    ns = "{http://www.xes-standard.org/}"
    assert len(root.findall(f"{ns}trace")) == 70
    # every trace has events with concept:name + time:timestamp
    tr = root.findall(f"{ns}trace")[0]
    ev = tr.findall(f"{ns}event")[0]
    keys = {c.get("key") for c in ev}
    assert keys == {"concept:name", "time:timestamp"}


def test_strict_mode_pipeline(spark, mini_docs):
    """--strict: only increasing, PK-named, unique columns qualify; the
    mini-log's ID columns qualify, NAME/STATUS never do."""
    events = uniquify_row_ids(parse_documents(mini_docs))
    cols_df, ind_df = discover_schema(events, strict=True)
    schema = summarize_schema(cols_df, ind_df)
    pks = schema.pk_candidates()
    assert ('"SYSTEM"."USERS"', "ID") in pks
    assert not any(c == "NAME" or c == "STATUS" for _, c in pks)


def test_streaming_stateful_incarnations(spark, mini_docs, tmp_path):
    """applyInPandasWithState incarnations must equal the batch window
    over the full mini-log when streamed with availableNow."""
    from redo_log_parser_spark.streaming.stateful import streaming_incarnations
    from redo_log_parser_spark.streaming.stream import parse_stream, stream_documents

    src = str(tmp_path / "src")
    mini_docs.write.mode("overwrite").parquet(src)

    batch_events = uniquify_row_ids(parse_documents(mini_docs))
    want = {r["url"]: r["row_id"] for r in batch_events.select("url", "row_id").collect()}

    stream = parse_stream(stream_documents(spark, src))
    out = streaming_incarnations(stream.filter(F.col("parse_error").isNull()))
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["url"]: r["row_id"] for r in spark.read.parquet(sink).collect()}
    assert got == want
