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
    """--strict: only increasing, PK-named, unique columns qualify.

    Row ids are Oracle-style (non-numeric), so Column.scala:104-106
    forces the STRING comparison branch: USERS.ID (0..40) and ORDERS.ID
    hit the '10' < '9' cliff and are NOT string-increasing, while
    INVOICES.ID (fixed-width 1000..1049) IS — exactly what the reference
    computes on such a log. NAME/STATUS never qualify."""
    events = uniquify_row_ids(parse_documents(mini_docs))
    cols_df, ind_df = discover_schema(events, strict=True)
    schema = summarize_schema(cols_df, ind_df)
    pks = schema.pk_candidates()
    assert ('"SYSTEM"."INVOICES"', "ID") in pks
    assert ('"SYSTEM"."USERS"', "ID") not in pks  # '10' < '9' string cliff
    assert ('"SYSTEM"."ORDERS"', "ID") not in pks
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


def test_pretty_xes_document_golden_bytes(spark, tmp_path):
    """pretty=True must reproduce the scala.xml PrettyPrinter(200,2) +
    XML.save layout byte-for-byte (VERIFIED against real reference runs
    in round 3 — tests/fixtures/README.md): single-quoted xml decl,
    2-space steps, EVERY event broken to four lines (PrettyPrinter never
    inlines elements whose children are elements, whatever the width),
    &quot;-escaped attribute text. A leaf whose self-closing
    serialization reaches the 200-col width is NOT inlined: the raw
    open tag gets its own line and </string> lands at column 0
    (threshold regimes probed against the binary — see
    trace_xml_pretty)."""
    from redo_log_parser_spark.functions.xes import trace_xml_pretty

    long_name = "Update X value of \"S\".\"T\" entity to " + "y" * 160
    collapsy = "Update X value of \"S\".\"T\" entity to two  spaces"
    rows = [
        (
            "c1",
            [
                ('Add "S"."T" entity', "2020-07-21T16:29:41.000+00:00"),
                (long_name, "2020-07-21T16:29:42.000+00:00"),
                (collapsy, "2020-07-21T16:29:43.000+00:00"),
            ],
        )
    ]
    traces = spark.createDataFrame(
        rows,
        "case_id string, events array<struct<event_name string, xes_ts string>>",
    )
    path = str(tmp_path / "pretty.xes")
    n = write_xes_document(
        trace_xml_pretty(traces), path, '"S"."T"', pretty=True
    )
    assert n == 1
    esc_long = long_name.replace('"', "&quot;")  # raw: 216 chars -> regime 3
    esc_collapsed = collapsy.replace('"', "&quot;").replace("  ", " ")
    want = (
        "<?xml version='1.0' encoding='UTF-8'?>\n"
        '<log xes.version="2.0" xmlns="http://www.xes-standard.org/">\n'
        '  <extension name="Time" prefix="time" uri="http://www.xes-standard.org/time.xesext"/>\n'
        '  <extension name="Concept" prefix="concept" uri="http://www.xes-standard.org/concept.xesext"/>\n'
        '  <string key="concept:name" value="&quot;S&quot;.&quot;T&quot;_XES_Log"/>\n'
        "  <trace>\n"
        "    <event>\n"
        '      <string key="concept:name" value="Add &quot;S&quot;.&quot;T&quot; entity"/>\n'
        '      <date key="time:timestamp" value="2020-07-21T16:29:41.000+00:00"/>\n'
        "    </event>\n"
        "    <event>\n"
        f'      <string key="concept:name" value="{esc_long}">\n'
        "</string>\n"
        '      <date key="time:timestamp" value="2020-07-21T16:29:42.000+00:00"/>\n'
        "    </event>\n"
        "    <event>\n"
        f'      <string key="concept:name" value="{esc_collapsed}"/>\n'
        '      <date key="time:timestamp" value="2020-07-21T16:29:43.000+00:00"/>\n'
        "    </event>\n"
        "  </trace>\n"
        "</log>"
    )
    got = open(path, encoding="utf-8").read()
    assert got == want
    # and it is still well-formed XML with the right structure
    root = ET.parse(path).getroot()
    ns = "{http://www.xes-standard.org/}"
    assert len(root.findall(f"{ns}trace")[0].findall(f"{ns}event")) == 3


@pytest.mark.parametrize("root,fixture,n_traces", [
    ('"SYSTEM"."ORDERS"', "reference_redo_log_ORDERS_result.xes", 64),
    ('"SYSTEM"."USERS"', "reference_redo_log_USERS_result.xes", 49),
])
def test_xes_bytes_match_real_reference_output(spark, tmp_path, root,
                                               fixture, n_traces):
    """Byte-level golden against the ACTUAL reference implementation's
    .xes (tests/fixtures/README.md documents the capture): running the
    Spark pipeline on the reference's own artifacts/redo_log.txt must
    reproduce the reference file exactly for each root.

    Round 4 closed the last divergence: reference_trace_order replays
    the reference's seeded random row-id suffixes AND its Scala 2.12
    immutable-HashMap groupBy iteration (functions/scala_order.py), so
    the WHOLE FILE is now byte-equal with a plain comparison — no
    trace-block multiset canonicalization. The default case_id-sorted
    mode keeps the multiset property (also asserted)."""
    import os
    import re

    from redo_log_parser_spark.sinks.xes import reference_trace_order
    from redo_log_parser_spark.sources.logfile import read_log_files

    docs = read_log_files(spark, "/root/reference/artifacts/redo_log.txt")
    events = uniquify_row_ids(parse_documents(docs)).cache()
    cols_df, ind_df = discover_schema(events)
    schema = summarize_schema(cols_df, ind_df)
    traces = build_traces_df(events, schema, root)
    ref = open(
        os.path.join(os.path.dirname(__file__), "fixtures", fixture)
    ).read()
    from redo_log_parser_spark.functions.xes import trace_xml_pretty
    pretty = trace_xml_pretty(traces).cache()

    # byte-faithful mode: plain whole-file equality
    path = str(tmp_path / "got_ref_order.xes")
    order = reference_trace_order(events, root)
    write_xes_document(pretty, path, root, pretty=True, case_order=order)
    assert open(path).read() == ref

    # default mode: trace blocks as a multiset, header/footer byte-equal
    path = str(tmp_path / "got.xes")
    write_xes_document(pretty, path, root, pretty=True)
    got = open(path).read()
    blocks = lambda s: re.findall(r"[ ]*<trace>.*?</trace>", s, re.S)  # noqa: E731
    tg, tr = blocks(got), blocks(ref)
    assert got[:got.index("<trace>") - 2] == ref[:ref.index("<trace>") - 2]
    assert got[got.rindex("</trace>"):] == ref[ref.rindex("</trace>"):]
    assert len(tg) == len(tr) == n_traces
    assert sorted(tg) == sorted(tr)
