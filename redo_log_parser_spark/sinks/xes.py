"""XES sink (S3 — TraceIDParser.serializeLogToDisk, :153-160).

Two modes:
  * write_traces: per-trace XML strings to a parquet/text sink —
    the scale path (10^9 traces never become one XML document).
  * write_xes_document: assemble ONE complete .xes file (header +
    traces + footer) like the reference CLI does — for tooling
    compatibility on small outputs. Trace order is made deterministic
    by sorting on case_id; content per trace already has log order.

The reference pretty-prints with scala.xml.PrettyPrinter(200, 2) and
re-saves with XML.save (TraceIDParser.scala:153-160). pretty=True
replicates that layout (2-space steps, events one-per-line under 200
cols, XML.save's single-quoted xml declaration) so small outputs diff
clean against a reference-produced .xes; the layout is pinned byte-wise
by a golden test. (The reference repo ships no .xes artifact, so the
pin is against the modeled PrettyPrinter semantics, documented in
functions/xes.py.) Default mode stays canonical single-line elements
(whitespace-insensitive XML equality, asserted canonically in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.xes import xes_log_header, xes_pretty_header


def write_traces(traces_xml: DataFrame, out_dir: str, fmt: str = "parquet") -> None:
    (traces_xml.select("case_id", "trace_xml").write.mode("overwrite").format(fmt).save(out_dir))


def write_xes_document(
    traces_xml: DataFrame, path: str, root_table: str, pretty: bool = False
) -> int:
    """Write one complete XES 2.0 XML document. Returns trace count.

    pretty=False: canonical single-line elements. pretty=True: the
    reference's PrettyPrinter(200,2) layout — pass a frame produced by
    functions.xes.trace_xml_pretty (its trace_xml blocks carry the
    indentation).

    Deliberately a driver-side assembly (toLocalIterator — streams
    partitions, never materializes all traces at once); intended for
    reference-CLI-sized outputs, not the 10^12-row path."""
    n = 0
    with open(path, "w", encoding="utf-8", newline="") as fh:
        if pretty:
            fh.write(xes_pretty_header(root_table) + "\n")
        else:
            fh.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            fh.write(xes_log_header(root_table))
        ordered = traces_xml.select("case_id", "trace_xml").orderBy("case_id")
        for row in ordered.toLocalIterator():
            fh.write(row["trace_xml"])
            if pretty:
                fh.write("\n")
            n += 1
        fh.write("</log>")
    return n
