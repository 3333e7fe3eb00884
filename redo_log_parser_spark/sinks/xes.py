"""XES sink (S3 — TraceIDParser.serializeLogToDisk, :153-160).

Two modes:
  * write_traces: per-trace XML strings to a parquet/text sink —
    the scale path (10^9 traces never become one XML document).
  * write_xes_document: assemble ONE complete .xes file (header +
    traces + footer) like the reference CLI does — for tooling
    compatibility on small outputs. Trace order is made deterministic
    by sorting on case_id; content per trace already has log order.

The reference pretty-prints with a 200-column PrettyPrinter; canonical
single-line elements are written here (whitespace-insensitive XML
equality, asserted canonically in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.xes import xes_log_header


def write_traces(traces_xml: DataFrame, out_dir: str, fmt: str = "parquet") -> None:
    (traces_xml.select("case_id", "trace_xml").write.mode("overwrite").format(fmt).save(out_dir))


def write_xes_document(traces_xml: DataFrame, path: str, root_table: str) -> int:
    """Write one complete XES 2.0 XML document. Returns trace count.

    Deliberately a driver-side assembly (toLocalIterator — streams
    partitions, never materializes all traces at once); intended for
    reference-CLI-sized outputs, not the 10^12-row path."""
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        fh.write(xes_log_header(root_table))
        ordered = traces_xml.select("case_id", "trace_xml").orderBy("case_id")
        for row in ordered.toLocalIterator():
            fh.write(row["trace_xml"])
            n += 1
        fh.write("</log>")
    return n
