"""Custom stateful streaming operator: continuous ROWID incarnation
tracking via applyInPandasWithState.

The batch engine computes incarnations with a window over the full log
(operators/rowid.py). In continuous ingestion the same semantics need
per-key state that survives micro-batches: for each original row id we
keep (incarnation_index, last_op) and apply the reference restart rule
(EventExtractor.scala:44-87 — insert, or any statement after a delete,
opens a new incarnation) to each new micro-batch in event order.

State is one tiny tuple per live ROWID — GroupState with event-time
timeout would bound it in production; kept explicit and simple here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, StringType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("orig_row_id", StringType()),
        StructField("row_id", StringType()),
        StructField("op", StringType()),
        StructField("ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("incarnation", IntegerType()),
        StructField("last_op", StringType()),
        StructField("seen", IntegerType()),
    ]
)


def _update_incarnations(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (orig_row_id,) = key
    if state.exists:
        inc, last_op, seen = state.get
    else:
        inc, last_op, seen = 0, None, 0
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "url"])
        for r in pdf.itertuples(index=False):
            if seen > 0 and (r.op == "insert" or last_op == "delete"):
                inc += 1
            last_op = r.op
            seen += 1
            new_id = orig_row_id if inc == 0 else f"{orig_row_id}#{inc}"
            out_rows.append((r.url, orig_row_id, new_id, r.op, r.ts))
    state.update((inc, last_op, seen))
    yield pd.DataFrame(out_rows, columns=["url", "orig_row_id", "row_id", "op", "ts"])


def streaming_incarnations(events: DataFrame) -> DataFrame:
    """events: streaming frame with (url, row_id, op, ts). Returns the
    incarnation-rewritten stream. Within one micro-batch, per-key rows
    are processed in (ts, url) order; cross-batch ordering is the
    stream's arrival order, as in any at-least-once log tailer."""
    keyed = events.select("url", "row_id", "op", "ts").groupBy("row_id")
    return keyed.applyInPandasWithState(
        _update_incarnations,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
