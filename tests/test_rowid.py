"""T1 — incarnation numbering must match the oracle (reference
EventExtractor.scala rules with deterministic '#k' suffixes)."""

import pandas as pd
from datetime import datetime, timedelta

from redo_log_parser_spark import oracle
from redo_log_parser_spark.fixtures import mini_log_documents
from redo_log_parser_spark.functions.parse import parse_documents
from redo_log_parser_spark.operators.rowid import uniquify_row_ids


def _mk_docs(ops_rows):
    """Build a documents frame from (op, row_id) tuples with synthetic
    single-table statements."""
    rows = []
    t0 = datetime(2020, 1, 1, 10, 0, 0)
    for i, (op, rid) in enumerate(ops_rows):
        ts = t0 + timedelta(seconds=i)
        tss = ts.strftime("%d-%b-%Y %H:%M:%S").upper()
        if op == "insert":
            stmt = f'insert into "S"."T"("ID") values (\'{i}\');'
        elif op == "update":
            stmt = f'update "S"."T" set "V" = \'n{i}\' where "V" = \'o{i}\' and ROWID = \'{rid}\';'
        else:
            stmt = f'delete from "S"."T" where "ID" = \'{i}\' and ROWID = \'{rid}\';'
        rows.append(
            {
                "url": f"https://x/{i:06d}",
                "warc_ts": ts,
                "text": f"{stmt}\n{rid} {tss}",
                "lang": "en",
            }
        )
    return pd.DataFrame(rows)


SCENARIOS = [
    # insert, update, delete, then reuse via insert -> #1
    [("insert", "R1"), ("update", "R1"), ("delete", "R1"), ("insert", "R1"),
     ("update", "R1")],
    # update-after-delete also restarts (reference :73-84)
    [("insert", "R1"), ("delete", "R1"), ("update", "R1"), ("delete", "R1"),
     ("update", "R1")],
    # first sighting as update keeps the id; later insert restarts
    [("update", "R1"), ("insert", "R1"), ("insert", "R1")],
    # independent rows don't interact
    [("insert", "A"), ("insert", "B"), ("delete", "A"), ("update", "B"),
     ("insert", "A")],
]


def test_incarnations_match_oracle(spark):
    for scen in SCENARIOS:
        docs = _mk_docs(scen)
        parsed = parse_documents(spark.createDataFrame(docs))
        got = {
            r["url"]: r["row_id"]
            for r in uniquify_row_ids(parsed).select("url", "row_id").collect()
        }
        want_entries = oracle.uniquify_row_ids(
            oracle.parse_records(list(docs["text"]))
        )
        want = {docs["url"][i]: e.row_id for i, e in enumerate(want_entries)}
        assert got == want, scen


def test_mini_log_incarnations(spark, mini_docs, mini_docs_pdf):
    parsed = parse_documents(mini_docs)
    got = {
        r["url"]: r["row_id"]
        for r in uniquify_row_ids(parsed).select("url", "row_id").collect()
    }
    want_entries = oracle.uniquify_row_ids(
        oracle.parse_records(list(mini_docs_pdf["text"]))
    )
    want = {mini_docs_pdf["url"][i]: e.row_id for i, e in enumerate(want_entries)}
    assert got == want
    # the 10 reused ROWIDs must have produced #1 incarnations
    assert sum(1 for v in got.values() if v.endswith("#1")) > 0
