"""Documented divergence boundary: IND latching semantics.

The reference computes inclusion dependencies eagerly after every entry
and only ADDS a pair when one of its columns was created in that very
step (SchemaDeriver.scala:69-93). An inclusion that becomes true LATER,
when both columns already exist, is never added. This engine (and the
reference oracle in oracle.py) uses FINAL-STATE inclusion (SURVEY.md
§1.3.4, §7.2): on both shipped reference artifacts the two definitions
agree (tests/test_reference_golden.py proves it on redo_log.txt), but
they can diverge on adversarial inputs — this test PINS our defined
behavior on exactly such an input, so the choice is explicit, not
accidental."""

import pandas as pd
from datetime import datetime, timedelta

from redo_log_parser_spark.functions.parse import parse_documents
from redo_log_parser_spark.operators.rowid import uniquify_row_ids
from redo_log_parser_spark.operators.schema_discovery import (
    discover_schema, summarize_schema)


def _docs(spark, stmts):
    t0 = datetime(2020, 1, 1)
    rows = []
    for i, (stmt, rid) in enumerate(stmts):
        ts = t0 + timedelta(seconds=i)
        tss = ts.strftime("%d-%b-%Y %H:%M:%S").upper()
        rows.append({
            "url": f"https://x/{i:06d}", "warc_ts": ts,
            "text": f"{stmt}\n{rid} {tss}", "lang": "en",
        })
    return spark.createDataFrame(pd.DataFrame(rows))


def test_late_inclusion_is_reported_final_state(spark):
    """T1.A = {x}; T2.B grows to {y, x} only AFTER both columns exist.
    Reference (eager latch): A ⊄ B forever. This engine: final-state
    A ⊆ B — the documented, deliberate semantics."""
    stmts = [
        ('insert into "S"."T1"("A") values (\'x\');', "R1"),
        ('insert into "S"."T2"("B") values (\'y\');', "S1"),
        ('insert into "S"."T2"("B") values (\'x\');', "S2"),  # late inclusion
    ]
    events = uniquify_row_ids(parse_documents(_docs(spark, stmts)))
    _, ind_df = discover_schema(events)
    got = {
        (r["table_id"], r["col"], r["ref_table"], r["ref_col"])
        for r in ind_df.collect()
    }
    assert ('"S"."T1"', "A", '"S"."T2"', "B") in got  # final-state semantics


def test_broken_inclusion_is_dropped_like_reference(spark):
    """An inclusion that held early but breaks later is reported by
    NEITHER definition: the reference drops pairs that stop holding
    (similarColumns filter), and final-state never saw them hold."""
    stmts = [
        ('insert into "S"."T1"("A") values (\'x\');', "R1"),
        ('insert into "S"."T2"("B") values (\'x\');', "S1"),  # A ⊆ B here
        ('insert into "S"."T1"("A") values (\'z\');', "R2"),  # breaks it
    ]
    events = uniquify_row_ids(parse_documents(_docs(spark, stmts)))
    _, ind_df = discover_schema(events)
    got = {
        (r["table_id"], r["col"], r["ref_table"], r["ref_col"])
        for r in ind_df.collect()
    }
    assert ('"S"."T1"', "A", '"S"."T2"', "B") not in got
    # the reverse still holds in both definitions: B={x} ⊆ A={x,z}
    assert ('"S"."T2"', "B", '"S"."T1"', "A") in got
