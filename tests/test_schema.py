"""A1-A8 — schema discovery must match the oracle's eager fold on the
mini-log and on adversarial prefix-duplicate scenarios."""

import pandas as pd
from datetime import datetime, timedelta

from redo_log_parser_spark import oracle
from redo_log_parser_spark.functions.parse import parse_documents
from redo_log_parser_spark.operators.rowid import uniquify_row_ids
from redo_log_parser_spark.operators.schema_discovery import (
    current_values,
    column_writes,
    discover_schema,
    summarize_schema,
)


def _spark_events(spark, pdf):
    return uniquify_row_ids(parse_documents(spark.createDataFrame(pdf)))


def _oracle_schema(pdf, strict=False):
    entries = oracle.uniquify_row_ids(oracle.parse_records(list(pdf["text"])))
    return entries, oracle.extract_schema(entries, strict)


def test_mini_log_schema_matches_oracle(spark, mini_docs, mini_docs_pdf):
    events = _spark_events(spark, mini_docs_pdf)
    cols_df, ind_df = discover_schema(events)
    summary = summarize_schema(cols_df, ind_df)

    _, want = _oracle_schema(mini_docs_pdf)
    want_cols = {
        (t, c.name): (c.can_be_pk, c.values_increasing, c.name_like_pk())
        for t, tbl in want.items()
        for c in tbl.values()
    }
    got_cols = {
        (r["table_id"], r["col"]): (
            r["can_be_pk"], r["values_increasing"], r["name_like_pk"])
        for r in summary.columns
    }
    assert got_cols == want_cols

    want_ind = {
        (t, c.name, rt, rc)
        for t, tbl in want.items()
        for c in tbl.values()
        for rt, rc in c.is_subset_of
    }
    got_ind = {
        (i["table_id"], i["col"], i["ref_table"], i["ref_col"])
        for i in summary.inds
    }
    assert got_ind == want_ind

    # expected ground truth (FIXTURES.md §1): ID is PK everywhere,
    # ORDERS.USER_ID -> USERS.ID, INVOICES.ORDER_ID -> ORDERS.ID
    pks = summary.pk_candidates()
    for t in ['"SYSTEM"."USERS"', '"SYSTEM"."ORDERS"', '"SYSTEM"."INVOICES"']:
        assert (t, "ID") in pks
    fk = set(summary.fk_pairs())
    assert ('"SYSTEM"."ORDERS"', "USER_ID", '"SYSTEM"."USERS"', "ID") in fk
    assert ('"SYSTEM"."INVOICES"', "ORDER_ID", '"SYSTEM"."ORDERS"', "ID") in fk


def test_mini_log_current_values_match_oracle(spark, mini_docs, mini_docs_pdf):
    events = _spark_events(spark, mini_docs_pdf)
    got = {
        (r["table_id"], r["col"], r["row_id"]): r["value"]
        for r in current_values(column_writes(events)).collect()
    }
    _, want_schema = _oracle_schema(mini_docs_pdf)
    want = {
        (t, c.name, rid): v
        for t, tbl in want_schema.items()
        for c in tbl.values()
        for rid, v in c.values.items()
    }
    assert got == want


def _docs_from_stmts(rows):
    """rows: (stmt_type, table, rid, cols, vals) simplified builder."""
    out = []
    t0 = datetime(2020, 1, 1)
    for i, (stmt,) in enumerate([(r,) for r in rows]):
        ts = t0 + timedelta(seconds=i)
        tss = ts.strftime("%d-%b-%Y %H:%M:%S").upper()
        out.append(
            {
                "url": f"https://x/{i:06d}",
                "warc_ts": ts,
                "text": f"{stmt[0]}\n{stmt[1]} {tss}",
                "lang": "en",
            }
        )
    return pd.DataFrame(out)


def test_sticky_transient_duplicate(spark):
    """A value duplicated at a prefix then fixed by an update must still
    disqualify the column (Column.scala:79-84 sticky semantics) even
    though final-state values are unique."""
    rows = [
        ('insert into "S"."T"("ID") values (\'1\');', "A"),
        ('insert into "S"."T"("ID") values (\'1\');', "B"),  # transient dup
        ('update "S"."T" set "ID" = \'2\' where "ID" = \'1\' and ROWID = \'B\';', "B"),
    ]
    pdf = _docs_from_stmts(rows)
    events = _spark_events(spark, pdf)
    cols_df, ind_df = discover_schema(events)
    got = {r["col"]: r["can_be_pk"] for r in cols_df.collect()}
    assert got["ID"] is False

    _, want = _oracle_schema(pdf)
    assert want['"S"."T"']["ID"].can_be_pk is False


def test_no_false_positive_from_sequential_reuse(spark):
    """Same value held by different rows at DIFFERENT times (no overlap)
    is NOT a duplicate — e.g. row A changes away from 'x' before row B
    takes 'x'."""
    rows = [
        ('insert into "S"."T"("ID") values (\'x\');', "A"),
        ('update "S"."T" set "ID" = \'y\' where "ID" = \'x\' and ROWID = \'A\';', "A"),
        ('insert into "S"."T"("ID") values (\'x\');', "B"),
        ('update "S"."T" set "ID" = \'z\' where "ID" = \'x\' and ROWID = \'B\';', "B"),
    ]
    pdf = _docs_from_stmts(rows)
    events = _spark_events(spark, pdf)
    cols_df, _ = discover_schema(events)
    got = {r["col"]: r["can_be_pk"] for r in cols_df.collect()}
    assert got["ID"] is True
    _, want = _oracle_schema(pdf)
    assert want['"S"."T"']["ID"].can_be_pk is True


def test_delete_created_empty_column_subset_of_everything(spark):
    """A delete on a never-seen column creates an empty column
    (SchemaExtractor.scala:130-137); empty ⊆ every other-table column."""
    rows = [
        ('insert into "S"."A"("ID") values (\'1\');', "A1"),
        ('insert into "S"."B"("ID") values (\'9\');', "B1"),
        ('delete from "S"."A" where "GHOST" = \'g\' and ROWID = \'A2\';', "A2"),
    ]
    pdf = _docs_from_stmts(rows)
    events = _spark_events(spark, pdf)
    cols_df, ind_df = discover_schema(events)
    got_ind = {
        (r["table_id"], r["col"], r["ref_table"], r["ref_col"])
        for r in ind_df.collect()
    }
    assert ('"S"."A"', "GHOST", '"S"."B"', "ID") in got_ind
    _, want = _oracle_schema(pdf)
    assert ('"S"."B"', "ID") in want['"S"."A"']["GHOST"].is_subset_of


def test_strict_pk_monotonicity_and_name(spark):
    """--strict: PK additionally needs ever-increasing values and a
    PK-ish name (Column.scala:137-151)."""
    rows = [
        ('insert into "S"."T"("KEY","NAME") values (\'1\',\'b\');', "A"),
        ('insert into "S"."T"("KEY","NAME") values (\'2\',\'a\');', "B"),
        ('insert into "S"."T"("KEY","NAME") values (\'3\',\'c\');', "C"),
    ]
    pdf = _docs_from_stmts(rows)
    events = _spark_events(spark, pdf)
    cols_df, ind_df = discover_schema(events, strict=True)
    got = {r["col"]: (r["is_pk"], r["values_increasing"]) for r in cols_df.collect()}
    # KEY: unique + increasing + name matches
    assert got["KEY"] == (True, True)
    # NAME: unique but non-increasing ('b','a','c') and name not PK-ish
    assert got["NAME"] == (False, False)


def test_monotonicity_branch_gated_on_rowid_coercion(spark):
    """Column.scala:104-106 coerces BOTH rowID and value with .toDouble:
    numeric values under NON-numeric row ids (every real Oracle ROWID)
    must use the case-insensitive STRING comparison — '10' < '9', so
    9→10 is NOT increasing. The same values under all-numeric row ids
    use the numeric branch and ARE increasing. Oracle restatement must
    agree on both (ADVICE r1 divergence pin)."""
    alpha = _docs_from_stmts([
        ('insert into "S"."M"("ID") values (\'9\');', "AX"),
        ('insert into "S"."M"("ID") values (\'10\');', "BX"),
    ])
    numeric = _docs_from_stmts([
        ('insert into "S"."M"("ID") values (\'9\');', "7"),
        ('insert into "S"."M"("ID") values (\'10\');', "8"),
    ])
    for pdf, want in ((alpha, False), (numeric, True)):
        events = _spark_events(spark, pdf)
        cols_df, _ = discover_schema(events)
        got = {r["col"]: r["values_increasing"] for r in cols_df.collect()}
        assert got["ID"] is want, (want, got)
        _, oracle_schema = _oracle_schema(pdf)
        assert oracle_schema['"S"."M"']["ID"].values_increasing is want
