"""Skew hardening: the salted two-phase collect must survive a hot case
(one entity owning most events) and still produce correct ordering."""

import pandas as pd
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from redo_log_parser_spark.operators.traces import collect_traces


@pytest.fixture(scope="module")
def hot_case(spark):
    t0 = datetime(2020, 1, 1)
    rows = []
    # one hot case with 50k events, 50 cold cases with 10 each
    for i in range(50_000):
        rows.append(("HOT", f"e{i:06d}", t0 + timedelta(seconds=i)))
    for c in range(50):
        for i in range(10):
            rows.append((f"c{c}", f"x{c}_{i}", t0 + timedelta(seconds=i)))
    pdf = pd.DataFrame(rows, columns=["case_id", "event_name", "ts"])
    pdf["url"] = [f"u{j:07d}" for j in range(len(pdf))]
    return spark.createDataFrame(pdf).repartition(16)


def test_salted_collect_handles_hot_case(hot_case):
    traces = collect_traces(
        hot_case.withColumn("xes_ts", F.lit("t")),
        event_cols=("event_name",),
        n_salt=16,
    )
    rows = {r["case_id"]: r["events"] for r in traces.collect()}
    assert len(rows) == 51
    hot = rows["HOT"]
    assert len(hot) == 50_000
    # ordering survived the two-phase merge: strictly increasing ts order
    names = [e["event_name"] for e in hot]
    assert names == sorted(names)
    assert all(len(rows[f"c{c}"]) == 10 for c in range(50))


def test_salt_actually_splits_partial_groups(hot_case):
    """The partial aggregation must see >1 salt group for the hot case
    (otherwise phase one is a no-op and one reducer takes the whole key)."""
    salted = hot_case.withColumn(
        "__salt", F.pmod(F.xxhash64("ts", "url"), F.lit(16))
    )
    n_groups = (
        salted.filter(F.col("case_id") == "HOT")
        .select("__salt").distinct().count()
    )
    assert n_groups == 16
