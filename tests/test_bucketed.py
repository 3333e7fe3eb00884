"""Bucketed co-located joins: the write-time shuffle replaces the
join-time shuffle — asserted on the physical plan."""

import pandas as pd
from pyspark.sql import functions as F

from redo_log_parser_spark.sinks.bucketed import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    # clean any orphaned managed-table location from a previous run
    # (drop table alone won't remove a dir left by a failed write)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_a_bucketed", "t_b_bucketed"):
        spark.sql(f"drop table if exists {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    a = spark.createDataFrame(
        pd.DataFrame({"row_id": [f"R{i}" for i in range(500)],
                      "v": range(500)})
    )
    b = spark.createDataFrame(
        pd.DataFrame({"row_id": [f"R{i}" for i in range(0, 500, 2)],
                      "w": range(250)})
    )
    write_bucketed(a, "t_a_bucketed", "row_id", n_buckets=8, sort_col="row_id")
    write_bucketed(b, "t_b_bucketed", "row_id", n_buckets=8, sort_col="row_id")
    ta, tb = read_table(spark, "t_a_bucketed"), read_table(spark, "t_b_bucketed")

    # at test size the planner prefers broadcast (which also skips the
    # shuffle); force the sort-merge path to show the BUCKETED guarantee
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "row_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        assert joined.count() == 250
        got = {r["row_id"]: (r["v"], r["w"]) for r in joined.collect()}
        assert got["R4"] == (4, 2)

        # control: the same join on unbucketed frames DOES shuffle
        plain = a.join(b, "row_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan, plain_plan

        # aggregation on the bucket key also skips the exchange
        agg = ta.groupBy("row_id").agg(F.count("*").alias("n"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in agg_plan, agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    spark.sql("drop table t_a_bucketed")
    spark.sql("drop table t_b_bucketed")
