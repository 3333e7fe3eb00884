"""JVM expression parser ≡ pandas kernel on all well-formed corpora."""

import pytest
from pyspark.sql import functions as F

from redo_log_parser_spark.config import PipelineConfig
from redo_log_parser_spark.functions.parse import parse_documents
from redo_log_parser_spark.functions.parse_sql import parse_documents_sql
from redo_log_parser_spark.sources.logfile import read_log_files

CMP_COLS = [
    "url", "op", "table_id", "row_id", "ts", "statement",
    "insert_cols", "insert_vals", "upd_attr", "upd_new", "upd_old",
    "delete_cols", "delete_vals", "parse_error",
]


def assert_same(df_kernel, df_sql):
    a = df_kernel.select(*CMP_COLS)
    b = df_sql.select(*CMP_COLS)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    if diff:
        a.exceptAll(b).show(5, truncate=False)
        b.exceptAll(a).show(5, truncate=False)
    assert diff == 0


def test_sql_parser_matches_kernel_mini_log(spark, mini_docs):
    assert_same(parse_documents(mini_docs), parse_documents_sql(mini_docs))


@pytest.mark.parametrize(
    "path,fmt",
    [
        ("/root/reference/artifacts/redo_log.txt", "dd-MMM-yyyy HH:mm:ss"),
        ("/root/reference/artifacts/evaluation_log.txt", "yyyy-MM-dd HH:mm:ss"),
    ],
)
def test_sql_parser_matches_kernel_artifacts(spark, path, fmt):
    cfg = PipelineConfig(ts_format_java=fmt)
    docs = read_log_files(spark, path)
    assert_same(
        parse_documents(docs, cfg, keep_cols=("url",)),
        parse_documents_sql(docs, cfg, keep_cols=("url",)),
    )


def test_sql_parser_stays_jvm_side(spark, mini_docs, tmp_path):
    """No Python/Arrow nodes in the physical plan — a single JVM Project
    over the scan. (Higher-order array functions keep the Project out of
    whole-stage codegen, but it is still JVM expression eval, no
    serialization boundary.)"""
    pq = str(tmp_path / "d.parquet")
    mini_docs.write.mode("overwrite").parquet(pq)
    plan = (
        parse_documents_sql(spark.read.parquet(pq))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.startswith("Project") or "Project" in plan.splitlines()[0]
