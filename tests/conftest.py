import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redo_log_parser_spark.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: corpus-scale tests (~1 min each); deselect with -m 'not slow'",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rlps-tests", master="local[4]", confs={
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "4g",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def mini_docs_pdf():
    from redo_log_parser_spark.fixtures import mini_log_documents

    return mini_log_documents()


@pytest.fixture(scope="session")
def mini_docs(spark, mini_docs_pdf):
    return spark.createDataFrame(mini_docs_pdf).cache()
