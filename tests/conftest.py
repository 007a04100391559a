from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="nga-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
