import pytest


@pytest.fixture(scope="session")
def spark():
    from pii_redaction_pipeline_spark.session import get_spark

    s = get_spark(app="pytest", master="local[8]", shuffle_partitions=8)
    yield s
