import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_award_extractor_spark.config import get_spark

    s = get_spark("engine-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
