import pytest

from common_survey_data_pipeline_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="csdp-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
