from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("UDC_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from universal_data_connector_spark.session import get_spark
    s = get_spark("udc-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from tests.oracle_harness import duck_connection
    return duck_connection(SF_DIR)
