from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from logdb_spark.plans.session import get_spark

    s = get_spark("logdb-tests")
    yield s


@pytest.fixture(scope="session")
def oracle_small():
    from tools.diffcheck import oracle_connection

    return oracle_connection(SF_SMALL)


@pytest.fixture(scope="session")
def oracle_medium():
    from tools.diffcheck import oracle_connection

    return oracle_connection(SF_MEDIUM)
