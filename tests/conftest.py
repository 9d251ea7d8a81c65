from __future__ import annotations

import pytest

from scabillmatch_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


# One build of each registry query DataFrame per session, shared by
# tests/test_oracle.py (values vs the DuckDB oracle) and
# tests/test_plans.py's registry-wide plan gate (no cartesian) — several
# query builders run internal actions (model fits, temp-dir writes), so
# building each twice would double the suite's wall time for no coverage.
_QUERY_DF_CACHE: dict = {}


def get_query_df(spark, name: str):
    if name not in _QUERY_DF_CACHE:
        import __spark_entry__ as entrymod

        _QUERY_DF_CACHE[name] = entrymod.queries()[name](spark, SF_MED)
    return _QUERY_DF_CACHE[name]


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med():
    return SF_MED
