import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="kgforge-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def unit_fixture_dir():
    from kgforge.fixtures import ensure_fixtures

    return ensure_fixtures("unit")
