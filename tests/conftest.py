from __future__ import annotations

import pytest

from frontier_engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("frontier-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
