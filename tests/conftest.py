from __future__ import annotations

import pytest

from clip_retrieval_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="tests")
    yield s
    s.stop()
