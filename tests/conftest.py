from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from html_sanitizer_spark.pipeline.session import get_spark

    s = get_spark("tests", parallelism=4, shuffle_partitions=4)
    yield s
    s.stop()
