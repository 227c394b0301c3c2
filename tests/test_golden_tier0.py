"""Tier 0: pure-python golden replay — all 112 reference pairs, no Spark.

Mirrors the reference suite's run_tests harness (tests.py:10-24) against our
stdlib engine.
"""

from __future__ import annotations

import pytest

from html_sanitizer_spark.engine.core import sanitize
from html_sanitizer_spark.engine.settings import Settings

from .golden_cases import CASES, CONFIGS, expected

_SETTINGS_CACHE: dict[str, Settings] = {}


def _settings(name: str) -> Settings:
    if name not in _SETTINGS_CACHE:
        _SETTINGS_CACHE[name] = Settings(CONFIGS[name])
    return _SETTINGS_CACHE[name]


@pytest.mark.parametrize("case", CASES, ids=[c.case_id for c in CASES])
def test_golden(case):
    result = sanitize(case.before, _settings(case.config))
    want = expected(case)
    if case.strip:
        result, want = result.strip(), want.strip()
    assert result == want, (
        f"{case.case_id} ({case.source}): cleaning "
        f"{case.before.encode('unicode-escape')!r}, expected "
        f"{want.encode('unicode-escape')!r} but got "
        f"{result.encode('unicode-escape')!r}"
    )
