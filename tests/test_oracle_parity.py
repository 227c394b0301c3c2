"""Tier 2: replicate the driver's correctness gate locally — every oracled
query must match DuckDB on row count, column names, and order-insensitive
value hash at sf0.001 (tests) — the driver runs the same at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

from html_sanitizer_spark.queries import REGISTRY

import os
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(value):
    if value is None:
        return "\x00null"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        # kill -0.0 and tiny representation drift beyond the 4-decimal grain
        v = round(value, 6)
        return f"{v + 0.0:.6f}"
    if isinstance(value, bool):
        return str(int(value))
    return str(value)


def _value_multiset(df, cols):
    rows = ["\x01".join(_canon(r[c]) for c in cols) for _, r in df.iterrows()]
    return sorted(rows)


_ORACLED = [(n, fn, sql) for n, (fn, sql) in REGISTRY.items() if sql]


@pytest.mark.parametrize("name,fn,sql", _ORACLED, ids=[n for n, *_ in _ORACLED])
def test_matches_duckdb(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = duck.execute(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} != {len(ddf)}"
    cols = sorted(sdf.columns)
    sm, dm = _value_multiset(sdf, cols), _value_multiset(ddf, cols)
    mism = [i for i, (a, b) in enumerate(zip(sm, dm)) if a != b][:3]
    assert sm == dm, (
        f"{name}: value mismatch, first diffs at {mism}: "
        + "; ".join(f"spark={sm[i]!r} duck={dm[i]!r}" for i in mism)
    )


def test_rows_only_queries_run(spark):
    for name, (fn, sql) in REGISTRY.items():
        if sql is None:
            df = fn(spark, SF_DIR)
            assert df.count() >= 0, name
            assert len(df.columns) > 0, name


def test_registry_column_discipline(spark):
    """Driver-gate insurance: every registry query must emit distinct,
    explicitly-aliased snake_case column names (the driver hash-compares
    after sorting columns by name; an unaliased `sum(x)` or a duplicate
    name breaks the compare silently)."""
    import re

    for name, (fn, _) in REGISTRY.items():
        cols = fn(spark, SF_DIR).columns
        assert len(cols) == len(set(cols)), (name, cols)
        for c in cols:
            assert re.fullmatch(r"[a-z][a-z0-9_]*", c), (name, c)
