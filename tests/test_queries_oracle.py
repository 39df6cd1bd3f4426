"""The primary gate: every catalog query with an oracle must hash-match
DuckDB at sf0.001 (the driver re-checks at sf0.01). Rows-only queries
must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_harness import compare
from universal_data_connector_spark.plans.catalog import ORACLES, QUERIES

ORACLE_KEYS = sorted(ORACLES)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    rel = duck.sql(ORACLES[name])
    ok, detail = compare(sdf, rel)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_executes(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    df.collect()  # must execute without error


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_every_query_key_has_callable():
    import __spark_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
