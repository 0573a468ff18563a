"""Oracle parity for every registered query at sf0.001 (fast smoke of the
sf0.01 gate the driver runs). Each query is a separate parametrized case."""

from __future__ import annotations

import pytest

from motorway_spark.oracle import _duckdb_con, compare_frames
from motorway_spark.queries import QUERIES, ORACLES

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = _duckdb_con(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spark_pdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, stable schema, no exception
        assert spark_pdf is not None
        return
    oracle_pdf = duck.sql(ORACLES[name]).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
