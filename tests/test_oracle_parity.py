"""Run every registered query against the DuckDB oracle exactly the way the
driver does (sorted columns, order-insensitive values) at the test SF."""

from __future__ import annotations

import pytest

from lichess_event_stream_watcher_spark import queries as q
from tests.oracle_harness import compare


def _pairs():
    oracles = q.all_oracles()
    return [(name, oracles[name]) for name in q.all_queries() if name in oracles]


@pytest.mark.parametrize("name,oracle", _pairs(), ids=[n for n, _ in _pairs()])
def test_query_matches_oracle(spark, duck, sf_dir, name, oracle):
    df = q.all_queries()[name](spark, sf_dir)
    compare(df, duck, oracle)


def test_rows_only_queries_run(spark, sf_dir):
    oracles = q.all_oracles()
    for name, fn in q.all_queries().items():
        if name not in oracles:
            assert fn(spark, sf_dir).count() >= 0, name
