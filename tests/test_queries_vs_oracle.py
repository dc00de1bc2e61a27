"""Differential gate: every registry query vs its DuckDB oracle at sf0.001 —
a local replica of the driver's CORRECTNESS check (row count + columns +
order-insensitive exact values). Rows-only entries just assert executability
and a stable, non-degenerate result."""

from __future__ import annotations

import pytest

from seccosql_spark.registry import REGISTRY
from tests.conftest import assert_df_matches_oracle

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, sess, oracle, changed_names):
    if changed_names is not None and name not in changed_names:
        pytest.skip("unchanged since its last green driver row (--changed-only)")
    spec = REGISTRY[name]
    out = spec.build(sess)
    df = out.df if hasattr(out, "df") else out
    assert_df_matches_oracle(df, oracle, spec.oracle)


def test_rows_only_queries_run(sess):
    """Every oracle-less registry entry must at least execute with a stable
    schema. Currently an empty set — every registered query carries an
    oracle — but the gate stays armed for future sketch entries."""
    for name in ROWS_ONLY_QUERIES:
        spec = REGISTRY[name]
        out = spec.build(sess)
        df = out.df if hasattr(out, "df") else out
        assert len(df.collect()) >= 0, name
        assert len(df.columns) > 0, name


def test_entry_contract(sess):
    """__spark_entry__.entry/queries/oracle_sql contract shape."""
    import __spark_entry__ as e

    out = e.entry(sess.spark)
    assert out.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40 or len(qs) == len(REGISTRY)
