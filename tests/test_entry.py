"""Driver-contract sanity: entry() runs, queries()/oracle_sql() keys
line up (full value-equivalence vs DuckDB runs via
tools/check_oracles.py, which mirrors the driver's gate)."""

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"user_id", "event_id", "value", "rn"}


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the vast majority of operators must carry a SQL oracle
    assert len(oracles) >= 25
    assert len(qs) >= 30


def test_query_callables_have_docstrings():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
