"""Registry contract invariants (driver interface sanity)."""


def test_oracle_keys_subset_of_queries(registry):
    queries, oracles = registry
    assert set(oracles) <= set(queries)


def test_spark_entry_exposes_registry(registry):
    import __spark_entry__ as entry_mod

    queries, oracles = registry
    assert set(entry_mod.queries()) == set(queries)
    assert set(entry_mod.oracle_sql()) == set(oracles)


def test_entry_runs_flagship(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_all_queries_return_dataframes(spark, registry):
    """Every registered query must build a plan (schema resolvable) at smoke SF."""
    from tests.conftest import SF_SMOKE

    queries, _ = registry
    for key, fn in queries.items():
        df = fn(spark, SF_SMOKE)
        assert df.schema is not None, key
