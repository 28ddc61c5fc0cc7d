"""Query-registry integrity guards (restored after the file was
repurposed for the Schema Registry client).

A single dangling import or phantom _PRIORITY entry in the query
registry takes down EVERY official gate at once (the driver imports
the registry before grading anything), so these checks run first and
fast: no Spark session, no data, just the contract between
__spark_entry__ and the registry.
"""

from __future__ import annotations


def test_registry_imports_and_is_nonempty():
    from maston_spark.queries import all_oracles, all_queries

    qs, osql = all_queries(), all_oracles()
    assert len(qs) >= 70
    assert set(osql) <= set(qs)


def test_priority_list_has_no_phantom_entries():
    """Every name in _PRIORITY must be REGISTERED — a priority entry
    for a query that doesn't exist means a planned module was never
    written (or an import silently vanished)."""
    from maston_spark.queries import _PRIORITY, REGISTRY, load_all_query_modules

    load_all_query_modules()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"_PRIORITY names with no registered query: {missing}"


def test_entry_module_contract():
    import __spark_entry__ as m

    assert callable(m.entry)
    qs = m.queries()
    osql = m.oracle_sql()
    assert len(qs) >= 70
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # every callable has the (spark, sf_dir) arity
    import inspect

    for name, fn in qs.items():
        assert len(inspect.signature(fn).parameters) == 2, name


def test_oracles_are_parseable_sql():
    """Cheap static sanity on every oracle: DuckDB can PREPARE it
    against empty views with the right names (catches typos/synax
    without running Spark)."""
    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    # minimal column surface used by the oracles
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet') LIMIT 0")
    bad = {}
    for name, sql in m.oracle_sql().items():
        try:
            con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e)[:120]
    assert not bad, f"oracles that fail to parse/bind: {bad}"
