"""Driver-contract smoke: __spark_entry__ must keep its shape.

The driver imports this module, runs ``entry(spark)``, and iterates
``queries()``/``oracle_sql()``; a rename or schema drift here fails the
round even if every operator is healthy — so pin it in pytest too."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs_and_keeps_schema(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {
        "vec_id", "label", "score", "lang", "source", "n_chars"
    }


def test_query_and_oracle_views_are_consistent():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(qs) >= 100
    assert set(osql) <= set(qs)
    # every oracle is runnable SQL text; every query is a callable
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
