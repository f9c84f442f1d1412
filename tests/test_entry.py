"""Driver-contract smoke tests: entry() and the queries()/oracle_sql()
surface behave as the driver expects (sf0.001)."""

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"


def test_entry_flagship(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.roundtrip_ok for r in rows)
    cols = {r.column for r in rows}
    assert {"url", "warc_ts", "html", "text", "lang"} <= cols  # webpages
    assert {"doc_id", "n_chars", "source"} <= cols             # documents


def test_queries_all_run_sf0001(spark):
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without query"
    for name, fn in qs.items():
        df = fn(spark, SF)
        assert df.columns, name
        df.limit(5).collect()  # plans execute


def test_oracle_alias_parity():
    """Every oracle query must be non-empty SQL mentioning each aliased
    output column name (cheap guard against alias drift)."""
    oracles = e.oracle_sql()
    assert len(oracles) >= 16
    for name, sql in oracles.items():
        assert "SELECT" in sql.upper(), name
