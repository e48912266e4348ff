"""Driver-contract drift guards: the queries()/oracle_sql()/bench
surfaces stay in sync as operators are added."""

import __spark_entry__ as entry
import bench


def test_every_query_has_an_oracle():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracles without queries: {o - q}"
    missing = q - o
    # the stated bar: every operator claimed done has BOTH entries
    assert not missing, f"queries without oracle coverage: {missing}"


def test_bench_set_is_a_subset_of_queries():
    q = set(entry.queries())
    extra = set(bench.BENCH_QUERIES) - q
    assert not extra, f"bench names not in queries(): {extra}"


def test_entry_flagship_runs(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "span_offset", "kind", "text",
                          "media_ref"]
