"""Driver-contract smoke tests: entry(), queries()/oracle_sql() consistency,

and DuckDB oracle agreement at sf0.001 (fast; the driver runs sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"source", "est_distinct"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


# sequences-backed oracles read the sf0.01 (20k-row) materialization by path,
# so those queries must run at sf0.01 here (the driver always runs sf0.01)
_SEQ_ORACLE_QUERIES = {
    # queries whose DuckDB oracle reads the sf0.01 sequences parquet by path
    "hll_tokens_accuracy",
    "hll_tokens_rollup",
    "merge_law_identity",
    "source_overlap",
    "source_jaccard_matrix",
    "corpus_profile_per_source",
    "doc_rarity_mass",
    "sampled_docs",
    "fi_token_topk_accuracy",
    "cms_token_freq_topk",
    "cms_heavy_hitters_per_source",
    "sql_over_checkpoint",
    "streaming_hll_parity",
}


def test_all_queries_run_and_oracles_match(spark, duck):
    qs, osql = E.queries(), E.oracle_sql()
    E.entry(spark)  # materializes the sequences parquet the oracles read
    for name, fn in qs.items():
        sf = "/root/testdata/sf0.01" if name in _SEQ_ORACLE_QUERIES else SF
        df = fn(spark, sf)
        rows = df.collect()
        assert len(rows) >= 0, name
        if name in osql:
            got = sorted(tuple(r) for r in rows)
            exp = sorted(
                tuple(r) for r in duck.execute(osql[name]).fetchdf().itertuples(index=False)
            )
            assert got == exp, f"{name}: spark {got[:3]} != duckdb {exp[:3]}"
