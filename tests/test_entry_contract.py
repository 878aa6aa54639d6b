"""Mirror of the driver's correctness gate: every ``queries()`` entry with an
``oracle_sql()`` twin must value-match DuckDB at sf0.001 (driver runs sf0.01);
rows-only entries must at least run and return sane results."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck_con, name):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    want = _canon(duck_con.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_all_queries_run_under_ansi_on(spark):
    """The driver's session may run ANSI ON (the Spark 4 default; our own
    get_spark pins it off for reference-lenient casts).  Every entry must
    still EXECUTE there — no wrapping-arithmetic or strict-cast landmines
    (e.g. sum(xxhash64) overflows under ANSI; bit_xor doesn't).  ANSI is a
    runtime conf, so flip it on the shared session for the sweep."""
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for name, fn in QUERIES.items():
            df = fn(spark, SF_DIR)
            assert df.limit(5).count() >= 0, name
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
