"""Pre-flight of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.001, compare
row-counts + sorted values exactly."""

import duckdb
import pandas as pd
import pytest

import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = _canon(q(spark, SF_DIR).toPandas())
    if sql is None:
        assert len(got) >= 0  # rows-only check
        return
    want = _canon(ddb.execute(sql).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c], want[c]
        # dtype-kind parity catches DuckDB HUGEINT (object/float) vs Spark
        # BIGINT artifacts that flip the driver's value-hash despite equal
        # values (int width differences hash fine, so kind is enough)
        assert a.dtype.kind == b.dtype.kind, (
            f"{name}.{c}: dtype {a.dtype} vs {b.dtype}"
        )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, check_exact=True
            )
        else:
            assert a.astype(object).tolist() == b.astype(object).tolist(), c


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 1
