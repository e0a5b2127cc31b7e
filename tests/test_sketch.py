"""KMV distinct sketch: oracle parity, both branches, accuracy bound."""

import duckdb
import pytest

from geojson_vt_rs_spark.operators.sketch import (
    KMV_K,
    duck_kmv_sql,
    kmv_distinct,
)

SF01 = "/root/testdata/sf0.01"


def _duck_rows(sql, parquet, table):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{parquet}')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_kmv_oracle_parity_estimate_branch(spark):
    """sf0.01 orders: ~1300 distinct custkeys per priority >> k=256, so
    every group exercises the estimator; byte-identical to DuckDB."""
    orders = spark.read.parquet(f"{SF01}/orders.parquet")
    got = sorted(
        tuple(r)
        for r in kmv_distinct(
            orders, "o_orderpriority", "o_custkey", k=KMV_K
        ).collect()
    )
    want = _duck_rows(
        duck_kmv_sql("o_orderpriority", "o_custkey", k=KMV_K),
        f"{SF01}/orders.parquet",
        "orders",
    )
    assert got == want
    assert all(r[1] == KMV_K for r in got)  # estimator branch everywhere

    # accuracy: KMV stderr ~1/sqrt(k-2) ≈ 6.3% at k=256; assert 4 sigma
    truth = {
        g: n
        for g, n in spark.sql(
            "SELECT o_orderpriority, count(DISTINCT o_custkey) "
            f"FROM parquet.`{SF01}/orders.parquet` GROUP BY 1"
        ).collect()
    }
    for g, _, est in got:
        assert abs(est - truth[g]) / truth[g] < 0.25, (g, est, truth[g])


def test_kmv_exact_below_capacity(spark):
    """Groups with < k distinct values: the sketch IS the exact count
    (including duplicates collapsing), invariant to partitioning."""
    rows = [("a", i % 7) for i in range(100)] + [("b", i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: (r["n_kept"], r["est"]) for r in
           kmv_distinct(df, "g", "v", k=64).collect()}
    assert got == {"a": (7, 7), "b": (40, 40)}
    got_r = {r["g"]: (r["n_kept"], r["est"]) for r in
             kmv_distinct(df.repartition(13), "g", "v", k=64).collect()}
    assert got_r == got


def test_kmv_mixed_branches_match_oracle(spark):
    """One group above capacity, one below, in the same call."""
    rows = [("big", i) for i in range(500)] + [("small", i) for i in range(9)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = sorted(tuple(r) for r in kmv_distinct(df, "g", "v", k=16).collect())
    con = duckdb.connect()
    con.register("t_v", df.toPandas())
    con.execute("CREATE VIEW t AS SELECT * FROM t_v")
    want = sorted(
        tuple(r)
        for r in con.execute(duck_kmv_sql("g", "v", k=16, table="t")).fetchall()
    )
    assert got == want
    d = dict((g, (n, e)) for g, n, e in got)
    assert d["small"] == (9, 9)
    assert d["big"][0] == 16 and d["big"][1] > 16


def test_kmv_k_headroom_guard(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        kmv_distinct(df, "g", "v", k=3000)
    with pytest.raises(ValueError):
        kmv_distinct(df, "g", "v", k=1)
