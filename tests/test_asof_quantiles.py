"""As-of join + exact group quantiles: oracle parity and semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geojson_vt_rs_spark.operators.asof import (
    asof_join,
    duck_purchase_attribution_sql,
    purchase_attribution,
)
from geojson_vt_rs_spark.operators.quantiles import (
    duck_group_quantiles_sql,
    group_quantiles,
)

SF = "/root/testdata/sf0.001"


def _duck(sql, views):
    con = duckdb.connect()
    for t, p in views.items():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_asof_oracle_parity(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = sorted(tuple(r) for r in purchase_attribution(ev).collect())
    want = _duck(
        duck_purchase_attribution_sql(), {"events": f"{SF}/events.parquet"}
    )
    assert got == want and len(got) > 0
    # left rows with no prior touchpoint survive with NULL matches
    assert any(r[2] is None for r in got)
    # partitioning invariance
    got_r = sorted(
        tuple(r) for r in purchase_attribution(ev.repartition(17)).collect()
    )
    assert got_r == got


def test_asof_semantics_handbuilt(spark):
    """Inclusive backward match, right-side (key, ts) tie -> max id,
    simultaneous left/right (equal ts) matches, no-match -> NULLs."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(100, 1, t(10)), (101, 1, t(5)), (102, 2, t(3))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 1, t(5), 50.0),   # tied ts=5 with id 2 -> id 2 wins
            (2, 1, t(5), 60.0),
            (3, 1, t(7), 70.0),
            (4, 3, t(1), 99.0),   # other user
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["matched_event_id"], r["matched_value"], r["lag_us"])
        for r in asof_join(
            left, right, key="user_id", ts="ts",
            right_id="event_id", right_payload="value",
        ).collect()
    }
    assert out[100] == (3, 70.0, 3_000_000)   # latest <= 10 is ts=7
    assert out[101] == (2, 60.0, 0)           # inclusive; tie -> max id
    assert out[102] == (None, None, None)     # user 2 has no right rows


def test_group_quantiles_oracle_parity(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    got = sorted(
        tuple(r)
        for r in group_quantiles(
            orders, "o_orderpriority", "o_totalprice", "o_orderkey"
        ).collect()
    )
    want = _duck(
        duck_group_quantiles_sql(
            "o_orderpriority", "o_totalprice", "o_orderkey"
        ),
        {"orders": f"{SF}/orders.parquet"},
    )
    assert got == want and len(got) == 5


def test_group_quantiles_definition(spark):
    """Hand-checkable group: p50 of 1..5 is the rank-2 value (0-based
    floor(0.5*4)); a single-row group returns its value everywhere."""
    df = spark.createDataFrame(
        [("a", float(v), v) for v in range(1, 6)] + [("b", 42.0, 99)],
        "g string, v double, i long",
    )
    got = {
        r["g"]: (r["n"], r["p50"], r["p90"], r["p99"])
        for r in group_quantiles(df, "g", "v", "i").collect()
    }
    assert got["a"] == (5, 3.0, 4.0, 4.0)  # floor(.9*4)=3 -> value 4.0
    assert got["b"] == (1, 42.0, 42.0, 42.0)
