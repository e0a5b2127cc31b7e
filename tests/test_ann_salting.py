"""LSH ANN recall vs brute force + salted aggregation equivalence."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_lsh_topk_recall(spark):
    from geojson_vt_rs_spark.operators.ann import lsh_topk, with_lsh_bucket
    from geojson_vt_rs_spark.operators.text_dedup import ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(v) for v in emb.filter("vec_id = 0").collect()[0]["embedding"]]

    exact = {r["vec_id"] for r in ann_topk(emb, qv, k=10).collect()}
    approx_df = lsh_topk(emb, qv, k=10, bits=6, probe_radius=2)
    approx = {r["vec_id"] for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall}"

    # buckets actually prune: candidate set well under the full table
    bucketed = with_lsh_bucket(emb, len(qv), bits=6)
    sizes = bucketed.groupBy("bucket").count().collect()
    assert len(sizes) > 8  # vectors spread across many buckets
    assert max(r["count"] for r in sizes) < emb.count()


def test_lsh_bucket_deterministic(spark):
    from geojson_vt_rs_spark.operators.ann import with_lsh_bucket

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = with_lsh_bucket(emb, 64, bits=8).select("vec_id", "bucket").toPandas()
    b = with_lsh_bucket(emb, 64, bits=8).select("vec_id", "bucket").toPandas()
    a = a.sort_values("vec_id", ignore_index=True)
    b = b.sort_values("vec_id", ignore_index=True)
    assert (a["bucket"] == b["bucket"]).all()


def test_salted_count_matches_plain(spark):
    from geojson_vt_rs_spark.functions.salting import salted_count, salted_sum

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plain = {
        (r["event_type"],): r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["event_type"],): r["n"]
        for r in salted_count(ev, ["event_type"], n_salts=8).collect()
    }
    assert plain == salted

    plain_sum = {
        r["event_type"]: round(r["t"], 6)
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.floor(F.col("value") * 1000)).alias("t"))
        .collect()
    }
    salted_s = {
        r["event_type"]: round(r["total"], 6)
        for r in salted_sum(
            ev.withColumn("v", F.floor(F.col("value") * 1000)),
            ["event_type"], "v", n_salts=8,
        ).collect()
    }
    assert plain_sum == salted_s


def test_lsh_ivf_partitioning_invariance(spark):
    """Bucket/cell assignments are pure per-row functions — identical
    under any repartitioning (no batch-boundary effects)."""
    from geojson_vt_rs_spark.operators.ann import with_ivf_cell, with_lsh_bucket

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = [
        (int(r["vec_id"]), [float(v) for v in r["embedding"]])
        for r in emb.filter("vec_id < 16").collect()
    ]
    a = (
        with_lsh_bucket(emb.repartition(1), 64, bits=8)
        .select("vec_id", "bucket").toPandas().sort_values("vec_id", ignore_index=True)
    )
    b = (
        with_lsh_bucket(emb.repartition(13), 64, bits=8)
        .select("vec_id", "bucket").toPandas().sort_values("vec_id", ignore_index=True)
    )
    assert (a["bucket"] == b["bucket"]).all()
    c = (
        with_ivf_cell(emb.repartition(1), cents)
        .select("vec_id", "ivf_cell").toPandas().sort_values("vec_id", ignore_index=True)
    )
    d = (
        with_ivf_cell(emb.repartition(7), cents)
        .select("vec_id", "ivf_cell").toPandas().sort_values("vec_id", ignore_index=True)
    )
    assert (c["ivf_cell"] == d["ivf_cell"]).all()
