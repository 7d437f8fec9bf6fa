"""Planted tests for the KMV overlap sketch and the temperature
mixture: constructed sets with known overlap, the exact-when-small
branch, and the sqrt-share convergence the oracle equality can't
localize on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidatabots_spark.operators.sketch import kmv_sketch


def test_kmv_sketch_keeps_k_smallest_distinct(spark):
    rows = [("g", v % 50) for v in range(500)]  # 50 distinct, repeated
    df = spark.createDataFrame(rows, "g string, v long")
    sk = kmv_sketch(df, "v", k=8, group_cols=("g",)).collect()
    assert len(sk) == 8
    hs = sorted(r["h"] for r in sk)
    # the k kept hashes are the global minimum of the distinct set
    all_h = sorted(
        r["h"]
        for r in kmv_sketch(df, "v", k=10**6, group_cols=("g",)).collect()
    )
    assert hs == all_h[:8]
    assert len(all_h) == 50  # distinct values, not rows


def test_kmv_exact_when_union_smaller_than_k(spark, sf_dir):
    """Groups whose union fits inside the sketch must report EXACT
    counts (the CASE branch), not estimates."""
    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(5, 15)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    # run the registered query logic on a tiny frame via its operator
    # building blocks: sketch both groups with k=32 >> union size
    sk = kmv_sketch(df, "user_id", k=32, group_cols=("event_type",))
    a = {r["h"] for r in sk.where("event_type = 'a'").collect()}
    b = {r["h"] for r in sk.where("event_type = 'b'").collect()}
    assert len(a) == 10 and len(b) == 10
    assert len(a & b) == 5 and len(a | b) == 15


def test_mix_temperature_shares_follow_sqrt(spark):
    from wikidatabots_spark.operators.mixture import mix_temperature

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_temperature(df, key="doc_id", strata="source")
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # weights isqrt(900)=30, isqrt(100)=10 -> target shares 3/4 and 1/4
    # of the 1000-row budget, within hash-granule tolerance
    assert abs(got["big"] - 750) < 40
    assert abs(got["small"] - 250) < 40
    # epochs appear on the up-sampled stratum (small: rate 2.5 per doc)
    max_epoch = out.where("source = 'small'").agg(
        F.max("epoch").alias("m")
    ).collect()[0]["m"]
    assert max_epoch >= 2
