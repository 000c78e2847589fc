"""Salted operators must be result-identical to their plain forms on
skewed data, while spreading hot keys across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.operators.skew import salted_group_count, salted_join


def _skewed(spark):
    # one key holds 90% of rows
    rows = [("hot", i) for i in range(900)] + [(f"k{i % 10}", i) for i in range(100)]
    return spark.createDataFrame(rows, ["key", "v"])


def test_salted_group_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r["key"]: r["cnt"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["key"]: r["cnt"] for r in salted_group_count(df, "key", salt=8).collect()}
    assert salted == plain
    assert salted["hot"] == 900


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "X")], ["key", "tag"]
    )
    plain = {(r["key"], r["v"], r["tag"]) for r in big.join(small, "key").collect()}
    salted = {(r["key"], r["v"], r["tag"]) for r in salted_join(big, small, "key", salt=4).collect()}
    assert salted == plain
    assert len(salted) == 900 + 10 + 10  # hot + k1 + k2


def test_salt_actually_spreads_hot_key(spark):
    df = _skewed(spark)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    )
    n_salts = (
        salted.filter(F.col("key") == "hot").select("_salt").distinct().count()
    )
    assert n_salts == 8  # hot key really fans out over the salt space
