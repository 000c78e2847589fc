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


def test_near_dup_cell_cap_sub_bands_hot_cell(spark):
    """One hot blocking cell must fan out over ceil(m/cap) sub-bands,
    bounding per-key pair generation, while identical vectors still pair
    within a band; small cells are untouched (single band = exact)."""
    from distributed_mapreduce_spark.workload.similarity import (
        near_dup_pairs_cell_capped,
    )

    # 300 identical vectors in one hot cell + 5 in a cold cell
    vec = [1.0] * 8
    rows = [(i, "hot", vec) for i in range(300)] + [
        (1000 + i, "cold", vec) for i in range(5)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])

    capped = near_dup_pairs_cell_capped(emb, cap=100)
    n_hot = capped.filter(F.col("vec_a") < 1000).count()
    n_cold = capped.filter(F.col("vec_a") >= 1000).count()

    # cold cell (5 rows < cap): all C(5,2)=10 exact pairs survive
    assert n_cold == 10
    # hot cell: 3 sub-bands => only within-band pairs, strictly fewer
    # than the uncapped C(300,2), but every band still yields pairs
    assert 0 < n_hot < 300 * 299 // 2
    # per-band boundedness: no sub-band exceeds ~cap members => the
    # largest per-key pair count is O(cap^2), not O(m^2)
    from pyspark.sql import Window

    w = Window.partitionBy("label")
    nsub = ((F.count(F.lit(1)).over(w) + F.lit(99)) / F.lit(100)).cast("long")
    h = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10).cast("long")
    bands = (
        emb.select("label", (h % nsub).cast("int").alias("sub"))
        .groupBy("label", "sub")
        .count()
        .collect()
    )
    hot_bands = {r["sub"]: r["count"] for r in bands if r["label"] == "hot"}
    assert len(hot_bands) == 3  # ceil(300/100)
    assert max(hot_bands.values()) < 200  # hash-balanced, far under m


def test_salt_actually_spreads_hot_key(spark):
    df = _skewed(spark)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    )
    n_salts = (
        salted.filter(F.col("key") == "hot").select("_salt").distinct().count()
    )
    assert n_salts == 8  # hot key really fans out over the salt space
