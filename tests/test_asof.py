"""As-of and binned range join semantics on crafted timelines."""

from __future__ import annotations

from datetime import datetime

from distributed_mapreduce_spark.operators.asof import asof_join, range_join_binned


def ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 12, minute, second)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(20), "p2"), (2, ts(5), "p3")],
        ["k", "lt", "lid"],
    )
    right = spark.createDataFrame(
        [(1, ts(8), "c1"), (1, ts(10), "c2"), (1, ts(15), "c3"), (2, ts(9), "c4")],
        ["k", "rt", "rid"],
    )
    out = {
        r["lid"]: (r["rid_asof"], r["rt_asof"])
        for r in asof_join(left, right, "k", "lt", "rt").collect()
    }
    assert out["p1"] == ("c2", ts(10))  # inclusive: equal timestamp matches
    assert out["p2"] == ("c3", ts(15))  # latest prior, not just any prior
    assert out["p3"] == (None, None)    # right row is AFTER left -> no match


def test_asof_join_no_cross_key_leakage(spark):
    left = spark.createDataFrame([(1, ts(30), "p")], ["k", "lt", "lid"])
    right = spark.createDataFrame([(2, ts(1), "other-key")], ["k", "rt", "rid"])
    row = asof_join(left, right, "k", "lt", "rt").collect()[0]
    assert row["rid_asof"] is None


def test_range_join_binned_matches_exact_predicate(spark):
    left = spark.createDataFrame(
        [(1, ts(10, 0), "p1"), (1, ts(10, 30), "p2"), (1, ts(20), "p3")],
        ["k", "lt", "lid"],
    )
    right = spark.createDataFrame(
        [(1, ts(9, 50), "c1"), (1, ts(10, 0), "c2"), (1, ts(4), "c3")],
        ["k", "rt", "rid"],
    )
    # window: right within [0, 60] seconds BEFORE left
    got = {
        (r["lid"], r["rid"])
        for r in range_join_binned(left, right, "k", "lt", "rt", 0, 60, 60).collect()
    }
    assert got == {
        ("p1", "c1"),  # 10s before
        ("p1", "c2"),  # simultaneous (inclusive)
        ("p2", "c1"),  # 40s before
        ("p2", "c2"),  # 30s before
    }
    # p3: nearest right is 16 min away -> excluded; c3: 6 min before p1 -> excluded


def test_range_join_binned_covers_bucket_boundary(spark):
    # left at 12:10:05, right at 12:09:58 — 7s apart but in DIFFERENT
    # 60s buckets; the ±1 bucket probe must still find it
    left = spark.createDataFrame([(1, ts(10, 5), "p")], ["k", "lt", "lid"])
    right = spark.createDataFrame([(1, ts(9, 58), "c")], ["k", "rt", "rid"])
    got = range_join_binned(left, right, "k", "lt", "rt", 0, 60, 60).collect()
    assert len(got) == 1


def test_range_join_binned_interval_wider_than_bin(spark):
    # ADVICE r01: [300, 600]s with 300s bins used to probe only 2
    # buckets and silently drop matches; offsets now derive from the
    # interval. right 420s before left => inside [300, 600].
    left = spark.createDataFrame([(1, ts(10, 0), "p")], ["k", "lt", "lid"])
    right = spark.createDataFrame([(1, ts(3, 0), "c")], ["k", "rt", "rid"])
    got = range_join_binned(left, right, "k", "lt", "rt", 300, 600, 300).collect()
    assert len(got) == 1
    # and the exact predicate still excludes a 200s-before row
    right2 = spark.createDataFrame([(1, ts(6, 40), "c")], ["k", "rt", "rid"])
    assert range_join_binned(left, right2, "k", "lt", "rt", 300, 600, 300).count() == 0


def test_range_join_binned_negative_lower(spark):
    # negative lower => right may be AFTER left: window [-60, 60]
    left = spark.createDataFrame([(1, ts(10, 0), "p")], ["k", "lt", "lid"])
    right = spark.createDataFrame(
        [(1, ts(10, 30), "after"), (1, ts(9, 30), "before"), (1, ts(12, 0), "far")],
        ["k", "rt", "rid"],
    )
    got = {r["rid"] for r in range_join_binned(left, right, "k", "lt", "rt", -60, 60, 60).collect()}
    assert got == {"after", "before"}


def test_asof_forward_with_tolerance(spark):
    import datetime as dt

    from distributed_mapreduce_spark.operators.asof import asof_join

    T = dt.datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 101, T), (1, 102, T + dt.timedelta(hours=3))],
        ["k", "lid", "lts"],
    )
    right = spark.createDataFrame(
        [(1, T + dt.timedelta(minutes=30))], ["k", "rts"]
    )
    out = {
        r["lid"]: r["rts_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=[], direction="forward", tolerance_seconds=3600,
        ).collect()
    }
    # lid 101: next right row 30 min later, inside the 1h tolerance.
    assert out[101] == T + dt.timedelta(minutes=30)
    # lid 102: no right row at-or-after it → NULL.
    assert out[102] is None
