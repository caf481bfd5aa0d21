"""As-of join (operators/asof.py): planted interleavings, ties, no-match."""

from __future__ import annotations

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k long, lt long, lid long")
    right = spark.createDataFrame(right_rows, "k long, rt long, rid long, val double")
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        payload_cols=["rid", "val"], tiebreak_col="rid",
    )
    return {r["lid"]: (r["rid"], r["val"]) for r in out.collect()}


def test_basic_interleaving(spark):
    got = _run(
        spark,
        [(1, 10, 100), (1, 25, 101), (1, 40, 102)],
        [(1, 5, 7, 0.5), (1, 20, 8, 0.8), (1, 30, 9, 0.9)],
    )
    assert got == {100: (7, 0.5), 101: (8, 0.8), 102: (9, 0.9)}


def test_left_before_any_right_gets_null(spark):
    got = _run(spark, [(1, 3, 100)], [(1, 5, 7, 0.5)])
    assert got == {100: (None, None)}


def test_equal_timestamp_right_visible(spark):
    # "at or before": a right row AT the left row's time matches
    got = _run(spark, [(1, 20, 100)], [(1, 20, 7, 0.7)])
    assert got == {100: (7, 0.7)}


def test_simultaneous_right_rows_max_tiebreak_wins(spark):
    got = _run(spark, [(1, 30, 100)], [(1, 20, 7, 0.7), (1, 20, 9, 0.9)])
    assert got == {100: (9, 0.9)}


def test_keys_do_not_leak(spark):
    got = _run(
        spark,
        [(1, 10, 100), (2, 10, 200)],
        [(1, 5, 7, 0.5)],
    )
    assert got == {100: (7, 0.5), 200: (None, None)}


def test_payload_fields_come_from_same_row(spark):
    # two right rows where independently-carried columns would mix:
    # later row has null val; struct carriage must keep (rid=9, val=None)
    left = spark.createDataFrame([(1, 30, 100)], "k long, lt long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 7, 0.7), (1, 20, 9, None)], "k long, rt long, rid long, val double"
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        payload_cols=["rid", "val"], tiebreak_col="rid",
    ).collect()
    assert [(r["rid"], r["val"]) for r in out] == [(9, None)]


def test_result_invariant_under_repartition(spark):
    left = spark.createDataFrame(
        [(i % 5, 10 * i, i) for i in range(50)], "k long, lt long, lid long"
    )
    right = spark.createDataFrame(
        [(i % 5, 7 * i, i, float(i)) for i in range(40)],
        "k long, rt long, rid long, val double",
    )
    a = asof_join(left, right, "k", "lt", "rt", ["rid", "val"], "rid")
    b = asof_join(
        left.repartition(13), right.repartition(3), "k", "lt", "rt", ["rid", "val"], "rid"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# interval_join (banded range join)
# ---------------------------------------------------------------------------
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.asof import (  # noqa: E402
    interval_join,
)


def _pairs(spark, left_rows, right_rows, lo, hi):
    left = spark.createDataFrame(left_rows, "k long, t long, lid long")
    right = spark.createDataFrame(right_rows, "k long, t long, rid long")
    out = interval_join(left, right, "k", "t", "t", lo, hi)
    return {(r["l_lid"], r["r_rid"]) for r in out.collect()}


def test_band_inclusive_bounds(spark):
    got = _pairs(
        spark,
        [(1, 100, 0)],
        [(1, 90, 1), (1, 100, 2), (1, 110, 3), (1, 89, 4), (1, 111, 5)],
        -10, 10,
    )
    assert got == {(0, 1), (0, 2), (0, 3)}  # 89 and 111 fall outside


def test_bin_boundary_pairs_not_lost(spark):
    # right rows straddling a bin edge (w = 20 -> bins at multiples of 20):
    # left at t=19 with [lo,hi]=[-10,10] covers 9..29, i.e. bins 0 and 1
    got = _pairs(spark, [(1, 19, 0)], [(1, 9, 1), (1, 20, 2), (1, 29, 3)], -10, 10)
    assert got == {(0, 1), (0, 2), (0, 3)}


def test_negative_times_floor_correctly(spark):
    got = _pairs(spark, [(1, -5, 0)], [(1, -14, 1), (1, 4, 2), (1, -16, 3)], -10, 10)
    assert got == {(0, 1), (0, 2)}


def test_keys_partition_the_band(spark):
    got = _pairs(spark, [(1, 100, 0), (2, 100, 9)], [(1, 100, 1), (2, 105, 2)], -10, 10)
    assert got == {(0, 1), (9, 2)}


def test_equals_quadratic_ground_truth(spark):
    import itertools
    import random

    rng = random.Random(7)
    lrows = [(rng.randrange(3), rng.randrange(0, 1000), i) for i in range(60)]
    rrows = [(rng.randrange(3), rng.randrange(0, 1000), i) for i in range(60)]
    lo, hi = -37, 53
    got = _pairs(spark, lrows, rrows, lo, hi)
    want = {
        (l[2], r[2])
        for l, r in itertools.product(lrows, rrows)
        if l[0] == r[0] and lo <= r[1] - l[1] <= hi
    }
    assert got == want
