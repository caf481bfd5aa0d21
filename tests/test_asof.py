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
