"""Planted-fixture tests for event-sequence analytics
(operators/events.py): strict-order funnel and OHLC resampling."""

from __future__ import annotations

import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
    funnel_stages,
    ohlc_resample,
)

# (user, ts, type)
FUNNEL_EVENTS = [
    # u1: full strict-order funnel
    (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
    # u2: clicked BEFORE first view -> stops at view
    (2, 100, "click"), (2, 200, "view"),
    # u3: view then click, purchase missing
    (3, 10, "view"), (3, 20, "click"),
    # u4: purchase only -> reaches nothing
    (4, 50, "purchase"),
    # u5: view@100, click@100 (same instant, NOT strictly after) -> view only
    (5, 100, "view"), (5, 100, "click"),
    # u6: two views; click after the FIRST view counts
    (6, 10, "view"), (6, 500, "view"), (6, 20, "click"), (6, 30, "purchase"),
]


@pytest.fixture()
def funnel_df(spark):
    return spark.createDataFrame(
        FUNNEL_EVENTS, "user long, t long, etype string"
    )


def test_funnel_strict_order_semantics(funnel_df):
    got = {
        r.stage_name: r.n_users
        for r in funnel_stages(
            funnel_df, "user", "t", "etype", ["view", "click", "purchase"]
        ).collect()
    }
    # view: u1,u2,u3,u5,u6; click strictly after first view: u1,u3,u6;
    # purchase strictly after that click: u1,u6
    assert got == {"view": 5, "click": 3, "purchase": 2}


def test_funnel_stage_indices_and_monotonicity(funnel_df):
    rows = sorted(
        funnel_stages(
            funnel_df, "user", "t", "etype", ["view", "click", "purchase"]
        ).collect(),
        key=lambda r: r.stage,
    )
    assert [r.stage for r in rows] == [1, 2, 3]
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)  # funnels only narrow


OHLC_EVENTS = [
    # bucket 0 (ts 0..99): open=5.0 (earliest), close=1.0 (latest),
    # high=9.0, low=1.0; tie at ts 10 broken by id
    (1, 10, 5.0), (2, 10, 9.0), (3, 50, 2.5), (4, 90, 1.0),
    # bucket 2 (ts 200..299): single event
    (5, 250, 7.0),
]


@pytest.fixture()
def ohlc_df(spark):
    return spark.createDataFrame(OHLC_EVENTS, "event_id long, t long, value double")


def test_ohlc_buckets_and_anchors(ohlc_df):
    got = {r.bucket: r for r in ohlc_resample(ohlc_df, "t", "event_id", "value", 100).collect()}
    assert set(got) == {0, 2}
    b0 = got[0]
    assert b0.n_events == 4
    assert b0.open_v == 5.0  # ts tie at 10: event_id 1 < 2
    assert b0.high_v == 9.0 and b0.low_v == 1.0
    assert b0.close_v == 1.0
    assert b0.volume == pytest.approx(17.5)
    b2 = got[2]
    assert (b2.open_v, b2.high_v, b2.low_v, b2.close_v) == (7.0, 7.0, 7.0, 7.0)


def test_ohlc_repartition_invariant(ohlc_df):
    a = sorted(map(tuple, ohlc_resample(ohlc_df, "t", "event_id", "value", 100).collect()))
    b = sorted(
        map(
            tuple,
            ohlc_resample(
                ohlc_df.repartition(7), "t", "event_id", "value", 100
            ).collect(),
        )
    )
    assert a == b


def test_retention_cohorts_triangle(spark):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
        retention_cohorts,
    )

    events = [
        # u1 first in period 0, active 0,1,2 ; u2 first in 0, active 0,2
        (1, 5), (1, 15), (1, 25), (2, 7), (2, 22),
        # u3 first in period 1, active 1 only; duplicate events collapse
        (3, 12), (3, 13),
    ]
    df = spark.createDataFrame(events, "user long, t long")
    got = {
        (r.cohort, r.offset): r.n_users
        for r in retention_cohorts(df, "user", "t", 10).collect()
    }
    assert got == {
        (0, 0): 2,  # u1, u2
        (0, 1): 1,  # u1
        (0, 2): 2,  # u1, u2
        (1, 0): 1,  # u3
    }


class TestRollingAvg:
    def test_time_range_frame_and_tie_peers(self, spark):
        import pyspark.sql.functions as F

        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
            rolling_avg,
        )

        H = 3_600_000_000
        rows = [
            (1, "a", 0, 10.0),
            (2, "a", H // 2, 20.0),      # within 1h of id 1
            (3, "a", H * 2, 40.0),       # alone (1h window passed)
            (4, "a", H * 2, 60.0),       # same instant as id 3 -> peers
            (5, "b", 0, 100.0),          # other key isolated
        ]
        df = spark.createDataFrame(rows, "event_id long, event_type string, t long, value double")
        out = {
            r.id: r.avg_trailing
            for r in rolling_avg(
                df, F.col("t"), "event_type", "value", "event_id", window_us=H
            ).collect()
        }
        assert out[1] == 10.0
        assert out[2] == 15.0
        # RANGE ... CURRENT ROW includes same-instant peers on BOTH rows
        assert out[3] == 50.0 and out[4] == 50.0
        assert out[5] == 100.0

    def test_repartition_invariance(self, spark):
        import pyspark.sql.functions as F

        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
            rolling_avg,
        )

        rows = [(i, f"k{i % 3}", (i * 7919) % 100_000_000, float(i % 13) / 7) for i in range(200)]
        df = spark.createDataFrame(rows, "event_id long, event_type string, t long, value double")
        a = sorted(map(tuple, rolling_avg(df, F.col("t"), "event_type", "value", "event_id").collect()))
        b = sorted(map(tuple, rolling_avg(df.repartition(17), F.col("t"), "event_type", "value", "event_id").collect()))
        assert a == b


def test_rolling_avg_empty_input(spark):
    import pyspark.sql.functions as F

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
        rolling_avg,
    )

    df = spark.createDataFrame([], "event_id long, event_type string, t long, value double")
    assert rolling_avg(df, F.col("t"), "event_type", "value", "event_id").count() == 0


class TestGapFillLocf:
    """gap_fill_locf — dense spine + forward fill."""

    def test_planted_gaps_fill_with_last_close(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import gap_fill_locf

        rows = [
            # key a: buckets 0 and 3 observed; 1, 2 are gaps
            ("a", 1, 5, 10.0),   # bucket 0
            ("a", 2, 9, 20.0),   # bucket 0 (later ts -> close)
            ("a", 3, 35, 30.0),  # bucket 3
            # key b: single bucket, no gaps
            ("b", 4, 12, 7.0),   # bucket 1
        ]
        df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
        out = {
            (r["key"], r["bucket"]): (r["v"], r["filled"], r["n_events"])
            for r in gap_fill_locf(df, "k", "t", "eid", "v", bucket_us=10).collect()
        }
        assert out == {
            ("a", 0): (20.0, False, 2),  # close of bucket 0 is the later ts
            ("a", 1): (20.0, True, 0),   # gap carries forward
            ("a", 2): (20.0, True, 0),
            ("a", 3): (30.0, False, 1),
            ("b", 1): (7.0, False, 1),
        }

    def test_close_anchors_on_ts_then_id(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import gap_fill_locf

        rows = [  # same bucket, same ts: higher id wins the close
            ("a", 1, 5, 1.0),
            ("a", 2, 5, 2.0),
        ]
        df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
        [r] = gap_fill_locf(df, "k", "t", "eid", "v", bucket_us=10).collect()
        assert (r["v"], r["filled"], r["n_events"]) == (2.0, False, 2)

    def test_spine_is_per_key_not_global(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import gap_fill_locf

        rows = [
            ("a", 1, 0, 1.0),    # key a spans buckets 0..0
            ("b", 2, 100, 2.0),  # key b spans buckets 10..10
        ]
        df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
        out = gap_fill_locf(df, "k", "t", "eid", "v", bucket_us=10).collect()
        # no cross-key spine: 2 rows total, not 11 per key
        assert len(out) == 2
        assert all(not r["filled"] for r in out)


class TestGapFillInterpolate:
    def test_interior_gaps_take_straight_line(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
            gap_fill_interpolate,
        )

        rows = [
            ("a", 1, 5, 10.0),   # bucket 0, close 10
            ("a", 2, 45, 40.0),  # bucket 4, close 40 -> slope 7.5/bucket
        ]
        df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
        out = {
            r["bucket"]: (r["v"], r["filled"])
            for r in gap_fill_interpolate(df, "k", "t", "eid", "v", bucket_us=10).collect()
        }
        assert out == {
            0: (10.0, False),
            1: (17.5, True),
            2: (25.0, True),
            3: (32.5, True),
            4: (40.0, False),
        }

    def test_observed_buckets_keep_exact_close(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
            gap_fill_interpolate,
            gap_fill_locf,
        )

        rows = [
            ("a", 1, 5, 3.25),
            ("a", 2, 9, 7.75),   # same bucket: close = later ts
            ("a", 3, 25, 1.5),
        ]
        df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
        interp = {
            r["bucket"]: r["v"]
            for r in gap_fill_interpolate(df, "k", "t", "eid", "v", bucket_us=10).collect()
            if not r["filled"]
        }
        locf = {
            r["bucket"]: r["v"]
            for r in gap_fill_locf(df, "k", "t", "eid", "v", bucket_us=10).collect()
            if not r["filled"]
        }
        assert interp == locf == {0: 7.75, 2: 1.5}


class TestTimeWeightedAvg:
    def test_twa_weights_by_duration_not_sample_count(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
            time_weighted_avg,
        )

        # value 10 holds for 9us, then a burst of three 0-valued samples
        # holds 1us total: arithmetic mean = 2.5, TWA = (10*9 + 0*1)/10 = 9
        rows = [
            ("a", 1, 0, 10.0),
            ("a", 2, 9, 0.0),
            ("a", 3, 9, 0.0),   # same-instant burst: zero duration
            ("a", 4, 10, 0.0),  # final point: no duration
        ]
        df = spark.createDataFrame(rows, "k string, eid long, t long, v double")
        [r] = time_weighted_avg(df, "k", "t", "eid", "v").collect()
        assert r["twa"] == 9.0
        assert (r["t_first"], r["t_last"], r["n_points"]) == (0, 10, 4)

    def test_single_point_falls_back_to_value(self, spark):
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
            time_weighted_avg,
        )

        df = spark.createDataFrame([("a", 1, 5, 3.5)], "k string, eid long, t long, v double")
        [r] = time_weighted_avg(df, "k", "t", "eid", "v").collect()
        assert (r["twa"], r["n_points"]) == (3.5, 1)

    def test_cadence_invariance(self, spark):
        """Adding redundant samples of the SAME value must not move the TWA."""
        from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.events import (
            time_weighted_avg,
        )

        sparse = [("a", 1, 0, 4.0), ("a", 2, 10, 8.0), ("a", 3, 20, 8.0)]
        dense = sparse + [("a", 10, 2, 4.0), ("a", 11, 5, 4.0), ("a", 12, 15, 8.0)]
        d1 = spark.createDataFrame(sparse, "k string, eid long, t long, v double")
        d2 = spark.createDataFrame(dense, "k string, eid long, t long, v double")
        [r1] = time_weighted_avg(d1, "k", "t", "eid", "v").collect()
        [r2] = time_weighted_avg(d2, "k", "t", "eid", "v").collect()
        assert r1["twa"] == r2["twa"] == 6.0  # 4 for half the span, 8 for half
