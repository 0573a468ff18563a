"""Boundary semantics for the timeseries family.

The oracle gate proves cross-engine equality on fixtures; these pin the
EDGE semantics the fixtures may never hit: the session gap comparison
is strict (>), interval overlap is closed ([s,e] touching counts), and
chunking never changes overlap results.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from motorway_spark.queries.timeseries import SESSION_GAP_US

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _sessionize(spark, rows):
    """Run the sessionize logic on synthetic (user_id, event_id, ts_us)."""
    from pyspark.sql import Window

    ev = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts_us bigint")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = F.when(
        F.lag("ts_us").over(w).isNull()
        | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US),
        1,
    ).otherwise(0)
    sess_no = F.sum(new_sess).over(
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ev.withColumn("session_no", sess_no).collect()
    return {r["event_id"]: r["session_no"] for r in out}


def test_session_gap_is_strict(spark):
    """A gap of EXACTLY 30 min stays in the same session; 30 min + 1 µs
    starts a new one (gap comparison is strictly greater-than)."""
    t0 = 1_700_000_000_000_000
    rows = [
        (1, 1, t0),
        (1, 2, t0 + SESSION_GAP_US),          # exactly 30 min later
        (1, 3, t0 + 2 * SESSION_GAP_US + 1),  # 30 min + 1 µs after event 2
    ]
    sess = _sessionize(spark, rows)
    assert sess[1] == sess[2] == 1
    assert sess[3] == 2


def test_session_numbering_per_user(spark):
    """Sessions number independently per user (partition isolation)."""
    t0 = 1_700_000_000_000_000
    rows = [
        (1, 1, t0),
        (2, 2, t0 + 5),
        (2, 3, t0 + SESSION_GAP_US + 10),  # new session for user 2 only
    ]
    sess = _sessionize(spark, rows)
    assert sess[1] == 1 and sess[2] == 1 and sess[3] == 2


def test_interval_overlap_sweep_line_semantics(spark):
    """The sweep-line aggregates (r5: replaced the pair-materializing
    chunk join — the answer itself is quadratic in per-day density, so
    only the AGGREGATES scale) must match hand-counted pair semantics:
    intervals touching at a single microsecond DO overlap (closed
    bounds, zero contribution to the sum), and multi-way overlaps count
    every unordered pair once."""
    from motorway_spark.queries.timeseries import HOUR_US, _overlap_stats

    day = "2024-01-01"
    # a: [10:00, 11:30], b: [11:30, 12:00]  -> touch at 11:30 (overlap 0 µs)
    # c: [10:30, 12:30] overlaps a by 1h and b by 30min
    h10 = 1_704_103_200_000_000  # 2024-01-01T10:00:00Z in µs
    iv = spark.createDataFrame(
        [
            (day, 1, h10, h10 + int(1.5 * HOUR_US)),
            (day, 2, h10 + int(1.5 * HOUR_US), h10 + 2 * HOUR_US),
            (day, 3, h10 + HOUR_US // 2, h10 + int(2.5 * HOUR_US)),
        ],
        "day string, user_id bigint, s_us bigint, e_us bigint",
    )
    got = {r["day"]: (r["n_pairs"], r["sum_overlap_us"]) for r in _overlap_stats(iv).collect()}
    # pairs: (1,2) touch = 0µs, (1,3) = 1h, (2,3) = 30min
    assert got == {day: (3, HOUR_US + HOUR_US // 2)}

    # a day whose intervals never overlap must NOT emit a row (the
    # oracle's inner pair join has no row for it either)
    iv2 = spark.createDataFrame(
        [(day, 1, h10, h10 + 10), (day, 2, h10 + 20, h10 + 30)],
        "day string, user_id bigint, s_us bigint, e_us bigint",
    )
    assert _overlap_stats(iv2).count() == 0


def test_moving_median_lower_middle_rule(spark, tmp_path):
    """r5: win_moving_median's even-frame rule is the LOWER middle of the
    sorted frame (an actual input value, never an interpolation) and the
    frame is trailing ROWS 4 PRECEDING..CURRENT — pinned on one crafted
    user stream where every frame's median is hand-computable."""
    import datetime

    from motorway_spark.queries import QUERIES

    t0 = datetime.datetime(2024, 1, 1)
    vals = [5.0, 1.0, 4.0, 2.0, 3.0, 9.0]
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {
        r["event_id"]: r
        for r in QUERIES["win_moving_median"](spark, str(tmp_path)).collect()
    }
    # frames: [5] [5,1] [5,1,4] [5,1,4,2] [5,1,4,2,3] [1,4,2,3,9]
    expected = {0: 5.0, 1: 1.0, 2: 4.0, 3: 2.0, 4: 3.0, 5: 3.0}
    for eid, want in expected.items():
        assert out[eid]["moving_median"] == want, eid
    assert out[5]["frame_n"] == 5 and out[1]["frame_n"] == 2


def test_cusum_flags_rate_shift_and_stays_quiet_before(spark, tmp_path):
    """r5: events_changepoint_cusum on a crafted 2,2,2,2,20,20,20,20
    hourly series — the scaled CUSUM is hand-computable (y = 16x - 264,
    threshold 2*total = 176): zero through the quiet phase, then
    56/112/168/224 after the shift, crossing the threshold exactly at
    the final hour."""
    import datetime

    from motorway_spark.queries import QUERIES

    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h, n in enumerate([2, 2, 2, 2, 20, 20, 20, 20]):
        for i in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(hours=h, minutes=i), 1, "view", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = sorted(
        QUERIES["events_changepoint_cusum"](spark, str(tmp_path)).collect(),
        key=lambda r: r["hour"],
    )
    assert [r["x"] for r in out] == [2, 2, 2, 2, 20, 20, 20, 20]
    assert [r["cusum_scaled"] for r in out] == [0, 0, 0, 0, 56, 112, 168, 224]
    assert [r["changepoint"] for r in out] == [False] * 7 + [True]
