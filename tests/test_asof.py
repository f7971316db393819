"""As-of join + tumbling window: hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

from lsh_spark.operators import asof


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(12)), (3, "u2", _ts(9)), (4, "u3", _ts(9))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(9), 100.0), ("u1", _ts(11), 200.0), ("u2", _ts(9), 50.0)],
        "user_id string, ts timestamp, value double")
    got = {r["event_id"]: (r["ts_asof"], r["value_asof"])
           for r in asof.asof_join(left, right, on="user_id",
                                   value_cols=("value",)).collect()}
    assert got[1] == (_ts(9), 100.0)       # latest right at/before 10:00
    assert got[2] == (_ts(11), 200.0)      # picks the newer one
    assert got[3] == (_ts(9), 50.0)        # exactly simultaneous → visible
    assert got[4] == (None, None)          # no right row for u3


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.createDataFrame([(i, "u", _ts(10, i)) for i in range(20)],
                                 "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(10, 10), 1.0)],
                                  "user_id string, ts timestamp, value double")
    out = asof.asof_join(left, right, on="user_id", value_cols=("value",))
    assert out.count() == 20
    matched = out.filter("value_asof IS NOT NULL").count()
    assert matched == 10  # events at 10:10 and later


def test_tumbling_window_agg(spark):
    ev = spark.createDataFrame(
        [(1, _ts(10, 5), "a", 1.0), (2, _ts(10, 55), "a", 2.0),
         (3, _ts(11, 1), "a", 4.0), (4, _ts(10, 30), "b", 8.0)],
        "event_id long, ts timestamp, event_type string, value double")
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in asof.tumbling_window_agg(ev).collect()}
    assert got[(_ts(10), "a")] == (2, 3.0)
    assert got[(_ts(11), "a")] == (1, 4.0)
    assert got[(_ts(10), "b")] == (1, 8.0)
