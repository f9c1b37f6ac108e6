"""Core TSDB operator tests — semantics mirrored from the reference's
storage suite (tests/timeseries_test.c, SURVEY §5) plus DuckDB oracle
cross-checks on the driver's events table."""

from __future__ import annotations

import pytest

from raft_c_spark.operators import tsdb
from raft_c_spark.sources.testdata import events_as_points
from tests.harness import assert_matches_oracle, df_rows

NS = "(epoch_ns(ts) - epoch_ns(ts) % 1000)"  # µs-truncated ns, oracle side
POINTS = (
    f"SELECT event_type AS series, {NS} AS timestamp, value FROM events"
)


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    df = events_as_points(spark, sf_dir)
    df.cache().count()
    return df


def test_scan_full(points, duck):
    assert_matches_oracle(
        tsdb.ts_scan(points),
        duck,
        f"SELECT * FROM ({POINTS}) ORDER BY timestamp",
        "scan",
    )


def test_scan_is_ordered(points):
    rows = tsdb.ts_scan(points, series="click").collect()
    ts = [r["timestamp"] for r in rows]
    assert ts == sorted(ts)
    assert all(r["series"] == "click" for r in rows)


def test_range_inclusive_bounds(points, duck):
    # pick real timestamps so inclusivity is observable
    # (tests/timeseries_test.c:270-308: end-start+1 rows)
    ts = sorted(r["timestamp"] for r in points.select("timestamp").collect())
    t0, t1 = ts[10], ts[200]
    df = tsdb.ts_range(points, t0, t1)
    all_ts = [r[1] for r in df_rows(df)]  # cols sorted: series,timestamp,value
    assert min(all_ts) == t0 and max(all_ts) == t1  # both bounds inclusive
    assert_matches_oracle(
        df,
        duck,
        f"SELECT * FROM ({POINTS}) WHERE timestamp BETWEEN {t0} AND {t1}",
        "range",
    )


def test_range_invalid_raises(points):
    with pytest.raises(tsdb.InvalidRangeError):
        tsdb.ts_range(points, 10, 5)


def test_find_exact_ns(points):
    row = points.limit(1).collect()[0]
    out = tsdb.ts_find(points, row["timestamp"], series=row["series"]).collect()
    assert len(out) >= 1
    assert all(r["timestamp"] == row["timestamp"] for r in out)


def test_where_chain(points, duck):
    df = tsdb.where_chain(points, [("value", ">", 12.2), ("value", "<", 16.2)])
    assert_matches_oracle(
        tsdb.ts_scan(df),
        duck,
        f"SELECT * FROM ({POINTS}) WHERE value > 12.2 AND value < 16.2",
        "where",
    )


def test_where_timestamp_key(points):
    ts = sorted(r["timestamp"] for r in points.select("timestamp").collect())
    mid = ts[len(ts) // 2]
    n = tsdb.where_chain(points, [("timestamp", ">=", mid)]).count()
    assert n == sum(1 for t in ts if t >= mid)


def test_min_max_record_semantics(points, duck):
    assert_matches_oracle(
        tsdb.ts_min(points),
        duck,
        f"""SELECT series, timestamp, value FROM (
              SELECT series, timestamp, value,
                     row_number() OVER (PARTITION BY series
                                        ORDER BY value, timestamp) rn
              FROM ({POINTS})) WHERE rn = 1""",
        "min",
    )
    assert_matches_oracle(
        tsdb.ts_max(points),
        duck,
        f"""SELECT series, timestamp, value FROM (
              SELECT series, timestamp, value,
                     row_number() OVER (PARTITION BY series
                                        ORDER BY value DESC, timestamp) rn
              FROM ({POINTS})) WHERE rn = 1""",
        "max",
    )


def test_latest_earliest(points, duck):
    assert_matches_oracle(
        tsdb.ts_latest(points),
        duck,
        f"""SELECT series, timestamp, value FROM (
              SELECT series, timestamp, value,
                     row_number() OVER (PARTITION BY series
                                        ORDER BY timestamp DESC, value DESC) rn
              FROM ({POINTS})) WHERE rn = 1""",
        "latest",
    )
    assert_matches_oracle(
        tsdb.ts_earliest(points),
        duck,
        f"""SELECT series, timestamp, value FROM (
              SELECT series, timestamp, value,
                     row_number() OVER (PARTITION BY series
                                        ORDER BY timestamp, value) rn
              FROM ({POINTS})) WHERE rn = 1""",
        "earliest",
    )


def test_avg(points, duck):
    assert_matches_oracle(
        tsdb.ts_avg(points),
        duck,
        f"SELECT series, avg(value) AS avg_value FROM ({POINTS}) GROUP BY series",
        "avg",
    )


def test_sample_by_reference_semantics(spark):
    """Hand-built fixture replicating ts_avg_sample edge cases
    (src/timeseries.c:1265-1308): boundary points dropped, label is
    bucket end, empty buckets skipped, tail bucket (end >= t1) dropped."""
    iv = 10  # interval 10 ns for readability
    rows = [
        ("s", 5, 1.0),  # bucket end 10
        ("s", 10, 100.0),  # boundary — in no bucket
        ("s", 11, 2.0),  # bucket end 20
        ("s", 19, 4.0),  # bucket end 20
        ("s", 21, 8.0),  # bucket end 30 — dropped when t1=25 (tail)
        # bucket 40..50 empty — skipped
        ("s", 55, 16.0),  # bucket end 60
    ]
    df = spark.createDataFrame(rows, "series string, timestamp long, value double")

    out = {r["bucket_ts"]: r["avg_value"] for r in tsdb.sample_by(df, iv).collect()}
    assert out == {10: 1.0, 20: 3.0, 30: 8.0, 60: 16.0}

    # with bounds: t0 normalized down, tail bucket end>=t1 dropped
    out2 = {
        r["bucket_ts"]: r["avg_value"]
        for r in tsdb.sample_by(df, iv, t0=5, t1=25).collect()
    }
    assert out2 == {10: 1.0, 20: 3.0}


def test_sample_by_oracle(points, duck):
    iv = 3_600_000_000_000  # 1 hour in ns
    assert_matches_oracle(
        tsdb.sample_by(points, iv),
        duck,
        f"""SELECT series,
                   timestamp - (timestamp % {iv}) + {iv} AS bucket_ts,
                   avg(value) AS avg_value
            FROM ({POINTS})
            WHERE timestamp % {iv} <> 0
            GROUP BY series, bucket_ts""",
        "sample_by",
    )


def test_limit(points):
    assert tsdb.ts_limit(tsdb.ts_scan(points), 17).count() == 17


def test_sample_by_sliding_hand_fixture(spark):
    """Hopping windows [w, w+length) half-open, label = window start,
    each point in length/slide windows."""
    rows = [
        ("s", 5, 1.0),   # windows starting at 0 and -10 (len 20, slide 10)
        ("s", 10, 3.0),  # windows 10 and 0 (half-open: 10 belongs to [10,30) and [0,20))
        ("s", 25, 5.0),  # windows 20 and 10
    ]
    df = spark.createDataFrame(rows, "series string, timestamp long, value double")
    out = {
        r["bucket_ts"]: (r["avg_value"], r["n_points"])
        for r in tsdb.sample_by_sliding(df, 10, 20).collect()
    }
    assert out == {
        -10: (1.0, 1),
        0: (2.0, 2),
        10: (4.0, 2),
        20: (5.0, 1),
    }


def test_sample_by_sliding_validation(spark):
    df = spark.createDataFrame(
        [("s", 1, 1.0)], "series string, timestamp long, value double"
    )
    with pytest.raises(ValueError):
        tsdb.sample_by_sliding(df, 0, 10)
    with pytest.raises(ValueError):
        tsdb.sample_by_sliding(df, 10, 25)


def test_sample_by_sliding_matches_tumbling_when_equal(points):
    """slide == length degenerates to tumbling windows (modulo the
    reference's boundary quirk and end-vs-start labels): same point
    partition, shifted labels."""
    iv = 86_400_000_000_000
    rows = tsdb.sample_by_sliding(points, iv, iv).collect()
    # independent recount: every point lands in exactly one window
    assert sum(r["n_points"] for r in rows) == points.count()


def test_sample_by_multi_aggregates(spark):
    rows = [
        ("s", 5, 1.0),
        ("s", 11, 2.0),
        ("s", 19, 4.0),
        ("s", 55, 16.0),
    ]
    df = spark.createDataFrame(rows, "series string, timestamp long, value double")
    out = {
        r["bucket_ts"]: (r["min_value"], r["max_value"], r["avg_value"], r["count_value"])
        for r in tsdb.sample_by(df, 10, fns=("min", "max", "avg", "count")).collect()
    }
    assert out == {
        10: (1.0, 1.0, 1.0, 1),
        20: (2.0, 4.0, 3.0, 2),
        60: (16.0, 16.0, 16.0, 1),
    }


def test_sample_by_rejects_unknown_fn(spark):
    df = spark.createDataFrame([("s", 1, 1.0)], "series string, timestamp long, value double")
    with pytest.raises(ValueError):
        tsdb.sample_by(df, 10, fns=("median",))


def test_sample_by_fill_prev_null_const(spark):
    """Gap-fill semantics on a hand-built frame: buckets 10 and 40
    have points, 20 and 30 are gaps -> grid spans 10..40, prev-fill
    carries 1.0 through the gaps, null-fill leaves NULLs, const-fill
    plants the constant; `filled` marks exactly the synthesized rows."""
    from raft_c_spark.operators.tsdb import sample_by_fill

    rows = [("s", 5, 1.0), ("s", 35, 7.0)]
    df = spark.createDataFrame(
        rows, "series string, timestamp long, value double"
    )
    prev = {
        (r["bucket_ts"]): (r["avg_value"], r["filled"])
        for r in sample_by_fill(df, 10, fill="prev").collect()
    }
    assert prev == {
        10: (1.0, False),
        20: (1.0, True),
        30: (1.0, True),
        40: (7.0, False),
    }
    nul = {
        r["bucket_ts"]: (r["avg_value"], r["filled"])
        for r in sample_by_fill(df, 10, fill="null").collect()
    }
    assert nul[20] == (None, True) and nul[40] == (7.0, False)
    const = {
        r["bucket_ts"]: r["avg_value"]
        for r in sample_by_fill(df, 10, fill=0.5).collect()
    }
    assert const == {10: 1.0, 20: 0.5, 30: 0.5, 40: 7.0}


def test_sample_by_fill_per_series_grid(spark):
    """The grid is per-series (each series' own min..max), so one
    series' range never bleeds empty rows into another's."""
    from raft_c_spark.operators.tsdb import sample_by_fill

    rows = [("a", 5, 1.0), ("a", 25, 3.0), ("b", 95, 9.0)]
    df = spark.createDataFrame(
        rows, "series string, timestamp long, value double"
    )
    got = {
        (r["series"], r["bucket_ts"])
        for r in sample_by_fill(df, 10, fill="prev").collect()
    }
    assert got == {("a", 10), ("a", 20), ("a", 30), ("b", 100)}


def test_sample_by_fill_grid_guard(spark):
    """A pathological interval/span combination must fail loudly at
    the guard (named series in the message), not OOM an executor on a
    multi-billion-element sequence array."""
    import pytest

    from raft_c_spark.operators.tsdb import sample_by_fill

    df = spark.createDataFrame(
        [("s", 5, 1.0), ("s", 40_000_000_005, 7.0)],
        "series string, timestamp long, value double",
    )
    with pytest.raises(Exception, match="grid exceeds"):
        sample_by_fill(df, 10, fill="prev").collect()
