"""Driver-facing TSDB parity queries (SURVEY.md §2.3-§2.7).

Each entry pairs a Spark plan (on the canonical points frame derived
from the ``events`` table) with the equivalent DuckDB oracle SQL over
the same parquet. Names and aliases match on both sides — the driver
sorts columns by name before value-hashing.

Timestamps: epoch-ns longs, µs-truncated on both sides (DuckDB reads
parquet TIMESTAMP(NANOS) at µs resolution; the Spark adapter truncates
identically — see sources/testdata.events_as_points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_c_spark.operators import tsdb
from raft_c_spark.functions.exact import exact_avg, sql_avg
from raft_c_spark.sources.testdata import events_as_points

# Fixed window constants (events span 2024-01-01 .. 2024-01-31)
T0 = 1_704_844_800_000_000_000  # 2024-01-10T00:00:00Z in ns
T1 = 1_705_708_800_000_000_000  # 2024-01-20T00:00:00Z in ns
HOUR_NS = 3_600_000_000_000
DAY_NS = 86_400_000_000_000

#: DuckDB view of the canonical points frame (events → points).
POINTS_SQL = (
    "SELECT event_type AS series, epoch_ns(ts) AS timestamp, value FROM events"
)


def _points(
    spark: SparkSession, sf_dir: str, t0: int | None = None, t1: int | None = None
) -> DataFrame:
    return events_as_points(spark, sf_dir, t0, t1)


# --- scans / filters (§2.3) -------------------------------------------------


def q_range_scan(spark, sf_dir):
    """BETWEEN range scan, inclusive bounds (ts_range,
    src/timeseries.c:905-979). Bounds are also applied to the raw
    physical column at load (events_as_points(t0, t1)) so the scan
    gets PushedFilters — row-group pruning at scale."""
    return tsdb.ts_range(_points(spark, sf_dir, T0, T1), T0, T1)


def q_point_lookup(spark, sf_dir):
    """Exact-ns point lookup (ts_find, src/timeseries.c:729-780) at a
    data-derived timestamp (the earliest 'click' point)."""
    pts = _points(spark, sf_dir)
    t = (
        pts.filter(F.col("series") == "click")
        .agg(F.min("timestamp"))
        .collect()[0][0]
    )
    return tsdb.ts_find(pts, t, series="click")


def q_where_chain(spark, sf_dir):
    """AND-chained value+timestamp predicates (parse_where,
    src/statement_parse.c:649-679; executed surface per SURVEY §2.3)."""
    pts = _points(spark, sf_dir)
    return tsdb.ts_scan(
        tsdb.where_chain(
            pts,
            [("value", ">", 10.0), ("value", "<", 100.0), ("timestamp", ">=", T0)],
        )
    )


# --- aggregates (§2.5) ------------------------------------------------------


def q_min(spark, sf_dir):
    return tsdb.ts_min(tsdb.ts_range(_points(spark, sf_dir, T0, T1), T0, T1))


def q_max(spark, sf_dir):
    return tsdb.ts_max(tsdb.ts_range(_points(spark, sf_dir, T0, T1), T0, T1))


def q_latest(spark, sf_dir):
    """Range-respecting latest (documented divergence from the
    reference executor's range-ignoring ts_last shortcut,
    src/statement_execute.c:261-271)."""
    return tsdb.ts_latest(tsdb.ts_range(_points(spark, sf_dir, T0, T1), T0, T1))


def q_earliest(spark, sf_dir):
    return tsdb.ts_earliest(tsdb.ts_range(_points(spark, sf_dir, T0, T1), T0, T1))


def q_avg(spark, sf_dir):
    """avg(value) per series — exact-decimal sum for engine-independent
    determinism."""
    pts = _points(spark, sf_dir)
    return (
        pts.groupBy("series")
        .agg(exact_avg("value").alias("avg_value"))
        .orderBy("series")
    )


# --- SAMPLE BY (§2.6) -------------------------------------------------------


def _sample_exact(df, interval_ns, t0=None, t1=None):
    """The REAL operator, not a replica (reviewer r8: this was a
    line-for-line re-implementation of tsdb.sample_by, so the parity
    suite certified a copy that could silently drift — it already
    lacked the operator's inverted-range guard). The driver queries
    must exercise the operator the engine ships."""
    from raft_c_spark.operators import tsdb

    return tsdb.sample_by(df, interval_ns, t0=t0, t1=t1)


def q_sample_1h(spark, sf_dir):
    # T0 is hour-aligned, so sample_by's down-normalization of t0
    # cannot reach below the pushed load bound
    return _sample_exact(_points(spark, sf_dir, T0, T1), HOUR_NS, t0=T0, t1=T1)


def q_sample_1d(spark, sf_dir):
    return _sample_exact(_points(spark, sf_dir), DAY_NS)


# --- order/limit (§2.7) -----------------------------------------------------


def q_latest_k(spark, sf_dir):
    """LIMIT over the newest records (deterministic tie-breaks) —
    the reference parses LIMIT but never applies it
    (src/statement_parse.c:1116-1128); implemented per SURVEY §2.7."""
    pts = _points(spark, sf_dir)
    return pts.orderBy(
        F.desc("timestamp"), F.desc("value"), F.asc("series")
    ).limit(100)


def _sample_sql(interval_ns: int, t0: int | None, t1: int | None) -> str:
    conds = [f"timestamp % {interval_ns} <> 0"]
    if t0 is not None:
        t0n = t0 - t0 % interval_ns
        conds.append(f"timestamp >= {t0n}")
    if t1 is not None:
        conds.append(f"timestamp <= {t1}")
    having = f"HAVING bucket_ts < {t1}" if t1 is not None else ""
    return f"""
        SELECT series,
               timestamp - (timestamp % {interval_ns}) + {interval_ns} AS bucket_ts,
               {sql_avg('value')} AS avg_value
        FROM ({POINTS_SQL})
        WHERE {' AND '.join(conds)}
        GROUP BY series, bucket_ts {having}
    """


def q_sample_sliding(spark, sf_dir):
    """Hopping-window avg (6h window, 1h slide) — extension beyond the
    reference's tumbling-only SAMPLE BY; see
    tsdb.sample_by_sliding for semantics and the 100 TB plan shape."""
    return tsdb.sample_by_sliding(
        _points(spark, sf_dir, T0, T1).filter(
            (F.col("timestamp") >= T0) & (F.col("timestamp") <= T1)
        ),
        HOUR_NS,
        6 * HOUR_NS,
    )


def _sliding_sql(slide_ns: int, length_ns: int, where: str) -> str:
    k = length_ns // slide_ns
    return f"""
        SELECT series,
               (timestamp - timestamp % {slide_ns}) - i * {slide_ns}
                   AS bucket_ts,
               {sql_avg('value')} AS avg_value,
               COUNT(*) AS n_points
        FROM ({POINTS_SQL}) CROSS JOIN generate_series(0, {k - 1}) AS g(i)
        {where}
        GROUP BY series, bucket_ts
    """


def q_delta_rate(spark, sf_dir):
    """Per-bucket delta / per-second rate (1h tumbling buckets) —
    PromQL delta()/rate()-style derivative extension; see
    tsdb.delta_rate for the struct-min/max determinism contract and
    the one-aggregate 100 TB plan shape."""
    return tsdb.delta_rate(
        _points(spark, sf_dir, T0, T1).filter(
            (F.col("timestamp") >= T0) & (F.col("timestamp") <= T1)
        ),
        HOUR_NS,
    )


def _delta_rate_sql(interval_ns: int, where: str) -> str:
    # struct min/max mirror the operator's lexicographic
    # (timestamp, value) first/last tie-break; the rate expression
    # replicates the operator's exact IEEE op order
    # ((delta * 1e9) / span_ns) before the 8-decimal round; the
    # double-% is floor-mod (DuckDB % follows the dividend's sign,
    # like Spark's % — the operator buckets with pmod).
    return f"""
        WITH b AS (
            SELECT series,
                   timestamp - (((timestamp % {interval_ns})
                                 + {interval_ns}) % {interval_ns})
                       AS bucket_ts,
                   min(struct_pack(t := timestamp, v := value)) AS first_p,
                   max(struct_pack(t := timestamp, v := value)) AS last_p,
                   COUNT(*) AS n_points
            FROM ({POINTS_SQL}) {where}
            GROUP BY series, bucket_ts
        )
        SELECT series, bucket_ts, n_points,
               round(last_p.v - first_p.v, 8) AS delta,
               CASE WHEN last_p.t - first_p.t > 0 THEN
                   round((last_p.v - first_p.v)
                         * CAST(1000000000.0 AS DOUBLE)
                         / (last_p.t - first_p.t), 8)
               END AS rate_per_s
        FROM b
    """


def q_ts_lttb(spark, sf_dir):
    """LTTB visualization downsampling (6h buckets over the fixed
    window) — one shape-preserving point per series per bucket; see
    tsdb.lttb_downsample for the exact-anchor deterministic variant
    and the bucket-sized-window scale shape."""
    return tsdb.lttb_downsample(
        _points(spark, sf_dir, T0, T1).filter(
            (F.col("timestamp") >= T0) & (F.col("timestamp") <= T1)
        ),
        6 * HOUR_NS,
    )


def _lttb_sql(interval_ns: int, where: str) -> str:
    # replays the operator exactly: exact-long anchor differences cast
    # to double, the fixed IEEE op-order doubled-triangle-area, the
    # 6-decimal round, the (area desc, ts asc, value asc) tie-break,
    # and the forced first/last points on the series' boundary buckets
    return f"""
        WITH p AS (
            SELECT series,
                   timestamp - (((timestamp % {interval_ns})
                                 + {interval_ns}) % {interval_ns})
                       AS bucket_ts,
                   timestamp, value
            FROM ({POINTS_SQL}) {where}
        ),
        b AS (
            SELECT series, bucket_ts,
                   min(struct_pack(t := timestamp, v := value)) AS first_pt,
                   max(struct_pack(t := timestamp, v := value)) AS last_pt
            FROM p GROUP BY series, bucket_ts
        ),
        a AS (
            SELECT series, bucket_ts, first_pt, last_pt,
                   lag(last_pt) OVER (PARTITION BY series
                                      ORDER BY bucket_ts) AS prev_pt,
                   lead(first_pt) OVER (PARTITION BY series
                                        ORDER BY bucket_ts) AS next_pt
            FROM b
        ),
        c AS (
            SELECT p.series, p.bucket_ts, p.timestamp, p.value,
                   a.first_pt, a.last_pt, a.prev_pt, a.next_pt,
                   round(abs(
                       CAST(a.prev_pt.t - a.next_pt.t AS DOUBLE)
                           * (p.value - a.prev_pt.v)
                       - CAST(a.prev_pt.t - p.timestamp AS DOUBLE)
                           * (a.next_pt.v - a.prev_pt.v)), 6) AS area2
            FROM p JOIN a USING (series, bucket_ts)
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY series, bucket_ts
                ORDER BY area2 DESC, timestamp ASC, value ASC) AS rn
            FROM c
        )
        SELECT series, bucket_ts,
               CASE WHEN prev_pt IS NULL THEN first_pt.t
                    WHEN next_pt IS NULL THEN last_pt.t
                    ELSE timestamp END AS timestamp,
               CASE WHEN prev_pt IS NULL THEN first_pt.v
                    WHEN next_pt IS NULL THEN last_pt.v
                    ELSE value END AS value
        FROM r WHERE rn = 1
        ORDER BY series, bucket_ts
    """


def _record_sql(order: str, where: str = "") -> str:
    return f"""
        SELECT series, timestamp, value FROM (
            SELECT series, timestamp, value,
                   row_number() OVER (PARTITION BY series ORDER BY {order}) rn
            FROM ({POINTS_SQL}) {where}
        ) WHERE rn = 1
    """


_RANGE = f"WHERE timestamp BETWEEN {T0} AND {T1}"

QUERIES = {
    "ts_range_scan": q_range_scan,
    "ts_point_lookup": q_point_lookup,
    "ts_where_chain": q_where_chain,
    "ts_min": q_min,
    "ts_max": q_max,
    "ts_latest": q_latest,
    "ts_earliest": q_earliest,
    "ts_avg": q_avg,
    "ts_sample_1h": q_sample_1h,
    "ts_sample_1d": q_sample_1d,
    "ts_sample_sliding": q_sample_sliding,
    "ts_latest_k": q_latest_k,
    "ts_delta_rate": q_delta_rate,
    "ts_lttb": q_ts_lttb,
}

ORACLES = {
    "ts_range_scan": f"SELECT * FROM ({POINTS_SQL}) {_RANGE}",
    "ts_point_lookup": f"""
        SELECT series, timestamp, value FROM ({POINTS_SQL})
        WHERE series = 'click'
          AND timestamp = (SELECT min(timestamp) FROM ({POINTS_SQL})
                           WHERE series = 'click')
    """,
    "ts_where_chain": f"""
        SELECT * FROM ({POINTS_SQL})
        WHERE value > 10.0 AND value < 100.0 AND timestamp >= {T0}
    """,
    "ts_min": _record_sql("value, timestamp", _RANGE),
    "ts_max": _record_sql("value DESC, timestamp", _RANGE),
    "ts_latest": _record_sql("timestamp DESC, value DESC", _RANGE),
    "ts_earliest": _record_sql("timestamp, value", _RANGE),
    "ts_avg": f"""
        SELECT series, {sql_avg('value')} AS avg_value
        FROM ({POINTS_SQL}) GROUP BY series
    """,
    "ts_sample_1h": _sample_sql(HOUR_NS, T0, T1),
    "ts_sample_1d": _sample_sql(DAY_NS, None, None),
    "ts_sample_sliding": _sliding_sql(HOUR_NS, 6 * HOUR_NS, _RANGE),
    "ts_latest_k": f"""
        SELECT series, timestamp, value FROM ({POINTS_SQL})
        ORDER BY timestamp DESC, value DESC, series ASC LIMIT 100
    """,
    "ts_delta_rate": _delta_rate_sql(HOUR_NS, _RANGE),
    "ts_lttb": _lttb_sql(6 * HOUR_NS, _RANGE),
}
