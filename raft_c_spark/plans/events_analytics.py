"""Driver-facing analytics over the ``events`` stream table: per-group
top-k, sessionization, running aggregates, as-of join, pivoted
profiles — the window-function capability layer (SURVEY §2.7 notes the
reference has none; Spark provides it natively, and the DuckDB oracle
replicates each window spec exactly).

Determinism: every window order includes event_id as a tiebreak
(timestamps could collide), so Spark and DuckDB evaluate identical
orders; money-free doubles go through the exact-decimal pattern.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_c_spark.functions.exact import dec, sql_dec
from raft_c_spark.operators.window import (
    asof_join,
    running_agg,
    sessionize,
    topk_per_group,
)
from raft_c_spark.sources.testdata import _ts_ns, load_table

GAP_NS = 1_800_000_000_000  # 30 min session gap


def _events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # µs-precision timestamp column → canonical epoch-ns long
        _ts_ns().alias("timestamp"),
        "user_id",
        "event_type",
        "value",
    )


def q_ev_topk_per_user(spark, sf_dir):
    """Top-3 events by value per user (row_number window)."""
    ev = _events(spark, sf_dir)
    return topk_per_group(
        ev,
        ["user_id"],
        [F.desc("value"), F.asc("event_id")],
        k=3,
    ).select("user_id", "event_id", "value", "rank")


def q_ev_sessionize(spark, sf_dir):
    """30-min-gap sessionization per user → per-session stats."""
    ev = _events(spark, sf_dir)
    s = sessionize(ev, "user_id", "timestamp", GAP_NS, tiebreak_col="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("timestamp").alias("session_start"),
            F.max("timestamp").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


def q_ev_running_value(spark, sf_dir):
    """Running (cumulative) value per user in time order — decimal
    window sum for cross-engine determinism."""
    ev = _events(spark, sf_dir)
    out = running_agg(
        ev,
        "user_id",
        "timestamp",
        dec("value", "9,2"),
        agg="sum",
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        "timestamp",
        F.col("running_sum").cast("double").alias("running_value"),
    )


def q_ev_asof_purchase_click(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent
    click at-or-before it (union-and-carry composition — one shuffle,
    no range explosion)."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "timestamp", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "timestamp",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases, clicks, key="user_id", left_ts="timestamp", right_ts="timestamp",
        right_cols=["click_id", "click_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "timestamp",
        "value",
        F.col("right_click_id").alias("click_id"),
        F.col("right_click_value").alias("click_value"),
    )


def q_ev_type_pivot(spark, sf_dir):
    """Per-user event-type profile (pivot → conditional aggregation)."""
    ev = _events(spark, sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "user_id", *[F.col(t).alias(f"n_{t}") for t in types]
        )
        .orderBy("user_id")
    )


def q_ev_distinct_users(spark, sf_dir):
    """Exact distinct users + event count per type (partial+final
    distinct aggregate)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def q_ev_session_attribution(spark, sf_dir):
    """Interval join: each purchase attributed to the click-session
    (30-min gap sessions over click events) containing it — the
    bucketized range-join composition (operators/rangejoin.py), no
    per-key cartesian product. Oracle: DuckDB theta join on the same
    session frame."""
    from raft_c_spark.operators.rangejoin import interval_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    s = sessionize(clicks, "user_id", "timestamp", GAP_NS, tiebreak_col="event_id")
    sess = s.groupBy("user_id", "session_id").agg(
        F.min("timestamp").alias("session_start"),
        # pad by the gap: a purchase within 30 min of the last click
        # still belongs to the session (zero-width single-click
        # sessions would otherwise never match anything)
        (F.max("timestamp") + F.lit(GAP_NS)).alias("session_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "timestamp", "value"
    )
    out = interval_join(
        purchases,
        sess,
        key="user_id",
        ts_col="timestamp",
        start_col="session_start",
        end_col="session_end",
    )
    return out.select(
        "event_id", "user_id", "timestamp", "value", "session_id"
    )


FUNNEL = ["signup", "click", "purchase"]
WEEK_NS = 7 * 86_400_000_000_000


def q_ev_funnel(spark, sf_dir):
    """Strict-ordered signup → click → purchase funnel: how many
    users reach each step after the previous one (one row)."""
    from raft_c_spark.operators.window import funnel_steps

    ev = _events(spark, sf_dir)
    return funnel_steps(ev, FUNNEL).agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_click_after"),
        F.count("t3").alias("n_purchase_after"),
    )


def q_ev_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: distinct users active k weeks after
    their first event, per cohort week."""
    from raft_c_spark.operators.window import cohort_retention

    ev = _events(spark, sf_dir)
    return cohort_retention(ev, period_ns=WEEK_NS)


Z_WINDOW = 100


def q_ev_rolling_zscore(spark, sf_dir):
    """Trailing-100-event z-score per event type — anomaly flags over
    the value stream (|z| > 3), warm-up rows excluded."""
    from raft_c_spark.operators.window import rolling_zscore

    ev = _events(spark, sf_dir)
    z = rolling_zscore(
        ev, "event_type", "timestamp", "value", Z_WINDOW, tiebreak_col="event_id"
    )
    return z.filter(F.abs(F.col("zscore")) > 3.0).select(
        "event_id", "event_type", "timestamp", "value", "zscore"
    )


DAY_NS = 86_400_000_000_000


def q_ev_rollup_profile(spark, sf_dir):
    """ROLLUP(event_type, day-of-week) profile — subtotal rows per
    event_type and a grand total alongside the leaf groups, tagged by
    grouping_id. The reference has no grouping-sets surface at all;
    this covers the multi-level-aggregate shape. Day-of-week is pure
    integer math on the ns timestamp (epoch day 0 = Thursday → +4,
    0 = Sunday), identical in both engines.

    Scale: ROLLUP is a single logical aggregate — Spark expands the
    grouping sets and still runs one shuffle with partial aggregation;
    no per-level rescans of the fact table.
    """
    ev = _events(spark, sf_dir)
    dow = (F.expr(f"timestamp div {DAY_NS}") + F.lit(4)) % F.lit(7)
    return (
        ev.withColumn("dow", dow)
        .rollup("event_type", "dow")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", "12,2")).cast("double").alias("sum_value"),
        )
        .orderBy("gid", "event_type", "dow")
    )


HOUR_NS = 3_600_000_000_000


def q_ev_trailing_window(spark, sf_dir):
    """Per-user trailing-1h sum and count at every event — a RANGE
    window frame over the ns timestamp (value-based bounds, unlike the
    ROWS frames elsewhere). Frame membership depends only on timestamp
    values, so ties need no tiebreak: both engines include all
    equal-timestamp rows. Decimal sum cast to double once.

    Scale: one shuffle (hash by user) + in-partition sort; range
    frames over a sorted run are evaluated with a sliding two-pointer
    pass, so cost is linear per partition."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("timestamp")
        .rangeBetween(-HOUR_NS, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "timestamp",
        F.sum(dec("value", "9,2")).over(w).cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


QUERIES = {
    # as-of join first: the flagship custom operator (union-and-carry,
    # no Spark built-in) — dict order decides which ev_* analytics
    # queries land inside the driver's 50-query correctness window
    "ev_asof_purchase_click": q_ev_asof_purchase_click,
    "ev_topk_per_user": q_ev_topk_per_user,
    "ev_sessionize": q_ev_sessionize,
    "ev_running_value": q_ev_running_value,
    "ev_type_pivot": q_ev_type_pivot,
    "ev_distinct_users": q_ev_distinct_users,
    "ev_session_attribution": q_ev_session_attribution,
    "ev_funnel": q_ev_funnel,
    "ev_cohort_retention": q_ev_cohort_retention,
    "ev_rolling_zscore": q_ev_rolling_zscore,
    "ev_rollup_profile": q_ev_rollup_profile,
    "ev_trailing_window": q_ev_trailing_window,
}

_EV = (
    "SELECT event_id, epoch_ns(ts) AS timestamp, user_id, event_type, value "
    "FROM events"
)

ORACLES = {
    "ev_topk_per_user": f"""
        SELECT user_id, event_id, value, rank FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id) AS rank
            FROM ({_EV})
        ) WHERE rank <= 3
    """,
    "ev_sessionize": f"""
        WITH flagged AS (
            SELECT user_id, event_id, timestamp,
                   CASE WHEN timestamp - lag(timestamp) OVER w > {GAP_NS}
                             OR lag(timestamp) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM ({_EV})
            WINDOW w AS (PARTITION BY user_id ORDER BY timestamp, event_id)
        ), sessions AS (
            -- CAST: DuckDB windowed SUM(int) yields HUGEINT, which the
            -- driver's pandas bridge floats; Spark emits BIGINT
            SELECT user_id, timestamp,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id
                                          ORDER BY timestamp, event_id
                                          ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               COUNT(*) AS n_events,
               MIN(timestamp) AS session_start,
               MAX(timestamp) AS session_end
        FROM sessions
        GROUP BY user_id, session_id
    """,
    "ev_running_value": f"""
        SELECT user_id, event_id, timestamp,
               CAST(SUM({sql_dec('value', '9,2')})
                    OVER (PARTITION BY user_id ORDER BY timestamp, event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        FROM ({_EV})
    """,
    # deterministic replay instead of DuckDB's ASOF JOIN (reviewer
    # r8): ASOF picks an ARBITRARY click among ties at the same
    # (user, timestamp), while the Spark asof_join deterministically
    # carries the lexicographic max of the (click_id, click_value)
    # struct — the lateral top-1 below replays exactly that order
    "ev_asof_purchase_click": f"""
        SELECT p.event_id, p.user_id, p.timestamp, p.value,
               c.click_id, c.click_value
        FROM (SELECT * FROM ({_EV}) WHERE event_type = 'purchase') p
        LEFT JOIN LATERAL (
            SELECT c.event_id AS click_id, c.value AS click_value
            FROM (SELECT * FROM ({_EV}) WHERE event_type = 'click') c
            WHERE c.user_id = p.user_id AND c.timestamp <= p.timestamp
            ORDER BY c.timestamp DESC, c.event_id DESC, c.value DESC
            LIMIT 1
        ) c ON TRUE
    """,
    "ev_type_pivot": f"""
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS n_click,
               COUNT(*) FILTER (event_type = 'view') AS n_view,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (event_type = 'error') AS n_error
        FROM ({_EV})
        GROUP BY user_id
    """,
    "ev_session_attribution": f"""
        WITH clicks AS (
            SELECT * FROM ({_EV}) WHERE event_type = 'click'
        ), flagged AS (
            SELECT user_id, event_id, timestamp,
                   CASE WHEN timestamp - lag(timestamp) OVER w > {GAP_NS}
                             OR lag(timestamp) OVER w IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM clicks
            WINDOW w AS (PARTITION BY user_id ORDER BY timestamp, event_id)
        ), sess_rows AS (
            SELECT user_id, timestamp,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id
                                          ORDER BY timestamp, event_id
                                          ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM flagged
        ), sessions AS (
            SELECT user_id, session_id,
                   MIN(timestamp) AS session_start,
                   MAX(timestamp) + {GAP_NS} AS session_end
            FROM sess_rows GROUP BY user_id, session_id
        )
        SELECT p.event_id, p.user_id, p.timestamp, p.value, s.session_id
        FROM ({_EV}) p
        JOIN sessions s
          ON p.user_id = s.user_id
         AND p.timestamp BETWEEN s.session_start AND s.session_end
        WHERE p.event_type = 'purchase'
    """,
    "ev_distinct_users": f"""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM ({_EV})
        GROUP BY event_type
    """,
    "ev_funnel": f"""
        WITH ev AS ({_EV}),
        s1 AS (
            SELECT user_id, MIN(timestamp) AS t1 FROM ev
            WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.timestamp) AS t2
            FROM ev e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = '{FUNNEL[1]}' AND e.timestamp > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.timestamp) AS t3
            FROM ev e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = '{FUNNEL[2]}' AND e.timestamp > s2.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
               (SELECT COUNT(*) FROM s2) AS n_click_after,
               (SELECT COUNT(*) FROM s3) AS n_purchase_after
    """,
    "ev_cohort_retention": f"""
        WITH ev AS ({_EV}),
        first AS (
            SELECT user_id, MIN(timestamp) AS t0 FROM ev GROUP BY user_id
        )
        SELECT f.t0 // {WEEK_NS} AS cohort_period,
               (e.timestamp - f.t0) // {WEEK_NS} AS period_offset,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM ev e JOIN first f ON e.user_id = f.user_id
        GROUP BY cohort_period, period_offset
    """,
    # rolling z-score: sums over exact decimals, cast to double ONCE,
    # then identical IEEE double arithmetic in both engines
    "ev_rolling_zscore": f"""
        WITH win AS (
            SELECT event_id, event_type, timestamp, value,
                   CAST(SUM({sql_dec('value')}) OVER w AS DOUBLE) AS s,
                   CAST(SUM({sql_dec('value')} * {sql_dec('value')}) OVER w
                        AS DOUBLE) AS sq,
                   COUNT(*) OVER w AS n
            FROM ({_EV})
            WINDOW w AS (PARTITION BY event_type
                         ORDER BY timestamp, event_id
                         ROWS {Z_WINDOW - 1} PRECEDING)
        )
        SELECT event_id, event_type, timestamp, value,
               (value - s / n) / sqrt((sq - s * s / n) / (n - 1)) AS zscore
        FROM win
        WHERE n = {Z_WINDOW}
          AND (sq - s * s / n) / (n - 1) > 0
          AND abs((value - s / n) / sqrt((sq - s * s / n) / (n - 1))) > 3.0
    """,
    "ev_rollup_profile": f"""
        SELECT event_type,
               (timestamp // {DAY_NS} + 4) % 7 AS dow,
               CAST(GROUPING(event_type,
                             (timestamp // {DAY_NS} + 4) % 7) AS BIGINT)
                   AS gid,
               COUNT(*) AS n_events,
               CAST(SUM({sql_dec('value', '12,2')}) AS DOUBLE) AS sum_value
        FROM ({_EV})
        GROUP BY ROLLUP (event_type, dow)
    """,
    "ev_trailing_window": f"""
        SELECT event_id, user_id, timestamp,
               CAST(SUM({sql_dec('value')}) OVER w AS DOUBLE) AS sum_1h,
               COUNT(*) OVER w AS n_1h
        FROM ({_EV})
        WINDOW w AS (PARTITION BY user_id ORDER BY timestamp
                     RANGE BETWEEN {HOUR_NS} PRECEDING AND CURRENT ROW)
    """,
}


MAD_K = 8.0


def q_ev_anomaly_mad(spark, sf_dir):
    """Median-absolute-deviation anomaly detection per event series
    (|x − med| > 8·MAD) — the robust-outlier surface a metrics TSDB
    ships; see window.mad_anomalies for the bit-exact percentile
    contract and the two-pass audit-scale shape."""
    from raft_c_spark.operators import window as w

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).alias("ts_ns"),
        "value",
    )
    return w.mad_anomalies(pts, "event_type", "ts_ns", "value", k=MAD_K)


QUERIES["ev_anomaly_mad"] = q_ev_anomaly_mad

ORACLES["ev_anomaly_mad"] = f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, epoch_ns(e.ts) AS ts_ns, e.value, m.med,
               abs(e.value - m.med) AS absdev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(absdev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.ts_ns, d.value, d.med, m.mad,
           (d.value - d.med) / m.mad AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND d.absdev > {MAD_K} * m.mad
"""


def q_ev_transition_matrix(spark, sf_dir):
    """Event-type Markov transition matrix over per-user timelines —
    see window.transition_matrix for the (ts, event_id) order
    determinism contract and the one-window / tiny-aggregate scale
    shape."""
    from raft_c_spark.operators.window import transition_matrix

    ev = _events(spark, sf_dir)
    return transition_matrix(
        ev, "user_id", "timestamp", "event_type", tiebreak_col="event_id"
    )


QUERIES["ev_transition_matrix"] = q_ev_transition_matrix

# lag order (ts, event_id) mirrors the operator; prob is one
# long/long IEEE division rounded to 8 decimals on both engines.
ORACLES["ev_transition_matrix"] = """
    WITH seq AS (
        SELECT user_id,
               event_type AS to_state,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS from_state
        FROM events
    ),
    counts AS (
        SELECT from_state, to_state, COUNT(*) AS n_transitions
        FROM seq WHERE from_state IS NOT NULL
        GROUP BY from_state, to_state
    ),
    totals AS (
        SELECT from_state, SUM(n_transitions) AS n_from
        FROM counts GROUP BY from_state
    )
    SELECT counts.from_state, to_state,
           CAST(n_transitions AS BIGINT) AS n_transitions,
           CAST(n_from AS BIGINT) AS n_from,
           round(CAST(n_transitions AS DOUBLE) / n_from, 8) AS prob
    FROM counts JOIN totals USING (from_state)
    ORDER BY from_state, to_state
"""


# --- round-11 operator: multi-touch attribution models ---------------------


def q_ev_attribution_models(spark, sf_dir):
    """Per-(model, touch type) credit under the four standard
    multi-touch attribution models over purchase-conversion journeys
    — see operators.window.attribution_credit for the quantized
    fractional-credit determinism contract and the two-user-keyed-
    window scale shape."""
    from raft_c_spark.operators.window import attribution_credit

    return attribution_credit(_events(spark, sf_dir))


QUERIES["ev_attribution_models"] = q_ev_attribution_models

# replays the operator exactly: (timestamp, event_id) total order,
# journey = running count of PRIOR purchases, credits quantized to
# DECIMAL(18,8) before the per-(model, type) sum
ORACLES["ev_attribution_models"] = f"""
    WITH ev AS ({_EV}),
    j AS (
        SELECT *,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY timestamp, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS journey
        FROM ev
    ),
    f AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id, journey) AS converted
        FROM j
    ),
    t AS (
        SELECT user_id, journey, event_type, timestamp, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, journey
                   ORDER BY timestamp, event_id) AS pos,
               COUNT(*) OVER (PARTITION BY user_id, journey) AS n
        FROM f WHERE converted = 1 AND event_type <> 'purchase'
    ),
    c AS (
        SELECT event_type AS touch_type,
               CAST(round(CASE WHEN pos = n THEN 1.0 ELSE 0.0 END, 8)
                    AS DECIMAL(18,8)) AS c_last,
               CAST(round(CASE WHEN pos = 1 THEN 1.0 ELSE 0.0 END, 8)
                    AS DECIMAL(18,8)) AS c_first,
               CAST(round(1.0 / n, 8) AS DECIMAL(18,8)) AS c_linear,
               CAST(round(CASE WHEN n = 1 THEN 1.0
                               WHEN n = 2 THEN 0.5
                               WHEN pos = 1 OR pos = n THEN 0.4
                               ELSE 0.2 / (n - 2) END, 8)
                    AS DECIMAL(18,8)) AS c_position
        FROM t
    ),
    s AS (
        SELECT touch_type, 'last_touch' AS model, c_last AS credit FROM c
        UNION ALL
        SELECT touch_type, 'first_touch', c_first FROM c
        UNION ALL
        SELECT touch_type, 'linear', c_linear FROM c
        UNION ALL
        SELECT touch_type, 'position_based', c_position FROM c
    )
    SELECT model, touch_type,
           round(CAST(SUM(credit) AS DOUBLE), 8) AS credit,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM s GROUP BY model, touch_type
    ORDER BY model, touch_type
"""
