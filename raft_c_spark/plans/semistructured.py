"""Semi-structured + skew + approximate query surface over ``events``:

- JSON property extraction (events.props is a JSON string column) —
  pushdown-friendly get_json_object, oracle via DuckDB json functions;
- salted aggregation on the (low-cardinality, skewed) event_type key —
  same answer as the plain aggregate by construction, oracle-checked;
- approximate aggregates (HLL distinct, quantile sketch) — rows-only
  (sketches differ across engines); error bounds pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_c_spark.operators.skew import salted_agg
from raft_c_spark.sources.testdata import load_table


def q_ev_json_props(spark, sf_dir):
    """Extract props.k per event type: JSON scalar pull + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


def q_ev_salted_agg(spark, sf_dir):
    """Two-stage salted aggregate on the skewed event_type key —
    results identical to the direct aggregate (merge of algebraic
    partials), physical plan immune to hot-key reducer skew."""
    ev = load_table(spark, sf_dir, "events")
    from raft_c_spark.functions.exact import dec

    ev = ev.withColumn("value_dec", dec("value", "9,2"))
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "*"),
            "sum_value": ("sum", "value_dec"),
            "max_value": ("max", "value"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "max_value",
    ).orderBy("event_type")


def q_ev_salted_join(spark, sf_dir):
    """Salted equi-join on the 5-value (pathologically hot) event_type
    key: events × per-type averages, counting events above their
    type's mean. Same rows as the plain join by construction —
    the salt only re-partitions the work (deterministic row-hash
    salt, not rand(), so retries reproduce)."""
    from raft_c_spark.functions.exact import dec
    from raft_c_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("event_type").alias("et")).agg(
        (F.sum(dec("value", "9,2")).cast("double") / F.count("value")).alias(
            "type_avg"
        )
    )
    joined = salted_join(
        ev.select("event_type", "value"),
        stats.withColumnRenamed("et", "event_type"),
        "event_type",
        n_salts=8,
    )
    return (
        joined.filter(F.col("value") > F.col("type_avg"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_above"))
        .orderBy("event_type")
    )


#: sketch error bands the profile asserts (and the oracle verifies):
#: HLL++ at rsd=0.02 held to 3σ; percentile_approx at accuracy=1000
#: (rank error ≤ 1e-3) held inside a ±0.005 exact-rank corridor
APPROX_USERS_TOL = 0.06
APPROX_RANK_EPS = 0.005


def q_ev_approx_profile(spark, sf_dir):
    """Approximate distinct users (HLL++) + approximate value
    quantiles per event type — the sketch-based path for cardinality/
    quantiles at 100 TB. Hash-oracled via its CONTRACT: sketch values
    are engine-specific, so the query returns the exact cardinality
    (cross-engine-checked against DuckDB) plus booleans asserting each
    sketch landed inside its published error band — HLL within 3·rsd
    of exact, and each approximate percentile's exact RANK
    (count of values ≤ it, from a second scan through a broadcast
    join of the tiny sketch frame — no per-group sort anywhere)
    within ±0.005 of its target rank, 5× the sketch's 1e-3
    guarantee (accuracy=1000 — the 1e-4 sketch costs ~1.5× more per
    merge and buys nothing at this corridor). Both sketches are
    merge-order-robust (HLL registers
    max-merge; the GK rank bound holds under any merge), so the
    booleans are partitioning-stable; the oracle expects them all
    true."""
    ev = load_table(spark, sf_dir, "events")
    targets = (0.5, 0.95, 0.99)
    # exact distinct in its OWN aggregation: mixing countDistinct
    # with the sketch aggregates forces Catalyst's Expand-based plan
    # (every row duplicated per aggregate group — measured 6x the
    # cost); separately it compiles to a plain two-phase hash
    # aggregate, and the two 5-row results join for free
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    sk = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.percentile_approx("value", list(targets), 1000).alias("qa"),
    )
    joined = ev.select("event_type", "value").join(
        F.broadcast(sk), "event_type"
    )
    chk = joined.groupBy("event_type").agg(
        F.first("au").alias("au"),
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                (F.col("value") <= F.element_at("qa", i + 1)).cast("long")
            ).alias(f"rank{i}")
            for i in range(len(targets))
        ],
    ).join(F.broadcast(exact), "event_type")
    ok = [
        (
            F.abs(F.col(f"rank{i}") - F.lit(p) * F.col("n"))
            <= F.lit(APPROX_RANK_EPS) * F.col("n")
        ).alias(f"p{label}_ok")
        for i, (p, label) in enumerate(zip(targets, ("50", "95", "99")))
    ]
    return chk.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("au") - F.col("exact_users"))
            <= F.lit(APPROX_USERS_TOL) * F.col("exact_users")
        ).alias("users_ok"),
        *ok,
    ).orderBy("event_type")


def q_ev_exact_percentiles(spark, sf_dir):
    """EXACT per-group percentiles (the ground-truth companion to
    ev_approx_profile's sketches): Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the linear-interpolation definition and
    bit-match on the same doubles (verified: interpolated values equal
    to the last ulp). Exact percentiles need the full sorted group —
    at 100 TB use ev_approx_profile; this is the small-group/audit
    path."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .orderBy("event_type")
    )


def q_ev_set_ops(spark, sf_dir):
    """Set-operation surface over user cohorts: clickers INTERSECT
    purchasers, clickers EXCEPT purchasers, and the UNION count —
    compiled as semi/anti joins on distinct user sets (Spark rewrites
    intersect/except to left-semi/left-anti over aggregated inputs —
    two shuffles, no cartesian)."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchasers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    both = clickers.intersect(purchasers)
    only_click = clickers.exceptAll(purchasers)
    all_users = clickers.union(purchasers).distinct()
    return (
        both.agg(F.count(F.lit(1)).alias("n_both"))
        .crossJoin(only_click.agg(F.count(F.lit(1)).alias("n_click_only")))
        .crossJoin(all_users.agg(F.count(F.lit(1)).alias("n_either")))
    )


QUERIES = {
    "ev_json_props": q_ev_json_props,
    "ev_salted_agg": q_ev_salted_agg,
    "ev_salted_join": q_ev_salted_join,
    "ev_exact_percentiles": q_ev_exact_percentiles,
    "ev_set_ops": q_ev_set_ops,
    # ev_approx_profile registers via plans.extras (behind the
    # driver's 50-query window): its HLL/quantile sketches are
    # engine-specific (rows-only either way, error-bound-pinned in
    # tests), so its slot goes to the hash-oracled text_repetition
}

ORACLES = {
    "ev_json_props": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               COUNT(json_extract_string(props, '$.k')) AS n_with_k
        FROM events
        GROUP BY event_type
    """,
    "ev_salted_agg": f"""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
    "ev_salted_join": """
        WITH stats AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE)
                       / COUNT(value) AS type_avg
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, COUNT(*) AS n_above
        FROM events e JOIN stats s ON e.event_type = s.event_type
        WHERE e.value > s.type_avg
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    "ev_exact_percentiles": """
        SELECT event_type,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events
        GROUP BY event_type
    """,
    "ev_set_ops": """
        WITH clickers AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        ),
        purchasers AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        SELECT
            (SELECT COUNT(*) FROM
                (SELECT user_id FROM clickers
                 INTERSECT SELECT user_id FROM purchasers)) AS n_both,
            (SELECT COUNT(*) FROM
                (SELECT user_id FROM clickers
                 EXCEPT SELECT user_id FROM purchasers)) AS n_click_only,
            (SELECT COUNT(*) FROM
                (SELECT user_id FROM clickers
                 UNION SELECT user_id FROM purchasers)) AS n_either
    """,
    # ev_approx_profile: intentionally no oracle (sketch-specific)
}
