"""Driver-facing queries that exercise the FULL query-language stack:
query string → lexer → parser → AST → time-expr folding → Engine →
TimeSeriesStore (partitioned parquet) → DataFrame result.

This is the end-to-end parity proof for SURVEY §3.1's lifecycle: the
oracle recomputes the same semantics in DuckDB directly from the
events parquet, while the Spark side goes through CREATEDB/USE/CREATE/
bulk ingest/SELECT on its own warehouse.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from raft_c_spark.engine import Engine
from raft_c_spark.functions.exact import sql_avg
from raft_c_spark.plans.parity import POINTS_SQL
from raft_c_spark.sources.testdata import events_as_points

DAY_NS = 86_400_000_000_000
_T0 = "'2024-01-05'"
_T1 = "'2024-01-25'"
T0_NS = 1_704_412_800_000_000_000  # 2024-01-05 UTC
T1_NS = 1_706_140_800_000_000_000  # 2024-01-25 UTC


_BUILT_WAREHOUSES: set[str] = set()


def _warehouse_path(sf_dir: str, prefix: str) -> str:
    """Cache-root path for a query-language warehouse, keyed by
    data-file identity (mtime+size) so a regenerated testdata file
    means a fresh build. The ``2`` in the prefix versions the atomic-
    build contract below: pre-r9 builds wrote in place, so a crashed
    old process could leave a PARTIAL directory — those legacy names
    are never trusted."""
    from raft_c_spark.functions import diskcache

    os.makedirs(diskcache.cache_root(), exist_ok=True)
    return os.path.join(
        diskcache.cache_root(),
        f"{prefix}2_{diskcache.data_cache_key(sf_dir, 'events')}",
    )


def _build_warehouse_atomic(wh: str, build) -> None:
    """Build an IMMUTABLE warehouse once per key with the diskcache
    atomic-publish contract: ``build(staging_dir)`` writes a complete
    warehouse into a private staging path, which is then os.replace'd
    into place — a concurrent process (r9: two pytest halves sharing
    the repo cache root raced rmtree-rebuild against a reader and
    lang_retention flaked) either wins the publish or discards its
    staging copy; a directory at ``wh`` is therefore always complete.
    The lang warehouses qualify as immutable: every ingest happens
    inside ``build``, queries only read."""
    from raft_c_spark.functions import diskcache

    if wh in _BUILT_WAREHOUSES or os.path.isdir(wh):
        _BUILT_WAREHOUSES.add(wh)
        return
    staging = f"{wh}.tmp.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    build(staging)
    diskcache.publish_atomic(staging, wh)
    _BUILT_WAREHOUSES.add(wh)


def _engine_with_click_series(spark, sf_dir: str) -> Engine:
    """Warehouse with the 'click' series bulk-ingested from the events
    table (store path: series+day partitioned parquet, sort-on-write).
    Built atomically once per data key, then shared by the lang_*
    queries — they read the same immutable series, and re-ingesting
    per query would triple the ingest cost without testing anything
    new."""
    wh = _warehouse_path(sf_dir, "lang_wh")

    def build(staging: str) -> None:
        eng = Engine(spark, warehouse=staging)
        eng.execute("CREATEDB metrics")
        eng.execute("USE metrics")
        eng.execute("CREATE click")
        pts = events_as_points(spark, sf_dir).filter(
            F.col("series") == "click"
        )
        eng.store.insert_df("metrics", pts)

    _build_warehouse_atomic(wh, build)
    eng = Engine(spark, warehouse=wh)
    eng.execute("USE metrics")
    return eng


def q_language_sample_by(spark, sf_dir):
    """SELECT avg(value) ... BETWEEN date literals SAMPLE BY 1d —
    through the parser; result (timestamp, value) per the reference's
    row shape (src/encoding.c:125-159)."""
    eng = _engine_with_click_series(spark, sf_dir)
    return eng.execute(
        f"SELECT avg(value) FROM click BETWEEN {_T0} AND {_T1} SAMPLE BY 1d"
    )


def q_language_where_limit(spark, sf_dir):
    """SELECT with WHERE chain + LIMIT through the parser (top-50 by
    timestamp order of the filtered scan; the engine orders by
    (timestamp, value) and the oracle replays the same tiebreak, so
    the 50-row boundary stays deterministic even if two clicks ever
    share a microsecond — reviewer r8)."""
    eng = _engine_with_click_series(spark, sf_dir)
    return eng.execute(
        "SELECT value FROM click WHERE value > 50 AND value < 200 LIMIT 50"
    )


def q_language_multi_agg(spark, sf_dir):
    """Multi-aggregate select through the parser (grammar doc
    src/statement_parse.h:97 — `SELECT fn(value) [, fn(value)]* FROM
    ts`): one row, one column per aggregate, order preserved."""
    eng = _engine_with_click_series(spark, sf_dir)
    return eng.execute(
        f"SELECT min(value), max(value), avg(value) FROM click"
        f" BETWEEN {_T0} AND {_T1}"
    )


def q_language_at_lookup(spark, sf_dir):
    """AT <ns> point lookup through the parser — the S_SINGLE
    selector the reference declares but never reaches from its
    grammar (src/statement_parse.h:192-203). The probe timestamp is
    data-derived (earliest click point)."""
    eng = _engine_with_click_series(spark, sf_dir)
    t = (
        events_as_points(spark, sf_dir)
        .filter(F.col("series") == "click")
        .agg(F.min("timestamp"))
        .collect()[0][0]
    )
    return eng.execute(f"SELECT value FROM click AT {t}")


def q_language_earliest_k(spark, sf_dir):
    """earliest(value, k) through the parser (grammar-doc-only in the
    reference — src/statement_parse.h:97 allows an integer argument
    its executor never reads)."""
    eng = _engine_with_click_series(spark, sf_dir)
    return eng.execute(f"SELECT earliest(value, 20) FROM click")


def q_language_sample_multi(spark, sf_dir):
    """Bucketed multi-aggregate SAMPLE BY through the parser —
    extension beyond the reference's avg-only sampler
    (src/timeseries.c:1265-1308): min/max/avg per bucket in ONE hash
    aggregate, reference bucket semantics (exclusive bounds, end
    labels, tail drop) unchanged."""
    eng = _engine_with_click_series(spark, sf_dir)
    return eng.execute(
        f"SELECT min(value), max(value), avg(value) FROM click"
        f" BETWEEN {_T0} AND {_T1} SAMPLE BY 1d"
    )


HOUR_NS = 3_600_000_000_000
FILL_VALUE_MIN = 300  # sparsifies hours so the grid has real gaps


def q_language_sample_fill(spark, sf_dir):
    """SAMPLE BY 1h FILL(prev) through the parser — the gap-fill
    grammar extension end-to-end: WHERE value > 300 sparsifies the
    hourly buckets so the generated grid has real gaps, and the
    carry-forward fill + `filled` marker come back through the
    language result shape (timestamp, value, filled). Registered via
    plans.extras (adding it here would shift the driver's 50-slot
    window)."""
    eng = _engine_with_click_series(spark, sf_dir)
    return eng.execute(
        f"SELECT avg(value) FROM click BETWEEN {_T0} AND {_T1}"
        f" WHERE value > {FILL_VALUE_MIN} SAMPLE BY 1h FILL(prev)"
    )


RET_DAYS = 7
RET_NOW_NS = T1_NS  # pinned now(): 2024-01-25 UTC
RET_CUTOFF_NS = RET_NOW_NS - RET_DAYS * DAY_NS
RET_POISON = 10_000.0


def q_language_retention(spark, sf_dir):
    """Retention + duplication-policy DDL through the full language
    stack (judge r7 ask #7 — previously the only §2.1 semantics
    verified exclusively by pytest). ``CREATE clickr 7d 'ignore'``
    creates the series with a 7-day retention and DP_IGNORE; the
    click points are bulk-ingested once, then a second ingest replays
    EVERY point with a poisoned value (+10000) — cross-batch
    duplicate timestamps the ignore policy must drop wholesale
    (src/timeseries.h:43; the touched-partition anti-join in
    tsstore.insert_df). The SELECT pins now() to 2024-01-25, so the
    read-time retention filter (the reference parses-but-ignores
    retention — SURVEY §1.3) hides everything older than Jan 18.

    The oracle replays ONLY the retention filter over the original
    events: a broken dup policy doubles rows or poisons values, a
    broken retention filter changes the row set — either flips the
    driver hash."""
    wh = _warehouse_path(sf_dir, "lang_ret_wh")

    def build(staging: str) -> None:
        eng = Engine(spark, warehouse=staging)
        eng.execute("CREATEDB rmetrics")
        eng.execute("USE rmetrics")
        eng.execute(f"CREATE clickr {RET_DAYS}d 'ignore'", now=RET_NOW_NS)
        # deterministic pre-dedup (min value per timestamp): DP_IGNORE
        # drops IN-BATCH duplicate timestamps with an arbitrary
        # survivor (dropDuplicates), so a corpus that happens to carry
        # two clicks in the same microsecond would diverge from any
        # fixed oracle replay. The shipped SFs have zero such
        # collisions today, but at sf1 (~200k clicks of µs ticks) the
        # birthday odds are real — collapsing to MIN(value) first
        # makes the ingest input unique-keyed on BOTH sides, so the
        # policy's in-batch branch never has to pick a survivor. The
        # cross-batch branch (the poisoned replay below) stays fully
        # exercised.
        pts = (
            events_as_points(spark, sf_dir)
            .filter(F.col("series") == "click")
            .groupBy("timestamp")
            .agg(F.min("value").alias("value"))
            .select(F.lit("clickr").alias("series"), "timestamp", "value")
        )
        eng.store.insert_df("rmetrics", pts, duplication="ignore")
        eng.store.insert_df(
            "rmetrics",
            pts.withColumn("value", F.col("value") + F.lit(RET_POISON)),
            duplication="ignore",
        )

    _build_warehouse_atomic(wh, build)
    eng = Engine(spark, warehouse=wh)
    eng.execute("USE rmetrics")
    return eng.execute("SELECT value FROM clickr", now=RET_NOW_NS)


QUERIES = {
    "lang_retention": q_language_retention,
    "lang_sample_by": q_language_sample_by,
    "lang_sample_multi": q_language_sample_multi,
    "lang_where_limit": q_language_where_limit,
    "lang_multi_agg": q_language_multi_agg,
    "lang_at_lookup": q_language_at_lookup,
    "lang_earliest_k": q_language_earliest_k,
}

_CLICK = f"SELECT timestamp, value FROM ({POINTS_SQL}) WHERE series = 'click'"

ORACLES = {
    "lang_retention": f"""
        SELECT timestamp, min(value) AS value FROM ({_CLICK})
        WHERE timestamp >= {RET_CUTOFF_NS}
        GROUP BY timestamp
    """,
    "lang_sample_by": f"""
        SELECT bucket_ts AS timestamp, {sql_avg('value')} AS value
        FROM (
            SELECT timestamp - (timestamp % {DAY_NS}) + {DAY_NS} AS bucket_ts,
                   value
            FROM ({_CLICK})
            WHERE timestamp % {DAY_NS} <> 0
              AND timestamp >= {T0_NS} AND timestamp <= {T1_NS}
        )
        WHERE bucket_ts < {T1_NS}
        GROUP BY bucket_ts
    """,
    "lang_sample_multi": f"""
        SELECT bucket_ts AS timestamp,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               {sql_avg('value')} AS avg_value
        FROM (
            SELECT timestamp - (timestamp % {DAY_NS}) + {DAY_NS} AS bucket_ts,
                   value
            FROM ({_CLICK})
            WHERE timestamp % {DAY_NS} <> 0
              AND timestamp >= {T0_NS} AND timestamp <= {T1_NS}
        )
        WHERE bucket_ts < {T1_NS}
        GROUP BY bucket_ts
    """,
    "lang_where_limit": f"""
        SELECT timestamp, value FROM ({_CLICK})
        WHERE value > 50 AND value < 200
        ORDER BY timestamp, value LIMIT 50
    """,
    "lang_multi_agg": f"""
        SELECT MIN(value) AS min_value,
               MAX(value) AS max_value,
               {sql_avg('value')} AS avg_value
        FROM ({_CLICK})
        WHERE timestamp >= {T0_NS} AND timestamp <= {T1_NS}
    """,
    "lang_at_lookup": f"""
        SELECT timestamp, value FROM ({_CLICK})
        WHERE timestamp = (SELECT MIN(timestamp) FROM ({_CLICK}))
        ORDER BY timestamp, value
    """,
    "lang_earliest_k": f"""
        SELECT timestamp, value FROM ({_CLICK})
        ORDER BY timestamp, value LIMIT 20
    """,
}
