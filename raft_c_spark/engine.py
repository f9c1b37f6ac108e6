"""Engine — the query-language entry point.

``Engine.execute(query)`` is the Spark-first analog of the reference's
request path (stmt_parse → stmt_execute, src/statement_parse.c:1156-1197
→ src/statement_execute.c:476-513): parse to the dataclass AST,
constant-fold time expressions to ns literals, then build a DataFrame
plan (Catalyst = analyzer/optimizer/physical planner — the reference
interprets its AST directly against the storage API, SURVEY §3.1).

Every statement returns a DataFrame (DDL returns a one-row status
frame) so a REPL can treat results uniformly, like the reference's
wire protocol does with string vs array responses (src/encoding.c).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_c_spark.catalog import Catalog, CatalogError
from raft_c_spark.frontend import ast
from raft_c_spark.frontend.eval import eval_timeunit
from raft_c_spark.frontend.parser import parse
from raft_c_spark.operators import tsdb
from raft_c_spark.sources.tsstore import TimeSeriesStore


class ExecutionError(RuntimeError):
    pass


class Engine:
    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.warehouse = warehouse or tempfile.mkdtemp(prefix="raft_c_spark_wh_")
        self.catalog = Catalog(self.warehouse)
        self.store = TimeSeriesStore(spark, self.warehouse)
        self.current_db: str | None = None

    # -- public API --------------------------------------------------------

    def execute(self, query: str, now: int | None = None) -> DataFrame:
        """Parse and run one statement; ``now`` pins now() for
        deterministic tests — including the parse-time stamps of the
        VALUE / '*' insert forms (passed into the parser)."""
        return self.execute_stmt(parse(query, now=now), now=now)

    def sql(self, query: str, now: int | None = None) -> DataFrame:
        return self.execute(query, now=now)

    def execute_stmt(self, stmt: ast.Statement, now: int | None = None) -> DataFrame:
        if isinstance(stmt, ast.CreateDb):
            self.catalog.create_db(stmt.db_name)
            if self.current_db is None:
                self.current_db = stmt.db_name
            return self._status(f"database {stmt.db_name} created")
        if isinstance(stmt, ast.Use):
            if not self.catalog.has_db(stmt.db_name):
                raise ExecutionError(f"database {stmt.db_name!r} does not exist")
            self.current_db = stmt.db_name
            return self._status(f"using {stmt.db_name}")
        if isinstance(stmt, ast.Create):
            return self._exec_create(stmt, now)
        if isinstance(stmt, ast.Delete):
            return self._exec_delete(stmt)
        if isinstance(stmt, ast.Insert):
            return self._exec_insert(stmt, now)
        if isinstance(stmt, ast.Select):
            return self._exec_select(stmt, now)
        if isinstance(stmt, ast.Meta):
            return self._exec_meta(stmt)
        raise ExecutionError(f"unsupported statement {stmt!r}")

    # -- helpers -----------------------------------------------------------

    def _status(self, msg: str) -> DataFrame:
        return self.spark.createDataFrame([(msg,)], "status: string")

    def _db(self) -> str:
        if self.current_db is None:
            raise ExecutionError("no active database (USE <db> first)")
        return self.current_db

    # -- DDL ---------------------------------------------------------------

    def _exec_create(self, stmt: ast.Create, now: int | None) -> DataFrame:
        db = self._db()
        retention = (
            eval_timeunit(stmt.retention, now) if stmt.retention is not None else None
        )
        created = self.catalog.create_series(
            db, stmt.ts_name, retention_ns=retention, duplication=stmt.duplication
        )
        if created:
            return self._status(f"series {stmt.ts_name} created")
        return self._status(
            f"series {stmt.ts_name} already exists"
            + (
                " (options updated)"
                if retention is not None or stmt.duplication is not None
                else ""
            )
        )

    def _exec_delete(self, stmt: ast.Delete) -> DataFrame:
        """DELETE ts [FROM db] | DELETE db — executor-stubbed in the
        reference (src/statement_execute.c:461-465); implemented fully.
        The single-name form drops a series of the active db if one
        matches, else a database of that name."""
        if not stmt.single:
            self.catalog.drop_series(stmt.db_name, stmt.name)
            self.store.drop_series(stmt.db_name, stmt.name)
            return self._status(f"series {stmt.name} deleted from {stmt.db_name}")
        if self.current_db and self.catalog.has_series(self.current_db, stmt.name):
            self.catalog.drop_series(self.current_db, stmt.name)
            self.store.drop_series(self.current_db, stmt.name)
            return self._status(f"series {stmt.name} deleted")
        if self.catalog.has_db(stmt.name):
            self.catalog.drop_db(stmt.name)
            self.store.drop_db(stmt.name)
            if self.current_db == stmt.name:
                self.current_db = None
            return self._status(f"database {stmt.name} deleted")
        raise CatalogError(f"nothing named {stmt.name!r} to delete")

    def _exec_meta(self, stmt: ast.Meta) -> DataFrame:
        """.databases / .timeseries — executor-stubbed in the reference
        (src/statement_execute.c:467-471); implemented fully."""
        if stmt.command == "databases":
            names = self.catalog.databases()
            return self.spark.createDataFrame(
                [(n,) for n in names] or [], "database: string"
            )
        names = sorted(self.catalog.series(self._db()))
        return self.spark.createDataFrame([(n,) for n in names] or [], "series: string")

    # -- DML ---------------------------------------------------------------

    def _exec_insert(self, stmt: ast.Insert, now: int | None) -> DataFrame:
        db = self._db()
        if not self.catalog.has_series(db, stmt.ts_name):
            # the reference auto-creates on insert? No — ts_get fails;
            # we require CREATE first but auto-create mirrors common
            # TSDB ergonomics. Stay strict: explicit CREATE.
            raise ExecutionError(
                f"series {stmt.ts_name!r} does not exist (CREATE it first)"
            )
        opts = self.catalog.series_opts(db, stmt.ts_name)
        rows = [
            (eval_timeunit(r.timeunit, now), r.value) for r in stmt.records
        ]
        n = self.store.insert_rows(
            db, stmt.ts_name, rows, duplication=opts.get("duplication") or "insert"
        )
        return self._status(f"{n} records inserted into {stmt.ts_name}")

    # -- SELECT ------------------------------------------------------------

    def _exec_select(self, stmt: ast.Select, now: int | None) -> DataFrame:
        db = self._db()
        opts = self.catalog.series_opts(db, stmt.ts_name)
        points = self.store.read(
            db,
            series=stmt.ts_name,
            retention_ns=opts.get("retention_ns"),
            now=now,
        )

        t0 = t1 = None
        if isinstance(stmt.selector, ast.Interval):
            t0 = eval_timeunit(stmt.selector.start, now)
            t1 = eval_timeunit(stmt.selector.end, now)
            if t0 > t1:
                raise tsdb.InvalidRangeError(f"invalid range: {t0} > {t1}")
            if stmt.sampling is None:
                points = points.filter(
                    (F.col("timestamp") >= F.lit(t0))
                    & (F.col("timestamp") <= F.lit(t1))
                )
            # when sampling, sample_by owns the range: ts_avg_sample
            # normalizes t0 *down* to an interval multiple and scans
            # [t0_norm, t1] (src/timeseries.c:1273-1276) — a pre-filter
            # at t0 would wrongly drop points in [t0_norm, t0)
        elif stmt.selector is not None:
            # S_SINGLE point lookup (AT <time>): exact-ns equality,
            # may return several rows (duplicate-ns points are legal)
            t_at = eval_timeunit(stmt.selector, now)
            points = points.filter(F.col("timestamp") == F.lit(t_at))

        if stmt.where:
            points = tsdb.where_chain(
                points, [(w.key, w.op, w.value) for w in stmt.where]
            )

        if len(stmt.functions) > 1:
            # multi-aggregate select (grammar doc
            # src/statement_parse.h:97): one row, one column per
            # aggregate, order preserved
            if stmt.sampling is not None:
                # extension: bucketed multi-aggregate (the reference's
                # sampler is avg-only, src/timeseries.c:1265-1308) —
                # still a single partial+final hash aggregate
                fns = tuple(fn.value for fn in stmt.functions)
                bad = [f for f in fns if f not in tsdb._SAMPLE_AGGS]
                if bad:
                    raise ExecutionError(
                        f"SAMPLE BY does not support aggregate(s): {bad}"
                    )
                if stmt.fill is not None:
                    raise ExecutionError(
                        "FILL supports single-aggregate sampling only"
                    )
                interval = eval_timeunit(stmt.sampling, now)
                out = tsdb.sample_by(
                    points, interval, t0=t0, t1=t1,
                    group_by_series=False, fns=fns,
                ).select(
                    F.col("bucket_ts").alias("timestamp"),
                    *[f"{f}_value" for f in fns],
                )
                if stmt.limit is not None:
                    out = out.limit(stmt.limit)
                return out
            from raft_c_spark.functions.exact import exact_avg

            agg_map = {
                ast.Fn.MIN: F.min("value"),
                ast.Fn.MAX: F.max("value"),
                ast.Fn.AVG: exact_avg("value"),
            }
            cols = [
                agg_map[fn].alias(f"{fn.value}_value") for fn in stmt.functions
            ]
            out = points.agg(*cols).where(
                F.col(f"{stmt.functions[0].value}_value").isNotNull()
            )
            if stmt.limit is not None:
                out = out.limit(stmt.limit)
            return out

        if stmt.sampling is not None:
            interval = eval_timeunit(stmt.sampling, now)
            # honor the requested aggregate when the sampler supports
            # it (extension — the reference always computes avg in
            # sampling mode, whatever function was written); latest/
            # earliest keep the reference's avg fallback
            fn = stmt.function.value if stmt.function else "avg"
            fn = fn if fn in tsdb._SAMPLE_AGGS else "avg"
            if stmt.fill is not None:
                # FILL(prev|null|<n>) grammar extension — avg-only
                # (sample_by_fill fills the avg series); output gains
                # a `filled` marker column
                if fn != "avg":
                    raise ExecutionError(
                        "FILL supports avg sampling only"
                    )
                out = tsdb.sample_by_fill(
                    points, interval, fill=stmt.fill, t0=t0, t1=t1
                ).select(
                    F.col("bucket_ts").alias("timestamp"),
                    F.col("avg_value").alias("value"),
                    "filled",
                )
                if stmt.limit is not None:
                    out = out.limit(stmt.limit)
                return out
            out = tsdb.sample_by(
                points, interval, t0=t0, t1=t1,
                group_by_series=False, fns=(fn,),
            ).select(
                F.col("bucket_ts").alias("timestamp"),
                F.col(f"{fn}_value").alias("value"),
            )
        elif stmt.function is ast.Fn.MIN:
            out = tsdb.ts_min(points, group_by_series=False)
        elif stmt.function is ast.Fn.MAX:
            out = tsdb.ts_max(points, group_by_series=False)
        elif stmt.function is ast.Fn.AVG:
            from raft_c_spark.functions.exact import exact_avg

            # avg is executor-TODO in the reference
            # (src/statement_execute.c:235-238); we label the result
            # with the range end (or 0 for full scans) and return an
            # empty frame on empty input, like every other aggregate
            out = (
                points.agg(exact_avg("value").alias("value"))
                .where(F.col("value").isNotNull())
                .withColumn(
                    "timestamp", F.lit(t1 if t1 is not None else 0).cast("long")
                )
                .select("timestamp", "value")
            )
        elif stmt.function is ast.Fn.LATEST:
            out = tsdb.ts_latest(points, group_by_series=False)
        elif stmt.function is ast.Fn.EARLIEST:
            k = stmt.fn_arg or 1
            out = (
                points.orderBy("timestamp", "value")
                .limit(k)
                .select("timestamp", "value")
            )
        else:
            # value tie-break keeps duplicate-ns output order stable
            # across partitionings (mirrors tsdb.ts_scan)
            out = points.select("timestamp", "value").orderBy("timestamp", "value")

        if stmt.limit is not None:
            out = out.limit(stmt.limit)
        return out

    def close(self) -> None:
        pass
