"""raft_c_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference TSDB (codepr/raft-c).

The reference is a single-node C time-series database (custom SQL-like
language over named series of ``(timestamp_ns, double)`` points). This
package re-expresses its full declared capability surface Spark-first:

- data model: one tall DataFrame ``(series: string, timestamp: long ns,
  value: double)`` (reference ``record_t``, src/timeseries.h:50-55);
- queries: declarative DataFrame/SQL plans optimized by Catalyst (the
  reference interprets its AST directly against the storage API,
  src/statement_execute.c:476-513 — we get pruning/pushdown for free);
- storage: series+time partitioned Parquet (the reference's chunk/WAL/
  commitlog machinery, src/timeseries.c / partition.c, is replaced by
  the storage layer — per BASELINE.json it is "not Sparkable");
- beyond parity: large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal columns).
"""

__version__ = "0.1.0"

from raft_c_spark.session import get_spark, ensure_runtime_confs  # noqa: F401
