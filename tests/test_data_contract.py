"""Contract tests on the driver-provided testdata formats.

The driver regenerates /root/testdata between rounds and has already
changed the physical type of ``events.ts`` once (int64 TIMESTAMP(NANOS)
→ µs tz-naive TIMESTAMP between rounds 1 and 2), which silently broke
every consumer that assumed the old layout. These tests pin the
physical schema so a future change fails HERE with a message naming
the consumers to migrate, instead of as a dozen cryptic failures.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

#: every place that hard-codes an assumption about events.ts's
#: physical type — update ALL of them if this contract ever breaks
_TS_CONSUMERS = [
    "raft_c_spark/sources/testdata.py (_ts_ns, events_as_points filters)",
    "raft_c_spark/plans/streaming.py (_EVENT_SCHEMA)",
    "raft_c_spark/plans/events_analytics.py (_events)",
    "raft_c_spark/streaming/ingest.py (ingest schemas)",
    "oracle SQL strings using epoch_ns(ts) (plans/*.py)",
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_physical_type(sf_dir):
    schema = pq.read_schema(os.path.join(sf_dir, "events.parquet"))
    typ = schema.field("ts").type
    assert str(typ) == "timestamp[us]", (
        f"DRIVER DATA FORMAT CHANGED: events.ts in {sf_dir} is {typ}, "
        f"but the engine is written for µs-precision tz-naive "
        f"timestamp[us]. Migrate every consumer: {_TS_CONSUMERS}"
    )
    assert typ.tz is None, (
        f"events.ts in {sf_dir} became tz-aware ({typ.tz}); _ts_ns and "
        f"the oracle epoch_ns() comparisons assume tz-naive-as-UTC. "
        f"Consumers: {_TS_CONSUMERS}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_core_table_key_columns(sf_dir):
    """Column-presence contract for every table the queries read —
    a rename fails here with the table and column spelled out."""
    expected = {
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
        "documents": {"doc_id", "text"},
        "embeddings": {"vec_id", "embedding"},
        "lineitem": {"l_orderkey", "l_quantity", "l_extendedprice", "l_discount"},
        "orders": {"o_orderkey", "o_custkey", "o_orderdate"},
        "customer": {"c_custkey", "c_nationkey"},
    }
    for table, cols in expected.items():
        names = set(pq.read_schema(os.path.join(sf_dir, f"{table}.parquet")).names)
        missing = cols - names
        assert not missing, (
            f"DRIVER DATA FORMAT CHANGED: {table} in {sf_dir} lost "
            f"column(s) {sorted(missing)}; present: {sorted(names)}"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_is_float_list(sf_dir):
    typ = pq.read_schema(os.path.join(sf_dir, "embeddings.parquet")).field(
        "embedding"
    ).type
    assert str(typ) in ("list<item: float>", "list<element: float>"), (
        f"DRIVER DATA FORMAT CHANGED: embeddings.embedding in {sf_dir} "
        f"is {typ}; similarity/dedup kernels assume array<float> "
        f"(float32→double promotion exactness arguments rely on it)"
    )
    import duckdb

    dims = duckdb.sql(
        f"SELECT min(len(embedding)), max(len(embedding)) "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()
    assert dims == (64, 64), (
        f"DRIVER DATA FORMAT CHANGED: embedding dim in {sf_dir} is "
        f"{dims}, engine assumes 64 (hyperplane tables and the "
        f"dedup_embedding_lsh oracle SQL bake dim=64)"
    )
