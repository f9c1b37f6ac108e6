"""Batched result streaming — the ts_stream analog.

The reference streams full-table SELECTs to the client in
≤1000-record batches with an explicit final chunk (ts_stream,
src/timeseries.c:1031-1137; batch size src/tcc.c:22). Spark-side, the
same contract is ``toLocalIterator`` — partitions are materialized
one at a time, so the driver never holds the full result — re-chunked
to the reference's batch size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Row

#: reference stream batch size (src/timeseries.c:1040, src/tcc.c:22)
STREAM_BATCH_SIZE = 1000


def stream_results(
    df: DataFrame, batch_size: int = STREAM_BATCH_SIZE
) -> Iterator[list[Row]]:
    """Yield the result in order as ≤batch_size row chunks; the last
    chunk is the 'final chunk' (possibly empty result → no chunks,
    matching the reference's empty-array response)."""
    batch: list[Row] = []
    for row in df.toLocalIterator():
        batch.append(row)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch
