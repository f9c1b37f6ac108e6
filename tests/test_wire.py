"""Wire-protocol tests — mirroring the reference's encoding suite
(tests/encoding_test.c:1012-1070: round-trips, bad markers, length
mismatches, stream framing incl. final chunk, empty batch, negative
values, overflow) plus an end-to-end client/server session."""

from __future__ import annotations

import pytest

from raft_c_spark import wire
from raft_c_spark.wire import (
    ArrayResponse,
    Request,
    StreamChunk,
    StringResponse,
    WireError,
    decode_request,
    decode_response,
    encode_request,
    encode_response,
)


def test_request_roundtrip():
    raw = encode_request(Request("SELECT value FROM cpu"))
    assert raw == b"$21\r\nSELECT value FROM cpu\r\n"
    req, used = decode_request(raw)
    assert req.query == "SELECT value FROM cpu"
    assert used == len(raw)


def test_request_overflow():
    with pytest.raises(WireError):
        encode_request(Request("x" * wire.QUERYSIZE))
    big = b"$600\r\n" + b"x" * 600 + b"\r\n"
    with pytest.raises(WireError):
        decode_request(big)


def test_request_bad_marker_and_length():
    with pytest.raises(WireError):
        decode_request(b"#5\r\nhello\r\n")
    with pytest.raises(WireError):
        decode_request(b"$5x\r\nhello\r\n")
    with pytest.raises(WireError):
        decode_request(b"$6\r\nhello\r\n")  # length mismatch


def test_string_response_roundtrip():
    for msg, rc, marker in [("OK", 0, b"$"), ("boom", 1, b"!")]:
        raw = encode_response(StringResponse(msg, rc=rc))
        assert raw.startswith(marker)
        resp, used = decode_response(raw)
        assert resp == StringResponse(msg, rc=rc)
        assert used == len(raw)


def test_array_response_roundtrip_negative_values():
    records = ((1643673600000000000, 78.5), (1643673660000000000, -0.25))
    raw = encode_response(ArrayResponse(records))
    assert raw.startswith(b"#2\r\n:1643673600000000000\r\n;78.500000\r\n")
    resp, used = decode_response(raw)
    assert resp.records == records
    assert used == len(raw)


def test_empty_array():
    raw = encode_response(ArrayResponse(()))
    resp, _ = decode_response(raw)
    assert resp == ArrayResponse(())


def test_stream_framing_with_final_chunk():
    c1 = encode_response(StreamChunk(((1, 1.5), (2, 2.5))))
    c2 = encode_response(StreamChunk(((3, 3.5),), is_final=True))
    buf = c1 + c2
    r1, used = decode_response(buf)
    assert r1.records == ((1, 1.5), (2, 2.5)) and not r1.is_final
    buf = buf[used:]
    r2, used = decode_response(buf)
    assert r2.records == ((3, 3.5),) and not r2.is_final
    buf = buf[used:]
    r3, used = decode_response(buf)
    assert r3.is_final and r3.records == ()
    assert not buf[used:]


def test_decode_bad_response_marker():
    with pytest.raises(WireError):
        decode_response(b"@3\r\nfoo\r\n")


def test_server_end_to_end(spark, tmp_path):
    from raft_c_spark.engine import Engine

    engine = Engine(spark, warehouse=str(tmp_path / "wirewh"))
    server = wire.serve(engine)
    host, port = server.server_address
    client = wire.WireClient(host, port)
    try:
        assert client.execute("CREATEDB wdb") == StringResponse(
            "database wdb created"
        )
        client.execute("USE wdb")
        client.execute("CREATE cpu")
        client.execute(
            "INSERT INTO cpu VALUES (1643673600000000000, 78.5),"
            " (1643673660000000000, 80.25)"
        )
        records = client.execute("SELECT value FROM cpu")
        assert records == [
            (1643673600000000000, 78.5),
            (1643673660000000000, 80.25),
        ]
        # aggregates also come back as streamed records
        rec = client.execute(
            "SELECT max(value) FROM cpu BETWEEN 1643673600000000000"
            " AND 1643673660000000000"
        )
        assert rec == [(1643673660000000000, 80.25)]
        # errors use the '!' marker
        err = client.execute("SELECT value FROM ghost")
        assert isinstance(err, StringResponse) and err.rc == 1
        err2 = client.execute("FLY me TO the-moon")
        assert isinstance(err2, StringResponse) and err2.rc == 1
    finally:
        client.close()
        server.shutdown()


def test_server_streams_large_results_in_batches(spark, tmp_path):
    from raft_c_spark.engine import Engine

    engine = Engine(spark, warehouse=str(tmp_path / "wirewh2"))
    server = wire.serve(engine)
    host, port = server.server_address
    client = wire.WireClient(host, port)
    try:
        client.execute("CREATEDB wdb2")
        client.execute("USE wdb2")
        client.execute("CREATE s")
        base = 1_700_000_000_000_000_000
        # bulk rows via the store API — a 2500-tuple INSERT statement
        # would exceed the protocol's QUERYSIZE cap (like the reference)
        engine.store.insert_rows(
            "wdb2", "s", [(base + i, float(i)) for i in range(2500)]
        )
        records = client.execute("SELECT value FROM s")
        assert len(records) == 2500
        assert records[0] == (base, 0.0)
        assert records[-1] == (base + 2499, 2499.0)
    finally:
        client.close()
        server.shutdown()


def test_concurrent_clients_share_session_state(spark, tmp_path):
    """Two connections, concurrent queries: results stay framed
    per-connection; the active DB is server-global (reference
    dbcontext parity, src/dbcontext.c:153-167)."""
    import threading

    from raft_c_spark.engine import Engine

    engine = Engine(spark, warehouse=str(tmp_path / "wirewh3"))
    server = wire.serve(engine)
    host, port = server.server_address
    c1 = wire.WireClient(host, port)
    c2 = wire.WireClient(host, port)
    try:
        c1.execute("CREATEDB shared")
        c1.execute("USE shared")
        c1.execute("CREATE s")
        base = 1_700_000_000_000_000_000
        c1.execute(f"INSERT INTO s VALUES ({base}, 1.0), ({base + 1}, 2.0)")

        results: dict[str, object] = {}

        def run(tag, client):
            results[tag] = [client.execute("SELECT value FROM s") for _ in range(3)]

        t1 = threading.Thread(target=run, args=("c1", c1))
        t2 = threading.Thread(target=run, args=("c2", c2))
        t1.start(); t2.start(); t1.join(60); t2.join(60)
        expect = [(base, 1.0), (base + 1, 2.0)]
        assert results["c1"] == [expect] * 3
        assert results["c2"] == [expect] * 3  # c2 sees c1's USE (global)
    finally:
        c1.close(); c2.close(); server.shutdown()
