"""Config-file loader parity: the reference's conf format (key to the
first space, value = rest of line, '#' comments), default table, and
accessor semantics — plus the serve-from-config wire startup path."""

from __future__ import annotations

from raft_c_spark.config import DEFAULTS, Config, NodeType, load

REFERENCE_STYLE = """\
# Cluster config
id                  3
type                shard
host                127.0.0.1:27778
shard_leaders       127.0.0.1:7778 127.0.0.1:7878 127.0.0.1:7978

# Raft replicas, refer to the ID node
raft_replicas       127.0.0.1:8778 127.0.0.1:8779 127.0.0.1:7778
raft_heartbeat_ms   150
"""


def test_defaults_match_reference_table():
    cfg = load(None)
    for key, value in DEFAULTS.items():
        assert cfg.get(key) == value
    assert cfg.get_enum("type") == NodeType.STANDALONE
    assert cfg.host_port() == ("127.0.0.1", 18777)


def test_parse_reference_conf(tmp_path):
    p = tmp_path / "node.conf"
    p.write_text(REFERENCE_STYLE)
    cfg = load(str(p))
    assert cfg.get_int("id") == 3
    assert cfg.get_enum("type") == NodeType.SHARD
    assert cfg.host_port() == ("127.0.0.1", 27778)
    assert cfg.get_list("shard_leaders") == [
        "127.0.0.1:7778", "127.0.0.1:7878", "127.0.0.1:7978",
    ]
    assert cfg.get_list("raft_replicas") == [
        "127.0.0.1:8778", "127.0.0.1:8779", "127.0.0.1:7778",
    ]
    assert cfg.get_int("raft_heartbeat_ms") == 150


def test_accessor_edge_semantics(tmp_path):
    cfg = Config()
    assert cfg.get("nope") is None
    assert cfg.get_int("nope") == -1  # config_get_int's missing-key -1
    assert cfg.get_list("nope") == []
    assert cfg.get_enum("nope") is None
    cfg.set("type", "gibberish")
    assert cfg.get_enum("type") is None  # config_get_enum's -1
    p = tmp_path / "bad.conf"
    p.write_text("keyonly\n# comment\n\nok value\n")
    cfg.load(str(p))
    assert cfg.get("keyonly") is None  # empty value = error line, skipped
    assert cfg.get("ok") == "value"


def test_serve_from_config_binds_configured_host(spark, tmp_path):
    from raft_c_spark.engine import Engine
    from raft_c_spark.wire import WireClient, serve_from_config

    p = tmp_path / "node.conf"
    # port 0 → OS-assigned; proves the host key drives the bind
    p.write_text("host 127.0.0.1:0\ntype standalone\n")
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    server = serve_from_config(eng, str(p))
    try:
        host, port = server.server_address[:2]
        assert host == "127.0.0.1" and port > 0
        client = WireClient(host, port)
        resp = client.execute("CREATEDB cfg_db")
        assert resp is not None
        client.close()
    finally:
        server.shutdown()
