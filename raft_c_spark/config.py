"""Config-file loader for the reference's conf format.

Parses the whitespace-separated ``key value-to-end-of-line`` files the
reference server loads with ``-c`` (format and defaults from
``/root/reference/src/config.c:11-16`` (default table),
``:126-166`` (parser: skip blank/'#' lines, key up to the first
space, value = remainder of the line — so list values keep their
internal spaces), example at ``/root/reference/conf/node-0.conf``).

The cluster-placement keys (``type``, ``shard_leaders``,
``raft_replicas``, ``raft_heartbeat_ms``) are parsed for
compatibility and surfaced through the same accessors the reference
exposes (``get``/``get_int``/``get_list``/``get_enum``,
``config.c:56-113``), but drive nothing here: sharding and Raft
replication are excluded by design (BASELINE.json — placement is the
shuffle's job, durability the storage layer's). The ``host`` key DOES
drive the wire server (``wire.serve_from_config``), mirroring
``server.c:318,345``.
"""

from __future__ import annotations

from enum import IntEnum


class NodeType(IntEnum):
    """``config_get_enum`` values (config.c:98-113)."""

    STANDALONE = 0
    SHARD = 1
    REPLICA = 2
    METADATA = 3


#: the reference's default table (config.c:11-16, config_set_default)
DEFAULTS = {
    "id": "0",
    "type": "standalone",
    "host": "127.0.0.1:18777",
    "shard_leaders": "127.0.0.1:8777 127.0.0.1:8877 127.0.0.1:8977",
    "raft_replicas": "127.0.0.1:9777 127.0.0.1:9778",
    "raft_heartbeat_ms": "150",
}


class Config:
    def __init__(self) -> None:
        self._map: dict[str, str] = dict(DEFAULTS)

    def set(self, key: str, value: str) -> None:
        self._map[key] = value

    def load(self, path: str) -> "Config":
        """Parse a conf file over the defaults. Mirrors config_load:
        blank lines and lines starting with ``#`` (after leading
        whitespace) are skipped; the key runs to the first space; the
        value is the rest of the line (internal spaces preserved —
        that is how list values are written); a key with an empty
        value is an error line and is ignored."""
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                stripped = line.lstrip()
                if not stripped or stripped.startswith("#"):
                    continue
                key, _, rest = stripped.partition(" ")
                value = rest.strip()
                if key and value:
                    self._map[key] = value
        return self

    def get(self, key: str) -> str | None:
        return self._map.get(key)

    def get_int(self, key: str) -> int:
        """-1 for a missing key, like config_get_int (config.c:71-78);
        non-numeric values parse to 0 like atoi."""
        value = self._map.get(key)
        if value is None:
            return -1
        try:
            return int(value.split()[0])
        except (ValueError, IndexError):
            return 0

    def get_list(self, key: str) -> list[str]:
        value = self._map.get(key)
        return value.split() if value else []

    def get_enum(self, key: str) -> NodeType | None:
        value = self._map.get(key)
        if value is None:
            return None
        try:
            return NodeType[value.strip().upper()]
        except KeyError:
            return None

    def host_port(self, key: str = "host") -> tuple[str, int]:
        """Split an ``ip:port`` value (cluster_node_from_string's
        job in the reference, server.c:318)."""
        value = self._map.get(key) or DEFAULTS["host"]
        host, _, port = value.rpartition(":")
        return host or "127.0.0.1", int(port)


def load(path: str | None = None) -> Config:
    """Defaults, optionally overlaid with a conf file — the
    ``config_set_default(); config_load(optarg)`` sequence of
    server.c:283-287."""
    cfg = Config()
    if path is not None:
        cfg.load(path)
    return cfg
