"""Catalog — databases, series, per-series options.

The reference's control plane is a global hashtable of databases, each
a directory of series directories (tsdb_ht_t, src/dbcontext.c:7,
src/timeseries.c:82-123). Ours is a JSON metadata file beside the
warehouse: catalog state is tiny driver-side metadata; the data plane
is partitioned parquet (see sources/tsstore.py). On a cluster the same
file lives on shared storage (or a metastore) — catalog operations are
O(metadata), never O(data).

Per-series options (stmt_create_t, src/statement_parse.h:204-212):
- retention: parsed-but-ignored in the reference (no expiry code,
  SURVEY §1.3) — we honor it at read time + vacuum;
- duplication policy 'ignore'|'insert': parsed-but-unapplied in the
  reference (TODO at src/statement_execute.c:102) — we apply it at
  ingest.
"""

from __future__ import annotations

import json
import os
import tempfile


class CatalogError(LookupError):
    pass


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._meta_path = os.path.join(warehouse, "_catalog.json")
        self._meta: dict = {"databases": {}}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self._meta = json.load(f)

    def _save(self) -> None:
        # atomic replace so a concurrent reader never sees a torn file
        fd, tmp = tempfile.mkstemp(dir=self.warehouse, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(self._meta, f, indent=1)
        os.replace(tmp, self._meta_path)

    # -- databases ---------------------------------------------------------

    def databases(self) -> list[str]:
        return sorted(self._meta["databases"])

    def has_db(self, name: str) -> bool:
        return name in self._meta["databases"]

    def create_db(self, name: str) -> None:
        self._meta["databases"].setdefault(name, {"series": {}})
        self._save()

    def drop_db(self, name: str) -> None:
        if name not in self._meta["databases"]:
            raise CatalogError(f"database {name!r} does not exist")
        del self._meta["databases"][name]
        self._save()

    # -- series ------------------------------------------------------------

    def _db(self, db: str) -> dict:
        try:
            return self._meta["databases"][db]
        except KeyError:
            raise CatalogError(f"database {db!r} does not exist") from None

    def series(self, db: str) -> dict[str, dict]:
        return self._db(db)["series"]

    def has_series(self, db: str, name: str) -> bool:
        return name in self._db(db)["series"]

    def create_series(
        self,
        db: str,
        name: str,
        retention_ns: int | None = None,
        duplication: str | None = None,
    ) -> bool:
        """Create (or re-create) a series; returns True when the
        series is new. Re-CREATE of an existing series with NO options
        keeps its current retention/duplication (reviewer r8: the
        unconditional assignment silently reset an 'ignore' series to
        the default 'insert' — existing data then obeyed different
        dedup semantics with no warning); re-CREATE WITH options
        updates them explicitly. The reference's ts_create neither
        checks existence nor stores the policy (its TODO at
        src/statement_execute.c:101-103), so the preserve rule is an
        extension with no parity cost."""
        series = self._db(db)["series"]
        existing = series.get(name)
        if existing is not None:
            if retention_ns is None and duplication is None:
                return False
            if retention_ns is not None:
                existing["retention_ns"] = retention_ns
            if duplication is not None:
                existing["duplication"] = duplication
            self._save()
            return False
        series[name] = {
            "retention_ns": retention_ns,
            "duplication": duplication or "insert",
        }
        self._save()
        return True

    def series_opts(self, db: str, name: str) -> dict:
        try:
            return self._db(db)["series"][name]
        except KeyError:
            raise CatalogError(
                f"series {name!r} does not exist in database {db!r}"
            ) from None

    def drop_series(self, db: str, name: str) -> None:
        if name not in self._db(db)["series"]:
            raise CatalogError(f"series {name!r} does not exist in {db!r}")
        del self._db(db)["series"][name]
        self._save()
