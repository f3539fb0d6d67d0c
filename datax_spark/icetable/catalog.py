"""Catalog — name-addressed tables over a shared warehouse root.

Every real lake deployment addresses tables by ``namespace.table``
through a catalog (Hive metastore, Glue, Iceberg REST), not by storage
path; jobs reference names so storage can move without touching every
job spec. This models that layer minimally and safely:

* the catalog IS a directory: ``<warehouse>/<namespace>/<table>`` holds
  the IceTable; no registry file can drift from the storage truth, and
  listing is a directory walk of metadata-scale cost;
* properties that must survive a table's whole life (the namespace
  registry itself, default table properties applied at create) live in
  one ``catalog.json`` written atomically (tmp + rename);
* ``rename_table`` is a directory rename — atomic on POSIX, and safe
  here because every path INSIDE a table root is root-relative by
  format design (the same property the zero-copy clone relies on).

Intentional non-goals (documented, not silently absent): no
cross-catalog federation, no authorization, and no concurrent
create/rename arbitration beyond filesystem atomicity — the same
single-warehouse scope as a Hive metastore pointed at one filesystem.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from datax_spark.icetable.table import IceTable


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str | Path):
        self.spark = spark
        self.root = Path(warehouse)
        self.root.mkdir(parents=True, exist_ok=True)

    # -------------------------------------------------------------- #
    # config
    # -------------------------------------------------------------- #
    def _config(self) -> dict[str, Any]:
        p = self.root / "catalog.json"
        if not p.exists():
            return {"namespaces": {}, "defaults": {}}
        return json.loads(p.read_text())

    def _write_config(self, cfg: dict[str, Any]) -> None:
        tmp = self.root / f".tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(json.dumps(cfg, indent=1, sort_keys=True))
        os.replace(tmp, self.root / "catalog.json")

    # -------------------------------------------------------------- #
    # namespaces
    # -------------------------------------------------------------- #
    def create_namespace(self, name: str, properties: dict | None = None) -> None:
        self._check_ident(name)
        cfg = self._config()
        if name in cfg["namespaces"]:
            raise FileExistsError(f"namespace {name!r} exists")
        cfg["namespaces"][name] = dict(properties or {})
        (self.root / name).mkdir(parents=True, exist_ok=True)
        self._write_config(cfg)

    def list_namespaces(self) -> list[str]:
        return sorted(self._config()["namespaces"])

    # -------------------------------------------------------------- #
    # tables
    # -------------------------------------------------------------- #
    def _split(self, ident: str) -> tuple[str, str]:
        if ident.count(".") != 1:
            raise ValueError(
                f"table identifier must be namespace.table, got {ident!r}"
            )
        ns, tbl = ident.split(".")
        self._check_ident(ns)
        self._check_ident(tbl)
        return ns, tbl

    @staticmethod
    def _check_ident(s: str) -> None:
        if not s or not all(c.isalnum() or c == "_" for c in s):
            raise ValueError(
                f"identifier {s!r} must be non-empty [A-Za-z0-9_]"
            )

    def table_path(self, ident: str) -> Path:
        ns, tbl = self._split(ident)
        return self.root / ns / tbl

    def create_table(
        self,
        ident: str,
        schema: T.StructType,
        num_partitions: int = 16,
        key_column: str = "url",
        properties: dict[str, Any] | None = None,
    ) -> IceTable:
        ns, _ = self._split(ident)
        cfg = self._config()
        if ns not in cfg["namespaces"]:
            raise KeyError(f"namespace {ns!r} does not exist; create it first")
        # catalog-level default table properties (e.g. the zstd fleet
        # default) merge UNDER per-table ones
        props = {**cfg.get("defaults", {}), **(properties or {})}
        return IceTable.create(
            self.spark,
            self.table_path(ident),
            schema,
            num_partitions=num_partitions,
            key_column=key_column,
            properties=props,
        )

    def load_table(self, ident: str) -> IceTable:
        return IceTable.load(self.spark, self.table_path(ident))

    def table_exists(self, ident: str) -> bool:
        return (self.table_path(ident) / "metadata" / "version-hint.text").exists()

    def list_tables(self, namespace: str) -> list[str]:
        self._check_ident(namespace)
        base = self.root / namespace
        if not base.exists():
            raise KeyError(f"namespace {namespace!r} does not exist")
        return sorted(
            f"{namespace}.{p.name}"
            for p in base.iterdir()
            if (p / "metadata" / "version-hint.text").exists()
        )

    def rename_table(self, src: str, dst: str) -> None:
        """Atomic directory rename — valid because table-internal paths
        are all root-relative (same invariant the clone uses)."""
        dst_ns, _ = self._split(dst)
        if dst_ns not in self._config()["namespaces"]:
            raise KeyError(f"namespace {dst_ns!r} does not exist")
        if not self.table_exists(src):
            raise FileNotFoundError(f"no table {src!r}")
        if self.table_exists(dst):
            raise FileExistsError(f"table {dst!r} exists")
        os.rename(self.table_path(src), self.table_path(dst))

    def drop_table(self, ident: str, purge: bool = False) -> None:
        """Unregister the table. ``purge=True`` deletes the data too;
        the default refuses to silently destroy bytes and instead
        renames the root into a trash area for out-of-band cleanup."""
        if not self.table_exists(ident):
            raise FileNotFoundError(f"no table {ident!r}")
        path = self.table_path(ident)
        if purge:
            import shutil

            shutil.rmtree(path)
        else:
            trash = self.root / "_trash" / f"{ident}-{uuid.uuid4().hex[:8]}"
            trash.parent.mkdir(parents=True, exist_ok=True)
            os.rename(path, trash)

    def set_defaults(self, properties: dict[str, Any]) -> None:
        """Catalog-level default table properties for future creates."""
        cfg = self._config()
        cfg["defaults"] = {**cfg.get("defaults", {}), **properties}
        self._write_config(cfg)
