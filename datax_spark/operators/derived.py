"""Derived-artifact registry: one table, everything built from it.

A CDC table feeds maintained artifacts — BM25/trigram/IVF/MinHash
indexes, materialized join views — each carrying its own sync cursor.
This module records them IN the source table's properties
(``derived_artifacts``: a list of {kind, root} entries) so operations
that must reach *everything derived from the table* can:

- ``sync_all``: advance every registered artifact from the changelog
  (what a maintenance tick or the table_tool runs after ingest);
- ``purge_everywhere``: the compliance path. The table's ``purge_keys``
  destroys the rows AND their changelog history, so artifact purging
  cannot be driven by pre-images after the fact — this helper resolves
  each artifact's id values via ``table.lookup`` while the rows still
  exist, purges the table, then physically erases the ids from every
  artifact (``purge_ids``: tombstone + immediate compact). Registered
  join views (kind ``icetable_view``) share the key column and purge
  through their own ``purge_keys``.

Registration is idempotent and survives in table metadata (the
properties travel with clones and through snapshot expiry)."""

from __future__ import annotations

from pathlib import Path


def register(table, kind: str, root) -> None:
    """Record a derived artifact on its source table. ``kind`` ∈
    {bm25, trigram, ivf, minhash, icetable_view}."""
    if kind not in _LOADERS:
        raise ValueError(f"unknown artifact kind {kind!r} "
                         f"(use {sorted(_LOADERS)})")
    arts = table.properties().get("derived_artifacts") or []
    entry = {"kind": kind, "root": str(root)}
    if entry not in arts:
        table.set_properties({"derived_artifacts": arts + [entry]})


def registered(table) -> list[dict]:
    return list(table.properties().get("derived_artifacts") or [])


def _load_bm25(spark, root):
    from datax_spark.operators.text_index import Bm25Index

    return Bm25Index(spark, root)


def _load_trigram(spark, root):
    from datax_spark.operators.trigram_index import TrigramIndex

    return TrigramIndex(spark, root)


def _load_ivf(spark, root):
    from datax_spark.operators.ann_index import IvfIndex

    return IvfIndex(spark, root)


def _load_minhash(spark, root):
    from datax_spark.operators.dedup_index import MinHashIndex

    return MinHashIndex.load(spark, root)


def _load_view(spark, root):
    from datax_spark.icetable.table import IceTable

    return IceTable.load(spark, root)


_LOADERS = {
    "bm25": _load_bm25,
    "trigram": _load_trigram,
    "ivf": _load_ivf,
    "minhash": _load_minhash,
    "icetable_view": _load_view,
}


def sync_all(spark, table) -> dict:
    """Advance every registered index artifact from the table
    changelog. Join views are skipped here (their sync needs BOTH
    source tables — use sync_join_view / the job writer). Note the
    MinHash index's sync RETURNS the new near-dup pairs; this
    maintenance path only counts them — a pipeline that consumes the
    pairs (dedup decisions) should call its sync directly instead."""
    out = {}
    for e in registered(table):
        if e["kind"] == "icetable_view":
            continue
        art = _LOADERS[e["kind"]](spark, e["root"])
        res = art.sync(table)
        out[e["root"]] = (
            {"new_pairs": res.count()} if hasattr(res, "count") else res
        )
    return out


def purge_everywhere(spark, table, keys: list) -> dict:
    """Right-to-be-forgotten across the table AND everything derived:
    resolve each artifact's id values while the rows still exist, purge
    the table (rows + retained history + quarantine), then physically
    erase from every artifact. Returns per-target purge counts.

    Resolution caveat: an artifact whose id_col differs from the table
    key can only be reached while the key is still LIVE in the table —
    purge requests for already-deleted rows should name the artifact
    ids directly via each artifact's purge_ids. Artifacts keyed on the
    table key itself (the CDC-native shape) have no such window."""
    arts = [(e, _LOADERS[e["kind"]](spark, e["root"])) for e in registered(table)]
    key = table.key_column
    id_cols = {
        (art.meta["id_col"] if hasattr(art, "meta") else key)
        for e, art in arts
        if e["kind"] != "icetable_view"
    }
    rows = (
        table.lookup(keys).select(key, *sorted(id_cols - {key})).collect()
        if arts
        else []
    )
    out = {"table": table.purge_keys(keys)}
    for e, art in arts:
        if e["kind"] == "icetable_view":
            out[e["root"]] = art.purge_keys(keys)
            continue
        id_col = art.meta["id_col"]
        ids = [r[id_col] for r in rows] if id_col != key else list(keys)
        out[e["root"]] = art.purge_ids(ids)
    return out
