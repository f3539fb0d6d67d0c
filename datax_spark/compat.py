"""DataX job-JSON compatibility: run a REAL DataX ``job.json`` unchanged.

The reference platform (`/root/reference/README.md:2` — the snapshot
publishes no code, so this follows DataX's public job-config format)
takes jobs shaped::

    {"job": {
       "setting": {"speed": {"channel": 3},
                   "errorLimit": {"record": 0, "percentage": 0.02}},
       "content": [{
         "reader": {"name": "mysqlreader", "parameter": {
            "username": "u", "password": "p",
            "column": ["id", "name"], "splitPk": "id", "where": "id > 0",
            "connection": [{"table": ["tbl"],
                            "jdbcUrl": ["jdbc:mysql://host/db"]}]}},
         "writer": {"name": "hdfswriter", "parameter": {
            "path": "/out", "fileType": "orc", "writeMode": "truncate",
            "fieldDelimiter": "\\t"}}}]}}

``translate_datax_job`` maps that onto this engine's jobspec
(``jobspec.run_batch_job``), plugin name by plugin name — the
RDBMS readers/writers become the executable jdbc plans
(tests/test_jdbc_exec.py runs them against embedded Derby), the file
plugins become the parquet/orc/csv/text paths, and the wide-column /
MPP sinks map onto the lake operators that model them (SURVEY §2.1
S7-S10). ``tools/submit_job.py`` auto-detects the ``{"job": ...}``
envelope, so ``spark-submit submit_job.py job.json`` accepts a stock
DataX config directly.

One DataX ``content`` element == one jobspec; multi-content jobs return
a list (DataX runs them as parallel channel groups; here they run
sequentially unless the caller parallelizes).
"""

from __future__ import annotations

from typing import Any

_RDBMS_READERS = {
    "mysqlreader", "oraclereader", "postgresqlreader", "sqlserverreader",
    "rdbmsreader", "drdsreader", "adsreader",
}
_RDBMS_WRITERS = {
    "mysqlwriter", "oraclewriter", "postgresqlwriter", "sqlserverwriter",
    "rdbmswriter", "drdswriter",
}
# DataX fileType → jobspec reader/writer type
_FILE_TYPES = {"text": "csv", "csv": "csv", "orc": "orc",
               "parquet": "parquet", "json": "json"}


def _one(v):
    """DataX wraps scalars in one-element lists pervasively."""
    if isinstance(v, list):
        return v[0] if v else None
    return v


def _jdbc_common(p: dict[str, Any]) -> dict[str, Any]:
    conn = _one(p.get("connection")) or {}
    out = {
        "jdbcUrl": _one(conn.get("jdbcUrl")) or _one(p.get("jdbcUrl")),
        "table": _one(conn.get("table")) or _one(p.get("table")),
        "username": p.get("username"),
        "password": p.get("password"),
        "driver": p.get("driver"),  # engine extension (Derby tests)
    }
    q = _one(conn.get("querySql")) or _one(p.get("querySql"))
    if q:
        out["querySql"] = q
    return {k: v for k, v in out.items() if v is not None}


def _translate_reader(name: str, p: dict[str, Any]) -> dict[str, Any]:
    if name in _RDBMS_READERS:
        r = {"type": "jdbc", **_jdbc_common(p)}
        for src, dst in (("column", "column"), ("where", "where"),
                         ("splitPk", "splitPk"), ("fetchSize", "fetchSize")):
            if p.get(src) is not None:
                r[dst] = p[src]
        if r.get("column") == ["*"]:
            del r["column"]
        return r
    if name in ("hdfsreader", "txtfilereader", "ossreader"):
        ftype = str(p.get("fileType", "text")).lower()
        if ftype not in _FILE_TYPES:
            raise ValueError(f"{name}: unsupported fileType {ftype!r}")
        r: dict[str, Any] = {"type": _FILE_TYPES[ftype],
                             "path": _one(p.get("path"))}
        if r["type"] == "csv":
            r["delimiter"] = p.get("fieldDelimiter", ",")
            # DataX text files are headerless; txtfilereader's skipHeader
            # means a header row exists (Spark then consumes it as names)
            r["header"] = bool(p.get("skipHeader", False))
            cols = p.get("column")
            if cols and cols != ["*"] and isinstance(cols[0], dict):
                # DataX positional {"index": i, "type": t} projections
                r["positional"] = [
                    {"index": int(c["index"]), "type": c.get("type", "string"),
                     "name": c.get("name", f"col{c['index']}")}
                    for c in cols if "index" in c
                ]
        elif p.get("column") and p["column"] != ["*"]:
            r["column"] = [c if isinstance(c, str) else c.get("name")
                           for c in p["column"]]
        return r
    if name in ("hivereader", "odpsreader"):
        r = {"type": "table", "table": p.get("table")}
        if p.get("column") and p["column"] != ["*"]:
            r["column"] = p["column"]
        part = _one(p.get("partition"))
        if part:
            # "pt=20230101" / "pt=*" partition specs → a pushed filter
            if "*" not in part:
                k, _, v = part.partition("=")
                r["where"] = f"{k} = '{v}'"
        return r
    if name == "streamreader":
        # DataX's test source: sliceRecordCount constant rows
        return {
            "type": "datagen_const",
            "count": int(p.get("sliceRecordCount", 1)),
            "columns": [
                {"name": c.get("name", f"col{i}"),
                 "value": c.get("value"),
                 "dtype": c.get("type", "string")}
                for i, c in enumerate(p.get("column", []))
            ],
        }
    raise ValueError(f"unknown DataX reader plugin {name!r}")


def _translate_writer(name: str, p: dict[str, Any]) -> dict[str, Any]:
    if name in _RDBMS_WRITERS:
        w = {"type": "jdbc", **_jdbc_common(p)}
        w["writeMode"] = p.get("writeMode", "insert")
        for k in ("preSql", "postSql"):
            if p.get(k):
                w[k] = p[k]
        return w
    if name in ("hdfswriter", "txtfilewriter", "osswriter"):
        ftype = str(p.get("fileType", "text")).lower()
        if ftype not in _FILE_TYPES:
            raise ValueError(f"{name}: unsupported fileType {ftype!r}")
        mode = {"append": "append", "truncate": "overwrite",
                "overwrite": "overwrite", "nonconflict": "error",
                "nonConflict": "error"}.get(str(p.get("writeMode", "append")), "append")
        w: dict[str, Any] = {"type": _FILE_TYPES[ftype],
                             "path": _one(p.get("path")), "mode": mode}
        if w["type"] == "csv":
            w["delimiter"] = p.get("fieldDelimiter", ",")
            w["header"] = False
        return w
    if name in ("hivewriter", "odpswriter"):
        w = {"type": "table", "table": p.get("table"),
             "mode": "overwrite" if p.get("truncate") else "append"}
        part = _one(p.get("partition"))
        if part and "*" not in part:
            # static partition spec "pt=20230101": the data carries no
            # pt column — the writer adds the constant and (on truncate)
            # replaces ONLY that partition, DataX tunnel semantics
            k, _, v = part.partition("=")
            w["partitionBy"] = [k]
            w["staticPartition"] = {k: v}
        return w
    if name == "adswriter":
        # ADS bulk load (S7): atomic LOAD-OVERWRITE onto the lake table
        w = {"type": "icetable", "path": p.get("path") or p.get("table"),
             "mode": "overwrite"}
        key = _one(p.get("primaryKey")) or p.get("keyColumn")
        if key:
            w["keyColumn"] = key
        return w
    if name in ("otswriter", "hbase11xwriter", "hbase20xwriter"):
        # keyed put sinks (S8/S9): exactly-once keyed MERGE upsert; a
        # batch put is one epoch of full-image I events
        key = (
            _one(p.get("primaryKey")) or {}
        ).get("name") if isinstance(_one(p.get("primaryKey")), dict) else _one(p.get("primaryKey"))
        if key is None and p.get("rowkeyColumn"):
            rk = _one(p.get("rowkeyColumn"))
            key = rk.get("name") if isinstance(rk, dict) else rk
        w = {"type": "icetable_merge", "path": p.get("path") or p.get("table"),
             "synthesizeOps": True}
        if key:
            w["keyColumn"] = key
        return w
    if name == "streamwriter":
        return {"type": "noop"}
    raise ValueError(f"unknown DataX writer plugin {name!r}")


def _translate_transformers(tfs: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Stock DataX ``transformer`` entries → jobspec transforms. DataX
    transformers address Record columns BY POSITION (columnIndex) with
    0-based substring/replace offsets; jobspec resolves ``colIndex``
    against the frame's column order at apply time. dx_groovy is
    per-record scripting — banned on this engine's hot path — and is
    rejected with the vectorized migration path named."""
    out: list[dict[str, Any]] = []
    for tf in tfs or []:
        name = tf.get("name")
        p = tf.get("parameter", {}) or {}
        idx = p.get("columnIndex")
        paras = [str(x) for x in (p.get("paras") or [])]
        if name == "dx_substr":
            # DataX paras [startIndex(0-based), length] → 1-based SQL
            out.append({"op": "substr", "colIndex": idx,
                        "start": int(paras[0]) + 1, "len": int(paras[1])})
        elif name == "dx_pad":
            out.append({"op": "pad", "colIndex": idx,
                        "side": paras[0].lower(), "len": int(paras[1]),
                        "pad": paras[2]})
        elif name == "dx_replace":
            out.append({"op": "replace", "colIndex": idx,
                        "start": int(paras[0]) + 1, "len": int(paras[1]),
                        "with": paras[2]})
        elif name == "dx_filter":
            out.append({"op": "dxFilter", "colIndex": idx,
                        "cmp": paras[0], "value": paras[1]})
        elif name == "dx_groovy":
            raise ValueError(
                "dx_groovy is per-record scripting and does not run on "
                "this engine — port the script to a vectorized transform "
                "(functions/transformers.dx_vectorized) or a spec "
                "'filter'/'mapValues'/'cast' rule"
            )
        else:
            raise ValueError(f"unknown DataX transformer {name!r}")
    return out


def translate_datax_job(job: dict[str, Any]) -> list[dict[str, Any]]:
    """Full DataX ``{"job": {...}}`` envelope → list of jobspecs (one
    per ``content`` element)."""
    j = job.get("job", job)
    setting = j.get("setting", {}) or {}
    specs = []
    for content in j.get("content", []):
        rd = content["reader"]
        wr = content["writer"]
        spec: dict[str, Any] = {
            "reader": _translate_reader(rd["name"], rd.get("parameter", {})),
            "writer": _translate_writer(wr["name"], wr.get("parameter", {})),
        }
        if content.get("transformer"):
            spec["transforms"] = _translate_transformers(content["transformer"])
        st: dict[str, Any] = {}
        speed = setting.get("speed") or {}
        if speed.get("channel") is not None:
            st.setdefault("speed", {})["channel"] = speed["channel"]
        if speed.get("record") is not None:
            st.setdefault("speed", {})["recordPerEpoch"] = speed["record"]
        if speed.get("byte") is not None and speed["byte"] > 0:
            st.setdefault("speed", {})["bytePerEpoch"] = speed["byte"]
        el = setting.get("errorLimit") or {}
        if el:
            lim = {}
            if el.get("record") is not None:
                lim["record"] = el["record"]
            if el.get("percentage") is not None:
                lim["percentage"] = el["percentage"]
            if lim:
                st["errorLimit"] = lim
        if st:
            spec["settings"] = st
        specs.append(spec)
    return specs


def is_datax_job(obj: dict[str, Any]) -> bool:
    """True when the dict is a stock DataX envelope (job.content[].
    reader.name) rather than this engine's native jobspec."""
    try:
        content = obj["job"]["content"]
        return bool(content) and "name" in content[0]["reader"]
    except (KeyError, TypeError, IndexError):
        return False


def run_datax_job(spark, job: dict[str, Any]):
    """Translate + run every content element sequentially; returns the
    last element's output DataFrame (DataX's semantics: one job, n
    parallel channel groups — sequential here)."""
    from datax_spark.jobspec import run_batch_job

    out = None
    for spec in translate_datax_job(job):
        out = run_batch_job(spark, spec)
    return out
