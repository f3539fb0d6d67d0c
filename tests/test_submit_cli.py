"""End-to-end spark-submit --py-files deployment test: the CLI job
runner drives both job shapes from JSON specs in a fresh JVM, exactly
the north rule's cluster invocation."""

from __future__ import annotations

import json
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _submit(zip_path: Path, spec_path: Path) -> str:
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[2]",
            "--py-files", str(zip_path),
            str(REPO / "tools" / "submit_job.py"), str(spec_path),
        ],
        capture_output=True, text=True, timeout=480,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_runs_cdc_and_batch_jobs(tmp_path):
    zip_path = tmp_path / "datax_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in (REPO / "datax_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))

    sys.path.insert(0, str(REPO))
    from datax_spark.datagen.generator import EventLogSpec, generate_event_log

    generate_event_log(
        tmp_path / "events",
        EventLogSpec(n_events=300, n_urls=60, n_domains=6, n_epochs=2, seed=9),
    )
    cdc_spec = {
        "reader": {"type": "change_tail", "path": str(tmp_path / "events")},
        "writer": {
            "type": "icetable",
            "path": str(tmp_path / "table"),
            "schema": "url string, warc_ts timestamp, html binary, text string, lang string",
            "numPartitions": 4,
        },
        "checkpoint": str(tmp_path / "ckpt"),
    }
    (tmp_path / "cdc.json").write_text(json.dumps(cdc_spec))
    out = _submit(zip_path, tmp_path / "cdc.json")
    assert "epoch=0" in out and "epoch=1" in out
    assert "table_version=" in out and "total_rows=" in out

    batch_spec = {
        "reader": {
            "type": "parquet",
            "path": str(tmp_path / "events"),
            "column": ["url", "lang"],
            "where": "op = 'I'",
        },
        "writer": {"type": "parquet", "path": str(tmp_path / "out"),
                   "mode": "overwrite"},
    }
    (tmp_path / "batch.json").write_text(json.dumps(batch_spec))
    out = _submit(zip_path, tmp_path / "batch.json")
    assert "rows=" in out

    # a STOCK DataX job.json (plugin-name envelope) runs unchanged
    # through the same CLI — compat.py translates it on the fly
    datax_spec = {"job": {
        "setting": {"speed": {"channel": 1}},
        "content": [{
            "reader": {"name": "hdfsreader", "parameter": {
                "path": [str(tmp_path / "events")], "fileType": "parquet"}},
            "writer": {"name": "hdfswriter", "parameter": {
                "path": str(tmp_path / "dx_out"), "fileType": "orc",
                "writeMode": "truncate"}},
        }]}}
    (tmp_path / "datax.json").write_text(json.dumps(datax_spec))
    _submit(zip_path, tmp_path / "datax.json")
    assert any((tmp_path / "dx_out").glob("*.orc")), "DataX job wrote no orc"
