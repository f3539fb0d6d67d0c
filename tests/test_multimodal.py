"""Multimodal binary-payload plumbing tests (functions/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.multimodal import (
    decode_payload,
    frame_sample_stub,
    multimodal_meta,
    resize_stub,
)


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta longer payload"), (2, "γunicode")],
        "doc_id long, text string",
    )
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG", "image")


def test_meta_deterministic(payloads):
    rows = {r["doc_id"]: r for r in multimodal_meta(payloads).collect()}
    assert rows[0]["n_bytes"] == 5
    assert rows[2]["n_bytes"] == len("γunicode".encode()) == 9
    for doc_id, r in rows.items():
        assert r["width"] == r["n_bytes"] % 640 + 1
        assert r["height"] == r["n_bytes"] % 480 + 1
        assert r["modality"] == ("image", "audio", "video")[doc_id % 3]


def test_resize_bounds_payload(payloads):
    out = resize_stub(payloads, target_w=8, target_h=8).collect()
    budget = 8 * 8 // 8
    for r in out:
        assert len(r["payload"]) <= budget
        assert (r["width"], r["height"]) == (8, 8)


def test_frame_sample_fanout(payloads):
    out = frame_sample_stub(payloads, n_frames=4)
    counts = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    frames = {
        (r["doc_id"], r["frame_idx"]): r["frame"] for r in out.collect()
    }
    # frames partition the payload deterministically
    assert frames[(0, 0)] == b"a"
    assert frames[(0, 1)] == b"l"
