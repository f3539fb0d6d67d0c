"""Column-masking policies (functions/mask.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from datax_spark.functions.mask import masked_view


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "https://www.shop.example.com:8080/cart?id=9",
             "call 555-123-4567 mail a@b.co", "ACCT-778899"),
            (2, "https://news.example.org/x", "clean text", "ab"),
        ],
        "id long, url string, text string, acct string",
    )


def test_policies(spark):
    out = {
        r["id"]: r
        for r in masked_view(
            _df(spark),
            {"url": "domain", "text": "redact", "acct": "last4"},
        ).collect()
    }
    assert out[1]["url"] == "shop.example.com"
    assert out[2]["url"] == "news.example.org"
    assert "555-123-4567" not in out[1]["text"] and "a@b.co" not in out[1]["text"]
    assert out[1]["acct"] == "*******8899"
    assert out[2]["acct"] == "ab"  # <=4 chars pass through
    assert out[1]["id"] == 1  # unlisted columns untouched


def test_hash_is_referentially_stable_and_null_types(spark):
    out = masked_view(_df(spark), {"acct": "hash", "text": "null"}).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["acct"] == hashlib.md5(b"ACCT-778899").hexdigest()
    assert all(r["text"] is None for r in out)


def test_absent_column_is_an_error_not_a_leak(spark):
    with pytest.raises(ValueError, match="absent column"):
        masked_view(_df(spark), {"ssn": "hash"})
    with pytest.raises(ValueError, match="unknown mask policy"):
        masked_view(_df(spark), {"text": "rot13"}).collect()
