"""JSONL ingestion: clean/corrupt split on a dirty fixture, type
fidelity, and the silent-drop contrast with schema inference.
"""

from __future__ import annotations

import pytest

from clustering_spark.sources import jsonl_source

DIRTY = """\
{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}
{"doc_id": 2, "text": "zweites dokument", "lang": "de", "source": "web"}
not json at all
{"doc_id": 3, "text": "truncated line", "lang": "en"
{"doc_id": 4, "text": "missing fields only"}
{"doc_id": "not-a-number", "text": "bad id type", "lang": "en", "source": "web"}
{"doc_id": 5, "text": "ok again", "lang": "fr", "source": "books"}
"""


@pytest.fixture()
def dirty_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(DIRTY)
    return str(p)


def test_clean_corrupt_split(spark, dirty_path):
    df = jsonl_source.read_jsonl(spark, dirty_path)
    clean, corrupt = jsonl_source.split_corrupt(df)
    ids = sorted(r.doc_id for r in clean.collect())
    # 1,2,5 fully clean; 4 clean with NULL optional fields
    assert ids == [1, 2, 4, 5]
    bad = [r[jsonl_source.CORRUPT_COL] for r in corrupt.collect()]
    assert len(bad) == 3
    assert any("not json at all" in b for b in bad)
    assert any("truncated" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_types_and_missing_fields(spark, dirty_path):
    clean, _ = jsonl_source.split_corrupt(
        jsonl_source.read_jsonl(spark, dirty_path)
    )
    assert dict(clean.dtypes) == {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string",
    }
    row4 = clean.filter("doc_id = 4").collect()[0]
    assert row4.lang is None and row4.source is None


def test_explicit_schema_vs_inference_drift(spark, tmp_path):
    """With inference, a corpus shard whose sampled lines carry only
    string ids silently flips the id type — the engine's explicit
    schema keeps it bigint and quarantines the bad line instead."""
    p = tmp_path / "drift.jsonl"
    p.write_text('{"doc_id": "abc", "text": "x", "lang": "en", "source": "w"}\n')
    inferred = spark.read.json(str(p))
    assert dict(inferred.dtypes)["doc_id"] == "string"  # drifted
    clean, corrupt = jsonl_source.split_corrupt(
        jsonl_source.read_jsonl(spark, str(p))
    )
    assert dict(clean.dtypes)["doc_id"] == "bigint"
    assert clean.count() == 0 and corrupt.count() == 1
