"""Tests for sources.corpus_io (JSONL/text ingestion) and
operators.textstats.tokenize_to_ids."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from wikidatabots_spark.sources.corpus_io import (
    CORRUPT_COL,
    read_jsonl_documents,
    read_text_documents,
    write_jsonl,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="hello world", source="a"),
         Row(doc_id=2, text="zig zag", source="b")]
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    back = read_jsonl_documents(spark, out, DOC_SCHEMA)
    rows = sorted(
        back.select("doc_id", "text", "source").collect(), key=lambda r: r.doc_id
    )
    assert [tuple(r) for r in rows] == [
        (1, "hello world", "a"), (2, "zig zag", "b"),
    ]


def test_jsonl_permissive_quarantines_malformed(spark, tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "part0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "source": "s"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "source": "s"}\n'
    )
    back = read_jsonl_documents(spark, str(p), DOC_SCHEMA)
    assert CORRUPT_COL in back.columns
    good = back.where(F.col(CORRUPT_COL).isNull()).collect()
    bad = back.where(F.col(CORRUPT_COL).isNotNull()).collect()
    assert sorted(r.doc_id for r in good) == [1, 2]
    assert len(bad) == 1 and "not json" in bad[0][CORRUPT_COL]
    assert bad[0].doc_id is None  # declared columns null on corrupt rows


def test_jsonl_failfast_raises(spark, tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "part0.jsonl").write_text('{"doc_id": 1}\nnope\n')
    with pytest.raises(Exception):
        read_jsonl_documents(spark, str(p), DOC_SCHEMA, mode="failfast").collect()


def test_jsonl_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError):
        read_jsonl_documents(spark, str(tmp_path), StructType([]))
    with pytest.raises(ValueError):
        read_jsonl_documents(spark, str(tmp_path), DOC_SCHEMA, mode="dropmalformed")


def test_text_documents_stable_ids_and_provenance(spark, tmp_path):
    p = tmp_path / "txt"
    p.mkdir()
    (p / "a.txt").write_text("first doc\nsecond doc\n")
    (p / "b.txt").write_text("third doc\n")
    a = read_text_documents(spark, str(p)).collect()
    b = read_text_documents(spark, str(p)).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)  # stable
    assert {r.text for r in a} == {"first doc", "second doc", "third doc"}
    by_text = {r.text: r for r in a}
    assert by_text["first doc"].source_file.endswith("a.txt")
    assert by_text["third doc"].source_file.endswith("b.txt")
    # same text in different files -> different ids (provenance in the hash)
    (p / "c.txt").write_text("first doc\n")
    c = read_text_documents(spark, str(p)).collect()
    ids = [r.doc_id for r in c if r.text == "first doc"]
    assert len(ids) == 2 and ids[0] != ids[1]


def test_tokenize_to_ids_vocab_and_unk(spark):
    from wikidatabots_spark.operators.textstats import tokenize_to_ids

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="the dog"),
            Row(doc_id=3, text=""),
        ]
    )
    out = {r.doc_id: r for r in tokenize_to_ids(df, vocab_size=3).collect()}
    # counts: the=3, cat/sat/on/mat/dog=1 -> vocab (count desc, word asc):
    # the=1, cat=2, dog=3; everything else UNK=0
    assert out[1].ids == [1, 2, 0, 0, 1, 0]
    assert out[1].n_tokens == 6 and out[1].n_unk == 3
    assert out[2].ids == [1, 3] and out[2].n_unk == 0
    assert out[3].ids == [] and out[3].n_tokens == 0 and out[3].n_unk == 0
