"""Multimodal plumbing tests: real Spark-side schema/fan-out/batching,
deterministic fake decode (container has no media libraries)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wikidatabots_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_SCHEMA,
    extract_features,
    sample_frames,
    with_media_meta,
)
from wikidatabots_spark.operators.similarity import knn_brute


def _media(spark):
    rows = [
        (1, bytearray(b"0123456789abcdef"), "image/png"),
        (2, bytearray(b"xy"), "image/png"),
        (3, None, "video/mp4"),
    ]
    return spark.createDataFrame(
        rows, "media_id long, data binary, media_type string"
    )


def test_media_meta_jvm_side(spark):
    out = with_media_meta(_media(spark)).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id[1].size_bytes == 16
    assert by_id[1].sha256 == hashlib.sha256(b"0123456789abcdef").hexdigest()
    assert by_id[3].size_bytes is None and by_id[3].sha256 is None


def test_sample_frames_fanout(spark):
    out = sample_frames(_media(spark), every=1)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    # 16 bytes → 4 chunks of 4; 2 bytes → 2 chunks of 1; null media dropped
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 4
    assert b"".join(bytes(r.frame) for r in sorted(by_id[1], key=lambda r: r.frame_idx)) == b"0123456789abcdef"
    assert len(by_id[2]) == 2
    assert 3 not in by_id


def test_extract_features_deterministic_and_knn_ready(spark):
    df = extract_features(_media(spark))
    rows = {r.media_id: r.features for r in df.collect()}
    assert len(rows[1]) == FEATURE_DIM
    assert rows[3] is None
    # deterministic: same bytes → same features
    again = {r.media_id: r.features for r in extract_features(_media(spark)).collect()}
    assert rows[1] == again[1]
    # plugs into the similarity operator unchanged
    emb = df.where(F.col("data").isNotNull()).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    out = knn_brute(emb, emb, k=1)
    assert out.count() == 2


def test_decode_image_soft_import():
    # decode_image upgrades automatically if an imaging lib appears in the
    # container; without one it must raise the honest NotImplementedError
    # (never a silent wrong answer) — VERDICT r2 next #5
    from wikidatabots_spark.operators.multimodal import decode_image

    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        import io

        import PIL.Image

        buf = io.BytesIO()
        PIL.Image.new("RGB", (2, 2)).save(buf, format="PNG")
        assert decode_image(buf.getvalue()).size == (2, 2)
    else:
        import pytest

        with pytest.raises(NotImplementedError):
            decode_image(b"not-an-image")


def test_resize_media_bounded_and_null_safe(spark):
    from wikidatabots_spark.operators.multimodal import resize_media

    out = resize_media(_media(spark), width=2, height=2).collect()
    by_id = {r.media_id: r for r in out}
    # 16 bytes at 2x2 -> stride 4: positions 0,4,8,12
    assert bytes(by_id[1].resized) == b"048c"
    # shorter than target: stride 1, whole blob survives
    assert bytes(by_id[2].resized) == b"xy"
    assert by_id[3].resized is None
    assert all(r.resized is None or len(r.resized) <= 4 for r in out)


def test_extract_features_arrow_matches_pandas_udf(spark, sf_dir):
    """The mapInArrow path must produce byte-identical features to the
    pandas-UDF path — either API can serve the plan."""
    from wikidatabots_spark.operators.multimodal import (
        extract_features,
        extract_features_arrow,
    )
    from wikidatabots_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("data"),
    )
    via_pandas = {
        r["media_id"]: r["features"]
        for r in extract_features(d).select("media_id", "features").collect()
    }
    via_arrow = {
        r["media_id"]: r["features"]
        for r in extract_features_arrow(d).collect()
    }
    assert via_arrow == via_pandas
    assert len(via_arrow) > 0


def test_extract_features_arrow_plan_is_narrow(spark, sf_dir):
    from wikidatabots_spark.operators.multimodal import extract_features_arrow
    from wikidatabots_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("data"),
    )
    plan = (
        extract_features_arrow(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan or "PythonMapInArrow" in plan
