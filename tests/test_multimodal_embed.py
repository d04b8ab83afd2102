"""Multimodal plumbing + embedding-UDF tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.embed import (
    hash_embed_py,
    make_embed_udf,
)
from quick_and_easy_vectordb_spark.operators.multimodal import (
    decode_image,
    extract_binary_features,
    with_binary_payload,
)


def test_binary_features_match_hashlib(spark):
    rows = [(1, "hello world"), (2, "héllo ünïcode"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = {r.doc_id: r for r in
             extract_binary_features(with_binary_payload(df)).collect()}
    for i, t in rows:
        b = t.encode("utf-8")
        h = hashlib.md5(b).hexdigest()
        assert feats[i].n_bytes == len(b)
        assert feats[i].content_md5 == h
        assert feats[i].fake_width == 16 + int(h[0], 16) * 8
        assert feats[i].fake_height == 16 + int(h[1], 16) * 8


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_hash_embed_udf_matches_python(spark):
    texts = ["a", "vector search engine", "", "ünïcode"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    embed = make_embed_udf("hash")
    got = {r.text: r.v for r in df.select("text", embed("text").alias("v")).collect()}
    for t in texts:
        assert got[t] == hash_embed_py(t)
        assert all(0.0 <= x < 1.0 for x in got[t])


def test_distilbert_backend_gated(spark):
    """Without torch/transformers the DistilBERT backend must fail
    loudly inside the UDF, not silently fall back."""
    df = spark.createDataFrame([("x",)], "text string")
    embed = make_embed_udf("distilbert")
    try:
        import transformers  # noqa: F401
        import torch  # noqa: F401
        has_libs = True
    except ImportError:
        has_libs = False
    if not has_libs:
        with pytest.raises(Exception, match="torch|transformers|distilbert"):
            df.select(embed("text")).collect()


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        make_embed_udf("nope")


def test_sample_frames_fanout_shape(spark):
    from quick_and_easy_vectordb_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world")], "doc_id long, text string"
    )
    out = sample_frames(with_binary_payload(docs), n_frames=3).collect()
    assert len(out) == 6  # 2 docs x 3 frames
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert sorted(by_doc[1]) == [0, 1, 2] and sorted(by_doc[2]) == [0, 1, 2]
    # digests differ per frame and per doc
    assert len({r.frame_md5 for r in out}) == 6


def test_resize_images_binds_params(spark):
    from quick_and_easy_vectordb_spark.operators.multimodal import (
        resize_images,
        with_binary_payload,
    )

    docs = spark.createDataFrame([(1, "img")], "doc_id long, text string")
    a = resize_images(with_binary_payload(docs), 224, 224).first()
    b = resize_images(with_binary_payload(docs), 336, 336).first()
    assert (a.out_w, a.out_h) == (224, 224)
    assert a.resized_md5 != b.resized_md5  # params are part of the digest
