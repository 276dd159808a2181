"""Multimodal plumbing: schema/batch contracts are real; decode is stubbed
(codec libs absent in this environment by design)."""

import pytest

from iatlas_cbioportal_export_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_metadata,
    extract_features,
    fake_feature_extractor,
    real_decode_stub,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake payload"), None),
        (2, "audio", "audio/wav", bytearray(b"RIFF fake wav bytes!"), None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_metadata(spark):
    out = attach_metadata(_media(spark))
    sizes = {r["media_id"]: r["n_bytes"] for r in out.collect()}
    assert sizes == {1: 17, 2: 20}


def test_extract_features_deterministic(spark):
    out1 = {r["media_id"]: r["feature"] for r in extract_features(_media(spark)).collect()}
    out2 = {r["media_id"]: r["feature"] for r in extract_features(_media(spark)).collect()}
    assert out1 == out2
    assert len(out1[1]) == 8
    assert out1[1] != out1[2]
    # payload column does not survive into the feature frame
    cols = extract_features(_media(spark)).columns
    assert "payload" not in cols


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode_stub(b"bytes", "image/png")


def test_fake_extractor_pure():
    assert fake_feature_extractor(b"abc", "x") == fake_feature_extractor(b"abc", "x")


def test_sample_frames(spark):
    video = spark.createDataFrame([(9, 65)], "media_id long, n_frames long")
    frames = [r["frame_index"] for r in sample_frames(video, every_n=30).collect()]
    assert frames == [0, 30, 60]


def test_binary_file_ingest_roundtrip(spark, tmp_path):
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        ingest_binary_files,
    )

    payloads = {"a.bin": b"\x00\x01\xffpayload", "b.bin": b"\x7f",
                "empty.bin": b"", "skip.txt": b"x"}
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)
    rows = {
        r["path"].rsplit("/", 1)[-1]: (r["length"], bytes(r["content"]))
        for r in ingest_binary_files(spark, str(tmp_path), "*.bin").collect()
    }
    # glob honored; zero-byte files produce no row (source behavior)
    assert set(rows) == {"a.bin", "b.bin"}
    assert rows["a.bin"] == (10, b"\x00\x01\xffpayload")
    assert rows["b.bin"] == (1, b"\x7f")
