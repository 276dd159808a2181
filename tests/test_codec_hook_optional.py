"""OPTIONAL-DEPENDENCY codec-hook integration tests: prove the
``decoder=``/``extractor=`` escape hatch on :func:`extract_features` with a
REAL third-party codec library plugged in, over payloads produced by this
package's own encoders and over WebDataset tar-shard byte ranges from
:func:`tar_index`.

These tests are SKIPPED in this container (no Pillow / soundfile baked in)
but runnable verbatim on a codec-equipped cluster image — they are the
demonstration that the two honest decode stubs (``multimodal.py``
``real_decode_stub`` / mp3-mp4 sample decode) are an import away from real,
with the Spark-side plumbing (schema, Arrow batching, payload-never-
shuffles) already exercised by the hermetic twin tests in
``test_multimodal.py`` / ``test_multimodal_stdlib.py``.
"""

from __future__ import annotations

import io
import tarfile

import pytest

PIL = pytest.importorskip("PIL.Image", reason="Pillow not in this container")


def _png_payload():
    from iatlas_cbioportal_export_spark.operators.multimodal import png_encode

    # 4x3 grayscale gradient, encoded by OUR stdlib PNG encoder
    pix = bytes(range(0, 240, 20))
    return png_encode(pix, 4, 3, channels=1), pix


def _pil_mean_extractor(payload: bytes, mime_type: str) -> list[float]:
    """A real decoder wired into the extract_features hook: PIL decode →
    per-band mean pixel value as the feature vector."""
    img = PIL.open(io.BytesIO(payload))
    bands = img.split()
    return [
        float(sum(b.getdata())) / (img.width * img.height) for b in bands
    ]


def test_pil_decoder_plugs_into_extract_features(spark):
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        extract_features,
    )

    payload, pix = _png_payload()
    media = spark.createDataFrame(
        [(0, "image", "image/png", payload)],
        "media_id long, modality string, mime_type string, payload binary",
    )
    got = extract_features(media, extractor=_pil_mean_extractor).collect()
    assert len(got) == 1
    # the real library's decode of OUR encoder's bytes matches the raw pixels
    expected_mean = sum(pix) / len(pix)
    assert got[0]["feature"] == pytest.approx([expected_mean])
    assert "payload" not in extract_features(media).columns


def test_pil_decodes_member_from_tar_index_byte_range(spark):
    """The WebDataset path end-to-end with a real codec: tar-shard the PNG,
    index it with tar_index, range-read the member bytes, PIL-decode them —
    the select-then-range-read architecture the demux layer exists for."""
    from iatlas_cbioportal_export_spark.operators.multimodal import tar_index

    payload, pix = _png_payload()
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("sample.png")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    shard = buf.getvalue()

    rows = {r["name"]: r for r in tar_index(shard)}
    off, size = rows["sample.png"]["offset"], rows["sample.png"]["size"]
    member = shard[off : off + size]
    assert member == payload
    img = PIL.open(io.BytesIO(member))
    assert (img.width, img.height) == (4, 3)
    assert bytes(img.getdata()) == pix


def test_pil_reads_our_jpeg_and_gif_encoders():
    """Interop beyond PNG: a real decoder accepts our JPEG and GIF bytes."""
    from iatlas_cbioportal_export_spark.operators.gif_codec import gif_encode
    from iatlas_cbioportal_export_spark.operators.jpeg_codec import (
        jpeg_encode,
    )

    pix = bytes(range(0, 240, 15))  # 4x4 grayscale
    palette = [(v, v, v) for v in pix]
    payloads = (
        jpeg_encode(pix, 4, 4),
        gif_encode(4, 4, bytes(range(16)), palette),
    )
    for payload in payloads:
        img = PIL.open(io.BytesIO(payload))
        assert (img.width, img.height) == (4, 4)
