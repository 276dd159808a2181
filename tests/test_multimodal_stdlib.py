"""REAL stdlib decode kernels (WAV / netpbm / PNG) — the non-stubbed half
of the multimodal tier: these formats need no codec libraries (PNG is zlib
inflate + scanline unfiltering), so the decode is genuine in this
container; jpeg/mp3/mp4 stay behind the honest stub."""

import io
import struct
import wave

import pytest


def _wav_bytes(samples, framerate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_wav_extractor_decodes_real_pcm():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        wav_feature_extractor,
    )

    # 16 samples, 8 buckets of 2: bucket means are exact integer ppm
    samples = [0, 10, -20, 20, 5, -5, 100, -100, 1, 1, 2, -2, 0, 0, 7, -9]
    feats = wav_feature_extractor(_wav_bytes(samples), "audio/wav")
    assert len(feats) == 8
    assert feats[0] == (0 + 10) * 1_000_000 // 2
    assert feats[1] == (20 + 20) * 1_000_000 // 2
    assert feats[3] == (100 + 100) * 1_000_000 // 2
    assert feats[7] == (7 + 9) * 1_000_000 // 2


def test_wav_extractor_rejects_stereo():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        wav_feature_extractor,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    with pytest.raises(NotImplementedError, match="mono"):
        wav_feature_extractor(buf.getvalue(), "audio/wav")


def test_netpbm_extractor_p6_and_p5():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        netpbm_feature_extractor,
    )

    # 2x2 RGB: R channel [10,20,30,40], G all 0, B all 255
    pix = bytes(
        [10, 0, 255, 20, 0, 255, 30, 0, 255, 40, 0, 255]
    )
    p6 = b"P6\n2 2\n255\n" + pix
    w, h, r, g, b = netpbm_feature_extractor(p6, "image/x-portable-pixmap")
    assert (w, h) == (2.0, 2.0)
    assert r == (10 + 20 + 30 + 40) * 1_000_000 // 4
    assert g == 0.0 and b == 255 * 1_000_000  # mean intensity x 1e6
    # P5 with a comment line in the header
    p5 = b"P5\n# synthetic\n3 1\n255\n" + bytes([0, 128, 255])
    w, h, grey = netpbm_feature_extractor(p5, "image/x-portable-graymap")
    assert (w, h) == (3.0, 1.0)
    assert grey == (0 + 128 + 255) * 1_000_000 // 3


def test_stdlib_decoder_dispatch_and_honest_stub():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        stdlib_decoder,
    )

    feats = stdlib_decoder(_wav_bytes([0, 0]), "audio/x-wav")
    assert len(feats) == 8
    with pytest.raises(NotImplementedError, match="codec"):
        stdlib_decoder(b"\xff\xd8\xff\xe0jfif...", "image/jpeg")


def test_extract_features_with_real_wav_decoder(spark):
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        extract_features,
        stdlib_decoder,
    )

    rows = [
        (1, "audio", "audio/wav", _wav_bytes([100] * 16)),
        (2, "audio", "audio/wav", _wav_bytes([-50] * 16)),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, modality string, mime_type string, payload binary"
    )
    out = {
        r["media_id"]: r
        for r in extract_features(df, extractor=stdlib_decoder).collect()
    }
    assert out[1]["feature"] == [100 * 1_000_000.0] * 8
    assert out[2]["feature"] == [50 * 1_000_000.0] * 8
    assert out[1]["n_bytes"] == 44 + 32  # minimal RIFF header + 16x2 bytes


def test_netpbm_resize_nearest_neighbour():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        netpbm_feature_extractor,
        netpbm_resize,
    )

    # 4x2 grey ramp → 2x1 picks (0,0) and (2,0)
    p5 = b"P5\n4 2\n255\n" + bytes([10, 20, 30, 40, 50, 60, 70, 80])
    small = netpbm_resize(p5, 2, 1)
    assert small == b"P5\n2 1\n255\n" + bytes([10, 30])
    w, h, mean = netpbm_feature_extractor(small, "image/x-portable-graymap")
    assert (w, h, mean) == (2.0, 1.0, 20_000_000.0)
    # P6 keeps whole pixels together
    p6 = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 200, 201, 202])
    assert netpbm_resize(p6, 1, 1) == b"P6\n1 1\n255\n" + bytes([1, 2, 3])


def test_resize_images_stage(spark):
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        extract_features,
        resize_images,
        stdlib_decoder,
    )

    p5 = b"P5\n4 2\n255\n" + bytes([10, 20, 30, 40, 50, 60, 70, 80])
    df = spark.createDataFrame(
        [(1, "image", "image/x-portable-graymap", p5)],
        "media_id long, modality string, mime_type string, payload binary",
    )
    out = extract_features(
        resize_images(df, 2, 1), extractor=stdlib_decoder
    ).collect()
    assert out[0]["feature"] == [2.0, 1.0, 20_000_000.0]


def test_png_roundtrip_all_filters_grey():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        _png_parse,
        png_encode,
    )

    w, h = 16, 12
    pix = bytes((7 * y + 3 * x) % 256 for y in range(h) for x in range(w))
    for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
        payload = png_encode(pix, w, h, channels=1, filters=filters)
        channels, ww, hh, out = _png_parse(payload)
        assert (channels, ww, hh) == (1, w, h)
        assert out == pix, f"filters={filters}"


def test_png_roundtrip_rgb_rgba():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        _png_parse,
        png_encode,
    )

    w, h = 9, 5
    for channels in (2, 3, 4):
        pix = bytes(
            (y * 31 + x * 7 + c * 11) % 256
            for y in range(h)
            for x in range(w)
            for c in range(channels)
        )
        payload = png_encode(pix, w, h, channels=channels, filters=(4, 3, 1))
        ch, ww, hh, out = _png_parse(payload)
        assert (ch, ww, hh) == (channels, w, h)
        assert out == pix


def test_png_feature_extractor_means():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        png_encode,
        png_feature_extractor,
        stdlib_decoder,
    )

    w, h = 4, 2
    pix = bytes(range(8))  # grey: mean = 3.5 -> 3_500_000 ppm
    payload = png_encode(pix, w, h, channels=1, filters=(2,))
    feats = png_feature_extractor(payload, "image/png")
    assert feats == [4.0, 2.0, 3_500_000.0]
    assert stdlib_decoder(payload, "image/png") == feats


def test_png_unsupported_paths():
    import pytest

    from iatlas_cbioportal_export_spark.operators.multimodal import (
        _png_parse,
        png_encode,
        stdlib_decoder,
    )

    with pytest.raises(NotImplementedError):
        _png_parse(b"notapng")
    with pytest.raises(NotImplementedError):
        png_encode(b"\0", 1, 1, channels=5)
    with pytest.raises(NotImplementedError):
        stdlib_decoder(b"\xff\xd8\xff", "image/jpeg")


def test_png_resize_nearest_neighbour():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        _png_parse,
        png_encode,
        png_resize,
        stdlib_resizer,
    )

    w, h = 16, 12
    pix = bytes((7 * y + 3 * x) % 256 for y in range(h) for x in range(w))
    payload = png_encode(pix, w, h, channels=1, filters=(0, 1, 2, 3, 4))
    small = stdlib_resizer(payload, 8, 6)
    assert small == png_resize(payload, 8, 6)
    ch, ww, hh, out = _png_parse(small)
    assert (ch, ww, hh) == (1, 8, 6)
    # src pixel = (2x, 2y): integer sampling any engine replays
    expect = bytes((7 * (2 * y) + 3 * (2 * x)) % 256
                   for y in range(6) for x in range(8))
    assert out == expect


def test_stdlib_resizer_dispatch():
    import pytest

    from iatlas_cbioportal_export_spark.operators.multimodal import (
        netpbm_resize,
        stdlib_resizer,
    )

    pgm = b"P5\n4 2\n255\n" + bytes(range(8))
    assert stdlib_resizer(pgm, 2, 1) == netpbm_resize(pgm, 2, 1)
    with pytest.raises(NotImplementedError):
        stdlib_resizer(b"\xff\xd8\xffjpeg", 2, 2)
