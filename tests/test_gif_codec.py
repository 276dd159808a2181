"""Baseline GIF codec (round 7): real LZW + container walk, pure stdlib."""

import random

import pytest

from iatlas_cbioportal_export_spark.operators.gif_codec import (
    gif_decode,
    gif_encode,
    gif_parse_metadata,
    gif_resize,
    lzw_compress,
    lzw_decompress,
)

#: the canonical 1x1 single-color GIF every spec walkthrough uses:
#: clear(100) pixel-0(000) eoi(101) packed LSB-first into 0x44 0x01
_ONE_BY_ONE = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00"
    b"\xff\xff\xff\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    b"\x02\x02\x44\x01\x00\x3b"
)


def test_decode_canonical_one_by_one():
    w, h, rgb = gif_decode(_ONE_BY_ONE)
    assert (w, h) == (1, 1)
    assert rgb == b"\xff\xff\xff"  # index 0 = white in this palette
    meta = gif_parse_metadata(_ONE_BY_ONE)
    assert meta["width"] == 1 and meta["n_frames"] == 1
    assert meta["brand"] == "89a"


def test_lzw_roundtrip_various_code_sizes():
    rng = random.Random(3)
    for mcs in (2, 3, 4, 8):
        data = bytes(rng.randrange(1 << mcs) for _ in range(500))
        assert lzw_decompress(lzw_compress(data, mcs), mcs, len(data)) == data


def test_lzw_cscsc_special_case():
    # 'aaa...' immediately exercises code == len(table) (prev + prev[0])
    data = b"\x00" * 50
    assert lzw_decompress(lzw_compress(data, 2), 2, 50) == data


def test_lzw_dictionary_cap_reclear():
    rng = random.Random(9)
    # enough distinct phrases to hit the 4096-entry cap and force re-CLEAR
    data = bytes(rng.randrange(4) for _ in range(60_000))
    assert lzw_decompress(lzw_compress(data, 2), 2, len(data)) == data


@pytest.mark.parametrize("interlaced", [False, True])
@pytest.mark.parametrize("ncolors", [2, 5, 16, 256])
def test_encode_decode_roundtrip(interlaced, ncolors):
    rng = random.Random(ncolors * 2 + interlaced)
    w, h = 19, 13
    palette = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(ncolors)
    ]
    idx = bytes(rng.randrange(ncolors) for _ in range(w * h))
    got_w, got_h, rgb = gif_decode(
        gif_encode(w, h, idx, palette, interlaced=interlaced)
    )
    assert (got_w, got_h) == (w, h)
    assert rgb == b"".join(bytes(palette[i]) for i in idx)


def test_resize_nearest_neighbour_exact():
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    w, h = 8, 4
    idx = bytes((x + y) % 4 for y in range(h) for x in range(w))
    resized = gif_resize(gif_encode(w, h, idx, palette), 4, 2)
    got_w, got_h, rgb = gif_decode(resized)
    assert (got_w, got_h) == (4, 2)
    for y in range(2):
        for x in range(4):
            src = idx[(y * h // 2) * w + (x * w // 4)]
            assert rgb[3 * (y * 4 + x) : 3 * (y * 4 + x) + 3] == bytes(
                palette[src]
            )


def test_metadata_counts_animation_frames():
    palette = [(1, 2, 3), (4, 5, 6)]
    single = gif_encode(3, 3, bytes(9), palette)
    # splice a second image descriptor in front of the trailer
    frame = single[single.index(b"\x2c") : -1]
    animated = single[:-1] + frame + b"\x3b"
    assert gif_parse_metadata(animated)["n_frames"] == 2
    assert gif_parse_metadata(single)["n_frames"] == 1


def test_rejects_non_gif():
    with pytest.raises(ValueError):
        gif_decode(b"NOTAGIF" + bytes(40))
    with pytest.raises(ValueError):
        gif_parse_metadata(b"\x89PNG\r\n\x1a\n" + bytes(20))


def test_dispatch_through_multimodal():
    from iatlas_cbioportal_export_spark.operators.multimodal import (
        container_metadata,
        gif_feature_extractor,
        stdlib_decoder,
        stdlib_resizer,
    )

    palette = [(10, 20, 30), (40, 50, 60)]
    payload = gif_encode(4, 2, bytes([0, 1] * 4), palette)
    feats = stdlib_decoder(payload, "image/gif")
    assert feats[:2] == [4.0, 2.0]
    # channel means: half the pixels each color
    assert feats[2] == float((10 + 40) * 4 * 1_000_000 // 8)
    assert gif_feature_extractor(payload, "image/gif") == feats
    meta = container_metadata(payload)
    assert meta["container"] == "gif" and meta["width"] == 4
    resized = stdlib_resizer(payload, 2, 1)
    assert gif_decode(resized)[0] == 2


def test_decodes_real_world_encoder_output():
    """Interop proof: files produced by REAL GIF encoders (the stdlib
    IDLE icon set) decode cleanly — the LZW width-change timing is
    spec-correct, not merely self-consistent with our encoder."""
    import glob
    import os

    icon_dir = (
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/idlelib/Icons"
    )
    if not os.path.isdir(icon_dir):
        pytest.skip("no real-world GIF corpus on this machine")
    paths = sorted(glob.glob(os.path.join(icon_dir, "*.gif")))
    assert paths
    for path in paths:
        data = open(path, "rb").read()
        meta = gif_parse_metadata(data)
        w, h, rgb = gif_decode(data)
        assert (w, h) == (meta["width"], meta["height"])
        assert len(rgb) == 3 * w * h
