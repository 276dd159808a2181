"""Multimodal (image/audio/video) column plumbing (north star §7 ext).

Contract: media travel as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas stages over ``mapInPandas``. The decode kernels themselves need
codec libraries that are NOT in this container, so they are stubbed —
clearly marked — behind ``decoder=`` hooks with a deterministic fake; the
Spark-side plumbing (schema, partition sizing, UDF signatures, batch shapes)
is real and tested.

Scale notes: binary payloads dominate I/O — the operators never shuffle the
payload; derived features/metadata (small) are the only columns that move.
``spark.sql.files.maxPartitionBytes`` bounds scan partitions; Arrow batch
size bounds decode memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def real_decode_stub(payload: bytes, mime_type: str) -> object:
    """STUB: real decode requires codec libs (Pillow/librosa/av) not present
    in this container. Wire a real decoder here on a cluster image."""
    raise NotImplementedError(
        "media decode requires codec libraries not available in this environment; "
        "pass decoder=fake_feature_extractor for hermetic runs"
    )


def fake_feature_extractor(payload: bytes, mime_type: str, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + feature-extract': a dim-length feature
    derived from payload bytes. Keeps the full pipeline runnable/testable."""
    acc = [0] * dim
    for i, byte in enumerate(payload):
        acc[i % dim] = (acc[i % dim] * 31 + byte) % 1_000_003
    return [a / 1_000_003 for a in acc]


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive typed metadata (size) from the binary payload — JVM-side."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long"))


def extract_features(
    media: DataFrame,
    extractor: Callable[[bytes, str], list[float]] = fake_feature_extractor,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The payload column is dropped from the OUTPUT schema — features and
    metadata continue downstream; bytes never shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [
                extractor(bytes(p), m)
                for p, m in zip(batch["payload"], batch["mime_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "modality": batch["modality"],
                    "n_bytes": [len(bytes(p)) for p in batch["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    video: DataFrame, every_n: int = 30, frame_count_col: str = "n_frames"
) -> DataFrame:
    """Frame-sampling PLAN for video rows: expand (media_id, frame_index)
    pairs for every ``every_n``-th frame — pure JVM ``sequence``/``explode``;
    the actual frame decode plugs in as an :func:`extract_features` stage."""
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(frame_count_col) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )


def ingest_binary_files(
    spark,
    path: str,
    pattern: str = "*",
) -> DataFrame:
    """Raw-file ingestion via Spark's ``binaryFile`` source — the first hop
    of any multimodal pipeline: a directory of opaque media files becomes
    (path, modificationTime, length, content) rows, one per file, read in
    parallel by the tasks that own each file split. Downstream: parse ids
    out of filenames, attach typed metadata, and hand ``content`` to the
    Arrow feature-extract path (:func:`extract_features`).

    Scale notes: binaryFile loads each file WHOLE into one row — it is the
    ingest format for object-store media dumps (one row per image/audio
    clip), not for huge containers; size file batches with
    ``spark.sql.files.maxPartitionBytes`` and convert to parquet with the
    payload as a binary column at the boundary (same economics as the XML
    reader). Zero-byte files produce NO row (source behavior) — presence
    checks belong to a directory listing, not this scan."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )


def wav_feature_extractor(
    payload: bytes, mime_type: str, buckets: int = 8
) -> list[float]:
    """REAL audio decode for PCM WAV — stdlib only (``wave`` + ``struct``),
    so unlike :func:`real_decode_stub` this runs in this container: parse
    the RIFF header, decode 8/16-bit mono PCM frames, and emit a
    ``buckets``-length envelope of integer mean-abs-amplitude ppm per
    temporal bucket (``sum|s|·1e6 // n`` — integer-exact, so the value is
    reproducible by any engine that can see the samples). The compressed /
    container formats (mp3/ogg/mp4) still require codec libs and stay
    behind the stub."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width, n_frames = w.getnchannels(), w.getsampwidth(), w.getnframes()
        raw = w.readframes(n_frames)
    if n_ch != 1 or width not in (1, 2):
        raise NotImplementedError(
            f"wav_feature_extractor supports 8/16-bit mono PCM, got "
            f"channels={n_ch} sampwidth={width}"
        )
    if width == 2:
        samples = struct.unpack(f"<{n_frames}h", raw)
    else:  # 8-bit WAV is unsigned, centred at 128
        samples = [b - 128 for b in raw]
    n = len(samples)
    if n == 0:
        return [0.0] * buckets
    per = max(1, n // buckets)
    feats = []
    for b in range(buckets):
        chunk = samples[b * per : (b + 1) * per] if b < buckets - 1 else samples[
            (buckets - 1) * per :
        ]
        if not chunk:
            feats.append(0.0)
            continue
        feats.append(float(sum(abs(s) for s in chunk) * 1_000_000 // len(chunk)))
    return feats


def _netpbm_parse(payload: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse a binary netpbm header (P5/P6, comments allowed) →
    (channels, width, height, maxval, pixel bytes)."""
    if not payload.startswith((b"P5", b"P6")):
        raise NotImplementedError("netpbm decode handles P5/P6 only")
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    channels = 3 if payload.startswith(b"P6") else 1
    pix = payload[i : i + width * height * channels]
    return channels, width, height, maxval, pix


def netpbm_feature_extractor(payload: bytes, mime_type: str) -> list[float]:
    """REAL image decode for binary netpbm (P5 greyscale / P6 RGB) —
    stdlib-only header parse + raw pixel bytes. Feature: [width, height,
    per-channel mean-intensity ppm] (``sum·1e6 // n`` integer-exact).
    JPEG/PNG stay behind the stub (zlib/DCT codecs)."""
    channels, width, height, _maxval, pix = _netpbm_parse(payload)
    n = width * height
    means = []
    for c in range(channels):
        total = sum(pix[k] for k in range(c, len(pix), channels))
        means.append(float(total * 1_000_000 // n))
    return [float(width), float(height), *means]


def netpbm_resize(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize for binary netpbm — nearest-neighbour sampling
    (``src_x = x·W // out_w``, ``src_y = y·H // out_h``: pure integer
    arithmetic, so any engine can replay which source pixels survive),
    re-encoded as the same P5/P6 format. This is the standard
    thumbnail/downscale stage of an image-training pipeline, runnable here
    without codec libraries; interpolating resizes for jpeg/png belong to
    the stubbed codec path."""
    channels, width, height, maxval, pix = _netpbm_parse(payload)
    out = bytearray()
    for y in range(out_h):
        sy = y * height // out_h
        row = sy * width * channels
        for x in range(out_w):
            sx = x * width // out_w
            k = row + sx * channels
            out += pix[k : k + channels]
    magic = b"P6" if channels == 3 else b"P5"
    header = magic + b"\n%d %d\n%d\n" % (out_w, out_h, maxval)
    return bytes(header) + bytes(out)


def stdlib_decoder(payload: bytes, mime_type: str) -> list[float]:
    """Dispatching REAL decoder for the formats stdlib can handle — WAV
    audio and binary netpbm images; anything needing codec libraries
    (jpeg/png/mp3/mp4) raises through :func:`real_decode_stub`, keeping the
    stub honest rather than faking those paths."""
    mt = (mime_type or "").lower()
    if mt in ("audio/wav", "audio/x-wav", "audio/wave"):
        return wav_feature_extractor(payload, mime_type)
    if mt in ("image/x-portable-graymap", "image/x-portable-pixmap"):
        return netpbm_feature_extractor(payload, mime_type)
    return real_decode_stub(payload, mime_type)  # type: ignore[return-value]


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int,
    resizer: Callable[[bytes, int, int], bytes] = netpbm_resize,
) -> DataFrame:
    """Image resize as an Arrow ``mapInPandas`` stage: payload in → resized
    payload out, schema preserved — the standard thumbnail/normalize hop
    before feature extraction. The payload stays within the stage's tasks
    (narrow; nothing shuffles); ``resizer`` plugs real codec resizes in on
    a cluster image, :func:`netpbm_resize` is the stdlib-real default."""
    schema = media.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = batch.copy()
            out["payload"] = [
                resizer(bytes(p), out_w, out_h) for p in batch["payload"]
            ]
            yield out

    return media.mapInPandas(run, schema=schema)
