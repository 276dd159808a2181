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
