"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The decode/feature-extraction kernels are STUBBED (this container has no
image/audio libraries): ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder parses our
own 16-byte header. Everything Spark-side — schema, batch shapes,
``mapInPandas`` signatures, partition-size control for large blobs — is real
and tested, so swapping in a real codec later is a one-function change.

Blob framing (our deterministic fake "format"):
    magic  4s  = b"OFMM"
    kind   u8  (0=image, 1=audio, 2=video)
    width  u32 le / sample_rate
    height u32 le / n_samples
    chan   u8
    payload: width*height*chan bytes (or n_samples for audio)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"OFMM"
META_SCHEMA = ("blob_id long, kind string, width int, height int, "
               "channels int, n_bytes long")


def make_fake_blob(blob_id: int, kind: int = 0, width: int = 8, height: int = 6,
                   channels: int = 3) -> bytes:
    """Deterministic fake media blob (payload = seeded bytes)."""
    rng = np.random.default_rng([blob_id, kind])
    payload = rng.integers(0, 256, width * height * channels, dtype=np.uint8)
    header = MAGIC + struct.pack("<BIIB", kind, width, height, channels)
    return header + payload.tobytes()


def decode_image(blob: bytes, fake: bool = False) -> np.ndarray:
    """Decode one image blob to (h, w, c) uint8. Real codecs are unavailable
    in this container — only the deterministic fake format is implemented."""
    if not fake:
        raise NotImplementedError(
            "real image decoding requires an image library not present in "
            "this environment; pass fake=True for the deterministic stub")
    if blob[:4] != MAGIC:
        raise ValueError("bad magic")
    kind, width, height, channels = struct.unpack("<BIIB", blob[4:14])
    payload = np.frombuffer(blob, dtype=np.uint8, offset=14)
    return payload.reshape(height, width, channels)


def extract_metadata(df: DataFrame, blob_col: str = "blob",
                     id_col: str = "blob_id") -> DataFrame:
    """Parse headers only (never materializes payloads) — mapInPandas over
    Arrow binary batches."""
    kinds = {0: "image", 1: "audio", 2: "video"}

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                k, w, h, c = struct.unpack("<BIIB", bytes(blob[4:14]))
                rows.append((bid, kinds.get(k, "unknown"), w, h, c, len(blob)))
            yield pd.DataFrame(rows, columns=["blob_id", "kind", "width",
                                              "height", "channels", "n_bytes"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        parse, schema=META_SCHEMA)


def image_features(df: DataFrame, blob_col: str = "blob",
                   id_col: str = "blob_id", fake: bool = True) -> DataFrame:
    """Per-image features (mean/std per channel) via the (stubbed) decoder.
    Batch shape note: blobs can be MBs — keep Arrow batches small via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` and pre-repartition by
    size at real scale."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = decode_image(bytes(blob), fake=fake)
                rows.append((bid, [float(x) for x in img.mean(axis=(0, 1))],
                             float(img.std())))
            yield pd.DataFrame(rows, columns=["blob_id", "channel_means", "pixel_std"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        feats, schema="blob_id long, channel_means array<double>, pixel_std double")


def frame_sample(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id",
                 every: int = 2, fake: bool = True) -> DataFrame:
    """Video frame-sampling plumbing (fake: rows of the image as 'frames');
    one output row per sampled frame — the explode happens Python-side per
    batch, keeping Spark row semantics."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = decode_image(bytes(blob), fake=fake)
                for i in range(0, img.shape[0], every):
                    rows.append((bid, i, img[i].tobytes()))
            yield pd.DataFrame(rows, columns=["blob_id", "frame_idx", "frame"])

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(
        sample, schema="blob_id long, frame_idx int, frame binary")
