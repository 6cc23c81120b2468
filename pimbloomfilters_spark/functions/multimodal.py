"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed through mapInPandas/mapInArrow with real schemas,
partitioning, and batch shapes.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is STUBBED two ways:
- ``decode_image(..., codec="real")`` raises NotImplementedError — the seam
  where a real decoder plugs in;
- ``codec="fake"`` (default in tests) parses our deterministic PBM1 header
  (12-byte h/w/c little-endian + raw payload) so the Spark-side plumbing —
  schema, UDF signature, per-batch memory shape, partition sizing — is real
  and tested end-to-end.

Scale notes: binary payloads make row-group sizing the knob that matters —
``spark.sql.files.maxPartitionBytes`` bounds scan partitions; Arrow batch
size bounds per-UDF-call memory (batch_rows x avg_payload must fit the
executor).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..hashing import splitmix64

MULTIMODAL_SCHEMA = (
    "item_id long, modality string, data binary, width int, height int, "
    "channels int, n_frames int, source string"
)

_HDR_FMT = "<III"  # height, width, channels
_HDR_SIZE = struct.calcsize(_HDR_FMT)


def synth_multimodal(spark: SparkSession, n_rows: int = 200,
                     num_partitions: int | None = None) -> DataFrame:
    """Deterministic fake multimodal table: 'image' rows carry one PBM1
    frame, 'video' rows carry n_frames concatenated frames."""

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                u = int(splitmix64(np.array([i], dtype=np.uint64))[0])
                modality = ("image", "video", "audio")[u % 3]
                h, w, c = 8 + u % 8, 8 + (u >> 4) % 8, 1 + (u >> 8) % 3
                n_frames = 1 if modality != "video" else 2 + (u >> 12) % 3
                frame_px = h * w * c
                payload = (
                    splitmix64(
                        (np.arange(frame_px * n_frames, dtype=np.uint64)
                         + np.uint64(i * 1_000_003))
                    ) & np.uint64(0xFF)
                ).astype(np.uint8).tobytes()
                data = struct.pack(_HDR_FMT, h, w, c) + payload
                rows.append((int(i), modality, data, w, h, c, n_frames,
                             f"src{u % 4}"))
            yield pd.DataFrame(rows, columns=[
                "item_id", "modality", "data", "width", "height",
                "channels", "n_frames", "source"])

    return spark.range(0, n_rows, numPartitions=num_partitions).mapInPandas(
        _gen, schema=MULTIMODAL_SCHEMA
    )


def _decode_fake(blob: bytes) -> np.ndarray:
    h, w, c = struct.unpack_from(_HDR_FMT, blob, 0)
    n_px = h * w * c
    frames = np.frombuffer(blob, dtype=np.uint8, offset=_HDR_SIZE)
    return frames.reshape(-1, h, w, c)  # (n_frames, h, w, c)


def decode_image(df: DataFrame, data_col: str = "data",
                 codec: str = "fake") -> DataFrame:
    """Adds decoded stats columns. codec='real' is the unimplemented seam."""
    if codec == "real":
        raise NotImplementedError(
            "real image decoding requires PIL/libvips, not present in this "
            "environment; plug a decoder into _decode_fake's position"
        )

    def _stats(batches):
        for pdf in batches:
            outs = []
            for blob in pdf[data_col]:
                arr = _decode_fake(bytes(blob))
                outs.append((float(arr.mean()), float(arr.std()), int(arr.shape[0])))
            res = pdf[["item_id"]].copy()
            res[["px_mean", "px_std", "decoded_frames"]] = outs
            yield res

    return (
        df.select("item_id", data_col)
        .mapInPandas(_stats, "item_id long, px_mean double, px_std double, "
                             "decoded_frames int")
        .join(df.drop(data_col), "item_id")
    )


def resize_images(df: DataFrame, out_h: int = 4, out_w: int = 4,
                  data_col: str = "data") -> DataFrame:
    """Nearest-neighbor resize of every frame (numpy index math — the real
    resize kernel would swap in here). Output is re-encoded PBM1 binary."""

    def _resize(batches):
        for pdf in batches:
            blobs = []
            for blob in pdf[data_col]:
                arr = _decode_fake(bytes(blob))
                nf, h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = arr[:, yi][:, :, xi]
                blobs.append(struct.pack(_HDR_FMT, out_h, out_w, c) + small.tobytes())
            res = pdf[["item_id"]].copy()
            res["data"] = blobs
            res["width"] = out_w
            res["height"] = out_h
            yield res

    return df.select("item_id", data_col).mapInPandas(
        _resize, "item_id long, data binary, width int, height int"
    )


def sample_frames(df: DataFrame, every: int = 2,
                  data_col: str = "data") -> DataFrame:
    """(item_id, frame_idx, frame binary): keep every Nth frame of video
    payloads — the frame-sampling stage of a video pipeline."""

    def _sample(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for item, blob in zip(pdf["item_id"], pdf[data_col]):
                arr = _decode_fake(bytes(blob))
                h, w, c = arr.shape[1:]
                for fi in range(0, arr.shape[0], every):
                    ids.append(int(item))
                    idxs.append(fi)
                    frames.append(struct.pack(_HDR_FMT, h, w, c) + arr[fi].tobytes())
            yield pd.DataFrame({"item_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("item_id", data_col).mapInPandas(
        _sample, "item_id long, frame_idx int, frame binary"
    )


def extract_features(df: DataFrame, data_col: str = "data",
                     dim: int = 16) -> DataFrame:
    """(item_id, feature array<float>): deterministic per-item feature vector
    (channel means + downsampled grid) — the stand-in for a real encoder,
    with the real UDF signature an embedding model would use."""

    def _feat(batches):
        for pdf in batches:
            feats = []
            for blob in pdf[data_col]:
                arr = _decode_fake(bytes(blob)).astype(np.float64)
                flat = arr.mean(axis=0).ravel()
                idx = (np.arange(dim) * max(1, flat.size // dim)) % flat.size
                feats.append((flat[idx] / 255.0).astype(np.float32).tolist())
            res = pdf[["item_id"]].copy()
            res["feature"] = feats
            yield res

    return df.select("item_id", data_col).mapInPandas(
        _feat, "item_id long, feature array<float>"
    )
