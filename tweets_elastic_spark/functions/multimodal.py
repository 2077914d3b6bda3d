"""Multimodal columns: opaque binary payloads + typed metadata
(north-star block; schema contract in schemas.MULTIMODAL_ASSET).

Images/audio/video ride through the engine as ``binary`` columns. The three
canonical operations — decode/inspect, feature extraction, frame sampling —
are Arrow-batched ``mapInPandas`` transforms: the Spark-side plumbing
(schemas, batch shapes, 1→1 and 1→N row mappings, partition preservation)
is real and tested; the codec itself is STUBBED because no image/audio
library ships in this container:

* ``decode_assets`` parses the deterministic fake header laid down by
  ``attach_payload`` (or any 8-byte WxH header). A real deployment swaps
  ``_decode_one`` for PIL/ffmpeg — the function raises NotImplementedError
  for real codecs to make the boundary unmistakable.
* ``extract_features`` derives a fixed-dim float vector from payload bytes
  (hash-fold) — stands in for a vision/audio encoder; shape and dtype
  contracts are what the similarity operators downstream consume.
* ``sample_frames`` emits N rows per video asset (1→N inside one Arrow
  batch) — the explode-shaped plumbing a real frame sampler needs.

At 100 TB: binary payloads dominate row size, so these transforms must not
shuffle — all three are narrow (mapInPandas preserves partitioning), and
metadata-only plans prune the payload column entirely (nested-schema
pruning keeps the scan payload-free when only width/height are selected).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id long, modality string, n_bytes long, sha256 string, "
    "width int, height int"
)
FEATURES_SCHEMA = "asset_id long, features array<float>"
FRAMES_SCHEMA = "asset_id long, frame_idx int, byte_offset long, frame_sha string"

REAL_CODECS = False  # flip when PIL/ffmpeg are available in the image


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Turn a text corpus into fake assets: payload = utf-8 bytes of the
    text (deterministic), modality round-robined by id. Stands in for a
    real binary ingest (S3/tar shards of images)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/x-fake").alias("mime_type"),
    )


def _decode_one(payload: bytes, modality: str) -> tuple[int, int]:
    """STUB codec: deterministic pseudo-dimensions from byte length.
    A real decoder would dispatch on modality/mime and raise here only
    for genuinely unsupported codecs."""
    if REAL_CODECS:
        raise NotImplementedError(
            "real image/audio decode requires PIL/ffmpeg — not in this container"
        )
    n = len(payload)
    return 1 + n % 640, 1 + n % 480


def decode_assets(assets: DataFrame) -> DataFrame:
    """1→1 metadata decode over Arrow batches (no shuffle)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_one(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return assets.mapInPandas(decode, DECODED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """1→1 feature extraction: fixed-dim float vector per asset. The stub
    folds sha256 bytes into ``dim`` floats in [-1, 1] — deterministic, so
    downstream ANN results are reproducible in tests."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(p).digest()
                raw = np.frombuffer(
                    (digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32
                )
                feats.append((raw.astype(np.float64) / 2**31 - 1.0).astype(np.float32))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return assets.mapInPandas(featurize, FEATURES_SCHEMA)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """1→N frame sampling for video assets: n evenly spaced byte offsets,
    one output row per frame (the explode-shaped batch contract)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "byte_offset": [], "frame_sha": []}
            for aid, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "video" or len(payload) == 0:
                    continue
                for i in range(n_frames):
                    off = (len(payload) * i) // n_frames
                    chunk = payload[off : off + 16]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["byte_offset"].append(off)
                    out["frame_sha"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return assets.mapInPandas(sample, FRAMES_SCHEMA)
