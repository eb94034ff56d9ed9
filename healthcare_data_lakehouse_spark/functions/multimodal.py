"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the lakehouse as ``binary`` columns with a
metadata struct (modality, codec, dims). The Spark-side machinery —
schema, Arrow-batched ``mapInPandas`` feature extraction, partition-safe
batch iteration — is real and tested; the actual media DECODE step is
stubbed (no image/audio libraries in this container) behind
``decode_stub``, which raises ``NotImplementedError`` unless
``fake=True``, in which case it derives deterministic pseudo-features from
the bytes so the pipeline shape is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "as_binary_assets",
    "extract_binary_features",
    "decode_stub",
    "sample_frames",
]

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("modality", StringType()),
    StructField("codec", StringType()),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("modality", StringType()),
    StructField("fake_width", LongType()),
    StructField("fake_height", LongType()),
])


def as_binary_assets(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Model any bytes-bearing column as a multimodal asset table
    (here: utf-8 text bytes standing in for media payloads)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(payload_col), "utf-8").alias("payload"),
        F.lit("image").alias("modality"),
        F.lit("raw").alias("codec"),
    )


def decode_stub(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Media decode STUB. Real deployments plug PIL/ffmpeg here; this
    container has neither, so ``fake=True`` derives deterministic
    pseudo-dimensions from the payload bytes (keeps the pipeline testable
    without pretending to decode)."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; pass fake=True for deterministic "
            "pseudo-features"
        )
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1)


def extract_binary_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the columnar batch shape end-to-end: each
    partition streams pandas batches through the extractor — the pattern a
    real CPU/GPU decode stage uses (one Python worker per core, payload
    bytes never hit the driver).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_stub(p, fake=fake_decode) for p in payloads]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_bytes": [len(p) for p in payloads],
                "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                "modality": pdf["modality"],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
            })

    return assets.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("n_frames", LongType()),
    StructField("frame_sha", StringType()),
    StructField("resized_w", LongType()),
    StructField("resized_h", LongType()),
])


def sample_frames(
    assets: DataFrame, max_frames: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling + resize planning over "video" payloads — the
    variable-cardinality (explode-shaped) pandas-UDF pattern.

    Each input asset yields up to ``max_frames`` evenly-strided frame rows
    (stride = ceil(n_frames / max_frames)). The decode is the same
    deterministic stub (frame count derived from payload length, frame
    hash from payload+index, resize dims integer-scaled into a 224 box);
    the Spark-side mechanics — mapInPandas emitting MORE rows than it
    consumes, per-partition batch streaming, typed output schema — are
    exactly what a real ffmpeg frame sampler uses.
    """
    if not fake_decode:
        raise NotImplementedError(
            "video decoding requires media libraries not present in this "
            "environment; pass fake_decode=True for the deterministic stub"
        )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "frame_idx", "n_frames", "frame_sha",
                "resized_w", "resized_h",
            )}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = len(payload)
                n_frames = n // 100 + 1
                stride = -(-n_frames // max_frames)  # ceil
                w, h = decode_stub(payload, fake=True)
                m = max(w, h)
                for idx in range(0, n_frames, stride):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(n_frames)
                    out["frame_sha"].append(
                        hashlib.sha256(
                            payload + b":" + str(idx).encode()
                        ).hexdigest()
                    )
                    out["resized_w"].append(w * 224 // m)
                    out["resized_h"].append(h * 224 // m)
            yield pd.DataFrame(out)

    return assets.mapInPandas(sample, schema=FRAME_SCHEMA)


VAD_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("source", StringType()),
    StructField("win_idx", LongType()),
    StructField("energy", LongType()),
    StructField("voiced", LongType()),
])


def vad_energy_windows(
    assets: DataFrame,
    window_bytes: int = 16,
    threshold: int = 90_000,
) -> DataFrame:
    """Audio-style voice-activity detection over PCM-like binary payloads:
    Arrow-batched ``mapInPandas`` slices each payload into fixed-width
    sample windows, computes per-window energy sum((b-128)^2) with numpy,
    and flags windows above ``threshold``. The decode step treats bytes as
    unsigned 8-bit samples (the deterministic stand-in for a real codec —
    same stub discipline as :func:`decode_stub`); the batch mechanics,
    schema, and variable-cardinality fan-out (asset -> windows) are the
    real production shape. Expects columns (asset_id, source, payload)."""
    import numpy as np

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "source": [], "win_idx": [],
                "energy": [], "voiced": [],
            }
            for aid, src, payload in zip(
                pdf["asset_id"], pdf["source"], pdf["payload"]
            ):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n_win = len(arr) // window_bytes
                wins = arr[: n_win * window_bytes].reshape(-1, window_bytes)
                en = ((wins - 128) ** 2).sum(axis=1)
                out["asset_id"].extend([aid] * n_win)
                out["source"].extend([src] * n_win)
                out["win_idx"].extend(range(n_win))
                out["energy"].extend(int(e) for e in en)
                out["voiced"].extend(int(e > threshold) for e in en)
            yield pd.DataFrame(out)

    return assets.mapInPandas(vad, VAD_SCHEMA)


PHASH_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("sig", LongType()),
])

# 48 bits, not 32 (round 12): banding with B blocks catches Hamming <=
# B-1 by pigeonhole, and the verify bound here is 2, so THREE blocks
# suffice — the r11 shape (4 x 8-bit blocks over 32 bits) both
# over-guaranteed (<=3) and fixed each block's key space at 256 values,
# which makes block population grow ~N/256 and candidates ~N^2/256: the
# sf3.0 three-point measurement (SCALE_BENCH.md) showed exponent ~1.8
# past sf1.0 (82.4 s at 150k assets). 48 bits / 3 x 16-bit blocks keeps
# the exact same Hamming<=2 guarantee while growing per-block key space
# to 65,536 — signature entropy must scale with corpus size, block
# count must not.
PHASH_BITS = 48
PHASH_BLOCKS = 3
PHASH_BLOCK_BITS = PHASH_BITS // PHASH_BLOCKS


def phash_signatures(assets: DataFrame, bits: int = PHASH_BITS) -> DataFrame:
    """Perceptual-hash stand-in over binary payloads: ``bits`` equal-
    FRACTION byte windows (window j covers bytes floor(j*n/bits) ..
    floor((j+1)*n/bits), never empty), bit j set iff window j's energy
    DENSITY (e_j * n / size_j, exact-in-double integer products) exceeds
    the MEDIAN window density — aHash/pHash geometry with the median
    threshold real pHash implementations use, which guarantees a
    balanced ~bits/2-set signature. Arrow-batched ``mapInPandas`` (the
    declared multimodal Python surface); emits one (asset_id, sig) row
    per asset — 8 bytes per asset downstream, which is what makes
    signature-space near-dup joins affordable at 100 TB.

    Geometry, threshold, AND width are MEASURED scale/quality levers
    (SCALE_BENCH.md): equal-WIDTH windows left zero-filled tails that
    packed 16,241 same-length assets of 50k into ONE block value at
    sf1.0 (4.5e8 candidate pairs, executor OOM), a payload-MEAN
    threshold degenerates on bimodal bytes (ASCII text: every letter
    sits above the space-dragged mean, so the signature collapsed to a
    space-position detector), and the r11 32-bit width fixed each of
    its 4 banding blocks at a 256-value key space, measured superlinear
    (exponent ~1.8) at sf3.0 — 48 bits / 3 x 16-bit blocks keeps the
    Hamming<=2 pigeonhole guarantee while the per-block key space grows
    256x, restoring near-linear candidate growth."""

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mid = bits // 2
        for pdf in batches:
            sigs = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                n = len(b)
                vs = []
                for j in range(bits):
                    lo = (j * n) // bits
                    hi = ((j + 1) * n) // bits
                    # payloads shorter than `bits` leave some windows
                    # empty — density 0, never a divide-by-zero
                    vs.append(
                        sum(b[lo:hi]) * n / (hi - lo) if hi > lo else 0.0
                    )
                s = sorted(vs)
                med = (s[mid - 1] + s[mid]) / 2.0
                sig = 0
                for j, v in enumerate(vs):
                    if v > med:
                        sig |= 1 << j
                sigs.append(sig)
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "sig": sigs})

    return assets.mapInPandas(ph, PHASH_SCHEMA)
