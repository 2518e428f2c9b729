"""Multimodal columns: opaque binary payloads + typed metadata, processed
in Arrow batches.

A web-scale training pipeline carries images/audio/video next to text.
The Spark-side contract is what matters at 100 TB and is fully real here:
binary column + metadata struct, batch-shaped Pandas-UDF signatures,
partition-friendly decode stages.  The codec step itself (JPEG decode,
resampling) needs libraries this container doesn't ship, so each codec is
stubbed behind an import-try: with the library present the real decoder
runs; without it either a clearly-marked NotImplementedError (strict mode)
or a deterministic fake (test mode) — the fake preserves shapes/dtypes so
every downstream stage (feature extract, resize plumbing, batching) is
exercised for real.

The html column of the webtext table follows the same pattern (binary
payload, deterministic extract) — text is just the modality whose decoder
(html.parser) IS in the stdlib.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_SCHEMA", "attach_media_meta", "decode_image_features",
    "sample_frames", "image_stats",
]

# typed metadata travelling WITH the payload: one struct column, prunable
MEDIA_SCHEMA = ("media struct<kind:string, width:int, height:int, "
                "n_frames:int, sample_rate:int, codec:string>")


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


def attach_media_meta(df: DataFrame, payload_col: str = "payload",
                      kind: str = "image") -> DataFrame:
    """Derive a typed metadata struct for a binary payload column.  With no
    codec available, dimensions are parsed deterministically from the
    payload header bytes (our synthetic payloads embed them); a real
    deployment swaps in the codec probe without touching the schema."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.conv(F.hex(F.substring(payload_col, 1, 2)), 16, 10)
            .cast("int").alias("width"),
            F.conv(F.hex(F.substring(payload_col, 3, 2)), 16, 10)
            .cast("int").alias("height"),
            F.conv(F.hex(F.substring(payload_col, 5, 1)), 16, 10)
            .cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
            F.lit("synthetic-v1").alias("codec"),
        ),
    )


def _decode_batch(payloads: pd.Series, widths: np.ndarray,
                  heights: np.ndarray, strict: bool) -> list[np.ndarray]:
    """bytes -> HxWx3 uint8 arrays.  Real decoder when PIL exists; else a
    deterministic fake (seeded by payload bytes) with the REAL output shape,
    or NotImplementedError in strict mode."""
    pil = _try_import_pil()
    out = []
    for blob, w, h in zip(payloads, widths, heights):
        if pil is not None:
            import io
            try:
                img = pil.open(io.BytesIO(blob)).convert("RGB")
                out.append(np.asarray(img, np.uint8))
                continue
            except Exception:
                pass  # not a real image (synthetic payload) -> fall through
        if strict:
            raise NotImplementedError(
                "image codec not available in this environment; install "
                "Pillow or run with strict=False (deterministic fake)")
        # deterministic fake: tile the payload bytes into the true shape
        raw = np.frombuffer(blob, np.uint8)
        need = int(w) * int(h) * 3
        reps = -(-need // max(len(raw), 1))
        out.append(np.tile(raw, reps)[:need].reshape(int(h), int(w), 3))
    return out


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          strict: bool = False) -> DataFrame:
    """(id, mean_rgb array<double>, phash bigint): decode -> global feature.
    One mapInPandas stage: Arrow batches in, vectorized reductions per
    image, no row-at-a-time Python between stages."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = _decode_batch(pdf[payload_col],
                                 pdf["w"].to_numpy(), pdf["h"].to_numpy(),
                                 strict)
            mean_rgb = [img.reshape(-1, 3).mean(axis=0).tolist()
                        for img in imgs]
            # 64-bit average-hash: 8x8 downsample of the gray image
            phashes = []
            for img in imgs:
                gray = img.mean(axis=2)
                hh, ww = gray.shape
                ys = (np.arange(8) * hh // 8)
                xs = (np.arange(8) * ww // 8)
                cells = gray[np.ix_(ys, xs)]
                bits = (cells > cells.mean()).flatten()
                phashes.append(int(np.packbits(bits).view(">u8")[0]
                                   .astype(np.int64)))
            yield pd.DataFrame({"id": pdf["id"], "mean_rgb": mean_rgb,
                                "phash": np.asarray(phashes, np.int64)})

    sel = df.select(F.col("id"), F.col(payload_col),
                    F.col("media.width").alias("w"),
                    F.col("media.height").alias("h"))
    return sel.mapInPandas(
        run, "id long, mean_rgb array<double>, phash long")


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  every_k: int = 2) -> DataFrame:
    """Video-style frame sampling plumbing: one output row per kept frame
    index — (id, frame_idx, frame_payload).  The slice math is real; the
    per-frame byte extraction is the codec stub (deterministic split of the
    payload into n_frames equal chunks)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for _id, blob, n in zip(pdf["id"], pdf[payload_col],
                                    pdf["n_frames"].to_numpy()):
                n = max(int(n), 1)
                chunk = max(len(blob) // n, 1)
                for fi in range(0, n, every_k):
                    ids.append(_id)
                    idxs.append(fi)
                    blobs.append(bytes(blob[fi * chunk:(fi + 1) * chunk]))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs,
                                "frame_payload": blobs})

    sel = df.select("id", payload_col, F.col("media.n_frames").alias("n_frames"))
    return sel.mapInPandas(run, "id long, frame_idx int, frame_payload binary")


def image_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-JVM metadata stats (no decode): bytes + dims from the typed
    struct — the pruning/filtering layer that runs BEFORE any codec."""
    return df.select(
        "id",
        F.length(payload_col).alias("n_bytes"),
        F.col("media.width").alias("width"),
        F.col("media.height").alias("height"),
        (F.col("media.width") * F.col("media.height")).alias("n_pixels"),
    )
