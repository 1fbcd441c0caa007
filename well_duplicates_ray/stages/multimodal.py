"""Multimodal (image) operators: decode / resize / feature-extract as
actor-pool map_batches stages (SURVEY.md extension ops).

The sandbox ships no image codec libraries (PIL/opencv/ffmpeg), so the
codec seam is explicit and honest:

- ``fmt='raw'`` payloads (w*h*3 uint8 RGB) are decoded, resized and
  featurized for real with pure-numpy kernels;
- any other fmt raises ``NotImplementedError`` at the registry seam —
  a deployment installs a codec and registers ``decoder(fmt)``; the
  Ray-side plumbing (schema, actor signature, batch size, output layout)
  is identical either way and is what this module actually tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.functions.phash import (
    decode_raw,
    phash_from_gray32,
    resize_gray,
    to_gray,
)


def _decode(fmt: str, buf: bytes, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(buf, w, h)
    raise NotImplementedError(
        f"no codec for fmt={fmt!r} in this environment; register a decoder "
        "for lossy formats (the PSNR>=40dB invariant applies there)"
    )


class ImageResize:
    """Actor-pool stage: resize every image to (out_w, out_h), emitting a
    raw RGB payload (mean-pool per channel; bilinear for non-divisible)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bufs = []
        for buf, w, h, fmt in zip(
            batch["bytes"].to_pylist(),
            batch["w"].to_pylist(),
            batch["h"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            img = _decode(fmt, buf, int(w), int(h))
            chans = [
                resize_gray(img[:, :, c].astype(np.float64), self.out_w)
                for c in range(3)
            ]
            small = np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)
            out_bufs.append(small.tobytes())
        n = batch.num_rows
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_bufs, pa.binary()),
                "w": pa.array(np.full(n, self.out_w, np.int32)),
                "h": pa.array(np.full(n, self.out_h, np.int32)),
                "fmt": pa.array(["raw"] * n, pa.string()),
            }
        )


class ImageFeatures:
    """Actor-pool stage: per-image features — channel means/stds, luma
    entropy (8-bin), recomputed pHash. Stateless math, stateful-shaped
    (the codec registry would live in __init__)."""

    def __init__(self, cfg: dict | None = None):
        self.cfg = DedupConfig.from_dict(cfg) if cfg else DedupConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        means = np.zeros((batch.num_rows, 3))
        stds = np.zeros((batch.num_rows, 3))
        entropy = np.zeros(batch.num_rows)
        phash = np.zeros(batch.num_rows, dtype=np.uint64)
        for i, (buf, w, h, fmt) in enumerate(
            zip(
                batch["bytes"].to_pylist(),
                batch["w"].to_pylist(),
                batch["h"].to_pylist(),
                batch["fmt"].to_pylist(),
            )
        ):
            img = _decode(fmt, buf, int(w), int(h))
            means[i] = img.mean(axis=(0, 1))
            stds[i] = img.std(axis=(0, 1))
            gray = to_gray(img)
            hist, _ = np.histogram(gray, bins=8, range=(0, 255))
            p = hist / max(hist.sum(), 1)
            nz = p[p > 0]
            entropy[i] = float(-(nz * np.log2(nz)).sum())
            phash[i] = phash_from_gray32(resize_gray(gray))[0]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "mean_r": pa.array(means[:, 0]),
                "mean_g": pa.array(means[:, 1]),
                "mean_b": pa.array(means[:, 2]),
                "std_r": pa.array(stds[:, 0]),
                "std_g": pa.array(stds[:, 1]),
                "std_b": pa.array(stds[:, 2]),
                "entropy": pa.array(entropy),
                "phash": pa.array(phash.view(np.int64)),
            }
        )
