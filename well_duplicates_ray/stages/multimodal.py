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


class VideoFrameSample:
    """Actor-pool stage: deterministic frame sampling — k evenly-spaced
    frames per video, ONE OUTPUT ROW PER SAMPLED FRAME (a flat-map-shaped
    map_batches; downstream stages treat frames as images).

    ``fmt='rawvid'`` payloads are ``n_frames`` raw RGB frames
    concatenated (n = len(bytes) / (w*h*3)); real containers (mp4/webm)
    raise at the same codec seam an ffmpeg-backed decoder would register
    into. Frame extraction is a zero-copy slice of the payload."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid_ids, frame_idx, bufs, ws, hs = [], [], [], [], []
        for vid, buf, w, h, fmt in zip(
            batch["video_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["w"].to_pylist(),
            batch["h"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            if fmt != "rawvid":
                raise NotImplementedError(
                    f"no container demuxer for fmt={fmt!r}; register an "
                    "ffmpeg-backed decoder at this seam"
                )
            fsize = int(w) * int(h) * 3
            n_frames = len(buf) // fsize if fsize else 0
            if n_frames == 0:
                continue
            take = np.unique(
                np.linspace(0, n_frames - 1, min(self.k, n_frames))
                .round().astype(np.int64)
            )
            for fi in take:
                vid_ids.append(vid)
                frame_idx.append(int(fi))
                bufs.append(buf[fi * fsize : (fi + 1) * fsize])
                ws.append(int(w))
                hs.append(int(h))
        n = len(vid_ids)
        return pa.table(
            {
                "video_id": pa.array(vid_ids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "bytes": pa.array(bufs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
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
