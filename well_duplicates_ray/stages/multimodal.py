"""Multimodal (image/audio/video) operators: decode / resize /
feature-extract / frame-sample / window-energy as actor-pool map_batches
stages (SURVEY.md extension ops).

The sandbox ships no image codec libraries (PIL/opencv/ffmpeg), so the
codec seam is explicit and honest:

- ``fmt='raw'`` payloads (w*h*3 uint8 RGB) are decoded, resized and
  featurized for real with pure-numpy kernels;
- any other fmt raises ``NotImplementedError`` at the registry seam —
  a deployment installs a codec and registers ``decoder(fmt)``; the
  Ray-side plumbing (schema, actor signature, batch size, output layout)
  is identical either way and is what this module actually tests.

All three stages are batch-vectorized: payloads are read straight off
the Arrow binary column's flat data buffer (functions/arrowbuf.py — the
pattern DecodePHash established), rows are grouped by (w, h) so every
numpy kernel runs once per distinct shape, and output payload columns
are built from one contiguous buffer + offsets. No ``to_pylist()`` of a
payload column anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.functions.arrowbuf import (
    binary_column_view,
    binary_from_flat,
    binary_from_offsets,
    gather_rows,
)
from well_duplicates_ray.functions.phash import (
    decode_raw,
    phash_from_gray32,
    resize_gray,
    to_gray,
)


def _decode(fmt: str, buf: bytes, w: int, h: int) -> np.ndarray:
    """Single-payload codec seam (kept for tests / external callers; the
    batch stages below check fmt vectorized and never call this)."""
    if fmt == "raw":
        return decode_raw(buf, w, h)
    raise NotImplementedError(
        f"no codec for fmt={fmt!r} in this environment; register a decoder "
        "for lossy formats (the PSNR>=40dB invariant applies there)"
    )


def _require_fmt(batch: pa.Table, expected: str, seam: str) -> None:
    """Vectorized codec-seam check: every row's fmt must be decodable."""
    bad = pc.filter(
        batch["fmt"], pc.invert(pc.coalesce(
            pc.equal(batch["fmt"], expected), pa.scalar(False)))
    )
    if len(bad):
        raise NotImplementedError(
            f"no {seam} for fmt={bad[0].as_py()!r} in this environment; "
            "register a decoder at this seam"
        )


def _shape_groups(ws: np.ndarray, hs: np.ndarray):
    """Yield (w, h, row-index array) per distinct shape in the batch."""
    for (w, h) in {(int(a), int(b)) for a, b in zip(ws, hs)}:
        yield w, h, np.flatnonzero((ws == w) & (hs == h))


class ImageResize:
    """Actor-pool stage: resize every image to (out_w, out_h), emitting a
    raw RGB payload (mean-pool per channel; bilinear for non-divisible).
    One numpy kernel invocation per distinct input shape in the batch."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        _require_fmt(batch, "raw", "codec")
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        flat, starts, ends, valid = binary_column_view(batch["bytes"])
        n = batch.num_rows
        out_side = self.out_w  # square resize (resize_gray convention)
        rowb_out = out_side * out_side * 3
        out_flat = np.empty(n * rowb_out, dtype=np.uint8)
        out_rows = out_flat.reshape(n, rowb_out)
        for w, h, idx in _shape_groups(ws, hs):
            rowb = w * h * 3
            if not bool(np.all((ends[idx] - starts[idx]) == rowb)):
                raise ValueError("raw payload size mismatch in batch")
            stack = gather_rows(flat, starts[idx], rowb).reshape(
                idx.size, h, w, 3
            )
            # (m, 3, h, w): resize_gray batches over leading dims
            chans = resize_gray(
                np.ascontiguousarray(np.moveaxis(stack, 3, 1)).astype(
                    np.float64
                ),
                out_side,
            )
            small = np.clip(np.moveaxis(chans, 1, 3), 0, 255).astype(np.uint8)
            out_rows[idx] = small.reshape(idx.size, rowb_out)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": binary_from_flat(out_flat, rowb_out, n),
                "w": pa.array(np.full(n, out_side, np.int32)),
                "h": pa.array(np.full(n, out_side, np.int32)),
                "fmt": pa.array(np.full(n, "raw"), pa.string()),
            }
        )


class VideoFrameSample:
    """Actor-pool stage: deterministic frame sampling — k evenly-spaced
    frames per video, ONE OUTPUT ROW PER SAMPLED FRAME (a flat-map-shaped
    map_batches; downstream stages treat frames as images).

    ``fmt='rawvid'`` payloads are ``n_frames`` raw RGB frames
    concatenated (n = len(bytes) / (w*h*3)); real containers (mp4/webm)
    raise at the same codec seam an ffmpeg-backed decoder would register
    into. Frame selection is pure offset arithmetic on the flat payload
    buffer — per-video python loops eliminated."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        _require_fmt(batch, "rawvid", "container demuxer")
        ws = batch["w"].to_numpy().astype(np.int64)
        hs = batch["h"].to_numpy().astype(np.int64)
        flat, starts, ends, _ = binary_column_view(batch["bytes"])
        fsize = ws * hs * 3
        n_frames = np.where(fsize > 0, (ends - starts) // np.maximum(fsize, 1), 0)

        # per-video sample count, then a ragged (video, j) index expansion
        k_i = np.minimum(self.k, n_frames)
        vid_row = np.repeat(np.arange(len(k_i)), k_i)  # video per output row
        if vid_row.size:
            off = np.concatenate([[0], np.cumsum(k_i)[:-1]])
            j = np.arange(vid_row.size) - off[vid_row]  # 0..k_i-1 per video
            kv, nv = k_i[vid_row], n_frames[vid_row]
            # round(linspace(0, n-1, k)): j*(n-1)/(k-1), k==1 -> frame 0
            denom = np.maximum(kv - 1, 1)
            fi = np.where(
                kv > 1,
                np.round(j * (nv - 1) / denom).astype(np.int64),
                0,
            )
            # np.unique per video: linspace is monotone, so drop rows that
            # repeat the previous frame index within the same video
            keep = np.r_[True, (vid_row[1:] != vid_row[:-1]) | (fi[1:] != fi[:-1])]
            vid_row, fi = vid_row[keep], fi[keep]
        else:
            fi = np.zeros(0, dtype=np.int64)

        m = vid_row.size
        sizes = fsize[vid_row]
        out_offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(sizes, out=out_offsets[1:])
        out_flat = np.empty(int(out_offsets[-1]), dtype=np.uint8)
        src0 = starts[vid_row] + fi * fsize[vid_row]
        # one fancy-index gather per distinct shape (uniform rowb)
        for w, h, grp in _shape_groups(ws[vid_row], hs[vid_row]):
            rowb = w * h * 3
            src = src0[grp, None] + np.arange(rowb, dtype=np.int64)[None, :]
            dst = out_offsets[grp, None] + np.arange(rowb, dtype=np.int64)[None, :]
            out_flat[dst.reshape(-1)] = flat[src.reshape(-1)]
        vr = pa.array(vid_row, pa.int64())
        return pa.table(
            {
                "video_id": pc.take(batch["video_id"], vr),
                "frame_idx": pa.array(fi.astype(np.int32)),
                "bytes": binary_from_offsets(out_flat, out_offsets),
                "w": pc.take(batch["w"], vr),
                "h": pc.take(batch["h"], vr),
                "fmt": pa.array(np.full(m, "raw"), pa.string()),
            }
        )


class AudioFrameEnergy:
    """Actor-pool stage: fixed-window RMS energy + peak over raw PCM
    audio, ONE OUTPUT ROW PER WINDOW (the audio analog of
    VideoFrameSample's flat-map shape).

    ``fmt='pcm16'`` payloads (mono int16 little-endian samples) are
    computed FOR REAL — PCM needs no codec, so unlike the image/video
    stages there is no stubbed kernel here; compressed formats
    (mp3/ogg/flac) raise at the same seam an audio decoder would
    register into. Windows are ``window`` samples, tail remainder
    dropped (deterministic); RMS is quantized to milli-units
    (floor(rms*1000)) so the output is integer-stable. The whole batch
    is one (windows x samples) gather off the flat Arrow buffer — no
    per-clip Python."""

    def __init__(self, window: int = 1024):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        _require_fmt(batch, "pcm16", "audio decoder")
        flat, starts, ends, _ = binary_column_view(batch["bytes"])
        w = self.window
        n_samples = (ends - starts) // 2
        nw = (n_samples // w).astype(np.int64)
        clip_row = np.repeat(np.arange(len(nw)), nw)
        m = clip_row.size
        if m:
            off = np.concatenate([[0], np.cumsum(nw)[:-1]])
            j = (np.arange(m) - off[clip_row]).astype(np.int64)
            src0 = starts[clip_row] + j * (w * 2)
            # gather_rows returns a zero-copy reshape when windows are
            # stored consecutively (a once-built fixture column always
            # is); samples are LE (host-endian on x86/arm)
            samples = (
                gather_rows(flat, src0, w * 2)
                .view(np.int16).astype(np.int64)
            )
            ssq = np.sum(samples * samples, axis=1)  # exact in int64
            rms_mq = np.floor(np.sqrt(ssq / w) * 1000.0).astype(np.int64)
            peak = np.max(np.abs(samples), axis=1)
        else:
            j = np.zeros(0, np.int64)
            rms_mq = np.zeros(0, np.int64)
            peak = np.zeros(0, np.int64)
        cr = pa.array(clip_row, pa.int64())
        return pa.table(
            {
                "audio_id": pc.take(batch["audio_id"], cr),
                "win_idx": pa.array(j.astype(np.int32)),
                "rms_mq": pa.array(rms_mq),
                "peak": pa.array(peak),
            }
        )


class ImageFeatures:
    """Actor-pool stage: per-image features — channel means/stds, luma
    entropy (8-bin), recomputed pHash. Batched per distinct shape; the
    histogram is a searchsorted+bincount kernel with np.histogram's
    uniform-bin edge semantics (last bin closed)."""

    _EDGES = np.linspace(0.0, 255.0, 9)

    def __init__(self, cfg: dict | None = None):
        self.cfg = DedupConfig.from_dict(cfg) if cfg else DedupConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        _require_fmt(batch, "raw", "codec")
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        flat, starts, ends, _ = binary_column_view(batch["bytes"])
        n = batch.num_rows
        means = np.zeros((n, 3))
        stds = np.zeros((n, 3))
        entropy = np.zeros(n)
        phash = np.zeros(n, dtype=np.uint64)
        edges = self._EDGES
        for w, h, idx in _shape_groups(ws, hs):
            rowb = w * h * 3
            if not bool(np.all((ends[idx] - starts[idx]) == rowb)):
                raise ValueError("raw payload size mismatch in batch")
            stack = gather_rows(flat, starts[idx], rowb).reshape(
                idx.size, h, w, 3
            )
            means[idx] = stack.mean(axis=(1, 2))
            stds[idx] = stack.std(axis=(1, 2))
            gray = to_gray(stack)  # (m, h, w) float32
            # 8-bin histogram over [0,255], all rows at once: bin index by
            # searchsorted (right), values == 255 into the last bin
            gi = np.searchsorted(edges, gray.reshape(idx.size, -1), "right") - 1
            np.clip(gi, 0, 7, out=gi)
            hist = np.bincount(
                (gi + np.arange(idx.size)[:, None] * 8).reshape(-1),
                minlength=idx.size * 8,
            ).reshape(idx.size, 8)
            p = hist / np.maximum(hist.sum(axis=1, keepdims=True), 1)
            plog = np.where(p > 0, p * np.log2(np.where(p > 0, p, 1.0)), 0.0)
            entropy[idx] = -plog.sum(axis=1)
            phash[idx] = phash_from_gray32(resize_gray(gray))
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
