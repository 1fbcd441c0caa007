"""Pure-numpy perceptual hash (pHash) + raw-image decode.

In the reference, a well's *position on the flow cell* is what makes two
reads candidate duplicates (the s.locs position table,
``prepare_indexed_targets.py`` — SURVEY.md §1.2). In this engine the
64-bit pHash plays that role: images whose pHashes are within a small
Hamming radius are "physically adjacent" and become candidate pairs.

Algorithm (the classic DCT pHash, same convention as the public
``imagehash`` library): grayscale -> resize to 32x32 -> 2-D DCT-II ->
keep the top-left 8x8 low-frequency block -> bit k set iff coefficient k
exceeds the median of the 64 coefficients. No scipy/PIL: the DCT is an
orthonormal DCT-II matrix multiply, the resize is mean-pool / bilinear.

All entry points are vectorized over batches of images; per-row Python
only appears where rows have heterogeneous (w, h) shapes.
"""

from __future__ import annotations

import hashlib

import numpy as np

HASH_SIZE = 8          # 8x8 low-frequency block -> 64-bit hash
DCT_SIZE = 32          # resize target before DCT

_M64 = np.uint64(0x6A09E667F3BCC909)  # splitmix64 constant (public domain)


def dct_matrix(n: int = DCT_SIZE) -> np.ndarray:
    """Orthonormal DCT-II matrix ``T`` such that ``T @ a`` transforms columns."""
    i = np.arange(n)
    t = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i[None, :] + 1) * i[:, None] / (2 * n))
    t[0] *= 1.0 / np.sqrt(2.0)
    return t


_DCT_T = dct_matrix(DCT_SIZE)


def decode_raw(buf: bytes, w: int, h: int) -> np.ndarray:
    """fmt='raw' payload: exactly w*h*3 uint8 RGB bytes, C-order (FIXTURES.md F1)."""
    a = np.frombuffer(buf, dtype=np.uint8)
    if a.size != w * h * 3:
        raise ValueError(f"raw payload size {a.size} != {w}*{h}*3")
    return a.reshape(h, w, 3)


_GRAY_W = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def to_gray(rgb: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma (float32). Accepts (..., h, w, 3) float or uint8.

    One contiguous cast + dot: per-channel strided slicing of a uint8
    stack (`rgb[..., 0].astype(...)`) hits a numpy slow path ~200x slower
    on large batches. float32 throughout — this sandbox zeroes fresh pages
    at ~70 MB/s, so halving the working set halves the dominant cost; the
    pHash sign-vs-median bits are insensitive to the precision.
    """
    return np.ascontiguousarray(rgb).astype(np.float32) @ _GRAY_W


def resize_gray(img: np.ndarray, size: int = DCT_SIZE) -> np.ndarray:
    """Resize (..., h, w) grayscale to (..., size, size).

    Mean-pool when both dims are integer multiples of ``size`` (exact,
    fast, the fixture case); bilinear (align_corners=False convention)
    otherwise. Deterministic, pure numpy.
    """
    h, w = img.shape[-2], img.shape[-1]
    if h == size and w == size:
        return img.astype(np.float32, copy=False)
    if h % size == 0 and w % size == 0:
        fh, fw = h // size, w // size
        return (
            img.reshape(*img.shape[:-2], size, fh, size, fw)
            .astype(np.float32, copy=False)
            .mean(axis=(-3, -1))
        )
    # bilinear gather
    ys = (np.arange(size) + 0.5) * (h / size) - 0.5
    xs = (np.arange(size) + 0.5) * (w / size) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)
    wx = np.clip(xs - x0, 0.0, 1.0)
    im = img.astype(np.float64)
    top = im[..., y0, :][..., :, x0] * (1 - wx) + im[..., y0, :][..., :, x1] * wx
    bot = im[..., y1, :][..., :, x0] * (1 - wx) + im[..., y1, :][..., :, x1] * wx
    return top * (1 - wy[:, None]) + bot * wy[:, None]


def phash_from_gray32(gray32: np.ndarray) -> np.ndarray:
    """pHash a stack of 32x32 grayscale images.

    gray32: (n, 32, 32) float -> returns (n,) uint64.
    """
    if gray32.ndim == 2:
        gray32 = gray32[None]
    # batched 2-D DCT-II: T @ A @ T.T (float32 tensordots)
    t32 = _DCT_T.astype(np.float32)
    d = np.tensordot(
        np.tensordot(gray32.astype(np.float32, copy=False), t32, axes=([1], [1])),
        t32,
        axes=([1], [1]),
    )  # (n, 32, 32): axes order preserved (row-transform, col-transform)
    low = d[:, :HASH_SIZE, :HASH_SIZE].reshape(len(gray32), HASH_SIZE * HASH_SIZE)
    med = np.median(low, axis=1, keepdims=True)
    bits = (low > med).astype(np.uint8)                     # (n, 64) row-major
    packed = np.packbits(bits, axis=1)                      # (n, 8) big-endian
    return packed.view(">u8").astype(np.uint64).reshape(-1)


def phash_rgb_stack(imgs: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 -> (n,) uint64 pHash.

    When the shape mean-pools exactly to 32x32, the pool runs FIRST and in
    integer space (uint32 sums — exact), and luma converts the pooled
    32x32x3 stack: pooling and luma are both linear maps, so this is the
    same transform as gray-then-pool up to float rounding, at ~12x less
    float traffic (the full-resolution float32 cast was the decode
    stage's dominant memory cost on this VM's serialized page zeroing).
    """
    n, h, w, _ = imgs.shape
    fh, fw = h // DCT_SIZE, w // DCT_SIZE
    if h % DCT_SIZE == 0 and w % DCT_SIZE == 0 and fh * fw <= 257:
        # strided slice-adds beat a reshape multi-axis sum ~5x here, and
        # uint16 accumulation is exact for pool factors up to 257
        acc = np.zeros((n, DCT_SIZE, DCT_SIZE, 3), dtype=np.uint16)
        for dy in range(fh):
            for dx in range(fw):
                acc += imgs[:, dy::fh, dx::fw, :]
        pooled = acc.astype(np.float32) * np.float32(1.0 / (fh * fw))
        gray = pooled @ _GRAY_W
    else:
        gray = resize_gray(to_gray(imgs))
    return phash_from_gray32(gray)


_PHASH_CHUNK = 1024
_SCRATCH: dict = {}  # per-worker-process reusable gather buffers, keyed by
                     # (w, h) — fresh pages in this sandbox zero at
                     # ~70-200 MB/s GLOBALLY SERIALIZED, so the hot path
                     # must not allocate large fresh arrays per batch


def _scratch_u8(w: int, h: int) -> np.ndarray:
    key = (w, h)
    buf = _SCRATCH.get(key)
    if buf is None:
        buf = np.empty((_PHASH_CHUNK, h, w, 3), dtype=np.uint8)
        _SCRATCH[key] = buf
    return buf


def phash_raw_flat(
    flat: np.ndarray, starts: np.ndarray, w: int, h: int
) -> np.ndarray:
    """pHash rows of uniform (w, h) read directly from a flat byte buffer
    (the Arrow binary column's data buffer — zero copies on the encoded
    bytes when rows are stored consecutively, which Arrow guarantees for
    a once-built column)."""
    n = starts.size
    out = np.empty(n, dtype=np.uint64)
    rowb = w * h * 3
    for s in range(0, n, _PHASH_CHUNK):
        part = starts[s : s + _PHASH_CHUNK]
        m = part.size
        if m > 1 and np.all(np.diff(part) == rowb):
            stack = flat[part[0] : part[0] + m * rowb].reshape(m, h, w, 3)
        elif m == 1:
            stack = flat[part[0] : part[0] + rowb].reshape(1, h, w, 3)
        else:  # rows not consecutive (e.g. invalid rows skipped): gather
            u8 = _scratch_u8(w, h)
            idx = part[:, None] + np.arange(rowb, dtype=np.int64)[None, :]
            np.take(flat, idx.reshape(-1), out=u8[:m].reshape(-1))
            stack = u8[:m]
        out[s : s + m] = phash_rgb_stack(stack)
    return out


def phash_raw_batch(bufs, ws, hs) -> np.ndarray:
    """pHash a batch of fmt='raw' payloads (list of bytes); groups rows by
    (w, h) so every group runs through the flat-buffer kernel — one
    python iteration per *distinct shape*, not per row."""
    n = len(bufs)
    out = np.zeros(n, dtype=np.uint64)
    ws = np.asarray(ws)
    hs = np.asarray(hs)
    for (w, h) in {(int(w), int(h)) for w, h in zip(ws, hs)}:
        idx = np.flatnonzero((ws == w) & (hs == h))
        joined = b"".join(bufs[i] for i in idx)
        if len(joined) != idx.size * w * h * 3:
            raise ValueError("raw payload size mismatch in batch")
        flat = np.frombuffer(joined, dtype=np.uint8)
        starts = np.arange(idx.size, dtype=np.int64) * (w * h * 3)
        out[idx] = phash_raw_flat(flat, starts, w, h)
    return out


def _popcount64_consume(x: np.ndarray) -> np.ndarray:
    """SWAR popcount that MUTATES its uint64 input and returns it viewed
    int64 (values <= 64, so the reinterpret is safe). Two scratch-free
    buffers total where the naive expression allocated ~8 temporaries —
    on this substrate fresh pages cost more than the arithmetic
    (BASELINE.md substrate probes)."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    t = x >> np.uint64(1)
    t &= m1
    x -= t
    np.right_shift(x, np.uint64(2), out=t)
    t &= m2
    x &= m2
    x += t
    np.right_shift(x, np.uint64(4), out=t)
    x += t
    x &= m4
    x *= h01
    x >>= np.uint64(56)
    return x.view(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bit_count)."""
    return _popcount64_consume(x.astype(np.uint64, copy=True))


def _as_u64(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a)
    # 8-byte ints reinterpret zero-copy (int64 wraps mod 2^64 identically)
    return a.view(np.uint64) if a.dtype.itemsize == 8 else a.astype(np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _popcount64_consume(np.bitwise_xor(_as_u64(a), _as_u64(b)))


def prefix_bands(x: np.ndarray, n_bands: int) -> np.ndarray:
    """Split 64-bit codes into ``n_bands`` equal bit-slices.

    Returns (n, n_bands) uint64 of the raw band values. Pigeonhole: two
    codes at Hamming distance <= n_bands-1 agree exactly on >= 1 band —
    this is the engine's analogue of the reference's precomputed
    neighbor levels (SURVEY.md §2 R2 -> G9).
    """
    x = np.asarray(x, dtype=np.uint64).reshape(-1, 1)
    width = 64 // n_bands
    shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))[None, :]
    mask = np.uint64((1 << width) - 1)
    return (x >> shifts) & mask


def mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64-style finalizer; maps band values into one uint64 key space
    so different candidate sources can share a single ``bucket`` column."""
    salt64 = np.uint64((salt * 0x6A09E667F3BCC909) & 0xFFFFFFFFFFFFFFFF)
    z = np.asarray(x, dtype=np.uint64) + salt64
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def content_sha1(buf: bytes) -> str:
    """Stable content digest of an encoded payload (exact-dup key)."""
    return hashlib.sha1(buf).hexdigest()


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images (dB).

    Used for the per-row decode invariant from BASELINE.json input_hint:
    lossy formats must round-trip with PSNR >= 40 dB; fmt='raw' must be
    exact (PSNR = inf).
    """
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
