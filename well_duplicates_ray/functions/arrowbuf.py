"""Zero-copy views over Arrow binary columns.

Every stage that touches image/video payloads reads them through these
helpers instead of ``to_pylist()``: the column's flat data buffer is
wrapped as one numpy uint8 array and rows become (start, end) offset
pairs into it — no per-row Python bytes objects are materialized
(SURVEY.md §4.3 "wide rows"; the pattern DecodePHash/phash_raw_flat
established for the flagship decode stage).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def binary_column_view(
    col: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Binary column -> (flat uint8 data, starts, ends, valid).

    ``flat[starts[i]:ends[i]]`` is row i's payload as a zero-copy numpy
    view. The cast to large_binary only widens the offsets (int32 ->
    int64); the data buffer is shared.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    la = col.cast(pa.large_binary())
    offs = np.frombuffer(la.buffers()[1], dtype=np.int64)[
        la.offset : la.offset + len(la) + 1
    ]
    data = la.buffers()[2]
    flat = (
        np.frombuffer(data, dtype=np.uint8)
        if data is not None
        else np.zeros(0, dtype=np.uint8)
    )
    valid = pc.is_valid(la).to_numpy(zero_copy_only=False).astype(bool)
    return flat, offs[:-1], offs[1:], valid


def gather_rows(flat: np.ndarray, starts: np.ndarray, rowb: int) -> np.ndarray:
    """(m, rowb) uint8 stack of equal-length rows read from ``flat`` —
    a reshaped VIEW when the rows are stored consecutively (the common
    case for a once-built Arrow column), a single fancy-index gather
    otherwise."""
    m = starts.size
    if m == 0:
        return np.zeros((0, rowb), dtype=np.uint8)
    if m == 1 or bool(np.all(np.diff(starts) == rowb)):
        return flat[starts[0] : starts[0] + m * rowb].reshape(m, rowb)
    idx = starts[:, None] + np.arange(rowb, dtype=np.int64)[None, :]
    return flat[idx.reshape(-1)].reshape(m, rowb)


def _check_i32(total: int) -> None:
    if total > np.iinfo(np.int32).max:
        raise ValueError(
            f"batch payload volume {total} overflows binary() offsets; "
            "reduce the stage's batch_size"
        )


def binary_from_flat(out_flat: np.ndarray, rowb: int, n: int) -> pa.Array:
    """Build a binary() array of ``n`` uniform ``rowb``-byte rows directly
    from one contiguous buffer — no per-row Python objects."""
    _check_i32(n * rowb)
    offsets = (np.arange(n + 1, dtype=np.int64) * rowb).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(out_flat))],
    )


def binary_from_offsets(
    out_flat: np.ndarray, offsets: np.ndarray
) -> pa.Array:
    """Build a binary() array from one contiguous buffer + explicit int
    offsets (len n+1) — variable-length rows, no per-row Python."""
    _check_i32(int(offsets[-1]) if offsets.size else 0)
    return pa.Array.from_buffers(
        pa.binary(), offsets.size - 1,
        [None, pa.py_buffer(offsets.astype(np.int32)),
         pa.py_buffer(np.ascontiguousarray(out_flat))],
    )
