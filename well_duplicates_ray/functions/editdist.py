"""Exact Levenshtein edit distance with a numpy-vectorized DP row.

The byte-level confirm kernel for near-dup pair verification (SURVEY.md
§2.B "Substring / n-gram-Jaccard verify" family): where the Jaccard and
LCS verifiers measure set overlap and longest common run, edit distance
measures total divergence — the classic third predicate for "how near is
this near-duplicate".

The DP is the standard two-row Wagner–Fischer recurrence, but each row
is computed in O(1) numpy passes instead of a Python inner loop. The
substitution/deletion terms have no intra-row dependency; the insertion
term cur[j] = min(cur[j-1] + 1, ...) does, and with unit insert cost it
collapses to a prefix-scan identity:

    cur[j] = min_{k <= j} (base[k] + (j - k))
           = j + running_min(base[k] - k),   base = [i, minimum(sub, del)]

so one np.minimum.accumulate resolves the whole row. Per pair the cost
is O(|s|) vector ops of width |t| — no per-character Python work.

Operates on UTF-8 bytes; for the ASCII-only synthetic documents table
byte edits == character edits, which is what DuckDB's levenshtein()
(the SQL oracle) counts. Callers with multi-byte text should normalize
first (documented seam, same caveat as functions/textstats.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def levenshtein(s: bytes, t: bytes) -> int:
    """Exact edit distance between two byte strings."""
    if len(s) > len(t):  # iterate the SHORTER side: fewer, wider DP rows
        s, t = t, s
    if not t:
        return len(s)
    sa = np.frombuffer(s, dtype=np.uint8)
    ta = np.frombuffer(t, dtype=np.uint8)
    m = len(ta)
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    base = np.empty(m + 1, dtype=np.int64)
    for i in range(1, len(sa) + 1):
        # substitution / deletion: no intra-row dependency
        np.minimum(prev[:-1] + (ta != sa[i - 1]), prev[1:] + 1, out=base[1:])
        base[0] = i
        # insertion via the prefix-min identity (module docstring)
        base -= idx
        np.minimum.accumulate(base, out=base)
        base += idx
        prev, base = base, prev
    return int(prev[-1])


def levenshtein_pairs(col_a, col_b) -> np.ndarray:
    """Edit distance per row for two aligned Arrow string columns.

    The outer loop is per PAIR — pairs are the sparse output of the
    candidate/verify funnel, so this is the same granularity as every
    other pair predicate (stages/verify.py); each pair's DP is the
    vectorized kernel above.
    """
    if isinstance(col_a, pa.ChunkedArray):
        col_a = col_a.combine_chunks()
    if isinstance(col_b, pa.ChunkedArray):
        col_b = col_b.combine_chunks()
    out = np.empty(len(col_a), dtype=np.int64)
    for i, (a, b) in enumerate(zip(col_a.to_pylist(), col_b.to_pylist())):
        out[i] = levenshtein((a or "").encode("utf-8"),
                             (b or "").encode("utf-8"))
    return out
