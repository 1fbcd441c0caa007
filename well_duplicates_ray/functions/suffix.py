"""Suffix array + LCP kernels for the exact-substring pass.

The reference verifies candidate duplicates with an exact/near string
comparison over a fixed window (``count_well_duplicates.py`` ``is_dup``,
SURVEY.md §2 R9). The graft's substring path generalizes that to "the two
captions share a common run of >= L characters", decided *exactly* with a
suffix array + Kasai LCP over the concatenated pair (SURVEY.md §2 G12).

Pure numpy, prefix-doubling O(n log^2 n) construction — no third-party
suffix-array package exists in the sandbox.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (values >= 0). Prefix doubling with
    numpy argsort at each doubling step."""
    n = s.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    rank = np.array(s, dtype=np.int64, copy=True)  # copy: the loop reuses buffers
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while True:
        # key = (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        sa = order
        # re-rank
        tmp[sa[0]] = 0
        prev = sa[:-1]
        cur = sa[1:]
        newgrp = (rank[cur] != rank[prev]) | (second[cur] != second[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank, tmp = tmp.copy(), rank
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def lcp_kasai(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP array: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0]=0.

    O(n) but with a per-character python loop — only used on short
    concatenated caption pairs inside the verifier, never on full tables.
    """
    n = s.size
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: bytes, b: bytes) -> int:
    """Exact length of the longest common substring of two byte strings.

    Builds the suffix array of a + SEP + b (SEP = 256, outside the byte
    alphabet) and scans adjacent suffix pairs that originate in different
    halves; the max such LCP is the LCS length.
    """
    if not a or not b:
        return 0
    na = len(a)
    s = np.empty(na + 1 + len(b), dtype=np.int64)
    s[:na] = np.frombuffer(a, dtype=np.uint8)
    s[na] = 256
    s[na + 1 :] = np.frombuffer(b, dtype=np.uint8)
    sa = suffix_array(s)
    lcp = lcp_kasai(s, sa)
    from_a = sa < na
    cross = from_a[1:] != from_a[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def has_common_run(a: str, b: str, min_len: int) -> bool:
    """True iff the captions share a common substring of >= min_len bytes."""
    return (
        longest_common_substring_len(a.encode("utf-8"), b.encode("utf-8"))
        >= min_len
    )
