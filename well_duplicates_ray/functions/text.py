"""Vectorized caption/text kernels: byte shingles, MinHash, SimHash,
winnowing fingerprints.

These are the engine's analogue of the reference's windowed sequence
extraction (``count_well_duplicates.py`` pulls a fixed cycle window per
well and compares neighbor sequences — SURVEY.md §2 R9): a caption is
"windowed" into k-byte shingles, sketched with MinHash / SimHash, and
anchored with winnowed L-gram fingerprints for the exact-substring pass.

All kernels operate on the *flat UTF-8 buffer* of an Arrow string column
(zero-copy where possible) — no per-row Python in the hot path. Rolling
hashes use uint64 wraparound polynomial hashing; MinHash permutations are
(a*x + b) multiply-add hashes over uint64 (Dietzfelbinger-style
multiply-shift universality is sufficient for sketch quality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_B = np.uint64(1099511628211)       # FNV-ish odd multiplier for rolling hash
_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def flat_utf8(strings) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat uint8 buffer, int64 offsets[n+1]) for a string column.

    Accepts a pyarrow (Chunked)Array, numpy array of str, or list of str.
    The Arrow path is zero-copy on the data buffer.
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        arr = strings.cast(pa.large_utf8())
        # null -> empty string (degenerate captions route to the exact path)
        if arr.null_count:
            arr = arr.fill_null("")
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=np.int64)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
        # normalize to offsets starting at 0 without copying data
        return data, offsets
    # python / numpy fallback
    bs = [(s if isinstance(s, str) else "").encode("utf-8") for s in strings]
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bs], out=offsets[1:])
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    return flat, offsets


def poly_fingerprint64(strings) -> np.ndarray:
    """64-bit rolling polynomial fingerprint of each FULL string (uint64):

        h = (seed*B + sum_j byte[j] * B^(len-1-j)) * B + len

    Vectorized over the flat utf8 buffer (wraparound uint64 arithmetic IS
    the hash; nulls hash as ""). Shared by textstats.rolling_fingerprint
    (the SQL-oracled fp64 column — formula changes break that oracle) and
    the candidate bucket keys (stages/candidates.py _str_hash64): a key
    collision there only costs one wasted verified candidate, the same
    64-bit exposure as the md5 prefix it replaced (VERDICT r3 'wrong' #3
    — the md5 loop ran per row, twice per emission batch)."""
    flat, offsets = flat_utf8(strings)
    base = int(offsets[0])
    lens = np.diff(offsets)
    n = len(lens)
    seed = np.uint64(14695981039346656037)
    b = np.uint64(1099511628211)
    sums = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if flat.size > 0 and lens.max(initial=0) > 0:
            maxlen = int(lens.max())
            pows = np.empty(maxlen, dtype=np.uint64)
            pows[0] = 1
            for k in range(1, maxlen):
                pows[k] = pows[k - 1] * b
            data = flat[base : int(offsets[-1])].astype(np.uint64)
            ends = np.repeat(offsets[1:] - base, lens)
            pos = np.arange(data.size, dtype=np.int64)
            contrib = data * pows[ends - 1 - pos]
            starts = (offsets[:-1] - base).astype(np.int64)
            nz = lens > 0
            sums[nz] = np.add.reduceat(contrib, starts[nz])
        out = (seed * b + sums) * b + lens.astype(np.uint64)
    return out


def _rolling_hash(flat: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hash of every k-byte window of ``flat``.

    Returns array of length max(0, len(flat)-k+1); H[i] covers flat[i:i+k].
    k sequential vectorized passes — O(k * n), k is 5 or 16.
    """
    n = flat.size
    m = n - k + 1
    if m <= 0:
        return np.zeros(0, dtype=np.uint64)
    # one uint64 cast of the buffer, then in-place multiply-add passes:
    # the k-temporaries-per-pass version spent more time in fresh-page
    # zeroing than in arithmetic on this VM
    f64 = flat.astype(np.uint64)
    acc = f64[:m].copy()
    for j in range(1, k):
        acc *= _B
        acc += f64[j : j + m]
    # finalize so nearby windows decorrelate across the full 64 bits
    acc ^= acc >> np.uint64(33)
    acc *= np.uint64(0xFF51AFD7ED558CCD)
    acc ^= acc >> np.uint64(33)
    return acc


def _window_rows(offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row counts and output offsets of k-windows that fit inside rows."""
    lens = np.diff(offsets)
    counts = np.maximum(lens - k + 1, 0)
    out_offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    return counts, out_offsets


def shingle_hashes(strings, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash every k-byte shingle of every row.

    Returns (values: uint64 flat array, out_offsets: int64[n+1]) where row
    r's shingle hashes are values[out_offsets[r]:out_offsets[r+1]].
    Rows shorter than k bytes contribute zero shingles.
    """
    flat, offsets = flat_utf8(strings)
    base = offsets[0]
    all_h = _rolling_hash(flat[base : offsets[-1]], k)
    counts, out_offsets = _window_rows(offsets, k)
    if all_h.size == 0 or out_offsets[-1] == 0:
        return np.zeros(0, dtype=np.uint64), out_offsets
    # gather the in-row windows: for row r, starts offsets[r]..offsets[r+1]-k
    starts = np.repeat(offsets[:-1] - base, counts)
    within = _segment_arange(counts)
    return all_h[starts + within], out_offsets


def _segment_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated — vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    idx = np.arange(total, dtype=np.int64)
    return idx - np.repeat(ends - counts, counts)


def minhash_params(perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) banks for `perms` multiply-add hash permutations."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=perms, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=perms, dtype=np.uint64)
    return a, b


def minhash_signatures(
    values: np.ndarray,
    out_offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_elems: int = 1 << 22,
) -> np.ndarray:
    """MinHash signatures per row from flat shingle hashes.

    Returns (n_rows, perms) uint64. Rows with zero shingles get the
    all-ones SENTINEL signature (never collides into an LSH bucket).
    Fully vectorized via minimum.reduceat over row segments, chunked so
    the (elems x perms) intermediate stays ~256 MB max.
    """
    n = len(out_offsets) - 1
    perms = len(a)
    sig = np.full((n, perms), _SENTINEL, dtype=np.uint64)
    counts = np.diff(out_offsets)
    nz = np.flatnonzero(counts)
    if nz.size == 0:
        return sig
    # process runs of non-empty rows in chunks of flat elements
    row_chunks: list[np.ndarray] = []
    cur: list[int] = []
    budget = max(chunk_elems // perms, 1024)
    acc = 0
    for r in nz:
        c = int(counts[r])
        if acc + c > budget and cur:
            row_chunks.append(np.array(cur))
            cur, acc = [], 0
        cur.append(r)
        acc += c
    if cur:
        row_chunks.append(np.array(cur))
    for rows in row_chunks:
        segs = [values[out_offsets[r] : out_offsets[r + 1]] for r in rows]
        flat = np.concatenate(segs)
        h = flat[:, None] * a[None, :] + b[None, :]          # (M, perms) u64
        seg_counts = counts[rows]
        starts = np.zeros(len(rows), dtype=np.int64)
        np.cumsum(seg_counts[:-1], out=starts[1:])
        sig[rows] = np.minimum.reduceat(h, starts, axis=0)
        del h, flat, segs  # free before the next chunk allocates -> malloc
        # reuse (new-page faults cost ~70 MB/s in this sandbox)
    return sig


# (256, 8) LUT of +-1 votes per byte value — lets SimHash expand shingle
# hashes bytewise in int8 instead of materializing an (M, 64) uint64
# intermediate (8x the memory traffic; this VM is bandwidth-bound).
_SIM_LUT = (
    ((np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1).astype(np.int8)
    * 2
    - 1
)


_OPH_HOP = np.uint64(0x9E3779B97F4A7C15)  # odd; distinguishes hop counts


def oph_minhash_signatures(
    values: np.ndarray,
    out_offsets: np.ndarray,
    perms: int,
    seed: int,
    mixer,
) -> np.ndarray:
    """One-permutation MinHash with rotation densification.

    One seeded mix pass assigns every shingle hash to one of ``perms``
    bins (top bits) and the signature keeps the min hash per (row, bin) —
    O(M log M) total instead of the dense sketch's O(M * perms) matrix,
    which was the feature stage's dominant memory traffic (this VM is
    bandwidth-bound). Empty bins borrow the value of the nearest filled
    bin to the left (circular), offset by hops * C so different hop
    distances stay distinguishable — the rotation scheme of Shrivastava &
    Li, "Densifying One Permutation Hashing via Rotation for Fast Near
    Neighbor Search" (ICML 2014); one-permutation sketching per Li,
    Owen, Zhang (NIPS 2012). Zero-shingle rows return the all-SENTINEL
    signature, like the dense path.
    """
    if perms & (perms - 1):
        raise ValueError("oph perms must be a power of two")
    n = len(out_offsets) - 1
    sig = np.full((n, perms), _SENTINEL, dtype=np.uint64)
    counts = np.diff(out_offsets)
    if values.size == 0 or n == 0:
        return sig
    h = mixer(values, 9100 + seed)
    bin_shift = np.uint64(64 - int(np.log2(perms)))
    bins = (h >> bin_shift).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    key = rows * perms + bins
    order = np.argsort(key, kind="stable")
    ks = key[order]
    hs = h[order]
    seg = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    sig.reshape(-1)[ks[seg]] = np.minimum.reduceat(hs, seg)

    # rotation densification over the (n, perms) grid (tiny: n x 2p ints)
    filled = sig != _SENTINEL
    some = filled.any(axis=1)
    partial = np.flatnonzero(some & ~filled.all(axis=1))
    if partial.size:
        s = sig[partial]
        f2 = np.concatenate([filled[partial]] * 2, axis=1)
        pos = np.where(f2, np.arange(2 * perms)[None, :], -1)
        last = np.maximum.accumulate(pos, axis=1)[:, perms:]  # (m, perms)
        hops = (np.arange(perms)[None, :] + perms - last).astype(np.uint64)
        v2 = np.concatenate([s] * 2, axis=1)
        borrowed = np.take_along_axis(v2, last, axis=1) + hops * _OPH_HOP
        sig[partial] = np.where(filled[partial], s, borrowed)
    return sig


def simhash_from_shingles(
    values: np.ndarray, out_offsets: np.ndarray, chunk_elems: int = 1 << 22
) -> np.ndarray:
    """64-bit SimHash per row (Charikar 2002): sign of the per-bit sum of
    +-1 votes from each shingle hash. Zero-shingle rows get SENTINEL.

    Bit votes come from a bytewise +-1 LUT over the hash's little-endian
    bytes (byte k bit j == global bit 8k+j, matching the shift order), so
    the expansion is int8 end-to-end."""
    n = len(out_offsets) - 1
    out = np.full(n, _SENTINEL, dtype=np.uint64)
    counts = np.diff(out_offsets)
    nz = np.flatnonzero(counts)
    if nz.size == 0:
        return out
    shifts = np.arange(64, dtype=np.uint64)
    start = 0
    while start < len(nz):
        # chunk rows so the (elems x 64) int8 intermediate stays bounded
        end = start
        acc = 0
        budget = max(chunk_elems // 64, 1024)
        while end < len(nz) and (acc == 0 or acc + counts[nz[end]] <= budget):
            acc += int(counts[nz[end]])
            end += 1
        rows = nz[start:end]
        flat = np.ascontiguousarray(
            np.concatenate(
                [values[out_offsets[r] : out_offsets[r + 1]] for r in rows]
            )
        )
        votes = _SIM_LUT[flat.view(np.uint8).reshape(flat.size, 8)].reshape(
            flat.size, 64
        )  # (M, 64) int8 in {-1, +1}
        seg_counts = counts[rows]
        starts = np.zeros(len(rows), dtype=np.int64)
        np.cumsum(seg_counts[:-1], out=starts[1:])
        sums = np.add.reduceat(votes, starts, axis=0, dtype=np.int32)
        code = ((sums > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[rows] = code
        del votes, sums, flat
        start = end
    return out


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def sliding_argmin_leftmost(
    grams: np.ndarray,
    window: int,
    row_gram_starts: np.ndarray,
    g_counts: np.ndarray,
) -> np.ndarray:
    """Leftmost argmin (index into ``grams``) of every in-row sliding
    window, rows concatenated in (row, window-start) order.

    O(total grams) via the van Herk / Gil-Werman two-scan trick instead
    of ``sliding_window_view(...).argmin(axis=1)``'s O(total x window):
    rows are copied into a block-aligned scratch (each row starts at a
    multiple of ``window``; the tail padding is U64_MAX so it never
    wins), per-block prefix/suffix running argminima are built in 2 x
    ``window`` vectorized column steps, and each window [p, p+w-1] is
    answered as min(suffix-from-p, prefix-to-p+w-1) with ties resolved
    toward the suffix — which holds the earlier indices, preserving
    numpy argmin's leftmost-tie semantics exactly. The block alignment
    also guarantees no scan crosses a row boundary (the inter-row
    cross-gram garbage in ``grams`` is never even copied in).
    """
    w = int(window)
    m_counts = np.maximum(g_counts - w + 1, 0)
    if m_counts.sum() == 0:
        return np.zeros(0, dtype=np.int64)
    use = np.flatnonzero(m_counts > 0)
    gc = g_counts[use]
    sb = row_gram_starts[use]
    mc = m_counts[use]
    pl = ((gc + w - 1) // w) * w          # padded row length
    prow = np.zeros(len(use) + 1, dtype=np.int64)
    np.cumsum(pl, out=prow[1:])
    padded = np.full(prow[-1], _U64_MAX, dtype=np.uint64)
    dst = np.repeat(prow[:-1], gc) + _segment_arange(gc)
    src = np.repeat(sb, gc) + _segment_arange(gc)
    padded[dst] = grams[src]

    G = padded.reshape(-1, w)
    nb = G.shape[0]
    # prefix running (value, within-block argmin), leftmost on ties
    pv = np.empty_like(G)
    pi = np.empty((nb, w), dtype=np.int32)
    pv[:, 0] = G[:, 0]
    pi[:, 0] = 0
    for j in range(1, w):
        better = G[:, j] < pv[:, j - 1]
        pv[:, j] = np.where(better, G[:, j], pv[:, j - 1])
        pi[:, j] = np.where(better, j, pi[:, j - 1])
    # suffix running minima; <= so the LEFTMOST index wins within the
    # suffix too
    sv = np.empty_like(G)
    si = np.empty((nb, w), dtype=np.int32)
    sv[:, w - 1] = G[:, w - 1]
    si[:, w - 1] = w - 1
    for j in range(w - 2, -1, -1):
        better = G[:, j] <= sv[:, j + 1]
        sv[:, j] = np.where(better, G[:, j], sv[:, j + 1])
        si[:, j] = np.where(better, j, si[:, j + 1])

    svf, sif = sv.reshape(-1), si.reshape(-1)
    pvf, pif = pv.reshape(-1), pi.reshape(-1)
    p = np.repeat(prow[:-1], mc) + _segment_arange(mc)
    e = p + w - 1
    take_suffix = svf[p] <= pvf[e]
    q = np.where(
        take_suffix,
        (p // w) * w + sif[p],
        (e // w) * w + pif[e],
    )
    rows_w = np.repeat(np.arange(len(use), dtype=np.int64), mc)
    return sb[rows_w] + (q - prow[:-1][rows_w])


def winnow_fingerprints(
    strings, gram: int, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03).

    Selects the minimum gram-hash in every sliding window of ``window``
    consecutive gram hashes. Guarantee: two strings sharing a substring of
    length >= gram + window - 1 (= substring_min_len) share at least one
    selected fingerprint *value* — so bucketing on fingerprints finds every
    qualifying pair (SURVEY.md §2 G12 candidate generation).

    Returns (values uint64 flat, out_offsets int64[n+1]); consecutive
    duplicate selections within a row are deduplicated.
    """
    flat, offsets = flat_utf8(strings)
    base = offsets[0]
    grams = _rolling_hash(flat[base : offsets[-1]], gram)
    lens = np.diff(offsets)
    g_counts = np.maximum(lens - gram + 1, 0)
    m_counts = np.maximum(g_counts - window + 1, 0)          # windows per row
    out_offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(m_counts, out=out_offsets[1:])
    if out_offsets[-1] == 0:
        return np.zeros(0, dtype=np.uint64), out_offsets
    # per-row sliding min over the flat gram array (``grams`` is indexed
    # by flat BYTE position; rows' windows start at offsets[r]-base)
    sel_flat = sliding_argmin_leftmost(
        grams, window, offsets[:-1] - base, g_counts
    )
    sel = grams[sel_flat]
    # dedupe consecutive equal selections within each row
    row_id = np.repeat(np.arange(len(lens), dtype=np.int64), m_counts)
    keep = np.ones(sel.size, dtype=bool)
    keep[1:] = (sel[1:] != sel[:-1]) | (row_id[1:] != row_id[:-1])
    new_counts = np.bincount(row_id[keep], minlength=len(lens))
    new_offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    return sel[keep], new_offsets


def winnow_fingerprints_pos(
    strings, gram: int, window: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Winnowing fingerprints WITH their byte positions.

    Like winnow_fingerprints, but returns (values, positions, offsets)
    where positions[i] is the row-local byte offset of the selected
    gram's start. Each distinct selected OCCURRENCE appears once (two
    occurrences of the same gram value at different positions are both
    kept); rows are sorted by (value, position) so per-segment merge
    kernels apply. The selection rule (leftmost window minimum) is a
    deterministic function of the window's gram hashes, so two rows
    sharing a substring of length >= gram+window-1 select the same
    fingerprint at the same relative offset inside it — the positional
    strengthening of the SIGMOD'03 guarantee that
    substring_probe_hits exploits.
    """
    flat, offsets = flat_utf8(strings)
    base = offsets[0]
    grams = _rolling_hash(flat[base : offsets[-1]], gram)
    lens = np.diff(offsets)
    g_counts = np.maximum(lens - gram + 1, 0)
    m_counts = np.maximum(g_counts - window + 1, 0)
    n = len(lens)
    if m_counts.sum() == 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, np.zeros(0, dtype=np.int64), np.zeros(n + 1, dtype=np.int64)
    sel_idx = sliding_argmin_leftmost(
        grams, window, offsets[:-1] - base, g_counts
    )                                            # flat gram index selected
    row_id = np.repeat(np.arange(n, dtype=np.int64), m_counts)
    # dedupe consecutive identical selections (same occurrence picked by
    # overlapping windows)
    keep = np.ones(sel_idx.size, dtype=bool)
    keep[1:] = (sel_idx[1:] != sel_idx[:-1]) | (row_id[1:] != row_id[:-1])
    sel_idx, row_id = sel_idx[keep], row_id[keep]
    vals = grams[sel_idx]
    pos = sel_idx - (offsets[row_id] - base)     # row-local byte offset
    # occurrences can repeat non-consecutively (distant windows reselect
    # the same position): drop exact duplicates, sort by (row, value, pos)
    order = np.lexsort((pos, vals, row_id))
    vals, pos, row_id = vals[order], pos[order], row_id[order]
    uniq = np.ones(vals.size, dtype=bool)
    uniq[1:] = (
        (row_id[1:] != row_id[:-1]) | (pos[1:] != pos[:-1])
    )
    vals, pos, row_id = vals[uniq], pos[uniq], row_id[uniq]
    counts = np.bincount(row_id, minlength=n)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    return vals, pos, out_offsets


def pairwise_matching_positions(
    av: np.ndarray, apos: np.ndarray, ao: np.ndarray,
    bv: np.ndarray, bpos: np.ndarray, bo: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Enumerate every cross-side equal-value occurrence pair per segment.

    Both sides are per-segment sorted by value (positions ride along).
    Returns (pair_id, a_position, b_position), one row per (occurrence in
    A_i) x (occurrence in B_i) with equal value — the candidate anchor
    pairs for the positional substring probe. Fully vectorized; repeated
    values expand to their (small) cross products.
    """
    n = len(ao) - 1
    if av.size == 0 or bv.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    # Both sides are per-segment sorted by value, so packing the segment
    # id into the high bits yields two GLOBALLY sorted key arrays and the
    # merge is two np.searchsorted probes — no lexsort (the 2-key stable
    # sort was ~70% of the verify stage's kernel time at sf0.2). The
    # value is truncated by rbits; truncation collisions are filtered by
    # the exact 64-bit confirm below, so results are identical.
    rbits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    if rbits > 24:  # >16M segments in one call: keys would truncate too
        return _matching_positions_lexsort(av, apos, ao, bv, bpos, bo)
    av = np.asarray(av).view(np.uint64)  # logical >> (int64 would sign-extend)
    bv = np.asarray(bv).view(np.uint64)
    sh = np.uint64(64 - rbits)
    rb_ = np.uint64(rbits)
    ra = np.repeat(np.arange(n, dtype=np.uint64), np.diff(ao))
    rbseg = np.repeat(np.arange(n, dtype=np.uint64), np.diff(bo))
    ka = (ra << sh) | (av >> rb_)
    kb = (rbseg << sh) | (bv >> rb_)
    lo = np.searchsorted(kb, ka, side="left")
    hi = np.searchsorted(kb, ka, side="right")
    cnt = hi - lo
    if int(cnt.sum()) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    a_idx = np.repeat(np.arange(ka.size, dtype=np.int64), cnt)
    b_idx = np.repeat(lo, cnt) + _segment_arange(cnt)
    keep = av[a_idx] == bv[b_idx]  # exact confirm (keys are truncated)
    a_idx, b_idx = a_idx[keep], b_idx[keep]
    return ra[a_idx].astype(np.int64), apos[a_idx], bpos[b_idx]


def _matching_positions_lexsort(
    av: np.ndarray, apos: np.ndarray, ao: np.ndarray,
    bv: np.ndarray, bpos: np.ndarray, bo: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lexsort fallback for pathological segment counts (n >= 2^24)."""
    n = len(ao) - 1
    ra = np.repeat(np.arange(n, dtype=np.int64), np.diff(ao))
    rb = np.repeat(np.arange(n, dtype=np.int64), np.diff(bo))
    allv = np.concatenate([av, bv])
    allr = np.concatenate([ra, rb])
    allp = np.concatenate([apos, bpos])
    side = np.concatenate(
        [np.zeros(av.size, dtype=np.int8), np.ones(bv.size, dtype=np.int8)]
    )
    if allv.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    # two sort keys only: the stable lexsort keeps A occurrences (which
    # were concatenated first) ahead of B occurrences inside each equal
    # (segment, value) run, which is all the run-splitting below needs
    order = np.lexsort((allv, allr))
    v, r, s, p = allv[order], allr[order], side[order], allp[order]
    run_start = np.flatnonzero(
        np.r_[True, (r[1:] != r[:-1]) | (v[1:] != v[:-1])]
    )
    run_sizes = np.diff(np.r_[run_start, v.size])
    # A entries precede B entries inside a run (stable sort, A first)
    ka = np.add.reduceat(s == 0, run_start)
    kb = run_sizes - ka
    m_run = ka * kb
    live = m_run > 0
    if not live.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    rs, ka, kb, m_run = run_start[live], ka[live], kb[live], m_run[live]
    t = _segment_arange(m_run)
    rs_r = np.repeat(rs, m_run)
    ka_r = np.repeat(ka, m_run)
    kb_r = np.repeat(kb, m_run)
    a_idx = rs_r + t // kb_r
    b_idx = rs_r + ka_r + t % kb_r
    return r[a_idx], p[a_idx], p[b_idx]


def substring_probe_hits(
    abuf: np.ndarray, a_abs: np.ndarray, a_left: np.ndarray,
    a_right: np.ndarray,
    bbuf: np.ndarray, b_abs: np.ndarray, b_left: np.ndarray,
    b_right: np.ndarray,
    k: int, W: int,
) -> np.ndarray:
    """Decide, per shared-fingerprint occurrence pair, whether the k-byte
    anchor match extends to a common run of length >= k + W.

    a_abs/b_abs: absolute byte index of the anchor start in each flat
    buffer; a_left/a_right etc.: bytes available inside the document on
    each side of the anchor. Exact biconditional with the LCS >= k+W
    predicate: a common substring of length >= k+W contains a shared
    selected fingerprint at the same relative offset q, leaving >= q
    matching bytes on the left and >= W-q on the right (winnowing window
    w = W+1), so left_run + right_run >= W at that occurrence; conversely
    left_run + right_run >= W exhibits k+W contiguous equal bytes.
    """
    m = a_abs.size
    if m == 0:
        return np.zeros(0, dtype=bool)
    j = np.arange(W, dtype=np.int64)
    la = abuf[np.clip(a_abs[:, None] - W + j, 0, abuf.size - 1)]
    lb = bbuf[np.clip(b_abs[:, None] - W + j, 0, bbuf.size - 1)]
    avail_l = np.minimum(np.minimum(a_left, b_left), W)
    valid_l = j >= (W - avail_l[:, None])
    eq_l = (la == lb) & valid_l
    left_run = np.cumprod(eq_l[:, ::-1], axis=1).sum(axis=1)
    ra = abuf[np.clip(a_abs[:, None] + k + j, 0, abuf.size - 1)]
    rb = bbuf[np.clip(b_abs[:, None] + k + j, 0, bbuf.size - 1)]
    avail_r = np.minimum(np.minimum(a_right, b_right), W)
    valid_r = j < avail_r[:, None]
    eq_r = (ra == rb) & valid_r
    right_run = np.cumprod(eq_r, axis=1).sum(axis=1)
    return (left_run + right_run) >= W


def lsh_band_keys(sig: np.ndarray, bands: int, rows: int, mixer) -> np.ndarray:
    """Hash each band (``rows`` STRIDED signature slots: band b takes
    positions b, b+bands, ..., b+(rows-1)*bands) to one uint64.

    Strided (not consecutive) slot assignment matters under OPH rotation
    densification: an empty-bin run borrows from the same filled bin, so
    two docs sharing a single shingle minimum can agree on a whole run of
    consecutive slots — with consecutive banding that one coincidence
    collides a full band (measured 4.0M spurious cold-bucket pairs at
    n=60k vs 0.4M strided, same true-pair coverage). Scattering a band's
    slots across the signature breaks run alignment; per-slot agreement
    statistics (and the 1-(1-s^r)^b recall curve) are unchanged.

    sig: (n, bands*rows) uint64 -> (n, bands) uint64 band keys. Rows with
    the SENTINEL signature return SENTINEL keys (caller filters them out).
    """
    n = sig.shape[0]
    v = sig.reshape(n, rows, bands)
    acc = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows):
        acc = acc * np.uint64(0x100000001B3) + v[:, j, :]
    empty = (sig == _SENTINEL).all(axis=1)
    keys = np.empty((n, bands), dtype=np.uint64)
    for bi in range(bands):
        keys[:, bi] = mixer(acc[:, bi], 1000 + bi)
    keys[empty] = _SENTINEL
    return keys


def exact_jaccard(a_vals: np.ndarray, b_vals: np.ndarray) -> float:
    """Exact Jaccard over two rows' shingle-hash multisets-as-sets."""
    sa = np.unique(a_vals)
    sb = np.unique(b_vals)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    if sa.size == 0 or sb.size == 0:
        return 0.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def segment_unique(
    values: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sort + dedupe each segment of a flat (values, offsets) layout.
    Returns new (values, offsets) with each segment sorted ascending and
    duplicate-free. Fully vectorized (one lexsort over the flat array)."""
    n = len(offsets) - 1
    if values.size == 0:
        return values, offsets
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    order = np.lexsort((values, seg))
    v = values[order]
    s = seg[order]
    keep = np.ones(v.size, dtype=bool)
    keep[1:] = (v[1:] != v[:-1]) | (s[1:] != s[:-1])
    v, s = v[keep], s[keep]
    counts = np.bincount(s, minlength=n)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    return v, out_offsets


def gather_segments(
    values: np.ndarray, offsets: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize segments ``idx`` of a flat (values, offsets) layout as a
    new flat layout — the expansion step that lets per-UNIQUE-document
    shingle sets (computed once) serve many pairs. Vectorized gather."""
    idx = np.asarray(idx, dtype=np.int64)
    counts = offsets[idx + 1] - offsets[idx]
    out_offsets = np.zeros(idx.size + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    if out_offsets[-1] == 0:
        return np.zeros(0, dtype=values.dtype), out_offsets
    pos = np.repeat(offsets[idx], counts) + _segment_arange(counts)
    return values[pos], out_offsets


def gather_segments2(
    values: np.ndarray, aux: np.ndarray, offsets: np.ndarray, idx: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """gather_segments for two parallel flat arrays sharing one offsets
    layout (winnow fingerprint values + their byte positions) — the
    gather index is computed once."""
    idx = np.asarray(idx, dtype=np.int64)
    counts = offsets[idx + 1] - offsets[idx]
    out_offsets = np.zeros(idx.size + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    if out_offsets[-1] == 0:
        return (np.zeros(0, dtype=values.dtype),
                np.zeros(0, dtype=aux.dtype), out_offsets)
    pos = np.repeat(offsets[idx], counts) + _segment_arange(counts)
    return values[pos], aux[pos], out_offsets


def pairwise_intersection_counts(
    av: np.ndarray, ao: np.ndarray, bv: np.ndarray, bo: np.ndarray
) -> np.ndarray:
    """|A_i ∩ B_i| for each segment pair i, where both sides are per-segment
    sorted + unique (see segment_unique). One lexsort over the combined
    flat arrays — no per-pair python. This is the vectorized core of the
    exact-Jaccard and fingerprint-screen verify predicates."""
    n = len(ao) - 1
    if av.size == 0 or bv.size == 0:
        return np.zeros(n, dtype=np.int64)
    rbits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    if rbits <= 24:
        # both sides are per-segment sorted (+ unique), so packed
        # (segment, truncated-value) keys are globally sorted and the
        # intersection is two searchsorted probes + an exact confirm —
        # no lexsort (see pairwise_matching_positions)
        avu = np.asarray(av).view(np.uint64)
        bvu = np.asarray(bv).view(np.uint64)
        sh = np.uint64(64 - rbits)
        rb_ = np.uint64(rbits)
        ra = np.repeat(np.arange(n, dtype=np.uint64), np.diff(ao))
        rbseg = np.repeat(np.arange(n, dtype=np.uint64), np.diff(bo))
        ka = (ra << sh) | (avu >> rb_)
        kb = (rbseg << sh) | (bvu >> rb_)
        lo = np.searchsorted(kb, ka, side="left")
        hi = np.searchsorted(kb, ka, side="right")
        cnt = hi - lo
        if int(cnt.sum()) == 0:
            return np.zeros(n, dtype=np.int64)
        a_idx = np.repeat(np.arange(ka.size, dtype=np.int64), cnt)
        b_idx = np.repeat(lo, cnt) + _segment_arange(cnt)
        keep = avu[a_idx] == bvu[b_idx]
        return np.bincount(ra[a_idx[keep]].astype(np.int64), minlength=n)
    ra = np.repeat(np.arange(n, dtype=np.int64), np.diff(ao))
    rb = np.repeat(np.arange(n, dtype=np.int64), np.diff(bo))
    allv = np.concatenate([av, bv])
    allr = np.concatenate([ra, rb])
    side = np.concatenate(
        [np.zeros(av.size, dtype=np.int8), np.ones(bv.size, dtype=np.int8)]
    )
    # two sort keys only: per-side segments are unique, so an equal
    # (segment, value) run holds at most one element per side, and the
    # stable lexsort keeps A (concatenated first) before B — the side
    # array is needed for the hit test but not as a sort key (the third
    # stable pass was ~1/3 of this kernel's time)
    order = np.lexsort((allv, allr))
    v = allv[order]
    r = allr[order]
    s = side[order]
    hit = (r[1:] == r[:-1]) & (v[1:] == v[:-1]) & (s[1:] != s[:-1])
    return np.bincount(r[1:][hit], minlength=n)


SENTINEL = _SENTINEL
