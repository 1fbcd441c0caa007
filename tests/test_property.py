"""Property-based tests (hypothesis) for the text/suffix kernels —
including non-ASCII input, which the byte-oriented kernels must handle
without alignment assumptions."""

import numpy as np
from hypothesis import given, settings, strategies as st

from well_duplicates_ray.functions.suffix import longest_common_substring_len
from well_duplicates_ray.functions.text import (
    flat_utf8,
    pairwise_intersection_counts,
    segment_unique,
    shingle_hashes,
    winnow_fingerprints,
)

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@settings(max_examples=60, deadline=None)
@given(st.lists(text_st, max_size=8))
def test_flat_utf8_offsets_match_byte_lengths(strings):
    flat, offsets = flat_utf8(strings)
    lens = np.diff(offsets)
    assert lens.tolist() == [len(s.encode("utf-8")) for s in strings]
    joined = bytes(flat[offsets[0] : offsets[-1]])
    assert joined == b"".join(s.encode("utf-8") for s in strings)


@settings(max_examples=60, deadline=None)
@given(st.lists(text_st, max_size=6), st.integers(2, 8))
def test_shingle_counts(strings, k):
    _, offs = shingle_hashes(strings, k)
    for s, c in zip(strings, np.diff(offs)):
        assert c == max(0, len(s.encode("utf-8")) - k + 1)


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="abc", max_size=25),
    st.text(alphabet="abc", max_size=25),
)
def test_lcs_matches_bruteforce(a, b):
    best = 0
    ab, bb = a.encode(), b.encode()
    for i in range(len(ab)):
        for j in range(len(bb)):
            k = 0
            while i + k < len(ab) and j + k < len(bb) and ab[i + k] == bb[j + k]:
                k += 1
            best = max(best, k)
    assert longest_common_substring_len(ab, bb) == best


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="abcdefgh", min_size=30, max_size=40),
    st.text(alphabet="abcdefgh", max_size=30),
    st.text(alphabet="abcdefgh", max_size=30),
)
def test_winnowing_guarantee_property(run, pre, post):
    """Strings sharing a >= (gram+window-1)-byte run share a fingerprint."""
    gram, window = 16, 9
    s1 = pre + run
    s2 = run + post
    v, o = winnow_fingerprints([s1, s2], gram, window)
    f1 = set(v[o[0] : o[1]].tolist())
    f2 = set(v[o[1] : o[2]].tolist())
    assert f1 & f2


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.lists(st.integers(0, 50), max_size=20), min_size=1, max_size=6),
    st.lists(st.lists(st.integers(0, 50), max_size=20), min_size=1, max_size=6),
)
def test_pairwise_intersections_match_sets(a_lists, b_lists):
    n = min(len(a_lists), len(b_lists))
    a_lists, b_lists = a_lists[:n], b_lists[:n]

    def flatten(lists):
        vals = np.array([x for xs in lists for x in xs], dtype=np.uint64)
        offs = np.zeros(len(lists) + 1, dtype=np.int64)
        np.cumsum([len(xs) for xs in lists], out=offs[1:])
        return segment_unique(vals, offs)

    av, ao = flatten(a_lists)
    bv, bo = flatten(b_lists)
    got = pairwise_intersection_counts(av, ao, bv, bo)
    want = [len(set(a) & set(b)) for a, b in zip(a_lists, b_lists)]
    assert got.tolist() == want


@given(
    st.lists(st.lists(st.integers(0, 50), max_size=6), min_size=1, max_size=8),
    st.data(),
)
def test_gather_segments_matches_python(segs, data):
    from well_duplicates_ray.functions.text import gather_segments

    values = np.array([v for s in segs for v in s], dtype=np.uint64)
    offsets = np.zeros(len(segs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in segs], out=offsets[1:])
    idx = data.draw(
        st.lists(st.integers(0, len(segs) - 1), max_size=12).map(
            lambda xs: np.array(xs, dtype=np.int64)
        )
    )
    gv, go = gather_segments(values, offsets, idx)
    rebuilt = [gv[go[i] : go[i + 1]].tolist() for i in range(len(idx))]
    assert rebuilt == [segs[i] for i in idx]


@given(st.lists(st.integers(1, 6), min_size=1, max_size=6))
@settings(deadline=None)  # first call pays the ray.data import
def test_tri_pairs_enumerates_all_unordered_pairs(sizes):
    from well_duplicates_ray.stages.candidates import _tri_pairs

    sizes = np.array(sizes, dtype=np.int64)
    starts = np.zeros(len(sizes), dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    order = np.arange(int(sizes.sum()), dtype=np.int64) * 10  # any values
    li, ri = _tri_pairs(order, starts, sizes)
    got = set(zip(li.tolist(), ri.tolist()))
    want = set()
    for s, z in zip(starts, sizes):
        for i in range(s, s + z):
            for j in range(i + 1, s + z):
                want.add((order[i], order[j]))
    assert got == want and len(li) == sum(z * (z - 1) // 2 for z in sizes)


@given(st.lists(st.text(alphabet="abcd ", max_size=40), max_size=6))
@settings(deadline=None)
def test_oph_signature_batch_independence(strings):
    from well_duplicates_ray.config import DedupConfig
    from well_duplicates_ray.functions.phash import mix64
    from well_duplicates_ray.functions.text import (
        oph_minhash_signatures,
        shingle_hashes,
    )

    cfg = DedupConfig()
    vals, offs = shingle_hashes(strings, cfg.shingle_k)
    sig = oph_minhash_signatures(vals, offs, cfg.minhash_perms, cfg.seed,
                                 mix64)
    for i, s in enumerate(strings):
        v1, o1 = shingle_hashes([s], cfg.shingle_k)
        solo = oph_minhash_signatures(v1, o1, cfg.minhash_perms, cfg.seed,
                                      mix64)
        assert np.array_equal(solo[0], sig[i])
