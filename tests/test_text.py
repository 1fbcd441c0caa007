import numpy as np
import pyarrow as pa
import pytest

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.functions.phash import mix64
from well_duplicates_ray.functions.text import (
    SENTINEL,
    exact_jaccard,
    flat_utf8,
    lsh_band_keys,
    minhash_params,
    minhash_signatures,
    shingle_hashes,
    simhash_from_shingles,
    winnow_fingerprints,
)

CFG = DedupConfig()


def test_flat_utf8_arrow_and_python():
    strs = ["hello", "", "worldly"]
    f1, o1 = flat_utf8(strs)
    f2, o2 = flat_utf8(pa.array(strs))
    assert bytes(f1[o1[0]:o1[-1]]) == b"helloworldly"
    assert np.array_equal(np.diff(o1), np.diff(o2))
    # sliced arrow array (non-zero offset)
    f3, o3 = flat_utf8(pa.array(["xx"] + strs).slice(1))
    assert np.array_equal(np.diff(o3), np.diff(o1))
    assert bytes(f3[o3[0]:o3[-1]]) == b"helloworldly"


def test_shingle_hashes_counts_and_equality():
    vals, offs = shingle_hashes(["abcdefg", "abc", "xabcdefgx"], 5)
    counts = np.diff(offs).tolist()
    assert counts == [3, 0, 5]
    # identical substrings hash identically across rows
    a = vals[offs[0]:offs[1]]
    c = vals[offs[2]:offs[3]]
    assert set(a.tolist()) <= set(c.tolist())


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(7)
    base = " ".join(chr(97 + int(x)) * 3 for x in rng.integers(0, 26, 60))
    variant = base[:int(len(base) * 0.8)] + " zz qq pp"
    other = " ".join(chr(97 + int(x)) * 3 for x in rng.integers(0, 26, 60))
    vals, offs = shingle_hashes([base, variant, other], CFG.shingle_k)
    a, b = minhash_params(CFG.minhash_perms, CFG.seed)
    sig = minhash_signatures(vals, offs, a, b)
    true_j = exact_jaccard(vals[offs[0]:offs[1]], vals[offs[1]:offs[2]])
    est = (sig[0] == sig[1]).mean()
    assert abs(est - true_j) < 0.15
    assert (sig[0] == sig[2]).mean() < 0.3


def test_oph_minhash_estimates_jaccard_and_densifies():
    from well_duplicates_ray.functions.phash import mix64
    from well_duplicates_ray.functions.text import oph_minhash_signatures

    rng = np.random.default_rng(7)
    base = " ".join(chr(97 + int(x)) * 3 for x in rng.integers(0, 26, 120))
    variant = base[: int(len(base) * 0.8)] + " zz qq pp ww rr"
    other = " ".join(chr(97 + int(x)) * 3 for x in rng.integers(0, 26, 120))
    vals, offs = shingle_hashes([base, variant, other, "", "abcdef"],
                                CFG.shingle_k)
    sig = oph_minhash_signatures(vals, offs, CFG.minhash_perms, CFG.seed,
                                 mix64)
    true_j = exact_jaccard(vals[offs[0]:offs[1]], vals[offs[1]:offs[2]])
    est = (sig[0] == sig[1]).mean()
    assert abs(est - true_j) < 0.2, (est, true_j)
    assert (sig[0] == sig[2]).mean() < 0.3
    # empty row -> all-sentinel; short row -> densified, NO sentinel slots
    assert (sig[3] == SENTINEL).all()
    assert not (sig[4] == SENTINEL).any()
    # deterministic
    sig2 = oph_minhash_signatures(vals, offs, CFG.minhash_perms, CFG.seed,
                                  mix64)
    assert np.array_equal(sig, sig2)
    # batch-composition independent: same row alone gives the same sig
    v1, o1 = shingle_hashes([base], CFG.shingle_k)
    solo = oph_minhash_signatures(v1, o1, CFG.minhash_perms, CFG.seed, mix64)
    assert np.array_equal(solo[0], sig[0])


def test_minhash_empty_rows_sentinel():
    vals, offs = shingle_hashes(["", "abc", "abcdefgh"], 5)
    a, b = minhash_params(16, 1)
    sig = minhash_signatures(vals, offs, a, b)
    assert (sig[0] == SENTINEL).all() and (sig[1] == SENTINEL).all()
    assert not (sig[2] == SENTINEL).all()


def test_simhash_similar_vs_different():
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    far = "completely unrelated caption about mountains and rivers flowing"
    vals, offs = shingle_hashes([base, near, far], CFG.shingle_k)
    sh = simhash_from_shingles(vals, offs)
    from well_duplicates_ray.functions.phash import hamming64

    d_near = hamming64(sh[:1], sh[1:2])[0]
    d_far = hamming64(sh[:1], sh[2:3])[0]
    assert d_near < d_far
    assert simhash_from_shingles(*shingle_hashes([""], 5))[0] == SENTINEL


def test_winnowing_guarantee():
    """Any pair sharing a substring >= substring_min_len must share a
    fingerprint value (the winnowing guarantee the substring pass rests on)."""
    rng = np.random.default_rng(11)
    cfg = CFG
    for trial in range(30):
        letters = "abcdefghijklmnopqrstuvwxyz "
        mk = lambda n: "".join(rng.choice(list(letters), n))
        run = mk(cfg.substring_min_len + int(rng.integers(0, 10)))
        s1 = mk(int(rng.integers(0, 40))) + run + mk(int(rng.integers(0, 40)))
        s2 = mk(int(rng.integers(0, 40))) + run + mk(int(rng.integers(0, 40)))
        v, o = winnow_fingerprints([s1, s2], cfg.winnow_gram, cfg.winnow_window)
        f1 = set(v[o[0]:o[1]].tolist())
        f2 = set(v[o[1]:o[2]].tolist())
        assert f1 & f2, f"trial {trial}: no shared fingerprint"


def test_winnowing_short_strings_empty():
    v, o = winnow_fingerprints(["short", ""], 16, 9)
    assert v.size == 0 and np.diff(o).tolist() == [0, 0]


def test_lsh_band_keys_shapes_and_sentinel():
    rng = np.random.default_rng(5)
    sig = rng.integers(0, 2**63, size=(3, 8), dtype=np.uint64)
    sig[1] = SENTINEL
    keys = lsh_band_keys(sig, bands=2, rows=4, mixer=mix64)
    assert keys.shape == (3, 2)
    assert (keys[1] == SENTINEL).all()
    # identical signatures -> identical keys; different -> different
    keys2 = lsh_band_keys(sig, bands=2, rows=4, mixer=mix64)
    assert np.array_equal(keys, keys2)
    assert not np.array_equal(keys[0], keys[2])


def test_exact_jaccard_edges():
    assert exact_jaccard(np.array([], np.uint64), np.array([], np.uint64)) == 1.0
    assert exact_jaccard(np.array([1], np.uint64), np.array([], np.uint64)) == 0.0
    assert exact_jaccard(np.array([1, 2], np.uint64), np.array([2, 3], np.uint64)) == pytest.approx(1 / 3)


def test_sliding_argmin_leftmost_equals_naive():
    """Block (van Herk) sliding argmin must equal the naive per-window
    np.argmin bit-for-bit, including leftmost tie-breaking (small value
    alphabet forces frequent ties) and rows separated by garbage gaps."""
    from well_duplicates_ray.functions.text import sliding_argmin_leftmost

    rng = np.random.default_rng(7)
    for _ in range(60):
        nrows = rng.integers(1, 8)
        w = int(rng.integers(2, 30))
        g_counts, starts, pos = [], [], 0
        for _r in range(nrows):
            gc = int(rng.integers(0, 60))
            starts.append(pos)
            g_counts.append(gc)
            pos += gc + int(rng.integers(0, 5))
        grams = rng.integers(0, 4, pos + 5).astype(np.uint64)
        starts = np.array(starts, np.int64)
        g_counts = np.array(g_counts, np.int64)
        got = sliding_argmin_leftmost(grams, w, starts, g_counts)
        exp = []
        for r in range(nrows):
            for ws in range(max(g_counts[r] - w + 1, 0)):
                seg = grams[starts[r] + ws:starts[r] + ws + w]
                exp.append(starts[r] + ws + int(np.argmin(seg)))
        assert np.array_equal(got, np.array(exp, np.int64))


def test_emit_winnow_reuse_equals_recompute():
    """emit_bucket_keys reuses the signature pass's set_winnow column
    (round 4); the distinct (bucket, node) sets of the winnow source must
    equal the recompute fallback's (multiplicities may differ: the
    fallback dedupes only consecutive selections)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    from well_duplicates_ray.config import DedupConfig
    from well_duplicates_ray.stages.candidates import SRC_PLAIN, emit_bucket_keys
    from well_duplicates_ray.stages.signatures import MinHashSignatures

    cfg = DedupConfig(substring_min_len=48, winnow_gram=24)
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(words[int(i)] for i in rng.integers(0, len(words), 40))
        for _ in range(50)
    ]
    texts[10] = texts[3]  # exact dup
    texts[11] = texts[3][:60] + " tail one two three"  # shared run
    base = pa.table(
        {
            "image_id": pa.array([f"{i}" for i in range(50)]),
            "node": pa.array(list(range(50)), pa.int64()),
            "caption": pa.array(texts),
            "content_sha": pa.array(
                [hashlib.md5(t.encode()).hexdigest() for t in texts]
            ),
        }
    )
    feats = MinHashSignatures(cfg.to_dict())(base)
    assert "set_winnow" in feats.column_names

    def winnow_set(tbl):
        out = emit_bucket_keys(tbl, cfg)
        # winnow emissions are SRC_PLAIN; LSH-band emissions are too, but
        # band keys are salted differently — compare the full PLAIN set
        # (equal iff the winnow subsets are, since LSH inputs are equal)
        mask = pc.equal(out["src"], SRC_PLAIN)
        sel = out.filter(mask)
        return set(zip(sel["bucket"].to_pylist(), sel["node"].to_pylist()))

    with_reuse = winnow_set(feats)
    without = winnow_set(feats.drop_columns(
        ["set_winnow", "set_winnow_pos"]
    ))
    assert with_reuse == without and with_reuse
