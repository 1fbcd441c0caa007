import numpy as np
import pytest

from well_duplicates_ray.functions.phash import (
    content_sha1,
    dct_matrix,
    decode_raw,
    hamming64,
    mix64,
    phash_from_gray32,
    phash_raw_batch,
    popcount64,
    prefix_bands,
    psnr,
    resize_gray,
    to_gray,
)


def test_dct_matrix_orthonormal():
    t = dct_matrix(32)
    np.testing.assert_allclose(t @ t.T, np.eye(32), atol=1e-12)


def test_decode_raw_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    assert np.array_equal(decode_raw(img.tobytes(), 6, 8), img)
    with pytest.raises(ValueError):
        decode_raw(img.tobytes(), 7, 8)


def test_resize_meanpool_and_bilinear():
    img = np.arange(64 * 64, dtype=np.float64).reshape(64, 64)
    out = resize_gray(img, 32)
    assert out.shape == (32, 32)
    # mean-pool of the top-left 2x2 block
    assert out[0, 0] == img[:2, :2].mean()
    odd = resize_gray(np.ones((33, 47)), 32)
    np.testing.assert_allclose(odd, 1.0)


def test_phash_flat_vs_gradient():
    flat = np.full((32, 32), 128.0)
    grad = np.tile(np.linspace(0, 255, 32), (32, 1))
    h_flat, h_grad = phash_from_gray32(np.stack([flat, grad]))
    # deterministic
    again = phash_from_gray32(np.stack([flat, grad]))
    assert h_flat == again[0] and h_grad == again[1]
    assert h_flat != h_grad


def test_phash_monotone_under_noise():
    rng = np.random.default_rng(1)
    base = np.repeat(np.repeat(rng.integers(0, 256, (8, 8, 3), np.uint8), 4, 0), 4, 1)
    noisy = np.clip(
        base.astype(int) + rng.integers(-2, 3, base.shape) * (rng.random(base.shape) < 0.03),
        0, 255,
    ).astype(np.uint8)
    other = np.repeat(np.repeat(rng.integers(0, 256, (8, 8, 3), np.uint8), 4, 0), 4, 1)
    h = phash_from_gray32(resize_gray(to_gray(np.stack([base, noisy, other]))))
    assert hamming64(h[:1], h[1:2])[0] <= 6
    assert hamming64(h[:1], h[2:3])[0] > 10


def test_phash_raw_batch_mixed_shapes():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (32, 32, 3), np.uint8)
    b = rng.integers(0, 256, (64, 64, 3), np.uint8)
    out = phash_raw_batch([a.tobytes(), b.tobytes()], [32, 64], [32, 64])
    assert out.dtype == np.uint64 and out.shape == (2,)
    solo = phash_raw_batch([b.tobytes()], [64], [64])
    assert solo[0] == out[1]


def test_popcount_and_hamming():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 64]
    assert hamming64(np.uint64([5]), np.uint64([6])).tolist() == [2]


def test_prefix_bands_pigeonhole():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**63, size=200, dtype=np.uint64)
    # flip <=3 random bits
    y = x.copy()
    for i in range(len(y)):
        for b in rng.choice(64, size=rng.integers(0, 4), replace=False):
            y[i] ^= np.uint64(1) << np.uint64(b)
    bx, by = prefix_bands(x, 4), prefix_bands(y, 4)
    assert ((bx == by).any(axis=1)).all()  # Hamming<=3 => share a band


def test_mix64_distinct_salts():
    x = np.arange(100, dtype=np.uint64)
    assert not np.array_equal(mix64(x, 1), mix64(x, 2))


def test_psnr_and_sha():
    a = np.zeros((4, 4, 3), np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 10
    assert 20 < psnr(a, b) < 60
    assert content_sha1(b"x") != content_sha1(b"y")
