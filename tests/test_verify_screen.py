"""Unit tests for the adaptive MinHash-estimate screen (ADVICE r2,
medium): in OPH mode the margin must widen with the pair's effective
sample size so short docs are never silently screened out of the exact
Jaccard pass."""

import numpy as np

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.stages.verify import screen_mask


def test_screen_mask_oph_widens_for_short_docs():
    cfg = DedupConfig()  # default minhash_mode='oph'
    est = np.array([0.5, 0.5])
    na = np.array([5, 10_000])
    nb = np.array([5, 10_000])
    m = screen_mask(est, na, nb, cfg)
    # short-doc pair: n_eff ~ 5 filled bins -> margin blows past the
    # threshold, screen passes the pair to exact Jaccard
    assert m[0]
    # long-doc pair: n_eff ~ P -> margin ~ screen_margin, 0.5 < 0.7-0.16
    assert not m[1]


def test_screen_mask_oph_uses_smaller_doc():
    cfg = DedupConfig()
    est = np.array([0.5])
    # one long doc does not rescue the pair: the effective sample size is
    # bounded by the SMALLER doc's fill
    m = screen_mask(est, np.array([5]), np.array([10_000]), cfg)
    assert m[0]


def test_screen_mask_dense_fixed_margin():
    cfg = DedupConfig(minhash_mode="dense")
    est = np.array([0.55, 0.53])
    na = nb = np.array([5, 5])
    m = screen_mask(est, na, nb, cfg)
    # dense mode: every permutation is an independent trial regardless of
    # doc length; cutoff is exactly threshold - screen_margin = 0.54
    assert m[0]
    assert not m[1]


def test_screen_mask_never_tightens_below_dense_cutoff():
    cfg = DedupConfig()
    rng = np.random.default_rng(0)
    na = rng.integers(1, 5000, size=256)
    nb = rng.integers(1, 5000, size=256)
    # est exactly at the dense cutoff always passes in oph mode (margin
    # only ever widens)
    est = np.full(256, cfg.jaccard_threshold - cfg.screen_margin)
    assert screen_mask(est, na, nb, cfg).all()
