"""Signature stages: caption shingles -> MinHash + SimHash (SURVEY.md §2 G5-G7).

``MinHashSignatures`` is an actor-pool stage: the seeded permutation bank
is built once per actor in ``__init__`` (the graft analogue of the
reference's amortized targets precompute,
``prepare_indexed_targets.py`` — SURVEY.md §3 E1) and applied to every
batch with vectorized kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.functions.phash import mix64
from well_duplicates_ray.functions.text import (
    minhash_params,
    minhash_signatures,
    oph_minhash_signatures,
    shingle_hashes,
    simhash_from_shingles,
)


class FeatureExtractor:
    """Fused stage: validate -> decode/pHash-verify -> MinHash/SimHash in
    one ``map_batches``. One fused stage instead of three saves two
    inter-stage object-store hops; the stages stay individually testable
    as their own classes.

    Also emits ``node:int64`` (digits of image_id — "img%08d" and plain
    integer ids both parse): every downstream shuffle keys on the 8-byte
    int, never the string id.
    """

    def __init__(self, cfg: dict | None = None):
        from well_duplicates_ray.stages.decode import DecodePHash, validate_images

        self._validate = validate_images
        self._decode = DecodePHash(cfg)
        self._sign = MinHashSignatures(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = self._sign(self._decode(self._validate(batch)))
        digits = pc.replace_substring_regex(out["image_id"], r"[^0-9]", "")
        return out.append_column("node", digits.cast(pa.int64()))


_FX_CACHE: dict = {}
_MS_CACHE: dict = {}


def make_signature_fn(cfg_dict: dict | None):
    """MinHashSignatures as a worker-cached task function (same rationale
    as make_feature_fn)."""
    import json

    key = json.dumps(cfg_dict, sort_keys=True) if cfg_dict else ""

    def signature_fn(batch: pa.Table) -> pa.Table:
        ms = _MS_CACHE.get(key)
        if ms is None:
            ms = MinHashSignatures(cfg_dict)
            _MS_CACHE[key] = ms
        return ms(batch)

    return signature_fn


def make_feature_fn(cfg_dict: dict | None):
    """Feature stage as a plain function for stateless task pools.

    The per-"actor" state here is a seeded hash bank that costs
    microseconds to build, so tasks (cached per worker process) beat an
    actor pool: Ray fuses the function with the parquet read — the
    decoded image bytes never enter the object store — and task pools
    have no autoscaling ramp. Actor pools remain the right shape for
    heavy state (codec/model-backed stages, see stages/multimodal.py).
    """
    import json

    key = json.dumps(cfg_dict, sort_keys=True) if cfg_dict else ""

    def feature_fn(batch: pa.Table) -> pa.Table:
        fx = _FX_CACHE.get(key)
        if fx is None:
            fx = FeatureExtractor(cfg_dict)
            _FX_CACHE[key] = fx
        return fx(batch)

    return feature_fn


class MinHashSignatures:
    """map_batches actor: adds minhash (fixed list<uint64>), simhash (int64)
    and n_shingles columns to the narrow feature table."""

    def __init__(self, cfg: dict | None = None):
        self.cfg = DedupConfig.from_dict(cfg) if cfg else DedupConfig()
        self.a, self.b = minhash_params(self.cfg.minhash_perms, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from well_duplicates_ray.functions.text import (
            segment_unique,
            winnow_fingerprints_pos,
        )

        cfg = self.cfg
        vals, offs = shingle_hashes(batch["caption"], cfg.shingle_k)
        if cfg.minhash_mode == "oph":
            sig = oph_minhash_signatures(
                vals, offs, cfg.minhash_perms, cfg.seed, mix64
            )
        else:
            sig = minhash_signatures(vals, offs, self.a, self.b)
        sim = simhash_from_shingles(vals, offs)
        n_shingles = np.diff(offs).astype(np.int32)
        minhash_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.reshape(-1).view(np.int64)), cfg.minhash_perms
        )

        def lst(values: np.ndarray, offsets: np.ndarray) -> pa.ListArray:
            return pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32)),
                pa.array(values.view(np.int64)),
            )

        # per-document predicate structures, computed HERE in the
        # distributed feature pass so the verify stage's broadcast setup
        # is pure zero-copy assembly (stages/verify.py build_doc_sets):
        # sorted-unique shingle sets (exact Jaccard) and winnow
        # fingerprint OCCURRENCES — (value, byte position), sorted by
        # value — which the verifier turns into exact substring decisions
        # with neighborhood byte probes (text.py substring_probe_hits);
        # the r2 per-doc L-gram sets are gone, they cost O(len) extra
        # hashing here and O(set size) intersection work per pair there.
        sset = segment_unique(vals, offs)
        wv, wp, wo = winnow_fingerprints_pos(
            batch["caption"], cfg.winnow_gram, cfg.winnow_window
        )
        return batch.append_column(
            "minhash", minhash_col
        ).append_column(
            "simhash", pa.array(sim.view(np.int64))
        ).append_column(
            "n_shingles", pa.array(n_shingles)
        ).append_column(
            "set_shingle", lst(*sset)
        ).append_column(
            "set_winnow", lst(wv, wo)
        ).append_column("set_winnow_pos", lst(wp, wo))
