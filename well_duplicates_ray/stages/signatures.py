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
from well_duplicates_ray.functions.text import (
    minhash_params,
    minhash_signatures,
    shingle_hashes,
    simhash_from_shingles,
)


class FeatureExtractor:
    """Fused actor: validate -> decode/pHash-verify -> MinHash/SimHash in
    one ``map_batches`` pool. One actor pool instead of three stages saves
    two pool spin-ups and two inter-stage object-store hops; the stages
    stay individually testable as their own classes."""

    def __init__(self, cfg: dict | None = None):
        from well_duplicates_ray.stages.decode import DecodePHash, validate_images

        self._validate = validate_images
        self._decode = DecodePHash(cfg)
        self._sign = MinHashSignatures(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._sign(self._decode(self._validate(batch)))


class MinHashSignatures:
    """map_batches actor: adds minhash (fixed list<uint64>), simhash (int64)
    and n_shingles columns to the narrow feature table."""

    def __init__(self, cfg: dict | None = None):
        self.cfg = DedupConfig.from_dict(cfg) if cfg else DedupConfig()
        self.a, self.b = minhash_params(self.cfg.minhash_perms, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        vals, offs = shingle_hashes(batch["caption"], cfg.shingle_k)
        sig = minhash_signatures(vals, offs, self.a, self.b)
        sim = simhash_from_shingles(vals, offs)
        n_shingles = np.diff(offs).astype(np.int32)
        minhash_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.reshape(-1).view(np.int64)), cfg.minhash_perms
        )
        return batch.append_column(
            "minhash", minhash_col
        ).append_column(
            "simhash", pa.array(sim.view(np.int64))
        ).append_column("n_shingles", pa.array(n_shingles))
