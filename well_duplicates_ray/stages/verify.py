"""Pairwise verification (SURVEY.md §2 G12-G14).

The reference decides duplicates with a cheap near-identity compare over
a fixed window (``count_well_duplicates.py`` ``is_dup(a, b, max_dist)``
— SURVEY.md §2 R9). The graft's verifier applies the DedupConfig
predicates to every candidate pair, cheapest first:

  exact          identical content sha (payload bytes)
  exact_caption  identical caption string
  phash          pHash Hamming distance <= phash_radius  (ring = distance,
                 the reference's per-level attribution R10)
  jaccard        exact byte-shingle Jaccard >= threshold (not the MinHash
                 estimate — determinism + oracle parity)
  substring      suffix-array longest-common-substring >= substring_min_len

Feature attachment (G14) has two strategies:
- broadcast: the narrow feature table is ``ray.put`` once and read by
  every verifier actor in ``__init__`` (small-side join — no shuffle);
- shuffle: two hash-partitioned joins on image_id for feature tables too
  big to broadcast. ``bytes`` is never attached — only narrow features
  move (SURVEY.md §4.3/§4.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.functions.phash import hamming64
from well_duplicates_ray.functions.suffix import longest_common_substring_len
from well_duplicates_ray.functions.text import (
    exact_jaccard,
    shingle_hashes,
    winnow_fingerprints,
)

FEATURE_COLS = ["image_id", "caption", "phash", "content_sha"]


def verify_enriched_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Verify a batch of pairs that already carries both sides' features
    (columns a, b, caption_a, caption_b, phash_a, phash_b, sha_a, sha_b)."""
    n = batch.num_rows
    cap_a = batch["caption_a"].to_pylist()
    cap_b = batch["caption_b"].to_pylist()
    sha_a = batch["sha_a"].to_pylist()
    sha_b = batch["sha_b"].to_pylist()

    if "phash_a" in batch.column_names:
        ph_a = batch["phash_a"].to_numpy().astype(np.int64).view(np.uint64)
        ph_b = batch["phash_b"].to_numpy().astype(np.int64).view(np.uint64)
        ring = np.minimum(hamming64(ph_a, ph_b), 127).astype(np.int8)
    else:  # text-only pipeline: no image locality predicate
        ring = np.full(n, -1, dtype=np.int8)
    kind = np.full(n, "", dtype=object)
    jac = np.full(n, -1.0)

    sha_eq = np.fromiter((x == y for x, y in zip(sha_a, sha_b)), bool, n)
    cap_eq = np.fromiter((x == y for x, y in zip(cap_a, cap_b)), bool, n)
    ph_near = (ring >= 0) & (ring <= cfg.phash_radius)

    kind[ph_near] = "phash"
    kind[cap_eq] = "exact_caption"
    kind[sha_eq] = "exact"

    undecided = np.flatnonzero(kind == "")
    if undecided.size:
        # Batched precompute per UNIQUE caption (one vectorized
        # shingle/winnow pass for the whole batch), then C-speed python
        # set ops per pair — the per-pair numpy-call version cost ~400 us
        # per pair; this is ~5 us.
        caps = list({cap_a[i] for i in undecided} | {cap_b[i] for i in undecided})
        cap_idx = {c: k for k, c in enumerate(caps)}
        sv, so = shingle_hashes(caps, cfg.shingle_k)
        shingle_sets = [
            frozenset(sv[so[k] : so[k + 1]].tolist()) for k in range(len(caps))
        ]
        fv, fo = winnow_fingerprints(caps, cfg.winnow_gram, cfg.winnow_window)
        fp_sets = [
            frozenset(fv[fo[k] : fo[k + 1]].tolist()) for k in range(len(caps))
        ]

        L = cfg.substring_min_len
        thr = cfg.jaccard_threshold
        for i in undecided:
            ka, kb = cap_idx[cap_a[i]], cap_idx[cap_b[i]]
            sa, sb = shingle_sets[ka], shingle_sets[kb]
            if sa and sb:
                # length-ratio upper bound on Jaccard prunes most pairs
                # before the exact set intersection
                la, lb = len(sa), len(sb)
                if min(la, lb) / max(la, lb) >= thr:
                    inter = len(sa & sb)
                    j = inter / (la + lb - inter)
                    jac[i] = j
                    if j >= thr:
                        kind[i] = "jaccard"
                        continue
            # winnowing guarantee: LCS >= L implies a shared selected
            # fingerprint — the O(n log n) suffix-array LCS only runs on
            # pairs that pass this O(1)-ish disjointness screen
            fa, fb = fp_sets[ka], fp_sets[kb]
            if (
                fa
                and fb
                and not fa.isdisjoint(fb)
                and longest_common_substring_len(
                    cap_a[i].encode(), cap_b[i].encode()
                )
                >= L
            ):
                kind[i] = "substring"

    return pa.table(
        {
            "a": batch["a"],
            "b": batch["b"],
            "is_dup": pa.array(kind != ""),
            "kind": pa.array(kind, pa.string()),
            "ring": pa.array(ring),
            "jaccard": pa.array(jac),
        }
    )


class BroadcastVerifier:
    """Actor-pool verifier: features are fetched once per actor from the
    object store (``ray.put`` broadcast — SURVEY.md G14 small-side path)."""

    def __init__(self, cfg: dict, feats_ref):
        self.cfg = DedupConfig.from_dict(cfg)
        feats: pa.Table = ray.get(feats_ref)
        ids = feats["image_id"].to_pylist()
        self.index = {x: i for i, x in enumerate(ids)}
        self.captions = feats["caption"].to_pylist()
        self.phash = (
            feats["phash"].to_numpy().astype(np.int64)
            if "phash" in feats.column_names
            else None
        )
        self.sha = feats["content_sha"].to_pylist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ia = [self.index[x] for x in batch["a"].to_pylist()]
        ib = [self.index[x] for x in batch["b"].to_pylist()]
        cols = {
            "a": batch["a"],
            "b": batch["b"],
            "caption_a": pa.array([self.captions[i] for i in ia], pa.string()),
            "caption_b": pa.array([self.captions[i] for i in ib], pa.string()),
            "sha_a": pa.array([self.sha[i] for i in ia], pa.string()),
            "sha_b": pa.array([self.sha[i] for i in ib], pa.string()),
        }
        if self.phash is not None:
            cols["phash_a"] = pa.array(self.phash[ia])
            cols["phash_b"] = pa.array(self.phash[ib])
        return verify_enriched_batch(pa.table(cols), self.cfg)


def attach_features_shuffle(
    pairs: ray.data.Dataset,
    feats: ray.data.Dataset,
    num_partitions: int,
) -> ray.data.Dataset:
    """Hash-partitioned feature attachment for feature tables too large to
    broadcast: two joins on image_id (SURVEY.md G14 large-side path)."""
    present = set(feats.schema().names)
    ren_a = {"image_id": "a", "caption": "caption_a", "content_sha": "sha_a"}
    ren_b = {"image_id": "b", "caption": "caption_b", "content_sha": "sha_b"}
    if "phash" in present:
        ren_a["phash"] = "phash_a"
        ren_b["phash"] = "phash_b"
    out = pairs.join(feats.rename_columns(ren_a), "inner", num_partitions, on=("a",))
    return out.join(feats.rename_columns(ren_b), "inner", num_partitions, on=("b",))


def verify_pairs(
    pairs: ray.data.Dataset,
    feats: ray.data.Dataset,
    cfg: DedupConfig,
    n_feature_rows: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Dispatch to broadcast or shuffle feature attachment, then verify."""
    cols = [c for c in FEATURE_COLS if c in feats.schema().names]
    narrow = feats.select_columns(cols)
    if n_feature_rows <= cfg.broadcast_threshold:
        feats_ref = ray.put(_collect(narrow))
        # autoscaling pool (min 1): a fixed-size pool could reserve every
        # CPU and starve the upstream join/aggregate operators (deadlock on
        # small clusters — see ray_guide "actor-pool sizing")
        return pairs.map_batches(
            BroadcastVerifier,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=(1, cfg.decode_concurrency),
            fn_constructor_args=(cfg.to_dict(), feats_ref),
        )
    enriched = attach_features_shuffle(pairs, narrow, num_partitions)
    return enriched.map_batches(
        lambda t: verify_enriched_batch(t, cfg), batch_format="pyarrow"
    )


def _collect(ds: ray.data.Dataset) -> pa.Table:
    return pa.concat_tables(
        [ray.get(ref) for ref in ds.to_arrow_refs()]
    )
