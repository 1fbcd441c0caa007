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
  substring      common substring >= substring_min_len, decided exactly as
                 L-gram set intersection (equivalent to LCS >= L)

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
from well_duplicates_ray.functions.text import (
    pairwise_intersection_counts,
    segment_unique,
    shingle_hashes,
)

FEATURE_COLS = ["node", "caption", "phash", "content_sha"]


def verify_enriched_batch(
    batch: pa.Table, cfg: DedupConfig
) -> pa.Table:
    """Verify a batch of pairs that already carries both sides' features
    (columns a, b, caption_a, caption_b, phash_a, phash_b, sha_a, sha_b).
    All predicates are vectorized; only the final suffix-array LCS
    confirmation loops (over fingerprint-screened pairs only)."""
    import pyarrow.compute as pc

    n = batch.num_rows
    if "phash_a" in batch.column_names:
        ph_a = batch["phash_a"].to_numpy().astype(np.int64).view(np.uint64)
        ph_b = batch["phash_b"].to_numpy().astype(np.int64).view(np.uint64)
        ring = np.minimum(hamming64(ph_a, ph_b), 127).astype(np.int8)
    else:  # text-only pipeline: no image locality predicate
        ring = np.full(n, -1, dtype=np.int8)
    kind = np.full(n, "", dtype=object)
    jac = np.full(n, -1.0)

    # equality predicates stay in Arrow C kernels — no python string churn.
    # fill_null(False): input_hint's caption (and sha) are nullable, and a
    # null equality result would make to_numpy return an object array that
    # breaks boolean masking (null == anything is NOT a dup).
    sha_eq = pc.fill_null(
        pc.equal(batch["sha_a"], batch["sha_b"]), False
    ).to_numpy(zero_copy_only=False).astype(bool)
    cap_eq = pc.fill_null(
        pc.equal(batch["caption_a"], batch["caption_b"]), False
    ).to_numpy(zero_copy_only=False).astype(bool)
    ph_near = (ring >= 0) & (ring <= cfg.phash_radius)

    kind[ph_near] = "phash"
    kind[cap_eq] = "exact_caption"
    kind[sha_eq] = "exact"

    undecided = np.flatnonzero(kind == "")
    if undecided.size:
        # Fully vectorized undecided path: per-pair exact Jaccard and
        # fingerprint screen via segment sort/merge counting — no python
        # sets, no per-caption cache (per-batch set construction cost
        # ~300 core-seconds at n=60k before this).
        und = pa.array(undecided)
        arr_a = batch["caption_a"].take(und)
        arr_b = batch["caption_b"].take(und)

        # exact Jaccard over unique byte shingles, all pairs at once
        sav, sao = segment_unique(*shingle_hashes(arr_a, cfg.shingle_k))
        sbv, sbo = segment_unique(*shingle_hashes(arr_b, cfg.shingle_k))
        na = np.diff(sao)
        nb = np.diff(sbo)
        inter = pairwise_intersection_counts(sav, sao, sbv, sbo)
        union = na + nb - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        jac[undecided] = np.where((na > 0) & (nb > 0), j, -1.0)
        jac_dup = (na > 0) & (nb > 0) & (j >= cfg.jaccard_threshold)
        kind[undecided[jac_dup]] = "jaccard"

        # exact substring predicate, fully vectorized: LCS(a, b) >= L iff
        # a and b share an L-byte gram (any common substring of length
        # >= L contains one; an L-gram IS one), so the predicate is an
        # L-gram rolling-hash set intersection — the same segment
        # machinery as the Jaccard pass, and byte-for-byte the
        # brute-force oracle's own definition (tests/oracle.py builds
        # length-L substring sets and tests disjointness). This replaced
        # a per-pair python suffix-array LCS loop that dominated the
        # verify stage (~3 s/batch at sf0.1, round-2 stage probe); the
        # suffix-array kernel remains in functions/suffix.py as the
        # standalone G12 op.
        rest = np.flatnonzero(~jac_dup)
        if rest.size:
            L = cfg.substring_min_len
            gav, gao = segment_unique(
                *shingle_hashes(arr_a.take(pa.array(rest)), L)
            )
            gbv, gbo = segment_unique(
                *shingle_hashes(arr_b.take(pa.array(rest)), L)
            )
            hit = pairwise_intersection_counts(gav, gao, gbv, gbo) > 0
            kind[undecided[rest[hit]]] = "substring"

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
        # zero-copy from plasma: all actors on a node SHARE this table's
        # buffers; init builds no python-side structures (a 60k-entry dict
        # per actor was the old verify bottleneck)
        feats: pa.Table = ray.get(feats_ref)
        self.feats = feats  # zero-copy; driver combined chunks already
        self.ids = feats["node"].combine_chunks()
        self.has_phash = "phash" in feats.column_names

    def _take(self, col: str, pos) -> pa.Array:
        out = self.feats[col].take(pos)
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorized hash lookup in Arrow C++ (no python dict)
        pos_a = pc.index_in(batch["a"], value_set=self.ids)
        pos_b = pc.index_in(batch["b"], value_set=self.ids)
        cols = {
            "a": batch["a"],
            "b": batch["b"],
            "caption_a": self._take("caption", pos_a),
            "caption_b": self._take("caption", pos_b),
            "sha_a": self._take("content_sha", pos_a),
            "sha_b": self._take("content_sha", pos_b),
        }
        if self.has_phash:
            cols["phash_a"] = self._take("phash", pos_a)
            cols["phash_b"] = self._take("phash", pos_b)
        return verify_enriched_batch(pa.table(cols), self.cfg)


def attach_features_shuffle(
    pairs: ray.data.Dataset,
    feats: ray.data.Dataset,
    num_partitions: int,
) -> ray.data.Dataset:
    """Hash-partitioned feature attachment for feature tables too large to
    broadcast: two joins on image_id (SURVEY.md G14 large-side path)."""
    present = set(feats.schema().names)
    ren_a = {"node": "a", "caption": "caption_a", "content_sha": "sha_a"}
    ren_b = {"node": "b", "caption": "caption_b", "content_sha": "sha_b"}
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
    present = set(feats.schema().names)
    cols = [c for c in FEATURE_COLS if c in present]
    if n_feature_rows <= cfg.broadcast_threshold:
        feats_ref = ray.put(_collect(feats.select_columns(cols)).combine_chunks())
        # FIXED-size actor pool: each actor resolves the broadcast once in
        # __init__ (zero-copy plasma). A task-based variant ray.get()s
        # inside tasks, which the raylet treats as blocked workers and
        # answers with a worker-spawn storm; an AUTOSCALING pool ramps up
        # too slowly and serializes the stage. Safe because the pair set
        # is always materialized before this stage (dedupe_pairs).
        # Pool size tracks the cluster: a fixed 8 capped this stage at
        # 8-way parallelism on a 32-CPU node (round-2 stage probe).
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        pool = max(2, min(cfg.decode_concurrency, ncpu))
        return pairs.map_batches(
            BroadcastVerifier,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=pool,
            fn_constructor_args=(cfg.to_dict(), feats_ref),
        )
    enriched = attach_features_shuffle(pairs, feats.select_columns(cols),
                                       num_partitions)
    return enriched.map_batches(
        lambda t: verify_enriched_batch(t, cfg), batch_format="pyarrow"
    )


def _collect(ds: ray.data.Dataset) -> pa.Table:
    return pa.concat_tables(
        [ray.get(ref) for ref in ds.to_arrow_refs()]
    )
