"""Brute-force O(n^2) duplicate oracle (SURVEY.md §5.2).

Recomputes golden duplicate pairs + clusters from the fixture table using
the *same* DedupConfig as the engine, with exact (non-sketch) predicates.
This plays the role of the reference's hand-verified per-level duplicate
counts on its miniature run-folder fixture.

dup(a, b) holds iff ANY of:
  - identical payload bytes
  - identical caption (exact_caption_dup)
  - pHash Hamming distance <= phash_radius
  - byte-shingle Jaccard >= jaccard_threshold (both rows have shingles)
  - common substring of length >= substring_min_len

Golden clusters = connected components of the dup relation; component id
= min(image_id) in the component.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.functions.phash import popcount64
from well_duplicates_ray.functions.text import shingle_hashes


class DSU:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def oracle_dup_pairs(images: pa.Table, cfg: DedupConfig) -> set[tuple[str, str]]:
    ids = images["image_id"].to_pylist()
    captions = images["caption"].to_pylist()
    payloads = images["bytes"].to_pylist()
    phash = np.asarray(images["phash"].to_numpy(zero_copy_only=False)).view(np.uint64)
    n = len(ids)

    vals, offs = shingle_hashes(captions, cfg.shingle_k)
    shingles = [frozenset(vals[offs[i] : offs[i + 1]].tolist()) for i in range(n)]
    L = cfg.substring_min_len
    grams = [
        frozenset(c[i : i + L] for i in range(len(c) - L + 1)) if len(c) >= L else frozenset()
        for c in captions
    ]
    sha = [hashlib.sha1(p).hexdigest() for p in payloads]

    pairs: set[tuple[str, str]] = set()
    thr = cfg.jaccard_threshold
    for i in range(n):
        # vectorized Hamming row
        ham = popcount64(np.bitwise_xor(phash[i + 1 :], phash[i]))
        near = ham <= cfg.phash_radius
        si, gi, ci = shingles[i], grams[i], captions[i]
        for jj in range(i + 1, n):
            dup = bool(near[jj - i - 1])
            if not dup and sha[i] == sha[jj]:
                dup = True
            if not dup and cfg.exact_caption_dup and ci == captions[jj]:
                dup = True
            if not dup and si and shingles[jj]:
                a, b = len(si), len(shingles[jj])
                if min(a, b) / max(a, b) >= thr:  # upper bound on Jaccard
                    inter = len(si & shingles[jj])
                    if inter / (a + b - inter) >= thr:
                        dup = True
            if not dup and gi and not gi.isdisjoint(grams[jj]):
                dup = True  # shared literal L-gram <=> common substring >= L
            if dup:
                pairs.add((ids[i], ids[jj]))
    return pairs


def oracle_clusters(images: pa.Table, cfg: DedupConfig) -> dict[str, str]:
    """image_id -> component (min image_id of the connected component)."""
    ids = images["image_id"].to_pylist()
    index = {x: i for i, x in enumerate(ids)}
    dsu = DSU(len(ids))
    for a, b in oracle_dup_pairs(images, cfg):
        dsu.union(index[a], index[b])
    return {x: ids[dsu.find(i)] for i, x in enumerate(ids)}


def co_clustered_pairs(clusters: dict[str, str]) -> set[tuple[str, str]]:
    """All unordered pairs that share a component (the recall universe)."""
    from collections import defaultdict

    comp: dict[str, list[str]] = defaultdict(list)
    for k, c in clusters.items():
        comp[c].append(k)
    out: set[tuple[str, str]] = set()
    for members in comp.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out
