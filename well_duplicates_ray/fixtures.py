"""Deterministic synthetic image+caption fixture generator (FIXTURES.md F1).

Plays the role of the reference's miniature Illumina run-folder fixture
(tiny BCL/locs/filter files with hand-verified duplicate counts —
SURVEY.md §5): a small, exactly-known input whose duplicate structure is
derivable by an independent brute-force oracle.

Schema (BASELINE.json input_hint):
    image_id:string  bytes:binary  w:int32  h:int32  fmt:string
    caption:string   phash:int64

Injection plan per generated row (seeded):
    unique 0.70 | exact 0.06 | near_pixel 0.08 | caption_para 0.08 |
    substring 0.05 | hot_bucket 0.03
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from well_duplicates_ray.config import DedupConfig, DEFAULT_CONFIG
from well_duplicates_ray.functions.phash import (
    hamming64,
    phash_rgb_stack,
)
from well_duplicates_ray.functions.text import exact_jaccard, shingle_hashes

IMG_W = 32
IMG_H = 32

# Bumped whenever generated fixture CONTENT changes: cached fixture paths
# embed it, so a /tmp cache left by an earlier code round can never be
# silently reused against newer generator semantics.
FIXTURE_VERSION = 1

CLASSES = ["unique", "exact", "near_pixel", "caption_para", "substring", "hot_bucket"]
CLASS_P = [0.70, 0.06, 0.08, 0.08, 0.05, 0.03]

HOT_CAPTIONS = ["", "photo", "sun sun sun sun sun sun sun sun"]

_VOCAB_SIZE = 500


def _vocab(rng: np.random.Generator) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    seen = set()
    while len(out) < _VOCAB_SIZE:
        w = "".join(rng.choice(letters, size=rng.integers(3, 10)))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def _caption(rng: np.random.Generator, vocab: list[str]) -> str:
    # uniform word choice: zipfian draws create accidental >=24-char shared
    # runs of top words across unrelated captions (mega-clusters via the
    # substring predicate); key-skew is exercised by the hot_bucket class
    n_words = int(rng.integers(6, 31))
    ranks = rng.integers(0, _VOCAB_SIZE, size=n_words)
    return " ".join(vocab[int(r)] for r in ranks)


def _images_batch(rng: np.random.Generator, n: int, size: int) -> np.ndarray:
    """Low-frequency random fields: 8x8 coarse grid -> nearest upsample to
    (size, size). Distinct rows get near-independent pHashes (smooth,
    high-contrast)."""
    if size % 8 != 0:
        raise ValueError("size must be a multiple of 8")
    f = size // 8
    coarse = rng.integers(0, 256, size=(n, 8, 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(coarse, f, axis=1), f, axis=2)


def _phash_stack(imgs: np.ndarray) -> np.ndarray:
    # same kernel the engine's decode stage runs (phash.py) — the stored
    # phash column, the recompute, and the oracle must agree bit-for-bit
    return phash_rgb_stack(imgs)


def make_images(
    n: int,
    seed: int = 42,
    cfg: DedupConfig = DEFAULT_CONFIG,
    size: int = IMG_W,
) -> tuple[pa.Table, pa.Table]:
    """Generate the fixture table + injected-truth pair table.

    Returns (images, pairs_truth) where pairs_truth has columns
    (a:string, b:string, cls:string), a < b. The truth table records the
    *injected* relationships for sanity checks; the authoritative golden
    clusters come from the O(n^2) oracle (tests/oracle.py) run at the same
    DedupConfig.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    imgs = _images_batch(rng, n, size)  # mutated in place for derived classes
    captions: list[str] = ["" for _ in range(n)]
    classes = rng.choice(len(CLASSES), size=n, p=CLASS_P)
    classes[0] = 0  # first row has no earlier base to derive from
    base_of = np.full(n, -1, dtype=np.int64)

    base_rows: list[int] = []
    truth: list[tuple[int, int, str]] = []

    for i in range(n):
        cls = CLASSES[classes[i]]
        if cls != "unique" and cls != "hot_bucket" and not base_rows:
            cls = "unique"
        if cls == "unique":
            captions[i] = _caption(rng, vocab)
            base_rows.append(i)
        elif cls == "hot_bucket":
            captions[i] = HOT_CAPTIONS[int(rng.integers(0, len(HOT_CAPTIONS)))]
        else:
            j = int(base_rows[int(rng.integers(0, len(base_rows)))])
            base_of[i] = j
            if cls == "exact":
                imgs[i] = imgs[j]
                captions[i] = captions[j]
            elif cls == "near_pixel":
                imgs[i] = imgs[j]  # noise added vectorized below
                captions[i] = captions[j]
            elif cls == "caption_para":
                imgs[i] = imgs[j]
                captions[i] = _paraphrase(rng, vocab, captions[j], cfg)
            elif cls == "substring":
                captions[i] = _with_shared_run(rng, vocab, captions[j], cfg)
            truth.append((j, i, cls))

    # vectorized pixel noise for the near_pixel class, with a pHash-radius
    # guarantee: retry with weaker noise until Hamming(base, noisy) <= radius
    near = np.flatnonzero((classes == CLASSES.index("near_pixel")) & (base_of >= 0))
    if near.size:
        frac, amp = 0.05, 4
        pending = near
        for _ in range(4):
            if pending.size == 0:
                break
            for i in pending:
                img = imgs[base_of[i]].copy()
                mask = rng.random(img.shape[:2]) < frac
                noise = rng.integers(-amp, amp + 1, size=img.shape)
                px = img.astype(np.int32) + noise * mask[..., None]
                imgs[i] = np.clip(px, 0, 255).astype(np.uint8)
            ph_new = _phash_stack(imgs[pending])
            ph_base = _phash_stack(imgs[base_of[pending]])
            ok = hamming64(ph_new, ph_base) <= cfg.phash_radius
            pending = pending[~ok]
            frac /= 2
            amp = max(1, amp // 2)
        for i in pending:  # last resort: exact pixels (still a valid near-dup)
            imgs[i] = imgs[base_of[i]]

    # hot-bucket truth: star to the first row holding the same degenerate caption
    first_hot: dict[str, int] = {}
    for i in np.flatnonzero(classes == CLASSES.index("hot_bucket")):
        c = captions[int(i)]
        if c in first_hot:
            truth.append((first_hot[c], int(i), "hot_bucket"))
        else:
            first_hot[c] = int(i)

    phashes = _phash_stack(imgs).view(np.int64)
    ids = [f"img{i:08d}" for i in range(n)]
    images = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array([imgs[i].tobytes() for i in range(n)], pa.binary()),
            "w": pa.array(np.full(n, size, np.int32)),
            "h": pa.array(np.full(n, size, np.int32)),
            "fmt": pa.array(["raw"] * n, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes),
        }
    )
    pairs_truth = pa.table(
        {
            "a": pa.array([ids[min(x, y)] for x, y, _ in truth], pa.string()),
            "b": pa.array([ids[max(x, y)] for x, y, _ in truth], pa.string()),
            "cls": pa.array([c for _, _, c in truth], pa.string()),
        }
    )
    return images, pairs_truth


def _jaccard_strs(a: str, b: str, k: int) -> float:
    va, oa = shingle_hashes([a], k)
    vb, ob = shingle_hashes([b], k)
    return exact_jaccard(va, vb)


def _paraphrase(rng, vocab, caption: str, cfg: DedupConfig) -> str:
    """Word-level edits keeping byte-shingle Jaccard >= threshold (verified)."""
    words = caption.split(" ")
    for n_edit in (2, 1):
        for _ in range(8):
            ws = list(words)
            for _ in range(min(n_edit, max(1, len(ws) // 4))):
                pos = int(rng.integers(0, len(ws)))
                ws[pos] = vocab[int(rng.integers(0, len(vocab)))]
            cand = " ".join(ws)
            if _jaccard_strs(cand, caption, cfg.shingle_k) >= cfg.jaccard_threshold:
                return cand
    return caption  # identical (degenerates to exact-caption dup)


def _with_shared_run(rng, vocab, caption: str, cfg: DedupConfig) -> str:
    """Fresh caption embedding a >= substring_min_len+8 char run of `caption`."""
    L = cfg.substring_min_len + 8
    if len(caption) < L:
        run = caption
    else:
        start = int(rng.integers(0, len(caption) - L + 1))
        run = caption[start : start + L]
    pre = " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(3))
    post = " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(3))
    return f"{pre} {run} {post}"


def write_images_parquet(path: str, n: int, seed: int = 42,
                         cfg: DedupConfig = DEFAULT_CONFIG,
                         size: int = IMG_W,
                         row_group_size: int | None = None,
                         num_files: int = 1) -> pa.Table:
    """Write the fixture table (and its truth pairs alongside) to parquet.

    ``num_files > 1`` writes a DIRECTORY of part files: files are the
    read-parallelism atom for ``ray.data.read_parquet`` (one read task
    per file — a single 60k-row file serialized the whole read into one
    8-second task), and a partitioned layout is the realistic shape for
    any at-scale input anyway.

    Both artifacts (data + truth) appear ATOMICALLY: everything is
    written to per-pid staging paths and renamed into place, so a
    concurrent process caching the same fixture (the driver's checks run
    multi-process) never reads a half-written file (cachefs protocol)."""
    import os
    import pyarrow.parquet as pq

    from well_duplicates_ray.cachefs import commit_staging, staging_path

    images, truth = make_images(n, seed=seed, cfg=cfg, size=size)
    os.makedirs(os.path.dirname(path.rstrip("/")) or ".", exist_ok=True)
    if num_files > 1:
        truth_path = path.rstrip("/") + "_truth.parquet"
        stage = staging_path(path)
        os.makedirs(stage, exist_ok=True)
        per = -(-n // num_files)
        for i, s in enumerate(range(0, n, per)):
            pq.write_table(
                images.slice(s, per),
                os.path.join(stage, f"part-{i:05d}.parquet"),
                row_group_size=row_group_size,
            )
        commit_staging(stage, path)
    else:
        truth_path = path.replace(".parquet", "") + "_truth.parquet"
        stage = staging_path(path)
        pq.write_table(images, stage, row_group_size=row_group_size)
        commit_staging(stage, path)
    tstage = staging_path(truth_path)
    pq.write_table(truth, tstage)
    commit_staging(tstage, truth_path)
    return images
