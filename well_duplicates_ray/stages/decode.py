"""Schema validation + decode/pHash-verify stages (SURVEY.md §2 G2-G4).

The reference's BCL tile reader + base decoder + pass-filter
(``bcl_direct_reader.py`` — SURVEY.md §2 R6-R8) become:

- ``validate_images``: asserts the input_hint schema and casts;
- ``DecodePHash``: an actor-pool ``map_batches`` stage that decodes each
  payload, recomputes the pHash from pixels (verifying the in-table
  value), computes the content digest, and checks the per-row invariant
  (fmt='raw' must decode exactly; lossy formats would be checked at
  PSNR >= 40 dB if a codec existed — none does in this sandbox, so
  non-raw formats are quarantined like the reference's non-PF wells).

The stage's output is the *narrow feature table* — ``bytes`` is dropped
here and never enters any shuffle (SURVEY.md §4.3 "wide rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.functions.phash import (
    content_sha1,
    phash_raw_batch,
)

REQUIRED_SCHEMA = {
    "image_id": pa.string(),
    "bytes": pa.binary(),
    "w": pa.int32(),
    "h": pa.int32(),
    "fmt": pa.string(),
    "caption": pa.string(),
    "phash": pa.int64(),
}


def validate_images(batch: pa.Table) -> pa.Table:
    """Assert required columns exist and cast to the canonical types.

    Raises on missing columns (a schema error is a programming error, not
    a data error); per-row data problems are handled by DecodePHash's
    quarantine flag instead.
    """
    missing = [c for c in REQUIRED_SCHEMA if c not in batch.column_names]
    if missing:
        raise ValueError(f"input table missing required columns: {missing}")
    cols = {c: batch[c].cast(t) for c, t in REQUIRED_SCHEMA.items()}
    return pa.table(cols)


class DecodePHash:
    """Actor-pool stage: decode -> verify pHash -> content digest.

    Stateful per the SURVEY G3 design (codec context lives in __init__,
    once per actor — the analogue of the reference's per-tile open file
    handles in ``BCLReader.get_tile``).
    """

    def __init__(self, cfg: dict | None = None):
        self.cfg = DedupConfig.from_dict(cfg) if cfg else DedupConfig()
        # codec registry seam: fmt -> decoder(buf, w, h) -> (pixels, lossless)
        # only 'raw' exists in-sandbox; image codec libs would register here.
        self.codecs = {"raw": None}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bufs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        stored = batch["phash"].to_numpy().astype(np.int64)

        decode_ok = np.zeros(n, dtype=bool)
        phash_out = stored.copy()
        raw_idx = []
        for i in range(n):
            if fmts[i] == "raw" and bufs[i] is not None and len(bufs[i]) == int(ws[i]) * int(hs[i]) * 3:
                raw_idx.append(i)
        raw_idx = np.array(raw_idx, dtype=np.int64)
        if raw_idx.size:
            ph = phash_raw_batch(
                [bufs[i] for i in raw_idx], ws[raw_idx], hs[raw_idx]
            ).view(np.int64)
            phash_out[raw_idx] = ph
            decode_ok[raw_idx] = True
        phash_match = phash_out == stored

        sha = [content_sha1(b) if b is not None else "" for b in bufs]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "caption": batch["caption"],
                "phash": pa.array(phash_out),
                "decode_ok": pa.array(decode_ok),
                "phash_match": pa.array(phash_match),
                "content_sha": pa.array(sha, pa.string()),
            }
        )
