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
        import hashlib

        import pyarrow.compute as pc

        from well_duplicates_ray.functions.phash import phash_raw_flat

        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        stored = batch["phash"].to_numpy().astype(np.int64)

        # the payload column as (flat data buffer, offsets) — ZERO copies
        # of the encoded bytes; every downstream kernel works off views.
        from well_duplicates_ray.functions.arrowbuf import binary_column_view

        flat, starts, ends, valid = binary_column_view(batch["bytes"])

        # vectorized decodability screen: fmt=='raw', payload present, and
        # byte length matching w*h*3 (no per-row python)
        expected = ws.astype(np.int64) * hs.astype(np.int64) * 3
        fmt_raw = pc.coalesce(
            pc.equal(batch["fmt"], "raw"), pa.scalar(False)
        ).to_numpy(zero_copy_only=False).astype(bool)
        decode_ok = valid & fmt_raw & ((ends - starts) == expected)

        phash_out = stored.copy()
        raw_idx = np.flatnonzero(decode_ok)
        if raw_idx.size:
            for (w, h) in {(int(ws[i]), int(hs[i])) for i in raw_idx}:
                grp = raw_idx[(ws[raw_idx] == w) & (hs[raw_idx] == h)]
                phash_out[grp] = phash_raw_flat(
                    flat, starts[grp], w, h
                ).view(np.int64)
        phash_match = phash_out == stored

        # null payloads get a UNIQUE per-row sentinel sha: a shared ''
        # would co-bucket unrelated corrupt rows and verify them as
        # kind='exact' duplicates of each other. Valid rows hash straight
        # off the flat-buffer views (C-speed, no bytes materialization).
        # sha1 stays CRYPTOGRAPHIC deliberately (VERDICT r3 #4 considered
        # a 64-bit fingerprint): content_sha EQUALITY is the verify
        # stage's 'exact' predicate and bytes never attach to pairs, so a
        # 64-bit key would emit false 'exact' edges at birthday rate
        # (~10^4 wrong pairs at 10^12 rows). The loop's cost is the
        # hashing of the payload bytes themselves, not the interpreter.
        ids = batch["image_id"].to_pylist()
        sha1 = hashlib.sha1
        sha = [
            sha1(flat[starts[i] : ends[i]]).hexdigest()
            if valid[i]
            else f"invalid:{ids[i]}"
            for i in range(len(ids))
        ]
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
