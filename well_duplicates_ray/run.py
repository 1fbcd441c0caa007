"""Job entry point (SURVEY.md §2 R12 analogue — the reference's
``count_well_duplicates.py`` CLI).

Run locally or on a cluster:

    python -m well_duplicates_ray.run --input /path/images.parquet \
        --output /tmp/out [--checkpoint] [--num-cpus 32]
    ray job submit --working-dir . -- \
        python -m well_duplicates_ray.run --input ... --output ...

Flags mirror the reference's knobs (window/threshold/levels —
SURVEY.md §2 R12) via the DedupConfig fields. The script owns its Ray
session only when one is not already provided by the submitter.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="well_duplicates_ray")
    p.add_argument("--input", required=True, help="parquet/lance image+caption table")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--checkpoint", action="store_true",
                   help="manifest-gated resumable run (pipelines/checkpoint.py)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init(num_cpus=...) when starting a local session")
    p.add_argument("--num-partitions", type=int, default=None)
    # the reference's analysis knobs (SURVEY.md §2 R12)
    p.add_argument("--shingle-k", type=int, default=None)
    p.add_argument("--jaccard-threshold", type=float, default=None)
    p.add_argument("--phash-radius", type=int, default=None)
    p.add_argument("--substring-min-len", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from well_duplicates_ray.config import DedupConfig

    overrides = {
        k.replace("-", "_"): v
        for k, v in vars(args).items()
        if k in {"shingle_k", "jaccard_threshold", "phash_radius",
                 "substring_min_len", "seed"} and v is not None
    }
    cfg = DedupConfig(**{**DedupConfig().to_dict(), **overrides})

    t0 = time.time()
    if args.checkpoint:
        from well_duplicates_ray.pipelines.checkpoint import run_checkpointed

        out = run_checkpointed(args.input, args.output, cfg,
                               num_partitions=args.num_partitions)
        summary = {"mode": "checkpoint", "clusters_path": out["clusters_path"],
                   **out["metrics"]}
    else:
        from well_duplicates_ray.io import read_table, write_table
        from well_duplicates_ray.pipelines.neardup import run_neardup

        res = run_neardup(read_table(args.input), cfg,
                          num_partitions=args.num_partitions)
        write_table(res["clusters"], f"{args.output}/clusters")
        if res["edges"] is not None:  # empty input yields no edge table
            write_table(res["edges"], f"{args.output}/edges")
        summary = {"mode": "streaming",
                   "clusters_path": f"{args.output}/clusters",
                   **res["metrics"]}
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))

    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
