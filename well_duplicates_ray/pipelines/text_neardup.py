"""Text near-duplicate clustering over a document table (SURVEY.md §2.B,
"Deduplication" extension ops).

Reuses the flagship's signature/candidate/verify/component stages on a
text-only feature table (no pHash locality path): MinHash-LSH on byte
shingles + SimHash prefix bands + winnowed substring anchors + exact
md5-content buckets, verified with exact Jaccard / LCS / equality, then
min-label components. The id column must be int64 (or digit-parseable).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from well_duplicates_ray.config import DedupConfig, DEFAULT_CONFIG
from well_duplicates_ray.stages.candidates import (
    cold_pairs,
    dedupe_pairs,
    emit_bucket_keys,
    find_hot_buckets,
    hot_pairs,
)
from well_duplicates_ray.stages.components import connected_components
from well_duplicates_ray.stages.signatures import make_signature_fn
from well_duplicates_ray.stages.verify import verify_pairs


def build_text_features(
    docs: ray.data.Dataset,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Map a document table to the engine's text feature schema:
    (image_id:str, caption:str, content_sha:str) + signature columns."""

    def adapt(t: pa.Table) -> pa.Table:
        text = t[text_col].cast(pa.string())
        sha = [
            hashlib.md5((x or "").encode("utf-8")).hexdigest()
            for x in text.to_pylist()
        ]
        return pa.table(
            {
                "image_id": pc.cast(t[id_col], pa.string()),
                "node": pc.cast(t[id_col], pa.int64()),
                "caption": text,
                "content_sha": pa.array(sha, pa.string()),
            }
        )

    # batch_size=None: one batch per input BLOCK. A fixed batch_size
    # (the former cfg.batch_size=4096) made Ray COALESCE blocks to fill
    # each batch — at sf0.1 the 16-block document read collapsed into 2
    # signature tasks, serializing a ~2.7 s vectorized kernel onto 2
    # CPUs (the dominant constant of the doc-minhash bench tail, VERDICT
    # r4 next #6). The read's override_num_blocks already sizes blocks
    # to keep every CPU fed; the kernels are vectorized per batch, so
    # block-sized batches are strictly better here (text rows are small
    # — the flagship keeps an explicit batch_size only because decoded
    # IMAGE batches must bound worker heap).
    return docs.map_batches(adapt, batch_format="pyarrow").map_batches(
        make_signature_fn(cfg.to_dict()),
        batch_format="pyarrow",
        batch_size=None,
    )


def run_text_neardup(
    docs: ray.data.Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Near-dup clusters over a document table.

    Returns {'clusters': Dataset(doc_id:int64, component:int64),
    'edges': Dataset, 'metrics': dict}; component = min doc_id.
    """
    feats = build_text_features(docs, cfg, id_col, text_col).materialize()
    n_rows = feats.count()
    if n_rows == 0:
        empty = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
        )
        return {"clusters": empty, "edges": None, "metrics": {"n_rows": 0}}

    from well_duplicates_ray.pipelines.neardup import auto_partitions

    if num_partitions is None:
        num_partitions = auto_partitions(n_rows)
    from well_duplicates_ray.stages.verify import launch_prepare_broadcast

    prepared = (
        launch_prepare_broadcast(feats, cfg)
        if n_rows <= cfg.broadcast_threshold
        else None
    )
    emissions = feats.map_batches(
        lambda t: emit_bucket_keys(t, cfg), batch_format="pyarrow"
    ).materialize()
    n_emissions = emissions.count()
    hot, hot_srcs = find_hot_buckets(emissions, cfg.bucket_pair_cap,
                                     n_emissions=n_emissions,
                                     return_srcs=True)

    from well_duplicates_ray.stages.candidates import (
        driver_count_gate,
        hot_sketch_residual,
        sharded_pairs,
    )

    if n_emissions <= driver_count_gate():
        pairs = sharded_pairs(emissions, hot, cfg)
    else:
        pairs = cold_pairs(emissions, hot, num_partitions, cfg)
        hp = hot_pairs(emissions, hot, cfg)
        if hp is not None:
            pairs = pairs.union(hp)
        pairs = dedupe_pairs(pairs)

    edges = verify_pairs(pairs, feats, cfg, n_rows, num_partitions,
                         prepared=prepared, edges_only=True).materialize()

    edges_int = edges.select_columns(["a", "b"])
    nodes = feats.select_columns(["node"])
    comp = connected_components(
        edges_int, nodes, num_partitions,
        driver_threshold=cfg.broadcast_threshold, n_nodes=n_rows,
    )
    clusters = comp.rename_columns({"node": "doc_id"})
    return {
        "clusters": clusters,
        "edges": edges,
        "metrics": {"n_rows": n_rows, "n_hot_buckets": len(hot),
                    **hot_sketch_residual(hot, hot_srcs, cfg)},
    }
