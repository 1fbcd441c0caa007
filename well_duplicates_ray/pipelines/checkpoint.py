"""Checkpointed/resumable flagship run (SURVEY.md §2 G18, §4.3).

Two phases, manifest-gated:

1. ``signatures`` — the expensive, byte-amplifying phase (decode + pHash
   + MinHash/SimHash). The unit of work is an input *partition* (one
   parquet row-group range); pending partitions are processed as a
   Dataset of partition descriptors through an actor pool (exactly how
   the reference's BCLReader opens one tile at a time —
   ``bcl_direct_reader.py`` get_tile, SURVEY.md §2 R6), each writing its
   feature parquet atomically and a lineage record. On resume, completed
   partitions are skipped at the *read* (anti-filter on partition id).
2. ``edges`` — candidates -> verify over the signature store (the
   expensive half of clustering). The unit of work is a PAIR-HASH SHARD:
   candidate pairs are hashed by mix64(a)^mix64(b) into EDGE_SHARDS
   ranges (the same partitioning stages/candidates.py dedupe_shard_tables
   uses), and each shard dedupes + verifies + writes its edge parquet
   atomically with its own manifest row. A run that dies at 95% of
   verification resumes with only the missing shards recomputed;
   candidate-pair generation (the cheap, shuffle-free half) is re-run on
   resume and is NOT checkpointed — only verification work is protected.
3. ``clusters`` — iterative min-label components over the edge store,
   keyed by the edge-store digest (per-shard rows_out + content md5 —
   a same-count different-content edge store invalidates clusters). The
   cluster table is written in CLUSTER_SHARDS partitions keyed by the
   component id (a component never straddles shards), one manifest row
   each; the components computation itself is global (iterative
   min-label), so cluster resume skips completed WRITES, not the DSU.

No phase funnels its data through the driver: stage outputs are
``Dataset.write_parquet`` directories (one part file per block), renamed
into place atomically (state/manifest.py ``atomic_write_dataset``).

The signature store doubles as the materialization point the streaming
pipeline does in memory — at 10^12 scale this on-disk form is the only
viable one.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from well_duplicates_ray.config import DedupConfig, DEFAULT_CONFIG
from well_duplicates_ray.state import manifest as mf

ROWS_PER_PARTITION = 50_000  # row-group coalescing target per partition


def plan_partitions(input_path: str) -> list[dict]:
    """Deterministic partition descriptors from parquet row-group metadata.

    digest = (file identity + row-group ids + row counts) — any rewrite of
    the input changes the digest and forces recompute of that partition.
    """
    pf = pq.ParquetFile(input_path)
    st = os.stat(input_path)
    groups: list[list[int]] = []
    cur: list[int] = []
    acc = 0
    for rg in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(rg).num_rows
        cur.append(rg)
        acc += n
        if acc >= ROWS_PER_PARTITION:
            groups.append(cur)
            cur, acc = [], 0
    if cur:
        groups.append(cur)
    out = []
    for pid, rgs in enumerate(groups):
        n_rows = sum(pf.metadata.row_group(r).num_rows for r in rgs)
        key = f"{input_path}|{st.st_size}|{rgs}|{n_rows}"
        out.append(
            {
                "partition_id": pid,
                "path": input_path,
                "row_groups": rgs,
                "rows": n_rows,
                "digest": hashlib.md5(key.encode()).hexdigest(),
            }
        )
    return out


class SignaturePartitionWorker:
    """Actor: processes one partition descriptor per batch row — reads its
    row groups, runs the fused feature extractor, writes the partition's
    feature parquet atomically, emits the lineage row."""

    def __init__(self, cfg: dict, out_dir: str, manifest_dir: str):
        from well_duplicates_ray.stages.signatures import FeatureExtractor

        self.fx = FeatureExtractor(cfg)
        self.out_dir = out_dir
        self.manifest_dir = manifest_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for d in batch.to_pylist():
            src = pq.ParquetFile(d["path"]).read_row_groups(d["row_groups"])
            feats = self.fx(src)
            out_path = os.path.join(
                self.out_dir, f"part-{d['partition_id']:05d}.parquet"
            )
            mf.atomic_write_table(feats, out_path)
            mf.write_record(
                self.manifest_dir,
                "signatures",
                d["partition_id"],
                d["digest"],
                rows_in=src.num_rows,
                rows_out=feats.num_rows,
                output_path=out_path,
            )
            rows.append(
                {"partition_id": d["partition_id"], "rows_out": feats.num_rows}
            )
        return pa.Table.from_pylist(rows)


def run_checkpointed(
    input_path: str,
    work_dir: str,
    cfg: DedupConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> dict:
    """Run (or resume) the flagship pipeline with a checkpoint manifest.

    Returns {'clusters_path', 'metrics'} — metrics include how many
    signature partitions were reused vs computed (lineage evidence).
    """
    manifest_dir = os.path.join(work_dir, "manifest")
    sig_dir = os.path.join(work_dir, "signatures")
    edges_path = os.path.join(work_dir, "edges")
    clusters_path = os.path.join(work_dir, "clusters")

    parts = plan_partitions(input_path)
    digests = {p["partition_id"]: p["digest"] for p in parts}
    done = mf.completed_partitions(manifest_dir, "signatures", digests)
    pending = [p for p in parts if p["partition_id"] not in done]

    if pending:
        (
            ray.data.from_items(pending)
            .map_batches(
                SignaturePartitionWorker,
                batch_size=1,
                batch_format="pyarrow",
                concurrency=(1, cfg.decode_concurrency),
                fn_constructor_args=(cfg.to_dict(), sig_dir, manifest_dir),
            )
            .materialize()
        )

    # --- phase 2: verified edges over the signature store ----------------
    sig_rows = mf.read_stage(manifest_dir, "signatures")
    sig_files = [sig_rows[p["partition_id"]]["output_path"] for p in parts]
    store_digest = hashlib.md5(
        "|".join(
            f"{p['digest']}:{sig_rows[p['partition_id']]['rows_out']}"
            for p in parts
        ).encode()
    ).hexdigest()
    feat_rows_total = sum(r["rows_out"] for r in sig_rows.values())

    from well_duplicates_ray.pipelines.neardup import (
        auto_partitions,
        clusters_from_edges,
        verified_edges,
    )

    n_parts = num_partitions or auto_partitions(feat_rows_total)

    reused_edges = bool(
        mf.completed_partitions(manifest_dir, "edges", {0: store_digest})
    )
    if not reused_edges:
        feats = ray.data.read_parquet(sig_files)
        edges, _ = verified_edges(feats, cfg, n_parts,
                                  n_rows=feat_rows_total)
        mf.atomic_write_dataset(edges, edges_path)
        mf.write_record(
            manifest_dir, "edges", 0, store_digest,
            rows_in=feat_rows_total,
            rows_out=edges.count(),
            output_path=edges_path,
        )

    # --- phase 3: components over the edge store -------------------------
    edge_rec = mf.read_stage(manifest_dir, "edges")[0]
    edges_digest = hashlib.md5(
        f"{store_digest}|{edge_rec['rows_out']}".encode()
    ).hexdigest()
    reused_clusters = bool(
        mf.completed_partitions(manifest_dir, "clusters", {0: edges_digest})
    )
    if not reused_clusters:
        nodes = ray.data.read_parquet(sig_files, columns=["node"])
        if edge_rec["rows_out"] > 0:
            edges = ray.data.read_parquet(edges_path, columns=["a", "b"])
        else:  # write_parquet of an empty dataset leaves nothing to read
            edges = ray.data.from_arrow(
                pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
            )
        clusters = clusters_from_edges(edges, nodes, n_parts, cfg)
        mf.atomic_write_dataset(clusters.sort("image_id"), clusters_path)
        mf.write_record(
            manifest_dir, "clusters", 0, edges_digest,
            rows_in=edge_rec["rows_out"],
            rows_out=feat_rows_total,
            output_path=clusters_path,
        )

    return {
        "clusters_path": clusters_path,
        "metrics": {
            "partitions_total": len(parts),
            "partitions_reused": len(done),
            "partitions_computed": len(pending),
            "edges_reused": reused_edges,
            "clusters_reused": reused_clusters,
        },
    }
