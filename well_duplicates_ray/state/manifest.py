"""Checkpoint manifest with per-partition lineage (SURVEY.md §2 G17/G18).

The reference reruns from scratch on failure (SURVEY.md §4.1); the
north_rule requires resuming mid-run without recomputing completed
partitions. The manifest is a directory of one single-row parquet file
per (stage, partition), written atomically (tmp + rename) next to the
stage outputs:

    manifest/
      signatures/part-00003.parquet   # one lineage row each
      clusters/part-00000.parquet

Lineage row schema (FIXTURES.md F3):
    stage:string  partition_id:int32  input_digest:string
    rows_in:int64 rows_out:int64  status:string  output_path:string

A partition is *complete* iff its manifest row exists, its digest matches
the current input, and its output file exists. Ray task retries keep a
single run idempotent; the manifest makes *cross-run* resume idempotent.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        ("stage", pa.string()),
        ("partition_id", pa.int32()),
        ("input_digest", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("status", pa.string()),
        ("output_path", pa.string()),
        # md5 of the written output file(s) — folded into downstream stage
        # digests so a same-count different-content output invalidates its
        # consumers (ADVICE r2), "" when the caller did not compute one
        ("output_digest", pa.string()),
    ]
)


def record_path(manifest_dir: str, stage: str, partition_id: int) -> str:
    return os.path.join(manifest_dir, stage, f"part-{partition_id:05d}.parquet")


def write_record(
    manifest_dir: str,
    stage: str,
    partition_id: int,
    input_digest: str,
    rows_in: int,
    rows_out: int,
    output_path: str,
    status: str = "done",
    output_digest: str = "",
) -> None:
    """Atomic single-row lineage record (write temp file, rename)."""
    path = record_path(manifest_dir, stage, partition_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    row = pa.table(
        {
            "stage": [stage],
            "partition_id": pa.array([partition_id], pa.int32()),
            "input_digest": [input_digest],
            "rows_in": pa.array([rows_in], pa.int64()),
            "rows_out": pa.array([rows_out], pa.int64()),
            "status": [status],
            "output_path": [output_path],
            "output_digest": [output_digest],
        },
        schema=SCHEMA,
    )
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    pq.write_table(row, tmp)
    os.replace(tmp, path)


def read_stage(manifest_dir: str, stage: str) -> dict[int, dict]:
    """partition_id -> lineage row for one stage (missing dir -> empty)."""
    d = os.path.join(manifest_dir, stage)
    if not os.path.isdir(d):
        return {}
    out: dict[int, dict] = {}
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(d, f))
        for row in t.to_pylist():
            out[row["partition_id"]] = row
    return out


def completed_partitions(
    manifest_dir: str, stage: str, digests: dict[int, str]
) -> set[int]:
    """Partitions whose lineage row matches the current input digest AND
    whose output file still exists (a deleted output forces recompute)."""
    done = set()
    for pid, row in read_stage(manifest_dir, stage).items():
        if (
            row["status"] == "done"
            and digests.get(pid) == row["input_digest"]
            and os.path.exists(row["output_path"])
        ):
            done.add(pid)
    return done


def atomic_write_table(table: pa.Table, path: str) -> None:
    """tmp + rename parquet write (partition outputs must never be
    observable half-written)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def atomic_write_dataset(ds, final_dir: str) -> None:
    """Streaming ``Dataset.write_parquet`` into a temp directory, then one
    atomic rename onto ``final_dir`` — the distributed analogue of
    ``atomic_write_table``: the data never funnels through the driver and
    the directory (one part file per block) is never observable
    half-written. A stale final_dir (digest mismatch rerun) is replaced."""
    import shutil

    parent = os.path.dirname(final_dir.rstrip("/"))
    os.makedirs(parent, exist_ok=True)
    tmp = f"{final_dir.rstrip('/')}.tmp.{uuid.uuid4().hex[:8]}"
    ds.write_parquet(tmp)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp, final_dir)
