"""Resume test (FIXTURES.md F3): kill after K partitions (simulated by
deleting outputs + manifest rows), rerun, assert completed partitions are
not recomputed (mtimes + digests unchanged) and the final cluster table is
byte-identical."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.fixtures import write_images_parquet

CFG = DedupConfig()


@pytest.fixture(scope="module")
def input_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    path = str(d / "images.parquet")
    # small row groups so the planner yields several partitions
    import pyarrow.parquet as pqw
    from well_duplicates_ray.fixtures import make_images

    images, _ = make_images(600, seed=42)
    pqw.write_table(images, path, row_group_size=100)
    return path


def test_partition_plan_deterministic(input_parquet):
    from well_duplicates_ray.pipelines.checkpoint import (
        ROWS_PER_PARTITION,
        plan_partitions,
    )

    p1 = plan_partitions(input_parquet)
    p2 = plan_partitions(input_parquet)
    assert p1 == p2
    assert sum(p["rows"] for p in p1) == 600


def test_checkpoint_run_and_resume(ray_session, input_parquet, tmp_path, monkeypatch):
    import well_duplicates_ray.pipelines.checkpoint as C

    monkeypatch.setattr(C, "ROWS_PER_PARTITION", 100)  # -> 6 partitions
    work = str(tmp_path / "work")

    out1 = C.run_checkpointed(input_parquet, work, CFG)
    m1 = out1["metrics"]
    assert m1["partitions_total"] == 6
    assert m1["partitions_computed"] == 6 and m1["partitions_reused"] == 0
    # clusters output is a streamed parquet DIRECTORY (no driver funnel)
    assert os.path.isdir(out1["clusters_path"])
    clusters1 = pq.read_table(out1["clusters_path"]).sort_by("image_id")
    assert clusters1.num_rows == 600

    # no-op rerun: everything reused, nothing rewritten
    sig_dir = os.path.join(work, "signatures")
    mtimes = {f: os.path.getmtime(os.path.join(sig_dir, f))
              for f in os.listdir(sig_dir)}
    out2 = C.run_checkpointed(input_parquet, work, CFG)
    m2 = out2["metrics"]
    assert m2["partitions_reused"] == 6 and m2["partitions_computed"] == 0
    assert m2["edges_reused"] is True
    assert m2["clusters_reused"] is True
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(sig_dir, f)) == t

    # simulate a crash that lost the last 2 partitions
    for pid in (4, 5):
        os.remove(os.path.join(sig_dir, f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(work, "manifest", "signatures",
                               f"part-{pid:05d}.parquet"))
    out3 = C.run_checkpointed(input_parquet, work, CFG)
    m3 = out3["metrics"]
    assert m3["partitions_reused"] == 4 and m3["partitions_computed"] == 2
    # untouched partitions were not rewritten
    for pid in (0, 1, 2, 3):
        f = f"part-{pid:05d}.parquet"
        assert os.path.getmtime(os.path.join(sig_dir, f)) == mtimes[f]
    # identical signature store digest -> edges and clusters stages reused
    assert m3["edges_reused"] is True and m3["clusters_reused"] is True
    clusters3 = pq.read_table(out3["clusters_path"]).sort_by("image_id")
    assert clusters3.equals(clusters1)  # identical final output

    # phase-granular resume: losing only the clusters stage must NOT
    # recompute the (expensive) verified-edges stage
    shutil.rmtree(out3["clusters_path"])
    shutil.rmtree(os.path.join(work, "manifest", "clusters"))
    edges_mtime = os.path.getmtime(
        os.path.join(work, "manifest", "edges", "part-00000.parquet")
    )
    out4 = C.run_checkpointed(input_parquet, work, CFG)
    m4 = out4["metrics"]
    assert m4["edges_reused"] is True and m4["clusters_reused"] is False
    assert os.path.getmtime(
        os.path.join(work, "manifest", "edges", "part-00000.parquet")
    ) == edges_mtime
    clusters4 = pq.read_table(out4["clusters_path"]).sort_by("image_id")
    assert clusters4.equals(clusters1)


def test_checkpoint_edge_shard_resume(ray_session, input_parquet, tmp_path,
                                      monkeypatch):
    """Kill mid-edges (fault injection after 2 of 4 pair-hash shards),
    resume, and prove completed edge shards are REUSED: their lineage
    rows are untouched (mtime + input_digest), only the missing shards
    are computed, and the final cluster table is identical to an
    uninterrupted run."""
    import well_duplicates_ray.pipelines.checkpoint as C

    monkeypatch.setattr(C, "ROWS_PER_PARTITION", 200)
    monkeypatch.setattr(C, "EDGE_SHARDS", 4)
    monkeypatch.setattr(C, "CLUSTER_SHARDS", 2)

    # uninterrupted control run
    ref = C.run_checkpointed(input_parquet, str(tmp_path / "ref"), CFG)
    assert ref["metrics"]["edge_shards_total"] == 4
    ref_clusters = pq.read_table(ref["clusters_path"]).sort_by("image_id")
    assert ref_clusters.num_rows == 600

    work = str(tmp_path / "work")
    with pytest.raises(Exception, match="fault injection"):
        C.run_checkpointed(input_parquet, work, CFG, _fail_edge_shards_ge=2)

    edir = os.path.join(work, "manifest", "edges")
    done_before = sorted(os.listdir(edir))
    assert done_before == ["part-00000.parquet", "part-00001.parquet"]
    mtimes = {f: os.path.getmtime(os.path.join(edir, f)) for f in done_before}
    digests = {
        f: pq.read_table(os.path.join(edir, f)).to_pylist()[0]["input_digest"]
        for f in done_before
    }
    # the candidates stage completed before the edge fault fired: its
    # shards must be REUSED on resume, not regenerated (VERDICT r3
    # 'missing' #3 — candidate gen used to re-run in full here)
    cdir = os.path.join(work, "manifest", "candidates")
    cand_before = sorted(os.listdir(cdir))
    assert len(cand_before) == 4
    cand_mtimes = {f: os.path.getmtime(os.path.join(cdir, f))
                   for f in cand_before}

    out = C.run_checkpointed(input_parquet, work, CFG)
    m = out["metrics"]
    assert m["partitions_reused"] == m["partitions_total"]  # phase 1 reused
    assert m["candidates_reused"] is True
    assert m["cand_shards_computed"] == 0
    for f in cand_before:  # no candidate shard was rewritten
        assert os.path.getmtime(os.path.join(cdir, f)) == cand_mtimes[f]
    assert m["edge_shards_reused"] == 2
    assert m["edge_shards_computed"] == 2
    assert m["clusters_reused"] is False
    for f in done_before:  # completed shards not recomputed
        assert os.path.getmtime(os.path.join(edir, f)) == mtimes[f]
        row = pq.read_table(os.path.join(edir, f)).to_pylist()[0]
        assert row["input_digest"] == digests[f]
    clusters = pq.read_table(out["clusters_path"]).sort_by("image_id")
    assert clusters.equals(ref_clusters)

    # a second resume reuses every shard of every stage
    out2 = C.run_checkpointed(input_parquet, work, CFG)
    assert out2["metrics"]["edge_shards_reused"] == 4
    assert out2["metrics"]["clusters_reused"] is True


def test_checkpoint_input_change_invalidates(ray_session, input_parquet, tmp_path,
                                             monkeypatch):
    import well_duplicates_ray.pipelines.checkpoint as C

    monkeypatch.setattr(C, "ROWS_PER_PARTITION", 100)
    work = str(tmp_path / "work2")
    src = str(tmp_path / "images2.parquet")
    shutil.copy(input_parquet, src)
    C.run_checkpointed(src, work, CFG)

    # rewrite the input (different content -> different digests everywhere)
    from well_duplicates_ray.fixtures import make_images

    images, _ = make_images(600, seed=43)
    pq.write_table(images, src, row_group_size=100)
    out = C.run_checkpointed(src, work, CFG)
    assert out["metrics"]["partitions_reused"] == 0
    assert out["metrics"]["partitions_computed"] == 6
    assert out["metrics"]["edges_reused"] is False
    assert out["metrics"]["clusters_reused"] is False


def test_checkpoint_above_broadcast_gate(ray_session, input_parquet, tmp_path,
                                         monkeypatch):
    """Force the checkpoint runner's above-the-gate edges branch
    (broadcast_threshold=0 -> per-shard shuffle verify over the candidate
    parquets) and require the same final clusters as the broadcast-path
    control run."""
    import well_duplicates_ray.pipelines.checkpoint as C

    monkeypatch.setattr(C, "ROWS_PER_PARTITION", 200)
    monkeypatch.setattr(C, "EDGE_SHARDS", 4)
    monkeypatch.setattr(C, "CLUSTER_SHARDS", 2)

    ref = C.run_checkpointed(input_parquet, str(tmp_path / "ref"), CFG)
    ref_clusters = pq.read_table(ref["clusters_path"]).sort_by("image_id")

    slow_cfg = DedupConfig(broadcast_threshold=0)
    out = C.run_checkpointed(input_parquet, str(tmp_path / "gate0"), slow_cfg)
    clusters = pq.read_table(out["clusters_path"]).sort_by("image_id")
    assert clusters.equals(ref_clusters)
    assert out["metrics"]["cand_shards_computed"] == 4
