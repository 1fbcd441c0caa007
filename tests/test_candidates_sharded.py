"""The sharded all-gather pair path must emit EXACTLY the same deduped
pair set as the join/groupby path it size-gates (SURVEY.md §4.3; the
join path is the 10^12-scale route, the sharded path the in-plasma
fast route — both must be one semantics)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.fixtures import make_images
from well_duplicates_ray.pipelines.neardup import build_features
from well_duplicates_ray.stages.candidates import (
    cold_pairs,
    dedupe_pairs,
    emit_bucket_keys,
    find_hot_buckets,
    hot_pairs,
    sharded_pairs,
)


def _pairs_set(ds: ray.data.Dataset) -> set:
    tabs = [
        t for t in (ray.get(r) for r in ds.to_arrow_refs()) if t.num_rows
    ]
    if not tabs:
        return set()
    tbl = pa.concat_tables(tabs)
    return set(zip(tbl["a"].to_numpy().tolist(), tbl["b"].to_numpy().tolist()))


def test_sharded_pairs_equals_join_path(ray_session):
    # small cap forces the fixture's HOT_CAPTIONS rows (~15 per hot
    # caption at n=1500) over the hot threshold, exercising the salted
    # path; cap stays >= the hot-detection shard count (pigeonhole)
    cfg = DedupConfig(bucket_pair_cap=8)
    images, _ = make_images(1500, seed=11, cfg=cfg)
    feats = build_features(ray.data.from_arrow(images), cfg).materialize()
    em = feats.map_batches(
        lambda t: emit_bucket_keys(t, cfg), batch_format="pyarrow"
    ).materialize()
    hot = find_hot_buckets(em, cfg.bucket_pair_cap, n_emissions=em.count())
    assert hot, "fixture must produce hot buckets for this test to bite"

    joined = cold_pairs(em, hot, 4, cfg)
    hp = hot_pairs(em, hot, cfg)
    if hp is not None:
        joined = joined.union(hp)
    expect = _pairs_set(dedupe_pairs(joined))

    got = _pairs_set(sharded_pairs(em, hot, cfg))
    assert got == expect
    # determinism across shard counts
    got5 = _pairs_set(sharded_pairs(em, hot, cfg, num_shards=5))
    assert got5 == expect


def test_hot_sketch_residual_metric(ray_session):
    """The sketch-source hot-bucket sampled path must be reported, not
    invisible (ADVICE r2): find_hot_buckets classifies each hot bucket's
    source and hot_sketch_residual turns that into a disclosure metric."""
    from well_duplicates_ray.stages.candidates import (
        SRC_EXACT,
        hot_sketch_residual,
    )

    cfg = DedupConfig(bucket_pair_cap=8)
    images, _ = make_images(1500, seed=11, cfg=cfg)
    feats = build_features(ray.data.from_arrow(images), cfg).materialize()
    em = feats.map_batches(
        lambda t: emit_bucket_keys(t, cfg), batch_format="pyarrow"
    ).materialize()
    hot, srcs = find_hot_buckets(
        em, cfg.bucket_pair_cap, n_emissions=em.count(), return_srcs=True
    )
    assert set(srcs) == set(hot)
    # the hot-caption fixture makes exact-caption buckets hot (SRC_EXACT)
    # and their LSH/simhash/winnow buckets hot too (sketch sources)
    assert any(s == SRC_EXACT for s in srcs.values())
    assert any(s != SRC_EXACT for s in srcs.values())

    res = hot_sketch_residual(hot, srcs, cfg)
    assert res["hot_sketch_buckets"] > 0
    assert res["hot_sketch_members"] > 0
    assert res["hot_sketch_cross_sub_pairs_est"] > 0
    # exact-only hot set reports zero residual
    only_exact = {b: hot[b] for b in hot if srcs[b] == SRC_EXACT}
    z = hot_sketch_residual(
        only_exact, {b: SRC_EXACT for b in only_exact}, cfg
    )
    assert z["hot_sketch_buckets"] == 0
    assert z["hot_sketch_cross_sub_pairs_est"] == 0


def test_sharded_pairs_empty_emissions(ray_session):
    cfg = DedupConfig()
    empty = ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
                "src": pa.array([], pa.int8()),
                "code": pa.array([], pa.int64()),
            }
        )
    )
    out = sharded_pairs(empty, {}, cfg, num_shards=4)
    assert out.count() == 0
    assert set(out.schema().names) == {"a", "b"}


def test_above_gate_paths_match_broadcast(ray_session):
    """Force the at-scale routes — shuffle feature-attach verify
    (broadcast_threshold=0) and the join/groupby pair path
    (DRIVER_COUNT_GATE=0) — through the full pipeline and require the
    exact clusters the gated fast paths produce."""
    import pytest

    from well_duplicates_ray.pipelines import neardup as N
    from well_duplicates_ray.pipelines.neardup import run_neardup
    from well_duplicates_ray.stages import candidates as C

    images, _ = make_images(400, seed=9)
    ds = ray.data.from_arrow(images)

    fast = run_neardup(ds, DedupConfig(), num_partitions=4,
                       collect_metrics=False)
    want = {r["image_id"]: r["component"]
            for r in fast["clusters"].take_all()}

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(C, "DRIVER_COUNT_GATE", 0)
        mp.setattr(N, "DRIVER_COUNT_GATE", 0, raising=False)
        slow_cfg = DedupConfig(broadcast_threshold=0)
        slow = run_neardup(ds, slow_cfg, num_partitions=4,
                           collect_metrics=False)
        got = {r["image_id"]: r["component"]
               for r in slow["clusters"].take_all()}
    finally:
        mp.undo()
    assert got == want


def test_driver_count_gate_cluster_aware(ray_session, monkeypatch):
    """The all-gather gate shrinks with cluster size: every task in the
    shard waves reads every emission block, an O(nodes x data) replicate
    on a real cluster, so multi-node deployments must fall over to the
    shuffle paths sooner."""
    import ray as _ray

    from well_duplicates_ray.stages import candidates as C

    assert C.driver_count_gate() == C.DRIVER_COUNT_GATE  # single node

    real_nodes = _ray.nodes()
    fake = [dict(n, Alive=True) for n in real_nodes] * 4  # pretend 4 nodes
    monkeypatch.setattr(_ray, "nodes", lambda: fake)
    assert C.driver_count_gate() == C.DRIVER_COUNT_GATE // len(fake)
