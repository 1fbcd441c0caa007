"""End-to-end flagship pipeline vs the brute-force oracle (SURVEY.md §5.2).

Mirrors the reference's golden-count test: exact known input, independent
recomputation of the duplicate structure, hard recall >= 0.99 gate
(BASELINE.json north_rule) — plus precision, which must be perfect since
the engine verifies with the same exact predicates the oracle uses.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from tests.oracle import co_clustered_pairs, oracle_clusters
from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.fixtures import make_images
from well_duplicates_ray.pipelines.neardup import run_neardup

CFG = DedupConfig()


@pytest.fixture(scope="module")
def fixture_800(ray_session):
    images, truth = make_images(800, seed=42)
    return images, truth


def _engine_clusters(images: pa.Table, cfg=CFG) -> dict[str, str]:
    ds = ray.data.from_arrow(images)
    out = run_neardup(ds, cfg, num_partitions=4)
    rows = out["clusters"].take_all()
    return {r["image_id"]: r["component"] for r in rows}, out


def test_recall_vs_oracle(fixture_800):
    images, truth = fixture_800
    (engine, out) = _engine_clusters(images)
    oracle = oracle_clusters(images, CFG)
    assert set(engine) == set(oracle)  # every row assigned exactly once

    o_pairs = co_clustered_pairs(oracle)
    e_pairs = co_clustered_pairs(engine)
    assert o_pairs, "fixture must contain duplicates"
    recall = len(o_pairs & e_pairs) / len(o_pairs)
    precision = len(o_pairs & e_pairs) / max(len(e_pairs), 1)
    assert recall >= 0.99, f"recall {recall:.4f} < 0.99"
    assert precision >= 0.999, f"precision {precision:.4f}"

    # injected truth pairs must be co-clustered (sanity vs generator intent)
    missed = [
        (a, b, c)
        for a, b, c in zip(*[truth[c].to_pylist() for c in ("a", "b", "cls")])
        if engine[a] != engine[b]
    ]
    assert len(missed) <= max(1, truth.num_rows // 100), missed[:5]


def test_metrics_and_kinds(fixture_800):
    images, _ = fixture_800
    engine, out = _engine_clusters(images)
    m = out["metrics"]
    assert m["n_rows"] == 800
    assert m["n_quarantined"] == 0
    assert m["n_edges"] > 0
    # several detection paths must fire on this fixture
    assert set(m["edges_by_kind"]) & {"exact", "exact_caption", "phash"}


def test_quarantine_unknown_fmt(ray_session):
    images, _ = make_images(60, seed=7)
    fmts = ["png" if i == 3 else "raw" for i in range(60)]
    images = images.set_column(
        images.schema.get_field_index("fmt"), "fmt", pa.array(fmts, pa.string())
    )
    ds = ray.data.from_arrow(images)
    out = run_neardup(ds, CFG, num_partitions=2)
    assert out["metrics"]["n_quarantined"] == 1
    assert out["clusters"].count() == 60  # quarantined rows still assigned
