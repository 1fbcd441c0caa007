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


def test_null_captions_and_null_bytes(ray_session):
    """input_hint's caption:string is nullable — null captions must flow
    through decode/signatures/verify without crashing, and null-payload
    rows must NOT be clustered together as 'exact' dups of each other
    (ADVICE round 1: shared sha sentinel / null-equality false positives).

    Fully controlled 8-row table: pairwise-unrelated images and captions,
    with two null captions, one empty caption, and two null payloads —
    nothing may link, so the pipeline must emit 8 singleton components."""
    from well_duplicates_ray.fixtures import _images_batch, _phash_stack

    rng = np.random.default_rng(11)
    imgs = _images_batch(rng, 8, 32)
    ph = _phash_stack(imgs).view(np.int64)
    captions = [
        "cobalt anchors drifting beneath quiet harbors tonight",
        "seven marmalade foxes juggle porcelain teacups",
        None,
        "granite staircases spiral toward amber observatories",
        "velvet thunderclouds rehearse above frozen orchards",
        None,
        "paper lanterns argue with indifferent lighthouse keepers",
        "",
    ]
    byts = [imgs[i].tobytes() for i in range(8)]
    byts[3] = None
    byts[4] = None
    images = pa.table(
        {
            "image_id": pa.array([f"img{i:08d}" for i in range(8)]),
            "bytes": pa.array(byts, pa.binary()),
            "w": pa.array([32] * 8, pa.int32()),
            "h": pa.array([32] * 8, pa.int32()),
            "fmt": pa.array(["raw"] * 8),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(ph),
        }
    )
    out = run_neardup(ray.data.from_arrow(images), CFG, num_partitions=2)
    rows = out["clusters"].take_all()
    assert len(rows) == 8
    comps = {r["component"] for r in rows}
    assert len(comps) == 8, (
        f"unrelated rows were linked: {sorted(rows, key=lambda r: r['component'])}"
    )
    assert out["metrics"]["n_quarantined"] == 2


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
